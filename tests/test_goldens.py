"""Numeric regression goldens: fixed-seed forward statistics of the three
models on the CPU backend.  These catch unintended numerics drift when
refactoring kernels/layers across rounds (values recorded 2026-08-16; loose
tolerances absorb cross-version float noise but not semantic changes)."""
import jax
import jax.numpy as jnp
import numpy as np

from sketchyscenecolorization_tpu.config import (
    BGGanConfig, FGGanConfig, MatchingConfig,
)
from sketchyscenecolorization_tpu.models import rmi
from sketchyscenecolorization_tpu.train.bg_gan import build_models as bg_models
from sketchyscenecolorization_tpu.train.fg_gan import build_models as fg_models

RTOL = 2e-3


def test_rmi_forward_golden():
    cfg = MatchingConfig(vf_h=6, vf_w=6, H=48, W=48, vocab_size=12,
                         w_emb_dim=16, v_emb_dim=16, m_rnn_size=8,
                         w_rnn_size=16, max_len=5)
    params = rmi.init_params(jax.random.PRNGKey(0), cfg)
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 48, 48, 3),
                             jnp.float32, -120, 130)
    out = rmi.apply(params, cfg, img, jnp.array([[2, 3, 4, 0, 0]], jnp.int32),
                    jnp.array([3]))
    np.testing.assert_allclose(float(jnp.mean(out.up)),
                               0.16562654078006744, rtol=RTOL)
    np.testing.assert_allclose(float(jnp.std(out.up)),
                               0.14533527195453644, rtol=RTOL)


def test_fg_generator_golden():
    cfg = FGGanConfig(batch_size=1, image_size=64, vocab_size=10, max_len=4,
                      base_channels=4, noise_dim=8)
    gen, _ = fg_models(cfg)
    gv = gen.init(jax.random.PRNGKey(2), jnp.zeros((1, 64, 64, 3)),
                  jnp.ones((1, 4), jnp.int32), jnp.zeros((1,), jnp.int32),
                  jnp.zeros((1, 8)))
    sk = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3),
                            jnp.float32, -1, 1)
    out = gen.apply(gv, sk, jnp.ones((1, 4), jnp.int32),
                    jnp.zeros((1,), jnp.int32),
                    jax.random.normal(jax.random.PRNGKey(4), (1, 8)))
    np.testing.assert_allclose(float(jnp.mean(out)),
                               -0.03531830012798309, rtol=RTOL)
    np.testing.assert_allclose(float(jnp.std(out)),
                               0.13824285566806793, rtol=RTOL)


def test_bg_generator_golden():
    cfg = BGGanConfig(batch_size=1, image_size=64, vocab_size=8, max_len=4,
                      ngf=4, ndf=4, multi_residual=False)
    gen, _ = bg_models(cfg)
    bv = gen.init(jax.random.PRNGKey(5), jnp.zeros((1, 64, 64, 3)),
                  jnp.ones((1, 4), jnp.int32))
    sk = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3),
                            jnp.float32, -1, 1)
    out, reg = gen.apply(bv, sk, jnp.ones((1, 4), jnp.int32))
    np.testing.assert_allclose(float(jnp.mean(out)),
                               -0.011200271546840668, rtol=RTOL)
    np.testing.assert_allclose(float(jnp.mean(reg)),
                               0.3448888957500458, rtol=RTOL)
