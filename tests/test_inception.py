"""Inception-v4 perceptual module: endpoint shapes and the optional FG loss."""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sketchyscenecolorization_tpu.config import FGGanConfig
from sketchyscenecolorization_tpu.models import inception_v4 as inc


def test_endpoint_shapes_match_inception_v4():
    p = inc.init_params(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 299, 299, 3), jnp.float32)
    eps = jax.jit(inc.extract_endpoints)(p, x)
    assert [e.shape for e in eps] == [(1, 147, 147, 32), (1, 71, 71, 192),
                                      (1, 35, 35, 384)]


def test_perceptual_loss_zero_for_identical():
    p = inc.init_params(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3),
                             minval=-1, maxval=1)
    assert float(inc.perceptual_loss(p, img, img)) == 0.0
    assert float(inc.perceptual_loss(p, img, -img)) > 0.0


@pytest.mark.skipif(os.environ.get("RUN_SLOW") != "1",
                    reason="inception backward takes ~8 min on CPU; set RUN_SLOW=1")
def test_fg_train_step_with_perceptual():
    from sketchyscenecolorization_tpu.train import (
        create_fg_gan_state, make_fg_gan_train_step)
    cfg = FGGanConfig(batch_size=1, image_size=64, vocab_size=10, max_len=4,
                      base_channels=4, noise_dim=8, max_iters=100,
                      coeff_perceptual=1.0)
    perc = inc.init_params(jax.random.PRNGKey(5))
    state = create_fg_gan_state(jax.random.PRNGKey(0), cfg)
    step = make_fg_gan_train_step(cfg, donate=False, perceptual_params=perc)
    rng = np.random.RandomState(0)
    s = cfg.image_size

    def batch(seed):
        r = np.random.RandomState(seed)
        return {
            "images": jnp.asarray(r.uniform(-1, 1, (1, s, s, 3)), jnp.float32),
            "sketches": jnp.asarray(r.uniform(-1, 1, (1, s, s, 3)), jnp.float32),
            "images_d": jnp.asarray(r.uniform(-1, 1, (1, s, s, 3)), jnp.float32),
            "class_id": jnp.zeros((1,), jnp.int32),
            "class_id_d": jnp.zeros((1,), jnp.int32),
            "tokens": jnp.ones((1, 4), jnp.int32),
        }
    _, metrics = step(state, batch(0), batch(1), jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss_g"]))
