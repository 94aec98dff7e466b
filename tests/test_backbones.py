"""Alternative backbones: shapes, intermediate exits, argmax unpooling math,
and RMI integration via cfg.backbone."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sketchyscenecolorization_tpu.config import MatchingConfig
from sketchyscenecolorization_tpu.models import rmi
from sketchyscenecolorization_tpu.models.backbones import (
    _max_pool_argmax_2x2, _unpool_2x2, deeplab_v3plus, fcn8s, segnet,
)

S = 64  # tiny input; all sizes even through the pooling chains


def test_max_pool_argmax_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 3), jnp.float32)
    vals, idx = _max_pool_argmax_2x2(x)
    assert vals.shape == (2, 4, 4, 3)
    # scatter back: maxima restored at their original positions, zeros elsewhere
    restored = _unpool_2x2(vals, idx, 8, 8)
    assert restored.shape == x.shape
    np.testing.assert_allclose(np.asarray(restored).sum(),
                               np.asarray(vals).sum(), rtol=1e-5)
    assert int((np.asarray(restored) != 0).sum()) == vals.size
    # TF flat-index semantics: idx = (row * W + col) * C + c
    flat = np.asarray(x).reshape(2, -1)
    gathered = np.take_along_axis(flat, np.asarray(idx).reshape(2, -1), axis=1)
    np.testing.assert_allclose(gathered, np.asarray(vals).reshape(2, -1))


def test_fcn8s_shapes():
    params = fcn8s.init_params(jax.random.PRNGKey(0), num_classes=5)
    x = jnp.zeros((1, S, S, 3), jnp.float32)
    feat = jax.jit(lambda p, v: fcn8s.apply(p, v, intermediate=True))(params, x)
    assert feat.shape == (1, S // 8, S // 8, 256)
    logits = jax.jit(lambda p, v: fcn8s.apply(p, v, intermediate=False))(params, x)
    assert logits.shape == (1, S, S, 5)


def test_segnet_shapes():
    params = segnet.init_params(jax.random.PRNGKey(0), num_classes=5)
    x = jnp.ones((1, S, S, 3), jnp.float32)
    feat = jax.jit(lambda p, v: segnet.apply(p, v, intermediate=True))(params, x)
    assert feat.shape == (1, S // 8, S // 8, 512)
    logits = jax.jit(lambda p, v: segnet.apply(p, v, intermediate=False))(params, x)
    assert logits.shape == (1, S, S, 5)


def test_deeplab_v3plus_shapes():
    params = deeplab_v3plus.init_params(jax.random.PRNGKey(0), num_classes=5)
    x = jnp.zeros((1, S, S, 3), jnp.float32)
    # intermediate = pre-ASPP backbone output, 2048-ch -- the reference's RMI
    # consumes "(1, 96, 96, 2048)" (RMI_model.py:105-109)
    feat = jax.jit(lambda p, v: deeplab_v3plus.apply(p, v, intermediate=True))(
        params, x)
    assert feat.shape == (1, S // 8, S // 8, 2048)
    logits = jax.jit(lambda p, v: deeplab_v3plus.apply(
        p, v, intermediate=False, num_classes=5))(params, x)
    assert logits.shape == (1, S, S, 5)


@pytest.mark.parametrize("backbone,scope", [
    ("fcn_8s", "FCN_8s"), ("segnet", "SegNet"),
    ("deeplab_v3plus", "resnet_v1_101"),
])
def test_rmi_with_alt_backbone(backbone, scope):
    cfg = MatchingConfig(vf_h=S // 8, vf_w=S // 8, H=S, W=S, vocab_size=12,
                         w_emb_dim=16, v_emb_dim=16, m_rnn_size=8,
                         w_rnn_size=16, max_len=5, backbone=backbone)
    params = rmi.init_params(jax.random.PRNGKey(0), cfg)
    assert scope in params
    out = jax.jit(lambda p, i, w, s: rmi.apply(p, cfg, i, w, s))(
        params,
        jnp.zeros((1, S, S, 3), jnp.float32),
        jnp.ones((1, 5), jnp.int32),
        jnp.array([3], jnp.int32))
    assert out.sigm.shape == (1, S, S, 1)
    assert bool(jnp.all(jnp.isfinite(out.sigm)))


@pytest.mark.parametrize("kwargs", [
    {"fusion_type": "RecurAttn"},
    {"use_attn": True},
])
def test_matching_engine_with_alt_fusion(kwargs):
    """RecurAttn fusion and word-attention variants run through the serving
    engine (config-coverage for ``RMI_model.py:203-273``)."""
    from sketchyscenecolorization_tpu.pipeline.engines import MatchingEngine
    cfg = MatchingConfig(vf_h=S // 8, vf_w=S // 8, H=S, W=S, vocab_size=12,
                         w_emb_dim=16, v_emb_dim=16, m_rnn_size=8,
                         w_rnn_size=16, max_len=5, **kwargs)
    params = rmi.init_params(jax.random.PRNGKey(0), cfg)
    engine = MatchingEngine(cfg, params,
                            {"<pad>": 0, "<unk>": 1, "the": 2, "bus": 3})
    sketch = np.full((S, S, 3), 255, np.uint8)
    sketch[10:30, 10:40] = 0
    mask = engine.predict_mask(sketch, "the bus")
    assert mask.shape == (S, S)
    assert np.isfinite(mask).all()
