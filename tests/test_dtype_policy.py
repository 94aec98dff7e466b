"""DTypePolicy: bfloat16 compute plumbed through the GANs and engines.

The bf16 path is NATIVE storage (r5): convs cast operands and emit their
f32-accumulated result AT bf16 (``ops/conv.py``), and the batch-stats /
l2 normalizations compute statistics in f32 but return at the input dtype
(``ops/norm.py``), so activations stay bf16 end to end -- that is the
point: the FG GAN forward is HBM-bandwidth-bound (PARITY.md "HLO-level
attribution") and bf16 storage halves the bytes.  Model outputs under the
scope are therefore bf16 (engines cast to f32/uint8 at the boundary).
Parameters stay float32.  Outputs track the float32 path within bf16
rounding amplified by the batch-stats normalizations; tolerances are
moderate, and correlation is asserted to catch gross wiring errors.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sketchyscenecolorization_tpu.ops.conv import compute_dtype_scope, conv2d


def _corr(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(np.corrcoef(a, b)[0, 1])


def test_scope_casts_and_restores():
    x = jnp.ones((1, 4, 4, 3), jnp.float32)
    w = jnp.ones((3, 3, 3, 2), jnp.float32)
    with compute_dtype_scope("bfloat16"):
        y = conv2d(x, w)
    # scope-driven convs accumulate f32 but STORE bf16 (HBM policy)
    assert y.dtype == jnp.bfloat16
    # explicit compute_dtype keeps the f32-output contract
    y_exp = conv2d(x, w, compute_dtype=jnp.bfloat16)
    assert y_exp.dtype == jnp.float32
    # scope restored: float32 path bitwise-identical to no scope
    y2 = conv2d(x, w)
    assert y2.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(conv2d(x, w)))
    # nested float32 scope is a no-op
    with compute_dtype_scope("float32"):
        np.testing.assert_array_equal(np.asarray(conv2d(x, w)),
                                      np.asarray(y2))


def test_fg_generator_bf16_forward_parity():
    from sketchyscenecolorization_tpu.models.fg_gan import MRUGenerator
    model = MRUGenerator(num_classes=5, vocab_size=12, size=8)
    rng = np.random.RandomState(0)
    sketch = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    tokens = jnp.asarray(np.array([[0, 0, 3, 4, 5, 2], [0, 0, 0, 0, 7, 1]],
                                  np.int32))
    labels = jnp.asarray(np.array([1, 3], np.int32))
    noise = jnp.asarray(rng.randn(2, 256).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), sketch, tokens, labels, noise)

    f32 = np.asarray(model.apply(variables, sketch, tokens, labels, noise))
    with compute_dtype_scope("bfloat16"):
        out = model.apply(variables, sketch, tokens, labels, noise)
    assert out.dtype == jnp.bfloat16          # native bf16 storage mode
    bf16 = np.asarray(out.astype(jnp.float32))
    assert np.isfinite(bf16).all()
    assert _corr(f32, bf16) > 0.99
    assert np.abs(f32 - bf16).mean() < 0.05


def test_bg_generator_bf16_forward_parity():
    """The BG residual generator chains ~50 conv -> batch-stats-BN layers;
    each BN re-normalizes by the batch std, so bf16 storage rounding
    compounds multiplicatively (measured corr ~0.89 at random init -- the
    reason BGGanConfig defaults to float32 and bf16 is an opt-in knob).
    This test pins the wiring (finite, correlated, same scale), not tight
    numerics."""
    from sketchyscenecolorization_tpu.models.bg_gan import ResidualGenerator
    model = ResidualGenerator(ngf=8, vocab_size=10, multi_residual=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    tokens = jnp.asarray(np.array([[0, 0, 3, 4, 5, 2, 1, 7]], np.int32))
    variables = model.init(jax.random.PRNGKey(0), x, tokens)

    f32, _ = model.apply(variables, x, tokens)
    with compute_dtype_scope("bfloat16"):
        bf16, _ = model.apply(variables, x, tokens)
    f32 = np.asarray(f32)
    bf16 = np.asarray(bf16).astype(np.float32)
    assert np.isfinite(bf16).all()
    assert _corr(f32, bf16) > 0.8
    np.testing.assert_allclose(bf16.std(), f32.std(), rtol=0.1)


@pytest.mark.parametrize("engine_cls", ["fg", "bg", "matching"])
def test_engines_bake_config_dtype(engine_cls):
    """Engines trace their forward under the config's compute dtype; bf16
    engines produce outputs close to (but not bitwise equal to) f32 ones."""
    import dataclasses
    if engine_cls == "fg":
        from sketchyscenecolorization_tpu.config import FGGanConfig
        from sketchyscenecolorization_tpu.pipeline.engines import FGColorizeEngine
        from sketchyscenecolorization_tpu.train.fg_gan import build_models
        cfg = FGGanConfig(image_size=32, vocab_size=12, max_len=6,
                          base_channels=8, num_classes=5)
        gen, _ = build_models(cfg)
        s = cfg.image_size
        params = gen.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, s, s, 3), jnp.float32),
                          jnp.zeros((1, cfg.max_len), jnp.int32),
                          jnp.zeros((1,), jnp.int32),
                          jnp.zeros((1, cfg.noise_dim), jnp.float32))["params"]
        vocab = {"<pad>": 0, "<unk>": 1, "red": 2}
        sketch = np.random.RandomState(0).uniform(
            -1, 1, (s, s, 3)).astype(np.float32)
        out32 = FGColorizeEngine(cfg, params, vocab, seed=0).colorize(
            sketch, 1, "red")
        cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
        out16 = FGColorizeEngine(cfg16, params, vocab, seed=0).colorize(
            sketch, 1, "red")
    elif engine_cls == "bg":
        from sketchyscenecolorization_tpu.config import BGGanConfig
        from sketchyscenecolorization_tpu.pipeline.engines import BGColorizeEngine
        from sketchyscenecolorization_tpu.train.bg_gan import build_models
        cfg = BGGanConfig(image_size=64, vocab_size=10, ngf=8, ndf=8)
        gen, _ = build_models(cfg)
        params = gen.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 64, 64, 3), jnp.float32),
                          jnp.zeros((1, cfg.max_len), jnp.int32))["params"]
        vocab = {"<pad>": 0, "<unk>": 1, "blue": 2}
        img = np.random.RandomState(0).randint(
            0, 255, (64, 64, 3)).astype(np.uint8)
        out32, _ = BGColorizeEngine(cfg, params, vocab).colorize(img, "blue")
        cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
        out16, _ = BGColorizeEngine(cfg16, params, vocab).colorize(img, "blue")
        out32 = out32.astype(np.float32) / 255.0
        out16 = out16.astype(np.float32) / 255.0
    else:
        from sketchyscenecolorization_tpu.config import MatchingConfig
        from sketchyscenecolorization_tpu.models import rmi
        from sketchyscenecolorization_tpu.pipeline.engines import MatchingEngine
        cfg = MatchingConfig(vf_h=8, vf_w=8, H=64, W=64, vocab_size=12,
                             w_emb_dim=16, v_emb_dim=16, m_rnn_size=8,
                             w_rnn_size=16, max_len=5)
        params = rmi.init_params(jax.random.PRNGKey(0), cfg)
        vocab = {"<pad>": 0, "<unk>": 1, "the": 2, "bus": 3}
        sk = np.full((64, 64, 3), 255, np.uint8)
        sk[10:30, 10:40] = 0
        e32 = MatchingEngine(cfg, params, vocab)
        cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
        e16 = MatchingEngine(cfg16, params, vocab)
        # compare the raw logits (the binary mask can differ at the boundary)
        img = sk.astype(np.float32) - np.array(
            (104.00698793, 116.66876762, 122.67891434))
        words = np.zeros((1, 5), np.int32); words[0, :2] = [2, 3]
        lens = np.array([2], np.int32)
        v32 = e32._extract(params, jnp.asarray(img[None]))
        v16 = e16._extract(params, jnp.asarray(img[None]))
        out32 = np.asarray(e32._fuse(params, v32, jnp.asarray(words),
                                     jnp.asarray(lens)))
        out16 = np.asarray(e16._fuse(params, v16, jnp.asarray(words),
                                     jnp.asarray(lens)))
    assert np.isfinite(out16).all()
    # the BG generator's deep batch-stats-BN stack amplifies bf16 rounding
    # (see test_bg_generator_bf16_forward_parity); FG/matching stay tight
    assert _corr(out32, out16) > (0.8 if engine_cls == "bg" else 0.98)
