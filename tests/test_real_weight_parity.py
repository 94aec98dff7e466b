"""Synthetic end-to-end checkpoint conversion: a random TF1-SHAPED npz (the
exact variable names ``scripts/export_tf1_checkpoint.py`` would emit for the
released checkpoints) -> ``utils/tf1_converter`` -> model forward.

This keeps the rename tables load-bearing until the real Google-Drive-only
weights can be exported (``/root/reference/README.md:32-53``; TF is not
installed here).  Each test asserts the strict conversion consumes the full
synthetic checkpoint, the merged tree runs a finite forward, and the weights
actually took effect (outputs differ from fresh init).  The one-command
harness these feed is ``scripts/real_weight_parity.py``.
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, "scripts"))

from sketchyscenecolorization_tpu.config import (BGGanConfig, FGGanConfig,
                                                 MatchingConfig)
from sketchyscenecolorization_tpu.utils import tf1_converter as cvt


def _leaf_at(tree, path):
    node = tree
    for k in path:
        node = node[k]
    return node


def _synth_npz(path, name_map, template, rng, deconv_names=()):
    """Random npz with the TF1 variable names + TF-side layouts."""
    out = {}
    for tf_name, tree_path in name_map.items():
        shape = np.shape(_leaf_at(template, tree_path))
        if any(tag in tf_name for tag in deconv_names):
            # TF transposed-conv filters are [kh, kw, out, in]; ours HWIO
            shape = (shape[0], shape[1], shape[3], shape[2])
        out[tf_name] = rng.randn(*shape).astype(np.float32) * 0.05
    np.savez(path, **out)
    return out


def test_matching_synthetic_npz_convert_forward(tmp_path):
    from sketchyscenecolorization_tpu.models import rmi
    cfg = MatchingConfig(vf_h=6, vf_w=6, H=48, W=48, vocab_size=12,
                         w_emb_dim=16, v_emb_dim=16, m_rnn_size=8,
                         w_rnn_size=16, max_len=5)
    params = rmi.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    npz = str(tmp_path / "matching.npz")
    synth = _synth_npz(npz, cvt.matching_name_map(cfg), params, rng)
    # every BN needs a positive variance/factor to stay finite
    for k in synth:
        if k.endswith("/variance") or k.endswith("/factor"):
            synth[k] = np.abs(synth[k]) + 1.0
    np.savez(npz, **synth)

    tree = cvt.convert_matching(cvt.load_tf_vars_npz(npz), cfg, strict=True)
    merged = cvt.merge_converted(params, tree)

    image = jnp.asarray(rng.randn(1, cfg.H, cfg.W, 3).astype(np.float32) * 40)
    words = jnp.asarray(rng.randint(1, cfg.vocab_size,
                                    (1, cfg.max_len)).astype(np.int32))
    lens = jnp.asarray(np.asarray([3], np.int32))
    out = rmi.apply(merged, cfg, image, words, lens).sigm
    base = rmi.apply(params, cfg, image, words, lens).sigm
    assert np.isfinite(np.asarray(out)).all()
    assert not np.allclose(np.asarray(out), np.asarray(base))


def test_fg_generator_synthetic_npz_convert_forward(tmp_path):
    from sketchyscenecolorization_tpu.train.fg_gan import build_models
    cfg = FGGanConfig(image_size=32, vocab_size=12, max_len=6,
                      base_channels=8, num_classes=5, noise_dim=8)
    gen, _ = build_models(cfg)
    s = cfg.image_size
    args = (jnp.zeros((1, s, s, 3), jnp.float32),
            jnp.zeros((1, cfg.max_len), jnp.int32),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, cfg.noise_dim), jnp.float32))
    params = gen.init(jax.random.PRNGKey(0), *args)["params"]
    rng = np.random.RandomState(1)
    npz = str(tmp_path / "fg.npz")
    _synth_npz(npz, cvt.fg_generator_name_map(params), params, rng)

    tree = cvt.convert_fg_generator(cvt.load_tf_vars_npz(npz), params,
                                    strict=True)
    merged = cvt.merge_converted(params, tree)
    rngn = np.random.RandomState(2)
    inp = (jnp.asarray(rngn.uniform(-1, 1, (1, s, s, 3)).astype(np.float32)),
           jnp.asarray(rngn.randint(0, cfg.vocab_size,
                                    (1, cfg.max_len)).astype(np.int32)),
           jnp.asarray(np.asarray([2], np.int32)),
           jnp.asarray(rngn.randn(1, cfg.noise_dim).astype(np.float32)))
    out = gen.apply({"params": merged}, *inp)
    base = gen.apply({"params": params}, *inp)
    assert np.isfinite(np.asarray(out)).all()
    assert not np.allclose(np.asarray(out), np.asarray(base))


def test_bg_generator_synthetic_npz_convert_forward(tmp_path):
    from sketchyscenecolorization_tpu.train.bg_gan import build_models
    cfg = BGGanConfig(image_size=32, vocab_size=10, max_len=4, ngf=4, ndf=4,
                      multi_residual=True)
    gen, _ = build_models(cfg)
    s = cfg.image_size
    args = (jnp.zeros((1, s, s, 3), jnp.float32),
            jnp.zeros((1, cfg.max_len), jnp.int32))
    params = gen.init(jax.random.PRNGKey(0), *args)["params"]
    rng = np.random.RandomState(3)
    npz = str(tmp_path / "bg.npz")
    _synth_npz(npz, cvt.bg_generator_name_map(cfg.multi_residual), params,
               rng, deconv_names=("/deconv/filter",))

    tree = cvt.convert_bg_generator(cvt.load_tf_vars_npz(npz),
                                    cfg.multi_residual, strict=True)
    merged = cvt.merge_converted(params, tree)
    rngn = np.random.RandomState(4)
    inp = (jnp.asarray(rngn.uniform(-1, 1, (1, s, s, 3)).astype(np.float32)),
           jnp.asarray(rngn.randint(0, cfg.vocab_size,
                                    (1, cfg.max_len)).astype(np.int32)))
    out, region = gen.apply({"params": merged}, *inp)
    base, _ = gen.apply({"params": params}, *inp)
    assert np.isfinite(np.asarray(out)).all()
    assert np.asarray(region).shape[-1] == 3
    assert not np.allclose(np.asarray(out), np.asarray(base))
