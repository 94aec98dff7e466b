"""RMI model tests: the factored mLSTM must match a naive materialized
reference exactly; full forward shape/jit checks on a reduced geometry."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from sketchyscenecolorization_tpu.config import MatchingConfig
from sketchyscenecolorization_tpu.models import rmi, deeplab
from sketchyscenecolorization_tpu.ops.lstm import masked_lstm_scan
from sketchyscenecolorization_tpu.ops.norm import l2_normalize


def tiny_cfg(**kw):
    base = dict(H=32, W=32, vf_h=4, vf_w=4, vf_dim=2048, vocab_size=11,
                max_len=6, w_emb_dim=10, v_emb_dim=12, w_rnn_size=14,
                m_rnn_size=8, batch_size=2)
    base.update(kw)
    return MatchingConfig(**base)


def _naive_fusion(text, cfg, visual_norm, spatial, emb, lang, seq_len):
    """Materialized-tiling reference implementation (RMI_model.py:169-200)."""
    n, h, w, _ = visual_norm.shape
    t = emb.shape[1]
    p = h * w
    vis = jnp.broadcast_to(visual_norm.reshape(n, p, 1, cfg.v_emb_dim), (n, p, t, cfg.v_emb_dim))
    sp = jnp.broadcast_to(spatial.reshape(n, p, 1, 8), (n, p, t, 8))
    wf = jnp.broadcast_to(emb.reshape(n, 1, t, cfg.w_emb_dim), (n, p, t, cfg.w_emb_dim))
    lf = jnp.broadcast_to(lang.reshape(n, 1, t, cfg.w_rnn_size), (n, p, t, cfg.w_rnn_size))
    feat = jnp.concatenate([vis, wf, lf, sp], axis=-1).reshape(n * p, t, -1)
    seq_tile = jnp.repeat(seq_len, p)
    _, (c, hh) = masked_lstm_scan(feat, seq_tile, text["mLSTM"]["w"],
                                  text["mLSTM"]["b"], cfg.m_rnn_size)
    return hh.reshape(n, h, w, cfg.m_rnn_size)


def test_factored_fusion_matches_naive():
    cfg = tiny_cfg()
    key = jax.random.PRNGKey(0)
    params = rmi.init_params(key, cfg)
    text = params["text_sketchyscene"]
    rng = np.random.RandomState(0)
    n, h, w = cfg.batch_size, cfg.vf_h, cfg.vf_w
    visual = l2_normalize(jnp.asarray(rng.randn(n, h, w, cfg.v_emb_dim).astype(np.float32)), -1)
    spatial = jnp.asarray(rng.randn(n, h, w, 8).astype(np.float32))
    emb = jnp.asarray(rng.randn(n, cfg.max_len, cfg.w_emb_dim).astype(np.float32))
    lang = jnp.asarray(rng.randn(n, cfg.max_len, cfg.w_rnn_size).astype(np.float32))
    seq_len = jnp.asarray(np.array([3, cfg.max_len], np.int32))

    fast = rmi._rmi_fusion(text, cfg, visual, spatial, emb, lang, seq_len)
    naive = _naive_fusion(text, cfg, visual, spatial, emb, lang, seq_len)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(naive), rtol=2e-5, atol=2e-5)


def test_factored_fusion_with_attention_matches_naive():
    cfg = tiny_cfg(use_attn=True)
    key = jax.random.PRNGKey(1)
    params = rmi.init_params(key, cfg)
    text = params["text_sketchyscene"]
    rng = np.random.RandomState(1)
    n, h, w = cfg.batch_size, cfg.vf_h, cfg.vf_w
    visual = l2_normalize(jnp.asarray(rng.randn(n, h, w, cfg.v_emb_dim).astype(np.float32)), -1)
    spatial = jnp.asarray(rng.randn(n, h, w, 8).astype(np.float32))
    emb = jnp.asarray(rng.randn(n, cfg.max_len, cfg.w_emb_dim).astype(np.float32))
    lang = jnp.asarray(rng.randn(n, cfg.max_len, cfg.w_rnn_size).astype(np.float32))
    seq_len = jnp.asarray(np.array([4, 2], np.int32))

    fast = rmi._rmi_fusion(text, cfg, visual, spatial, emb, lang, seq_len)

    # naive attention: weighted sum over all mLSTM outputs
    n_, h_, w_ = n, h, w
    p = h_ * w_
    t = cfg.max_len
    vis = jnp.broadcast_to(visual.reshape(n, p, 1, cfg.v_emb_dim), (n, p, t, cfg.v_emb_dim))
    sp = jnp.broadcast_to(spatial.reshape(n, p, 1, 8), (n, p, t, 8))
    wf = jnp.broadcast_to(emb.reshape(n, 1, t, cfg.w_emb_dim), (n, p, t, cfg.w_emb_dim))
    lf = jnp.broadcast_to(lang.reshape(n, 1, t, cfg.w_rnn_size), (n, p, t, cfg.w_rnn_size))
    feat = jnp.concatenate([vis, wf, lf, sp], axis=-1).reshape(n * p, t, -1)
    seq_tile = jnp.repeat(seq_len, p)
    outs, _ = masked_lstm_scan(feat, seq_tile, text["mLSTM"]["w"], text["mLSTM"]["b"], cfg.m_rnn_size)
    attn_logits = (lang.reshape(n * t, cfg.w_rnn_size) @ text["attn_fc"]["DW"]
                   + text["attn_fc"]["biases"]).reshape(n, t)
    attn = jax.nn.softmax(attn_logits, -1)
    naive = jnp.einsum("nt,npth->nph", attn, outs.reshape(n, p, t, cfg.m_rnn_size))
    naive = naive.reshape(n, h_, w_, cfg.m_rnn_size)

    np.testing.assert_allclose(np.asarray(fast), np.asarray(naive), rtol=2e-5, atol=2e-5)


def test_recur_attn_fusion_shape():
    cfg = tiny_cfg(fusion_type="RecurAttn")
    assert cfg.m_rnn_size == 256 and cfg.v_emb_dim == 256
    cfg2 = dataclasses.replace(cfg)
    params = rmi.init_params(jax.random.PRNGKey(2), cfg2)
    text = params["text_sketchyscene"]
    rng = np.random.RandomState(2)
    n, h, w = 1, cfg2.vf_h, cfg2.vf_w
    visual = jnp.asarray(rng.randn(n, h, w, 256).astype(np.float32))
    lang = jnp.asarray(rng.randn(n, cfg2.max_len, 256).astype(np.float32))
    words = jnp.asarray(np.array([[5, 3, 2, 0, 0, 0]], np.int32))
    out = rmi._recur_attn_fusion(text, cfg2, visual, lang, words)
    assert out.shape == (n, h, w, 256)
    assert np.isfinite(np.asarray(out)).all()


def test_deeplab_shapes():
    params = deeplab.init_params(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 64, 3))
    feat = deeplab.apply(params, x, intermediate=True)
    assert feat.shape == (1, 8, 8, 2048)


def test_rmi_full_forward_jit():
    cfg = MatchingConfig(H=64, W=64, vf_h=8, vf_w=8, vocab_size=20, max_len=5,
                         w_emb_dim=16, v_emb_dim=16, w_rnn_size=16, m_rnn_size=8,
                         batch_size=1)
    params = rmi.init_params(jax.random.PRNGKey(3), cfg)
    fwd = jax.jit(lambda p, im, w, sl: rmi.apply(p, cfg, im, w, sl))
    im = jnp.zeros((1, 64, 64, 3))
    words = jnp.asarray(np.array([[2, 3, 4, 0, 0]], np.int32))
    seq_len = jnp.asarray(np.array([3], np.int32))
    out = fwd(params, im, words, seq_len)
    assert out.up.shape == (1, 64, 64, 1)
    assert out.sigm.shape == (1, 64, 64, 1)
    assert out.pred.shape == (1, 8, 8, 1)
    s = np.asarray(out.sigm)
    assert np.isfinite(s).all() and (s >= 0).all() and (s <= 1).all()
