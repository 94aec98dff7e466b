"""RMI referring-expression segmentation model, TPU-first.

Reference: ``Instance_Matching/RMI_model.py``.  Architecture: DeepLab-v2
features (1x96x96x2048) -> 1x1 conv to 1000-d + L2 norm; 8-d spatial coords;
1000-d word embeddings; word LSTM (1000); multimodal LSTM (500) run over
every feature-map cell as an independent sequence of length <=15; atanh-like
output transform; 1x1 conv to 1 channel; bilinear upsample to 768; sigmoid.

TPU redesign of the hot op
--------------------------
The reference feeds ``tf.nn.dynamic_rnn`` a materialized
[N*96*96, 15, 3008] tensor (tiling visual+spatial features over time and
word+sentence features over pixels -- ``RMI_model.py:169-200``), ~2.6 GB of
HBM traffic per step.  Here the mLSTM input projection is *factored*:

  gates[p, t] = visual[p] @ W_v + spatial[p] @ W_s        (pixel term, once)
              + emb[t] @ W_w + lang[t] @ W_l + b           (step term, tiny)
              + h[p, t-1] @ W_h                            (recurrent matmul)

which is mathematically identical (matmul distributes over the concat) but
reduces the per-step work to one [P, 500] x [500, 2000] MXU matmul with a
[P, 2000] carry -- the main lever for the passes/sec target.  The weight
``mLSTM/w`` keeps the exact TF row layout [3008+500, 2000] so checkpoints
map 1:1.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MatchingConfig
from ..ops.conv import conv2d
from ..ops.image import tf1_resize_bilinear
from ..ops.lstm import masked_lstm_scan
from ..ops.pallas_mlstm import (attn_weighted_pixel_lstm, masked_pixel_lstm,
                                recur_attn_pixel_lstm)
from ..ops.norm import l2_normalize
from ..ops.spatial import generate_spatial_batch
from ..ops.activations import atanh_transform
from . import deeplab

Params = Dict[str, Any]


def _backbone(cfg: "MatchingConfig"):
    """(scope key, init_fn, apply_fn, feature dim) for cfg.backbone
    (reference ``RMI_model.py:64-107`` weight-name dispatch)."""
    if cfg.backbone == "deeplab":
        return ("ResNet", deeplab.init_params,
                lambda p, x, cd: deeplab.apply(p, x, intermediate=True,
                                               compute_dtype=cd), 2048)
    from . import backbones
    mod = {"fcn_8s": backbones.fcn8s, "segnet": backbones.segnet,
           "deeplab_v3plus": backbones.deeplab_v3plus}[cfg.backbone]
    # v3plus intermediate = pre-ASPP backbone output, "(1, 96, 96, 2048)"
    # (``RMI_model.py:105-109``, ``deeplab_v3plus_model.py:568-583``)
    dim = {"fcn_8s": 256, "segnet": 512, "deeplab_v3plus": 2048}[cfg.backbone]

    def init(key):
        return mod.init_params(key)[mod.SCOPE]

    def apply_fn(p, x, cd):
        return mod.apply({mod.SCOPE: p}, x, intermediate=True,
                         compute_dtype=cd)
    return (mod.SCOPE, init, apply_fn, dim)


def _glorot(key, shape):
    fan_in, fan_out = shape[0], shape[1]
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -limit, limit)


def _xavier_conv(key, shape):
    fan_in = shape[0] * shape[1] * shape[2]
    fan_out = shape[0] * shape[1] * shape[3]
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -limit, limit)


def init_params(key, cfg: MatchingConfig) -> Params:
    """Parameter tree: ``ResNet/*`` (backbone) + ``text_sketchyscene/*``."""
    k_bb, k_proj, k_emb, k_w, k_m, k_out, k_attn = jax.random.split(key, 7)
    if cfg.fusion_type == "RecurAttn":
        # mLSTM consumes the attended sentence vector (RMI_model.py:254-263)
        fusion_in = cfg.w_rnn_size
    else:
        fusion_in = cfg.v_emb_dim + cfg.w_emb_dim + cfg.w_rnn_size + 8
    vf_dim = _backbone(cfg)[3]
    text: Params = {
        "visual_feat_projection": {
            "DW": _xavier_conv(k_proj, (1, 1, vf_dim, cfg.v_emb_dim)),
            "biases": jnp.zeros((cfg.v_emb_dim,), jnp.float32),
        },
        "embedding": jax.random.uniform(k_emb, (cfg.vocab_size, cfg.w_emb_dim),
                                        jnp.float32, -0.08, 0.08),
        "wLSTM": {
            "w": _glorot(k_w, (cfg.w_emb_dim + cfg.w_rnn_size, 4 * cfg.w_rnn_size)),
            "b": jnp.zeros((4 * cfg.w_rnn_size,), jnp.float32),
        },
        "mLSTM": {
            "w": _glorot(k_m, (fusion_in + cfg.m_rnn_size, 4 * cfg.m_rnn_size)),
            "b": jnp.zeros((4 * cfg.m_rnn_size,), jnp.float32),
        },
        "m_lstm_output_projection": {
            "DW": _xavier_conv(k_out, (1, 1, cfg.m_rnn_size, 1)),
            "biases": jnp.zeros((1,), jnp.float32),
        },
    }
    if cfg.use_attn:
        text["attn_fc"] = {
            "DW": _glorot(k_attn, (cfg.w_rnn_size, 1)),
            "biases": jnp.zeros((1,), jnp.float32),
        }
    if cfg.fusion_type == "RecurAttn":
        text["h_proj"] = {
            "DW": _glorot(k_attn, (cfg.m_rnn_size, cfg.w_rnn_size)),
            "biases": jnp.zeros((cfg.w_rnn_size,), jnp.float32),
        }
    scope, bb_init, _, _ = _backbone(cfg)
    return {
        scope: bb_init(k_bb),
        "text_sketchyscene": text,
    }


def _rmi_fusion(text: Params, cfg: MatchingConfig,
                visual_norm: jnp.ndarray,   # [N, h, w, v_emb]
                spatial: jnp.ndarray,       # [N, h, w, 8]
                emb: jnp.ndarray,           # [N, T, w_emb]
                lang: jnp.ndarray,          # [N, T, w_rnn] (L2-normed wLSTM out)
                seq_len: jnp.ndarray,       # [N]
                ) -> jnp.ndarray:
    """Factored mLSTM over all pixels; returns m_last_h [N, h, w, m_rnn]."""
    n, h, w, _ = visual_norm.shape
    t_max = emb.shape[1]
    m = cfg.m_rnn_size
    wm = text["mLSTM"]["w"]
    bm = text["mLSTM"]["b"]
    v_dim, w_dim, l_dim = cfg.v_emb_dim, cfg.w_emb_dim, cfg.w_rnn_size
    w_v = wm[:v_dim]
    w_w = wm[v_dim:v_dim + w_dim]
    w_l = wm[v_dim + w_dim:v_dim + w_dim + l_dim]
    w_s = wm[v_dim + w_dim + l_dim:v_dim + w_dim + l_dim + 8]
    w_h = wm[v_dim + w_dim + l_dim + 8:]

    pixel_term = (visual_norm.reshape(n, h * w, v_dim) @ w_v
                  + spatial.reshape(n, h * w, 8) @ w_s)          # [N, P, 4m]
    step_term = emb @ w_w + lang @ w_l + bm                      # [N, T, 4m]

    valid = jnp.arange(t_max)[None, :] < seq_len[:, None]            # [N, T]

    if cfg.use_attn:
        # word-attention variant (``RMI_model.py:203-217``): the output is
        # the softmax(fc(lang))-weighted sum of per-step h's.  The fused
        # kernel accumulates that sum in VMEM alongside the recurrence
        # (``ops/pallas_mlstm.attn_weighted_pixel_lstm``); gradients come
        # from the identical scan formulation, including d_attn.
        attn_logits = (lang.reshape(n * t_max, l_dim) @ text["attn_fc"]["DW"]
                       + text["attn_fc"]["biases"]).reshape(n, t_max)
        attn = jax.nn.softmax(attn_logits, axis=-1)              # [N, T]
        if cfg.shard_mlstm_pixels:
            from jax.sharding import PartitionSpec as P
            acc = jax.shard_map(
                attn_weighted_pixel_lstm,
                in_specs=(P("data", "model", None), P("data", None, None),
                          P(None, None), P("data", None), P("data", None)),
                out_specs=P("data", "model", None), check_vma=False,
            )(pixel_term, step_term, w_h, valid, attn)
        else:
            acc = attn_weighted_pixel_lstm(pixel_term, step_term, w_h,
                                           valid, attn)
        return acc.reshape(n, h, w, m)

    if cfg.shard_mlstm_pixels:
        # tensor parallelism over the pixel-batch dim: every pixel's sequence
        # is independent, so sharding P over 'model' needs no collectives
        # inside the recurrence (weights replicated; XLA only all-gathers at
        # the reshape back to the feature map).  shard_map keeps the Pallas
        # kernel on the per-shard recurrence (a custom call cannot be
        # auto-sharded by jit, but inside shard_map each shard runs the
        # kernel on its own VMEM-resident slice).  Requires an ambient mesh
        # (``jax.set_mesh``) with ('data', 'model') axes.
        from jax.sharding import PartitionSpec as P
        m_last = jax.shard_map(
            masked_pixel_lstm,
            in_specs=(P("data", "model", None), P("data", None, None),
                      P(None, None), P("data", None)),
            out_specs=P("data", "model", None),
            # the pallas_call's out_shape carries no varying-mesh-axes
            # annotation; correctness is covered by the TP-parity tests
            check_vma=False,
        )(pixel_term, step_term, w_h, valid)
        return m_last.reshape(n, h, w, m)

    # hot path: fused Pallas recurrence (VMEM-resident carry; see
    # ops/pallas_mlstm.py), scan-equivalent gradients
    m_last = masked_pixel_lstm(pixel_term, step_term, w_h, valid)
    return m_last.reshape(n, h, w, m)


def _recur_attn_fusion(text: Params, cfg: MatchingConfig,
                       visual_norm: jnp.ndarray,   # [N, h, w, v_emb(=m)]
                       lang_out: jnp.ndarray,      # [N, T, w_rnn] raw wLSTM outputs
                       words: jnp.ndarray,         # [N, T]
                       ) -> jnp.ndarray:
    """LBIE-style recurrent-attention fusion (reference ``RMI_model.py:224-273``).

    Per word step (skipped when the token is <pad>): project h to the word
    space, softmax-attend over the wLSTM outputs, feed the attended vector to
    the mLSTM.  h is initialized from the visual features.

    On TPU this runs the fused Pallas kernel
    (``ops/pallas_mlstm.recur_attn_pixel_lstm``): every step's input depends
    on h (no precomputable pixel term), so keeping h/c and the attended
    features VMEM-resident saves the scan's per-step HBM carry round-trips.
    Gradients come from the identical scan formulation.
    """
    n, h, w, v_dim = visual_norm.shape
    m = cfg.m_rnn_size
    h0 = visual_norm.reshape(n, h * w, v_dim)
    args = (h0, lang_out, text["h_proj"]["DW"], text["h_proj"]["biases"],
            text["mLSTM"]["w"], text["mLSTM"]["b"], words != 0)
    if cfg.shard_mlstm_pixels:
        # pixel sequences are independent, so sharding P over 'model' needs
        # no collectives inside the recurrence (see _rmi_fusion)
        from jax.sharding import PartitionSpec as P
        hh = jax.shard_map(
            recur_attn_pixel_lstm,
            in_specs=(P("data", "model", None), P("data", None, None),
                      P(None, None), P(None), P(None, None), P(None),
                      P("data", None)),
            out_specs=P("data", "model", None), check_vma=False,
        )(*args)
    else:
        hh = recur_attn_pixel_lstm(*args)
    return hh.reshape(n, h, w, m)


class RMIOutputs(NamedTuple):
    up: jnp.ndarray      # [N, H, W, 1] logits at full resolution
    sigm: jnp.ndarray    # sigmoid(up)
    pred: jnp.ndarray    # [N, h, w, 1] logits at feature resolution


def apply(params: Params, cfg: MatchingConfig,
          images: jnp.ndarray,        # [N, H, W, 3] mean-subtracted
          words: jnp.ndarray,         # [N, T] int32 (end-padded)
          seq_len: jnp.ndarray,       # [N] int32
          ) -> RMIOutputs:
    visual_norm = extract_visual(params, cfg, images)
    return apply_fused(params, cfg, visual_norm, words, seq_len)


def extract_visual(params: Params, cfg: MatchingConfig,
                   images: jnp.ndarray) -> jnp.ndarray:
    """Backbone + 1x1 projection + L2 norm: the instruction-independent half
    of the model ([N, h, w, v_emb]).

    ``cfg.compute_dtype='bfloat16'`` opens a compute-dtype scope over the
    whole extraction: every conv stores bf16 activations (halved HBM
    traffic; MXU math is bf16 either way under XLA's default precision --
    see ``ops/conv.py``)."""
    from ..ops.conv import compute_dtype_scope
    scope, _, bb_apply, _ = _backbone(cfg)
    with compute_dtype_scope(cfg.compute_dtype):
        feat = bb_apply(params[scope], images, None)
        text = params["text_sketchyscene"]
        visual = conv2d(feat, text["visual_feat_projection"]["DW"]) \
            + text["visual_feat_projection"]["biases"]
    return l2_normalize(visual.astype(jnp.float32), axis=-1)


def apply_fused(params: Params, cfg: MatchingConfig,
                visual_norm: jnp.ndarray,   # [Nv, h, w, v_emb], Nv in {1, N}
                words: jnp.ndarray, seq_len: jnp.ndarray) -> RMIOutputs:
    """Instruction-dependent half.  ``visual_norm`` may carry batch 1 for N
    instructions against one sketch (batched serving): every layer is
    batch-independent, so broadcasting is bitwise-equal to recomputing."""
    text = params["text_sketchyscene"]
    n = words.shape[0]
    if visual_norm.shape[0] != n:
        visual_norm = jnp.broadcast_to(visual_norm,
                                       (n, *visual_norm.shape[1:]))
    spatial = jnp.asarray(generate_spatial_batch(n, cfg.vf_h, cfg.vf_w))
    emb = text["embedding"][words]                               # [N, T, w_emb]
    w_out, _ = masked_lstm_scan(emb, seq_len, text["wLSTM"]["w"],
                                text["wLSTM"]["b"], cfg.w_rnn_size)

    if cfg.fusion_type == "RMI":
        lang = l2_normalize(w_out, axis=-1)
        m_last = _rmi_fusion(text, cfg, visual_norm, spatial, emb, lang, seq_len)
    else:
        m_last = _recur_attn_fusion(text, cfg, visual_norm, w_out, words)

    y = atanh_transform(m_last)
    pred = conv2d(y, text["m_lstm_output_projection"]["DW"]) \
        + text["m_lstm_output_projection"]["biases"]             # [N, h, w, 1]
    up = tf1_resize_bilinear(pred, cfg.H, cfg.W)
    return RMIOutputs(up=up, sigm=jax.nn.sigmoid(up), pred=pred)
