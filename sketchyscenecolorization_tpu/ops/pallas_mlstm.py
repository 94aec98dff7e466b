"""Pallas TPU kernel for the multimodal conv-LSTM (mLSTM) recurrence.

This is the hottest op in the framework: the reference runs
``tf.nn.dynamic_rnn`` over 96*96 = 9216 independent pixel sequences of
length <=15 on a materialized [9216, 15, 3008] tensor
(``Instance_Matching/RMI_model.py:169-200``); the same cell also powers the
FG/BG text-fusion LSTMs (``models_collection.py:150-248``).

After factoring the input projection (see ``models/rmi.py``), one step is

    gates[p] = pixel_term[p] + step_term[t] + h[p] @ W_h
    c, h     = LSTM(gates, c)        (TF BasicLSTMCell, forget_bias 1)

An XLA ``lax.scan`` re-reads ``pixel_term`` ([P, 4H], ~74 MB at full size)
and round-trips the [P, 2H] carry through HBM on *every* step — ~1.7 GB of
HBM traffic for T=15.  This kernel tiles P onto the grid, loads each
``pixel_term`` tile into VMEM once, keeps h/c in VMEM for the whole
recurrence, and runs the T matmuls back-to-back on the MXU: HBM traffic
drops to one read of ``pixel_term`` + one write of ``h``.

Validity masking is a per-(batch, step) flag so the same kernel serves both
masking schemes: ``t < seq_len`` (matching mLSTM, end-padded) and
``token != 0`` (FG/BG fusion, front-padded).

The public entry ``masked_pixel_lstm`` carries a custom VJP whose backward
pass is the VJP of the identical ``lax.scan`` formulation (recomputed), so
training through it gives exactly the scan gradients.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lstm import lstm_cell

DEFAULT_TILE_P = 256


def _mlstm_kernel(valid_ref, pixel_ref, step_ref, wh_ref, out_ref, *,
                  t_max: int, hidden: int):
    """One (batch, pixel-tile) program: full T-step recurrence in VMEM.

    valid_ref: [N, T] int32 (SMEM, whole array -- a (1, T) block would
    violate the TPU block-shape rule for N > 1, and N*T scalars fit SMEM
    trivially); pixel_ref: [1, TILE, 4H]; step_ref: [1, T, 4H];
    wh_ref: [H, 4H]; out_ref: [1, TILE, H].
    """
    i_b = pl.program_id(0)
    tile = pixel_ref.shape[1]
    pixel = pixel_ref[0]
    c = jnp.zeros((tile, hidden), jnp.float32)
    h = jnp.zeros((tile, hidden), jnp.float32)
    for t in range(t_max):  # static unroll: T <= 15
        gates = pixel + step_ref[0, t, :][None, :] + jnp.dot(
            h, wh_ref[:], preferred_element_type=jnp.float32)
        new_c, new_h = lstm_cell(gates, c)
        keep = valid_ref[i_b, t] > 0
        c = jnp.where(keep, new_c, c)
        h = jnp.where(keep, new_h, h)
    out_ref[0] = h


def mlstm_pallas(pixel_term: jnp.ndarray,   # [N, P, 4H] f32
                 step_term: jnp.ndarray,    # [N, T, 4H] f32
                 w_h: jnp.ndarray,          # [H, 4H] f32
                 valid: jnp.ndarray,        # [N, T] bool/int
                 tile_p: int = DEFAULT_TILE_P,
                 interpret: Optional[bool] = None) -> jnp.ndarray:
    """Returns the final hidden state h [N, P, H]."""
    n, p, four_h = pixel_term.shape
    hidden = four_h // 4
    t_max = step_term.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # small pixel batches (FG text fusion: P=6*6) shrink the tile instead of
    # padding up to it -- the TPU block rule only needs 8-row alignment
    tile_p = min(tile_p, -(-p // 8) * 8)
    pad = (-p) % tile_p
    if pad:
        pixel_term = jnp.pad(pixel_term, ((0, 0), (0, pad), (0, 0)))
    num_tiles = (p + pad) // tile_p

    out = pl.pallas_call(
        functools.partial(_mlstm_kernel, t_max=t_max, hidden=hidden),
        grid=(n, num_tiles),
        in_specs=[
            pl.BlockSpec((n, t_max), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile_p, four_h), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_max, four_h), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, four_h), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_p, hidden), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, p + pad, hidden), jnp.float32),
        # the double-buffered pixel/out tiles plus the whole [H, 4H] weight
        # block exceed the default 16 MB scoped-vmem budget for the larger
        # LSTMs (BG fusion: H=1024 -> the weight block alone is 16 MB);
        # v5e has 128 MB of VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(valid.astype(jnp.int32), pixel_term.astype(jnp.float32),
      step_term.astype(jnp.float32), w_h.astype(jnp.float32))
    return out[:, :p]


def mlstm_scan(pixel_term: jnp.ndarray, step_term: jnp.ndarray,
               w_h: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Reference XLA formulation (identical math; used for the VJP and as
    the non-TPU fallback)."""
    n, p, four_h = pixel_term.shape
    hidden = four_h // 4

    def step(carry, inp):
        c, h = carry
        s_t, v_t = inp
        gates = pixel_term + s_t[:, None, :] + h @ w_h
        new_c, new_h = lstm_cell(gates, c)
        keep = v_t[:, None, None]
        c = jnp.where(keep, new_c, c)
        h = jnp.where(keep, new_h, h)
        return (c, h), None

    c0 = jnp.zeros((n, p, hidden), jnp.float32)
    (c, h), _ = jax.lax.scan(
        step, (c0, c0),
        (jnp.swapaxes(step_term, 0, 1),
         jnp.swapaxes(valid.astype(bool), 0, 1)))
    return h


def _mlstm_attn_kernel(valid_ref, attn_ref, pixel_ref, step_ref, wh_ref,
                       out_ref, *, t_max: int, hidden: int):
    """Word-attention variant (``RMI_model.py:203-217``): instead of the
    final h, emit the attention-weighted sum of *per-step* outputs,
    ``acc = sum_t attn[t] * out_t`` with ``out_t = h_t`` for valid steps and
    0 past the sequence length (dynamic_rnn zero-padding).  The accumulator
    lives in VMEM next to h/c, so the variant costs one extra FMA per step
    over the plain kernel -- no [P, T, H] trajectory is ever materialized.
    """
    i_b = pl.program_id(0)
    tile = pixel_ref.shape[1]
    pixel = pixel_ref[0]
    c = jnp.zeros((tile, hidden), jnp.float32)
    h = jnp.zeros((tile, hidden), jnp.float32)
    acc = jnp.zeros((tile, hidden), jnp.float32)
    for t in range(t_max):  # static unroll: T <= 15
        gates = pixel + step_ref[0, t, :][None, :] + jnp.dot(
            h, wh_ref[:], preferred_element_type=jnp.float32)
        new_c, new_h = lstm_cell(gates, c)
        keep = valid_ref[i_b, t] > 0
        c = jnp.where(keep, new_c, c)
        h = jnp.where(keep, new_h, h)
        acc = acc + jnp.where(keep, attn_ref[i_b, t] * h, 0.0)
    out_ref[0] = acc


def mlstm_attn_pallas(pixel_term: jnp.ndarray,   # [N, P, 4H] f32
                      step_term: jnp.ndarray,    # [N, T, 4H] f32
                      w_h: jnp.ndarray,          # [H, 4H] f32
                      valid: jnp.ndarray,        # [N, T] bool/int
                      attn: jnp.ndarray,         # [N, T] f32 softmax weights
                      tile_p: int = DEFAULT_TILE_P,
                      interpret: Optional[bool] = None) -> jnp.ndarray:
    """Returns the attention-weighted output sum acc [N, P, H]."""
    n, p, four_h = pixel_term.shape
    hidden = four_h // 4
    t_max = step_term.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    tile_p = min(tile_p, -(-p // 8) * 8)
    pad = (-p) % tile_p
    if pad:
        pixel_term = jnp.pad(pixel_term, ((0, 0), (0, pad), (0, 0)))
    num_tiles = (p + pad) // tile_p

    out = pl.pallas_call(
        functools.partial(_mlstm_attn_kernel, t_max=t_max, hidden=hidden),
        grid=(n, num_tiles),
        in_specs=[
            pl.BlockSpec((n, t_max), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n, t_max), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile_p, four_h), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_max, four_h), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, four_h), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_p, hidden), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, p + pad, hidden), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(valid.astype(jnp.int32), attn.astype(jnp.float32),
      pixel_term.astype(jnp.float32), step_term.astype(jnp.float32),
      w_h.astype(jnp.float32))
    return out[:, :p]


def mlstm_attn_scan(pixel_term: jnp.ndarray, step_term: jnp.ndarray,
                    w_h: jnp.ndarray, valid: jnp.ndarray,
                    attn: jnp.ndarray) -> jnp.ndarray:
    """XLA formulation of the attention-weighted variant (identical math;
    VJP source and non-TPU fallback)."""
    n, p, four_h = pixel_term.shape
    hidden = four_h // 4

    def step(carry, inp):
        c, h, acc = carry
        s_t, v_t, a_t = inp
        gates = pixel_term + s_t[:, None, :] + h @ w_h
        new_c, new_h = lstm_cell(gates, c)
        keep = v_t[:, None, None]
        c = jnp.where(keep, new_c, c)
        h = jnp.where(keep, new_h, h)
        acc = acc + jnp.where(keep, a_t[:, None, None] * h, 0.0)
        return (c, h, acc), None

    z = jnp.zeros((n, p, hidden), jnp.float32)
    (c, h, acc), _ = jax.lax.scan(
        step, (z, z, z),
        (jnp.swapaxes(step_term, 0, 1),
         jnp.swapaxes(valid.astype(bool), 0, 1),
         jnp.swapaxes(attn.astype(jnp.float32), 0, 1)))
    return acc


@jax.custom_vjp
def attn_weighted_pixel_lstm(pixel_term, step_term, w_h, valid, attn):
    """Fused forward AND fused BPTT backward on TPU (scan + scan-VJP
    elsewhere); gradients include d_attn, which flows back into the
    attention projection."""
    if jax.default_backend() == "tpu":
        return mlstm_attn_pallas(pixel_term, step_term, w_h, valid, attn)
    if os.environ.get("MLSTM_PALLAS_INTERPRET") == "1":
        return mlstm_attn_pallas(pixel_term, step_term, w_h, valid, attn,
                                 interpret=True)
    return mlstm_attn_scan(pixel_term, step_term, w_h, valid, attn)


def _attn_fwd(pixel_term, step_term, w_h, valid, attn):
    return (attn_weighted_pixel_lstm(pixel_term, step_term, w_h, valid, attn),
            (pixel_term, step_term, w_h, valid, attn))


def _attn_bwd(res, g):
    pixel_term, step_term, w_h, valid, attn = res
    if jax.default_backend() == "tpu" or \
            os.environ.get("MLSTM_PALLAS_INTERPRET") == "1":
        d_pt, d_st, d_wh, d_attn = mlstm_attn_pallas_bwd(
            pixel_term, step_term, w_h, valid, attn, g)
        return d_pt, d_st, d_wh, None, d_attn
    _, vjp = jax.vjp(
        lambda pt, st, wh, a: mlstm_attn_scan(pt, st, wh, valid, a),
        pixel_term, step_term, w_h, attn)
    d_pt, d_st, d_wh, d_attn = vjp(g)
    return d_pt, d_st, d_wh, None, d_attn


attn_weighted_pixel_lstm.defvjp(_attn_fwd, _attn_bwd)


def _mlstm_attn_bwd_kernel(valid_ref, attn_ref, pixel_ref, step_ref, wh_ref,
                           g_ref, dpix_ref, dstep_ref, dwh_ref, dattn_ref,
                           h_stack, c_stack, *, t_max: int, hidden: int):
    """Fused BPTT for the word-attention variant: same staging/reverse-sweep
    structure as ``_mlstm_bwd_kernel``, with two deltas from the output being
    ``acc = sum_t attn[t] * h_t`` instead of the final h:

    - dh starts at 0 and gains ``attn[t] * g`` at every kept step (each h_t
      feeds the accumulator directly, on top of the recurrent backflow);
    - d_attn[t] = <g, h_t> summed over the pixel tile (h_t recomputed in the
      reverse sweep), accumulated across tiles via a revisited block.
    """
    i_b = pl.program_id(0)
    j_t = pl.program_id(1)
    tile = pixel_ref.shape[1]
    pixel = pixel_ref[0]
    c = jnp.zeros((tile, hidden), jnp.float32)
    h = jnp.zeros((tile, hidden), jnp.float32)
    for t in range(t_max):
        h_stack[t] = h
        c_stack[t] = c
        gates = pixel + step_ref[0, t, :][None, :] + jnp.dot(
            h, wh_ref[:], preferred_element_type=jnp.float32)
        new_c, new_h = lstm_cell(gates, c)
        keep = valid_ref[i_b, t] > 0
        c = jnp.where(keep, new_c, c)
        h = jnp.where(keep, new_h, h)

    @pl.when(j_t == 0)
    def _init_dstep():
        dstep_ref[0] = jnp.zeros_like(dstep_ref[0])

    @pl.when(jnp.logical_and(i_b == 0, j_t == 0))
    def _init_dwh():
        dwh_ref[...] = jnp.zeros_like(dwh_ref[...])

    @pl.when(j_t == 0)
    def _init_dattn():
        dattn_ref[0] = jnp.zeros_like(dattn_ref[0])

    dpix_ref[0] = jnp.zeros_like(dpix_ref[0])
    g = g_ref[0]
    dh = jnp.zeros((tile, hidden), jnp.float32)
    dc = jnp.zeros((tile, hidden), jnp.float32)
    dattn_rows = [None] * t_max
    for t in range(t_max - 1, -1, -1):
        keep = valid_ref[i_b, t] > 0
        h_prev = h_stack[t]
        c_prev = c_stack[t]
        gates = pixel + step_ref[0, t, :][None, :] + jnp.dot(
            h_prev, wh_ref[:], preferred_element_type=jnp.float32)
        i, j, f, o = (gates[:, k * hidden:(k + 1) * hidden] for k in range(4))
        si = jax.nn.sigmoid(i)
        tj = jnp.tanh(j)
        sf = jax.nn.sigmoid(f + 1.0)
        so = jax.nn.sigmoid(o)
        c_t = c_prev * sf + si * tj
        tc = jnp.tanh(c_t)
        h_t = so * tc                                    # post-step h if kept

        # acc-term contributions (zero when the step was masked)
        dattn_rows[t] = jnp.where(keep, jnp.sum(g * h_t), 0.0)
        dh = dh + jnp.where(keep, attn_ref[i_b, t] * g, 0.0)

        do = dh * tc * so * (1.0 - so)
        dct = dc + dh * so * (1.0 - tc * tc)
        df = dct * c_prev * sf * (1.0 - sf)
        di = dct * tj * si * (1.0 - si)
        dj = dct * si * (1.0 - tj * tj)
        dgates = jnp.concatenate([di, dj, df, do], axis=-1)
        dgates = jnp.where(keep, dgates, 0.0)

        dpix_ref[0] = dpix_ref[0] + dgates
        dstep_ref[0, t:t + 1] = dstep_ref[0, t:t + 1] \
            + jnp.sum(dgates, axis=0, keepdims=True)
        dwh_ref[...] = dwh_ref[...] + jnp.dot(
            h_prev.T, dgates, preferred_element_type=jnp.float32)
        dh_new = jnp.dot(dgates, wh_ref[:].T,
                         preferred_element_type=jnp.float32)
        dh = jnp.where(keep, dh_new, dh)
        dc = jnp.where(keep, dct * sf, dc)
    dattn_ref[0] = dattn_ref[0] + jnp.stack(dattn_rows)


def mlstm_attn_pallas_bwd(pixel_term, step_term, w_h, valid, attn, g,
                          tile_p: Optional[int] = None,
                          interpret: Optional[bool] = None):
    """Gradients (d_pixel_term, d_step_term, d_w_h, d_attn) of the
    attention-weighted output sum wrt the kernel inputs."""
    if tile_p is None:
        tile_p = DEFAULT_BWD_TILE_P
    n, p, four_h = pixel_term.shape
    hidden = four_h // 4
    t_max = step_term.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    tile_p = min(tile_p, -(-p // 8) * 8)
    pad = (-p) % tile_p
    if pad:
        pixel_term = jnp.pad(pixel_term, ((0, 0), (0, pad), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
    num_tiles = (p + pad) // tile_p

    dpix, dstep, dwh, dattn = pl.pallas_call(
        functools.partial(_mlstm_attn_bwd_kernel, t_max=t_max, hidden=hidden),
        grid=(n, num_tiles),
        in_specs=[
            pl.BlockSpec((n, t_max), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n, t_max), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile_p, four_h), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_max, four_h), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, four_h), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p, hidden), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_p, four_h), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            # revisited blocks: accumulated in place across the grid
            pl.BlockSpec((1, t_max, four_h), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, four_h), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_max), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, p + pad, four_h), jnp.float32),
            jax.ShapeDtypeStruct((n, t_max, four_h), jnp.float32),
            jax.ShapeDtypeStruct((hidden, four_h), jnp.float32),
            jax.ShapeDtypeStruct((n, t_max), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((t_max, tile_p, hidden), jnp.float32),
            pltpu.VMEM((t_max, tile_p, hidden), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(valid.astype(jnp.int32), attn.astype(jnp.float32),
      pixel_term.astype(jnp.float32), step_term.astype(jnp.float32),
      w_h.astype(jnp.float32), g.astype(jnp.float32))
    return dpix[:, :p], dstep, dwh, dattn


def _recur_attn_kernel(valid_ref, h0_ref, lang_ref, wp_ref, bp_ref, wm_ref,
                       bm_ref, out_ref, *, t_max: int, hidden: int,
                       w_rnn: int):
    """LBIE-style recurrent-attention fusion (``RMI_model.py:224-273``): per
    word step, project h to the word space, softmax-attend over the wLSTM
    outputs, and feed the attended vector to the mLSTM.  Unlike the plain
    mLSTM there is no precomputable pixel term -- EVERY step's input depends
    on h -- so the scan formulation round-trips the [P, 2H] carry AND the
    [P, w_rnn] attended features through HBM each step.  Here h/c stay in
    VMEM and the five per-step matmuls (h@Wp, h_proj.lang^T, attn@lang,
    attn_feat@Wm_a, h@Wm_h) run back-to-back on the MXU.

    valid_ref: [N, T] int32 (SMEM); h0_ref: [1, TILE, H] (the visual
    features -- RecurAttn initializes h from them); lang_ref: [1, T, w_rnn]
    raw wLSTM outputs; wp_ref/bp_ref: h->word projection; wm_ref: mLSTM
    weight [w_rnn+H, 4H] (TF row layout); out_ref: [1, TILE, H].
    """
    i_b = pl.program_id(0)
    tile = h0_ref.shape[1]
    lang = lang_ref[0]                                       # [T, w_rnn]
    wm_a = wm_ref[:w_rnn]                                    # [w_rnn, 4H]
    wm_h = wm_ref[w_rnn:]                                    # [H, 4H]
    c = jnp.zeros((tile, hidden), jnp.float32)
    h = h0_ref[0]
    for t in range(t_max):  # static unroll: T <= 15
        h_proj = jnp.dot(h, wp_ref[:],
                         preferred_element_type=jnp.float32) + bp_ref[0]
        logits = jax.lax.dot_general(                        # [tile, T]
            h_proj, lang, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(logits, axis=-1)
        attn_feat = jnp.dot(attn, lang,
                            preferred_element_type=jnp.float32)
        gates = jnp.dot(attn_feat, wm_a,
                        preferred_element_type=jnp.float32) \
            + jnp.dot(h, wm_h, preferred_element_type=jnp.float32) \
            + bm_ref[0]
        new_c, new_h = lstm_cell(gates, c)
        keep = valid_ref[i_b, t] > 0
        c = jnp.where(keep, new_c, c)
        h = jnp.where(keep, new_h, h)
    out_ref[0] = h


def recur_attn_pallas(h0: jnp.ndarray,      # [N, P, H] f32 (visual features)
                      lang: jnp.ndarray,    # [N, T, w_rnn] f32 wLSTM outputs
                      wp: jnp.ndarray,      # [H, w_rnn] f32
                      bp: jnp.ndarray,      # [w_rnn] f32
                      wm: jnp.ndarray,      # [w_rnn + H, 4H] f32
                      bm: jnp.ndarray,      # [4H] f32
                      valid: jnp.ndarray,   # [N, T] bool/int
                      tile_p: int = DEFAULT_TILE_P,
                      interpret: Optional[bool] = None) -> jnp.ndarray:
    """Returns the final hidden state h [N, P, H]."""
    n, p, hidden = h0.shape
    t_max, w_rnn = lang.shape[1], lang.shape[2]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    tile_p = min(tile_p, -(-p // 8) * 8)
    pad = (-p) % tile_p
    if pad:
        h0 = jnp.pad(h0, ((0, 0), (0, pad), (0, 0)))
    num_tiles = (p + pad) // tile_p

    out = pl.pallas_call(
        functools.partial(_recur_attn_kernel, t_max=t_max, hidden=hidden,
                          w_rnn=w_rnn),
        grid=(n, num_tiles),
        in_specs=[
            pl.BlockSpec((n, t_max), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile_p, hidden), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_max, w_rnn), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, w_rnn), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w_rnn), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_rnn + hidden, 4 * hidden), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * hidden), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_p, hidden), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, p + pad, hidden), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(valid.astype(jnp.int32), h0.astype(jnp.float32),
      lang.astype(jnp.float32), wp.astype(jnp.float32),
      bp.astype(jnp.float32).reshape(1, -1), wm.astype(jnp.float32),
      bm.astype(jnp.float32).reshape(1, -1))
    return out[:, :p]


def recur_attn_scan(h0: jnp.ndarray, lang: jnp.ndarray, wp: jnp.ndarray,
                    bp: jnp.ndarray, wm: jnp.ndarray, bm: jnp.ndarray,
                    valid: jnp.ndarray) -> jnp.ndarray:
    """XLA formulation (identical math; VJP source and non-TPU fallback)."""
    n, p, hidden = h0.shape
    lang_t = jnp.swapaxes(lang, 1, 2)                        # [N, w_rnn, T]

    def step(carry, v_t):
        c, h = carry
        h_proj = h @ wp + bp                                 # [N, P, w_rnn]
        attn = jax.nn.softmax(
            jnp.einsum("npd,ndt->npt", h_proj, lang_t), axis=-1)
        attn_feat = jnp.einsum("npt,ntd->npd", attn, lang)   # [N, P, w_rnn]
        gates = jnp.concatenate([attn_feat, h], axis=-1) @ wm + bm
        new_c, new_h = lstm_cell(gates, c)
        keep = v_t[:, None, None]
        c = jnp.where(keep, new_c, c)
        h = jnp.where(keep, new_h, h)
        return (c, h), None

    c0 = jnp.zeros((n, p, hidden), jnp.float32)
    (c, h), _ = jax.lax.scan(step, (c0, h0),
                             jnp.swapaxes(valid.astype(bool), 0, 1))
    return h


def _recur_attn_bwd_kernel(valid_ref, h0_ref, lang_ref, wp_ref, bp_ref,
                           wm_ref, bm_ref, g_ref, dh0_ref, dlang_ref,
                           dwp_ref, dbp_ref, dwm_ref, dbm_ref,
                           h_stack, c_stack, *, t_max: int, hidden: int,
                           w_rnn: int):
    """Fused BPTT for the RecurAttn fusion: forward recomputed with the h/c
    trajectories staged in VMEM scratch, then the reverse sweep recomputes
    each step's attention (h_proj -> logits -> softmax -> attended vector)
    and backpropagates through it analytically -- softmax VJP
    ``y*(g - <g,y>)``, both lang contributions (the logits contraction and
    the attention-weighted sum), and the h->word projection -- entirely in
    VMEM.  Weight/bias/lang gradients accumulate in revisited output blocks
    across the sequential TPU grid (same pattern as ``_mlstm_bwd_kernel``).
    """
    i_b = pl.program_id(0)
    j_t = pl.program_id(1)
    tile = h0_ref.shape[1]
    lang = lang_ref[0]                                       # [T, w_rnn]
    wm_a = wm_ref[:w_rnn]
    wm_h = wm_ref[w_rnn:]
    c = jnp.zeros((tile, hidden), jnp.float32)
    h = h0_ref[0]
    for t in range(t_max):
        h_stack[t] = h
        c_stack[t] = c
        h_proj = jnp.dot(h, wp_ref[:],
                         preferred_element_type=jnp.float32) + bp_ref[0]
        attn = jax.nn.softmax(jax.lax.dot_general(
            h_proj, lang, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32), axis=-1)
        x = jnp.dot(attn, lang, preferred_element_type=jnp.float32)
        gates = jnp.dot(x, wm_a, preferred_element_type=jnp.float32) \
            + jnp.dot(h, wm_h, preferred_element_type=jnp.float32) + bm_ref[0]
        new_c, new_h = lstm_cell(gates, c)
        keep = valid_ref[i_b, t] > 0
        c = jnp.where(keep, new_c, c)
        h = jnp.where(keep, new_h, h)

    @pl.when(j_t == 0)
    def _init_dlang():
        dlang_ref[0] = jnp.zeros_like(dlang_ref[0])

    @pl.when(jnp.logical_and(i_b == 0, j_t == 0))
    def _init_weight_grads():
        dwp_ref[...] = jnp.zeros_like(dwp_ref[...])
        dbp_ref[0] = jnp.zeros_like(dbp_ref[0])
        dwm_ref[...] = jnp.zeros_like(dwm_ref[...])
        dbm_ref[0] = jnp.zeros_like(dbm_ref[0])

    dh = g_ref[0]
    dc = jnp.zeros((tile, hidden), jnp.float32)
    for t in range(t_max - 1, -1, -1):
        keep = valid_ref[i_b, t] > 0
        h_prev = h_stack[t]
        c_prev = c_stack[t]
        # recompute the step
        h_proj = jnp.dot(h_prev, wp_ref[:],
                         preferred_element_type=jnp.float32) + bp_ref[0]
        attn = jax.nn.softmax(jax.lax.dot_general(
            h_proj, lang, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32), axis=-1)
        x = jnp.dot(attn, lang, preferred_element_type=jnp.float32)
        gates = jnp.dot(x, wm_a, preferred_element_type=jnp.float32) \
            + jnp.dot(h_prev, wm_h,
                      preferred_element_type=jnp.float32) + bm_ref[0]
        i, j, f, o = (gates[:, k * hidden:(k + 1) * hidden] for k in range(4))
        si = jax.nn.sigmoid(i)
        tj = jnp.tanh(j)
        sf = jax.nn.sigmoid(f + 1.0)
        so = jax.nn.sigmoid(o)
        c_t = c_prev * sf + si * tj
        tc = jnp.tanh(c_t)

        do = dh * tc * so * (1.0 - so)
        dct = dc + dh * so * (1.0 - tc * tc)
        df = dct * c_prev * sf * (1.0 - sf)
        di = dct * tj * si * (1.0 - si)
        dj = dct * si * (1.0 - tj * tj)
        dgates = jnp.concatenate([di, dj, df, do], axis=-1)
        dgates = jnp.where(keep, dgates, 0.0)    # masks every term below

        dx = jnp.dot(dgates, wm_a.T, preferred_element_type=jnp.float32)
        # softmax VJP: dlogits = attn * (dattn - <dattn, attn>)
        dattn = jax.lax.dot_general(                         # [tile, T]
            dx, lang, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dlogits = attn * (dattn
                          - jnp.sum(dattn * attn, axis=-1, keepdims=True))
        dhp = jnp.dot(dlogits, lang, preferred_element_type=jnp.float32)

        dwm_ref[:w_rnn] = dwm_ref[:w_rnn] + jnp.dot(
            x.T, dgates, preferred_element_type=jnp.float32)
        dwm_ref[w_rnn:] = dwm_ref[w_rnn:] + jnp.dot(
            h_prev.T, dgates, preferred_element_type=jnp.float32)
        dbm_ref[0] = dbm_ref[0] + jnp.sum(dgates, axis=0)
        dwp_ref[...] = dwp_ref[...] + jnp.dot(
            h_prev.T, dhp, preferred_element_type=jnp.float32)
        dbp_ref[0] = dbp_ref[0] + jnp.sum(dhp, axis=0)
        # lang feeds the logits contraction AND the attention-weighted sum
        dlang_ref[0] = dlang_ref[0] \
            + jax.lax.dot_general(attn, dx, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32) \
            + jax.lax.dot_general(dlogits, h_proj, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)

        dh_new = jnp.dot(dhp, wp_ref[:].T,
                         preferred_element_type=jnp.float32) \
            + jnp.dot(dgates, wm_h.T, preferred_element_type=jnp.float32)
        dh = jnp.where(keep, dh_new, dh)
        dc = jnp.where(keep, dct * sf, dc)
    dh0_ref[0] = dh


def recur_attn_pallas_bwd(h0, lang, wp, bp, wm, bm, valid, g,
                          tile_p: Optional[int] = None,
                          interpret: Optional[bool] = None):
    """Gradients (d_h0, d_lang, d_wp, d_bp, d_wm, d_bm) of the final hidden
    state wrt every RecurAttn input."""
    if tile_p is None:
        tile_p = DEFAULT_BWD_TILE_P
    n, p, hidden = h0.shape
    t_max, w_rnn = lang.shape[1], lang.shape[2]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    tile_p = min(tile_p, -(-p // 8) * 8)
    pad = (-p) % tile_p
    if pad:
        h0 = jnp.pad(h0, ((0, 0), (0, pad), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
    num_tiles = (p + pad) // tile_p

    dh0, dlang, dwp, dbp, dwm, dbm = pl.pallas_call(
        functools.partial(_recur_attn_bwd_kernel, t_max=t_max, hidden=hidden,
                          w_rnn=w_rnn),
        grid=(n, num_tiles),
        in_specs=[
            pl.BlockSpec((n, t_max), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile_p, hidden), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_max, w_rnn), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, w_rnn), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w_rnn), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_rnn + hidden, 4 * hidden), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * hidden), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p, hidden), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_p, hidden), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            # revisited blocks: accumulated in place across the grid
            pl.BlockSpec((1, t_max, w_rnn), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, w_rnn), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w_rnn), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_rnn + hidden, 4 * hidden), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * hidden), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, p + pad, hidden), jnp.float32),
            jax.ShapeDtypeStruct((n, t_max, w_rnn), jnp.float32),
            jax.ShapeDtypeStruct((hidden, w_rnn), jnp.float32),
            jax.ShapeDtypeStruct((1, w_rnn), jnp.float32),
            jax.ShapeDtypeStruct((w_rnn + hidden, 4 * hidden), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * hidden), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((t_max, tile_p, hidden), jnp.float32),
            pltpu.VMEM((t_max, tile_p, hidden), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(valid.astype(jnp.int32), h0.astype(jnp.float32),
      lang.astype(jnp.float32), wp.astype(jnp.float32),
      bp.astype(jnp.float32).reshape(1, -1), wm.astype(jnp.float32),
      bm.astype(jnp.float32).reshape(1, -1), g.astype(jnp.float32))
    return (dh0[:, :p], dlang, dwp, dbp.reshape(-1), dwm, dbm.reshape(-1))


@jax.custom_vjp
def recur_attn_pixel_lstm(h0, lang, wp, bp, wm, bm, valid):
    """Fused forward AND fused BPTT backward on TPU (scan + scan-VJP
    elsewhere).  Non-default config path (``fusion_type='RecurAttn'``)."""
    if jax.default_backend() == "tpu":
        return recur_attn_pallas(h0, lang, wp, bp, wm, bm, valid)
    if os.environ.get("MLSTM_PALLAS_INTERPRET") == "1":
        return recur_attn_pallas(h0, lang, wp, bp, wm, bm, valid,
                                 interpret=True)
    return recur_attn_scan(h0, lang, wp, bp, wm, bm, valid)


def _recur_attn_fwd(h0, lang, wp, bp, wm, bm, valid):
    return (recur_attn_pixel_lstm(h0, lang, wp, bp, wm, bm, valid),
            (h0, lang, wp, bp, wm, bm, valid))


def _recur_attn_bwd(res, g):
    h0, lang, wp, bp, wm, bm, valid = res
    if jax.default_backend() == "tpu" or \
            os.environ.get("MLSTM_PALLAS_INTERPRET") == "1":
        return (*recur_attn_pallas_bwd(h0, lang, wp, bp, wm, bm, valid, g),
                None)
    _, vjp = jax.vjp(
        lambda h0_, lang_, wp_, bp_, wm_, bm_:
            recur_attn_scan(h0_, lang_, wp_, bp_, wm_, bm_, valid),
        h0, lang, wp, bp, wm, bm)
    return (*vjp(g), None)


recur_attn_pixel_lstm.defvjp(_recur_attn_fwd, _recur_attn_bwd)


def _mlstm_bwd_kernel(valid_ref, pixel_ref, step_ref, wh_ref, g_ref,
                      dpix_ref, dstep_ref, dwh_ref, h_stack, c_stack, *,
                      t_max: int, hidden: int):
    """Fused BPTT for one (batch, pixel-tile): forward recomputed with the
    h/c trajectories staged in VMEM scratch, then the reverse sweep runs the
    T gate-gradient matmuls back-to-back on the MXU.  HBM traffic is one
    read of ``pixel_term`` + one write of each gradient -- the scan VJP
    instead round-trips the [P, 2H] carry and re-reads pixel_term on every
    step of both passes (~3.4 GB per matching train step at full size).

    Gate-gradient algebra matches jax's sigmoid/tanh VJPs exactly, so the
    gradients agree with the lax.scan formulation to float rounding.

    dstep_ref / dwh_ref are *revisited* output blocks (their index maps
    ignore the tile -- and for dwh also the batch -- grid dims): the TPU
    grid runs sequentially on the core, so the kernel zero-initializes them
    on first visit and accumulates in place, avoiding materialized
    per-tile partials.

    All three gradient accumulators read-modify-write their VMEM refs
    inside the step loop rather than accumulating in kernel-local values:
    a local dwh is [H, 4H] (16 MB for the BG fusion's H=1024) live across
    the whole unrolled loop, which the register allocator can only spill
    (measured: 110 MB of spill slots -> VMEM OOM at H=1024).
    """
    i_b = pl.program_id(0)
    j_t = pl.program_id(1)
    tile = pixel_ref.shape[1]
    pixel = pixel_ref[0]
    c = jnp.zeros((tile, hidden), jnp.float32)
    h = jnp.zeros((tile, hidden), jnp.float32)
    # forward, staging the *previous* state of every step
    for t in range(t_max):
        h_stack[t] = h
        c_stack[t] = c
        gates = pixel + step_ref[0, t, :][None, :] + jnp.dot(
            h, wh_ref[:], preferred_element_type=jnp.float32)
        new_c, new_h = lstm_cell(gates, c)
        keep = valid_ref[i_b, t] > 0
        c = jnp.where(keep, new_c, c)
        h = jnp.where(keep, new_h, h)

    # revisited accumulators: zero on first visit, add in place afterwards
    @pl.when(j_t == 0)
    def _init_dstep():
        dstep_ref[0] = jnp.zeros_like(dstep_ref[0])

    @pl.when(jnp.logical_and(i_b == 0, j_t == 0))
    def _init_dwh():
        dwh_ref[...] = jnp.zeros_like(dwh_ref[...])

    dpix_ref[0] = jnp.zeros_like(dpix_ref[0])
    dh = g_ref[0]
    dc = jnp.zeros((tile, hidden), jnp.float32)
    for t in range(t_max - 1, -1, -1):
        keep = valid_ref[i_b, t] > 0
        h_prev = h_stack[t]
        c_prev = c_stack[t]
        gates = pixel + step_ref[0, t, :][None, :] + jnp.dot(
            h_prev, wh_ref[:], preferred_element_type=jnp.float32)
        i, j, f, o = (gates[:, k * hidden:(k + 1) * hidden] for k in range(4))
        si = jax.nn.sigmoid(i)
        tj = jnp.tanh(j)
        sf = jax.nn.sigmoid(f + 1.0)
        so = jax.nn.sigmoid(o)
        c_t = c_prev * sf + si * tj
        tc = jnp.tanh(c_t)

        do = dh * tc * so * (1.0 - so)
        dct = dc + dh * so * (1.0 - tc * tc)
        df = dct * c_prev * sf * (1.0 - sf)
        di = dct * tj * si * (1.0 - si)
        dj = dct * si * (1.0 - tj * tj)
        dgates = jnp.concatenate([di, dj, df, do], axis=-1)
        dgates = jnp.where(keep, dgates, 0.0)

        dpix_ref[0] = dpix_ref[0] + dgates
        dstep_ref[0, t:t + 1] = dstep_ref[0, t:t + 1] \
            + jnp.sum(dgates, axis=0, keepdims=True)
        dwh_ref[...] = dwh_ref[...] + jnp.dot(
            h_prev.T, dgates, preferred_element_type=jnp.float32)
        dh_new = jnp.dot(dgates, wh_ref[:].T,
                         preferred_element_type=jnp.float32)
        dh = jnp.where(keep, dh_new, dh)
        dc = jnp.where(keep, dct * sf, dc)


DEFAULT_BWD_TILE_P = 128  # the h/c trajectory stacks live in VMEM scratch:
                          # 2*T*tile*H*4B plus the pixel tile and dwh
                          # accumulator must fit the (raised) scoped-vmem
                          # budget; measured on v5e: tile 128 beats 64
                          # (13.7 vs 15.5 ms fwd+bwd; scan VJP 18.0 ms)


def mlstm_pallas_bwd(pixel_term, step_term, w_h, valid, g,
                     tile_p: Optional[int] = None,
                     interpret: Optional[bool] = None):
    """Gradients (d_pixel_term, d_step_term, d_w_h) of the final hidden
    state wrt the kernel inputs."""
    if tile_p is None:
        tile_p = DEFAULT_BWD_TILE_P
    n, p, four_h = pixel_term.shape
    hidden = four_h // 4
    t_max = step_term.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    tile_p = min(tile_p, -(-p // 8) * 8)
    pad = (-p) % tile_p
    if pad:
        pixel_term = jnp.pad(pixel_term, ((0, 0), (0, pad), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
    num_tiles = (p + pad) // tile_p

    dpix, dstep, dwh = pl.pallas_call(
        functools.partial(_mlstm_bwd_kernel, t_max=t_max, hidden=hidden),
        grid=(n, num_tiles),
        in_specs=[
            pl.BlockSpec((n, t_max), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile_p, four_h), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_max, four_h), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, four_h), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p, hidden), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_p, four_h), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            # revisited blocks: accumulated in place across the grid
            pl.BlockSpec((1, t_max, four_h), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, four_h), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, p + pad, four_h), jnp.float32),
            jax.ShapeDtypeStruct((n, t_max, four_h), jnp.float32),
            jax.ShapeDtypeStruct((hidden, four_h), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((t_max, tile_p, hidden), jnp.float32),
            pltpu.VMEM((t_max, tile_p, hidden), jnp.float32),
        ],
        # the h/c trajectory scratch plus the weight/accumulator blocks
        # exceed the default 16 MB scoped-vmem budget; v5e has 128 MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(valid.astype(jnp.int32), pixel_term.astype(jnp.float32),
      step_term.astype(jnp.float32), w_h.astype(jnp.float32),
      g.astype(jnp.float32))
    return dpix[:, :p], dstep, dwh


@jax.custom_vjp
def masked_pixel_lstm(pixel_term, step_term, w_h, valid):
    """Fused forward on TPU (scan elsewhere); scan-derived gradients.

    ``MLSTM_PALLAS_INTERPRET=1`` forces the Pallas kernel in interpret mode
    off-TPU (CI coverage of the kernel path, e.g. under the CPU mesh in
    ``dryrun_multichip``)."""
    if jax.default_backend() == "tpu":
        return mlstm_pallas(pixel_term, step_term, w_h, valid)
    if os.environ.get("MLSTM_PALLAS_INTERPRET") == "1":
        return mlstm_pallas(pixel_term, step_term, w_h, valid, interpret=True)
    return mlstm_scan(pixel_term, step_term, w_h, valid)


def _fwd(pixel_term, step_term, w_h, valid):
    return (masked_pixel_lstm(pixel_term, step_term, w_h, valid),
            (pixel_term, step_term, w_h, valid))


def _bwd(res, g):
    pixel_term, step_term, w_h, valid = res
    if jax.default_backend() == "tpu" or \
            os.environ.get("MLSTM_PALLAS_INTERPRET") == "1":
        # fused BPTT kernel: VMEM-resident trajectories, no per-step HBM
        # carry round-trips (grad-parity test: tests/test_pallas_mlstm.py)
        d_pt, d_st, d_wh = mlstm_pallas_bwd(pixel_term, step_term, w_h,
                                            valid, g)
        return d_pt, d_st, d_wh, None
    _, vjp = jax.vjp(lambda pt, st, wh: mlstm_scan(pt, st, wh, valid),
                     pixel_term, step_term, w_h)
    d_pt, d_st, d_wh = vjp(g)
    return d_pt, d_st, d_wh, None


masked_pixel_lstm.defvjp(_fwd, _bwd)
