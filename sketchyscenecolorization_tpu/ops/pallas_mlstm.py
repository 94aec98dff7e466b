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

    valid_ref: [1, T] int32 (SMEM); pixel_ref: [1, TILE, 4H];
    step_ref: [1, T, 4H]; wh_ref: [H, 4H]; out_ref: [1, TILE, H].
    """
    tile = pixel_ref.shape[1]
    pixel = pixel_ref[0]
    c = jnp.zeros((tile, hidden), jnp.float32)
    h = jnp.zeros((tile, hidden), jnp.float32)
    for t in range(t_max):  # static unroll: T <= 15
        gates = pixel + step_ref[0, t, :][None, :] + jnp.dot(
            h, wh_ref[:], preferred_element_type=jnp.float32)
        new_c, new_h = lstm_cell(gates, c)
        keep = valid_ref[0, t] > 0
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

    pad = (-p) % tile_p
    if pad:
        pixel_term = jnp.pad(pixel_term, ((0, 0), (0, pad), (0, 0)))
    num_tiles = (p + pad) // tile_p

    out = pl.pallas_call(
        functools.partial(_mlstm_kernel, t_max=t_max, hidden=hidden),
        grid=(n, num_tiles),
        in_specs=[
            pl.BlockSpec((1, t_max), lambda i, j: (i, 0),
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


@jax.custom_vjp
def masked_pixel_lstm(pixel_term, step_term, w_h, valid):
    """Fused forward on TPU (scan elsewhere); scan-derived gradients."""
    if jax.default_backend() == "tpu":
        return mlstm_pallas(pixel_term, step_term, w_h, valid)
    return mlstm_scan(pixel_term, step_term, w_h, valid)


def _fwd(pixel_term, step_term, w_h, valid):
    return (masked_pixel_lstm(pixel_term, step_term, w_h, valid),
            (pixel_term, step_term, w_h, valid))


def _bwd(res, g):
    pixel_term, step_term, w_h, valid = res
    _, vjp = jax.vjp(lambda pt, st, wh: mlstm_scan(pt, st, wh, valid),
                     pixel_term, step_term, w_h)
    d_pt, d_st, d_wh = vjp(g)
    return d_pt, d_st, d_wh, None


masked_pixel_lstm.defvjp(_fwd, _bwd)
