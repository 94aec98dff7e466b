"""LSTM cells as fused matmuls + ``lax.scan`` recurrences.

Semantics match ``tf.nn.rnn_cell.BasicLSTMCell`` / ``LSTMCell`` with
``state_is_tuple=False`` (state = concat([c, h]) on the last axis), gate
order (i, j, f, o), ``forget_bias = 1.0``, no peepholes -- exactly the cells
the reference instantiates (``RMI_model.py:132-134``,
``models_collection.py:184-187``).

The key TPU design point: the reference runs ``tf.nn.dynamic_rnn`` over
N*96*96 = 9216 independent pixel sequences of length <=15
(``RMI_model.py:192-200``).  Here that becomes a ``lax.scan`` over T steps
with a ``[num_pixels, 2*hidden]`` carry; the input projection is factored so
the per-step work is a single [P, H] x [H, 4H] matmul on the MXU (see
``models/rmi.py``).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def lstm_cell(gates: jnp.ndarray, c: jnp.ndarray,
              forget_bias: float = 1.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply LSTM nonlinearity to precomputed gate pre-activations.

    gates: [..., 4*H] = concat([x, h]) @ W + b, split (i, j, f, o).
    Returns (new_c, new_h).
    """
    i, j, f, o = jnp.split(gates, 4, axis=-1)
    new_c = c * jax.nn.sigmoid(f + forget_bias) + jax.nn.sigmoid(i) * jnp.tanh(j)
    new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
    return new_c, new_h


def lstm_step(x: jnp.ndarray, c: jnp.ndarray, h: jnp.ndarray,
              w: jnp.ndarray, b: jnp.ndarray,
              forget_bias: float = 1.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One full LSTM step: x [..., D], h [..., H], w [(D+H), 4H], b [4H]."""
    gates = jnp.concatenate([x, h], axis=-1) @ w + b
    return lstm_cell(gates, c, forget_bias)


def lstm_scan(xs: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
              hidden: int, forget_bias: float = 1.0):
    """Run an LSTM over xs [B, T, D].  Returns (outputs [B, T, H], (c, h))."""
    B = xs.shape[0]
    c0 = jnp.zeros((B, hidden), xs.dtype)
    h0 = jnp.zeros((B, hidden), xs.dtype)

    def step(carry, x_t):
        c, h = carry
        c, h = lstm_step(x_t, c, h, w, b, forget_bias)
        return (c, h), h

    (c, h), ys = jax.lax.scan(step, (c0, h0), jnp.swapaxes(xs, 0, 1))
    return jnp.swapaxes(ys, 0, 1), (c, h)


def masked_lstm_scan(xs: jnp.ndarray, seq_len: jnp.ndarray,
                     w: jnp.ndarray, b: jnp.ndarray, hidden: int,
                     forget_bias: float = 1.0):
    """LSTM with ``tf.nn.dynamic_rnn(sequence_length=...)`` semantics:
    past each sequence's length the state is frozen and the emitted output is
    zero.

    xs: [B, T, D]; seq_len: [B] int. Returns (outputs [B, T, H], (c, h)).
    """
    B, T, _ = xs.shape
    c0 = jnp.zeros((B, hidden), xs.dtype)
    h0 = jnp.zeros((B, hidden), xs.dtype)

    def step(carry, inp):
        c, h = carry
        x_t, t = inp
        new_c, new_h = lstm_step(x_t, c, h, w, b, forget_bias)
        valid = (t < seq_len)[:, None]
        c = jnp.where(valid, new_c, c)
        h = jnp.where(valid, new_h, h)
        out = jnp.where(valid, h, jnp.zeros_like(h))
        return (c, h), out

    ts = jnp.arange(T)
    (c, h), ys = jax.lax.scan(step, (c0, h0), (jnp.swapaxes(xs, 0, 1), ts))
    return jnp.swapaxes(ys, 0, 1), (c, h)


def skip_pad_lstm_step(token_valid: jnp.ndarray, gates: jnp.ndarray,
                       c: jnp.ndarray, h: jnp.ndarray,
                       forget_bias: float = 1.0):
    """One conv-LSTM step that is skipped entirely for pad tokens -- the
    ``tf.cond(token == 0)`` pattern of the FG/BG text fusion
    (``models_collection.py:230-236``).  token_valid broadcasts over rows.
    """
    new_c, new_h = lstm_cell(gates, c, forget_bias)
    c = jnp.where(token_valid, new_c, c)
    h = jnp.where(token_valid, new_h, h)
    return c, h
