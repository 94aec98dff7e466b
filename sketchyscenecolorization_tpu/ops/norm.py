"""Normalization primitives.

Three distinct batch-norm semantics appear in the reference and all must be
reproduced exactly:

1. **Frozen BN with a stored factor** (DeepLab backbone,
   ``deeplab_model.py:176-231``): normalizes with stored mean/var each divided
   by a stored scalar ``factor``; eps = 0.001; beta/gamma non-trainable.
2. **Batch-stats BN** (GANs, ``bg_colorization_main.py:86-98``,
   ``models_collection.py:36-46``): normalizes with the *current batch*
   statistics even at test time; eps = 1e-5.
3. **Conditional batch-stats BN** (FG generator,
   ``models_collection.py:22-34``): batch statistics, but offset/scale are
   per-class embeddings looked up by label.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def frozen_batch_norm(x, mean, var, beta, gamma, factor, eps: float = 0.001):
    """y = gamma * (x - mean/factor) / sqrt(var/factor + eps) + beta."""
    inv_factor = 1.0 / factor
    m = mean * inv_factor
    v = var * inv_factor
    inv = gamma * (1.0 / jnp.sqrt(v + eps))
    return x * inv + (beta - m * inv)


def _stats_axes(x) -> Tuple[int, ...]:
    """Reduction axes for batch-stats BN: (N, H, W) normally; (H, W) only
    inside a per-sample-stats scope (batched serving: each batch row then
    gets exactly the statistics it would get as a batch-1 call, the
    reference's inference batching -- ``fg_color_utils.py:330-333`` always
    runs batch 1)."""
    return (1, 2) if _PER_SAMPLE_STATS[0] else (0, 1, 2)


_PER_SAMPLE_STATS = [False]


def per_sample_stats_scope(on: bool = True):
    """Trace-time scope: batch-stats BN reduces per sample instead of over
    the whole batch, making a stacked batch-K forward equal K batch-1
    forwards.  Usage: ``with per_sample_stats_scope(): ...``."""
    import contextlib

    @contextlib.contextmanager
    def _cm():
        prev = _PER_SAMPLE_STATS[0]
        _PER_SAMPLE_STATS[0] = on
        try:
            yield
        finally:
            _PER_SAMPLE_STATS[0] = prev
    return _cm()


def batch_stats_norm(x, offset, scale, eps: float = 1e-5):
    """Per-channel batch statistics over (N, H, W); applied even in eval.
    Statistics accumulate in float32 even when activations are bf16; the
    result returns at the INPUT dtype (a no-op for f32; under the bf16
    storage scope this keeps activations bf16 through the whole stack
    instead of bouncing f32<->bf16 around every conv)."""
    xs = x.astype(jnp.float32)
    axes = _stats_axes(x)
    mean = jnp.mean(xs, axis=axes, keepdims=True)
    var = jnp.var(xs, axis=axes, keepdims=True)
    inv = scale * (1.0 / jnp.sqrt(var + eps))
    return ((xs - mean) * inv + offset).astype(x.dtype)


def conditional_batch_stats_norm(x, labels, offset_table, scale_table, eps: float = 1e-5):
    """Batch-stats BN with per-class offset/scale.

    x: [N, H, W, C]; labels: [N] int; offset/scale tables: [n_labels, C].
    """
    xs = x.astype(jnp.float32)
    axes = _stats_axes(x)
    mean = jnp.mean(xs, axis=axes, keepdims=True)
    var = jnp.var(xs, axis=axes, keepdims=True)
    offset = offset_table[labels][:, None, None, :]   # [N,1,1,C]
    scale = scale_table[labels][:, None, None, :]
    # f32 statistics, input-dtype result (no-op for f32; see batch_stats_norm)
    return ((xs - mean) / jnp.sqrt(var + eps) * scale + offset).astype(x.dtype)


def l2_normalize(x, axis: int = -1, eps: float = 1e-12):
    """tf.nn.l2_normalize: x * rsqrt(max(sum(x^2), eps)) along axis
    (the eps floors the SQUARED norm, i.e. an effective norm floor of
    sqrt(eps) -- not a floor on the norm itself)."""
    sum_sq = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis,
                     keepdims=True)
    # input-dtype result (no-op for f32: bf16 * f32 would promote and
    # silently re-widen the activation stream under the bf16 storage scope)
    return x * jax.lax.rsqrt(jnp.maximum(sum_sq, eps)).astype(x.dtype)


def _sn_l2norm(v, eps: float = 1e-12):
    # reference sn.py:8-9: v / (sqrt(sum v^2) + eps)
    return v / (jnp.sqrt(jnp.sum(v ** 2)) + eps)


def spectral_normalize(w: jnp.ndarray, u: jnp.ndarray,
                       num_iters: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One-step power-iteration spectral normalization
    (reference ``obj_lib/sn.py:12-52``).

    w: any-rank weight; u: persistent [1, out_dim] vector (out_dim = last axis
    of w).  Returns (w / sigma, updated u).  The caller threads ``u`` through
    its state and decides when to commit the update (the reference commits it
    as a control dependency of the D optimizer step).
    """
    w_shape = w.shape
    w2 = w.reshape(-1, w_shape[-1])
    v = None
    for _ in range(num_iters):
        v = _sn_l2norm(u @ w2.T)      # [1, in_flat]
        u = _sn_l2norm(v @ w2)        # [1, out]
    sigma = (v @ w2 @ u.T)[0, 0]
    return (w2 / sigma).reshape(w_shape), u
