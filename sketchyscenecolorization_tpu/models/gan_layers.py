"""Shared flax layers for the two GANs: spectral-norm conv/dense, the three
batch-norm flavors, PReLU, and the factored text-fusion conv-LSTM.

Everything is NHWC.  Batch-norm here always uses *current batch* statistics
(even at inference) -- that is the reference behavior
(``models_collection.py:22-48``, ``bg_colorization_main.py:86-98``) and parity
requires reproducing it, not switching to running averages.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.conv import conv2d as _conv2d
from ..ops.norm import spectral_normalize, l2_normalize
from ..ops.activations import lrelu, miu_relu, atanh_transform
from ..ops.lstm import lstm_cell
from ..ops.pallas_mlstm import masked_pixel_lstm

normal_init = nn.initializers.normal(stddev=0.02)


class PReLU(nn.Module):
    """Learned-scalar leaky ReLU, init 0.2 (``models_collection.py:56-60``)."""
    @nn.compact
    def __call__(self, x):
        leak = self.param("param", lambda k: jnp.asarray(0.2, jnp.float32))
        return jnp.maximum(leak * x, x)


class SNConv(nn.Module):
    """Conv + optional spectral norm + bias + optional normalizer + activation,
    matching ``mru.py:95-140`` (order: conv, +bias, normalizer, activation)."""
    features: int
    kernel: int
    stride: int = 1
    rate: int = 1
    sn: bool = False
    use_bias: bool = True
    bias_init_value: float = 0.0
    kernel_init: Callable = normal_init
    normalizer: Optional[Callable] = None       # callable(x) -> x, built by caller
    activation: Optional[Any] = None            # 'relu'|'lrelu'|'miu_relu'|'prelu'|'sigmoid'|'tanh'|None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w = self.param("weights", self.kernel_init,
                       (self.kernel, self.kernel, cin, self.features))
        if self.sn:
            u = self.variable("sn", "u",
                              lambda: jax.random.truncated_normal(
                                  self.make_rng("params") if self.has_rng("params")
                                  else jax.random.PRNGKey(0),
                                  -2.0, 2.0, (1, self.features)))
            w_bar, new_u = spectral_normalize(w, u.value)
            if self.is_mutable_collection("sn"):
                u.value = new_u
            w = w_bar
        y = _conv2d(x, w, stride=self.stride, rate=self.rate)
        if self.use_bias:
            b = self.param("biases",
                           lambda k, s: jnp.full(s, self.bias_init_value, jnp.float32),
                           (self.features,))
            # keep the activation at the conv's (storage-scope) dtype: an
            # f32 bias would promote a bf16 stream back to f32 (f32 no-op)
            y = y + b.astype(y.dtype)
        if self.normalizer is not None:
            y = self.normalizer(y)
        return apply_activation(self, y, self.activation)


class SNDense(nn.Module):
    """Fully-connected with optional spectral norm (``mru.py:52-92``)."""
    features: int
    sn: bool = False
    activation: Optional[Any] = None
    kernel_init: Callable = nn.initializers.xavier_uniform()

    @nn.compact
    def __call__(self, x):
        w = self.param("weights", self.kernel_init, (x.shape[-1], self.features))
        if self.sn:
            u = self.variable("sn", "u",
                              lambda: jax.random.truncated_normal(
                                  self.make_rng("params") if self.has_rng("params")
                                  else jax.random.PRNGKey(0),
                                  -2.0, 2.0, (1, self.features)))
            w_bar, new_u = spectral_normalize(w, u.value)
            if self.is_mutable_collection("sn"):
                u.value = new_u
            w = w_bar
        b = self.param("biases", nn.initializers.zeros, (self.features,))
        y = x @ w.astype(x.dtype) + b.astype(x.dtype)   # f32 no-op; bf16:
        return apply_activation(self, y, self.activation)  # stay at x.dtype


def apply_activation(module: nn.Module, x, activation):
    if activation is None:
        return x
    if activation == "relu":
        return jnp.maximum(x, 0.0)
    if activation == "lrelu":
        return lrelu(x, 0.2)
    if activation == "miu_relu":
        return miu_relu(x)
    if activation == "sigmoid":
        return jax.nn.sigmoid(x)
    if activation == "tanh":
        return jnp.tanh(x)
    if activation == "softplus":
        return jax.nn.softplus(x)
    if activation == "prelu":
        leak = module.param("prelu_param", lambda k: jnp.asarray(0.2, jnp.float32))
        return jnp.maximum(leak.astype(x.dtype) * x, x)   # f32 no-op
    raise ValueError(f"unknown activation {activation}")


class CondBatchNorm(nn.Module):
    """Conditional batch-stats BN (``models_collection.py:22-34``): per-class
    offset/scale embeddings; statistics from the current batch; eps 1e-5."""
    n_labels: int

    @nn.compact
    def __call__(self, x, labels):
        c = x.shape[-1]
        offset_m = self.param("offset", nn.initializers.zeros, (self.n_labels, c))
        scale_m = self.param("scale", nn.initializers.ones, (self.n_labels, c))
        from ..ops.norm import conditional_batch_stats_norm
        return conditional_batch_stats_norm(x, labels, offset_m, scale_m)


class BatchStatsNorm(nn.Module):
    """Unconditional batch-stats BN (``bg_colorization_main.py:86-98``):
    scale ~ N(1, 0.02), offset zeros, eps 1e-5; batch statistics always."""
    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        offset = self.param("offset", nn.initializers.zeros, (c,))
        scale = self.param("scale",
                           lambda k, s: 1.0 + 0.02 * jax.random.normal(k, s), (c,))
        from ..ops.norm import batch_stats_norm
        return batch_stats_norm(x, offset, scale)


def minmax_normalize(x, eps: float = 1e-12):
    """(x - min)/(max - min) over spatial dims, per (batch, channel) --
    the LReLU-gate normalization (``mru.py:312-321,560-569``).  The eps
    guards the degenerate spatially-constant map (0/0 -> NaN would poison
    training; the reference shares the hazard, the guard is free)."""
    mn = jnp.min(x, axis=(1, 2), keepdims=True)
    mx = jnp.max(x, axis=(1, 2), keepdims=True)
    return (x - mn) / (mx - mn + eps)


class TextFusionLSTM(nn.Module):
    """The text-conditioning conv-LSTM ("ALSTM") shared by the FG and BG
    generators (``models_collection.py:150-248``, ``bg_colorization_main.py:117-214``).

    A word LSTM consumes embeddings; at each step the L2-normed sentence state,
    the raw word embedding, and the L2-normed visual feature are fused by a
    second LSTM running over every bottleneck cell.  Pad tokens (index 0,
    front-padded) skip *both* cells entirely (``tf.cond`` in the reference).

    TPU redesign: the reference loops per sample and per word in Python,
    building B*T separate cond subgraphs.  Here both LSTMs are single
    ``lax.scan``s over T with the visual input projection factored out of the
    recurrence (see ``models/rmi.py`` -- same algebra), so the per-step work is
    one [B*P, C] x [C, 4C] matmul.

    Input:  visual [B, h, w, C], tokens [B, T] int32.
    Output: [B, h, w, C] (atanh-transformed hidden state).
    """
    vocab_size: int = 58

    @nn.compact
    def __call__(self, visual, tokens):
        # the recurrence is tiny (6x6 / 24x24 grids) and the Pallas kernel is
        # float32: pin the internals to f32 whatever the storage scope and
        # hand the result back at the caller's dtype (f32 no-op)
        in_dtype = visual.dtype
        visual = visual.astype(jnp.float32)
        b, h, w, c = visual.shape
        t_max = tokens.shape[1]
        p = h * w

        emb_mat = self.param("embedding",
                             lambda k, s: jax.random.uniform(k, s, jnp.float32, -0.08, 0.08),
                             (self.vocab_size, c))
        w_wlstm = self.param("wlstm_w", nn.initializers.xavier_uniform(), (2 * c, 4 * c))
        b_wlstm = self.param("wlstm_b", nn.initializers.zeros, (4 * c,))
        w_alstm = self.param("alstm_w", nn.initializers.xavier_uniform(), (4 * c, 4 * c))
        b_alstm = self.param("alstm_b", nn.initializers.zeros, (4 * c,))

        emb = emb_mat[tokens]                       # [B, T, C]
        valid = (tokens != 0)                       # [B, T]

        # --- word LSTM with pad skipping ---
        def wstep(carry, inp):
            cs, hs = carry
            x_t, v_t = inp
            gates = jnp.concatenate([x_t, hs], axis=-1) @ w_wlstm + b_wlstm
            nc, nh = lstm_cell(gates, cs)
            keep = v_t[:, None]
            cs = jnp.where(keep, nc, cs)
            hs = jnp.where(keep, nh, hs)
            return (cs, hs), hs

        cw0 = jnp.zeros((b, c), jnp.float32)
        (_, _), h_w_seq = jax.lax.scan(
            wstep, (cw0, cw0),
            (jnp.swapaxes(emb, 0, 1), jnp.swapaxes(valid, 0, 1)))
        h_w_seq = jnp.swapaxes(h_w_seq, 0, 1)       # [B, T, C]
        lang = l2_normalize(h_w_seq, axis=-1)

        # --- conv LSTM, factored input projection; fused Pallas recurrence
        # (ops/pallas_mlstm.py) with the front-pad token-validity mask ---
        visual_norm = l2_normalize(visual, axis=-1).reshape(b, p, c)
        w_v = w_alstm[:c]
        w_w = w_alstm[c:2 * c]
        w_l = w_alstm[2 * c:3 * c]
        w_h = w_alstm[3 * c:]
        pixel_term = visual_norm @ w_v                                  # [B, P, 4C]
        step_term = emb @ w_w + lang @ w_l + b_alstm                    # [B, T, 4C]

        h_a = masked_pixel_lstm(pixel_term, step_term, w_h, valid)

        out = atanh_transform(h_a.reshape(b, h, w, c))
        return out.astype(in_dtype)
