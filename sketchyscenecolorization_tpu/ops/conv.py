"""Convolution primitives, NHWC, built on ``lax.conv_general_dilated``.

Layout is NHWC throughout (TPU-native); the reference uses NCHW on GPU
(``obj_lib/mru.py:95-140``) -- layout is an implementation detail the
framework does not expose.

Weights are stored HWIO (``[kh, kw, in, out]``), matching the TF checkpoint
layout so a TF1->JAX converter is a pure reshape-free rename.
"""
from __future__ import annotations

import contextlib

import jax.numpy as jnp
from jax import lax

_DIMS = ("NHWC", "HWIO", "NHWC")

# Trace-time compute-dtype scope: every conv below casts its operands AND its
# (float32-accumulated) output to this dtype when its explicit
# ``compute_dtype`` argument is None.
#
# Measured reality on TPU (v5e, XLA default matmul precision): a float32
# conv/dot already computes as one bf16 pass on the MXU -- explicit bf16
# operand casts are bitwise-identical to the f32 default (while
# Precision.HIGHEST differs).  The bfloat16 policy therefore buys nothing on
# the MXU, and has never measured FASTER: r4 A/Bs over the axon tunnel
# ranged from bf16 ~2x slower (RMI fused 33.2 vs 14.9 ms; FG GAN 256 rows
# 569 vs 291 ms -- the extra convert ops around every conv break XLA's
# conv+BN+activation fusions) to ~parity on the combined device-only bench
# (92.7 vs 95.3 passes/s, ~88 TF/s both, cost-analysis-consistent; tunnel
# measurements swing day-to-day, so treat single-day ratios as bounds, not
# constants).  The knob is retained for numerics experiments
# (tolerance-tested per model) but is NOT a performance feature; the
# default everywhere is float32.  Accumulation stays float32 via
# ``preferred_element_type`` either way.  The scope is read while *tracing*,
# so it must wrap the traced call (engines bake it into their per-engine jit
# functions).
_SCOPE_DTYPE = [None]


@contextlib.contextmanager
def compute_dtype_scope(dtype):
    """``with compute_dtype_scope(jnp.bfloat16): ...`` -- casts conv/matmul
    operands inside.  ``dtype`` may be None, 'float32', 'bfloat16', or a
    jnp dtype; None / float32 are no-ops."""
    if dtype in ("float32", jnp.float32):
        dtype = None
    if dtype == "bfloat16":
        dtype = jnp.bfloat16
    prev = _SCOPE_DTYPE[0]
    _SCOPE_DTYPE[0] = dtype
    try:
        yield
    finally:
        _SCOPE_DTYPE[0] = prev


def scope_dtype():
    return _SCOPE_DTYPE[0]


def conv2d(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1, rate: int = 1,
           padding: str = "SAME", compute_dtype=None) -> jnp.ndarray:
    """2-D convolution. ``rate`` > 1 gives atrous convolution (SAME padding is
    computed on the dilated kernel, matching ``tf.nn.atrous_conv2d``).

    An explicit ``compute_dtype`` casts operands only (f32 output); the
    scope additionally stores the output at the scope dtype (HBM savings)."""
    out_cast = None
    if compute_dtype is None and _SCOPE_DTYPE[0] is not None:
        compute_dtype = out_cast = _SCOPE_DTYPE[0]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    # Under the storage scope the conv emits its result AT the scope dtype
    # (still f32-accumulated on the MXU) instead of emitting f32 and
    # converting after -- same rounding point, but no materialized f32
    # intermediate (the bf16 serving mode is HBM-bandwidth-bound).
    out = lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(rate, rate),
        dimension_numbers=_DIMS,
        preferred_element_type=out_cast or jnp.float32,
    )
    return out


def atrous_conv2d(x: jnp.ndarray, w: jnp.ndarray, rate: int,
                  compute_dtype=None) -> jnp.ndarray:
    return conv2d(x, w, stride=1, rate=rate, compute_dtype=compute_dtype)


def pad1_conv4(x: jnp.ndarray, w: jnp.ndarray, stride: int,
               compute_dtype=None) -> jnp.ndarray:
    """Pad each spatial side by 1 then run a 4x4 VALID conv -- the exact
    padding scheme of the BG/pix2pix ``conv()`` (reference
    ``bg_colorization_main.py:41-50``).  For stride 2 on even sizes this
    equals SAME; for stride 1 the output shrinks by one pixel (the PatchGAN
    95->94 behavior)."""
    out_cast = None
    if compute_dtype is None and _SCOPE_DTYPE[0] is not None:
        compute_dtype = out_cast = _SCOPE_DTYPE[0]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    assert w.shape[0] == 4 and w.shape[1] == 4
    out = lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=((1, 1), (1, 1)),
        dimension_numbers=_DIMS,
        preferred_element_type=out_cast or jnp.float32,
    )
    return out


def conv2d_transpose(x: jnp.ndarray, w: jnp.ndarray, stride: int = 2,
                     compute_dtype=None) -> jnp.ndarray:
    """Transposed conv matching ``tf.nn.conv2d_transpose(..., 'SAME')`` with a
    4x4 kernel and stride 2 (reference ``bg_colorization_main.py:62-71``):
    the exact gradient of a SAME forward conv, implemented as an
    input-dilated convolution with the spatially-flipped kernel.

    ``w`` is stored HWIO like every other kernel here ([kh, kw, in, out]);
    (TF stores transposed-conv filters as [kh, kw, out, in] -- the converter
    swaps the last two axes).
    """
    out_cast = None
    if compute_dtype is None and _SCOPE_DTYPE[0] is not None:
        compute_dtype = out_cast = _SCOPE_DTYPE[0]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    kh, kw = w.shape[0], w.shape[1]
    # Forward conv (whose gradient we compute) uses SAME padding: for output
    # size H*stride, pad_total = kh - stride; TF puts the extra on the right.
    pad_total_h = kh - stride
    pad_total_w = kw - stride
    pad_lo_h = pad_total_h // 2
    pad_lo_w = pad_total_w // 2
    pad_hi_h = pad_total_h - pad_lo_h
    pad_hi_w = pad_total_w - pad_lo_w
    w_flipped = jnp.flip(w, axis=(0, 1))
    out = lax.conv_general_dilated(
        x, w_flipped,
        window_strides=(1, 1),
        padding=((kh - 1 - pad_lo_h, kh - 1 - pad_hi_h),
                 (kw - 1 - pad_lo_w, kw - 1 - pad_hi_w)),
        lhs_dilation=(stride, stride),
        dimension_numbers=_DIMS,
        preferred_element_type=out_cast or jnp.float32,
    )
    return out


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """3x3/2 SAME max-pool (DeepLab stem, reference ``deeplab_model.py:72``)."""
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding="SAME",
    )
