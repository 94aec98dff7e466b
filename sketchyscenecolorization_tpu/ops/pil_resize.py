"""Bit-exact PIL bilinear resize as XLA ops.

The FG compositing chain undoes the pad+resize with PIL BILINEAR (the
deprecated ``scipy.misc.imresize`` the reference calls at
``Pipeline_utils/fg_color_utils.py:158`` IS PIL), so a device-side
compositor must reproduce Pillow's resample *bit for bit*.  Pillow's 8bpc
path is integer fixed-point: per output pixel it precomputes float64
triangle-filter weights, normalizes, converts to int32 with
``round(w * 2**22)`` (PRECISION_BITS = 32-8-2), then accumulates
``pixel * coeff`` in int32 with a ``2**21`` rounding bias, shifts right 22
and clips to uint8 -- horizontal pass first, vertical second, with the
intermediate rounded to uint8 between passes.  All of that is exact integer
math, so the same accumulation as an XLA int32 gather+weighted-sum gives
byte-identical output (oracle-tested against PIL across up/down scales in
``tests/test_pil_resize.py``).

Coefficients depend only on (in_size, out_size): built once on host
(``pil_bilinear_coeffs``), shipped to device as small [out, ksize] arrays,
and reused for every pass over the same image.
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

PRECISION_BITS = 32 - 8 - 2          # Pillow Resample.c
_HALF = 1 << (PRECISION_BITS - 1)


@functools.lru_cache(maxsize=4096)
def pil_bilinear_coeffs(in_size: int, out_size: int
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Pillow ``precompute_coeffs`` + ``normalize_coeffs_8bpc`` for the
    triangle (BILINEAR) filter over the full [0, in_size) box.

    Returns (idx [out, ksize] int32 input indices, kk [out, ksize] int32
    fixed-point weights; zero-padded taps point at index 0 with weight 0).
    """
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 1.0 * filterscale               # bilinear support = 1.0
    ksize = int(np.ceil(support)) * 2 + 1

    idx = np.zeros((out_size, ksize), np.int32)
    kk = np.zeros((out_size, ksize), np.int32)
    ss = 1.0 / filterscale
    for xx in range(out_size):
        center = (xx + 0.5) * scale
        xmin = int(center - support + 0.5)    # C truncation; >= -support
        if xmin < 0:
            xmin = 0
        xmax = int(center + support + 0.5)
        if xmax > in_size:
            xmax = in_size
        n = xmax - xmin
        w = np.array([(x + xmin - center + 0.5) * ss for x in range(n)],
                     np.float64)
        w = np.where(np.abs(w) < 1.0, 1.0 - np.abs(w), 0.0)
        tot = w.sum()
        if tot != 0.0:
            w = w / tot
        # Pillow: (int)(±0.5 + w * (1 << 22)) -- truncation toward zero
        fixed = np.where(w < 0, -(0.5 - w * (1 << PRECISION_BITS)),
                         0.5 + w * (1 << PRECISION_BITS)).astype(np.int64)
        kk[xx, :n] = fixed.astype(np.int32)
        idx[xx, :n] = np.arange(xmin, xmax, dtype=np.int32)
    return idx, kk


def _resample_axis0_np(img: np.ndarray, idx: np.ndarray,
                       kk: np.ndarray) -> np.ndarray:
    """uint8 [In, ...] -> uint8 [Out, ...]: one Pillow 8bpc pass (numpy
    reference used by the oracle tests and the host fallback)."""
    taps = img[idx].astype(np.int32)                   # [Out, ksize, ...]
    k = kk.reshape(kk.shape + (1,) * (img.ndim - 1))
    ss = (taps * k).sum(axis=1) + _HALF
    return np.clip(ss >> PRECISION_BITS, 0, 255).astype(np.uint8)


def pil_resize_bilinear_u8_np(img: np.ndarray, out_h: int,
                              out_w: int) -> np.ndarray:
    """uint8 [H, W, C] -> uint8 [out_h, out_w, C], byte-equal to
    ``PIL.Image.resize((out_w, out_h), BILINEAR)``.  Horizontal pass first,
    vertical second, intermediate rounded to uint8 (Pillow's order)."""
    h, w = img.shape[:2]
    if w != out_w:
        idx, kk = pil_bilinear_coeffs(w, out_w)
        img = np.swapaxes(_resample_axis0_np(np.swapaxes(img, 0, 1),
                                             idx, kk), 0, 1)
    if h != out_h:
        idx, kk = pil_bilinear_coeffs(h, out_h)
        img = _resample_axis0_np(img, idx, kk)
    return img


def _resample_axis0_jnp(img, idx, kk):
    """Same pass as ``_resample_axis0_np`` in XLA ops (exact int32 math)."""
    import jax.numpy as jnp
    taps = jnp.take(img, idx, axis=0).astype(jnp.int32)   # [Out, ksize, ...]
    k = kk.reshape(kk.shape + (1,) * (img.ndim - 1))
    ss = jnp.sum(taps * k, axis=1) + _HALF
    return jnp.clip(jnp.right_shift(ss, PRECISION_BITS), 0, 255) \
        .astype(jnp.uint8)


def pil_resize_bilinear_u8(img, out_h: int, out_w: int):
    """Device version of ``pil_resize_bilinear_u8_np`` (jit-safe; the
    coefficient tables are trace-time numpy constants)."""
    import jax.numpy as jnp
    h, w = img.shape[:2]
    if w != out_w:
        idx, kk = pil_bilinear_coeffs(w, out_w)
        img = jnp.swapaxes(_resample_axis0_jnp(jnp.swapaxes(img, 0, 1),
                                               jnp.asarray(idx),
                                               jnp.asarray(kk)), 0, 1)
    if h != out_h:
        idx, kk = pil_bilinear_coeffs(h, out_h)
        img = _resample_axis0_jnp(img, jnp.asarray(idx), jnp.asarray(kk))
    return img
