"""Image resampling ops (NHWC, device-side).

The reference mixes several resize semantics; the two that appear inside
models are reproduced exactly:

- ``mean_pool``: 4-tap 2x2 average (``mru.py:15-19``).
- nearest 2x upsample via channel-replication + depth_to_space
  (``mru.py:22-28``) -- algebraically identical to pixel replication.
- ``tf.image.resize_images(..., AREA)`` on integer downscale factors = box
  average (FG generator pyramid, ``models_collection.py:268-272``).
- ``tf.image.resize_bilinear`` with align_corners=False (TF1 legacy grid:
  src = dst * in/out) -- the RMI 96->768 upsample (``RMI_model.py:150``).
  Implemented as two dense interpolation matmuls, which is both exact and
  MXU-friendly.
"""
from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def mean_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W, C] -> [N, H/2, W/2, C], 2x2 average."""
    return (x[:, ::2, ::2] + x[:, 1::2, ::2] + x[:, ::2, 1::2] + x[:, 1::2, 1::2]) / 4.0


def nn_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W, C] -> [N, 2H, 2W, C] by pixel replication."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def box_downsample(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Integer-factor box-average downsample (== TF AREA resize for exact
    integer factors)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // factor, factor, w // factor, factor, c)
    return x.mean(axis=(2, 4))


@lru_cache(maxsize=64)
def _tf1_bilinear_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense [out_size, in_size] interpolation matrix for TF1
    resize_bilinear(align_corners=False): src = dst * (in/out)."""
    scale = in_size / out_size
    src = np.arange(out_size, dtype=np.float64) * scale
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = src - lo
    m = np.zeros((out_size, in_size), dtype=np.float32)
    m[np.arange(out_size), lo] += (1.0 - frac).astype(np.float32)
    m[np.arange(out_size), hi] += frac.astype(np.float32)
    return m


def tf1_resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Exact TF1 legacy bilinear resize, [N, H, W, C] -> [N, out_h, out_w, C],
    as two interpolation matmuls (rides the MXU instead of gathers)."""
    n, h, w, c = x.shape
    mh = jnp.asarray(_tf1_bilinear_matrix(h, out_h))      # [out_h, h]
    mw = jnp.asarray(_tf1_bilinear_matrix(w, out_w))      # [out_w, w]
    # [N,H,W,C] -> rows: einsum over H then W
    y = jnp.einsum("oh,nhwc->nowc", mh, x)
    y = jnp.einsum("ow,nhwc->nhoc", mw, y)
    return y


def resize_bilinear_half_pixel(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Half-pixel-center bilinear resize (jax.image default) -- the fast path
    when exact TF1 grid parity is not required."""
    import jax
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, out_h, out_w, c), method="bilinear")

@lru_cache(maxsize=64)
def _align_corners_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Dense interpolation matrix for TF resize_bilinear(align_corners=True):
    src = dst * (in-1)/(out-1)."""
    if out_size == 1 or in_size == 1:
        m = np.zeros((out_size, in_size), dtype=np.float32)
        m[:, 0] = 1.0
        return m
    scale = (in_size - 1) / (out_size - 1)
    src = np.arange(out_size, dtype=np.float64) * scale
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = src - lo
    m = np.zeros((out_size, in_size), dtype=np.float32)
    m[np.arange(out_size), lo] += (1.0 - frac).astype(np.float32)
    m[np.arange(out_size), hi] += frac.astype(np.float32)
    return m


def resize_bilinear_align_corners(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """TF resize_bilinear with align_corners=True (DeepLab-v3+ decoder,
    reference ``deeplab_v3plus_model.py:533,820``), as interpolation matmuls."""
    mh = jnp.asarray(_align_corners_matrix(x.shape[1], out_h))
    mw = jnp.asarray(_align_corners_matrix(x.shape[2], out_w))
    y = jnp.einsum("oh,nhwc->nowc", mh, x)
    return jnp.einsum("ow,nhwc->nhoc", mw, y)
