"""Inception score for generated FG instances.

The reference scaffolds an inception-score hook but ships it disabled
(``obj_colorization_main.py:200-201``, ``main_procedure.py:102-103,142-147``).
Completed here: the standard IS = exp(E_x[KL(p(y|x) || p(y))]) over class
posteriors, with splits, plus an adapter that scores generator outputs using
the FG discriminator's ACGAN classification head (25 sketch categories) --
the natural in-domain classifier for 192x192 cartoon instances, since the
stock ImageNet Inception head is meaningless on this distribution.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def inception_score(probs: np.ndarray, splits: int = 10
                    ) -> Tuple[float, float]:
    """probs: [N, num_classes] class posteriors.  Returns (mean, std) of the
    per-split scores."""
    probs = np.asarray(probs, dtype=np.float64)
    n = probs.shape[0]
    scores = []
    for k in range(splits):
        part = probs[k * n // splits:(k + 1) * n // splits]
        if len(part) == 0:
            continue
        marginal = part.mean(axis=0, keepdims=True)
        kl = (part * (np.log(part + 1e-12) - np.log(marginal + 1e-12))).sum(1)
        scores.append(np.exp(kl.mean()))
    return float(np.mean(scores)), float(np.std(scores))


def acgan_class_probs(cfg, d_params, d_sn, images: np.ndarray,
                      batch_size: int = 16) -> np.ndarray:
    """Class posteriors from the FG discriminator's ACGAN head for a stack
    of [-1, 1] images [N, S, S, 3]."""
    from ..train.fg_gan import build_models
    _, disc = build_models(cfg)

    @jax.jit
    def probs_fn(params, sn, x):
        _, logits = disc.apply({"params": params, "sn": sn}, x, x)
        return jax.nn.softmax(logits)

    out = []
    for i in range(0, len(images), batch_size):
        chunk = jnp.asarray(images[i:i + batch_size])
        out.append(np.asarray(probs_fn(d_params, d_sn, chunk)))
    return np.concatenate(out)


def inception_v4_class_probs(inception_params, images: np.ndarray,
                             batch_size: int = 8) -> np.ndarray:
    """Class posteriors from the full Inception-v4 classifier for a stack of
    [-1, 1] images [N, S, S, 3] -- the classic inception-score classifier the
    reference's disabled hook intended (``main_procedure.py:102-103``; the
    stock slim ImageNet checkpoint restores via
    ``utils/tf1_converter.py:convert_inception_v4``).  Images are bilinearly
    resized to 299 and kept in slim's [-1, 1] range."""
    from ..models.inception_v4 import inception_v4
    from ..ops.image import resize_bilinear_half_pixel

    @jax.jit
    def probs_fn(params, x):
        x = resize_bilinear_half_pixel(x, 299, 299)
        _, eps = inception_v4(params, x)
        return eps["Predictions"]

    out = []
    for i in range(0, len(images), batch_size):
        chunk = jnp.asarray(images[i:i + batch_size], jnp.float32)
        pad = 0
        if len(chunk) < batch_size and len(out):   # keep one compiled shape
            pad = batch_size - len(chunk)
            chunk = jnp.concatenate(
                [chunk, jnp.zeros((pad,) + chunk.shape[1:], jnp.float32)])
        p = np.asarray(probs_fn(inception_params, chunk))
        out.append(p[:len(p) - pad] if pad else p)
    return np.concatenate(out)
