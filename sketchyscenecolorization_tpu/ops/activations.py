"""Activation functions used by the reference models."""
from __future__ import annotations

import jax.numpy as jnp


def lrelu(x, leak: float = 0.2):
    """max(leak*x, x) (reference ``mru.py:10-12`` leak 0.2;
    ``bg_colorization_main.py:74-83`` is the algebraically identical form)."""
    return jnp.maximum(leak * x, x)


def prelu(x, leak):
    """Parametric ReLU with a learned scalar leak (init 0.2,
    reference ``models_collection.py:56-60``)."""
    return jnp.maximum(leak * x, x)


def miu_relu(x, miu: float = 0.7):
    """(x + sqrt((1-miu)^2 + x^2)) / 2 (reference ``models_collection.py:63-65``)."""
    return (x + jnp.sqrt((1.0 - miu) ** 2 + x ** 2)) / 2.0


def atanh_transform(h, eps: float = 1e-3):
    """0.5 * (log(1+eps + h) - log(1+eps - h)) followed by ReLU -- the output
    transform applied to every conv-LSTM hidden state in the reference
    (``RMI_model.py:277-279``, ``models_collection.py:239-241``)."""
    y = 0.5 * (jnp.log((1.0 + eps) + h) - jnp.log((1.0 + eps) - h))
    return jnp.maximum(y, 0.0)
