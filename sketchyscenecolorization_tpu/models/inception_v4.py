"""Inception-v4 feature extractor for the FG GAN's perceptual loss.

Reference: ``obj_lib/inception_v4.py`` (slim inception_v4_base) consumed by
``obj_lib/graph_single.py:467-511`` with ``final_endpoint='Mixed_5b'`` and
endpoints [Conv2d_2a_3x3, Mixed_4a, Mixed_5b]; the loss is the mean-L1 over
those three feature maps of the two images, bilinear-resized to 299 and
normalized to [0, 1].  (The reference scaffolds this loss but multiplies it
by 0.0 -- ``graph_single.py:557-559``; it is exposed here with a coefficient
so it can actually be enabled.)

Only the stem through Mixed_5b is implemented -- exactly the subgraph the
loss evaluates.  Convs are VALID/SAME per the v4 paper, each followed by
moving-stats BN (scale-free, eps 1e-3, slim defaults) and ReLU.
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.image import resize_bilinear_half_pixel

Params = Dict[str, Any]
_DIMS = ("NHWC", "HWIO", "NHWC")


def _conv_init(key, kh, kw, cin, cout):
    n = kh * kw * cout
    return {
        "weights": jax.random.truncated_normal(key, -2, 2, (kh, kw, cin, cout),
                                               jnp.float32) * 0.1,
        "bn_beta": jnp.zeros((cout,), jnp.float32),
        "bn_mean": jnp.zeros((cout,), jnp.float32),
        "bn_variance": jnp.ones((cout,), jnp.float32),
    }


def _conv_bn_relu(x, p, stride=1, padding="SAME"):
    y = lax.conv_general_dilated(x, p["weights"], (stride, stride), padding,
                                 dimension_numbers=_DIMS,
                                 preferred_element_type=jnp.float32)
    y = (y - p["bn_mean"]) / jnp.sqrt(p["bn_variance"] + 1e-3) + p["bn_beta"]
    return jnp.maximum(y, 0.0)


def _max_pool(x, k=3, stride=2, padding="VALID"):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, k, k, 1),
                             (1, stride, stride, 1), padding)


def _avg_pool_3x3_same(x):
    ones = lax.reduce_window(jnp.ones_like(x), 0.0, lax.add, (1, 3, 3, 1),
                             (1, 1, 1, 1), "SAME")
    summed = lax.reduce_window(x, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                               "SAME")
    return summed / ones


def init_params(key) -> Params:
    keys = iter(jax.random.split(key, 32))
    p: Params = {
        "Conv2d_1a_3x3": _conv_init(next(keys), 3, 3, 3, 32),
        "Conv2d_2a_3x3": _conv_init(next(keys), 3, 3, 32, 32),
        "Conv2d_2b_3x3": _conv_init(next(keys), 3, 3, 32, 64),
        "Mixed_3a": {"conv": _conv_init(next(keys), 3, 3, 64, 96)},
        "Mixed_4a": {
            "b0_1x1": _conv_init(next(keys), 1, 1, 160, 64),
            "b0_3x3": _conv_init(next(keys), 3, 3, 64, 96),
            "b1_1x1": _conv_init(next(keys), 1, 1, 160, 64),
            "b1_1x7": _conv_init(next(keys), 1, 7, 64, 64),
            "b1_7x1": _conv_init(next(keys), 7, 1, 64, 64),
            "b1_3x3": _conv_init(next(keys), 3, 3, 64, 96),
        },
        "Mixed_5a": {"conv": _conv_init(next(keys), 3, 3, 192, 192)},
        "Mixed_5b": {
            "b0_1x1": _conv_init(next(keys), 1, 1, 384, 96),
            "b1_1x1": _conv_init(next(keys), 1, 1, 384, 64),
            "b1_3x3": _conv_init(next(keys), 3, 3, 64, 96),
            "b2_1x1": _conv_init(next(keys), 1, 1, 384, 64),
            "b2_3x3a": _conv_init(next(keys), 3, 3, 64, 96),
            "b2_3x3b": _conv_init(next(keys), 3, 3, 96, 96),
            "b3_1x1": _conv_init(next(keys), 1, 1, 384, 96),
        },
    }
    return p


def extract_endpoints(params: Params, images: jnp.ndarray
                      ) -> List[jnp.ndarray]:
    """images: [N, 299, 299, 3] in [0, 1].  Returns the three perceptual
    endpoints [Conv2d_2a_3x3, Mixed_4a, Mixed_5b]."""
    x = _conv_bn_relu(images, params["Conv2d_1a_3x3"], 2, "VALID")
    conv2a = _conv_bn_relu(x, params["Conv2d_2a_3x3"], 1, "VALID")
    x = _conv_bn_relu(conv2a, params["Conv2d_2b_3x3"], 1, "SAME")

    m3 = params["Mixed_3a"]
    x = jnp.concatenate([_max_pool(x),
                         _conv_bn_relu(x, m3["conv"], 2, "VALID")], axis=-1)

    m4 = params["Mixed_4a"]
    b0 = _conv_bn_relu(x, m4["b0_1x1"])
    b0 = _conv_bn_relu(b0, m4["b0_3x3"], 1, "VALID")
    b1 = _conv_bn_relu(x, m4["b1_1x1"])
    b1 = _conv_bn_relu(b1, m4["b1_1x7"])
    b1 = _conv_bn_relu(b1, m4["b1_7x1"])
    b1 = _conv_bn_relu(b1, m4["b1_3x3"], 1, "VALID")
    mixed_4a = jnp.concatenate([b0, b1], axis=-1)

    m5a = params["Mixed_5a"]
    x = jnp.concatenate([_conv_bn_relu(mixed_4a, m5a["conv"], 2, "VALID"),
                         _max_pool(mixed_4a)], axis=-1)

    m5 = params["Mixed_5b"]
    b0 = _conv_bn_relu(x, m5["b0_1x1"])
    b1 = _conv_bn_relu(_conv_bn_relu(x, m5["b1_1x1"]), m5["b1_3x3"])
    b2 = _conv_bn_relu(_conv_bn_relu(
        _conv_bn_relu(x, m5["b2_1x1"]), m5["b2_3x3a"]), m5["b2_3x3b"])
    b3 = _conv_bn_relu(_avg_pool_3x3_same(x), m5["b3_1x1"])
    mixed_5b = jnp.concatenate([b0, b1, b2, b3], axis=-1)

    return [conv2a, mixed_4a, mixed_5b]


def perceptual_loss(params: Params, image1: jnp.ndarray, image2: jnp.ndarray
                    ) -> jnp.ndarray:
    """Mean-L1 over the three endpoints (``graph_single.get_perceptual_loss``).
    Inputs in [-1, 1] NHWC at any size; resized to 299 like the reference."""
    def prep(img):
        img = (img + 1.0) / 2.0
        return resize_bilinear_half_pixel(img, 299, 299)
    e1 = extract_endpoints(params, prep(image1))
    e2 = extract_endpoints(params, prep(image2))
    return sum(jnp.mean(jnp.abs(a - b)) for a, b in zip(e1, e2))
