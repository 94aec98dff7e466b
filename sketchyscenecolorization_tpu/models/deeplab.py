"""DeepLab-v2 (ResNet-101) backbone with frozen batch-norm, output stride 8.

Functional re-design of the reference ``Instance_Matching/deeplab_model.py``:
- bottleneck residual units [3, 4, 23, 3] (``deeplab_model.py:65-107``),
  atrous rate 2 in group_4 and rate 4 in group_5 (``:90-100``);
- frozen BN whose stored moments are divided by a stored scalar ``factor``
  (``:176-231``), eps 0.001;
- optional ASPP head with rates (6, 12, 18, 24) summed (``:109-121``).

Parameters are a nested dict mirroring the reference variable scopes
(``ResNet/group_*/.../DW``) so a TF1-checkpoint converter is a pure rename.
All convs run through XLA's conv emitter (MXU); BN+ReLU fuse into the conv
epilogue under jit.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.conv import conv2d, max_pool_3x3_s2
from ..ops.norm import frozen_batch_norm

FILTERS = (64, 256, 512, 1024, 2048)
NUM_UNITS = (3, 4, 23, 3)
ASPP_RATES = (6, 12, 18, 24)

Params = Dict[str, Any]


def _conv_init(key, k, cin, cout):
    n = k * k * cout
    return {"DW": jax.random.normal(key, (k, k, cin, cout), jnp.float32) * np.sqrt(2.0 / n)}


def _bn_init(c):
    return {
        "beta": jnp.zeros((c,), jnp.float32),
        "gamma": jnp.ones((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "variance": jnp.ones((c,), jnp.float32),
        "factor": jnp.ones((1,), jnp.float32),
    }


def _bn(x, p):
    return frozen_batch_norm(x, p["mean"], p["variance"], p["beta"], p["gamma"], p["factor"])


def _bottleneck_init(key, cin, cout):
    mid = cout // 4
    keys = jax.random.split(key, 4)
    p = {
        "block_1": {"conv": _conv_init(keys[0], 1, cin, mid), "bn": _bn_init(mid)},
        "block_2": {"conv": _conv_init(keys[1], 3, mid, mid), "bn": _bn_init(mid)},
        "block_3": {"conv": _conv_init(keys[2], 1, mid, cout), "bn": _bn_init(cout)},
    }
    if cin != cout:
        p["block_add"] = {"conv": _conv_init(keys[3], 1, cin, cout), "bn": _bn_init(cout)}
    return p


def _bottleneck(x, p, stride: int, atrous: int = 1, compute_dtype=None):
    """Reference ``deeplab_model.py:233-260``; the 1x1 convs never dilate in
    effect (rate on a 1x1 kernel is a no-op) but stride applies to block_1
    and the shortcut."""
    cd = compute_dtype
    orig = x
    y = conv2d(x, p["block_1"]["conv"]["DW"], stride=stride, rate=atrous,
               compute_dtype=cd)
    y = jnp.maximum(_bn(y, p["block_1"]["bn"]), 0.0)
    y = conv2d(y, p["block_2"]["conv"]["DW"], stride=1, rate=atrous,
               compute_dtype=cd)
    y = jnp.maximum(_bn(y, p["block_2"]["bn"]), 0.0)
    y = conv2d(y, p["block_3"]["conv"]["DW"], stride=1, rate=atrous,
               compute_dtype=cd)
    y = _bn(y, p["block_3"]["bn"])
    if "block_add" in p:
        orig = conv2d(orig, p["block_add"]["conv"]["DW"], stride=stride,
                      rate=atrous, compute_dtype=cd)
        orig = _bn(orig, p["block_add"]["bn"])
    return jnp.maximum(y + orig, 0.0)


def init_params(key, num_classes: Optional[int] = None) -> Params:
    """Build the parameter tree; include the ASPP head iff num_classes given."""
    n_keys = 2 + sum(NUM_UNITS) + 4
    keys = iter(jax.random.split(key, n_keys + 4))
    params: Params = {
        "group_1": {
            "conv1": _conv_init(next(keys), 7, 3, FILTERS[0]),
            "bn_conv1": _bn_init(FILTERS[0]),
        }
    }
    group_specs = [
        ("group_2", FILTERS[0], FILTERS[1], NUM_UNITS[0]),
        ("group_3", FILTERS[1], FILTERS[2], NUM_UNITS[1]),
        ("group_4", FILTERS[2], FILTERS[3], NUM_UNITS[2]),
        ("group_5", FILTERS[3], FILTERS[4], NUM_UNITS[3]),
    ]
    for name, cin, cout, units in group_specs:
        params[f"{name}_0"] = _bottleneck_init(next(keys), cin, cout)
        for i in range(1, units):
            params[f"{name}_{i}"] = _bottleneck_init(next(keys), cout, cout)
    if num_classes is not None:
        params["fc1_voc12"] = {
            f"conv{i}": {
                "DW": jax.random.normal(next(keys), (3, 3, FILTERS[4], num_classes), jnp.float32) * 0.01,
                "biases": jnp.zeros((num_classes,), jnp.float32),
            }
            for i in range(4)
        }
    return params


def apply(params: Params, images: jnp.ndarray, *, intermediate: bool = True,
          compute_dtype=None):
    """images: [N, H, W, 3] mean-subtracted float32.

    Returns the [N, H/8, W/8, 2048] feature map when ``intermediate`` (the RMI
    path), else ASPP logits summed over rates (``deeplab_model.py:109-121``).

    ``compute_dtype='bfloat16'`` runs the convolutions with bf16 operands
    (full-rate MXU on TPU) while BN/residual math and accumulation stay
    float32; None keeps everything float32 for bit-parity testing.
    """
    cd = jnp.bfloat16 if compute_dtype in ("bfloat16", jnp.bfloat16) else None
    x = conv2d(images, params["group_1"]["conv1"]["DW"], stride=2,
               compute_dtype=cd)
    x = jnp.maximum(_bn(x, params["group_1"]["bn_conv1"]), 0.0)
    x = max_pool_3x3_s2(x)

    specs = [
        ("group_2", NUM_UNITS[0], 1, 1),
        ("group_3", NUM_UNITS[1], 2, 1),
        ("group_4", NUM_UNITS[2], 1, 2),
        ("group_5", NUM_UNITS[3], 1, 4),
    ]
    for name, units, stride, atrous in specs:
        x = _bottleneck(x, params[f"{name}_0"], stride=stride, atrous=atrous,
                        compute_dtype=cd)
        for i in range(1, units):
            x = _bottleneck(x, params[f"{name}_{i}"], stride=1, atrous=atrous,
                            compute_dtype=cd)

    x = jnp.maximum(x, 0.0)  # group_last
    if intermediate:
        return x

    head = params["fc1_voc12"]
    logits = None
    for i, rate in enumerate(ASPP_RATES):
        p = head[f"conv{i}"]
        y = conv2d(x, p["DW"], stride=1, rate=rate, compute_dtype=cd) + p["biases"]
        logits = y if logits is None else logits + y
    return logits
