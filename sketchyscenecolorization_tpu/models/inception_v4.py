"""Inception-v4 — the complete network, plus the FG GAN perceptual loss.

Reference: ``obj_lib/inception_v4.py`` (slim) + ``obj_lib/inception_utils.py``
(arg scope: BN after every conv, no scale, eps 1e-3, ReLU).  The FG GAN
consumes only the stem through ``Mixed_5b`` for its perceptual loss
(``obj_lib/graph_single.py:467-511``: endpoints [Conv2d_2a_3x3, Mixed_4a,
Mixed_5b], mean-L1 over the two images resized to 299 and normalized to
[0, 1]; the reference scaffolds the loss but multiplies it by 0.0,
``graph_single.py:557-559`` — exposed here behind ``coeff_perceptual``).

The full network is implemented to parity with the reference file
(``inception_v4.py:147-254``: stem, 4x Inception-A, Reduction-A,
7x Inception-B, Reduction-B, 3x Inception-C; ``:255-318``: AuxLogits head
off Mixed_6h and the Logits head with dropout keep 0.8).  Parameter paths
mirror the TF1/slim variable scopes 1:1 (``InceptionV4/Mixed_5b/Branch_0/
Conv2d_0a_1x1/{weights,BatchNorm/...}``) so the TF1-checkpoint converter
(``utils/tf1_converter.py:convert_inception_v4``) is a pure rename — the
stock slim ImageNet checkpoint restores directly.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.image import resize_bilinear_half_pixel

Params = Dict[str, Any]
_DIMS = ("NHWC", "HWIO", "NHWC")

# Every conv in the network: scope path -> (kh, kw, cin, cout).  Derived
# from inception_v4.py:34-253; the table IS the architecture spec, so the
# converter's name map enumerates it directly.
_STEM: List[Tuple[str, Tuple[int, int, int, int]]] = [
    ("Conv2d_1a_3x3", (3, 3, 3, 32)),
    ("Conv2d_2a_3x3", (3, 3, 32, 32)),
    ("Conv2d_2b_3x3", (3, 3, 32, 64)),
    ("Mixed_3a/Branch_1/Conv2d_0a_3x3", (3, 3, 64, 96)),
    ("Mixed_4a/Branch_0/Conv2d_0a_1x1", (1, 1, 160, 64)),
    ("Mixed_4a/Branch_0/Conv2d_1a_3x3", (3, 3, 64, 96)),
    ("Mixed_4a/Branch_1/Conv2d_0a_1x1", (1, 1, 160, 64)),
    ("Mixed_4a/Branch_1/Conv2d_0b_1x7", (1, 7, 64, 64)),
    ("Mixed_4a/Branch_1/Conv2d_0c_7x1", (7, 1, 64, 64)),
    ("Mixed_4a/Branch_1/Conv2d_1a_3x3", (3, 3, 64, 96)),
    ("Mixed_5a/Branch_0/Conv2d_1a_3x3", (3, 3, 192, 192)),
]


def _block_a(scope: str) -> List[Tuple[str, Tuple[int, int, int, int]]]:
    # inception_v4.py:34-52 (input 35x35x384, output 384)
    return [(f"{scope}/Branch_0/Conv2d_0a_1x1", (1, 1, 384, 96)),
            (f"{scope}/Branch_1/Conv2d_0a_1x1", (1, 1, 384, 64)),
            (f"{scope}/Branch_1/Conv2d_0b_3x3", (3, 3, 64, 96)),
            (f"{scope}/Branch_2/Conv2d_0a_1x1", (1, 1, 384, 64)),
            (f"{scope}/Branch_2/Conv2d_0b_3x3", (3, 3, 64, 96)),
            (f"{scope}/Branch_2/Conv2d_0c_3x3", (3, 3, 96, 96)),
            (f"{scope}/Branch_3/Conv2d_0b_1x1", (1, 1, 384, 96))]


_REDUCTION_A = [  # inception_v4.py:55-72 (384 -> 1024 at 17x17)
    ("Mixed_6a/Branch_0/Conv2d_1a_3x3", (3, 3, 384, 384)),
    ("Mixed_6a/Branch_1/Conv2d_0a_1x1", (1, 1, 384, 192)),
    ("Mixed_6a/Branch_1/Conv2d_0b_3x3", (3, 3, 192, 224)),
    ("Mixed_6a/Branch_1/Conv2d_1a_3x3", (3, 3, 224, 256)),
]


def _block_b(scope: str) -> List[Tuple[str, Tuple[int, int, int, int]]]:
    # inception_v4.py:75-96 (input 17x17x1024, output 1024)
    return [(f"{scope}/Branch_0/Conv2d_0a_1x1", (1, 1, 1024, 384)),
            (f"{scope}/Branch_1/Conv2d_0a_1x1", (1, 1, 1024, 192)),
            (f"{scope}/Branch_1/Conv2d_0b_1x7", (1, 7, 192, 224)),
            (f"{scope}/Branch_1/Conv2d_0c_7x1", (7, 1, 224, 256)),
            (f"{scope}/Branch_2/Conv2d_0a_1x1", (1, 1, 1024, 192)),
            (f"{scope}/Branch_2/Conv2d_0b_7x1", (7, 1, 192, 192)),
            (f"{scope}/Branch_2/Conv2d_0c_1x7", (1, 7, 192, 224)),
            (f"{scope}/Branch_2/Conv2d_0d_7x1", (7, 1, 224, 224)),
            (f"{scope}/Branch_2/Conv2d_0e_1x7", (1, 7, 224, 256)),
            (f"{scope}/Branch_3/Conv2d_0b_1x1", (1, 1, 1024, 128))]


_REDUCTION_B = [  # inception_v4.py:99-118 (1024 -> 1536 at 8x8)
    ("Mixed_7a/Branch_0/Conv2d_0a_1x1", (1, 1, 1024, 192)),
    ("Mixed_7a/Branch_0/Conv2d_1a_3x3", (3, 3, 192, 192)),
    ("Mixed_7a/Branch_1/Conv2d_0a_1x1", (1, 1, 1024, 256)),
    ("Mixed_7a/Branch_1/Conv2d_0b_1x7", (1, 7, 256, 256)),
    ("Mixed_7a/Branch_1/Conv2d_0c_7x1", (7, 1, 256, 320)),
    ("Mixed_7a/Branch_1/Conv2d_1a_3x3", (3, 3, 320, 320)),
]


def _block_c(scope: str) -> List[Tuple[str, Tuple[int, int, int, int]]]:
    # inception_v4.py:121-144 (input 8x8x1536, output 1536)
    return [(f"{scope}/Branch_0/Conv2d_0a_1x1", (1, 1, 1536, 256)),
            (f"{scope}/Branch_1/Conv2d_0a_1x1", (1, 1, 1536, 384)),
            (f"{scope}/Branch_1/Conv2d_0b_1x3", (1, 3, 384, 256)),
            (f"{scope}/Branch_1/Conv2d_0c_3x1", (3, 1, 384, 256)),
            (f"{scope}/Branch_2/Conv2d_0a_1x1", (1, 1, 1536, 384)),
            (f"{scope}/Branch_2/Conv2d_0b_3x1", (3, 1, 384, 448)),
            (f"{scope}/Branch_2/Conv2d_0c_1x3", (1, 3, 448, 512)),
            (f"{scope}/Branch_2/Conv2d_0d_1x3", (1, 3, 512, 256)),
            (f"{scope}/Branch_2/Conv2d_0e_3x1", (3, 1, 512, 256)),
            (f"{scope}/Branch_3/Conv2d_0b_1x1", (1, 1, 1536, 256))]


_AUX = [  # inception_v4.py:286-300 (off Mixed_6h: 17x17x1024)
    ("AuxLogits/Conv2d_1b_1x1", (1, 1, 1024, 128)),
    ("AuxLogits/Conv2d_2a", (5, 5, 128, 768)),
]

# Ordered endpoint list (inception_v4.py:152-157)
ENDPOINTS: List[str] = (
    ["Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3", "Mixed_3a",
     "Mixed_4a", "Mixed_5a"]
    + [f"Mixed_5{c}" for c in "bcde"] + ["Mixed_6a"]
    + [f"Mixed_6{c}" for c in "bcdefgh"] + ["Mixed_7a"]
    + [f"Mixed_7{c}" for c in "bcd"])


def conv_table(final_endpoint: str = "Mixed_7d"
               ) -> List[Tuple[str, Tuple[int, int, int, int]]]:
    """All conv (path, shape) pairs for the base through ``final_endpoint``."""
    if final_endpoint not in ENDPOINTS:
        raise ValueError(f"unknown endpoint {final_endpoint}")
    table: List[Tuple[str, Tuple[int, int, int, int]]] = []
    stop = ENDPOINTS.index(final_endpoint)
    for path, shape in _STEM:
        table.append((path, shape))
    for i, name in enumerate(ENDPOINTS):
        if name.startswith("Mixed_5") and name != "Mixed_5a":
            table.extend(_block_a(name))
        elif name == "Mixed_6a":
            table.extend(_REDUCTION_A)
        elif name.startswith("Mixed_6"):
            table.extend(_block_b(name))
        elif name == "Mixed_7a":
            table.extend(_REDUCTION_B)
        elif name.startswith("Mixed_7"):
            table.extend(_block_c(name))
        if i == stop:
            break
    # the stem entries above cover everything through Mixed_5a; drop any
    # beyond the requested endpoint
    keep_stem = {"Conv2d_1a_3x3": 0, "Conv2d_2a_3x3": 1, "Conv2d_2b_3x3": 2,
                 "Mixed_3a": 3, "Mixed_4a": 4, "Mixed_5a": 5}
    if final_endpoint in keep_stem:
        cut = {"Conv2d_1a_3x3": 1, "Conv2d_2a_3x3": 2, "Conv2d_2b_3x3": 3,
               "Mixed_3a": 4, "Mixed_4a": 10, "Mixed_5a": 11}[final_endpoint]
        table = table[:cut]
    return table


def _set_path(tree: Params, path: str, value: Any) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _get_path(tree: Params, path: str) -> Any:
    node = tree
    for p in path.split("/"):
        node = node[p]
    return node


def init_params(key, final_endpoint: str = "Mixed_7d",
                num_classes: Optional[int] = None,
                create_aux_logits: bool = True) -> Params:
    """Random init of the base through ``final_endpoint``; when
    ``num_classes`` is given (and the base is full) the Logits head — and,
    with ``create_aux_logits``, the AuxLogits head — are included too."""
    table = list(conv_table(final_endpoint))
    heads: List[Tuple[str, Tuple[int, int]]] = []
    if num_classes is not None and final_endpoint == "Mixed_7d":
        if create_aux_logits:
            table.extend(_AUX)
            heads.append(("AuxLogits/Aux_logits", (768, num_classes)))
        heads.append(("Logits/Logits", (1536, num_classes)))
    keys = jax.random.split(key, len(table) + max(len(heads), 1))
    p: Params = {}
    for (path, (kh, kw, cin, cout)), k in zip(table, keys):
        _set_path(p, path, {
            "weights": jax.random.truncated_normal(
                k, -2, 2, (kh, kw, cin, cout), jnp.float32) * 0.1,
            "BatchNorm": {
                "beta": jnp.zeros((cout,), jnp.float32),
                "moving_mean": jnp.zeros((cout,), jnp.float32),
                "moving_variance": jnp.ones((cout,), jnp.float32),
            },
        })
    for (path, (fan_in, n)), k in zip(heads, keys[len(table):]):
        _set_path(p, path, {
            "weights": jax.random.truncated_normal(
                k, -2, 2, (fan_in, n), jnp.float32) * 0.05,
            "biases": jnp.zeros((n,), jnp.float32),
        })
    return p


def _conv_bn_relu(x, p, stride=1, padding="SAME"):
    y = lax.conv_general_dilated(x, p["weights"], (stride, stride), padding,
                                 dimension_numbers=_DIMS,
                                 preferred_element_type=jnp.float32)
    bn = p["BatchNorm"]
    y = ((y - bn["moving_mean"])
         / jnp.sqrt(bn["moving_variance"] + 1e-3) + bn["beta"])
    return jnp.maximum(y, 0.0)


def _max_pool(x, k=3, stride=2, padding="VALID"):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, k, k, 1),
                             (1, stride, stride, 1), padding)


def _avg_pool(x, k=3, stride=1, padding="SAME"):
    # slim.avg_pool2d: count excludes SAME padding
    ones = lax.reduce_window(jnp.ones_like(x), 0.0, lax.add, (1, k, k, 1),
                             (1, stride, stride, 1), padding)
    summed = lax.reduce_window(x, 0.0, lax.add, (1, k, k, 1),
                               (1, stride, stride, 1), padding)
    return summed / ones


def _run_branches(x, p, branches):
    """branches: list of lists of (conv-name, stride, padding) applied in
    sequence within each Branch_i; a leading name of '<maxpool>'/'<avgpool>'
    runs the pooling op instead."""
    outs = []
    for bi, chain in enumerate(branches):
        y = x
        for name, stride, padding in chain:
            if name == "<maxpool>":
                y = _max_pool(y, 3, stride, padding)
            elif name == "<avgpool>":
                y = _avg_pool(y, 3, stride, padding)
            else:
                y = _conv_bn_relu(y, p[f"Branch_{bi}"][name], stride, padding)
        outs.append(y)
    return outs


def _cat(outs):
    return jnp.concatenate(outs, axis=-1)


def _block_a_fwd(x, p):
    return _cat(_run_branches(x, p, [
        [("Conv2d_0a_1x1", 1, "SAME")],
        [("Conv2d_0a_1x1", 1, "SAME"), ("Conv2d_0b_3x3", 1, "SAME")],
        [("Conv2d_0a_1x1", 1, "SAME"), ("Conv2d_0b_3x3", 1, "SAME"),
         ("Conv2d_0c_3x3", 1, "SAME")],
        [("<avgpool>", 1, "SAME"), ("Conv2d_0b_1x1", 1, "SAME")]]))


def _reduction_a_fwd(x, p):
    return _cat(_run_branches(x, p, [
        [("Conv2d_1a_3x3", 2, "VALID")],
        [("Conv2d_0a_1x1", 1, "SAME"), ("Conv2d_0b_3x3", 1, "SAME"),
         ("Conv2d_1a_3x3", 2, "VALID")],
        [("<maxpool>", 2, "VALID")]]))


def _block_b_fwd(x, p):
    return _cat(_run_branches(x, p, [
        [("Conv2d_0a_1x1", 1, "SAME")],
        [("Conv2d_0a_1x1", 1, "SAME"), ("Conv2d_0b_1x7", 1, "SAME"),
         ("Conv2d_0c_7x1", 1, "SAME")],
        [("Conv2d_0a_1x1", 1, "SAME"), ("Conv2d_0b_7x1", 1, "SAME"),
         ("Conv2d_0c_1x7", 1, "SAME"), ("Conv2d_0d_7x1", 1, "SAME"),
         ("Conv2d_0e_1x7", 1, "SAME")],
        [("<avgpool>", 1, "SAME"), ("Conv2d_0b_1x1", 1, "SAME")]]))


def _reduction_b_fwd(x, p):
    return _cat(_run_branches(x, p, [
        [("Conv2d_0a_1x1", 1, "SAME"), ("Conv2d_1a_3x3", 2, "VALID")],
        [("Conv2d_0a_1x1", 1, "SAME"), ("Conv2d_0b_1x7", 1, "SAME"),
         ("Conv2d_0c_7x1", 1, "SAME"), ("Conv2d_1a_3x3", 2, "VALID")],
        [("<maxpool>", 2, "VALID")]]))


def _block_c_fwd(x, p):
    # Branch_1/Branch_2 fork into two parallel convs that are concatenated
    # (inception_v4.py:127-139)
    b0 = _conv_bn_relu(x, p["Branch_0"]["Conv2d_0a_1x1"])
    b1 = _conv_bn_relu(x, p["Branch_1"]["Conv2d_0a_1x1"])
    b1 = _cat([_conv_bn_relu(b1, p["Branch_1"]["Conv2d_0b_1x3"]),
               _conv_bn_relu(b1, p["Branch_1"]["Conv2d_0c_3x1"])])
    b2 = _conv_bn_relu(x, p["Branch_2"]["Conv2d_0a_1x1"])
    b2 = _conv_bn_relu(b2, p["Branch_2"]["Conv2d_0b_3x1"])
    b2 = _conv_bn_relu(b2, p["Branch_2"]["Conv2d_0c_1x3"])
    b2 = _cat([_conv_bn_relu(b2, p["Branch_2"]["Conv2d_0d_1x3"]),
               _conv_bn_relu(b2, p["Branch_2"]["Conv2d_0e_3x1"])])
    b3 = _conv_bn_relu(_avg_pool(x), p["Branch_3"]["Conv2d_0b_1x1"])
    return _cat([b0, b1, b2, b3])


def inception_v4_base(params: Params, images: jnp.ndarray,
                      final_endpoint: str = "Mixed_7d"
                      ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """The v4 base through ``final_endpoint`` (inception_v4.py:147-253).
    images: [N, 299, 299, 3].  Returns (net, endpoints)."""
    end_points: Dict[str, jnp.ndarray] = {}
    stop = ENDPOINTS.index(final_endpoint)  # validates the name

    def done(name, net):
        end_points[name] = net
        return ENDPOINTS.index(name) >= stop

    x = _conv_bn_relu(images, params["Conv2d_1a_3x3"], 2, "VALID")
    if done("Conv2d_1a_3x3", x):
        return x, end_points
    x = _conv_bn_relu(x, params["Conv2d_2a_3x3"], 1, "VALID")
    if done("Conv2d_2a_3x3", x):
        return x, end_points
    x = _conv_bn_relu(x, params["Conv2d_2b_3x3"], 1, "SAME")
    if done("Conv2d_2b_3x3", x):
        return x, end_points

    x = _cat([_max_pool(x),
              _conv_bn_relu(x, params["Mixed_3a"]["Branch_1"]["Conv2d_0a_3x3"],
                            2, "VALID")])
    if done("Mixed_3a", x):
        return x, end_points

    m4 = params["Mixed_4a"]
    b0 = _conv_bn_relu(x, m4["Branch_0"]["Conv2d_0a_1x1"])
    b0 = _conv_bn_relu(b0, m4["Branch_0"]["Conv2d_1a_3x3"], 1, "VALID")
    b1 = _conv_bn_relu(x, m4["Branch_1"]["Conv2d_0a_1x1"])
    b1 = _conv_bn_relu(b1, m4["Branch_1"]["Conv2d_0b_1x7"])
    b1 = _conv_bn_relu(b1, m4["Branch_1"]["Conv2d_0c_7x1"])
    b1 = _conv_bn_relu(b1, m4["Branch_1"]["Conv2d_1a_3x3"], 1, "VALID")
    x = _cat([b0, b1])
    if done("Mixed_4a", x):
        return x, end_points

    x = _cat([_conv_bn_relu(x, params["Mixed_5a"]["Branch_0"]["Conv2d_1a_3x3"],
                            2, "VALID"),
              _max_pool(x)])
    if done("Mixed_5a", x):
        return x, end_points

    for c in "bcde":
        x = _block_a_fwd(x, params[f"Mixed_5{c}"])
        if done(f"Mixed_5{c}", x):
            return x, end_points
    x = _reduction_a_fwd(x, params["Mixed_6a"])
    if done("Mixed_6a", x):
        return x, end_points
    for c in "bcdefgh":
        x = _block_b_fwd(x, params[f"Mixed_6{c}"])
        if done(f"Mixed_6{c}", x):
            return x, end_points
    x = _reduction_b_fwd(x, params["Mixed_7a"])
    if done("Mixed_7a", x):
        return x, end_points
    for c in "bcd":
        x = _block_c_fwd(x, params[f"Mixed_7{c}"])
        if done(f"Mixed_7{c}", x):
            return x, end_points
    raise AssertionError  # unreachable: stop is always hit


def inception_v4(params: Params, images: jnp.ndarray,
                 is_training: bool = False,
                 dropout_rng: Optional[jax.Array] = None,
                 dropout_keep_prob: float = 0.8
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Full model with classification heads (inception_v4.py:255-318).
    Returns (logits, end_points) with 'AuxLogits' (when present in params),
    'PreLogitsFlatten', 'Logits', 'Predictions'."""
    net, end_points = inception_v4_base(params, images, "Mixed_7d")

    if "AuxLogits" in params:
        aux = end_points["Mixed_6h"]
        # slim.avg_pool2d [5,5] stride 3 VALID (17 -> 5)
        ones = lax.reduce_window(jnp.ones_like(aux), 0.0, lax.add,
                                 (1, 5, 5, 1), (1, 3, 3, 1), "VALID")
        aux = lax.reduce_window(aux, 0.0, lax.add, (1, 5, 5, 1),
                                (1, 3, 3, 1), "VALID") / ones
        aux = _conv_bn_relu(aux, params["AuxLogits"]["Conv2d_1b_1x1"])
        aux = _conv_bn_relu(aux, params["AuxLogits"]["Conv2d_2a"],
                            1, "VALID")
        head = params["AuxLogits"]["Aux_logits"]
        aux = aux.reshape(aux.shape[0], -1) @ head["weights"] + head["biases"]
        end_points["AuxLogits"] = aux

    # global average pool over the full 8x8 extent, dropout, fc
    net = jnp.mean(net, axis=(1, 2))
    if is_training and dropout_keep_prob < 1.0:
        if dropout_rng is None:
            raise ValueError("dropout_rng required when is_training")
        keep = jax.random.bernoulli(dropout_rng, dropout_keep_prob, net.shape)
        net = jnp.where(keep, net / dropout_keep_prob, 0.0)
    end_points["PreLogitsFlatten"] = net
    head = params["Logits"]["Logits"]
    logits = net @ head["weights"] + head["biases"]
    end_points["Logits"] = logits
    end_points["Predictions"] = jax.nn.softmax(logits)
    return logits, end_points


def extract_endpoints(params: Params, images: jnp.ndarray
                      ) -> List[jnp.ndarray]:
    """images: [N, 299, 299, 3] in [0, 1].  The three perceptual endpoints
    [Conv2d_2a_3x3, Mixed_4a, Mixed_5b] (graph_single.py:473-489)."""
    _, eps = inception_v4_base(params, images, "Mixed_5b")
    return [eps["Conv2d_2a_3x3"], eps["Mixed_4a"], eps["Mixed_5b"]]


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
