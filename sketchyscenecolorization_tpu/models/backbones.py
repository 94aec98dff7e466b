"""Alternative visual backbones for the RMI matching model: FCN-8s, SegNet,
and DeepLab-v3+ (selected by ``MatchingConfig.backbone``; the default
DeepLab-v2 lives in ``models/deeplab.py``).

References: ``Instance_Matching/fcn8s_model.py`` (VGG-19 stack :8-53 with
*average* pools, fc6/7/8 :118-133, deconv fusions :136-150, intermediate =
fuse_2), ``Instance_Matching/segnet_model.py`` (conv+BN+relu encoder with
argmax pooling :55-84, scatter unpooling decoder :151-188, intermediate =
dec_4 :96-102), and ``Instance_Matching/deeplab_v3plus_model.py``
(resnet_v1_101_beta root :68-84, multi-grid [1,2,4] at OS 8 :480-496, ASPP
with image-level pooling and separable convs :585-651, decoder to OS 4 with
48-ch low-level projection :756-848).

All are inference-faithful functional modules over nested param dicts (BN
uses stored moving statistics, matching the reference's frozen/inference
batch-norm behavior; SegNet's contrib BN keeps batch statistics -- it is
always called in its default training mode there).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.conv import conv2d, conv2d_transpose
from ..ops.image import resize_bilinear_align_corners
from jax import lax

Params = Dict[str, Any]


def _he_conv(key, k, cin, cout):
    n = k * k * cout
    return jax.random.normal(key, (k, k, cin, cout), jnp.float32) * np.sqrt(2.0 / n)


# ====================================================================== FCN-8s

VGG_LAYERS = (
    ("conv1_1", 3, 64), ("conv1_2", 64, 64), ("pool1",),
    ("conv2_1", 64, 128), ("conv2_2", 128, 128), ("pool2",),
    ("conv3_1", 128, 256), ("conv3_2", 256, 256), ("conv3_3", 256, 256),
    ("conv3_4", 256, 256), ("pool3",),
    ("conv4_1", 256, 512), ("conv4_2", 512, 512), ("conv4_3", 512, 512),
    ("conv4_4", 512, 512), ("pool4",),
    ("conv5_1", 512, 512), ("conv5_2", 512, 512), ("conv5_3", 512, 512),
    ("conv5_4", 512, 512),
)


def _avg_pool_2x2(x):
    return lax.reduce_window(x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                             "SAME") / 4.0


def _max_pool_2x2(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1),
                             (1, 2, 2, 1), "SAME")


class fcn8s:
    SCOPE = "FCN_8s"

    @staticmethod
    def init_params(key, num_classes: int = 47) -> Params:
        keys = iter(jax.random.split(key, 32))
        p: Params = {}
        for spec in VGG_LAYERS:
            if spec[0].startswith("conv"):
                name, cin, cout = spec
                p[name] = {"DW": _he_conv(next(keys), 3, cin, cout),
                           "bias": jnp.zeros((cout,), jnp.float32)}
        p["fc6"] = {"DW": _he_conv(next(keys), 7, 512, 4096),
                    "bias": jnp.zeros((4096,), jnp.float32)}
        p["fc7"] = {"DW": _he_conv(next(keys), 1, 4096, 4096),
                    "bias": jnp.zeros((4096,), jnp.float32)}
        p["fc8"] = {"DW": _he_conv(next(keys), 1, 4096, num_classes),
                    "bias": jnp.zeros((num_classes,), jnp.float32)}
        # TF stores deconv filters [kh, kw, out, in]; kept HWIO here ([in, out])
        p["deconv1"] = {"DW": _he_conv(next(keys), 4, num_classes, 512),
                        "bias": jnp.zeros((512,), jnp.float32)}
        p["deconv2"] = {"DW": _he_conv(next(keys), 4, 512, 256),
                        "bias": jnp.zeros((256,), jnp.float32)}
        p["deconv3"] = {"DW": _he_conv(next(keys), 16, 256, num_classes),
                        "bias": jnp.zeros((num_classes,), jnp.float32)}
        return {fcn8s.SCOPE: p}

    @staticmethod
    def apply(params: Params, images, *, intermediate: bool = True,
              compute_dtype=None):
        cd = jnp.bfloat16 if compute_dtype in ("bfloat16", jnp.bfloat16) else None
        p = params[fcn8s.SCOPE]
        net = {}
        x = images
        for spec in VGG_LAYERS:
            name = spec[0]
            if name.startswith("conv"):
                x = jnp.maximum(
                    conv2d(x, p[name]["DW"], compute_dtype=cd) + p[name]["bias"],
                    0.0)
            else:
                x = _avg_pool_2x2(x)
            net[name] = x

        pool5 = _max_pool_2x2(net["conv5_3"])
        x = jnp.maximum(conv2d(pool5, p["fc6"]["DW"], compute_dtype=cd)
                        + p["fc6"]["bias"], 0.0)
        x = jnp.maximum(conv2d(x, p["fc7"]["DW"], compute_dtype=cd)
                        + p["fc7"]["bias"], 0.0)
        x = conv2d(x, p["fc8"]["DW"], compute_dtype=cd) + p["fc8"]["bias"]

        up1 = conv2d_transpose(x, p["deconv1"]["DW"], stride=2,
                               compute_dtype=cd) + p["deconv1"]["bias"]
        fuse_1 = up1 + net["pool4"]
        up2 = conv2d_transpose(fuse_1, p["deconv2"]["DW"], stride=2,
                               compute_dtype=cd) + p["deconv2"]["bias"]
        fuse_2 = up2 + net["pool3"]               # [N, H/8, W/8, 256]
        if intermediate:
            return fuse_2
        logits = conv2d_transpose(fuse_2, p["deconv3"]["DW"], stride=8,
                                  compute_dtype=cd) + p["deconv3"]["bias"]
        return logits


# ====================================================================== SegNet

SEGNET_ENC = [("enc_1", (64, 64)), ("enc_2", (128, 128)),
              ("enc_3", (256, 256, 256)), ("enc_4", (512, 512, 512)),
              ("enc_5", (512, 512, 512))]
# dec_4's trailing 256 reduction is commented out in the reference
# (``segnet_model.py:99``), leaving its full decoder channel-inconsistent
# (only the intermediate exit is ever used there); it is restored here so the
# full segmentation path actually runs -- the intermediate exit still returns
# after conv2, matching the reference.
SEGNET_DEC_FULL = [("dec_5", (512, 512, 512)), ("dec_4", (512, 512, 256)),
                   ("dec_3", (256, 256, 128)), ("dec_2", (128, 64))]


def _max_pool_argmax_2x2(x):
    """2x2/2 pooling returning values and TF-style flat argmax indices
    (index into the flattened [H, W, C] volume per batch element).
    Requires even spatial dims (768-flow sizes are all even)."""
    n, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0
    xr = x.reshape(n, h // 2, 2, w // 2, 2, c)
    xr = jnp.moveaxis(xr, 2, 3).reshape(n, h // 2, w // 2, 4, c)
    amax = jnp.argmax(xr, axis=3)                               # [n,h2,w2,c]
    vals = jnp.max(xr, axis=3)
    # window offset -> (dy, dx)
    dy = amax // 2
    dx = amax % 2
    rows = (jnp.arange(h // 2)[None, :, None, None] * 2 + dy)
    cols = (jnp.arange(w // 2)[None, None, :, None] * 2 + dx)
    chan = jnp.arange(c)[None, None, None, :]
    flat = (rows * w + cols) * c + chan
    return vals, flat


def _unpool_2x2(vals, indices, out_h, out_w):
    """Scatter values back to their argmax positions (SegNet decoder)."""
    n, h2, w2, c = vals.shape
    flat_out = jnp.zeros((n, out_h * out_w * c), vals.dtype)
    idx = indices.reshape(n, -1)
    flat_out = jax.vmap(lambda o, i, v: o.at[i].set(v))(
        flat_out, idx, vals.reshape(n, -1))
    return flat_out.reshape(n, out_h, out_w, c)


class segnet:
    SCOPE = "SegNet"

    @staticmethod
    def init_params(key, num_classes: int = 47) -> Params:
        keys = iter(jax.random.split(key, 40))
        p: Params = {}

        def block(cin, chans):
            layers = {}
            for i, cout in enumerate(chans):
                layers[f"conv{i + 1}"] = {
                    "DW": _he_conv(next(keys), 3, cin, cout),
                    "biases": jnp.zeros((cout,), jnp.float32),
                    "bn_beta": jnp.zeros((cout,), jnp.float32),
                }
                cin = cout
            return layers, cin

        cin = 3
        for name, chans in SEGNET_ENC:
            p[name], cin = block(cin, chans)
        dec_specs = SEGNET_DEC_FULL + [("dec_1", (64, num_classes))]
        for name, chans in dec_specs:
            p[name], cin = block(cin, chans)
        return {segnet.SCOPE: p}

    @staticmethod
    def _conv_bn_relu(x, lp, compute_dtype=None):
        y = conv2d(x, lp["DW"], compute_dtype=compute_dtype) + lp["biases"]
        # contrib batch_norm defaults: batch statistics, beta only, eps 1e-3
        mean = jnp.mean(y, axis=(0, 1, 2))
        var = jnp.var(y, axis=(0, 1, 2))
        y = (y - mean) / jnp.sqrt(var + 1e-3) + lp["bn_beta"]
        return jnp.maximum(y, 0.0)

    @staticmethod
    def apply(params: Params, images, *, intermediate: bool = True,
              compute_dtype=None):
        cd = jnp.bfloat16 if compute_dtype in ("bfloat16", jnp.bfloat16) else None
        p = params[segnet.SCOPE]
        x = images
        inds, sizes = [], []
        for name, chans in SEGNET_ENC:
            for i in range(len(chans)):
                x = segnet._conv_bn_relu(x, p[name][f"conv{i + 1}"], cd)
            sizes.append(x.shape[1:3])
            x, ind = _max_pool_argmax_2x2(x)
            inds.append(ind)

        dec_specs = SEGNET_DEC_FULL + [("dec_1", None)]
        for d, (name, chans) in enumerate(dec_specs):
            level = len(SEGNET_ENC) - 1 - d
            x = _unpool_2x2(x, inds[level], *sizes[level])
            n_layers = len(p[name])
            for i in range(n_layers):
                if name == "dec_4" and i == 2 and intermediate:
                    return x                      # [N, H/8, W/8, 512]
                x = segnet._conv_bn_relu(x, p[name][f"conv{i + 1}"], cd)
        return x                                  # [N, H, W, num_classes]


# ================================================================ DeepLab-v3+

V3P_BLOCKS = ((3, 256, 1), (4, 512, 2), (23, 1024, 1), (3, 2048, 1))
V3P_MULTI_GRID = (1, 2, 4)
V3P_ASPP_RATES = (6, 12, 18)
V3P_DEPTH = 256


def _bn_apply(x, bn, eps=1e-5):
    scale = bn.get("gamma", 1.0)
    return (x - bn["mean"]) / jnp.sqrt(bn["variance"] + eps) * scale + bn["beta"]


def _bn_init(c, scale=True):
    p = {"beta": jnp.zeros((c,), jnp.float32),
         "mean": jnp.zeros((c,), jnp.float32),
         "variance": jnp.ones((c,), jnp.float32)}
    if scale:
        p["gamma"] = jnp.ones((c,), jnp.float32)
    return p


def _conv_bn_relu_init(key, k, cin, cout):
    return {"DW": _he_conv(key, k, cin, cout), "bn": _bn_init(cout)}


def _sep_conv_init(key, cin, cout):
    k1, k2 = jax.random.split(key)
    return {
        "depthwise": {"DW": jax.random.truncated_normal(
            k1, -2, 2, (3, 3, cin, 1), jnp.float32) * 0.33,
            "bn": _bn_init(cin)},
        "pointwise": {"DW": jax.random.truncated_normal(
            k2, -2, 2, (1, 1, cin, cout), jnp.float32) * 0.06,
            "bn": _bn_init(cout)},
    }


def _conv2d_same(x, w, stride, compute_dtype=None):
    """slim ``conv2d_same`` for stride > 1: explicit symmetric pad then
    VALID (centers at 0, 2, 4, ... -- aligned with the subsampled shortcut),
    unlike XLA/TF 'SAME' which pads (0, 1) here."""
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    k = w.shape[0]
    pad = (k - 1) // 2
    return lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def _depthwise_conv(x, w, rate=1, compute_dtype=None):
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    c = x.shape[-1]
    return lax.conv_general_dilated(
        x, jnp.moveaxis(w, 2, 3).reshape(3, 3, 1, c), (1, 1), "SAME",
        rhs_dilation=(rate, rate), feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def _sep_conv_apply(x, p, rate=1, compute_dtype=None):
    y = _depthwise_conv(x, p["depthwise"]["DW"], rate, compute_dtype)
    y = jnp.maximum(_bn_apply(y, p["depthwise"]["bn"]), 0.0)
    y = conv2d(y, p["pointwise"]["DW"], compute_dtype=compute_dtype)
    return jnp.maximum(_bn_apply(y, p["pointwise"]["bn"]), 0.0)


class deeplab_v3plus:
    SCOPE = "resnet_v1_101"

    @staticmethod
    def init_params(key, num_classes: int = 47) -> Params:
        keys = iter(jax.random.split(key, 256))
        p: Params = {"root": {
            "conv1_1": _conv_bn_relu_init(next(keys), 3, 3, 64),
            "conv1_2": _conv_bn_relu_init(next(keys), 3, 64, 64),
            "conv1_3": _conv_bn_relu_init(next(keys), 3, 64, 128),
        }}
        cin = 128
        for b, (units, cout, _) in enumerate(V3P_BLOCKS, 1):
            block = {}
            for u in range(units):
                mid = cout // 4
                unit = {
                    "conv1": _conv_bn_relu_init(next(keys), 1, cin, mid),
                    "conv2": _conv_bn_relu_init(next(keys), 3, mid, mid),
                    "conv3": _conv_bn_relu_init(next(keys), 1, mid, cout),
                }
                if cin != cout:
                    unit["shortcut"] = _conv_bn_relu_init(next(keys), 1, cin, cout)
                block[f"unit_{u + 1}"] = unit
                cin = cout
            p[f"block{b}"] = block
        # ASPP
        p["aspp"] = {
            "image_pooling": _conv_bn_relu_init(next(keys), 1, 2048, V3P_DEPTH),
            "aspp0": _conv_bn_relu_init(next(keys), 1, 2048, V3P_DEPTH),
            "aspp1": _sep_conv_init(next(keys), 2048, V3P_DEPTH),
            "aspp2": _sep_conv_init(next(keys), 2048, V3P_DEPTH),
            "aspp3": _sep_conv_init(next(keys), 2048, V3P_DEPTH),
            "concat_projection": _conv_bn_relu_init(
                next(keys), 1, V3P_DEPTH * 5, V3P_DEPTH),
        }
        # decoder
        p["decoder"] = {
            "feature_projection": _conv_bn_relu_init(next(keys), 1, 256, 48),
            "decoder_conv0": _sep_conv_init(next(keys), V3P_DEPTH + 48, V3P_DEPTH),
            "decoder_conv1": _sep_conv_init(next(keys), V3P_DEPTH, V3P_DEPTH),
        }
        p["logits"] = {"DW": _he_conv(next(keys), 1, V3P_DEPTH, num_classes),
                       "biases": jnp.zeros((num_classes,), jnp.float32)}
        return {deeplab_v3plus.SCOPE: p}

    @staticmethod
    def _unit(x, up, stride, rate, compute_dtype):
        def cbr(y, q, k_rate=1, k_stride=1, relu=True):
            if k_stride > 1 and q["DW"].shape[0] > 1:
                y = _conv2d_same(y, q["DW"], k_stride, compute_dtype)
            else:
                y = conv2d(y, q["DW"], stride=k_stride, rate=k_rate,
                           compute_dtype=compute_dtype)
            y = _bn_apply(y, q["bn"])
            return jnp.maximum(y, 0.0) if relu else y
        shortcut = x
        if "shortcut" in up:
            shortcut = cbr(x, up["shortcut"], k_stride=stride, relu=False)
        elif stride > 1:
            shortcut = x[:, ::stride, ::stride, :]
        y = cbr(x, up["conv1"])
        y = cbr(y, up["conv2"], k_rate=rate, k_stride=stride)
        y = cbr(y, up["conv3"], relu=False)
        return jnp.maximum(y + shortcut, 0.0), y

    @staticmethod
    def apply(params: Params, images, *, intermediate: bool = True,
              num_classes: int = 47, compute_dtype=None):
        cd = jnp.bfloat16 if compute_dtype in ("bfloat16", jnp.bfloat16) else None
        p = params[deeplab_v3plus.SCOPE]
        r = p["root"]
        x = _conv2d_same(images, r["conv1_1"]["DW"], 2, cd)
        x = jnp.maximum(_bn_apply(x, r["conv1_1"]["bn"]), 0.0)
        x = conv2d(x, r["conv1_2"]["DW"], compute_dtype=cd)
        x = jnp.maximum(_bn_apply(x, r["conv1_2"]["bn"]), 0.0)
        x = conv2d(x, r["conv1_3"]["DW"], compute_dtype=cd)
        x = jnp.maximum(_bn_apply(x, r["conv1_3"]["bn"]), 0.0)
        from ..ops.conv import max_pool_3x3_s2
        x = max_pool_3x3_s2(x)                                 # OS 4 (slim pool1: 3x3/2 SAME)

        low_level = None
        # slim stack_blocks_dense at output_stride 8: the root reaches OS 4,
        # block1's last unit strides to OS 8, then blocks 2/3/4 convert their
        # strides to rates 1/2/4 (block4 multiplied by the multi-grid)
        specs = [(2, 1, (1,) * 3), (1, 1, (1,) * 4), (1, 2, (2,) * 23),
                 (1, 4, tuple(4 * g for g in V3P_MULTI_GRID))]
        for b, (stride, base_rate, unit_rates) in enumerate(specs, 1):
            block = p[f"block{b}"]
            for u in range(len(block)):
                unit_stride = stride if u == len(block) - 1 else 1
                x, conv3_out = deeplab_v3plus._unit(
                    x, block[f"unit_{u + 1}"], unit_stride,
                    unit_rates[u], cd)
                if b == 1 and u == 1:
                    low_level = conv3_out        # block1/unit_2 conv3

        if intermediate:
            # the reference's is_intermediate path exits with the *pre-ASPP*
            # backbone output (``deeplab_v3plus_model.py:568-583``), which is
            # what the RMI model consumes -- "(1, 96, 96, 2048)"
            # (``RMI_model.py:105-109``)
            return x                              # [N, H/8, W/8, 2048]

        # ASPP
        a = p["aspp"]
        h, w = x.shape[1:3]
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = conv2d(pooled, a["image_pooling"]["DW"], compute_dtype=cd)
        pooled = jnp.maximum(_bn_apply(pooled, a["image_pooling"]["bn"]), 0.0)
        pooled = jnp.broadcast_to(pooled, (x.shape[0], h, w, V3P_DEPTH))
        branches = [pooled]
        y = conv2d(x, a["aspp0"]["DW"], compute_dtype=cd)
        branches.append(jnp.maximum(_bn_apply(y, a["aspp0"]["bn"]), 0.0))
        for i, rate in enumerate(V3P_ASPP_RATES, 1):
            branches.append(_sep_conv_apply(x, a[f"aspp{i}"], rate, cd))
        y = jnp.concatenate(branches, axis=-1)
        y = conv2d(y, a["concat_projection"]["DW"], compute_dtype=cd)
        features = jnp.maximum(_bn_apply(y, a["concat_projection"]["bn"]), 0.0)

        # decoder to OS 4
        d = p["decoder"]
        low = conv2d(low_level, d["feature_projection"]["DW"], compute_dtype=cd)
        low = jnp.maximum(_bn_apply(low, d["feature_projection"]["bn"]), 0.0)
        up = resize_bilinear_align_corners(features, low.shape[1], low.shape[2])
        y = jnp.concatenate([up, low], axis=-1)
        y = _sep_conv_apply(y, d["decoder_conv0"], 1, cd)
        y = _sep_conv_apply(y, d["decoder_conv1"], 1, cd)
        logits = conv2d(y, p["logits"]["DW"]) + p["logits"]["biases"]
        return resize_bilinear_align_corners(logits, images.shape[1],
                                             images.shape[2])
