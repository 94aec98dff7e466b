"""Background colorization GAN: text-conditioned residual generator at 768^2
with an auxiliary sky/ground region-segmentation branch, plus PatchGAN and
residual discriminators.

Reference: ``Background_Colorization/bg_colorization_main.py``
(residual generator :302-420, pix2pix generator :423-507, discriminators
:510-583, residual blocks :217-299, batchnorm :86-98, conv/deconv :41-71).

All convs here are bias-free (the reference's conv/deconv have no bias; the
batch-stats BN that follows provides the offset).  NHWC.
"""
from __future__ import annotations

from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.conv import pad1_conv4, conv2d, conv2d_transpose
from ..ops.activations import lrelu
from .gan_layers import BatchStatsNorm, TextFusionLSTM, normal_init

NUM_RESIDUAL_UNITS = (3, 4, 6, 3)


class Conv(nn.Module):
    """``conv()``: pad-1 then 4x4 VALID conv, no bias (bg main :41-50)."""
    features: int
    stride: int

    @nn.compact
    def __call__(self, x):
        w = self.param("filter", normal_init, (4, 4, x.shape[-1], self.features))
        return pad1_conv4(x, w, self.stride)


class ConvEx(nn.Module):
    """``conv_ex()``: SAME conv, no bias (bg main :53-59)."""
    features: int
    stride: int = 1
    kernel: int = 4

    @nn.compact
    def __call__(self, x):
        w = self.param("filter", normal_init,
                       (self.kernel, self.kernel, x.shape[-1], self.features))
        return conv2d(x, w, stride=self.stride)


class Deconv(nn.Module):
    """``deconv()``: 4x4/2 SAME transposed conv, no bias (bg main :62-71)."""
    features: int

    @nn.compact
    def __call__(self, x):
        w = self.param("filter", normal_init, (4, 4, x.shape[-1], self.features))
        return conv2d_transpose(x, w, stride=2)


class BottleneckResidualEn(nn.Module):
    """Encoder bottleneck (bg main :217-243)."""
    out_filter: int
    stride: int

    @nn.compact
    def __call__(self, x):
        orig = x
        mid = int(round(self.out_filter / 4))
        y = Conv(mid, self.stride, name="block_1_conv")(x)
        y = lrelu(BatchStatsNorm(name="block_1_bn")(y), 0.2)
        y = ConvEx(mid, 1, 3, name="block_2_conv")(y)
        y = lrelu(BatchStatsNorm(name="block_2_bn")(y), 0.2)
        y = ConvEx(self.out_filter, 1, 1, name="block_3_conv")(y)
        y = BatchStatsNorm(name="block_3_bn")(y)
        if self.stride != 1:
            orig = Conv(self.out_filter, self.stride, name="block_add_conv")(orig)
            orig = BatchStatsNorm(name="block_add_bn")(orig)
        return lrelu(y + orig, 0.2)


class BottleneckResidualDe(nn.Module):
    """Decoder bottleneck (bg main :246-274)."""
    out_filter: int
    need_relu: bool = True

    @nn.compact
    def __call__(self, x):
        orig = x
        mid = int(round(self.out_filter / 4))
        y = Deconv(mid, name="block_1_deconv")(x)
        y = jnp.maximum(BatchStatsNorm(name="block_1_bn")(y), 0.0)
        y = ConvEx(mid, 1, 3, name="block_2_conv")(y)
        y = jnp.maximum(BatchStatsNorm(name="block_2_bn")(y), 0.0)
        y = ConvEx(self.out_filter, 1, 1, name="block_3_conv")(y)
        y = BatchStatsNorm(name="block_3_bn")(y)
        orig = Deconv(self.out_filter, name="block_add_deconv")(orig)
        orig = BatchStatsNorm(name="block_add_bn")(orig)
        y = y + orig
        return jnp.maximum(y, 0.0) if self.need_relu else y


class BottleneckResidualPu(nn.Module):
    """Same-resolution bottleneck (bg main :277-299); block_1 is a 4x4 SAME conv."""
    out_filter: int
    is_encoder: bool

    @nn.compact
    def __call__(self, x):
        act = (lambda v: lrelu(v, 0.2)) if self.is_encoder else (lambda v: jnp.maximum(v, 0.0))
        orig = x
        mid = int(round(self.out_filter / 4))
        y = ConvEx(mid, 1, 4, name="block_1_conv")(x)
        y = act(BatchStatsNorm(name="block_1_bn")(y))
        y = ConvEx(mid, 1, 3, name="block_2_conv")(y)
        y = act(BatchStatsNorm(name="block_2_bn")(y))
        y = ConvEx(self.out_filter, 1, 1, name="block_3_conv")(y)
        y = BatchStatsNorm(name="block_3_bn")(y)
        return act(y + orig)


class ResidualGenerator(nn.Module):
    """``create_residual_generator`` (bg main :302-420): residual encoder to
    S/32 x 1024, text-fusion conv-LSTM at the bottleneck, residual decoder
    with skips, and the parallel region branch deconv chain.

    Returns (rgb [-1,1], region_logits [B, S, S, seg_classes])."""
    ngf: int = 64
    vocab_size: int = 18
    seg_classes: int = 3
    out_channels: int = 3
    multi_residual: bool = True

    @nn.compact
    def __call__(self, x, tokens):
        layers: List[jnp.ndarray] = []

        y = ConvEx(self.ngf, 2, 7, name="encoder_1_conv")(x)
        y = lrelu(BatchStatsNorm(name="encoder_1_bn")(y), 0.2)
        layers.append(y)

        enc_specs = [self.ngf * 2, self.ngf * 4, self.ngf * 8, self.ngf * 16]
        for e, out_ch in enumerate(enc_specs):
            y = BottleneckResidualEn(out_ch, 2, name=f"encoder_{e + 2}_0")(layers[-1])
            if self.multi_residual:
                for u in range(1, NUM_RESIDUAL_UNITS[e]):
                    y = BottleneckResidualPu(out_ch, True, name=f"encoder_{e + 2}_{u}")(y)
            layers.append(y)

        # text fusion at the bottleneck (mLSTM_G)
        feat = TextFusionLSTM(self.vocab_size, name="mLSTM_G")(layers[-1], tokens)

        # region branch projection (1x1 -> bn -> relu)
        reg = ConvEx(self.seg_classes, 1, 1, name="region_br_projection_conv")(layers[-1])
        reg = jnp.maximum(BatchStatsNorm(name="region_br_projection_bn")(reg), 0.0)

        dec_specs = [self.ngf * 8, self.ngf * 4, self.ngf * 2, self.ngf]
        num_encoder_layers = len(layers)
        for d, out_ch in enumerate(dec_specs):
            skip_layer = num_encoder_layers - d - 1
            inp = feat if d == 0 else jnp.concatenate([layers[-1], layers[skip_layer]], axis=-1)
            y = BottleneckResidualDe(out_ch, name=f"decoder_{skip_layer + 1}_0")(inp)
            if self.multi_residual:
                for u in range(1, NUM_RESIDUAL_UNITS[skip_layer - 1]):
                    y = BottleneckResidualPu(out_ch, False, name=f"decoder_{skip_layer + 1}_{u}")(y)
            layers.append(y)

            reg = Deconv(self.seg_classes, name=f"region_br_{skip_layer + 1}_deconv")(reg)
            reg = jnp.maximum(BatchStatsNorm(name=f"region_br_{skip_layer + 1}_bn")(reg), 0.0)

        inp = jnp.concatenate([layers[-1], layers[0]], axis=-1)
        out = Deconv(self.out_channels, name="decoder_1_deconv")(inp)
        out = jnp.tanh(BatchStatsNorm(name="decoder_1_bn")(out))

        reg = Deconv(self.seg_classes, name="region_br_1_deconv")(reg)
        reg = jnp.maximum(BatchStatsNorm(name="region_br_1_bn")(reg), 0.0)

        return out, reg


class Pix2PixGenerator(nn.Module):
    """``create_generator`` (bg main :423-507): classic u-net with the text
    fusion at the bottleneck.  Returns rgb only (no region branch)."""
    ngf: int = 64
    vocab_size: int = 18
    out_channels: int = 3

    @nn.compact
    def __call__(self, x, tokens):
        layers: List[jnp.ndarray] = [Conv(self.ngf, 2, name="encoder_1")(x)]
        for i, out_ch in enumerate([self.ngf * 2, self.ngf * 4, self.ngf * 8, self.ngf * 8]):
            y = lrelu(layers[-1], 0.2)
            y = Conv(out_ch, 2, name=f"encoder_{i + 2}")(y)
            y = BatchStatsNorm(name=f"encoder_{i + 2}_bn")(y)
            layers.append(y)

        feat = TextFusionLSTM(self.vocab_size, name="mLSTM_G")(layers[-1], tokens)

        num_encoder_layers = len(layers)
        for d, out_ch in enumerate([self.ngf * 8, self.ngf * 4, self.ngf * 2, self.ngf]):
            skip_layer = num_encoder_layers - d - 1
            inp = feat if d == 0 else jnp.concatenate([layers[-1], layers[skip_layer]], axis=-1)
            y = jnp.maximum(inp, 0.0)
            y = Deconv(out_ch, name=f"decoder_{skip_layer + 1}")(y)
            y = BatchStatsNorm(name=f"decoder_{skip_layer + 1}_bn")(y)
            layers.append(y)

        inp = jnp.concatenate([layers[-1], layers[0]], axis=-1)
        y = jnp.maximum(inp, 0.0)
        return jnp.tanh(Deconv(self.out_channels, name="decoder_1")(y))


class PatchDiscriminator(nn.Module):
    """``create_discriminator`` (bg main :514-549): 70x70-style PatchGAN;
    sigmoid probability map (94^2 at 768 input)."""
    ndf: int = 64

    @nn.compact
    def __call__(self, inputs, targets):
        y = jnp.concatenate([inputs, targets], axis=-1)
        y = lrelu(Conv(self.ndf, 2, name="layer_1")(y), 0.2)
        n_layers = 3
        for i in range(n_layers):
            out_ch = self.ndf * min(2 ** (i + 1), 8)
            stride = 1 if i == n_layers - 1 else 2
            y = Conv(out_ch, stride, name=f"layer_{i + 2}")(y)
            y = lrelu(BatchStatsNorm(name=f"layer_{i + 2}_bn")(y), 0.2)
        y = Conv(1, 1, name="layer_5")(y)
        return jax.nn.sigmoid(y)


class ResidualDiscriminator(nn.Module):
    """``create_residual_discriminator`` (bg main :551-583): residual encoder
    to S/32 x 1024, sigmoid map (the active discriminator)."""
    ndf: int = 64

    @nn.compact
    def __call__(self, inputs, targets):
        y = jnp.concatenate([inputs, targets], axis=-1)
        y = BottleneckResidualEn(self.ndf, 2, name="layer_1")(y)
        for i in range(3):
            out_ch = self.ndf * min(2 ** (i + 1), 8)
            y = BottleneckResidualEn(out_ch, 2, name=f"layer_{i + 2}")(y)
        y = BottleneckResidualEn(1024, 2, name="layer_5")(y)
        return jax.nn.sigmoid(y)
