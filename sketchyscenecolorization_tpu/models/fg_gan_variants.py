"""FG colorization GAN: the Pix2Pix and Residual generator/discriminator
variants (selected by ``block_type`` -- reference ``obj_lib/graph_single.py:246-255``).

Reference: ``obj_lib/models_collection.py`` (image_encoder_pix2pix :409-443,
generate_pix2pix :446-538, image_encoder_residual :541-585, generate_residual
:588-672, discriminate_pix2pix :789-843, discriminate_residual :846-893) and
the bottleneck blocks in ``obj_lib/residual_util.py:82-171`` (identical math
to the BG blocks, reused from ``models/bg_gan.py``).

All NHWC; unconditional batch-stats BN throughout (the reference's pix2pix
``batchnorm`` without labels); the class-conditional path exists only in the
MRU variant.
"""
from __future__ import annotations

from typing import List

import flax.linen as nn
import jax.numpy as jnp

from ..ops.activations import lrelu
from .bg_gan import (
    NUM_RESIDUAL_UNITS, BottleneckResidualDe, BottleneckResidualEn,
    BottleneckResidualPu, Conv, ConvEx, Deconv,
)
from .gan_layers import BatchStatsNorm, SNDense, TextFusionLSTM

NUM_RESIDUAL_UNITS = (3, 4, 6, 3)


class _NoiseFC(nn.Module):
    """256-d noise -> [B, h, w, c] via an miu_relu FC
    (``models_collection.py:494-501``; NCHW reshape order preserved)."""
    h: int
    w: int
    c: int

    @nn.compact
    def __call__(self, noise_vec):
        b = noise_vec.shape[0]
        out = SNDense(self.c * self.h * self.w, sn=False,
                      activation="miu_relu", name="noise_fc")(noise_vec)
        out = out.reshape(b, self.c, self.h, self.w)
        return jnp.transpose(out, (0, 2, 3, 1))


class Pix2PixFGGenerator(nn.Module):
    """``generate_pix2pix``: u-net 5-down/5-up with text fusion + noise at
    the bottleneck.  Returns the colorized image in [-1, 1]."""
    vocab_size: int = 58
    size: int = 64
    output_channel: int = 3
    lstm_hybrid: bool = True

    @nn.compact
    def __call__(self, sketch, tokens, labels, noise_vec):
        del labels  # conditional BN is MRU-only
        size = self.size
        layers: List[jnp.ndarray] = [Conv(size, 2, name="encoder_1")(sketch)]
        for i, out_ch in enumerate([size * 2, size * 4, size * 8, size * 8]):
            y = lrelu(layers[-1], 0.2)
            y = Conv(out_ch, 2, name=f"encoder_{i + 2}")(y)
            y = BatchStatsNorm(name=f"encoder_{i + 2}_bn")(y)
            layers.append(y)

        feat = (TextFusionLSTM(self.vocab_size, name="TextLSTM")(
            layers[-1], tokens) if self.lstm_hybrid else layers[-1])
        e = layers[-1].shape
        noise = _NoiseFC(e[1], e[2], e[3] // 8, name="noise")(noise_vec)

        num_enc = len(layers)
        for d, out_ch in enumerate([size * 8, size * 4, size * 2, size]):
            skip = num_enc - d - 1
            inp = (jnp.concatenate([feat, noise], axis=-1) if d == 0
                   else jnp.concatenate([layers[-1], layers[skip]], axis=-1))
            y = jnp.maximum(inp, 0.0)
            y = Deconv(out_ch, name=f"decoder_{skip + 1}")(y)
            y = BatchStatsNorm(name=f"decoder_{skip + 1}_bn")(y)
            layers.append(y)

        inp = jnp.concatenate([layers[-1], layers[0]], axis=-1)
        y = jnp.maximum(inp, 0.0)
        return jnp.tanh(Deconv(self.output_channel, name="decoder_1")(y))


class ResidualFGGenerator(nn.Module):
    """``generate_residual``: bottleneck-residual encoder/decoder with
    [3,4,6,3] extra same-resolution units per stage."""
    vocab_size: int = 58
    size: int = 64
    output_channel: int = 3
    lstm_hybrid: bool = True

    @nn.compact
    def __call__(self, sketch, tokens, labels, noise_vec):
        del labels
        size = self.size
        y = ConvEx(size, 2, 7, name="encoder_1_conv")(sketch)
        y = lrelu(BatchStatsNorm(name="encoder_1_bn")(y), 0.2)
        layers: List[jnp.ndarray] = [y]

        for e, out_ch in enumerate([size * 2, size * 4, size * 8, size * 8]):
            y = BottleneckResidualEn(out_ch, 2,
                                     name=f"encoder_{e + 2}_0")(layers[-1])
            for u in range(1, NUM_RESIDUAL_UNITS[e]):
                y = BottleneckResidualPu(out_ch, True,
                                         name=f"encoder_{e + 2}_{u}")(y)
            layers.append(y)

        feat = (TextFusionLSTM(self.vocab_size, name="TextLSTM")(
            layers[-1], tokens) if self.lstm_hybrid else layers[-1])
        e_dims = layers[-1].shape
        noise = _NoiseFC(e_dims[1], e_dims[2], e_dims[3] // 8,
                         name="noise")(noise_vec)

        num_enc = len(layers)
        for d, out_ch in enumerate([size * 8, size * 4, size * 2, size]):
            skip = num_enc - d - 1
            inp = (jnp.concatenate([feat, noise], axis=-1) if d == 0
                   else jnp.concatenate([layers[-1], layers[skip]], axis=-1))
            y = BottleneckResidualDe(out_ch, name=f"decoder_{skip + 1}_0")(inp)
            for u in range(1, NUM_RESIDUAL_UNITS[skip - 1]):
                y = BottleneckResidualPu(out_ch, False,
                                         name=f"decoder_{skip + 1}_{u}")(y)
            layers.append(y)

        inp = jnp.concatenate([layers[-1], layers[0]], axis=-1)
        y = Deconv(self.output_channel, name="decoder_1_deconv")(inp)
        return jnp.tanh(BatchStatsNorm(name="decoder_1_bn")(y))


class Pix2PixFGDiscriminator(nn.Module):
    """``discriminate_pix2pix``: PatchGAN over concat(sketch, target) with a
    classification head on the mean-pooled last feature map."""
    num_classes: int = 25
    size: int = 64
    sn: bool = True

    @nn.compact
    def __call__(self, inputs, targets, labels=None):
        del labels
        y = jnp.concatenate([inputs, targets], axis=-1)
        y = lrelu(Conv(self.size, 2, name="layer_1")(y), 0.2)
        for i in range(3):
            out_ch = self.size * min(2 ** (i + 1), 8)
            stride = 1 if i == 2 else 2
            y = Conv(out_ch, stride, name=f"layer_{i + 2}")(y)
            y = lrelu(BatchStatsNorm(name=f"layer_{i + 2}_bn")(y), 0.2)
        disc = Conv(1, 1, name="layer_5")(y)
        pooled = jnp.mean(y, axis=(1, 2))
        logits = SNDense(self.num_classes, sn=self.sn, name="ac_logits")(pooled)
        return disc, logits


class ResidualFGDiscriminator(nn.Module):
    """``discriminate_residual``: 5 stride-2 residual-encoder stages; patch
    output via a 4x4 conv; classification head on the 4th stage."""
    num_classes: int = 25
    size: int = 64
    sn: bool = True

    @nn.compact
    def __call__(self, inputs, targets, labels=None):
        del labels
        y = jnp.concatenate([inputs, targets], axis=-1)
        y = BottleneckResidualEn(self.size, 2, name="layer_1")(y)
        for i in range(3):
            out_ch = self.size * min(2 ** (i + 1), 8)
            y = BottleneckResidualEn(out_ch, 2, name=f"layer_{i + 2}")(y)
        rectified = y
        conv5 = BottleneckResidualEn(512, 2, name="layer_5")(rectified)
        disc = ConvEx(1, 1, 4, name="layer_5_out")(conv5)
        pooled = jnp.mean(rectified, axis=(1, 2))
        logits = SNDense(self.num_classes, sn=self.sn, name="ac_logits")(pooled)
        return disc, logits
