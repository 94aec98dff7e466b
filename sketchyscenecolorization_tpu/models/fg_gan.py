"""Foreground instance-colorization GAN: MRU (SketchyGAN-style) generator +
discriminator with ACGAN head, text-conditioned via the fusion conv-LSTM.

Reference: ``Foreground_Instance_Colorization/obj_lib/models_collection.py``
(generate_mru :251-377, image_encoder_mru :68-147, discriminate_mru :676-786)
and ``obj_lib/mru.py`` (mru_conv_block_v3 :353-461 for the encoder,
mru_deconv_block_v2 :527-591 for the decoder, stage wrappers :594-713).

Everything NHWC; the generator's conditional batch-norm uses *batch*
statistics with per-class offset/scale embeddings; the discriminator uses
spectral norm (power-iteration state in the flax 'sn' collection) and PReLU.
"""
from __future__ import annotations

from typing import List, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.image import mean_pool_2x2, nn_upsample_2x, box_downsample
from .gan_layers import (
    SNConv, SNDense, CondBatchNorm, TextFusionLSTM,
    minmax_normalize, apply_activation, normal_init,
)


class NormAct(nn.Module):
    """normalizer -> activation ("norm_activ", ``mru.py:367-376``).  The
    normalizer is conditional batch-norm when ``num_classes`` is set (G), and
    identity for the discriminator."""
    num_classes: Optional[int]
    activation: Optional[str]

    @nn.compact
    def __call__(self, x, labels):
        if self.num_classes is not None:
            x = CondBatchNorm(self.num_classes)(x, labels)
        return apply_activation(self, x, self.activation)


class MRUConvBlockV3(nn.Module):
    """Encoder MRU cell, no output gate (``mru.py:353-461``):

      full  = concat([norm_act(ht), inp])
      rg    = minmax(lrelu(conv3(full -> C_ht, bias 0.5)))
      img   = conv3(inp -> C_ht)                   (no act/norm)
      h_in  = norm_act(ht + rg * img)
      h_new = conv3(conv3(h_in -> C_out, act+norm) -> C_out)   (2nd conv bare)
      out   = proj(ht) + h_new ; mean_pool if stride 2
    """
    filter_depth: int
    stride: int
    sn: bool
    num_classes: Optional[int]
    activation: str

    @nn.compact
    def __call__(self, inp, ht, labels):
        hidden_depth = ht.shape[-1]
        ht_orig = ht

        ht_na = NormAct(self.num_classes, self.activation, name="norm_activation_in")(ht, labels)
        full_inp = jnp.concatenate([ht_na, inp], axis=-1)

        rg = SNConv(hidden_depth, 3, sn=self.sn, bias_init_value=0.5,
                    activation="lrelu", name="update_gate")(full_inp)
        rg = minmax_normalize(rg)

        img_new = SNConv(hidden_depth, 3, sn=self.sn, name="image_conv")(inp)

        ht_plus = ht + rg * img_new
        ht_new_in = NormAct(self.num_classes, self.activation,
                            name="norm_activation_merge_1")(ht_plus, labels)

        norm1 = (CondBatchNorm(self.num_classes, name="h_conv1_bn")
                 if self.num_classes is not None else None)
        h_new = SNConv(self.filter_depth, 3, sn=self.sn, name="h_conv1",
                       normalizer=(lambda y: norm1(y, labels)) if norm1 else None,
                       activation=self.activation)(ht_new_in)
        h_new = SNConv(self.filter_depth, 3, sn=self.sn, name="h_conv2")(h_new)

        if hidden_depth != self.filter_depth:
            ht_orig = SNConv(self.filter_depth, 1, sn=self.sn, name="ht_proj")(ht_orig)
        ht_new = ht_orig + h_new

        if self.stride == 2:
            ht_new = mean_pool_2x2(ht_new)
        return ht_new


class MRUDeconvBlockV2(nn.Module):
    """Decoder MRU cell with LReLU min-max gates (``mru.py:527-591``)."""
    filter_depth: int
    stride: int
    sn: bool
    num_classes: Optional[int]
    activation: str

    @nn.compact
    def __call__(self, inp, ht, labels):
        if self.stride == 2:
            ht = nn_upsample_2x(ht)
        hidden_depth = ht.shape[-1]
        full_inp = jnp.concatenate([ht, inp], axis=-1)

        rg = SNConv(hidden_depth, 3, sn=self.sn, activation="lrelu",
                    name="update_gate")(full_inp)
        rg = minmax_normalize(rg)
        zg = SNConv(self.filter_depth, 3, sn=self.sn, activation="lrelu",
                    name="output_gate")(full_inp)
        zg = minmax_normalize(zg)

        def make_bn(name):
            return (CondBatchNorm(self.num_classes, name=name)
                    if self.num_classes is not None else None)

        bn1, bn2, bn3 = make_bn("h_conv1_bn"), make_bn("h_conv2_bn"), make_bn("ht_proj_bn")
        h_new = SNConv(self.filter_depth, 3, sn=self.sn, name="h_conv1",
                       normalizer=(lambda y: bn1(y, labels)) if bn1 else None,
                       activation=self.activation)(
            jnp.concatenate([rg * ht, inp], axis=-1))
        h_new = SNConv(self.filter_depth, 3, sn=self.sn, name="h_conv2",
                       normalizer=(lambda y: bn2(y, labels)) if bn2 else None,
                       activation=self.activation)(h_new)

        if hidden_depth != self.filter_depth:
            ht = SNConv(self.filter_depth, 1, sn=self.sn, name="ht_proj",
                        normalizer=(lambda y: bn3(y, labels)) if bn3 else None,
                        activation=self.activation)(ht)
        return ht * (1.0 - zg) + h_new * zg


class MRUConvStage(nn.Module):
    """``mru_conv`` stage wrapper (``mru.py:594-655``); num_blocks chained
    cells, first one carries the stride; optional trailing norm_activ."""
    filter_depth: int
    stride: int
    sn: bool
    num_classes: Optional[int]
    activation: str
    num_blocks: int = 1
    last_unit: bool = False

    @nn.compact
    def __call__(self, x, hts: List[jnp.ndarray], labels):
        hts_new = []
        inp = x
        ht_new = MRUConvBlockV3(self.filter_depth, self.stride, self.sn,
                                self.num_classes, self.activation,
                                name="layer_0")(inp, hts[0], labels)
        hts_new.append(ht_new)
        inp = ht_new
        for i in range(1, self.num_blocks):
            ht_i = mean_pool_2x2(hts[i]) if self.stride == 2 else hts[i]
            ht_new = MRUConvBlockV3(self.filter_depth, 1, self.sn,
                                    self.num_classes, self.activation,
                                    name=f"layer_{i}")(inp, ht_i, labels)
            hts_new.append(ht_new)
            inp = ht_new
        if self.last_unit:
            hts_new[-1] = NormAct(self.num_classes, self.activation,
                                  name="last_norm")(hts_new[-1], labels)
        return hts_new


class MRUDeconvStage(nn.Module):
    """``mru_deconv`` stage wrapper (``mru.py:658-713``)."""
    filter_depth: int
    stride: int
    sn: bool
    num_classes: Optional[int]
    activation: str
    num_blocks: int = 1

    @nn.compact
    def __call__(self, x, hts: List[jnp.ndarray], labels):
        hts_new = []
        inp = x
        ht_new = MRUDeconvBlockV2(self.filter_depth, self.stride, self.sn,
                                  self.num_classes, self.activation,
                                  name="layer_0")(inp, hts[0], labels)
        hts_new.append(ht_new)
        inp = ht_new
        for i in range(1, self.num_blocks):
            ht_i = nn_upsample_2x(hts[i]) if self.stride == 2 else hts[i]
            ht_new = MRUDeconvBlockV2(self.filter_depth, 1, self.sn,
                                      self.num_classes, self.activation,
                                      name=f"layer_{i}")(inp, ht_i, labels)
            hts_new.append(ht_new)
            inp = ht_new
        return hts_new


def _pyramid_mean_pool(x, levels: int) -> List[jnp.ndarray]:
    """[x, pool(x), pool^2(x), ...] smallest-first (``models_collection.py:79-87``)."""
    out = [x]
    for _ in range(levels):
        out.append(mean_pool_2x2(out[-1]))
    return out[::-1]


class MRUGenerator(nn.Module):
    """``generate_mru`` (``models_collection.py:251-377``).

    Input sketch in [-1, 1], [B, S, S, 3]; tokens [B, T] front-padded;
    labels [B] class ids; noise_vec [B, 256] (passed in explicitly so
    inference is deterministic under a fixed key -- the reference draws
    ``tf.random_normal`` inline at :310).
    Returns the colorized image in [-1, 1].
    """
    num_classes: int = 25
    vocab_size: int = 58
    size: int = 64           # SIZE
    num_blocks: int = 1
    output_channel: int = 3
    lstm_hybrid: bool = True
    activation: str = "miu_relu"

    @nn.compact
    def __call__(self, sketch, tokens, labels, noise_vec):
        b = sketch.shape[0]
        size = self.size
        nc = self.num_classes
        sn = False  # the generator never uses spectral norm (encoder/generator sn=False)

        # AREA-resize pyramid of the sketch, smallest-first: [S/32 ... S]
        resized_z = [box_downsample(sketch, 2 ** i) for i in range(6)][::-1]
        # mean-pool pyramid for the encoder, smallest-first: [S/16 ... S]
        x_list = _pyramid_mean_pool(sketch, 4)
        # under the bf16 storage scope, hold the sketch pyramids at the
        # scope dtype too: an f32 pyramid entry in a skip concat would
        # promote the whole concatenated activation back to f32 (no-op
        # for the default f32 policy)
        from ..ops.conv import scope_dtype
        sd = scope_dtype()
        if sd is not None:
            resized_z = [r.astype(sd) for r in resized_z]
            x_list = [xx.astype(sd) for xx in x_list]

        # ---- encoder (``image_encoder_mru``) ----
        h0 = SNConv(8, 7, stride=2, sn=sn, name="enc_h0")(x_list[-1])
        z_encoded = [h0]
        hts = [h0] + [
            jnp.broadcast_to(self.param(f"initial_hidden_state_{i}",
                                        nn.initializers.zeros,
                                        (1, *h0.shape[1:])), h0.shape)
            for i in range(1, self.num_blocks)]
        for i, (feat, inp) in enumerate(zip(
                [size, size * 2, size * 4, size * 8],
                [x_list[-2], x_list[-3], x_list[-4], x_list[-5]])):
            hts = MRUConvStage(feat, stride=2, sn=sn, num_classes=nc,
                               activation=self.activation,
                               num_blocks=self.num_blocks,
                               last_unit=(i == 3),
                               name=f"enc_stage_{i + 1}")(inp, hts, labels)
            z_encoded.append(hts[-1])

        # ---- text fusion at the bottleneck ----
        if self.lstm_hybrid:
            feat_final = TextFusionLSTM(self.vocab_size, name="TextLSTM")(
                z_encoded[-1], tokens)
        else:
            feat_final = z_encoded[-1]

        # ---- noise injection (``models_collection.py:304-316``) ----
        e_dims = z_encoded[-1].shape      # [B, 6, 6, 512] at 192px
        channel_depth = e_dims[-1] // 8
        noise_hw = e_dims[1] * 2
        noise = SNDense(channel_depth * noise_hw * noise_hw, sn=sn,
                        activation=self.activation, name="noise_fc")(noise_vec)
        noise = noise.reshape(b, channel_depth, noise_hw, noise_hw)
        noise = jnp.transpose(noise, (0, 2, 3, 1))  # NCHW layout in ref -> NHWC
        if sd is not None:
            noise = noise.astype(sd)

        # ---- decoder: 5 MRU-deconv stages with sketch re-injection ----
        hts = [feat_final] + [
            jnp.broadcast_to(self.param(f"initial_decoder_state_{i}",
                                        nn.initializers.zeros,
                                        (1, *feat_final.shape[1:])),
                             feat_final.shape)
            for i in range(1, self.num_blocks)]
        dec_specs = [
            (size * 6, jnp.concatenate([resized_z[1], noise], axis=-1)),
            (size * 4, jnp.concatenate([resized_z[2], z_encoded[-3]], axis=-1)),
            (size * 2, jnp.concatenate([resized_z[3], z_encoded[-4]], axis=-1)),
            (size * 2, jnp.concatenate([resized_z[4], z_encoded[-5]], axis=-1)),
            (size * 1, resized_z[5]),
        ]
        for i, (feat, inp) in enumerate(dec_specs):
            hts = MRUDeconvStage(feat, stride=2, sn=sn, num_classes=nc,
                                 activation=self.activation,
                                 num_blocks=self.num_blocks,
                                 name=f"dec_stage_{i}")(inp, hts, labels)

        out = SNConv(self.output_channel, 7, sn=sn, activation="tanh",
                     name="out_conv")(hts[-1])
        return out


class MRUDiscriminator(nn.Module):
    """``discriminate_mru`` (``models_collection.py:676-786``): MRU encoder
    over the (real or generated) image only, spectral norm everywhere, PReLU,
    no normalizer; 1x1-conv patch output + ACGAN classification head (or a
    projection head when ``proj_d``)."""
    num_classes: int = 25
    size: int = 64
    num_blocks: int = 1
    sn: bool = True
    proj_d: bool = False

    @nn.compact
    def __call__(self, inputs, target=None, labels=None):
        # unified (inputs, targets, labels) signature across the three
        # discriminator variants; the MRU one ignores the sketch inputs
        # (``models_collection.py:676-700`` builds its pyramid from
        # discrim_targets only).  Called with a single image, treat it as
        # the target.
        if target is None:
            target = inputs
        size = self.size
        x_list = _pyramid_mean_pool(target, 5)

        h0 = SNConv(8, 7, stride=1, sn=self.sn, activation="prelu",
                    name="h0")(x_list[-1])
        hts = [h0] + [
            jnp.broadcast_to(self.param(f"initial_hidden_state_{i}",
                                        nn.initializers.zeros,
                                        (1, *h0.shape[1:])), h0.shape)
            for i in range(1, self.num_blocks)]
        for i, (feat, inp) in enumerate(zip(
                [size * 2, size * 4, size * 8, size * 12],
                [x_list[-1], x_list[-2], x_list[-3], x_list[-4]])):
            hts = MRUConvStage(feat, stride=2, sn=self.sn, num_classes=None,
                               activation="prelu",
                               num_blocks=self.num_blocks,
                               last_unit=(i == 3),
                               name=f"stage_{i + 1}")(inp, hts, labels)

        img = hts[-1]
        disc = SNConv(1, 1, sn=self.sn, name="disc_out")(img)

        if self.proj_d:
            emb = self.param("class_embedding",
                             nn.initializers.normal(stddev=1.0),
                             (self.num_classes, img.shape[-1]))
            if self.sn:
                from ..ops.norm import spectral_normalize
                u = self.variable("sn", "embed_u",
                                  lambda: jnp.ones((1, img.shape[-1]), jnp.float32))
                emb_bar, new_u = spectral_normalize(emb, u.value)
                if self.is_mutable_collection("sn"):
                    u.value = new_u
                emb = emb_bar
            class_emb = emb[labels][:, None, None, :]
            disc = disc + jnp.sum(img * class_emb, axis=-1, keepdims=True)
            logits = None
        else:
            pooled = jnp.mean(img, axis=(1, 2))
            logits = SNDense(self.num_classes, sn=self.sn, name="ac_logits")(pooled)
        return disc, logits
