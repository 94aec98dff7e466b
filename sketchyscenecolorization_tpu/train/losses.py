"""Loss library, numerically matching the reference.

Matching losses: ``Instance_Matching/utils/loss.py``.  FG GAN loss menu:
``obj_lib/graph_single.py:330-581`` (WGAN-GP :355-386, WGAN-SN softplus
:388-419 -- the active one under Config.sn, DRAGAN-style one-sided local GP
:421-465, ACGAN focal :340-353, smooth-L1 :551-555).  BG GAN losses:
``bg_colorization_main.py:585-700`` (non-saturating log GAN :637-646,
L1 on non-FG pixels only :648-654, region softmax xent :593-601).

All masked "gather then reduce" patterns from the reference become masked
reductions here (identical values, jit-compatible static shapes).
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

EPS = 1e-12


# ---------------------------------------------------------------- matching

def weighted_logistic_loss(scores, labels, pos_loss_mult=1.0, neg_loss_mult=1.0,
                           valid_mask=None):
    """``loss.weighed_logistic_loss``: the reference reduces with
    ``reduce_mean(reduce_sum(...))`` which is a plain SUM over all elements.
    ``valid_mask`` reproduces the ignore-background gather
    (``RMI_model.py:333-338``) as a masked sum."""
    loss_mult = labels * (pos_loss_mult - neg_loss_mult) + neg_loss_mult
    xent = sigmoid_xent_with_logits(scores, labels) * loss_mult
    if valid_mask is not None:
        xent = xent * valid_mask
    return jnp.sum(xent)


def sigmoid_xent_with_logits(logits, labels):
    """tf.nn.sigmoid_cross_entropy_with_logits: max(x,0) - x*z + log1p(exp(-|x|))."""
    return jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def l2_regularization_loss(variables, weight_decay: float):
    """``weight_decay * sum(l2_loss(v))`` with l2_loss = sum(v^2)/2."""
    return weight_decay * sum(0.5 * jnp.sum(jnp.square(v)) for v in variables)


def dsc_loss(scores, labels):
    scores = jax.nn.sigmoid(scores)
    inter = 2.0 * jnp.sum(scores * labels, axis=(1, 2, 3))
    union = jnp.sum(scores, axis=(1, 2, 3)) + jnp.sum(labels, axis=(1, 2, 3))
    return jnp.mean(1.0 - inter / union)


def iou_loss(scores, labels):
    scores = jax.nn.sigmoid(scores)
    inter = jnp.sum(scores * labels, axis=(1, 2, 3))
    union = jnp.sum(scores, axis=(1, 2, 3)) + jnp.sum(labels, axis=(1, 2, 3)) - inter
    return jnp.mean(1.0 - inter / union)


# ---------------------------------------------------------------- fg GAN

def smooth_l1(pred, target):
    """``graph_single.py:551-555``: elementwise smooth-L1, mean over all."""
    diff = jnp.abs(target - pred)
    return jnp.mean(jnp.where(diff < 1.0, 0.5 * diff ** 2, diff - 0.5))


def acgan_focal_loss(real_logits, real_labels, fake_logits, fake_labels,
                     num_classes: int, ld1=1.0, ld2=0.5, ld_focal=2.0):
    """``get_acgan_loss_focal`` (``graph_single.py:340-353``): focal-weighted
    xent on real for D; plain xent on fake for G."""
    p_true = jnp.sum(jax.nn.softmax(real_logits) *
                     jax.nn.one_hot(real_labels, num_classes), axis=1)
    xent_real = sparse_softmax_xent(real_logits, real_labels)
    loss_ac_d = ld1 * jnp.mean((1.0 - p_true) ** ld_focal * xent_real)
    loss_ac_g = ld2 * jnp.mean(sparse_softmax_xent(fake_logits, fake_labels))
    return loss_ac_g, loss_ac_d


def sparse_softmax_xent(logits, labels):
    return -jnp.take_along_axis(jax.nn.log_softmax(logits), labels[:, None], axis=1)[:, 0]


def wgan_sn_losses(fake_out, real_out):
    """``get_loss_wgan_sn`` (``graph_single.py:388-419``), the active loss."""
    loss_g = jnp.mean(jax.nn.softplus(-fake_out))
    loss_d = jnp.mean(jax.nn.softplus(fake_out)) + jnp.mean(jax.nn.softplus(-real_out))
    return loss_g, loss_d


def wgan_gp_losses(disc_fn: Callable, fake_out, real_out, fake_data, real_data,
                   rng, ld=10.0):
    """``get_loss_wgan_global_gp`` (``graph_single.py:355-386``)."""
    loss_g = -jnp.mean(fake_out)
    loss_d = jnp.mean(fake_out) - jnp.mean(real_out)
    b = real_data.shape[0]
    alpha = jax.random.uniform(rng, (b, 1, 1, 1))
    interp = real_data + alpha * (fake_data - real_data)

    def d_sum(x):
        return jnp.sum(disc_fn(x))
    grads = jax.grad(d_sum)(interp)
    slopes = jnp.sqrt(jnp.sum(jnp.square(grads), axis=(1, 2, 3)))
    gp = jnp.mean((slopes - 1.0) ** 2)
    return loss_g, loss_d + ld * gp


def dragan_losses(disc_fn: Callable, fake_out, real_out, real_data, rng, ld=10.0):
    """``get_loss_original_gan_local_gp_one_side_multi``
    (``graph_single.py:421-465``): log GAN + one-sided local GP around
    perturbed real data."""
    sum_axis = tuple(range(1, fake_out.ndim))
    loss_d_fake = jnp.mean(jnp.sum(sigmoid_xent_with_logits(
        fake_out, jnp.zeros_like(fake_out)), axis=sum_axis))
    loss_d_real = jnp.mean(jnp.sum(sigmoid_xent_with_logits(
        real_out, jnp.ones_like(real_out)), axis=sum_axis))
    loss_g = jnp.mean(jnp.sum(sigmoid_xent_with_logits(
        fake_out, jnp.ones_like(fake_out)), axis=sum_axis))
    loss_d = (loss_d_fake + loss_d_real) / 2.0

    k_pert, k_alpha = jax.random.split(rng)
    b = real_data.shape[0]
    var = jnp.var(real_data)
    perturbed = real_data + 0.5 * jnp.sqrt(var) * jax.random.uniform(k_pert, real_data.shape)
    alpha = jax.random.uniform(k_alpha, (b, 1, 1, 1))
    interp = real_data + alpha * (perturbed - real_data)

    def d_sum(x):
        return jnp.sum(disc_fn(x))
    grads = jax.grad(d_sum)(interp)
    slopes = jnp.sqrt(jnp.sum(jnp.square(grads), axis=(1, 2, 3)))
    gp = jnp.mean(jnp.maximum(0.0, slopes - 1.0) ** 2)
    return loss_g, loss_d + ld * gp


def fc_weight_decay_loss(params, rate: float = 1e-6) -> jnp.ndarray:
    """TF-slim regularization replication (``mru.py:55-68``): only
    ``fully_connected`` weight matrices carry an attached l2 regularizer
    (rate 1e-6, value rate*sum(w^2)/2); conv weights and label embeddings
    create regularizers but never attach them.  In our trees the dense
    kernels are exactly the 2-D "weights" leaves."""
    total = jnp.asarray(0.0, jnp.float32)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if keys and keys[-1] == "weights" and getattr(leaf, "ndim", 0) == 2:
            total = total + rate * 0.5 * jnp.sum(jnp.square(leaf))
    return total


# ---------------------------------------------------------------- bg GAN

def masked_l1_loss(targets, outputs, labels):
    """L1 only on non-FG pixels (``bg_colorization_main.py:648-654``):
    the reference gathers rows where label != 0 and takes the mean over the
    gathered [K, C] matrix."""
    mask = (labels != 0).astype(targets.dtype)[..., None]        # [B,H,W,1]
    abs_diff = jnp.abs(targets - outputs) * mask
    denom = jnp.maximum(jnp.sum(mask) * targets.shape[-1], 1.0)
    return jnp.sum(abs_diff) / denom


def region_softmax_xent(region_logits, labels):
    """``bg_colorization_main.py:593-601``: mean sparse softmax xent."""
    logp = jax.nn.log_softmax(region_logits)
    picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return -jnp.mean(picked)


def bg_discrim_loss(predict_real, predict_fake, eps: float = 1e-12):
    """Non-saturating log D loss on sigmoid maps (``bg main :637-641``)."""
    return jnp.mean(-(jnp.log(predict_real + eps)
                      + jnp.log(1.0 - predict_fake + eps)))


def bg_gan_losses(predict_real, predict_fake, targets, outputs, region_logits,
                  labels, gan_weight=1.0, l1_weight=100.0, seg_weight=100.0,
                  eps=1e-12) -> Dict[str, jnp.ndarray]:
    """Full BG loss set (``bg_colorization_main.py:637-656``).  The
    discriminators output sigmoid probabilities, hence the log form."""
    discrim_loss = bg_discrim_loss(predict_real, predict_fake, eps)
    gen_loss_gan = jnp.mean(-jnp.log(predict_fake + eps))
    gen_loss_l1 = masked_l1_loss(targets, outputs, labels)
    region_loss = region_softmax_xent(region_logits, labels)
    gen_loss = gen_loss_gan * gan_weight + gen_loss_l1 * l1_weight + region_loss * seg_weight
    return {
        "discrim_loss": discrim_loss,
        "gen_loss_GAN": gen_loss_gan,
        "gen_loss_L1": gen_loss_l1,
        "region_mask_loss": region_loss,
        "gen_loss": gen_loss,
    }
