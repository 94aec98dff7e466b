"""FG instance-colorization GAN training (reference
``obj_lib/graph_single.py`` + ``obj_lib/main_procedure.py:62-242``).

One jitted step = (disc update, then gen update), the reference's per-iter
D-then-G alternation (``main_procedure.py:199-232``) with each sub-step
consuming its own batch (the reference pulls fresh queue batches for every
``sess.run``).  Loss menu selected like ``graph_single.py:515-521``:
spectral-norm -> WGAN-SN softplus (default), else WGAN-GP or DRAGAN local GP
with the reference's gradient clipping (global 50/100, hard 5/10 --
``graph_single.py:191-207``).  Spectral-norm power-iteration state ('sn'
collection) advances once per step, during the G update -- mirroring the
update ops being control-deps of opt_g (``graph_single.py:178-212``).

Optimizer: Adam(beta1=0, beta2=0.9) with linear LR decay floored at 0.2
(``graph_single.py:139,588``); lr_g 2e-4, lr_d 1e-4.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import FGGanConfig
from ..models.fg_gan import MRUGenerator, MRUDiscriminator
from .losses import (
    acgan_focal_loss, dragan_losses, fc_weight_decay_loss, smooth_l1,
    wgan_gp_losses, wgan_sn_losses,
)
from .schedules import fg_gan_lr_decay

Params = Dict[str, Any]


class FGGanTrainState(NamedTuple):
    g_params: Params
    d_params: Params
    d_sn: Params                # spectral-norm u vectors
    g_opt_state: Any
    d_opt_state: Any
    step: jnp.ndarray


def build_models(cfg: FGGanConfig):
    """G/D pair for ``cfg.block_type`` (``graph_single.py:246-255``)."""
    from ..models.fg_gan_variants import (
        Pix2PixFGDiscriminator, Pix2PixFGGenerator,
        ResidualFGDiscriminator, ResidualFGGenerator,
    )
    if cfg.block_type == "MRU":
        gen = MRUGenerator(num_classes=cfg.num_classes,
                           vocab_size=cfg.vocab_size,
                           size=cfg.base_channels, num_blocks=cfg.num_blocks,
                           lstm_hybrid=cfg.lstm_hybrid)
        disc = MRUDiscriminator(num_classes=cfg.num_classes,
                                size=cfg.base_channels,
                                num_blocks=cfg.num_blocks,
                                sn=cfg.spectral_norm, proj_d=cfg.proj_d)
    elif cfg.block_type == "Pix2Pix":
        gen = Pix2PixFGGenerator(vocab_size=cfg.vocab_size,
                                 size=cfg.base_channels,
                                 lstm_hybrid=cfg.lstm_hybrid)
        disc = Pix2PixFGDiscriminator(num_classes=cfg.num_classes,
                                      size=cfg.base_channels,
                                      sn=cfg.spectral_norm)
    elif cfg.block_type == "Residual":
        gen = ResidualFGGenerator(vocab_size=cfg.vocab_size,
                                  size=cfg.base_channels,
                                  lstm_hybrid=cfg.lstm_hybrid)
        disc = ResidualFGDiscriminator(num_classes=cfg.num_classes,
                                       size=cfg.base_channels,
                                       sn=cfg.spectral_norm)
    else:
        raise ValueError(f"unknown block_type {cfg.block_type}")
    return gen, disc


def _per_tensor_clip(max_norm: float) -> optax.GradientTransformation:
    """tf.clip_by_norm per gradient tensor (``graph_single.py:199-207``)."""
    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def clip(g):
            norm = jnp.sqrt(jnp.sum(jnp.square(g)))
            return g * jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
        return jax.tree_util.tree_map(clip, updates), state
    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizers(cfg: FGGanConfig):
    # optax's schedule count advances per update; the D optimizer updates
    # cfg.disc_steps times per global step, so divide its count back to
    # global steps (the reference decays by global iteration,
    # graph_single.py:139)
    d_updates_per_step = max(cfg.disc_steps, 1)

    def lr_sched(base, per_step=1):
        return lambda count: base * fg_gan_lr_decay(count // per_step,
                                                    cfg.max_iters)
    chain_g, chain_d = [], []
    if not cfg.spectral_norm:
        chain_g += [optax.clip_by_global_norm(50.0), _per_tensor_clip(5.0)]
        chain_d += [optax.clip_by_global_norm(100.0), _per_tensor_clip(10.0)]
    adam = lambda base, per_step=1: optax.adam(
        lr_sched(base, per_step), b1=0.0, b2=0.9, eps=1e-8)
    opt_g = optax.chain(*chain_g, adam(cfg.lr_g))
    opt_d = optax.chain(*chain_d, adam(cfg.lr_d, d_updates_per_step))
    return opt_g, opt_d


def create_fg_gan_state(rng, cfg: FGGanConfig) -> FGGanTrainState:
    # the whole init runs as ONE jitted program: eager flax init dispatches
    # ~850 single-op executables (measured 52 s of a 81 s harness test on
    # the CPU suite box, and one tunnel round-trip per op on TPU)
    gen, disc = build_models(cfg)
    opt_g, opt_d = make_optimizers(cfg)
    s = cfg.image_size
    b = max(cfg.batch_size, 1)

    def build(k):
        k_g, k_d, k_n = jax.random.split(k, 3)
        dummy_img = jnp.zeros((b, s, s, 3), jnp.float32)
        dummy_tok = jnp.zeros((b, cfg.max_len), jnp.int32)
        dummy_lab = jnp.zeros((b,), jnp.int32)
        g_vars = gen.init(k_g, dummy_img, dummy_tok, dummy_lab,
                          jnp.zeros((b, cfg.noise_dim), jnp.float32))
        d_vars = disc.init(k_d, dummy_img, dummy_img, dummy_lab)
        g_params = g_vars["params"]
        d_params = d_vars["params"]
        d_sn = d_vars.get("sn", {})
        return FGGanTrainState(
            g_params=g_params, d_params=d_params, d_sn=d_sn,
            g_opt_state=opt_g.init(g_params),
            d_opt_state=opt_d.init(d_params),
            step=jnp.zeros((), jnp.int32))

    return jax.jit(build)(rng)


def make_fg_gan_train_step(cfg: FGGanConfig, donate: bool = True,
                           perceptual_params=None):
    """Returns jitted ``step(state, batch_d, batch_g, rng) -> (state, metrics)``.

    Each batch dict: images [B,S,S,3] in [-1,1], sketches [B,S,S,3],
    images_d [B,S,S,3], class_id [B], class_id_d [B], tokens [B,T]
    (front-padded).  ``metrics['nan']`` is the NaN-watchdog flag
    (``main_procedure.py:213-232``).

    ``perceptual_params`` (an ``models.inception_v4`` tree) enables the
    inception perceptual term when ``cfg.coeff_perceptual > 0``.
    """
    gen, disc = build_models(cfg)
    opt_g, opt_d = make_optimizers(cfg)

    def generate(g_params, batch, rng):
        b = batch["sketches"].shape[0]
        noise = jax.random.normal(rng, (b, cfg.noise_dim), jnp.float32)
        return gen.apply({"params": g_params}, batch["sketches"],
                         batch["tokens"], batch["class_id"], noise)

    def disc_apply(d_params, d_sn, inputs, targets, labels, mutable=False):
        variables = {"params": d_params, "sn": d_sn}
        if mutable:
            (out, logits), new_vars = disc.apply(
                variables, inputs, targets, labels, mutable=["sn"])
            return out, logits, new_vars["sn"]
        out, logits = disc.apply(variables, inputs, targets, labels)
        return out, logits, d_sn

    def gan_losses(d_params, d_sn, fakes, batch, rng, capture_sn=False):
        # the reference pairs the G-batch sketches with both the D-batch real
        # images and the fakes (``graph_single.py:269-273``).  capture_sn
        # advances the spectral-norm power iteration on the real pass -- the
        # reference commits u updates once per step at the G optimize
        # (``graph_single.py:178-212``), and this pass sees the same inputs.
        real_out, real_logit, new_sn = disc_apply(
            d_params, d_sn, batch["sketches"], batch["images_d"],
            batch["class_id_d"], mutable=capture_sn)
        fake_out, fake_logit, _ = disc_apply(
            d_params, d_sn, batch["sketches"], fakes, batch["class_id"])
        if cfg.spectral_norm:
            loss_g_gan, loss_d_gan = wgan_sn_losses(fake_out, real_out)
        else:
            def disc_fn(x):
                return disc_apply(d_params, d_sn, batch["sketches"], x,
                                  batch["class_id_d"])[0]
            if cfg.wgan:
                loss_g_gan, loss_d_gan = wgan_gp_losses(
                    disc_fn, fake_out, real_out, fakes, batch["images_d"],
                    rng, ld=cfg.ld)
            else:
                loss_g_gan, loss_d_gan = dragan_losses(
                    disc_fn, fake_out, real_out, batch["images_d"], rng,
                    ld=cfg.ld)
        if not cfg.proj_d:
            loss_g_ac, loss_d_ac = acgan_focal_loss(
                real_logit, batch["class_id_d"], fake_logit, batch["class_id"],
                cfg.num_classes)
            loss_g_gan = loss_g_gan + cfg.coeff_ac * loss_g_ac
            loss_d_gan = loss_d_gan + cfg.coeff_ac * loss_d_ac
        return loss_g_gan, loss_d_gan, new_sn

    def d_loss_fn(d_params, d_sn, g_params, batch, rng):
        k_noise, k_gp = jax.random.split(rng)
        fakes = generate(g_params, batch, k_noise)
        _, loss_d_gan, _ = gan_losses(d_params, d_sn, fakes, batch, k_gp)
        loss_d = loss_d_gan + fc_weight_decay_loss(d_params)
        return loss_d

    def g_loss_fn(g_params, d_params, d_sn, batch, rng):
        k_noise, k_gp = jax.random.split(rng)
        fakes = generate(g_params, batch, k_noise)
        loss_g_gan, _, new_sn = gan_losses(d_params, d_sn, fakes, batch, k_gp,
                                           capture_sn=cfg.spectral_norm)
        recon = smooth_l1(fakes, batch["images"])
        loss_g = (loss_g_gan + cfg.coeff_l1 * recon
                  + fc_weight_decay_loss(g_params))
        if perceptual_params is not None and cfg.coeff_perceptual > 0:
            from ..models.inception_v4 import perceptual_loss
            loss_g = loss_g + cfg.coeff_perceptual * perceptual_loss(
                perceptual_params, batch["images"], fakes)
        return loss_g, (recon, new_sn)

    def step(state: FGGanTrainState, batch_d, batch_g, rng):
        k_d, k_g = jax.random.split(jax.random.fold_in(rng, state.step))

        # ---- D update(s): cfg.disc_steps iterations per G step
        # (``main_procedure.py:199-216``; the reference re-pulls queue batches
        # per D iteration -- here each iteration re-keys the noise) ----
        d_params, d_opt_state = state.d_params, state.d_opt_state
        loss_d = jnp.asarray(0.0)
        for k in range(max(cfg.disc_steps, 1)):
            loss_d, d_grads = jax.value_and_grad(d_loss_fn)(
                d_params, state.d_sn, state.g_params, batch_d,
                jax.random.fold_in(k_d, k))
            d_updates, d_opt_state = opt_d.update(d_grads, d_opt_state,
                                                  d_params)
            d_params = optax.apply_updates(d_params, d_updates)

        # ---- G update (against the updated D); its real-image D pass also
        # advances the spectral-norm power iteration ----
        (loss_g, (recon, d_sn)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(
            state.g_params, d_params, state.d_sn, batch_g, k_g)
        g_updates, g_opt_state = opt_g.update(g_grads, state.g_opt_state,
                                              state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        nan = jnp.logical_or(jnp.isnan(loss_d), jnp.isnan(loss_g))
        new_state = FGGanTrainState(
            g_params=g_params, d_params=d_params, d_sn=d_sn,
            g_opt_state=g_opt_state, d_opt_state=d_opt_state,
            step=state.step + 1)
        metrics = {"loss_d": loss_d, "loss_g": loss_g, "recon_l1": recon,
                   "nan": nan}
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())
