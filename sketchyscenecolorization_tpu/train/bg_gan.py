"""BG colorization GAN training (reference ``bg_colorization_main.py:585-700``).

Semantics:
- D trains first; G's gradients are then computed against the *updated* D
  (the reference makes ``gen_train`` a control-dependent of ``discrim_train``,
  ``bg_colorization_main.py:671-682``);
- losses: log-GAN on sigmoid D maps, L1 only over non-FG pixels, region
  softmax xent; total = gan*1 + L1*100 + seg*100;
- Adam(lr poly-decayed to lr/10 over 75% of steps, beta1=0.5);
- EMA(0.99) of the five loss scalars is part of the train state
  (``tf.train.ExponentialMovingAverage``, ``:684-685``).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import BGGanConfig
from ..models.bg_gan import (
    Pix2PixGenerator, PatchDiscriminator, ResidualDiscriminator,
    ResidualGenerator,
)
from .losses import bg_discrim_loss, bg_gan_losses
from .schedules import tf1_polynomial_decay

Params = Dict[str, Any]

LOSS_KEYS = ("discrim_loss", "gen_loss_GAN", "gen_loss_L1",
             "region_mask_loss", "gen_loss")


class BGGanTrainState(NamedTuple):
    g_params: Params
    d_params: Params
    g_opt_state: Any
    d_opt_state: Any
    ema_losses: Dict[str, jnp.ndarray]
    step: jnp.ndarray


def build_models(cfg: BGGanConfig):
    if cfg.residual_enc_g:
        gen = ResidualGenerator(ngf=cfg.ngf, vocab_size=cfg.vocab_size,
                                seg_classes=cfg.seg_classes,
                                multi_residual=cfg.multi_residual)
    else:
        gen = Pix2PixGenerator(ngf=cfg.ngf, vocab_size=cfg.vocab_size)
    disc = (ResidualDiscriminator(ndf=cfg.ndf) if cfg.residual_enc_d
            else PatchDiscriminator(ndf=cfg.ndf))
    return gen, disc


def make_optimizer(cfg: BGGanConfig) -> optax.GradientTransformation:
    schedule = tf1_polynomial_decay(cfg.lr, cfg.lr / 10.0,
                                    int(round(cfg.max_steps * 0.75)), 0.9)
    return optax.adam(schedule, b1=cfg.beta1, b2=0.999, eps=1e-8)


def create_bg_gan_state(rng, cfg: BGGanConfig,
                        image_size: int = 0) -> BGGanTrainState:
    # one jitted init program instead of an eager per-op dispatch storm
    # (see create_fg_gan_state)
    gen, disc = build_models(cfg)
    opt = make_optimizer(cfg)
    s = image_size or cfg.image_size

    def build(k):
        k_g, k_d = jax.random.split(k)
        img = jnp.zeros((cfg.batch_size, s, s, 3), jnp.float32)
        tok = jnp.zeros((cfg.batch_size, cfg.max_len), jnp.int32)
        g_params = gen.init(k_g, img, tok)["params"]
        d_params = disc.init(k_d, img, img)["params"]
        ema = {k: jnp.zeros((), jnp.float32) for k in LOSS_KEYS}
        return BGGanTrainState(g_params=g_params, d_params=d_params,
                               g_opt_state=opt.init(g_params),
                               d_opt_state=opt.init(d_params),
                               ema_losses=ema,
                               step=jnp.zeros((), jnp.int32))

    return jax.jit(build)(rng)


def make_bg_gan_train_step(cfg: BGGanConfig, donate: bool = True):
    """Returns jitted ``step(state, batch) -> (state, metrics)``.

    ``batch``: inputs [B,S,S,3] (FG composite, [-1,1]), targets [B,S,S,3]
    ([-1,1]), tokens [B,8] int32 front-padded, labels [B,S,S] int32
    (0=fg, 1=sky, 2=ground).  Metrics are the EMA'd losses (what the
    reference logs) plus the raw per-step values.
    """
    gen, disc = build_models(cfg)
    opt = make_optimizer(cfg)
    if not cfg.residual_enc_g:
        raise NotImplementedError("pix2pix generator has no region branch; "
                                  "training requires residual_enc_g=True "
                                  "(matching the reference default)")

    def forward_g(g_params, batch):
        def fwd(p, inputs, tokens):
            return gen.apply({"params": p}, inputs, tokens)
        if cfg.remat:
            # 768^2 residual-generator activations dominate HBM at batch>1;
            # rematerialization recomputes them in the backward pass
            fwd = jax.checkpoint(fwd)
        return fwd(g_params, batch["inputs"], batch["tokens"])

    def d_loss_fn(d_params, outputs, batch):
        predict_real = disc.apply({"params": d_params}, batch["inputs"],
                                  batch["targets"])
        predict_fake = disc.apply({"params": d_params}, batch["inputs"], outputs)
        return bg_discrim_loss(predict_real, predict_fake)

    def g_loss_fn(g_params, d_params, batch):
        outputs, region_logits = forward_g(g_params, batch)
        predict_real = disc.apply({"params": d_params}, batch["inputs"],
                                  batch["targets"])
        predict_fake = disc.apply({"params": d_params}, batch["inputs"], outputs)
        losses = bg_gan_losses(predict_real, predict_fake, batch["targets"],
                               outputs, region_logits, batch["labels"],
                               cfg.gan_weight, cfg.l1_weight, cfg.seg_weight)
        return losses["gen_loss"], losses

    def step(state: BGGanTrainState, batch):
        # ---- D update (on current G outputs) ----
        outputs, _ = forward_g(state.g_params, batch)
        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(
            state.d_params, jax.lax.stop_gradient(outputs), batch)
        d_updates, d_opt_state = opt.update(d_grads, state.d_opt_state,
                                            state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # ---- G update against updated D ----
        (_, losses), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g_params, d_params, batch)
        g_updates, g_opt_state = opt.update(g_grads, state.g_opt_state,
                                            state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        # ---- EMA of the loss scalars ----
        decay = cfg.ema_decay
        first = (state.step == 0)
        all_losses = {**losses, "discrim_loss": d_loss}
        ema = {k: jnp.where(first, all_losses[k],
                            decay * state.ema_losses[k] + (1 - decay) * all_losses[k])
               for k in LOSS_KEYS}

        nan = jnp.logical_or(jnp.isnan(d_loss), jnp.isnan(losses["gen_loss"]))
        new_state = BGGanTrainState(
            g_params=g_params, d_params=d_params,
            g_opt_state=g_opt_state, d_opt_state=d_opt_state,
            ema_losses=ema, step=state.step + 1)
        metrics = {f"ema/{k}": ema[k] for k in LOSS_KEYS}
        metrics.update({"discrim_loss": d_loss, "nan": nan})
        metrics.update({k: losses[k] for k in LOSS_KEYS if k != "discrim_loss"})
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())
