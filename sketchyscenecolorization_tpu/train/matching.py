"""RMI matching training step (reference ``RMI_model.py:312-372`` +
``matching_main.py:81-241``).

Semantics reproduced exactly:
- loss = weighted logistic loss SUMMED over drawing pixels only (pixels whose
  mean-subtracted R channel < 0) + weight_decay * l2 over 'DW' leaves;
- polynomial LR decay 2.5e-4 -> 1e-5 over 75k steps, power 0.9;
- Adam, with gradients of 'biases' leaves multiplied by 2 before the update
  (the reference's per-var LR multiplier, ``RMI_model.py:366-369``);
- only the ``text_sketchyscene`` subtree trains by default (CNN frozen).

TPU-first: one jitted step; data parallelism comes from sharding the batch
over the mesh 'data' axis (the loss is a global sum, so XLA inserts the grad
all-reduce over ICI automatically).  Host-side data loading lives in
``data/matching_dataset.py`` behind a prefetcher, not in the step path.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import MatchingConfig
from ..models import rmi
from .losses import weighted_logistic_loss, l2_regularization_loss
from .schedules import tf1_polynomial_decay

Params = Dict[str, Any]


class MatchingTrainState(NamedTuple):
    params: Params              # full tree: {'ResNet': ..., 'text_sketchyscene': ...}
    opt_state: Any
    step: jnp.ndarray


def _split_trainable(params: Params, cfg: MatchingConfig) -> Tuple[Params, Params]:
    if cfg.train_fusion_var_only:
        trainable = {"text_sketchyscene": params["text_sketchyscene"]}
        frozen = {k: v for k, v in params.items() if k != "text_sketchyscene"}
    else:
        trainable, frozen = params, {}
    return trainable, frozen


def _merge(trainable: Params, frozen: Params) -> Params:
    return {**frozen, **trainable}


def _dw_leaves(tree: Params):
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if keys and keys[-1] == "DW":
            out.append(leaf)
    return out


def _bias_lr_mult(grads: Params, mult: float = 2.0) -> Params:
    def fix(path, g):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        return g * mult if keys and keys[-1] == "biases" else g
    return jax.tree_util.tree_map_with_path(fix, grads)


def matching_loss_fn(trainable: Params, frozen: Params, cfg: MatchingConfig,
                     batch: Dict[str, jnp.ndarray]) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    params = _merge(trainable, frozen)
    out = rmi.apply(params, cfg, batch["image"], batch["words"], batch["seq_len"])
    target = batch["target_mask"]
    if cfg.training_ignore_bg:
        valid = (batch["image"][..., 0:1] < 0).astype(jnp.float32)
    else:
        valid = None
    cls_loss = weighted_logistic_loss(out.up, target, valid_mask=valid)
    reg_loss = l2_regularization_loss(_dw_leaves(trainable), cfg.weight_decay)
    cost = cls_loss + reg_loss
    return cost, {"cls_loss": cls_loss, "reg_loss": reg_loss,
                  "sigm": jax.nn.sigmoid(out.up)}


def make_optimizer(cfg: MatchingConfig) -> optax.GradientTransformation:
    schedule = tf1_polynomial_decay(cfg.start_lr, cfg.end_lr,
                                    cfg.lr_decay_step, cfg.lr_power)
    return optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-8)


def create_matching_state(params: Params, cfg: MatchingConfig) -> MatchingTrainState:
    trainable, _ = _split_trainable(params, cfg)
    # jitted: eager optax init dispatches one zeros-op per leaf (hundreds
    # for ResNet-101 -- one tunnel round-trip each on TPU).  params pass
    # through untouched (not through the jit, so no device copy).
    opt_state = jax.jit(make_optimizer(cfg).init)(trainable)
    return MatchingTrainState(params=params, opt_state=opt_state,
                              step=jnp.zeros((), jnp.int32))


def make_matching_train_step(cfg: MatchingConfig, donate: bool = True):
    """Returns jitted ``step(state, batch) -> (state, metrics)``.

    ``batch``: image [N,768,768,3] (mean-subtracted float32), words [N,T]
    int32 end-padded, seq_len [N] int32, target_mask [N,768,768,1] float32.
    """
    optimizer = make_optimizer(cfg)

    def step(state: MatchingTrainState, batch):
        trainable, frozen = _split_trainable(state.params, cfg)
        (cost, aux), grads = jax.value_and_grad(matching_loss_fn, has_aux=True)(
            trainable, frozen, cfg, batch)
        grads = _bias_lr_mult(grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        params = _merge(trainable, frozen)
        new_state = MatchingTrainState(params=params, opt_state=opt_state,
                                       step=state.step + 1)
        lr = tf1_polynomial_decay(cfg.start_lr, cfg.end_lr, cfg.lr_decay_step,
                                  cfg.lr_power)(state.step)
        metrics = {"cost": cost, "cls_loss": aux["cls_loss"],
                   "reg_loss": aux["reg_loss"], "lr": lr}
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())
