"""Learning-rate schedules matching the reference exactly.

- ``tf1_polynomial_decay``: TF1 ``tf.train.polynomial_decay`` semantics
  (step clamped to ``decay_steps``) -- used by matching
  (``RMI_model.py:356-358``: 2.5e-4 -> 1e-5 over 75k steps, p=0.9) and the
  BG GAN (``bg_colorization_main.py:661-666``: lr -> lr/10 over 75% of steps).
- ``fg_gan_lr_decay``: the FG GAN's linear decay floor
  (``graph_single.py:139``): ``max(0.2, 1 - step/max_iter * 0.9)``.
"""
from __future__ import annotations

import jax.numpy as jnp


def tf1_polynomial_decay(start_lr: float, end_lr: float, decay_steps: int,
                         power: float = 0.9):
    def schedule(step):
        s = jnp.minimum(jnp.asarray(step, jnp.float32), float(decay_steps))
        frac = 1.0 - s / float(decay_steps)
        return (start_lr - end_lr) * (frac ** power) + end_lr
    return schedule


def fg_gan_lr_decay(step, max_iter_step: int):
    return jnp.maximum(0.2, 1.0 - jnp.asarray(step, jnp.float32) / max_iter_step * 0.9)
