"""Pix2Pix and Residual FG GAN variants: shapes and a train step per variant."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sketchyscenecolorization_tpu.config import FGGanConfig
from sketchyscenecolorization_tpu.train import (
    create_fg_gan_state, make_fg_gan_train_step,
)

BASE = FGGanConfig(batch_size=2, image_size=64, vocab_size=10, max_len=4,
                   base_channels=4, noise_dim=8, max_iters=100)


def _batch(cfg, seed=0):
    rng = np.random.RandomState(seed)
    s = cfg.image_size
    b = cfg.batch_size
    return {
        "images": jnp.asarray(rng.uniform(-1, 1, (b, s, s, 3)), jnp.float32),
        "sketches": jnp.asarray(rng.uniform(-1, 1, (b, s, s, 3)), jnp.float32),
        "images_d": jnp.asarray(rng.uniform(-1, 1, (b, s, s, 3)), jnp.float32),
        "class_id": jnp.asarray(rng.randint(0, cfg.num_classes, (b,)), jnp.int32),
        "class_id_d": jnp.asarray(rng.randint(0, cfg.num_classes, (b,)), jnp.int32),
        "tokens": jnp.asarray(rng.randint(0, cfg.vocab_size, (b, cfg.max_len)),
                              jnp.int32),
    }


@pytest.mark.parametrize("block_type", ["Pix2Pix", "Residual"])
def test_variant_train_step(block_type):
    cfg = dataclasses.replace(BASE, block_type=block_type)
    state = create_fg_gan_state(jax.random.PRNGKey(0), cfg)
    step = make_fg_gan_train_step(cfg, donate=False)
    state1, metrics = step(state, _batch(cfg), _batch(cfg, 1),
                           jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss_d"]))
    assert np.isfinite(float(metrics["loss_g"]))
    assert int(state1.step) == 1


@pytest.mark.parametrize("block_type", ["Pix2Pix", "Residual"])
def test_variant_generator_output_shape(block_type):
    from sketchyscenecolorization_tpu.train.fg_gan import build_models
    cfg = dataclasses.replace(BASE, block_type=block_type)
    gen, _ = build_models(cfg)
    b = _batch(cfg)
    out, _ = jax.jit(gen.init_with_output, static_argnums=())(
        jax.random.PRNGKey(0), b["sketches"], b["tokens"], b["class_id"],
        jnp.zeros((cfg.batch_size, cfg.noise_dim), jnp.float32))
    assert out.shape == (cfg.batch_size, cfg.image_size, cfg.image_size, 3)
    assert float(jnp.max(jnp.abs(out))) <= 1.0


def test_mru_num_blocks_2_runs():
    """num_blocks > 1 seeds the extra MRU cells with learnable initial
    states (review fix: length-1 hts list crashed).  Forward passes of G
    and D cover the wiring; the train-step compile (~5 min on this box)
    adds nothing to this property and is exercised at num_blocks=1 by
    test_train.py."""
    from sketchyscenecolorization_tpu.train.fg_gan import build_models
    cfg = dataclasses.replace(BASE, num_blocks=2)
    gen, disc = build_models(cfg)
    b = _batch(cfg)
    out, g_vars = jax.jit(gen.init_with_output)(
        jax.random.PRNGKey(0), b["sketches"], b["tokens"], b["class_id"],
        jnp.zeros((cfg.batch_size, cfg.noise_dim), jnp.float32))
    assert out.shape == (cfg.batch_size, cfg.image_size, cfg.image_size, 3)
    assert np.all(np.isfinite(np.asarray(out)))
    (logits, _), _ = jax.jit(disc.init_with_output)(
        jax.random.PRNGKey(1), b["sketches"], b["images"], b["class_id"])
    assert np.all(np.isfinite(np.asarray(logits)))
    assert any("initial_hidden_state" in "/".join(map(str, p))
               for p, _ in jax.tree_util.tree_flatten_with_path(
                   g_vars["params"])[0])
