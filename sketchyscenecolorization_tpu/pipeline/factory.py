"""Session factory: wire engines from checkpoints (or fresh params).

Vocab files are loaded from the configured paths when present; otherwise the
built-in default vocabularies are generated from the reference lexicons so a
session can run self-contained (fresh-parameter mode is used by tests and
benchmarks; trained checkpoints come from ``utils.checkpoint``).
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax

from ..config import FrameworkConfig
from ..models import rmi
from ..text import load_vocab
from ..utils.checkpoint import latest_checkpoint, restore_checkpoint
from .engines import BGColorizeEngine, FGColorizeEngine, MatchingEngine
from .session import ColorizationSession

import jax.numpy as jnp


def _load_vocab_or_none(path: str) -> Optional[Dict[str, int]]:
    if path and os.path.isfile(path):
        return load_vocab(path)
    return None


def _placeholder_vocab(size: int) -> Dict[str, int]:
    """Index-stable stand-in used when no vocab file is configured (tests /
    fresh runs): '<pad>', '<unk>', then opaque tokens."""
    words = ["<pad>", "<unk>"] + [f"w{i}" for i in range(size - 2)]
    return {w: i for i, w in enumerate(words)}


def serve_mesh_for(cfg: FrameworkConfig):
    """Serving data-parallel mesh for the batched instance-GAN forward (the
    measured serving device floor): a ('data',) mesh over the first
    ``pipeline.serve_gan_data_parallel`` devices.  Falls back to None
    (single-device, outputs preserved) when the host has fewer chips than
    asked -- e.g. the one-chip tunnel."""
    n_dp = cfg.pipeline.serve_gan_data_parallel
    if n_dp > 1 and len(jax.devices()) >= n_dp:
        from ..parallel import create_mesh
        return create_mesh(data=n_dp, model=1, devices=jax.devices()[:n_dp])
    return None


def _maybe_restore(ckpt_dir: str, template):
    found = latest_checkpoint(ckpt_dir) if ckpt_dir else None
    if found is None:
        return template
    _, path = found
    return restore_checkpoint(path, template)


def build_session(cfg: FrameworkConfig, seed: int = 0) -> ColorizationSession:
    k = jax.random.PRNGKey(seed)
    k_m, k_f, k_b = jax.random.split(k, 3)

    m_vocab = (_load_vocab_or_none(cfg.pipeline.match_vocab_path)
               or _placeholder_vocab(cfg.matching.vocab_size))
    f_vocab = (_load_vocab_or_none(cfg.pipeline.fg_vocab_path)
               or _placeholder_vocab(cfg.fg_gan.vocab_size))
    b_vocab = (_load_vocab_or_none(cfg.pipeline.bg_vocab_path)
               or _placeholder_vocab(cfg.bg_gan.vocab_size))

    # Initializers run under jit: flax/manual init is otherwise dispatched
    # op-by-op to the device (hundreds of round-trips for ResNet-101).
    m_params = _maybe_restore(
        cfg.pipeline.match_ckpt_dir,
        jax.jit(lambda key: rmi.init_params(key, cfg.matching))(k_m))

    from ..train.fg_gan import build_models as fg_models
    from ..train.bg_gan import build_models as bg_models
    fcfg = cfg.fg_gan
    gen, _ = fg_models(fcfg)
    s = fcfg.image_size
    f_params = jax.jit(gen.init)(
        k_f, jnp.zeros((1, s, s, 3), jnp.float32),
        jnp.zeros((1, fcfg.max_len), jnp.int32),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, fcfg.noise_dim), jnp.float32))["params"]
    f_params = _maybe_restore(cfg.pipeline.fg_ckpt_dir, f_params)

    bcfg = cfg.bg_gan
    bgen, _ = bg_models(bcfg)
    sb = bcfg.image_size
    b_params = jax.jit(bgen.init)(
        k_b, jnp.zeros((1, sb, sb, 3), jnp.float32),
        jnp.zeros((1, bcfg.max_len), jnp.int32))["params"]
    b_params = _maybe_restore(cfg.pipeline.bg_ckpt_dir, b_params)

    return ColorizationSession(
        cfg,
        MatchingEngine(cfg.matching, m_params, m_vocab,
                       cfg.pipeline.score_thresh),
        FGColorizeEngine(cfg.fg_gan, f_params, f_vocab, seed=seed,
                         serve_mesh=serve_mesh_for(cfg)),
        BGColorizeEngine(cfg.bg_gan, b_params, b_vocab),
    )
