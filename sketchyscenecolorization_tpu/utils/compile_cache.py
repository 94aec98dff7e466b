"""Persistent XLA compilation cache for the one-command-per-process flows.

The reference's flagship flow is one CLI invocation per instruction
(``sketchyscene_colorization_main.py:103-112``) -- it pays TF1 graph build +
checkpoint restore every time.  The TPU-native engines compile once per
process, but a fresh process still pays XLA compilation (~20-40 s for the
full-size models on TPU, minutes on CPU).  Pointing jax at a persistent
compilation cache makes every invocation after the first compile-free, so
the interactive CLI behaves like a long-lived session even when driven one
command at a time.
"""
from __future__ import annotations

import os
from typing import Optional

import jax

DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache",
                           "sketchyscene_tpu_jax")


def enable_persistent_compilation_cache(path: Optional[str] = None) -> str:
    """Enable jax's on-disk compilation cache and return its directory.

    Precedence: explicit ``path`` argument > ``JAX_COMPILATION_CACHE_DIR``
    env (which jax itself also honors) > ``~/.cache/sketchyscene_tpu_jax``.
    Safe to call repeatedly; ~tens of MB on disk, delete freely.
    """
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
