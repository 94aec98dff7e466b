"""North-star benchmark: instruction -> colorized-768^2 passes/sec/chip.

One "pass" = the device work of a full foreground colorization instruction
(reference call stack, SURVEY.md §3.1): RMI referring segmentation at
768x768 (DeepLab-v2 ResNet-101 + wLSTM + mLSTM over 96x96 cells) followed by
one FG MRU-GAN generator forward at 192x192.  Baseline target: >=50
passes/sec/chip on TPU v5e (BASELINE.md; the reference publishes no numbers,
so vs_baseline is measured against that target).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

TARGET_PASSES_PER_SEC = 50.0


def build():
    from sketchyscenecolorization_tpu.config import FGGanConfig, MatchingConfig
    from sketchyscenecolorization_tpu.models import rmi
    from sketchyscenecolorization_tpu.models.fg_gan import MRUGenerator

    mcfg = MatchingConfig()
    fcfg = FGGanConfig()
    rmi_params = rmi.init_params(jax.random.PRNGKey(0), mcfg)
    gen = MRUGenerator(num_classes=fcfg.num_classes, vocab_size=fcfg.vocab_size,
                       size=fcfg.base_channels, num_blocks=fcfg.num_blocks)
    s = fcfg.image_size
    g_vars = gen.init(jax.random.PRNGKey(1),
                      jnp.zeros((1, s, s, 3), jnp.float32),
                      jnp.zeros((1, fcfg.max_len), jnp.int32),
                      jnp.zeros((1,), jnp.int32),
                      jnp.zeros((1, fcfg.noise_dim), jnp.float32))

    @jax.jit
    def one_pass(rmi_params, g_params, image, words, seq_len,
                 sketch, tokens, labels, noise):
        mask = rmi.apply(rmi_params, mcfg, image, words, seq_len).sigm
        colorized = gen.apply({"params": g_params}, sketch, tokens, labels, noise)
        return mask, colorized

    args = (
        rmi_params, g_vars["params"],
        jnp.zeros((1, mcfg.H, mcfg.W, 3), jnp.float32),
        jnp.zeros((1, mcfg.max_len), jnp.int32),
        jnp.ones((1,), jnp.int32),
        jnp.zeros((1, s, s, 3), jnp.float32),
        jnp.zeros((1, fcfg.max_len), jnp.int32),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, fcfg.noise_dim), jnp.float32),
    )
    return one_pass, args


def main():
    one_pass, args = build()
    # warmup / compile
    out = one_pass(*args)
    jax.block_until_ready(out)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = one_pass(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    passes_per_sec = iters / dt
    print(json.dumps({
        "metric": "instruction_to_colorized_768_passes_per_sec_per_chip",
        "value": round(passes_per_sec, 3),
        "unit": "passes/sec/chip",
        "vs_baseline": round(passes_per_sec / TARGET_PASSES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
