"""North-star benchmark: instruction -> colorized-768^2 passes/sec/chip.

One "pass" = the device work of a full foreground colorization instruction
(reference call stack, SURVEY.md §3.1): RMI referring segmentation at
768x768 (DeepLab-v2 ResNet-101 + wLSTM + mLSTM over 96x96 cells) followed by
one FG MRU-GAN generator forward at 192x192.  Baseline target: >=50
passes/sec/chip on TPU v5e (BASELINE.md; the reference publishes no numbers,
so vs_baseline is measured against that target).

Measurement notes (this matters under the axon TPU tunnel, where
``block_until_ready`` returns before device completion and host fetches pay
tunnel bandwidth): every pass gets distinct inputs, each pass's scalar
digest is chained into the next pass's input, and the timer stops on the
host fetch of the final scalar -- which transitively forces every pass.  The
one-way fetch latency is measured separately and subtracted.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import sys
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

TARGET_PASSES_PER_SEC = 50.0
ITERS = 24


def build():
    from sketchyscenecolorization_tpu.config import FGGanConfig, MatchingConfig
    from sketchyscenecolorization_tpu.models import rmi
    from sketchyscenecolorization_tpu.models.fg_gan import MRUGenerator

    mcfg = MatchingConfig()
    fcfg = FGGanConfig()
    rmi_params = jax.jit(lambda k: rmi.init_params(k, mcfg))(jax.random.PRNGKey(0))
    gen = MRUGenerator(num_classes=fcfg.num_classes, vocab_size=fcfg.vocab_size,
                       size=fcfg.base_channels, num_blocks=fcfg.num_blocks)
    s = fcfg.image_size
    g_vars = jax.jit(gen.init)(jax.random.PRNGKey(1),
                               jnp.zeros((1, s, s, 3), jnp.float32),
                               jnp.zeros((1, fcfg.max_len), jnp.int32),
                               jnp.zeros((1,), jnp.int32),
                               jnp.zeros((1, fcfg.noise_dim), jnp.float32))

    @jax.jit
    def one_pass(rmi_params, g_params, image, words, seq_len,
                 sketch, tokens, labels, noise, carry):
        # the carry perturbs an input and folds both outputs into a scalar,
        # so pass i+1 depends on pass i and nothing can be elided or reused
        mask = rmi.apply(rmi_params, mcfg, image + carry * 1e-12,
                         words, seq_len).sigm
        colorized = gen.apply({"params": g_params}, sketch, tokens, labels,
                              noise)
        return carry + jnp.sum(mask) * 1e-6 + jnp.sum(colorized) * 1e-6

    def make_args(seed):
        k = jax.random.PRNGKey(seed)
        ks = jax.random.split(k, 4)
        return (
            jax.random.uniform(ks[0], (1, mcfg.H, mcfg.W, 3), jnp.float32,
                               -120.0, 130.0),
            jax.random.randint(ks[1], (1, mcfg.max_len), 1, 70),
            jnp.full((1,), 8, jnp.int32),
            jax.random.uniform(ks[2], (1, s, s, 3), jnp.float32, -1.0, 1.0),
            jax.random.randint(ks[3], (1, fcfg.max_len), 0, fcfg.vocab_size),
            jnp.zeros((1,), jnp.int32),
            jax.random.normal(ks[0], (1, fcfg.noise_dim), jnp.float32),
        )

    params = (rmi_params, g_vars["params"])
    return one_pass, params, make_args


def _fetch_latency() -> float:
    """One-way round-trip cost of fetching a ready scalar."""
    x = jnp.asarray(1.0)
    float(x)  # materialize
    t0 = time.perf_counter()
    for _ in range(3):
        float(x + 0.0)
    return (time.perf_counter() - t0) / 3


def main():
    one_pass, params, make_args = build()
    arg_sets = [make_args(i) for i in range(ITERS)]
    # warmup / compile (forced by host fetch of the scalar); the carry must
    # be strongly-typed f32 from the start or the second chained call
    # retraces (weak->strong promotion changes the abstract value)
    zero = jnp.zeros((), jnp.float32)
    float(one_pass(*params, *arg_sets[0], zero))
    latency = _fetch_latency()

    # the tunnel's dispatch cost is highly variable when cold; time two
    # chained rounds and report the best sustained rate
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        carry = zero
        for i in range(ITERS):
            carry = one_pass(*params, *arg_sets[i], carry)
        digest = float(carry)          # forces the whole chain
        best_dt = min(best_dt, time.perf_counter() - t0 - latency)

    passes_per_sec = ITERS / best_dt
    print(json.dumps({
        "metric": "instruction_to_colorized_768_passes_per_sec_per_chip",
        "value": round(passes_per_sec, 3),
        "unit": "passes/sec/chip",
        "vs_baseline": round(passes_per_sec / TARGET_PASSES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
