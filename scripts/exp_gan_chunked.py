"""A/B: monolithic bucket-128 FG GAN fused prepare+forward vs in-program
chunked variants (the forward runs over unrolled row-chunks inside ONE jit).

Motivation (PARITY.md "Remaining floor"): a standalone K=16 forward runs
0.689 ms/row vs the production bucket-128's ~1.1 ms/row, but a Python loop
of K=16 dispatches loses to tunnel dispatch overhead and a lax.scan
formulation crashes the axon TPU worker.  In-program unrolled chunking is
the untried corner: one dispatch, chunk-sized convs.

Run on the real TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_gan_chunked.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from sketchyscenecolorization_tpu.config import FGGanConfig
from sketchyscenecolorization_tpu.ops.conv import compute_dtype_scope
from sketchyscenecolorization_tpu.ops.norm import per_sample_stats_scope
from sketchyscenecolorization_tpu.train.fg_gan import build_models
from sketchyscenecolorization_tpu.utils.compile_cache import (
    enable_persistent_compilation_cache)

enable_persistent_compilation_cache()

cfg = FGGanConfig()
gen, _ = build_models(cfg)
key = jax.random.PRNGKey(0)
g_params = jax.jit(
    lambda k: gen.init(k, jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
                       jnp.zeros((1, cfg.max_len), jnp.int32),
                       jnp.zeros((1,), jnp.int32),
                       jnp.zeros((1, cfg.noise_dim)))["params"])(key)

K = 128
rng = np.random.RandomState(0)
x = jnp.asarray(rng.uniform(-1, 1, (K, cfg.image_size, cfg.image_size, 3))
                .astype(np.float32))
tok = jnp.asarray(rng.randint(0, cfg.vocab_size, (K, cfg.max_len))
                  .astype(np.int32))
ids = jnp.asarray(rng.randint(0, cfg.num_classes, (K,)).astype(np.int32))
noise = jnp.asarray(rng.randn(K, cfg.noise_dim).astype(np.float32))


def fwd_mono(g_params, x, tok, ids, noise, carry):
    with per_sample_stats_scope(), compute_dtype_scope(cfg.compute_dtype):
        out = gen.apply({"params": g_params}, x + carry * 1e-12, tok, ids,
                        noise)
    return carry + jnp.sum(out.astype(jnp.float32)) * 1e-9


def make_chunked(chunk):
    def fwd(g_params, x, tok, ids, noise, carry):
        tot = jnp.zeros((), jnp.float32)
        xc = x + carry * 1e-12
        for s in range(0, K, chunk):
            with per_sample_stats_scope(), \
                    compute_dtype_scope(cfg.compute_dtype):
                out = gen.apply({"params": g_params}, xc[s:s + chunk],
                                tok[s:s + chunk], ids[s:s + chunk],
                                noise[s:s + chunk])
            tot = tot + jnp.sum(out.astype(jnp.float32))
        return carry + tot * 1e-9
    return fwd


def fetch_latency():
    one = jnp.ones((), jnp.float32)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(one + 0)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def timed(f, iters=6, reps=3):
    jf = jax.jit(f)
    zero = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    float(jf(g_params, x, tok, ids, noise, zero))
    print(f"  compile+1st: {time.perf_counter() - t0:.1f}s", flush=True)
    latency = fetch_latency()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        carry = zero
        for _ in range(iters):
            carry = jf(g_params, x, tok, ids, noise, carry)
        float(carry)
        best = min(best, (time.perf_counter() - t0 - latency) / iters)
    return best * 1e3


ms = timed(fwd_mono)
print(f"monolithic K={K}: {ms:.1f} ms  ({ms / K:.3f} ms/row)", flush=True)
for chunk in (16, 32, 8):
    ms = timed(make_chunked(chunk))
    print(f"chunked {chunk}x{K // chunk}: {ms:.1f} ms  "
          f"({ms / K:.3f} ms/row)", flush=True)
