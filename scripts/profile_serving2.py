"""Deep-dive follow-up to profile_serving.py: honest device times (chained
digest -- the tunnel's block_until_ready returns early) for the two models
separately under f32 vs bf16, fresh-canvas fetch cost (individual vs one
stacked transfer), and PNG encode levels.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_serving2.py
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np
import jax
import jax.numpy as jnp

from sketchyscenecolorization_tpu.config import FGGanConfig, MatchingConfig
from sketchyscenecolorization_tpu.models import rmi
from sketchyscenecolorization_tpu.ops.conv import compute_dtype_scope
from sketchyscenecolorization_tpu.pipeline.io import png_bytes
from sketchyscenecolorization_tpu.utils.compile_cache import (
    enable_persistent_compilation_cache)

enable_persistent_compilation_cache()

M_TEXTS = 12          # instructions per stream run
K_ROWS = 256          # GAN bucket observed in the 9996 stream run


def fetch_latency():
    x = jnp.asarray(1.0)
    float(x)
    t0 = time.perf_counter()
    for _ in range(3):
        float(x + 0.0)
    return (time.perf_counter() - t0) / 3


def chained(fn, args_fn, iters=8, reps=3):
    """median sec/iter of carry-chained fn(*args, carry) -> scalar."""
    zero = jnp.zeros((), jnp.float32)
    float(fn(*args_fn(0), zero))
    lat = fetch_latency()
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        carry = zero
        for i in range(iters):
            carry = fn(*args_fn(i % 2), carry)
        float(carry)
        best.append((time.perf_counter() - t0 - lat) / iters)
    return statistics.median(best)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.RandomState(0)

    # ---------------- RMI fused matching (cached visual), M=12, f32 vs bf16
    for dtype in ("float32", "bfloat16"):
        mcfg = MatchingConfig(compute_dtype=dtype)
        params = jax.jit(lambda k: rmi.init_params(k, mcfg))(
            jax.random.PRNGKey(0))
        image = jnp.asarray(rng.randn(1, mcfg.H, mcfg.W, 3)
                            .astype(np.float32) * 40)

        @jax.jit
        def visual_fn(params, image):
            with compute_dtype_scope(dtype):
                return rmi.extract_visual(params, mcfg, image)
        visual = visual_fn(params, image)
        jax.block_until_ready(visual)

        words = [jnp.asarray(rng.randint(1, 70, (M_TEXTS, mcfg.max_len))
                             .astype(np.int32)) for _ in range(2)]
        lens = jnp.asarray(np.full((M_TEXTS,), 8, np.int32))

        @jax.jit
        def fused(params, visual, words, lens, carry):
            with compute_dtype_scope(dtype):
                up = rmi.apply_fused(params, mcfg, visual, words,
                                     lens + (carry * 1e-12).astype(jnp.int32)
                                     ).up
            return carry + jnp.sum(up.astype(jnp.float32)) * 1e-9

        d = chained(fused, lambda i: (params, visual, words[i], lens))
        print(f"rmi fused M={M_TEXTS} {dtype}: {d*1e3:8.1f} ms "
              f"({d/M_TEXTS*1e3:.2f} ms/text)", flush=True)

        # backbone extract (per-image, cached in serving)
        @jax.jit
        def extract_digest(params, image, carry):
            with compute_dtype_scope(dtype):
                v = rmi.extract_visual(params, mcfg, image + carry * 1e-12)
            return carry + jnp.sum(v.astype(jnp.float32)) * 1e-9
        d = chained(extract_digest, lambda i: (params, image), iters=4)
        print(f"rmi extract_visual {dtype}: {d*1e3:8.1f} ms", flush=True)

    # ---------------- FG GAN batched forward, K=256 rows, f32 vs bf16
    from sketchyscenecolorization_tpu.ops.norm import per_sample_stats_scope
    from sketchyscenecolorization_tpu.train.fg_gan import build_models
    for dtype in ("float32", "bfloat16"):
        fcfg = FGGanConfig(compute_dtype=dtype)
        gen, _ = build_models(fcfg)
        s = fcfg.image_size
        g_params = jax.jit(gen.init)(
            jax.random.PRNGKey(1), jnp.zeros((1, s, s, 3), jnp.float32),
            jnp.zeros((1, fcfg.max_len), jnp.int32),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, fcfg.noise_dim), jnp.float32))["params"]
        x = jnp.asarray(rng.uniform(-1, 1, (K_ROWS, s, s, 3))
                        .astype(np.float32))
        tok = jnp.asarray(rng.randint(0, fcfg.vocab_size,
                                      (K_ROWS, fcfg.max_len)).astype(np.int32))
        ids = jnp.asarray(rng.randint(0, 25, (K_ROWS,)).astype(np.int32))
        noise = jnp.asarray(rng.randn(K_ROWS, fcfg.noise_dim)
                            .astype(np.float32))

        @jax.jit
        def gan_digest(g_params, x, tok, ids, noise, carry):
            with per_sample_stats_scope(), compute_dtype_scope(dtype):
                out = gen.apply({"params": g_params}, x + carry * 1e-12,
                                tok, ids, noise)
            return carry + jnp.sum(out.astype(jnp.float32)) * 1e-9
        d = chained(gan_digest, lambda i: (g_params, x, tok, ids, noise),
                    iters=4)
        print(f"fg gan K={K_ROWS} {dtype}: {d*1e3:8.1f} ms "
              f"({d/K_ROWS*1e3:.3f} ms/row)", flush=True)
        try:
            cost = jax.jit(gan_digest).lower(
                g_params, x, tok, ids, noise,
                jnp.zeros((), jnp.float32)).compile().cost_analysis()
            if cost and "flops" in cost:
                print(f"  flops: {cost['flops']/1e12:.2f} TF "
                      f"-> {cost['flops']/1e12/d:.1f} TF/s", flush=True)
        except Exception:
            pass

    # ---------------- canvas fetch: individual vs stacked transfer
    H = 768
    base = jnp.asarray(rng.randint(0, 256, (H, H, 3)).astype(np.uint8))

    @jax.jit
    def make(base, i):
        return (base + i).astype(jnp.uint8)

    for _ in range(2):                      # warm both programs
        jax.block_until_ready(make(base, 1))
        jax.block_until_ready(jnp.stack([make(base, i) for i in range(12)]))

    for rep in range(3):
        canv = [make(base, i + rep * 12) for i in range(12)]
        t0 = time.perf_counter()
        for c in canv:
            np.asarray(c)
        d_ind = time.perf_counter() - t0
        canv = [make(base, 100 + i + rep * 12) for i in range(12)]
        t0 = time.perf_counter()
        stacked = np.asarray(jnp.stack(canv))
        d_stk = time.perf_counter() - t0
        print(f"fetch 12x768^2 individually: {d_ind*1e3:7.1f} ms   "
              f"stacked: {d_stk*1e3:7.1f} ms", flush=True)

    # re-fetch of an already-materialized buffer (profile1 artifact check)
    c0 = make(base, 999)
    np.asarray(c0)
    t0 = time.perf_counter()
    for _ in range(5):
        np.asarray(c0)
    print(f"re-fetch same buffer x5: {(time.perf_counter()-t0)*1e3:7.1f} ms",
          flush=True)

    # ---------------- PNG encode levels (on representative content: the
    # fixture sketch, not random noise -- zlib cost is content-dependent)
    from PIL import Image
    img = np.array(Image.open(
        "/root/reference/examples/sketches/9996.png").convert("RGB"),
        dtype=np.uint8)
    for level in (0, 1, 2):
        t0 = time.perf_counter()
        for _ in range(5):
            b = png_bytes(img, level)
        d = (time.perf_counter() - t0) / 5
        print(f"png level {level}: {d*1e3:6.1f} ms  ({len(b)//1024} KB)",
              flush=True)


if __name__ == "__main__":
    main()
