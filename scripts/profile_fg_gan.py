"""HLO-level attribution of the FG GAN fused forward (the measured device
floor under the north star -- VERDICT r4 #1).

Times the EXACT serving program (``FGColorizeEngine.prep_fwd_fn`` at bucket
128: noise chain + row stack + pad + batched per-sample-BN MRU generator +
uint8 quantize) with the chained-scalar-digest recipe, then re-times
ABLATED variants (monkeypatched before tracing) to attribute where the
non-MXU 75% of the wall goes:

  baseline      the shipping program
  fixed_bn      cond-BN normalizes with mean=0/var=1 (skips the per-sample
                spatial reductions; same elementwise structure + FLOPs)
  no_minmax     min-max gate normalization -> identity (skips per-(row,ch)
                spatial min/max reductions)
  no_lstm       TextFusionLSTM -> identity on the visual feature (skips the
                15-step scan + Pallas recurrence at 6x6)
  conv_skeleton fixed_bn + no_minmax + no_lstm: the bare conv/act lattice
  batch_stats   per-sample-stats scope OFF: one reduction over the whole
                bucket instead of 128 per-sample reductions (parity-breaking;
                diagnostic only)

Each variant reports ms/row, implied TF/s against ITS OWN cost-analysis
FLOPs, plus bytes accessed (HBM traffic) so bandwidth-boundedness is
checkable: v5e peak ~197 TF/s (bf16 MXU pass), ~819 GB/s HBM.

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_fg_gan.py \
      [--bucket 128] [--iters 6] [--variants baseline,fixed_bn,...]
"""
from __future__ import annotations

import argparse
import contextlib
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def _fetch_latency() -> float:
    x = jnp.asarray(1.0)
    float(x)
    t0 = time.perf_counter()
    for _ in range(3):
        float(x + 0.0)
    return (time.perf_counter() - t0) / 3


@contextlib.contextmanager
def ablate(names):
    """Monkeypatch the model internals for one traced variant."""
    from sketchyscenecolorization_tpu.models import fg_gan, gan_layers
    from sketchyscenecolorization_tpu.ops import norm as norm_ops
    saved = {}

    def patch(obj, attr, new):
        saved[(obj, attr)] = getattr(obj, attr)
        setattr(obj, attr, new)

    if "fixed_bn" in names:
        def fixed_cbn(x, labels, offset_table, scale_table, eps=1e-5):
            xs = x.astype(jnp.float32)
            offset = offset_table[labels][:, None, None, :]
            scale = scale_table[labels][:, None, None, :]
            return xs / jnp.sqrt(1.0 + eps) * scale + offset
        # CondBatchNorm does a late `from ..ops.norm import ...` inside
        # __call__, so patching the norm module is sufficient
        patch(norm_ops, "conditional_batch_stats_norm", fixed_cbn)
    if "no_minmax" in names:
        ident = lambda x, eps=1e-12: x                       # noqa: E731
        patch(gan_layers, "minmax_normalize", ident)
        patch(fg_gan, "minmax_normalize", ident)
    if "no_lstm" in names:
        class IdentLSTM(gan_layers.TextFusionLSTM):
            def __call__(self, visual, tokens):
                return visual
        patch(fg_gan, "TextFusionLSTM", IdentLSTM)
    try:
        yield
    finally:
        for (obj, attr), old in saved.items():
            setattr(obj, attr, old)


def build_variant(names, bucket):
    """(step_fn, params, inputs): the serving prep_fwd with the ablations
    traced in, wrapped in a chained-digest step."""
    from sketchyscenecolorization_tpu.config import FGGanConfig
    from sketchyscenecolorization_tpu.pipeline.engines import FGColorizeEngine
    from sketchyscenecolorization_tpu.ops.norm import per_sample_stats_scope

    kw = {"compute_dtype": DTYPE} if DTYPE else {}
    cfg = FGGanConfig(image_size=IMAGE_SIZE, **kw) if IMAGE_SIZE \
        else FGGanConfig(**kw)
    with ablate(names):
        from sketchyscenecolorization_tpu.train.fg_gan import build_models
        gen, _ = build_models(cfg)
        s = cfg.image_size
        g_vars = jax.jit(gen.init)(
            jax.random.PRNGKey(1), jnp.zeros((1, s, s, 3), jnp.float32),
            jnp.zeros((1, cfg.max_len), jnp.int32), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, cfg.noise_dim), jnp.float32))
        eng = FGColorizeEngine(cfg, g_vars["params"], vocab={}, seed=0)
        prep_fwd = eng.prep_fwd_fn()

        per_sample = "batch_stats" not in names

        def step(g_params, rng, carry, row0, rows_rest, tokens, labels):
            rows = (row0 + carry * 1e-12,) + rows_rest
            if per_sample:
                out, new_rng = prep_fwd(g_params, rng, rows, tokens, labels,
                                        bucket=bucket)
            else:
                # prep_fwd_fn opens per_sample_stats_scope itself at trace
                # time; re-enter with off to override for the diagnostic
                with per_sample_stats_scope(False):
                    out, new_rng = prep_fwd(g_params, rng, rows, tokens,
                                            labels, bucket=bucket)
            digest = jnp.sum(out.astype(jnp.float32)) * 1e-9
            return carry + digest, new_rng

        step_jit = jax.jit(step)

        rng0 = np.random.RandomState(0)
        rows = tuple(jnp.asarray(
            rng0.uniform(-1, 1, (s, s, 3)).astype(np.float32))
            for _ in range(bucket))
        tokens = jnp.asarray(
            rng0.randint(0, cfg.vocab_size, (bucket, cfg.max_len)), jnp.int32)
        labels = jnp.asarray(rng0.randint(0, 25, (bucket,)), jnp.int32)
        return (step_jit, g_vars["params"],
                (jax.random.PRNGKey(7), rows[0], rows[1:], tokens, labels))


def time_variant(names, bucket, iters):
    with ablate(names):                  # tracing happens at first call AND
        # in .lower() below, so the patches stay active for the whole run
        step, params, (rng, row0, rest, tokens, labels) = \
            build_variant(names, bucket)
        zero = jnp.zeros((), jnp.float32)
        c, r = step(params, rng, zero, row0, rest, tokens, labels)
        float(c)                               # compile + settle
        latency = _fetch_latency()
        best = float("inf")
        for _ in range(3):
            carry, rr = zero, rng
            t0 = time.perf_counter()
            for _ in range(iters):
                carry, rr = step(params, rr, carry, row0, rest, tokens,
                                 labels)
            float(carry)
            best = min(best, (time.perf_counter() - t0 - latency) / iters)
        info = {"ms_per_row": round(best * 1e3 / bucket, 4),
                "ms_total": round(best * 1e3, 1)}
        try:
            cost = step.lower(params, rng, zero, row0, rest, tokens,
                              labels).compile().cost_analysis()
            if cost:
                fl = cost.get("flops", 0.0)
                by = cost.get("bytes accessed", 0.0)
                info["gflops"] = round(fl / 1e9, 1)
                info["gbytes_accessed"] = round(by / 1e9, 2)
                info["implied_tf_per_s"] = round(fl / best / 1e12, 1)
                info["implied_gb_per_s"] = round(by / best / 1e9, 1)
        except Exception as e:                              # noqa: BLE001
            info["cost_error"] = str(e)[:120]
        return info


IMAGE_SIZE = 0          # 0 = reference default (192); CPU smoke uses 64
DTYPE = ""              # '' = config default (f32); 'bfloat16' = storage scope

VARIANTS = {
    "baseline": (),
    "fixed_bn": ("fixed_bn",),
    "no_minmax": ("no_minmax",),
    "no_lstm": ("no_lstm",),
    "conv_skeleton": ("fixed_bn", "no_minmax", "no_lstm"),
    "batch_stats": ("batch_stats",),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bucket", type=int, default=128)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--variants", type=str, default=",".join(VARIANTS))
    ap.add_argument("--size", type=int, default=0,
                    help="image size override (CPU smoke: 64)")
    ap.add_argument("--dtype", type=str, default="",
                    help="compute/storage dtype ('bfloat16')")
    args = ap.parse_args()
    global IMAGE_SIZE, DTYPE
    IMAGE_SIZE = args.size
    DTYPE = args.dtype

    print(f"backend={jax.default_backend()} bucket={args.bucket} "
          f"dtype={DTYPE or 'float32'}", flush=True)
    results = {}
    for name in args.variants.split(","):
        res = time_variant(VARIANTS[name], args.bucket, args.iters)
        results[name] = res
        print(f"{name:14s} {json.dumps(res)}", flush=True)
    base = results.get("baseline", {}).get("ms_total")
    if base:
        for name, res in results.items():
            if name != "baseline" and "ms_total" in res:
                print(f"  {name:14s} saves {base - res['ms_total']:+.1f} ms "
                      f"({(base - res['ms_total']) / base * 100:+.1f}%)")


if __name__ == "__main__":
    main()
