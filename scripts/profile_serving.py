"""Per-stage wall-time breakdown of a warm ``colorize_stream`` FG run.

Answers the round-3 question "why doesn't stream (3 dispatches/run) beat
sequential?" with measured numbers: matching dispatch, GAN dispatch,
compositing dispatch, per-canvas device->host fetch, PNG encode, record IO,
and the end-to-end stream vs sequential rates.  Results go into PARITY.md
("Serving host-cost measurements").

Run on the real TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_serving.py
"""
from __future__ import annotations

import dataclasses
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

EXAMPLES = os.environ.get("BENCH_EXAMPLES", "/root/reference/examples")
IMAGE_ID = 9996
FG_TEXTS = [
    "the bus is yellow with gray windows", "the tree is green",
    "the grass is dark green", "the cloud is gray", "the bird is red",
    "the chicken is orange", "the rabbit is pink", "the sun is orange",
    "the bus is red", "the tree is yellow", "the bird is blue",
    "the sun is yellow",
]


def t(fn, n=5):
    """median seconds of fn() over n reps."""
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return statistics.median(samples)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from sketchyscenecolorization_tpu.config import (FrameworkConfig,
                                                     PipelineConfig)
    from sketchyscenecolorization_tpu.pipeline.factory import build_session
    from sketchyscenecolorization_tpu.pipeline.io import png_bytes
    from sketchyscenecolorization_tpu.data.records import fetch_records
    from sketchyscenecolorization_tpu.text import segment_user_input_text
    from sketchyscenecolorization_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache)
    enable_persistent_compilation_cache()

    out_root = tempfile.mkdtemp(prefix="profile_serving_")
    cfg = dataclasses.replace(FrameworkConfig(), pipeline=PipelineConfig(
        data_base_dir=EXAMPLES, results_base_dir=out_root,
        match_vocab_path="", fg_vocab_path="", bg_vocab_path="",
        match_ckpt_dir="", fg_ckpt_dir="", bg_ckpt_dir="",
        cache_visual_features=True, async_png_writes=True))
    session = build_session(cfg, seed=0)
    print(f"backend: {jax.default_backend()}", flush=True)

    # warm every compiled program the stream run uses
    session.colorize(IMAGE_ID, FG_TEXTS[0])
    session.colorize_stream(IMAGE_ID, FG_TEXTS)
    session.flush()
    print("warmup done", flush=True)

    state = session._state(IMAGE_ID)
    results_dir = session._results_dir(IMAGE_ID)

    # ---- stage 1: matching (one fused dispatch for 12 instructions)
    d_match = t(lambda: session._match_many(state, FG_TEXTS))
    matched = session._match_many(state, FG_TEXTS)
    n_rows = sum(len(m) for m in matched)
    print(f"match_many(12 texts): {d_match*1e3:8.1f} ms   rows={n_rows}")

    # ---- stage 2: GAN generation (prepare + forward, one dispatch each)
    rows, ids, toks = [], [], []
    for p, text in enumerate(FG_TEXTS):
        tk = session.fg.encode(segment_user_input_text(text))
        for inst in matched[p]:
            import sketchyscenecolorization_tpu.pipeline.compositing as comp
            rows.append(state.prepared_instance_dev(
                inst, cfg.pipeline.instance_size))
            ids.append(comp.SKE_ID_TO_CAT_ID[int(state.pred_class_ids[inst])])
            toks.append(tk)
    toks = np.asarray(toks, np.int32)

    def gan():
        out, _ = session.fg.colorize_rows_dev(rows, ids, toks)
        jax.block_until_ready(out)
    d_gan = t(gan)
    print(f"gan rows_dev({n_rows} rows): {d_gan*1e3:8.1f} ms")

    # ---- stage 3: compositing (whole-run chain, one dispatch)
    gen_dev, _ = session.fg.colorize_rows_dev(rows, ids, toks)
    base = session._canvas_dev(state, results_dir, "")
    passes, off = [], 0
    for p in range(len(FG_TEXTS)):
        passes.append((tuple(matched[p]), off))
        off += len(matched[p])

    def compo():
        canv = state.get_compositor().composite_run(base, gen_dev, passes)
        jax.block_until_ready(canv[-1])
        return canv
    d_comp = t(compo)
    canvases = compo()
    print(f"composite_run(12 passes): {d_comp*1e3:8.1f} ms")

    # ---- stage 4: canvas fetch (device -> host, 1.7 MB each)
    d_fetch1 = t(lambda: np.asarray(canvases[0]))
    d_fetch_all = t(lambda: [np.asarray(c) for c in canvases], n=3)
    print(f"canvas fetch x1: {d_fetch1*1e3:8.1f} ms   "
          f"x12: {d_fetch_all*1e3:8.1f} ms")

    # ---- stage 5: PNG encode (host, level=default)
    host_canvas = np.asarray(canvases[0])
    lvl = cfg.pipeline.png_compress_level
    d_png = t(lambda: png_bytes(host_canvas, lvl))
    print(f"png_bytes(level={lvl}) x1: {d_png*1e3:8.1f} ms")

    # ---- stage 6: record IO (fetch+update JSON per pass)
    d_rec = t(lambda: fetch_records(IMAGE_ID, out_root))
    print(f"fetch_records x1: {d_rec*1e3:8.1f} ms")

    # ---- end-to-end comparison
    def stream_run():
        session.colorize_stream(IMAGE_ID, FG_TEXTS)
        session.flush()
    d_stream = t(stream_run, n=3)

    def seq_run():
        for text in FG_TEXTS:
            session.colorize(IMAGE_ID, text)
        session.flush()
    d_seq = t(seq_run, n=3)
    n = len(FG_TEXTS)
    print(f"stream end-to-end: {d_stream*1e3:8.1f} ms "
          f"({n/d_stream:6.2f} passes/s)")
    print(f"seq    end-to-end: {d_seq*1e3:8.1f} ms "
          f"({n/d_seq:6.2f} passes/s)")

    # ---- BG path breakdown
    import sketchyscenecolorization_tpu.pipeline.compositing as comp
    bg_texts = ["the sky is blue and the ground is green",
                "the sky is red and the ground is gray"]
    session.colorize(IMAGE_ID, bg_texts[0])
    session.flush()

    def bg_run():
        for t in bg_texts:
            session.colorize(IMAGE_ID, t)
        session.flush()
    d_bg = t(bg_run, n=3)
    print(f"bg end-to-end x2: {d_bg*1e3:8.1f} ms "
          f"({2/d_bg:6.2f} passes/s)")

    compositor = state.get_compositor()
    base_dev = session._canvas_dev(state, results_dir, "")

    def bg_dispatch():
        out = session.bg.colorize_composited(
            base_dev, compositor._inner, compositor._moved,
            compositor._drawings, "the sky is blue and the ground is green")
        jax.block_until_ready(out)
        return out
    d_bgd = t(bg_dispatch, n=3)
    bg_canvas = np.asarray(bg_dispatch())
    d_bgf = t(lambda: np.asarray(bg_dispatch()), n=3) - d_bgd
    d_grad = t(lambda: comp.add_color_gradient(bg_canvas, state.inner_mask),
               n=3)
    print(f"bg device dispatch: {d_bgd*1e3:8.1f} ms   canvas fetch: "
          f"{max(d_bgf, 0)*1e3:8.1f} ms   gradient(host): {d_grad*1e3:8.1f} ms")

    # accounting
    print("\n--- accounting (stream run, ms) ---")
    acc = {
        "matching dispatch": d_match * 1e3,
        "gan dispatch": d_gan * 1e3,
        "composite dispatch": d_comp * 1e3,
        "canvas fetch x12": d_fetch_all * 1e3,
        "png encode x12": d_png * 12 * 1e3,
        "records x24 (fetch+update)": d_rec * 24 * 1e3,
    }
    for k, v in acc.items():
        print(f"  {k:30s} {v:8.1f}")
    print(f"  {'SUM':30s} {sum(acc.values()):8.1f}")
    print(f"  {'measured stream total':30s} {d_stream*1e3:8.1f}")
    shutil.rmtree(out_root, ignore_errors=True)


if __name__ == "__main__":
    main()
