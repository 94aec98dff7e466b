"""Per-stage wall-clock breakdown of a warm ``colorize_stream`` run on the
live backend, via ``PipelineConfig.stage_trace`` (and the BG path after it).

Prints, per round: total wall, per-label time (sum over events), the
untraced main-thread remainder, and a merged timeline so overlap between the
main thread (dispatch/patch waits) and the PNG workers is visible.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_stream.py
Env: PROF_ROUNDS (default 3), PROF_PASSES (12), PROF_BG (1),
     PROF_THRESHOLD (mask_occupied_threshold; 0.885 = the bench's selective
     ~2-instance workload, default 0.5 = the all-18 stress workload)
"""
from __future__ import annotations

import dataclasses
import os
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

from sketchyscenecolorization_tpu.utils.compile_cache import (
    enable_persistent_compilation_cache)

enable_persistent_compilation_cache()

EXAMPLES = "/root/reference/examples"
IMAGE_ID = 9996
ROUNDS = int(os.environ.get("PROF_ROUNDS", "3"))
PASSES = int(os.environ.get("PROF_PASSES", "12"))
FG_TEXTS = [
    "the bus is yellow with gray windows", "the tree is green",
    "the grass is dark green", "the cloud is gray", "the bird is red",
    "the chicken is orange", "the rabbit is pink", "the sun is orange",
    "the bus is red", "the tree is yellow", "the bird is blue",
    "the sun is yellow",
]
BG_TEXTS = ["the sky is blue and the ground is green",
            "the sky is red and the ground is gray"]


def build():
    from sketchyscenecolorization_tpu.config import (FrameworkConfig,
                                                     PipelineConfig)
    from sketchyscenecolorization_tpu.pipeline.factory import build_session
    out = tempfile.mkdtemp(prefix="prof_stream_")
    cfg = dataclasses.replace(FrameworkConfig(), pipeline=PipelineConfig(
        data_base_dir=EXAMPLES, results_base_dir=out,
        match_vocab_path="", fg_vocab_path="", bg_vocab_path="",
        match_ckpt_dir="", fg_ckpt_dir="", bg_ckpt_dir="",
        async_png_writes=True, stage_trace=True,
        mask_occupied_threshold=float(
            os.environ.get("PROF_THRESHOLD", "0.5")),
        stream_segment_rows=int(os.environ.get("PROF_SEG", "112"))))
    return build_session(cfg, seed=0)


def report(events, wall, t_start):
    per = defaultdict(float)
    n = defaultdict(int)
    for label, a, b in events:
        key = label.split("[")[0]
        per[key] += b - a
        n[key] += 1
    print(f"  wall {wall*1e3:7.1f} ms  ({PASSES/wall:.2f} passes/s)")
    main_labels = [k for k in per if not k.startswith("png_")]
    for k in sorted(per, key=per.get, reverse=True):
        print(f"    {k:<16} {per[k]*1e3:7.1f} ms  x{n[k]}")
    main_sum = sum(per[k] for k in main_labels)
    print(f"    {'<untraced main>':<16} {(wall - main_sum)*1e3:7.1f} ms")
    # timeline (ms since round start)
    print("  timeline:")
    for label, a, b in events:
        print(f"    {(a - t_start)*1e3:8.1f} -> {(b - t_start)*1e3:8.1f}"
              f"  {label}")


def main():
    session = build()
    plan = [FG_TEXTS[i % len(FG_TEXTS)] for i in range(PASSES)]
    print("warming (compile)...", flush=True)
    session.colorize(IMAGE_ID, plan[0])
    session.flush()

    for r in range(ROUNDS):
        session.clear_trace()
        t0 = time.perf_counter()
        session.colorize_stream(IMAGE_ID, plan)
        session.flush()
        wall = time.perf_counter() - t0
        print(f"stream round {r}:", flush=True)
        report(session.trace_events, wall, t0)

    if os.environ.get("PROF_BG", "1") == "1":
        session.colorize(IMAGE_ID, BG_TEXTS[0])   # warm BG compile
        session.flush()
        for r in range(ROUNDS):
            session.clear_trace()
            t0 = time.perf_counter()
            for t in BG_TEXTS:
                session.colorize(IMAGE_ID, t)
            session.flush()
            wall = time.perf_counter() - t0
            print(f"bg round {r} ({len(BG_TEXTS)} passes):", flush=True)
            report(session.trace_events, wall, t0)
            print(f"  -> {len(BG_TEXTS)/wall:.2f} bg passes/s")


if __name__ == "__main__":
    main()
