"""Sweep colorize_stream serving knobs on the live backend and report the
honest wall-clock passes/sec per config (median of PROF_ROUNDS rounds,
flush inside the window).  Used to pick PipelineConfig defaults; results
recorded in PARITY.md's serving tables.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/sweep_stream.py
Env: PROF_ROUNDS (3), PROF_PASSES (12), SWEEP_SEGMENTS ("112,0,56,18")
"""
from __future__ import annotations

import dataclasses
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

from sketchyscenecolorization_tpu.utils.compile_cache import (
    enable_persistent_compilation_cache)

enable_persistent_compilation_cache()

EXAMPLES = "/root/reference/examples"
IMAGE_ID = 9996
ROUNDS = int(os.environ.get("PROF_ROUNDS", "3"))
PASSES = int(os.environ.get("PROF_PASSES", "12"))
SEGMENTS = [int(s) for s in
            os.environ.get("SWEEP_SEGMENTS", "112,0,56,18").split(",")]
FG_TEXTS = [
    "the bus is yellow with gray windows", "the tree is green",
    "the grass is dark green", "the cloud is gray", "the bird is red",
    "the chicken is orange", "the rabbit is pink", "the sun is orange",
    "the bus is red", "the tree is yellow", "the bird is blue",
    "the sun is yellow",
]


def main():
    from sketchyscenecolorization_tpu.config import (FrameworkConfig,
                                                     PipelineConfig)
    from sketchyscenecolorization_tpu.pipeline.factory import build_session
    out = tempfile.mkdtemp(prefix="sweep_stream_")
    cfg = dataclasses.replace(FrameworkConfig(), pipeline=PipelineConfig(
        data_base_dir=EXAMPLES, results_base_dir=out,
        match_vocab_path="", fg_vocab_path="", bg_vocab_path="",
        match_ckpt_dir="", fg_ckpt_dir="", bg_ckpt_dir="",
        async_png_writes=True))
    base = build_session(cfg, seed=0)
    plan = [FG_TEXTS[i % len(FG_TEXTS)] for i in range(PASSES)]
    base.colorize(IMAGE_ID, plan[0])
    base.flush()

    results = {}
    for seg in SEGMENTS:
        session = base.clone(
            seed=0, results_base_dir=tempfile.mkdtemp(prefix="sweep_"),
            stream_segment_rows=seg)
        session.colorize_stream(IMAGE_ID, plan)      # warm (compiles)
        session.flush()
        rates = []
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            session.colorize_stream(IMAGE_ID, plan)
            session.flush()
            rates.append(PASSES / (time.perf_counter() - t0))
        results[seg] = rates
        print(f"segment_rows={seg:4d}: median "
              f"{statistics.median(rates):6.2f} passes/s  "
              f"(min {min(rates):.2f}, max {max(rates):.2f})", flush=True)

    best = max(results, key=lambda s: statistics.median(results[s]))
    print(f"BEST: segment_rows={best} "
          f"@ {statistics.median(results[best]):.2f} passes/s", flush=True)


if __name__ == "__main__":
    main()
