"""Per-stage wall breakdown of the device-gradient BG pass on the live
tunnel (reference flow `bg_utils.py:169-325`).  Run:
PYTHONPATH=/root/repo:/root/.axon_site python scripts/bg_stage_trace.py
"""
import dataclasses
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sketchyscenecolorization_tpu.utils.compile_cache import (
    enable_persistent_compilation_cache)
enable_persistent_compilation_cache()

from bench import BG_TEXTS, EXAMPLES, IMAGE_ID  # noqa: E402


def main():
    from sketchyscenecolorization_tpu.config import (
        FrameworkConfig, PipelineConfig)
    from sketchyscenecolorization_tpu.pipeline.factory import build_session
    out = tempfile.mkdtemp(prefix="bg_trace_")
    cfg = dataclasses.replace(FrameworkConfig(), pipeline=PipelineConfig(
        data_base_dir=EXAMPLES, results_base_dir=out,
        match_vocab_path="", fg_vocab_path="", bg_vocab_path="",
        match_ckpt_dir="", fg_ckpt_dir="", bg_ckpt_dir="",
        cache_visual_features=True, async_png_writes=True,
        stage_trace=True))
    s = build_session(cfg, seed=0)
    plan = [BG_TEXTS[i % len(BG_TEXTS)] for i in range(4)]
    for t in plan:          # warm
        s.colorize(IMAGE_ID, t)
    s.flush()
    for rnd in range(3):
        s.clear_trace()
        t0 = time.perf_counter()
        for t in plan:
            s.colorize(IMAGE_ID, t)
        s.flush()
        wall = time.perf_counter() - t0
        agg = {}
        for name, ts, te in s.trace_events:
            agg.setdefault(name, []).append((te - ts) * 1000)
        print(f"round {rnd}: {len(plan) / wall:.2f} passes/s "
              f"({wall * 1000 / len(plan):.0f} ms/pass)")
        for name, vals in agg.items():
            print(f"  {name:20s} n={len(vals)} sum={sum(vals):7.1f} ms "
                  f"mean={sum(vals) / len(vals):6.1f}")


if __name__ == "__main__":
    main()
