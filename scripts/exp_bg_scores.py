"""Two measurements on the live TPU serving session:

1. BG GAN device-only time at 768^2 (chained digest) -- is the BG path's
   ~180 ms/pass wall near its device+tunnel floor?
2. The matching occupancy-score matrix for the bench's 12 FG texts on
   fixture 9996 -- do fresh-params scores spread enough that a higher
   ``mask_occupied_threshold`` yields realistic 1-3-instance matches?

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_bg_scores.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from sketchyscenecolorization_tpu.utils.compile_cache import (
    enable_persistent_compilation_cache)

enable_persistent_compilation_cache()

import bench  # noqa: E402  (repo root on path)


def fetch_latency():
    one = jnp.ones((), jnp.float32)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(one + 0)
        ts.append(time.perf_counter() - t0)
    return min(ts)


import tempfile

with tempfile.TemporaryDirectory() as td:
    session = bench.build_session(cache_visual=True, out_dir=td)

    # --- occupancy scores for the 12 bench texts
    state = session._state(bench.IMAGE_ID)
    words, lens = session.matching.encode_texts(bench.FG_TEXTS)
    scores = session.matching.score_instances(
        state.image_dev, words, lens, state.inst_masks_dev,
        state.areas_host, state.bin_drawing_dev,
        visual_dev=session.matching.extract_visual_dev(state.image_dev))
    np.set_printoptions(precision=3, suppress=True, linewidth=200)
    print("score matrix [12 texts x N_inst]:")
    print(scores)
    for th in (0.5, 0.7, 0.8, 0.9, 0.95, 0.98):
        counts = (scores > th).sum(axis=1)
        print(f"  threshold {th}: matches/pass = {counts.tolist()} "
              f"(avg {counts.mean():.2f})")

    # --- BG GAN device-only time, chained digest on the composited program
    eng = session.bg
    tokens = np.zeros((1, eng.cfg.max_len), np.int32)
    canvas = jnp.asarray(np.asarray(state.sketch, np.uint8))
    # the session's real device constants
    comp = state.get_compositor()
    inner_dev = comp._inner
    moved_dev = comp._moved
    drawings_dev = comp._drawings

    from sketchyscenecolorization_tpu.ops.conv import compute_dtype_scope
    from sketchyscenecolorization_tpu.train.bg_gan import build_models
    gen, _ = build_models(eng.cfg)

    @jax.jit
    def bg_digest(g_params, base_u8, inner_i32, moved_u8, drawings_b,
                  tokens, carry):
        # data-dependent select chains iteration i+1 on i's digest without
        # changing the canvas bytes (carry is always < 2^32-1 in practice,
        # but XLA cannot prove it)
        base = jnp.where(carry < jnp.uint32(0xFFFFFFFF), base_u8,
                         base_u8 ^ jnp.uint8(1))
        out = eng._composited_body(gen, g_params, base, inner_i32,
                                   moved_u8, drawings_b, tokens)
        return carry + jnp.sum(out.astype(jnp.uint32)) % jnp.uint32(97)

    zero = jnp.zeros((), jnp.uint32)
    t0 = time.perf_counter()
    int(bg_digest(eng.g_params, canvas, inner_dev, moved_dev, drawings_dev,
                  tokens, zero))
    print(f"bg compile+1st: {time.perf_counter() - t0:.1f}s", flush=True)
    lat = fetch_latency()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        carry = zero
        for _ in range(8):
            carry = bg_digest(eng.g_params, canvas, inner_dev, moved_dev,
                              drawings_dev, tokens, carry)
        int(carry)
        best = min(best, (time.perf_counter() - t0 - lat) / 8)
    print(f"BG composited-body device time: {best * 1e3:.1f} ms "
          f"(wall/pass today ~180 ms)")
