"""Interactive colorization session: the end-to-end instruction pipeline.

Reproduces ``sketchyscene_colorization_main.py:16-55`` and the
``Pipeline_utils`` orchestration on top of the jitted engines:

color (FG):  route -> RMI matching -> instance indices -> per-instance
             crop/resize/pad -> GAN forward -> un-resize -> paste via inner
             mask -> drawing overlay -> save + record.
color (BG):  route -> merge sky/ground text with history -> extract FG ->
             BG GAN at 768^2 -> paste FG back -> drawing overlay -> optional
             HSV sky gradient -> save + record.
withdraw:    delete the newest result image + truncate the record JSON.

Serving design (vs. the reference's fresh TF graph + session per stage per
command):

- the three compiled models live for the whole session;
- everything derivable from the *image fixtures alone* is computed once per
  image and cached (`_ImageState`): decoded sketch, inner mask, expanded
  instance masks, per-instance prepared GAN inputs, the shifted-drawing
  overlay, and the device-resident tensors for matching (mean-subtracted
  image, {0,1} drawing mask, packed instance masks) -- plus, optionally, the
  instruction-independent backbone features
  (``PipelineConfig.cache_visual_features``);
- per instruction only two device round-trips remain: instance *scores*
  ([N_inst] floats -- thresholding and occupancy run on device,
  ``engines.MatchingEngine.score_instances``) and the batched instance GAN
  forward (uint8);
- device->host bytes are minimized (the axon tunnel moves ~20 MB/s, so the
  768^2 canvas fetch at ~85 ms dominated serving): with
  ``PipelineConfig.compact_fetch`` each pass fetches only its changed pixels
  (the matched instances' inner-mask sets; the stroke overlay is a
  host-known constant) and the host canvas is reconstructed byte-exactly
  (``_reconstruct``);
- the latest result per image is kept in memory, so PNG encoding can be
  write-behind (``PipelineConfig.async_png_writes``) without changing any
  read-after-write behavior.

All of this is output-preserving: goldens and the record/withdraw state
machine match the sequential formulation (``tests/test_pipeline_serving.py``).
Exact equality caveat: the batched per-sample-BN GAN forward is equal to K
sequential batch-1 calls only up to XLA's batch-size-dependent float
reduction order, amplified by the generator's batch-stats BN stack.
Measured on fixture 9996 (18 instances, identical rows, bucket 32 vs 64):
<= 1 uint8 LSB on ~0.01% of values on XLA:CPU, <= 7 units on TPU v5e.
Same-bucket replays are bitwise deterministic on both platforms, and
matching scores, records and compositing are byte-identical always;
``colorize_stream`` vs sequential ``colorize`` differs exactly by this
caveat (buckets 32*ceil(K/32) vs per-pass) and nothing else --
characterized in ``tests/test_e2e_reference_examples.py``, PARITY.md
"Known deltas".

Memory is bounded for long-running serving: the per-image cache is LRU
(``PipelineConfig.max_cached_images``) and each image's prepared-instance
cache is capped (``max_cached_instance_inputs``) -- the reference tears every
graph down per command (``fg_matching_utils.py:29-38``) and so never
accumulates state; the cached redesign must not leak either.
"""
from __future__ import annotations

import atexit
import os
import threading
import time
from collections import OrderedDict
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

import jax.numpy as jnp

from ..config import FrameworkConfig
from ..data.fixtures import (
    get_pred_instance_mask, load_color_map, load_inner_mask, load_seg_data,
    load_sketch_image,
)
from ..data.records import fetch_records, update_records, withdraw_records
from ..text import judge_colorize_type, segment_user_input_text
from ..text.bg_text import DEFAULT_BG_TEXT, combine_bg_input_text
from . import compositing as comp
from .engines import BGColorizeEngine, FGColorizeEngine, MatchingEngine, PIXEL_MU
from .io import AsyncPngWriter, write_png


def _fixture_signature(paths: Dict[str, str]) -> Tuple[int, ...]:
    return tuple(os.stat(paths[k]).st_mtime_ns
                 for k in ("sketch", "seg_data", "inner_mask"))


class _LazyFetch:
    """Device uint8 image fetched to host on first use.  Device buffers are
    immutable, so the handle stays valid however many passes run before the
    fetch -- this is what lets the PNG writer pull the finished canvas off
    the critical path.  The fetch is cached and SHARED: the session passes
    the _LazyFetch itself to the write-behind worker (``__array__`` makes
    ``np.asarray`` transparent), so when the next pass needs the previous
    result on host (BG fg-debug extraction, FG reconstruction base) it
    reuses the bytes the PNG worker already pulled instead of fetching the
    768^2 canvas a second time over the ~20 MB/s tunnel."""
    __slots__ = ("dev", "_np", "_lock")

    def __init__(self, dev):
        self.dev = dev
        self._np = None
        self._lock = threading.Lock()

    def get(self) -> np.ndarray:
        if self._np is None:
            with self._lock:
                if self._np is None:
                    self._np = np.asarray(self.dev)
        return self._np

    def __array__(self, dtype=None, copy=None):   # np.asarray(_LazyFetch)
        arr = self.get()
        if dtype is not None and dtype != arr.dtype:
            return arr.astype(dtype)              # astype always copies
        # honor NumPy-2 copy semantics: the cached buffer is shared with
        # the PNG worker and next-pass host reads, so copy=True must not
        # hand the caller a mutable alias of it
        return arr.copy() if copy else arr


class _ImageState:
    """Everything about one image that does not depend on the instruction."""

    def __init__(self, paths: Dict[str, str], image_size: int,
                 max_instance_inputs: int = 0):
        self.max_instance_inputs = max_instance_inputs
        self.signature = _fixture_signature(paths)
        self.sketch = load_sketch_image(paths["sketch"], dtype=np.uint8,
                                        size=image_size)
        self.inner_mask = load_inner_mask(paths["inner_mask"])
        self.categories46 = load_color_map(paths["color_map"])
        self.pred_masks, self.pred_class_ids, self.pred_boxes = \
            load_seg_data(paths["seg_data"], size=image_size)
        self.grass_indices = [i for i, c in enumerate(self.pred_class_ids)
                              if c == comp.GRASS_LABEL]
        # overlay inputs depend only on the sketch + grass layout
        self.no_grass = comp.grass_free_inner_mask(self.inner_mask,
                                                   self.grass_indices)
        self.moved, self.drawings_region = comp.shifted_drawings(
            self.sketch, self.no_grass)

        # device-resident matching inputs
        image = self.sketch.astype(np.float32) - PIXEL_MU
        self.image_dev = jnp.asarray(image[None])
        self.bin_drawing_dev = jnp.asarray(
            MatchingEngine.binarize_drawing(self.sketch).astype(np.float32))
        n = len(self.pred_class_ids)
        self.inst_masks_dev = jnp.asarray(
            self.pred_masks.reshape(n, -1).astype(np.float32))
        # per-instance pixel counts stay on HOST: the occupancy division runs
        # in float64 there, exactly like the reference's NumPy path
        self.areas_host = self.pred_masks.reshape(n, -1).sum(axis=1) \
            .astype(np.float64)
        self.visual_dev = None                  # lazily-cached backbone feats
        # text -> [N_inst] float64 occupancy scores (pre-threshold): a pure
        # function of (fixtures, engine params, text), so repeat instructions
        # skip the matching dispatch (PipelineConfig.cache_match_scores)
        self.match_scores: "OrderedDict[str, np.ndarray]" = OrderedDict()
        self.instance_inputs: "OrderedDict[int, np.ndarray]" = OrderedDict()
        self.instance_rows_dev: "OrderedDict[int, Any]" = OrderedDict()
        self.last_result: Optional[Tuple[str, np.ndarray]] = None  # (name, img)
        # device-compositing state (pipeline/device_compositing.py): the
        # canvas mirror of last_result and the per-image compiled programs
        self.last_result_dev = None             # (name, device uint8 canvas)
        self.compositor = None                  # lazily-built DeviceCompositor
        self._overlay_flat = None               # (flat idx, uint8 values)

    def overlay_flat(self):
        """(flat pixel indices, uint8 values) of the stroke overlay -- the
        constant host half of compact-fetch reconstruction."""
        if self._overlay_flat is None:
            idx = np.flatnonzero(self.drawings_region)
            self._overlay_flat = (idx, self.moved.reshape(-1, 3)[idx])
        return self._overlay_flat

    def get_compositor(self):
        if self.compositor is None:
            from .device_compositing import DeviceCompositor
            self.compositor = DeviceCompositor(
                self.inner_mask, self.moved, self.drawings_region,
                self.pred_boxes, self.pred_class_ids)
        return self.compositor

    def prepared_instance(self, inst_idx: int, instance_size: int) -> np.ndarray:
        """[-1,1] float32 GAN input for one instance (crop -> white-bg mask
        image -> resize+pad -> road/grass special cases;
        ``fg_color_utils.py:282-311``).  Pure function of the fixtures, so
        cached per instance (LRU, capped at ``max_instance_inputs``)."""
        if inst_idx in self.instance_inputs:
            self.instance_inputs.move_to_end(inst_idx)
            return self.instance_inputs[inst_idx]
        class_id46 = int(self.pred_class_ids[inst_idx])
        y1, x1, y2, x2 = (int(b) for b in self.pred_boxes[inst_idx])
        inst_mask = self.pred_masks[inst_idx][y1:y2, x1:x2]
        mask_img = np.full((inst_mask.shape[0], inst_mask.shape[1], 3),
                           255, dtype=np.uint8)
        mask_img[inst_mask == 1] = [0, 0, 0]
        pil = Image.fromarray(mask_img, "RGB")
        if pil.width != instance_size or pil.height != instance_size:
            margin = 0 if class_id46 == comp.ROAD_LABEL else 10
            instance_sketch = comp.resize_and_padding_mask_image(
                pil, instance_size, margin_size=margin)
        else:
            instance_sketch = np.array(pil, dtype=np.uint8)

        if class_id46 == comp.ROAD_LABEL:
            if not comp.is_road_not_single_line(instance_sketch.copy()):
                raise ValueError("Road is single line")
        if class_id46 == comp.GRASS_LABEL:
            instance_sketch = comp.thicken_drawings(instance_sketch)

        x = instance_sketch.astype(np.float32) / 255.0 * 2.0 - 1.0
        self.instance_inputs[inst_idx] = x
        while 0 < self.max_instance_inputs < len(self.instance_inputs):
            self.instance_inputs.popitem(last=False)
        return x

    def prepared_instance_dev(self, inst_idx: int, instance_size: int):
        """Device-resident mirror of ``prepared_instance`` (same values,
        same road/grass error semantics).  Repeat passes over an instance
        feed the GAN straight from HBM -- no per-pass 442 KB row upload."""
        if inst_idx in self.instance_rows_dev:
            self.instance_rows_dev.move_to_end(inst_idx)
            return self.instance_rows_dev[inst_idx]
        dev = jnp.asarray(self.prepared_instance(inst_idx, instance_size))
        self.instance_rows_dev[inst_idx] = dev
        while 0 < self.max_instance_inputs < len(self.instance_rows_dev):
            self.instance_rows_dev.popitem(last=False)
        return dev


class ColorizationSession:
    """Holds the three engines plus per-image cached state."""

    def __init__(self, cfg: FrameworkConfig, matching: MatchingEngine,
                 fg: FGColorizeEngine, bg: BGColorizeEngine):
        self.cfg = cfg
        self.matching = matching
        self.fg = fg
        self.bg = bg
        self._images: "OrderedDict[str, _ImageState]" = OrderedDict()
        # opt-in per-stage wall-clock tracing (PipelineConfig.stage_trace):
        # the writer threads append into the same list (list.append is
        # atomic under the GIL), so one timeline covers both sides
        self._tr: Optional[list] = [] if cfg.pipeline.stage_trace else None
        self._writer = AsyncPngWriter(trace=self._tr) \
            if cfg.pipeline.async_png_writes else None
        if self._writer is not None:
            # a process exit must never strand queued write-behind PNGs after
            # their records have committed (records point at missing files)
            atexit.register(self.close)
        if (cfg.pipeline.color_gradient
                and cfg.pipeline.image_size ** 2 // 2 >= comp._LUT_MIN_PIXELS):
            # the sky gradient will run at LUT scale: build the 24-bit
            # round-trip table off the critical path now
            comp.prewarm_roundtrip_lut()

    # ---------------------------------------------------------------- paths
    def _paths(self, image_id) -> Dict[str, str]:
        base = self.cfg.pipeline.data_base_dir
        return {
            "sketch": os.path.join(base, "sketches", f"{image_id}.png"),
            "seg_data": os.path.join(base, "seg_data", f"{image_id}_datas.npz"),
            "inner_mask": os.path.join(base, "inner_masks", f"{image_id}.mat"),
            "color_map": os.path.join(base, "colorMapC46.mat"),
        }

    def _results_dir(self, image_id) -> str:
        d = os.path.join(self.cfg.pipeline.results_base_dir, "results",
                         str(image_id))
        os.makedirs(d, exist_ok=True)
        return d

    def _state(self, image_id) -> _ImageState:
        key = str(image_id)
        paths = self._paths(image_id)
        cached = self._images.get(key)
        if cached is not None and cached.signature == _fixture_signature(paths):
            self._images.move_to_end(key)
            return cached
        last = cached.last_result if cached is not None else None
        state = _ImageState(paths, self.cfg.pipeline.image_size,
                            self.cfg.pipeline.max_cached_instance_inputs)
        state.last_result = last        # result history survives fixture edits
        self._images[key] = state
        self._images.move_to_end(key)
        max_images = self.cfg.pipeline.max_cached_images
        while 0 < max_images < len(self._images):
            self._images.popitem(last=False)   # LRU-evict (device tensors too)
        return state

    def _save_result(self, path: str, image, copy: bool = True) -> None:
        """image: uint8 ndarray or ``_LazyFetch`` (device canvas -- with the
        write-behind writer, the device->host fetch AND the encode both run
        in the worker, overlapping the next pass's device work).
        ``copy=False`` skips the enqueue-time defensive copy for arrays the
        session guarantees it never mutates (compact-fetch reconstructions)."""
        level = self.cfg.pipeline.png_compress_level
        if isinstance(image, _LazyFetch):
            if self._writer is not None:
                # pass the lazy itself: the worker's np.asarray goes through
                # __array__, so the fetch lands in the shared cache and the
                # next pass's host read of this result costs nothing
                self._writer.save(path, image, level)
            else:
                write_png(path, image.get(), level)
        elif self._writer is not None:
            self._writer.save(path, image, level, copy=copy)
        else:
            write_png(path, image, level)

    def _load_base(self, state: _ImageState, results_dir: str,
                   last_name: str) -> np.ndarray:
        """Latest result (memory first, disk fallback), or the raw sketch."""
        if last_name == "":
            return state.sketch.copy()
        if state.last_result is not None and state.last_result[0] == last_name:
            img = state.last_result[1]
            if isinstance(img, _LazyFetch):
                img = img.get()
            return img.copy()
        if self._writer is not None:
            self._writer.flush()
        return np.array(Image.open(
            os.path.join(results_dir, last_name)).convert("RGB"),
            dtype=np.uint8)

    def _canvas_dev(self, state: _ImageState, results_dir: str,
                    last_name: str):
        """Device-resident base canvas: reuse the cached device copy when it
        mirrors ``last_name`` (the common sequential case -- zero host copy,
        zero upload), else load + upload the host base."""
        if state.last_result_dev is not None \
                and state.last_result_dev[0] == last_name:
            return state.last_result_dev[1]
        t0 = time.perf_counter()
        dev = jnp.asarray(self._load_base(state, results_dir, last_name))
        self._tt("canvas_upload", t0)
        return dev

    @staticmethod
    def _reconstruct(state: _ImageState, prev: np.ndarray,
                     patch_np: np.ndarray, inst_indices: Sequence[int],
                     offset: int, apply_overlay: bool = True
                     ) -> Tuple[np.ndarray, int]:
        """Rebuild one pass's canvas from the previous canvas + the compact
        changed-pixel patch (``DeviceCompositor.composite_run_compact``).
        Exact by construction: the device pass touches only the instances'
        ``inner_mask`` pixels (patched here with post-overlay values) and the
        stroke-overlay pixels (a host-known constant, applied first so a
        pixel in both sets takes the patch's -- i.e. the device's -- value
        ... which is the same overlay value).  The overlay is idempotent, so
        callers pass ``apply_overlay=False`` when ``prev`` is itself a saved
        result (every FG/BG result ends with the overlay; only the raw
        sketch lacks it).  Returns (canvas, new offset)."""
        new = prev.copy()
        flat = new.reshape(-1, 3)
        if apply_overlay:
            ov_idx, ov_val = state.overlay_flat()
            flat[ov_idx] = ov_val
        comp_dev = state.get_compositor()
        for inst_idx in inst_indices:
            idx = comp_dev.host_idx(inst_idx)
            flat[idx] = patch_np[offset: offset + len(idx)]
            offset += len(idx)
        return new, offset

    # ------------------------------------------------------------- tracing
    def _tt(self, label: str, t0: float) -> None:
        """Record one stage event [t0, now) when ``stage_trace`` is on."""
        if self._tr is not None:
            self._tr.append((label, t0, time.perf_counter()))

    @property
    def trace_events(self) -> List[Tuple[str, float, float]]:
        """(label, t_start, t_end) ``time.perf_counter`` events, in append
        order, main thread and PNG workers interleaved.  Empty unless
        ``PipelineConfig.stage_trace``."""
        return list(self._tr or ())

    def clear_trace(self) -> None:
        # drain the write-behind queue first: in-flight PNG jobs append
        # events to the same list from worker threads, and an event landing
        # after the truncation would mix measurement windows
        if self._tr is not None:
            self.flush()
            del self._tr[:]

    def flush(self) -> None:
        """Block until all write-behind PNGs are on disk."""
        if self._writer is not None:
            self._writer.flush()

    def close(self) -> None:
        """Drain the write-behind queue; idempotent (also runs atexit)."""
        self.flush()

    def clone(self, seed: int = 0, **pipeline_overrides) -> "ColorizationSession":
        """A session sharing this one's engines (params + COMPILED
        executables) with its own per-image cache, PNG writer, and FG noise
        stream.  With the build seed and unchanged model configs this is
        output-identical to ``build_session(new_cfg, seed)`` minus the
        compile cost.  ``pipeline_overrides`` replace ``cfg.pipeline`` fields
        only; ``score_thresh`` and ``serve_gan_data_parallel`` are baked
        into the engines at build time and cannot be overridden here."""
        import dataclasses
        assert "score_thresh" not in pipeline_overrides
        assert "serve_gan_data_parallel" not in pipeline_overrides
        cfg = dataclasses.replace(
            self.cfg,
            pipeline=dataclasses.replace(self.cfg.pipeline,
                                         **pipeline_overrides))
        return ColorizationSession(cfg, self.matching, self.fg.fork(seed),
                                   self.bg)

    # ----------------------------------------------------------------- API
    def colorize(self, image_id, input_text: str) -> str:
        """One 'color' command; returns the path of the new result image."""
        assert input_text
        colorization_type = judge_colorize_type(input_text)
        new_name, last_name, last_bg_text, summary = fetch_records(
            image_id, self.cfg.pipeline.results_base_dir)

        if colorization_type == "FG":
            inst_indices = self.match_instances(image_id, input_text)
            out_path = self.colorize_foreground(
                image_id, input_text, inst_indices, new_name, last_name)
            proc_bg_text = last_bg_text
        else:
            out_path, proc_bg_text = self.colorize_background(
                image_id, input_text, new_name, last_name, last_bg_text)

        update_records(image_id, input_text, self.cfg.pipeline.results_base_dir,
                       colorization_type, new_name, proc_bg_text, summary)
        return out_path

    def colorize_stream(self, image_id, input_texts: Sequence[str]) -> List[str]:
        """Ordered batch serving: M queued instructions with the same
        outputs, records and error behavior as M sequential ``colorize``
        calls (``tests/test_pipeline_serving.py`` asserts equality).

        Consecutive FG instructions share ONE matching forward (the
        instruction axis batches bit-equally through ``rmi.apply_fused``),
        ONE instance-GAN forward (per-sample BN keeps rows independent) and,
        with device compositing on, ONE compositing dispatch chaining every
        pass's canvas (``DeviceCompositor.composite_run``) -- the
        TPU-idiomatic request-batching deployment; device round-trips per
        FG run drop from 3M (sequential) to 3."""
        texts = list(input_texts)
        if self.cfg.pipeline.cache_match_scores and \
                self.cfg.pipeline.max_cached_match_texts != 0:
            # matching scores depend only on the fixtures + params + text
            # (never on the canvas), so EVERY queued FG instruction can be
            # scored in one up-front dispatch; later runs (even after
            # interleaved BG passes) serve their matches from the LRU --
            # M matching dispatches per mixed stream become 1
            fg_texts = [t for t in texts if judge_colorize_type(t) == "FG"]
            if fg_texts:
                self._match_many(self._state(image_id), fg_texts)
        out: List[str] = []
        i = 0
        while i < len(texts):
            if judge_colorize_type(texts[i]) == "FG":
                j = i
                while j < len(texts) and judge_colorize_type(texts[j]) == "FG":
                    j += 1
                out.extend(self._colorize_fg_run(image_id, texts[i:j]))
                i = j
            else:
                out.append(self.colorize(image_id, texts[i]))
                i += 1
        return out

    def _colorize_fg_run(self, image_id, run_texts: Sequence[str]) -> List[str]:
        state = self._state(image_id)
        instance_size = self.cfg.pipeline.instance_size
        t0 = time.perf_counter()
        matched = self._match_many(state, run_texts)
        self._tt("match", t0)

        # validate + prepare per pass in order; the first failing pass stops
        # the run (earlier passes still commit, like sequential execution)
        device_comp = self.cfg.pipeline.device_compositing
        error: Optional[BaseException] = None
        n_ok = len(run_texts)
        t0 = time.perf_counter()
        rows, row_class_ids, row_tokens, plans = [], [], [], []
        for p, text in enumerate(run_texts):
            inst_color_text = segment_user_input_text(text)
            toks = self.fg.encode(inst_color_text)
            pass_rows = []
            try:
                for inst_idx in matched[p]:
                    class_id46 = int(state.pred_class_ids[inst_idx])
                    if class_id46 not in comp.SKE_ID_TO_CAT_ID:
                        raise ValueError(
                            "Wrong matching instance: "
                            f"{state.categories46[class_id46]}")
                    pass_rows.append(
                        state.prepared_instance_dev(inst_idx, instance_size)
                        if device_comp else
                        state.prepared_instance(inst_idx, instance_size))
            except ValueError as e:
                error = e
                n_ok = p
                break
            for inst_idx, row in zip(matched[p], pass_rows):
                rows.append(row)
                row_class_ids.append(
                    comp.SKE_ID_TO_CAT_ID[int(state.pred_class_ids[inst_idx])])
                row_tokens.append(toks)
            plans.append((text, matched[p]))
        self._tt("prep_rows", t0)

        results_dir = self._results_dir(image_id)
        compact = self.cfg.pipeline.compact_fetch
        generated_u8 = canvases = None
        final_canvas = patch_list = prev_host = None
        if device_comp and plans[:n_ok]:
            # the ENTIRE run's device work in 1+S dispatches (matching, then
            # GAN + compositing per segment); the canvas chains through the
            # passes exactly as the host loop
            zero_gen = None
            if not rows:                # all passes matched nothing: the
                s = self.cfg.pipeline.instance_size   # program ignores gen
                zero_gen = jnp.zeros((1, s, s, 3), jnp.uint8)
            _, last0, _, _ = fetch_records(
                image_id, self.cfg.pipeline.results_base_dir)
            base = self._canvas_dev(state, results_dir, last0)
            compositor = state.get_compositor()
            pass_rows = [len(inst) for _, inst in plans[:n_ok]]
            if compact:
                # per-pass changed-pixel fetches (~10-20 MB/s tunnel: this
                # is the difference between fetching M full canvases and a
                # few hundred KB).  The run is split into segments of
                # ~stream_segment_rows instance rows; async host copies
                # start per segment, so an earlier segment's transfers
                # overlap the NEXT segment's GAN compute (and host
                # reconstruction overlaps both).  The noise chain is
                # bit-identical however the run is segmented: the jitted
                # prepare continues the rng row by row.
                seg_rows = self.cfg.pipeline.stream_segment_rows
                small = self.cfg.pipeline.stream_small_segment_rows
                if small > 0 and sum(pass_rows) <= 96:
                    # small runs segment finer: buckets stay <= 16, clear of
                    # the 32/64 in-context bucket pathology (config comment)
                    seg_rows = small
                bounds, acc, start = [], 0, 0
                for m, r in enumerate(pass_rows):
                    acc += r
                    if seg_rows > 0 and acc >= seg_rows \
                            and m + 1 < len(pass_rows):
                        bounds.append((start, m + 1))
                        start, acc = m + 1, 0
                bounds.append((start, len(pass_rows)))

                canvas = base
                patch_list = []
                row_start = 0
                fused = self.cfg.pipeline.fused_gan_compositing
                for s0, s1 in bounds:
                    n_seg = sum(pass_rows[s0:s1])
                    seg_passes, off = [], 0
                    for m in range(s0, s1):
                        seg_passes.append((tuple(plans[m][1]), off))
                        off += pass_rows[m]
                    if n_seg and fused and n_seg <= self.fg.MAX_GAN_ROWS:
                        # one dispatch: GAN input build + forward +
                        # compositing + patch gather as a single program
                        t0 = time.perf_counter()
                        canvas, plist = \
                            compositor.composite_run_compact_fused(
                                self.fg, canvas,
                                rows[row_start: row_start + n_seg],
                                row_class_ids[row_start:
                                              row_start + n_seg],
                                row_tokens[row_start: row_start + n_seg],
                                seg_passes)
                        self._tt(f"fused_dispatch[{n_seg}]", t0)
                    else:
                        t0 = time.perf_counter()
                        if n_seg:
                            seg_gen, _ = self.fg.colorize_rows_dev(
                                rows[row_start: row_start + n_seg],
                                row_class_ids[row_start: row_start + n_seg],
                                np.asarray(
                                    row_tokens[row_start:
                                               row_start + n_seg],
                                    np.int32))
                        else:
                            s = self.cfg.pipeline.instance_size
                            seg_gen = jnp.zeros((1, s, s, 3), jnp.uint8)
                        self._tt(f"gan_dispatch[{n_seg}]", t0)
                        t0 = time.perf_counter()
                        canvas, plist = compositor.composite_run_compact(
                            canvas, seg_gen, seg_passes)
                        self._tt("comp_dispatch", t0)
                    for p in plist:
                        p.copy_to_host_async()
                    patch_list.extend(plist)
                    row_start += n_seg
                final_canvas = canvas
                prev_host = self._load_base(state, results_dir, last0)
            else:
                gen_dev = zero_gen
                if rows:
                    gen_dev, _ = self.fg.colorize_rows_dev(
                        rows, row_class_ids,
                        np.asarray(row_tokens, np.int32))
                passes, off = [], 0
                for _, inst in plans[:n_ok]:
                    passes.append((tuple(inst), off))
                    off += len(inst)
                canvases = compositor.composite_run(base, gen_dev, passes)
        elif rows:
            generated_u8 = self.fg.colorize_rows(
                np.stack(rows), row_class_ids,
                np.asarray(row_tokens, np.int32))

        out_paths: List[str] = []
        row = 0
        for m, (text, inst_indices) in enumerate(plans[:n_ok]):
            new_name, last_name, last_bg_text, summary = fetch_records(
                image_id, self.cfg.pipeline.results_base_dir)
            if patch_list is not None:
                t0 = time.perf_counter()
                patch_np = np.asarray(patch_list[m])
                self._tt("patch_wait", t0)
                t0 = time.perf_counter()
                new_result, _ = self._reconstruct(
                    state, prev_host, patch_np,
                    inst_indices, 0,
                    apply_overlay=(m == 0 and last_name == ""))
                self._tt("reconstruct", t0)
                prev_host = new_result
                if m == n_ok - 1:
                    state.last_result_dev = (new_name, final_canvas)
            elif canvases is not None:
                new_result = _LazyFetch(canvases[m])
                state.last_result_dev = (new_name, canvases[m])
            else:
                new_result = self._load_base(state, results_dir, last_name)
                for inst_idx in inst_indices:
                    class_id46 = int(state.pred_class_ids[inst_idx])
                    bbox = state.pred_boxes[inst_idx]
                    color_instance = comp.instance_result_postprocessing_u8(
                        generated_u8[row], bbox, class_id46)
                    comp.paste_instance(new_result, color_instance,
                                        state.inner_mask, inst_idx, bbox)
                    row += 1
                new_result[state.drawings_region] = \
                    state.moved[state.drawings_region]
            out_path = os.path.join(results_dir, new_name)
            t0 = time.perf_counter()
            self._save_result(out_path, new_result,
                              copy=patch_list is None)
            state.last_result = (new_name, new_result)
            update_records(image_id, text,
                           self.cfg.pipeline.results_base_dir, "FG",
                           new_name, last_bg_text, summary)
            self._tt("save+records", t0)
            out_paths.append(out_path)
        if error is not None:
            raise error
        return out_paths

    def withdraw(self, image_id) -> None:
        self.flush()
        withdraw_records(image_id, self.cfg.pipeline.results_base_dir)
        key = str(image_id)
        if key in self._images:
            self._images[key].last_result = None   # force a disk re-read
            self._images[key].last_result_dev = None

    # ------------------------------------------------------------- matching
    def match_instances(self, image_id, input_text: str) -> List[int]:
        """``build_instance_matching`` (``fg_matching_utils.py:14-77``) with
        the threshold + occupancy chain on device (scores fetched, not the
        mask -- bit-equal to the host path, see ``engines.score_instances``)."""
        return self._match_many(self._state(image_id), [input_text])[0]

    def _match_many(self, state: _ImageState,
                    input_texts: Sequence[str]) -> List[List[int]]:
        """Matched instance indices for M instructions in ONE device call
        (``rmi.apply_fused`` is batch-independent, so this is bit-equal to M
        single calls -- ``test_pipeline.test_predict_masks_batched...``).

        With ``cache_match_scores``, per-text score vectors are served from
        the image's LRU (scores are a pure function of fixtures + engine
        params + text); only uncached texts dispatch, padded to a pow2 text
        bucket (pad rows repeat row 0 -- batch independence makes them
        inert) so the jit cache stays bounded."""
        pl = self.cfg.pipeline
        use_cache = pl.cache_match_scores and pl.max_cached_match_texts != 0
        texts = list(input_texts)
        todo = ([t for t in dict.fromkeys(texts)
                 if t not in state.match_scores] if use_cache else texts)
        if todo:
            if pl.cache_visual_features and state.visual_dev is None:
                state.visual_dev = self.matching.extract_visual_dev(
                    state.image_dev)
            words, lens = self.matching.encode_texts(todo)
            # pad to a pow2 text bucket (cache on or off: batch independence
            # makes the repeated pad rows inert and the jit cache bounded)
            bucket = 1
            while bucket < len(todo):
                bucket *= 2
            pad = bucket - len(todo)
            if pad:
                words = np.concatenate(
                    [words, np.repeat(words[:1], pad, axis=0)])
                lens = np.concatenate(
                    [lens, np.repeat(lens[:1], pad, axis=0)])
            scores = self.matching.score_instances(
                state.image_dev, words, lens, state.inst_masks_dev,
                state.areas_host, state.bin_drawing_dev,
                visual_dev=state.visual_dev)[:len(todo)]    # [M', N_inst]
            if not use_cache:
                keep = scores > pl.mask_occupied_threshold
                return [[int(i) for i in np.nonzero(row)[0]] for row in keep]
            for t, row in zip(todo, scores):
                state.match_scores[t] = row
            while 0 < pl.max_cached_match_texts < len(state.match_scores):
                state.match_scores.popitem(last=False)
        out = []
        fresh = dict(zip(todo, scores)) if todo else {}
        for t in texts:
            if t in state.match_scores:
                state.match_scores.move_to_end(t)
                row = state.match_scores[t]
            else:                       # evicted within this very call (an
                row = fresh[t]          # M > max_cached_match_texts batch)
            keep = row > pl.mask_occupied_threshold
            out.append([int(i) for i in np.nonzero(keep)[0]])
        return out

    def match_instances_host(self, image_id, input_text: str) -> List[int]:
        """Host-side reference path (full mask fetch +
        ``get_pred_instance_mask``); kept for parity testing."""
        paths = self._paths(image_id)
        state = self._state(image_id)
        predicts = self.matching.predict_mask(state.sketch, input_text)
        _, _, _, _, matched = get_pred_instance_mask(
            paths["seg_data"], predicts.copy(),
            self.cfg.pipeline.mask_occupied_threshold)
        return matched

    # ------------------------------------------------------------------ FG
    def colorize_foreground(self, image_id, input_text: str,
                            inst_indices: Sequence[int], new_name: str,
                            last_name: str) -> str:
        """``build_instance_colorization`` (``fg_color_utils.py:188-363``)."""
        assert isinstance(inst_indices, list)
        state = self._state(image_id)
        instance_size = self.cfg.pipeline.instance_size
        results_dir = self._results_dir(image_id)

        inst_color_text = segment_user_input_text(input_text)

        # validity + prepared inputs (cached per instance; raises exactly as
        # the per-instance loop would -- nothing is written on error)
        device_comp = self.cfg.pipeline.device_compositing
        batch, class_ids25 = [], []
        for inst_idx in inst_indices:
            class_id46 = int(state.pred_class_ids[inst_idx])
            if class_id46 not in comp.SKE_ID_TO_CAT_ID:
                raise ValueError(
                    f"Wrong matching instance: {state.categories46[class_id46]}")
            batch.append(state.prepared_instance_dev(inst_idx, instance_size)
                         if device_comp else
                         state.prepared_instance(inst_idx, instance_size))
            class_ids25.append(comp.SKE_ID_TO_CAT_ID[class_id46])

        if batch and device_comp:
            # one GAN dispatch + one compositing dispatch (ONE fused
            # dispatch under ``fused_gan_compositing``); the canvas stays
            # device-resident between passes (byte-equal to the host chain
            # below -- tested in tests/test_pipeline_serving.py)
            toks = self.fg.encode(inst_color_text)
            tokens_rows = np.broadcast_to(
                np.asarray(toks, np.int32)[None], (len(batch), len(toks)))
            canvas = self._canvas_dev(state, results_dir, last_name)
            compositor = state.get_compositor()
            fused = (self.cfg.pipeline.fused_gan_compositing
                     and self.cfg.pipeline.compact_fetch
                     and len(batch) <= self.fg.MAX_GAN_ROWS)
            if not fused:
                gen_dev, _ = self.fg.colorize_rows_dev(
                    batch, class_ids25, tokens_rows)
            if self.cfg.pipeline.compact_fetch:
                # fetch only this pass's changed pixels; rebuild on host
                if fused:
                    canvas, patches_dev = \
                        compositor.composite_run_compact_fused(
                            self.fg, canvas, batch, class_ids25,
                            tokens_rows, [(tuple(inst_indices), 0)])
                else:
                    canvas, patches_dev = compositor.composite_run_compact(
                        canvas, gen_dev, [(tuple(inst_indices), 0)])
                new_result, _ = self._reconstruct(
                    state, self._load_base(state, results_dir, last_name),
                    np.asarray(patches_dev[0]), inst_indices, 0,
                    apply_overlay=(last_name == ""))
            else:
                canvas = compositor.composite(canvas, gen_dev,
                                              list(inst_indices))
                new_result = _LazyFetch(canvas)
            state.last_result_dev = (new_name, canvas)
        else:
            new_result = self._load_base(state, results_dir, last_name)
            if batch:
                generated_u8 = self.fg.colorize_batch(
                    np.stack(batch), class_ids25, inst_color_text)
                for k, inst_idx in enumerate(inst_indices):
                    class_id46 = int(state.pred_class_ids[inst_idx])
                    bbox = state.pred_boxes[inst_idx]
                    color_instance = comp.instance_result_postprocessing_u8(
                        generated_u8[k], bbox, class_id46)
                    comp.paste_instance(new_result, color_instance,
                                        state.inner_mask, inst_idx, bbox)
            new_result[state.drawings_region] = \
                state.moved[state.drawings_region]

        out_path = os.path.join(results_dir, new_name)
        self._save_result(
            out_path, new_result,
            copy=not (batch and device_comp
                      and self.cfg.pipeline.compact_fetch))
        state.last_result = (new_name, new_result)
        return out_path

    # ------------------------------------------------------------------ BG
    def colorize_background(self, image_id, input_text: str, new_name: str,
                            last_name: str, last_bg_text: str
                            ) -> Tuple[str, str]:
        """``build_background_colorization`` (``bg_utils.py:169-325``)."""
        state = self._state(image_id)
        results_dir = self._results_dir(image_id)

        if last_name == "":
            assert last_bg_text == ""
            last_bg_text = DEFAULT_BG_TEXT
        proc_text = combine_bg_input_text(input_text, last_bg_text)

        pl = self.cfg.pipeline
        device_grad = (pl.device_compositing and pl.color_gradient
                       and pl.device_color_gradient
                       and pl.image_size ** 2 // 2 >= comp._LUT_MIN_PIXELS
                       and bool((state.inner_mask[
                           comp.SKY_SEARCH_FROM:
                           comp.SKY_SEARCH_FROM + comp.SKY_SEARCH_HEIGHT]
                           == 0).any()))
        # (band fully FG -> host path so the reference's np.argmax([])
        #  ValueError reproduces, compositing.py:300-315)
        if device_grad:
            return self._colorize_background_device_grad(
                image_id, state, results_dir, proc_text,
                new_name, last_name)

        previous = state.sketch.copy() if last_name == "" \
            else self._load_base(state, results_dir, last_name)
        inner_mask = state.inner_mask
        moved, drawings_region = state.moved, state.drawings_region
        if pl.device_compositing:
            # one dispatch: FG extract + GAN + paste-back + overlay on the
            # device-resident canvas (no 768^2 host->device upload); ONE
            # canvas fetch remains -- under the host gradient the sky math
            # is data-dependent whole-image host work (the device gradient
            # above removes it from the critical path)
            compositor = state.get_compositor()
            base = self._canvas_dev(state, results_dir, last_name)
            t0 = time.perf_counter()
            bg_dev = self.bg.colorize_composited(
                base, compositor._inner, compositor._moved,
                compositor._drawings, proc_text)
            self._tt("bg_dispatch", t0)
            t0 = time.perf_counter()
            background = np.asarray(bg_dev)
            self._tt("bg_canvas_fetch", t0)
            # fg debug image from host-known state (no extra fetch)
            fg_image_temp = comp.extract_foreground(previous, inner_mask)
            if not self.cfg.pipeline.color_gradient:
                state.last_result_dev = (new_name, bg_dev)
            else:
                state.last_result_dev = None   # gradient happens on host
        else:
            fg_image = comp.extract_foreground(previous, inner_mask)
            fg_image_temp = fg_image.copy()
            background, _ = self.bg.colorize(fg_image, proc_text,
                                             want_region=False)
            # paste FG back, overlay drawings (skipping grass)
            # (``bg_utils.py:290-310``)
            background[inner_mask != 0] = fg_image[inner_mask != 0]
            background[drawings_region] = moved[drawings_region]
            state.last_result_dev = None

        # save the fg debug image like the reference does (bg_utils.py:290)
        fg_image_temp[drawings_region] = moved[drawings_region]
        self._save_result(os.path.join(results_dir, f"{image_id}_fg.png"),
                          fg_image_temp)

        if self.cfg.pipeline.color_gradient:
            t0 = time.perf_counter()
            background = comp.add_color_gradient(background, inner_mask)
            background[drawings_region] = moved[drawings_region]
            self._tt("bg_gradient", t0)

        out_path = os.path.join(results_dir, new_name)
        t0 = time.perf_counter()
        self._save_result(out_path, background)
        state.last_result = (new_name, background)
        self._tt("bg_save", t0)
        return out_path, proc_text

    def _colorize_background_device_grad(
            self, image_id, state: _ImageState, results_dir: str,
            proc_text: str, new_name: str,
            last_name: str) -> Tuple[str, str]:
        """BG pass with the sky gradient on device (``bg_utils.py:96-166``
        split for float64 exactness): D1 = GAN + paste + overlay + sky
        detection + whole-image LUT round-trip (one dispatch); the host
        fetches only the top rows of the FG-whitened image and computes the
        exact float64 HSV ramp (``compositing.sky_ramp_rows`` -- the same
        bytes the host gradient writes); D2 splices the ramp over the LUT
        image and restores FG/overlay pixels.  The finished canvas stays
        device-resident (the next pass uploads nothing) and the PNG fetch
        is write-behind -- the full-canvas fetch + whole-image host HSV
        leave the critical path.  Byte-equality with the host-gradient
        formulation is asserted at LUT scale in
        ``tests/test_e2e_reference_examples.py`` and structurally in
        ``tests/test_pipeline_serving.py`` (sky detect / splice units)."""
        compositor = state.get_compositor()
        base = self._canvas_dev(state, results_dir, last_name)
        t0 = time.perf_counter()
        bg_dev, lut_img, ramp_band_dev, sky_dev, bottom_dev = \
            self.bg.colorize_composited_gradient(
                base, compositor._inner, compositor._moved,
                compositor._drawings, proc_text)
        for x in (ramp_band_dev, sky_dev, bottom_dev):
            x.copy_to_host_async()
        self._tt("bg_dispatch", t0)

        # fg debug image enqueued BEFORE the sky assert, exactly like the
        # host flow (on a failed assert the reference has already written
        # it); built IN THE WORKER from the shared previous-result fetch,
        # so the BG critical path never blocks on a 768^2 canvas read
        if last_name == "":
            prev_src = state.sketch
        elif state.last_result is not None \
                and state.last_result[0] == last_name:
            prev_src = state.last_result[1]     # ndarray or _LazyFetch
        else:                                   # rare: disk fallback, load
            prev_src = self._load_base(state, results_dir, last_name)
        inner, dr, moved = (state.inner_mask, state.drawings_region,
                            state.moved)

        def fg_debug(prev_src=prev_src, inner=inner, dr=dr, moved=moved):
            prev = prev_src.get() if isinstance(prev_src, _LazyFetch) \
                else prev_src
            out = comp.extract_foreground(prev, inner)
            out[dr] = moved[dr]
            return out

        fg_path = os.path.join(results_dir, f"{image_id}_fg.png")
        level = self.cfg.pipeline.png_compress_level
        if self._writer is not None:
            self._writer.save(fg_path, fg_debug, level)
        else:
            write_png(fg_path, fg_debug(), level)

        t0 = time.perf_counter()
        sky_bottom = int(bottom_dev)
        assert sky_bottom != -1         # reference assert (bg_utils.py:128)
        sky_color = [int(v) for v in np.asarray(sky_dev)]
        ramp_band = np.asarray(ramp_band_dev)
        self._tt("bg_band_fetch", t0)
        t0 = time.perf_counter()
        start_height = int(sky_bottom / 4 * 3)
        ramp_pad = np.zeros_like(ramp_band)
        ramp_pad[: start_height + 1] = comp.sky_ramp_rows(
            ramp_band, sky_color, sky_bottom)
        self._tt("bg_ramp_host", t0)
        t0 = time.perf_counter()
        final_dev = self.bg.finish_gradient(
            lut_img, bg_dev, ramp_pad, start_height, compositor._inner,
            compositor._moved, compositor._drawings)
        self._tt("bg_finish_dispatch", t0)

        out_path = os.path.join(results_dir, new_name)
        lazy = _LazyFetch(final_dev)
        t0 = time.perf_counter()
        self._save_result(out_path, lazy)
        state.last_result = (new_name, lazy)
        state.last_result_dev = (new_name, final_dev)
        self._tt("bg_save", t0)
        return out_path, proc_text
