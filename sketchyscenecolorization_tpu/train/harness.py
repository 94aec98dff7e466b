"""Training/eval harnesses (reference L4: ``matching_main.py``,
``obj_colorization_main.py`` + ``obj_lib/main_procedure.py``,
``bg_colorization_main.py:703-975``).

Common structure per harness: background-worker data pipeline ->
device-prefetched batches -> jitted train step (optionally sharded over the
mesh 'data' axis) -> loss-EMA/throughput logging -> orbax snapshots with
latest-step resume.  The FG harness reports status -1 on NaN so
``run_with_nan_restart`` can relaunch it from the newest checkpoint.
"""
from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np

from ..config import BGGanConfig, FGGanConfig, MatchingConfig
from ..data.bg_dataset import BGDataset
from ..data.fg_records import FGPairedDataset
from ..data.matching_dataset import MatchingTrainDataset
from ..evaluation import MatchingEvaluator
from ..parallel import BackgroundGenerator, prefetch_to_device
from ..utils.checkpoint import latest_checkpoint, restore_checkpoint, save_checkpoint
from ..utils.logging import JsonlMetricWriter, LossEMA, ThroughputMeter, count_params

from .bg_gan import BGGanTrainState, create_bg_gan_state, make_bg_gan_train_step
from .fg_gan import create_fg_gan_state, make_fg_gan_train_step
from .matching import (MatchingTrainState, create_matching_state,
                       make_matching_train_step)
from .watchdog import NaNWatchdog
class _ProfileWindow:
    """Capture a jax.profiler trace over steps [start, stop) of a training
    loop (TensorBoard-viewable; the TPU analogue of the reference's unused
    tf.RunMetadata scaffolding, ``main_procedure.py:168-169``)."""

    def __init__(self, log_dir, start: int = 10, stop: int = 13):
        self.log_dir = log_dir
        self.start, self.stop = start, stop
        self._active = False

    def tick(self, step: int):
        if not self.log_dir:
            return
        if step == self.start and not self._active:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif step >= self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False

    def close(self):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False



def _resume(state, ckpt_dir: str, mesh=None):
    found = latest_checkpoint(ckpt_dir) if ckpt_dir else None
    if found is not None:
        step, path = found
        state = restore_checkpoint(path, state)
    else:
        step = 0
    if mesh is not None:
        from ..parallel import replicate
        state = replicate(state, mesh)
    return state, step


def train_matching(cfg: MatchingConfig, dataset: MatchingTrainDataset,
                   init_params: Dict[str, Any], run_dir: str,
                   log_every: int = 50, mesh=None,
                   max_iters: Optional[int] = None,
                   profile_dir: Optional[str] = None) -> MatchingTrainState:
    """``matching_main.train`` (:81-241): batch-1 steps, loss EMA(0.99)
    printing every ``log_every``, snapshots every cfg.snapshot_interval."""
    max_iters = max_iters or cfg.max_iters
    ckpt_dir = os.path.join(run_dir, "snapshots")
    state = create_matching_state(init_params, cfg)
    state, start = _resume(state, ckpt_dir, mesh)
    count_params(state.params["text_sketchyscene"], "text_sketchyscene")

    step_fn = make_matching_train_step(cfg)
    writer = JsonlMetricWriter(os.path.join(run_dir, "metrics.jsonl"))
    ema = LossEMA(0.99)
    meter = ThroughputMeter(max_iters)

    gen = BackgroundGenerator(dataset.make_batch, num_steps=max_iters - start)
    profiler = _ProfileWindow(profile_dir)
    n_iter = start
    for batch in prefetch_to_device(gen, depth=2, mesh=mesh):
        profiler.tick(n_iter)
        meter.start()
        state, metrics = step_fn(state, batch)
        cls = float(metrics["cls_loss"])
        stats = meter.stop(n_iter)
        ema.update(cls)
        n_iter += 1
        if n_iter % log_every == 0 or n_iter == max_iters:
            print(f"iter {n_iter}: cls_loss(ema)={ema.value:.4f} "
                  f"lr={float(metrics['lr']):.6f} "
                  f"{stats['sec_per_step']:.3f}s/step "
                  f"eta={stats['eta_hours']:.2f}h")
            writer.write(n_iter, {"cls_loss": cls, "cls_loss_ema": ema.value,
                                  "lr": metrics["lr"], **stats})
            meter.window_reset()
        if n_iter % cfg.snapshot_interval == 0 or n_iter == max_iters:
            save_checkpoint(ckpt_dir, n_iter, jax.device_get(state),
                            max_to_keep=10)
    profiler.close()
    writer.close()
    return state


def eval_matching(predict_fn: Callable[[np.ndarray, str], np.ndarray],
                  dataset_base_dir: str, caption_json_path: str,
                  seg_data_base_dir: Optional[str] = None,
                  compute_mask_ap: bool = True,
                  result_path: Optional[str] = None,
                  augment: bool = True,
                  max_samples: Optional[int] = None,
                  predict_batch_fn: Optional[
                      Callable[[np.ndarray, list], np.ndarray]] = None):
    """``matching_main.test`` (:244-417): cumulative IoU, precision@X,
    instance mAP@[0.5:0.95] over a split.

    ``predict_fn(image_uint8, caption) -> binary [768,768] mask`` -- a
    ``MatchingEngine.predict_mask`` bound method in production.

    Throughput design (the reference reloads the per-image GT .mat and runs
    one sess.run per caption, serially, ``matching_main.py:269-339``): GT
    loading runs on a background worker (single worker: order, and hence
    the augmentation RNG stream, is preserved), and when
    ``predict_batch_fn(image, captions) -> [M, H, W]`` is given (a
    ``MatchingEngine.predict_masks`` bound method -- bitwise equal to M
    single calls) the backbone runs once per image instead of once per
    caption."""
    import json as _json
    import random as _random
    from ..data.matching_dataset import load_data_gt
    from ..text import augment_caption_with_attr

    with open(caption_json_path) as f:
        json_data = _json.load(f)
    evaluator = MatchingEvaluator(compute_mask_ap=compute_mask_ap)
    rng = _random.Random(0)

    def load(i):
        entry = json_data[i]
        return entry, load_data_gt(dataset_base_dir, entry["key"])

    gen = BackgroundGenerator(load, num_steps=len(json_data), num_workers=1)
    done = 0
    for entry, (sketch, gt_class_ids, gt_bboxes, gt_masks) in gen:
        img_idx = entry["key"]
        sketch_u8 = sketch.astype(np.uint8)
        seg_npz = (os.path.join(seg_data_base_dir, "seg_data",
                                f"{img_idx}_datas.npz")
                   if seg_data_base_dir else None)
        items = list(entry["sen_instIdx_map"].items())
        if max_samples:
            items = items[:max(0, max_samples - done)]
        captions = [augment_caption_with_attr(c, rng) if augment else c
                    for c, _ in items]
        if predict_batch_fn is not None and captions:
            all_predicts = predict_batch_fn(sketch_u8, captions)
        else:
            all_predicts = None
        for k, (caption, inst_indices) in enumerate(items):
            target = np.zeros(gt_masks.shape[:2], np.int32)
            cap_gt = np.zeros((*gt_masks.shape[:2], len(inst_indices)), np.int32)
            for t_i, inst_idx in enumerate(inst_indices):
                target = np.logical_or(target, gt_masks[:, :, inst_idx])
                cap_gt[:, :, t_i] = gt_masks[:, :, inst_idx]
            predicts = (all_predicts[k] if all_predicts is not None
                        else predict_fn(sketch_u8, captions[k]))
            evaluator.add(predicts, target,
                          cap_gt if compute_mask_ap and seg_npz else None,
                          seg_npz)
            done += 1
        if max_samples and done >= max_samples:
            gen.close()
            break

    result = evaluator.result()
    print(result.summary())
    if result_path:
        os.makedirs(os.path.dirname(result_path) or ".", exist_ok=True)
        with open(result_path, "a") as f:
            f.write(result.summary() + "\n")
    return result


def train_fg_gan(cfg: FGGanConfig, dataset: FGPairedDataset, run_dir: str,
                 seed: int = 0, log_every: int = 100, mesh=None,
                 max_iters: Optional[int] = None) -> int:
    """One FG GAN training launch (``main_procedure.train`` :62-242).
    Returns 0 on completion, -1 on NaN abort (for ``run_with_nan_restart``)."""
    max_iters = max_iters or cfg.max_iters
    ckpt_dir = os.path.join(run_dir, "snapshot")
    state = create_fg_gan_state(jax.random.PRNGKey(seed), cfg)
    state, start = _resume(state, ckpt_dir, mesh)
    if start == 0:
        count_params(state.g_params, "generator")
        count_params(state.d_params, "discriminator")

    step_fn = make_fg_gan_train_step(cfg)
    writer = JsonlMetricWriter(os.path.join(run_dir, "metrics.jsonl"))
    meter = ThroughputMeter(max_iters)
    watchdog = NaNWatchdog()
    rng = jax.random.PRNGKey(seed + 1)

    # two independent streams, like the reference's G and D queues
    gen_d = BackgroundGenerator(dataset.make_batch, num_steps=max_iters - start)
    gen_g = BackgroundGenerator(dataset.make_batch, num_steps=max_iters - start)
    i = start
    for batch_d, batch_g in zip(prefetch_to_device(gen_d, mesh=mesh),
                                prefetch_to_device(gen_g, mesh=mesh)):
        meter.start()
        state, metrics = step_fn(state, batch_d, batch_g, rng)
        stats = meter.stop(i)
        i += 1
        if watchdog.check(metrics, i):
            print(f"NaN at iter {i}; aborting with status -1")
            gen_d.close()
            gen_g.close()
            writer.close()
            return -1
        if i % log_every == 0 or i == max_iters:
            print(f"iter {i}: loss_d={float(metrics['loss_d']):.4f} "
                  f"loss_g={float(metrics['loss_g']):.4f} "
                  f"{stats['sec_per_step']:.3f}s/step")
            writer.write(i, {k: metrics[k] for k in
                             ("loss_d", "loss_g", "recon_l1")} | stats)
        if i % cfg.snapshot_interval == 0 or i == max_iters:
            save_checkpoint(ckpt_dir, i, jax.device_get(state), max_to_keep=100)
    writer.close()
    return 0


def train_bg_gan(cfg: BGGanConfig, dataset: BGDataset, run_dir: str,
                 seed: int = 0, progress_every: int = 50, mesh=None,
                 max_steps: Optional[int] = None) -> BGGanTrainState:
    """``bg_colorization`` training loop (:894-975)."""
    max_steps = max_steps or cfg.max_steps
    ckpt_dir = os.path.join(run_dir, "snapshot")
    state = create_bg_gan_state(jax.random.PRNGKey(seed), cfg)
    state, start = _resume(state, ckpt_dir, mesh)
    if start == 0:
        count_params(state.g_params, "generator")
        count_params(state.d_params, "discriminator")

    step_fn = make_bg_gan_train_step(cfg)
    writer = JsonlMetricWriter(os.path.join(run_dir, "metrics.jsonl"))
    meter = ThroughputMeter(max_steps)

    gen = BackgroundGenerator(dataset.make_batch, num_steps=max_steps - start)
    step = start
    for batch in prefetch_to_device(gen, depth=2, mesh=mesh):
        meter.start()
        state, metrics = step_fn(state, batch)
        stats = meter.stop(step)
        step += 1
        if step % progress_every == 0 or step == max_steps:
            print(f"step {step}: " + " ".join(
                f"{k}={float(metrics['ema/' + k]):.4f}" for k in
                ("discrim_loss", "gen_loss_GAN", "gen_loss_L1",
                 "region_mask_loss", "gen_loss"))
                + f" image/sec={stats['steps_per_sec']:.1f}")
            writer.write(step, {k: v for k, v in metrics.items()
                                if k.startswith("ema/")} | stats)
        if step % cfg.snapshot_interval == 0 or step == max_steps:
            save_checkpoint(ckpt_dir, step, jax.device_get(state),
                            max_to_keep=10)
    writer.close()
    return state
