"""Split-scale proof of the matching eval harness (VERDICT r4 #7).

The SketchyScene dataset is not in the tree, so a synthetic 55-image split
in the exact GT layout (``DRAWING_GT/L0_sample*.png``,
``INSTANCE_GT/sample_*_instance.mat`` at 750x750 -- exercising the 750->768
nearest zoom -- ``CLASS_GT/sample_*_class.mat``, per-image ``seg_data``
npzs) is generated here, captioned with the real caption engine
(``dataprep.matching_data_generation``), and fed through
``train.harness.eval_matching`` with a deterministic imperfect stub
predictor.  Reference flow being certified: ``matching_main.py:244-417``.

Asserts the harness's ACCUMULATION (cumulative IoU = sum I / sum U,
precision@X counters, stacked per-sample AP lists) equals an independent
per-sample recomputation over the same (image, caption) stream, and that
the split is a real workload (55 images, 150+ caption samples, non-trivial
metric spread).  The numbers this prints are published in PARITY.md
("Split-scale eval harness run").
"""
import json
import os

import numpy as np
import pytest
import scipy.io
from PIL import Image

from sketchyscenecolorization_tpu.data.fixtures import (
    get_pred_instance_mask, load_color_map)
from sketchyscenecolorization_tpu.data.matching_dataset import load_data_gt
from sketchyscenecolorization_tpu.dataprep.generators import (
    matching_data_generation)
from sketchyscenecolorization_tpu.evaluation.harness import (
    EVAL_SEG_IOU_LIST)
from sketchyscenecolorization_tpu.evaluation.metrics import (
    MAP_IOU_THRESHOLDS, compute_ap)
from sketchyscenecolorization_tpu.train.harness import eval_matching

N_IMAGES = int(os.environ.get("EVAL_SPLIT_IMAGES", "55"))
GT_SIZE = 750           # the SketchyScene .mat resolution (zoomed to 768)
OUT_SIZE = 768

# 1-based colorMapC46 ids of caption-engine-valid categories (INSTANCE)
VALID_CLASS_IDS = [12, 43, 29, 18, 41, 15, 22, 17, 35, 9, 19, 28, 27, 36]


def _make_scene(rng: np.random.RandomState):
    """Random non-degenerate scene: 3-7 axis-aligned instances at 750x750.
    Returns (instance_gt, class_gt) int arrays."""
    inst = np.zeros((GT_SIZE, GT_SIZE), np.int32)
    cls = np.zeros((GT_SIZE, GT_SIZE), np.int32)
    n = rng.randint(3, 8)
    for k in range(n):
        h = rng.randint(40, 160)
        w = rng.randint(40, 160)
        y = rng.randint(0, GT_SIZE - h)
        x = rng.randint(0, GT_SIZE - w)
        cid = VALID_CLASS_IDS[rng.randint(0, len(VALID_CLASS_IDS))]
        inst[y:y + h, x:x + w] = k + 1          # later boxes overwrite
        cls[y:y + h, x:x + w] = cid
    return inst, cls


def _write_split(base: str, split: str, n_images: int):
    """Synthetic split in the SketchyScene GT layout + per-image seg_data
    npzs (the Mask R-CNN-format inputs the AP computation consumes)."""
    split_dir = os.path.join(base, split)
    for sub in ("DRAWING_GT", "INSTANCE_GT", "CLASS_GT"):
        os.makedirs(os.path.join(split_dir, sub), exist_ok=True)
    seg_dir = os.path.join(base, "seg_data")
    os.makedirs(seg_dir, exist_ok=True)

    for i in range(n_images):
        image_id = i + 1
        rng = np.random.RandomState(1000 + image_id)
        inst, cls = _make_scene(rng)
        scipy.io.savemat(
            os.path.join(split_dir, "INSTANCE_GT",
                         f"sample_{image_id}_instance.mat"),
            {"INSTANCE_GT": inst.astype(np.uint8)})
        scipy.io.savemat(
            os.path.join(split_dir, "CLASS_GT",
                         f"sample_{image_id}_class.mat"),
            {"CLASS_GT": cls.astype(np.uint8)})
        # sketch: white canvas with black instance-boundary strokes
        sketch = np.full((GT_SIZE, GT_SIZE), 255, np.uint8)
        edge = np.zeros_like(inst, bool)
        edge[1:] |= inst[1:] != inst[:-1]
        edge[:, 1:] |= inst[:, 1:] != inst[:, :-1]
        sketch[edge] = 0
        Image.fromarray(sketch, "L").convert("RGB").save(
            os.path.join(split_dir, "DRAWING_GT",
                         f"L0_sample{image_id}.png"))

        # seg_data: the GT instances at 768 with a small deterministic
        # erosion-style perturbation (an imperfect upstream segmenter, so
        # AP is non-trivial); boxes inclusive like the Mask R-CNN npzs
        # (expand_small_segmentation_mask pastes at [y1:y2+1, x1:x2+1])
        _, class_ids, _, masks768 = load_data_gt(split_dir, image_id)
        n_inst = masks768.shape[-1]
        small_list = np.empty((n_inst,), object)
        boxes = np.zeros((n_inst, 4), np.int32)
        for k in range(n_inst):
            m = masks768[:, :, k].copy()
            ys, xs = np.nonzero(m)
            y1, x1, y2, x2 = ys.min(), xs.min(), ys.max(), xs.max()
            if (y2 - y1) > 8 and (x2 - x1) > 8 and k % 2 == 1:
                m[y1:y1 + 3] = 0               # clip odd instances' top rows
                ys, xs = np.nonzero(m)
                y1 = ys.min()
            boxes[k] = (y1, x1, y2, x2)
            small_list[k] = m[y1:y2 + 1, x1:x2 + 1].astype(np.uint8)
        np.savez(os.path.join(seg_dir, f"{image_id}_datas.npz"),
                 pred_masks=small_list,
                 pred_class_ids=class_ids.astype(np.int32),
                 pred_boxes=boxes)


def _stub_predictor(base: str, split: str):
    """Deterministic imperfect predictor: the union of the caption's GT
    instances shifted by a caption-dependent offset, restricted to a
    caption-dependent band -- a spread of IoUs across [0.3, 1.0)."""
    cache = {}

    def predict(sketch_u8, caption, image_id):
        if image_id not in cache:
            _, _, _, masks = load_data_gt(os.path.join(base, split),
                                          image_id)
            cache[image_id] = masks
        masks = cache[image_id]
        with open(os.path.join(base, f"sentence_instance_{split}.json")) as f:
            data = json.load(f)
        entry = next(e for e in data if e["key"] == image_id)
        ids = entry["sen_instIdx_map"][caption]
        target = np.zeros(masks.shape[:2], np.int32)
        for idx in ids:
            target = np.logical_or(target, masks[:, :, idx])
        h = sum(ord(c) for c in caption)
        dy, dx = (h % 13) - 6, (h // 13 % 13) - 6
        return np.roll(target, (dy, dx), axis=(0, 1)).astype(np.float32)

    return predict


@pytest.mark.skipif(os.environ.get("RUN_SLOW") != "1",
                    reason="55-image split generation + eval (set RUN_SLOW=1)")
def test_eval_matching_split_scale_accumulation(tmp_path):
    base = str(tmp_path)
    split = "val"
    _write_split(base, split, N_IMAGES)

    categories46 = [str(c) for c in
                    load_color_map("/root/reference/examples/colorMapC46.mat")]
    gen = matching_data_generation(base, [split], categories46,
                                   save_dir=base,
                                   image_counts={split: N_IMAGES})
    entries = gen[split]
    assert len(entries) == N_IMAGES          # every synthetic scene is valid
    n_caps = sum(len(e["sen_instIdx_map"]) for e in entries)
    assert n_caps >= 150, n_caps             # a real split-scale workload

    predict = _stub_predictor(base, split)
    current = {"id": None}

    def predict_fn(sketch_u8, caption):
        return predict(sketch_u8, caption, current["id"])

    # eval_matching iterates the json in order; track the image id the same
    # way so the stub can reach the right GT (the harness's predict_fn
    # signature is (image, caption), like MatchingEngine.predict_mask)
    with open(os.path.join(base, f"sentence_instance_{split}.json")) as f:
        json_data = json.load(f)
    order = iter([e["key"] for e in json_data for _ in e["sen_instIdx_map"]])

    def tracking_predict(sketch_u8, caption):
        current["id"] = next(order)
        return predict_fn(sketch_u8, caption)

    result = eval_matching(
        tracking_predict, os.path.join(base, split),
        os.path.join(base, f"sentence_instance_{split}.json"),
        seg_data_base_dir=base, compute_mask_ap=True, augment=False,
        result_path=os.path.join(base, "eval_result.txt"))

    assert result.num_samples == n_caps

    # ---- independent per-sample recomputation, aggregated separately
    cum_i = cum_u = 0.0
    ious, ap_rows = [], []
    for entry in json_data:
        image_id = entry["key"]
        _, _, _, gt_masks = load_data_gt(os.path.join(base, split), image_id)
        seg_npz = os.path.join(base, "seg_data", f"{image_id}_datas.npz")
        for caption, ids in entry["sen_instIdx_map"].items():
            target = np.zeros(gt_masks.shape[:2], bool)
            cap_gt = np.zeros((*gt_masks.shape[:2], len(ids)), np.int32)
            for t_i, idx in enumerate(ids):
                target |= gt_masks[:, :, idx].astype(bool)
                cap_gt[:, :, t_i] = gt_masks[:, :, idx]
            pred = predict(None, caption, image_id).astype(bool)
            i = np.logical_and(pred, target).sum()
            u = np.logical_or(pred, target).sum()
            cum_i += i
            cum_u += u
            ious.append(i / u)
            pred_masks, pred_scores, _, _, _ = get_pred_instance_mask(
                seg_npz, pred.astype(np.float32).copy())
            row = np.zeros((len(MAP_IOU_THRESHOLDS),), np.float32)
            if np.asarray(pred_scores).shape[0] != 0:
                for j, thr in enumerate(MAP_IOU_THRESHOLDS):
                    ap, _, _, _ = compute_ap(cap_gt, pred_scores, pred_masks,
                                             iou_threshold=thr)
                    row[j] = ap
            ap_rows.append(row)

    assert result.cum_iou == pytest.approx(cum_i / cum_u, abs=0, rel=0)
    for n, t in enumerate(EVAL_SEG_IOU_LIST):
        expect = np.mean([iou >= t for iou in ious])
        assert result.precision_at[t] == pytest.approx(expect, abs=0)
    aps = np.stack(ap_rows)
    np.testing.assert_array_equal(result.map_list, aps.mean(axis=0))
    assert result.mean_ap == pytest.approx(float(aps.mean()), abs=0)

    # non-trivial workload: imperfect predictor + imperfect segmenter
    assert 0.3 < result.cum_iou < 0.999
    assert result.precision_at[0.9] < result.precision_at[0.5]
    assert 0.0 < result.mean_ap < 1.0
    print(f"\nsplit-scale eval: images={N_IMAGES} samples={n_caps} "
          f"cum_iou={result.cum_iou:.4f} "
          f"prec={ {t: round(v, 4) for t, v in result.precision_at.items()} } "
          f"mAP={result.mean_ap:.4f} map_list={np.round(result.map_list, 4)}")
