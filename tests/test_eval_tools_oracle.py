"""Metric parity vs the reference's ``utils/eval_tools.py`` executed as an
oracle (numpy-only module): bbox IoU, mask I/U, mask-overlap matrices and the
full greedy-matched VOC-envelope AP compared on randomized mask sets.
"""
import importlib.util
import os

import numpy as np
import pytest

from sketchyscenecolorization_tpu.evaluation import (
    compute_ap, compute_bbox_iou, compute_mask_IU, compute_overlaps_masks,
)

REF = "/root/reference/Instance_Matching/utils/eval_tools.py"


@pytest.fixture(scope="module")
def ref_mod():
    if not os.path.isfile(REF):
        pytest.skip("reference tree not available")
    spec = importlib.util.spec_from_file_location("ref_eval_tools", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _random_masks(rng, n, size=64):
    """Blocky rectangles so IoUs spread over (0, 1) with real tie cases."""
    masks = np.zeros((size, size, n), np.float32)
    for k in range(n):
        y, x = rng.randint(0, size - 8, 2)
        h, w = rng.randint(4, size // 2, 2)
        masks[y:y + h, x:x + w, k] = 1.0
    return masks


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bbox_iou_matches(ref_mod, seed):
    rng = np.random.RandomState(seed)
    lo = rng.randint(0, 50, (8, 2))
    boxes = np.concatenate([lo, lo + rng.randint(1, 40, (8, 2))], axis=1)
    target = boxes[rng.randint(0, 8)]
    np.testing.assert_allclose(compute_bbox_iou(boxes, target),
                               ref_mod.compute_bbox_iou(boxes, target))


@pytest.mark.parametrize("seed", [0, 1])
def test_mask_iu_and_overlaps_match(ref_mod, seed):
    rng = np.random.RandomState(seed)
    m1 = _random_masks(rng, 5)
    m2 = _random_masks(rng, 3)
    assert compute_mask_IU(m1[..., 0], m2[..., 0]) == \
        ref_mod.compute_mask_IU(m1[..., 0], m2[..., 0])
    np.testing.assert_allclose(compute_overlaps_masks(m1, m2),
                               ref_mod.compute_overlaps_masks(m1, m2))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("thresh", [0.3, 0.5, 0.75])
def test_compute_ap_matches(ref_mod, seed, thresh):
    rng = np.random.RandomState(seed)
    gt = _random_masks(rng, rng.randint(1, 6))
    pred = _random_masks(rng, rng.randint(1, 8))
    scores = rng.rand(pred.shape[-1]).astype(np.float32)

    got = compute_ap(gt.copy(), scores.copy(), pred.copy(), thresh)
    want = ref_mod.compute_ap(gt.copy(), scores.copy(), pred.copy(), thresh)
    np.testing.assert_allclose(got[0], want[0], err_msg="mAP")
    np.testing.assert_allclose(got[1], want[1], err_msg="precisions")
    np.testing.assert_allclose(got[2], want[2], err_msg="recalls")
    np.testing.assert_allclose(got[3], want[3], err_msg="overlaps")
