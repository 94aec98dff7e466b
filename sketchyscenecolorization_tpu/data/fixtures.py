"""Host-side fixture IO: sketches, precomputed instance segmentation (npz),
inner masks (.mat), color map; plus the vectorized mask->instance matcher.

File formats (reference ``Instance_Matching/data_processing/sketch_data_processing.py:254-281``,
``Pipeline_utils/fg_color_utils.py:211-243``):

- ``seg_data/<id>_datas.npz``: ragged ``pred_masks`` (per-box uint8 masks),
  ``pred_class_ids [N]`` (46-category ids), ``pred_boxes [N,4]`` (y1,x1,y2,x2).
- ``inner_masks/<id>.mat``: 768x768 uint8, 0 = background, i+1 = instance i.
- ``colorMapC46.mat``: 46x2 (category name, RGB).

The instance matcher is NumPy-vectorized (the reference loops per instance);
it stays on the host because the mask count N is data-dependent.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np
import scipy.io
from PIL import Image

IMAGE_SIZE = 768


def load_sketch_image(image_path: str, dtype=np.float32,
                      size: int = IMAGE_SIZE) -> np.ndarray:
    """PNG -> [size, size, 3] array, NEAREST resize if needed
    (reference sketch_data_processing.py:24-29).  Shared with the training
    loader (``data/matching_dataset.py``) so pipeline-time and train-time
    sketches cannot diverge."""
    from .matching_dataset import _load_image_path
    return _load_image_path(image_path, size=size).astype(dtype)


def load_inner_mask(mat_path: str) -> np.ndarray:
    """[768, 768] int array, 0 = bg, i+1 = instance i."""
    return scipy.io.loadmat(mat_path)["inner_masks"]


def load_color_map(mat_path: str) -> List[str]:
    """46 category names, in id order (reference fg_matching_utils.py:19-23)."""
    color_map = scipy.io.loadmat(mat_path)["colorMap"]
    return [color_map[i][0][0] for i in range(46)]


def load_seg_data(npz_path: str, size: int = IMAGE_SIZE
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (pred_masks [N,size,size] uint8, pred_class_ids [N], pred_boxes [N,4])."""
    npz = np.load(npz_path, allow_pickle=True)
    pred_class_ids = np.array(npz["pred_class_ids"], dtype=np.int32)
    pred_boxes = np.array(npz["pred_boxes"], dtype=np.int32)
    pred_masks = expand_small_segmentation_mask(npz["pred_masks"], pred_boxes, size)
    return pred_masks, pred_class_ids, pred_boxes


def expand_small_segmentation_mask(pred_masks_small_list, pred_boxes: np.ndarray,
                                   size: int = IMAGE_SIZE) -> np.ndarray:
    """Expand per-box small masks to full size x size canvases
    (reference sketch_data_processing.py:202-214)."""
    pred_masks = np.zeros((len(pred_masks_small_list), size, size), dtype=np.uint8)
    for i, small in enumerate(pred_masks_small_list):
        y1, x1, y2, x2 = pred_boxes[i]
        pred_masks[i, y1:y2 + 1, x1:x2 + 1] = small
    return pred_masks


def compute_mask_iou(mask_a: np.ndarray, mask_b: np.ndarray) -> float:
    inter = np.sum(np.logical_and(mask_a, mask_b))
    union = np.sum(mask_a) + np.sum(mask_b) - inter
    return float(inter / union)


def compute_mask_occupied_percentage(mask_overall: np.ndarray, mask_instance: np.ndarray) -> float:
    """Fraction of the instance mask covered by the predicted overall mask
    (reference sketch_data_processing.py:241-251)."""
    inter = np.sum(np.logical_and(mask_overall, mask_instance))
    return float(inter / np.sum(mask_instance))


def get_pred_instance_mask(segm_data_path: str, pred_overall_mask: np.ndarray,
                           mask_occupied_threshold: float = 0.5):
    """Map a predicted binary mask to instance indices: keep instances with
    >threshold of their area inside the predicted mask; score = occupied
    fraction (reference sketch_data_processing.py:254-281).

    Returns (masks [H,W,K], scores [K], boxes [K,4], class_ids [K], matched_indices).
    """
    pred_masks, pred_class_ids, pred_boxes = load_seg_data(
        segm_data_path, size=pred_overall_mask.shape[0])

    overall = pred_overall_mask.astype(bool)
    inst = pred_masks.astype(bool)                       # [N, H, W]
    inter = np.logical_and(inst, overall[None]).sum(axis=(1, 2)).astype(np.float64)
    area = inst.sum(axis=(1, 2)).astype(np.float64)
    scores = inter / np.maximum(area, 1.0)
    keep = scores > mask_occupied_threshold

    matched_inst_indices = list(np.nonzero(keep)[0])
    if not matched_inst_indices:
        return (np.array(()), np.array(()), np.array(()), np.array(()), matched_inst_indices)
    return (
        np.stack([pred_masks[i] for i in matched_inst_indices], axis=2),
        scores[keep],
        pred_boxes[keep],
        pred_class_ids[keep],
        matched_inst_indices,
    )
