"""SketchyScene ground-truth loading + the matching training dataset.

Reference: ``Instance_Matching/data_processing/sketch_data_processing.py``
(GT .mat parsing :41-142, bbox extraction :146-167, load_data_gt :170-186)
and the train-loop sampling in ``matching_main.py:154-214`` (per-epoch
shuffle over (image, caption, instance-set) tuples, per-sample caption
color augmentation, union target mask).

The reference's per-instance Python loops over ``np.bincount`` become
vectorized one-hot reductions; the per-step .mat parsing moves off the hot
path via ``parallel.BackgroundGenerator`` workers.
"""
from __future__ import annotations

import json
import os
import random
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import scipy.io
import scipy.ndimage
from PIL import Image

from ..text import augment_caption_with_attr, matching_encode

IMAGE_SIZE = 768
IMAGE_SUBFOLDER = "DRAWING_GT"
SEMANTIC_SUBFOLDER = "CLASS_GT"
INSTANCE_SUBFOLDER = "INSTANCE_GT"

# BGR pixel means (``matching_main.py`` / ``fg_matching_utils.py:11``)
PIXEL_MU = np.array((104.00698793, 116.66876762, 122.67891434))


def load_image(image_dir: str, image_id) -> np.ndarray:
    path = os.path.join(image_dir, f"L0_sample{image_id}.png")
    return _load_image_path(path)


def _load_image_path(path: str, size: int = None) -> np.ndarray:
    size = size or IMAGE_SIZE
    image = Image.open(path).convert("RGB")
    if image.width != size or image.height != size:
        image = image.resize((size, size), resample=Image.NEAREST)
    return np.array(image, dtype=np.float32)


def load_mask(instance_dir: str, semantic_dir: str, image_id
              ) -> Tuple[np.ndarray, np.ndarray]:
    """INSTANCE_GT/CLASS_GT .mat -> ([768,768,nInst] masks, [nInst] class ids).

    Instance ids with zero pixels are skipped; each instance's class is the
    majority CLASS_GT label under its mask; nearest-neighbor zoom 750->768."""
    inst = scipy.io.loadmat(os.path.join(
        instance_dir, f"sample_{image_id}_instance.mat"))["INSTANCE_GT"]
    inst = np.array(inst, dtype=np.int32)
    cls = scipy.io.loadmat(os.path.join(
        semantic_dir, f"sample_{image_id}_class.mat"))["CLASS_GT"]
    cls = np.array(cls, dtype=np.int32)

    present = np.unique(inst)
    present = present[present > 0]                     # ascending instance ids
    n = len(present)
    masks = (inst[None, :, :] == present[:, None, None])   # [n, H, W] bool

    # majority class per instance, vectorized 2-D bincount
    num_cls = int(cls.max()) + 1
    class_ids = np.zeros((n,), np.uint8)
    for i in range(n):  # n is small (<= ~30 instances)
        counts = np.bincount((cls * masks[i]).ravel(), minlength=num_cls)[1:]
        class_ids[i] = np.argmax(counts) + 1

    masks = np.transpose(masks.astype(np.uint8), (1, 2, 0))
    if masks.shape[0] != IMAGE_SIZE:
        scale = IMAGE_SIZE / masks.shape[0]
        masks = scipy.ndimage.zoom(masks, zoom=[scale, scale, 1], order=0)
        masks = np.array(masks, dtype=np.uint8)
    return masks, class_ids


def load_mask_simp(instance_dir: str, image_id,
                   selected_instance_ids: Sequence[int]) -> np.ndarray:
    """Union mask of the selected (dense-reindexed) instances -- the fast
    training-path loader (reference :101-142)."""
    inst = scipy.io.loadmat(os.path.join(
        instance_dir, f"sample_{image_id}_instance.mat"))["INSTANCE_GT"]
    inst = np.array(inst, dtype=np.int32)
    present = np.unique(inst)
    present = present[present > 0]
    chosen = present[np.asarray(list(selected_instance_ids), np.int64)]
    selected_mask = np.isin(inst, chosen).astype(np.int32)
    assert selected_mask.sum() != 0
    if selected_mask.shape[0] != IMAGE_SIZE:
        scale = IMAGE_SIZE / selected_mask.shape[0]
        selected_mask = scipy.ndimage.zoom(selected_mask, zoom=[scale, scale],
                                           order=0).astype(np.int32)
    return selected_mask


def extract_bboxes(mask: np.ndarray) -> np.ndarray:
    """[H, W, nInst] -> [nInst, (y1, x1, y2, x2)], y2/x2 exclusive."""
    boxes = np.zeros([mask.shape[-1], 4], dtype=np.int32)
    for i in range(mask.shape[-1]):
        m = mask[:, :, i]
        horiz = np.where(np.any(m, axis=0))[0]
        vert = np.where(np.any(m, axis=1))[0]
        if horiz.shape[0]:
            x1, x2 = horiz[[0, -1]]
            y1, y2 = vert[[0, -1]]
            boxes[i] = [y1, x1, y2 + 1, x2 + 1]
    return boxes


def load_data_gt(dataset_base_dir: str, image_id, fast_version: bool = False,
                 inst_indices: Optional[Sequence[int]] = None):
    image_dir = os.path.join(dataset_base_dir, IMAGE_SUBFOLDER)
    semantic_dir = os.path.join(dataset_base_dir, SEMANTIC_SUBFOLDER)
    instance_dir = os.path.join(dataset_base_dir, INSTANCE_SUBFOLDER)
    sketch = load_image(image_dir, image_id)
    if fast_version:
        assert inst_indices is not None
        return sketch, load_mask_simp(instance_dir, image_id, inst_indices)
    masks, class_ids = load_mask(instance_dir, semantic_dir, image_id)
    return sketch, class_ids, extract_bboxes(masks), masks


def build_train_info(caption_json_path: str) -> List[Dict]:
    """sentence_instance_<split>.json -> flat (img, caption, instances) list
    (``matching_main.py:154-175``)."""
    with open(caption_json_path) as fp:
        json_data = json.load(fp)
    out = []
    for entry in json_data:
        for caption, inst_indices in entry["sen_instIdx_map"].items():
            out.append({"img_idx": entry["key"], "inst_indices": inst_indices,
                        "caption": caption})
    return out


class MatchingTrainDataset:
    """Per-epoch shuffled sampler with caption color augmentation, producing
    train-step batches (``matching_main.py:179-214`` semantics)."""

    def __init__(self, dataset_base_dir: str, caption_json_path: str,
                 vocab: Dict[str, int], max_len: int = 15,
                 augment: bool = True, seed: int = 0):
        self.dataset_base_dir = dataset_base_dir
        self.train_info = build_train_info(caption_json_path)
        self.vocab = vocab
        self.max_len = max_len
        self.augment = augment
        self._rng = random.Random(seed)
        self._order: List[int] = []
        self._pos = 0
        self._lock = threading.Lock()     # make_batch runs on worker threads

    def __len__(self):
        return len(self.train_info)

    def _next_index(self) -> int:
        with self._lock:
            if self._pos >= len(self._order):
                self._order = list(range(len(self.train_info)))
                self._rng.shuffle(self._order)
                self._pos = 0
            idx = self._order[self._pos]
            self._pos += 1
            return idx

    def make_batch(self, step: int) -> Dict[str, np.ndarray]:
        info = self.train_info[self._next_index()]
        sketch, mask = load_data_gt(self.dataset_base_dir, info["img_idx"],
                                    fast_version=True,
                                    inst_indices=list(info["inst_indices"]))
        caption = info["caption"]
        if self.augment:
            with self._lock:
                caption = augment_caption_with_attr(caption, self._rng)
        indices, seq_len = matching_encode(caption, self.vocab, self.max_len)
        return {
            "image": (sketch - PIXEL_MU).astype(np.float32)[None],
            "words": np.asarray(indices, np.int32)[None],
            "seq_len": np.asarray([seq_len], np.int32),
            "target_mask": mask.astype(np.float32)[None, :, :, None],
        }
