"""Edit-record state machine + fixture IO tests against the real example data."""
import json
import os

import numpy as np
import pytest

from sketchyscenecolorization_tpu.data import (
    fetch_records, update_records, withdraw_records,
    load_sketch_image, load_inner_mask, load_color_map, load_seg_data,
    get_pred_instance_mask, compute_mask_occupied_percentage,
)


def test_records_lifecycle(tmp_path):
    base = str(tmp_path)
    new_name, last_name, last_bg, summary = fetch_records(42, base)
    assert new_name == "42_1.png" and last_name == "" and last_bg == "" and summary == []

    update_records(42, "the bus is red", base, "FG", new_name, "", summary)
    new_name2, last_name2, last_bg2, summary2 = fetch_records(42, base)
    assert new_name2 == "42_2.png" and last_name2 == "42_1.png"
    assert summary2[0]["input_text"] == "the bus is red"

    update_records(42, "the sky is blue and the ground is green", base, "BG",
                   new_name2, "the sky is blue and the ground is green", summary2)
    _, _, last_bg3, summary3 = fetch_records(42, base)
    assert last_bg3 == "the sky is blue and the ground is green"
    assert len(summary3) == 2

    # create dummy result images so withdraw can delete them
    results_dir = os.path.join(base, "results", "42")
    os.makedirs(results_dir, exist_ok=True)
    for k in (1, 2):
        open(os.path.join(results_dir, f"42_{k}.png"), "wb").close()

    withdraw_records(42, base)
    _, last_name4, _, summary4 = fetch_records(42, base)
    assert last_name4 == "42_1.png" and len(summary4) == 1

    withdraw_records(42, base)  # removes the json entirely
    new5, last5, bg5, s5 = fetch_records(42, base)
    assert new5 == "42_1.png" and last5 == "" and s5 == []

    with pytest.raises(FileNotFoundError):
        withdraw_records(42, base)


def test_fixture_io(examples_dir):
    sketch = load_sketch_image(os.path.join(examples_dir, "sketches", "9996.png"))
    assert sketch.shape == (768, 768, 3) and sketch.dtype == np.float32
    assert sketch.max() <= 255.0

    inner = load_inner_mask(os.path.join(examples_dir, "inner_masks", "9996.mat"))
    assert inner.shape == (768, 768)

    names = load_color_map(os.path.join(examples_dir, "colorMapC46.mat"))
    assert len(names) == 46 and "bus" in names

    masks, class_ids, boxes = load_seg_data(os.path.join(examples_dir, "seg_data", "9996_datas.npz"))
    assert masks.shape == (len(class_ids), 768, 768)
    assert boxes.shape == (len(class_ids), 4)
    # masks live inside their boxes
    for i in range(len(class_ids)):
        y1, x1, y2, x2 = boxes[i]
        outside = masks[i].copy()
        outside[y1:y2 + 1, x1:x2 + 1] = 0
        assert outside.sum() == 0


def test_get_pred_instance_mask_exact_match(examples_dir):
    """Feeding one instance's own mask as the 'prediction' must match exactly
    that instance with score 1.0."""
    npz_path = os.path.join(examples_dir, "seg_data", "9996_datas.npz")
    masks, class_ids, boxes = load_seg_data(npz_path)
    target = 0
    sel_masks, scores, sel_boxes, sel_ids, matched = get_pred_instance_mask(
        npz_path, masks[target].astype(np.float32))
    assert target in matched
    j = matched.index(target)
    assert scores[j] == pytest.approx(1.0)
    assert sel_ids[j] == class_ids[target]


def test_get_pred_instance_mask_empty(examples_dir):
    npz_path = os.path.join(examples_dir, "seg_data", "9996_datas.npz")
    zero = np.zeros((768, 768), dtype=np.float32)
    _, _, _, _, matched = get_pred_instance_mask(npz_path, zero)
    assert matched == []


def test_mask_occupied_percentage():
    a = np.zeros((4, 4)); a[:2] = 1
    b = np.zeros((4, 4)); b[:1] = 1
    assert compute_mask_occupied_percentage(a, b) == 1.0
    assert compute_mask_occupied_percentage(b, a) == 0.5
