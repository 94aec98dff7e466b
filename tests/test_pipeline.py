"""End-to-end pipeline tests on synthetic small-scale fixtures: compositing
op semantics vs the reference algorithms, plus the full color/withdraw
session flow (FG + BG) with freshly-initialized small models."""
import dataclasses
import json
import os

import numpy as np
import pytest
import scipy.io
from PIL import Image

from sketchyscenecolorization_tpu.config import (
    BGGanConfig, FGGanConfig, FrameworkConfig, MatchingConfig, PipelineConfig,
)
from sketchyscenecolorization_tpu.pipeline import compositing as comp
from sketchyscenecolorization_tpu.pipeline.factory import build_session

SIZE = 64          # scene size for the tiny fixture set
INST = 64          # instance (FG GAN) size


# ------------------------------------------------------------ compositing

def test_resize_and_padding_mask_image_shapes_and_white_pad():
    img = Image.fromarray(np.zeros((30, 10, 3), np.uint8))
    out = comp.resize_and_padding_mask_image(img, 192, margin_size=10)
    assert out.shape == (192, 192, 3)
    # aspect preserved: tall box -> horizontal white padding
    assert (out[:, :30] == 255).all() and (out[:, -30:] == 255).all()


def test_reverse_resize_roundtrip():
    rng = np.random.RandomState(0)
    box_h, box_w = 40, 25
    inst = (rng.rand(box_h, box_w, 3) * 255).astype(np.uint8)
    padded = comp.resize_and_padding_mask_image(
        Image.fromarray(np.repeat(inst[:, :, :1], 3, axis=2)), 192)
    rev = comp.reverse_resize_image(padded, box_h, box_w)
    assert rev.shape == (box_h, box_w, 3)


def test_is_road_not_single_line():
    # two long parallel horizontal lines -> crossing count 2 (even) for >25 columns
    road = np.full((64, 64, 3), 255, np.uint8)
    road[10, 5:60] = 0
    road[40, 5:60] = 0
    assert comp.is_road_not_single_line(road)
    # one line only -> odd crossings everywhere
    single = np.full((64, 64, 3), 255, np.uint8)
    single[20, 2:62] = 0
    assert not comp.is_road_not_single_line(single)


def test_is_road_matches_reference_loops():
    """Vectorized edge counting == the reference's O(HW) loop algorithm."""
    def reference_count(v):
        h, w = v.shape
        vert = v.copy()
        valid = 0
        for j in range(w):
            for i in range(h - 1):
                if vert[i + 1][j] == 1:
                    vert[i][j] = 0
            cross = np.sum(vert[:, j])
            if cross > 0 and cross % 2 == 0:
                valid += 1
        return valid

    rng = np.random.RandomState(3)
    v = (rng.rand(20, 20) > 0.8).astype(np.int32)
    edges = (v[:-1] == 1) & (v[1:] == 0)
    cross = edges.sum(axis=0) + v[-1]
    ours = int(((cross > 0) & (cross % 2 == 0)).sum())
    assert ours == reference_count(v)


def test_paste_and_overlay():
    result = np.full((16, 16, 3), 200, np.uint8)
    color = np.zeros((4, 4, 3), np.uint8)
    color[...] = [10, 20, 30]
    inner = np.zeros((16, 16), np.int32)
    inner[5:8, 5:8] = 3  # instance idx 2
    comp.paste_instance(result, color, inner, 2, (4, 4, 8, 8))
    assert (result[5:8, 5:8] == [10, 20, 30]).all()
    assert (result[4, 4] == 200).all()

    sketch = np.full((16, 16, 3), 255, np.uint8)
    sketch[2, 2:10] = 0
    region = comp.overlay_drawings(result, sketch, np.zeros((16, 16), np.int32))
    # strokes shifted by (+1, +1)
    assert region[3, 3] and not region[2, 2]
    assert (result[3, 3] == 0).all()


def test_add_color_gradient_preserves_fg_and_brightens_top():
    img = np.zeros((32, 32, 3), np.uint8)
    img[:16] = [100, 150, 200]   # "sky"
    img[16:] = [50, 200, 50]     # "ground"
    inner = np.zeros((32, 32), np.int32)
    inner[20:24, 20:24] = 1      # an FG instance
    img[inner != 0] = [255, 0, 0]
    out = comp.add_color_gradient(img, inner, search_from=2)
    assert (out[inner != 0] == [255, 0, 0]).all()          # FG untouched
    # top rows should be brighter (higher V) than the unmodified sky bottom
    assert out[0].mean() > img[12].mean() - 1e-6


def test_add_color_gradient_split_and_lut_match_full_roundtrip(monkeypatch):
    """The optimized gradient (HSV math on modified rows only + the 24-bit
    round-trip LUT below them) must be byte-equal to the original
    whole-image formulation: ramp S/V in a full-image ``rgb2hsv`` and
    convert everything back.  Exercises BOTH tail paths (direct math and
    LUT via a zeroed ``_LUT_MIN_PIXELS``)."""
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (64, 48, 3), np.uint8)
    img[:20] = [90, 140, 230]                        # dominant sky band
    inner = np.zeros((64, 48), np.int32)
    inner[40:50, 10:30] = 1
    img[inner != 0] = [255, 0, 0]

    # original formulation, inlined as the oracle
    img_bg = np.full(img.shape, 255, np.uint8)
    img_bg[inner == 0] = img[inner == 0]
    sky_color = [90, 140, 230]
    sky_bottom = -1
    target = np.array(sky_color, np.uint8)
    for i in range(img.shape[0] // 2, -1, -1):
        if (img_bg[i] == target).all(axis=1).any():
            sky_bottom = i
            break
    start_height = int(sky_bottom / 4 * 3)
    sky_hsv = comp.rgb2hsv(
        (np.array(sky_color, np.float32) / 255.0)[None, None, :])[0][0]
    hsv = comp.rgb2hsv(img_bg / 255.0)
    rows = np.arange(start_height, -1, -1)
    frac = (start_height - rows) / start_height
    hsv[rows, :, 1] = (frac * (sky_hsv[1] / 3.0)
                       + (1 - frac) * sky_hsv[1])[:, None]
    hsv[rows, :, 2] = (frac * min(1.0, sky_hsv[2] * 1.5)
                       + (1 - frac) * sky_hsv[2])[:, None]
    want = (comp.hsv2rgb(hsv) * 255.0).astype(np.uint8)
    want[inner != 0] = img[inner != 0]

    got_direct = comp.add_color_gradient(img, inner, search_from=2)
    np.testing.assert_array_equal(got_direct, want)

    monkeypatch.setattr(comp, "_LUT_MIN_PIXELS", 0)     # force the LUT tail
    monkeypatch.setattr(comp, "_ROUNDTRIP_LUT", None)   # fresh build
    got_lut = comp.add_color_gradient(img, inner, search_from=2)
    np.testing.assert_array_equal(got_lut, want)


# ------------------------------------------------------------ fixtures

CAT46 = ["bg_cat%d" % i for i in range(46)]
CAT46[7] = "bus"
CAT46[27] = "grass"
CAT46[36] = "road"


def write_fixtures(base, image_id=7):
    os.makedirs(os.path.join(base, "sketches"), exist_ok=True)
    os.makedirs(os.path.join(base, "seg_data"), exist_ok=True)
    os.makedirs(os.path.join(base, "inner_masks"), exist_ok=True)

    # sketch: white canvas, a black box outline (the "bus") + ground line
    sketch = np.full((SIZE, SIZE, 3), 255, np.uint8)
    sketch[10:30, 10:40][0, :] = 0
    sketch[10:30, 10:40][-1, :] = 0
    sketch[10:30, 10:40][:, 0] = 0
    sketch[10:30, 10:40][:, -1] = 0
    sketch[50, 2:62] = 0
    Image.fromarray(sketch).save(os.path.join(base, "sketches", f"{image_id}.png"))

    # instance 0: the bus (class 7); instance 1: grass (class 27)
    masks = np.empty(2, dtype=object)
    masks[0] = np.ones((21, 31), np.uint8)
    masks[1] = np.ones((5, 20), np.uint8)
    boxes = np.array([[10, 10, 30, 40], [52, 5, 56, 24]], np.int32)
    np.savez(os.path.join(base, "seg_data", f"{image_id}_datas.npz"),
             pred_masks=masks, pred_class_ids=np.array([7, 27]),
             pred_boxes=boxes)

    inner = np.zeros((SIZE, SIZE), np.uint8)
    inner[11:29, 11:39] = 1      # inst 0 interior
    inner[52:57, 5:25] = 2       # inst 1 (grass)
    scipy.io.savemat(os.path.join(base, "inner_masks", f"{image_id}.mat"),
                     {"inner_masks": inner})

    cm = np.empty((46, 2), dtype=object)
    for i in range(46):
        cm[i, 0] = np.array([CAT46[i]])
        cm[i, 1] = np.array([[120, 120, 120]], np.uint8)
    scipy.io.savemat(os.path.join(base, "colorMapC46.mat"), {"colorMap": cm})


def small_config(tmp_path) -> FrameworkConfig:
    return FrameworkConfig(
        matching=MatchingConfig(vf_h=SIZE // 8, vf_w=SIZE // 8, H=SIZE, W=SIZE,
                                vocab_size=16, w_emb_dim=16, v_emb_dim=16,
                                m_rnn_size=8, w_rnn_size=16, max_len=6),
        fg_gan=FGGanConfig(image_size=INST, vocab_size=16, max_len=6,
                           base_channels=4, noise_dim=8),
        bg_gan=BGGanConfig(image_size=SIZE, vocab_size=16, max_len=8,
                           ngf=4, ndf=4, multi_residual=False),
        pipeline=PipelineConfig(
            data_base_dir=str(tmp_path / "examples"),
            results_base_dir=str(tmp_path / "outputs"),
            match_vocab_path="", fg_vocab_path="", bg_vocab_path="",
            match_ckpt_dir="", fg_ckpt_dir="", bg_ckpt_dir="",
            image_size=SIZE, instance_size=INST),
    )


@pytest.fixture(scope="module")
def session_env(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("pipe")
    write_fixtures(str(tmp_path / "examples"))
    cfg = small_config(tmp_path)
    session = build_session(cfg, seed=0)
    return tmp_path, cfg, session


def test_full_fg_color_command(session_env):
    tmp_path, cfg, session = session_env
    out_path = session.colorize(7, "the bus is yellow")
    assert os.path.isfile(out_path)
    rec = json.load(open(tmp_path / "outputs" / "update_records" /
                         "7_records.json"))
    assert rec[-1]["colorization_type"] == "FG"
    assert rec[-1]["result_name"] == "7_1.png"
    # ungated pixel-content golden (fresh seed-0 session, first command;
    # recorded 2026-08-16 on the CPU backend): catches refactors that
    # silently change output imagery
    img = np.array(Image.open(out_path).convert("RGB"))
    np.testing.assert_allclose(img.mean(), 235.70068359375, rtol=2e-3)
    np.testing.assert_allclose(img.std(), 67.44525238921713, rtol=2e-3)

    # forcing a known instance exercises the GAN + paste path
    out2 = session.colorize_foreground(7, "the bus is yellow", [0],
                                       "7_forced.png", "")
    img = np.array(Image.open(out2))
    assert img.shape == (SIZE, SIZE, 3)
    # the instance interior must differ from the untouched white canvas
    assert (img[15:25, 15:35] != 255).any()


def test_full_bg_color_command_and_withdraw(session_env):
    tmp_path, cfg, session = session_env
    out_path = session.colorize(7, "the sky is blue and the ground is green")
    assert os.path.isfile(out_path)
    # ungated pixel-content golden (second command on the seed-0 session,
    # base image 7_1.png; recorded 2026-08-16, CPU backend)
    img_g = np.array(Image.open(out_path).convert("RGB"))
    np.testing.assert_allclose(img_g.mean(), 144.49169921875, rtol=2e-3)
    np.testing.assert_allclose(img_g.std(), 80.91867197418517, rtol=2e-3)
    rec = json.load(open(tmp_path / "outputs" / "update_records" /
                         "7_records.json"))
    assert rec[-1]["colorization_type"] == "BG"
    assert rec[-1]["proc_bg_text"] == "the sky is blue and the ground is green"
    n_before = len(rec)

    session.withdraw(7)
    rec2 = json.load(open(tmp_path / "outputs" / "update_records" /
                          "7_records.json"))
    assert len(rec2) == n_before - 1
    assert not os.path.isfile(out_path)


def test_fg_rejects_unknown_category(session_env):
    tmp_path, cfg, session = session_env
    # instance index 1 is grass in our fixtures -- allowed; craft a bad one
    # by rewriting the npz with a non-colorizable class (e.g. 0)
    base = str(tmp_path / "examples")
    masks = np.empty(1, dtype=object)
    masks[0] = np.ones((4, 4), np.uint8)
    np.savez(os.path.join(base, "seg_data", "8_datas.npz"),
             pred_masks=masks, pred_class_ids=np.array([0]),
             pred_boxes=np.array([[1, 1, 4, 4]], np.int32))
    img = Image.fromarray(np.full((SIZE, SIZE, 3), 255, np.uint8))
    img.save(os.path.join(base, "sketches", "8.png"))
    scipy.io.savemat(os.path.join(base, "inner_masks", "8.mat"),
                     {"inner_masks": np.zeros((SIZE, SIZE), np.uint8)})
    with pytest.raises(ValueError, match="Wrong matching instance"):
        session.colorize_foreground(8, "the dog is red", [0], "8_1.png", "")


def test_predict_masks_batched_matches_single(session_env):
    tmp_path, cfg, session = session_env
    from sketchyscenecolorization_tpu.data.fixtures import load_sketch_image
    sketch = load_sketch_image(
        str(tmp_path / "examples" / "sketches" / "7.png"),
        dtype=np.uint8, size=SIZE)
    texts = ["the bus", "the bus is yellow", "the grass"]
    batched = session.matching.predict_masks(sketch, texts)
    assert batched.shape == (3, SIZE, SIZE)
    for i, t in enumerate(texts):
        single = session.matching.predict_mask(sketch, t)
        np.testing.assert_array_equal(batched[i], single)


def test_road_instance_goes_through_margin0_path(session_env):
    """A road instance (class 36) uses margin 0 and must pass the
    single-line guard when it has parallel strokes."""
    tmp_path, cfg, session = session_env
    base = str(tmp_path / "examples")
    sketch = np.full((SIZE, SIZE, 3), 255, np.uint8)
    sketch[40, 2:62] = 0
    sketch[50, 2:62] = 0
    Image.fromarray(sketch).save(os.path.join(base, "sketches", "9.png"))
    road_mask = np.zeros((21, 61), np.uint8)
    road_mask[0, :] = 1
    road_mask[10, :] = 1
    masks = np.empty(1, dtype=object)
    masks[0] = road_mask
    np.savez(os.path.join(base, "seg_data", "9_datas.npz"),
             pred_masks=masks, pred_class_ids=np.array([36]),
             pred_boxes=np.array([[40, 2, 60, 62]], np.int32))
    inner = np.zeros((SIZE, SIZE), np.uint8)
    inner[40:52, 2:62] = 1
    scipy.io.savemat(os.path.join(base, "inner_masks", "9.mat"),
                     {"inner_masks": inner})
    out = session.colorize_foreground(9, "the road is gray", [0],
                                      "9_1.png", "")
    assert os.path.isfile(out)

    # a single-line road must be rejected (``fg_color_utils.py:306-308``)
    masks1 = np.empty(1, dtype=object)
    single = np.zeros((21, 61), np.uint8)
    single[10, :] = 1
    masks1[0] = single
    np.savez(os.path.join(base, "seg_data", "9_datas.npz"),
             pred_masks=masks1, pred_class_ids=np.array([36]),
             pred_boxes=np.array([[40, 2, 60, 62]], np.int32))
    with pytest.raises(ValueError, match="single line"):
        session.colorize_foreground(9, "the road is gray", [0],
                                    "9_2.png", "")


def test_session_with_pix2pix_variants(tmp_path_factory):
    """Engines honor block_type / residual_enc_g: a session built with the
    Pix2Pix FG generator and the pix2pix BG generator (no region branch)
    still colorizes end-to-end."""
    tmp_path = tmp_path_factory.mktemp("pipe_p2p")
    write_fixtures(str(tmp_path / "examples"))
    cfg = small_config(tmp_path)
    cfg = dataclasses.replace(
        cfg,
        fg_gan=dataclasses.replace(cfg.fg_gan, block_type="Pix2Pix"),
        bg_gan=dataclasses.replace(cfg.bg_gan, residual_enc_g=False,
                                   residual_enc_d=False))
    session = build_session(cfg, seed=0)
    out1 = session.colorize_foreground(7, "the bus is yellow", [0],
                                       "7_p2p.png", "")
    assert os.path.isfile(out1)
    out2, proc = session.colorize_background(
        7, "the sky is blue and the ground is green", "7_p2p_bg.png", "", "")
    assert os.path.isfile(out2)
    assert proc == "the sky is blue and the ground is green"
