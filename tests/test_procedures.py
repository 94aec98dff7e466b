"""Eval/inference procedures + align-corners resize + eval_matching loop."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import scipy.io
from PIL import Image

from sketchyscenecolorization_tpu.config import BGGanConfig, FGGanConfig
from sketchyscenecolorization_tpu.ops.image import (
    resize_bilinear_align_corners, tf1_resize_bilinear,
)


def test_align_corners_resize_exact_formula():
    # align_corners: src = dst * (in-1)/(out-1); corners map exactly
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    y = resize_bilinear_align_corners(x, 7, 7)
    assert y.shape == (1, 7, 7, 1)
    np.testing.assert_allclose(y[0, 0, 0, 0], x[0, 0, 0, 0])
    np.testing.assert_allclose(y[0, -1, -1, 0], x[0, -1, -1, 0])
    # midpoint of a linear ramp stays linear
    np.testing.assert_allclose(y[0, 3, 3, 0], 7.5, rtol=1e-6)


def test_tf1_resize_upscale_identity_on_corners():
    x = jnp.arange(4, dtype=jnp.float32).reshape(1, 2, 2, 1)
    y = tf1_resize_bilinear(x, 4, 4)
    # legacy grid: src = dst * in/out -> top-left exact, bottom-right clamped
    np.testing.assert_allclose(y[0, 0, 0, 0], 0.0)
    assert y.shape == (1, 4, 4, 1)


def test_fg_validation_and_inference(tmp_path):
    from sketchyscenecolorization_tpu.data import write_record_shard
    from sketchyscenecolorization_tpu.train.eval_procedures import (
        fg_inference, fg_validation)
    from sketchyscenecolorization_tpu.train.fg_gan import create_fg_gan_state

    cfg = FGGanConfig(batch_size=1, image_size=64, vocab_size=10, max_len=4,
                      base_channels=4, noise_dim=8)
    state = create_fg_gan_state(jax.random.PRNGKey(0), cfg)

    rng = np.random.RandomState(0)
    shard = str(tmp_path / "bus.npz")
    write_record_shard(shard, ["a.png"],
                       rng.randint(0, 255, (1, 384, 384, 3), dtype=np.uint8),
                       rng.randint(0, 255, (1, 384, 384, 3), dtype=np.uint8),
                       "bus", np.zeros(1, np.int32), ["red"],
                       np.zeros((1, 4), np.uint8))
    n = fg_validation(cfg, state.g_params, [shard], str(tmp_path / "res"))
    assert n == 1
    out = os.listdir(tmp_path / "res" / "with_text")
    assert sorted(out) == ["bus_a_input.png", "bus_a_output.png",
                           "bus_a_target.png"]

    sketch_png = str(tmp_path / "bus.png")
    Image.fromarray(np.full((40, 30, 3), 255, np.uint8)).save(sketch_png)
    vocab = {"<pad>": 0, "<unk>": 1, "red": 2}
    path = fg_inference(cfg, state.g_params, sketch_png, "bus",
                        ["bench", "bird", "bus"], "red", vocab,
                        str(tmp_path / "inf"))
    assert os.path.isfile(path)
    assert np.array(Image.open(path)).shape == (64, 64, 3)


def test_eval_matching_loop_with_stub_predictor(tmp_path, monkeypatch):
    import sketchyscenecolorization_tpu.data.matching_dataset as md
    monkeypatch.setattr(md, "IMAGE_SIZE", 48)
    from sketchyscenecolorization_tpu.train import eval_matching

    base = str(tmp_path / "val")
    for d in ("DRAWING_GT", "CLASS_GT", "INSTANCE_GT"):
        os.makedirs(os.path.join(base, d), exist_ok=True)
    img = np.full((48, 48, 3), 255, np.uint8)
    img[10:20, 10:30] = 0
    Image.fromarray(img).save(os.path.join(base, "DRAWING_GT", "L0_sample1.png"))
    inst = np.zeros((48, 48), np.uint8)
    inst[10:20, 10:30] = 1
    cls = np.zeros((48, 48), np.uint8)
    cls[10:20, 10:30] = 7
    scipy.io.savemat(os.path.join(base, "INSTANCE_GT", "sample_1_instance.mat"),
                     {"INSTANCE_GT": inst})
    scipy.io.savemat(os.path.join(base, "CLASS_GT", "sample_1_class.mat"),
                     {"CLASS_GT": cls})
    caps = str(tmp_path / "caps.json")
    json.dump([{"key": 1, "sen_instIdx_map": {"the bus": [0]}}],
              open(caps, "w"))

    # oracle predictor: return the GT mask -> IoU 1.0, precision@all = 1
    gt_mask = (inst == 1).astype(np.float32)
    result = eval_matching(lambda im, cap: gt_mask.copy(), base, caps,
                           compute_mask_ap=False, augment=False,
                           result_path=str(tmp_path / "res.txt"))
    assert result.cum_iou == 1.0
    assert result.precision_at[0.9] == 1.0
    assert os.path.isfile(tmp_path / "res.txt")

    # adversarial predictor: empty mask -> IoU 0
    result2 = eval_matching(lambda im, cap: np.zeros_like(gt_mask), base,
                            caps, compute_mask_ap=False, augment=False)
    assert result2.cum_iou == 0.0

    # the batched path (backbone once per image) must give the same result
    result3 = eval_matching(
        None, base, caps, compute_mask_ap=False, augment=False,
        predict_batch_fn=lambda im, captions: np.stack(
            [gt_mask.copy() for _ in captions]))
    assert result3.cum_iou == 1.0


def test_bg_test_procedure(tmp_path):
    from sketchyscenecolorization_tpu.data import BGDataset
    from sketchyscenecolorization_tpu.pipeline.engines import BGColorizeEngine
    from sketchyscenecolorization_tpu.train.bg_gan import create_bg_gan_state
    from sketchyscenecolorization_tpu.train.eval_procedures import bg_test

    size = 64
    cfg = BGGanConfig(batch_size=1, image_size=size, vocab_size=8, max_len=4,
                      ngf=4, ndf=4, multi_residual=False)
    for d in ("fg", "bg", "seg"):
        os.makedirs(tmp_path / d, exist_ok=True)
    img = np.random.randint(0, 255, (size, size, 3), dtype=np.uint8)
    Image.fromarray(img).save(tmp_path / "fg" / "a.png")
    Image.fromarray(img).save(tmp_path / "bg" / "a.png")
    json.dump([{"fg_name": "a.png", "bg_name": "a.png",
                "color_text": "the sky is blue"}],
              open(tmp_path / "split.json", "w"))
    vocab = {"<pad>": 0, "<unk>": 1, "sky": 2, "is": 3, "blue": 4}
    ds = BGDataset(str(tmp_path / "split.json"), str(tmp_path / "fg"),
                   str(tmp_path / "bg"), str(tmp_path / "seg"), vocab,
                   image_size=size, max_len=4)
    state = create_bg_gan_state(jax.random.PRNGKey(0), cfg)
    engine = BGColorizeEngine(cfg, state.g_params, vocab)
    n = bg_test(cfg, engine, ds, str(tmp_path / "out"))
    assert n == 1
    assert sorted(os.listdir(tmp_path / "out")) == [
        "a-inputs.png", "a-outputs.png", "a-targets.png"]
