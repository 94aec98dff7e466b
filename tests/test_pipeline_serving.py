"""Serving-path equivalences: every optimization on the interactive pipeline
(device-side instance scoring, batched per-sample-BN GAN forwards, device
uint8 conversion, the fast PNG writer, write-behind saving, per-image
caching, request-batched streaming) must be output-preserving vs the
sequential reference formulation.
"""
import dataclasses
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from sketchyscenecolorization_tpu.pipeline.io import AsyncPngWriter, write_png
from test_pipeline import SIZE, small_config, write_fixtures


# ------------------------------------------------------------------ PNG IO

@pytest.mark.parametrize("level", [0, 1])
def test_write_png_roundtrip(tmp_path, level):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (37, 53, 3), np.uint8)
    p = str(tmp_path / "x.png")
    write_png(p, img, level)
    back = np.array(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(back, img)


def test_async_writer_flush_and_error_surface(tmp_path):
    w = AsyncPngWriter()
    img = np.zeros((8, 8, 3), np.uint8)
    p = str(tmp_path / "a.png")
    w.save(p, img)
    w.flush()
    assert os.path.isfile(p)
    # a bad path surfaces on the next flush, not silently
    w.save(str(tmp_path / "no_dir" / "b.png"), img)
    with pytest.raises(OSError):
        w.flush()
    w.close()


# ------------------------------------------------- batched FG == sequential

def test_fg_colorize_batch_matches_sequential_loop():
    from sketchyscenecolorization_tpu.config import FGGanConfig
    from sketchyscenecolorization_tpu.pipeline.engines import FGColorizeEngine
    from sketchyscenecolorization_tpu.train.fg_gan import build_models
    cfg = FGGanConfig(image_size=32, vocab_size=12, max_len=6,
                      base_channels=8, num_classes=5, noise_dim=8)
    gen, _ = build_models(cfg)
    s = cfg.image_size
    params = gen.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, s, s, 3), jnp.float32),
                      jnp.zeros((1, cfg.max_len), jnp.int32),
                      jnp.zeros((1,), jnp.int32),
                      jnp.zeros((1, cfg.noise_dim), jnp.float32))["params"]
    vocab = {"<pad>": 0, "<unk>": 1, "red": 2, "blue": 3}
    rng = np.random.RandomState(0)
    sketches = rng.uniform(-1, 1, (3, s, s, 3)).astype(np.float32)
    class_ids = [1, 4, 2]

    seq_engine = FGColorizeEngine(cfg, params, vocab, seed=7)
    seq = []
    for k in range(3):
        out = seq_engine.colorize(sketches[k], class_ids[k], "red blue")
        seq.append((((out[0] + 1.0) / 2.0) * 255.0).astype(np.uint8))

    batch_engine = FGColorizeEngine(cfg, params, vocab, seed=7)
    # K=3 pads to the 4-bucket: pad rows must be inert
    batched = batch_engine.colorize_batch(sketches, class_ids, "red blue")
    assert batched.dtype == np.uint8 and batched.shape == (3, s, s, 3)
    for k in range(3):
        # per-sample-BN batched forward vs batch-1 loop: identical math,
        # tolerance covers reduction-order differences only
        diff = np.abs(batched[k].astype(int) - seq[k].astype(int))
        assert diff.max() <= 1, f"instance {k}: max diff {diff.max()}"
        assert (diff > 0).mean() < 0.01


# ----------------------------- stream serving + device scoring == sequential

def test_stream_scoring_and_streaming_match_sequential(tmp_path):
    """One combined heavy test (two compiled sessions):
    - device-side instance scoring == host get_pred_instance_mask
    - colorize_stream (one matching + one GAN dispatch per FG run) produces
      byte-identical images and records vs sequential colorize calls.
    """
    from sketchyscenecolorization_tpu.pipeline.factory import build_session
    write_fixtures(str(tmp_path / "ex_a"), image_id=7)
    write_fixtures(str(tmp_path / "ex_b"), image_id=7)

    def cfg_for(base, out):
        c = small_config(tmp_path)
        return dataclasses.replace(c, pipeline=dataclasses.replace(
            c.pipeline, data_base_dir=str(tmp_path / base),
            results_base_dir=str(tmp_path / out)))

    seq = build_session(cfg_for("ex_a", "out_a"), seed=0)

    # --- device scoring vs host matcher
    for text in ("the bus is yellow", "the grass", "the bus"):
        dev = seq.match_instances(7, text)
        host = seq.match_instances_host(7, text)
        assert dev == [int(i) for i in host], (text, dev, host)

    # --- stream vs sequential (mixed FG run + BG + FG)
    texts = ["the bus is yellow", "the grass is green",
             "the sky is blue and the ground is green", "the bus is red"]
    seq_paths = [seq.colorize(7, t) for t in texts]
    stream = build_session(cfg_for("ex_b", "out_b"), seed=0)
    stream_paths = stream.colorize_stream(7, texts)

    assert [os.path.basename(p) for p in seq_paths] == \
        [os.path.basename(p) for p in stream_paths]
    for a, b in zip(seq_paths, stream_paths):
        np.testing.assert_array_equal(
            np.array(Image.open(a).convert("RGB")),
            np.array(Image.open(b).convert("RGB")), err_msg=a)
    rec_a = json.load(open(tmp_path / "out_a" / "update_records" /
                           "7_records.json"))
    rec_b = json.load(open(tmp_path / "out_b" / "update_records" /
                           "7_records.json"))
    assert rec_a == rec_b


def test_async_session_matches_sync_and_withdraw_flushes(tmp_path):
    """Write-behind PNG saving: byte-identical outputs, and withdraw sees a
    consistent disk state (flush-before-delete)."""
    from sketchyscenecolorization_tpu.pipeline.factory import build_session
    write_fixtures(str(tmp_path / "ex_a"), image_id=7)
    write_fixtures(str(tmp_path / "ex_b"), image_id=7)

    def run(base, out, async_writes):
        c = small_config(tmp_path)
        cfg = dataclasses.replace(c, pipeline=dataclasses.replace(
            c.pipeline, data_base_dir=str(tmp_path / base),
            results_base_dir=str(tmp_path / out),
            async_png_writes=async_writes))
        session = build_session(cfg, seed=0)
        p1 = session.colorize(7, "the bus is yellow")
        p2 = session.colorize(7, "the sky is blue and the ground is green")
        session.flush()
        return session, p1, p2

    _, a1, a2 = run("ex_a", "out_a", False)
    s_async, b1, b2 = run("ex_b", "out_b", True)
    np.testing.assert_array_equal(np.array(Image.open(a1).convert("RGB")),
                                  np.array(Image.open(b1).convert("RGB")))
    np.testing.assert_array_equal(np.array(Image.open(a2).convert("RGB")),
                                  np.array(Image.open(b2).convert("RGB")))

    # withdraw on the async session flushes pending writes first
    p3 = s_async.colorize(7, "the bus is red")
    s_async.withdraw(7)
    assert os.path.isfile(b1) and os.path.isfile(b2)
    assert not os.path.isfile(p3)


def test_cold_backbone_matches_warm_cache(tmp_path):
    """cache_visual_features=False (backbone per instruction) selects the
    same instances as the cached-feature path."""
    from sketchyscenecolorization_tpu.pipeline.factory import build_session
    write_fixtures(str(tmp_path / "examples"))
    cfg = small_config(tmp_path)
    cold_cfg = dataclasses.replace(
        cfg, pipeline=dataclasses.replace(cfg.pipeline,
                                          cache_visual_features=False))
    warm = build_session(cfg, seed=0)
    cold = build_session(cold_cfg, seed=0)
    assert warm.match_instances(7, "the bus") == \
        cold.match_instances(7, "the bus")
