"""Validation / test / inference procedures for the three modules
(reference ``obj_lib/main_procedure.py:245-621``,
``bg_colorization_main.py:834-892``, ``matching_main.py:420-488``).

These are the PNG-dump evaluation loops the reference uses in place of an
automated test suite; outputs are written with PIL in RGB (the reference's
cv2 BGR-flip round-trip lands on the same bytes for outputs/targets; its
*input* sketches were saved channel-swapped -- a quirk not reproduced).
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..config import BGGanConfig, FGGanConfig
from ..data.fg_records import preprocess_pair, read_record_shard
from ..pipeline.compositing import (
    resize_and_padding_mask_image, thicken_drawings,
)
from ..utils.visualization import visualize_sem_seg


def _to_uint8(x: np.ndarray) -> np.ndarray:
    return (((x + 1.0) / 2.0) * 255.0).astype(np.uint8)


def fg_validation(cfg: FGGanConfig, g_params, shard_paths: Sequence[str],
                  results_dir: str, seed: int = 0,
                  max_items: Optional[int] = None) -> int:
    """Dump (input, output, target) PNG triplets over record shards
    (``main_procedure.validation``).  Returns the number of items written."""
    from .fg_gan import build_models
    gen, _ = build_models(cfg)
    sub = "with_text" if cfg.lstm_hybrid else "without_text"
    out_dir = os.path.join(results_dir, sub)
    os.makedirs(out_dir, exist_ok=True)

    @jax.jit
    def forward(params, sketch, tokens, labels, noise):
        return gen.apply({"params": params}, sketch, tokens, labels, noise)

    rng = jax.random.PRNGKey(seed)
    count = 0
    for path in shard_paths:
        rec = read_record_shard(path)
        category = os.path.splitext(os.path.basename(path))[0]
        for i in range(len(rec["cartoons"])):
            img, sk = preprocess_pair(rec["cartoons"][i], rec["sketches"][i],
                                      cfg.image_size, cfg.distance_map)
            rng, k = jax.random.split(rng)
            noise = jax.random.normal(k, (1, cfg.noise_dim), jnp.float32)
            out = forward(g_params, jnp.asarray(sk[None]),
                          jnp.asarray(rec["text_indices"][i].astype(np.int32)[None]),
                          jnp.asarray(rec["category_ids"][i:i + 1].astype(np.int32)),
                          noise)
            stem = f"{category}_{str(rec['names'][i])[:-4]}"
            Image.fromarray(_to_uint8(np.array(out)[0])).save(
                os.path.join(out_dir, stem + "_output.png"))
            Image.fromarray(_to_uint8(img)).save(
                os.path.join(out_dir, stem + "_target.png"))
            Image.fromarray(_to_uint8(sk)).save(
                os.path.join(out_dir, stem + "_input.png"))
            count += 1
            if max_items and count >= max_items:
                return count
    return count


def fg_inference(cfg: FGGanConfig, g_params, sketch_path: str, category: str,
                 categories: Sequence[str], instruction: str,
                 vocab: Dict[str, int], results_dir: str,
                 seed: int = 0) -> str:
    """Single wild-image colorization (``main_procedure.inference``):
    resize+pad (road gets no margin), normalize to [-1,1], GAN forward,
    save PNG.  Unknown categories fall back like the reference."""
    from .fg_gan import build_models
    from ..text import colorization_encode
    gen, _ = build_models(cfg)
    os.makedirs(results_dir, exist_ok=True)
    if category not in categories:
        category = categories[2]

    image = Image.open(sketch_path).convert("RGB")
    s = cfg.image_size
    if image.width != s or image.height != s:
        margin = 0 if category == "road" else 10
        sketch = resize_and_padding_mask_image(image, s, margin_size=margin)
    else:
        sketch = np.array(image, dtype=np.uint8)
    x = sketch.astype(np.float32) / 255.0 * 2.0 - 1.0

    tokens = colorization_encode(instruction, vocab, cfg.max_len)
    noise = jax.random.normal(jax.random.PRNGKey(seed),
                              (1, cfg.noise_dim), jnp.float32)
    out = jax.jit(lambda p, a, b, c, d: gen.apply({"params": p}, a, b, c, d))(
        g_params, jnp.asarray(x[None]),
        jnp.asarray(np.asarray(tokens, np.int32)[None]),
        jnp.asarray(np.asarray([categories.index(category)], np.int32)),
        noise)
    out_path = os.path.join(
        results_dir, os.path.basename(sketch_path)[:-4] + "_output.png")
    Image.fromarray(_to_uint8(np.array(out)[0])).save(out_path)
    return out_path


def bg_test(cfg: BGGanConfig, engine, dataset, results_dir: str,
            max_items: Optional[int] = None) -> int:
    """BG test loop (``bg_colorization_main.py:834-892``): per entry, run the
    generator, write input/output/target PNGs, then paste the FG back over
    the output via the inner mask (mask==0 is FG); ``engine`` is a
    ``BGColorizeEngine``."""
    import os.path as osp
    from ..data.bg_dataset import load_image
    os.makedirs(results_dir, exist_ok=True)
    count = 0
    for entry in dataset.entries:
        inputs = load_image(osp.join(dataset.inputs_base_dir, entry["fg_name"]),
                            cfg.image_size)[0]
        targets = load_image(osp.join(dataset.targets_base_dir, entry["bg_name"]),
                             cfg.image_size)[0]
        out, _ = engine.colorize(inputs, entry["color_text"])
        stem = entry["bg_name"][:-4]
        Image.fromarray(inputs).save(os.path.join(results_dir, stem + "-inputs.png"))
        Image.fromarray(targets).save(os.path.join(results_dir, stem + "-targets.png"))

        mask_path = osp.join(dataset.segment_base_dir, entry["fg_name"])
        if os.path.isfile(mask_path):
            inner = np.array(Image.open(mask_path).convert("RGB"),
                             dtype=np.uint8)[:, :, 0]
            out = out.copy()
            out[inner == 0] = inputs[inner == 0]
        Image.fromarray(out).save(os.path.join(results_dir, stem + "-outputs.png"))
        count += 1
        if max_items and count >= max_items:
            break
    return count


def fg_test(cfg: FGGanConfig, g_params, data_base_dir: str, results_dir: str,
            vocab: Dict[str, int], seed: int = 0,
            max_items: Optional[int] = None) -> int:
    """FG test mode (``main_procedure.test`` :361-492): per category, iterate
    captions/<cat>/test.json, load images/<cat>/sketch/<name>, resize+pad
    (road gets no margin), encode the caption, forward, save the output."""
    import json
    from ..text import colorization_encode
    from .fg_gan import build_models
    gen, _ = build_models(cfg)
    os.makedirs(results_dir, exist_ok=True)
    cap_base = os.path.join(data_base_dir, "captions")
    categories = sorted(d for d in os.listdir(cap_base)
                        if os.path.isdir(os.path.join(cap_base, d)))

    @jax.jit
    def forward(params, sketch, tokens, labels, noise):
        return gen.apply({"params": params}, sketch, tokens, labels, noise)

    rng = jax.random.PRNGKey(seed)
    s = cfg.image_size
    count = 0
    for class_id, cate in enumerate(categories):
        with open(os.path.join(data_base_dir, "captions", cate,
                               "test.json")) as f:
            entries = json.load(f)
        for e in entries:
            image = Image.open(os.path.join(
                data_base_dir, "images", cate, "sketch",
                e["key"])).convert("RGB")
            if image.width != s or image.height != s:
                margin = 0 if cate == "road" else 10
                sketch = resize_and_padding_mask_image(image, s,
                                                       margin_size=margin)
            else:
                sketch = np.array(image, dtype=np.uint8)
            if cate in ("house", "road"):     # main_procedure.py:443-444
                sketch = thicken_drawings(sketch)
            x = sketch.astype(np.float32) / 255.0 * 2.0 - 1.0
            tokens = colorization_encode(e["color_text"], vocab, cfg.max_len)
            rng, k = jax.random.split(rng)
            noise = jax.random.normal(k, (1, cfg.noise_dim), jnp.float32)
            out = forward(g_params, jnp.asarray(x[None]),
                          jnp.asarray(np.asarray(tokens, np.int32)[None]),
                          jnp.asarray(np.asarray([class_id], np.int32)), noise)
            Image.fromarray(_to_uint8(np.array(out)[0])).save(
                os.path.join(results_dir, f"{cate}_{e['key'][:-4]}_output.png"))
            Image.fromarray(_to_uint8(x)).save(
                os.path.join(results_dir, f"{cate}_{e['key'][:-4]}_input.png"))
            count += 1
            if max_items and count >= max_items:
                return count
    return count


def matching_inference(engine, sketch_path: str, instruction: str,
                       results_dir: str, image_size: int = 768) -> str:
    """Single-instruction matching visualization (``matching_main.inference``)."""
    from ..data.fixtures import load_sketch_image
    os.makedirs(results_dir, exist_ok=True)
    sketch = load_sketch_image(sketch_path, dtype=np.uint8, size=image_size)
    predicts = engine.predict_mask(sketch, instruction)
    out_path = os.path.join(
        results_dir, os.path.basename(sketch_path)[:-4] + "_pred.png")
    visualize_sem_seg(sketch, predicts, instruction, out_path)
    return out_path
