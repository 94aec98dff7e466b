"""Interactive colorization session: the end-to-end instruction pipeline.

Reproduces ``sketchyscene_colorization_main.py:16-55`` and the
``Pipeline_utils`` orchestration on top of the jitted engines:

color (FG):  route -> RMI matching -> instance indices -> per-instance
             crop/resize/pad -> GAN forward -> un-resize -> paste via inner
             mask -> drawing overlay -> save + record.
color (BG):  route -> merge sky/ground text with history -> extract FG ->
             BG GAN at 768^2 -> paste FG back -> drawing overlay -> optional
             HSV sky gradient -> save + record.
withdraw:    delete the newest result image + truncate the record JSON.

Unlike the reference (fresh TF graph + session per stage per command), a
``ColorizationSession`` keeps all three compiled models alive across
instructions.
"""
from __future__ import annotations

import os
from typing import Dict, List, Sequence, Tuple

import numpy as np
from PIL import Image

from ..config import FrameworkConfig
from ..data.fixtures import (
    get_pred_instance_mask, load_color_map, load_inner_mask, load_seg_data,
    load_sketch_image,
)
from ..data.records import fetch_records, update_records, withdraw_records
from ..text import judge_colorize_type, segment_user_input_text
from ..text.bg_text import DEFAULT_BG_TEXT, combine_bg_input_text
from . import compositing as comp
from .engines import BGColorizeEngine, FGColorizeEngine, MatchingEngine


class ColorizationSession:
    """Holds the three engines plus the per-image data paths."""

    def __init__(self, cfg: FrameworkConfig, matching: MatchingEngine,
                 fg: FGColorizeEngine, bg: BGColorizeEngine):
        self.cfg = cfg
        self.matching = matching
        self.fg = fg
        self.bg = bg

    # ---------------------------------------------------------------- paths
    def _paths(self, image_id) -> Dict[str, str]:
        base = self.cfg.pipeline.data_base_dir
        return {
            "sketch": os.path.join(base, "sketches", f"{image_id}.png"),
            "seg_data": os.path.join(base, "seg_data", f"{image_id}_datas.npz"),
            "inner_mask": os.path.join(base, "inner_masks", f"{image_id}.mat"),
            "color_map": os.path.join(base, "colorMapC46.mat"),
        }

    def _results_dir(self, image_id) -> str:
        d = os.path.join(self.cfg.pipeline.results_base_dir, "results",
                         str(image_id))
        os.makedirs(d, exist_ok=True)
        return d

    # ----------------------------------------------------------------- API
    def colorize(self, image_id, input_text: str) -> str:
        """One 'color' command; returns the path of the new result image."""
        assert input_text
        colorization_type = judge_colorize_type(input_text)
        new_name, last_name, last_bg_text, summary = fetch_records(
            image_id, self.cfg.pipeline.results_base_dir)

        if colorization_type == "FG":
            inst_indices = self.match_instances(image_id, input_text)
            out_path = self.colorize_foreground(
                image_id, input_text, inst_indices, new_name, last_name)
            proc_bg_text = last_bg_text
        else:
            out_path, proc_bg_text = self.colorize_background(
                image_id, input_text, new_name, last_name, last_bg_text)

        update_records(image_id, input_text, self.cfg.pipeline.results_base_dir,
                       colorization_type, new_name, proc_bg_text, summary)
        return out_path

    def withdraw(self, image_id) -> None:
        withdraw_records(image_id, self.cfg.pipeline.results_base_dir)

    # ------------------------------------------------------------- matching
    def match_instances(self, image_id, input_text: str) -> List[int]:
        """``build_instance_matching`` (``fg_matching_utils.py:14-77``)."""
        paths = self._paths(image_id)
        sketch = load_sketch_image(paths["sketch"], dtype=np.uint8, size=self.cfg.pipeline.image_size)
        predicts = self.matching.predict_mask(sketch, input_text)
        _, _, _, _, matched = get_pred_instance_mask(
            paths["seg_data"], predicts.copy(),
            self.cfg.pipeline.mask_occupied_threshold)
        return matched

    # ------------------------------------------------------------------ FG
    def colorize_foreground(self, image_id, input_text: str,
                            inst_indices: Sequence[int], new_name: str,
                            last_name: str) -> str:
        """``build_instance_colorization`` (``fg_color_utils.py:188-363``)."""
        assert isinstance(inst_indices, list)
        paths = self._paths(image_id)
        instance_size = self.cfg.pipeline.instance_size

        categories46 = load_color_map(paths["color_map"])
        sketch_image = load_sketch_image(paths["sketch"], dtype=np.uint8, size=self.cfg.pipeline.image_size)
        inner_mask = load_inner_mask(paths["inner_mask"])
        results_dir = self._results_dir(image_id)

        if last_name == "":
            base_image = sketch_image.copy()
        else:
            base_image = np.array(Image.open(
                os.path.join(results_dir, last_name)).convert("RGB"),
                dtype=np.uint8)
        new_result = base_image.copy()

        pred_masks, pred_class_ids, pred_boxes = load_seg_data(paths["seg_data"], size=self.cfg.pipeline.image_size)
        grass_indices = [i for i, c in enumerate(pred_class_ids)
                         if c == comp.GRASS_LABEL]

        inst_color_text = segment_user_input_text(input_text)

        for inst_idx in inst_indices:
            class_id46 = int(pred_class_ids[inst_idx])
            bbox = pred_boxes[inst_idx]
            y1, x1, y2, x2 = (int(b) for b in bbox)
            if class_id46 not in comp.SKE_ID_TO_CAT_ID:
                raise ValueError(
                    f"Wrong matching instance: {categories46[class_id46]}")

            # crop -> white-bg mask image -> resize+pad to instance size
            inst_mask = pred_masks[inst_idx][y1:y2, x1:x2]
            mask_img = np.full((inst_mask.shape[0], inst_mask.shape[1], 3),
                               255, dtype=np.uint8)
            mask_img[inst_mask == 1] = [0, 0, 0]
            pil = Image.fromarray(mask_img, "RGB")
            if pil.width != instance_size or pil.height != instance_size:
                margin = 0 if class_id46 == comp.ROAD_LABEL else 10
                instance_sketch = comp.resize_and_padding_mask_image(
                    pil, instance_size, margin_size=margin)
            else:
                instance_sketch = np.array(pil, dtype=np.uint8)

            if class_id46 == comp.ROAD_LABEL:
                if not comp.is_road_not_single_line(instance_sketch.copy()):
                    raise ValueError("Road is single line")
            if class_id46 == comp.GRASS_LABEL:
                instance_sketch = comp.thicken_drawings(instance_sketch)

            x = instance_sketch.astype(np.float32) / 255.0 * 2.0 - 1.0
            generated = self.fg.colorize(
                x, comp.SKE_ID_TO_CAT_ID[class_id46], inst_color_text)
            color_instance = comp.instance_result_postprocessing(
                generated, bbox, class_id46)
            comp.paste_instance(new_result, color_instance, inner_mask,
                                inst_idx, bbox)

        no_grass = comp.grass_free_inner_mask(inner_mask, grass_indices)
        comp.overlay_drawings(new_result, sketch_image, no_grass)

        out_path = os.path.join(results_dir, new_name)
        Image.fromarray(new_result, "RGB").save(out_path, "PNG")
        return out_path

    # ------------------------------------------------------------------ BG
    def colorize_background(self, image_id, input_text: str, new_name: str,
                            last_name: str, last_bg_text: str
                            ) -> Tuple[str, str]:
        """``build_background_colorization`` (``bg_utils.py:169-325``)."""
        paths = self._paths(image_id)
        sketch_image = load_sketch_image(paths["sketch"], dtype=np.uint8, size=self.cfg.pipeline.image_size)
        results_dir = self._results_dir(image_id)

        if last_name == "":
            assert last_bg_text == ""
            last_bg_text = DEFAULT_BG_TEXT
            previous = sketch_image.copy()
        else:
            previous = np.array(Image.open(
                os.path.join(results_dir, last_name)).convert("RGB"),
                dtype=np.uint8)

        _, pred_class_ids, _ = load_seg_data(paths["seg_data"], size=self.cfg.pipeline.image_size)
        grass_indices = [i for i, c in enumerate(pred_class_ids)
                         if c == comp.GRASS_LABEL]

        inner_mask = load_inner_mask(paths["inner_mask"])
        fg_image = comp.extract_foreground(previous, inner_mask)
        fg_image_temp = fg_image.copy()

        proc_text = combine_bg_input_text(input_text, last_bg_text)
        background, _ = self.bg.colorize(fg_image, proc_text)

        # paste FG back, overlay drawings (skipping grass), save the fg debug
        # image like the reference does (``bg_utils.py:290-310``)
        background[inner_mask != 0] = fg_image[inner_mask != 0]
        no_grass = comp.grass_free_inner_mask(inner_mask, grass_indices)
        moved, drawings_region = comp.shifted_drawings(sketch_image, no_grass)
        background[drawings_region] = moved[drawings_region]

        fg_image_temp[drawings_region] = moved[drawings_region]
        Image.fromarray(fg_image_temp, "RGB").save(
            os.path.join(results_dir, f"{image_id}_fg.png"), "PNG")

        if self.cfg.pipeline.color_gradient:
            background = comp.add_color_gradient(background, inner_mask)
            background[drawings_region] = moved[drawings_region]

        out_path = os.path.join(results_dir, new_name)
        Image.fromarray(background, "RGB").save(out_path, "PNG")
        return out_path, proc_text
