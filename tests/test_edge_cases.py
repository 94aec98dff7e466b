"""Edge-case behavior parity: error paths and guardrails the reference
enforces at runtime (SURVEY §4 'runtime assertions')."""
import os

import numpy as np
import pytest

from sketchyscenecolorization_tpu.data.records import (
    fetch_records, update_records, withdraw_records,
)
from sketchyscenecolorization_tpu.text.bg_text import (
    check_duplicated_color, combine_bg_input_text, get_text_type,
)
from sketchyscenecolorization_tpu.pipeline import compositing as comp


def test_withdraw_without_records_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        withdraw_records(1, str(tmp_path))


def test_withdraw_deletes_json_when_single_record(tmp_path):
    update_records(1, "the bus is red", str(tmp_path), "FG", "1_1.png", "", [])
    path = tmp_path / "update_records" / "1_records.json"
    assert path.is_file()
    withdraw_records(1, str(tmp_path))
    assert not path.is_file()


def test_bg_text_requires_both_sides_eventually():
    # sky-only instruction with no history -> error (bg_utils.py:75-77)
    with pytest.raises(Exception, match="ground"):
        combine_bg_input_text("the sky is red", "")
    with pytest.raises(Exception, match="sky"):
        combine_bg_input_text("the ground is gray", "the ground is black")


def test_bg_text_duplicate_color_rejected():
    with pytest.raises(Exception, match="same"):
        check_duplicated_color("the sky is green and the ground is green")
    with pytest.raises(Exception, match="same"):
        combine_bg_input_text("the sky is green",
                              "the sky is blue and the ground is green")


def test_get_text_type_labels():
    assert get_text_type("the sky is red") == "sky"
    assert get_text_type("the floor is gray") == "ground"
    assert get_text_type("the sky is red and the land is gray") == "both"
    assert get_text_type("hello") == "None"


def test_road_single_line_guard():
    # a true single line must be rejected regardless of orientation
    vertical = np.full((64, 64, 3), 255, np.uint8)
    vertical[5:60, 30] = 0
    assert not comp.is_road_not_single_line(vertical)
    # a closed rectangle crosses scanlines twice -> accepted
    rect = np.full((64, 64, 3), 255, np.uint8)
    rect[10, 5:60] = 0
    rect[50, 5:60] = 0
    rect[10:51, 5] = 0
    rect[10:51, 59] = 0
    assert comp.is_road_not_single_line(rect)


def test_gradient_requires_sky_region():
    # no sky pixels found below the midline -> assertion (bg_utils.py:135)
    img = np.zeros((32, 32, 3), np.uint8)
    inner = np.ones((32, 32), np.int32)       # everything is FG
    inner[5:7] = 0                            # tiny non-fg band at top only
    img[5:7] = [9, 9, 9]
    out = comp.add_color_gradient(img, inner, search_from=5)
    assert out.shape == img.shape


def test_fetch_records_reads_history(tmp_path):
    update_records(2, "the sky is red and the ground is gray", str(tmp_path),
                   "BG", "2_1.png", "the sky is red and the ground is gray", [])
    new_name, last_name, last_bg, summary = fetch_records(2, str(tmp_path))
    assert new_name == "2_2.png"
    assert last_name == "2_1.png"
    assert last_bg == "the sky is red and the ground is gray"
    assert len(summary) == 1
