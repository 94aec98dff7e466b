"""Background-instruction text merge state machine
(reference ``Pipeline_utils/bg_utils.py:20-93``).

The background GAN always needs both a sky and a ground color; a new user
instruction mentioning only one of them is merged with the previous combined
text recorded in the session.
"""
from __future__ import annotations

from typing import List

from .tokenizer import _split_words


INPUT_TEXT_TYPES = ["None", "ground", "sky", "both"]
ALL_COLOR = ["blue", "green", "cyan", "red", "orange", "yellow", "brown",
             "purple", "pink", "black", "gray"]
DEFAULT_BG_TEXT = "the sky is blue and the ground is green"


def _words(text: str) -> List[str]:
    return _split_words(text, drop_dash=False)


def get_text_type(text: str) -> str:
    label = [0, 0]  # [sky, ground]
    words = _words(text)
    if "sky" in words:
        label[0] = 1
    if "ground" in words or "floor" in words or "land" in words:
        label[1] = 1
    return INPUT_TEXT_TYPES[2 * label[0] + label[1]]


def check_duplicated_color(text: str) -> None:
    words = _words(text)
    sky_color = ""
    ground_color = ""
    for word in words:
        if word in ALL_COLOR:
            if sky_color == "":
                sky_color = word
            else:
                ground_color = word
                break
    if sky_color == ground_color:
        raise ValueError("It is not recommended to use the same sky and ground color.")


def combine_bg_input_text(new_text: str, previous_text: str) -> str:
    """Merge a new sky/ground instruction with the previous combined text."""
    input_text_type = get_text_type(new_text)
    previous_text_type = get_text_type(previous_text)

    assert input_text_type != "None"
    rst_text = ""

    if input_text_type == "both":
        rst_text = new_text
    elif input_text_type == "sky":
        if previous_text_type in ("None", "sky"):
            raise ValueError("No ground information provided and found in records.")
        if previous_text_type == "ground":
            rst_text = new_text + " and " + previous_text
        else:
            split_idx = previous_text.index("and")
            rst_text = new_text + " " + previous_text[split_idx:]
    else:  # 'ground'
        if previous_text_type in ("None", "ground"):
            raise ValueError("No sky information provided and found in records.")
        if previous_text_type == "sky":
            rst_text = previous_text + " and " + new_text
        else:
            split_idx = previous_text.index("and")
            rst_text = previous_text[:split_idx] + "and " + new_text

    assert rst_text != ""
    check_duplicated_color(rst_text)
    return rst_text
