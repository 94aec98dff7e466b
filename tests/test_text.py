"""Text frontend unit tests: the two pad semantics, lexicon search, the
instruction router, the FG text splitter, and the BG merge state machine."""
import os
import random

import pytest

from sketchyscenecolorization_tpu.text import (
    PAD, UNK,
    load_vocab, matching_encode, colorization_encode,
    matching_tokenize, colorization_tokenize,
    search_for_self_category, search_for_color,
    judge_colorize_type, segment_user_input_text,
    augment_caption_with_attr,
    get_text_type, combine_bg_input_text, check_duplicated_color,
)

MATCH_VOCAB = "/root/reference/Instance_Matching/data/vocab.txt"
FG_VOCAB = "/root/reference/Foreground_Instance_Colorization/data/vocab.txt"
BG_VOCAB = "/root/reference/Background_Colorization/data/bg_vocab.txt"


def test_load_vocab():
    v = load_vocab(MATCH_VOCAB)
    assert v[PAD] == 0 and v[UNK] == 1
    assert len(v) == 76


def test_matching_encode_pads_at_end_and_returns_len():
    v = load_vocab(MATCH_VOCAB)
    idx, n = matching_encode("the bus is orange.", v, 15)
    assert len(idx) == 15
    assert n == 4
    # trailing '.' removed; 'the' kept in the matching variant
    assert idx[0] == v["the"]
    assert all(i == v[PAD] for i in idx[n:])


def test_matching_encode_truncates():
    v = load_vocab(MATCH_VOCAB)
    sent = " ".join(["bus"] * 30)
    idx, n = matching_encode(sent, v, 15)
    assert n == 15 and len(idx) == 15


def test_colorization_encode_pads_at_front_drops_the():
    v = load_vocab(FG_VOCAB)
    idx = colorization_encode("the bus is orange", v, 15)
    assert len(idx) == 15
    words = colorization_tokenize("the bus is orange")
    assert "the" not in words
    k = len(words)
    assert all(i == v[PAD] for i in idx[:15 - k])
    assert idx[15 - k] == v.get("bus", v[UNK])


def test_colorization_tokenize_comma_and_leading_a():
    assert colorization_tokenize("a dog is brown, white") == ["dog", "is", "brown", "and", "white"]


def test_category_search():
    assert search_for_self_category("the bus on the left is red") == ("bus", False)
    assert search_for_self_category("both cats are black")[0] == "cat"
    assert search_for_self_category("both cats are black")[1] is True
    assert search_for_self_category("the buses are red") == ("bus", True)
    assert search_for_self_category("the sky is blue") == (None, False)


def test_color_search():
    assert search_for_color("the bus is red")
    assert not search_for_color("the bus on the left")


def test_judge_colorize_type():
    assert judge_colorize_type("the bus is red") == "FG"
    assert judge_colorize_type("the sky is blue") == "BG"
    assert judge_colorize_type("the ground is black") == "BG"


def test_segment_user_input_text():
    assert (segment_user_input_text("the bus on the left is yellow with blue windows")
            == "the bus is yellow with blue windows")
    # no color after the verb -> unchanged
    assert (segment_user_input_text("the bus on the left is large")
            == "the bus on the left is large")
    # color before the split point -> unchanged
    assert (segment_user_input_text("the red bus is near the tree")
            == "the red bus is near the tree")


def test_augment_caption_appends_color():
    rng = random.Random(0)
    for cap in ["the dog on the left", "the bus in the middle", "the person on the right",
                "the butterfly at the top", "the sun"]:
        out = augment_caption_with_attr(cap, rng)
        assert out.startswith(cap) and len(out) > len(cap)


def test_bg_text_type():
    assert get_text_type("the sky is blue") == "sky"
    assert get_text_type("the ground is green") == "ground"
    assert get_text_type("the sky is blue and the ground is green") == "both"
    assert get_text_type("hello") == "None"


def test_bg_merge():
    prev = "the sky is blue and the ground is green"
    assert combine_bg_input_text("the sky is red", prev) == "the sky is red and the ground is green"
    assert combine_bg_input_text("the ground is black", prev) == "the sky is blue and the ground is black"
    assert combine_bg_input_text("the sky is red and the ground is yellow", prev) \
        == "the sky is red and the ground is yellow"
    with pytest.raises(ValueError):
        combine_bg_input_text("the sky is blue", "the sky is red")  # no ground info anywhere
    with pytest.raises(ValueError):
        check_duplicated_color("the sky is blue and the ground is blue")


def test_bg_merge_from_single_sided_history():
    assert combine_bg_input_text("the sky is red", "the ground is black") \
        == "the sky is red and the ground is black"
    assert combine_bg_input_text("the ground is black", "the sky is red") \
        == "the sky is red and the ground is black"
