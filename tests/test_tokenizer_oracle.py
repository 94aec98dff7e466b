"""Tokenizer parity vs the reference's pure-Python text processors executed
as oracles: encode thousands of real + random captions through both and
compare indices exactly (end-pad + length for matching; front-pad for
FG/BG colorization), plus category/color search and caption augmentation
under a pinned RNG."""
import importlib.util
import json
import os
import random
import sys

import numpy as np
import pytest

from sketchyscenecolorization_tpu.text import (
    augment_caption_with_attr, colorization_encode, load_vocab,
    matching_encode, search_for_color, search_for_self_category,
)

DATA = os.path.join(os.path.dirname(__file__), "..", "data")
REF_MATCH = "/root/reference/Instance_Matching/data_processing/text_processing.py"
REF_COLOR = ("/root/reference/Foreground_Instance_Colorization/"
             "data_processing/text_processing.py")


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def oracles():
    return _load(REF_MATCH, "ref_match_text"), _load(REF_COLOR, "ref_color_text")


def _caption_corpus():
    caps = []
    for s in ("val",):
        with open(os.path.join(DATA, f"sentence_instance_{s}.json")) as f:
            for entry in json.load(f):
                caps.extend(entry["sen_instIdx_map"].keys())
    rng = random.Random(0)
    words = ["the", "bus", "is", "yellow,", "with", "left-most", "A",
             "windows", "grass", "on", "right", "", "  spaced  out  "]
    for _ in range(300):
        caps.append(" ".join(rng.choices(words, k=rng.randint(1, 9))))
    return caps


def test_matching_encode_oracle(oracles):
    ref_match, _ = oracles
    vocab = load_vocab(os.path.join(DATA, "match_vocab.txt"))
    for cap in _caption_corpus():
        if not cap.strip():
            continue
        ours_idx, ours_len = matching_encode(cap, vocab, 15)
        ref_idx, ref_len = ref_match.preprocess_sentence(cap, vocab, 15)
        assert list(ours_idx) == list(ref_idx), cap
        assert ours_len == ref_len, cap


def test_colorization_encode_oracle(oracles):
    _, ref_color = oracles
    vocab = load_vocab(os.path.join(DATA, "fg_vocab.txt"))
    texts = ["a yellow bus with blue windows", "the bus is yellow",
             "A red, green and blue house", "the road is dark gray",
             "pink body and white wings", "the grass"]
    rng = random.Random(1)
    words = ["a", "the", "yellow", "bus", "with", "blue", "and", ",",
             "body", "wings", "in"]
    texts += [" ".join(rng.choices(words, k=rng.randint(1, 10)))
              for _ in range(300)]
    for cap in texts:
        if not cap.strip():
            continue
        ours = colorization_encode(cap, vocab, 15)
        ref = ref_color.preprocess_sentence(cap, vocab, 15)
        assert list(ours) == list(ref), cap


def test_category_and_color_search_oracle(oracles):
    ref_match, _ = oracles
    texts = ["the bus is yellow", "two dogs on the left", "the ducks",
             "a moon in the sky", "nothing here", "the person has red shirt",
             "the butterflies are pink", "grass and road"]
    for t in texts:
        assert search_for_self_category(t) == tuple(
            ref_match.search_for_self_category(t)), t
        assert search_for_color(t) == ref_match.search_for_color(t), t


def test_caption_augmentation_oracle(oracles):
    ref_match, _ = oracles
    caps = ["the bus on the left", "the dog in front of the house",
            "both the trees", "the person on the right", "the road"]
    for cap in caps:
        random.seed(7)
        ref_aug = ref_match.augment_the_caption_with_attr(cap)
        ours_aug = augment_caption_with_attr(cap, random.Random(7))
        assert ours_aug == ref_aug, cap
