"""Text frontend: the two tokenizer variants, lexicons, instruction router,
and training-time caption augmentation.

The reference system has *two distinct* sentence encodings that must not be
confused (a classic source of silent bugs):

- **matching** variant (``Instance_Matching/data_processing/text_processing.py:91-102``):
  keeps articles, drops a trailing '.', pads at the **end**, and returns
  ``(indices, true_length)`` -- the true length drives sequence masking in the
  RMI mLSTM.
- **colorization** variant (shared by FG and BG,
  ``Foreground_Instance_Colorization/data_processing/text_processing.py:43-53``):
  strips a leading 'a', removes every 'the', maps ',' to 'and', pads at the
  **beginning**, and returns indices only -- the conv-LSTM skips pad steps by
  testing ``token == 0``.
"""
from __future__ import annotations

import random
import re
from typing import Dict, List, Optional, Sequence, Tuple

PAD = "<pad>"
UNK = "<unk>"
_SPLIT = re.compile(r"(\W+)")

# Lexicons (reference Instance_Matching/data_processing/text_processing.py:22-41)
COLOR_LIST = [
    "dark brown", "light brown", "light gray", "dark gray",
    "black", "red", "dark green", "light green", "dark blue", "light blue",
    "yellow", "orange", "pink", "purple",
]

SIMPLE_COLOR_LIST = [
    "brown", "gray", "black", "red", "green", "blue", "yellow", "orange",
    "pink", "purple", "cyan", "white",
]

CATEGORY_LIST = [
    "bench", "bird", "bus", "butterfly",
    "car", "cat", "chair", "chicken", "cloud", "cow",
    "dog", "duck", "horse", "house", "grass",
    "moon", "person", "pig", "rabbit", "road",
    "sheep", "star", "sun", "tree", "truck",
]

CATEGORY_ES_LIST = [
    "benches", "birds", "buses", "butterflies",
    "cars", "cats", "chairs", "chickens", "clouds", "cows",
    "dogs", "ducks", "horses", "houses", "grasses",
    "moons", "people", "pigs", "rabbits", "roads",
    "sheep", "stars", "suns", "trees", "trucks",
]

ES_ATTR = ["both", "all", "two", "three", "four", "five", "six"]


def load_vocab(path: str) -> Dict[str, int]:
    """Vocabulary file -> {word: index} (line order defines indices)."""
    with open(path) as f:
        words = [w.strip() for w in f.readlines()]
    return {w: i for i, w in enumerate(words)}


def _split_words(sentence: str, drop_dash: bool) -> List[str]:
    words = _SPLIT.split(sentence.strip())
    if drop_dash:
        return [w.lower() for w in words if len(w.strip()) > 0 and w != "-"]
    return [w.lower() for w in words if len(w.strip()) > 0]


def matching_tokenize(sentence: str) -> List[str]:
    words = _split_words(sentence, drop_dash=True)
    if words and words[-1] == ".":
        words = words[:-1]
    return words


def colorization_tokenize(sentence: str) -> List[str]:
    words = _split_words(sentence, drop_dash=False)
    if words and words[-1] == ".":
        words = words[:-1]
    if words and words[0] == "a":
        words = words[1:]
    words = [w for w in words if w != "the"]
    words = ["and" if w in (",", ", ") else w for w in words]
    return words


def _to_indices(words: Sequence[str], vocab: Dict[str, int]) -> List[int]:
    unk = vocab[UNK]
    return [vocab.get(w, unk) for w in words]


def matching_encode(sentence: str, vocab: Dict[str, int], max_len: int) -> Tuple[List[int], int]:
    """End-padded encoding + true length (reference text_processing.py:91-102)."""
    idx = _to_indices(matching_tokenize(sentence), vocab)
    idx = idx[:max_len]
    true_len = len(idx)
    idx = idx + [vocab[PAD]] * (max_len - true_len)
    return idx, true_len


def colorization_encode(sentence: str, vocab: Dict[str, int], max_len: int) -> List[int]:
    """Front-padded encoding (reference FG/BG text_processing.py:43-53)."""
    idx = _to_indices(colorization_tokenize(sentence), vocab)
    idx = idx[:max_len]
    return [vocab[PAD]] * (max_len - len(idx)) + idx


def search_for_self_category(caption: str) -> Tuple[Optional[str], bool]:
    """First category noun in the caption (singular form) plus plurality flag
    (reference text_processing.py:44-64)."""
    words = matching_tokenize(caption)
    is_es = False
    for w in words:
        if w in ES_ATTR:
            is_es = True
        if w in CATEGORY_LIST:
            return w, is_es
        if w in CATEGORY_ES_LIST:
            return CATEGORY_LIST[CATEGORY_ES_LIST.index(w)], True
    return None, is_es


def search_for_color(caption: str) -> bool:
    words = matching_tokenize(caption)
    return any(w in SIMPLE_COLOR_LIST for w in words)


def judge_colorize_type(text: str) -> str:
    """'FG' iff a category noun is present, else 'BG'
    (reference Pipeline_utils/customization_util.py:8-17)."""
    category, _ = search_for_self_category(text)
    return "BG" if category is None else "FG"


_PREPOSITIONS = ["with"]


def _judging_preposition(text: str, j_word: str) -> bool:
    """Whether the sentence may be split at ``j_word`` (reference
    Pipeline_utils/fg_color_utils.py:27-48)."""
    words = _split_words(text, drop_dash=False)
    for prep in _PREPOSITIONS:
        if prep in words and words.index(prep) < words.index(j_word.lower()):
            return False
    return True


def segment_user_input_text(user_text: str) -> str:
    """'the bus on the left is yellow' -> 'the bus is yellow'
    (reference Pipeline_utils/fg_color_utils.py:51-77)."""
    cate, _ = search_for_self_category(user_text)

    if "has" in user_text and _judging_preposition(user_text, "has"):
        split_idx = user_text.index("has")
    elif "have" in user_text and _judging_preposition(user_text, "have"):
        split_idx = user_text.index("have")
    elif "is" in user_text and _judging_preposition(user_text, "is"):
        split_idx = user_text.index("is")
    elif "are" in user_text and _judging_preposition(user_text, "are"):
        split_idx = user_text.index("are")
    else:
        return user_text
    substr = user_text[split_idx:]
    pre_substr = user_text[:split_idx]

    if search_for_color(pre_substr):
        return user_text
    if search_for_color(substr):
        return "the " + cate + " " + substr
    return user_text


# Training-time caption augmentation (reference text_processing.py:105-181)
COLOR_MAPS = {
    "bench": ["light brown", "dark brown", "yellow", "orange", "dark blue", "light blue", "red", "pink", "purple"],
    "cat": ["yellow", "orange", "dark gray", "pink", "light gray"],
    "chair": ["light brown", "dark brown"],
    "cloud": ["dark gray", "light blue", "dark blue"],
    "dog": ["light brown", "dark brown", "orange"],
    "duck": ["yellow", "orange"],
    "grass": ["dark green", "light green"],
    "horse": ["light brown", "dark brown", "orange", "dark gray", "light gray", "dark blue", "purple"],
    "moon": ["yellow", "orange"],
    "pig": ["pink", "red"],
    "rabbit": ["pink", "dark gray"],
    "road": ["yellow", "orange", "dark gray", "black", "light brown", "dark brown"],
    "sheep": ["red", "yellow", "dark blue", "light blue", "orange", "pink", "light green", "dark green",
              "purple", "cyan", "dark brown", "dark gray", "light brown", "light gray", "black"],
    "star": ["yellow", "orange", "red"],
    "sun": ["yellow"],
    "tree": ["light green", "dark green"],
    "truck": ["red", "yellow", "orange", "light green", "dark blue", "light blue"],
    "chicken": ["yellow", "orange", "light brown", "dark brown"],
    "cow": ["light brown", "dark brown", "yellow", "dark gray", "light gray"],
}


def augment_caption_with_attr(ori_caption: str, rng: Optional[random.Random] = None) -> str:
    """Append a random color attribute phrase (reference text_processing.py:129-181)."""
    rng = rng or random
    self_category, is_es = search_for_self_category(ori_caption)
    assert self_category is not None

    rst_caption = ori_caption
    rand_color_0 = COLOR_LIST[rng.randint(0, len(COLOR_LIST) - 1)]
    rand_color_1 = COLOR_LIST[rng.randint(0, len(COLOR_LIST) - 1)]
    verb = " are" if is_es else " is"

    if self_category == "person":
        kind = rng.randint(0, 2)
        if kind == 0:
            rst_caption += verb + " in " + rand_color_0
        elif kind == 1:
            rst_caption += verb + " in " + rand_color_0 + " shirt and " + rand_color_1 + " pants"
        else:
            rst_caption += verb + " in " + rand_color_0 + " shirt and " + rand_color_1 + " skirt"
    elif self_category in ("bus", "car", "house"):
        kind = rng.randint(0, 1)
        if kind == 0:
            rst_caption += verb + " " + rand_color_0
        else:
            sub_part = " roof" if self_category == "house" else " windows"
            rst_caption += verb + " " + rand_color_0 + " with " + rand_color_1 + sub_part
    elif self_category == "bird":
        kind = rng.randint(0, 1)
        if kind == 0:
            rst_caption += verb + " " + rand_color_0
        else:
            rst_caption += verb + " " + rand_color_0 + " with " + rand_color_1 + " wings"
    elif self_category == "butterfly":
        verb = " have" if is_es else " has"
        rst_caption += verb + " " + rand_color_0 + " body and " + rand_color_1 + " wings"
    else:
        self_color_list = COLOR_MAPS[self_category]
        rand_color_0 = self_color_list[rng.randint(0, len(self_color_list) - 1)]
        rst_caption += verb + " " + rand_color_0

    assert rst_caption != ori_caption
    return rst_caption
