from .tokenizer import (
    PAD, UNK,
    load_vocab,
    matching_tokenize,
    matching_encode,
    colorization_tokenize,
    colorization_encode,
    search_for_self_category,
    search_for_color,
    judge_colorize_type,
    segment_user_input_text,
    augment_caption_with_attr,
    CATEGORY_LIST,
    CATEGORY_ES_LIST,
    COLOR_LIST,
    SIMPLE_COLOR_LIST,
)
from .bg_text import (
    get_text_type,
    check_duplicated_color,
    combine_bg_input_text,
    DEFAULT_BG_TEXT,
)
