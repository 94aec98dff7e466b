"""TF1-checkpoint -> JAX pytree converter (name mapping + layout fixes).

TensorFlow is not present in this environment, so the converter consumes a
flat ``{tf_variable_name: np.ndarray}`` dict -- produced either by
``tf.train.load_checkpoint`` elsewhere and saved with ``np.savez``, or by any
checkpoint-reading tool -- and emits our parameter trees.

Name sources (reference):
- backbone: ``ResNet/group_{g}_{u}/block_{b}/{conv,bn}/...``
  (``Instance_Matching/deeplab_model.py:51-107,176-260``), conv weight 'DW',
  BN {beta, gamma, mean, variance, factor};
- text head: ``text_sketchyscene/{visual_feat_projection,
  m_lstm_output_projection}/{DW,biases}``, ``text_sketchyscene/embedding``,
  LSTMs ``text_sketchyscene/{wLSTM,mLSTM}/lstm_cell/{kernel,bias}``
  (``RMI_model.py:113-200``).  TF's LSTMCell kernel is [(in + h), 4h] with
  gate order (i, j, f, o) -- identical to our layout, so kernels copy
  verbatim;
- transposed-conv filters are [kh, kw, out, in] in TF and HWIO here, so they
  swap their last two axes (``ops/conv.py:conv2d_transpose``).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ..config import MatchingConfig

Params = Dict[str, Any]
TFVars = Dict[str, np.ndarray]


def load_tf_vars_npz(path: str) -> TFVars:
    """Flat TF-name -> array dict from an npz export."""
    z = np.load(path, allow_pickle=False)
    return {k: z[k] for k in z.files}


def swap_deconv_filter(w: np.ndarray) -> np.ndarray:
    """[kh, kw, out, in] (TF transposed conv) -> [kh, kw, in, out] (HWIO)."""
    return np.swapaxes(w, 2, 3)


# ------------------------------------------------------------------ matching

BN_LEAVES = ("beta", "gamma", "mean", "variance", "factor")
DEEPLAB_NUM_UNITS = (3, 4, 23, 3)


def matching_name_map(cfg: Optional[MatchingConfig] = None
                      ) -> Dict[str, Tuple[str, ...]]:
    """{tf_name: our-tree path} for the RMI model with the DeepLab-v2
    backbone.  Paths are tuples into the ``rmi.init_params`` tree."""
    cfg = cfg or MatchingConfig()
    m: Dict[str, Tuple[str, ...]] = {}

    # --- backbone stem
    m["ResNet/group_1/conv1/DW"] = ("ResNet", "group_1", "conv1", "DW")
    for leaf in BN_LEAVES:
        m[f"ResNet/group_1/bn_conv1/{leaf}"] = \
            ("ResNet", "group_1", "bn_conv1", leaf)

    # --- bottleneck groups
    for g, units in enumerate(DEEPLAB_NUM_UNITS, start=2):
        for u in range(units):
            scope = f"group_{g}_{u}"
            blocks = ["block_1", "block_2", "block_3"]
            if u == 0:
                blocks.append("block_add")
            for b in blocks:
                m[f"ResNet/{scope}/{b}/conv/DW"] = \
                    ("ResNet", scope, b, "conv", "DW")
                for leaf in BN_LEAVES:
                    m[f"ResNet/{scope}/{b}/bn/{leaf}"] = \
                        ("ResNet", scope, b, "bn", leaf)

    # --- text head
    t = "text_sketchyscene"
    m[f"{t}/visual_feat_projection/DW"] = (t, "visual_feat_projection", "DW")
    m[f"{t}/visual_feat_projection/biases"] = \
        (t, "visual_feat_projection", "biases")
    m[f"{t}/embedding"] = (t, "embedding")
    m[f"{t}/wLSTM/lstm_cell/kernel"] = (t, "wLSTM", "w")
    m[f"{t}/wLSTM/lstm_cell/bias"] = (t, "wLSTM", "b")
    m[f"{t}/mLSTM/lstm_cell/kernel"] = (t, "mLSTM", "w")
    m[f"{t}/mLSTM/lstm_cell/bias"] = (t, "mLSTM", "b")
    m[f"{t}/m_lstm_output_projection/DW"] = \
        (t, "m_lstm_output_projection", "DW")
    m[f"{t}/m_lstm_output_projection/biases"] = \
        (t, "m_lstm_output_projection", "biases")
    return m


def _set_path(tree: Params, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def convert_matching(tf_vars: TFVars, cfg: Optional[MatchingConfig] = None,
                     strict: bool = False) -> Params:
    """Flat TF vars -> the ``models/rmi`` parameter tree.

    ``strict=True`` raises when a mapped variable is missing; otherwise it is
    skipped (partial restores: e.g. a backbone-only pretrained checkpoint,
    matching the reference's scope-filtered first-run restore,
    ``matching_main.py:123-142``)."""
    name_map = matching_name_map(cfg)
    tree: Params = {}
    missing: List[str] = []
    for tf_name, path in name_map.items():
        if tf_name not in tf_vars:
            missing.append(tf_name)
            continue
        value = np.asarray(tf_vars[tf_name])
        _set_path(tree, path, value)
    if strict and missing:
        raise KeyError(f"{len(missing)} variables missing from the TF "
                       f"checkpoint, first few: {missing[:5]}")
    return tree


def merge_converted(params: Params, converted: Params) -> Params:
    """Overlay a (possibly partial) converted tree onto freshly-initialized
    parameters, shape-checking every leaf."""
    def merge(dst, src, prefix=""):
        out = dict(dst)
        for k, v in src.items():
            if isinstance(v, dict):
                out[k] = merge(dst.get(k, {}), v, f"{prefix}{k}/")
            else:
                if k in dst and np.shape(dst[k]) != np.shape(v):
                    raise ValueError(
                        f"shape mismatch at {prefix}{k}: "
                        f"{np.shape(dst[k])} vs checkpoint {np.shape(v)}")
                out[k] = v
        return out
    return merge(params, converted)


# ---------------------------------------------------------------- BG GAN

BG_NUM_RESIDUAL_UNITS = (3, 4, 6, 3)


def _bg_block_entries(m, tf_scope: str, our_scope: str, kind: str) -> None:
    """One bottleneck block's conv+bn leaves.

    kind: 'en' (block_1/add = pad-1 conv), 'de' (block_1/add = deconv,
    filters transposed), 'pu' (all conv_ex, no block_add).
    Helper scopes (``bg_colorization_main.py:41-98``): conv->'conv',
    conv_ex->'conv_ex', deconv->'deconv', batchnorm->'batchnorm'.
    """
    specs = {
        "en": [("block_1", "conv", "block_1_conv"),
               ("block_2", "conv_ex", "block_2_conv"),
               ("block_3", "conv_ex", "block_3_conv"),
               ("block_add", "conv", "block_add_conv")],
        "de": [("block_1", "deconv", "block_1_deconv"),
               ("block_2", "conv_ex", "block_2_conv"),
               ("block_3", "conv_ex", "block_3_conv"),
               ("block_add", "deconv", "block_add_deconv")],
        "pu": [("block_1", "conv_ex", "block_1_conv"),
               ("block_2", "conv_ex", "block_2_conv"),
               ("block_3", "conv_ex", "block_3_conv")],
    }[kind]
    for tf_block, conv_scope, our_conv in specs:
        m[f"{tf_scope}/{tf_block}/{conv_scope}/filter"] = \
            (our_scope, our_conv, "filter")
        bn_key = our_conv.rsplit("_", 1)[0] + "_bn"
        for leaf in ("offset", "scale"):
            m[f"{tf_scope}/{tf_block}/batchnorm/{leaf}"] = \
                (our_scope, bn_key, leaf)


def bg_generator_name_map(multi_residual: bool = True
                          ) -> Dict[str, Tuple[str, ...]]:
    """{tf_name: our-tree path} for the BG residual generator
    (``bg_colorization_main.py:302-420``; LSTM var names from the
    MultiRNNCell([BasicLSTMCell]) calls inside scopes RNN/WLSTM and
    RNN/ALSTM, :178-199).  Deconv filters are [kh,kw,out,in] in TF --
    pass them through ``swap_deconv_filter``."""
    g = "generator"
    m: Dict[str, Tuple[str, ...]] = {}

    m[f"{g}/encoder_1/conv_ex/filter"] = ("encoder_1_conv", "filter")
    for leaf in ("offset", "scale"):
        m[f"{g}/encoder_1/batchnorm/{leaf}"] = ("encoder_1_bn", leaf)

    for e in range(4):
        scope = f"encoder_{e + 2}_0"
        _bg_block_entries(m, f"{g}/{scope}", scope, "en")
        if multi_residual:
            for u in range(1, BG_NUM_RESIDUAL_UNITS[e]):
                scope_u = f"encoder_{e + 2}_{u}"
                _bg_block_entries(m, f"{g}/{scope_u}", scope_u, "pu")

    t = f"{g}/mLSTM_G"
    m[f"{t}/embedding"] = ("mLSTM_G", "embedding")
    m[f"{t}/RNN/WLSTM/multi_rnn_cell/cell_0/basic_lstm_cell/kernel"] = \
        ("mLSTM_G", "wlstm_w")
    m[f"{t}/RNN/WLSTM/multi_rnn_cell/cell_0/basic_lstm_cell/bias"] = \
        ("mLSTM_G", "wlstm_b")
    m[f"{t}/RNN/ALSTM/multi_rnn_cell/cell_0/basic_lstm_cell/kernel"] = \
        ("mLSTM_G", "alstm_w")
    m[f"{t}/RNN/ALSTM/multi_rnn_cell/cell_0/basic_lstm_cell/bias"] = \
        ("mLSTM_G", "alstm_b")

    m[f"{g}/region_br_projection/conv_ex/filter"] = \
        ("region_br_projection_conv", "filter")
    for leaf in ("offset", "scale"):
        m[f"{g}/region_br_projection/batchnorm/{leaf}"] = \
            ("region_br_projection_bn", leaf)

    for d, skip in enumerate((5, 4, 3, 2)):
        scope = f"decoder_{skip}_0"
        _bg_block_entries(m, f"{g}/{scope}", scope, "de")
        if multi_residual:
            for u in range(1, BG_NUM_RESIDUAL_UNITS[skip - 2]):
                scope_u = f"decoder_{skip}_{u}"
                _bg_block_entries(m, f"{g}/{scope_u}", scope_u, "pu")
        m[f"{g}/region_br_{skip}/deconv/filter"] = \
            (f"region_br_{skip}_deconv", "filter")
        for leaf in ("offset", "scale"):
            m[f"{g}/region_br_{skip}/batchnorm/{leaf}"] = \
                (f"region_br_{skip}_bn", leaf)

    m[f"{g}/decoder_1/deconv/filter"] = ("decoder_1_deconv", "filter")
    m[f"{g}/region_br_1/deconv/filter"] = ("region_br_1_deconv", "filter")
    for leaf in ("offset", "scale"):
        m[f"{g}/decoder_1/batchnorm/{leaf}"] = ("decoder_1_bn", leaf)
        m[f"{g}/region_br_1/batchnorm/{leaf}"] = ("region_br_1_bn", leaf)
    return m


def convert_bg_generator(tf_vars: TFVars, multi_residual: bool = True,
                         strict: bool = False) -> Params:
    """Flat TF vars -> the ``models/bg_gan.ResidualGenerator`` param tree
    (deconv filters axis-swapped to HWIO)."""
    name_map = bg_generator_name_map(multi_residual)
    tree: Params = {}
    missing: List[str] = []
    for tf_name, path in name_map.items():
        if tf_name not in tf_vars:
            missing.append(tf_name)
            continue
        value = np.asarray(tf_vars[tf_name])
        if "/deconv/filter" in tf_name:
            value = swap_deconv_filter(value)
        _set_path(tree, path, value)
    if strict and missing:
        raise KeyError(f"{len(missing)} variables missing, first: {missing[:5]}")
    return tree
