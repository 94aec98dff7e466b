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
