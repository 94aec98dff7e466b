#!/usr/bin/env python
"""Export a TF1 checkpoint to a flat npz of {variable_name: array}.

Run this in an environment WITH TensorFlow 1.x/2.x installed (this repo's
environment has none) against the reference's released checkpoints, then
feed the npz to ``sketchyscenecolorization_tpu.utils.tf1_converter``:

    python scripts/export_tf1_checkpoint.py \
        --checkpoint .../outputs/snapshots/deeplab_RMI_iter_100000.tfmodel \
        --out matching_vars.npz

    >>> from sketchyscenecolorization_tpu.utils.tf1_converter import (
    ...     load_tf_vars_npz, convert_matching)
    >>> params = convert_matching(load_tf_vars_npz("matching_vars.npz"))
"""
import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    try:
        from tensorflow.python.training import py_checkpoint_reader
        reader = py_checkpoint_reader.NewCheckpointReader(args.checkpoint)
    except ImportError:
        import tensorflow as tf
        reader = tf.train.load_checkpoint(args.checkpoint)

    shape_map = reader.get_variable_to_shape_map()
    out = {}
    for name in sorted(shape_map):
        if "Adam" in name or "Momentum" in name or name == "global_step":
            continue
        out[name] = np.asarray(reader.get_tensor(name))
        print(f"{name}: {out[name].shape}")
    np.savez_compressed(args.out, **out)
    print(f"wrote {len(out)} variables to {args.out}")


if __name__ == "__main__":
    main()
