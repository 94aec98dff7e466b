"""GT-loader parity vs the reference's ``sketch_data_processing`` executed
as an oracle: ``load_data_gt`` (bincount instance expansion, per-instance
majority class id, nearest 750->768 zoom, bbox extraction) and the
``fast_version`` union path compared exactly on synthesized SketchyScene
.mat fixtures with sparse instance ids and many instances.
"""
import importlib.util
import os

import numpy as np
import pytest
import scipy.io
from PIL import Image

from sketchyscenecolorization_tpu.data.matching_dataset import load_data_gt

REF = ("/root/reference/Instance_Matching/data_processing/"
       "sketch_data_processing.py")


@pytest.fixture(scope="module")
def ref_mod():
    if not os.path.isfile(REF):
        pytest.skip("reference tree not available")
    import matplotlib
    matplotlib.use("Agg")
    spec = importlib.util.spec_from_file_location("ref_sdp2", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_scene(base, image_id, seed, size=750, n_blobs=8):
    """Random rectangles with sparse instance ids (gaps exercise the dense
    re-indexing) and occasionally clashing class labels (majority vote)."""
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(base, "DRAWING_GT"), exist_ok=True)
    os.makedirs(os.path.join(base, "CLASS_GT"), exist_ok=True)
    os.makedirs(os.path.join(base, "INSTANCE_GT"), exist_ok=True)
    img = rng.randint(0, 255, (size, size, 3), np.uint8)
    Image.fromarray(img).save(
        os.path.join(base, "DRAWING_GT", f"L0_sample{image_id}.png"))
    inst = np.zeros((size, size), np.uint8)
    cls = np.zeros((size, size), np.uint8)
    inst_ids = rng.choice(np.arange(1, 60), size=n_blobs, replace=False)
    for iid in inst_ids:
        y, x = rng.randint(0, size - 60, 2)
        h, w = rng.randint(20, 200, 2)
        inst[y:y + h, x:x + w] = iid
        # two class labels inside one instance -> majority class must win
        cls[y:y + h, x:x + w] = rng.randint(1, 46)
        cls[y:y + h // 3, x:x + w] = rng.randint(1, 46)
    scipy.io.savemat(os.path.join(base, "INSTANCE_GT",
                                  f"sample_{image_id}_instance.mat"),
                     {"INSTANCE_GT": inst})
    scipy.io.savemat(os.path.join(base, "CLASS_GT",
                                  f"sample_{image_id}_class.mat"),
                     {"CLASS_GT": cls})


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_full_loader_matches_reference(ref_mod, tmp_path, seed):
    base = str(tmp_path)
    _write_scene(base, 5, seed)
    sk_o, ids_o, bx_o, mk_o = load_data_gt(base, 5)
    sk_r, ids_r, bx_r, mk_r = ref_mod.load_data_gt(base, 5)
    np.testing.assert_array_equal(sk_o, sk_r, err_msg="sketch")
    np.testing.assert_array_equal(ids_o, ids_r, err_msg="class ids")
    np.testing.assert_array_equal(bx_o, bx_r, err_msg="bboxes")
    np.testing.assert_array_equal(mk_o.astype(np.uint8),
                                  mk_r.astype(np.uint8), err_msg="masks")

    n = mk_r.shape[-1]
    picks = list(np.random.RandomState(seed).choice(
        np.arange(n), size=max(1, n // 2), replace=False))
    _, un_o = load_data_gt(base, 5, fast_version=True,
                           inst_indices=[int(i) for i in picks])
    _, un_r = ref_mod.load_data_gt(base, 5, fast_version=True,
                                   inst_indices=[int(i) for i in picks])
    np.testing.assert_array_equal(un_o, un_r, err_msg="fast union")
