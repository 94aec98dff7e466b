"""``get_pred_instance_mask`` parity vs the reference module executed as an
oracle (``Instance_Matching/data_processing/sketch_data_processing.py:
254-281``): identical matched indices, scores, boxes, class ids and stacked
masks on the real 9996 seg_data fixture over randomized predicted masks and
thresholds, including the all-matched and none-matched edges.
"""
import importlib.util
import os

import numpy as np
import pytest

from sketchyscenecolorization_tpu.data.fixtures import get_pred_instance_mask

REF = ("/root/reference/Instance_Matching/data_processing/"
       "sketch_data_processing.py")
NPZ = "/root/reference/examples/seg_data/9996_datas.npz"


@pytest.fixture(scope="module")
def ref_mod():
    if not os.path.isfile(REF):
        pytest.skip("reference tree not available")
    import matplotlib
    matplotlib.use("Agg")
    spec = importlib.util.spec_from_file_location("ref_sdp", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _ref_call(ref_mod, *args):
    """The reference targets numpy<1.16.3 where np.load allowed pickled
    object arrays (its ragged ``pred_masks``) by default; shim that default
    for the duration of the oracle call."""
    orig = np.load
    np.load = lambda p, **kw: orig(p, allow_pickle=True)
    try:
        return ref_mod.get_pred_instance_mask(*args)
    finally:
        np.load = orig


@pytest.mark.parametrize("seed,thresh", [(0, 0.5), (1, 0.5), (2, 0.1),
                                         (3, 0.9), (4, 1.0)])
def test_matches_reference_on_random_masks(ref_mod, seed, thresh):
    rng = np.random.RandomState(seed)
    # blocky random masks (random rectangles) rather than iid noise, so
    # per-instance occupancy fractions spread across [0, 1]
    pred = np.zeros((768, 768), np.float32)
    for _ in range(6):
        y, x = rng.randint(0, 700, 2)
        h, w = rng.randint(30, 300, 2)
        pred[y:y + h, x:x + w] = 1.0

    got = get_pred_instance_mask(NPZ, pred.copy(), thresh)
    want = _ref_call(ref_mod, NPZ, pred.copy(), thresh)

    assert got[4] == want[4], "matched indices differ"
    if not want[4]:
        assert got[0].size == 0
        return
    np.testing.assert_allclose(got[1], want[1], rtol=1e-12, err_msg="scores")
    np.testing.assert_array_equal(got[2], want[2], err_msg="boxes")
    np.testing.assert_array_equal(got[3], want[3], err_msg="class ids")
    np.testing.assert_array_equal(got[0].astype(np.uint8),
                                  want[0].astype(np.uint8), err_msg="masks")


def test_all_and_none_matched_edges(ref_mod):
    ones = np.ones((768, 768), np.float32)
    got = get_pred_instance_mask(NPZ, ones.copy(), 0.5)
    want = _ref_call(ref_mod, NPZ, ones.copy(), 0.5)
    assert got[4] == want[4] and len(got[4]) > 0

    zeros = np.zeros((768, 768), np.float32)
    got = get_pred_instance_mask(NPZ, zeros.copy(), 0.5)
    want = _ref_call(ref_mod, NPZ, zeros.copy(), 0.5)
    assert got[4] == want[4] == []
