"""Record state machine parity vs the reference's
``Pipeline_utils/customization_util.py`` executed as an oracle: random
interleaved fetch/update/withdraw sequences driven through both
implementations on separate temp dirs, comparing every fetch tuple, the
record-JSON *bytes* after every mutation, and withdraw edge behavior.
"""
import importlib.util
import json
import os
import random
import sys

import pytest

from sketchyscenecolorization_tpu.data.records import (
    fetch_records, update_records, withdraw_records,
)

REF_ROOT = "/root/reference"
REF = os.path.join(REF_ROOT, "Pipeline_utils", "customization_util.py")


@pytest.fixture(scope="module")
def ref_mod():
    if not os.path.isfile(REF):
        pytest.skip("reference tree not available")
    sys.path.insert(0, REF_ROOT)   # for its Instance_Matching import
    try:
        spec = importlib.util.spec_from_file_location("ref_custom", REF)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(REF_ROOT)
    return mod


def _touch_result(base, image_id, name):
    d = os.path.join(base, "results", str(image_id))
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, name), "wb") as f:
        f.write(b"png")


def _records_file(base, image_id):
    return os.path.join(base, "update_records", f"{image_id}_records.json")


def _read(path):
    return open(path, "rb").read() if os.path.isfile(path) else None


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_sequences_match_reference(ref_mod, tmp_path, seed, capsys):
    rng = random.Random(seed)
    ours = str(tmp_path / "ours")
    ref = str(tmp_path / "ref")
    image_id = 42
    n_records = 0

    for step in range(30):
        op = rng.choice(["color", "color", "color", "withdraw"])
        if op == "color":
            new_o, last_o, bg_o, sum_o = fetch_records(image_id, ours)
            new_r, last_r, bg_r, sum_r = ref_mod.fetch_records(image_id, ref)
            assert (new_o, last_o, bg_o) == (new_r, last_r, bg_r), step
            assert json.dumps(sum_o) == json.dumps(
                [dict(d) for d in sum_r]), step

            ctype = rng.choice(["FG", "BG"])
            text = f"instruction {step}"
            bg_text = f"bg {step}" if ctype == "BG" else bg_o
            update_records(image_id, text, ours, ctype, new_o, bg_text, sum_o)
            ref_mod.update_records(image_id, text, ref, ctype, new_r,
                                   bg_text, sum_r)
            _touch_result(ours, image_id, new_o)
            _touch_result(ref, image_id, new_r)
            n_records += 1
        else:
            if n_records == 0:
                with pytest.raises(Exception):
                    ref_mod.withdraw_records(image_id, ref)
                with pytest.raises(Exception):
                    withdraw_records(image_id, ours)
                continue
            withdraw_records(image_id, ours)
            ref_mod.withdraw_records(image_id, ref)
            n_records -= 1

        assert _read(_records_file(ours, image_id)) == \
            _read(_records_file(ref, image_id)), f"json bytes differ at {step}"
        assert sorted(os.listdir(os.path.join(ours, "results", "42"))) == \
            sorted(os.listdir(os.path.join(ref, "results", "42"))), step
