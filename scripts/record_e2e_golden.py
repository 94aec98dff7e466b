"""Record the full-resolution pixel goldens for the RUN_E2E pipeline test.

Runs EXACTLY the command sequence of
``tests/test_e2e_reference_examples.py::test_full_pipeline_on_reference_examples``
(FG colorize -> BG colorize -> withdraw -> BG colorize on the canonical
prior text) on the CPU backend with seed 0 and saves the asserted
statistics/crops to ``tests/goldens/e2e_9996.npz``.

Run from the repo root after any *intentional* output-changing change:

    PYTHONPATH= python scripts/record_e2e_golden.py

The CPU backend and the 8-virtual-device XLA flag are forced below to match
``tests/conftest.py`` exactly: the BG generator's ~50 batch-stats BN layers
amplify f32 reduction-order differences between device configurations into
few-unit pixel shifts, so goldens must be recorded under the test config.
"""
import dataclasses
import os
import sys
import tempfile

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sketchyscenecolorization_tpu.config import FrameworkConfig, PipelineConfig
from sketchyscenecolorization_tpu.pipeline.factory import build_session


def main():
    out_root = tempfile.mkdtemp(prefix="golden_")
    cfg = dataclasses.replace(FrameworkConfig(), pipeline=PipelineConfig(
        data_base_dir="/root/reference/examples",
        results_base_dir=os.path.join(out_root, "outputs"),
        match_vocab_path="", fg_vocab_path="", bg_vocab_path="",
        match_ckpt_dir="", fg_ckpt_dir="", bg_ckpt_dir=""))
    session = build_session(cfg, seed=0)

    matched = session.match_instances(9996, "the bus is yellow with gray windows")
    out1 = session.colorize(9996, "the bus is yellow with gray windows")
    img1 = np.array(Image.open(out1))

    session.colorize(9996, "the sky is red and the ground is gray")
    session.withdraw(9996)
    out3 = session.colorize(9996, "the sky is blue and the ground is green")
    img3 = np.array(Image.open(out3))

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "goldens", "e2e_9996.npz")
    np.savez(path,
             fg_matched=np.asarray(matched, np.int64),
             fg_mean=img1.mean(axis=(0, 1)), fg_std=img1.std(axis=(0, 1)),
             fg_crop=img1[330:394, 340:404],
             bg_mean=img3.mean(axis=(0, 1)), bg_std=img3.std(axis=(0, 1)),
             bg_crop=img3[40:104, 40:104])
    print("recorded", path)
    print("fg_matched", matched)
    print("fg_mean", img1.mean(axis=(0, 1)), "bg_mean", img3.mean(axis=(0, 1)))


if __name__ == "__main__":
    main()
