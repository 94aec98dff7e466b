"""SketchySceneColorization-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for
language-based colorization of scene sketches.

Re-designed from scratch for TPU hardware with the same capabilities as the
TF1 reference system (SIGGRAPH Asia 2019, "Language-based Colorization of
Scene Sketches"): referring-expression instance matching, text-conditioned
foreground instance colorization, text-conditioned background colorization,
and the interactive edit/withdraw pipeline.

Sub-packages
------------
- ``config``    : typed dataclass configuration tree
- ``ops``       : NN building blocks (convs, norms, LSTM scans, image ops, Pallas kernels)
- ``models``    : DeepLab-v2 backbone, RMI matching model, FG MRU-GAN, BG residual GAN
- ``text``      : tokenizers (matching + colorization variants), lexicons, BG text merge
- ``data``      : fixture IO (sketches / seg_data npz / inner masks), edit records
- ``parallel``  : device mesh + sharding helpers (DP/TP over ICI via jax.sharding)
- ``pipeline``  : end-to-end instruction -> colorized-image orchestration
- ``train``     : jitted training steps + harnesses (matching, FG GAN, BG GAN)
- ``evaluation``: IoU / precision@X / mAP metric harnesses
- ``dataprep``  : offline dataset tooling (caption engine, generators)
- ``utils``     : checkpointing, TF1 converter, logging/profiling, visualization

Module CLIs: ``cli`` (interactive color/withdraw), ``cli_matching``,
``cli_fg_gan``, ``cli_bg_gan``.
"""

__version__ = "0.1.0"
