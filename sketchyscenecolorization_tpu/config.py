"""Typed configuration tree for the whole framework.

The reference spreads configuration over three mechanisms (argparse CLIs,
tf.app.flags, and a mutable global ``Config`` class -- see reference
``Foreground_Instance_Colorization/obj_lib/config.py:4-17`` and
``Instance_Matching/matching_main.py:18-77``).  Here everything is one
serializable dataclass tree; each training run persists its config as JSON.
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Tuple


def _asdict(obj) -> Dict[str, Any]:
    return dataclasses.asdict(obj)


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout.

    ``data`` is the batch-parallel axis (grads reduced with psum over ICI);
    ``model`` optionally shards the mLSTM pixel-batch dimension and wide
    conv channels for the large matching model.
    """
    data: int = 1
    model: int = 1

    @property
    def axis_names(self) -> Tuple[str, str]:
        return ("data", "model")


@dataclass(frozen=True)
class DTypePolicy:
    """Computation dtype policy.

    Parameters stay float32; ``compute`` selects the conv/matmul element type.
    bfloat16 keeps the MXU at full rate; float32 is used for parity tests.
    """
    compute: str = "float32"   # 'float32' | 'bfloat16'
    accum: str = "float32"


@dataclass(frozen=True)
class MatchingConfig:
    """RMI referring-segmentation model (reference ``Instance_Matching/RMI_model.py:13-40``)."""
    batch_size: int = 1
    max_len: int = 15
    vf_h: int = 96
    vf_w: int = 96
    H: int = 768
    W: int = 768
    vf_dim: int = 2048
    vocab_size: int = 76
    w_emb_dim: int = 1000
    v_emb_dim: int = 1000
    m_rnn_size: int = 500
    w_rnn_size: int = 1000
    fusion_type: str = "RMI"          # 'RMI' | 'RecurAttn'
    use_attn: bool = False
    backbone: str = "deeplab"         # 'deeplab' | 'fcn_8s' | 'segnet' | 'deeplab_v3plus'
    compute_dtype: str = "float32"    # 'float32' | 'bfloat16' (conv/matmul element type;
                                      # accumulation stays float32 on the MXU)
    shard_mlstm_pixels: bool = False  # shard the mLSTM's 96*96 pixel-batch dim
                                      # over the mesh 'model' axis (tensor
                                      # parallelism for the hottest recurrence)
    # training (reference RMI_model.py:312-372)
    start_lr: float = 2.5e-4
    end_lr: float = 1e-5
    lr_decay_step: int = 75000
    lr_power: float = 0.9
    weight_decay: float = 5e-4
    max_iters: int = 100000
    training_ignore_bg: bool = True
    train_fusion_var_only: bool = True
    snapshot_interval: int = 10000

    def __post_init__(self):
        if self.fusion_type == "RecurAttn":
            object.__setattr__(self, "m_rnn_size", 256)
            object.__setattr__(self, "w_emb_dim", 256)
            object.__setattr__(self, "v_emb_dim", 256)
            object.__setattr__(self, "w_rnn_size", 256)


@dataclass(frozen=True)
class FGGanConfig:
    """Foreground instance-colorization GAN
    (reference ``obj_colorization_main.py:159-207``, ``obj_lib/config.py``)."""
    batch_size: int = 2
    image_size: int = 192
    small: bool = False               # 64px variant (reference input_pipeline.py:40-41)
    num_classes: int = 25
    vocab_size: int = 58
    max_len: int = 15
    block_type: str = "MRU"           # 'MRU' | 'Pix2Pix' | 'Residual'
    base_channels: int = 64           # SIZE in models_collection.py:9
    num_blocks: int = 1               # NUM_BLOCKS
    noise_dim: int = 256
    lstm_hybrid: bool = True
    spectral_norm: bool = True        # Config.sn
    proj_d: bool = False
    wgan: bool = False
    distance_map: bool = False
    compute_dtype: str = "float32"    # 'float32' | 'bfloat16' conv element
                                      # type (DTypePolicy; accum stays f32)
    # training
    lr_g: float = 2e-4
    lr_d: float = 1e-4
    optimizer: str = "adam"           # beta1=0, beta2=0.9 (graph_single.py:588)
    max_iters: int = 100000
    ld: float = 10.0                  # gradient-penalty coefficient
    coeff_ac: float = 1.0
    coeff_l1: float = 100.0
    coeff_perceptual: float = 0.0     # inception-v4 perceptual loss (the
                                      # reference scaffolds it disabled,
                                      # graph_single.py:557-559)
    disc_steps: int = 1
    snapshot_interval: int = 10000


@dataclass(frozen=True)
class BGGanConfig:
    """Background colorization GAN (reference ``bg_colorization_main.py:978-1004``)."""
    batch_size: int = 1
    image_size: int = 768
    vocab_size: int = 18
    max_len: int = 8
    ngf: int = 64
    ndf: int = 64
    seg_classes: int = 3
    residual_enc_g: bool = True
    residual_enc_d: bool = True
    multi_residual: bool = True
    compute_dtype: str = "float32"    # 'float32' | 'bfloat16' conv element
                                      # type (DTypePolicy; accum stays f32)
    # training
    lr: float = 2e-4
    beta1: float = 0.5
    max_steps: int = 100000
    gan_weight: float = 1.0
    l1_weight: float = 100.0
    seg_weight: float = 100.0
    ema_decay: float = 0.99
    snapshot_interval: int = 10000
    remat: bool = False               # rematerialize the 768^2 generator
                                      # activations (trade FLOPs for HBM)


@dataclass(frozen=True)
class PipelineConfig:
    """Top-level interactive pipeline (reference ``sketchyscene_colorization_main.py:58-98``)."""
    data_base_dir: str = "examples"
    results_base_dir: str = "outputs"
    match_vocab_path: str = "data/match_vocab.txt"
    fg_vocab_path: str = "data/fg_vocab.txt"
    bg_vocab_path: str = "data/bg_vocab.txt"
    match_ckpt_dir: str = "checkpoints/matching"
    fg_ckpt_dir: str = "checkpoints/fg_gan"
    bg_ckpt_dir: str = "checkpoints/bg_gan"
    score_thresh: float = 1e-9        # fg_matching_utils.py:25
    mask_occupied_threshold: float = 0.5
    color_gradient: bool = True
    image_size: int = 768
    instance_size: int = 192
    # serving-path knobs (all output-preserving; see pipeline/session.py)
    cache_visual_features: bool = True   # backbone features cached per image
                                         # across instructions (the reference
                                         # rebuilds the whole graph per
                                         # command); False recomputes the
                                         # backbone every instruction
    async_png_writes: bool = False       # write-behind PNG encoding
    png_compress_level: int = 1          # zlib level of pipeline/io.write_png
    device_compositing: bool = True      # FG reverse-resize/paste/overlay as
                                         # one XLA dispatch per pass (bit-
                                         # exact PIL bilinear; byte-equal to
                                         # the host chain -- see
                                         # pipeline/device_compositing.py);
                                         # False keeps the NumPy/PIL chain
    compact_fetch: bool = True           # with device_compositing: fetch only
                                         # each pass's changed pixels (inner-
                                         # mask sets + host-known overlay) and
                                         # rebuild the canvas on host -- the
                                         # axon tunnel moves ~20 MB/s, so the
                                         # full-canvas fetch was the serving
                                         # bottleneck; byte-equal (tested)
    stream_segment_rows: int = 112       # split a stream FG run into GAN+
                                         # compositing segments of ~this many
                                         # instance rows (buckets to 128, a
                                         # measured-good batch size) so an
                                         # earlier segment's patch fetches
                                         # overlap a later segment's GAN
                                         # compute; 0 = one segment (noise
                                         # chain & outputs identical either
                                         # way -- tested)
    stream_small_segment_rows: int = 16  # runs totalling <= 96 instance rows
                                         # segment at THIS many rows instead:
                                         # the in-context GAN bucket walls are
                                         # pathological at 32/64 (r4: 16->46,
                                         # 32->109, 64->240 ms) and the r5
                                         # selective A/B measured two 16-row
                                         # buckets at 61-76 passes/s vs one
                                         # 32-bucket at 51-60; big runs keep
                                         # stream_segment_rows (112 -> bucket
                                         # 128, measured best on the stress
                                         # workload).  0 = disable (small
                                         # runs use stream_segment_rows)
    fused_gan_compositing: bool = False  # with compact_fetch: inline the FG
                                         # GAN prepare+forward INTO the
                                         # compositing program so a stream
                                         # segment is ONE tunnel dispatch.
                                         # Byte-identical to the split path
                                         # (tested); measured r4 on the axon
                                         # tunnel it is ~4% SLOWER (13.3 vs
                                         # 13.8 passes/s interleaved A/B --
                                         # XLA schedules the patch gathers
                                         # after the whole GAN), so default
                                         # off; the knob exists for
                                         # dispatch-latency-dominated links
    device_color_gradient: bool = True   # with device_compositing +
                                         # color_gradient at LUT scale: run
                                         # the sky gradient's LUT round-trip
                                         # + sky detection on device and keep
                                         # the canvas device-resident; only
                                         # the ramp rows round-trip to host
                                         # for the exact float64 HSV math
                                         # (byte-equal; PNG fetch goes
                                         # write-behind).  Falls back to the
                                         # host gradient below LUT scale or
                                         # when the sky band is fully FG
                                         # (preserving the reference's error)
    stage_trace: bool = False            # record (label, t0, t1) wall-clock
                                         # events for every serving stage
                                         # (dispatches, tunnel waits, host
                                         # reconstruction, PNG fetch/encode)
                                         # into session.trace_events -- the
                                         # per-stage breakdown behind
                                         # PARITY.md's serving tables; ~50 ns
                                         # per event, zero cost when off
    # serving memory bounds (the reference tears its graphs down per command,
    # fg_matching_utils.py:29-38, so it never accumulates state; the cached
    # redesign must not leak either).  0 = unbounded.
    max_cached_images: int = 8           # LRU over per-image fixture state
    max_cached_instance_inputs: int = 128  # per-image prepared-GAN-input LRU
    cache_match_scores: bool = True      # per-image LRU of matching scores by
                                         # instruction text: the [N_inst]
                                         # occupancy vector is a pure function
                                         # of (fixtures, params, text), so a
                                         # repeated instruction skips the
                                         # matching dispatch entirely (the
                                         # threshold still applies per session
                                         # -- scores are cached pre-threshold;
                                         # output-preserving, tested)
    max_cached_match_texts: int = 256    # bound of that per-image LRU; 0 = off
    serve_gan_data_parallel: int = 0     # >1: shard the batched FG instance-
                                         # GAN forward (the measured serving
                                         # device floor, ~1.1 ms/row f32) over
                                         # a ('data',) mesh of that many
                                         # devices -- rows are independent
                                         # (per-sample BN), so a K-row bucket
                                         # splits K/n per chip and XLA moves
                                         # only the row inputs/outputs over
                                         # ICI.  Outputs match the unsharded
                                         # engine up to the same batch-bucket
                                         # reduction-order envelope as
                                         # sequential-vs-stream (session.py
                                         # header); records byte-identical
                                         # (tested on the 8-device CPU mesh).
                                         # 0/1 or fewer devices than asked =
                                         # single-device (the bench default;
                                         # one real chip under the tunnel)


@dataclass(frozen=True)
class FrameworkConfig:
    matching: MatchingConfig = field(default_factory=MatchingConfig)
    fg_gan: FGGanConfig = field(default_factory=FGGanConfig)
    bg_gan: BGGanConfig = field(default_factory=BGGanConfig)
    pipeline: PipelineConfig = field(default_factory=PipelineConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    dtype: DTypePolicy = field(default_factory=DTypePolicy)
    seed: int = 0

    def to_json(self, **kw) -> str:
        return json.dumps(_asdict(self), indent=2, **kw)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @staticmethod
    def from_json(text: str) -> "FrameworkConfig":
        raw = json.loads(text)
        return FrameworkConfig(
            matching=MatchingConfig(**raw.get("matching", {})),
            fg_gan=FGGanConfig(**raw.get("fg_gan", {})),
            bg_gan=BGGanConfig(**raw.get("bg_gan", {})),
            pipeline=PipelineConfig(**raw.get("pipeline", {})),
            mesh=MeshConfig(**raw.get("mesh", {})),
            dtype=DTypePolicy(**raw.get("dtype", {})),
            seed=raw.get("seed", 0),
        )

    @staticmethod
    def load(path: str) -> "FrameworkConfig":
        with open(path) as f:
            return FrameworkConfig.from_json(f.read())
