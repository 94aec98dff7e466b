"""Train-to-learn evidence: overfit one batch per model (RUN_SLOW).

The fast gates prove the train steps *run* and that one step decreases the
loss; these prove the full optimizer stacks *learn* — matching drives one
caption's mask to IoU > 0.9 through the frozen-backbone/poly-LR/bias-x2
Adam stack with the fused Pallas mLSTM backward in the loop
(``Instance_Matching/matching_main.py:179-239``), and both GANs drive
reconstruction well below its initial value through the SN/batch-stats-BN/
alternating-D-G stacks (``obj_lib/main_procedure.py:178-237``,
``Background_Colorization/bg_colorization_main.py:894-975``).

Shapes are reduced (96^2 matching / 64^2 GANs) so the tests finish on CPU
in ~2-3 min each, but structurally faithful: stride-8 backbone, real
vf = H/8, mLSTM over vf_h*vf_w pixels, SN power iteration, batch-stats BN.
Wall-times are recorded in PARITY.md ("Train-to-learn evidence").
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sketchyscenecolorization_tpu.config import (
    BGGanConfig, FGGanConfig, MatchingConfig,
)
from sketchyscenecolorization_tpu.models import rmi
from sketchyscenecolorization_tpu.train import (
    create_bg_gan_state, create_fg_gan_state, create_matching_state,
    make_bg_gan_train_step, make_fg_gan_train_step, make_matching_train_step,
)

pytestmark = pytest.mark.skipif(
    os.environ.get("RUN_SLOW") != "1",
    reason="overfit-one-batch convergence runs (set RUN_SLOW=1)")


def test_matching_overfits_one_caption_to_high_iou(monkeypatch):
    """600 steps on one (sketch, caption, mask) triple reach IoU > 0.9.

    Runs the *fused Pallas BPTT backward* (interpret mode on CPU) inside
    the real train step: trainable-scope filter, ignore-background gather,
    poly LR, Adam with bias-LR x2 — the full ``RMI_model.py:312-372``
    stack.  Calibrated: IoU 0.904 @ step 500, 0.911 @ step 600 (~170 s
    CPU)."""
    monkeypatch.setenv("MLSTM_PALLAS_INTERPRET", "1")
    cfg = MatchingConfig(vf_h=12, vf_w=12, H=96, W=96, vocab_size=12,
                         w_emb_dim=16, v_emb_dim=16, m_rnn_size=16,
                         w_rnn_size=16, max_len=5, lr_decay_step=4000,
                         max_iters=4000)
    params = jax.jit(lambda k: rmi.init_params(k, cfg))(jax.random.PRNGKey(0))
    state = create_matching_state(params, cfg)
    step = make_matching_train_step(cfg, donate=False)

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(1, 96, 96, 3).astype(np.float32) * 50)
    words = jnp.asarray(rng.randint(1, 12, (1, 5)).astype(np.int32))
    seq_len = jnp.asarray(np.full((1,), 3, np.int32))
    target = np.zeros((1, 96, 96, 1), np.float32)
    target[0, 20:70, 30:80, 0] = 1
    batch = {"image": img, "words": words, "seq_len": seq_len,
             "target_mask": jnp.asarray(target)}
    fwd = jax.jit(lambda p: rmi.apply(p, cfg, img, words, seq_len).up)

    t0 = time.perf_counter()
    state, m0 = step(state, batch)
    for _ in range(600):
        state, m = step(state, batch)
    pred = np.asarray(fwd(state.params))[..., 0] >= 0  # sigm>0.5 <=> up>=0
    gt = target[..., 0] > 0.5
    iou = (pred & gt).sum() / max((pred | gt).sum(), 1)
    print(f"matching overfit: iou={iou:.3f} cls {float(m0['cls_loss']):.0f}"
          f"->{float(m['cls_loss']):.0f} in {time.perf_counter() - t0:.0f}s")
    assert iou > 0.9
    assert float(m["cls_loss"]) < 0.2 * float(m0["cls_loss"])


def test_fg_gan_overfits_reconstruction():
    """200 alternating D/G steps on one batch cut smooth-L1 recon to
    <0.75x initial (calibrated 0.68x @ 200, ~140 s CPU) with no NaN —
    the WGAN-SN + ACGAN-focal + smooth-L1 stack of
    ``graph_single.py:221-581`` learns, SN power-iteration state and
    conditional batch-stats BN included."""
    cfg = FGGanConfig(batch_size=2, image_size=64, vocab_size=10, max_len=4,
                      base_channels=8, noise_dim=8, max_iters=2000)
    state = create_fg_gan_state(jax.random.PRNGKey(0), cfg)
    step = make_fg_gan_train_step(cfg, donate=False)

    rng = np.random.RandomState(0)
    s, b = cfg.image_size, cfg.batch_size
    batch = {
        "images": jnp.asarray(rng.uniform(-1, 1, (b, s, s, 3)), jnp.float32),
        "sketches": jnp.asarray(rng.uniform(-1, 1, (b, s, s, 3)), jnp.float32),
        "images_d": jnp.asarray(rng.uniform(-1, 1, (b, s, s, 3)), jnp.float32),
        "class_id": jnp.asarray(rng.randint(0, 25, (b,)), jnp.int32),
        "class_id_d": jnp.asarray(rng.randint(0, 25, (b,)), jnp.int32),
        "tokens": jnp.asarray(rng.randint(0, 10, (b, 4)), jnp.int32),
    }
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    state, m = step(state, batch, batch, key)
    recon0 = float(m["recon_l1"])
    for _ in range(200):
        state, m = step(state, batch, batch, key)
        assert not bool(m["nan"])
    recon = float(m["recon_l1"])
    print(f"fg overfit: recon {recon0:.4f}->{recon:.4f} "
          f"({recon / recon0:.2f}x) in {time.perf_counter() - t0:.0f}s")
    assert recon < 0.75 * recon0


def test_bg_gan_overfits_reconstruction():
    """200 steps on one (input, target, caption, labels) tuple cut the
    masked L1 to <0.55x initial (calibrated 0.41x @ 200, ~90 s CPU) —
    the log-GAN + masked-L1 + region-xent + EMA stack of
    ``bg_colorization_main.py:585-700`` learns."""
    cfg = BGGanConfig(batch_size=1, image_size=64, vocab_size=8, max_len=4,
                      ngf=8, ndf=8, multi_residual=False, max_steps=2000)
    state = create_bg_gan_state(jax.random.PRNGKey(0), cfg)
    step = make_bg_gan_train_step(cfg, donate=False)

    rng = np.random.RandomState(0)
    s = cfg.image_size
    batch = {
        "inputs": jnp.asarray(rng.uniform(-1, 1, (1, s, s, 3)), jnp.float32),
        "targets": jnp.asarray(rng.uniform(-1, 1, (1, s, s, 3)), jnp.float32),
        "tokens": jnp.asarray(rng.randint(0, 8, (1, 4)), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 3, (1, s, s)), jnp.int32),
    }
    t0 = time.perf_counter()
    state, m = step(state, batch)
    l1_0 = float(m["gen_loss_L1"])
    for _ in range(200):
        state, m = step(state, batch)
    l1 = float(m["gen_loss_L1"])
    print(f"bg overfit: L1 {l1_0:.4f}->{l1:.4f} "
          f"({l1 / l1_0:.2f}x) in {time.perf_counter() - t0:.0f}s")
    assert l1 < 0.55 * l1_0
