"""Metric tests: hand-computed IoU/AP cases and evaluator accumulation."""
import numpy as np

from sketchyscenecolorization_tpu.evaluation import (
    MatchingEvaluator, compute_ap, compute_bbox_iou, compute_mask_IU,
    compute_overlaps_masks,
)


def test_bbox_iou():
    a = [0, 0, 9, 9]          # 10x10 = 100
    b = [5, 5, 14, 14]        # 10x10, overlap 5x5 = 25
    np.testing.assert_allclose(compute_bbox_iou(a, b), [25 / 175])
    np.testing.assert_allclose(compute_bbox_iou(a, a), [1.0])


def test_mask_iu():
    m = np.zeros((8, 8), bool)
    t = np.zeros((8, 8), bool)
    m[:4] = True
    t[2:6] = True
    i, u = compute_mask_IU(m, t)
    assert i == 16 and u == 48


def test_overlaps_masks():
    m1 = np.zeros((4, 4, 2))
    m2 = np.zeros((4, 4, 1))
    m1[:2, :, 0] = 1
    m1[2:, :, 1] = 1
    m2[1:3, :, 0] = 1
    ov = compute_overlaps_masks(m1, m2)
    np.testing.assert_allclose(ov, [[4 / 12], [4 / 12]])


def test_compute_ap_perfect_and_miss():
    gt = np.zeros((8, 8, 1))
    gt[2:6, 2:6, 0] = 1
    # perfect prediction
    ap, _, _, _ = compute_ap(gt, np.array([0.9]), gt.copy(), iou_threshold=0.5)
    assert ap == 1.0
    # disjoint prediction
    miss = np.zeros((8, 8, 1))
    miss[0:1, 0:1, 0] = 1
    ap, _, _, _ = compute_ap(gt, np.array([0.9]), miss, iou_threshold=0.5)
    assert ap == 0.0


def test_compute_ap_greedy_matching_order():
    """Two predictions on one GT: only the higher-scored match counts."""
    gt = np.zeros((8, 8, 1))
    gt[2:6, 2:6, 0] = 1
    preds = np.stack([gt[..., 0], gt[..., 0]], axis=2)
    ap, precisions, recalls, _ = compute_ap(gt, np.array([0.9, 0.8]), preds)
    # first pred matches, second finds its GT taken -> precision drops
    assert ap == 1.0  # recall reaches 1 at precision 1 after envelope
    assert recalls[-2] == 1.0


def test_evaluator_accumulates():
    ev = MatchingEvaluator(compute_mask_ap=False)
    m = np.zeros((8, 8))
    t = np.zeros((8, 8))
    m[:4] = 1
    t[:4] = 1
    iou = ev.add(m, t)
    assert iou == 1.0
    m2 = np.zeros((8, 8)); m2[:1] = 1
    t2 = np.zeros((8, 8)); t2[:4] = 1
    ev.add(m2, t2)
    res = ev.result()
    assert res.num_samples == 2
    assert res.precision_at[0.5] == 0.5          # one of two >= 0.5
    np.testing.assert_allclose(res.cum_iou, (32 + 8) / (32 + 32))
    assert "overall IoU" in res.summary()


def test_inception_score_bounds():
    from sketchyscenecolorization_tpu.evaluation import inception_score
    # uniform posteriors -> marginal == posterior -> IS = 1
    uniform = np.full((100, 10), 0.1)
    mean, std = inception_score(uniform, splits=5)
    np.testing.assert_allclose(mean, 1.0, rtol=1e-6)
    # confident + diverse one-hots -> IS == num classes
    onehot = np.eye(10)[np.arange(100) % 10]
    mean, _ = inception_score(onehot, splits=5)
    np.testing.assert_allclose(mean, 10.0, rtol=1e-5)
    # confident but mode-collapsed -> IS = 1
    collapsed = np.tile(np.eye(10)[0], (100, 1))
    mean, _ = inception_score(collapsed, splits=5)
    np.testing.assert_allclose(mean, 1.0, rtol=1e-6)


def test_acgan_class_probs_shapes():
    import jax
    from sketchyscenecolorization_tpu.config import FGGanConfig
    from sketchyscenecolorization_tpu.evaluation import acgan_class_probs
    from sketchyscenecolorization_tpu.train.fg_gan import create_fg_gan_state
    cfg = FGGanConfig(batch_size=1, image_size=64, vocab_size=10, max_len=4,
                      base_channels=4, noise_dim=8)
    state = create_fg_gan_state(jax.random.PRNGKey(0), cfg)
    imgs = np.random.RandomState(0).uniform(-1, 1, (5, 64, 64, 3)).astype(np.float32)
    probs = acgan_class_probs(cfg, state.d_params, state.d_sn, imgs,
                              batch_size=3)
    assert probs.shape == (5, cfg.num_classes)
    np.testing.assert_allclose(probs.sum(1), 1.0, rtol=1e-5)


import pytest


@pytest.mark.heavy
def test_inception_v4_class_probs_and_score():
    """The real-classifier IS path: full v4 posteriors are a distribution
    and feed inception_score.  (heavy: compiles the full v4 on CPU.)"""
    import jax
    from sketchyscenecolorization_tpu.evaluation import (
        inception_score, inception_v4_class_probs)
    from sketchyscenecolorization_tpu.models import inception_v4 as inc
    params = inc.init_params(jax.random.PRNGKey(0), num_classes=9,
                             create_aux_logits=False)
    imgs = np.random.RandomState(0).uniform(-1, 1, (3, 64, 64, 3))
    probs = inception_v4_class_probs(params, imgs, batch_size=2)
    assert probs.shape == (3, 9)
    np.testing.assert_allclose(probs.sum(1), 1.0, rtol=1e-5)
    mean, _ = inception_score(probs, splits=1)
    assert 1.0 <= mean <= 9.0 + 1e-6
