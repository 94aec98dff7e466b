"""Fused mLSTM kernel: interpret-mode Pallas vs the lax.scan formulation,
gradient equivalence, padding, both masking schemes, and (RUN_SLOW) the
tensor-parallel path at the production pixel count."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sketchyscenecolorization_tpu.ops.pallas_mlstm import (
    attn_weighted_pixel_lstm, masked_pixel_lstm, mlstm_attn_pallas,
    mlstm_attn_scan, mlstm_pallas, mlstm_scan, recur_attn_pallas,
    recur_attn_pixel_lstm, recur_attn_scan,
)


def _inputs(n=2, p=40, hidden=12, t=5, seed=0):
    rng = np.random.RandomState(seed)
    pixel = jnp.asarray(rng.randn(n, p, 4 * hidden), jnp.float32) * 0.3
    step = jnp.asarray(rng.randn(n, t, 4 * hidden), jnp.float32) * 0.3
    w_h = jnp.asarray(rng.randn(hidden, 4 * hidden), jnp.float32) * 0.2
    return pixel, step, w_h


def test_pallas_matches_scan_endpad_mask():
    pixel, step, w_h = _inputs()
    seq_len = jnp.array([3, 5])
    valid = jnp.arange(5)[None, :] < seq_len[:, None]
    got = mlstm_pallas(pixel, step, w_h, valid, tile_p=16, interpret=True)
    want = mlstm_scan(pixel, step, w_h, valid)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pallas_matches_scan_frontpad_mask():
    pixel, step, w_h = _inputs(n=1, p=36, hidden=8, t=4)
    valid = jnp.array([[False, False, True, True]])
    got = mlstm_pallas(pixel, step, w_h, valid, tile_p=16, interpret=True)
    want = mlstm_scan(pixel, step, w_h, valid)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pallas_pads_pixel_dim():
    # p=40 with tile 16 -> padded to 48 internally, result trimmed
    pixel, step, w_h = _inputs(p=40)
    valid = jnp.ones((2, 5), bool)
    got = mlstm_pallas(pixel, step, w_h, valid, tile_p=16, interpret=True)
    assert got.shape == (2, 40, 12)


def test_custom_vjp_matches_scan_grads():
    pixel, step, w_h = _inputs(n=1, p=24, hidden=8, t=4)
    valid = jnp.ones((1, 4), bool)

    def loss_fused(args):
        return jnp.sum(masked_pixel_lstm(*args, valid) ** 2)

    def loss_scan(args):
        return jnp.sum(mlstm_scan(*args, valid) ** 2)

    g_fused = jax.grad(loss_fused)((pixel, step, w_h))
    g_scan = jax.grad(loss_scan)((pixel, step, w_h))
    for a, b in zip(g_fused, g_scan):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_attn_kernel_matches_scan():
    """Word-attention variant: the VMEM-accumulated weighted output sum
    (interpret mode) equals the scan, for end-padded masks and
    non-tile-aligned P."""
    pixel, step, w_h = _inputs(p=40)
    seq_len = jnp.array([3, 5])
    valid = jnp.arange(5)[None, :] < seq_len[:, None]
    rng = np.random.RandomState(3)
    attn = jax.nn.softmax(jnp.asarray(rng.randn(2, 5), jnp.float32), axis=-1)
    got = mlstm_attn_pallas(pixel, step, w_h, valid, attn, tile_p=16,
                            interpret=True)
    want = mlstm_attn_scan(pixel, step, w_h, valid, attn)
    assert got.shape == (2, 40, 12)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_attn_custom_vjp_matches_scan_grads(monkeypatch):
    """Gradients of the attention variant (fused interpret forward) equal
    the scan formulation's -- including d_attn, which feeds the attention
    projection's backward."""
    monkeypatch.setenv("MLSTM_PALLAS_INTERPRET", "1")
    pixel, step, w_h = _inputs(n=1, p=24, hidden=8, t=4)
    valid = jnp.array([[True, True, True, False]])
    attn = jax.nn.softmax(jnp.asarray(
        np.random.RandomState(5).randn(1, 4), jnp.float32), axis=-1)

    def loss_fused(args):
        return jnp.sum(attn_weighted_pixel_lstm(args[0], args[1], args[2],
                                                valid, args[3]) ** 2)

    def loss_scan(args):
        return jnp.sum(mlstm_attn_scan(args[0], args[1], args[2],
                                       valid, args[3]) ** 2)

    g_fused = jax.grad(loss_fused)((pixel, step, w_h, attn))
    g_scan = jax.grad(loss_scan)((pixel, step, w_h, attn))
    for a, b, name in zip(g_fused, g_scan,
                          ("d_pixel", "d_step", "d_wh", "d_attn")):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6, err_msg=name)


def test_attn_bwd_kernel_matches_scan_grads():
    """The fused attention-variant BPTT kernel (interpret mode) reproduces
    the scan-VJP gradients -- d_pixel/d_step/d_wh AND d_attn -- for both
    masking schemes and non-tile-aligned P."""
    from sketchyscenecolorization_tpu.ops.pallas_mlstm import (
        mlstm_attn_pallas_bwd)
    for seed, valid_rows in ((0, [[True] * 5, [True, True, True, False, False]]),
                             (1, [[False, False, True, True, True]] * 2)):
        pixel, step, w_h = _inputs(n=2, p=40, hidden=12, t=5, seed=seed)
        valid = jnp.asarray(np.array(valid_rows))
        rng = np.random.RandomState(seed + 7)
        attn = jax.nn.softmax(jnp.asarray(rng.randn(2, 5), jnp.float32),
                              axis=-1)
        g = jnp.asarray(rng.randn(2, 40, 12), jnp.float32)

        _, vjp = jax.vjp(
            lambda pt, st, wh, a: mlstm_attn_scan(pt, st, wh, valid, a),
            pixel, step, w_h, attn)
        want = vjp(g)
        got = mlstm_attn_pallas_bwd(pixel, step, w_h, valid, attn, g,
                                    tile_p=16, interpret=True)
        for a, b, name in zip(got, want,
                              ("d_pixel", "d_step", "d_wh", "d_attn")):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5,
                                       err_msg=name)


def _recur_attn_inputs(n=2, p=40, hidden=12, w_rnn=10, t=5, seed=0):
    rng = np.random.RandomState(seed)
    h0 = jnp.asarray(rng.randn(n, p, hidden), jnp.float32) * 0.3
    lang = jnp.asarray(rng.randn(n, t, w_rnn), jnp.float32) * 0.3
    wp = jnp.asarray(rng.randn(hidden, w_rnn), jnp.float32) * 0.2
    bp = jnp.asarray(rng.randn(w_rnn), jnp.float32) * 0.1
    wm = jnp.asarray(rng.randn(w_rnn + hidden, 4 * hidden), jnp.float32) * 0.2
    bm = jnp.asarray(rng.randn(4 * hidden), jnp.float32) * 0.1
    return h0, lang, wp, bp, wm, bm


def test_recur_attn_kernel_matches_scan():
    """RecurAttn fusion (``RMI_model.py:224-273``): the fused kernel
    (interpret mode) equals the scan for front-pad masks (token != 0 --
    RecurAttn skips pad steps wherever they fall) and non-tile-aligned P."""
    args = _recur_attn_inputs(p=40)
    for valid_rows in ([[True] * 5, [True, True, True, False, False]],
                       [[False, False, True, True, True]] * 2):
        valid = jnp.asarray(np.array(valid_rows))
        got = recur_attn_pallas(*args, valid, tile_p=16, interpret=True)
        want = recur_attn_scan(*args, valid)
        assert got.shape == (2, 40, 12)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_recur_attn_bwd_kernel_matches_scan_grads():
    """The fused RecurAttn BPTT kernel (interpret mode) reproduces the
    scan-VJP gradients for all six inputs -- including the softmax VJP, both
    lang contributions, and the h->word projection -- under both masking
    layouts and non-tile-aligned P."""
    from sketchyscenecolorization_tpu.ops.pallas_mlstm import (
        recur_attn_pallas_bwd)
    for seed, valid_rows in ((0, [[True] * 5, [True, True, True, False, False]]),
                             (1, [[False, False, True, True, True]] * 2)):
        args = _recur_attn_inputs(p=40, seed=seed)
        valid = jnp.asarray(np.array(valid_rows))
        g = jnp.asarray(np.random.RandomState(seed + 7).randn(2, 40, 12),
                        jnp.float32)

        _, vjp = jax.vjp(lambda *a: recur_attn_scan(*a, valid), *args)
        want = vjp(g)
        got = recur_attn_pallas_bwd(*args, valid, g, tile_p=16,
                                    interpret=True)
        for a, b, name in zip(got, want,
                              ("d_h0", "d_lang", "d_wp", "d_bp", "d_wm",
                               "d_bm")):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5,
                                       err_msg=name)


def test_recur_attn_custom_vjp_matches_scan_grads(monkeypatch):
    """Gradients of the RecurAttn op (fused interpret forward, scan-derived
    backward) equal differentiating the scan directly -- for every input
    including the h->word projection and the mLSTM weight."""
    monkeypatch.setenv("MLSTM_PALLAS_INTERPRET", "1")
    args = _recur_attn_inputs(n=1, p=24, hidden=8, w_rnn=6, t=4, seed=3)
    valid = jnp.array([[True, True, True, False]])

    def loss_fused(a):
        return jnp.sum(recur_attn_pixel_lstm(*a, valid) ** 2)

    def loss_scan(a):
        return jnp.sum(recur_attn_scan(*a, valid) ** 2)

    g_fused = jax.grad(loss_fused)(args)
    g_scan = jax.grad(loss_scan)(args)
    for a, b, name in zip(g_fused, g_scan,
                          ("d_h0", "d_lang", "d_wp", "d_bp", "d_wm", "d_bm")):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5, err_msg=name)


def test_pallas_bwd_kernel_matches_scan_grads():
    """The fused BPTT kernel (interpret mode) reproduces the scan-VJP
    gradients for both masking schemes and non-tile-aligned P."""
    from sketchyscenecolorization_tpu.ops.pallas_mlstm import mlstm_pallas_bwd
    for seed, valid_rows in ((0, [[True] * 5, [True, True, True, False, False]]),
                             (1, [[False, False, True, True, True]] * 2)):
        pixel, step, w_h = _inputs(n=2, p=40, hidden=12, t=5, seed=seed)
        valid = jnp.asarray(np.array(valid_rows))
        rng = np.random.RandomState(seed + 7)
        g = jnp.asarray(rng.randn(2, 40, 12), jnp.float32)

        _, vjp = jax.vjp(lambda pt, st, wh: mlstm_scan(pt, st, wh, valid),
                         pixel, step, w_h)
        want = vjp(g)
        got = mlstm_pallas_bwd(pixel, step, w_h, valid, g, tile_p=16,
                               interpret=True)
        for a, b, name in zip(got, want, ("d_pixel", "d_step", "d_wh")):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5,
                                       err_msg=name)


@pytest.mark.skipif(os.environ.get("RUN_SLOW") != "1",
                    reason="production-shape TP kernel run (set RUN_SLOW=1)")
def test_tp_kernel_at_production_pixel_count(monkeypatch):
    """The shard_map-wrapped kernel at the REAL matching scale: P = 96*96 =
    9216 sharded 2-way over 'model' (per-shard P=4608: 18 fwd tiles of 256,
    36 bwd tiles of 128), H=500 (4H=2000, NOT lane-aligned -- exercises
    mosaic padding), T=15.  Forward and all three gradients must match the
    unsharded scan formulation (``RMI_model.py:169-200`` at full size; the
    small-shape TP tests cover the same wiring but not this tile/pad
    geometry)."""
    from jax.sharding import PartitionSpec as P
    from sketchyscenecolorization_tpu import parallel
    monkeypatch.setenv("MLSTM_PALLAS_INTERPRET", "1")

    rng = np.random.RandomState(0)
    p, hid, t = 96 * 96, 500, 15
    pixel = jnp.asarray(rng.randn(1, p, 4 * hid).astype(np.float32) * 0.1)
    step = jnp.asarray(rng.randn(1, t, 4 * hid).astype(np.float32) * 0.1)
    w_h = jnp.asarray(rng.randn(hid, 4 * hid).astype(np.float32) * 0.02)
    seq_len = jnp.array([8])
    valid = jnp.arange(t)[None, :] < seq_len[:, None]

    def loss(f, pt, st, wh):
        return jnp.sum(f(pt, st, wh, valid) ** 2) * 1e-4

    want_y = mlstm_scan(pixel, step, w_h, valid)
    want_g = jax.grad(lambda *a: loss(mlstm_scan, *a),
                      argnums=(0, 1, 2))(pixel, step, w_h)

    mesh = parallel.create_mesh(data=1, model=2)
    sharded = jax.shard_map(
        masked_pixel_lstm, mesh=mesh,
        in_specs=(P(None, "model", None), P(None, None, None),
                  P(None, None), P(None, None)),
        out_specs=P(None, "model", None), check_vma=False)
    with jax.set_mesh(mesh):
        got_y = jax.jit(lambda pt, st, wh: sharded(pt, st, wh, valid))(
            pixel, step, w_h)
        got_g = jax.jit(jax.grad(
            lambda pt, st, wh: jnp.sum(sharded(pt, st, wh, valid) ** 2)
            * 1e-4, argnums=(0, 1, 2)))(pixel, step, w_h)
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y),
                               rtol=1e-5, atol=1e-6)
    for a, b, name in zip(got_g, want_g, ("d_pixel", "d_step", "d_wh")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_custom_vjp_uses_pallas_bwd_when_forced(monkeypatch):
    """End-to-end: with MLSTM_PALLAS_INTERPRET=1 the custom VJP routes
    through the fused backward kernel and still matches scan grads."""
    monkeypatch.setenv("MLSTM_PALLAS_INTERPRET", "1")
    pixel, step, w_h = _inputs(n=1, p=24, hidden=8, t=4, seed=3)
    valid = jnp.array([[True, True, False, False]])

    def loss_fused(args):
        return jnp.sum(masked_pixel_lstm(*args, valid) ** 2)

    def loss_scan(args):
        return jnp.sum(mlstm_scan(*args, valid) ** 2)

    g_fused = jax.grad(loss_fused)((pixel, step, w_h))
    g_scan = jax.grad(loss_scan)((pixel, step, w_h))
    for a, b in zip(g_fused, g_scan):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
