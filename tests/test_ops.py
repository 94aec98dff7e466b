"""Op-level unit tests: conv/deconv semantics (cross-checked against torch
CPU), LSTM cell math, masked-scan dynamic_rnn semantics, resize parity, BN
variants, spectral norm."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sketchyscenecolorization_tpu.ops import (
    conv2d, atrous_conv2d, pad1_conv4, conv2d_transpose, max_pool_3x3_s2,
    frozen_batch_norm, batch_stats_norm, conditional_batch_stats_norm,
    spectral_normalize, l2_normalize,
    lstm_cell, lstm_scan, masked_lstm_scan,
    mean_pool_2x2, nn_upsample_2x, box_downsample, tf1_resize_bilinear,
    generate_spatial_batch, lrelu, miu_relu, atanh_transform,
)


def test_conv2d_same_shapes():
    x = jnp.ones((1, 8, 8, 3))
    w = jnp.ones((3, 3, 3, 16))
    assert conv2d(x, w, stride=1).shape == (1, 8, 8, 16)
    assert conv2d(x, w, stride=2).shape == (1, 4, 4, 16)


def test_conv2d_matches_torch():
    import torch
    rng = np.random.RandomState(0)
    x = rng.randn(2, 10, 10, 3).astype(np.float32)
    w = rng.randn(3, 3, 3, 5).astype(np.float32)
    out = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), stride=1))
    tx = torch.tensor(x.transpose(0, 3, 1, 2))
    tw = torch.tensor(w.transpose(3, 2, 0, 1))
    tout = torch.nn.functional.conv2d(tx, tw, padding=1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, tout, rtol=1e-4, atol=1e-4)


def test_atrous_conv_matches_torch_dilation():
    import torch
    rng = np.random.RandomState(1)
    x = rng.randn(1, 16, 16, 4).astype(np.float32)
    w = rng.randn(3, 3, 4, 6).astype(np.float32)
    out = np.asarray(atrous_conv2d(jnp.asarray(x), jnp.asarray(w), rate=2))
    tx = torch.tensor(x.transpose(0, 3, 1, 2))
    tw = torch.tensor(w.transpose(3, 2, 0, 1))
    # SAME for dilated 3x3 rate 2 -> effective 5x5 -> pad 2
    tout = torch.nn.functional.conv2d(tx, tw, padding=2, dilation=2).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, tout, rtol=1e-4, atol=1e-4)


def test_conv2d_transpose_matches_torch():
    import torch
    rng = np.random.RandomState(2)
    x = rng.randn(1, 6, 6, 4).astype(np.float32)
    w = rng.randn(4, 4, 4, 8).astype(np.float32)  # HWIO
    out = np.asarray(conv2d_transpose(jnp.asarray(x), jnp.asarray(w), stride=2))
    assert out.shape == (1, 12, 12, 8)
    tx = torch.tensor(x.transpose(0, 3, 1, 2))
    # torch ConvTranspose2d weight layout: [in, out, kh, kw]
    tw = torch.tensor(w.transpose(2, 3, 0, 1))
    # TF SAME conv2d_transpose(k=4, s=2) == torch ConvTranspose2d(k=4, s=2, p=1)
    tout = torch.nn.functional.conv_transpose2d(tx, tw, stride=2, padding=1)
    tout = tout.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, tout, rtol=1e-4, atol=1e-4)


def test_pad1_conv4_shapes():
    x = jnp.ones((1, 8, 8, 3))
    w = jnp.ones((4, 4, 3, 5))
    assert pad1_conv4(x, w, stride=2).shape == (1, 4, 4, 5)
    assert pad1_conv4(x, w, stride=1).shape == (1, 7, 7, 5)  # PatchGAN shrink-by-1


def test_max_pool():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    y = max_pool_3x3_s2(x)
    assert y.shape == (1, 2, 2, 1)
    # TF/lax SAME for k=3,s=2 on size 4 pads (0,1): window(0,0) covers [0:3,0:3]
    assert float(y[0, 0, 0, 0]) == 10.0
    assert float(y[0, 1, 1, 0]) == 15.0


def _np_lstm_ref(xs, w, b, hidden, seq_len=None, forget_bias=1.0):
    """NumPy reference implementing TF BasicLSTMCell + dynamic_rnn."""
    B, T, D = xs.shape
    c = np.zeros((B, hidden), np.float32)
    h = np.zeros((B, hidden), np.float32)
    outs = np.zeros((B, T, hidden), np.float32)
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))
    for t in range(T):
        gates = np.concatenate([xs[:, t], h], axis=1) @ w + b
        i, j, f, o = np.split(gates, 4, axis=1)
        new_c = c * sig(f + forget_bias) + sig(i) * np.tanh(j)
        new_h = sig(o) * np.tanh(new_c)
        if seq_len is None:
            c, h = new_c, new_h
            outs[:, t] = h
        else:
            valid = (t < seq_len)[:, None]
            c = np.where(valid, new_c, c)
            h = np.where(valid, new_h, h)
            outs[:, t] = np.where(valid, h, 0.0)
    return outs, (c, h)


def test_lstm_scan_matches_reference():
    rng = np.random.RandomState(3)
    B, T, D, H = 4, 7, 5, 6
    xs = rng.randn(B, T, D).astype(np.float32)
    w = (rng.randn(D + H, 4 * H) * 0.3).astype(np.float32)
    b = rng.randn(4 * H).astype(np.float32) * 0.1
    ys, (c, h) = lstm_scan(jnp.asarray(xs), jnp.asarray(w), jnp.asarray(b), H)
    ref_ys, (ref_c, ref_h) = _np_lstm_ref(xs, w, b, H)
    np.testing.assert_allclose(np.asarray(ys), ref_ys, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), ref_h, rtol=1e-5, atol=1e-5)


def test_masked_lstm_scan_dynamic_rnn_semantics():
    rng = np.random.RandomState(4)
    B, T, D, H = 3, 6, 4, 5
    xs = rng.randn(B, T, D).astype(np.float32)
    w = (rng.randn(D + H, 4 * H) * 0.3).astype(np.float32)
    b = np.zeros(4 * H, np.float32)
    seq_len = np.array([2, 6, 0], np.int32)
    ys, (c, h) = masked_lstm_scan(jnp.asarray(xs), jnp.asarray(seq_len),
                                  jnp.asarray(w), jnp.asarray(b), H)
    ref_ys, (ref_c, ref_h) = _np_lstm_ref(xs, w, b, H, seq_len)
    np.testing.assert_allclose(np.asarray(ys), ref_ys, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), ref_c, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), ref_h, rtol=1e-5, atol=1e-5)
    # outputs past seq_len are zero; batch with len 0 keeps zero state
    assert np.all(np.asarray(ys)[0, 2:] == 0)
    assert np.all(np.asarray(ys)[2] == 0)


def test_mean_pool_and_upsample():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    y = mean_pool_2x2(x)
    assert y.shape == (1, 2, 2, 1)
    assert float(y[0, 0, 0, 0]) == (0 + 1 + 4 + 5) / 4.0
    up = nn_upsample_2x(y)
    assert up.shape == (1, 4, 4, 1)
    assert float(up[0, 0, 0, 0]) == float(up[0, 1, 1, 0]) == float(y[0, 0, 0, 0])


def test_box_downsample_matches_mean_pool():
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))
    np.testing.assert_allclose(np.asarray(box_downsample(x, 2)),
                               np.asarray(mean_pool_2x2(x)), rtol=1e-6)


def test_tf1_resize_bilinear_exact():
    """Check against a direct per-pixel implementation of the TF1 legacy grid."""
    rng = np.random.RandomState(6)
    x = rng.randn(1, 6, 5, 2).astype(np.float32)
    out_h, out_w = 13, 9
    y = np.asarray(tf1_resize_bilinear(jnp.asarray(x), out_h, out_w))

    def ref(img):
        h, w, c = img.shape
        out = np.zeros((out_h, out_w, c), np.float32)
        for i in range(out_h):
            for j in range(out_w):
                sy, sx = i * h / out_h, j * w / out_w
                y0, x0 = int(np.floor(sy)), int(np.floor(sx))
                y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                fy, fx = sy - y0, sx - x0
                out[i, j] = (img[y0, x0] * (1 - fy) * (1 - fx) + img[y0, x1] * (1 - fy) * fx
                             + img[y1, x0] * fy * (1 - fx) + img[y1, x1] * fy * fx)
        return out

    np.testing.assert_allclose(y[0], ref(x[0]), rtol=1e-4, atol=1e-5)


def test_frozen_bn_factor():
    x = jnp.ones((1, 2, 2, 3)) * 4.0
    mean = jnp.ones(3) * 4.0
    var = jnp.ones(3) * 2.0
    beta = jnp.zeros(3)
    gamma = jnp.ones(3)
    # factor 2: mean -> 2, var -> 1 => y = (4-2)/sqrt(1+1e-3)
    y = frozen_batch_norm(x, mean, var, beta, gamma, factor=2.0)
    np.testing.assert_allclose(np.asarray(y), 2.0 / np.sqrt(1.001), rtol=1e-6)


def test_batch_stats_norm_normalizes():
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(4, 8, 8, 3).astype(np.float32) * 5 + 2)
    y = batch_stats_norm(x, jnp.zeros(3), jnp.ones(3))
    np.testing.assert_allclose(np.asarray(y).mean((0, 1, 2)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y).std((0, 1, 2)), 1.0, atol=1e-3)


def test_conditional_bn_lookup():
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(2, 4, 4, 3).astype(np.float32))
    offsets = jnp.asarray(np.stack([np.zeros(3), np.ones(3)]).astype(np.float32))
    scales = jnp.ones((2, 3))
    y0 = conditional_batch_stats_norm(x, jnp.array([0, 0]), offsets, scales)
    y1 = conditional_batch_stats_norm(x, jnp.array([1, 1]), offsets, scales)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0) + 1.0, atol=1e-5)


def test_spectral_normalize_sigma():
    rng = np.random.RandomState(9)
    w = rng.randn(32, 16).astype(np.float32)
    u = rng.randn(1, 16).astype(np.float32)
    wb, u2 = spectral_normalize(jnp.asarray(w), jnp.asarray(u), num_iters=50)
    top_sv = np.linalg.svd(w, compute_uv=False)[0]
    np.testing.assert_allclose(np.asarray(wb) * top_sv, w, rtol=1e-3, atol=1e-3)
    assert u2.shape == (1, 16)


def test_l2_normalize():
    x = jnp.asarray(np.array([[3.0, 4.0]], np.float32))
    np.testing.assert_allclose(np.asarray(l2_normalize(x)), [[0.6, 0.8]], rtol=1e-6)


def test_spatial_batch():
    sp = generate_spatial_batch(2, 4, 4)
    assert sp.shape == (2, 4, 4, 8)
    np.testing.assert_allclose(sp[0, 0, 0], [-1, -1, -0.5, -0.5, -0.75, -0.75, 0.25, 0.25])


def test_activations():
    x = jnp.asarray(np.array([-1.0, 0.0, 2.0], np.float32))
    np.testing.assert_allclose(np.asarray(lrelu(x)), [-0.2, 0.0, 2.0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(miu_relu(jnp.zeros(1))), [0.15], rtol=1e-5)
    # atanh_transform: h=0 -> 0.5*(log1.001-log1.001)=0; negative clipped by relu
    out = atanh_transform(jnp.asarray(np.array([0.0, 0.5, -0.5], np.float32)))
    assert float(out[0]) == 0.0 and float(out[1]) > 0.0 and float(out[2]) == 0.0
