"""Value-level micro-fixtures for the TF1-checkpoint converter's SEMANTIC
transforms.  Structural tests (name-map coverage, value placement) live in
``test_converter_and_viz.py``; these tests pin the math: each one builds a
tiny hand-computable TF1-layout tensor, converts it, runs the owning layer
forward, and asserts the exact output of an independent NumPy
re-implementation of the TF1 op.  A transposed deconv kernel, permuted LSTM
gate block, missing BN-factor division or dense-instead-of-depthwise kernel
each fail its test (every test also proves its own sensitivity by checking
that the corrupted layout changes the output).

TF semantics reproduced (reference):
- ``tf.nn.conv2d_transpose`` [kh,kw,out,in] filters, SAME, stride 2
  (``Background_Colorization/bg_colorization_main.py:62-71``);
- ``tf.nn.rnn_cell.LSTMCell(state_is_tuple=False)`` kernel [(in+h),4h],
  gate order (i, j, f, o), forget_bias 1.0, consumed through
  ``tf.nn.dynamic_rnn(sequence_length=...)`` (``RMI_model.py:132-134,
  153-200``);
- frozen BN with moments divided by the stored scalar ``factor``, eps 0.001
  (``Instance_Matching/deeplab_model.py:211-229``);
- slim ``separable_conv2d`` depthwise [kh,kw,in,1] + pointwise [1,1,in,out]
  with atrous rate (``deeplab_v3plus_model.py:585-651``).
"""
import numpy as np
import jax.numpy as jnp

from sketchyscenecolorization_tpu.ops.conv import conv2d, conv2d_transpose
from sketchyscenecolorization_tpu.ops.lstm import masked_lstm_scan
from sketchyscenecolorization_tpu.ops.norm import frozen_batch_norm
from sketchyscenecolorization_tpu.utils.tf1_converter import swap_deconv_filter


# --------------------------------------------------------------- NumPy oracles

def np_tf_conv2d_transpose_same_s2(x, w_tf):
    """``tf.nn.conv2d_transpose(x, w[kh,kw,out,in], [B,2H,2W,out],
    strides=2, 'SAME')``: the gradient of a SAME forward conv -- scatter
    x[b,i,j,cin]*w[di,dj,cout,cin] to out[2i+di-pad, 2j+dj-pad]."""
    b, h, wid, cin = x.shape
    kh, kw, cout, cin2 = w_tf.shape
    assert cin == cin2
    stride = 2
    out = np.zeros((b, h * stride, wid * stride, cout), np.float64)
    pad = (kh - stride) // 2            # forward SAME pad_lo (extra on right)
    for i in range(h):
        for j in range(wid):
            for di in range(kh):
                for dj in range(kw):
                    oi, oj = stride * i + di - pad, stride * j + dj - pad
                    if 0 <= oi < out.shape[1] and 0 <= oj < out.shape[2]:
                        out[:, oi, oj, :] += np.einsum(
                            "bc,oc->bo", x[:, i, j, :], w_tf[di, dj])
    return out


def np_tf_lstm_dynamic_rnn(xs, kernel, bias, seq_len, hidden):
    """``tf.nn.dynamic_rnn(LSTMCell(hidden, state_is_tuple=False), xs,
    sequence_length=seq_len)``: kernel [(D+H),4H] applied to concat([x,h]),
    gates split (i, j, f, o), forget_bias 1.0; beyond seq_len the state is
    frozen and the emitted output is zero."""
    b, t, _ = xs.shape
    c = np.zeros((b, hidden), np.float64)
    h = np.zeros((b, hidden), np.float64)
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))
    ys = np.zeros((b, t, hidden), np.float64)
    for step in range(t):
        m = np.concatenate([xs[:, step], h], axis=-1) @ kernel + bias
        i, j, f, o = np.split(m, 4, axis=-1)
        new_c = sig(f + 1.0) * c + sig(i) * np.tanh(j)
        new_h = sig(o) * np.tanh(new_c)
        valid = (step < seq_len)[:, None]
        c = np.where(valid, new_c, c)
        h = np.where(valid, new_h, h)
        ys[:, step] = np.where(valid, h, 0.0)
    return ys, (c, h)


def np_slim_depthwise_3x3_same(x, w_tf, rate):
    """slim depthwise [3,3,in,1] with atrous ``rate``, SAME: each input
    channel convolves with ITS OWN 3x3 filter (no cross-channel mixing)."""
    b, h, wid, cin = x.shape
    eff = 1 + 2 * rate                  # effective kernel extent
    pad = (eff - 1) // 2
    xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    out = np.zeros_like(x, dtype=np.float64)
    for di in range(3):
        for dj in range(3):
            patch = xp[:, di * rate:di * rate + h, dj * rate:dj * rate + wid]
            out += patch * w_tf[di, dj, :, 0]
    return out


# --------------------------------------------------------------------- tests

def test_deconv_filter_swap_value_parity():
    rng = np.random.RandomState(0)
    cin = cout = 2                      # square: a missing swap passes shapes
    x = rng.randn(1, 3, 3, cin)
    w_tf = rng.randn(4, 4, cout, cin)   # TF layout [kh, kw, out, in]

    expect = np_tf_conv2d_transpose_same_s2(x, w_tf)
    got = np.asarray(conv2d_transpose(
        jnp.asarray(x, jnp.float32),
        jnp.asarray(swap_deconv_filter(w_tf), jnp.float32), stride=2))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)

    # sensitivity: feeding the UNSWAPPED filter must change the output
    wrong = np.asarray(conv2d_transpose(
        jnp.asarray(x, jnp.float32), jnp.asarray(w_tf, jnp.float32),
        stride=2))
    assert np.abs(wrong - expect).max() > 1e-3


def test_lstm_kernel_gate_order_and_forget_bias():
    """The converter copies TF LSTM kernels verbatim
    (``tf1_converter.py:83-96``) because our cell consumes the identical
    [(D+H),4H] (i,j,f,o) layout with forget_bias 1 -- prove it by value."""
    rng = np.random.RandomState(1)
    d, hid, b, t = 3, 4, 2, 5
    kernel = rng.randn(d + hid, 4 * hid) * 0.7     # distinct gate blocks
    bias = rng.randn(4 * hid) * 0.3
    xs = rng.randn(b, t, d)
    seq_len = np.array([3, 5])

    expect_y, (expect_c, expect_h) = np_tf_lstm_dynamic_rnn(
        xs, kernel, bias, seq_len, hid)
    got_y, (got_c, got_h) = masked_lstm_scan(
        jnp.asarray(xs, jnp.float32), jnp.asarray(seq_len),
        jnp.asarray(kernel, jnp.float32), jnp.asarray(bias, jnp.float32),
        hid)
    np.testing.assert_allclose(np.asarray(got_y), expect_y, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_h), expect_h, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_c), expect_c, rtol=1e-5,
                               atol=1e-6)

    # sensitivity: a permuted gate block (i <-> f, the classic conversion
    # bug) must change the output
    perm = np.concatenate([kernel[:, 2 * hid:3 * hid],        # f in i slot
                           kernel[:, hid:2 * hid],
                           kernel[:, :hid],                   # i in f slot
                           kernel[:, 3 * hid:]], axis=1)
    bad_y, _ = masked_lstm_scan(
        jnp.asarray(xs, jnp.float32), jnp.asarray(seq_len),
        jnp.asarray(perm, jnp.float32), jnp.asarray(bias, jnp.float32), hid)
    assert np.abs(np.asarray(bad_y) - expect_y).max() > 1e-3


def test_frozen_bn_factor_division():
    """``deeplab_model.py:211-229``: eval-mode BN divides BOTH stored
    moments by the scalar ``factor`` before normalizing, eps 0.001."""
    rng = np.random.RandomState(2)
    c = 5
    x = rng.randn(1, 2, 2, c)
    mean, var = rng.randn(c), rng.rand(c) + 0.5
    beta, gamma = rng.randn(c), rng.randn(c)
    factor = np.array([2.5])            # != 1 so a missing division fails

    expect = gamma * (x - mean / factor) / np.sqrt(var / factor + 0.001) \
        + beta
    got = np.asarray(frozen_batch_norm(
        jnp.asarray(x, jnp.float32), jnp.asarray(mean, jnp.float32),
        jnp.asarray(var, jnp.float32), jnp.asarray(beta, jnp.float32),
        jnp.asarray(gamma, jnp.float32), jnp.asarray(factor, jnp.float32)))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)

    no_div = gamma * (x - mean) / np.sqrt(var + 0.001) + beta
    assert np.abs(no_div - expect).max() > 1e-3      # the division matters


def test_separable_depthwise_pointwise_split():
    """v3+ separable convs: the depthwise kernel [3,3,in,1] convolves each
    channel with its own filter (feature_group_count), then the pointwise
    [1,1,in,out] mixes channels -- NOT one dense 3x3 conv."""
    from sketchyscenecolorization_tpu.models.backbones import _depthwise_conv
    rng = np.random.RandomState(3)
    cin, cout, rate = 3, 2, 2
    x = rng.randn(1, 6, 6, cin)
    w_dw = rng.randn(3, 3, cin, 1)      # slim depthwise layout (copied as-is)
    w_pw = rng.randn(1, 1, cin, cout)

    expect_dw = np_slim_depthwise_3x3_same(x, w_dw, rate)
    got_dw = np.asarray(_depthwise_conv(
        jnp.asarray(x, jnp.float32), jnp.asarray(w_dw, jnp.float32),
        rate=rate))
    np.testing.assert_allclose(got_dw, expect_dw, rtol=1e-4, atol=1e-5)

    expect = expect_dw @ w_pw[0, 0]     # 1x1 pointwise == matmul over C
    got = np.asarray(conv2d(jnp.asarray(got_dw, jnp.float32),
                            jnp.asarray(w_pw, jnp.float32)))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)

    # sensitivity: per-channel filters are genuinely distinct, so swapping
    # two channels' depthwise filters changes the result
    w_sw = w_dw[:, :, [1, 0, 2], :]
    bad = np.asarray(_depthwise_conv(
        jnp.asarray(x, jnp.float32), jnp.asarray(w_sw, jnp.float32),
        rate=rate))
    assert np.abs(bad - expect_dw).max() > 1e-3
