"""Oracle tests: ops/pil_resize must be byte-identical to PIL BILINEAR
(the deprecated ``scipy.misc.imresize`` the reference compositing calls,
``Pipeline_utils/fg_color_utils.py:158``) -- the device compositor's
correctness rests on this exactness."""
import numpy as np
import pytest
from PIL import Image

from sketchyscenecolorization_tpu.ops.pil_resize import (
    pil_bilinear_coeffs, pil_resize_bilinear_u8, pil_resize_bilinear_u8_np)

# up/down scales, both axes, odd sizes, identity, the real compositing
# shapes (instance_size 192 -> bbox+2*margin)
SIZES = [(192, 192, 300, 280), (192, 192, 64, 80), (192, 160, 192, 192),
         (100, 100, 100, 37), (7, 9, 23, 5), (192, 192, 192, 192),
         (192, 172, 310, 250), (55, 192, 21, 400), (1, 5, 3, 8),
         (768, 768, 384, 384), (33, 47, 47, 33), (192, 148, 116, 89)]


@pytest.mark.parametrize("h,w,oh,ow", SIZES)
def test_np_path_matches_pil(h, w, oh, ow):
    img = np.random.RandomState(h * ow).randint(0, 256, (h, w, 3)) \
        .astype(np.uint8)
    want = np.asarray(Image.fromarray(img).resize((ow, oh), Image.BILINEAR))
    got = pil_resize_bilinear_u8_np(img, oh, ow)
    assert np.array_equal(got, want)


def test_jnp_path_matches_pil():
    import jax
    for h, w, oh, ow in SIZES[:6]:
        img = np.random.RandomState(h + ow).randint(0, 256, (h, w, 3)) \
            .astype(np.uint8)
        want = np.asarray(
            Image.fromarray(img).resize((ow, oh), Image.BILINEAR))
        got = np.asarray(
            jax.jit(lambda x, oh=oh, ow=ow:
                    pil_resize_bilinear_u8(x, oh, ow))(img))
        assert np.array_equal(got, want), (h, w, oh, ow)


def test_coeffs_accumulator_headroom():
    """int32 accumulation safety: max |sum(pixel * kk)| + bias < 2^31 for
    every output pixel at the largest scale the pipeline uses."""
    for in_size, out_size in [(192, 640), (768, 21), (192, 1), (2000, 3)]:
        _, kk = pil_bilinear_coeffs(in_size, out_size)
        worst = np.abs(kk.astype(np.int64)).sum(axis=1).max() * 255 + (1 << 21)
        assert worst < 2 ** 31, (in_size, out_size, worst)
