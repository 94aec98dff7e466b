"""Host-side compositing ops for the interactive pipeline.

These reproduce, bit-for-bit where possible, the reference's NumPy/PIL
compositing path (they stay on the host because they act on uint8 PNG-bound
images between model invocations):

- ``resize_and_padding_mask_image``  (``obj_lib/input_pipeline.py:199-239``)
- ``thicken_drawings``               (``obj_lib/input_pipeline.py:242-256``)
- ``reverse_resize_image``           (``Pipeline_utils/fg_color_utils.py:137-163``)
- ``instance_result_postprocessing`` (``fg_color_utils.py:166-185``)
- ``is_road_not_single_line``        (``fg_color_utils.py:80-134``, vectorized)
- ``paste_instance``                 (``fg_color_utils.py:341-345``)
- ``overlay_drawings``               (``fg_color_utils.py:346-358``, ``bg_utils.py:296-306``)
- ``add_color_gradient``             (``bg_utils.py:96-166``, row loops vectorized)
"""
from __future__ import annotations

import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np
import scipy.ndimage
from PIL import Image

IMAGE_SIZE = 768
ROAD_LABEL = 36
GRASS_LABEL = 27

# 46-category ids -> the FG GAN's 25 training classes
# (``fg_color_utils.py:18-21``)
SKE_ID_TO_CAT_ID = {
    7: 0, 9: 1, 12: 2, 13: 3, 14: 4, 15: 5, 16: 6, 17: 7, 18: 8, 19: 9,
    22: 10, 23: 11, 27: 12, 28: 13, 29: 14, 30: 15, 32: 16, 34: 17, 35: 18,
    36: 19, 37: 20, 39: 21, 41: 22, 43: 23, 44: 24,
}

try:  # Pillow >= 10 removed the ANTIALIAS alias
    ANTIALIAS = Image.ANTIALIAS
except AttributeError:  # pragma: no cover
    ANTIALIAS = Image.LANCZOS


def resize_and_padding_mask_image(image: Image.Image, new_size: int,
                                  resample_method=ANTIALIAS,
                                  margin_size: int = 10) -> np.ndarray:
    """Aspect-preserving resize with a virtual margin, white-padded to
    ``new_size`` square; returns [S, S, 3] uint8."""
    height = image.height + margin_size * 2
    width = image.width + margin_size * 2
    scale = new_size / max(height, width)
    new_h = int(round(image.height * scale))
    new_w = int(round(image.width * scale))
    assert new_h <= new_size and new_w <= new_size
    if scale != 1:
        image = image.resize((new_w, new_h), resample=resample_method)
    img_np = np.array(image, dtype=np.uint8)[:, :, 0]
    top = (new_size - new_h) // 2
    left = (new_size - new_w) // 2
    rst = np.pad(img_np, [(top, new_size - new_h - top),
                          (left, new_size - new_w - left)],
                 mode="constant", constant_values=255)
    return np.repeat(rst[:, :, None], 3, axis=2)


def rgb2hsv(rgb: np.ndarray) -> np.ndarray:
    """float [0,1] RGB -> HSV, matching skimage.color.rgb2hsv."""
    rgb = np.asarray(rgb, dtype=np.float64)
    out = np.zeros_like(rgb)
    v = rgb.max(axis=-1)
    delta = v - rgb.min(axis=-1)
    old = np.seterr(invalid="ignore", divide="ignore")
    s = np.where(v > 0, delta / v, 0.0)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    h = np.where(v == r, (g - b) / delta,
                 np.where(v == g, 2.0 + (b - r) / delta,
                          4.0 + (r - g) / delta))
    np.seterr(**old)
    h = (h / 6.0) % 1.0
    h = np.where(delta == 0, 0.0, h)
    out[..., 0], out[..., 1], out[..., 2] = h, np.nan_to_num(s), v
    return out


def hsv2rgb(hsv: np.ndarray) -> np.ndarray:
    """float HSV -> RGB [0,1], matching skimage.color.hsv2rgb."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = np.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(np.int32) % 6
    out = np.zeros(hsv.shape, dtype=np.float64)
    for idx, (rr, gg, bb) in enumerate(
            [(v, t, p), (q, v, p), (p, v, t), (p, q, v), (t, p, v), (v, p, q)]):
        m = i == idx
        out[..., 0][m], out[..., 1][m], out[..., 2][m] = rr[m], gg[m], bb[m]
    return out


def thicken_drawings(image: np.ndarray) -> np.ndarray:
    """Dilate strokes with a 2x2 square (used for grass instances).
    skimage ``dilation(x, square(2))`` delegates to ``grey_dilation``, whose
    even footprint anchors so the output at i takes the max over
    [i : i+2) -- ``maximum_filter`` needs origin=-1 to match (verified
    empirically against grey_dilation)."""
    img = np.array(image[:, :, 0], dtype=np.uint8)
    inv = 255 - img
    dilated_inv = scipy.ndimage.maximum_filter(
        inv, footprint=np.ones((2, 2), bool), mode="constant", origin=-1)
    dilated = 255 - dilated_inv
    return np.repeat(dilated[:, :, None], 3, axis=2)


def reverse_resize_geometry(ori_size: int, box_h: int, box_w: int,
                            h_w_ratio: float = 1, margin_size: int = 10):
    """(pad, cut_axis, box_h_marg, box_w_marg) of the undo-pad+resize --
    shared by the host path below and the device compositor so both compute
    the identical crop (incl. Python banker's rounding of ``pad``)."""
    box_h_marg = box_h + margin_size * 2
    box_w_marg = box_w + margin_size * 2
    if box_h_marg * h_w_ratio > box_w_marg:
        pad = int(round(ori_size * (box_h_marg * h_w_ratio - box_w_marg)
                        / (box_h_marg * h_w_ratio) / 2.0))
        axis = 1
    else:
        pad = int(round(ori_size * (box_w_marg - box_h_marg * h_w_ratio)
                        / box_w_marg / 2.0))
        axis = 0
    return pad, axis, box_h_marg, box_w_marg


def reverse_resize_image(cartoon_instance: np.ndarray, box_h: int, box_w: int,
                         h_w_ratio: float = 1, margin_size: int = 10) -> np.ndarray:
    """Undo the pad+resize: cut padding, scale back to (box + margins), cut
    the margin.  The deprecated ``scipy.misc.imresize`` is PIL bilinear."""
    ori_size = cartoon_instance.shape[0]
    pad, axis, box_h_marg, box_w_marg = reverse_resize_geometry(
        ori_size, box_h, box_w, h_w_ratio, margin_size)
    if axis == 1:
        cut = cartoon_instance[:, pad: ori_size - pad]
    else:
        cut = cartoon_instance[pad: ori_size - pad, :]
    resized = Image.fromarray(cut.astype(np.uint8)).resize(
        (box_w_marg, box_h_marg), resample=Image.BILINEAR)
    resized = np.array(resized, dtype=np.uint8)
    return resized[margin_size: margin_size + box_h,
                   margin_size: margin_size + box_w]


def instance_result_postprocessing(generated_img: np.ndarray, bbox,
                                   class_id46: int) -> np.ndarray:
    """[-1,1] generator output [1, S, S, 3] -> uint8 crop at bbox size."""
    img = ((generated_img + 1.0) / 2.0) * 255.0
    img = img.astype(np.uint8)[0]
    return instance_result_postprocessing_u8(img, bbox, class_id46)


def instance_result_postprocessing_u8(img_u8: np.ndarray, bbox,
                                      class_id46: int) -> np.ndarray:
    """uint8 generator output [S, S, 3] (the [-1,1]->uint8 conversion having
    run on device, bit-equal to the numpy cast) -> uint8 crop at bbox size."""
    bbox_h = int(bbox[2] - bbox[0])
    bbox_w = int(bbox[3] - bbox[1])
    margin = 0 if class_id46 == ROAD_LABEL else 10
    return reverse_resize_image(img_u8, bbox_h, bbox_w, margin_size=margin)


def _binarize_road(road_sketch: np.ndarray) -> np.ndarray:
    rs = road_sketch.copy()
    rs[(rs >= 235).all(axis=2)] = [255, 255, 255]
    rs[(rs != 255).all(axis=2)] = [0, 0, 0]
    rs = rs[:, :, 0]
    out = np.zeros_like(rs)
    out[rs == 0] = 1
    return out


def is_road_not_single_line(road_sketch: np.ndarray,
                            parallel_width: int = 25) -> bool:
    """True iff >= ``parallel_width`` scanlines cross the road strokes an
    even (nonzero) number of times in either direction.

    The reference's O(H*W) Python loops keep, per scanline, only the last
    pixel of each stroke run then count them; vectorized here as falling-edge
    counting (``v[i]==1 and v[i+1]==0``; the final element is kept as-is,
    matching the loop bounds)."""
    v = _binarize_road(road_sketch).astype(np.int32)

    def count_valid(arr):  # arr: [L, W] -> scanlines along axis 0
        edges = (arr[:-1] == 1) & (arr[1:] == 0)
        cross = edges.sum(axis=0) + arr[-1]
        return int(((cross > 0) & (cross % 2 == 0)).sum())

    if count_valid(v) >= parallel_width:           # vertical scan per column
        return True
    if count_valid(v.T) >= parallel_width:         # horizontal scan per row
        return True
    return False


def paste_instance(result_image: np.ndarray, color_instance: np.ndarray,
                   inner_mask: np.ndarray, inst_idx: int, bbox) -> None:
    """In-place paste via the inner mask (``fg_color_utils.py:341-345``)."""
    y1, x1, y2, x2 = (int(b) for b in bbox)
    box = result_image[y1:y2, x1:x2]
    inner_box = inner_mask[y1:y2, x1:x2]
    box[inner_box == inst_idx + 1] = color_instance[inner_box == inst_idx + 1]
    result_image[y1:y2, x1:x2] = box


def grass_free_inner_mask(inner_mask: np.ndarray,
                          grass_inst_indices: Sequence[int]) -> np.ndarray:
    """1 where a grass instance sits, else 0 (``fg_color_utils.py:347-351``)."""
    no_grass = np.zeros(inner_mask.shape, dtype=np.int32)
    for idx in grass_inst_indices:
        no_grass[inner_mask == idx + 1] = 1
    return no_grass


def shifted_drawings(sketch_image: np.ndarray,
                     inner_mask_no_grass: np.ndarray
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Sketch strokes shifted by (+1, +1) px and the stroke-region mask
    (strokes outside grass regions)."""
    size = sketch_image.shape[0]
    moved = sketch_image.copy()
    moved[1:size, 1:size] = sketch_image[0:size - 1, 0:size - 1]
    drawings_region = np.logical_and(moved[:, :, 0] == 0,
                                     inner_mask_no_grass != 1)
    return moved, drawings_region


def overlay_drawings(result_image: np.ndarray, sketch_image: np.ndarray,
                     inner_mask_no_grass: np.ndarray) -> np.ndarray:
    """Overlay the shifted sketch strokes in place; returns the region mask."""
    moved, drawings_region = shifted_drawings(sketch_image, inner_mask_no_grass)
    result_image[drawings_region] = moved[drawings_region]
    return drawings_region


def extract_foreground(image: np.ndarray, inner_mask: np.ndarray) -> np.ndarray:
    """White canvas holding only FG pixels (``bg_utils.py:219-226``)."""
    fg = np.full(image.shape, 255, dtype=np.uint8)
    fg[inner_mask != 0] = image[inner_mask != 0]
    return fg


_ROUNDTRIP_LUT: Optional[np.ndarray] = None
_LUT_LOCK = threading.Lock()
_LUT_MIN_PIXELS = 200_000      # below this the direct math is cheaper than
                               # building/holding the 50 MB table


def prewarm_roundtrip_lut() -> None:
    """Kick the LUT build on a daemon thread (sessions call this at build
    time when the gradient can run at LUT scale, so the first BG pass
    doesn't pay the ~5 s build)."""
    threading.Thread(target=_rgb_roundtrip_lut, daemon=True).start()


def _rgb_roundtrip_lut() -> np.ndarray:
    """uint8 RGB -> uint8 RGB table of the float64 HSV round-trip
    ``(hsv2rgb(rgb2hsv(x/255)) * 255).astype(uint8)`` for every 24-bit
    color.  The round-trip is NOT the identity (truncation changes ~20% of
    channel values -- PARITY.md), so gradient rows that keep their original
    S/V still need it; the table turns that per-pass float64 math into one
    gather.  Built lazily once per process (~50 MB, a few seconds)."""
    global _ROUNDTRIP_LUT
    if _ROUNDTRIP_LUT is None:
        with _LUT_LOCK:
            if _ROUNDTRIP_LUT is not None:
                return _ROUNDTRIP_LUT
            lut = np.empty((1 << 24, 3), np.uint8)
            chunk = 1 << 20
            base = np.arange(chunk, dtype=np.uint32)
            for start in range(0, 1 << 24, chunk):
                c = start + base
                rgb = np.stack([(c >> 16) & 0xFF, (c >> 8) & 0xFF, c & 0xFF],
                               axis=-1).astype(np.float64) / 255.0
                lut[start:start + chunk] = \
                    (hsv2rgb(rgb2hsv(rgb)) * 255.0).astype(np.uint8)
            _ROUNDTRIP_LUT = lut
    return _ROUNDTRIP_LUT


# shared search-band constants (``bg_utils.py:105``): the device twin
# ``engines.sky_detect_trace`` and the session's band gate derive from
# these so host and device paths cannot silently diverge
SKY_SEARCH_FROM = 5
SKY_SEARCH_HEIGHT = 2


def detect_sky(img_bg: np.ndarray, inner_mask: np.ndarray,
               search_height: int = SKY_SEARCH_HEIGHT,
               search_from: int = SKY_SEARCH_FROM):
    """(sky_color, sky_bottom) of the gradient (``bg_utils.py:105-128``):
    dominant color in the search band over non-FG pixels (ties break by
    first occurrence in row-major order -- the reference's dict-insertion
    scan), then the lowest row <= H/2 containing it (-1 if none; callers
    assert).  Raises the reference's ``ValueError`` (argmax of empty) when
    the band is fully FG.  Device twin: ``engines.sky_detect_trace``."""
    img_h = img_bg.shape[0]
    band = img_bg[search_from: search_from + search_height]
    band_mask = inner_mask[search_from: search_from + search_height] == 0
    flat = band.reshape(-1, 3)
    flat_mask = band_mask.reshape(-1)
    seen: List[Tuple[int, int, int]] = []
    count_map = {}
    for rgb, ok in zip(map(tuple, flat.tolist()), flat_mask.tolist()):
        if not ok:
            continue
        if rgb not in count_map:
            seen.append(rgb)
            count_map[rgb] = 0
        count_map[rgb] += 1
    sky_color = list(seen[int(np.argmax([count_map[c] for c in seen]))])

    sky_bottom = -1
    target = np.array(sky_color, dtype=np.uint8)
    for i in range(int(img_h / 2), -1, -1):
        if (img_bg[i] == target).all(axis=1).any():
            sky_bottom = i
            break
    return sky_color, sky_bottom


def sky_ramp_rows(img_bg_top: np.ndarray, sky_color, sky_bottom: int
                  ) -> np.ndarray:
    """The gradient's ramp block: rows [0, start_height] of
    ``add_color_gradient``'s output, exactly (float64 HSV, S ramped to S/3,
    V to min(1, 1.5V), ``bg_utils.py:137-158``).  ``img_bg_top`` is the
    FG-whitened image's top rows (>= start_height+1 of them) -- shared by
    the host gradient below and the device-gradient serving path
    (``session.colorize_background``), which fetches only these rows and
    computes the identical bytes on host."""
    start_height = int(sky_bottom / 4 * 3)
    sky_hsv = rgb2hsv(
        (np.array(sky_color, np.float32) / 255.0)[None, None, :])[0][0]
    end_s = sky_hsv[1] / 3.0
    end_v = min(1.0, sky_hsv[2] * 1.5)
    hsv = rgb2hsv(img_bg_top[:start_height + 1] / 255.0)
    if start_height > 0:
        rows = np.arange(start_height, -1, -1)
        frac = (start_height - rows) / start_height
        hsv[rows, :, 1] = (frac * end_s + (1 - frac) * sky_hsv[1])[:, None]
        hsv[rows, :, 2] = (frac * end_v + (1 - frac) * sky_hsv[2])[:, None]
    else:
        hsv[0, :, 1] = sky_hsv[1]
        hsv[0, :, 2] = sky_hsv[2]
    return (hsv2rgb(hsv) * 255.0).astype(np.uint8)


def add_color_gradient(color_image: np.ndarray, inner_mask: np.ndarray,
                       search_height: int = 2, search_from: int = 5) -> np.ndarray:
    """HSV sky gradient (``bg_utils.py:96-166``): find the dominant sky color
    near the top, locate the sky bottom, then ramp S down to S/3 and V up to
    min(1, 1.5V) from 3/4 of the sky height to the top.  The reference's
    per-row Python loops are vectorized, and the float64 HSV math runs only
    on the rows the ramp modifies -- all rows below ``start_height`` are the
    bare round-trip, served from ``_rgb_roundtrip_lut`` at full size
    (byte-equal by construction; asserted in ``tests/test_pipeline.py``)."""
    img_h, img_w = color_image.shape[:2]
    img_bg = np.full(color_image.shape, 255, dtype=np.uint8)
    img_bg[inner_mask == 0] = color_image[inner_mask == 0]

    sky_color, sky_bottom = detect_sky(img_bg, inner_mask,
                                       search_height, search_from)
    assert sky_bottom != -1

    # 3. HSV ramp -- real HSV math on rows [0, start_height] (their S/V are
    # replaced), the identity round-trip for everything below
    start_height = int(sky_bottom / 4 * 3)
    img_grad = np.empty_like(img_bg)
    img_grad[:start_height + 1] = sky_ramp_rows(img_bg, sky_color, sky_bottom)
    rest = img_bg[start_height + 1:]
    if rest.size // 3 >= _LUT_MIN_PIXELS:
        codes = ((rest[..., 0].astype(np.int32) << 16)
                 | (rest[..., 1].astype(np.int32) << 8)
                 | rest[..., 2].astype(np.int32))
        img_grad[start_height + 1:] = _rgb_roundtrip_lut()[codes]
    else:
        img_grad[start_height + 1:] = \
            (hsv2rgb(rgb2hsv(rest / 255.0)) * 255.0).astype(np.uint8)
    img_grad[inner_mask != 0] = color_image[inner_mask != 0]
    return img_grad
