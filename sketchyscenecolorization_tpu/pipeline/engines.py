"""Jitted model engines for the interactive pipeline.

The reference builds a *fresh TF graph + session per stage per command*
(``Pipeline_utils/fg_matching_utils.py:29-38``, ``fg_color_utils.py:267-280``,
``bg_utils.py:268-277``) -- graph construction and checkpoint restore dominate
its latency.  The TPU-native design constructs each jitted function once and
reuses the compiled executable across instructions; parameters live on device
for the lifetime of the session.

Each engine is deterministic given its PRNG seed (the reference's FG GAN
draws ``tf.random_normal`` inline per run, ``models_collection.py:310``).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BGGanConfig, FGGanConfig, MatchingConfig
from ..models import rmi
from ..text import matching_encode, colorization_encode

# BGR pixel means, matching-model preprocessing (``fg_matching_utils.py:11``)
PIXEL_MU = np.array((104.00698793, 116.66876762, 122.67891434))


class MatchingEngine:
    """RMI referring-segmentation at 768x768 (``fg_matching_utils.py:14-77``)."""

    def __init__(self, cfg: MatchingConfig, params: Dict[str, Any],
                 vocab: Dict[str, int], score_thresh: float = 1e-9):
        self.cfg = cfg
        self.params = params
        self.vocab = vocab
        self.score_thresh = score_thresh

        @jax.jit
        def forward(params, image, words, seq_len):
            return rmi.apply(params, cfg, image, words, seq_len).up
        self._forward = forward

        # batched serving: run the instruction-independent backbone ONCE per
        # sketch, then fuse N instructions against the broadcast features
        @jax.jit
        def extract(params, image):
            return rmi.extract_visual(params, cfg, image)

        @jax.jit
        def fuse(params, visual_norm, words, seq_len):
            return rmi.apply_fused(params, cfg, visual_norm, words, seq_len).up
        self._extract = extract
        self._fuse = fuse

    def predict_mask(self, sketch_image_uint8: np.ndarray,
                     input_text: str) -> np.ndarray:
        """uint8 [768,768,3] sketch + instruction -> binary {0,1} mask
        restricted to drawing pixels."""
        return self.predict_masks(sketch_image_uint8, [input_text])[0]

    def predict_masks(self, sketch_image_uint8: np.ndarray,
                      input_texts: Sequence[str]) -> np.ndarray:
        """Batched serving: N instructions against one sketch in a single
        forward (the backbone runs once per batch row but every layer is
        batch-independent -- frozen BN, per-pixel mLSTM -- so results are
        bitwise identical to N single-instruction calls).  Returns
        [N, H, W] binary masks."""
        image = sketch_image_uint8.astype(np.float32) - PIXEL_MU
        bin_drawing = sketch_image_uint8[:, :, 0].copy()
        bin_drawing[bin_drawing == 0] = 1
        bin_drawing[bin_drawing == 255] = 0

        n = len(input_texts)
        words = np.zeros((n, self.cfg.max_len), np.int32)
        lens = np.zeros((n,), np.int32)
        for i, text in enumerate(input_texts):
            idx, ln = matching_encode(text, self.vocab, self.cfg.max_len)
            words[i] = idx
            lens[i] = ln
        visual = self._extract(self.params, jnp.asarray(image[None]))
        up = np.asarray(self._fuse(self.params, visual,
                                   jnp.asarray(words), jnp.asarray(lens)))
        predicts = (up[..., 0] >= self.score_thresh).astype(np.float32)
        return predicts * bin_drawing[None]


class FGColorizeEngine:
    """FG MRU-GAN generator at 192x192 (``fg_color_utils.py:253-265``)."""

    def __init__(self, cfg: FGGanConfig, g_params: Dict[str, Any],
                 vocab: Dict[str, int], seed: int = 0):
        self.cfg = cfg
        self.g_params = g_params
        self.vocab = vocab
        self._rng = jax.random.PRNGKey(seed)
        from ..train.fg_gan import build_models
        gen, _ = build_models(cfg)          # MRU / Pix2Pix / Residual

        @jax.jit
        def forward(g_params, sketch, tokens, labels, noise):
            return gen.apply({"params": g_params}, sketch, tokens, labels, noise)
        self._forward = forward

    def colorize(self, instance_sketch: np.ndarray, class_id25: int,
                 text: str) -> np.ndarray:
        """[-1,1] float32 [192,192,3] sketch -> [-1,1] [1,192,192,3]."""
        tokens = colorization_encode(text, self.vocab, self.cfg.max_len)
        self._rng, k = jax.random.split(self._rng)
        noise = jax.random.normal(k, (1, self.cfg.noise_dim), jnp.float32)
        out = self._forward(self.g_params,
                            jnp.asarray(instance_sketch[None]),
                            jnp.asarray(np.asarray(tokens, np.int32)[None]),
                            jnp.asarray(np.asarray([class_id25], np.int32)),
                            noise)
        return np.asarray(out)


class BGColorizeEngine:
    """BG residual generator at 768x768 (``bg_utils.py:232-288``)."""

    def __init__(self, cfg: BGGanConfig, g_params: Dict[str, Any],
                 vocab: Dict[str, int]):
        self.cfg = cfg
        self.g_params = g_params
        self.vocab = vocab
        from ..train.bg_gan import build_models
        gen, _ = build_models(cfg)          # residual (w/ region) or pix2pix

        @jax.jit
        def forward(g_params, image_uint8, tokens):
            # preprocess_examples: uint8 -> [-1, 1] (bg main :101-114)
            x = image_uint8.astype(jnp.float32) / 255.0 * 2.0 - 1.0
            result = gen.apply({"params": g_params}, x, tokens)
            if cfg.residual_enc_g:
                out, region = result
                labels = jnp.argmax(region, axis=-1)
            else:                            # pix2pix: no region branch
                out = result
                labels = jnp.zeros(out.shape[:3], jnp.int32)
            # deprocess + uint8 (bg main :29-38): TF convert_image_dtype
            # multiplies by dtype.max + 0.5 then saturate-casts (truncation)
            out = jnp.clip((out + 1.0) / 2.0 * 255.5, 0, 255).astype(jnp.uint8)
            return out, labels
        self._forward = forward

    def colorize(self, fg_image_uint8: np.ndarray,
                 text: str) -> Tuple[np.ndarray, np.ndarray]:
        """uint8 [768,768,3] FG composite -> (uint8 background, region labels)."""
        tokens = colorization_encode(text, self.vocab, self.cfg.max_len)
        out, region = self._forward(self.g_params,
                                    jnp.asarray(fg_image_uint8[None]),
                                    jnp.asarray(np.asarray(tokens, np.int32)[None]))
        return np.array(out)[0], np.array(region)[0]
