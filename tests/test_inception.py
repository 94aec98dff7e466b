"""Inception-v4 perceptual module: endpoint shapes and the optional FG loss."""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sketchyscenecolorization_tpu.config import FGGanConfig
from sketchyscenecolorization_tpu.models import inception_v4 as inc


def test_endpoint_shapes_match_inception_v4():
    p = inc.init_params(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 299, 299, 3), jnp.float32)
    eps = jax.jit(inc.extract_endpoints)(p, x)
    assert [e.shape for e in eps] == [(1, 147, 147, 32), (1, 71, 71, 192),
                                      (1, 35, 35, 384)]


def test_perceptual_loss_zero_for_identical():
    p = inc.init_params(jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3),
                             minval=-1, maxval=1)
    assert float(inc.perceptual_loss(p, img, img)) == 0.0
    assert float(inc.perceptual_loss(p, img, -img)) > 0.0


@pytest.mark.skipif(os.environ.get("RUN_SLOW") != "1",
                    reason="inception backward takes ~8 min on CPU; set RUN_SLOW=1")
def test_fg_train_step_with_perceptual():
    from sketchyscenecolorization_tpu.train import (
        create_fg_gan_state, make_fg_gan_train_step)
    cfg = FGGanConfig(batch_size=1, image_size=64, vocab_size=10, max_len=4,
                      base_channels=4, noise_dim=8, max_iters=100,
                      coeff_perceptual=1.0)
    perc = inc.init_params(jax.random.PRNGKey(5))
    state = create_fg_gan_state(jax.random.PRNGKey(0), cfg)
    step = make_fg_gan_train_step(cfg, donate=False, perceptual_params=perc)
    rng = np.random.RandomState(0)
    s = cfg.image_size

    def batch(seed):
        r = np.random.RandomState(seed)
        return {
            "images": jnp.asarray(r.uniform(-1, 1, (1, s, s, 3)), jnp.float32),
            "sketches": jnp.asarray(r.uniform(-1, 1, (1, s, s, 3)), jnp.float32),
            "images_d": jnp.asarray(r.uniform(-1, 1, (1, s, s, 3)), jnp.float32),
            "class_id": jnp.zeros((1,), jnp.int32),
            "class_id_d": jnp.zeros((1,), jnp.int32),
            "tokens": jnp.ones((1, 4), jnp.int32),
        }
    _, metrics = step(state, batch(0), batch(1), jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss_g"]))


# ------------------------- full network (inception_v4.py:147-318 parity) ---

def test_full_base_channel_walk():
    """Full base at a reduced 171 input: channel widths at every named
    endpoint must match the reference architecture (spatial dims scale with
    input; channels do not)."""
    p = inc.init_params(jax.random.PRNGKey(0), num_classes=7,
                        create_aux_logits=False)
    x = jnp.zeros((1, 171, 171, 3), jnp.float32)
    logits, eps = jax.jit(
        lambda p, x: inc.inception_v4(p, x))(p, x)
    want_ch = {"Conv2d_1a_3x3": 32, "Conv2d_2a_3x3": 32, "Conv2d_2b_3x3": 64,
               "Mixed_3a": 160, "Mixed_4a": 192, "Mixed_5a": 384,
               "Mixed_5b": 384, "Mixed_5e": 384, "Mixed_6a": 1024,
               "Mixed_6h": 1024, "Mixed_7a": 1536, "Mixed_7d": 1536}
    for name, ch in want_ch.items():
        assert eps[name].shape[-1] == ch, name
    # reductions halve spatial extent (VALID stride 2): 83 -> 41 -> 39 -> 19
    # -> 9 -> 4 along the Mixed_3a/4a/5a/6a/7a chain
    assert [eps[n].shape[1] for n in
            ("Mixed_3a", "Mixed_4a", "Mixed_5a", "Mixed_6a", "Mixed_7a")] \
        == [41, 39, 19, 9, 4]
    assert logits.shape == (1, 7)
    assert eps["PreLogitsFlatten"].shape == (1, 1536)
    np.testing.assert_allclose(np.asarray(eps["Predictions"]).sum(), 1.0,
                               rtol=1e-5)


@pytest.mark.skipif(os.environ.get("RUN_SLOW") != "1",
                    reason="full 299^2 inception compile; set RUN_SLOW=1")
def test_full_network_at_canonical_299():
    """The canonical 299 walk: every endpoint shape of the slim reference
    (inception_v4.py:177-253 comments), plus AuxLogits off Mixed_6h."""
    p = inc.init_params(jax.random.PRNGKey(0), num_classes=1001)
    x = jnp.zeros((1, 299, 299, 3), jnp.float32)
    logits, eps = jax.jit(lambda p, x: inc.inception_v4(p, x))(p, x)
    want = {"Conv2d_1a_3x3": (1, 149, 149, 32),
            "Conv2d_2a_3x3": (1, 147, 147, 32),
            "Conv2d_2b_3x3": (1, 147, 147, 64),
            "Mixed_3a": (1, 73, 73, 160), "Mixed_4a": (1, 71, 71, 192),
            "Mixed_5a": (1, 35, 35, 384), "Mixed_5e": (1, 35, 35, 384),
            "Mixed_6a": (1, 17, 17, 1024), "Mixed_6h": (1, 17, 17, 1024),
            "Mixed_7a": (1, 8, 8, 1536), "Mixed_7d": (1, 8, 8, 1536)}
    for name, shape in want.items():
        assert eps[name].shape == shape, name
    assert eps["AuxLogits"].shape == (1, 1001)
    assert logits.shape == (1, 1001)
    # dropout active at train time, identity at eval
    l2, _ = inc.inception_v4(p, x, is_training=True,
                             dropout_rng=jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(l2)).all()


def test_param_count_matches_imagenet_inception_v4():
    """Analytical parameter-count walk of the slim architecture for the
    1001-class ImageNet model: 42,712,937 without AuxLogits (the paper's
    ~42.7M) and 46,074,066 with it; catches any wrong channel width in the
    conv tables."""
    p = inc.init_params(jax.random.PRNGKey(0), num_classes=1001,
                        create_aux_logits=False)
    n = sum(x.size for x in jax.tree.leaves(p))
    assert n == 42_712_937, n
    p = inc.init_params(jax.random.PRNGKey(0), num_classes=1001)
    n = sum(x.size for x in jax.tree.leaves(p))
    assert n == 46_074_066, n


def test_converter_roundtrip_is_pure_rename():
    """A fake slim checkpoint built FROM our tree restores to the identical
    tree through convert_inception_v4 (strict)."""
    from sketchyscenecolorization_tpu.utils import tf1_converter as conv
    p = inc.init_params(jax.random.PRNGKey(3), num_classes=11)
    name_map = conv.inception_v4_name_map(num_classes=11)
    tf_vars = {}
    for tf_name, path in name_map.items():
        node = p
        for k in path:
            node = node[k]
        tf_vars[tf_name] = np.asarray(node)
    got = conv.convert_inception_v4(tf_vars, num_classes=11, strict=True)
    flat_p, tp = jax.tree_util.tree_flatten_with_path(p)
    flat_g, tg = jax.tree_util.tree_flatten_with_path(got)
    assert tp == tg
    for (kp, a), (_, b) in zip(flat_p, flat_g):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), str(kp))


def test_name_map_subgraph_consistency():
    """The Mixed_5b-endpoint map is a strict subset of the full map and
    matches exactly the conv set init_params materializes."""
    from sketchyscenecolorization_tpu.utils import tf1_converter as conv
    sub = conv.inception_v4_name_map(final_endpoint="Mixed_5b")
    full = conv.inception_v4_name_map()
    assert set(sub) < set(full)
    p = inc.init_params(jax.random.PRNGKey(0), final_endpoint="Mixed_5b")
    for tf_name, path in sub.items():
        node = p
        for k in path:
            assert k in node, f"{tf_name} -> {path}"
            node = node[k]
