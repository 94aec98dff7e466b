"""FG MRU-GAN tests: generator/discriminator forward shapes, determinism,
text-fusion pad-skip semantics, spectral-norm state updates."""
import numpy as np
import jax
import jax.numpy as jnp

from sketchyscenecolorization_tpu.models.fg_gan import MRUGenerator, MRUDiscriminator
from sketchyscenecolorization_tpu.models.gan_layers import TextFusionLSTM


def _gen(size=8, img=32, vocab=12, ncls=5):
    model = MRUGenerator(num_classes=ncls, vocab_size=vocab, size=size)
    b, t = 2, 6
    rng = np.random.RandomState(0)
    sketch = jnp.asarray(rng.uniform(-1, 1, (b, img, img, 3)).astype(np.float32))
    tokens = jnp.asarray(np.array([[0, 0, 3, 4, 5, 2], [0, 0, 0, 0, 7, 1]], np.int32))
    labels = jnp.asarray(np.array([1, 3], np.int32))
    noise = jnp.asarray(rng.randn(b, 256).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), sketch, tokens, labels, noise)
    return model, variables, (sketch, tokens, labels, noise)


def test_generator_forward():
    model, variables, args = _gen()
    out = model.apply(variables, *args)
    assert out.shape == (2, 32, 32, 3)
    o = np.asarray(out)
    assert np.isfinite(o).all() and (o >= -1).all() and (o <= 1).all()


def test_generator_deterministic_given_noise():
    model, variables, args = _gen()
    fwd = jax.jit(model.apply)
    o1 = np.asarray(fwd(variables, *args))
    o2 = np.asarray(fwd(variables, *args))
    np.testing.assert_array_equal(o1, o2)


def test_generator_label_conditioning_changes_output():
    model, variables, (sketch, tokens, labels, noise) = _gen()
    # class offset/scale tables are identical across classes at init; perturb
    # them so conditioning is observable
    variables = jax.tree_util.tree_map_with_path(
        lambda path, x: x + 0.1 * np.arange(x.shape[0]).reshape(-1, *([1] * (x.ndim - 1)))
        if any(getattr(p, "key", None) == "offset" for p in path) else x,
        variables)
    fwd = jax.jit(model.apply)
    o1 = np.asarray(fwd(variables, sketch, tokens, labels, noise))
    o2 = np.asarray(fwd(variables, sketch, tokens, labels[::-1], noise))
    assert np.abs(o1 - o2).max() > 1e-6


def test_discriminator_forward_and_sn_update():
    model = MRUDiscriminator(num_classes=5, size=8)
    rng = np.random.RandomState(1)
    target = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), target)
    disc, logits = model.apply(variables, target)
    assert disc.shape == (2, 2, 2, 1)       # 32px -> 3 stride-2 stages after s1 stem... 32/16
    assert logits.shape == (2, 5)
    # sn collection exists and updates when mutable
    assert "sn" in variables
    (disc2, logits2), new_state = model.apply(variables, target, mutable=["sn"])
    leaves_old = jax.tree_util.tree_leaves(variables["sn"])
    leaves_new = jax.tree_util.tree_leaves(new_state["sn"])
    assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-8
               for a, b in zip(leaves_old, leaves_new))


def test_text_fusion_pad_skip():
    """All-pad tokens must leave the fusion output at exactly zero, and
    front-padding must be equivalent to starting the recurrence later."""
    model = TextFusionLSTM(vocab_size=9)
    rng = np.random.RandomState(2)
    visual = jnp.asarray(rng.randn(1, 3, 3, 16).astype(np.float32))
    toks_pad = jnp.zeros((1, 5), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), visual, toks_pad)
    out = model.apply(variables, visual, toks_pad)
    np.testing.assert_array_equal(np.asarray(out), 0.0)

    toks_a = jnp.asarray(np.array([[0, 0, 3, 4, 5]], np.int32))
    toks_b = jnp.asarray(np.array([[0, 0, 0, 0, 0], [0, 0, 3, 4, 5]], np.int32))[1:]
    o_a = model.apply(variables, visual, toks_a)
    o_b = model.apply(variables, visual, toks_b)
    np.testing.assert_allclose(np.asarray(o_a), np.asarray(o_b), rtol=1e-6)
