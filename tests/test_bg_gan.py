"""BG GAN tests on reduced geometry (the blocks are resolution-agnostic)."""
import numpy as np
import jax
import jax.numpy as jnp

from sketchyscenecolorization_tpu.models.bg_gan import (
    ResidualGenerator, Pix2PixGenerator, PatchDiscriminator, ResidualDiscriminator,
)


def test_residual_generator_forward():
    model = ResidualGenerator(ngf=8, vocab_size=10, multi_residual=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    tokens = jnp.asarray(np.array([[0, 0, 3, 4, 5, 2, 1, 7]], np.int32))
    variables = model.init(jax.random.PRNGKey(0), x, tokens)
    out, reg = jax.jit(model.apply)(variables, x, tokens)
    assert out.shape == (1, 64, 64, 3)
    assert reg.shape == (1, 64, 64, 3)
    o = np.asarray(out)
    assert np.isfinite(o).all() and (o >= -1).all() and (o <= 1).all()
    assert (np.asarray(reg) >= 0).all()  # region branch output passes a relu


def test_pix2pix_generator_forward():
    model = Pix2PixGenerator(ngf=8, vocab_size=10)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    tokens = jnp.asarray(np.array([[0, 0, 0, 3, 4, 5, 2, 1]], np.int32))
    variables = model.init(jax.random.PRNGKey(0), x, tokens)
    out = jax.jit(model.apply)(variables, x, tokens)
    assert out.shape == (1, 64, 64, 3)


def test_patch_discriminator_output_map():
    model = PatchDiscriminator(ndf=8)
    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), a, b)
    out = model.apply(variables, a, b)
    # 64 -> 32 -> 16 -> 8 -> (stride1: 7) -> (stride1: 6); sigmoid in (0,1)
    assert out.shape == (1, 6, 6, 1)
    o = np.asarray(out)
    assert (o > 0).all() and (o < 1).all()


def test_residual_discriminator_output_map():
    model = ResidualDiscriminator(ndf=8)
    rng = np.random.RandomState(3)
    a = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), a, b)
    out = model.apply(variables, a, b)
    assert out.shape == (1, 2, 2, 1024)  # 64/32, sigmoid feature map
