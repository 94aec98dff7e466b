"""TF1-converter mapping round-trip and visualization smoke tests."""
import zlib

import jax
import numpy as np

from sketchyscenecolorization_tpu.config import MatchingConfig
from sketchyscenecolorization_tpu.models import rmi
from sketchyscenecolorization_tpu.utils.tf1_converter import (
    convert_matching, matching_name_map, merge_converted, swap_deconv_filter,
)
from sketchyscenecolorization_tpu.utils.visualization import (
    generate_colors, visualize_sem_inst_mask, visualize_sem_seg,
)

SMALL = MatchingConfig(vf_h=6, vf_w=6, H=48, W=48, vocab_size=12,
                       w_emb_dim=16, v_emb_dim=16, m_rnn_size=8,
                       w_rnn_size=16, max_len=5)


def _fake_init(fn, *args):
    """Materialize a parameter tree WITHOUT compiling or executing the
    model: ``jax.eval_shape`` yields the exact structure/shapes/dtypes and
    each leaf is filled with deterministic per-path values (distinct across
    leaves, so a swapped mapping cannot round-trip).  The converter tests
    only check name coverage + value placement, which is structure-level --
    real inits cost 15-130 s of XLA work each on the 1-CPU test box."""
    sds = jax.eval_shape(fn, *args)

    def fill(path, sd):
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        seed = zlib.crc32(key.encode())
        n = int(np.prod(sd.shape)) if sd.shape else 1
        # cheap deterministic per-path values (RNG is too slow for the
        # 100M-element FCN fc6 leaf); phase + offset keep leaves distinct
        vals = (np.arange(n, dtype=np.float32) + seed % 65521) % 997.0 \
            + (seed % 8191) * 1e-4
        return vals.astype(sd.dtype).reshape(sd.shape)

    return jax.tree_util.tree_map_with_path(fill, sds)


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def test_matching_map_covers_tree_and_roundtrips():
    params = _fake_init(lambda k: rmi.init_params(k, SMALL), jax.random.PRNGKey(0))
    flat = _flatten(params)
    name_map = matching_name_map(SMALL)
    mapped_paths = set(name_map.values())
    # every leaf of the real tree is covered by the mapping, and vice versa
    assert mapped_paths == set(flat.keys())

    # fabricate a "TF checkpoint" by reversing the map, convert, compare
    tf_vars = {tf_name: flat[path] for tf_name, path in name_map.items()}
    converted = convert_matching(tf_vars, SMALL, strict=True)
    for path, leaf in _flatten(converted).items():
        np.testing.assert_array_equal(leaf, flat[path])


def test_partial_convert_and_merge():
    params = _fake_init(lambda k: rmi.init_params(k, SMALL), jax.random.PRNGKey(0))
    flat = _flatten(params)
    name_map = matching_name_map(SMALL)
    # backbone-only checkpoint (the reference's pretrained-restore case)
    tf_vars = {tf_name: flat[path] for tf_name, path in name_map.items()
               if path[0] == "ResNet"}
    converted = convert_matching(tf_vars, SMALL, strict=False)
    assert "text_sketchyscene" not in converted
    merged = merge_converted(params, converted)
    assert set(merged.keys()) == {"ResNet", "text_sketchyscene"}


def test_swap_deconv_filter():
    w = np.zeros((4, 4, 7, 3))
    assert swap_deconv_filter(w).shape == (4, 4, 3, 7)


def test_visualization_outputs(tmp_path):
    img = np.full((32, 32, 3), 255, np.uint8)
    mask = np.zeros((32, 32), np.int32)
    mask[4:10, 4:10] = 1
    out = visualize_sem_seg(img, mask, "the bus", str(tmp_path / "o.png"))
    assert out.shape == (32, 32, 3)
    assert (tmp_path / "o.png").exists()

    boxes = np.array([[4, 4, 10, 10]])
    inst = mask[:, :, None]
    comp = visualize_sem_inst_mask(img, mask, boxes, inst,
                                   np.array([1]), ["bg", "bus"], "the bus",
                                   save_path=str(tmp_path / "c.png"))
    assert comp.shape == (32, 64, 3)
    assert len(generate_colors(5)) == 5


def test_bg_generator_map_covers_flax_tree():
    """The BG name map's target paths are exactly the ResidualGenerator's
    parameter leaves, and a fabricated TF checkpoint round-trips (with
    deconv filters axis-swapped)."""
    import jax.numpy as jnp
    from sketchyscenecolorization_tpu.models.bg_gan import ResidualGenerator
    from sketchyscenecolorization_tpu.utils.tf1_converter import (
        bg_generator_name_map, convert_bg_generator)

    gen = ResidualGenerator(ngf=4, vocab_size=8, multi_residual=True)
    params = _fake_init(gen.init, jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3), jnp.float32),
                        jnp.ones((1, 4), jnp.int32))["params"]
    flat = _flatten(params)
    name_map = bg_generator_name_map(multi_residual=True)
    assert set(name_map.values()) == set(flat.keys())

    tf_vars = {}
    for tf_name, path in name_map.items():
        v = flat[path]
        if "/deconv/filter" in tf_name:
            v = np.swapaxes(v, 2, 3)      # back to TF layout
        tf_vars[tf_name] = v
    converted = convert_bg_generator(tf_vars, strict=True)
    for path, leaf in _flatten(converted).items():
        np.testing.assert_array_equal(leaf, flat[path])


def test_fg_generator_map_covers_flax_tree():
    import jax
    import jax.numpy as jnp
    from sketchyscenecolorization_tpu.models.fg_gan import MRUGenerator
    from sketchyscenecolorization_tpu.utils.tf1_converter import (
        convert_fg_generator, fg_generator_name_map)

    gen = MRUGenerator(num_classes=5, vocab_size=8, size=4, num_blocks=1)
    params = _fake_init(gen.init, jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3), jnp.float32),
                        jnp.ones((1, 4), jnp.int32),
                        jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1, 8), jnp.float32))["params"]
    flat = _flatten(params)
    name_map = fg_generator_name_map(params)
    assert set(name_map.values()) == set(flat.keys()), (
        sorted(set(map("/".join, name_map.values()))
               ^ set(map("/".join, flat.keys())))[:10])

    tf_vars = {tf_name: flat[path] for tf_name, path in name_map.items()}
    converted = convert_fg_generator(tf_vars, params, strict=True)
    for path, leaf in _flatten(converted).items():
        np.testing.assert_array_equal(leaf, flat[path])


def test_fg_discriminator_map_covers_flax_tree():
    import jax
    import jax.numpy as jnp
    from sketchyscenecolorization_tpu.models.fg_gan import MRUDiscriminator
    from sketchyscenecolorization_tpu.utils.tf1_converter import (
        convert_fg_discriminator, fg_discriminator_name_map)

    disc = MRUDiscriminator(num_classes=5, size=4, num_blocks=1, sn=True)
    variables = _fake_init(disc.init, jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32),
                           jnp.zeros((1, 64, 64, 3), jnp.float32),
                           jnp.zeros((1,), jnp.int32))
    flat = {("params",) + p: v for p, v in _flatten(variables["params"]).items()}
    flat.update({("sn",) + p: v for p, v in _flatten(variables["sn"]).items()})
    name_map = fg_discriminator_name_map(variables["params"])
    assert set(name_map.values()) == set(flat.keys()), (
        sorted(set(map("/".join, name_map.values()))
               ^ set(map("/".join, flat.keys())))[:12])

    tf_vars = {tf_name: flat[path] for tf_name, path in name_map.items()}
    converted = convert_fg_discriminator(tf_vars, variables["params"],
                                         strict=True)
    for col in ("params", "sn"):
        for p, leaf in _flatten(converted[col]).items():
            np.testing.assert_array_equal(leaf, flat[(col,) + p])


def test_matching_map_covers_alt_fusion_trees():
    """use_attn and RecurAttn variants map all their extra variables
    (attn_fc, Recurrent_Attn h_proj / MultiRNN mLSTM)."""
    for kwargs in ({"use_attn": True}, {"fusion_type": "RecurAttn"}):
        cfg = MatchingConfig(vf_h=6, vf_w=6, H=48, W=48, vocab_size=12,
                             w_emb_dim=16, v_emb_dim=16, m_rnn_size=8,
                             w_rnn_size=16, max_len=5, **kwargs)
        params = _fake_init(lambda k: rmi.init_params(k, cfg),
                            jax.random.PRNGKey(0))
        flat = _flatten(params)
        name_map = matching_name_map(cfg)
        assert set(name_map.values()) == set(flat.keys()), kwargs
        tf_vars = {n: flat[p] for n, p in name_map.items()}
        converted = convert_matching(tf_vars, cfg, strict=True)
        for path, leaf in _flatten(converted).items():
            np.testing.assert_array_equal(leaf, flat[path])


# -------------------------------------------- alternate matching backbones

def test_fcn8s_map_covers_tree_and_roundtrips():
    from sketchyscenecolorization_tpu.models.backbones import fcn8s
    from sketchyscenecolorization_tpu.utils.tf1_converter import (
        convert_fcn8s, fcn8s_name_map, swap_deconv_filter)
    params = _fake_init(lambda k: fcn8s.init_params(k, num_classes=5),
                        jax.random.PRNGKey(0))
    flat = _flatten(params)
    name_map = fcn8s_name_map()
    assert set(name_map.values()) == set(flat.keys())
    # fabricate a TF checkpoint: deconv filters go back to [kh, kw, out, in]
    tf_vars = {}
    for tf_name, path in name_map.items():
        v = flat[path]
        if "/deconv" in tf_name and path[-1] == "DW":
            v = swap_deconv_filter(v)
        tf_vars[tf_name] = v
    converted = convert_fcn8s(tf_vars, strict=True)
    for path, leaf in _flatten(converted).items():
        np.testing.assert_array_equal(leaf, flat[path])


def test_vgg19_mat_loader_and_overlay(tmp_path):
    """Synthetic imagenet-vgg-verydeep-19.mat with the exact matconvnet cell
    nesting; the loader must transpose [w,h,in,out] -> [h,w,in,out] and the
    overlay must land on the FCN_8s conv stack."""
    import scipy.io
    from sketchyscenecolorization_tpu.models.backbones import VGG_LAYERS, fcn8s
    from sketchyscenecolorization_tpu.utils.tf1_converter import (
        load_vgg19_mat, merge_converted, vgg19_to_fcn8s)

    layer_names = []
    for spec in VGG_LAYERS:
        name = spec[0]
        if name.startswith("conv"):
            layer_names += [name, "relu" + name[4:]]
        else:
            layer_names.append(name)
    conv_shapes = {spec[0]: (spec[1], spec[2])
                   for spec in VGG_LAYERS if spec[0].startswith("conv")}

    rng = np.random.RandomState(0)
    cells = np.empty((1, len(layer_names)), object)
    expected = {}
    for i, name in enumerate(layer_names):
        if name.startswith("conv"):
            cin, cout = conv_shapes[name]
            k = rng.randn(3, 3, cin, cout).astype(np.float32)  # [w,h,in,out]
            b = rng.randn(1, cout).astype(np.float32)
            expected[name] = (np.transpose(k, (1, 0, 2, 3)), b.reshape(-1))
            w = np.empty((1, 2), object)
            w[0, 0], w[0, 1] = k, b
            st = np.zeros((1, 1), dtype=[("weights", object), ("type", object)])
            st[0, 0]["weights"] = w
            st[0, 0]["type"] = np.array(["conv"])
            cells[0, i] = st
        else:
            st = np.zeros((1, 1), dtype=[("type", object)])
            st[0, 0]["type"] = np.array([name[:4]])
            cells[0, i] = st
    mat_path = str(tmp_path / "vgg19.mat")
    scipy.io.savemat(mat_path, {"layers": cells})

    vgg = load_vgg19_mat(mat_path)
    assert set(vgg.keys()) == set(conv_shapes.keys())
    for name, (dw, bias) in vgg.items():
        np.testing.assert_array_equal(dw, expected[name][0])
        np.testing.assert_array_equal(bias, expected[name][1])

    params = _fake_init(lambda k: fcn8s.init_params(k, num_classes=5),
                        jax.random.PRNGKey(0))
    merged = merge_converted(params, vgg19_to_fcn8s(vgg))
    np.testing.assert_array_equal(merged["FCN_8s"]["conv3_2"]["DW"],
                                  expected["conv3_2"][0])
    # non-VGG layers untouched
    np.testing.assert_array_equal(merged["FCN_8s"]["fc6"]["DW"],
                                  params["FCN_8s"]["fc6"]["DW"])


def test_segnet_map_roundtrips_through_intermediate():
    """The SegNet map covers exactly the layers the RMI intermediate exit
    consumes (enc_1..enc_5, dec_5, dec_4 conv1-2); the repaired deeper
    decoder (reference's is channel-inconsistent and unused) stays
    unmapped -- a documented delta."""
    from sketchyscenecolorization_tpu.models.backbones import segnet
    from sketchyscenecolorization_tpu.utils.tf1_converter import (
        convert_segnet, segnet_name_map)
    params = _fake_init(lambda k: segnet.init_params(k, num_classes=5),
                        jax.random.PRNGKey(0))
    flat = _flatten(params)
    name_map = segnet_name_map()
    mapped = set(name_map.values())
    assert mapped <= set(flat.keys())
    unmapped_scopes = {p[1] for p in set(flat.keys()) - mapped}
    assert unmapped_scopes == {"dec_4", "dec_3", "dec_2", "dec_1"}
    # dec_4 conv1/conv2 ARE mapped; only its repaired conv3 is not
    assert ("SegNet", "dec_4", "conv2", "DW") in mapped
    assert ("SegNet", "dec_4", "conv3", "DW") not in mapped

    tf_vars = {n: flat[p] for n, p in name_map.items()}
    converted = convert_segnet(tf_vars, strict=True)
    for path, leaf in _flatten(converted).items():
        np.testing.assert_array_equal(leaf, flat[path])


def test_deeplab_v3plus_map_covers_tree_and_roundtrips():
    from sketchyscenecolorization_tpu.models.backbones import deeplab_v3plus
    from sketchyscenecolorization_tpu.utils.tf1_converter import (
        convert_deeplab_v3plus, deeplab_v3plus_name_map)
    params = _fake_init(lambda k: deeplab_v3plus.init_params(k, num_classes=5),
                        jax.random.PRNGKey(0))
    flat = _flatten(params)
    name_map = deeplab_v3plus_name_map()
    assert set(name_map.values()) == set(flat.keys()), (
        sorted(set(map("/".join, name_map.values()))
               ^ set(map("/".join, flat.keys())))[:12])
    tf_vars = {n: flat[p] for n, p in name_map.items()}
    converted = convert_deeplab_v3plus(tf_vars, strict=True)
    for path, leaf in _flatten(converted).items():
        np.testing.assert_array_equal(leaf, flat[path])
