"""Shape/spec tests for backbones, encoder-middle ops, and the full model
(SURVEY §4: shape tests for every encoder_middle_conf op and backbone cut
point)."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy on the 1-CPU host

import jax
import jax.numpy as jnp
import numpy as np

from deeplabv3plus_keras_tpu.config import Config, MiddleOp



def small_conf(base_model="mobilenetv2", os_=16, refine=True, size=64):
    c = Config()
    c.base_model = base_model
    c.nn_arch.output_stride = os_
    c.nn_arch.boundary_refinement = refine
    c.nn_arch.image_size = size
    c.nn_arch.reduction_size = 32
    c.nn_arch.concat_channels = 32
    c.nn_arch.encoder_middle_conf = [
        MiddleOp(op="conv", kernel=3, rate=(1, 1), input=-1),
        MiddleOp(op="conv", kernel=3, rate=(6, 3), input=0),
        MiddleOp(op="conv", kernel=1, rate=(1, 1), input=1),
        MiddleOp(op="pyramid_pooling", kernel=1, input=0, target_size_factor=(1, 1)),
    ]
    return c


def test_backbone_cut_points_strides():
    from deeplabv3plus_keras_tpu.models.backbones import get_backbone

    x = jnp.zeros((1, 64, 64, 3))
    rng = jax.random.PRNGKey(0)
    for name, os_, ch in [
        ("mobilenetv2", 8, 32),
        ("mobilenetv2", 16, 96),
        ("xception", 8, 728),
        ("xception", 16, 1024),
    ]:
        bb = get_backbone(name, os_)
        vars_ = bb.init({"params": rng}, x, train=False)
        y = bb.apply(vars_, x, train=False)
        assert y.shape[-1] == ch, (name, os_, y.shape)
        assert y.shape[1] == 64 // os_, (name, os_, y.shape)


def test_full_model_output_and_softmax():
    from deeplabv3plus_keras_tpu.models import init_model

    conf = small_conf()
    model, variables = init_model(conf, jax.random.PRNGKey(0))
    y = model.apply(variables, jnp.zeros((2, 64, 64, 3)), train=False)
    assert y.shape == (2, 64, 64, 21)
    np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, atol=1e-5)


def test_encoder_middle_dag_chaining():
    """input: k must consume branch k's output, not the base (reference
    :807-810)."""
    from deeplabv3plus_keras_tpu.models.encoder import EncoderMiddle

    mid = [
        MiddleOp(op="conv", kernel=1, input=-1),
        MiddleOp(op="conv", kernel=1, input=0),
        MiddleOp(op="conv", kernel=1, input=1),
    ]
    m = EncoderMiddle(
        middle_conf=tuple(mid),
        reduction_size=8,
        concat_channels=8,
        conv_rate_multiplier=1,
        dropout_rate=0.0,
        bn_momentum=0.9,
        bn_scale=True,
    )
    x = jnp.ones((1, 4, 4, 16))
    vars_ = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    y = m.apply(vars_, x, train=False)
    assert y.shape == (1, 4, 4, 8)
    # 3 branches, chained: branch1 consumes branch0's 8-ch output
    p = vars_["params"]
    assert p["branch1_conv1x1"]["conv_l2"]["kernel"].shape[2] == 8
    assert p["branch0_conv1x1"]["conv_l2"]["kernel"].shape[2] == 16


def test_pyramid_pooling_resize():
    from deeplabv3plus_keras_tpu.models.encoder import EncoderMiddle

    mid = [MiddleOp(op="pyramid_pooling", kernel=2, input=-1, target_size_factor=(2, 2))]
    m = EncoderMiddle(
        middle_conf=tuple(mid),
        reduction_size=8,
        concat_channels=8,
        conv_rate_multiplier=1,
        dropout_rate=0.0,
        bn_momentum=0.9,
        bn_scale=True,
    )
    x = jnp.ones((1, 8, 8, 4))
    vars_ = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    y = m.apply(vars_, x, train=False)
    # pool /2 then resize ×2 → back to 8
    assert y.shape == (1, 8, 8, 8)


def test_dilation_rate_multiplier_changes_params_not_shape():
    from deeplabv3plus_keras_tpu.models import init_model

    c1 = small_conf()
    c2 = small_conf()
    c2.nn_arch.conv_rate_multiplier = 2
    m1, v1 = init_model(c1, jax.random.PRNGKey(0))
    m2, v2 = init_model(c2, jax.random.PRNGKey(0))
    y1 = m1.apply(v1, jnp.ones((1, 64, 64, 3)), train=False)
    y2 = m2.apply(v2, jnp.ones((1, 64, 64, 3)), train=False)
    assert y1.shape == y2.shape
    # same params shapes (dilation is a conv attribute, not a param)
    assert jax.tree.structure(v1) == jax.tree.structure(v2)


def test_boundary_refinement_upsample_math():
    """With refinement: features upsampled ×(os/2) then ×2 → ×os total
    (reference :899-908, :941-950)."""
    from deeplabv3plus_keras_tpu.models import init_model

    for os_ in (8, 16):
        conf = small_conf(os_=os_, refine=True)
        model, variables = init_model(conf, jax.random.PRNGKey(0))
        y = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
        assert y.shape == (1, 64, 64, 21), (os_, y.shape)


def test_invalid_middle_op_rejected():
    with pytest.raises(ValueError):
        MiddleOp.from_dict({"op": "nonsense"})


def test_bfloat16_compute_dtype():
    from deeplabv3plus_keras_tpu.models import init_model

    conf = small_conf()
    conf.hps.dtype = "bfloat16"
    model, variables = init_model(conf, jax.random.PRNGKey(0))
    y = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    assert y.dtype == jnp.float32  # output promoted back to fp32
    # params stay fp32 (param_dtype default)
    leaf = jax.tree.leaves(variables["params"])[0]
    assert leaf.dtype == jnp.float32
