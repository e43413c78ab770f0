"""Full-model numerical parity: encoder middle + decoder + refinement + loss
vs a Keras-built reference graph.

Backbone parity is covered per-backbone in test_keras_parity.py; this closes
the remaining chain (reference semantic_segmentation.py:790-954): the exact
Keras layer recipe is rebuilt here (eager layer calls — the recipe, not the
reference's code), weights are transplanted through the name-driven
converter, and end-to-end softmax outputs must agree to 1e-5, the class-
balanced loss (:438-447) and l2 regularization (:817 et seq.) to ~1e-6.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax

pytestmark = pytest.mark.parity

SIZE = 96
RS = 32  # reduction_size
CC = 32  # concat_channels
BN_MOM = 0.9
WD = 4e-5


def _conf(base_model="mobilenetv2", output_stride=16):
    from deeplabv3plus_keras_tpu.config import Config, MiddleOp

    conf = Config()
    conf.base_model = base_model
    conf.nn_arch.boundary_refinement = True
    conf.nn_arch.output_stride = output_stride
    conf.nn_arch.image_size = SIZE
    conf.nn_arch.num_classes = 21
    conf.nn_arch.reduction_size = RS
    conf.nn_arch.concat_channels = CC
    conf.nn_arch.dropout_rate = 0.5
    conf.hps.bn_momentum = BN_MOM
    conf.hps.weight_decay = WD
    conf.nn_arch.encoder_middle_conf = [
        MiddleOp(op="conv", kernel=1, input=-1),
        MiddleOp(op="conv", kernel=3, rate=(2, 1), input=0),
        MiddleOp(op="pyramid_pooling", kernel=2, input=-1, target_size_factor=(2, 2)),
    ]
    return conf


class KerasReferenceGraph:
    """The reference's encoder-middle/decoder/refinement layer recipe
    (:790-954), applied eagerly.  Layer names follow this repo's flax module
    paths so utils.keras_weights can transplant by name.

    ``backbone`` selects the reference's two headline backbones;
    ``output_stride`` picks the reference's exact cut layer for each stride
    (semantic_segmentation.py:502-504 MobileNetV2 block_5_add/block_12_add,
    :518-520 Xception block4_sepconv2_bn/block13_sepconv2_bn) and drives
    the refinement/decoder upsample factors (:899-902, :941-950)."""

    def __init__(self, backbone: str = "mobilenetv2", output_stride: int = 16):
        from tensorflow.keras import layers

        self.output_stride = output_stride
        if backbone == "mobilenetv2":
            from tensorflow.keras.applications import MobileNetV2 as App

            cut = "block_5_add" if output_stride == 8 else "block_12_add"
        elif backbone == "xception":
            from tensorflow.keras.applications import Xception as App

            cut = "block4_sepconv2_bn" if output_stride == 8 else "block13_sepconv2_bn"
        else:
            raise ValueError(backbone)
        full = App(input_shape=(SIZE, SIZE, 3), include_top=False, weights=None)
        self.base = tf.keras.Model(full.inputs, full.get_layer(cut).output)
        self.full_backbone = full

        def bn(name):
            return layers.BatchNormalization(momentum=BN_MOM, scale=True, name=name)

        def conv1(name, c=RS):
            return layers.Conv2D(c, 1, padding="same", use_bias=False, name=name)

        # encoder middle: branch 0 (1x1 conv), branch 1 (split separable,
        # dilation (2,1), input=branch 0), branch 2 (pyramid pooling k=2)
        self.b0_conv = conv1("branch0_conv1x1_conv_l2")
        self.b0_bn = bn("branch0_conv1x1_bn")
        self.b1_sep = layers.SeparableConv2D(
            RS, 3, depth_multiplier=1, dilation_rate=(2, 1), padding="same",
            use_bias=False, name="branch1_sep_sepconv",
        )
        self.b1_bn1 = bn("branch1_sep_bn1")
        self.b1_conv = conv1("branch1_sep_conv_l2")
        self.b1_bn2 = bn("branch1_sep_bn2")
        self.b2_pool = layers.AveragePooling2D(pool_size=2, padding="valid")
        self.b2_conv = conv1("branch2_pool_conv_conv_l2")
        self.b2_bn = bn("branch2_pool_conv_bn")
        self.proj_conv = conv1("projection_conv_l2", CC)
        self.proj_bn = bn("projection_bn")
        # refinement + decoder
        self.ref_conv = conv1("refine_conv48_conv_l2", 48)
        self.ref_bn = bn("refine_conv48_bn")
        self.cls_conv = layers.Conv2D(
            21, 3, padding="same", use_bias=False, name="classifier_l2"
        )

    @property
    def layers(self):  # converter contract: object with .layers
        return [
            self.b0_conv, self.b0_bn, self.b1_sep, self.b1_bn1, self.b1_conv,
            self.b1_bn2, self.b2_conv, self.b2_bn, self.proj_conv, self.proj_bn,
            self.ref_conv, self.ref_bn, self.cls_conv,
        ]

    def __call__(self, x, training=False):
        relu = tf.nn.relu

        def up(t, f):
            # == tf.image.resize(bilinear, half_pixel_centers) but dtype-
            # generic: the ResizeBilinear kernel always OUTPUTS float32,
            # which would break the fp64 trajectory suite.  Same formula
            # as the TF kernel: in=(i+0.5)/f−0.5, taps (max(0,⌊in⌋),
            # min(n−1,⌈in⌉)), lerp weight in−⌊in⌋.
            import numpy as np_

            def axis_interp(t, axis):
                n = int(t.shape[axis])
                src = (np_.arange(n * f) + 0.5) / f - 0.5
                fl = np_.floor(src)
                i0 = np_.maximum(0, fl).astype(np_.int32)
                i1 = np_.minimum(n - 1, np_.ceil(src)).astype(np_.int32)
                shape = [1, 1, 1, 1]
                shape[axis] = n * f
                w = tf.constant(
                    (src - fl).reshape(shape), dtype=t.dtype
                )
                g0 = tf.gather(t, i0, axis=axis)
                g1 = tf.gather(t, i1, axis=axis)
                return g0 * (1.0 - w) + g1 * w

            return axis_interp(axis_interp(t, 1), 2)

        feats = self.base(x, training=training)
        b0 = relu(self.b0_bn(self.b0_conv(feats), training=training))
        b1 = relu(self.b1_bn1(self.b1_sep(b0), training=training))  # input: 0
        b1 = relu(self.b1_bn2(self.b1_conv(b1), training=training))
        b2 = relu(self.b2_bn(self.b2_conv(self.b2_pool(feats)), training=training))
        b2 = up(b2, 2)  # target_size_factor
        cat = tf.concat([b0, b1, b2], axis=-1)
        # dropout: inactive (eval) / rate 0 in the trajectory suite
        enc = relu(self.proj_bn(self.proj_conv(cat), training=training))

        low = self.base(x, training=training)  # second backbone run (:930)
        low = relu(self.ref_bn(self.ref_conv(low), training=training))
        half = self.output_stride // 2  # :941-950
        low = up(low, half)
        enc = up(enc, half)
        merged = tf.concat([low, enc], axis=-1)
        logits = self.cls_conv(merged)
        # refinement final factor: os/8 for os=16, os/4 for os=8 (:899-902)
        final = self.output_stride // (8 if self.output_stride == 16 else 4)
        return tf.nn.softmax(up(logits, final), axis=-1)

    def l2_sum(self):
        """Σ‖W‖² over the kernels the reference regularizes (:817, :838,
        :845, :866, :893, :931)."""
        ks = [self.b0_conv, self.b1_conv, self.b2_conv, self.proj_conv,
              self.ref_conv, self.cls_conv]
        return float(sum(np.sum(np.square(l.get_weights()[0])) for l in ks))


@pytest.fixture(scope="module", params=[16, 8], ids=["os16", "os8"])
def transplanted(request):
    """Both supported output strides (reference asserts os ∈ {8, 16},
    semantic_segmentation.py:468): os=8 is the reference's quality mode —
    refinement upsamples ×4 (through the fused composed transposed conv,
    half=4) and the decoder arm resolves to ×2 via os/4 (:899-902)."""
    from deeplabv3plus_keras_tpu.models import init_model
    from deeplabv3plus_keras_tpu.utils.keras_weights import convert_keras_backbone

    conf = _conf(output_stride=request.param)
    model, variables = init_model(conf, jax.random.PRNGKey(0))

    ref = KerasReferenceGraph(output_stride=request.param)
    x = np.random.default_rng(7).uniform(-1, 1, (2, SIZE, SIZE, 3)).astype(np.float32)
    ref_probs = ref(tf.constant(x)).numpy()  # also builds all eager layers

    variables, r1 = convert_keras_backbone(ref.full_backbone, variables, base_path="base")
    assert not r1["missing"], r1["missing"][:5]
    variables, r2 = convert_keras_backbone(ref, variables, base_path="encoder")
    assert not r2["missing"], r2["missing"][:5]
    variables, r3 = convert_keras_backbone(ref, variables, base_path="decoder")
    assert not r3["missing"], r3["missing"][:5]
    return conf, model, variables, ref, x, ref_probs


def test_full_model_logits_parity(transplanted):
    conf, model, variables, ref, x, ref_probs = transplanted
    ours = np.asarray(model.apply(variables, x, train=False))
    assert ours.shape == ref_probs.shape == (2, SIZE, SIZE, 21)
    np.testing.assert_allclose(ours, ref_probs, atol=1e-5)


def test_loss_parity_vs_reference_formula(transplanted):
    """class_balanced_loss (:438-447): per-class weighted BCE summed over
    classes, mean over all remaining axes — transcribed here in numpy and
    evaluated on the Keras graph's own probabilities."""
    from deeplabv3plus_keras_tpu.train.loss import SS_NW, SS_PW, class_balanced_loss

    _, _, _, _, x, ref_probs = transplanted
    rng = np.random.default_rng(3)
    labels = rng.integers(0, 21, ref_probs.shape[:-1])
    onehot = np.eye(21, dtype=np.float32)[labels]

    eps = 1e-7
    p64 = ref_probs.astype(np.float64)
    per_class = -(
        SS_PW * onehot * np.log(p64 + eps)
        + SS_NW * (1.0 - onehot) * np.log(1.0 - p64 + eps)
    )
    ref_loss = per_class.sum(axis=-1).mean()

    # rtol 1e-5: fp32 accumulation-order noise between jnp and the float64
    # reference sum; the values are equal to fp32 precision.
    ours = float(class_balanced_loss(onehot, ref_probs))
    np.testing.assert_allclose(ours, ref_loss, rtol=1e-5)


def test_l2_regularization_parity(transplanted):
    """Keras l2(wd) regularizers attach to exactly 6 conv kernels in the
    encoder/decoder chain; l2_penalty must reproduce wd·Σ‖W‖² over them
    (plus nothing from the unregularized backbone)."""
    from deeplabv3plus_keras_tpu.train.loss import l2_penalty

    conf, _, variables, ref, _, _ = transplanted
    ours = float(l2_penalty(variables["params"], WD))
    theirs = WD * ref.l2_sum()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)
