"""Backbone registry coverage + cut-point shape tests for the lighter
families (heavier ones are covered by -m parity tests and smoke scripts)."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy on the 1-CPU host

import jax
import jax.numpy as jnp

from deeplabv3plus_keras_tpu.config import ALL_BASE_MODELS
from deeplabv3plus_keras_tpu.models.backbones import available_backbones, get_backbone



def test_registry_covers_all_reference_backbones():
    # Reference elif ladder: semantic_segmentation.py:494-771.
    assert set(ALL_BASE_MODELS) <= set(available_backbones())


def test_unknown_backbone_rejected():
    with pytest.raises(ValueError):
        get_backbone("resnet50", 16)


@pytest.mark.parametrize(
    "name,os_,ch",
    [
        ("efficientnetb1", 16, 112),
        ("efficientnetb2", 16, 120),
        ("densenet169", 16, 640),
        ("nasnetmobile", 16, 176),
    ],
)
def test_cut_point_channels(name, os_, ch):
    bb = get_backbone(name, os_)
    x = jnp.zeros((1, 32, 32, 3))
    v = bb.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    y = bb.apply(v, x, train=False)
    assert y.shape == (1, 32 // os_, 32 // os_, ch), y.shape


def test_efficientnet_cut_letters_match_reference():
    """The per-variant truncation layers the reference names (block3{b..g}_add,
    block5{c..j}_add, semantic_segmentation.py:526-674) are exactly 'end of
    stage 3/5' under compound depth scaling — verify the repeat formula
    reproduces every letter."""
    from deeplabv3plus_keras_tpu.models.backbones.efficientnet import (
        _VARIANTS,
        round_repeats,
    )

    expected = {  # (os8 letter, os16 letter) from the reference elif arms
        "efficientnetb0": ("b", "c"),
        "efficientnetb1": ("c", "d"),
        "efficientnetb2": ("c", "d"),
        "efficientnetb3": ("c", "e"),
        "efficientnetb4": ("d", "f"),
        "efficientnetb5": ("e", "g"),
        "efficientnetb6": ("f", "h"),
        "efficientnetb7": ("g", "j"),
    }
    for variant, (l8, l16) in expected.items():
        _, depth = _VARIANTS[variant]
        stage3 = round_repeats(2, depth)  # base repeats: stage 3 = 2
        stage5 = round_repeats(3, depth)  # stage 5 = 3
        assert chr(ord("a") + stage3 - 1) == l8, (variant, stage3)
        assert chr(ord("a") + stage5 - 1) == l16, (variant, stage5)
