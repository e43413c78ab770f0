"""Pallas kernel tests (run interpreted on the CPU backend; the same code
compiles via Mosaic on TPU — validated by the TPU smoke scripts/bench)."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy on the 1-CPU host

import numpy as np

import jax.numpy as jnp

from deeplabv3plus_keras_tpu.kernels import upsample_argmax, upsample_argmax_reference



@pytest.mark.parametrize("scale", [1, 2, 4, 8, 16])
def test_upsample_argmax_matches_resize_argmax(rng, scale):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 21)), jnp.float32)
    a = np.asarray(upsample_argmax(x, scale))
    b = np.asarray(upsample_argmax_reference(x, scale))
    assert a.shape == (2, 8 * scale, 8 * scale)
    np.testing.assert_array_equal(a, b)


def test_upsample_argmax_tie_break_first_index():
    # equal logits everywhere → argmax must be class 0 (first max), as
    # jnp.argmax does.
    x = jnp.zeros((1, 4, 4, 7), jnp.float32)
    out = np.asarray(upsample_argmax(x, 2))
    assert (out == 0).all()


def test_upsample_argmax_odd_channels_and_sizes(rng):
    x = jnp.asarray(rng.normal(size=(3, 5, 7, 11)), jnp.float32)
    a = np.asarray(upsample_argmax(x, 4))
    b = np.asarray(upsample_argmax_reference(x, 4))
    np.testing.assert_array_equal(a, b)


def test_tap_major_conv_matches_lax_conv(rng):
    import jax

    from deeplabv3plus_keras_tpu.kernels.tap_major_conv import (
        tap_major_conv3x3_same,
    )

    x = jnp.asarray(rng.normal(size=(2, 12, 12, 16)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 16, 7)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    np.testing.assert_allclose(
        np.asarray(tap_major_conv3x3_same(x, k)), np.asarray(ref), atol=1e-4
    )
    g1 = jax.grad(lambda k: jnp.sum(jnp.sin(tap_major_conv3x3_same(x, k))))(k)
    g2 = jax.grad(
        lambda k: jnp.sum(
            jnp.sin(
                jax.lax.conv_general_dilated(
                    x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
                )
            )
        )
    )(k)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-3)


# ---------------------------------------------------------------------------
# depthwise3: Pallas fp32 depthwise 3×3 stencil + VJP
# ---------------------------------------------------------------------------

from deeplabv3plus_keras_tpu.kernels.depthwise3 import (  # noqa: E402
    depthwise3x3,
    depthwise3x3_reference,
    depthwise3x3_s2,
    depthwise3x3_s2_reference,
    depthwise_conv,
    pallas_eligible,
    pallas_eligible_s2,
)


# Every (H, C) depthwise geometry in the flagship MobileNetV2 os16 backbone
# at 512² plus ragged-W / small-C shapes; trimmed sizes keep interpret-mode
# runtime sane (C and W alignment is what the kernel is sensitive to).
_DW_GEOMS = [(2, 16, 16, 8), (2, 8, 24, 16), (1, 12, 20, 144), (2, 6, 40, 96),
             (1, 9, 13, 32)]


@pytest.mark.parametrize("layout", ["nhwc", "bhcw"])
@pytest.mark.parametrize("shape", _DW_GEOMS)
def test_depthwise3_forward_matches_lax(rng, shape, layout, monkeypatch):
    monkeypatch.setenv("DLV3_DW_LAYOUT", layout)
    B, H, W, C = shape
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 1, C)) * 0.2, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(depthwise3x3(x, k)),
        np.asarray(depthwise3x3_reference(x, k)),
        atol=2e-6,
    )


@pytest.mark.parametrize("layout", ["nhwc", "bhcw"])
@pytest.mark.parametrize("shape", _DW_GEOMS[:3])
def test_depthwise3_vjp_matches_lax(rng, shape, layout, monkeypatch):
    import jax

    monkeypatch.setenv("DLV3_DW_LAYOUT", layout)
    B, H, W, C = shape
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 1, C)) * 0.2, jnp.float32)

    def loss(fn, x, k):
        return (fn(x, k) ** 2).sum()

    gx_p, gk_p = jax.grad(lambda x, k: loss(depthwise3x3, x, k), (0, 1))(x, k)
    gx_l, gk_l = jax.grad(lambda x, k: loss(depthwise3x3_reference, x, k), (0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_l), atol=5e-6)
    # dk is a large reduction — compare relative to its scale.
    scale = float(np.abs(np.asarray(gk_l)).max())
    np.testing.assert_allclose(
        np.asarray(gk_p) / scale, np.asarray(gk_l) / scale, atol=2e-6
    )


def test_depthwise3_bf16(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 16)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(3, 3, 1, 16)) * 0.2, jnp.bfloat16)
    a = np.asarray(depthwise3x3(x, k), np.float32)
    b = np.asarray(depthwise3x3_reference(x, k), np.float32)
    np.testing.assert_allclose(a, b, atol=0.1)


def test_depthwise_conv_dispatcher_eligibility():
    f32, bf16 = jnp.float32, jnp.bfloat16
    ok = ((2, 64, 64, 96), f32, (3, 3, 1, 96), (1, 1), (1, 1), "SAME")
    assert pallas_eligible(*ok)
    # Each single disqualifier flips it off.
    assert not pallas_eligible((2, 64, 64, 96), bf16, (3, 3, 1, 96), (1, 1), (1, 1), "SAME")
    assert not pallas_eligible((2, 64, 64, 96), f32, (3, 3, 1, 96), (2, 2), (1, 1), "SAME")
    assert not pallas_eligible((2, 64, 64, 96), f32, (4, 4, 1, 96), (1, 1), (1, 1), "SAME")
    assert not pallas_eligible((2, 64, 64, 96), f32, (3, 3, 1, 96), (1, 1), (1, 1), "VALID")
    assert not pallas_eligible((2, 64, 64, 21), f32, (3, 3, 1, 21), (1, 1), (1, 1), "SAME")
    # Generalized coverage: odd k and dilation are eligible, but W-shifts
    # must stay inside the image.
    assert pallas_eligible((2, 64, 64, 96), f32, (3, 3, 1, 96), (1, 1), (2, 2), "SAME")
    assert pallas_eligible((2, 64, 64, 96), f32, (5, 5, 1, 96), (1, 1), (1, 1), "SAME")
    assert pallas_eligible((2, 32, 32, 96), f32, (3, 3, 1, 96), (1, 1), (18, 15), "SAME")
    assert not pallas_eligible((2, 32, 32, 96), f32, (3, 3, 1, 96), (1, 1), (1, 32), "SAME")


def test_depthwise_eligibility_vmem_budget(monkeypatch):
    """Sites whose backward working set cannot fit VMEM at the minimum row
    tile are statically routed to lax: the tiny-shape viability probe
    cannot catch a shape-dependent VMEM overflow, so without this guard a
    big-dilation × wide-channel site (an os-8 Xception ASPP split-sep
    depthwise) would fail at MODEL compile time on TPU."""
    f32 = jnp.float32
    # Flagship/bench geometries must stay on the Pallas route (batch 16).
    assert pallas_eligible((16, 256, 256, 96), f32, (3, 3, 1, 96), (1, 1), (1, 1), "SAME")
    assert pallas_eligible((16, 32, 32, 256), f32, (3, 3, 1, 256), (1, 1), (18, 15), "SAME")
    assert pallas_eligible_s2((16, 256, 256, 96), f32, (3, 3, 1, 96), (2, 2), (1, 1), "SAME")
    # rate-18 halo (36 rows) × 2048 channels: slab ≈ 11.5 MB, bwd ≈ 46 MB.
    assert not pallas_eligible(
        (8, 32, 32, 2048), f32, (3, 3, 1, 2048), (1, 1), (18, 15), "SAME"
    )
    # The bhcw layout tiles differently but obeys the same budget.
    monkeypatch.setenv("DLV3_DW_LAYOUT", "bhcw")
    assert pallas_eligible((16, 256, 256, 96), f32, (3, 3, 1, 96), (1, 1), (1, 1), "SAME")
    monkeypatch.delenv("DLV3_DW_LAYOUT")
    # Absurd stride-2 width: 4 double-buffered plane slabs alone blow VMEM.
    assert not pallas_eligible_s2(
        (2, 16, 1024, 8192), f32, (3, 3, 1, 8192), (2, 2), (1, 1), "SAME"
    )


def test_depthwise_eligibility_lane_alignment(monkeypatch):
    """On a real (non-interpret) backend, Mosaic's 128-lane DMA tiling
    gates eligibility (measured on a v5e: 'Slice shape along dimension 3
    must be aligned to tiling (128)'): the NHWC-layout kernels need
    C%128==0, the bhcw k3 variant W%128==0; interpret mode stays
    permissive so the CPU suite keeps exercising small-C shapes."""
    import deeplabv3plus_keras_tpu.kernels.depthwise3 as dw3

    f32 = jnp.float32
    a144 = ((16, 128, 128, 144), f32, (3, 3, 1, 144), (1, 1), (1, 1), "SAME")
    a384 = ((16, 32, 32, 384), f32, (3, 3, 1, 384), (1, 1), (1, 1), "SAME")
    # Interpret (this CPU suite): both eligible.
    assert dw3.pallas_eligible(*a144) and dw3.pallas_eligible(*a384)
    monkeypatch.setattr(dw3, "_interpret", lambda: False)
    # nhwc layout (default): C on lanes.
    assert not dw3.pallas_eligible(*a144)  # 144 % 128 != 0
    assert dw3.pallas_eligible(*a384)
    # Dilated/general-k sites are always nhwc.
    assert dw3.pallas_eligible(
        (16, 32, 32, 256), f32, (3, 3, 1, 256), (1, 1), (6, 3), "SAME"
    )
    assert not dw3.pallas_eligible(
        (16, 32, 32, 96), f32, (3, 3, 1, 96), (1, 1), (6, 3), "SAME"
    )
    # bhcw layout: W on lanes.
    monkeypatch.setenv("DLV3_DW_LAYOUT", "bhcw")
    assert dw3.pallas_eligible(*a144)  # W=128
    assert not dw3.pallas_eligible(*a384)  # W=32
    monkeypatch.delenv("DLV3_DW_LAYOUT")
    # Stride-2 parity planes keep C on lanes regardless of layout.
    assert not dw3.pallas_eligible_s2(
        (16, 128, 128, 144), f32, (3, 3, 1, 144), (2, 2), (1, 1), "SAME"
    )
    assert dw3.pallas_eligible_s2(
        (16, 64, 64, 384), f32, (3, 3, 1, 384), (2, 2), (1, 1), "SAME"
    )


def test_depthwise_site_compile_gate(monkeypatch):
    """The final dispatch gate AOT-compiles each site's exact fwd+bwd
    kernels (Mosaic's alignment acceptance is not statically predictable —
    measured on a v5e) and caches the verdict; a backend rejection warns
    once and routes that site, and only that site, to lax."""
    import warnings

    import deeplabv3plus_keras_tpu.kernels.depthwise3 as dw3

    monkeypatch.setenv("DLV3_PALLAS_DEPTHWISE", "1")
    f32 = jnp.float32
    # Interpret mode (this CPU suite) short-circuits: no compile probe.
    assert dw3._site_compile_ok((2, 16, 16, 8), f32, (3, 3, 1, 8), (1, 1), False)
    # Simulate a real backend: Mosaic lowering for the CPU platform fails,
    # so the verdict must be False, cached, and dispatch must fall to lax.
    monkeypatch.setattr(dw3, "_interpret", lambda: False)
    dw3._site_ok.clear()
    site = ((2, 16, 16, 128), f32, (3, 3, 1, 128), (1, 1), False)
    try:
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            assert dw3._site_compile_ok(*site) is False
        assert any("rejected" in str(x.message) for x in w)
        with warnings.catch_warnings(record=True) as w2:
            warnings.simplefilter("always")
            assert dw3._site_compile_ok(*site) is False
        assert not w2  # cached verdict — no re-probe, no re-warn
        # The public dispatcher passes static eligibility (C%128==0) but
        # the cached rejection routes it to lax with correct numerics.
        rng_ = np.random.default_rng(3)
        x = jnp.asarray(rng_.normal(size=(2, 16, 16, 128)), f32)
        k = jnp.asarray(rng_.normal(size=(3, 3, 1, 128)) * 0.2, f32)
        assert dw3.pallas_eligible(
            x.shape, f32, k.shape, (1, 1), (1, 1), "SAME"
        )
        y = dw3.depthwise_conv(x, k)
        np.testing.assert_allclose(
            np.asarray(y),
            np.asarray(depthwise3x3_reference(x, k)),
            atol=2e-6,
        )
    finally:
        dw3._site_ok.clear()


@pytest.mark.parametrize(
    "kw", [dict(strides=(2, 2)), dict(dilation=(2, 2)), dict()]
)
def test_depthwise_conv_dispatch_matches_lax(rng, kw, monkeypatch):
    """The public entry point agrees with lax on both routes: forced-Pallas
    (interpret) for the eligible case, lax fallback for strided/dilated."""
    import jax

    monkeypatch.setenv("DLV3_PALLAS_DEPTHWISE", "1")
    x = jnp.asarray(rng.normal(size=(1, 8, 16, 16)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 1, 16)) * 0.2, jnp.float32)
    got = depthwise_conv(x, k, **kw)
    want = jax.lax.conv_general_dilated(
        x, k, kw.get("strides", (1, 1)), "SAME",
        rhs_dilation=kw.get("dilation", (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=16,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_depthwise_conv_env_off_is_pure_lax(rng, monkeypatch):
    monkeypatch.setenv("DLV3_PALLAS_DEPTHWISE", "0")
    x = jnp.asarray(rng.normal(size=(1, 8, 16, 16)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 1, 16)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(depthwise_conv(x, k)),
        np.asarray(depthwise3x3_reference(x, k)),
    )


# Generalized stride-1 stencil: odd k and dilation (ASPP split-sep rates,
# EfficientNet k5, NASNet k5/7).
@pytest.mark.parametrize(
    "k,dil,shape",
    [
        (3, (2, 2), (1, 12, 20, 16)),
        (3, (18, 15), (1, 32, 32, 16)),  # flagship ASPP rate at os16
        (3, (6, 3), (1, 32, 32, 8)),
        (5, (1, 1), (2, 12, 16, 16)),
        (7, (1, 1), (1, 16, 16, 8)),
        (5, (2, 2), (1, 16, 24, 8)),
    ],
)
def test_depthwise_stencil_general_matches_lax(rng, k, dil, shape):
    import jax

    from deeplabv3plus_keras_tpu.kernels import depthwise_stencil

    B, H, W, C = shape
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    kk = jnp.asarray(rng.normal(size=(k, k, 1, C)) * 0.2, jnp.float32)

    def ref(x, kk):
        return jax.lax.conv_general_dilated(
            x, kk, (1, 1), "SAME", rhs_dilation=dil,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        )

    np.testing.assert_allclose(
        np.asarray(depthwise_stencil(x, kk, dil)),
        np.asarray(ref(x, kk)),
        atol=3e-6,
    )
    gx_p, gk_p = jax.grad(
        lambda x, kk: (depthwise_stencil(x, kk, dil) ** 2).sum(), (0, 1)
    )(x, kk)
    gx_l, gk_l = jax.grad(lambda x, kk: (ref(x, kk) ** 2).sum(), (0, 1))(x, kk)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_l), atol=1e-5)
    scale = float(np.abs(np.asarray(gk_l)).max())
    np.testing.assert_allclose(
        np.asarray(gk_p) / scale, np.asarray(gk_l) / scale, atol=2e-6
    )


# Stride-2 flagship plane geometries (trimmed) + ragged-W / small-C shapes.
_DW_S2_GEOMS = [(2, 16, 32, 16), (1, 8, 16, 8), (2, 12, 20, 144), (1, 24, 16, 32)]


@pytest.mark.parametrize(
    "k,shape",
    [(5, (2, 16, 32, 16)), (5, (1, 10, 18, 24)), (7, (1, 16, 32, 16)),
     (7, (2, 24, 16, 8))],
)
def test_depthwise_stencil_s2_general_matches_lax(rng, k, shape):
    """General odd-k stride-2 polyphase (EfficientNet k5-s2, NASNet k5/k7-s2):
    asymmetric SAME padding (lo=(k-2)//2) → negative plane offsets."""
    import jax

    from deeplabv3plus_keras_tpu.kernels import depthwise_stencil_s2

    B, H, W, C = shape
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    kk = jnp.asarray(rng.normal(size=(k, k, 1, C)) * 0.2, jnp.float32)

    def ref(x, kk):
        return jax.lax.conv_general_dilated(
            x, kk, (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        )

    np.testing.assert_allclose(
        np.asarray(depthwise_stencil_s2(x, kk)), np.asarray(ref(x, kk)), atol=5e-6
    )
    gx_p, gk_p = jax.grad(
        lambda x, kk: (depthwise_stencil_s2(x, kk) ** 2).sum(), (0, 1)
    )(x, kk)
    gx_l, gk_l = jax.grad(lambda x, kk: (ref(x, kk) ** 2).sum(), (0, 1))(x, kk)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_l), atol=1e-5)
    scale = float(np.abs(np.asarray(gk_l)).max())
    np.testing.assert_allclose(
        np.asarray(gk_p) / scale, np.asarray(gk_l) / scale, atol=2e-6
    )


@pytest.mark.parametrize("shape", _DW_S2_GEOMS)
def test_depthwise3_s2_forward_matches_lax(rng, shape):
    B, H, W, C = shape
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 1, C)) * 0.2, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(depthwise3x3_s2(x, k)),
        np.asarray(depthwise3x3_s2_reference(x, k)),
        atol=2e-6,
    )


@pytest.mark.parametrize("shape", _DW_S2_GEOMS[:2])
def test_depthwise3_s2_vjp_matches_lax(rng, shape):
    import jax

    B, H, W, C = shape
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 1, C)) * 0.2, jnp.float32)

    def loss(fn, x, k):
        return (fn(x, k) ** 2).sum()

    gx_p, gk_p = jax.grad(lambda x, k: loss(depthwise3x3_s2, x, k), (0, 1))(x, k)
    gx_l, gk_l = jax.grad(
        lambda x, k: loss(depthwise3x3_s2_reference, x, k), (0, 1)
    )(x, k)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_l), atol=5e-6)
    scale = float(np.abs(np.asarray(gk_l)).max())
    np.testing.assert_allclose(
        np.asarray(gk_p) / scale, np.asarray(gk_l) / scale, atol=2e-6
    )


def test_depthwise_s2_dispatcher_eligibility():
    f32, bf16 = jnp.float32, jnp.bfloat16
    ok = ((2, 64, 64, 96), f32, (3, 3, 1, 96), (2, 2), (1, 1), "SAME")
    assert pallas_eligible_s2(*ok)
    assert not pallas_eligible_s2((2, 64, 64, 96), bf16, (3, 3, 1, 96), (2, 2), (1, 1), "SAME")
    assert not pallas_eligible_s2((2, 64, 64, 96), f32, (3, 3, 1, 96), (1, 1), (1, 1), "SAME")
    assert not pallas_eligible_s2((2, 63, 64, 96), f32, (3, 3, 1, 96), (2, 2), (1, 1), "SAME")
    assert not pallas_eligible_s2((2, 64, 64, 96), f32, (3, 3, 1, 96), (2, 2), (1, 1), "VALID")
    # Eligible stride-2 goes through the public dispatcher (forced Pallas).
    import os

    os.environ["DLV3_PALLAS_DEPTHWISE"] = "1"
    try:
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.normal(size=(1, 16, 16, 8)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, 1, 8)) * 0.2, jnp.float32)
        np.testing.assert_allclose(
            np.asarray(depthwise_conv(x, k, strides=(2, 2))),
            np.asarray(depthwise3x3_s2_reference(x, k)),
            atol=2e-6,
        )
    finally:
        del os.environ["DLV3_PALLAS_DEPTHWISE"]


def test_depthwise_dispatch_mesh_guard(monkeypatch):
    """Default is OFF (the family measured slower than lax on a real
    v5e); 'auto' opt-in engages only on TPU with a single-device mesh
    and a passing probe; the env override wins either way (api.py flips
    the mesh flag on init)."""
    import deeplabv3plus_keras_tpu.kernels.depthwise3 as dw3

    monkeypatch.delenv("DLV3_PALLAS_DEPTHWISE", raising=False)
    monkeypatch.setattr(dw3.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(dw3, "_viable", True)  # skip the probe compile
    try:
        # Unset: lax path, even on TPU with a trivial mesh.
        dw3.set_single_device_mesh(True)
        assert not dw3._pallas_wanted()
        # Explicit auto opt-in: TPU + trivial mesh + probe.
        monkeypatch.setenv("DLV3_PALLAS_DEPTHWISE", "auto")
        assert dw3._pallas_wanted()
        dw3.set_single_device_mesh(False)
        assert not dw3._pallas_wanted()
        # A failed probe compile degrades auto mode to the lax path.
        dw3.set_single_device_mesh(True)
        monkeypatch.setattr(dw3, "_viable", False)
        assert not dw3._pallas_wanted()
        monkeypatch.setattr(dw3, "_viable", True)
        monkeypatch.setenv("DLV3_PALLAS_DEPTHWISE", "1")
        assert dw3._pallas_wanted()
        monkeypatch.setenv("DLV3_PALLAS_DEPTHWISE", "0")
        dw3.set_single_device_mesh(True)
        assert not dw3._pallas_wanted()
    finally:
        dw3.set_single_device_mesh(True)


def test_shard_step_sets_mesh_guard(monkeypatch):
    """shard_step itself flips the single-device flag, so direct users of
    the parallel layer (tools, dryrun_multichip) — not only api.py — keep
    the GSPMD-opaque stencil off non-trivial meshes."""
    import jax

    import deeplabv3plus_keras_tpu.kernels.depthwise3 as dw3
    from deeplabv3plus_keras_tpu.parallel import make_mesh, shard_step

    dummy = lambda state, batch, rng: (state, {"loss": jnp.float32(0)})
    try:
        mesh1 = make_mesh(n_data=1, n_space=1, devices=jax.devices("cpu")[:1])
        shard_step(dummy, mesh1, kind="train")
        assert dw3._single_device_mesh
        n = min(2, len(jax.devices("cpu")))
        if n > 1:
            mesh2 = make_mesh(n_data=n, n_space=1, devices=jax.devices("cpu")[:n])
            shard_step(dummy, mesh2, kind="train")
            assert not dw3._single_device_mesh
    finally:
        dw3.set_single_device_mesh(True)


def test_flagship_train_grad_parity_pallas_vs_lax(rng, monkeypatch):
    """Full flagship-model loss gradient with every eligible depthwise site
    on the Pallas route (stride-1 + stride-2 stencils, forced interpret)
    matches the lax route to the fp32 accumulation-chaos level (the same
    2e-3-class bound as the fp32 trajectory-parity suite; near-zero BN-bias
    leaves are compared absolutely)."""
    import jax

    from deeplabv3plus_keras_tpu.config import Config, MiddleOp
    from deeplabv3plus_keras_tpu.models import init_model
    from deeplabv3plus_keras_tpu.train.loss import SS_NW, SS_PW, class_balanced_loss

    S = 96
    conf = Config()
    conf.base_model = "mobilenetv2"
    conf.nn_arch.boundary_refinement = True
    conf.nn_arch.image_size = S
    conf.nn_arch.encoder_middle_conf = [
        MiddleOp(op="conv", kernel=3, rate=(1, 1), input=-1),
        MiddleOp(op="conv", kernel=1, rate=(1, 1), input=0),
    ]
    model, variables = init_model(conf, jax.random.PRNGKey(0))
    x = jnp.asarray(rng.uniform(-1, 1, (1, S, S, 3)), jnp.float32)
    y = jax.nn.one_hot(
        jnp.asarray(rng.integers(0, 21, (1, S, S))), 21, dtype=jnp.float32
    )

    def loss_fn(params):
        probs, _ = model.apply(
            {**variables, "params": params},
            x,
            train=True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )
        return class_balanced_loss(y, probs, SS_PW, SS_NW)

    params = variables["params"]
    monkeypatch.setenv("DLV3_PALLAS_DEPTHWISE", "1")
    l1, g1 = jax.value_and_grad(loss_fn)(params)
    monkeypatch.setenv("DLV3_PALLAS_DEPTHWISE", "0")
    l2, g2 = jax.value_and_grad(loss_fn)(params)

    assert abs(float(l1) - float(l2)) < 1e-5
    leaves1 = jax.tree_util.tree_leaves_with_path(g1)
    leaves2 = jax.tree_util.tree_leaves_with_path(g2)
    worst = 0.0
    for (path, a), (_, b) in zip(leaves1, leaves2):
        d = float(jnp.abs(a - b).max())
        scale = float(jnp.abs(b).max())
        assert d <= max(3e-3 * scale, 5e-7), (jax.tree_util.keystr(path), d, scale)
        worst = max(worst, d)
    assert worst > 0.0  # exact equality would mean the Pallas route never ran


def test_model_sites_engage_pallas_routes(rng, monkeypatch):
    """The real model blocks must actually reach the stencils: InvertedResidual
    stride-1/2 and the dilated ASPP split-sep block each dispatch to the
    Pallas route (guards against wiring regressions that silently fall back
    to lax everywhere)."""
    import jax

    import deeplabv3plus_keras_tpu.kernels.depthwise3 as dw3
    from deeplabv3plus_keras_tpu.models.backbones.mobilenetv2 import InvertedResidual
    from deeplabv3plus_keras_tpu.models.blocks import SplitSepConvBlock

    monkeypatch.setenv("DLV3_PALLAS_DEPTHWISE", "1")
    calls = []
    orig_s1, orig_s2 = dw3.depthwise_stencil, dw3.depthwise_stencil_s2
    monkeypatch.setattr(
        dw3, "depthwise_stencil",
        lambda x, k, dilation=(1, 1): (calls.append(("s1", dilation)), orig_s1(x, k, dilation))[1],
    )
    monkeypatch.setattr(
        dw3, "depthwise_stencil_s2",
        lambda x, k: (calls.append(("s2", None)), orig_s2(x, k))[1],
    )

    x = jnp.asarray(rng.normal(size=(1, 16, 16, 8)), jnp.float32)
    for m in (InvertedResidual(8, strides=1, expand_ratio=1),
              InvertedResidual(8, strides=2, expand_ratio=1)):
        v = m.init(jax.random.PRNGKey(0), x, False)
        m.apply(v, x, False)
    sep = SplitSepConvBlock(8, kernel=3, dilation=(3, 2), bn_momentum=0.99,
                            bn_scale=True)
    v = sep.init(jax.random.PRNGKey(0), x, False)
    sep.apply(v, x, False)

    kinds = [c[0] for c in calls]
    assert "s1" in kinds and "s2" in kinds
    assert ("s1", (3, 2)) in calls  # the dilated ASPP-style site


def test_depthwise_probe_checks_numerics(monkeypatch):
    """The auto-dispatch probe must pass on a healthy backend AND detect a
    numerically-corrupt stencil (miscompile guard), falling back to lax."""
    import warnings

    import deeplabv3plus_keras_tpu.kernels.depthwise3 as dw3

    monkeypatch.setattr(dw3, "_viable", None)
    assert dw3._probe_viable() is True

    monkeypatch.setattr(dw3, "_viable", None)
    orig = dw3.depthwise3x3
    monkeypatch.setattr(dw3, "depthwise3x3", lambda x, k: orig(x, k) * 1.01)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        assert dw3._probe_viable() is False


def test_depthwise_probe_inside_jit_trace(monkeypatch):
    """Dispatch happens at TRACE time, so on TPU the one-time probe first
    fires inside an outer jit trace — where every jax op joins the ambient
    trace and the probe's float() fetches raise ConcretizationTypeError
    unless the probe escapes to its own thread (trace state is
    thread-local).  Regression: the except-clause used to swallow that
    error and silently disable the stencils on the very backend they
    target."""
    import warnings

    import jax

    import deeplabv3plus_keras_tpu.kernels.depthwise3 as dw3

    monkeypatch.setenv("DLV3_PALLAS_DEPTHWISE", "auto")
    monkeypatch.setattr(dw3, "_interpret", lambda: True)
    monkeypatch.setattr(dw3.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(dw3, "_viable", None)
    dw3.set_single_device_mesh(True)

    @jax.jit
    def step(x, k):
        return dw3.depthwise_conv(x, k).sum()

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 16, 16)), jnp.float32)
    k = jnp.asarray(np.random.default_rng(1).normal(size=(3, 3, 1, 16)) * 0.2, jnp.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # a probe-failure warning fails the test
        out = step(x, k)
    assert dw3._viable is True
    want = depthwise3x3_reference(x, k).sum()
    assert abs(float(out) - float(want)) < 1e-3


def test_depthwise_module_param_tree_unchanged(rng):
    """DepthwiseConv must keep nn.Conv's exact param path + HWIO shape so
    checkpoints and the Keras weight converter are unaffected."""
    import jax

    from deeplabv3plus_keras_tpu.models.blocks import SeparableConv

    m = SeparableConv(24, kernel=3)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 16)))
    assert v["params"]["depthwise"]["kernel"].shape == (3, 3, 1, 16)
    assert v["params"]["pointwise"]["kernel"].shape == (1, 1, 16, 24)
