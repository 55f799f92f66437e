"""Fused warp->normalize->correlation kernel vs the XLA oracle
(interpret mode).

Branch selection note: as in test_pallas_feature_warp.py, interpret-mode
emulation of the warp kernel's manual DMA is not ``lax.cond``-safe, so
tests pin the branch with ``force=`` and assert the window predicate
separately; the cond wiring runs on real TPU via the bench/model.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from upflow_pytorch_tpu.ops.pallas.corr_norm import (
    warp_norm_corr,
    warp_norm_corr_viable,
    warp_norm_corr_xla,
)
from upflow_pytorch_tpu.ops.pallas.feature_warp import feature_warp_prep

RNG = np.random.RandomState(13)

NORM_DEFAULT = (("normalize", True), ("center", True),
                ("moments_across_channels", False),
                ("moments_across_images", False))


def _inwindow_flow(b, h, w, xscale, yscale, yoff=0.0):
    coarse = RNG.rand(b, 6, 10, 2).astype(np.float32) - 0.5
    coarse[..., 0] *= xscale
    coarse[..., 1] = coarse[..., 1] * yscale + yoff
    return jax.image.resize(jnp.asarray(coarse), (b, h, w, 2), "linear")


def _run(f1, f2, flow, norm_items, leaky=0.1, disp=4, force="fast"):
    if force == "fast":
        fits = feature_warp_prep(jnp.asarray(f2), flow)[5]
        assert bool(fits), "test flow unexpectedly out-of-window"
    with pltpu.force_tpu_interpret_mode():
        out = warp_norm_corr(jnp.asarray(f1), jnp.asarray(f2), flow,
                             disp, norm_items, leaky, 1.0, force)
    ref = warp_norm_corr_xla(
        jnp.asarray(f1), jnp.asarray(f2), flow, disp,
        dict(norm_items) if norm_items is not None else None, leaky)
    return np.asarray(out), np.asarray(ref)


@pytest.mark.parametrize("shape,xscale,yscale,yoff", [
    ((2, 32, 128, 16), 5.0, 1.5, 0.0),
    ((1, 96, 320, 32), 30.0, 1.5, -5.0),  # level-4 bench shape
    ((1, 48, 160, 64), 12.0, 1.2, 2.5),   # level-3
    ((1, 40, 136, 8), 3.0, 1.0, 0.0),     # ragged H/W
])
def test_fused_matches_oracle(shape, xscale, yscale, yoff):
    b, h, w, c = shape
    f1 = RNG.randn(*shape).astype(np.float32)
    f2 = RNG.randn(*shape).astype(np.float32)
    flow = _inwindow_flow(b, h, w, xscale, yscale, yoff)
    out, ref = _run(f1, f2, flow, NORM_DEFAULT)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("norm_items", [
    None,
    (("normalize", True), ("center", True),
     ("moments_across_channels", True), ("moments_across_images", False)),
    (("normalize", True), ("center", True),
     ("moments_across_channels", False), ("moments_across_images", True)),
    (("normalize", True), ("center", True),
     ("moments_across_channels", True), ("moments_across_images", True)),
    (("normalize", False), ("center", True),
     ("moments_across_channels", False), ("moments_across_images", False)),
])
def test_norm_knob_combinations(norm_items):
    shape = (2, 32, 128, 16)
    f1 = RNG.randn(*shape).astype(np.float32)
    f2 = RNG.randn(*shape).astype(np.float32)
    flow = _inwindow_flow(2, 32, 128, 4.0, 1.5)
    out, ref = _run(f1, f2, flow, norm_items)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_small_disp():
    shape = (1, 32, 128, 8)
    f1 = RNG.randn(*shape).astype(np.float32)
    f2 = RNG.randn(*shape).astype(np.float32)
    flow = _inwindow_flow(1, 32, 128, 3.0, 1.2)
    out, ref = _run(f1, f2, flow, NORM_DEFAULT, disp=2)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_boundary_zero_taps():
    """Flows pushing the warp out of image: masked-to-zero warped pixels
    and out-of-image correlation taps must match the oracle exactly
    (zeros AFTER normalization)."""
    shape = (1, 32, 128, 8)
    f1 = RNG.randn(*shape).astype(np.float32)
    f2 = RNG.randn(*shape).astype(np.float32)
    flow = np.zeros((1, 32, 128, 2), np.float32)
    flow[..., 0] = -3.5
    flow[0, :10, :, 1] = 2.25
    out, ref = _run(f1, f2, jnp.asarray(flow), NORM_DEFAULT)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_fallback_on_discontinuous_flow():
    """A flow jump wider than the warp window fails the predicate; the
    exact-XLA branch matches the oracle bit-for-bit."""
    shape = (1, 32, 128, 8)
    f1 = RNG.randn(*shape).astype(np.float32)
    f2 = RNG.randn(*shape).astype(np.float32)
    flow = np.zeros((1, 32, 128, 2), np.float32)
    flow[0, :, 64:, 1] = 60.0
    fits = feature_warp_prep(jnp.asarray(f2), jnp.asarray(flow))[5]
    assert not bool(fits)
    out, ref = _run(f1, f2, jnp.asarray(flow), NORM_DEFAULT, force="slow")
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-6)


def test_bf16_inputs():
    shape = (1, 32, 128, 16)
    f1 = RNG.randn(*shape).astype(np.float32)
    f2 = RNG.randn(*shape).astype(np.float32)
    flow = _inwindow_flow(1, 32, 128, 4.0, 1.5)
    with pltpu.force_tpu_interpret_mode():
        out = warp_norm_corr(jnp.asarray(f1, jnp.bfloat16),
                             jnp.asarray(f2, jnp.bfloat16), flow,
                             4, NORM_DEFAULT, 0.1, 1.0, "fast")
    ref = warp_norm_corr_xla(jnp.asarray(f1, jnp.bfloat16),
                             jnp.asarray(f2, jnp.bfloat16), flow, 4,
                             dict(NORM_DEFAULT), 0.1)
    # bf16 warp rounding matches the oracle's (both round the warped
    # feature to bf16 before fp32 normalization); tolerance covers the
    # moment/association reorder only
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref, np.float32),
                               rtol=5e-3, atol=5e-3)


def test_gradients_route_through_oracle():
    shape = (1, 32, 128, 8)
    f1 = jnp.asarray(RNG.randn(*shape).astype(np.float32))
    f2 = jnp.asarray(RNG.randn(*shape).astype(np.float32))
    flow = _inwindow_flow(1, 32, 128, 3.0, 1.2)

    def loss_fast(a, b, fl):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(warp_norm_corr(a, b, fl, 4, NORM_DEFAULT,
                                          0.1, 1.0, "fast") ** 2)

    def loss_ref(a, b, fl):
        return jnp.sum(warp_norm_corr_xla(a, b, fl, 4, dict(NORM_DEFAULT),
                                          0.1) ** 2)

    gf = jax.grad(loss_fast, argnums=(0, 1, 2))(f1, f2, flow)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(f1, f2, flow)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_viability_gate():
    assert warp_norm_corr_viable((4, 96, 320, 32))
    assert warp_norm_corr_viable((4, 48, 160, 64))
    assert not warp_norm_corr_viable((4, 24, 80, 96))    # narrow level
    assert not warp_norm_corr_viable((4, 96, 320, 32), disp=5)
