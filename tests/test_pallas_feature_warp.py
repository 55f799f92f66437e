"""Many-channel feature-warp kernel vs the XLA oracle (interpret mode).

Branch selection note: the production op picks fast/slow via ``lax.cond``
on the window predicate.  Interpret-mode emulation of this kernel's
manual DMA is not cond-safe (the untaken branch's callbacks corrupt the
cond output), so tests pin the branch with ``force=`` and assert the
predicate separately — the cond wiring itself is exercised on real TPU
by the bench and the model tests.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from upflow_pytorch_tpu.ops.warp import flow_warp_with_mask
from upflow_pytorch_tpu.ops.pallas.feature_warp import (
    feature_warp_masked_fast,
    feature_warp_prep,
)

RNG = np.random.RandomState(7)


def _oracle(img, flow):
    out, _ = flow_warp_with_mask(jnp.asarray(img), jnp.asarray(flow))
    return np.asarray(out)


def inwindow_flow(b, h, w, xscale, yscale, xoff=0.0, yoff=0.0):
    """Smooth flow whose per-(row, 128-lane-tile) y0 span stays within
    the kernel's candidate window: large x variation is fine (the 384-col
    window absorbs ~128 px), y variation must stay small per tile."""
    coarse = RNG.rand(b, 6, 10, 2).astype(np.float32) - 0.5
    coarse[..., 0] = coarse[..., 0] * xscale + xoff
    coarse[..., 1] = coarse[..., 1] * yscale + yoff
    return jax.image.resize(jnp.asarray(coarse), (b, h, w, 2), "linear")


def _assert_fits(img, flow):
    fits = feature_warp_prep(jnp.asarray(img), flow)[5]
    assert bool(fits), "test flow unexpectedly out-of-window"


@pytest.mark.parametrize("shape,xscale,yscale,yoff", [
    ((2, 32, 128, 32), 5.0, 1.5, 0.0),
    ((1, 96, 320, 32), 40.0, 1.5, -6.5),   # level-4 bench shape
    ((1, 48, 160, 64), 20.0, 1.5, 3.25),   # level-3 (W pads 160->256)
    ((1, 40, 136, 16), 3.0, 1.0, 0.0),     # ragged H and W
])
def test_matches_oracle_smooth_flow(shape, xscale, yscale, yoff):
    b, h, w, c = shape
    img = RNG.randn(*shape).astype(np.float32)
    # smooth flow: coarse random field upsampled (the real regime: flows
    # are 2x-upsampled from a coarser pyramid level)
    flow = inwindow_flow(b, h, w, xscale, yscale, yoff=yoff)
    _assert_fits(img, flow)
    ref = _oracle(img, np.asarray(flow))
    with pltpu.force_tpu_interpret_mode():
        out = feature_warp_masked_fast(jnp.asarray(img), flow, 1.0, "fast")
    # association of the 4-tap sum differs (per-row accumulation);
    # everything else, including the mask, is bit-identical
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_fast_path_predicate_and_fallback():
    """A flow discontinuity wider than the window forces fits=False; the
    exact-XLA branch then matches the oracle bit-for-bit."""
    img = RNG.randn(1, 32, 128, 32).astype(np.float32)
    smooth = np.full((1, 32, 128, 2), 3.25, np.float32)
    fits = feature_warp_prep(jnp.asarray(img), jnp.asarray(smooth))[5]
    assert bool(fits)
    jumpy = smooth.copy()
    jumpy[0, :, 64:, 1] = 60.0  # 57-row span inside single tiles
    fits2 = feature_warp_prep(jnp.asarray(img), jnp.asarray(jumpy))[5]
    assert not bool(fits2)
    with pltpu.force_tpu_interpret_mode():
        out = feature_warp_masked_fast(jnp.asarray(img), jnp.asarray(jumpy),
                                       1.0, "slow")
    np.testing.assert_allclose(np.asarray(out), _oracle(img, jumpy),
                               rtol=0, atol=1e-6)


def test_y_span_gate():
    """Per-tile y0 spans wider than the candidate window must fall back."""
    img = RNG.randn(1, 32, 128, 16).astype(np.float32)
    flow = np.zeros((1, 32, 128, 2), np.float32)
    flow[0, :, :, 1] = np.linspace(0.0, 4.5, 128, dtype=np.float32)  # span 4
    fits = feature_warp_prep(jnp.asarray(img), jnp.asarray(flow))[5]
    assert not bool(fits)
    flow[0, :, :, 1] = np.linspace(0.0, 1.9, 128, dtype=np.float32)  # span<=2
    fits = feature_warp_prep(jnp.asarray(img), jnp.asarray(flow))[5]
    assert bool(fits)


def test_mask_bit_identical_near_boundary():
    """The >=1.0 validity mask (analytic warped-ones) must make identical
    decisions to the XLA oracle, including out-of-image zeroing."""
    img = np.ones((1, 32, 128, 8), np.float32)
    flow = np.zeros((1, 32, 128, 2), np.float32)
    flow[0, :, :, 0] = -2.5   # push left columns out of image
    flow[0, :16, :, 1] = 1.75
    _assert_fits(img, jnp.asarray(flow))
    ref = _oracle(img, flow)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(feature_warp_masked_fast(
            jnp.asarray(img), jnp.asarray(flow), 1.0, "fast"))
    # masked-to-zero pixels must agree EXACTLY
    np.testing.assert_array_equal(out == 0.0, ref == 0.0)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_bf16_staging():
    """bf16 sources stage bf16 (half the DMA) and still match the oracle
    at bf16-rounding tolerance."""
    img = RNG.randn(1, 32, 128, 32).astype(np.float32)
    flow = inwindow_flow(1, 32, 128, 4.0, 1.5)
    _assert_fits(img.astype(jnp.bfloat16), flow)
    with pltpu.force_tpu_interpret_mode():
        out = feature_warp_masked_fast(
            jnp.asarray(img, jnp.bfloat16), flow, 1.0, "fast")
    ref, _ = flow_warp_with_mask(jnp.asarray(img, jnp.bfloat16), flow)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=1e-2, atol=1e-2)


def test_gradients_route_through_oracle():
    img = jnp.asarray(RNG.randn(1, 32, 128, 16).astype(np.float32))
    flow = inwindow_flow(1, 32, 128, 3.0, 1.2)

    def loss_fast(x, fl):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(feature_warp_masked_fast(x, fl, 1.0, "fast") ** 2)

    def loss_ref(x, fl):
        out, _ = flow_warp_with_mask(x, fl)
        return jnp.sum(out ** 2)

    gf = jax.grad(loss_fast, argnums=(0, 1))(img, flow)
    gr = jax.grad(loss_ref, argnums=(0, 1))(img, flow)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_both_axes_sinusoid_mask_bits_shared():
    """Regression for the round-4 on-chip defect: with a flow varying
    fractionally along BOTH axes, the chaotic ``wsum >= 1.0`` mask bits
    must be IDENTICAL between the fast kernel and the slow branch.  Both
    now threshold the single XLA-computed wsum from feature_warp_prep;
    recomputing wsum in-kernel flipped ~1% of interior bits on the chip
    (invisible here in interpret mode at the old tolerances, visible as
    exact-zero disagreements)."""
    from upflow_pytorch_tpu.ops.pallas.feature_warp import (
        _feature_warp_fwd_impl)

    h, w = 96, 320
    img = RNG.randn(2, h, w, 32).astype(np.float32)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    u = 3.0 * np.sin(2 * np.pi * xx / w)
    v = 3.0 * np.cos(2 * np.pi * yy / h)
    flow = jnp.asarray(np.broadcast_to(
        np.stack([u, v], -1)[None].astype(np.float32), (2, h, w, 2)))
    _assert_fits(img, flow)
    with pltpu.force_tpu_interpret_mode():
        fast = np.asarray(_feature_warp_fwd_impl(
            jnp.asarray(img), flow, 1.0, force="fast"))
    slow = np.asarray(_feature_warp_fwd_impl(
        jnp.asarray(img), flow, 1.0, force="slow"))
    np.testing.assert_array_equal(fast == 0.0, slow == 0.0)
    np.testing.assert_allclose(fast, slow, rtol=2e-5, atol=2e-5)
