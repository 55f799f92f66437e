"""Many-channel feature-warp kernel vs the XLA oracle (interpret mode)."""

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


@pytest.mark.parametrize("shape,flow_scale", [
    ((2, 32, 128, 32), 5.0),
    ((1, 96, 320, 32), 20.0),   # level-4 bench shape
    ((1, 48, 160, 64), 10.0),   # level-3 (W pads 160->256)
    ((1, 40, 136, 16), 3.0),    # ragged H and W
])
def test_matches_oracle_smooth_flow(shape, flow_scale):
    b, h, w, c = shape
    img = RNG.randn(*shape).astype(np.float32)
    # smooth flow: coarse random field upsampled (the real regime: flows
    # are 2x-upsampled from a coarser pyramid level)
    coarse = (RNG.rand(b, 6, 10, 2).astype(np.float32) - 0.5) * flow_scale
    flow = jax.image.resize(jnp.asarray(coarse), (b, h, w, 2), "linear")
    ref = _oracle(img, np.asarray(flow))
    with pltpu.force_tpu_interpret_mode():
        out = feature_warp_masked_fast(jnp.asarray(img), flow, 1.0)
    # association of the 4-tap sum differs (per-row accumulation);
    # everything else, including the mask, is bit-identical
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_fast_path_predicate_and_fallback():
    """A flow discontinuity wider than the window forces fits=False and
    the exact-XLA branch; a smooth flow takes the kernel."""
    img = RNG.randn(1, 32, 128, 32).astype(np.float32)
    smooth = np.full((1, 32, 128, 2), 3.25, np.float32)
    _, _, _, _, _, fits, _ = feature_warp_prep(
        jnp.asarray(img), jnp.asarray(smooth))
    assert bool(fits)
    jumpy = smooth.copy()
    jumpy[0, :, 64:, 1] = 60.0  # 57-row span inside single tiles
    _, _, _, _, _, fits2, _ = feature_warp_prep(
        jnp.asarray(img), jnp.asarray(jumpy))
    assert not bool(fits2)
    with pltpu.force_tpu_interpret_mode():
        out = feature_warp_masked_fast(jnp.asarray(img), jnp.asarray(jumpy),
                                       1.0)
    np.testing.assert_allclose(np.asarray(out), _oracle(img, jumpy),
                               rtol=0, atol=1e-6)


def test_mask_bit_identical_near_boundary():
    """The >=1.0 validity mask (analytic warped-ones) must make identical
    decisions to the XLA oracle, including out-of-image zeroing."""
    img = np.ones((1, 32, 128, 8), np.float32)
    flow = np.zeros((1, 32, 128, 2), np.float32)
    flow[0, :, :, 0] = -2.5   # push left columns out of image
    flow[0, :16, :, 1] = 1.75
    ref = _oracle(img, flow)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(feature_warp_masked_fast(
            jnp.asarray(img), jnp.asarray(flow), 1.0))
    # masked-to-zero pixels must agree EXACTLY
    np.testing.assert_array_equal(out == 0.0, ref == 0.0)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_zero_flow_is_identity_with_interior_mask():
    img = RNG.randn(1, 32, 128, 32).astype(np.float32)
    flow = np.zeros((1, 32, 128, 2), np.float32)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(feature_warp_masked_fast(
            jnp.asarray(img), jnp.asarray(flow), 1.0))
    np.testing.assert_allclose(out, _oracle(img, flow), rtol=0, atol=1e-6)


def test_gradients_match_xla_path():
    """The custom VJP routes through the XLA formulation: grads of the
    fast op equal grads of the oracle for in-window flows."""
    img = RNG.randn(1, 32, 128, 8).astype(np.float32)
    coarse = (RNG.rand(1, 4, 8, 2).astype(np.float32) - 0.5) * 4
    flow = jax.image.resize(jnp.asarray(coarse), (1, 32, 128, 2), "linear")

    def loss_fast(img, flow):
        with pltpu.force_tpu_interpret_mode():
            out = feature_warp_masked_fast(img, flow, 1.0)
        return jnp.sum(out * out)

    def loss_ref(img, flow):
        out, _ = flow_warp_with_mask(img, flow)
        return jnp.sum(out * out)

    g_fast = jax.grad(loss_fast, argnums=(0, 1))(jnp.asarray(img), flow)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(jnp.asarray(img), flow)
    for a, b in zip(g_fast, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
