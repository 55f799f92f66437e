"""Pallas warp kernel vs the XLA oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from upflow_pytorch_tpu.ops.warp import flow_warp, flow_warp_with_mask
from upflow_pytorch_tpu.ops.pallas.warp import (
    flow_warp_fast,
    flow_warp_pallas_window,
)

RNG = np.random.RandomState(13)


@pytest.mark.parametrize("shape,flow_scale", [
    ((1, 16, 128, 2), 6.0),
    ((2, 16, 256, 3), 15.0),
    ((1, 24, 130, 2), 10.0),   # non-128-multiple width (padding path)
    ((1, 18, 128, 1), 3.0),    # non-8-multiple height
])
def test_pallas_window_warp_matches_oracle(shape, flow_scale):
    img = RNG.randn(*shape).astype(np.float32)
    flow = (RNG.rand(shape[0], shape[1], shape[2], 2).astype(np.float32)
            - 0.5) * flow_scale
    ref = np.asarray(flow_warp(img, flow))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(flow_warp_pallas_window(img, flow))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_pallas_window_warp_image_boundary_zeros():
    """Flow pushing samples off the image must produce zeros (zero-pad)."""
    img = np.ones((1, 16, 128, 2), np.float32)
    flow = np.zeros((1, 16, 128, 2), np.float32)
    flow[0, :, :, 1] = -10.0  # sample 10 rows above the image
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(flow_warp_pallas_window(img, flow))
    assert out[0, :9].max() == 0.0  # rows sampling fully outside
    ref = np.asarray(flow_warp(img, flow))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_flow_warp_fast_cond_fallback_for_large_flows():
    img = RNG.randn(1, 16, 128, 2).astype(np.float32)
    flow = np.full((1, 16, 128, 2), 200.0, np.float32)  # out of window
    with pltpu.force_tpu_interpret_mode():
        out, wsum = flow_warp_fast(img, flow)
    ref = np.asarray(flow_warp(img, flow))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def test_flow_warp_fast_wsum_matches_mask_semantics():
    img = RNG.randn(1, 16, 128, 4).astype(np.float32)
    flow = (RNG.rand(1, 16, 128, 2).astype(np.float32) - 0.5) * 12
    with pltpu.force_tpu_interpret_mode():
        out, wsum = flow_warp_fast(img, flow)
    ref_out, ref_mask = flow_warp_with_mask(img, flow)
    mask = (np.asarray(wsum) >= 1.0).astype(np.float32)
    np.testing.assert_allclose(mask, np.asarray(ref_mask), atol=0)
    np.testing.assert_allclose(np.asarray(out) * mask[..., None],
                               np.asarray(ref_out), rtol=1e-5, atol=1e-5)


# --- shift-window small-flow warp (ops/warp.py::_shift_window_warp) -------

@pytest.mark.parametrize("c", [2, 3])
@pytest.mark.parametrize("flow_scale", [0.05, 1.9])
def test_shift_window_warp_matches_gather(c, flow_scale):
    """The no-gather shift warp is exact vs the gather path for flows
    within its window (it replaces the gather on TPU for the SGU blend
    warps; this pins the math on CPU)."""
    from upflow_pytorch_tpu.ops.warp import (
        _abs_coords_torch_grid,
        _bilinear_zero_pad,
        _shift_window_warp,
        _small_flow_pred,
    )

    rng = np.random.RandomState(0)
    x = rng.rand(2, 24, 40, c).astype(np.float32)
    flow = ((rng.rand(2, 24, 40, 2) - 0.5) * 2 * flow_scale).astype(np.float32)
    assert bool(_small_flow_pred(jnp.asarray(flow)))
    px, py = _abs_coords_torch_grid(jnp.asarray(flow))
    ref, _ = _bilinear_zero_pad(jnp.asarray(x), px, py)
    out = _shift_window_warp(jnp.asarray(x), px, py)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-6)


def test_shift_window_warp_boundary_zeros():
    """Out-of-image taps contribute zero (padding_mode='zeros')."""
    from upflow_pytorch_tpu.ops.warp import (
        _abs_coords_torch_grid,
        _shift_window_warp,
    )

    x = np.ones((1, 8, 8, 1), np.float32)
    flow = np.full((1, 8, 8, 2), -1.5, np.float32)  # sample above/left edge
    px, py = _abs_coords_torch_grid(jnp.asarray(flow))
    out = np.asarray(_shift_window_warp(jnp.asarray(x), px, py))[0, :, :, 0]
    # first row/col sample at (-1.5): fully outside -> 0; second partially
    assert out[0, 0] == 0.0
    np.testing.assert_allclose(out[3:, 3:], 1.0, atol=1e-6)


def test_warp_auto_large_branch_single_roundtrip():
    """_warp_auto's large-flow branch vs the XLA oracle: the torch-grid
    roundtrip is applied ONCE (inside flow_warp_fast; double application
    was ADVICE round 2).  Remaining tolerance covers only the kernel's
    documented tile-relative coordinate fold-back (~1 ulp of the
    coordinate -> ~1e-6 of the output; ops/pallas/warp.py:183), with no
    tap flips at near-integer tie coordinates."""
    from upflow_pytorch_tpu.ops.warp import (
        _abs_coords_torch_grid,
        _bilinear_zero_pad,
        _warp_auto,
    )

    rng = np.random.RandomState(3)
    x = rng.rand(1, 16, 128, 2).astype(np.float32)
    # large flows (outside the shift-warp window) with near-integer
    # values, where a double roundtrip flips taps
    flow = (rng.randint(-8, 8, (1, 16, 128, 2))
            + rng.choice([0.0, 1e-7, -1e-7], (1, 16, 128, 2))
            ).astype(np.float32)
    flow[0, 0, 0] = (7.0, 7.0)  # defeat the small-flow predicate
    px, py = _abs_coords_torch_grid(jnp.asarray(flow))
    ref, _ = _bilinear_zero_pad(jnp.asarray(x), px, py)
    with pltpu.force_tpu_interpret_mode():
        out = _warp_auto(jnp.asarray(x), jnp.asarray(flow))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_small_flow_pred_bounds():
    from upflow_pytorch_tpu.ops.warp import _SMALL_WINDOW_R, _small_flow_pred

    ok = np.zeros((1, 4, 4, 2), np.float32) + (_SMALL_WINDOW_R - 1)
    too_big = np.zeros((1, 4, 4, 2), np.float32) + _SMALL_WINDOW_R
    assert bool(_small_flow_pred(jnp.asarray(ok)))
    assert not bool(_small_flow_pred(jnp.asarray(too_big)))
