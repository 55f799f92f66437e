"""SGU blend / fused final-stage Pallas kernels vs the XLA oracle
(interpret mode on CPU; the same kernels were validated bit-exact /
within fp-tie tolerance on the TPU chip — see docstrings)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from upflow_pytorch_tpu.ops.pallas.blend import sgu_blend_pallas
from upflow_pytorch_tpu.ops.pallas.sgu_final import sgu_final_pallas
from upflow_pytorch_tpu.ops.resize import upsample2d_as, upsample2d_flow_as
from upflow_pytorch_tpu.ops.warp import (
    _abs_coords_torch_grid,
    _bilinear_zero_pad,
)

RNG = np.random.RandomState(7)


def blend_oracle(u, v, iu, iv, m):
    flow = jnp.stack([iu, iv], -1)
    px, py = _abs_coords_torch_grid(flow)
    x = jnp.stack([u, v], -1)
    wpd, _ = _bilinear_zero_pad(x, px, py)
    return (wpd[..., 0] * (1 - m) + u * m,
            wpd[..., 1] * (1 - m) + v * m)


@pytest.mark.parametrize("shape", [(2, 24, 130), (1, 17, 100)])
def test_sgu_blend_pallas_matches_oracle(shape):
    b, h, w = shape
    u = jnp.asarray(((RNG.rand(b, h, w) - .5) * 40).astype(np.float32))
    v = jnp.asarray(((RNG.rand(b, h, w) - .5) * 40).astype(np.float32))
    iu = jnp.asarray(((RNG.rand(b, h, w) - .5) * 3.8).astype(np.float32))
    iv = jnp.asarray(((RNG.rand(b, h, w) - .5) * 3.8).astype(np.float32))
    m = jnp.asarray(RNG.rand(b, h, w).astype(np.float32))
    gu, gv = sgu_blend_pallas(u, v, iu, iv, m, interpret=True)
    ou, ov = blend_oracle(u, v, iu, iv, m)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(ou), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(ov), atol=1e-5)


def final_oracle(flow_q, x_out, out_hw):
    flow_out = upsample2d_flow_as(flow_q, out_hw, if_rate=True)
    inter_flow = upsample2d_flow_as(x_out[..., :2], out_hw, if_rate=True)
    inter_mask = upsample2d_as(jax.nn.sigmoid(x_out[..., 2:3]), out_hw)
    px, py = _abs_coords_torch_grid(inter_flow)
    wpd, _ = _bilinear_zero_pad(flow_out, px, py)
    return wpd * (1 - inter_mask) + flow_out * inter_mask


@pytest.mark.parametrize("dims", [(1, 24, 80, 96, 320), (1, 12, 39, 47, 155)])
def test_sgu_final_pallas_matches_oracle(dims):
    b, hq, wq, h, w = dims
    fq = jnp.asarray(((RNG.rand(b, hq, wq, 2) - .5) * 30).astype(np.float32))
    xo = jnp.asarray(((RNG.rand(b, hq, wq, 3) - .5) * 0.9).astype(np.float32))
    got = sgu_final_pallas(fq, xo, (h, w), interpret=True)
    want = final_oracle(fq, xo, (h, w))
    # tolerance: the in-kernel coordinate roundtrip multiplies by a
    # precomputed 1/(S-1) instead of dividing (Mosaic's fp32 division is
    # approximate), so bilinear tap choices can flip at exact fp ties,
    # changing values by ~coordinate_ulp * neighbor_delta
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


@pytest.mark.parametrize("dims,iscale", [
    ((1, 24, 80, 96, 320), 4.0),    # rate-scaled inter-flows up to ~8 px
    ((1, 24, 80, 96, 320), 9.0),    # up to ~18 px (trained-ckpt regime)
    ((2, 12, 40, 48, 160), 6.0),
])
def test_sgu_final_planar_medium_matches_oracle(dims, iscale):
    """Medium tier (`_sgu_final_planar`): planar matmul upsamples + the
    windowed Pallas warp must equal the exact XLA gather composition for
    out-of-fused-window inter-flows (the trained-checkpoint regime)."""
    from jax.experimental.pallas import tpu as pltpu

    from upflow_pytorch_tpu.models.upflow import (
        _SGU_MED_RX, _SGU_MED_RY, _sgu_final_planar)

    b, hq, wq, h, w = dims
    fq = jnp.asarray(((RNG.rand(b, hq, wq, 2) - .5) * 30).astype(np.float32))
    xo = jnp.asarray(((RNG.rand(b, hq, wq, 3) - .5) * iscale
                      ).astype(np.float32))
    # sanity: the construction is inside the medium window, outside fused
    assert float(jnp.max(jnp.abs(xo[..., 0])) * (w / wq)) < _SGU_MED_RX - 1
    assert float(jnp.max(jnp.abs(xo[..., 1])) * (h / hq)) < _SGU_MED_RY - 1
    assert float(jnp.max(jnp.abs(xo[..., :2]))) * 4 > 2.0
    with pltpu.force_tpu_interpret_mode():
        got = _sgu_final_planar((h, w), (fq, xo))
    want = final_oracle(fq, xo, (h, w))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_sgu_final_op_impl_tier_dispatch():
    """The 3-tier cond must route by the rate-scaled inter-flow extrema
    and every tier must agree with the oracle (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    from upflow_pytorch_tpu.models.upflow import _sgu_final_op_impl

    b, hq, wq, h, w = 1, 16, 40, 64, 160
    fq = jnp.asarray(((RNG.rand(b, hq, wq, 2) - .5) * 20).astype(np.float32))
    for iscale in (0.4, 8.0, 300.0):   # fused / medium / xla tiers
        xo = jnp.asarray(((RNG.rand(b, hq, wq, 3) - .5) * iscale
                          ).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            got = _sgu_final_op_impl((h, w), fq, xo)
        want = final_oracle(fq, xo, (h, w))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-3)


@pytest.mark.parametrize("iscale", [8.0, 30.0, 500.0])  # med / med / slow
def test_sgu_blend_tpu_impl_tiers_match_oracle(iscale):
    """`_sgu_blend_tpu_impl`'s medium tier (windowed Pallas warp on
    planar blends) and slow tier must both equal the gather oracle."""
    from jax.experimental.pallas import tpu as pltpu

    from upflow_pytorch_tpu.ops.warp import _sgu_blend_tpu_impl

    b, h, w = 2, 24, 130
    u = jnp.asarray(((RNG.rand(b, h, w) - .5) * 40).astype(np.float32))
    v = jnp.asarray(((RNG.rand(b, h, w) - .5) * 40).astype(np.float32))
    iu = jnp.asarray(((RNG.rand(b, h, w) - .5) * iscale).astype(np.float32))
    iv = jnp.asarray(((RNG.rand(b, h, w) - .5) * iscale / 4
                      ).astype(np.float32))
    m = jnp.asarray(RNG.rand(b, h, w).astype(np.float32))
    flow_init = jnp.stack([u, v], -1)
    inter = jnp.stack([iu, iv], -1)
    with pltpu.force_tpu_interpret_mode():
        got = _sgu_blend_tpu_impl(flow_init, inter, m[..., None])
    ou, ov = blend_oracle(u, v, iu, iv, m)
    want = np.stack([np.asarray(ou), np.asarray(ov)], -1)
    # tolerance: the windowed kernel folds the torch-grid roundtrip into
    # an effective flow and recomputes coords tile-relative (fp32
    # coordinate-ulp tap-weight noise); cond-branch FMA contraction adds
    # ~1 ulp of the flow magnitude — both far below bf16 model noise
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4)
