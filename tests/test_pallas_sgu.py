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
