"""Resize ops vs torch F.interpolate oracles (align_corners=True / area)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from upflow_pytorch_tpu.ops import (
    resize_bilinear_align_corners,
    upsample2d_flow_as,
    downsample_area,
)

RNG = np.random.RandomState(0)


def to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


@pytest.mark.parametrize("in_hw,out_hw", [
    ((6, 7), (12, 14)),
    ((5, 9), (10, 18)),
    ((12, 14), (6, 7)),       # downscale
    ((6, 13), (375, 1242)),   # ragged KITTI-like upscale
    ((4, 4), (4, 4)),         # identity
    ((3, 3), (1, 5)),         # degenerate out_h == 1
])
def test_bilinear_align_corners_matches_torch(in_hw, out_hw):
    x = RNG.randn(2, *in_hw, 3).astype(np.float32)
    ours = np.asarray(resize_bilinear_align_corners(x, out_hw))
    theirs = F.interpolate(torch.from_numpy(to_nchw(x)), out_hw,
                           mode="bilinear", align_corners=True).numpy()
    np.testing.assert_allclose(ours, to_nhwc(theirs), rtol=1e-5, atol=1e-5)


def test_flow_upsample_rate_scaling():
    x = RNG.randn(1, 8, 16, 2).astype(np.float32)
    out = np.asarray(upsample2d_flow_as(x, (16, 32), if_rate=True))
    # torch reference computation (upsample then scale u by w/w_, v by h/h_)
    t = F.interpolate(torch.from_numpy(to_nchw(x)), (16, 32),
                      mode="bilinear", align_corners=True)
    u, v = t.chunk(2, dim=1)
    t = torch.cat([u * (32 / 16), v * (16 / 8)], dim=1).numpy()
    np.testing.assert_allclose(out, to_nhwc(t), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((16, 32), (4, 8)),
    ((15, 33), (4, 8)),   # non-divisible (adaptive pooling path)
])
def test_area_downsample_matches_torch(in_hw, out_hw):
    x = RNG.randn(2, *in_hw, 3).astype(np.float32)
    ours = np.asarray(downsample_area(x, out_hw))
    theirs = F.interpolate(torch.from_numpy(to_nchw(x)), out_hw,
                           mode="area").numpy()
    np.testing.assert_allclose(ours, to_nhwc(theirs), rtol=1e-5, atol=1e-5)
