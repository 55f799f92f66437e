"""Warp ops vs torch grid_sample oracles.

The reference pins torch 1.1 whose grid_sample used align_corners=True
semantics; modern torch exposes that via the explicit flag.
"""

import numpy as np
import torch
import torch.nn.functional as F

from upflow_pytorch_tpu.ops import (
    flow_warp,
    flow_warp_with_mask,
    boundary_dilated_warp,
)

RNG = np.random.RandomState(1)


def torch_warp_oracle(x_nchw, flow_nchw):
    """tools.torch_warp math re-expressed with modern torch."""
    x = torch.from_numpy(x_nchw)
    flo = torch.from_numpy(flow_nchw)
    B, C, H, W = x.shape
    xx = torch.arange(0, W).view(1, -1).repeat(H, 1)
    yy = torch.arange(0, H).view(-1, 1).repeat(1, W)
    grid = torch.cat([xx.view(1, 1, H, W).repeat(B, 1, 1, 1),
                      yy.view(1, 1, H, W).repeat(B, 1, 1, 1)], 1).float()
    vgrid = grid + flo
    vgrid = torch.stack([2.0 * vgrid[:, 0] / max(W - 1, 1) - 1.0,
                         2.0 * vgrid[:, 1] / max(H - 1, 1) - 1.0], dim=1)
    vgrid = vgrid.permute(0, 2, 3, 1)
    out = F.grid_sample(x, vgrid, padding_mode="zeros", align_corners=True)
    ones = torch.ones_like(x)
    mask = F.grid_sample(ones, vgrid, padding_mode="zeros", align_corners=True)
    mask = (mask >= 1.0).float()
    return out.numpy(), mask.numpy()


def test_flow_warp_matches_grid_sample():
    x = RNG.randn(2, 3, 13, 17).astype(np.float32)
    flow = (RNG.randn(2, 2, 13, 17) * 3).astype(np.float32)
    ref, _ = torch_warp_oracle(x, flow)
    ours = np.asarray(flow_warp(np.transpose(x, (0, 2, 3, 1)),
                                np.transpose(flow, (0, 2, 3, 1))))
    np.testing.assert_allclose(ours, np.transpose(ref, (0, 2, 3, 1)),
                               rtol=1e-5, atol=1e-5)


def test_flow_warp_masked_matches_grid_sample():
    x = RNG.randn(1, 4, 11, 9).astype(np.float32)
    flow = (RNG.randn(1, 2, 11, 9) * 4).astype(np.float32)
    ref, mask = torch_warp_oracle(x, flow)
    ref = ref * mask
    ours, ours_mask = flow_warp_with_mask(np.transpose(x, (0, 2, 3, 1)),
                                          np.transpose(flow, (0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours),
                               np.transpose(ref, (0, 2, 3, 1)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours_mask), mask[:, 0], atol=0)


def test_flow_warp_zero_flow_is_identity():
    x = RNG.randn(1, 6, 8, 5).astype(np.float32)
    out = np.asarray(flow_warp(x, np.zeros((1, 6, 8, 2), np.float32)))
    np.testing.assert_allclose(out, x, rtol=1e-6, atol=1e-6)


def boundary_warp_oracle(img_full, flow, start):
    """Re-derivation of tools.boundary_dilated_warp._interpolate math in
    numpy: corner indices floored then clamped; weights computed from the
    CLAMPED corner coordinates (tools.py:403-469)."""
    B, Hf, Wf, C = img_full.shape
    _, h, w, _ = flow.shape
    out = np.zeros((B, h, w, C), np.float32)
    for b in range(B):
        for i in range(h):
            for j in range(w):
                x = j + flow[b, i, j, 0] + start[b, 0]
                y = i + flow[b, i, j, 1] + start[b, 1]
                x0 = min(max(int(np.floor(x)), 0), Wf - 1)
                x1 = min(max(int(np.floor(x)) + 1, 0), Wf - 1)
                y0 = min(max(int(np.floor(y)), 0), Hf - 1)
                y1 = min(max(int(np.floor(y)) + 1, 0), Hf - 1)
                wa = (x1 - x) * (y1 - y)
                wb = (x1 - x) * (y - y0)
                wc = (x - x0) * (y1 - y)
                wd = (x - x0) * (y - y0)
                out[b, i, j] = (wa * img_full[b, y0, x0] + wb * img_full[b, y1, x0]
                                + wc * img_full[b, y0, x1] + wd * img_full[b, y1, x1])
    return out


def test_boundary_dilated_warp_matches_reference_math():
    img = RNG.randn(2, 20, 24, 3).astype(np.float32)
    flow = (RNG.randn(2, 8, 10, 2) * 5).astype(np.float32)  # crosses borders
    start = np.array([[4.0, 6.0], [0.0, 0.0]], np.float32)
    ref = boundary_warp_oracle(img, flow, start)
    ours = np.asarray(boundary_dilated_warp(img, flow, start))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
