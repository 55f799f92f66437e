"""Correlation op vs a direct numpy oracle and the torch-unfold algorithm."""

import numpy as np
import torch
import torch.nn.functional as F

from upflow_pytorch_tpu.ops import correlation

RNG = np.random.RandomState(2)


def numpy_corr_oracle(f1, f2, d=4):
    """Direct definition: out[b,h,w,(dy+d)*(2d+1)+(dx+d)] =
    mean_c f1[b,h,w,c] * f2[b,h+dy,w+dx,c], zero outside f2."""
    b, h, w, c = f1.shape
    k = 2 * d + 1
    f2p = np.pad(f2, ((0, 0), (d, d), (d, d), (0, 0)))
    out = np.zeros((b, h, w, k * k), np.float32)
    for dy in range(-d, d + 1):
        for dx in range(-d, d + 1):
            shifted = f2p[:, dy + d: dy + d + h, dx + d: dx + d + w, :]
            out[..., (dy + d) * k + (dx + d)] = (f1 * shifted).mean(-1)
    return out


def torch_unfold_corr(in1, in2, d=4):
    """The reference fallback algorithm (pytorch_correlation.py:27-50)
    re-derived independently with double unfold, as a channel-ordering
    cross-check."""
    bz, cn, hei, wid = in1.shape
    f1 = F.unfold(in1, kernel_size=1, padding=0, stride=1)
    f2 = F.unfold(in2, kernel_size=1, padding=0, stride=1)
    ksz = f2.shape[1]
    f2_ = f2.reshape(bz * ksz, hei, wid).unsqueeze(1)
    f2 = F.unfold(f2_, kernel_size=(hei, wid), padding=d, stride=1)
    _, kernel_number, window_number = f2.shape
    f2_ = f2.reshape(bz, ksz, kernel_number, window_number)
    f2_2 = f2_.transpose(1, 3).transpose(2, 3)
    f1_2 = f1.unsqueeze(1)
    res = (f2_2 * f1_2).mean(dim=2)
    return res.reshape(bz, window_number, hei, wid)


def test_correlation_matches_numpy_oracle():
    f1 = RNG.randn(2, 10, 12, 16).astype(np.float32)
    f2 = RNG.randn(2, 10, 12, 16).astype(np.float32)
    ref = numpy_corr_oracle(f1, f2)
    ours = np.asarray(correlation(f1, f2, max_displacement=4))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_correlation_channel_order_matches_torch_unfold():
    f1 = RNG.randn(1, 9, 11, 8).astype(np.float32)
    f2 = RNG.randn(1, 9, 11, 8).astype(np.float32)
    ref = torch_unfold_corr(torch.from_numpy(np.transpose(f1, (0, 3, 1, 2))),
                            torch.from_numpy(np.transpose(f2, (0, 3, 1, 2))))
    ours = np.asarray(correlation(f1, f2, max_displacement=4))
    np.testing.assert_allclose(ours, np.transpose(ref.numpy(), (0, 2, 3, 1)),
                               rtol=1e-4, atol=1e-5)


def test_correlation_self_peak_at_center():
    # correlating a feature map with itself should peak at zero displacement
    f = RNG.randn(1, 8, 8, 32).astype(np.float32)
    out = np.asarray(correlation(f, f))
    center = out[..., 40]  # (0,0) displacement index = 4*9+4
    assert (center >= out.max(-1) - 1e-5).all()
