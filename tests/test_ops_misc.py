"""normalize_features and census ops vs torch-math oracles."""

import numpy as np
import torch

from upflow_pytorch_tpu.ops import (
    normalize_features,
    ternary_transform,
    census_hamming_distance,
)
from upflow_pytorch_tpu.ops.census import census_border_mask

RNG = np.random.RandomState(3)


def torch_normalize_oracle(feats_nchw, normalize, center, across_ch, across_im):
    """Re-derivation of network_tools.normalize_features (upflow.py:94-137)."""
    feats = [torch.from_numpy(f) for f in feats_nchw]
    axes = [1, 2, 3] if across_ch else [2, 3]
    means = [f.mean(dim=axes, keepdim=True) for f in feats]
    variances = [f.var(dim=axes, keepdim=True) for f in feats]
    if across_im:
        means = [torch.mean(torch.stack(means, dim=0), dim=(0,))] * len(feats)
        variances = [torch.var(torch.stack(variances, dim=0), dim=(0,))] * len(feats)
    stds = [torch.sqrt(v + 1e-16) for v in variances]
    if center:
        feats = [f - m for f, m in zip(feats, means)]
    if normalize:
        feats = [f / s for f, s in zip(feats, stds)]
    return [f.numpy() for f in feats]


def _nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def _nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def test_normalize_features_matches_reference_math():
    f1 = RNG.randn(2, 6, 7, 5).astype(np.float32)
    f2 = RNG.randn(2, 6, 7, 5).astype(np.float32)
    for across_ch in (False, True):
        for across_im in (False, True):
            ref = torch_normalize_oracle([_nchw(f1), _nchw(f2)], True, True,
                                         across_ch, across_im)
            ours = normalize_features((f1, f2), True, True, across_ch, across_im)
            for o, r in zip(ours, ref):
                np.testing.assert_allclose(np.asarray(o), _nhwc(r),
                                           rtol=2e-4, atol=2e-5)


def torch_ternary_oracle(image_nchw, max_distance=3):
    """Re-derivation of _ternary_transform_torch (loss.py:54-67)."""
    image = torch.from_numpy(image_nchw)
    patch_size = 2 * max_distance + 1
    r, g, b = torch.split(image, 1, 1)
    intensities = 0.2989 * r + 0.5870 * g + 0.1140 * b
    out_channels = patch_size * patch_size
    w = np.eye(out_channels).reshape((patch_size, patch_size, 1, out_channels))
    weight = torch.from_numpy(np.transpose(w, (3, 2, 0, 1))).float()
    patches = torch.conv2d(intensities, weight, bias=None, stride=1,
                           padding=max_distance)
    transf = patches - intensities
    return (transf / torch.sqrt(0.81 + transf ** 2)).numpy()


def test_ternary_transform_matches_torch():
    img = RNG.rand(2, 9, 11, 3).astype(np.float32)
    ref = torch_ternary_oracle(_nchw(img))
    ours = np.asarray(ternary_transform(img))
    np.testing.assert_allclose(ours, _nhwc(ref), rtol=1e-5, atol=1e-5)


def test_census_hamming_and_mask():
    t1 = RNG.randn(1, 6, 6, 49).astype(np.float32)
    t2 = RNG.randn(1, 6, 6, 49).astype(np.float32)
    d = (t1 - t2) ** 2
    ref = np.sum(d / (0.1 + d), axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(census_hamming_distance(t1, t2)),
                               ref, rtol=1e-5, atol=1e-5)
    mask = np.asarray(census_border_mask((1, 10, 12, 1)))
    assert mask.shape == (1, 10, 12, 1)
    assert mask[0, :3].sum() == 0 and mask[0, 3, 3, 0] == 1
    assert mask.sum() == (10 - 6) * (12 - 6)
