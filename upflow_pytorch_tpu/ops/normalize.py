"""Feature normalization before the cost volume.

Mirrors ``network_tools.normalize_features``
(/root/reference/model/upflow.py:94-137) including its quirks:

- variances are UNBIASED (torch.var default, ddof=1);
- with ``moments_across_images`` the cross-image statistics are the MEAN of
  the per-image means but the (unbiased) VARIANCE OF the per-image variances
  (upflow.py:123-124) — faithfully reproduced;
- std = sqrt(var + 1e-16).

Axes are NHWC here: per-image moments reduce over (H, W) and optionally C.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _var_unbiased(x: jax.Array, axis, keepdims=True) -> jax.Array:
    n = 1
    shape = x.shape
    for a in (axis if isinstance(axis, (tuple, list)) else (axis,)):
        n *= shape[a]
    mean = jnp.mean(x, axis=axis, keepdims=True)
    sq = jnp.sum((x - mean) ** 2, axis=axis, keepdims=keepdims)
    return sq / max(n - 1, 1)


def normalize_features(
    feature_list: Sequence[jax.Array],
    normalize: bool = True,
    center: bool = True,
    moments_across_channels: bool = True,
    moments_across_images: bool = True,
) -> Tuple[jax.Array, ...]:
    """Normalize a list of NHWC feature maps (typically the (f1, f2) pair)."""
    axes = (1, 2, 3) if moments_across_channels else (1, 2)
    means = [jnp.mean(f.astype(jnp.float32), axis=axes, keepdims=True)
             for f in feature_list]
    variances = [_var_unbiased(f.astype(jnp.float32), axis=axes)
                 for f in feature_list]

    if moments_across_images:
        stacked_mean = jnp.stack(means, axis=0)
        stacked_var = jnp.stack(variances, axis=0)
        mean_all = jnp.mean(stacked_mean, axis=0)
        # reference uses torch.var over the stacked per-image variances
        var_all = _var_unbiased(stacked_var, axis=0, keepdims=False)
        means = [mean_all] * len(feature_list)
        variances = [var_all] * len(feature_list)

    stds = [jnp.sqrt(v + 1e-16) for v in variances]

    out = list(feature_list)
    if center:
        out = [f - m for f, m in zip(out, means)]
    if normalize:
        out = [f / s for f, s in zip(out, stds)]
    return tuple(o.astype(f.dtype) for o, f in zip(out, feature_list))
