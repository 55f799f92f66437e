"""Census loss.

Mirrors ``loss_functions.census_loss_torch`` and ``photo_loss_function``
(/root/reference/utils/loss.py:17-91).  NHWC layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from upflow_pytorch_tpu.ops.census import (
    census_border_mask,
    census_hamming_distance,
    ternary_transform,
)


def photo_loss_function(diff: jax.Array, mask: jax.Array, q: float,
                        charbonnier_or_abs_robust: bool, if_use_occ: bool,
                        average: bool = True) -> jax.Array:
    """loss.py:17-48 (note the reference's asymmetric eps/denominators)."""
    if charbonnier_or_abs_robust:
        if if_use_occ:
            p = (diff ** 2 + 1e-6) ** q * mask
            if average:
                return jnp.mean(p) / (jnp.mean(mask) * 2 + 1e-6)
            return jnp.sum(p) / (jnp.sum(mask) * 2 + 1e-6)
        p = (diff ** 2 + 1e-8) ** q
        return jnp.mean(p) if average else jnp.sum(p)
    if if_use_occ:
        d = (jnp.abs(diff) + 0.01) ** q * mask
        return jnp.sum(d) / (jnp.sum(mask) * 2 + 1e-6)
    d = (jnp.abs(diff) + 0.01) ** q
    return jnp.mean(d) if average else jnp.sum(d)


def census_loss(img1: jax.Array, img1_warp: jax.Array, mask: jax.Array,
                q: float = 0.4, charbonnier_or_abs_robust: bool = False,
                if_use_occ: bool = False, average: bool = True,
                max_distance: int = 3) -> jax.Array:
    """Scalar census loss between an image and its warped counterpart."""
    t1 = ternary_transform(img1, max_distance)
    t2 = ternary_transform(img1_warp, max_distance)
    dist = census_hamming_distance(t1, t2)
    transform_mask = census_border_mask(mask.shape, max_distance, mask.dtype)
    return photo_loss_function(dist, mask * transform_mask, q,
                               charbonnier_or_abs_robust, if_use_occ, average)
