"""Photometric losses.

Mirrors ``network_tools.photo_loss_multi_type`` (/root/reference/model/upflow.py:265-288)
and ``network_tools.weighted_ssim`` (upflow.py:139-195).  NHWC layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _avg_pool3x3_valid(x: jax.Array) -> jax.Array:
    """3x3 stride-1 VALID average pool, NHWC."""
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add,
                              (1, 3, 3, 1), (1, 1, 1, 1), "VALID")
    return s / 9.0


def weighted_ssim(x: jax.Array, y: jax.Array, weight: jax.Array,
                  c1: float = float("inf"), c2: float = 9e-6,
                  weight_epsilon: float = 0.01):
    """UFlow-derived weighted SSIM (upflow.py:139-195).

    x, y: (B, H, W, C); weight: (B, H, W, 1) in [0, 1].
    Returns (loss_map (B,H-2,W-2,C), avg_pooled_weight (B,H-2,W-2,1)).
    """
    if c1 == float("inf") and c2 == float("inf"):
        raise ValueError("Both c1 and c2 are infinite, SSIM loss is zero.")
    average_pooled_weight = _avg_pool3x3_valid(weight)
    weight_plus_epsilon = weight + weight_epsilon
    inverse_average_pooled_weight = 1.0 / (average_pooled_weight + weight_epsilon)

    def weighted_avg_pool3x3(z):
        return _avg_pool3x3_valid(z * weight_plus_epsilon) * inverse_average_pooled_weight

    mu_x = weighted_avg_pool3x3(x)
    mu_y = weighted_avg_pool3x3(y)
    sigma_x = weighted_avg_pool3x3(x ** 2) - mu_x ** 2
    sigma_y = weighted_avg_pool3x3(y ** 2) - mu_y ** 2
    sigma_xy = weighted_avg_pool3x3(x * y) - mu_x * mu_y
    if c1 == float("inf"):
        ssim_n = 2 * sigma_xy + c2
        ssim_d = sigma_x + sigma_y + c2
    elif c2 == float("inf"):
        ssim_n = 2 * mu_x * mu_y + c1
        ssim_d = mu_x ** 2 + mu_y ** 2 + c1
    else:
        ssim_n = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
        ssim_d = (mu_x ** 2 + mu_y ** 2 + c1) * (sigma_x + sigma_y + c2)
    result = ssim_n / ssim_d
    return jnp.clip((1 - result) / 2, 0.0, 1.0), average_pooled_weight


def photo_loss_multi_type(x: jax.Array, y: jax.Array, occ_mask: jax.Array,
                          photo_loss_type: str = "abs_robust",
                          photo_loss_delta: float = 0.4,
                          photo_loss_use_occ: bool = False) -> jax.Array:
    """Scalar photometric loss (upflow.py:265-288)."""
    occ_weight = occ_mask
    if photo_loss_type == "abs_robust":
        loss_diff = (jnp.abs(x - y) + 0.01) ** photo_loss_delta
    elif photo_loss_type == "charbonnier":
        loss_diff = ((x - y) ** 2 + 1e-6) ** photo_loss_delta
    elif photo_loss_type == "L1":
        loss_diff = jnp.abs(x - y + 1e-6)
    elif photo_loss_type == "SSIM":
        loss_diff, occ_weight = weighted_ssim(x, y, occ_mask)
    else:
        raise ValueError("wrong photo_loss type: %s" % photo_loss_type)

    if photo_loss_use_occ:
        return jnp.sum(loss_diff * occ_weight) / (jnp.sum(occ_weight) + 1e-6)
    return jnp.mean(loss_diff)
