"""Census (ternary) transform ops used by the census loss.

Mirrors the internals of ``loss_functions.census_loss_torch``
(/root/reference/utils/loss.py:51-91):

- grayscale = 0.2989 R + 0.5870 G + 0.1140 B
- 7x7 (max_distance=3) neighborhood values minus the center intensity,
  soft-normalized: t / sqrt(0.81 + t^2)
- soft Hamming distance: sum_k d_k^2 / (0.1 + d_k^2)

The reference extracts the 7x7 patches with an identity-eye conv; on TPU a
49-tap conv with one-hot kernels wastes MXU work, so we extract patches with
static shifted slices of the zero-padded intensity image (pure VPU, fused by
XLA).  The math is identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ternary_transform(image: jax.Array, max_distance: int = 3) -> jax.Array:
    """NHWC RGB image -> (B, H, W, patch_size**2) soft census transform."""
    b, h, w, c = image.shape
    assert c == 3
    r, g, bl = image[..., 0], image[..., 1], image[..., 2]
    intensities = (0.2989 * r + 0.5870 * g + 0.1140 * bl)[..., None]  # B,H,W,1
    d = max_distance
    pad = jnp.pad(intensities, ((0, 0), (d, d), (d, d), (0, 0)))
    patches = []
    for dy in range(-d, d + 1):
        for dx in range(-d, d + 1):
            patches.append(
                jax.lax.dynamic_slice(pad, (0, dy + d, dx + d, 0), (b, h, w, 1)))
    patches = jnp.concatenate(patches, axis=-1)  # (B, H, W, 49)
    transf = patches - intensities
    return transf / jnp.sqrt(0.81 + transf ** 2)


def census_hamming_distance(t1: jax.Array, t2: jax.Array) -> jax.Array:
    """Soft Hamming distance between two census transforms -> (B, H, W, 1)."""
    dist = (t1 - t2) ** 2
    return jnp.sum(dist / (0.1 + dist), axis=-1, keepdims=True)


def census_border_mask(shape_bhwc, max_distance: int = 3,
                       dtype=jnp.float32) -> jax.Array:
    """Ones with a ``max_distance`` zero border (loss.py:74-82), (1,H,W,1)."""
    _, h, w, _ = shape_bhwc
    d = max_distance
    inner = jnp.ones((1, h - 2 * d, w - 2 * d, 1), dtype=dtype)
    return jnp.pad(inner, ((0, 0), (d, d), (d, d), (0, 0)))
