"""Bilinear resize with ``align_corners=True`` semantics, TPU-first.

The reference model resizes with torch ``F.interpolate(...,
align_corners=True)`` at every pyramid level (`upsample2d_as` /
`upsample2d_flow_as` / `upsample_flow`, /root/reference/model/pwc_modules.py:72-104).
``jax.image.resize`` implements half-pixel (align_corners=False) sampling, so
we roll our own.

TPU design: instead of per-pixel gathers, the separable interpolation is
expressed as two dense matmuls against precomputed (out, in) interpolation
matrices.  The matrices are built at trace time from static shapes, constant-
folded by XLA, and the contraction runs on the MXU — this is both exact and
fast, and it is trivially differentiable (the VJP is the transposed matmul).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _interp_matrix_np(out_size: int, in_size: int) -> np.ndarray:
    """(out_size, in_size) align_corners=True bilinear interpolation matrix."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    if out_size == 1:
        # align_corners=True with a single output sample reads index 0
        m[0, 0] = 1.0
        return m
    scale = (in_size - 1) / (out_size - 1)
    src = np.arange(out_size, dtype=np.float64) * scale
    i0 = np.floor(src).astype(np.int64)
    i0 = np.clip(i0, 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = (src - i0).astype(np.float32)
    w0 = 1.0 - w1
    rows = np.arange(out_size)
    np.add.at(m, (rows, i0), w0)
    np.add.at(m, (rows, i1), w1)
    return m


def resize_bilinear_align_corners(x: jax.Array, out_hw) -> jax.Array:
    """Resize NHWC ``x`` to ``out_hw`` with align_corners=True bilinear.

    Matches torch ``F.interpolate(x, out_hw, mode='bilinear',
    align_corners=True)`` on NCHW up to layout.
    """
    b, h, w, c = x.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if (oh, ow) == (h, w):
        return x
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    if oh != h:
        mh = jnp.asarray(_interp_matrix_np(oh, h))
        xf = jnp.einsum("oh,bhwc->bowc", mh, xf, precision=jax.lax.Precision.HIGHEST)
    if ow != w:
        mw = jnp.asarray(_interp_matrix_np(ow, w))
        xf = jnp.einsum("ow,bhwc->bhoc", mw, xf, precision=jax.lax.Precision.HIGHEST)
    return xf.astype(dtype)


def upsample2d_as(x: jax.Array, target_hw) -> jax.Array:
    """`upsample2d_as` (pwc_modules.py:72-74): resize to target's H,W."""
    return resize_bilinear_align_corners(x, target_hw)


def upsample2d_flow_as(flow: jax.Array, target_hw, if_rate: bool = False) -> jax.Array:
    """`upsample2d_flow_as` (pwc_modules.py:77-90).

    NHWC flow with channels (u, v).  With ``if_rate`` the resized u is
    scaled by ``out_w / in_w`` and v by ``out_h / in_h`` (python-float
    division, as in the reference).
    """
    b, h, w, c = flow.shape
    assert c == 2, "flow must have 2 channels (u, v)"
    res = resize_bilinear_align_corners(flow, target_hw)
    if if_rate:
        oh, ow = int(target_hw[0]), int(target_hw[1])
        scale = jnp.asarray([ow / w, oh / h], dtype=res.dtype)
        res = res * scale
    return res


def upsample_flow(flow: jax.Array, target_hw) -> jax.Array:
    """`upsample_flow` (pwc_modules.py:93-104): always rate-scaled."""
    return upsample2d_flow_as(flow, target_hw, if_rate=True)


def downsample_area(x: jax.Array, out_hw) -> jax.Array:
    """Area ('adaptive average pool') downsample matching torch
    ``F.interpolate(mode='area')`` used for the '1/4' smooth level
    (upflow.py:402-403).

    torch 'area' mode == adaptive_avg_pool2d: output bin ``o`` averages input
    rows ``[floor(o*in/out), ceil((o+1)*in/out))``.  Expressed as two matmuls
    like the bilinear path.
    """
    b, h, w, c = x.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])

    @functools.lru_cache(maxsize=64)
    def pool_matrix(out_size: int, in_size: int) -> np.ndarray:
        m = np.zeros((out_size, in_size), dtype=np.float32)
        for o in range(out_size):
            lo = (o * in_size) // out_size
            hi = -(-((o + 1) * in_size) // out_size)  # ceil
            m[o, lo:hi] = 1.0 / (hi - lo)
        return m

    dtype = x.dtype
    xf = x.astype(jnp.float32)
    if oh != h:
        xf = jnp.einsum("oh,bhwc->bowc", jnp.asarray(pool_matrix(oh, h)), xf,
                        precision=jax.lax.Precision.HIGHEST)
    if ow != w:
        xf = jnp.einsum("ow,bhwc->bhoc", jnp.asarray(pool_matrix(ow, w)), xf,
                        precision=jax.lax.Precision.HIGHEST)
    return xf.astype(dtype)
