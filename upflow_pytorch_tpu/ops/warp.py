"""Backward warping (grid sample) ops, NHWC, TPU-first.

Reproduces three distinct warp semantics from the reference:

1. ``flow_warp``    — ``tools.torch_warp`` (/root/reference/utils/tools.py:1275-1319):
   bilinear sample at ``(x+u, y+v)`` with zeros outside the image, NO
   validity mask.  Used by the occlusion check and SGU flow-warping.
2. ``flow_warp_masked`` — ``WarpingLayer_no_div``
   (/root/reference/model/pwc_modules.py:179-207): same sample, then
   multiplied by a mask = (warped all-ones >= 1.0), i.e. only pixels whose
   full bilinear support is inside the image survive.
3. ``boundary_dilated_warp`` — ``tools.boundary_dilated_warp.warp_im``
   (/root/reference/utils/tools.py:351-498): samples the FULL uncropped
   image at ``start + grid + flow`` with coordinates (and therefore
   weights) clamped to the image; out-of-image samples cancel to zero.

Note on torch semantics: the reference pins torch 1.1, whose
``grid_sample`` uses align_corners=True mapping; combined with the
``2*g/(S-1)-1`` normalization in the callers this reduces to plain
absolute-pixel-coordinate bilinear sampling, which is what we implement
directly (no normalized grid round-trip).

Implementation: 4 corner gathers with clamped flat indices +
weight-masking.  Gathers lower to XLA ``gather``; a fused Pallas variant
can replace this on the hot path later without changing semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_nhwc(img: jax.Array, iy: jax.Array, ix: jax.Array) -> jax.Array:
    """Gather img[b, iy, ix, :] -> (B, H, W, C) for int index maps (B, H, W)."""
    b, ih, iw, c = img.shape
    flat = img.reshape(b, ih * iw, c)
    idx = iy * iw + ix  # (B, H, W)
    oh, ow = idx.shape[1], idx.shape[2]
    out = jnp.take_along_axis(flat, idx.reshape(b, oh * ow, 1), axis=1)
    return out.reshape(b, oh, ow, c)


def _bilinear_zero_pad(img: jax.Array, px: jax.Array, py: jax.Array):
    """Bilinear sample img (B,Hi,Wi,C) at absolute coords px,py (B,H,W).

    Out-of-bounds corner taps contribute zero (torch
    ``grid_sample(padding_mode='zeros')`` behavior).  Returns
    ``(sampled, weight_sum)`` where ``weight_sum`` is the warped all-ones
    image (the total in-bounds bilinear weight).
    """
    b, ih, iw, c = img.shape
    px = px.astype(jnp.float32)
    py = py.astype(jnp.float32)
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    x1 = x0 + 1.0
    y1 = y0 + 1.0
    wx1 = px - x0
    wx0 = 1.0 - wx1
    wy1 = py - y0
    wy0 = 1.0 - wy1

    out = None
    wsum = None
    for yc, xc, wy, wx in ((y0, x0, wy0, wx0), (y0, x1, wy0, wx1),
                           (y1, x0, wy1, wx0), (y1, x1, wy1, wx1)):
        valid = ((xc >= 0) & (xc <= iw - 1) & (yc >= 0) & (yc <= ih - 1))
        w = (wy * wx) * valid.astype(jnp.float32)
        ixc = jnp.clip(xc, 0, iw - 1).astype(jnp.int32)
        iyc = jnp.clip(yc, 0, ih - 1).astype(jnp.int32)
        tap = _gather_nhwc(img, iyc, ixc) * w[..., None]
        out = tap if out is None else out + tap
        wsum = w if wsum is None else wsum + w
    return out, wsum


def _abs_coords(flow: jax.Array):
    """Absolute sample coords (px, py) = grid + flow for NHWC flow (u, v)."""
    b, h, w, _ = flow.shape
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    px = xs + flow[..., 0]
    py = ys + flow[..., 1]
    return px, py


def flow_warp(x: jax.Array, flow: jax.Array) -> jax.Array:
    """``tools.torch_warp``: zero-padded bilinear warp, no mask."""
    px, py = _abs_coords(flow)
    out, _ = _bilinear_zero_pad(x.astype(jnp.float32), px, py)
    return out.astype(x.dtype)


def flow_warp_with_mask(x: jax.Array, flow: jax.Array):
    """``WarpingLayer_no_div``: masked warp.  Returns (warped*mask, mask).

    mask = 1 where the warped all-ones image >= 1.0 (full in-bounds
    bilinear support), else 0 — pwc_modules.py:201-207.
    """
    px, py = _abs_coords(flow)
    out, wsum = _bilinear_zero_pad(x.astype(jnp.float32), px, py)
    mask = (wsum >= 1.0).astype(jnp.float32)
    return (out * mask[..., None]).astype(x.dtype), mask


def flow_warp_masked(x: jax.Array, flow: jax.Array) -> jax.Array:
    out, _ = flow_warp_with_mask(x, flow)
    return out


def boundary_dilated_warp(img_full: jax.Array, flow: jax.Array,
                          start: jax.Array) -> jax.Array:
    """``tools.boundary_dilated_warp.warp_im`` (tools.py:490-498).

    img_full: (B, Hf, Wf, C) the uncropped image.
    flow:     (B, h, w, 2) flow on the crop.
    start:    (B, 2) or (B, 2, 1, 1) crop offset (x, y) into the full image.

    Sample coords = start + crop_grid + flow.  The reference's hand-rolled
    ``_interpolate`` clamps the integer corner coordinates and computes the
    bilinear weights FROM THE CLAMPED corners (tools.py:403-469), which makes
    samples at/beyond the high image edge cancel to zero and samples below
    zero likewise vanish; interior samples are plain bilinear.  We reproduce
    that exactly.
    """
    b, ih, iw, c = img_full.shape
    start = start.reshape(b, 2).astype(jnp.float32)
    px, py = _abs_coords(flow)
    px = px + start[:, 0][:, None, None]
    py = py + start[:, 1][:, None, None]

    x0 = jnp.clip(jnp.floor(px), 0, iw - 1)
    x1 = jnp.clip(jnp.floor(px) + 1.0, 0, iw - 1)
    y0 = jnp.clip(jnp.floor(py), 0, ih - 1)
    y1 = jnp.clip(jnp.floor(py) + 1.0, 0, ih - 1)

    imgf = img_full.astype(jnp.float32)
    ia = _gather_nhwc(imgf, y0.astype(jnp.int32), x0.astype(jnp.int32))
    ib = _gather_nhwc(imgf, y1.astype(jnp.int32), x0.astype(jnp.int32))
    ic = _gather_nhwc(imgf, y0.astype(jnp.int32), x1.astype(jnp.int32))
    id_ = _gather_nhwc(imgf, y1.astype(jnp.int32), x1.astype(jnp.int32))

    wa = ((x1 - px) * (y1 - py))[..., None]
    wb = ((x1 - px) * (py - y0))[..., None]
    wc = ((px - x0) * (y1 - py))[..., None]
    wd = ((px - x0) * (py - y0))[..., None]
    out = wa * ia + wb * ib + wc * ic + wd * id_
    return out.astype(img_full.dtype)
