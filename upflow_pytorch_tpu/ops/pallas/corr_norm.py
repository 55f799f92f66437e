"""Fused warp -> normalize -> correlation (the SURVEY §7 "stage 6" fusion).

The reference's decode-level hot loop runs three HBM round-trips per
direction (/root/reference/model/upflow.py:546-562): CUDA-warp the
feature map, normalize both features (network_tools.normalize_features,
upflow.py:94-137), then the CUDA correlation — each materializing full
(B, H, W, C) intermediates.  On TPU the XLA version additionally pays
layout pathologies: an NHWC->NCHW relayout per corr input, a 9x
row-shifted stack of f2 (145 MB of HBM traffic at the finest KITTI
level), and two full normalized copies that exist only to feed the cost
volume.

This module fuses the whole segment:

- the banded feature-warp kernel (ops/pallas/feature_warp.py) emits the
  warped+masked feature in rows-major (B, Hp, C, Wp) — a cheap
  row-moving permute away from the planar (B, C, Hp, Wp) the correlation
  kernel wants (W stays minor; no lane relayout);
- per-channel normalization collapses to an affine ``(f - m) * rstd``
  whose scalars XLA reduces from the un-normalized tensors ((B, 4, C)
  fp32, scalar-prefetched); the kernel applies it inline, so NO
  normalized feature map ever reaches HBM;
- the +-D-row correlation windows are read as TWO ALIGNED 8-row
  BlockSpec blocks (``lo`` at row-tile i, ``hi`` at i+1; the D-row top
  pad makes the window start a sublane multiple), so the 9x row stack
  disappears with no manual DMA machinery;
- out-of-image taps must be zero AFTER normalization (the oracle
  zero-pads the NORMALIZED f2, ops/correlation.py:29-44); the kernel
  folds that into an iota validity mask applied with the affine;
- the trailing LeakyReLU (upflow.py:563-564) is fused into the output
  store.

Exactness: the op is gated by the feature-warp window predicate and
falls back to the exact XLA composition via ``lax.cond``; the fast
path differs from the oracle only in reduction association (documented
~1e-5-relative, bounded by the op tests).  Gradients route through the
XLA composition via custom VJP.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from upflow_pytorch_tpu.ops.pallas.feature_warp import (
    feature_warp_prep,
    feature_warp_stage,
    feature_warp_window_pallas,
)

_SUB = 8


def _ceil_to(v: int, m: int) -> int:
    return -(-v // m) * m


# =============================================================================
# The normalized-correlation kernel
# =============================================================================

def _corr_norm_kernel(aff_ref, f1_ref, f2lo_ref, f2hi_ref, out_ref, f2n_ref,
                      *, n_ch: int, disp: int, img_h: int, img_w: int,
                      leaky_slope: Optional[float]):
    """Grid (B, Hp/8).

    aff_ref:  (B, 4, C) fp32 scalar-prefetch: rows m1, r1, m2, r2
              (mean and reciprocal-std for f1 / f2).
    f1_ref:   (1, C, 8, W) block of the (zero-row-padded) target features.
    f2lo/hi:  (1, C, 8, W2) aligned halves of the +-D row window of the
              staged source (top-padded by D rows, so half ``lo`` of
              row-tile i starts at staged row 8i exactly).
    out_ref:  (1, K*K, 8, W).
    f2n_ref:  (C, 16, W2) fp32 scratch: the normalized+masked window.
    """
    k = 2 * disp + 1
    w = out_ref.shape[3]
    w2 = f2n_ref.shape[2]
    b = pl.program_id(0)
    i = pl.program_id(1)

    # Validity of staged window positions in IMAGE coords: staged row s of
    # tile i is image row 8i + s - disp; staged col is image col - disp.
    # Out-of-image (and padded-garbage) taps must contribute exactly 0.
    row0 = i * _SUB - disp
    rr = jax.lax.broadcasted_iota(jnp.int32, (_SUB, w2), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (_SUB, w2), 1) - disp
    colv = (cc >= 0) & (cc < img_w)
    vlo = ((rr + row0 >= 0) & (rr + row0 < img_h) & colv
           ).astype(jnp.float32)
    vhi = ((rr + row0 + _SUB >= 0) & (rr + row0 + _SUB < img_h) & colv
           ).astype(jnp.float32)

    for c in range(n_ch):
        m2 = aff_ref[b, 2, c]
        r2 = aff_ref[b, 3, c]
        f2n_ref[c, 0:_SUB, :] = (
            (f2lo_ref[0, c].astype(jnp.float32) - m2) * r2 * vlo)
        f2n_ref[c, _SUB:2 * _SUB, :] = (
            (f2hi_ref[0, c].astype(jnp.float32) - m2) * r2 * vhi)

    f1n = jnp.stack(
        [(f1_ref[0, c].astype(jnp.float32) - aff_ref[b, 0, c])
         * aff_ref[b, 1, c] for c in range(n_ch)], axis=0)  # (C, 8, W)

    inv_c = 1.0 / n_ch
    for ky in range(k):
        f2r = f2n_ref[:, ky:ky + _SUB, :]  # (C, 8, W2)
        for kx in range(k):
            prod = f1n * f2r[:, :, kx:kx + w]
            acc = jnp.sum(prod, axis=0) * inv_c
            if leaky_slope is not None:
                acc = jnp.where(acc >= 0, acc, leaky_slope * acc)
            out_ref[0, ky * k + kx] = acc.astype(out_ref.dtype)


def corr_norm_window_pallas(f1p: jax.Array, f2s: jax.Array, aff: jax.Array,
                            disp: int, img_hw: Tuple[int, int], *,
                            leaky_slope: Optional[float],
                            out_dtype=jnp.float32) -> jax.Array:
    """Raw kernel call.

    f1p: (B, C, Hp, W) planar target features, rows zero-padded to Hp=8k.
    f2s: (B, C, Hp + 8, W + 2*disp) staged source: rows top-padded by
         ``disp`` (alignment) and bottom-padded to Hp + 8; cols padded by
         ``disp`` each side.  Padded/garbage positions are zeroed by the
         in-kernel validity mask, NOT by their stored contents.
    aff: (B, 4, C) fp32 — m1, rstd1, m2, rstd2 per channel.
    Returns (B, (2*disp+1)^2, Hp, W) of ``out_dtype`` (rows >= H garbage).
    """
    b, c, hp, w = f1p.shape
    img_h, img_w = int(img_hw[0]), int(img_hw[1])
    w2 = w + 2 * disp
    k = 2 * disp + 1
    n_i = hp // _SUB
    assert f2s.shape == (b, c, hp + _SUB, w2), (f2s.shape, (b, c, hp + 8, w2))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_i),
        in_specs=[
            pl.BlockSpec((1, c, _SUB, w), lambda bi, i, a: (bi, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, _SUB, w2), lambda bi, i, a: (bi, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, _SUB, w2), lambda bi, i, a: (bi, 0, i + 1, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k * k, _SUB, w),
                               lambda bi, i, a: (bi, 0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((c, 2 * _SUB, w2), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_corr_norm_kernel, n_ch=c, disp=disp,
                          img_h=img_h, img_w=img_w, leaky_slope=leaky_slope),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, k * k, hp, w), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hp * w * k * k * c,
            bytes_accessed=b * c * hp * (w + 3 * w2) * f1p.dtype.itemsize
            + 4 * b * k * k * hp * w,
            transcendentals=0),
    )(aff, f1p, f2s, f2s)


# =============================================================================
# XLA-side affine (moment) computation — normalize_features' math
# =============================================================================

def _moments(f32sum_axes_fn, f: jax.Array, n: int):
    """Mean and UNBIASED variance (torch.var ddof=1, upflow.py:118-121)."""
    f = f.astype(jnp.float32)
    mean = f32sum_axes_fn(f) / n
    var = f32sum_axes_fn((f - f32sum_axes_fn.expand(mean)) ** 2) / max(n - 1, 1)
    return mean, var


class _Reducer:
    """Sum-reduce over the given axes with a matching broadcast-back."""

    def __init__(self, axes, keep_shape_fn):
        self.axes = axes
        self.expand = keep_shape_fn

    def __call__(self, x):
        return jnp.sum(x, axis=self.axes)


def _moments_nhwc(f: jax.Array, across_channels: bool):
    """(B, H, W, C) -> mean/var of shape (B, C) (or broadcast (B, C))."""
    b, h, w, c = f.shape
    if across_channels:
        r = _Reducer((1, 2, 3), lambda m: m[:, None, None, None])
        mean, var = _moments(r, f, h * w * c)
        return (jnp.broadcast_to(mean[:, None], (b, c)),
                jnp.broadcast_to(var[:, None], (b, c)))
    r = _Reducer((1, 2), lambda m: m[:, None, None, :])
    return _moments(r, f, h * w)


def _moments_planar(f: jax.Array, across_channels: bool):
    """(B, C, H, W) -> mean/var of shape (B, C)."""
    b, c, h, w = f.shape
    if across_channels:
        r = _Reducer((1, 2, 3), lambda m: m[:, None, None, None])
        mean, var = _moments(r, f, h * w * c)
        return (jnp.broadcast_to(mean[:, None], (b, c)),
                jnp.broadcast_to(var[:, None], (b, c)))
    r = _Reducer((2, 3), lambda m: m[:, :, None, None])
    return _moments(r, f, h * w)


def _affine_pair(m1, v1, m2, v2, norm_kw) -> jax.Array:
    """(B, C) moments -> (B, 4, C) [m1, rstd1, m2, rstd2] per the
    normalize_features knobs (incl. the var-OF-vars cross-image quirk,
    upflow.py:123-124: for two images, unbiased var of {v1, v2})."""
    center, normalize, across_images = (
        norm_kw["center"], norm_kw["normalize"],
        norm_kw["moments_across_images"])
    if across_images:
        m_all = (m1 + m2) * 0.5
        v_bar = (v1 + v2) * 0.5
        v_all = (v1 - v_bar) ** 2 + (v2 - v_bar) ** 2  # /(n-1), n=2
        m1 = m2 = m_all
        v1 = v2 = v_all
    ones = jnp.ones_like(m1)
    zeros = jnp.zeros_like(m1)
    r1 = jax.lax.rsqrt(v1 + 1e-16) if normalize else ones
    r2 = jax.lax.rsqrt(v2 + 1e-16) if normalize else ones
    if not center:
        m1, m2 = zeros, zeros
    return jnp.stack([m1, r1, m2, r2], axis=1)


_NO_NORM = dict(center=False, normalize=False, moments_across_channels=False,
                moments_across_images=False)


# =============================================================================
# The fused op
# =============================================================================

def warp_norm_corr_xla(f_tgt: jax.Array, f_src: jax.Array, flow: jax.Array,
                       disp: int, norm_kw: Optional[dict],
                       leaky_slope: Optional[float]) -> jax.Array:
    """Exact XLA composition (oracle, fallback branch, and VJP route):
    corr(normalize(f_tgt), normalize(mask * warp(f_src, flow)))."""
    from upflow_pytorch_tpu.ops.correlation import correlation_xla
    from upflow_pytorch_tpu.ops.normalize import normalize_features
    from upflow_pytorch_tpu.ops.warp import flow_warp_with_mask

    warped, _ = flow_warp_with_mask(f_src, flow)
    if norm_kw is not None:
        f_tgt, warped = normalize_features((f_tgt, warped), **norm_kw)
    out = correlation_xla(f_tgt, warped, max_displacement=disp)
    if leaky_slope is not None:
        out = jax.nn.leaky_relu(out, negative_slope=leaky_slope)
    return out


def _wnc_fast(ops, h, w, hp, disp, norm_kw, leaky_slope, mask_thr):
    """The fused-kernel branch (module-level so tests and the bench can
    exercise it without ``lax.cond`` — interpret-mode emulation of the
    manual-DMA warp kernel is not cond-safe)."""
    f_tgt_, px_, py_, ws_, ro_, rb_, co_, f_src_, _flow = ops
    b, c = f_src_.shape[0], f_src_.shape[3]
    wr = feature_warp_window_pallas(
        feature_warp_stage(f_src_), px_, py_, ws_, ro_, rb_, co_, (h, w),
        mask_thr=mask_thr, out_dtype=f_src_.dtype)   # (B, Hp, C, Wp)
    # rows-major -> planar: W stays minor, a row-moving permute only
    wpl = jnp.transpose(wr, (0, 2, 1, 3))[:, :, :, :w]  # (B, C, Hp, w)
    if norm_kw is not None:
        ac = norm_kw["moments_across_channels"]
        m1, v1 = _moments_nhwc(f_tgt_, ac)
        m2, v2 = _moments_planar(wpl[:, :, :h, :], ac)
        aff = _affine_pair(m1, v1, m2, v2, norm_kw)
    else:
        aff = _affine_pair(jnp.zeros((b, c), jnp.float32),
                           jnp.ones((b, c), jnp.float32),
                           jnp.zeros((b, c), jnp.float32),
                           jnp.ones((b, c), jnp.float32), _NO_NORM)
    f2s = jnp.pad(wpl, ((0, 0), (0, 0), (disp, _SUB - disp),
                        (disp, disp)))
    f1p = jnp.pad(jnp.transpose(f_tgt_, (0, 3, 1, 2)),
                  ((0, 0), (0, 0), (0, hp - h), (0, 0)))
    out = corr_norm_window_pallas(f1p, f2s, aff, disp, (h, w),
                                  leaky_slope=leaky_slope)
    return jnp.transpose(out[:, :, :h, :], (0, 2, 3, 1))


def _wnc_fwd_impl(f_tgt, f_src, flow, disp, norm_items, leaky_slope,
                  mask_thr, force=None):
    norm_kw = dict(norm_items) if norm_items is not None else None
    b, h, w, c = f_src.shape
    px_p, py_p, roff, rowbase, coff, fits, (hp, wp), ws_p = \
        feature_warp_prep(f_src, flow)

    fast = functools.partial(_wnc_fast, h=h, w=w, hp=hp, disp=disp,
                             norm_kw=norm_kw, leaky_slope=leaky_slope,
                             mask_thr=mask_thr)

    def slow(ops):
        # exact XLA composition, sharing px/py/wsum with the fast branch
        # so mask decisions under the chaotic >= 1.0 threshold are
        # bitwise-identical across the cond (see _warp_kernel's ws note)
        from upflow_pytorch_tpu.ops.correlation import correlation_xla
        from upflow_pytorch_tpu.ops.normalize import normalize_features
        from upflow_pytorch_tpu.ops.warp import _bilinear_zero_pad

        f_tgt_, px_, py_, ws_, _ro, _rb, _co, f_src_, _flow = ops
        out_w, _ = _bilinear_zero_pad(f_src_, px_[:, :h, :w],
                                      py_[:, :h, :w])
        mask = (ws_[:, :h, :w] >= mask_thr).astype(jnp.float32)
        warped = (out_w * mask[..., None]).astype(f_src_.dtype)
        ft = f_tgt_
        if norm_kw is not None:
            ft, warped = normalize_features((ft, warped), **norm_kw)
        out = correlation_xla(ft, warped, max_displacement=disp)
        if leaky_slope is not None:
            out = jax.nn.leaky_relu(out, negative_slope=leaky_slope)
        return out.astype(jnp.float32)

    ops = (f_tgt, px_p, py_p, ws_p, roff, rowbase, coff, f_src, flow)
    if force == "fast":
        return fast(ops)
    if force == "slow":
        return slow(ops)
    assert force is None, force
    return jax.lax.cond(fits, fast, slow, ops)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def warp_norm_corr(f_tgt: jax.Array, f_src: jax.Array, flow: jax.Array,
                   disp: int, norm_items, leaky_slope: Optional[float],
                   mask_thr: float, force: Optional[str] = None) -> jax.Array:
    """Fused ``leaky(corr(norm(f_tgt), norm(masked_warp(f_src, flow))))``.

    f_tgt/f_src: (B, H, W, C) NHWC; flow: (B, H, W, 2).  ``norm_items``:
    None or a hashable tuple of normalize_features knob items (see
    ``norm_items_from_conf``).  Output (B, H, W, (2*disp+1)^2) fp32.
    Falls back to the exact XLA composition whenever the warp window
    predicate fails; gradients always route through that composition.
    ``force`` ("fast"/"slow") pins the branch statically — for tests
    (interpret-mode emulation of the warp kernel's manual DMA is not
    ``lax.cond``-safe) and for both-branch bench timings.
    """
    return _wnc_fwd_impl(f_tgt, f_src, flow, disp, norm_items, leaky_slope,
                         mask_thr, force)


def _wnc_fwd(f_tgt, f_src, flow, disp, norm_items, leaky_slope, mask_thr,
             force):
    out = _wnc_fwd_impl(f_tgt, f_src, flow, disp, norm_items, leaky_slope,
                        mask_thr, force)
    return out, (f_tgt, f_src, flow)


def _wnc_bwd(disp, norm_items, leaky_slope, mask_thr, force, res, g):
    f_tgt, f_src, flow = res
    norm_kw = dict(norm_items) if norm_items is not None else None
    _, vjp = jax.vjp(
        lambda a, b, fl: warp_norm_corr_xla(a, b, fl, disp, norm_kw,
                                            leaky_slope),
        f_tgt, f_src, flow)
    return vjp(g.astype(jnp.float32))


warp_norm_corr.defvjp(_wnc_fwd, _wnc_bwd)


def norm_items_from_conf(conf) -> tuple:
    """The model's normalize_features knobs as a hashable VJP-static."""
    return (("normalize", True), ("center", True),
            ("moments_across_channels", bool(conf.norm_moments_across_channels)),
            ("moments_across_images", bool(conf.norm_moments_across_images)))


def warp_norm_corr_viable(shape, disp: int = 4,
                          vmem_budget: int = 13 * 1024 * 1024) -> bool:
    """Trace-time gate: VMEM fit (lane-padded blocks) and worthwhile
    width (narrow coarse levels keep the existing per-op path)."""
    from upflow_pytorch_tpu.ops.pallas_gate import pallas_disabled

    if pallas_disabled():
        return False
    b, h, w, c = shape
    if disp > 4 or w < 128:
        return False
    k = 2 * disp + 1
    wl = _ceil_to(w, 128)
    w2l = _ceil_to(w + 2 * disp, 128)
    item = 4  # viability at fp32; bf16 only shrinks
    f1 = c * _SUB * wl * item
    f2 = c * _SUB * w2l * item
    out = k * k * _SUB * wl * 4
    scratch = c * 2 * _SUB * w2l * 4
    return 2 * (f1 + 2 * f2 + out) + scratch <= vmem_budget
