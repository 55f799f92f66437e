"""Fully-fused final SGU upsample stage as one Pallas kernel (TPU).

Implements the reference's final self-guided upsample
(/root/reference/model/upflow.py:85-92 via 522-530) for one direction:

    flow_out   = upsample2d_flow_as(flow_q, (H, W), if_rate=True)
    inter_flow = upsample2d_flow_as(x_out[..., :2], (H, W), if_rate=True)
    inter_mask = upsample2d_as(sigmoid(x_out[..., 2:3]), (H, W))
    result     = torch_warp(flow_out, inter_flow) * (1 - inter_mask)
                 + flow_out * inter_mask

where flow_q and x_out live at 1/4 resolution (Hq, Wq).  ALL
full-resolution tensors exist only as VMEM tiles inside the kernel:

- the align_corners=True bilinear x4 upsample is two small matmuls per
  tile against precomputed interpolation matrices (the same matrices as
  ops/resize.py, sliced per tile by aligned BlockSpec-free in-kernel
  slicing of whole-matrix VMEM residents);
- the warp's +-3-tap neighborhood comes from computing the flow upsample
  on a 3x3-tile extended patch (24, 384) per output tile, so no halo
  exchange or overlapping blocks are needed;
- the tap weights use the torch grid_sampler weight arithmetic, with the
  normalize/unnormalize roundtrip approximated via multiplication by a
  precomputed 1/(S-1) (Mosaic lowers fp32 division approximately, so
  a/b is unavailable in-kernel).  a*(1/b) differs from XLA's a/b by up
  to ~1 ulp of the coordinate, which can flip a bilinear tap choice at
  exact fp ties; the op test (test_pallas_sgu.py) bounds the resulting
  output delta at 2e-3 against the XLA oracle — tap-flip-bounded
  agreement, NOT bitwise identity.

Why: XLA:TPU lays full-resolution (B, H, W, 2) intermediates out with
C=2 on the 128-lane axis (64x padded) and every producer/consumer around
the final upsample pays relayout copies — the unfused stage profiled at
>11 ms per direction at KITTI size, vs ~1 ms for this kernel.

REQUIRES |inter_flow| <= R-1 = 2 px after rate scaling (bilinear
upsampling cannot exceed the source extrema, so the wrapper checks the
small-resolution x_out extrema and falls back to the exact XLA path
otherwise).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_R = 3
_TH = 8
_TW = 128

_PREC = jax.lax.Precision.HIGHEST


def _kernel(uq_ref, vq_ref, iuq_ref, ivq_ref, mq_ref, rh_ref, cw_ref,
            out_u, out_v, *, h: int, w: int, hq: int, wq: int):
    """Grid (B, Hp/8, Wp/128).

    uq/vq/iuq/ivq/mq: (1, Hq, Wq) quarter-res planes, whole-array VMEM
                      (iu/iv already rate-scaled, m already sigmoided)
    rh_ref: (Hp + 16, Hq)  row-interp matrix, padded 8 rows both sides
    cw_ref: (Wq, Wp + 256) TRANSPOSED col-interp matrix (so the kernel
            lane-slices its tile columns instead of transposing)
    out_u/out_v: (1, 8, 128) tiles
    """
    ti = pl.program_id(1)
    tj = pl.program_id(2)

    # extended 3x3-tile patch rows/cols of the interp matrices; the
    # padded-matrix row offset makes every slice start 8/128-aligned
    rh_e = rh_ref[pl.ds(ti * _TH, 3 * _TH)]            # (24, Hq)
    cwt_e = cw_ref[:, pl.ds(tj * _TW, 3 * _TW)]        # (Wq, 384)
    rh_c = rh_ref[pl.ds((ti + 1) * _TH, _TH)]          # (8, Hq)
    cwt_c = cw_ref[:, pl.ds((tj + 1) * _TW, _TW)]      # (Wq, 128)

    dn = (((1,), (0,)), ((), ()))

    def up_ext(src_ref):   # (24, 384) extended patch
        t = jax.lax.dot_general(rh_e, src_ref[0], dn, precision=_PREC,
                                preferred_element_type=jnp.float32)
        return jax.lax.dot_general(t, cwt_e, dn, precision=_PREC,
                                   preferred_element_type=jnp.float32)

    def up_c(src_ref):     # (8, 128) center tile
        t = jax.lax.dot_general(rh_c, src_ref[0], dn, precision=_PREC,
                                preferred_element_type=jnp.float32)
        return jax.lax.dot_general(t, cwt_c, dn, precision=_PREC,
                                   preferred_element_type=jnp.float32)

    uS = up_ext(uq_ref)
    vS = up_ext(vq_ref)
    iu = up_c(iuq_ref)
    iv = up_c(ivq_ref)
    m = up_c(mq_ref)

    lane = jax.lax.broadcasted_iota(jnp.int32, (_TH, _TW), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (_TH, _TW), 0)
    xs = (tj * _TW + lane).astype(jnp.float32)
    ys = (ti * _TH + sub).astype(jnp.float32)

    # torch grid_sample fp32 roundtrip via multiplications: with
    # inv = fl(1/(S-1)) and half-scales, ((2*p*inv - 1) + 1) * 0.5 * (S-1)
    inv_w = jnp.float32(1.0 / max(w - 1, 1))
    inv_h = jnp.float32(1.0 / max(h - 1, 1))
    px = jnp.float32(2.0) * (xs + iu) * inv_w - jnp.float32(1.0)
    px = (px + jnp.float32(1.0)) * jnp.float32(0.5) * jnp.float32(w - 1)
    py = jnp.float32(2.0) * (ys + iv) * inv_h - jnp.float32(1.0)
    py = (py + jnp.float32(1.0)) * jnp.float32(0.5) * jnp.float32(h - 1)

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx1 = px - x0
    wx0 = (x0 + 1.0) - px
    wy1 = py - y0
    wy0 = (y0 + 1.0) - py
    tx = (x0 - xs).astype(jnp.int32)
    ty = (y0 - ys).astype(jnp.int32)
    # zero-pad semantics: the extended patch holds garbage (interp-matrix
    # zero rows -> zeros) beyond the image, but taps outside [0, S-1]
    # must contribute zero regardless of the patch value
    acc_u = jnp.zeros((_TH, _TW), jnp.float32)
    acc_v = jnp.zeros((_TH, _TW), jnp.float32)
    for dy in range(-(_R - 1), _R + 1):
        wyd = (jnp.where(ty == dy, wy0, 0.0)
               + jnp.where(ty + 1 == dy, wy1, 0.0))
        yy = ys + jnp.float32(dy)
        wyd = jnp.where((yy >= 0) & (yy <= h - 1), wyd, 0.0)
        ur = pltpu.roll(uS, (-(_TH + dy)) % (3 * _TH), 0)
        vr = pltpu.roll(vS, (-(_TH + dy)) % (3 * _TH), 0)
        for dx in range(-(_R - 1), _R + 1):
            wxd = (jnp.where(tx == dx, wx0, 0.0)
                   + jnp.where(tx + 1 == dx, wx1, 0.0))
            xx = xs + jnp.float32(dx)
            wxd = jnp.where((xx >= 0) & (xx <= w - 1), wxd, 0.0)
            wgt = wyd * wxd
            sh = (-(_TW + dx)) % (3 * _TW)
            acc_u = acc_u + wgt * pltpu.roll(ur, sh, 1)[0:_TH, 0:_TW]
            acc_v = acc_v + wgt * pltpu.roll(vr, sh, 1)[0:_TH, 0:_TW]
    uc = uS[_TH:2 * _TH, _TW:2 * _TW]
    vc = vS[_TH:2 * _TH, _TW:2 * _TW]
    out_u[0] = acc_u * (1.0 - m) + uc * m
    out_v[0] = acc_v * (1.0 - m) + vc * m


@functools.lru_cache(maxsize=64)
def _interp_matrix(out_size: int, in_size: int):
    from upflow_pytorch_tpu.ops.resize import _interp_matrix_np
    return _interp_matrix_np(out_size, in_size)


def sgu_final_pallas(flow_q, x_out, out_hw, interpret=False):
    """One direction of the fused final SGU stage.

    flow_q: (B, Hq, Wq, 2) quarter-res flow; x_out: (B, Hq, Wq, 3) SGU
    estimator output (inter_flow + mask logit); out_hw: (H, W).
    Returns (B, H, W, 2) refined full-res flow.
    REQUIRES the rate-scaled |inter_flow| <= 2 (checked by the wrapper).
    """
    b, hq, wq, _ = flow_q.shape
    h, w = int(out_hw[0]), int(out_hw[1])
    hp = -(-h // _TH) * _TH
    wp = -(-w // _TW) * _TW

    # rate scaling (upsample2d_flow_as if_rate=True) commutes with the
    # linear resize, so scale the quarter-res components up front
    uq = flow_q[..., 0].astype(jnp.float32) * (w / wq)
    vq = flow_q[..., 1].astype(jnp.float32) * (h / hq)
    iuq = x_out[..., 0].astype(jnp.float32) * (w / wq)
    ivq = x_out[..., 1].astype(jnp.float32) * (h / hq)
    mq = jax.nn.sigmoid(x_out[..., 2].astype(jnp.float32))

    rh = np.zeros((hp + 2 * _TH, hq), np.float32)
    rh[_TH:_TH + h] = _interp_matrix(h, hq)
    cw = np.zeros((wp + 2 * _TW, wq), np.float32)
    cw[_TW:_TW + w] = _interp_matrix(w, wq)
    rh = jnp.asarray(rh)
    cw = jnp.asarray(cw.T.copy())  # (Wq, Wp + 256)

    whole = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda bi, i, j: (bi, 0, 0), memory_space=pltpu.VMEM)
    mat = lambda shape: pl.BlockSpec(
        shape, lambda bi, i, j: (0, 0), memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((1, _TH, _TW), lambda bi, i, j: (bi, i, j),
                        memory_space=pltpu.VMEM)
    ou, ov = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, hq=hq, wq=wq),
        grid=(b, hp // _TH, wp // _TW),
        in_specs=[whole((hq, wq))] * 5 + [mat(rh.shape), mat(cw.shape)],
        out_specs=[tile, tile],
        out_shape=[jax.ShapeDtypeStruct((b, hp, wp), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=int(2 * b * (hp // _TH) * (wp // _TW)
                      * (3 * _TH * hq * wq + 3 * _TH * 3 * _TW * wq) * 3),
            bytes_accessed=4 * b * (5 * hq * wq + 2 * hp * wp),
            transcendentals=0),
        interpret=interpret,
    )(uq, vq, iuq, ivq, mq, rh, cw)
    out = jnp.stack([ou[:, :h, :w], ov[:, :h, :w]], axis=-1)
    return out.astype(flow_q.dtype)
