"""Fused Pallas kernel for the SGU blend warp (TPU).

Computes, for flow components (u, v), interpolation flow (iu, iv) and
sigmoided mask m — all PLANAR (B, H, W) fp32 arrays —

    out = warp([u; v], [iu, iv]) * (1 - m) + [u; v] * m

i.e. ``sgu_model.forward``'s final blend
(/root/reference/model/upflow.py:88) with ``tools.torch_warp`` zero-pad
bilinear semantics, REQUIRING |iu|, |iv| <= R-1 (the wrapper in
ops/warp.py falls back to the exact XLA gather otherwise, so the op
stays exact for any flow).

Why a kernel: the blend runs at full image resolution where XLA:TPU
repeatedly mis-lays out (B, H, W, 2) intermediates (C=2 on the 128-lane
axis = 64x padding) and mis-fuses the tap loop inside the range
``lax.cond`` — profiled at 11.3 ms per direction at KITTI size
(384x1280) against ~0.5 ms for the same math standalone.  The kernel
pins planar layouts and computes everything (torch-grid coordinate
roundtrip, tap selectors, 36-tap accumulation, mask blend) in VMEM per
(8, 128) output tile.

Halo: |flow| <= R-1 = 2 plus the bilinear support bounds every tap to
+-3 rows/cols, so each output tile reads its 3x3 neighborhood of
(8, 128) blocks from the zero-padded flow planes (BlockSpec blocks
cannot overlap; the nine neighbor blocks are separate inputs assembled
into a (24, 384) slab in VMEM, and taps walk the slab with pltpu.roll
pairs — row rolls hoisted per dy).  Tap weights use the exact
``ops.warp._shift_window_warp`` / torch grid_sampler arithmetic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_R = 3        # window: |flow| <= 2 (matches ops.warp._SMALL_WINDOW_R)
_TH = 8       # output tile rows
_TW = 128     # output tile cols


def _blend_kernel(*refs, h: int, w: int):
    """Grid (B, Hp/8, Wp/128).

    refs: u00..u22 (9 neighbor blocks of u), v00..v22, px, py, m,
          out_u, out_v — every block (1, 8, 128).  px/py are the
          ABSOLUTE sample coordinates, computed in XLA by the caller:
          Mosaic lowers fp32 division to an approximate reciprocal, so
          the torch-grid roundtrip (which divides by W-1/H-1) must stay
          outside the kernel for exactness (errors of ~1e-4 * coord were
          measured with an in-kernel roundtrip).
    """
    u9 = refs[0:9]
    v9 = refs[9:18]
    px_ref, py_ref, m_ref = refs[18:21]
    out_u, out_v = refs[21:23]

    ti = pl.program_id(1)
    tj = pl.program_id(2)

    def slab(t9):
        rows = [jnp.concatenate([t9[3 * r + c][0] for c in range(3)], axis=1)
                for r in range(3)]
        return jnp.concatenate(rows, axis=0)      # (24, 384)

    uS = slab(u9)
    vS = slab(v9)

    lane = jax.lax.broadcasted_iota(jnp.int32, (_TH, _TW), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (_TH, _TW), 0)
    xs = (tj * _TW + lane).astype(jnp.float32)
    ys = (ti * _TH + sub).astype(jnp.float32)

    px = px_ref[0]
    py = py_ref[0]

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx1 = px - x0
    wx0 = (x0 + 1.0) - px
    wy1 = py - y0
    wy0 = (y0 + 1.0) - py
    tx = (x0 - xs).astype(jnp.int32)
    ty = (y0 - ys).astype(jnp.int32)

    acc_u = jnp.zeros((_TH, _TW), jnp.float32)
    acc_v = jnp.zeros((_TH, _TW), jnp.float32)
    for dy in range(-(_R - 1), _R + 1):
        wyd = (jnp.where(ty == dy, wy0, 0.0)
               + jnp.where(ty + 1 == dy, wy1, 0.0))
        # bring slab row (8 + sub + dy) to row sub (right-roll)
        ur = pltpu.roll(uS, (-(_TH + dy)) % (3 * _TH), 0)
        vr = pltpu.roll(vS, (-(_TH + dy)) % (3 * _TH), 0)
        for dx in range(-(_R - 1), _R + 1):
            wxd = (jnp.where(tx == dx, wx0, 0.0)
                   + jnp.where(tx + 1 == dx, wx1, 0.0))
            wgt = wyd * wxd
            sh = (-(_TW + dx)) % (3 * _TW)
            ut = pltpu.roll(ur, sh, 1)[0:_TH, 0:_TW]
            vt = pltpu.roll(vr, sh, 1)[0:_TH, 0:_TW]
            acc_u = acc_u + wgt * ut
            acc_v = acc_v + wgt * vt
    m = m_ref[0]
    uc = uS[_TH:2 * _TH, _TW:2 * _TW]
    vc = vS[_TH:2 * _TH, _TW:2 * _TW]
    out_u[0] = acc_u * (1.0 - m) + uc * m
    out_v[0] = acc_v * (1.0 - m) + vc * m


def sgu_blend_pallas(u, v, iu, iv, m, interpret=False):
    """Fused SGU blend; REQUIRES |iu|, |iv| <= R-1 elementwise.

    u, v, iu, iv, m: (B, H, W) fp32 planes.  Returns (out_u, out_v).
    The torch-grid coordinate roundtrip runs in XLA (exact fp32
    division); the kernel receives absolute sample coordinates.

    Zero-pad warp semantics: the flow planes are zero-padded by one tile
    on every side, so any tap beyond the true image reads zero; the
    *weights* of out-of-image taps are irrelevant because torch_warp
    (no-mask variant) sums tap_value * weight and the values are zero.
    """
    b, h, w = u.shape
    hp = -(-h // _TH) * _TH
    wp = -(-w // _TW) * _TW

    uP = jnp.pad(u.astype(jnp.float32),
                 ((0, 0), (_TH, _TH + (hp - h)), (_TW, _TW + (wp - w))))
    vP = jnp.pad(v.astype(jnp.float32),
                 ((0, 0), (_TH, _TH + (hp - h)), (_TW, _TW + (wp - w))))
    from upflow_pytorch_tpu.ops.warp import _abs_coords_torch_grid

    px, py = _abs_coords_torch_grid(jnp.stack([iu, iv], axis=-1))
    pxP = jnp.pad(px.astype(jnp.float32),
                  ((0, 0), (0, hp - h), (0, wp - w)))
    pyP = jnp.pad(py.astype(jnp.float32),
                  ((0, 0), (0, hp - h), (0, wp - w)))
    mP = jnp.pad(m.astype(jnp.float32),
                 ((0, 0), (0, hp - h), (0, wp - w)))

    grid = (b, hp // _TH, wp // _TW)

    def nb_spec(di, dj):
        # neighbor block (i+di, j+dj) of the one-tile-padded planes:
        # padded block (i+di, j+dj) holds original rows
        # [(i+di-1)*8, ...) — exactly the halo neighborhood
        return pl.BlockSpec((1, _TH, _TW),
                            lambda bi, i, j, di=di, dj=dj: (bi, i + di, j + dj),
                            memory_space=pltpu.VMEM)

    tile_spec = pl.BlockSpec((1, _TH, _TW), lambda bi, i, j: (bi, i, j),
                             memory_space=pltpu.VMEM)
    in_specs = ([nb_spec(r, c) for r in range(3) for c in range(3)] * 2
                + [tile_spec, tile_spec, tile_spec])
    ou, ov = pl.pallas_call(
        functools.partial(_blend_kernel, h=h, w=w),
        grid=grid,
        in_specs=in_specs,
        out_specs=[tile_spec, tile_spec],
        out_shape=[jax.ShapeDtypeStruct((b, hp, wp), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=b * hp * wp * (2 * _R) * (2 * _R) * 6,
            bytes_accessed=4 * b * hp * wp * 7,
            transcendentals=0),
        interpret=interpret,
    )(*([uP] * 9), *([vP] * 9), pxP, pyP, mP)
    return ou[:, :h, :w], ov[:, :h, :w]
