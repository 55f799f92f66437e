"""Pallas TPU kernel for dense bilinear warping of small-channel images.

Motivation: XLA:TPU lowers per-pixel gathers to scalar-core dynamic slices
(~25ns/index) — measured to dominate the whole UPFlow forward pass (the
full-resolution SGU blend warp alone costs ~25ms at KITTI size).  The TPU
has no vector 2D-gather, but Mosaic DOES support two restricted vector
gathers: along lanes within a 128-lane window, and along sublanes within
an 8-row group.  This kernel decomposes the warp into those primitives:

For each (8 x 128) output tile, the bilinear support of every pixel lies
within a bounded displacement window (|u| <= RX, |v| <= RY, checked by the
wrapper).  The source region is pre-staged as S = YB*T statically-shifted
(C x 8 x 128) blocks (built with plain XLA pads/slices, so all in-kernel
slicing is static — this toolchain rejects dynamic-start sublane slices;
layout is channels-FIRST so the 128-wide spatial dim sits on lanes).  For
each candidate source row j of each shifted block, a 128-lane vector
gather fetches the two x-taps for all 1024 output pixels at once, and
masked FMAs accumulate the taps whose (row, segment) matches.  Total cost
is a few VPU ops/pixel vs ~24 scalar-core cycles/pixel for XLA's gather.

Semantics are EXACTLY ``ops.warp.flow_warp`` (zero outside the image):
out-of-window flows are handled by the wrapper's ``lax.cond`` fallback to
the XLA path, so the op is always exact; the fast path simply engages
whenever the flow magnitude permits (always, in practice, for the SGU
interpolation flows and KITTI-scale motions).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_SUB = 8


def _warp_kernel(flow_ref, src_ref, out_ref, *, n_ch: int, yb: int, t: int,
                 off_y: int):
    """Grid (B, H//8, W//128).

    flow_ref: (1, 2, 8, 128)            (u, v) planes for this tile
    src_ref:  (1, YB*T, C, 8, 128)      statically shifted source blocks;
              block s=(b_y*T + b_t) row j holds padded-image local rows
              [b_y*8 - off_y + j] and local cols [(b_t-1)*128, +128).
    out_ref:  (1, C, 8, 128)
    """
    u = flow_ref[0, 0]
    v = flow_ref[0, 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 1
                                    ).astype(jnp.float32)
    sub = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 0
                                   ).astype(jnp.float32)

    px = lane + u  # x relative to this tile's first column
    py = sub + v   # y relative to this tile's first row
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    # torch grid_sampler weight arithmetic (see ops/warp.py)
    wx1 = px - x0
    wx0 = (x0 + 1.0) - px
    wy1 = py - y0
    wy0 = (y0 + 1.0) - py
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # per-tile tap ranges: a block whose rows/cols intersect no pixel's
    # bilinear support is skipped at runtime (smooth flows touch ~4 of
    # the YB*T candidate blocks per tile, so large windows stay cheap)
    y0_min = jnp.min(y0i)
    y0_max = jnp.max(y0i)
    x0_min = jnp.min(x0i)
    x0_max = jnp.max(x0i)

    def step(s, acc):
        b_y = s // t
        b_t = s - b_y * t
        row_base = b_y * _SUB - off_y
        col_base = (b_t - 1) * _LANE
        hit = ((y0_max + 1 >= row_base) & (y0_min <= row_base + _SUB - 1)
               & (x0_max + 1 >= col_base) & (x0_min <= col_base + _LANE - 1))

        def compute(acc):
            xl0 = x0i - col_base
            xl1 = xl0 + 1
            val0 = ((xl0 >= 0) & (xl0 < _LANE)).astype(jnp.float32)
            val1 = ((xl1 >= 0) & (xl1 < _LANE)).astype(jnp.float32)
            xg0 = jnp.clip(xl0, 0, _LANE - 1)
            xg1 = jnp.clip(xl1, 0, _LANE - 1)
            wxa = wx0 * val0
            wxb = wx1 * val1
            for j in range(_SUB):
                row_local = row_base + j
                wy_match = (jnp.where(y0i == row_local, wy0, 0.0)
                            + jnp.where(y0i + 1 == row_local, wy1, 0.0))
                new_acc = []
                for c in range(n_ch):
                    brow = jnp.broadcast_to(
                        src_ref[0, s, c, j:j + 1, :], (_SUB, _LANE))
                    g0 = jnp.take_along_axis(brow, xg0, axis=1)
                    g1 = jnp.take_along_axis(brow, xg1, axis=1)
                    new_acc.append(acc[c] + wy_match * (wxa * g0 + wxb * g1))
                acc = tuple(new_acc)
            return acc

        return jax.lax.cond(hit, compute, lambda a: a, acc)

    acc = jax.lax.fori_loop(
        0, yb * t, step,
        tuple(jnp.zeros((_SUB, _LANE), jnp.float32) for _ in range(n_ch)))
    for c in range(n_ch):
        out_ref[0, c] = acc[c]


def _warp_kernel_resident(fu_ref, fv_ref, *rest, n_ch: int, yb: int, t: int,
                          off_y: int):
    """Resident-plane variant of ``_warp_kernel``: the whole zero-padded
    source planes live in VMEM (index map constant per batch element, so
    they are DMA'd once per batch item instead of YB*T shifted copies
    re-DMA'd per tile — the shifted-blocks kernel measured ~10 ms at
    (4, 384, 1280) with the per-tile DMA as the floor).  Candidate
    (8, 128) slabs are sliced directly from the resident plane with
    dynamic 8/128-aligned starts (both probed green on Mosaic).

    The block loops run with DYNAMIC bounds derived from the tile's
    actual bilinear support (min/max of the tap coords) — smooth flows
    visit ~2x2 of the yb*t candidate blocks instead of scanning all of
    them.  Inside a visited block the 8-row slab work stays DENSE and
    vectorized: a per-row scalar ``pl.when`` variant was measured 3.7x
    SLOWER than dense rows under adversarial uniform flows (53.7 vs
    14.4 ms at (4,384,1280) r_y=40 — the predicated regions break VPU
    pipelining), while dense rows waste at most ~2x on smooth flows.
    """
    plane_refs = rest[:n_ch]
    out_refs = rest[n_ch:2 * n_ch]
    acc_ref = rest[2 * n_ch]
    ti = pl.program_id(1)
    tj = pl.program_id(2)

    u = fu_ref[0]
    v = fv_ref[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 1
                                    ).astype(jnp.float32)
    sub = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 0
                                   ).astype(jnp.float32)
    px = lane + u
    py = sub + v
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx1 = px - x0
    wx0 = (x0 + 1.0) - px
    wy1 = py - y0
    wy0 = (y0 + 1.0) - py
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    y0_min = jnp.min(y0i)
    y0_max = jnp.max(y0i)
    x0_min = jnp.min(x0i)
    x0_max = jnp.max(x0i)

    acc_ref[...] = jnp.zeros_like(acc_ref)

    # blocks intersecting the support (in-contract flows never clip:
    # off_y >= r_y+1 and yb*8-off_y-1 >= r_y+9 by construction; the
    # clips only bind on zero-flow padded tiles)
    by_lo = jnp.clip((y0_min + off_y) // _SUB, 0, yb - 1)
    by_hi = jnp.clip((y0_max + 1 + off_y) // _SUB, 0, yb - 1)
    bt_lo = jnp.clip(x0_min // _LANE + 1, 0, t - 1)
    bt_hi = jnp.clip((x0_max + 1) // _LANE + 1, 0, t - 1)

    xl0_all = x0i + _LANE  # local col in block b_t, minus col_base applied per block

    def by_body(b_y, carry):
        row_base = b_y * _SUB - off_y          # local row of slab row 0
        # padded-plane coords: local row r maps to padded row
        # ti*8 + r + off_y, local col c to padded col tj*128 + c + 128
        rs = pl.multiple_of(ti * _SUB + b_y * _SUB, _SUB)

        def bt_body(b_t, carry2):
            col_base = (b_t - 1) * _LANE
            cs = pl.multiple_of(tj * _LANE + b_t * _LANE, _LANE)
            xl0 = xl0_all - b_t * _LANE
            xl1 = xl0 + 1
            val0 = ((xl0 >= 0) & (xl0 < _LANE)).astype(jnp.float32)
            val1 = ((xl1 >= 0) & (xl1 < _LANE)).astype(jnp.float32)
            xg0 = jnp.clip(xl0, 0, _LANE - 1)
            xg1 = jnp.clip(xl1, 0, _LANE - 1)
            wxa = wx0 * val0
            wxb = wx1 * val1
            for c in range(n_ch):
                slab = plane_refs[c][0, pl.ds(rs, _SUB), pl.ds(cs, _LANE)]
                upd = jnp.zeros((_SUB, _LANE), jnp.float32)
                for j in range(_SUB):
                    row_local = row_base + j
                    wy_match = (jnp.where(y0i == row_local, wy0, 0.0)
                                + jnp.where(y0i + 1 == row_local, wy1, 0.0))
                    brow = jnp.broadcast_to(slab[j:j + 1, :], (_SUB, _LANE))
                    g0 = jnp.take_along_axis(brow, xg0, axis=1)
                    g1 = jnp.take_along_axis(brow, xg1, axis=1)
                    upd = upd + wy_match * (wxa * g0 + wxb * g1)
                acc_ref[c] += upd
            return carry2

        return jax.lax.fori_loop(bt_lo, bt_hi + 1, bt_body, carry)

    jax.lax.fori_loop(by_lo, by_hi + 1, by_body, 0)
    for c in range(n_ch):
        out_refs[c][0] = acc_ref[c]


def _window_warp_resident(planes, flow_u, flow_v, r_y: int, r_x: int):
    """Planar windowed warp on resident VMEM planes.

    planes: tuple of (B, H, W); flow_u/flow_v: (B, H, W).
    Returns tuple of (B, H, W) fp32.  REQUIRES |u| <= r_x, |v| <= r_y.
    """
    n_ch = len(planes)
    b, h, w = planes[0].shape
    assert r_x <= _LANE - 2 and r_y <= 46, (r_y, r_x)
    off_y = _SUB * (-(-(r_y + 1) // _SUB))
    yb = -(-(_SUB + r_y + 2 + off_y) // _SUB)
    t = 3

    hp = -(-h // _SUB) * _SUB
    wp = -(-w // _LANE) * _LANE
    fu = jnp.pad(flow_u.astype(jnp.float32),
                 ((0, 0), (0, hp - h), (0, wp - w)))
    fv = jnp.pad(flow_v.astype(jnp.float32),
                 ((0, 0), (0, hp - h), (0, wp - w)))
    top = off_y
    bottom = yb * _SUB - off_y + hp - h
    left = _LANE
    right = (t - 1) * _LANE + wp - w
    padded = [jnp.pad(p.astype(jnp.float32),
                      ((0, 0), (top, bottom), (left, right)))
              for p in planes]
    hpad = h + top + bottom
    wpad = w + left + right

    grid = (b, hp // _SUB, wp // _LANE)
    tile = pl.BlockSpec((1, _SUB, _LANE), lambda bi, i, g: (bi, i, g),
                        memory_space=pltpu.VMEM)
    whole = pl.BlockSpec((1, hpad, wpad), lambda bi, i, g: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_warp_kernel_resident, n_ch=n_ch, yb=yb, t=t,
                          off_y=off_y),
        grid=grid,
        in_specs=[tile, tile] + [whole] * n_ch,
        out_specs=[tile] * n_ch,
        out_shape=[jax.ShapeDtypeStruct((b, hp, wp), jnp.float32)] * n_ch,
        scratch_shapes=[pltpu.VMEM((n_ch, _SUB, _LANE), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=10 * b * hp * wp * n_ch,
            bytes_accessed=4 * b * (hpad * wpad * n_ch + 4 * hp * wp),
            transcendentals=0),
    )(fu, fv, *padded)
    if n_ch == 1:
        outs = [outs] if not isinstance(outs, (list, tuple)) else outs
    return tuple(o[:, :h, :w] for o in outs)


def _build_shifted_blocks(img_chw: jax.Array, yb: int, t: int, off_y: int,
                          hp: int, wp: int) -> jax.Array:
    """(B, C, H, W) -> (B, YB*T, C, Hp, Wp) statically shifted zero-padded
    views such that block s=(b_y*T + b_t) at (h, w) equals
    imgpad[h + b_y*8 - off_y, w + (b_t-1)*128]."""
    b, c, h, w = img_chw.shape
    top = off_y
    bottom = yb * _SUB - off_y + hp - h
    left = _LANE
    right = (t - 1) * _LANE + wp - w
    imgp = jnp.pad(img_chw, ((0, 0), (0, 0), (top, max(bottom, 0)),
                             (left, max(right, 0))))
    views = []
    for b_y in range(yb):
        for b_t in range(t):
            views.append(jax.lax.dynamic_slice(
                imgp, (0, 0, b_y * _SUB, b_t * _LANE), (b, c, hp, wp)))
    return jnp.stack(views, axis=1)


def flow_warp_pallas_window(img: jax.Array, flow: jax.Array,
                            r_y: int = 20, r_x: int = 120) -> jax.Array:
    """Windowed fast warp; REQUIRES |u| <= r_x, |v| <= r_y elementwise.

    Use ``flow_warp_fast`` for the exact-cond-fallback wrapper.
    """
    img_chw = jnp.transpose(img.astype(jnp.float32), (0, 3, 1, 2))
    flow_t = jnp.transpose(flow.astype(jnp.float32), (0, 3, 1, 2))
    out = _window_warp_chw(img_chw, flow_t, r_y, r_x)
    h, w = img.shape[1:3]
    return jnp.transpose(out, (0, 2, 3, 1))[:, :h, :w]


def flow_warp_pallas_window_planar(planes, flow_u, flow_v,
                                   r_y: int = 20, r_x: int = 120):
    """Planar-boundary windowed warp: tuple of (B, H, W) image planes +
    (B, H, W) flow components in, tuple of (B, H, W) fp32 planes out.

    Planar because XLA:TPU lays (B, H, W, 2) tensors out with C=2 on the
    128-lane axis (64x padded) inside large graphs, so callers composing
    full-resolution stages (the SGU final medium tier) stay planar
    throughout and only stack at the very end.

    Two cores, selected by UPFLOW_WINDOW_WARP (default ``resident``):

    - ``resident``: whole zero-padded planes live in VMEM (DMA'd once per
      batch element); candidate (8, 128) slabs are sliced with aligned
      dynamic starts and pruned per-tile against the tile's actual
      bilinear support (min/max of the tap coords), so smooth flows skip
      most of the yb*t candidate blocks' compute.
    - ``blocks``: the round-4.0 shifted-blocks core (XLA materialises
      yb*t statically shifted padded copies; per-tile tap-range skipping
      of compute only — every block is still DMA'd).

    On-chip at (4, 384, 1280), r_y=40/r_x=120, chained-loop timed
    (bench.py methodology — block_until_ready is NOT a sync on the
    axon relay): adversarial uniform flows resident 13.6 ms vs blocks
    14.4 ms per 2-plane warp; the gap comes from smooth flows (the real
    SGU regime) where the support-pruning collapses the candidate set.

    The resident core pins the whole zero-padded planes in VMEM and is
    gated by a trace-time byte budget (frames much larger than KITTI —
    e.g. 1080p needs ~22 MB of planes — would fail Mosaic compilation
    even inside an untaken ``lax.cond`` branch); oversized frames use
    the blocks core automatically.
    """
    import os

    core = os.environ.get("UPFLOW_WINDOW_WARP", "resident")
    if core not in ("resident", "blocks"):
        raise ValueError(
            "UPFLOW_WINDOW_WARP must be 'resident' or 'blocks', got %r"
            % core)
    if core == "resident" and _resident_planes_fit(
            planes[0].shape, len(planes), r_y):
        return _window_warp_resident(planes, flow_u, flow_v, r_y, r_x)
    h, w = planes[0].shape[1:3]
    img_chw = jnp.stack([p.astype(jnp.float32) for p in planes], axis=1)
    flow_t = jnp.stack([flow_u.astype(jnp.float32),
                        flow_v.astype(jnp.float32)], axis=1)
    out = _window_warp_chw(img_chw, flow_t, r_y, r_x)
    return tuple(out[:, c, :h, :w] for c in range(len(planes)))


def _resident_planes_fit(plane_shape, n_ch: int, r_y: int,
                         budget: int = 12 * 1024 * 1024) -> bool:
    """Trace-time VMEM gate for the resident window-warp core: the
    whole-plane BlockSpecs plus the per-tile flow/out/scratch blocks must
    fit scoped VMEM (~16 MB) with headroom for double-buffering."""
    _, h, w = plane_shape
    off_y = _SUB * (-(-(r_y + 1) // _SUB))
    yb = -(-(_SUB + r_y + 2 + off_y) // _SUB)
    hp = -(-h // _SUB) * _SUB
    wp = -(-w // _LANE) * _LANE
    hpad = h + off_y + (yb * _SUB - off_y + hp - h)
    wpad = w + _LANE + (2 * _LANE + wp - w)
    planes_bytes = n_ch * hpad * wpad * 4
    tiles_bytes = (3 + n_ch) * 2 * _SUB * _LANE * 4  # fu, fv, outs (dbl-buf)
    scratch = n_ch * _SUB * _LANE * 4
    return planes_bytes + tiles_bytes + scratch <= budget


def _window_warp_chw(img_chw: jax.Array, flow_chw: jax.Array,
                     r_y: int, r_x: int) -> jax.Array:
    """Core windowed warp on (B, C, H, W) fp32; returns (B, C, Hp, Wp)."""
    b, c, h, w = img_chw.shape
    assert c <= 4, "kernel is specialized for small channel counts"
    assert r_x <= _LANE - 2 and r_y <= 46, (r_y, r_x)
    off_y = _SUB * (-(-(r_y + 1) // _SUB))  # ceil to multiple of 8
    yb = -(-(_SUB + r_y + 2 + off_y) // _SUB)
    t = 3

    hp = -(-h // _SUB) * _SUB
    wp = -(-w // _LANE) * _LANE
    pad_h = hp - h
    pad_w = wp - w
    flow_t = jnp.pad(flow_chw, ((0, 0), (0, 0), (0, pad_h), (0, pad_w)))
    src = _build_shifted_blocks(img_chw, yb, t, off_y, hp, wp)

    grid = (b, hp // _SUB, wp // _LANE)
    out = pl.pallas_call(
        functools.partial(_warp_kernel, n_ch=c, yb=yb, t=t, off_y=off_y),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2, _SUB, _LANE),
                         lambda bi, i, g: (bi, 0, i, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, yb * t, c, _SUB, _LANE),
                         lambda bi, i, g: (bi, 0, 0, i, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, _SUB, _LANE),
                               lambda bi, i, g: (bi, 0, i, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, hp, wp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * hp * wp * c * yb * t,
            bytes_accessed=4 * b * hp * wp * c * (yb * t + 2),
            transcendentals=0),
    )(flow_t, src)
    return out


def flow_warp_fast(img: jax.Array, flow: jax.Array,
                   r_y: int = 20, r_x: int = 120):
    """Exact ``flow_warp`` (zero-pad bilinear, tools.py:1275 semantics) that
    takes the Pallas fast path whenever the flow fits the window and falls
    back to the XLA gather otherwise (lax.cond executes ONE branch).

    Returns (warped, wsum) like ``ops.warp._bilinear_zero_pad``.
    """
    from upflow_pytorch_tpu.ops.warp import (
        _abs_coords, _abs_coords_torch_grid, _bilinear_zero_pad)

    b, h, w, c = img.shape
    # torch grid_sample roundtrip coords (see _torch_grid_roundtrip): the
    # mask/wsum and the slow path use them exactly; the fast path folds
    # them back into an effective flow (sub-ulp re-add noise only).
    px, py = _abs_coords_torch_grid(flow)
    gx, gy = _abs_coords(jnp.zeros_like(flow))

    fl = flow.astype(jnp.float32)
    fl_eff = jnp.stack([px - gx, py - gy], axis=-1)
    in_range = (jnp.max(jnp.abs(fl[..., 0])) <= r_x - 1) & \
               (jnp.max(jnp.abs(fl[..., 1])) <= r_y - 1)

    def fast(_):
        return flow_warp_pallas_window(img, fl_eff, r_y, r_x)

    def slow(_):
        out, _ = _bilinear_zero_pad(img, px, py)
        return out

    out = jax.lax.cond(in_range, fast, slow, None)

    # analytic warp-of-ones (pure vector math, no gather)
    from upflow_pytorch_tpu.ops.warp import _analytic_wsum

    wsum = _analytic_wsum(img.shape, px, py)
    return out.astype(img.dtype), wsum
