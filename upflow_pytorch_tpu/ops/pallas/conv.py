"""Segmented 3x3/stride-1 Pallas conv for the decoder's dense stacks.

Replaces the reference's materialize-concat-then-conv pattern
(/root/reference/model/pwc_modules.py:250-286,396-412 — torch ``cat`` then
``nn.Conv2d``) with a kernel that reads each concat SEGMENT directly from
HBM, so the DenseNet concats never materialize, and computes the 9-tap
conv as MXU matmuls:

  - per grid step (one (tile_h, tile_w) output tile of one batch item)
    the kernel DMAs, for every input segment, the (tile_h + 2d)-row slab
    it needs into VMEM (double-buffered across grid steps; halos overlap
    so BlockSpec blocks cannot express them);
  - for each row tap ky and segment s: ONE ``dot_general`` contracts the
    slab's channel dim against w[ky, kx] (no im2col copy — the 3D slab
    view is consumed directly);
  - the three column taps kx reuse the same matmuls on the full slab
    width and combine by rolling the narrow fp32 accumulator
    (cost: a few % extra matmul columns, two rolls);
  - bias + optional LeakyReLU(0.1) fuse into the epilogue.

Inputs are cast to bf16 for the MXU (fp32 accumulation) — this is the
bfloat16 compute path; fp32-exact models keep the XLA conv.  Measured
(v5e, B=4, 96x320): 565->128 at ~79 TFLOP/s vs ~35-52 for XLA:TPU's conv
at batch 4.  (At batch 8 XLA reaches ~178 TFLOP/s, but batch-8 convs
in-graph force batch-minor relayouts through the surrounding graph —
see STATUS_ROUND2.md — so the model runs per-direction at B=4.)

The op carries a custom VJP that computes gradients with plain XLA convs
on the materialized concat (transposed-kernel conv for d_x, per-tap
einsums for d_w), so training gradients are exact and well-tested while
the kernel stays inference-shaped.

STORED LAYOUT (round 3): profiling showed ~6 ms/batch of per-call
spatial pads — every conv staged every segment into a (d-left, d-top)
zero-padded buffer, one HBM round-trip per segment per level.  The
stored-layout path removes them: tensors flow between convs as
``(B, HS, WS, CP)`` bf16 buffers with real data at the origin,
ARBITRARY (garbage) spatial tails, and ZERO channel pads inside the
real region (the producing kernel writes them as zeros; they pair with
zero weight rows), and the kernel fetches its own halos —
the slab DMA starts 8 columns left / ``d`` rows above the tile (clamped
at the array edge via four statically-shaped predicated DMA variants)
and the kernel zeroes the slab rows/columns that fall outside the real
image, so out-of-image taps contribute exactly 0 without any pre-padded
copy existing.  Producers emit the stored layout for free (the out
buffer is simply allocated at stored extents; blocks land at their
natural offsets).  Dense-stack intermediates therefore never touch a
pad: only the stack's raw entry segments pay one staging copy.
Constraint: d <= 8 (= tile_h, so only the first tile row/col ever
clamps); the context network's single d=16 conv keeps the staged path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 14 * 1024 * 1024  # scoped-vmem limit is 16M; leave headroom

_TILE_H = 8
_L8 = 8                    # stored-path left-halo fetch (8-aligned)
_ROW_SLACK = 8             # stored rows beyond ceil(h, 8)
_COL_SLACK = 32            # stored cols beyond ceil(w, 8)


def _ceil_to(v: int, m: int) -> int:
    return -(-v // m) * m


def stored_hw(h: int, w: int):
    """Spatial extents of the stored inter-conv layout for a real (h, w)
    map: covers any consumer with d <= 8 and a ``wp <= ceil(w,8)+8``
    tiling (enforced by ``_pick_tiles``)."""
    return _ceil_to(h, _TILE_H) + _ROW_SLACK, _ceil_to(w, 8) + _COL_SLACK


def _compute_tile(slab_view, w_ref, b_ref, out_ref, *, tile_h, tile_w,
                  slab_w, d, seg_ch, cout, relu, tap_pack, o):
    """Shared compute epilogue on a coalesced (rows, slab_w, Ctot) slab.

    ``o`` is the lane base offset of image column ``col0`` inside the
    slab (0 on the staged path whose inputs are pre-padded by d; 8 - d
    on the stored path which self-fetches an 8-aligned left halo).

    Wide-cout path (cout >= 96): the 3 kx taps are packed along N
    (w laid out (3, Ctot, 3*cout_l)), so each ky is ONE dot of
    N = 3*cout_l over the whole channel dim — 3 dots per tile instead
    of 9*n_seg (round-4 rewrite; the narrow per-(ky,seg) dots left the
    MXU underfed).  kx blocks then combine by aligned lane slices +
    sublane rolls of the fp32 z.

    Small-cout path: ONE dot for the whole slab with all 9 taps packed
    along N (w (Ctot, 9*cout_p)); taps combine by row slices, sublane
    rolls and lane rolls.  This sidesteps XLA:TPU's tiny-N conv
    pathology (cout=2 convs measured at 1 TFLOP/s there).
    """
    dn = (((2,), (0,)), ((), ()))
    if not tap_pack:
        cout_l = w_ref.shape[-1] // 3
        accs = [None, None, None]
        for ky in range(3):
            lhs = slab_view[ky * d:ky * d + tile_h]
            z = jax.lax.dot_general(lhs, w_ref[ky], dn,
                                    preferred_element_type=jnp.float32)
            for kx in range(3):
                zz = z[:, :, kx * cout_l:(kx + 1) * cout_l]
                accs[kx] = zz if accs[kx] is None else accs[kx] + zz
        acc = None
        for kx in range(3):
            sh = o + kx * d
            zz = (pltpu.roll(accs[kx], slab_w - sh, 1) if sh
                  else accs[kx])[:, 0:tile_w]
            acc = zz if acc is None else acc + zz
    else:
        n_pack = w_ref.shape[-1]
        z = jax.lax.dot_general(slab_view, w_ref[...], dn,
                                preferred_element_type=jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_pack), 2)
        acc = jnp.zeros((tile_h, tile_w, n_pack), jnp.float32)
        for ky in range(3):
            for kx in range(3):
                t = ky * 3 + kx
                zz = z[ky * d:ky * d + tile_h]
                sh = o + kx * d
                if sh:
                    zz = pltpu.roll(zz, slab_w - sh, 1)
                zz = zz[:, 0:tile_w]
                if t:
                    zz = pltpu.roll(zz, n_pack - t * cout, 2)
                acc = acc + jnp.where(lane < cout, zz, 0.0)
        acc = acc[:, :, :out_ref.shape[-1]]
    acc = acc + b_ref[0].astype(jnp.float32)[None, None, :]
    if relu:
        acc = jnp.where(acc >= 0, acc, acc * 0.1)
    out_ref[0] = acc.astype(out_ref.dtype)


def _seg_kernel(*refs, tile_h: int, tile_w: int, dilation: int,
                seg_ch, cout: int, relu: bool, tap_pack: bool):
    """Grid (B, H/tile_h, W/tile_w).

    refs: [x_0 .. x_{S-1}] (HBM, padded), w (VMEM), b (VMEM, (1, cout)),
          out (VMEM block), then scratch: slab (VMEM
          (2, tile_h+2d, slab_w, Ctot) — ONE coalesced buffer, each
          segment DMA'd to its 128-aligned channel offset), sems
          ((S, 2) DMA semaphores).
    """
    n_seg = len(seg_ch)
    x_refs = refs[:n_seg]
    w_ref = refs[n_seg]
    b_ref = refs[n_seg + 1]
    out_ref = refs[n_seg + 2]
    slab = refs[n_seg + 3]
    sems = refs[n_seg + 4]

    bi = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    n_i = pl.num_programs(1)
    n_j = pl.num_programs(2)
    d = dilation
    slab_w = _ceil_to(tile_w + 2 * d, 8)
    step = (bi * n_i + ti) * n_j + tj
    slot = jax.lax.rem(step, 2)
    nxt = jax.lax.rem(step + 1, 2)
    ch0 = [0]
    for c in seg_ch[:-1]:
        ch0.append(ch0[-1] + c)

    def start_copies(b_, ti_, tj_, slot_):
        row0 = ti_ * tile_h
        col0 = pl.multiple_of(tj_ * tile_w, 8)
        for s in range(n_seg):
            pltpu.make_async_copy(
                x_refs[s].at[b_, pl.ds(row0, tile_h + 2 * d),
                             pl.ds(col0, slab_w)],
                slab.at[slot_, slice(None), slice(None),
                        pl.ds(ch0[s], seg_ch[s])],
                sems.at[s, slot_],
            ).start()

    @pl.when(step == 0)
    def _():
        start_copies(bi, ti, tj, slot)

    last = step == pl.num_programs(0) * n_i * n_j - 1

    @pl.when(jnp.logical_not(last))
    def _():
        nstep = step + 1
        nj_ = jax.lax.rem(nstep, n_j)
        ni_ = jax.lax.rem(nstep // n_j, n_i)
        nb_ = nstep // (n_i * n_j)
        start_copies(nb_, ni_, nj_, nxt)

    for s in range(n_seg):
        pltpu.make_async_copy(
            x_refs[s].at[bi, pl.ds(0, tile_h + 2 * d), pl.ds(0, slab_w)],
            slab.at[slot, slice(None), slice(None),
                    pl.ds(ch0[s], seg_ch[s])],
            sems.at[s, slot]).wait()

    _compute_tile(slab[slot], w_ref, b_ref, out_ref, tile_h=tile_h,
                  tile_w=tile_w, slab_w=slab_w, d=d, seg_ch=seg_ch,
                  cout=cout, relu=relu, tap_pack=tap_pack, o=0)


def _seg_kernel_stored(*refs, tile_h: int, tile_w: int, dilation: int,
                       seg_ch, cout: int, relu: bool, tap_pack: bool,
                       img_h: int, img_w: int):
    """Stored-layout variant of ``_seg_kernel`` (see module docstring).

    Inputs are (B, HS, WS, C_s) HBM buffers, real data at the origin,
    garbage tails.  The slab covers image rows [row0-d, row0+tile_h+d)
    and image cols [col0-8, col0-8+slab_w): boundary tiles clamp the DMA
    (four statically-shaped variants) and the kernel zeroes slab regions
    outside the real image, so SAME-conv zero taps need no pre-pad.
    Requires d <= tile_h and tile_w >= 8 (only the first tile row/col
    clamps).
    """
    n_seg = len(seg_ch)
    x_refs = refs[:n_seg]
    w_ref = refs[n_seg]
    b_ref = refs[n_seg + 1]
    out_ref = refs[n_seg + 2]
    slab = refs[n_seg + 3]
    sems = refs[n_seg + 4]

    bi = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    n_i = pl.num_programs(1)
    n_j = pl.num_programs(2)
    d = dilation
    rows = tile_h + 2 * d
    slab_w = _ceil_to(tile_w + 2 * d, 8) + _L8
    step = (bi * n_i + ti) * n_j + tj
    slot = jax.lax.rem(step, 2)
    nxt = jax.lax.rem(step + 1, 2)
    ch0 = [0]
    for c in seg_ch[:-1]:
        ch0.append(ch0[-1] + c)

    def issue(b_, ti_, tj_, slot_, start):
        row0 = ti_ * tile_h
        col0 = pl.multiple_of(tj_ * tile_w, 8)
        for top in (False, True):
            for left in (False, True):
                pred = (((ti_ == 0) if top else (ti_ != 0))
                        & ((tj_ == 0) if left else (tj_ != 0)))
                rs = 0 if top else row0 - d
                nr = rows - d if top else rows
                ro = d if top else 0
                # col0 and _L8 are both multiples of 8, but Mosaic's
                # divisibility prover cannot propagate the col0 hint
                # through the subtraction — re-assert it on the result
                # (tile index in the (8,128)-tiled stored memref's
                # second-minor dim must be provably 8-divisible)
                cs = 0 if left else pl.multiple_of(col0 - _L8, 8)
                nc = slab_w - _L8 if left else slab_w
                co = _L8 if left else 0

                @pl.when(pred)
                def _(rs=rs, nr=nr, ro=ro, cs=cs, nc=nc, co=co):
                    for s in range(n_seg):
                        cp = pltpu.make_async_copy(
                            x_refs[s].at[b_, pl.ds(rs, nr), pl.ds(cs, nc)],
                            slab.at[slot_, pl.ds(ro, nr), pl.ds(co, nc),
                                    pl.ds(ch0[s], seg_ch[s])],
                            sems.at[s, slot_])
                        (cp.start if start else cp.wait)()

    @pl.when(step == 0)
    def _():
        issue(bi, ti, tj, slot, True)

    @pl.when(step != pl.num_programs(0) * n_i * n_j - 1)
    def _():
        nstep = step + 1
        issue(nstep // (n_i * n_j), jax.lax.rem(nstep // n_j, n_i),
              jax.lax.rem(nstep, n_j), nxt, True)

    issue(bi, ti, tj, slot, False)   # wait (mirrors the started shapes)

    # --- zero the slab regions that fall outside the real image --------
    ctot = sum(seg_ch)

    def zero_rows(lo, hi):
        slab[slot, lo:hi] = jnp.zeros((hi - lo, slab_w, ctot), slab.dtype)

    def zero_cols(lo, hi):
        slab[slot, :, lo:hi] = jnp.zeros((rows, hi - lo, ctot), slab.dtype)

    if d > 0:
        @pl.when(ti == 0)
        def _():
            zero_rows(0, d)
    for k in range(1, n_i + 1):       # trailing tiles reading rows >= h
        rb = d + img_h - (n_i - k) * tile_h
        if rb >= rows:
            break

        @pl.when(ti == n_i - k)
        def _(rb=rb):
            zero_rows(max(rb, 0), rows)

    @pl.when(tj == 0)
    def _():
        zero_cols(0, _L8)
    for k in range(1, n_j + 1):       # trailing tiles reading cols >= w
        cb = _L8 + img_w - (n_j - k) * tile_w
        if cb >= slab_w:
            break

        @pl.when(tj == n_j - k)
        def _(cb=cb):
            zero_cols(max(cb, 0), slab_w)

    _compute_tile(slab[slot], w_ref, b_ref, out_ref, tile_h=tile_h,
                  tile_w=tile_w, slab_w=slab_w, d=d, seg_ch=seg_ch,
                  cout=cout, relu=relu, tap_pack=tap_pack, o=_L8 - d)


def _pick_tiles(h: int, w: int, d: int, seg_ch, cout_l: int,
                n_pack: int, stored: bool = False):
    """(tile_h, tile_w) sized to the VMEM budget.  tile_w is a multiple
    of 8 so every tile's slab start column is 8-aligned.  The stored
    path additionally requires ``n*tile_w <= ceil(w,8)+8`` so consumer
    reads stay inside the standard stored extents, and pays 8 extra
    slab columns (the self-fetched left halo)."""
    # tile_h fixed at 8: keeps the out-block grid uniform across the
    # stack (and, on the staged path, lets identical segment pads CSE)
    tile_h = _TILE_H
    for n in range(1, 65):
        tw = _ceil_to(-(-w // n), 8)
        if stored and n * tw > _ceil_to(w, 8) + 8:
            continue
        sw = _ceil_to(tw + 2 * d, 8) + (_L8 if stored else 0)
        slabs = 2 * (tile_h + 2 * d) * sw * sum(seg_ch) * 2
        wmem = 9 * sum(seg_ch) * cout_l * 2
        if n_pack:
            # z + acc + rolled temporaries (row-slice, sublane roll,
            # lane roll may be live simultaneously)
            work = ((tile_h + 2 * d) * sw * n_pack * 4
                    + 4 * tile_h * tw * n_pack * 4)
            wmem = sum(seg_ch) * n_pack * 2
        else:
            # kx-packed z (tile_h, sw, 3*cout_l) fp32 + acc + roll temp
            work = (tile_h * sw * 3 * cout_l * 4
                    + 3 * tile_h * tw * cout_l * 4)
        if slabs + work + wmem <= _VMEM_BUDGET:
            return tile_h, tw
    raise ValueError(f"no feasible tiling h={h} w={w} segs={seg_ch}")


def _pack_weights(w, b, real_chs, seg_ch, cout, cout_l, tap_pack, n_pack):
    wsegs, off = [], 0
    for c, cp in zip(real_chs, seg_ch):
        wsegs.append(jnp.pad(w[:, :, off:off + c],
                             ((0, 0), (0, 0), (0, cp - c), (0, 0))))
        off += c
    wcat = jnp.concatenate(wsegs, axis=2)  # (3, 3, sum(seg_ch), cout)
    if tap_pack:
        # (Cin_tot, 9*cout) with tap-major blocks t = ky*3 + kx
        wb = wcat.transpose(2, 0, 1, 3).reshape(sum(seg_ch), 9 * cout)
        wb = jnp.pad(wb, ((0, 0), (0, n_pack - 9 * cout))
                     ).astype(jnp.bfloat16)
    else:
        # (3, Cin_tot, 3*cout_l): per ky, the 3 kx taps packed along N
        wb = jnp.pad(wcat, ((0, 0), (0, 0), (0, 0), (0, cout_l - cout)))
        wb = wb.transpose(0, 2, 1, 3).reshape(
            3, sum(seg_ch), 3 * cout_l).astype(jnp.bfloat16)
    bb = jnp.pad(b.astype(jnp.float32), (0, cout_l - cout)).reshape(1, cout_l)
    return wb, bb


def _conv3x3_seg_fwd(inputs, real_chs, w, b, dilation: int, relu: bool,
                     out_pad: bool, interpret: bool = False,
                     img_hw=None, out_stored: bool = False):
    bsz = inputs[0].shape[0]
    if img_hw is None:
        h, wd = int(inputs[0].shape[1]), int(inputs[0].shape[2])
    else:
        h, wd = int(img_hw[0]), int(img_hw[1])
    hs, ws = stored_hw(h, wd)
    cout = w.shape[-1]
    cout_l = _ceil_to(cout, 128)
    d = dilation
    # every DMA'd buffer needs its minor (channel) dim 128-aligned:
    # manual-DMA slices must be tile-aligned in their last two dims.
    # Segments whose stored width is already a 128-multiple (outputs of
    # this kernel in stored/padded layout) are consumed as-is; others
    # get one channel pad here.  real_chs gives the live channels per
    # segment (pad channels pair with zero weight rows).
    seg_store = [int(x.shape[-1]) for x in inputs]
    seg_ch = [_ceil_to(c, 128) for c in seg_store]
    # small-cout convs pack all 9 taps along N (see _seg_kernel); the
    # wide-cout path would pad N to 128 per tap-free dot instead
    tap_pack = cout < 96
    n_pack = _ceil_to(9 * cout, 128) if tap_pack else 0

    def spatial(x):
        return int(x.shape[1]), int(x.shape[2])

    use_stored = d <= _TILE_H and not os.environ.get(
        "UPFLOW_FORCE_STAGED_CONV")
    if use_stored:
        try:
            tile_h, tile_w = _pick_tiles(h, wd, d, seg_ch, cout_l, n_pack,
                                         stored=True)
        except ValueError:
            use_stored = False
    if not use_stored:
        tile_h, tile_w = _pick_tiles(h, wd, d, seg_ch, cout_l, n_pack)
    hp = _ceil_to(h, tile_h)
    wp = _ceil_to(wd, tile_w)
    wb, bb = _pack_weights(w, b, real_chs, seg_ch, cout, cout_l, tap_pack,
                           n_pack)
    grid = (bsz, hp // tile_h, wp // tile_w)

    if use_stored:
        slab_w = _ceil_to(tile_w + 2 * d, 8) + _L8
        xps = []
        for x, cs, cp in zip(inputs, seg_store, seg_ch):
            if spatial(x) == (hs, ws):
                assert x.dtype == jnp.bfloat16, x.dtype
                xps.append(x)          # already stored — ZERO staging cost
            else:
                assert spatial(x) == (h, wd), (x.shape, (h, wd))
                xps.append(jnp.pad(x.astype(jnp.bfloat16),
                                   ((0, 0), (0, hs - h), (0, ws - wd),
                                    (0, cp - cs))))
        kern = functools.partial(
            _seg_kernel_stored, tile_h=tile_h, tile_w=tile_w, dilation=d,
            seg_ch=tuple(seg_ch), cout=cout if tap_pack else cout_l,
            relu=relu, tap_pack=tap_pack, img_h=h, img_w=wd)
        out_hw = (hs, ws) if out_stored else (hp, wp)
    else:
        slab_w = _ceil_to(tile_w + 2 * d, 8)
        xps = []
        for x, cs, cp in zip(inputs, seg_store, seg_ch):
            if spatial(x) != (h, wd):       # stored input into staged path
                x = x[:, :h, :wd]
            xps.append(jnp.pad(x.astype(jnp.bfloat16),
                               ((0, 0), (d, d + (hp - h) + tile_h),
                                (d, d + (wp - wd) + 8), (0, cp - cs))))
        kern = functools.partial(
            _seg_kernel, tile_h=tile_h, tile_w=tile_w, dilation=d,
            seg_ch=tuple(seg_ch), cout=cout if tap_pack else cout_l,
            relu=relu, tap_pack=tap_pack)
        out_hw = (hp, wp)

    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=([pl.BlockSpec(memory_space=pltpu.HBM)] * len(inputs)
                  + [pl.BlockSpec(wb.shape,
                                  lambda bi, i, j: (0,) * wb.ndim,
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((1, cout_l), lambda bi, i, j: (0, 0),
                                  memory_space=pltpu.VMEM)]),
        out_specs=pl.BlockSpec((1, tile_h, tile_w, cout_l),
                               lambda bi, i, j: (bi, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz,) + out_hw + (cout_l,),
                                       inputs[0].dtype),
        scratch_shapes=(
            [pltpu.VMEM((2, tile_h + 2 * d, slab_w, sum(seg_ch)),
                        jnp.bfloat16),
             pltpu.SemaphoreType.DMA((len(inputs), 2))]),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * hp * wp * sum(seg_ch) * cout_l * 9,
            bytes_accessed=2 * bsz * hp * wp * (sum(seg_ch) + cout_l),
            transcendentals=0),
        interpret=interpret,
    )(*xps, wb, bb)
    if out_stored:
        if not use_stored:
            # staged-path producer feeding stored consumers: one pad
            out = jnp.pad(out[:, :h, :wd],
                          ((0, 0), (0, hs - h), (0, ws - wd), (0, 0)))
        return out
    if out_pad:
        return out[:, :h, :wd, :]
    return out[:, :h, :wd, :cout]


def _xla_conv(x, w, stride=1, dilation=1):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    pad = dilation  # 3x3 SAME
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), ((pad, pad), (pad, pad)),
        rhs_dilation=(dilation, dilation), dimension_numbers=dn,
        preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _conv3x3_seg_op(inputs, w, b, real_chs, dilation: int, relu: bool,
                    out_pad: bool, interpret: bool, img_hw, out_stored):
    return _conv3x3_seg_fwd(inputs, real_chs, w, b, dilation, relu, out_pad,
                            interpret, img_hw, out_stored)


def _fwd(inputs, w, b, real_chs, dilation, relu, out_pad, interpret,
         img_hw, out_stored):
    out = _conv3x3_seg_fwd(inputs, real_chs, w, b, dilation, relu, out_pad,
                           interpret, img_hw, out_stored)
    return out, (inputs, w, out if relu else None)


def _bwd(real_chs, dilation, relu, out_pad, interpret, img_hw, out_stored,
         res, g):
    inputs, w, out = res
    if img_hw is None:
        h, wd = int(inputs[0].shape[1]), int(inputs[0].shape[2])
    else:
        h, wd = int(img_hw[0]), int(img_hw[1])
    cout = w.shape[-1]
    # cotangents of stored/padded outputs carry zero (or no) tails;
    # restrict everything to the real region
    g = g[:, :h, :wd, :cout].astype(jnp.float32)
    if relu:
        g = jnp.where(out[:, :h, :wd, :cout] >= 0, g, g * 0.1)
    # backward on the materialized REAL-region concat (training path;
    # gradients exact for the same primal values)
    x = jnp.concatenate(
        [t[:, :h, :wd, :c] for t, c in zip(inputs, real_chs)],
        axis=-1).astype(jnp.bfloat16)
    gb = g.astype(jnp.bfloat16)
    # d_x: conv of g with spatially-flipped, io-transposed kernel
    w_t = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2).astype(jnp.bfloat16)
    d_x = _xla_conv(gb, w_t, dilation=dilation)
    # d_w[ky,kx,ci,co] = sum_{b,y,x} xpad[b,y+ky*d,x+kx*d,ci] * g[b,y,x,co]
    d = dilation
    bsz, _, _, cin = x.shape
    xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
    taps = []
    for ky in range(3):
        for kx in range(3):
            xs = jax.lax.dynamic_slice(
                xp, (0, ky * d, kx * d, 0), (bsz, h, wd, cin))
            taps.append(jnp.einsum("bhwi,bhwo->io", xs, gb,
                                   preferred_element_type=jnp.float32))
    d_w = jnp.stack(taps).reshape(3, 3, cin, -1).astype(w.dtype)
    d_b = jnp.sum(g, axis=(0, 1, 2)).astype(jnp.float32)
    # split d_x back into segment grads, zero-padded to each input's
    # full stored shape (spatial tails and channel pads get zeros)
    splits, off = [], 0
    for t, c in zip(inputs, real_chs):
        gseg = d_x[..., off:off + c]
        gseg = jnp.pad(gseg, ((0, 0), (0, int(t.shape[1]) - h),
                              (0, int(t.shape[2]) - wd),
                              (0, int(t.shape[3]) - c)))
        splits.append(gseg.astype(t.dtype))
        off += c
    return tuple(splits), d_w, d_b


_conv3x3_seg_op.defvjp(_fwd, _bwd)


def conv3x3_seg(inputs, real_chs, w, b, dilation: int = 1,
                relu: bool = True, out_pad: bool = False,
                interpret: bool = False, img_hw=None,
                out_stored: bool = False):
    """bf16 3x3/stride-1 conv over unconcatenated channel segments.

    inputs: arrays whose first real_chs[i] channels are live, each
    either RAW (B, H, W, C_i) or in the STORED inter-conv layout
    (B, HS, WS, CP_i) with real data at the origin and arbitrary tails
    (see ``stored_hw``); w: (3, 3, sum(real_chs), Cout); b: (Cout,).
    Computes conv(concat(live channels)) + bias (+LeakyReLU(0.1)), bf16
    matmuls / fp32 accumulation, without materializing the concat.

    ``img_hw`` is the real (H, W) — required whenever any segment is
    stored.  ``out_stored=True`` emits the stored layout (zero copies in
    and out for stored-to-stored chains; d <= 8 only — larger dilations
    transparently use the staged kernel).  Legacy ``out_pad=True``
    returns a channel-padded (B, H, W, CP) array.
    """
    return _conv3x3_seg_op(tuple(inputs), w, b, tuple(real_chs), dilation,
                           relu, out_pad, interpret,
                           None if img_hw is None else
                           (int(img_hw[0]), int(img_hw[1])), out_stored)
