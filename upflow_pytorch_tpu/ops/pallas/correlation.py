"""Fused Pallas correlation kernel (TPU).

The TPU-native replacement for the reference's CUDA correlation extension
(/root/reference/model/correlation_package/correlation_cuda_kernel.cu:41-114).
Same math as ``ops.correlation.correlation_xla``:

    out[b, h, w, k] = (1/C) * sum_c f1[b,h,w,c] * f2pad[b, h+dy, w+dx, c]

Design (vs the 81-shift XLA path, which materializes intermediate slices
and re-reads f2 from HBM): both feature maps are staged into VMEM once per
(batch, row-tile) grid step — f2 zero-padded by D so every displacement is
a static in-VMEM slice — and the kernel accumulates the 81-tap channel
reduction entirely in registers on the VPU.  Layout is (C, H, W) per batch
so the channel reduction is an FMA accumulation over (H_t, W) vregs with
no cross-lane reduces.

The op carries a custom VJP: the backward formulas are pure static-shift
multiply-reduces (no gathers) and run as plain XLA:

    d_f1[b,p,c]  = (1/C) * sum_k g[b,p,k]        * f2pad[b, p+d_k, c]
    d_f2[b,q,c]  = (1/C) * sum_k gpad[b, q-d_k, k] * f1pad_k[b, q-d_k, c]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _corr_kernel(f1_ref, f2_ref, out_ref, *, n_ch: int, disp: int,
                 row_tile: int):
    """Grid: (B, H // row_tile).

    f1_ref:  (1, C, row_tile, W)           current row tile of image 1
    f2_ref:  (1, C, K, row_tile, W + 2D)   K row-shifted copies of image 2
                                           (built by the caller so every
                                           in-kernel slice is static — this
                                           toolchain rejects dynamic-start
                                           sublane slices)
    out_ref: (1, K*K, row_tile, W)
    """
    k = 2 * disp + 1
    w = out_ref.shape[3]
    inv_c = 1.0 / n_ch

    f1v = f1_ref[0]  # (C, row_tile, W)
    for ky in range(k):
        f2row = f2_ref[0, :, ky]  # (C, row_tile, W + 2D)
        for kx in range(k):
            prod = f1v * f2row[:, :, kx:kx + w]
            out_ref[0, ky * k + kx] = jnp.sum(prod, axis=0) * inv_c


def _pick_row_tile(h: int) -> int:
    """Mosaic requires the block's second-to-last dim to be divisible by 8
    or equal to the full array dim; whole-H blocks cover the small coarse
    pyramid levels (e.g. 6x20 at KITTI bench size)."""
    if h % 8 == 0:
        return 8
    return h


def _ceil_to(v: int, m: int) -> int:
    return -(-v // m) * m


def pallas_corr_viable(shape, disp: int = 4,
                       vmem_budget: int = 13 * 1024 * 1024) -> bool:
    """Trace-time check that the kernel's VMEM blocks fit the ~16MB scoped
    limit.  Mosaic pads the minor (lane) dim of every block to 128, so at
    coarse pyramid levels (W+2D of ~48 lanes padded to 128, whole-H row
    tiles) the f2 row-stack block alone can exceed the limit; those levels
    fall back to the XLA path (they are tiny — the Pallas win lives at the
    two finest levels)."""
    b, h, w, c = shape
    k = 2 * disp + 1
    rt = _pick_row_tile(h)
    wl = _ceil_to(w + 2 * disp, 128)
    rt_p = rt if rt % 8 == 0 else _ceil_to(rt, 8)
    f2_block = c * k * rt_p * wl * 4
    f1_block = c * rt_p * _ceil_to(w, 128) * 4
    out_block = k * k * rt_p * _ceil_to(w, 128) * 4
    return 2 * (f2_block + f1_block + out_block) <= vmem_budget


def _corr_fwd_pallas(f1: jax.Array, f2: jax.Array, disp: int) -> jax.Array:
    """NHWC in/out; internally (C,H,W) per batch."""
    b, h, w, c = f1.shape
    k = 2 * disp + 1
    f1t = jnp.transpose(f1.astype(jnp.float32), (0, 3, 1, 2))
    f2t = jnp.transpose(f2.astype(jnp.float32), (0, 3, 1, 2))
    f2p = jnp.pad(f2t, ((0, 0), (0, 0), (disp, disp), (disp, disp)))
    # K row-shifted views stacked on a new dim: (B, C, K, H, W+2D)
    f2rows = jnp.stack([f2p[:, :, ky:ky + h, :] for ky in range(k)], axis=2)
    row_tile = _pick_row_tile(h)
    grid = (b, h // row_tile)
    out = pl.pallas_call(
        functools.partial(_corr_kernel, n_ch=c, disp=disp, row_tile=row_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, c, row_tile, w), lambda bi, i: (bi, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, k, row_tile, w + 2 * disp),
                         lambda bi, i: (bi, 0, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k * k, row_tile, w),
                               lambda bi, i: (bi, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k * k, h, w), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * k * k * c,
            bytes_accessed=4 * b * h * w * (2 * c + k * k),
            transcendentals=0),
    )(f1t, f2rows)
    return jnp.transpose(out, (0, 2, 3, 1))


def _corr_bwd_xla(disp, res, g):
    """Backward via static shifts (mirrors correlation_cuda_kernel.cu:116-300
    math, channel-mean normalization included)."""
    f1, f2 = res
    b, h, w, c = f1.shape
    k = 2 * disp + 1
    g = g.astype(jnp.float32)
    f1f = f1.astype(jnp.float32)
    f2f = f2.astype(jnp.float32)
    f2p = jnp.pad(f2f, ((0, 0), (disp, disp), (disp, disp), (0, 0)))
    gp = jnp.pad(g, ((0, 0), (disp, disp), (disp, disp), (0, 0)))
    f1p = jnp.pad(f1f, ((0, 0), (disp, disp), (disp, disp), (0, 0)))

    d_f1 = jnp.zeros_like(f1f)
    d_f2 = jnp.zeros_like(f2f)
    for dy in range(-disp, disp + 1):
        for dx in range(-disp, disp + 1):
            kk = (dy + disp) * k + (dx + disp)
            f2_shift = jax.lax.dynamic_slice(
                f2p, (0, dy + disp, dx + disp, 0), (b, h, w, c))
            d_f1 = d_f1 + g[..., kk:kk + 1] * f2_shift
            # d_f2[q] += g[q - d, kk] * f1[q - d]
            g_shift = jax.lax.dynamic_slice(
                gp, (0, disp - dy, disp - dx, 0), (b, h, w, k * k)
            )[..., kk:kk + 1]
            f1_shift = jax.lax.dynamic_slice(
                f1p, (0, disp - dy, disp - dx, 0), (b, h, w, c))
            d_f2 = d_f2 + g_shift * f1_shift
    inv_c = 1.0 / c
    return (d_f1 * inv_c).astype(f1.dtype), (d_f2 * inv_c).astype(f2.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _corr_op(f1, f2, disp):
    return _corr_fwd_pallas(f1, f2, disp)


def _corr_op_fwd(f1, f2, disp):
    return _corr_fwd_pallas(f1, f2, disp), (f1, f2)


_corr_op.defvjp(_corr_op_fwd, _corr_bwd_xla)


def correlation_pallas(f1: jax.Array, f2: jax.Array,
                       max_displacement: int = 4) -> jax.Array:
    """Drop-in replacement for ``correlation_xla`` (NHWC -> NHW(2D+1)^2)."""
    assert f1.shape == f2.shape
    return _corr_op(f1, f2, max_displacement)
