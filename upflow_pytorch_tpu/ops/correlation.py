"""Local cost-volume correlation, NHWC, TPU-first.

Semantics (the reference's single custom CUDA op — see
/root/reference/model/correlation_package/correlation_cuda_kernel.cu:41-114
and the pure-torch oracle /root/reference/utils/pytorch_correlation.py:10-50,
called with ``pad_size=4, kernel_size=1, max_displacement=4, stride1=1,
stride2=1`` at /root/reference/model/upflow.py:561-562):

    out[b, h, w, k] = (1/C) * sum_c f1[b, h, w, c] * f2[b, h+dy, w+dx, c]

with displacement index ``k = (dy+D)* (2D+1) + (dx+D)`` for
``dy, dx in [-D, D]`` and zero padding outside ``f2``.  NOTE the channel
MEAN (divide by C), not sum, and the LeakyReLU applied by the caller, not
inside the op.

This module provides the always-available pure-XLA implementation: a
shifted-window multiply-reduce that XLA fuses into 81 VPU passes over a
VMEM-resident tile.  ``upflow_pytorch_tpu.ops.pallas.correlation`` provides a
fused single-pass Pallas kernel with a custom VJP; ``correlation`` dispatches
between them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def correlation_xla(f1: jax.Array, f2: jax.Array, max_displacement: int = 4) -> jax.Array:
    """Pure-XLA correlation. f1, f2: (B, H, W, C) -> (B, H, W, (2D+1)**2)."""
    assert f1.shape == f2.shape, (f1.shape, f2.shape)
    b, h, w, c = f1.shape
    d = int(max_displacement)
    k = 2 * d + 1
    f1 = f1.astype(jnp.float32)
    f2p = jnp.pad(f2.astype(jnp.float32), ((0, 0), (d, d), (d, d), (0, 0)))
    outs = []
    for dy in range(-d, d + 1):
        for dx in range(-d, d + 1):
            shifted = jax.lax.dynamic_slice(
                f2p, (0, dy + d, dx + d, 0), (b, h, w, c))
            outs.append(jnp.sum(f1 * shifted, axis=-1))
    out = jnp.stack(outs, axis=-1) / c
    return out


def _pallas_available() -> bool:
    """Pallas kernels compile only on TPU; honor CPU default-device
    overrides (e.g. CPU-side param init) like the warp dispatch does."""
    import os

    from upflow_pytorch_tpu.ops.pallas_gate import pallas_disabled

    if pallas_disabled() or os.environ.get("UPFLOW_DISABLE_PALLAS_CORR"):
        return False
    if jax.default_backend() != "tpu":
        return False
    dd = jax.config.jax_default_device
    return dd is None or getattr(dd, "platform", "tpu") == "tpu"


def correlation(f1: jax.Array, f2: jax.Array, max_displacement: int = 4,
                use_pallas: bool = False) -> jax.Array:
    """Cost-volume correlation with backend dispatch.

    ``use_pallas=False`` is the oracle path (mirrors the reference's
    ``if_use_cor_pytorch`` fallback-selection at upflow.py:557-562); the
    Pallas kernel additionally requires a TPU backend at trace time.
    """
    if use_pallas and _pallas_available():
        from upflow_pytorch_tpu.ops.pallas.correlation import (
            correlation_pallas,
            pallas_corr_viable,
        )
        if pallas_corr_viable(f1.shape, max_displacement):
            return correlation_pallas(f1, f2,
                                      max_displacement=max_displacement)
    return correlation_xla(f1, f2, max_displacement=max_displacement)
