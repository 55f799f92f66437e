"""Debug/introspection helpers.

``check_tensor`` mirrors the reference's de-facto profiler
(/root/reference/utils/tools.py:1677-1694); ``count_params`` and
``cost_analysis`` replace the thop-based model-size counter
(tools.py:1711-1715) with JAX-native equivalents.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax


def check_tensor(x: Any, name: str = "") -> str:
    x = np.asarray(x)
    msg = ("%s shape=%s dtype=%s max=%.5f min=%.5f mean=%.5f sum=%.5f"
           % (name, x.shape, x.dtype, x.max(), x.min(),
              x.mean(), x.sum()))
    print(msg)
    return msg


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def cost_analysis(fn, *args):
    """FLOPs / bytes-accessed of a jitted fn from XLA's own cost model."""
    lowered = jax.jit(fn).lower(*args)
    ca = lowered.compile().cost_analysis()
    return {"flops": ca.get("flops"), "bytes_accessed": ca.get("bytes accessed")}


def enable_nan_debugging():
    jax.config.update("jax_debug_nans", True)
