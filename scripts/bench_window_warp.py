"""On-chip A/B of the windowed planar warp cores (resident vs blocks).

Times `flow_warp_pallas_window_planar` at the SGU-final medium-tier bench
shape — (4, 384, 1280) planes, r_y=40 / r_x=120 — for both kernel cores,
and cross-checks their outputs on the chip.

Timing methodology = bench.py::_timed_loop_fn: the axon relay's
block_until_ready does NOT wait for device execution (an 8192^3 matmul
"measures" 0.05 ms with it), so each measurement is a chained
fori_loop with a salt data dependency whose scalar result is fetched to
host (the fetch is the only real sync), minus the measured dispatch
overhead of an equivalent no-op loop.

Usage: python scripts/bench_window_warp.py [--b 4 --h 384 --w 1280]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 20
RUNS = 3


def _median_loop_ms(k_steps, *args):
    float(k_steps(*args, jnp.float32(1.0)))  # compile + warm
    ts = []
    for i in range(RUNS):
        t0 = time.perf_counter()
        float(k_steps(*args, jnp.float32(2.0 + i)))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1e3


def _overhead_ms():
    @jax.jit
    def k_noop(salt):
        return jax.lax.fori_loop(
            0, ITERS, lambda i, acc: acc + salt * jnp.float32(1e-9),
            jnp.float32(0.0))
    return _median_loop_ms(k_noop)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--h", type=int, default=384)
    ap.add_argument("--w", type=int, default=1280)
    ap.add_argument("--ry", type=int, default=40)
    ap.add_argument("--rx", type=int, default=120)
    ap.add_argument("--smooth", action="store_true",
                    help="sinusoidal flows (the model regime: bilinear-"
                         "upsampled inter-flows are spatially smooth) "
                         "instead of adversarial uniform-random")
    a = ap.parse_args()

    rng = np.random.default_rng(0)
    shape = (a.b, a.h, a.w)
    planes = tuple(jnp.asarray(rng.normal(size=shape), jnp.float32)
                   for _ in range(2))
    if a.smooth:
        ys = np.arange(a.h)[None, :, None] / a.h
        xs = np.arange(a.w)[None, None, :] / a.w
        fu = ((a.rx - 1) * np.sin(2 * np.pi * (xs + 0.3 * ys))
              * np.ones(shape)).astype(np.float32)
        fv = ((a.ry - 1) * np.cos(2 * np.pi * (ys + 0.2 * xs))
              * np.ones(shape)).astype(np.float32)
        fu, fv = jnp.asarray(fu), jnp.asarray(fv)
    else:
        fu = jnp.asarray(rng.uniform(-(a.rx - 1), a.rx - 1, shape),
                         jnp.float32)
        fv = jnp.asarray(rng.uniform(-(a.ry - 1), a.ry - 1, shape),
                         jnp.float32)

    from upflow_pytorch_tpu.ops.pallas import warp as W

    over = _overhead_ms()
    print(f"dispatch overhead: {over:.2f} ms/loop")

    outs = {}
    for mode in ("resident", "blocks"):
        os.environ["UPFLOW_WINDOW_WARP"] = mode

        @jax.jit
        def k_steps(planes, fu, fv, salt):
            def body(i, acc):
                o = W.flow_warp_pallas_window_planar(
                    (planes[0] + acc * 1e-12 + salt * 1e-9, planes[1]),
                    fu, fv, r_y=a.ry, r_x=a.rx)
                return acc + jnp.sum(o[0][:, ::64, ::64])
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

        @jax.jit
        def once(planes, fu, fv):
            return W.flow_warp_pallas_window_planar(
                planes, fu, fv, r_y=a.ry, r_x=a.rx)

        try:
            ms = (_median_loop_ms(k_steps, planes, fu, fv) - over) / ITERS
            print(f"{mode}: {ms:.2f} ms/warp (2 planes)")
            outs[mode] = tuple(np.asarray(o) for o in once(planes, fu, fv))
        except Exception as e:  # noqa: BLE001
            print(f"{mode}: FAILED {repr(e)[:300]}")

    if len(outs) == 2:
        for c in range(2):
            d = np.abs(outs["resident"][c] - outs["blocks"][c])
            print(f"plane {c}: max abs diff {d.max():.2e}")


if __name__ == "__main__":
    main()
