"""Batch sweep of the headline inference config (VERDICT r2/r3/r4 item).

Times the exact bench.py forward (bf16, all kernels, trained ckpt if
present) at several batch sizes with the same chained-loop methodology
and prints one JSON line per batch plus a summary, so the headline BATCH
constant is chosen by measurement, not assumption.

Usage:  python scripts/bench_batch_sweep.py [batches=4,8,16] [iters=20]
"""

from __future__ import annotations

import json
import os
import sys
import time

args = {}
for a in sys.argv[1:]:
    k, _, v = a.partition("=")
    if k in ("batches", "iters", "h", "w"):
        args[k] = v
    else:
        os.environ[k] = v

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

BATCHES = [int(b) for b in args.get("batches", "4,8,16").split(",")]
ITERS = int(args.get("iters", "20"))
H = int(args.get("h", "384"))
W = int(args.get("w", "1280"))
RUNS = 3


def main():
    import bench as bench_mod
    from upflow_pytorch_tpu.config import UPFlowConfig
    from upflow_pytorch_tpu.data.synthetic import make_dataset
    from upflow_pytorch_tpu.models.upflow import build_model

    conf = UPFlowConfig().updated(dict(
        if_norm_before_cost_volume=True,
        norm_moments_across_channels=False,
        norm_moments_across_images=False,
        if_sgu_upsample=True,
        if_use_cor_pytorch=False,
        compute_dtype="bfloat16",
    ))
    device = jax.devices()[0]
    params, used_ckpt = bench_mod._load_params(
        conf, scale_sgu_head=None if os.path.exists(bench_mod.BENCH_CKPT)
        else 0.02)
    params = jax.device_put(params, device)
    model = build_model(conf)

    @jax.jit
    def k_noop(salt):
        def body(i, acc):
            return acc + salt * jnp.float32(1e-9)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    float(k_noop(jnp.float32(1.0)))
    times = []
    for i in range(RUNS):
        t0 = time.perf_counter()
        float(k_noop(jnp.float32(2.0 + i)))
        times.append(time.perf_counter() - t0)
    times.sort()
    overhead = times[len(times) // 2]

    results = {}
    for b in BATCHES:
        data = make_dataset(b, seed=7, raw_hw=(H, W), crop_hw=(H, W))
        im1 = jax.device_put(data["im1"], device)
        im2 = jax.device_put(data["im2"], device)

        @jax.jit
        def k_steps(params, a, bb, salt):
            def body(i, acc):
                ff, fb, _ = model.apply(
                    params, a + (acc * 1e-12 + salt * 1e-9), bb)
                return acc + jnp.sum(ff) + jnp.sum(fb)
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

        t0 = time.time()
        float(k_steps(params, im1, im2, jnp.float32(1.0)))
        comp = time.time() - t0
        times = []
        for i in range(RUNS):
            t0 = time.perf_counter()
            float(k_steps(params, im1, im2, jnp.float32(2.0 + i)))
            times.append(time.perf_counter() - t0)
        times.sort()
        dt = max(times[len(times) // 2] - overhead, 1e-9)
        pps = b * ITERS / dt
        results[b] = round(pps, 2)
        print(json.dumps({"batch": b, "pairs_per_sec": round(pps, 2),
                          "ms_per_batch": round(dt / ITERS * 1e3, 2),
                          "compile_s": round(comp, 1)}), flush=True)

    best = max(results, key=results.get)
    print(json.dumps({"sweep": results, "best_batch": best,
                      "weights": "ckpt" if used_ckpt else "surrogate",
                      "loop_dispatch_overhead_s": round(overhead, 4)}))


if __name__ == "__main__":
    main()
