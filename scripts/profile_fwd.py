"""Lean on-chip forward timer for perf A/B experiments.

Usage:
    python scripts/profile_fwd.py [KEY=VAL ...]

Recognized keys (everything else is exported as an env var BEFORE the
model imports, so kernel-dispatch knobs like UPFLOW_DISABLE_PALLAS_CONV
or UPFLOW_FORCE_STAGED_CONV work):
    iters=20 runs=3 batch=4 h=384 w=1280 dtype=bfloat16 trace=<dir>
    ckpt=1 (load assets/synthetic_trained.npz — the bench weights, so
    runtime lax.cond branches match the bench's in-window regime)
    synth=1 (use analytic-texture inputs like bench.py instead of noise)

Prints one JSON line: {"ms_per_iter": ..., "pairs_per_sec": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

args = {}
for a in sys.argv[1:]:
    k, _, v = a.partition("=")
    if k in ("iters", "runs", "batch", "h", "w", "dtype", "trace", "ckpt",
             "synth"):
        args[k] = v
    else:
        os.environ[k] = v

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = int(args.get("iters", 20))
RUNS = int(args.get("runs", 3))
B = int(args.get("batch", 4))
H = int(args.get("h", 384))
W = int(args.get("w", 1280))
DTYPE = args.get("dtype", "bfloat16")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from upflow_pytorch_tpu.config import UPFlowConfig  # noqa: E402
from upflow_pytorch_tpu.models.upflow import build_model, init_params  # noqa: E402


def main():
    conf = UPFlowConfig().updated(dict(
        if_norm_before_cost_volume=True,
        norm_moments_across_channels=False,
        norm_moments_across_images=False,
        if_sgu_upsample=True,
        if_use_cor_pytorch=False,
        compute_dtype=DTYPE,
    ))
    model = build_model(conf)
    device = jax.devices()[0]
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_params(conf, jax.random.PRNGKey(0))
    if args.get("ckpt"):
        from upflow_pytorch_tpu.checkpoint.npz_io import load_params_npz
        params = load_params_npz(
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "assets",
                "synthetic_trained.npz"), params)
    params = jax.device_put(params, device)
    rng = np.random.RandomState(7)
    if args.get("synth"):
        from upflow_pytorch_tpu.data.synthetic import make_dataset
        data = make_dataset(B, seed=7, raw_hw=(H, W), crop_hw=(H, W))
        im1 = jax.device_put(jnp.asarray(data["im1"]), device)
        im2 = jax.device_put(jnp.asarray(data["im2"]), device)
    else:
        im1 = jax.device_put(jnp.asarray(rng.rand(B, H, W, 3), jnp.float32),
                             device)
        im2 = jax.device_put(jnp.asarray(rng.rand(B, H, W, 3), jnp.float32),
                             device)

    @jax.jit
    def k_steps(params, a, b, salt):
        def body(i, acc):
            ff, fb, _ = model.apply(params, a + (acc * 1e-12 + salt * 1e-9), b)
            return acc + jnp.sum(ff) + jnp.sum(fb)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    t0 = time.time()
    float(k_steps(params, im1, im2, jnp.float32(1.0)))
    compile_s = time.time() - t0

    if args.get("trace"):
        jax.profiler.start_trace(args["trace"])
        float(k_steps(params, im1, im2, jnp.float32(1.5)))
        jax.profiler.stop_trace()

    times = []
    for i in range(RUNS):
        t0 = time.perf_counter()
        float(k_steps(params, im1, im2, jnp.float32(2.0 + i)))
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2]
    print(json.dumps({
        "ms_per_iter": round(med / ITERS * 1e3, 2),
        "pairs_per_sec": round(B * ITERS / med, 2),
        "compile_s": round(compile_s, 1),
        "runs_s": [round(t, 3) for t in times],
        "env": {k: v for k, v in os.environ.items() if k.startswith("UPFLOW")},
        "shape": [B, H, W], "dtype": DTYPE,
    }))


if __name__ == "__main__":
    main()
