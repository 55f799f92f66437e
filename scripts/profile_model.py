"""Profile the headline-bench forward on the attached TPU.

Produces (a) end-to-end ms/batch via the device-side chained loop from
bench.py, (b) an op-category inventory from a jax.profiler trace.

Usage: python scripts/profile_model.py [--trace DIR] [--batch 4]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timed_loop(fwd, params, im1, im2, iters=20, warmup=1):
    @jax.jit
    def k_steps(params, a, b, salt):
        def body(i, acc):
            out = fwd(params, a + (acc * 1e-12 + salt * 1e-9), b)
            return acc + out
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(k_steps(params, im1, im2, jnp.float32(1.0)))  # compile+warm
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        float(k_steps(params, im1, im2, jnp.float32(2.0 + i)))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    return dt / iters


def trace_inventory(trace_dir):
    """Parse the .trace.json.gz and bucket device-op durations."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace file found under", trace_dir)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # find TPU device track pids
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n and "XLA" not in n}
    buckets = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # ms
        total += dur
        key = name.split(".")[0].split("(")[0]
        buckets[key] = buckets.get(key, 0.0) + dur
    top = sorted(buckets.items(), key=lambda kv: -kv[1])[:30]
    print(f"\n--- device op inventory (total {total:.1f} ms across trace) ---")
    for k, v in top:
        print(f"{v:9.2f} ms  {k}")


def profile_train(args):
    """Train-step lane (VERDICT r2 item 6): time + trace one jitted
    optimizer step of the full reference fine-tune recipe, so the
    backward (Pallas conv VJP's materialized-concat XLA convs, warp VJP
    scatter-adds) gets an op inventory of its own."""
    from upflow_pytorch_tpu.config import TrainerConfig, UPFlowConfig
    from upflow_pytorch_tpu.data.synthetic import make_dataset
    from upflow_pytorch_tpu.models.upflow import build_model, init_params
    from upflow_pytorch_tpu.train.step import (
        TrainState, make_optimizer, make_train_step)

    conf = UPFlowConfig().updated(dict(
        if_norm_before_cost_volume=True,
        norm_moments_across_channels=False,
        norm_moments_across_images=False,
        if_sgu_upsample=True,
        if_use_cor_pytorch=False,
        photo_loss_census_weight=1.0,
        multi_scale_distillation_weight=0.01,
        multi_scale_distillation_style="upup",
        multi_scale_distillation_occ=True,
        if_use_boundary_warp=True,
    ))
    model = build_model(conf)
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_params(conf, jax.random.PRNGKey(0))
    if args.ckpt and os.path.exists(args.ckpt):
        from upflow_pytorch_tpu.checkpoint.npz_io import load_params_npz
        params = load_params_npz(args.ckpt, params)
    tx = make_optimizer(TrainerConfig())
    device = jax.devices()[0]
    params = jax.device_put(params, device)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step_fn = jax.jit(make_train_step(model, tx))

    h, w = args.height, args.width
    data = make_dataset(args.batch, seed=11, raw_hw=(h + 64, w + 64),
                        crop_hw=(h, w))
    batch = {k: jax.device_put(jnp.asarray(v), device)
             for k, v in data.items() if k != "gt_flow"}

    state, _ = step_fn(state, batch)          # compile + warm
    jax.block_until_ready(state.params)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, m = step_fn(state, batch)
        float(m["total_loss"])                # real host sync
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1e3
    print(f"train step B={args.batch} {h}x{w} fp32: {ms:.2f} ms/step, "
          f"{args.batch / (ms / 1e3):.1f} pairs/s/chip")

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(2):
                state, m = step_fn(state, batch)
                float(m["total_loss"])
        trace_inventory(args.trace)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default="")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--no-nudge", action="store_true",
                    help="skip the SGU head scale-down")
    ap.add_argument("--ckpt", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", "synthetic_trained.npz"),
        help="trained .npz weights (forward + train lanes); '' disables")
    ap.add_argument("--train", action="store_true",
                    help="profile the training step instead of inference "
                     "(use --height 256 --width 832 for the reference crop)")
    args = ap.parse_args()

    if args.train:
        profile_train(args)
        return

    from upflow_pytorch_tpu.config import UPFlowConfig
    from upflow_pytorch_tpu.models.upflow import build_model, init_params

    base = dict(
        if_norm_before_cost_volume=True,
        norm_moments_across_channels=False,
        norm_moments_across_images=False,
        if_sgu_upsample=True,
    )
    if not args.fp32:
        base.update(compute_dtype="bfloat16", if_use_cor_pytorch=False)
    conf = UPFlowConfig().updated(base)
    model = build_model(conf)
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_params(conf, jax.random.PRNGKey(0))
    if args.ckpt and os.path.exists(args.ckpt):
        from upflow_pytorch_tpu.checkpoint.npz_io import load_params_npz
        params = load_params_npz(args.ckpt, params)
    elif not args.no_nudge:
        cl = params["params"]["sgu_dense_estimator"]["dense"]["conv_last"]["conv"]
        cl["kernel"] = cl["kernel"] * 0.02
    device = jax.devices()[0]
    params = jax.device_put(params, device)

    def fwd(params, im1, im2):
        flow_f, flow_b, _ = model.apply(params, im1, im2)
        return jnp.sum(flow_f) + jnp.sum(flow_b)

    rng = np.random.RandomState(0)
    im1 = jax.device_put(
        rng.rand(args.batch, args.height, args.width, 3).astype(np.float32),
        device)
    im2 = jax.device_put(
        rng.rand(args.batch, args.height, args.width, 3).astype(np.float32),
        device)

    ms = timed_loop(fwd, params, im1, im2) * 1e3
    pps = args.batch / (ms / 1e3)
    print(f"B={args.batch} {args.height}x{args.width} "
          f"{'fp32' if args.fp32 else 'bf16'}: {ms:.2f} ms/batch, "
          f"{pps:.1f} pairs/s/chip")

    if args.trace:
        f = jax.jit(fwd)
        float(f(params, im1, im2))
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                float(f(params, im1, im2))
        trace_inventory(args.trace)


if __name__ == "__main__":
    main()
