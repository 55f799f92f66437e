"""Drill-down on-chip timing inside decode_L4 and the final SGU stage —
the two dominant stages from scripts/profile_stages.py.

Usage:  python scripts/profile_sub.py [stages=csv] [KEY=VAL ...]
Stages (default all):
  warp32        feature warp of (B,96,320,32), both directions
  wnc_fast      fused warp_norm_corr, forced fast branch, both dirs
  wnc_slow      exact XLA composition, both dirs
  estimator     FlowEstimatorDense on [corr81, feat32, flow2], both dirs
  context       ContextNetwork on dense-stack output, both dirs
  est_ctx       estimator+context chained (as in _decode_level), both dirs
  sgu_dense     SGU dense estimator pair at 96x320 (warp + stack), x2
  sgu_final_fast  final blend stage, Pallas branch, both dirs
  sgu_final_slow  final blend stage, XLA branch, both dirs
  sgu_outconv   sgu_output_conv at 384x1280, both images
  conv1x1       per-level 1x1 conv at 96x320, both images
"""

from __future__ import annotations

import json
import os
import sys
import time

args = {}
for a in sys.argv[1:]:
    k, _, v = a.partition("=")
    if k in ("iters", "runs", "batch", "stages"):
        args[k] = v
    else:
        os.environ[k] = v

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = int(args.get("iters", 10))
RUNS = int(args.get("runs", 3))
B = int(args.get("batch", 4))
H4, W4 = 96, 320
H, W = 384, 1280

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from upflow_pytorch_tpu.config import UPFlowConfig  # noqa: E402
from upflow_pytorch_tpu.models.upflow import (  # noqa: E402
    _sgu_final_xla, build_model, init_params)



_OVH = None


def _overhead():
    """Median wall time of one ITERS-chained no-op loop invocation:
    the dispatch + relay + host-sync cost baked into every chained
    measurement here (measured, like bench.py's _dispatch_overhead)."""
    global _OVH
    if _OVH is None:
        @jax.jit
        def k_noop(salt):
            def body(i, acc):
                return acc + salt * jnp.float32(1e-9)
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

        float(k_noop(jnp.float32(1.0)))
        ts = []
        for i in range(RUNS):
            t0 = time.perf_counter()
            float(k_noop(jnp.float32(2.0 + i)))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        _OVH = ts[len(ts) // 2]
    return _OVH

def chained_time(fn, *xs):
    @jax.jit
    def k(salt, *xs):
        def body(i, acc):
            out = fn(xs[0] + (acc * 1e-12 + salt * 1e-9
                              ).astype(xs[0].dtype), *xs[1:])
            return acc + out
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    t0 = time.time()
    float(k(jnp.float32(1.0), *xs))
    compile_s = time.time() - t0
    times = []
    for i in range(RUNS):
        t0 = time.perf_counter()
        float(k(jnp.float32(2.0 + i), *xs))
        times.append(time.perf_counter() - t0)
    times.sort()
    return max(times[len(times) // 2] - _overhead(), 1e-9) / ITERS, compile_s


def main():
    conf = UPFlowConfig().updated(dict(
        if_norm_before_cost_volume=True,
        norm_moments_across_channels=False,
        norm_moments_across_images=False,
        if_sgu_upsample=True,
        if_use_cor_pytorch=False,
        compute_dtype="bfloat16",
    ))
    model = build_model(conf)
    device = jax.devices()[0]
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_params(conf, jax.random.PRNGKey(0))
    params = jax.device_put(params, device)
    rng = np.random.RandomState(7)

    def put(a, dt=jnp.bfloat16):
        return jax.device_put(jnp.asarray(a, dt), device)

    f1 = put(rng.randn(B, H4, W4, 32) * 0.5)
    f2 = put(rng.randn(B, H4, W4, 32) * 0.5)
    fl1 = put(rng.randn(B, H4, W4, 2) * 1.0, jnp.float32)
    fl2 = put(rng.randn(B, H4, W4, 2) * 1.0, jnp.float32)
    corr1 = put(rng.randn(B, H4, W4, 81) * 0.3)
    corr2 = put(rng.randn(B, H4, W4, 81) * 0.3)
    im1 = put(rng.rand(B, H, W, 3), jnp.float32)
    im2 = put(rng.rand(B, H, W, 3), jnp.float32)
    xo1 = put(rng.randn(B, H4, W4, 3) * 0.1, jnp.float32)
    xo2 = put(rng.randn(B, H4, W4, 3) * 0.1, jnp.float32)

    want = args.get("stages", "").split(",") if args.get("stages") else None
    results = {}

    def stage(name, fn, *xs):
        if want and name not in want:
            return
        try:
            sec, comp = chained_time(fn, *xs)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"stage": name, "error": repr(e)[:200]}),
                  flush=True)
            return
        results[name] = round(sec * 1e3, 2)
        print(json.dumps({"stage": name, "ms": round(sec * 1e3, 2),
                          "compile_s": round(comp, 1)}), flush=True)

    from upflow_pytorch_tpu.ops.warp import (
        MASK_THRESHOLD, flow_warp_masked)
    from upflow_pytorch_tpu.ops.pallas.corr_norm import (
        norm_items_from_conf, warp_norm_corr)

    norm_items = norm_items_from_conf(conf)

    def warp32(a, b, x, y):
        return (jnp.sum(flow_warp_masked(b, x).astype(jnp.float32))
                + jnp.sum(flow_warp_masked(a, y).astype(jnp.float32)))

    stage("warp32", warp32, f1, f2, fl1, fl2)

    def wnc(force):
        def fn(a, b, x, y):
            c1 = warp_norm_corr(a, b, x, 4, norm_items, 0.1,
                                MASK_THRESHOLD, force)
            c2 = warp_norm_corr(b, a, y, 4, norm_items, 0.1,
                                MASK_THRESHOLD, force)
            return jnp.sum(c1) + jnp.sum(c2)
        return fn

    stage("wnc_fast", wnc("fast"), f1, f2, fl1, fl2)
    stage("wnc_slow", wnc("slow"), f1, f2, fl1, fl2)

    def estimator(c1, c2, a, b, x, y):
        def run(m, c1, c2, a, b, x, y):
            _, r1 = m.flow_estimators([c1, a, x.astype(m._dtype)])
            _, r2 = m.flow_estimators([c2, b, y.astype(m._dtype)])
            return jnp.sum(r1.astype(jnp.float32)) + jnp.sum(
                r2.astype(jnp.float32))
        return model.apply(params, c1, c2, a, b, x, y, method=run)

    stage("estimator", estimator, corr1, corr2, f1, f2, fl1, fl2)

    def est_ctx(c1, c2, a, b, x, y):
        def run(m, c1, c2, a, b, x, y):
            feat1, r1 = m.flow_estimators([c1, a, x.astype(m._dtype)])
            feat2, r2 = m.flow_estimators([c2, b, y.astype(m._dtype)])
            g1 = m.context_networks(
                feat1 + [(x + r1.astype(jnp.float32)).astype(m._dtype)])
            g2 = m.context_networks(
                feat2 + [(y + r2.astype(jnp.float32)).astype(m._dtype)])
            return jnp.sum(g1.astype(jnp.float32)) + jnp.sum(
                g2.astype(jnp.float32))
        return model.apply(params, c1, c2, a, b, x, y, method=run)

    stage("est_ctx", est_ctx, corr1, corr2, f1, f2, fl1, fl2)

    def sgu_dense(a, b, x, y):
        def run(m, a, b, x, y):
            o1, o2 = m._sgu_pair(x, y, a, b)
            return jnp.sum(o1) + jnp.sum(o2)
        return model.apply(params, a, b, x, y, method=run)

    stage("sgu_dense", sgu_dense, f1, f2, fl1, fl2)

    from upflow_pytorch_tpu.models.upflow import _sgu_final_op
    from upflow_pytorch_tpu.ops.pallas.sgu_final import sgu_final_pallas

    def sgu_final_fast(x, y, a, b):
        return (jnp.sum(sgu_final_pallas(x, a, (H, W)))
                + jnp.sum(sgu_final_pallas(y, b, (H, W))))

    def sgu_final_slow(x, y, a, b):
        return (jnp.sum(_sgu_final_xla((H, W), (x, a)))
                + jnp.sum(_sgu_final_xla((H, W), (y, b))))

    stage("sgu_final_fast", sgu_final_fast, fl1, fl2, xo1, xo2)
    stage("sgu_final_slow", sgu_final_slow, fl1, fl2, xo1, xo2)

    def sgu_outconv(a, b):
        def run(m, a, b):
            o1 = m.sgu_output_conv(a.astype(m._dtype))
            o2 = m.sgu_output_conv(b.astype(m._dtype))
            return jnp.sum(o1.astype(jnp.float32)) + jnp.sum(
                o2.astype(jnp.float32))
        return model.apply(params, a, b, method=run)

    stage("sgu_outconv", sgu_outconv, im1, im2)

    def conv1x1(a, b):
        def run(m, a, b):
            return (jnp.sum(m.conv_1x1[4](a).astype(jnp.float32))
                    + jnp.sum(m.conv_1x1[4](b).astype(jnp.float32)))
        return model.apply(params, a, b, method=run)

    stage("conv1x1", conv1x1, f1, f2)

    print(json.dumps({"per_stage_ms": results, "batch": B,
                      "env": {k: v for k, v in os.environ.items()
                              if k.startswith("UPFLOW")}}))


if __name__ == "__main__":
    main()
