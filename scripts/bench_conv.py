"""Per-conv micro-benchmark of the segmented Pallas conv vs XLA, at the
exact decoder shapes (B=4, 96x320 unless overridden).

Times ONE conv in a chained loop (accumulator perturbs the first
segment so nothing is memoized) and reports ms + effective TFLOP/s
(REAL flops, 2*9*cin*cout*H*W*B, pads excluded).

Usage:  python scripts/bench_conv.py [convs=csv] [KEY=VAL ...]
  keys: iters=20 runs=3 batch=4 h=96 w=320
  other KEY=VAL pairs are exported as env vars before jax imports.
"""

from __future__ import annotations

import json
import os
import sys
import time

args = {}
for a in sys.argv[1:]:
    k, _, v = a.partition("=")
    if k in ("iters", "runs", "batch", "h", "w", "convs"):
        args[k] = v
    else:
        os.environ[k] = v

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = int(args.get("iters", 20))
RUNS = int(args.get("runs", 3))
B = int(args.get("batch", 4))
H = int(args.get("h", 96))
W = int(args.get("w", 320))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from upflow_pytorch_tpu.ops.pallas.conv import (  # noqa: E402
    conv3x3_seg, stored_hw)

# (name, real_chs per segment, cout, dilation)  — decoder inventory:
# estimator convs see [prev_out(stored 128-pad), ..., entry(115)] segments;
# context convs see one stored 128-pad segment; SGU stack sees small segs.
CONVS = [
    ("est1", [115], 128, 1),
    ("est2", [128, 115], 128, 1),
    ("est3", [128, 128, 115], 96, 1),
    ("est4", [96, 128, 128, 115], 64, 1),
    ("est5", [64, 96, 128, 128, 115], 32, 1),
    ("est_last", [32, 64, 96, 128, 128, 115], 2, 1),
    ("ctx0", [563, 2], 128, 1),
    ("ctx1", [128], 128, 2),
    ("ctx2", [128], 128, 4),
    ("ctx3", [128], 96, 8),
    ("ctx4", [96], 64, 16),
    ("ctx5", [64], 32, 1),
    ("ctx_last", [32], 2, 1),
    ("sgu1", [64], 32, 1),
    ("sgu2", [32, 64], 32, 1),
    ("sgu3", [32, 32, 64], 32, 1),
    ("sgu4", [32, 32, 32, 64], 16, 1),
    ("sgu5", [16, 32, 32, 32, 64], 8, 1),
    ("sgu_last", [8, 16, 32, 32, 32, 64], 3, 1),
]



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
    comp = time.time() - t0
    ts = []
    for i in range(RUNS):
        t0 = time.perf_counter()
        float(k(jnp.float32(2.0 + i), *xs))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return max(ts[len(ts) // 2] - _overhead(), 1e-9) / ITERS, comp


def main():
    device = jax.devices()[0]
    rng = np.random.RandomState(0)
    hs, ws = stored_hw(H, W)
    want = args.get("convs", "").split(",") if args.get("convs") else None
    results = {}

    for name, chs, cout, dil in CONVS:
        if want and name not in want:
            continue
        cin = sum(chs)
        # stored-layout inputs for every 128-multiple stored width;
        # raw entry segments otherwise (mirrors the real dense stack)
        xs = []
        for c in chs:
            if c in (96, 128, 64, 32, 16, 8) and len(chs) > 1 or (
                    len(chs) == 1 and c in (128, 96, 64, 32)):
                cp = -(-c // 128) * 128
                xs.append(jnp.asarray(
                    rng.randn(B, hs, ws, cp) * 0.5, jnp.bfloat16))
            else:
                xs.append(jnp.asarray(
                    rng.randn(B, H, W, c) * 0.5, jnp.bfloat16))
        xs = [jax.device_put(x, device) for x in xs]
        wt = jax.device_put(jnp.asarray(
            rng.randn(3, 3, cin, cout) * 0.05, jnp.float32), device)
        bs = jax.device_put(jnp.zeros((cout,), jnp.float32), device)

        def pallas_fn(x0, *rest):
            out = conv3x3_seg([x0, *rest], chs, wt, bs, dil, True,
                              img_hw=(H, W), out_stored=True)
            return jnp.sum(out[:, :H, :W].astype(jnp.float32))

        def xla_fn(x0, *rest):
            allx = [x0, *rest]
            cat = jnp.concatenate(
                [x[:, :H, :W, :c] for x, c in zip(allx, chs)], axis=-1)
            pad = dil
            out = jax.lax.conv_general_dilated(
                cat, wt.astype(jnp.bfloat16), (1, 1),
                ((pad, pad), (pad, pad)), rhs_dilation=(dil, dil),
                dimension_numbers=jax.lax.conv_dimension_numbers(
                    cat.shape, wt.shape, ("NHWC", "HWIO", "NHWC")),
                preferred_element_type=jnp.float32)
            out = jnp.where(out >= 0, out, out * 0.1)
            return jnp.sum(out)

        gflop = 2 * 9 * cin * cout * H * W * B / 1e9
        row = {}
        for lbl, fn in (("pallas", pallas_fn), ("xla", xla_fn)):
            try:
                sec, comp = chained_time(fn, *xs)
                row[lbl] = {"ms": round(sec * 1e3, 3),
                            "tflops": round(gflop / sec / 1e3, 1)}
            except Exception as e:  # noqa: BLE001
                row[lbl] = {"error": repr(e)[:160]}
        results[name] = row
        print(json.dumps({"conv": name, "cin": cin, "cout": cout,
                          "d": dil, **row}), flush=True)

    tot_p = sum(r["pallas"]["ms"] for r in results.values()
                if "ms" in r.get("pallas", {}))
    tot_x = sum(r["xla"]["ms"] for r in results.values()
                if "ms" in r.get("xla", {}))
    print(json.dumps({"total_pallas_ms": round(tot_p, 2),
                      "total_xla_ms": round(tot_x, 2), "batch": B,
                      "hw": [H, W]}))


if __name__ == "__main__":
    main()
