"""Per-stage on-chip timing of the bench forward (VERDICT r3 item 3).

Times each pipeline stage in isolation at the exact bench shapes
(384x1280, B=4, bf16, all kernels enabled): feature extractor, each
decode level (which internally runs SGU pair + warp/norm/corr + dense
estimator + context net for BOTH directions), and the final
full-resolution SGU stage.  Chained-loop timed (fori_loop, host sync at
the end) like bench.py, so relay dispatch overhead stays out of the
per-iteration numbers.

Usage:  python scripts/profile_stages.py [KEY=VAL ...]
  keys: iters=10 runs=3 batch=4 h=384 w=1280 stages=csv (default all)
  all other KEY=VAL pairs are exported as env vars before jax imports.

Prints one JSON line per stage plus a summary table.
"""

from __future__ import annotations

import json
import os
import sys
import time

args = {}
for a in sys.argv[1:]:
    k, _, v = a.partition("=")
    if k in ("iters", "runs", "batch", "h", "w", "stages", "ckpt", "synth"):
        args[k] = v
    else:
        os.environ[k] = v

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = int(args.get("iters", 10))
RUNS = int(args.get("runs", 3))
B = int(args.get("batch", 4))
H = int(args.get("h", 384))
W = int(args.get("w", 1280))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from upflow_pytorch_tpu.config import UPFlowConfig  # noqa: E402
from upflow_pytorch_tpu.models.upflow import build_model, init_params  # noqa: E402



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
    """Median seconds of a ITERS-chained loop of fn(*xs)."""
    @jax.jit
    def k(salt, *xs):
        def body(i, acc):
            out = fn(xs[0] + acc * 1e-12 + salt * 1e-9, *xs[1:])
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
    if args.get("ckpt"):
        from upflow_pytorch_tpu.checkpoint.npz_io import load_params_npz
        params = load_params_npz(
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "assets",
                "synthetic_trained.npz"), params)
    params = jax.device_put(params, device)
    rng = np.random.RandomState(7)

    def put(a, dt=jnp.bfloat16):
        return jax.device_put(jnp.asarray(a, dt), device)

    if args.get("synth"):
        from upflow_pytorch_tpu.data.synthetic import make_dataset
        data = make_dataset(B, seed=7, raw_hw=(H, W), crop_hw=(H, W))
        im1 = put(data["im1"], jnp.float32)
        im2 = put(data["im2"], jnp.float32)
    else:
        im1 = put(rng.rand(B, H, W, 3), jnp.float32)
        im2 = put(rng.rand(B, H, W, 3), jnp.float32)

    # pyramid shapes, coarsest-first, matching FeatureExtractor
    chs = conf.num_chs[1:][::-1]            # (196,128,96,64,32,16)
    hws = [(H >> k, W >> k) for k in range(6, 0, -1)]  # 1/64 .. 1/2
    if args.get("ckpt") or args.get("synth"):
        # REAL intermediates: run the pyramid + levels once so every
        # stage is timed with the tensors (and runtime lax.cond branch
        # choices) the actual forward sees — random features/flows land
        # in different warp tiers than trained weights do
        @jax.jit
        def _reals(params, a, b):
            def run(m, a, b):
                p1 = m.feature_pyramid_extractor(a.astype(m._dtype))
                p2 = m.feature_pyramid_extractor(b.astype(m._dtype))
                bsz, h0, w0 = a.shape[0], *p1[0].shape[1:3]
                f1 = jnp.zeros((bsz, h0, w0, 2), jnp.float32)
                f2 = jnp.zeros((bsz, h0, w0, 2), jnp.float32)
                flows = []
                for lv in range(len(m.conv_1x1)):   # levels 0..output_level
                    x1, x2 = p1[lv], p2[lv]
                    flows.append((f1, f2))
                    x1_1 = m.conv_1x1[lv](x1)
                    x2_1 = m.conv_1x1[lv](x2)
                    fu1, fu2, r1, r2 = m._decode_level(
                        lv, f1, f2, x1, x1_1, x2, x2_1)
                    f1, f2 = fu1 + r1, fu2 + r2
                return p1, p2, flows, (f1, f2)
            return model.apply(params, a, b, method=run)

        p1s, p2s, level_flows, final_flows = _reals(params, im1, im2)
        feats1 = [jax.device_put(t, device) for t in p1s]
        feats2 = [jax.device_put(t, device) for t in p2s]
    else:
        level_flows = None
        final_flows = None
        feats1 = [put(rng.randn(B, h, w, c) * 0.5)
                  for (h, w), c in zip(hws, chs)]
        feats2 = [put(rng.randn(B, h, w, c) * 0.5)
                  for (h, w), c in zip(hws, chs)]

    want = args.get("stages", "").split(",") if args.get("stages") else None
    results = {}

    def stage(name, fn, *xs):
        if want and name not in want:
            return
        sec, comp = chained_time(fn, *xs)
        results[name] = round(sec * 1e3, 2)
        print(json.dumps({"stage": name, "ms": round(sec * 1e3, 2),
                          "compile_s": round(comp, 1)}), flush=True)

    # ---- feature extractor (both images) --------------------------------
    def fx(a, b):
        p1 = model.apply(params, a, method=lambda m, x:
                         m.feature_pyramid_extractor(x.astype(m._dtype)))
        p2 = model.apply(params, b, method=lambda m, x:
                         m.feature_pyramid_extractor(x.astype(m._dtype)))
        return sum(jnp.sum(t.astype(jnp.float32)) for t in p1 + p2)

    stage("feature_extractor_x2", fx, im1, im2)

    # ---- decode levels ---------------------------------------------------
    def mk_decode(level):
        h, w = hws[level]
        ph, pw = hws[level - 1] if level > 0 else hws[0]
        if level_flows is not None:
            f1 = jax.device_put(level_flows[level][0], device)
            f2 = jax.device_put(level_flows[level][1], device)
        else:
            f1 = put(rng.randn(B, ph, pw, 2) * 1.0, jnp.float32)
            f2 = put(rng.randn(B, ph, pw, 2) * 1.0, jnp.float32)

        def dec(x1, x2, f1, f2):
            def run(m, x1, x2, f1, f2):
                x1_1 = m.conv_1x1[level](x1)
                x2_1 = m.conv_1x1[level](x2)
                fu1, fu2, r1, r2 = m._decode_level(
                    level, f1, f2, x1, x1_1, x2, x2_1)
                return (jnp.sum(fu1 + r1) + jnp.sum(fu2 + r2))
            return model.apply(params, x1, x2, f1, f2, method=run)
        return dec, (feats1[level], feats2[level], f1, f2)

    for level in range(5):
        h, w = hws[level]
        fn, xs = mk_decode(level)
        stage(f"decode_L{level}_{h}x{w}", fn, *xs)

    # ---- final SGU (full-res upsample) -----------------------------------
    h4, w4 = hws[4]
    if final_flows is not None:
        flow4 = jax.device_put(final_flows[0], device)
        flow4b = jax.device_put(final_flows[1], device)
    else:
        flow4 = put(rng.randn(B, h4, w4, 2) * 1.0, jnp.float32)
        flow4b = put(rng.randn(B, h4, w4, 2) * 1.0, jnp.float32)

    def sgu_final(a, b, ff, fb):
        def run(m, a, b, ff, fb):
            fe1 = m.sgu_output_conv(a.astype(m._dtype))
            fe2 = m.sgu_output_conv(b.astype(m._dtype))
            o1, o2 = m._sgu_pair(ff, fb, fe1, fe2, output_hw=(H, W))
            return jnp.sum(o1) + jnp.sum(o2)
        return model.apply(params, a, b, ff, fb, method=run)

    stage("sgu_final_pair_fullres", sgu_final, im1, im2, flow4, flow4b)

    total = sum(results.values())
    print(json.dumps({"per_stage_ms": results,
                      "sum_ms": round(total, 2),
                      "batch": B, "hw": [H, W],
                      "env": {k: v for k, v in os.environ.items()
                              if k.startswith("UPFLOW")}}))


if __name__ == "__main__":
    main()
