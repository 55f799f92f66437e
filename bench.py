"""Headline benchmark: KITTI-2015 inference throughput per chip.

Measures the eval-path forward (bidirectional flow, SGU + cost-volume
normalization — the reference test.py:22-30 configuration) at KITTI-2015
resolution padded to TPU-friendly multiples (375x1242 -> 384x1280), and
prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "pairs/sec/chip", "vs_baseline": N}

Baseline: the reference publishes no throughput numbers
(/root/repo/BASELINE.md).  BASELINE_V100_PAIRS_PER_SEC below is a
documented engineering estimate of the reference PyTorch model's V100
inference rate at this resolution (bidirectional PWC decoder + CUDA
correlation, fp32): ~25 pairs/s.  vs_baseline = value / estimate, so the
driver's ">=5x V100" bar corresponds to vs_baseline >= 5.

Measurement method: a device-side chained loop (ITERS forwards
back-to-back inside one jit, each consuming an input perturbed by the
previous result so nothing is memoized, one host sync at the end) —
through this environment's TPU relay a per-batch host round-trip costs
~27 ms and would swamp per-batch timing; production serving pipelines
batches without a per-batch sync.  The loop's dispatch + relay overhead
is MEASURED in-run by timing an identically-shaped no-op loop, and the
reported time is the median of several timed invocations.

SGU branch handling: the final SGU stage dispatches at runtime between a
fused Pallas kernel (inter-flow within its +-2px warp window — the
trained-checkpoint regime, where SGU refinements are ~1px) and an exact
XLA fallback.  The bench measures BOTH branch outcomes and reports both;
the headline number uses weights in the in-window regime (trained
checkpoint if present at BENCH_CKPT, else the documented head-scale
surrogate), and the fallback timing is carried in the JSON so the
out-of-window cost is never hidden.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_V100_PAIRS_PER_SEC = 25.0

BATCH = 4  # measured sweet spot on v5e (B=8 regresses on HBM pressure)
HEIGHT, WIDTH = 384, 1280
ITERS = 20
TIMED_RUNS = 3

# optional trained weights (produced in-environment by
# scripts/train_synthetic.py; see docs/STATUS_ROUND3.md)
BENCH_CKPT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "assets", "synthetic_trained.npz")


def _timed_loop_fn(fwd):
    @jax.jit
    def k_steps(params, a, b, salt):
        def body(i, acc):
            out = fwd(params, a + (acc * 1e-12 + salt * 1e-9), b)
            return acc + out
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    return k_steps


def _measure(k_steps, params, im1, im2):
    """Median wall time of TIMED_RUNS chained-loop invocations."""
    float(k_steps(params, im1, im2, jnp.float32(1.0)))  # compile+warm
    times = []
    for i in range(TIMED_RUNS):
        t0 = time.perf_counter()
        float(k_steps(params, im1, im2, jnp.float32(2.0 + i)))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def _dispatch_overhead():
    """Measured cost of one chained-loop dispatch + host sync with ~zero
    device work: bounds the relay/dispatch overhead baked into _measure."""
    @jax.jit
    def k_noop(salt):
        def body(i, acc):
            return acc + salt * jnp.float32(1e-9)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    float(k_noop(jnp.float32(1.0)))
    times = []
    for i in range(TIMED_RUNS):
        t0 = time.perf_counter()
        float(k_noop(jnp.float32(2.0 + i)))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


# Degradation guard (VERDICT r3 item 2): if the headline jit fails to
# compile (e.g. a Mosaic regression in one kernel), progressively disable
# Pallas kernels and report what was degraded instead of dying with rc=1.
_KERNEL_KNOBS = (
    "UPFLOW_DISABLE_PALLAS_CONV",
    "UPFLOW_DISABLE_PALLAS_FEATURE_WARP",
    "UPFLOW_DISABLE_PALLAS_CORR",
    "UPFLOW_DISABLE_PALLAS_WARP",
)


def _compile_with_degradation(make_k_steps, params, im1, im2):
    """Returns (k_steps, degraded_knobs).  make_k_steps() must rebuild
    the model + jit closure from scratch so trace-time kernel-dispatch
    predicates re-read the env knobs."""
    degraded = []
    for stage in range(len(_KERNEL_KNOBS) + 1):
        k_steps = make_k_steps()
        # retry once before degrading: a transient relay/runtime hiccup
        # must not permanently pin a slower configuration (ADVICE r4)
        for attempt in (0, 1):
            try:
                float(k_steps(params, im1, im2, jnp.float32(1.0)))
                return k_steps, degraded
            except Exception as e:  # pragma: no cover - hardware-only path
                import sys
                if attempt == 0:
                    print("bench: headline compile/run failed (%s...); "
                          "retrying once" % repr(e)[:160], file=sys.stderr)
                    continue
                if stage == len(_KERNEL_KNOBS):
                    raise
                knob = _KERNEL_KNOBS[stage]
                print("bench: headline compile failed twice (%s...); "
                      "degrading %s" % (repr(e)[:160], knob),
                      file=sys.stderr)
                os.environ[knob] = "1"
                degraded.append(knob)
    raise AssertionError("unreachable")


def _load_params(conf, scale_sgu_head=None):
    from upflow_pytorch_tpu.models.upflow import init_params

    # init on CPU (eager init over the remote-TPU relay would do one RPC
    # per op), then transfer the param tree to the accelerator once.
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_params(conf, jax.random.PRNGKey(0))
    used_ckpt = False
    if os.path.exists(BENCH_CKPT):
        from upflow_pytorch_tpu.checkpoint.npz_io import load_params_npz
        params = load_params_npz(BENCH_CKPT, params)
        used_ckpt = True
    if scale_sgu_head is not None:
        cl = params["params"]["sgu_dense_estimator"]["dense"]["conv_last"]["conv"]
        cl = dict(cl, kernel=cl["kernel"] * scale_sgu_head)
        params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
        params["params"]["sgu_dense_estimator"]["dense"]["conv_last"]["conv"] = cl
    return params, used_ckpt


def _bench_train_step(device, crop_hw=(256, 832), raw_hw=(320, 896),
                      iters=8, batch=None):
    """Training throughput (VERDICT r2 item 6): the full reference
    fine-tune recipe (photo + census + smooth + msd 'upup' + SGU +
    boundary-dilated warp — simple_train.py:119-156) at the reference
    crop 256x832, fp32, one chip.  Chained-loop timed like the
    inference bench: TRAIN_ITERS optimizer steps back-to-back inside
    one jit (state threads through, so nothing is memoized), one host
    sync at the end."""
    TRAIN_ITERS = iters
    nb = BATCH if batch is None else batch
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
    tx = make_optimizer(TrainerConfig())
    params = jax.device_put(params, device)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step_fn = make_train_step(model, tx)

    data = make_dataset(nb, seed=11, raw_hw=raw_hw, crop_hw=crop_hw)
    batch = {k: jax.device_put(jnp.asarray(v), device)
             for k, v in data.items() if k != "gt_flow"}

    @jax.jit
    def k_train(state, batch):
        def body(i, st):
            st, _ = step_fn(st, batch)
            return st
        st = jax.lax.fori_loop(0, TRAIN_ITERS, body, state)
        return jnp.sum(st.params["params"]["flow_estimators"]
                       ["conv_last"]["conv"]["kernel"])

    float(k_train(state, batch))  # compile + warm
    times = []
    for _ in range(TIMED_RUNS):
        t0 = time.perf_counter()
        float(k_train(state, batch))
        times.append(time.perf_counter() - t0)
    times.sort()
    return nb * TRAIN_ITERS / times[len(times) // 2]


def main():
    from upflow_pytorch_tpu.config import UPFlowConfig
    from upflow_pytorch_tpu.models.upflow import build_model

    base = dict(
        if_norm_before_cost_volume=True,
        norm_moments_across_channels=False,
        norm_moments_across_images=False,
        if_sgu_upsample=True,
    )
    # headline path: bfloat16 compute with the Pallas correlation +
    # segmented Pallas decoder convs; fp32 pure-XLA is the parity oracle
    conf = UPFlowConfig().updated(dict(
        base, compute_dtype="bfloat16", if_use_cor_pytorch=False))
    conf_fp32 = UPFlowConfig().updated(dict(base, if_use_cor_pytorch=True))
    model = build_model(conf)
    model_fp32 = build_model(conf_fp32)

    device = jax.devices()[0]
    # in-window params: trained checkpoint if present, else the 0.02
    # head-scale surrogate for the trained regime (~1px SGU inter-flows)
    params_in, used_ckpt = _load_params(
        conf, scale_sgu_head=None if os.path.exists(BENCH_CKPT) else 0.02)
    params_in = jax.device_put(params_in, device)

    def make_k_steps():
        # fresh model + closure per attempt so kernel-dispatch predicates
        # re-read the degradation env knobs at trace time
        m = build_model(conf)

        def fwd(params, im1, im2):
            flow_f, flow_b, _ = m.apply(params, im1, im2)
            # reduce to a scalar so each timed iteration ends with a real
            # device->host transfer; through this environment's TPU relay,
            # block_until_ready alone returns early and gives bogus
            # timings.
            return jnp.sum(flow_f) + jnp.sum(flow_b)

        return _timed_loop_fn(fwd)

    @jax.jit
    def flows_pair(params, im1, im2, gt):
        f16 = model.apply(params, im1, im2)[0].astype(jnp.float32)
        f32 = model_fp32.apply(params, im1, im2)[0]
        d = jnp.linalg.norm(f16 - f32, axis=-1)
        # NOTE the max is dominated by the reference's chaotic >=1.0
        # warp-mask threshold (see ops/warp.py MASK_THRESHOLD): any two
        # numeric variants of this model disagree completely on the ~1%
        # of pixels whose mask bit flips, so the distribution metrics
        # are the meaningful parity gate
        e16 = jnp.linalg.norm(f16 - gt, axis=-1)[:, 8:-8, 8:-8]
        e32 = jnp.linalg.norm(f32 - gt, axis=-1)[:, 8:-8, 8:-8]
        return (jnp.mean(d), jnp.mean(d > 1.0), jnp.max(d),
                jnp.mean(e16), jnp.mean(e32))

    # in-distribution inputs: analytic-texture pairs with real (known)
    # flow between them (data/synthetic.py) — the trained-checkpoint
    # parity/branch measurements are meaningless on uniform noise
    from upflow_pytorch_tpu.data.synthetic import make_dataset
    data = make_dataset(BATCH, seed=7, raw_hw=(HEIGHT, WIDTH),
                        crop_hw=(HEIGHT, WIDTH))
    im1 = jax.device_put(data["im1"], device)
    im2 = jax.device_put(data["im2"], device)

    k_steps, degraded = _compile_with_degradation(
        make_k_steps, params_in, im1, im2)
    overhead = _dispatch_overhead()
    dt_in = max(_measure(k_steps, params_in, im1, im2) - overhead, 1e-9)
    # forced-fallback timing on the SAME real weights: UPFLOW_SGU_TIER=xla
    # pins the exact-XLA tier for sgu_blend + the final SGU at trace time
    # (replaces the round-3/4 head-scale weight-inflation surrogate)
    os.environ["UPFLOW_SGU_TIER"] = "xla"
    try:
        k_steps_fb = make_k_steps()
        dt_out = max(_measure(k_steps_fb, params_in, im1, im2) - overhead,
                     1e-9)
    finally:
        del os.environ["UPFLOW_SGU_TIER"]

    pairs_per_sec = BATCH * ITERS / dt_in
    pairs_per_sec_fallback = BATCH * ITERS / dt_out

    # parity gate on the SAME weights + in-distribution inputs with exact
    # GT: EPE vs ground truth for the bf16 headline path and the fp32
    # oracle path, plus their pixelwise drift
    gt = jax.device_put(data["gt_flow"], device)
    mean_e, frac_gt1, max_e, epe16, epe32 = flows_pair(
        params_in, im1, im2, gt)

    # fused-path semantic A/B + chaos floor (fp32, VERDICT r4 items 1/8).
    # The reference's >=1.0 warp-mask threshold (ops/warp.py
    # MASK_THRESHOLD) is chaotic in the last fp32 ulp, so ANY two
    # numerically-different paths diverge by the model's chaotic
    # sensitivity.  The floor is measured on the SAME jit with a 1-ulp
    # input perturbation; the fused kernels are semantics-preserving iff
    # the fused-on/off delta is at or below that floor (round-5 on-chip:
    # A/B 0.080 px mean vs floor 0.128 px mean; with UPFLOW_ROBUST_MASK=1
    # both collapse — see docs/STATUS_ROUND5.md).
    ab_mean = floor_mean = None
    if not degraded and os.environ.get("UPFLOW_BENCH_PARITY", "1") != "0":
        try:
            conf_ab = UPFlowConfig().updated(
                dict(base, if_use_cor_pytorch=False))
            m_on = build_model(conf_ab)

            @jax.jit
            def fwd_on(p, a, b):
                return m_on.apply(p, a, b)[0].astype(jnp.float32)

            on = fwd_on(params_in, im1, im2)
            onp = fwd_on(params_in, im1 * jnp.float32(1 + 1e-7), im2)
            os.environ["UPFLOW_DISABLE_PALLAS_FEATURE_WARP"] = "1"
            try:
                m_off = build_model(conf_ab)
                off = jax.jit(lambda p, a, b: m_off.apply(p, a, b)[0]
                              .astype(jnp.float32))(params_in, im1, im2)
            finally:
                del os.environ["UPFLOW_DISABLE_PALLAS_FEATURE_WARP"]
            ab_mean = float(jnp.mean(jnp.linalg.norm(on - off, axis=-1)))
            floor_mean = float(jnp.mean(jnp.linalg.norm(on - onp, axis=-1)))
        except Exception as e:  # pragma: no cover - defensive
            ab_mean = "error: " + repr(e)[:120]

    # training throughput (guarded: the inference headline must never
    # die on the train lane; skip with UPFLOW_BENCH_TRAIN=0)
    train_pps: object = "skipped"
    if os.environ.get("UPFLOW_BENCH_TRAIN", "1") != "0":
        try:
            train_pps = round(_bench_train_step(device), 3)
        except Exception as e:  # pragma: no cover - defensive
            train_pps = "error: " + repr(e)[:120]

    print(json.dumps({
        "metric": "kitti2015_inference_throughput_384x1280_bf16_bidir",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/sec/chip",
        "vs_baseline": round(pairs_per_sec / BASELINE_V100_PAIRS_PER_SEC, 3),
        "sgu_fallback_pairs_per_sec": round(pairs_per_sec_fallback, 3),
        "degraded": degraded,
        "loop_dispatch_overhead_s": round(overhead, 4),
        "weights": "synthetic_trained" if used_ckpt else "kaiming+sgu_scale",
        "epe_vs_gt_bf16_px": round(float(epe16), 4),
        "epe_vs_gt_fp32_px": round(float(epe32), 4),
        "bf16_vs_fp32_mean_epe_px": round(float(mean_e), 4),
        "bf16_vs_fp32_frac_gt_1px": round(float(frac_gt1), 5),
        "bf16_vs_fp32_max_epe_px": round(float(max_e), 2),
        "fused_on_off_fp32_mean_epe_px": (
            round(ab_mean, 4) if isinstance(ab_mean, float) else ab_mean),
        "chaos_floor_fp32_mean_epe_px": (
            round(floor_mean, 4) if isinstance(floor_mean, float)
            else floor_mean),
        "train_pairs_per_sec_fp32_256x832": train_pps,
    }))


if __name__ == "__main__":
    main()
