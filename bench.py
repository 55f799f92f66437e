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
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_V100_PAIRS_PER_SEC = 25.0

BATCH = 4  # measured sweet spot on v5e (B=8 regresses on HBM pressure)
HEIGHT, WIDTH = 384, 1280
WARMUP = 3
ITERS = 20


def main():
    from upflow_pytorch_tpu.config import UPFlowConfig
    from upflow_pytorch_tpu.models.upflow import build_model, init_params

    conf = UPFlowConfig().updated(dict(
        if_norm_before_cost_volume=True,
        norm_moments_across_channels=False,
        norm_moments_across_images=False,
        if_sgu_upsample=True,
        if_use_cor_pytorch=True,  # pure-XLA correlation (oracle path)
    ))
    model = build_model(conf)
    # init on CPU (eager init over the remote-TPU relay would do one RPC
    # per op), then transfer the param tree to the accelerator once.
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_params(conf, jax.random.PRNGKey(0))
    device = jax.devices()[0]
    params = jax.device_put(params, device)

    @jax.jit
    def fwd(params, im1, im2):
        flow_f, flow_b, _ = model.apply(params, im1, im2)
        # reduce to a scalar so each timed iteration ends with a real
        # device->host transfer; through this environment's TPU relay,
        # block_until_ready alone returns early and gives bogus timings.
        return jnp.sum(flow_f) + jnp.sum(flow_b)

    rng = np.random.RandomState(0)
    im1 = jax.device_put(rng.rand(BATCH, HEIGHT, WIDTH, 3).astype(np.float32),
                         device)
    im2 = jax.device_put(rng.rand(BATCH, HEIGHT, WIDTH, 3).astype(np.float32),
                         device)
    # distinct inputs per step (derived on device) so no layer of the stack
    # can memoize identical calls
    steps = jnp.arange(WARMUP + ITERS, dtype=jnp.float32) * 1e-3

    for i in range(WARMUP):
        float(fwd(params, im1 + steps[i], im2))
    # depth-2 pipeline: keep one batch in flight so dispatch overlaps
    # device compute (throughput measurement); every result is still
    # materialized on the host (see fwd note), so completion is real.
    t0 = time.perf_counter()
    pending = fwd(params, im1 + steps[WARMUP], im2)
    for i in range(1, ITERS):
        nxt = fwd(params, im1 + steps[WARMUP + i], im2)
        float(pending)
        pending = nxt
    float(pending)
    dt = time.perf_counter() - t0

    pairs_per_sec = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "kitti2015_inference_throughput_384x1280_fp32_bidir",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/sec/chip",
        "vs_baseline": round(pairs_per_sec / BASELINE_V100_PAIRS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
