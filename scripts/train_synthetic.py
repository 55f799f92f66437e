"""Train on the synthetic exact-GT dataset; the in-environment learning
acceptance run (see upflow_pytorch_tpu/data/synthetic.py).

Trains the full unsupervised recipe (photo + census + smooth + msd, SGU,
boundary-dilated warp — the reference simple_train.py:119-156 recipe) in
fp32 on pairs whose true flow is known in closed form, reporting mean EPE
vs ground truth as training proceeds.  Produces the trained-weight
snapshot the benchmark uses for its in-window SGU branch measurement
(bench.py BENCH_CKPT).

Usage:
    python scripts/train_synthetic.py --steps 600 \
        --out assets/synthetic_trained.npz
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--pairs", type=int, default=16)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--raw-margin", type=int, default=16)
    ap.add_argument("--eval-every", type=int, default=100)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--out", default="")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--init", default="",
                    help="warm-start from an .npz snapshot (fresh optimizer)")
    # motion distribution (KITTI-2015 motions reach >100 px at native
    # resolution; the v2 large-motion regime trains with shifts that
    # exercise the coarse pyramid levels, the SGU medium warp tier, and
    # the warp fallback branches — VERDICT r3 item 5)
    ap.add_argument("--max-shift", type=float, default=4.0)
    ap.add_argument("--max-rot", type=float, default=0.008)
    ap.add_argument("--max-zoom", type=float, default=0.01)
    args = ap.parse_args()
    assert args.raw_margin >= int(args.max_shift) + 2, \
        "raw margin must cover the shift range for the boundary warp"

    from upflow_pytorch_tpu.config import TrainerConfig, UPFlowConfig
    from upflow_pytorch_tpu.data.synthetic import epe, make_dataset
    from upflow_pytorch_tpu.models.upflow import (
        build_model, forward, init_params)
    from upflow_pytorch_tpu.train.step import (
        TrainState, make_optimizer, make_train_step)

    conf = UPFlowConfig().updated(dict(
        if_norm_before_cost_volume=True,
        norm_moments_across_channels=False,
        norm_moments_across_images=False,
        if_sgu_upsample=True,
        if_use_cor_pytorch=True,          # fp32 oracle path
        photo_loss_census_weight=1.0,
        multi_scale_distillation_weight=0.01,
        multi_scale_distillation_style="upup",
        multi_scale_distillation_occ=True,
        if_use_boundary_warp=True,
    ))
    trainer_conf = TrainerConfig().updated(dict(lr=args.lr))

    data = make_dataset(
        args.pairs, seed=args.seed,
        raw_hw=(args.height + 2 * args.raw_margin,
                args.width + 2 * args.raw_margin),
        crop_hw=(args.height, args.width),
        max_shift=args.max_shift, max_rot=args.max_rot,
        max_zoom=args.max_zoom)
    gt = data.pop("gt_flow")

    model = build_model(conf)
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_params(conf, jax.random.PRNGKey(args.seed))
    if args.init:
        from upflow_pytorch_tpu.checkpoint.npz_io import load_params_npz
        params = load_params_npz(args.init, params)
        print("warm-started from", args.init)
    tx = make_optimizer(trainer_conf)
    device = jax.devices()[0]
    params = jax.device_put(params, device)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    train_step = jax.jit(make_train_step(model, tx))

    @jax.jit
    def predict(params, im1, im2):
        return forward(model, params, im1, im2)["flow_f_out"]

    def eval_epe(params):
        es = []
        for i in range(0, args.pairs, args.batch):
            pred = predict(params, data["im1"][i:i + args.batch],
                           data["im2"][i:i + args.batch])
            es.append(epe(np.asarray(pred), gt[i:i + args.batch]))
        return float(np.mean(es))

    rng = np.random.RandomState(args.seed + 1)
    history = []
    t0 = time.time()
    e0 = eval_epe(state.params)
    gt_mag = float(np.linalg.norm(gt, axis=-1).mean())
    print(f"step 0: epe={e0:.3f} (gt mean magnitude {gt_mag:.2f}px)")
    history.append((0, e0))
    for step in range(1, args.steps + 1):
        idx = rng.choice(args.pairs, args.batch, replace=False)
        batch = {k: jnp.asarray(v[idx]) for k, v in data.items()}
        state, metrics = train_step(state, batch)
        if step % args.eval_every == 0 or step == args.steps:
            e = eval_epe(state.params)
            history.append((step, e))
            print(f"step {step}: epe={e:.3f} "
                  f"total_loss={float(metrics['total_loss']):.4f} "
                  f"({time.time() - t0:.0f}s)")

    if args.out:
        from upflow_pytorch_tpu.checkpoint.npz_io import save_params_npz
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        save_params_npz(args.out, jax.device_get(state.params))
        print("saved", args.out)
    print(json.dumps({"epe_history": history, "gt_mean_mag_px": gt_mag}))


if __name__ == "__main__":
    main()
