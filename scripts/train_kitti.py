"""Unsupervised KITTI training entry point — the ``simple_train.py``
equivalent (/root/reference/scripts/simple_train.py:82-208).

Usage:
    python scripts/train_kitti.py --mv-root /path/to/KITTI_mv \\
        --eval-root /path/to/KITTI_data --exp-dir ./exp1

Recipe flags mirror the reference's full UPFlow recipe: photometric (with
boundary-dilated warping) + edge-aware smoothness + census + pyramid
distillation, SGU upsampling, analytic occlusion masks; Adam(amsgrad) with
weight decay 1e-4.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

from upflow_pytorch_tpu.config import TrainerConfig, UPFlowConfig
from upflow_pytorch_tpu.data.kitti import KittiFlowEvalDataset, KittiMultiviewDataset
from upflow_pytorch_tpu.eval.bench import EvaluationBench
from upflow_pytorch_tpu.train.trainer import Trainer

TRAIN_CONF = UPFlowConfig().updated(dict(
    if_norm_before_cost_volume=True,
    norm_moments_across_channels=False,
    norm_moments_across_images=False,
    photo_loss_census_weight=1.0,
    multi_scale_distillation_weight=0.01,
    multi_scale_distillation_style="upup",
    multi_scale_distillation_occ=True,
    if_use_boundary_warp=True,
    if_sgu_upsample=True,
))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mv-root", required=True,
                    help="dir containing data_scene_flow_multiview/")
    ap.add_argument("--eval-root", default=None,
                    help="dir containing data_scene_flow/ (KITTI 2015 GT)")
    ap.add_argument("--mv-type", default="2015", choices=["2012", "2015"])
    ap.add_argument("--exp-dir", default="./demo_exp")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--data-axis", type=int, default=1,
                    help="data-parallel mesh size (chips)")
    ap.add_argument("--pretrained", default=None, help=".pth to warm-start")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--no-sgu", action="store_true",
                    help="phase-1 recipe without SGU (simple_train.py:177)")
    args = ap.parse_args()

    model_conf = TRAIN_CONF
    if args.no_sgu:
        model_conf = model_conf.updated(dict(if_sgu_upsample=False))
    trainer_conf = TrainerConfig(exp_dir=args.exp_dir, batchsize=args.batch,
                                 lr=args.lr, data_axis=args.data_axis)

    train_set = KittiMultiviewDataset(args.mv_root, args.mv_type)
    bench = None
    if args.eval_root:
        bench = EvaluationBench(KittiFlowEvalDataset(args.eval_root,
                                                     "2015_train"))
    trainer = Trainer(model_conf, trainer_conf, train_set, bench)
    if args.pretrained:
        trainer.load_pretrained(args.pretrained)
    if args.resume:
        trainer.try_resume()
    trainer.train(total_steps=args.steps)


if __name__ == "__main__":
    main()
