"""KITTI evaluation entry point — the ``test.py`` equivalent
(/root/reference/test.py:19-64).

Usage:
    python scripts/kitti_eval.py --data-root /path/to/KITTI_data \\
        --split 2015_train --ckpt scripts/upflow_kitti2015.pth

Loads the reference .pth checkpoint (torch-free import), runs the full
KITTI eval bench and prints EPE All / F1 / EPE Noc / EPE Occ with the
reference's exact metric math.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np

import jax

from upflow_pytorch_tpu.config import UPFlowConfig
from upflow_pytorch_tpu.data.kitti import KittiFlowEvalDataset
from upflow_pytorch_tpu.eval.bench import EvaluationBench
from upflow_pytorch_tpu.models.upflow import build_model, init_params
from upflow_pytorch_tpu.train.trainer import NetEvalModel

# the reference eval config (test.py:22-30)
EVAL_CONF = UPFlowConfig().updated(dict(
    if_norm_before_cost_volume=True,
    norm_moments_across_channels=False,
    norm_moments_across_images=False,
    if_froze_pwc=False,
    if_use_cor_pytorch=False,
    if_sgu_upsample=True,
))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", required=True,
                    help="dir containing data_scene_flow/ and data_stereo_flow/")
    ap.add_argument("--split", default="2015_train",
                    choices=["2012_train", "2015_train", "2012_test", "2015_test"])
    ap.add_argument("--ckpt", default=None, help="reference .pth checkpoint")
    ap.add_argument("--orbax-ckpt", default=None, help="orbax checkpoint dir")
    ap.add_argument("--save-dir", default=None,
                    help="write predicted flows as KITTI 16-bit PNGs "
                         "(submission format) to this directory")
    ap.add_argument("--pad-multiple", type=int, default=None,
                    help="bucket eval sizes to multiples of N (fewer "
                         "recompiles; slightly off native-size parity)")
    args = ap.parse_args()

    model = build_model(EVAL_CONF)
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_params(EVAL_CONF, jax.random.PRNGKey(0))
    if args.ckpt:
        from upflow_pytorch_tpu.checkpoint.torch_import import load_pretrained_params
        params, report = load_pretrained_params(args.ckpt, params, verbose=True)
    elif args.orbax_ckpt:
        from upflow_pytorch_tpu.checkpoint.orbax_io import restore_checkpoint
        params = restore_checkpoint(args.orbax_ckpt, params)
    params = jax.device_put(params, jax.devices()[0])

    dataset = KittiFlowEvalDataset(args.data_root, args.split)
    bench = EvaluationBench(dataset,
                            is_test_split=args.split.endswith("_test"),
                            verbose=True)
    eval_model = NetEvalModel(model, params,
                              pad_to_multiple=args.pad_multiple)
    if args.save_dir:
        import os

        from upflow_pytorch_tpu.data.flow_io import write_flow_png

        os.makedirs(args.save_dir, exist_ok=True)
        save_dir = args.save_dir

        class SavingModel(NetEvalModel):
            def eval_save_result(self, save_name, predflow, *a, **k):
                flow = np.asarray(predflow)[0]
                write_flow_png(os.path.join(save_dir,
                                            "%s.png" % save_name), flow)

        eval_model = SavingModel(model, params,
                                 pad_to_multiple=args.pad_multiple)
    res = bench(eval_model)
    if res is not None:
        print("EPE All = %.2f, F1 = %.2f, EPE Noc = %.2f, EPE Occ = %.2f"
              % (res.epe_all, res.f1, res.epe_noc, res.epe_occ))


if __name__ == "__main__":
    main()
