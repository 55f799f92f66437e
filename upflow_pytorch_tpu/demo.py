"""Smoke demo — the ``UPFlow_net.demo()`` analog
(/root/reference/model/upflow.py:589-641): random input through the full
training-config forward + losses, printing tensor stats.

Run: ``python -m upflow_pytorch_tpu.demo``
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from upflow_pytorch_tpu.config import UPFlowConfig
from upflow_pytorch_tpu.models.upflow import (
    build_model,
    forward_with_loss,
    init_params,
)
from upflow_pytorch_tpu.utils.debug import check_tensor, count_params

DEMO_CONF = UPFlowConfig().updated(dict(
    photo_loss_census_weight=1,
    if_norm_before_cost_volume=True,
    norm_moments_across_channels=False,
    norm_moments_across_images=False,
    multi_scale_distillation_weight=1,
    multi_scale_distillation_style="upup",
    multi_scale_distillation_occ=True,
    if_use_boundary_warp=True,
    if_use_cor_pytorch=True,
    if_sgu_upsample=True,
))


def demo(size: int = 320):
    print(DEMO_CONF.get_name())
    model = build_model(DEMO_CONF)
    params = init_params(DEMO_CONF, jax.random.PRNGKey(0))
    print("params:", count_params(params))
    rng = np.random.RandomState(0)
    im = jnp.asarray(rng.random((1, size, size, 3)).astype(np.float32))
    start = jnp.zeros((1, 2), jnp.float32)
    batch = {"im1": im, "im2": im, "im1_raw": im, "im2_raw": im,
             "start": start}
    out = forward_with_loss(model, params, batch)
    print("smooth_loss", float(out["smooth_loss"]),
          "photo_loss", float(out["photo_loss"]),
          "census_loss", None if out["census_loss"] is None
          else float(out["census_loss"]))
    for key in ("flow_f_out", "flow_b_out", "occ_fw", "occ_bw",
                "im1_warp", "im2_warp"):
        check_tensor(out[key], key)
    for key in ("msd_loss", "total_loss"):
        val = out[key]
        print(key, None if val is None else float(val))


if __name__ == "__main__":
    demo()
