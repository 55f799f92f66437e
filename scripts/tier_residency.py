"""Measure SGU inter-flow extrema + tier residency for a checkpoint.

The 3-tier SGU dispatch (models/upflow.py::_sgu_final_op_impl,
ops/warp.py::_sgu_blend_tpu_impl) is bounded by the window-warp kernel's
r_y/r_x caps; whether a TRAINED checkpoint's inter-flows stay inside the
medium tier is an empirical property of the weights + input motion
distribution (VERDICT r4 weak #5).  This script runs the real forward
with a spy on every SGU stage and reports, per level and for the final
full-res stage, the rate-scaled inter-flow extrema and which tier the
runtime cond would take.

Usage:
  python scripts/tier_residency.py [ckpt=assets/synthetic_trained.npz]
      [batch=4 h=384 w=1280] [max_shift=4 max_rot=0.008 max_zoom=0.01]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

args = {}
for a in sys.argv[1:]:
    k, _, v = a.partition("=")
    if k in ("ckpt", "batch", "h", "w", "max_shift", "max_rot", "max_zoom",
             "seed"):
        args[k] = v
    else:
        os.environ[k] = v

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B = int(args.get("batch", 4))
H = int(args.get("h", 384))
W = int(args.get("w", 1280))


def main():
    from upflow_pytorch_tpu.config import UPFlowConfig
    from upflow_pytorch_tpu.checkpoint.npz_io import load_params_npz
    from upflow_pytorch_tpu.data.synthetic import make_dataset
    from upflow_pytorch_tpu.models.upflow import (
        _SGU_MED_RX, _SGU_MED_RY, build_model, init_params)
    from upflow_pytorch_tpu.ops.resize import upsample2d_flow_as
    from upflow_pytorch_tpu.ops.warp import flow_warp_masked

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
    ckpt = args.get("ckpt", os.path.join("assets", "synthetic_trained.npz"))
    params = load_params_npz(ckpt, params)
    params = jax.device_put(params, device)

    data = make_dataset(B, seed=int(args.get("seed", 7)), raw_hw=(H, W),
                        crop_hw=(H, W),
                        max_shift=float(args.get("max_shift", 4.0)),
                        max_rot=float(args.get("max_rot", 0.008)),
                        max_zoom=float(args.get("max_zoom", 0.01)))
    im1 = jax.device_put(data["im1"], device)
    im2 = jax.device_put(data["im2"], device)
    gt_mag = float(np.linalg.norm(data["gt_flow"], axis=-1).max())

    @jax.jit
    def spy(params, a, b):
        def run(m, a, b):
            p1 = m.feature_pyramid_extractor(a.astype(m._dtype))
            p2 = m.feature_pyramid_extractor(b.astype(m._dtype))
            bsz, h0, w0 = a.shape[0], *p1[0].shape[1:3]
            f1 = jnp.zeros((bsz, h0, w0, 2), jnp.float32)
            f2 = jnp.zeros((bsz, h0, w0, 2), jnp.float32)
            stats = {}
            for lv in range(len(m.conv_1x1)):
                x1, x2 = p1[lv], p2[lv]
                x1_1 = m.conv_1x1[lv](x1)
                x2_1 = m.conv_1x1[lv](x2)
                if lv > 0:
                    # spy on the intermediate SGU blend inter-flows
                    fh, fw = x1_1.shape[1:3]
                    fa = upsample2d_flow_as(f1, (fh, fw), if_rate=True)
                    fbw = flow_warp_masked(x2_1, fa)
                    _, x_out = m.sgu_dense_estimator([x1_1, fbw])
                    x_out = x_out.astype(jnp.float32)
                    stats[f"L{lv}_blend"] = (
                        jnp.max(jnp.abs(x_out[..., 0])),
                        jnp.max(jnp.abs(x_out[..., 1])))
                fu1, fu2, r1, r2 = m._decode_level(
                    lv, f1, f2, x1, x1_1, x2, x2_1)
                f1, f2 = fu1 + r1, fu2 + r2
            # final stage inter-flows (rate-scaled to full res)
            hq, wq = f1.shape[1:3]
            fe1 = m.sgu_output_conv(a.astype(m._dtype))
            fe2 = m.sgu_output_conv(b.astype(m._dtype))
            fbw = flow_warp_masked(fe2, f1)
            _, x_out = m.sgu_dense_estimator([fe1, fbw])
            x_out = x_out.astype(jnp.float32)
            stats["final"] = (jnp.max(jnp.abs(x_out[..., 0])) * (W / wq),
                              jnp.max(jnp.abs(x_out[..., 1])) * (H / hq))
            stats["flow_mag_max"] = jnp.max(
                jnp.linalg.norm(f1, axis=-1)) * (W / wq)
            return stats
        return model.apply(params, a, b, method=run)

    stats = {k: tuple(round(float(x), 2) for x in v)
             if isinstance(v, tuple) else round(float(v), 2)
             for k, v in spy(params, im1, im2).items()}
    fin_u, fin_v = stats["final"]
    tier = ("fused" if fin_u <= 2 and fin_v <= 2 else
            "medium" if fin_u <= _SGU_MED_RX - 1 and fin_v <= _SGU_MED_RY - 1
            else "exact-fallback")
    print(json.dumps({
        "ckpt": ckpt, "hw": [H, W], "batch": B,
        "input_motion": {k: float(args.get(k, d)) for k, d in
                         (("max_shift", 4.0), ("max_rot", 0.008),
                          ("max_zoom", 0.01))},
        "gt_flow_max_px": round(gt_mag, 1),
        "sgu_interflow_extrema": stats,
        "final_tier": tier,
        "bounds": {"med_rx": _SGU_MED_RX, "med_ry": _SGU_MED_RY,
                   "kernel_ry_cap": 46},
    }))


if __name__ == "__main__":
    main()
