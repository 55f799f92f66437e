"""Analytic occlusion estimation via forward-backward consistency.

Re-design of ``tools.occ_check_model`` (/root/reference/utils/tools.py:501-677)
for NHWC JAX.  Mask convention: 0 = occluded, 1 = visible (upflow.py:386).

Defaults used by the model: occ_type='for_back_check', alpha_1=0.1,
alpha_2=0.5, obj_out_all='obj' (upflow.py:295-298,364-365), and
``sum_abs_or_squar`` is hard-forced True in the reference constructor
(tools.py:517) so the length function is the sum of per-channel |.|
(implemented via sqrt(x^2) as the reference does).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from upflow_pytorch_tpu.ops.warp import flow_warp


def _length_sum_abs(x: jax.Array) -> jax.Array:
    # reference length_sq_v0: sum over channels of (x^2)^0.5
    return jnp.sum(jnp.sqrt(x ** 2), axis=-1, keepdims=True)


def _forward_backward_check(flow_fw, flow_bw, alpha_1, alpha_2, scale=1.0):
    mag = _length_sum_abs(flow_fw) + _length_sum_abs(flow_bw)
    flow_bw_warped = flow_warp(flow_bw, flow_fw)
    flow_fw_warped = flow_warp(flow_fw, flow_bw)
    diff_fw = flow_fw + flow_bw_warped
    diff_bw = flow_bw + flow_fw_warped
    thresh = alpha_1 * mag + alpha_2 / scale
    occ_fw = (_length_sum_abs(diff_fw) < thresh).astype(jnp.float32)
    occ_bw = (_length_sum_abs(diff_bw) < thresh).astype(jnp.float32)
    return occ_fw, occ_bw


def _outgoing_check(flow: jax.Array) -> jax.Array:
    """1 where the flow target stays inside the frame (tools.py:640-664)."""
    b, h, w, _ = flow.shape
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    pos_x = xs + flow[..., 0]
    pos_y = ys + flow[..., 1]
    inside = ((pos_x <= w - 1) & (pos_x >= 0) & (pos_y <= h - 1) & (pos_y >= 0))
    return inside.astype(jnp.float32)[..., None]


def occ_check(flow_fw: jax.Array, flow_bw: jax.Array,
              alpha_1: float = 0.1, alpha_2: float = 0.5,
              obj_out_all: str = "obj", occ_type: str = "for_back_check",
              scale: float = 1.0):
    """Returns (occ_fw, occ_bw) visibility masks (B, H, W, 1) in {0, 1}."""
    if occ_type != "for_back_check":
        raise ValueError("only 'for_back_check' is implemented (as in the "
                         "reference; 'forward_warp' raises there too)")
    if obj_out_all == "out":
        return _outgoing_check(flow_fw), _outgoing_check(flow_bw)
    occ_fw, occ_bw = _forward_backward_check(flow_fw, flow_bw,
                                             alpha_1, alpha_2, scale)
    if obj_out_all == "all":
        return occ_fw, occ_bw
    if obj_out_all == "obj":
        # pixels flowing OUT of the frame are forced visible (mask=1):
        # torch_get_obj_occ_check sets 1 where occ==1 OR out_occ==0
        # (tools.py:667-677)
        out_fw = _outgoing_check(flow_fw)
        out_bw = _outgoing_check(flow_bw)
        obj_fw = jnp.where((occ_fw == 1) | (out_fw == 0), 1.0, 0.0)
        obj_bw = jnp.where((occ_bw == 1) | (out_bw == 0), 1.0, 0.0)
        return obj_fw, obj_bw
    raise ValueError("obj_out_all must be 'obj', 'out' or 'all'")
