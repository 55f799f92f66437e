"""Full-model golden parity vs the torch reference (round-1 VERDICT §3).

Loads the actual reference ``UPFlow_net`` (/root/reference/model/upflow.py)
on CPU with ``if_use_cor_pytorch=True``, pushes IDENTICAL weights through
both frameworks via ``params_to_torch_state_dict``, and compares the full
bidirectional forward.

Two-level correctness argument:

1. **Op-level, strict semantics**: given IDENTICAL inputs, the masked warp
   (including torch's exact grid-roundtrip + weight arithmetic and the
   chaotic ``>= 1.0`` threshold, pwc_modules.py:205-206) matches the torch
   implementation bit-for-bit (``test_masked_warp_bit_parity``).
2. **Full-model**: the ``>= 1.0`` threshold bit depends on the last ulp of
   the flow, which two different conv stacks can never reproduce, and one
   flipped interior pixel at a coarse level snowballs through the decoder.
   So full-model comparisons neutralize ONLY that bit (both sides use the
   reference's own 0.9999 variant, tools.py:1263 — see
   ``reference_harness.relaxed_mask_threshold``) and then agree to
   ~1e-4 absolute on every flow output at every level.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from upflow_pytorch_tpu.checkpoint.torch_import import params_to_torch_state_dict
from upflow_pytorch_tpu.config import UPFlowConfig
from upflow_pytorch_tpu.models.occlusion import occ_check
from upflow_pytorch_tpu.models.upflow import build_model, init_params

from reference_harness import (
    build_reference_net,
    load_params_into_reference,
    load_reference_upflow,
    relaxed_mask_threshold,
)

# Reference knobs exercised by the forward pass; eval recipe = test.py:22-30.
EVAL_KNOBS = dict(
    if_norm_before_cost_volume=True,
    norm_moments_across_channels=False,
    norm_moments_across_images=False,
    if_sgu_upsample=True,
)


def _nchw(x: np.ndarray):
    import torch

    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def _nhwc(t) -> np.ndarray:
    return t.detach().numpy().transpose(0, 2, 3, 1)


def _make_pair(knobs: dict, seed: int = 0):
    conf = UPFlowConfig().updated(dict(knobs, if_use_cor_pytorch=True))
    params = init_params(conf, jax.random.PRNGKey(seed))
    model = build_model(conf)
    net = build_reference_net(knobs)
    load_params_into_reference(net, params_to_torch_state_dict(params))
    return conf, params, model, net


@pytest.mark.slow
@pytest.mark.parametrize("knobs,hw,tol", [
    (EVAL_KNOBS, (64, 96), 3e-4),   # aligned; SGU amplifies ulp noise a bit
    (EVAL_KNOBS, (72, 104), 3e-4),  # ragged pyramid shapes
    ({}, (64, 96), 1e-4),           # default config (no SGU, no cv-norm)
])
def test_full_model_forward_parity(knobs, hw, tol):
    import torch

    conf, params, model, net = _make_pair(knobs)
    h, w = hw
    rng = np.random.RandomState(1)
    im1 = rng.rand(2, h, w, 3).astype(np.float32)
    im2 = rng.rand(2, h, w, 3).astype(np.float32)

    with relaxed_mask_threshold():
        with torch.no_grad():
            out = net({"im1": _nchw(im1), "im2": _nchw(im2), "if_loss": False})
        flow_f, flow_b, _ = model.apply(params, jnp.asarray(im1),
                                        jnp.asarray(im2))
        occ_fw, occ_bw = occ_check(flow_f, flow_b, conf.alpha_1, conf.alpha_2,
                                   conf.occ_check_obj_out_all, conf.occ_type)

    for key, mine in [("flow_f_out", flow_f), ("flow_b_out", flow_b)]:
        err = np.abs(_nhwc(out[key]) - np.asarray(mine)).max()
        assert err < tol, "%s max err %.3e at %s" % (key, err, hw)
    # occ masks are binary thresholded at alpha-scaled magnitudes (robust,
    # not ulp-chaotic); identical weights should agree except at razor-thin
    # decision boundaries.
    for key, mine in [("occ_fw", occ_fw), ("occ_bw", occ_bw)]:
        frac = np.mean(_nhwc(out[key]) != np.asarray(mine))
        assert frac < 1e-3, "%s disagree on %.4f of pixels" % (key, frac)


@pytest.mark.slow
def test_per_level_flow_parity():
    """Per-level flows (finest-first list) agree — localizes any drift."""
    import torch

    conf, params, model, net = _make_pair(EVAL_KNOBS, seed=3)
    rng = np.random.RandomState(7)
    im1 = rng.rand(1, 64, 96, 3).astype(np.float32)
    im2 = rng.rand(1, 64, 96, 3).astype(np.float32)
    with relaxed_mask_threshold():
        with torch.no_grad():
            _, _, ref_levels = net.forward_2_frame_v3(_nchw(im1), _nchw(im2))
        _, _, levels = model.apply(params, jnp.asarray(im1), jnp.asarray(im2))
    assert len(ref_levels) == len(levels)
    for i, ((rf, rb), (mf, mb)) in enumerate(zip(ref_levels, levels)):
        ef = np.abs(_nhwc(rf) - np.asarray(mf)).max()
        eb = np.abs(_nhwc(rb) - np.asarray(mb)).max()
        assert ef < 1e-4 and eb < 1e-4, \
            "level %d (finest-first): fwd %.3e bwd %.3e" % (i, ef, eb)


def test_masked_warp_bit_parity():
    """STRICT-threshold masked warp matches torch bit-for-bit on identical
    inputs — the op-level proof that the grid roundtrip + weight arithmetic
    + >=1.0 threshold semantics are exactly reproduced."""
    import torch

    load_reference_upflow()
    from model.pwc_modules import WarpingLayer_no_div

    from upflow_pytorch_tpu.ops.warp import flow_warp_masked

    wl = WarpingLayer_no_div()
    rng = np.random.RandomState(0)
    for scale in (6.0, 0.05):  # large flows and near-integer tiny flows
        x = rng.rand(2, 16, 24, 32).astype(np.float32)
        flow = ((rng.rand(2, 16, 24, 2) - 0.5) * scale).astype(np.float32)
        with torch.no_grad():
            ref = _nhwc(wl(_nchw(x), _nchw(flow)))
        mine = np.asarray(flow_warp_masked(jnp.asarray(x), jnp.asarray(flow)))
        err = np.abs(ref - mine).max()
        assert err < 2e-7, "masked warp err %.3e at flow scale %s" % (err, scale)


def test_plain_warp_parity():
    """tools.torch_warp (no mask) vs flow_warp on identical inputs."""
    import torch

    load_reference_upflow()
    from utils.tools import tools as ref_tools

    from upflow_pytorch_tpu.ops.warp import flow_warp

    rng = np.random.RandomState(3)
    x = rng.rand(2, 12, 20, 3).astype(np.float32)
    flow = ((rng.rand(2, 12, 20, 2) - 0.5) * 5).astype(np.float32)
    with torch.no_grad():
        ref = _nhwc(ref_tools.torch_warp(_nchw(x), _nchw(flow)))
    mine = np.asarray(flow_warp(jnp.asarray(x), jnp.asarray(flow)))
    assert np.abs(ref - mine).max() < 2e-7
