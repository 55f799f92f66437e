"""Full-model GRADIENT parity vs the torch reference (round-2 VERDICT §7).

Pushes IDENTICAL weights and a small batch through BOTH frameworks'
training loss (photo + smooth + census + msd, boundary-dilated warp —
the reference recipe of simple_train.py:119-156 / upflow.py:394-491) and
compares d(total_loss)/d(params) parameter by parameter.

This closes the last correctness loop over the three custom VJPs on the
train path (segmented conv, masked feature warp, SGU stages): forward
parity alone cannot catch a wrong-but-plausible backward.

Tolerances: both sides are fp32 but reduce in different orders through a
5-level decoder whose losses divide by data-dependent mask sums; the
relaxed 0.9999 mask threshold (see reference_harness) removes the
chaotic mask-bit flips.  Measured agreement on this setup is ~1e-5
relative; the assertions sit at 30x that.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from upflow_pytorch_tpu.checkpoint.torch_import import params_to_torch_state_dict
from upflow_pytorch_tpu.config import UPFlowConfig
from upflow_pytorch_tpu.models.upflow import build_model, forward_with_loss, init_params

from reference_harness import (
    build_reference_net,
    load_params_into_reference,
    relaxed_mask_threshold,
)

# reference training recipe (simple_train.py:36-66), shrunk weights kept
TRAIN_KNOBS = dict(
    if_norm_before_cost_volume=True,
    norm_moments_across_channels=False,
    norm_moments_across_images=False,
    if_sgu_upsample=True,
    photo_loss_census_weight=1.0,
    multi_scale_distillation_weight=0.01,
    multi_scale_distillation_style="upup",
    multi_scale_distillation_occ=True,
    if_use_boundary_warp=True,
    stop_occ_gradient=True,
)


def _nchw(x: np.ndarray):
    import torch

    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def _torch_total_loss(net, batch_np):
    """The reference total loss: Loss_manager.compute_loss
    (simple_train.py:45-54) = sum of present loss_dict entries' means."""
    import torch

    input_dict = {
        "im1": _nchw(batch_np["im1"]).requires_grad_(False),
        "im2": _nchw(batch_np["im2"]),
        "im1_raw": _nchw(batch_np["im1_raw"]),
        "im2_raw": _nchw(batch_np["im2_raw"]),
        "start": torch.from_numpy(batch_np["start"]),
        "if_loss": True,
    }
    out = net(input_dict)
    total = 0
    for name in ("photo_loss", "smooth_loss", "census_loss", "msd_loss"):
        v = out.get(name)
        if v is not None:
            total = total + v.mean()
    return total


@pytest.mark.slow
def test_full_model_gradient_parity():
    import torch

    conf = UPFlowConfig().updated(dict(TRAIN_KNOBS, if_use_cor_pytorch=True))
    params = init_params(conf, jax.random.PRNGKey(11))
    model = build_model(conf)
    net = build_reference_net(TRAIN_KNOBS)
    load_params_into_reference(net, params_to_torch_state_dict(params))
    net.train()

    rng = np.random.RandomState(5)
    b, h, w, mh, mw = 2, 64, 96, 8, 12
    im1_raw = rng.rand(b, h + 2 * mh, w + 2 * mw, 3).astype(np.float32)
    im2_raw = rng.rand(b, h + 2 * mh, w + 2 * mw, 3).astype(np.float32)
    # (B, 2, 1, 1), (x, y) order — the reference's `start_n211` contract
    # (utils/tools.py:494 warp_im; grid[:, :2] += start adds x then y)
    start = np.tile(np.array([mw, mh], np.float32).reshape(1, 2, 1, 1),
                    (b, 1, 1, 1))
    batch_np = {
        "im1": im1_raw[:, mh:mh + h, mw:mw + w],
        "im2": im2_raw[:, mh:mh + h, mw:mw + w],
        "im1_raw": im1_raw,
        "im2_raw": im2_raw,
        "start": start,
    }

    with relaxed_mask_threshold():
        # --- torch backward
        for p in net.parameters():
            p.grad = None
        loss_t = _torch_total_loss(net, batch_np)
        loss_t.backward()
        torch_grads = {name: (p.grad.detach().numpy() if p.grad is not None
                              else np.zeros(p.shape, np.float32))
                       for name, p in net.named_parameters()}

        # --- jax backward
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

        def loss_fn(params):
            return forward_with_loss(model, params, batch)["total_loss"]

        loss_j, grads = jax.value_and_grad(loss_fn)(params)

    assert abs(float(loss_j) - float(loss_t)) < 1e-5 * max(
        1.0, abs(float(loss_t))), (float(loss_j), float(loss_t))

    # map jax grads onto torch param names via the same exporter used for
    # the weights themselves
    jax_grads = params_to_torch_state_dict(grads)
    assert set(jax_grads) == set(torch_grads)

    gnorm_sq_t = sum(float((g ** 2).sum()) for g in torch_grads.values())
    gscale = np.sqrt(gnorm_sq_t / max(len(torch_grads), 1))
    report = []
    for name in sorted(torch_grads):
        gt, gj = torch_grads[name], jax_grads[name]
        assert gt.shape == gj.shape, name
        diff = np.abs(gt - gj).max()
        denom = np.abs(gt).max()
        if denom > 1e-12:
            cos = float((gt * gj).sum() /
                        (np.linalg.norm(gt) * np.linalg.norm(gj) + 1e-30))
        else:
            cos = 1.0 if np.abs(gj).max() <= 1e-12 else 0.0
        report.append((name, diff, denom, cos))

    worst = sorted(report, key=lambda r: -(r[1] / (r[2] + 1e-12)))[:5]
    msg = "\n".join("%s: maxdiff %.3e (scale %.3e) cos %.6f" % r
                    for r in worst)
    for name, diff, denom, cos in report:
        # per-tensor: small absolute-vs-global-scale error AND aligned
        # direction for any tensor with non-negligible gradient
        assert diff <= 3e-4 * max(denom, gscale), (
            "gradient mismatch on %s\n%s" % (name, msg))
        if denom > 1e-6 * gscale:
            assert cos > 0.9999, "direction mismatch on %s\n%s" % (name, msg)
