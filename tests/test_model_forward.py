"""Model-level smoke tests (the reference's UPFlow_net.demo() analog,
upflow.py:589-637): shapes, finiteness, loss values, jit-ability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upflow_pytorch_tpu.config import UPFlowConfig
from upflow_pytorch_tpu.models.upflow import (
    build_model,
    forward,
    forward_with_loss,
    init_params,
)

# the reference demo's training config (upflow.py:591-619)
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


def _batch(rng, h=64, w=96, b=1, full_margin=8):
    im_raw = rng.rand(b, h + 2 * full_margin, w + 2 * full_margin, 3).astype(np.float32)
    start = np.full((b, 2), float(full_margin), np.float32)
    im1 = im_raw[:, full_margin:full_margin + h, full_margin:full_margin + w]
    return {
        "im1": jnp.asarray(im1),
        "im2": jnp.asarray(im1 * 0.9 + 0.05),
        "im1_raw": jnp.asarray(im_raw),
        "im2_raw": jnp.asarray(im_raw * 0.9 + 0.05),
        "start": jnp.asarray(start),
    }


@pytest.fixture(scope="module")
def demo_model():
    model = build_model(DEMO_CONF)
    params = init_params(DEMO_CONF, jax.random.PRNGKey(0))
    return model, params


def test_forward_shapes_and_finiteness(demo_model):
    model, params = demo_model
    batch = _batch(np.random.RandomState(0))
    out = forward(model, params, batch["im1"], batch["im2"])
    b, h, w, _ = batch["im1"].shape
    assert out["flow_f_out"].shape == (b, h, w, 2)
    assert out["flow_b_out"].shape == (b, h, w, 2)
    assert out["occ_fw"].shape == (b, h, w, 1)
    assert len(out["flows"]) == 5
    # finest-first ordering of the per-level flows
    assert out["flows"][0][0].shape[1] > out["flows"][1][0].shape[1]
    for k in ("flow_f_out", "flow_b_out", "occ_fw", "occ_bw"):
        assert np.isfinite(np.asarray(out[k])).all(), k
    occ = np.asarray(out["occ_fw"])
    assert set(np.unique(occ)).issubset({0.0, 1.0})


def test_forward_with_loss_finite(demo_model):
    model, params = demo_model
    batch = _batch(np.random.RandomState(1))
    out = forward_with_loss(model, params, batch)
    for name in ("photo_loss", "smooth_loss", "census_loss", "msd_loss",
                 "total_loss"):
        val = np.asarray(out[name])
        assert np.isfinite(val).all(), name
        assert val > 0, name


@pytest.mark.slow
def test_forward_jits_and_grads(demo_model):
    model, params = demo_model
    batch = _batch(np.random.RandomState(2))

    @jax.jit
    def loss_fn(p):
        return forward_with_loss(model, p, batch)["total_loss"]

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # at least some gradient signal everywhere
    norms = [float(jnp.abs(l).max()) for l in leaves]
    assert max(norms) > 0


def test_eval_config_no_sgu_runs():
    conf = UPFlowConfig().updated(dict(
        if_norm_before_cost_volume=True,
        norm_moments_across_channels=False,
        norm_moments_across_images=False,
        if_sgu_upsample=False,
        if_use_cor_pytorch=True,
    ))
    model = build_model(conf)
    params = init_params(conf, jax.random.PRNGKey(1))
    rng = np.random.RandomState(3)
    im = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    out = forward(model, params, im, im)
    # identical images -> flow should be near zero after decode from zeros
    assert np.isfinite(np.asarray(out["flow_f_out"])).all()


def test_non_multiple_of_64_input(demo_model):
    """KITTI native sizes are not /64; stride-2 convs floor and the final
    upsample restores the original size (upflow.py:522-523)."""
    model, params = demo_model
    rng = np.random.RandomState(4)
    h, w = 75, 98
    im = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    out = forward(model, params, im, im)
    assert out["flow_f_out"].shape == (1, h, w, 2)
