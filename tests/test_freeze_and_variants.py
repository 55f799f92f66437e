"""if_froze_pwc semantics + loss-variant coverage (smooth 1/4, delta,
charbonnier/L1/SSIM photo types, 'down' distillation)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from upflow_pytorch_tpu.config import TrainerConfig, UPFlowConfig
from upflow_pytorch_tpu.models.upflow import build_model, forward_with_loss, init_params
from upflow_pytorch_tpu.train.step import create_train_state, make_train_step

import flax

BASE = dict(if_use_cor_pytorch=True, if_sgu_upsample=False,
            if_use_boundary_warp=False)


def _batch(seed=0, h=32, w=48):
    rng = np.random.RandomState(seed)
    im = rng.rand(1, h, w, 3).astype(np.float32)
    return {"im1": jnp.asarray(im), "im2": jnp.asarray(np.roll(im, 1, 2))}


@pytest.mark.slow
def test_froze_pwc_keeps_pwc_params_fixed():
    conf = UPFlowConfig().updated({**BASE, "if_froze_pwc": True,
                                   "if_sgu_upsample": True})
    model, state, tx = create_train_state(conf, TrainerConfig(), jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, tx))
    new_state, _ = step(state, _batch())
    before = flax.traverse_util.flatten_dict(state.params)
    after = flax.traverse_util.flatten_dict(new_state.params)
    frozen_roots = ("feature_pyramid_extractor", "flow_estimators",
                    "context_networks")
    moved_sgu = False
    for k in before:
        a, b = np.asarray(before[k]), np.asarray(after[k])
        if k[1] in frozen_roots or k[1].startswith("conv_1x1_"):
            np.testing.assert_array_equal(a, b, err_msg=str(k))
        elif not np.allclose(a, b):
            moved_sgu = True
    assert moved_sgu  # SGU params must still train (upflow.py:575-583)


@pytest.mark.parametrize("overrides", [
    dict(smooth_level="1/4"),
    dict(smooth_type="delta", smooth_order_2_weight=1.0),
    dict(photo_loss_type="charbonnier"),
    dict(photo_loss_type="L1"),
    dict(photo_loss_type="SSIM", photo_loss_use_occ=True),
    dict(multi_scale_distillation_weight=1.0,
         multi_scale_distillation_style="down"),
    dict(photo_loss_use_occ=True, stop_occ_gradient=True),
])
def test_loss_variants_finite(overrides):
    conf = UPFlowConfig().updated({**BASE, **overrides})
    model = build_model(conf)
    params = init_params(conf, jax.random.PRNGKey(1))
    out = forward_with_loss(model, params, _batch(1))
    assert np.isfinite(float(out["total_loss"]))
    assert np.isfinite(float(out["smooth_loss"]))
