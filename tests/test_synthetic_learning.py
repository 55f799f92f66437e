"""Learning acceptance: the full unsupervised recipe learns FLOW.

VERDICT r2 item 4: loss-decreases tests cannot catch a sign error that
still lets total loss fall; the only in-environment proof the loss stack
learns *flow* is ground truth.  data/synthetic.py renders image pairs
from one analytic texture under an affine coordinate change, so the true
flow is known in closed form (zero resampling error).  Training the
reference recipe (photo + census + smooth + msd, SGU, boundary-dilated
warp — simple_train.py:119-156 / upflow.py:394-491 semantics) must
collapse EPE vs that ground truth.

Calibration on this host (scripts/train_synthetic.py, 64x160, batch 4,
lr 1e-4): EPE 13.4 (random init) -> 1.7 @ step 30 -> 0.91 @ step 60 ->
0.51 @ step 120.  The assertion sits at 1.3x the step-60 point.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from upflow_pytorch_tpu.config import TrainerConfig, UPFlowConfig
from upflow_pytorch_tpu.data.synthetic import epe, make_dataset
from upflow_pytorch_tpu.models.upflow import build_model, forward, init_params
from upflow_pytorch_tpu.train.step import (
    TrainState,
    make_optimizer,
    make_train_step,
)

STEPS = 60
PAIRS = 8
BATCH = 4


@pytest.mark.slow
def test_unsupervised_recipe_learns_flow():
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
    data = make_dataset(PAIRS, seed=0, raw_hw=(96, 192), crop_hw=(64, 160))
    gt = data.pop("gt_flow")

    model = build_model(conf)
    params = init_params(conf, jax.random.PRNGKey(0))
    tx = make_optimizer(TrainerConfig().updated(dict(lr=1e-4)))
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    train_step = jax.jit(make_train_step(model, tx))

    @jax.jit
    def predict(params, im1, im2):
        return forward(model, params, im1, im2)["flow_f_out"]

    def eval_epe(params):
        es = [epe(np.asarray(predict(params, data["im1"][i:i + BATCH],
                                     data["im2"][i:i + BATCH])),
                  gt[i:i + BATCH])
              for i in range(0, PAIRS, BATCH)]
        return float(np.mean(es))

    e0 = eval_epe(state.params)
    gt_mag = float(np.linalg.norm(gt, axis=-1).mean())
    assert e0 > 3.0 * gt_mag, (
        "random init unexpectedly accurate — test has no headroom")

    rng = np.random.RandomState(1)
    for _ in range(STEPS):
        idx = rng.choice(PAIRS, BATCH, replace=False)
        batch = {k: jnp.asarray(v[idx]) for k, v in data.items()}
        state, metrics = train_step(state, batch)
        assert np.isfinite(float(metrics["total_loss"]))

    e1 = eval_epe(state.params)
    # calibrated: 0.91 px at step 60 (gt mean 2.28 px); 1.3x margin
    assert e1 < 1.2, f"EPE vs GT did not collapse: {e0:.2f} -> {e1:.2f}"
    assert e1 < 0.25 * e0, f"insufficient improvement: {e0:.2f} -> {e1:.2f}"
