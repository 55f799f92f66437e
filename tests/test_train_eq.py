"""Equivariance-enabled train step (the ex_runner recipe)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from upflow_pytorch_tpu.config import TrainerConfig, UPFlowConfig
from upflow_pytorch_tpu.train.step import create_train_state, make_train_step

CONF = UPFlowConfig().updated(dict(
    if_use_boundary_warp=False,
    if_use_cor_pytorch=True,
    if_sgu_upsample=False,
))


@pytest.mark.slow
def test_train_step_with_eq_loss():
    tc = TrainerConfig()
    model, state, tx = create_train_state(CONF, tc, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, tx, eq_loss_weight=0.1,
                                   eq_loss_use_occ=False))
    rng = np.random.RandomState(0)
    im = rng.rand(2, 32, 48, 3).astype(np.float32)
    batch = {"im1": jnp.asarray(im), "im2": jnp.asarray(np.roll(im, 1, 2))}
    state, metrics = step(state, batch)
    assert "eq_loss" in metrics
    assert np.isfinite(float(metrics["eq_loss"]))
    assert float(metrics["eq_loss"]) > 0
    assert np.isfinite(float(metrics["total_loss"]))
    # step counter advanced; a second step re-derives a fresh transform rng
    state2, metrics2 = step(state, batch)
    assert int(np.asarray(state2.step)) == 2
    assert float(metrics2["eq_loss"]) != float(metrics["eq_loss"])
