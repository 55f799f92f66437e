"""Training step: loss decreases on an overfit pair; optimizer semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from upflow_pytorch_tpu.config import TrainerConfig, UPFlowConfig
from upflow_pytorch_tpu.train.step import (
    create_train_state,
    make_optimizer,
    make_train_step,
)

CONF = UPFlowConfig().updated(dict(
    if_use_boundary_warp=False,  # plain warping for this test
    if_use_cor_pytorch=True,
    if_sgu_upsample=False,
))


@pytest.mark.slow
def test_loss_decreases_on_overfit_pair():
    tc = TrainerConfig(lr=2e-4)
    model, state, tx = create_train_state(CONF, tc, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, tx))
    rng = np.random.RandomState(0)
    # a smooth translating pattern: im2 = im1 shifted 2px right
    base = rng.rand(1, 40, 56, 3).astype(np.float32)
    import scipy.ndimage as ndi
    smooth = ndi.gaussian_filter(base, sigma=(0, 3, 3, 0)).astype(np.float32)
    im1 = smooth
    im2 = np.roll(smooth, 2, axis=2)
    batch = {"im1": jnp.asarray(im1), "im2": jnp.asarray(im2)}
    losses = []
    for i in range(25):
        state, metrics = step(state, batch)
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_optimizer_matches_torch_adam_amsgrad_semantics():
    """optax chain(add_decayed_weights, amsgrad) == torch Adam(amsgrad=True,
    weight_decay) on a quadratic."""
    import torch

    w0 = np.array([1.5, -2.0, 0.5], np.float32)
    tgt = np.array([0.3, 0.1, -0.7], np.float32)
    lr, wd = 1e-2, 1e-2

    tw = torch.tensor(w0.copy(), requires_grad=True)
    topt = torch.optim.Adam([tw], lr=lr, amsgrad=True, weight_decay=wd)
    for _ in range(10):
        topt.zero_grad()
        loss = ((tw - torch.tensor(tgt)) ** 2).sum()
        loss.backward()
        topt.step()

    tc = TrainerConfig(lr=lr, weight_decay=wd, scheduler_gamma=1.0,
                       batch_per_epoch=100)
    tx = make_optimizer(tc)
    w = jnp.asarray(w0)
    opt_state = tx.init(w)
    grad_fn = jax.grad(lambda w: jnp.sum((w - tgt) ** 2))
    for _ in range(10):
        updates, opt_state = tx.update(grad_fn(w), opt_state, w)
        w = optax.apply_updates(w, updates)
    np.testing.assert_allclose(np.asarray(w), tw.detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def test_exponential_lr_schedule_steps_per_epoch():
    tc = TrainerConfig(lr=1.0, scheduler_gamma=0.5, batch_per_epoch=10)
    sched = optax.exponential_decay(init_value=tc.lr, transition_steps=10,
                                    decay_rate=tc.scheduler_gamma,
                                    staircase=True)
    assert float(sched(0)) == 1.0
    assert float(sched(9)) == 1.0
    assert float(sched(10)) == 0.5
    assert float(sched(25)) == 0.25
