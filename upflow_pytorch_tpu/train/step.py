"""Functional training step.

Optimizer matches the reference recipe (simple_train.py:121-122):
Adam(lr=1e-4, amsgrad=True, weight_decay=1e-4) + per-epoch ExponentialLR.
torch's Adam ``weight_decay`` is L2-to-gradient (not decoupled), i.e.
``optax.add_decayed_weights`` chained BEFORE the Adam transform.

The step is a pure function (params, opt_state, batch) -> (params,
opt_state, metrics); jit it directly for single-chip or wrap with shard_map
via ``upflow_pytorch_tpu.parallel`` for multi-chip data parallelism.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from upflow_pytorch_tpu.config import TrainerConfig, UPFlowConfig
from upflow_pytorch_tpu.models.upflow import (
    UPFlowNet,
    build_model,
    forward_with_loss,
    init_params,
)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


class _AmsgradState(NamedTuple):
    count: jax.Array
    mu: Any
    nu: Any
    nu_max: Any


def scale_by_amsgrad_torch(b1: float = 0.9, b2: float = 0.999,
                           eps: float = 1e-8) -> optax.GradientTransformation:
    """torch-exact AMSGrad scaling.

    optax.amsgrad bias-corrects nu BEFORE taking the running max; torch
    maxes the RAW second moment and bias-corrects afterwards
    (denom = sqrt(max_nu / (1 - b2^t)) + eps), which diverges slightly
    over training.  This transform reproduces torch's order.
    """

    def init(params):
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return _AmsgradState(jnp.zeros((), jnp.int32), zeros(), zeros(), zeros())

    def update(updates, state, params=None):
        del params
        count = state.count + 1
        t = count.astype(jnp.float32)
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates)
        nu_max = jax.tree_util.tree_map(jnp.maximum, state.nu_max, nu)
        bc1 = 1 - b1 ** t
        bc2 = 1 - b2 ** t
        out = jax.tree_util.tree_map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu, nu_max)
        return out, _AmsgradState(count, mu, nu, nu_max)

    return optax.GradientTransformation(init, update)


# subtrees frozen by if_froze_pwc (UPFlow_net.froze_PWC, upflow.py:575-583)
_PWC_FROZEN_ROOTS = ("feature_pyramid_extractor", "flow_estimators",
                     "context_networks")


def _pwc_frozen_mask(params):
    """True for params frozen by the reference's froze_PWC: the encoder,
    estimator, context net, and the per-level 1x1 convs."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    mask = {k: (k[1] in _PWC_FROZEN_ROOTS or k[1].startswith("conv_1x1_"))
            for k in flat}
    return flax.traverse_util.unflatten_dict(mask)


def make_optimizer(conf: TrainerConfig,
                   freeze_pwc: bool = False,
                   params=None) -> optax.GradientTransformation:
    lr = optax.exponential_decay(
        init_value=conf.lr,
        transition_steps=max(conf.batch_per_epoch, 1),
        decay_rate=conf.scheduler_gamma,
        staircase=True,
    )
    tx = optax.chain(
        optax.add_decayed_weights(conf.weight_decay),
        scale_by_amsgrad_torch(),
        optax.scale_by_learning_rate(lr),
    )
    if freeze_pwc:
        assert params is not None, "freeze_pwc needs the param tree"
        mask = _pwc_frozen_mask(params)
        tx = optax.chain(tx, optax.masked(optax.set_to_zero(), mask))
    return tx


def create_train_state(model_conf: UPFlowConfig, trainer_conf: TrainerConfig,
                       rng: jax.Array | None = None) -> Tuple[UPFlowNet, TrainState, optax.GradientTransformation]:
    if rng is None:
        rng = jax.random.PRNGKey(trainer_conf.seed)
    model = build_model(model_conf)
    params = init_params(model_conf, rng)
    tx = make_optimizer(trainer_conf, freeze_pwc=model_conf.if_froze_pwc,
                        params=params)
    opt_state = tx.init(params)
    return model, TrainState(params, opt_state, jnp.zeros((), jnp.int32)), tx


def make_train_step(model: UPFlowNet, tx: optax.GradientTransformation,
                    eq_loss_weight: float = 0.0,
                    eq_loss_use_occ: bool = True,
                    eq_loss_type: str = "abs_robust"):
    """Build the (un-jitted) train step; caller decides jit/shard_map.

    ``eq_loss_weight > 0`` enables the ARFlow spatial-transform
    equivariance pass (the ex_runner.py:224-284 recipe, fixed): a second
    forward on a randomly affine-transformed pair penalized against the
    transformed (detached) teacher flow.  The per-step rng is derived from
    the step counter, keeping the step a pure function of the state.
    """

    def loss_fn(params, batch, step):
        out = forward_with_loss(model, params, batch)
        total = out["total_loss"]
        metrics = {
            "photo_loss": out["photo_loss"],
            "smooth_loss": out["smooth_loss"],
        }
        if out["census_loss"] is not None:
            metrics["census_loss"] = out["census_loss"]
        if out["msd_loss"] is not None:
            metrics["msd_loss"] = out["msd_loss"]
        if eq_loss_weight > 0:
            from upflow_pytorch_tpu.losses.equivariance import equivariance_pass
            rng = jax.random.fold_in(jax.random.PRNGKey(17), step)
            teacher = {k: jax.lax.stop_gradient(out[k])
                       for k in ("flow_f_out", "flow_b_out",
                                 "occ_fw", "occ_bw")}
            eq = eq_loss_weight * equivariance_pass(
                model, params, batch, teacher, rng, use_occ=eq_loss_use_occ,
                loss_type=eq_loss_type)
            metrics["eq_loss"] = eq
            total = total + eq
        metrics["total_loss"] = total
        return total, metrics

    def train_step(state: TrainState, batch: Dict[str, jax.Array]):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, state.step)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step
