"""Smoothness losses, NHWC.

Mirrors ``network_tools.edge_aware_smoothness_order1/order2`` and
``flow_smooth_delta`` (/root/reference/model/upflow.py:197-263).

Note the reference's gradient_x slices dim 2 (NCHW H axis) and gradient_y
slices dim 3 (W axis) — i.e. its "x" gradient is actually along image rows.
Because both image and flow use the same axes and the two terms are summed,
the loss value is identical either way; we keep conventional axis naming.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _grad_h(x, stride: int = 1):
    return x[:, :-stride, :, :] - x[:, stride:, :, :]


def _grad_w(x, stride: int = 1):
    return x[:, :, :-stride, :] - x[:, :, stride:, :]


def edge_aware_smoothness_order1(img: jax.Array, pred: jax.Array) -> jax.Array:
    weights_h = jnp.exp(-jnp.mean(jnp.abs(_grad_h(img)), axis=-1, keepdims=True))
    weights_w = jnp.exp(-jnp.mean(jnp.abs(_grad_w(img)), axis=-1, keepdims=True))
    s_h = jnp.abs(_grad_h(pred)) * weights_h
    s_w = jnp.abs(_grad_w(pred)) * weights_w
    return jnp.mean(s_h) + jnp.mean(s_w)


def edge_aware_smoothness_order2(img: jax.Array, pred: jax.Array) -> jax.Array:
    pred_hh = _grad_h(_grad_h(pred))
    pred_ww = _grad_w(_grad_w(pred))
    weights_h = jnp.exp(-jnp.mean(jnp.abs(_grad_h(img, 2)), axis=-1, keepdims=True))
    weights_w = jnp.exp(-jnp.mean(jnp.abs(_grad_w(img, 2)), axis=-1, keepdims=True))
    return jnp.mean(jnp.abs(pred_hh) * weights_h) + jnp.mean(jnp.abs(pred_ww) * weights_w)


def flow_smooth_delta(flow: jax.Array, if_second_order: bool = False) -> jax.Array:
    dh = _grad_h(flow)
    dw = _grad_w(flow)
    loss = jnp.mean(jnp.abs(dh)) + jnp.mean(jnp.abs(dw))
    if if_second_order:
        dh2 = _grad_h(dh)
        dhw = _grad_w(dh)
        dwh = _grad_h(dw)
        dw2 = _grad_w(dw)
        loss = (loss + jnp.mean(jnp.abs(dh2)) + jnp.mean(jnp.abs(dhw))
                + jnp.mean(jnp.abs(dwh)) + jnp.mean(jnp.abs(dw2)))
    return loss
