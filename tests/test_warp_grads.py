"""Gradients of the custom-VJP bilinear sampler vs numerical/auto diff."""

import numpy as np

import jax
import jax.numpy as jnp

from upflow_pytorch_tpu.ops.warp import (
    _abs_coords,
    _bilinear_sample,
    _bilinear_sample_fwd_impl,
    flow_warp,
)

RNG = np.random.RandomState(31)


def autodiff_reference(img, px, py):
    """The same sampling math built from differentiable jnp ops only."""
    def sample(img, px, py):
        out, _ = _bilinear_sample_fwd_impl(img, px, py)
        return out
    return sample


def test_custom_vjp_matches_autodiff():
    img = jnp.asarray(RNG.rand(2, 10, 14, 3).astype(np.float32))
    flow = jnp.asarray(((RNG.rand(2, 10, 14, 2) - 0.5) * 6).astype(np.float32))
    px, py = _abs_coords(flow)
    g = jnp.asarray(RNG.randn(2, 10, 14, 3).astype(np.float32))

    def loss_custom(img, px, py):
        return jnp.sum(_bilinear_sample(img, px, py) * g)

    def loss_auto(img, px, py):
        out, _ = _bilinear_sample_fwd_impl(img, px, py)
        return jnp.sum(out * g)

    gc = jax.grad(loss_custom, argnums=(0, 1, 2))(img, px, py)
    ga = jax.grad(loss_auto, argnums=(0, 1, 2))(img, px, py)
    for c, a, name in zip(gc, ga, ("d_img", "d_px", "d_py")):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_flow_warp_grad_flow_numerical():
    img = jnp.asarray(RNG.rand(1, 8, 9, 2).astype(np.float32))
    flow0 = ((RNG.rand(1, 8, 9, 2) - 0.5) * 3).astype(np.float32)
    # keep away from integer lattice where bilinear is non-differentiable
    flow0 = np.where(np.abs(flow0 - np.round(flow0)) < 0.1, flow0 + 0.17,
                     flow0).astype(np.float32)
    g = RNG.randn(1, 8, 9, 2).astype(np.float32)

    def loss(fl):
        return jnp.sum(flow_warp(img, fl) * g)

    analytic = np.asarray(jax.grad(loss)(jnp.asarray(flow0)))
    eps = 1e-3
    for _ in range(10):
        i = tuple(RNG.randint(0, s) for s in flow0.shape)
        e = np.zeros_like(flow0)
        e[i] = eps
        num = (float(loss(jnp.asarray(flow0 + e)))
               - float(loss(jnp.asarray(flow0 - e)))) / (2 * eps)
        np.testing.assert_allclose(analytic[i], num, rtol=5e-2, atol=5e-3)
