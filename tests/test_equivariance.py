"""Spatial-transform equivariance: identity/flip invariants + full pass."""

import numpy as np

import jax
import jax.numpy as jnp

from upflow_pytorch_tpu.losses.equivariance import (
    AffineParams,
    equivariance_loss,
    equivariance_pass,
    random_affine,
    transform_flow,
    transform_image,
)

RNG = np.random.RandomState(17)


def identity_params(b):
    return AffineParams(lin=jnp.tile(jnp.eye(2), (b, 1, 1)),
                        trans=jnp.zeros((b, 2)))


def test_identity_transform_is_noop():
    img = jnp.asarray(RNG.rand(2, 12, 20, 3).astype(np.float32))
    out, mask = transform_image(img, identity_params(2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)
    assert np.asarray(mask).min() == 1.0
    flow = jnp.asarray(RNG.randn(2, 12, 20, 2).astype(np.float32))
    out_f = transform_flow(flow, identity_params(2))
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(flow), atol=1e-5)


def test_hflip_transform_flips_and_negates_u():
    b, h, w = 1, 8, 16
    lin = jnp.asarray([[[-1.0, 0.0], [0.0, 1.0]]])
    params = AffineParams(lin=lin, trans=jnp.zeros((1, 2)))
    img = jnp.asarray(RNG.rand(b, h, w, 3).astype(np.float32))
    out, _ = transform_image(img, params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img)[:, :, ::-1],
                               atol=1e-5)
    flow = jnp.asarray(RNG.randn(b, h, w, 2).astype(np.float32))
    out_f = np.asarray(transform_flow(flow, params))
    ref = np.asarray(flow)[:, :, ::-1].copy()
    ref[..., 0] *= -1
    np.testing.assert_allclose(out_f, ref, atol=1e-5)


def test_equivariance_loss_zero_for_equal_flows():
    f = jnp.asarray(RNG.randn(1, 8, 8, 2).astype(np.float32))
    mask = jnp.ones((1, 8, 8, 1))
    val = float(equivariance_loss(f, f, mask))
    # abs-robust floor: sum over 2 channels of (0+0.01)**0.4, denom 2*N
    np.testing.assert_allclose(val, 0.01 ** 0.4, rtol=1e-5)


def test_equivariance_pass_runs_with_model():
    from upflow_pytorch_tpu.config import UPFlowConfig
    from upflow_pytorch_tpu.models.upflow import build_model, forward, init_params

    conf = UPFlowConfig().updated(dict(if_use_cor_pytorch=True,
                                       if_sgu_upsample=False))
    model = build_model(conf)
    params = init_params(conf, jax.random.PRNGKey(0))
    im1 = jnp.asarray(RNG.rand(1, 64, 64, 3).astype(np.float32))
    im2 = jnp.asarray(RNG.rand(1, 64, 64, 3).astype(np.float32))
    teacher = forward(model, params, im1, im2)
    # use_occ=False: with a random-init teacher the fb-check marks nearly
    # everything occluded, which (correctly) zeroes the occ-masked loss
    loss = equivariance_pass(model, params, {"im1": im1, "im2": im2},
                             teacher, jax.random.PRNGKey(1), use_occ=False)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_equivariance_loss_l1_matches_reference_recipe():
    """eq_loss_type='L1' is the reference's exact masked-L1 penalty
    (ex_runner.py:266-276): sum(|diff| * mask) / (sum(mask) * 2)."""
    s = jnp.asarray(RNG.randn(1, 6, 6, 2).astype(np.float32))
    t = jnp.asarray(RNG.randn(1, 6, 6, 2).astype(np.float32))
    mask = jnp.asarray((RNG.rand(1, 6, 6, 1) > 0.3).astype(np.float32))
    got = float(equivariance_loss(s, t, mask, loss_type="L1"))
    d = np.abs(np.asarray(s) - np.asarray(t)) * np.asarray(mask)
    want = d.sum() / (np.asarray(mask).sum() * 2 + 1e-6)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # zero for equal flows (no abs-robust floor, unlike the default)
    assert float(equivariance_loss(s, s, mask, loss_type="L1")) == 0.0
