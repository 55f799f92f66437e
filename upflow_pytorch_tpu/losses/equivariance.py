"""Spatial-transform equivariance (ARFlow-style teacher/student) loss.

The reference ships this as ``tools.SP_transform`` + the ex_runner
equivariance pass (/root/reference/utils/tools.py:760-1145,
/root/reference/scripts/ex_runner.py:224-284) but it is BROKEN there: it
depends on ``tools.Interpolation.Interp2/Meshgrid`` which do not exist
anywhere in the reference tree (tools.py:855-857).  This is a fresh,
working JAX implementation of the same idea:

1. draw a random affine (zoom, squeeze, rotation, translation, hflip) per
   batch item;
2. transform the input pair by inverse-warp sampling, I'(p) = I(A p + b);
3. transform the (detached) teacher flow as a vector field:
   f'(p) = A_lin^{-1} f(A p + b);
4. penalize the student flow computed on the transformed images against
   the transformed teacher flow (abs-robust), masked to pixels whose
   affine sample stays inside the frame (and optionally by occlusion).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from upflow_pytorch_tpu.ops.warp import _bilinear_zero_pad


class AffineParams(NamedTuple):
    """Per-item 2x2 linear part + translation (pixels, centered frame)."""

    lin: jax.Array   # (B, 2, 2)
    trans: jax.Array  # (B, 2)


def random_affine(rng: jax.Array, batch: int, zoom: Tuple[float, float] = (1.0, 1.5),
                  squeeze: Tuple[float, float] = (0.86, 1.16),
                  rotate_deg: float = 10.0, trans_frac: float = 0.1,
                  hflip_prob: float = 0.5) -> AffineParams:
    """Sample transform params (ranges follow the ARFlow defaults the
    reference's sp_config mirrors, ex_runner.py:246-252)."""
    k_z, k_s, k_r, k_t, k_f = jax.random.split(rng, 5)
    z = jax.random.uniform(k_z, (batch,), minval=zoom[0], maxval=zoom[1])
    s = jax.random.uniform(k_s, (batch,), minval=squeeze[0], maxval=squeeze[1])
    th = jax.random.uniform(k_r, (batch,), minval=-rotate_deg, maxval=rotate_deg)
    th = th * (jnp.pi / 180.0)
    t = jax.random.uniform(k_t, (batch, 2), minval=-trans_frac,
                           maxval=trans_frac)
    flip = jnp.where(jax.random.uniform(k_f, (batch,)) < hflip_prob, -1.0, 1.0)
    cos, sin = jnp.cos(th), jnp.sin(th)
    # A = R(th) @ diag(flip * z*s, z/s); sampling uses the inverse zoom so
    # zoom > 1 magnifies (samples a smaller source window)
    sx = flip / (z * s)
    sy = 1.0 / (z / s)
    lin = jnp.stack([
        jnp.stack([cos * sx, -sin * sy], axis=-1),
        jnp.stack([sin * sx, cos * sy], axis=-1),
    ], axis=-2)  # (B, 2, 2) rows: [x'; y'] from (x, y)
    return AffineParams(lin=lin, trans=t)


def _affine_coords(params: AffineParams, b: int, h: int, w: int):
    """Absolute source coords (px, py) for each output pixel."""
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    xc = jnp.broadcast_to(xs - cx, (b, h, w))
    yc = jnp.broadcast_to(ys - cy, (b, h, w))
    lin = params.lin
    tx = params.trans[:, 0, None, None] * w
    ty = params.trans[:, 1, None, None] * h
    px = (lin[:, 0, 0, None, None] * xc + lin[:, 0, 1, None, None] * yc
          + cx + tx)
    py = (lin[:, 1, 0, None, None] * xc + lin[:, 1, 1, None, None] * yc
          + cy + ty)
    return px, py


def transform_image(img: jax.Array, params: AffineParams):
    """I'(p) = I(A p + b); returns (image, in-frame mask (B,H,W,1))."""
    b, h, w, _ = img.shape
    px, py = _affine_coords(params, b, h, w)
    out, wsum = _bilinear_zero_pad(img, px, py)
    mask = (wsum >= 1.0).astype(jnp.float32)[..., None]
    return out.astype(img.dtype) * mask, mask


def transform_flow(flow: jax.Array, params: AffineParams) -> jax.Array:
    """f'(p) = A_lin^{-1} f(A p + b)."""
    b, h, w, _ = flow.shape
    px, py = _affine_coords(params, b, h, w)
    sampled, _ = _bilinear_zero_pad(flow, px, py)
    inv = jnp.linalg.inv(params.lin)  # (B, 2, 2)
    u = sampled[..., 0]
    v = sampled[..., 1]
    u2 = inv[:, 0, 0, None, None] * u + inv[:, 0, 1, None, None] * v
    v2 = inv[:, 1, 0, None, None] * u + inv[:, 1, 1, None, None] * v
    return jnp.stack([u2, v2], axis=-1)


def equivariance_loss(student_flow: jax.Array, teacher_flow: jax.Array,
                      valid_mask: jax.Array, occ_mask=None,
                      delta: float = 0.4,
                      loss_type: str = "abs_robust") -> jax.Array:
    """Distance between student and transformed-teacher flow, averaged
    over valid (and optionally non-occluded) pixels.

    ``loss_type='L1'`` reproduces the reference recipe exactly — the
    ex_runner equivariance pass penalizes a masked L1
    (ex_runner.py:266-276).  ``'abs_robust'`` (default) uses the same
    robust penalty as the reference's photometric/distillation losses,
    which is less outlier-dominated early in training.  The delta between
    the two is documented in PARITY.md.
    """
    mask = valid_mask
    if occ_mask is not None:
        mask = mask * occ_mask
    err = jnp.abs(student_flow - jax.lax.stop_gradient(teacher_flow))
    if loss_type == "abs_robust":
        diff = (err + 0.01) ** delta
    elif loss_type == "L1":
        diff = err
    else:
        raise ValueError("wrong equivariance loss_type: %s" % loss_type)
    return jnp.sum(diff * mask) / (jnp.sum(mask) * 2 + 1e-6)


def equivariance_pass(model, model_params, batch: Dict[str, jax.Array],
                      teacher_out: Dict[str, jax.Array], rng: jax.Array,
                      use_occ: bool = True,
                      loss_type: str = "abs_robust") -> jax.Array:
    """Full ARFlow pass: transform pair + teacher flow, student forward on
    transformed images, penalize disagreement.  Returns the scalar loss."""
    im1, im2 = batch["im1"], batch["im2"]
    b = im1.shape[0]
    params = random_affine(rng, b)
    im1_t, m1 = transform_image(im1, params)
    im2_t, m2 = transform_image(im2, params)
    flow_f_t = transform_flow(
        jax.lax.stop_gradient(teacher_out["flow_f_out"]), params)
    flow_b_t = transform_flow(
        jax.lax.stop_gradient(teacher_out["flow_b_out"]), params)
    occ_f = occ_b = None
    if use_occ:
        occ_f, _ = _bilinear_zero_pad(teacher_out["occ_fw"],
                                      *_affine_coords(params, b,
                                                      im1.shape[1],
                                                      im1.shape[2]))
        occ_b, _ = _bilinear_zero_pad(teacher_out["occ_bw"],
                                      *_affine_coords(params, b,
                                                      im1.shape[1],
                                                      im1.shape[2]))
        occ_f = (occ_f >= 0.999).astype(jnp.float32)
        occ_b = (occ_b >= 0.999).astype(jnp.float32)
    s_flow_f, s_flow_b, _ = model.apply(model_params, im1_t, im2_t)
    mask = m1 * m2
    loss = (equivariance_loss(s_flow_f, flow_f_t, mask, occ_f,
                              loss_type=loss_type)
            + equivariance_loss(s_flow_b, flow_b_t, mask, occ_b,
                                loss_type=loss_type))
    return loss
