"""The UPFlow network, TPU-native.

Re-design of ``UPFlow_net`` (/root/reference/model/upflow.py:291-641) as a
Flax linen module (NHWC) plus pure functional forward/loss wrappers.

Structure of the forward pass (reference call stack at upflow.py:494-573):

- 6-level feature pyramid encoder, coarsest-first; decoding runs on levels
  0..output_level(=4), i.e. 1/64 .. 1/4 resolution.
- Per level (SHARED estimator/context weights, per-level 1x1 skip convs):
  rate-scaled x2 flow upsample -> optional SGU refinement -> bidirectional
  masked feature warping -> optional feature normalization -> 81-channel
  cost-volume correlation (+LeakyReLU) -> dense flow estimator -> dilated
  context network; the flow residual accumulates over both heads.
- Final flow upsampled to full resolution with rate scaling; optionally the
  SGU module replaces the bilinear upsample using 1/4-res features computed
  from the raw images (upflow.py:526-530).

The per-level loop is Python-unrolled (5 iterations over ragged shapes), as
in the reference; under ``jit`` it traces once into a single XLA program.

Losses (training) are assembled by ``forward_with_loss`` following
upflow.py:394-491: edge-aware smoothness, (boundary-dilated) photometric,
census, and multi-scale pyramid distillation, with analytic occlusion masks.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from upflow_pytorch_tpu.config import UPFlowConfig
from upflow_pytorch_tpu.losses.census import census_loss
from upflow_pytorch_tpu.losses.photometric import photo_loss_multi_type
from upflow_pytorch_tpu.losses.smoothness import (
    edge_aware_smoothness_order1,
    edge_aware_smoothness_order2,
    flow_smooth_delta,
)
from upflow_pytorch_tpu.models.blocks import (
    ConvBlock,
    ContextNetwork,
    FeatureExtractor,
    FlowEstimatorDense,
    SGUDenseEstimator,
    SGUOutputConv,
)
from upflow_pytorch_tpu.models.occlusion import occ_check
from upflow_pytorch_tpu.ops.correlation import correlation
from upflow_pytorch_tpu.ops.normalize import normalize_features
from upflow_pytorch_tpu.ops.resize import (
    downsample_area,
    upsample2d_as,
    upsample2d_flow_as,
    upsample_flow,
)
from upflow_pytorch_tpu.ops.warp import (
    boundary_dilated_warp,
    flow_warp,
    flow_warp_masked,
    sgu_blend,
)


def _sgu_final_xla(output_hw, ops):
    """Plain-XLA final SGU stage (also the custom-VJP backward path)."""
    oh, ow = output_hw
    fq, xo = ops
    flow_out = upsample2d_flow_as(fq, (oh, ow), if_rate=True)
    inter_flow = upsample2d_flow_as(xo[..., :2], (oh, ow), if_rate=True)
    inter_mask = upsample2d_as(jax.nn.sigmoid(xo[..., 2:3]), (oh, ow))
    return (flow_warp(flow_out, inter_flow) * (1 - inter_mask)
            + flow_out * inter_mask)


_SGU_MED_RY = 40   # medium-tier warp window (full-res px); trained
_SGU_MED_RX = 120  # checkpoints produce rate-scaled inter-flows of ~25-38


def _resize_plane(p, oh, ow):
    """Planar (B, H, W) fp32 align_corners bilinear resize — the same
    matmul formulation (and bit-identical values) as ops/resize.py's
    NHWC path, without materializing full-res C-minor tensors."""
    from upflow_pytorch_tpu.ops.resize import _interp_matrix_np

    b, h, w = p.shape
    prec = jax.lax.Precision.HIGHEST
    if oh != h:
        p = jnp.einsum("oh,bhw->bow", jnp.asarray(_interp_matrix_np(oh, h)),
                       p, precision=prec)
    if ow != w:
        p = jnp.einsum("ow,bhw->bho", jnp.asarray(_interp_matrix_np(ow, w)),
                       p, precision=prec)
    return p


def _sgu_final_planar(output_hw, ops):
    """Medium-tier final SGU stage: the exact `_sgu_final_xla` math,
    composed PLANAR end-to-end with the windowed Pallas warp.

    Trained checkpoints produce rate-scaled inter-flows way outside the
    fused kernel's +-2 px window (measured 24-38 px on the synthetic
    ckpt), and the plain-XLA composition costs ~41 ms/direction at KITTI
    size: the full-res (B, H, W, 2) intermediates get C=2 on the
    128-lane axis (64x padded) and the warp lowers to scalar-core
    gathers.  Here every intermediate is a (B, H, W) plane (matmul
    resizes identical to ops/resize.py) and the warp is the windowed
    kernel (REQUIRES rate-scaled |iu| <= _SGU_MED_RX - 1,
    |iv| <= _SGU_MED_RY - 1 — checked by the dispatch on the
    pre-upsample extrema; bilinear upsampling cannot exceed them).
    """
    from upflow_pytorch_tpu.ops.pallas.warp import (
        flow_warp_pallas_window_planar)

    oh, ow = output_hw
    fq, xo = ops
    hq, wq = fq.shape[1:3]
    dt = fq.dtype
    # mirror upsample2d_flow_as(..., if_rate=True): fp32 matmul resize,
    # cast back to the input dtype, THEN rate-scale in that dtype
    ru = jnp.asarray(ow / wq, dt)
    rv = jnp.asarray(oh / hq, dt)
    u = (_resize_plane(fq[..., 0].astype(jnp.float32), oh, ow
                       ).astype(dt) * ru)
    v = (_resize_plane(fq[..., 1].astype(jnp.float32), oh, ow
                       ).astype(dt) * rv)
    xdt = xo.dtype
    iu = (_resize_plane(xo[..., 0].astype(jnp.float32), oh, ow
                        ).astype(xdt) * jnp.asarray(ow / wq, xdt))
    iv = (_resize_plane(xo[..., 1].astype(jnp.float32), oh, ow
                        ).astype(xdt) * jnp.asarray(oh / hq, xdt))
    m = _resize_plane(jax.nn.sigmoid(xo[..., 2].astype(jnp.float32)),
                      oh, ow).astype(xdt)
    # flow_warp == torch grid_sample(zeros pad): fold the torch-grid
    # coordinate roundtrip into an effective flow (flow_warp_fast's move),
    # computed planar (no full-res NHWC stacks).  UPFLOW_SGU_MED=gather
    # swaps the windowed Pallas warp for the XLA gather on the planar
    # composition — near-equal runtime standalone (12.1 vs 11.0 ms) with
    # a far cheaper compile (no Mosaic kernel; the planar layouts are
    # what kill the in-graph 41 ms, not the gather itself).
    from upflow_pytorch_tpu.ops.warp import _torch_grid_roundtrip

    xs = jnp.arange(ow, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(oh, dtype=jnp.float32)[None, :, None]
    if os.environ.get("UPFLOW_SGU_MED", "warp") == "gather":
        from upflow_pytorch_tpu.ops.warp import _bilinear_zero_pad
        px = _torch_grid_roundtrip(xs + iu.astype(jnp.float32), ow)
        py = _torch_grid_roundtrip(ys + iv.astype(jnp.float32), oh)
        px = jnp.broadcast_to(px, u.shape)
        py = jnp.broadcast_to(py, u.shape)
        wpd, _ = _bilinear_zero_pad(
            jnp.stack([u, v], axis=-1).astype(jnp.float32), px, py)
        wu, wv = wpd[..., 0], wpd[..., 1]
    else:
        eff_u = _torch_grid_roundtrip(xs + iu.astype(jnp.float32), ow) - xs
        eff_v = _torch_grid_roundtrip(ys + iv.astype(jnp.float32), oh) - ys
        wu, wv = flow_warp_pallas_window_planar(
            (u, v), eff_u, eff_v, r_y=_SGU_MED_RY, r_x=_SGU_MED_RX)
    wu = wu.astype(dt)
    wv = wv.astype(dt)
    one = jnp.float32(1.0)
    out_u = wu * (one - m) + u * m
    out_v = wv * (one - m) + v * m
    return jnp.stack([out_u, out_v], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _sgu_final_op(output_hw, flow_q, x_out):
    return _sgu_final_op_impl(output_hw, flow_q, x_out)


def _sgu_final_op_impl(output_hw, flow_q, x_out):
    """Three-tier dispatch on the rate-scaled inter-flow extrema
    (bilinear upsampling cannot exceed the pre-upsample extrema, so the
    bounds are checked cheaply on the quarter-res x_out):

      <= 2 px                       -> fully-fused Pallas kernel (~1 ms)
      <= medium window (40/120 px)  -> planar + windowed Pallas warp
                                       (trained ckpts live here: measured
                                       24-38 px rate-scaled inter-flows)
      beyond                        -> exact plain-XLA gather composition
    """
    oh, ow = output_hw
    hq, wq = flow_q.shape[1:3]
    from upflow_pytorch_tpu.ops.pallas.sgu_final import sgu_final_pallas

    iu_max = jnp.max(jnp.abs(x_out[..., 0])) * (ow / wq)
    iv_max = jnp.max(jnp.abs(x_out[..., 1])) * (oh / hq)
    pred_fused = (iu_max <= jnp.float32(2.0)) & (iv_max <= jnp.float32(2.0))
    pred_med = ((iu_max <= jnp.float32(_SGU_MED_RX - 1))
                & (iv_max <= jnp.float32(_SGU_MED_RY - 1)))
    return jax.lax.cond(
        pred_fused,
        lambda ops: sgu_final_pallas(ops[0], ops[1], (oh, ow)),
        lambda ops: jax.lax.cond(
            pred_med,
            functools.partial(_sgu_final_planar, (oh, ow)),
            functools.partial(_sgu_final_xla, (oh, ow)), ops),
        (flow_q, x_out))


def _sgu_final_op_fwd(output_hw, flow_q, x_out):
    return _sgu_final_op_impl(output_hw, flow_q, x_out), (flow_q, x_out)


def _sgu_final_op_bwd(output_hw, res, g):
    flow_q, x_out = res
    return jax.vjp(lambda fq, xo: _sgu_final_xla(output_hw, (fq, xo)),
                   flow_q, x_out)[1](g)


_sgu_final_op.defvjp(_sgu_final_op_fwd, _sgu_final_op_bwd)


class UPFlowNet(nn.Module):
    """Bidirectional PWC-style pyramid flow network with SGU upsampling."""

    conf: UPFlowConfig = UPFlowConfig()

    def setup(self):
        c = self.conf
        dtype = jnp.bfloat16 if c.compute_dtype == "bfloat16" else jnp.float32
        self._dtype = dtype
        # optional rematerialization: the dense-concat decoder stacks hold
        # the largest activations; recompute them in backward when asked
        estimator_cls = (nn.remat(FlowEstimatorDense) if c.remat
                         else FlowEstimatorDense)
        context_cls = nn.remat(ContextNetwork) if c.remat else ContextNetwork
        self.feature_pyramid_extractor = FeatureExtractor(c.num_chs, dtype=dtype)
        self.flow_estimators = estimator_cls(
            c.estimator_f_channels, out_channels=2, dtype=dtype)
        self.context_networks = context_cls(c.context_f_channels, dtype=dtype)
        # per-level 1x1 skip convs: 196/128/96/64/32 -> 32 (upflow.py:349-353)
        self.conv_1x1 = [
            ConvBlock(32, kernel_size=1, dtype=dtype, name=f"conv_1x1_{i}")
            for i in range(c.output_level + 1)
        ]
        if c.if_sgu_upsample:
            self.sgu_dense_estimator = SGUDenseEstimator(dtype=dtype)
            self.sgu_output_conv = SGUOutputConv(dtype=dtype)

    # --- SGU ---------------------------------------------------------------
    def _sgu_pair(self, flow_1, flow_2, feature_1, feature_2,
                  output_hw=None):
        """Both directions of ``sgu_model.forward`` (upflow.py:71-89).

        Everything stays per-direction at batch B.  Direction-stacking
        the shared estimator to 2B was measured and REJECTED: XLA:TPU's
        conv lowering at batch 8 chooses batch-minor layouts that force
        relayout copies on every producer around the stack boundary
        (+41 ms on the KITTI bench despite the stacked conv stack itself
        being ~2x faster standalone — see STATUS_ROUND2.md).

        With ``output_hw`` (the FINAL upsample, upflow.py:522-530) the
        full-resolution upsample+warp+blend stage runs as one fused
        Pallas kernel on TPU — every full-res intermediate otherwise
        materializes in XLA-chosen layouts that pad the 2-channel flow
        64x on the lane axis (see ops/pallas/sgu_final.py).
        """
        fh, fw = feature_1.shape[1:3]
        if flow_1.shape[1:3] != (fh, fw):
            flow_1 = upsample2d_flow_as(flow_1, (fh, fw), if_rate=True)
            flow_2 = upsample2d_flow_as(flow_2, (fh, fw), if_rate=True)
        outs = []
        for i, (fl, fa, fb) in enumerate(((flow_1, feature_1, feature_2),
                                          (flow_2, feature_2, feature_1))):
            fbw = flow_warp_masked(fb, fl)
            _, x_out = self.sgu_dense_estimator([fa, fbw])
            x_out = x_out.astype(jnp.float32)
            if output_hw is not None:
                outs.append(self._sgu_final(fl, x_out, output_hw))
            else:
                inter_flow = x_out[..., :2]
                inter_mask = jax.nn.sigmoid(x_out[..., 2:3])
                outs.append(sgu_blend(fl, inter_flow, inter_mask))
        return outs[0], outs[1]

    @staticmethod
    def _sgu_final(flow_q, x_out, output_hw):
        """Final-resolution SGU stage for one direction: rate-scaled
        upsample of flow and inter-flow, sigmoided-mask upsample, blend
        warp (upflow.py:85-92).  On TPU this runs as ONE fused Pallas
        kernel whenever the rate-scaled inter-flow fits the warp
        window (bilinear upsampling cannot exceed the source extrema,
        so the +-2px bound is checked on the small pre-upsample
        tensor); exact XLA fallback otherwise and on CPU.  Gradients
        route through the XLA formulation via custom VJP."""
        oh, ow = int(output_hw[0]), int(output_hw[1])

        import os

        from upflow_pytorch_tpu.ops.warp import _pallas_warp_enabled

        # UPFLOW_SGU_FINAL=xla forces the plain-XLA composition (A/B
        # knob; the tiered op measured 97.9 ms vs 179.2 ms whole-forward
        # at KITTI shapes — docs/STATUS_ROUND4.md).  UPFLOW_SGU_TIER=xla
        # pins the exact tier for this stage AND sgu_blend (bench.py's
        # forced-fallback timing on real weights).
        mode = os.environ.get("UPFLOW_SGU_FINAL", "")
        if os.environ.get("UPFLOW_SGU_TIER") == "xla":
            mode = "xla"
        if mode == "xla" or not _pallas_warp_enabled(flow_q):
            return _sgu_final_xla((oh, ow), (flow_q, x_out))
        return _sgu_final_op((oh, ow), flow_q, x_out)

    # --- one decoder level ---------------------------------------------------
    def _decode_level(self, level, flow_1, flow_2, feature_1, feature_1_1x1,
                      feature_2, feature_2_1x1):
        """``decode_level_res`` (upflow.py:535-573).

        All per-direction at batch B (direction-stacking the shared conv
        stacks to 2B was measured and rejected — see ``_sgu_pair``).

        Returns (flow_1_up, flow_2_up, res_1, res_2)."""
        c = self.conf
        hw = feature_1.shape[1:3]
        flow_1_up = upsample2d_flow_as(flow_1, hw, if_rate=True)
        flow_2_up = upsample2d_flow_as(flow_2, hw, if_rate=True)
        if level > 0 and c.if_sgu_upsample:
            flow_1_up, flow_2_up = self._sgu_pair(
                flow_1_up, flow_2_up, feature_1_1x1, feature_2_1x1)
        use_pallas = not c.if_use_cor_pytorch

        from upflow_pytorch_tpu.ops import warp as warp_mod
        from upflow_pytorch_tpu.ops.pallas.corr_norm import (
            norm_items_from_conf, warp_norm_corr, warp_norm_corr_viable)

        if (level > 0 and use_pallas
                and warp_mod._feature_warp_enabled(feature_2)
                and warp_norm_corr_viable(feature_2.shape, c.search_range)):
            # SURVEY §7 stage-6 fusion: warped features and normalized
            # copies never reach HBM (reference hot loop upflow.py:546-564)
            norm_items = (norm_items_from_conf(c)
                          if c.if_norm_before_cost_volume else None)
            thr = warp_mod.mask_threshold()
            corr_1 = warp_norm_corr(feature_1, feature_2, flow_1_up,
                                    c.search_range, norm_items, 0.1,
                                    thr).astype(self._dtype)
            corr_2 = warp_norm_corr(feature_2, feature_1, flow_2_up,
                                    c.search_range, norm_items, 0.1,
                                    thr).astype(self._dtype)
        else:
            if level == 0:
                feature_2_warp = feature_2
                feature_1_warp = feature_1
            else:
                feature_2_warp = flow_warp_masked(feature_2, flow_1_up)
                feature_1_warp = flow_warp_masked(feature_1, flow_2_up)
            if c.if_norm_before_cost_volume:
                norm_kw = dict(
                    normalize=True, center=True,
                    moments_across_channels=c.norm_moments_across_channels,
                    moments_across_images=c.norm_moments_across_images)
                feature_1, feature_2_warp = normalize_features(
                    (feature_1, feature_2_warp), **norm_kw)
                feature_2, feature_1_warp = normalize_features(
                    (feature_2, feature_1_warp), **norm_kw)
            corr_1 = correlation(feature_1, feature_2_warp, c.search_range,
                                 use_pallas=use_pallas)
            corr_2 = correlation(feature_2, feature_1_warp, c.search_range,
                                 use_pallas=use_pallas)
            corr_1 = nn.leaky_relu(corr_1,
                                   negative_slope=0.1).astype(self._dtype)
            corr_2 = nn.leaky_relu(corr_2,
                                   negative_slope=0.1).astype(self._dtype)

        feat_1, res_1 = self.flow_estimators(
            [corr_1, feature_1_1x1, flow_1_up.astype(self._dtype)])
        feat_2, res_2 = self.flow_estimators(
            [corr_2, feature_2_1x1, flow_2_up.astype(self._dtype)])
        res_1 = res_1.astype(jnp.float32)
        res_2 = res_2.astype(jnp.float32)
        fine_1 = self.context_networks(
            feat_1 + [(flow_1_up + res_1).astype(self._dtype)]
        ).astype(jnp.float32)
        fine_2 = self.context_networks(
            feat_2 + [(flow_2_up + res_2).astype(self._dtype)]
        ).astype(jnp.float32)
        return flow_1_up, flow_2_up, res_1 + fine_1, res_2 + fine_2

    # --- full bidirectional forward ------------------------------------------
    def __call__(self, im1: jax.Array, im2: jax.Array):
        """``forward_2_frame_v3`` (upflow.py:494-533).

        im1, im2: (B, H, W, 3).  Returns (flow_f_out, flow_b_out, flows)
        where flows is the per-level [(flow_f, flow_b)] list FINEST-FIRST
        (the reference reverses before returning, upflow.py:533).
        """
        c = self.conf
        b, height, width, _ = im1.shape
        x1_pyramid = self.feature_pyramid_extractor(im1.astype(self._dtype))
        x2_pyramid = self.feature_pyramid_extractor(im2.astype(self._dtype))

        h0, w0 = x1_pyramid[0].shape[1:3]
        flow_f = jnp.zeros((b, h0, w0, 2), jnp.float32)
        flow_b = jnp.zeros((b, h0, w0, 2), jnp.float32)

        flows: List[Tuple[jax.Array, jax.Array]] = []
        for level in range(c.output_level + 1):
            x1 = x1_pyramid[level]
            x2 = x2_pyramid[level]
            x1_1by1 = self.conv_1x1[level](x1)
            x2_1by1 = self.conv_1x1[level](x2)
            flow_f_up, flow_b_up, res_f, res_b = self._decode_level(
                level, flow_f, flow_b, x1, x1_1by1, x2, x2_1by1)
            flow_f = flow_f_up + res_f
            flow_b = flow_b_up + res_b
            flows.append((flow_f, flow_b))

        if c.if_sgu_upsample:
            feature_1_1x1 = self.sgu_output_conv(im1.astype(self._dtype))
            feature_2_1x1 = self.sgu_output_conv(im2.astype(self._dtype))
            flow_f_out, flow_b_out = self._sgu_pair(
                flow_f, flow_b, feature_1_1x1, feature_2_1x1,
                output_hw=(height, width))
        else:
            flow_f_out = upsample2d_flow_as(flow_f, (height, width),
                                            if_rate=True)
            flow_b_out = upsample2d_flow_as(flow_b, (height, width),
                                            if_rate=True)
        return flow_f_out, flow_b_out, flows[::-1]


# =============================================================================
# Functional wrappers
# =============================================================================

def build_model(conf: UPFlowConfig = UPFlowConfig()):
    """Returns the linen module for ``conf``."""
    return UPFlowNet(conf=conf)


def init_params(conf: UPFlowConfig, rng: jax.Array,
                input_hw: Tuple[int, int] = (64, 64)):
    """Initialize parameters with MSRA/Kaiming conv init (pwc_modules.py:52-63)."""
    model = build_model(conf)
    h, w = input_hw
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    return model.init(rng, dummy, dummy)


def forward(model: UPFlowNet, params, im1: jax.Array, im2: jax.Array
            ) -> Dict[str, Any]:
    """Inference forward (``UPFlow_net.forward`` with if_loss=False,
    upflow.py:370-392): flows + analytic occlusion masks."""
    conf = model.conf
    flow_f, flow_b, flows = model.apply(params, im1, im2)
    occ_fw, occ_bw = occ_check(flow_f, flow_b, conf.alpha_1, conf.alpha_2,
                               conf.occ_check_obj_out_all, conf.occ_type)
    return {
        "flow_f_out": flow_f,
        "flow_b_out": flow_b,
        "occ_fw": occ_fw,
        "occ_bw": occ_bw,
        "flows": flows,
    }


def forward_with_loss(model: UPFlowNet, params, batch: Dict[str, jax.Array]
                      ) -> Dict[str, Any]:
    """Training forward + unsupervised losses (upflow.py:370-492).

    batch keys: im1, im2 (cropped, NHWC), optionally im1_raw, im2_raw,
    start (for boundary-dilated warping), im1_sp, im2_sp (special input).
    Returns the reference's output_dict fields plus ``total_loss``.
    """
    conf = model.conf
    im1_ori, im2_ori = batch["im1"], batch["im2"]
    if conf.input_or_sp_input == 1:
        im1, im2 = im1_ori, im2_ori
    else:
        im1, im2 = batch["im1_sp"], batch["im2_sp"]

    flow_f, flow_b, flows = model.apply(params, im1, im2)
    occ_fw, occ_bw = occ_check(flow_f, flow_b, conf.alpha_1, conf.alpha_2,
                               conf.occ_check_obj_out_all, conf.occ_type)

    out: Dict[str, Any] = {
        "flow_f_out": flow_f,
        "flow_b_out": flow_b,
        "occ_fw": occ_fw,
        "occ_bw": occ_bw,
        "flows": flows,
    }

    # === smoothness loss (upflow.py:396-428)
    if conf.smooth_level == "final":
        s_flow_f, s_flow_b = flow_f, flow_b
        s_im1, s_im2 = im1_ori, im2_ori
    elif conf.smooth_level == "1/4":
        s_flow_f, s_flow_b = flows[0]
        hw = s_flow_f.shape[1:3]
        s_im1 = downsample_area(im1_ori, hw)
        s_im2 = downsample_area(im2_ori, hw)
    else:
        raise ValueError("wrong smooth level: %s" % conf.smooth_level)

    smooth_loss = jnp.float32(0.0)
    if conf.smooth_order_1_weight > 0:
        if conf.smooth_type == "edge":
            fn1 = edge_aware_smoothness_order1
            smooth_loss = smooth_loss + conf.smooth_order_1_weight * (
                fn1(s_im1, s_flow_f) + fn1(s_im2, s_flow_b))
        elif conf.smooth_type == "delta":
            smooth_loss = smooth_loss + conf.smooth_order_1_weight * (
                flow_smooth_delta(s_flow_f) + flow_smooth_delta(s_flow_b))
        else:
            raise ValueError("wrong smooth_type: %s" % conf.smooth_type)
    if conf.smooth_order_2_weight > 0:
        if conf.smooth_type == "edge":
            fn2 = edge_aware_smoothness_order2
            smooth_loss = smooth_loss + conf.smooth_order_2_weight * (
                fn2(s_im1, s_flow_f) + fn2(s_im2, s_flow_b))
        elif conf.smooth_type == "delta":
            smooth_loss = smooth_loss + conf.smooth_order_2_weight * (
                flow_smooth_delta(s_flow_f, True) + flow_smooth_delta(s_flow_b, True))
        else:
            raise ValueError("wrong smooth_type: %s" % conf.smooth_type)
    out["smooth_loss"] = smooth_loss

    # === photometric loss (upflow.py:430-447)
    if conf.if_use_boundary_warp:
        im1_raw, im2_raw, start = batch["im1_raw"], batch["im2_raw"], batch["start"]
        im1_warp = boundary_dilated_warp(im2_raw, flow_f, start)
        im2_warp = boundary_dilated_warp(im1_raw, flow_b, start)
    else:
        im1_warp = flow_warp(im2_ori, flow_f)
        im2_warp = flow_warp(im1_ori, flow_b)

    occ_fw_l, occ_bw_l = occ_fw, occ_bw
    if conf.stop_occ_gradient:
        occ_fw_l = jax.lax.stop_gradient(occ_fw_l)
        occ_bw_l = jax.lax.stop_gradient(occ_bw_l)

    photo_loss = photo_loss_multi_type(
        im1_ori, im1_warp, occ_fw_l, conf.photo_loss_type,
        conf.photo_loss_delta, conf.photo_loss_use_occ)
    photo_loss = photo_loss + photo_loss_multi_type(
        im2_ori, im2_warp, occ_bw_l, conf.photo_loss_type,
        conf.photo_loss_delta, conf.photo_loss_use_occ)
    out["photo_loss"] = photo_loss
    out["im1_warp"] = im1_warp
    out["im2_warp"] = im2_warp

    # === census loss (upflow.py:449-458)
    if conf.photo_loss_census_weight > 0:
        cen = (census_loss(im1_ori, im1_warp, occ_fw_l, q=conf.photo_loss_delta,
                           charbonnier_or_abs_robust=False,
                           if_use_occ=conf.photo_loss_use_occ)
               + census_loss(im2_ori, im2_warp, occ_bw_l, q=conf.photo_loss_delta,
                             charbonnier_or_abs_robust=False,
                             if_use_occ=conf.photo_loss_use_occ))
        census = conf.photo_loss_census_weight * cen
    else:
        census = None
    out["census_loss"] = census

    # === multi-scale distillation loss (upflow.py:460-491)
    if conf.multi_scale_distillation_weight > 0:
        flow_fw_label = jax.lax.stop_gradient(flow_f)
        flow_bw_label = jax.lax.stop_gradient(flow_b)
        msd = jnp.float32(0.0)
        for scale_fw, scale_bw in flows:
            if conf.multi_scale_distillation_style == "down":
                hw = scale_fw.shape[1:3]
                label_fw = upsample_flow(flow_fw_label, hw)
                label_bw = upsample_flow(flow_bw_label, hw)
                occ_s_fw = _nearest_resize(occ_fw, hw)
                occ_s_bw = _nearest_resize(occ_bw, hw)
                pred_fw, pred_bw = scale_fw, scale_bw
            elif conf.multi_scale_distillation_style == "upup":
                hw = flow_fw_label.shape[1:3]
                pred_fw = upsample_flow(scale_fw, hw)
                pred_bw = upsample_flow(scale_bw, hw)
                label_fw, label_bw = flow_fw_label, flow_bw_label
                occ_s_fw, occ_s_bw = occ_fw, occ_bw
            else:
                raise ValueError("wrong multi_scale_distillation_style: %s"
                                 % conf.multi_scale_distillation_style)
            msd = msd + photo_loss_multi_type(
                pred_fw, label_fw, occ_s_fw, "abs_robust",
                photo_loss_use_occ=conf.multi_scale_distillation_occ)
            msd = msd + photo_loss_multi_type(
                pred_bw, label_bw, occ_s_bw, "abs_robust",
                photo_loss_use_occ=conf.multi_scale_distillation_occ)
        msd_loss = conf.multi_scale_distillation_weight * msd
    else:
        msd_loss = None
    out["msd_loss"] = msd_loss

    total = photo_loss + smooth_loss
    if census is not None:
        total = total + census
    if msd_loss is not None:
        total = total + msd_loss
    out["total_loss"] = total
    return out


def _nearest_resize(x: jax.Array, out_hw) -> jax.Array:
    """Nearest-neighbor resize matching torch F.interpolate(mode='nearest')
    (used for occ masks in 'down' distillation, upflow.py:468-470):
    src = floor(dst * in/out)."""
    b, h, w, c = x.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    iy = jnp.floor(jnp.arange(oh) * (h / oh)).astype(jnp.int32)
    ix = jnp.floor(jnp.arange(ow) * (w / ow)).astype(jnp.int32)
    return x[:, iy][:, :, ix]
