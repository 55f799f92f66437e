"""UPFlow network building blocks as Flax linen modules (NHWC).

Re-designs of the reference torch blocks
(/root/reference/model/pwc_modules.py):

- ``ConvBlock``           <- ``conv()`` factory (pwc_modules.py:10-49)
- ``FeatureExtractor``    <- (pwc_modules.py:122-142)
- ``FlowEstimatorDense``  <- ``FlowEstimatorDense_v2`` (pwc_modules.py:250-286)
  and ``FlowEstimatorDense_temp`` inside the SGU (upflow.py:24-60)
- ``ContextNetwork``      <- ``ContextNetwork_v2_`` (pwc_modules.py:396-412)
- ``SGUModel``            <- ``network_tools.sgu_model`` (upflow.py:20-92)

All convs: bias=True, LeakyReLU(0.1) unless ``relu=False``, SAME-style
explicit padding ``((k-1)*d)//2``, Kaiming-normal (MSRA, fan_in) init
matching ``initialize_msra`` (pwc_modules.py:52-63).  Params are stored
HWIO; the checkpoint importer transposes torch OIHW weights into this
layout.

TPU notes: channel counts in this net (32..196) are narrower than one MXU
tile, so the convs compile to MXU matmuls over im2col'd patches; NHWC is
the layout XLA:TPU prefers.  The optional ``dtype`` argument runs conv
arithmetic in bfloat16 while keeping fp32 params.
"""

from __future__ import annotations

import os
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# Kaiming-normal (fan_in, leaky_relu gain as torch's default a=0) matching
# torch.nn.init.kaiming_normal_ defaults: std = sqrt(2 / fan_in).
_kaiming = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


class _Conv2DParams(nn.Module):
    """Bare conv parameters with nn.Conv's exact tree layout
    (``{conv: {kernel, bias}}`` when named 'conv') — used by the Pallas
    fast path so checkpoints are interchangeable with the nn.Conv path."""

    features: int
    kernel_shape: Tuple[int, int, int, int]

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", _kaiming, self.kernel_shape)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


def _pallas_conv_enabled(x, kernel_size: int, stride: int,
                         compute_dtype) -> bool:
    """Fast-path predicate (trace-time): the fused Pallas conv handles
    3x3/stride-1 on TPU; it computes in bf16 (fp32 accumulation), so it
    engages only when the model explicitly opted into bfloat16 compute.
    Tiny maps stay on XLA (grid overhead dominates)."""
    from upflow_pytorch_tpu.ops.pallas_gate import pallas_disabled

    if pallas_disabled() or os.environ.get("UPFLOW_DISABLE_PALLAS_CONV"):
        return False
    if kernel_size != 3 or stride != 1 or compute_dtype != jnp.bfloat16:
        return False
    if x.shape[1] < 8 or x.shape[1] * x.shape[2] < 2048:
        return False
    if jax.default_backend() != "tpu":
        return False
    dd = jax.config.jax_default_device
    return dd is None or getattr(dd, "platform", "tpu") == "tpu"


def _seg_norm(s):
    """Normalize a segment to (array, live_channels).  Stored width may
    exceed live width (zero-padded Pallas conv outputs)."""
    if isinstance(s, tuple):
        return s
    return s, int(s.shape[-1])


def _group_segments(arrs, reals):
    """Concatenate consecutive runs of segments whose stored width is not
    a 128-multiple (the Pallas kernel DMAs each segment, and manual DMA
    requires 128-aligned channel dims; merging small XLA-produced inputs
    like [corr81, feat32, flow2] into one 115-channel buffer beats
    padding each to 128)."""
    g_arrs, g_reals, run = [], [], []
    for a, r in zip(arrs, reals):
        if a.shape[-1] % 128 == 0 and a.shape[-1] > 0:
            if run:
                g_arrs.append(jnp.concatenate([x[..., :c] for x, c in run],
                                              axis=-1) if len(run) > 1
                              else run[0][0][..., :run[0][1]])
                g_reals.append(sum(c for _, c in run))
                run = []
            g_arrs.append(a)
            g_reals.append(r)
        else:
            run.append((a, r))
    if run:
        g_arrs.append(jnp.concatenate([x[..., :c] for x, c in run], axis=-1)
                      if len(run) > 1 else run[0][0][..., :run[0][1]])
        g_reals.append(sum(c for _, c in run))
    return g_arrs, g_reals


class ConvBlock(nn.Module):
    """3x3-by-default conv + optional LeakyReLU(0.1).

    ``x`` may be a single NHWC array or a LIST whose elements are arrays
    or (array, live_channels) pairs, concatenated along channels: the
    decoder's DenseNet stacks pass their concat segments unmaterialized,
    so the Pallas fast path can read each segment directly from HBM (the
    torch reference materializes every ``cat`` before its conv — on TPU
    that concat traffic is pure waste), while the XLA path concatenates
    lazily here with identical numerics.

    ``pad_out=True`` asks for a STORED-layout output ((B, HS, WS, CP)
    bf16, real data at origin, garbage tails — see ops/pallas/conv.py)
    as an (array, live) pair when the Pallas path runs, so the next conv
    in a dense stack can consume it with ZERO staging copies; the XLA
    path ignores it and returns a plain array.

    ``img_hw``: the real (H, W).  Stacks that chain stored tensors MUST
    pass it (stored arrays carry inflated spatial dims); when None it is
    inferred as the min spatial dims over the segments, which is correct
    whenever at least one raw segment is present.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pad_out: bool = False, img_hw=None):
        # a LIST means multiple segments; a bare array or one
        # (array, live) pair is a single segment
        segments = list(x) if isinstance(x, list) else [x]
        arrs, reals = zip(*(_seg_norm(s) for s in segments))
        if img_hw is None:
            img_hw = (min(int(a.shape[1]) for a in arrs),
                      min(int(a.shape[2]) for a in arrs))
        h, w = img_hw
        # NOTE: standalone, XLA's bf16 conv wins the wide-cout/medium-K
        # shapes (115->128: 108 TF vs Pallas 42) — but a mixed dispatch
        # (XLA for those, Pallas for the rest) measured SLOWER end to
        # end (95.2 vs 87.9 ms): in-graph the XLA convs drag relayout
        # copies into the decode loop.  All decoder convs stay on the
        # Pallas kernel.
        if (sum(reals) >= 64 and h >= 8 and h * w >= 2048
                and _pallas_conv_enabled(arrs[0], self.kernel_size,
                                         self.stride, self.dtype)):
            from upflow_pytorch_tpu.ops.pallas.conv import conv3x3_seg

            g_arrs, g_reals = _group_segments(arrs, reals)
            cin = sum(reals)
            kernel, bias = _Conv2DParams(
                self.features, (3, 3, cin, self.features), name="conv")()
            out = conv3x3_seg(g_arrs, g_reals, kernel, bias, self.dilation,
                              self.relu, img_hw=img_hw, out_stored=pad_out)
            return (out, self.features) if pad_out else out
        x = (arrs[0][:, :h, :w, :reals[0]] if len(arrs) == 1
             else jnp.concatenate(
                 [a[:, :h, :w, :r] for a, r in zip(arrs, reals)], axis=-1))
        pad = ((self.kernel_size - 1) * self.dilation) // 2
        x = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation),
            padding=((pad, pad), (pad, pad)),
            use_bias=True,
            kernel_init=_kaiming,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.relu:
            x = nn.leaky_relu(x, negative_slope=0.1)
        return x


class FeatureExtractor(nn.Module):
    """6-level pyramid encoder; returns features COARSEST-FIRST
    (pwc_modules.py:136-142). Channels (3,)16,32,64,96,128,196."""

    num_chs: Sequence[int] = (3, 16, 32, 64, 96, 128, 196)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pyramid = []
        for level, ch_out in enumerate(self.num_chs[1:]):
            x = ConvBlock(ch_out, stride=2, dtype=self.dtype,
                          name=f"level{level}_conv0")(x)
            x = ConvBlock(ch_out, stride=1, dtype=self.dtype,
                          name=f"level{level}_conv1")(x)
            pyramid.append(x)
        return pyramid[::-1]


class FlowEstimatorDense(nn.Module):
    """DenseNet-style estimator: 5 convs with concat-skips (new features
    concatenated BEFORE the running input, matching torch
    ``cat([conv(x), x])``), plus a linear head."""

    f_channels: Tuple[int, ...] = (128, 128, 96, 64, 32)
    out_channels: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # segments kept as a list (newest first, matching torch
        # ``cat([conv(x), x])``); concat never materializes on the Pallas
        # path (intermediates flow as stored-layout buffers via pad_out)
        # and is built lazily by ConvBlock on the XLA path
        segs = list(x) if isinstance(x, (list, tuple)) else [x]
        # real (h, w) from the entry segments (all raw at entry); later
        # convs see stored-layout intermediates with inflated dims
        arrs = [_seg_norm(s)[0] for s in segs]
        img_hw = (min(int(a.shape[1]) for a in arrs),
                  min(int(a.shape[2]) for a in arrs))
        for i, f in enumerate(self.f_channels):
            y = ConvBlock(f, dtype=self.dtype, name=f"conv{i + 1}")(
                segs, pad_out=True, img_hw=img_hw)
            segs = [y] + segs
        out = ConvBlock(self.out_channels, relu=False, dtype=self.dtype,
                        name="conv_last")(segs, img_hw=img_hw)
        return segs, out


class ContextNetwork(nn.Module):
    """7 convs with dilations (1,2,4,8,16,1,1) (pwc_modules.py:396-412)."""

    f_channels: Tuple[int, ...] = (128, 128, 128, 96, 64, 32, 2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x may be a segment list (estimator features + flow) — consumed
        # unconcatenated by the first conv
        arrs = [_seg_norm(s)[0]
                for s in (x if isinstance(x, (list, tuple)) else [x])]
        img_hw = (min(int(a.shape[1]) for a in arrs),
                  min(int(a.shape[2]) for a in arrs))
        dilations = (1, 2, 4, 8, 16, 1, 1)
        for i, (f, d) in enumerate(zip(self.f_channels, dilations)):
            last = i == len(self.f_channels) - 1
            x = ConvBlock(f, dilation=d, relu=not last, dtype=self.dtype,
                          name=f"conv{i}")(x, pad_out=not last,
                                           img_hw=img_hw)
        return x


class SGUDenseEstimator(nn.Module):
    """``FlowEstimatorDense_temp`` (upflow.py:24-60): ch_in=64,
    f_channels=(32,32,32,16,8), 3-channel head (inter_flow + mask logit)."""

    f_channels: Tuple[int, ...] = (32, 32, 32, 16, 8)
    out_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return FlowEstimatorDense(self.f_channels, self.out_channels,
                                  dtype=self.dtype, name="dense")(x)


class SGUOutputConv(nn.Module):
    """``upsample_output_conv`` (upflow.py:66-69): raw RGB -> 1/4-res 32ch."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvBlock(16, kernel_size=3, stride=1, dtype=self.dtype, name="conv0")(x)
        x = ConvBlock(16, stride=2, dtype=self.dtype, name="conv1")(x)
        x = ConvBlock(32, kernel_size=3, stride=1, dtype=self.dtype, name="conv2")(x)
        x = ConvBlock(32, stride=2, dtype=self.dtype, name="conv3")(x)
        return x
