from upflow_pytorch_tpu.ops.resize import (
    resize_bilinear_align_corners,
    upsample2d_as,
    upsample2d_flow_as,
    upsample_flow,
    downsample_area,
)
from upflow_pytorch_tpu.ops.warp import (
    flow_warp,
    flow_warp_with_mask,
    flow_warp_masked,
    boundary_dilated_warp,
)
from upflow_pytorch_tpu.ops.correlation import correlation
from upflow_pytorch_tpu.ops.normalize import normalize_features
from upflow_pytorch_tpu.ops.census import ternary_transform, census_hamming_distance

__all__ = [
    "resize_bilinear_align_corners",
    "upsample2d_as",
    "upsample2d_flow_as",
    "upsample_flow",
    "downsample_area",
    "flow_warp",
    "flow_warp_with_mask",
    "flow_warp_masked",
    "boundary_dilated_warp",
    "correlation",
    "normalize_features",
    "ternary_transform",
    "census_hamming_distance",
]
