from upflow_pytorch_tpu.losses.photometric import photo_loss_multi_type, weighted_ssim
from upflow_pytorch_tpu.losses.census import census_loss
from upflow_pytorch_tpu.losses.smoothness import (
    edge_aware_smoothness_order1,
    edge_aware_smoothness_order2,
    flow_smooth_delta,
)

__all__ = [
    "photo_loss_multi_type",
    "weighted_ssim",
    "census_loss",
    "edge_aware_smoothness_order1",
    "edge_aware_smoothness_order2",
    "flow_smooth_delta",
]
