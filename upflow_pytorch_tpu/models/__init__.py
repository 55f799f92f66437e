from upflow_pytorch_tpu.models.upflow import UPFlowNet, build_model
from upflow_pytorch_tpu.models.occlusion import occ_check

__all__ = ["UPFlowNet", "build_model", "occ_check"]
