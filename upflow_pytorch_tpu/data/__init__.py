from upflow_pytorch_tpu.data.flow_io import (
    read_flow_png,
    write_flow_png,
    read_flo,
    write_flo,
)
from upflow_pytorch_tpu.data.image_io import read_image, normalize_image

__all__ = [
    "read_flow_png",
    "write_flow_png",
    "read_flo",
    "write_flo",
    "read_image",
    "normalize_image",
]
