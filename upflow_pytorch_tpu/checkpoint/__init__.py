from upflow_pytorch_tpu.checkpoint.torch_import import (
    load_torch_state_dict,
    torch_state_dict_to_params,
    load_pretrained_params,
)
from upflow_pytorch_tpu.checkpoint.orbax_io import (
    save_checkpoint,
    restore_checkpoint,
    latest_step,
)

__all__ = [
    "load_torch_state_dict",
    "torch_state_dict_to_params",
    "load_pretrained_params",
    "save_checkpoint",
    "restore_checkpoint",
    "latest_step",
]
