from upflow_pytorch_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from upflow_pytorch_tpu.parallel.step import (
    make_sharded_train_step,
    make_sharded_eval_step,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "make_sharded_train_step",
    "make_sharded_eval_step",
]
