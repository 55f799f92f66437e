from upflow_pytorch_tpu.train.step import (
    TrainState,
    create_train_state,
    make_optimizer,
    make_train_step,
)

__all__ = ["TrainState", "create_train_state", "make_optimizer", "make_train_step"]
