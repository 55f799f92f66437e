from upflow_pytorch_tpu.utils.meters import AverageMeter, AvgMeterGroup
from upflow_pytorch_tpu.utils.timer import TimeClock

__all__ = ["AverageMeter", "AvgMeterGroup", "TimeClock"]
