from upflow_pytorch_tpu.eval.metrics import flow_error_avg, outlier_pct
from upflow_pytorch_tpu.eval.bench import EvaluationBench, AbsTestModel

__all__ = ["flow_error_avg", "outlier_pct", "EvaluationBench", "AbsTestModel"]
