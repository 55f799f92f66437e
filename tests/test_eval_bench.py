"""Eval bench tests using the reference's own mock-backend strategy:
a fake model returning the GT must score EPE=0, F1=0
(Evaluation_bench.demo, kitti_dataset.py:501-514)."""

import numpy as np

from upflow_pytorch_tpu.eval.bench import AbsTestModel, EvalSample, EvaluationBench
from upflow_pytorch_tpu.eval.metrics import flow_error_avg, outlier_pct

RNG = np.random.RandomState(11)


def make_samples(n=4):
    samples = []
    for i in range(n):
        h, w = 40 + i, 60 + 2 * i  # variable sizes like KITTI
        flow_occ = RNG.randn(1, h, w, 2).astype(np.float32) * 8
        mask_occ = (RNG.rand(1, h, w, 1) > 0.2).astype(np.float32)
        mask_noc = mask_occ * (RNG.rand(1, h, w, 1) > 0.3).astype(np.float32)
        samples.append(EvalSample(
            im1=RNG.rand(1, h, w, 3).astype(np.float32),
            im2=RNG.rand(1, h, w, 3).astype(np.float32),
            flow_occ=flow_occ, mask_occ=mask_occ,
            flow_noc=flow_occ.copy(), mask_noc=mask_noc,
            name="img_%d" % i))
    return samples


class GTModel(AbsTestModel):
    def eval_forward(self, im1, im2, gt, *args):
        return gt


class BiasedModel(AbsTestModel):
    """Adds a constant (4, 3) px error -> EPE = 5 everywhere."""

    def eval_forward(self, im1, im2, gt, *args):
        return gt + np.array([4.0, 3.0], np.float32)


def test_gt_model_scores_zero():
    bench = EvaluationBench(make_samples())
    res = bench(GTModel())
    assert res.epe_all == 0 and res.f1 == 0 and res.epe_noc == 0
    assert res.epe_occ == 0


def test_biased_model_epe_five():
    bench = EvaluationBench(make_samples())
    res = bench(BiasedModel())
    np.testing.assert_allclose(res.epe_all, 5.0, rtol=1e-5)
    np.testing.assert_allclose(res.epe_noc, 5.0, rtol=1e-5)
    # all masked pixels with ||gt||*0.05 < 5... F1 positive
    assert res.f1 > 0


def test_metric_functions_match_reference_semantics():
    gt = np.zeros((1, 4, 4, 2), np.float32)
    gt[0, :, :, 0] = 100.0  # large flow -> relative threshold dominates
    pred = gt.copy()
    pred[0, 0, 0] = gt[0, 0, 0] + [4.0, 0]  # err 4 < 0.05*100=5 -> inlier
    pred[0, 1, 1] = gt[0, 1, 1] + [6.0, 0]  # err 6 > 5 -> outlier
    mask = np.ones((1, 4, 4, 1), np.float32)
    np.testing.assert_allclose(flow_error_avg(gt, pred, mask), 10 / 16, rtol=1e-6)
    np.testing.assert_allclose(outlier_pct(gt, pred, mask), 100 / 16, rtol=1e-6)
    # masked-out error pixels do not count
    mask[0, 1, 1] = 0
    assert outlier_pct(gt, pred, mask) == 0.0


def test_test_split_mode_saves_without_metrics():
    saved = []

    class Saver(AbsTestModel):
        def eval_forward(self, im1, im2, gt, *args):
            return np.zeros(im1.shape[:3] + (2,), np.float32)

        def eval_save_result(self, save_name, predflow, *args, **kwargs):
            saved.append(save_name)

    samples = [EvalSample(im1=np.zeros((1, 8, 8, 3), np.float32),
                          im2=np.zeros((1, 8, 8, 3), np.float32),
                          name="t_%d" % i) for i in range(3)]
    res = EvaluationBench(samples, is_test_split=True)(Saver())
    assert res is None and saved == ["t_0", "t_1", "t_2"]
