"""End-to-end Trainer smoke test: synthetic data, eval hook, save/resume."""

import numpy as np
import pytest

from upflow_pytorch_tpu.config import TrainerConfig, UPFlowConfig
from upflow_pytorch_tpu.eval.bench import EvalSample, EvaluationBench
from upflow_pytorch_tpu.train.trainer import Trainer

RNG = np.random.RandomState(3)
H, W, M = 32, 48, 8

CONF = UPFlowConfig().updated(dict(
    if_use_cor_pytorch=True,
    if_sgu_upsample=False,
    if_use_boundary_warp=True,
))


class SyntheticDataset:
    def __len__(self):
        return 8

    def __getitem__(self, i):
        rng = np.random.RandomState(i)
        raw = rng.rand(H + 2 * M, W + 2 * M, 3).astype(np.float32)
        raw2 = np.roll(raw, 1, axis=1)
        return {
            "im1_raw": raw,
            "im2_raw": raw2,
            "im1": raw[M:M + H, M:M + W],
            "im2": raw2[M:M + H, M:M + W],
            "start": np.array([M, M], np.float32),
        }


def make_eval_samples(n=2):
    out = []
    for i in range(n):
        flow = RNG.randn(1, H, W, 2).astype(np.float32)
        mask = np.ones((1, H, W, 1), np.float32)
        out.append(EvalSample(
            im1=RNG.rand(1, H, W, 3).astype(np.float32),
            im2=RNG.rand(1, H, W, 3).astype(np.float32),
            flow_occ=flow, mask_occ=mask,
            flow_noc=flow.copy(), mask_noc=mask, name="s%d" % i))
    return out


@pytest.mark.slow
def test_trainer_end_to_end_with_resume(tmp_path):
    logs = []
    tc = TrainerConfig(exp_dir=str(tmp_path / "exp"), batchsize=2,
                       batch_per_epoch=2, batch_per_print=1, num_workers=2)
    bench = EvaluationBench(make_eval_samples())
    trainer = Trainer(CONF, tc, SyntheticDataset(), bench,
                      log_fn=logs.append)
    trainer.train(total_steps=2)  # one "epoch" -> eval + checkpoint
    assert any("eval @2" in l for l in logs)
    from upflow_pytorch_tpu.checkpoint.orbax_io import latest_step
    assert latest_step(trainer.ckpt_dir) == 2
    trainer.loader.close()

    # fresh trainer resumes from the checkpoint and continues
    logs2 = []
    trainer2 = Trainer(CONF, tc, SyntheticDataset(), None,
                       log_fn=logs2.append)
    assert trainer2.try_resume()
    assert int(np.asarray(trainer2.state.step)) == 2
    trainer2.train(total_steps=3)  # one more step from step 2
    assert int(np.asarray(trainer2.state.step)) == 3
    trainer2.loader.close()
