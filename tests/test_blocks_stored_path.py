"""Model-level wiring of the stored-layout Pallas conv path.

Forces the ConvBlock Pallas dispatch on CPU (interpret mode) and runs
the REAL decoder stacks — FlowEstimatorDense feeding ContextNetwork,
exactly as `_decode_level` wires them — comparing against the XLA path
with identical params.  This is the integration coverage for the
stored inter-conv layout (ops/pallas/conv.py): img_hw threading,
stored-tuple segment flow, and the d=16 staged fallback inside the
context net all execute here before any TPU run.
"""

import numpy as np

import jax
import jax.numpy as jnp

import upflow_pytorch_tpu.models.blocks as blocks_mod
import upflow_pytorch_tpu.ops.pallas.conv as pconv
from upflow_pytorch_tpu.models.blocks import ContextNetwork, FlowEstimatorDense

RNG = np.random.RandomState(21)


def test_estimator_context_chain_pallas_vs_xla(monkeypatch):
    b, h, w = 1, 16, 40
    corr = RNG.randn(b, h, w, 81).astype(np.float32) * 0.3
    feat = RNG.randn(b, h, w, 32).astype(np.float32) * 0.3
    flow = RNG.randn(b, h, w, 2).astype(np.float32) * 0.3
    segs_in = [jnp.asarray(corr, jnp.bfloat16),
               jnp.asarray(feat, jnp.bfloat16),
               jnp.asarray(flow, jnp.bfloat16)]
    flow_b = jnp.asarray(flow, jnp.bfloat16)

    est = FlowEstimatorDense(dtype=jnp.bfloat16)
    ctx = ContextNetwork(dtype=jnp.bfloat16)
    # params init on the XLA path (identical tree either way)
    ev = est.init(jax.random.PRNGKey(0), segs_in)
    feats0, _ = est.apply(ev, segs_in)
    cv = ctx.init(jax.random.PRNGKey(1), feats0 + [flow_b])

    def run():
        feats, res = est.apply(ev, segs_in)
        fine = ctx.apply(cv, feats + [flow_b])
        return res, fine

    res_x, fine_x = run()   # XLA path (pallas disabled on CPU)

    orig = pconv.conv3x3_seg
    monkeypatch.setattr(
        pconv, "conv3x3_seg",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    monkeypatch.setattr(blocks_mod, "_pallas_conv_enabled",
                        lambda *a, **k: True)
    res_p, fine_p = run()   # Pallas stored-layout path, interpret mode

    assert fine_p.shape == fine_x.shape == (b, h, w, 2)
    np.testing.assert_allclose(np.asarray(res_p, np.float32),
                               np.asarray(res_x, np.float32),
                               atol=5e-2, rtol=5e-2)
    np.testing.assert_allclose(np.asarray(fine_p, np.float32),
                               np.asarray(fine_x, np.float32),
                               atol=8e-2, rtol=8e-2)
