"""Segmented Pallas conv vs the XLA conv oracle (interpret mode on CPU).

The same kernel was validated and timed on the TPU chip (see
ops/pallas/conv.py docstring); these tests pin the math — both the
wide-cout (per-row-tap dots + accumulator rolls) and small-cout
(9-tap N-pack) kernel paths, channel-padded stored buffers, dilation,
and the custom VJP — on every platform.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from upflow_pytorch_tpu.ops.pallas import conv as pconv

RNG = np.random.RandomState(3)


def _ref(x, w, b, d, relu):
    out = pconv._xla_conv(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                          dilation=d)
    out = out + b[None, None, None, :]
    if relu:
        out = jnp.where(out >= 0, out, out * 0.1)
    return out


def _mk(segs, cout):
    inputs = [jnp.asarray(((RNG.rand(2, 16, 40, c) - .5)).astype(np.float32)
                          ).astype(jnp.bfloat16) for c in segs]
    cin = sum(segs)
    w = jnp.asarray(((RNG.rand(3, 3, cin, cout) - .5) * 0.1
                     ).astype(np.float32))
    b = jnp.asarray(RNG.rand(cout).astype(np.float32))
    return inputs, w, b


@pytest.mark.parametrize("segs,cout,d", [
    ([81, 32, 2], 128, 1),     # wide path, merged-style segments
    ([128, 115], 96, 1),       # wide path, mixed stored widths
    ([64, 32], 32, 1),         # tap-pack path (SGU estimator shape)
    ([115], 2, 1),             # tap-pack, cout=2 (conv_last/ctx6)
    ([128], 128, 4),           # wide path, dilation
    ([96], 64, 2),             # tap-pack, dilation
])
def test_conv3x3_seg_matches_xla(segs, cout, d):
    inputs, w, b = _mk(segs, cout)
    got = pconv._conv3x3_seg_fwd(tuple(inputs), tuple(segs), w, b, d, True,
                                 False, interpret=True)
    want = _ref(jnp.concatenate(inputs, -1), w, b, d, True)
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(want, dtype=np.float32),
                               atol=3e-2, rtol=3e-2)


def test_conv3x3_seg_padded_stored_buffers():
    """Stored width > live width (zero-padded pallas outputs): the pad
    channels must not contribute."""
    inputs, w, b = _mk([96], 32)
    padded = jnp.pad(inputs[0], ((0, 0),) * 3 + ((0, 32),))
    got = pconv._conv3x3_seg_fwd((padded,), (96,), w, b, 1, True, True,
                                 interpret=True)
    want = _ref(inputs[0], w, b, 1, True)
    assert got.shape[-1] == 128  # out_pad
    np.testing.assert_allclose(np.asarray(got[..., :32], dtype=np.float32),
                               np.asarray(want, dtype=np.float32),
                               atol=3e-2, rtol=3e-2)
    assert float(jnp.max(jnp.abs(got[..., 32:]))) == 0.0


def test_conv3x3_seg_vjp_matches_xla_grads():
    inputs, w, b = _mk([48, 16], 32)
    f32 = [x.astype(jnp.float32) for x in inputs]

    def loss_pallas(a0, a1, w, b):
        out = pconv.conv3x3_seg(
            (a0.astype(jnp.bfloat16), a1.astype(jnp.bfloat16)),
            (48, 16), w, b, 1, True, interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_ref(a0, a1, w, b):
        # f32 conv (jax cannot differentiate a mixed bf16-in/f32-out
        # conv); the grad comparison tolerance absorbs the bf16 delta
        out = pconv._xla_conv(jnp.concatenate([a0, a1], -1), w)
        out = out + b[None, None, None, :]
        out = jnp.where(out >= 0, out, out * 0.1)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(*f32, w, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*f32, w, b)
    for a, c in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a, dtype=np.float32),
                                   np.asarray(c, dtype=np.float32),
                                   atol=0.15, rtol=0.1)
