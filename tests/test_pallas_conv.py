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


# --- stored inter-conv layout (round 3) -------------------------------------

def _stored(x, h, w):
    """Stage a raw (B, h, w, c) array into the stored layout with NaN
    SPATIAL tails — the kernel's boundary zeroing must make them
    unobservable.  (Channel pads inside the real region are zero per the
    layout contract: the producing kernel writes them as zeros, and NaN
    there would poison the zero-weight trick.)"""
    hs, ws = pconv.stored_hw(h, w)
    cp = -(-int(x.shape[-1]) // 128) * 128
    out = jnp.zeros((x.shape[0], hs, ws, cp), jnp.float32)
    out = out.at[:, :h, :w, :x.shape[-1]].set(x.astype(jnp.float32))
    out = out.at[:, h:].set(jnp.nan).at[:, :, w:].set(jnp.nan)
    return out.astype(jnp.bfloat16)


@pytest.mark.parametrize("segs,cout,d", [
    ([81, 32, 2], 128, 1),
    ([64, 32], 32, 1),
    ([128], 96, 4),
    ([96], 64, 8),            # max stored-path dilation
])
def test_stored_inputs_nan_tails(segs, cout, d):
    """Stored-layout inputs with NaN tails: the in-kernel boundary
    zeroing must reproduce the zero-padded oracle exactly (no pre-pad
    buffer exists to rely on)."""
    inputs, w, b = _mk(segs, cout)
    h, wd = inputs[0].shape[1:3]
    stored = [_stored(x, h, wd) for x in inputs]
    got = pconv.conv3x3_seg(stored, tuple(segs), w, b, d, True,
                            interpret=True, img_hw=(h, wd))
    want = _ref(jnp.concatenate(inputs, -1), w, b, d, True)
    got = np.asarray(got, dtype=np.float32)
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, np.asarray(want, dtype=np.float32),
                               atol=3e-2, rtol=3e-2)


def test_stored_chain_roundtrip():
    """conv -> stored -> conv chain (the dense-stack pattern): zero
    staging copies between convs, same numerics as materialized XLA."""
    inputs, w1, b1 = _mk([115], 128)
    h, wd = inputs[0].shape[1:3]
    cin2 = 115 + 128
    w2 = jnp.asarray(((RNG.rand(3, 3, cin2, 96) - .5) * 0.1
                      ).astype(np.float32))
    b2 = jnp.asarray(RNG.rand(96).astype(np.float32))

    y1 = pconv.conv3x3_seg(inputs, (115,), w1, b1, 1, True,
                           interpret=True, img_hw=(h, wd), out_stored=True)
    assert y1.shape[1:3] == pconv.stored_hw(h, wd)
    got = pconv.conv3x3_seg([y1, inputs[0]], (128, 115), w2, b2, 1, True,
                            interpret=True, img_hw=(h, wd))
    y1_ref = _ref(inputs[0], w1, b1, 1, True).astype(jnp.bfloat16)
    want = _ref(jnp.concatenate([y1_ref, inputs[0]], -1), w2, b2, 1, True)
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(want, dtype=np.float32),
                               atol=5e-2, rtol=5e-2)


def test_stored_large_dilation_falls_back_staged():
    """d=16 (the context net's conv4) exceeds the stored kernel's d<=8
    window: the staged kernel runs, including from stored inputs, and
    out_stored re-emits the stored layout."""
    inputs, w, b = _mk([128], 96)
    h, wd = inputs[0].shape[1:3]
    stored = [_stored(x, h, wd) for x in inputs]
    got = pconv.conv3x3_seg(stored, (128,), w, b, 16, True,
                            interpret=True, img_hw=(h, wd), out_stored=True)
    assert got.shape[1:3] == pconv.stored_hw(h, wd)
    want = _ref(inputs[0], w, b, 16, True)
    np.testing.assert_allclose(
        np.asarray(got[:, :h, :wd, :96], dtype=np.float32),
        np.asarray(want, dtype=np.float32), atol=3e-2, rtol=3e-2)


def test_stored_chain_gradients():
    """Gradients through a stored-layout chain match the materialized
    XLA composition (the VJP restricts cotangents to the real region)."""
    rng = np.random.RandomState(17)   # local: order-independent draws
    inputs = [jnp.asarray((rng.rand(2, 16, 40, 48) - .5).astype(np.float32)
                          ).astype(jnp.bfloat16)]
    w1 = jnp.asarray(((rng.rand(3, 3, 48, 32) - .5) * 0.1).astype(np.float32))
    b1 = jnp.asarray(rng.rand(32).astype(np.float32))
    h, wd = inputs[0].shape[1:3]
    w2 = jnp.asarray(((rng.rand(3, 3, 48 + 32, 16) - .5) * 0.1
                      ).astype(np.float32))
    b2 = jnp.asarray(rng.rand(16).astype(np.float32))
    x32 = inputs[0].astype(jnp.float32)

    def loss_pallas(x, w1, b1, w2, b2):
        xb = x.astype(jnp.bfloat16)
        y = pconv.conv3x3_seg([xb], (48,), w1, b1, 1, True,
                              interpret=True, img_hw=(h, wd),
                              out_stored=True)
        out = pconv.conv3x3_seg([y, xb], (32, 48), w2, b2, 1, True,
                                interpret=True, img_hw=(h, wd))
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_ref(x, w1, b1, w2, b2):
        # f32 convs (jax cannot differentiate a mixed bf16-in/f32-out
        # conv); the grad tolerance absorbs the bf16 delta
        def f32conv(x, w, b):
            out = pconv._xla_conv(x, w) + b[None, None, None, :]
            return jnp.where(out >= 0, out, out * 0.1)

        y = f32conv(x, w1, b1)
        out = f32conv(jnp.concatenate([y, x], -1), w2, b2)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(x32, w1, b1, w2, b2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x32, w1, b1, w2, b2)
    # tolerance = bf16-forward vs f32-reference delta through TWO convs
    # (the Pallas VJP itself is the exact XLA backward of the bf16 chain)
    for a, c in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a, dtype=np.float32),
                                   np.asarray(c, dtype=np.float32),
                                   atol=0.3, rtol=0.15)
