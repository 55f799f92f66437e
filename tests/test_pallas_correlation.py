"""Pallas correlation kernel vs the XLA oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from upflow_pytorch_tpu.ops.correlation import correlation_xla
from upflow_pytorch_tpu.ops.pallas.correlation import correlation_pallas

RNG = np.random.RandomState(9)


@pytest.mark.parametrize("shape", [(2, 8, 24, 16), (1, 12, 40, 32),
                                   (1, 6, 20, 196)])
def test_pallas_correlation_matches_xla(shape):
    f1 = RNG.randn(*shape).astype(np.float32)
    f2 = RNG.randn(*shape).astype(np.float32)
    ref = np.asarray(correlation_xla(f1, f2))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(correlation_pallas(f1, f2))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_pallas_correlation_grads_match_xla():
    shape = (1, 8, 16, 8)
    f1 = jnp.asarray(RNG.randn(*shape).astype(np.float32))
    f2 = jnp.asarray(RNG.randn(*shape).astype(np.float32))
    g = jnp.asarray(RNG.randn(1, 8, 16, 81).astype(np.float32))

    def loss_ref(a, b):
        return jnp.sum(correlation_xla(a, b) * g)

    def loss_pl(a, b):
        return jnp.sum(correlation_pallas(a, b) * g)

    ga_ref, gb_ref = jax.grad(loss_ref, argnums=(0, 1))(f1, f2)
    with pltpu.force_tpu_interpret_mode():
        ga, gb = jax.grad(loss_pl, argnums=(0, 1))(f1, f2)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ga_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_ref),
                               rtol=1e-5, atol=1e-5)
