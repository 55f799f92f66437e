"""Orbax save/restore round-trips for training state."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from upflow_pytorch_tpu.checkpoint.orbax_io import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)


def make_state(seed):
    rng = np.random.RandomState(seed)
    return {
        "params": {"w": rng.randn(4, 3).astype(np.float32),
                   "b": rng.randn(3).astype(np.float32)},
        "step": np.int32(seed * 10),
        "loader": {"epoch": np.int32(seed), "position": np.int32(7)},
    }


def test_save_restore_roundtrip(tmp_path):
    d = str(tmp_path / "ckpts")
    state = make_state(1)
    save_checkpoint(d, 100, state)
    assert latest_step(d) == 100
    template = make_state(2)
    restored = restore_checkpoint(d, template)
    np.testing.assert_array_equal(restored["params"]["w"], state["params"]["w"])
    assert int(restored["step"]) == 10
    assert int(restored["loader"]["position"]) == 7


def test_multiple_steps_latest_wins(tmp_path):
    d = str(tmp_path / "ckpts")
    for step in (1, 2, 3):
        save_checkpoint(d, step, make_state(step))
    assert latest_step(d) == 3
    restored = restore_checkpoint(d, make_state(0))
    assert int(restored["loader"]["epoch"]) == 3
    # explicit earlier step
    restored2 = restore_checkpoint(d, make_state(0), step=2)
    assert int(restored2["loader"]["epoch"]) == 2


def test_missing_checkpoint_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        restore_checkpoint(str(tmp_path / "nope"), make_state(0))
    assert latest_step(str(tmp_path / "nope")) is None
