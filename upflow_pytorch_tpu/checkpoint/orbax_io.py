"""Orbax checkpoint save/restore for training state.

Replaces the reference's bare ``torch.save(state_dict)`` (tools.py:109-110)
with step-tagged checkpoints carrying params + optimizer state + step, so
training is resumable after failure — a capability the reference lacks
(its ``while True`` loop has no resume path, simple_train.py:131).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _normalize(tree: Any) -> Any:
    """Orbax StandardSave rejects numpy scalar types; promote to arrays."""
    import numpy as np

    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if isinstance(x, np.generic) else x, tree)


def _manager(ckpt_dir: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True)
    return ocp.CheckpointManager(os.path.abspath(ckpt_dir), options=options)


def save_checkpoint(ckpt_dir: str, step: int, state: Any,
                    max_to_keep: int = 3, wait: bool = True) -> None:
    mgr = _manager(ckpt_dir, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(_normalize(state)))
    if wait:
        mgr.wait_until_finished()
    mgr.close()


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(ckpt_dir: str, state_template: Any,
                       step: Optional[int] = None) -> Any:
    mgr = _manager(ckpt_dir)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError("no checkpoint found in %s" % ckpt_dir)
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                      _normalize(state_template))
    restored = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    mgr.close()
    return restored
