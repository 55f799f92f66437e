"""Stateless per-item augmentation randomness.

The reference mutates one shared ``np.random.RandomState`` from
``__getitem__`` (kitti_dataset.py:332-342), which (a) races under threaded
loaders and (b) cannot be resumed mid-epoch.  Here every item draws from a
fresh generator derived from ``(seed, epoch, index)``, so augmentation is
reproducible bit-for-bit regardless of worker scheduling, and a resumed
run re-creates the exact same crops/flips/swaps.
"""

from __future__ import annotations

import numpy as np


def item_rng(seed: int, epoch: int, index: int) -> np.random.Generator:
    """Deterministic per-item generator from (seed, epoch, index)."""
    return np.random.Generator(
        np.random.PCG64(np.random.SeedSequence((seed, epoch, index))))
