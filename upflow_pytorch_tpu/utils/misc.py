"""Misc plumbing utilities (reference H8 grab-bag,
/root/reference/utils/tools.py:254-280,1634-1730)."""

from __future__ import annotations

import os
import pickle
import zipfile
from typing import Any

import numpy as np


def im_norm(img: np.ndarray) -> np.ndarray:
    """Rescale to [0, 255] for display (tools.py:1717-1725)."""
    img = np.asarray(img, np.float64)
    lo, hi = img.min(), img.max()
    if hi - lo < 1e-12:
        return np.zeros_like(img)
    return (img - lo) / (hi - lo) * 255.0


def check_dir(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return path


def save_pickle(obj: Any, path: str) -> None:
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def load_pickle(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_npz(path: str, **arrays) -> None:
    np.savez_compressed(path, **arrays)


def extract_zip(zip_path: str, dest_dir: str) -> None:
    with zipfile.ZipFile(zip_path) as zf:
        zf.extractall(dest_dir)


def to_device_batch(batch, device=None):
    """Host batch -> device arrays (``tools.tensor_gpu`` analog)."""
    import jax

    return jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x), device), batch)
