"""Single-file .npz param-tree snapshots.

A lightweight complement to the Orbax checkpointer (checkpoint/orbax_io.py)
for artifacts that must be a single self-contained file checked into the
repo or copied around — e.g. the in-environment synthetic-trained weights
the benchmark loads (bench.py).  Keys are '/'-joined flax param paths.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def save_params_npz(path: str, params) -> None:
    import flax

    flat = flax.traverse_util.flatten_dict(params, sep="/")
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in flat.items()})


def load_params_npz(path: str, params_template):
    """Load an .npz snapshot into the structure of ``params_template``.

    Every template leaf must be present in the file with a matching
    shape (this is a strict restore, unlike the torch importer's relaxed
    merge — a missing key in a self-produced snapshot is a bug).
    """
    import flax

    with np.load(path) as data:
        flat_in: Dict[str, np.ndarray] = {k: data[k] for k in data.files}
    flat_t = flax.traverse_util.flatten_dict(params_template, sep="/")
    out = {}
    for k, v in flat_t.items():
        if k not in flat_in:
            raise KeyError("missing param %r in %s" % (k, path))
        arr = flat_in[k]
        if arr.shape != np.asarray(v).shape:
            raise ValueError("shape mismatch for %r: %s vs %s"
                             % (k, arr.shape, np.asarray(v).shape))
        out[k] = arr.astype(np.asarray(v).dtype)
    return flax.traverse_util.unflatten_dict(out, sep="/")
