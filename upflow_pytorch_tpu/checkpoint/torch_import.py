"""Torch ``.pth`` checkpoint import, without requiring torch.

Two jobs (SURVEY.md §3.5; reference load semantics at
/root/reference/utils/tools.py:109-127):

1. ``load_torch_state_dict``: parse a torch-saved state dict into
   ``{name: np.ndarray}``.  Natively supports BOTH serialization formats
   (zipfile + a restricted Unpickler that rebuilds tensors from raw
   storages — no torch import anywhere): the modern (>=1.6) zip layout
   and the legacy (pre-1.6) magic-number stream that torch 1.1 wrote for
   the reference's ``upflow_kitti2015.pth`` (requirements.txt pins
   torch==1.1.0), including its storage-view persistent ids.
2. ``torch_state_dict_to_params``: map the reference's parameter names
   onto this package's flax tree, transposing conv weights OIHW -> HWIO,
   with the reference's "relaxed" partial-load semantics (keep only
   matching name+shape, tools.py:112-127).
"""

from __future__ import annotations

import io
import pickle
import struct
import zipfile
from typing import Dict, Optional, Tuple

import numpy as np

_DTYPE_BY_STORAGE = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
    "BFloat16Storage": None,  # handled specially below
}


class _StorageStub:
    def __init__(self, dtype_name: str, key: str, numel: int,
                 base_offset: int = 0):
        self.dtype_name = dtype_name
        self.key = key
        self.numel = numel
        # element offset of a legacy storage VIEW into its root storage
        # (pre-1.6 serialization supported storage views; always 0 for
        # the zip format)
        self.base_offset = base_offset


def _bf16_to_f32(raw: bytes) -> np.ndarray:
    u16 = np.frombuffer(raw, dtype=np.uint16)
    u32 = u16.astype(np.uint32) << 16
    return u32.view(np.float32)


class _TorchUnpickler(pickle.Unpickler):
    """Restricted unpickler: only rebuilds tensors/collections.

    Refuses arbitrary globals so loading untrusted checkpoints cannot
    execute code (unlike torch.load's default pickle).
    """

    def __init__(self, file, storages: Dict[str, np.ndarray]):
        super().__init__(file)
        self._storages = storages

    def persistent_load(self, pid):
        # ('storage', storage_type_stub, key, location, numel)
        assert isinstance(pid, tuple) and pid[0] == "storage", pid
        _, stype, key, _location, numel = pid
        dtype_name = getattr(stype, "dtype_name", None) or str(stype)
        return _StorageStub(dtype_name, str(key), int(numel))

    def find_class(self, module, name):
        if name.endswith("Storage"):
            stub = type(name, (), {"dtype_name": name})
            return stub
        allowed = {
            ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
            ("torch._utils", "_rebuild_tensor"): _rebuild_tensor,
            ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
            ("collections", "OrderedDict"): dict,
            ("torch.serialization", "_get_layout"): lambda name: None,
        }
        if (module, name) in allowed:
            return allowed[(module, name)]
        if module == "torch" and name in ("Size",):
            return tuple
        raise pickle.UnpicklingError(
            "blocked global %s.%s in torch checkpoint" % (module, name))


class _LazyTensor:
    """Deferred tensor: resolved against the storage bytes after unpickling."""

    def __init__(self, storage: _StorageStub, offset, size, stride):
        self.storage = storage
        self.offset = offset
        self.size = tuple(int(s) for s in size)
        self.stride = tuple(int(s) for s in stride) if stride else None

    def materialize(self, raw_storages: Dict[str, bytes]) -> np.ndarray:
        raw = raw_storages[self.storage.key]
        name = self.storage.dtype_name
        if name == "BFloat16Storage":
            flat = _bf16_to_f32(raw)
        else:
            flat = np.frombuffer(raw, dtype=_DTYPE_BY_STORAGE[name])
        off = self.offset + self.storage.base_offset
        n = int(np.prod(self.size)) if self.size else 1
        if self.stride is not None and self.size:
            return np.lib.stride_tricks.as_strided(
                flat[off:],
                shape=self.size,
                strides=tuple(s * flat.itemsize for s in self.stride),
            ).copy()
        return flat[off:off + n].reshape(self.size).copy()


def _rebuild_tensor_v2(storage, offset, size, stride, requires_grad=False,
                       backward_hooks=None, metadata=None):
    return _LazyTensor(storage, offset, size, stride)


def _rebuild_tensor(storage, offset, size, stride):
    return _LazyTensor(storage, offset, size, stride)


def _rebuild_parameter(data, requires_grad=False, backward_hooks=None):
    return data


def _load_zip_pth(path: str) -> Dict[str, np.ndarray]:
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("/data.pkl")
                        or n == "data.pkl")
        prefix = pkl_name[: -len("data.pkl")]
        raw_storages: Dict[str, bytes] = {}
        for n in names:
            if n.startswith(prefix + "data/"):
                raw_storages[n[len(prefix) + len("data/"):]] = zf.read(n)
        with zf.open(pkl_name) as f:
            obj = _TorchUnpickler(io.BufferedReader(f), {}).load()

    def resolve(x):
        if isinstance(x, _LazyTensor):
            return x.materialize(raw_storages)
        if isinstance(x, dict):
            return {k: resolve(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return type(x)(resolve(v) for v in x)
        return x

    return resolve(obj)


_LEGACY_MAGIC = 0x1950A86A20F9469CFC6C
_LEGACY_PROTOCOL = 1001

_ELEMENT_SIZE = {
    "FloatStorage": 4, "DoubleStorage": 8, "HalfStorage": 2,
    "BFloat16Storage": 2, "LongStorage": 8, "IntStorage": 4,
    "ShortStorage": 2, "CharStorage": 1, "ByteStorage": 1, "BoolStorage": 1,
}


class _LegacyUnpickler(_TorchUnpickler):
    """Unpickler for the pre-1.6 (torch<=1.5 ``_legacy_save``) stream.

    Persistent ids are 6-tuples ``('storage', type, root_key, location,
    numel, view_metadata)`` where view_metadata is None or ``(view_key,
    element_offset, view_numel)`` — a view into the root storage (the
    old format deduplicated shared-parameter storage through views).
    Records every root storage's dtype/numel so the caller can walk the
    raw data section that follows the pickle.
    """

    def __init__(self, file):
        super().__init__(file, {})
        self.roots: Dict[str, _StorageStub] = {}

    def persistent_load(self, pid):
        assert isinstance(pid, tuple), pid
        typename = pid[0]
        if isinstance(typename, bytes):
            typename = typename.decode("ascii")
        if typename == "module":
            # legacy container-source records: ('module', type, file, src)
            return pid[1]
        assert typename == "storage", pid
        _, stype, root_key, _location, numel, view_metadata = pid
        dtype_name = getattr(stype, "dtype_name", None) or str(stype)
        root_key = str(root_key)
        if root_key not in self.roots:
            self.roots[root_key] = _StorageStub(dtype_name, root_key,
                                                int(numel))
        if view_metadata is not None:
            _view_key, offset, view_numel = view_metadata
            return _StorageStub(dtype_name, root_key, int(view_numel),
                                base_offset=int(offset))
        return self.roots[root_key]


def _load_legacy_pth(path: str) -> Dict[str, np.ndarray]:
    """Parse the pre-1.6 torch serialization (the format torch 1.1's
    ``torch.save`` writes — /root/reference/utils/tools.py:109-110 with
    requirements.txt's torch==1.1.0): three pickled header records
    (magic, protocol, sys_info), the pickled object with storage
    persistent-ids, the pickled key order, then per key an int64 element
    count followed by the raw little-endian storage bytes."""
    with open(path, "rb") as f:
        magic = pickle.load(f)
        if magic != _LEGACY_MAGIC:
            raise ValueError(
                "not a torch legacy checkpoint (bad magic): %s" % path)
        protocol = pickle.load(f)
        if protocol != _LEGACY_PROTOCOL:
            raise ValueError("unsupported torch legacy protocol %r" % protocol)
        _sys_info = pickle.load(f)
        unpickler = _LegacyUnpickler(f)
        obj = unpickler.load()
        storage_keys = pickle.load(f)
        raw_storages: Dict[str, bytes] = {}
        for key in storage_keys:
            key = str(key)
            stub = unpickler.roots[key]
            (numel,) = struct.unpack("<q", f.read(8))
            assert numel == stub.numel, (key, numel, stub.numel)
            nbytes = numel * _ELEMENT_SIZE[stub.dtype_name]
            raw = f.read(nbytes)
            assert len(raw) == nbytes, "truncated storage %s" % key
            raw_storages[key] = raw

    def resolve(x):
        if isinstance(x, _LazyTensor):
            return x.materialize(raw_storages)
        if isinstance(x, dict):
            return {k: resolve(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return type(x)(resolve(v) for v in x)
        return x

    return resolve(obj)


def _is_legacy_tar(path: str) -> bool:
    import tarfile

    try:
        with tarfile.open(path, mode="r:") as tar:
            names = tar.getnames()
        return "pickle" in names and "storages" in names
    except (tarfile.TarError, OSError, EOFError):
        return False


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch-saved state dict as numpy arrays (no torch needed).

    Handles both serialization formats: the modern (>=1.6) zipfile layout
    and the legacy (pre-1.6, incl. torch 1.1 — the version that wrote the
    reference's ``upflow_kitti2015.pth``) magic-number stream.  The
    ancient (~torch 0.1) tar container is detected and rejected with a
    clear error.
    """
    if zipfile.is_zipfile(path):
        return _load_zip_pth(path)
    if _is_legacy_tar(path):
        raise NotImplementedError(
            "torch tar-container checkpoints (~torch 0.1) are not supported:"
            " %s" % path)
    return _load_legacy_pth(path)


# --------------------------------------------------------------------------
# name mapping reference torch keys -> this package's flax tree
# --------------------------------------------------------------------------

def _flax_path_for_torch_key(key: str) -> Optional[Tuple[str, ...]]:
    """Map one reference state-dict key to a flax param path (sans leaf).

    Reference module naming (upflow.py:343-366, pwc_modules.py:122-142):
      feature_pyramid_extractor.convs.{L}.{J}.0.{weight,bias}
      flow_estimators.{conv1..conv5,conv_last}.0.*
      context_networks.convs.{I}.0.*
      conv_1x1.{I}.0.*
      sgi_model.dense_estimator_mask.{convK,conv_last}.0.*
      sgi_model.upsample_output_conv.{I}.0.*
    """
    parts = key.split(".")
    root = parts[0]
    if root == "feature_pyramid_extractor":
        # convs.{level}.{0|1}.0.weight
        level, j = int(parts[2]), int(parts[3])
        return ("feature_pyramid_extractor", f"level{level}_conv{j}", "conv")
    if root == "flow_estimators":
        return ("flow_estimators", parts[1], "conv")
    if root == "context_networks":
        idx = int(parts[2])
        return ("context_networks", f"conv{idx}", "conv")
    if root == "conv_1x1":
        idx = int(parts[1])
        return (f"conv_1x1_{idx}", "conv")
    if root == "sgi_model":
        if parts[1] == "dense_estimator_mask":
            return ("sgu_dense_estimator", "dense", parts[2], "conv")
        if parts[1] == "upsample_output_conv":
            idx = int(parts[2])
            return ("sgu_output_conv", f"conv{idx}", "conv")
    return None  # unknown / not-ported key (e.g. correlation buffers)


def torch_state_dict_to_params(state_dict: Dict[str, np.ndarray], params,
                               relaxed: bool = True, verbose: bool = False):
    """Merge a reference torch state dict into a flax param tree.

    ``relaxed`` mirrors load_model(if_relax=True) (tools.py:112-127): keys
    that do not exist in the target or whose shapes mismatch are skipped.
    Returns (new_params, report dict with loaded/skipped key lists).
    """
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    loaded, skipped = [], []
    for key, value in state_dict.items():
        value = np.asarray(value)
        path = _flax_path_for_torch_key(
            key[:-len(".weight")] if key.endswith(".weight")
            else key[:-len(".bias")] if key.endswith(".bias") else key)
        if path is None:
            skipped.append(key)
            continue
        if key.endswith(".weight"):
            leaf = ("params",) + path + ("kernel",)
            value = value.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        elif key.endswith(".bias"):
            leaf = ("params",) + path + ("bias",)
        else:
            skipped.append(key)
            continue
        if leaf not in flat:
            if not relaxed:
                raise KeyError("no target param for %s -> %s" % (key, leaf))
            skipped.append(key)
            continue
        if flat[leaf].shape != value.shape:
            if not relaxed:
                raise ValueError("shape mismatch for %s: %s vs %s"
                                 % (key, flat[leaf].shape, value.shape))
            skipped.append(key)
            continue
        flat[leaf] = value.astype(np.asarray(flat[leaf]).dtype)
        loaded.append(key)
    if verbose:
        print("loaded %d keys, skipped %d: %s"
              % (len(loaded), len(skipped), skipped[:10]))
    return (flax.traverse_util.unflatten_dict(flat),
            {"loaded": loaded, "skipped": skipped})


def load_pretrained_params(path: str, params, relaxed: bool = True,
                           verbose: bool = False):
    """One-shot: read .pth and merge into ``params``."""
    sd = load_torch_state_dict(path)
    return torch_state_dict_to_params(sd, params, relaxed, verbose)


def params_to_torch_state_dict(params) -> Dict[str, np.ndarray]:
    """Export the flax tree back to reference-style torch keys (HWIO->OIHW).

    Useful for round-trip tests and for users moving the other way.
    """
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    inverse: Dict[str, np.ndarray] = {}
    for leaf, value in flat.items():
        path = leaf[1:-1]  # strip 'params' and kernel/bias
        kind = leaf[-1]
        torch_key = _torch_key_for_flax_path(path)
        if torch_key is None:
            continue
        value = np.asarray(value)
        if kind == "kernel":
            inverse[torch_key + ".weight"] = value.transpose(3, 2, 0, 1)
        else:
            inverse[torch_key + ".bias"] = value
    return inverse


def _torch_key_for_flax_path(path: Tuple[str, ...]) -> Optional[str]:
    if not path:
        return None
    root = path[0]
    if root == "feature_pyramid_extractor":
        name = path[1]  # level{L}_conv{J}
        level = int(name[5])
        j = int(name[-1])
        return "feature_pyramid_extractor.convs.%d.%d.0" % (level, j)
    if root == "flow_estimators":
        return "flow_estimators.%s.0" % path[1]
    if root == "context_networks":
        return "context_networks.convs.%d.0" % int(path[1][4:])
    if root.startswith("conv_1x1_"):
        return "conv_1x1.%d.0" % int(root[len("conv_1x1_"):])
    if root == "sgu_dense_estimator":
        return "sgi_model.dense_estimator_mask.%s.0" % path[2]
    if root == "sgu_output_conv":
        return "sgi_model.upsample_output_conv.%d.0" % int(path[1][4:])
    return None
