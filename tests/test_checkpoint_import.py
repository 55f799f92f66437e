"""Torch .pth import: pure-python reader + name mapping round-trips."""

import numpy as np
import pytest
import torch

import jax

from upflow_pytorch_tpu.checkpoint.torch_import import (
    load_torch_state_dict,
    params_to_torch_state_dict,
    torch_state_dict_to_params,
)
from upflow_pytorch_tpu.config import UPFlowConfig
from upflow_pytorch_tpu.models.upflow import init_params

CONF = UPFlowConfig().updated(dict(if_sgu_upsample=True, if_use_cor_pytorch=True))


@pytest.fixture(scope="module")
def params():
    return init_params(CONF, jax.random.PRNGKey(42))


@pytest.mark.slow
def test_export_produces_reference_key_names(params):
    sd = params_to_torch_state_dict(params)
    expected = [
        "feature_pyramid_extractor.convs.0.0.0.weight",
        "feature_pyramid_extractor.convs.5.1.0.bias",
        "flow_estimators.conv1.0.weight",
        "flow_estimators.conv_last.0.weight",
        "context_networks.convs.0.0.weight",
        "context_networks.convs.6.0.bias",
        "conv_1x1.0.0.weight",
        "conv_1x1.4.0.weight",
        "sgi_model.dense_estimator_mask.conv1.0.weight",
        "sgi_model.dense_estimator_mask.conv_last.0.weight",
        "sgi_model.upsample_output_conv.0.0.weight",
        "sgi_model.upsample_output_conv.3.0.bias",
    ]
    for k in expected:
        assert k in sd, k
    # reference shapes (upflow.py:336-353): first encoder conv 16x3x3x3,
    # estimator input 81+32+2=115, context input 565, conv_1x1.0 196->32
    assert sd["feature_pyramid_extractor.convs.0.0.0.weight"].shape == (16, 3, 3, 3)
    assert sd["flow_estimators.conv1.0.weight"].shape == (128, 115, 3, 3)
    assert sd["context_networks.convs.0.0.weight"].shape == (128, 565, 3, 3)
    assert sd["conv_1x1.0.0.weight"].shape == (32, 196, 1, 1)
    # SGU dense estimator: ch_in 64 + (32+32+32+16+8) = 184 (upflow.py:49,62-65)
    assert sd["sgi_model.dense_estimator_mask.conv_last.0.weight"].shape == (3, 184, 3, 3)


def test_pth_roundtrip_via_zip_format(params, tmp_path):
    sd = params_to_torch_state_dict(params)
    torch_sd = {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()}
    path = str(tmp_path / "ckpt.pth")
    torch.save(torch_sd, path)

    loaded = load_torch_state_dict(path)  # pure-python zip reader
    assert set(loaded) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(loaded[k], sd[k])

    # merge into a differently-initialized tree -> must equal the original
    params2 = init_params(CONF, jax.random.PRNGKey(7))
    merged, report = torch_state_dict_to_params(loaded, params2)
    assert not report["skipped"], report["skipped"][:5]
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(merged)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_legacy_serialization_native_parser(params, tmp_path, monkeypatch):
    """The pre-1.6 stream (what torch 1.1 wrote for upflow_kitti2015.pth)
    parses natively, with torch IMPORT BLOCKED, byte-identical to the zip
    path."""
    sd = params_to_torch_state_dict(params)
    torch_sd = {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()}
    legacy_path = str(tmp_path / "legacy.pth")
    zip_path = str(tmp_path / "zip.pth")
    torch.save(torch_sd, legacy_path, _use_new_zipfile_serialization=False)
    torch.save(torch_sd, zip_path)

    # the parser must not touch torch at all
    import builtins
    real_import = builtins.__import__

    def no_torch(name, *a, **kw):
        if name == "torch" or name.startswith("torch."):
            raise ImportError("torch blocked for this test")
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", no_torch)
    loaded = load_torch_state_dict(legacy_path)
    via_zip = load_torch_state_dict(zip_path)
    monkeypatch.setattr(builtins, "__import__", real_import)

    assert set(loaded) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(loaded[k], sd[k])
        assert loaded[k].tobytes() == via_zip[k].tobytes(), k
        assert loaded[k].dtype == via_zip[k].dtype


def test_legacy_shared_storage_and_views(tmp_path):
    """Legacy quirks: two tensors sharing one storage (dedup through the
    root key) and non-trivial storage_offset/stride views."""
    base = torch.arange(24, dtype=torch.float32)
    sd = {
        "a": base.view(4, 6),
        "b": base.view(4, 6),            # same storage, second reference
        "c": base[6:18].view(3, 4),      # storage_offset=6
        "d": base.view(4, 6).t(),        # non-contiguous stride
        "e": torch.arange(10, dtype=torch.int64),
    }
    path = str(tmp_path / "views.pth")
    torch.save(sd, path, _use_new_zipfile_serialization=False)
    loaded = load_torch_state_dict(path)
    for k, v in sd.items():
        np.testing.assert_array_equal(loaded[k], v.numpy())


def test_legacy_storage_view_metadata(tmp_path):
    """Hand-craft a stream whose persistent id carries the pre-1.6
    view_metadata field ((view_key, element_offset, numel)) — torch 1.1
    emitted these for tensors sharing slices of one storage; modern torch
    no longer writes them, so the fixture is constructed directly."""
    import io
    import pickle
    import struct

    import torch._utils as _tu

    root = np.arange(12, dtype=np.float32)
    root_pid = ("storage", "FloatStorage", "0", "cpu", 12, None)
    # view of elements [4:10) of the root storage
    view_pid = ("storage", "FloatStorage", "0", "cpu", 12, ("0_view", 4, 6))

    class _Tensor:
        def __init__(self, pid, size, stride):
            self.pid, self.size, self.stride = pid, size, stride

        def __reduce__(self):
            return (_tu._rebuild_tensor_v2,
                    (_Pid(self.pid), 0, self.size, self.stride, False, None))

    class _Pid:
        def __init__(self, pid):
            self.pid = pid

    class _Pickler(pickle.Pickler):
        def persistent_id(self, obj):
            return obj.pid if isinstance(obj, _Pid) else None

    buf = io.BytesIO()
    for header in (0x1950A86A20F9469CFC6C, 1001, {"little_endian": True}):
        pickle.dump(header, buf, protocol=2)
    _Pickler(buf, protocol=2).dump({
        "full": _Tensor(root_pid, (3, 4), (4, 1)),
        "view": _Tensor(view_pid, (2, 3), (3, 1)),
    })
    pickle.dump(["0"], buf, protocol=2)
    buf.write(struct.pack("<q", 12))
    buf.write(root.tobytes())

    path = str(tmp_path / "viewmeta.pth")
    with open(path, "wb") as f:
        f.write(buf.getvalue())
    loaded = load_torch_state_dict(path)
    np.testing.assert_array_equal(loaded["full"], root.reshape(3, 4))
    np.testing.assert_array_equal(loaded["view"], root[4:10].reshape(2, 3))


def test_relaxed_load_skips_mismatches(params, tmp_path):
    sd = params_to_torch_state_dict(params)
    sd["flow_estimators.conv1.0.weight"] = np.zeros((1, 2, 3, 3), np.float32)
    sd["unknown.module.weight"] = np.zeros((4, 4, 3, 3), np.float32)
    merged, report = torch_state_dict_to_params(sd, params, relaxed=True)
    assert "flow_estimators.conv1.0.weight" in report["skipped"]
    assert "unknown.module.weight" in report["skipped"]
    with pytest.raises((KeyError, ValueError)):
        torch_state_dict_to_params(sd, params, relaxed=False)


def test_blocked_globals_rejected(tmp_path):
    """The restricted unpickler must refuse arbitrary code objects."""
    import os
    import pickle
    import zipfile

    class Evil:
        def __reduce__(self):
            return (os.system, ("true",))

    path = str(tmp_path / "evil.pth")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", pickle.dumps({"x": Evil()}))
    with pytest.raises(Exception):
        load_torch_state_dict(path)
