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


def test_legacy_serialization_fallback(params, tmp_path):
    sd = params_to_torch_state_dict(params)
    torch_sd = {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()}
    path = str(tmp_path / "legacy.pth")
    torch.save(torch_sd, path, _use_new_zipfile_serialization=False)
    loaded = load_torch_state_dict(path)
    for k in sd:
        np.testing.assert_array_equal(loaded[k], sd[k])


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
