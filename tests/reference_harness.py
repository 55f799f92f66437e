"""Load the torch reference implementation for golden parity tests.

The reference (/root/reference, torch-1.1-era code) needs a few shims to
import under the modern CPU torch available here:

- ``correlation_cuda`` (the uncompiled CUDA extension) and ``png`` are
  stubbed out; neither is touched on the ``if_use_cor_pytorch=True`` path.
- ``torch.utils.data.dataloader._DataLoaderIter`` no longer exists
  (reference utils/tools.py:2 imports it at module scope).
- ``F.grid_sample`` is wrapped to force ``align_corners=True``: the
  reference omits the argument everywhere (pwc_modules.py:169-205,
  tools.py:1257-1308), which under torch<=1.2 meant align_corners=True,
  while modern torch defaults to False.

Import side effects are process-wide but harmless to this package (which
never calls torch at runtime).
"""

from __future__ import annotations

import sys
import types
import warnings

REF_ROOT = "/root/reference"


def load_reference_upflow():
    """Import and return the reference ``model.upflow`` module."""
    for stub in ("correlation_cuda", "png"):
        if stub not in sys.modules:
            sys.modules[stub] = types.ModuleType(stub)

    import torch
    import torch.nn.functional as F
    import torch.utils.data.dataloader as dataloader

    if not hasattr(dataloader, "_DataLoaderIter"):
        dataloader._DataLoaderIter = object  # tools.py:2 (torch-1.1 import)

    if not getattr(F.grid_sample, "_torch11_align_corners", False):
        orig = F.grid_sample

        def grid_sample_torch11(input, grid, mode="bilinear",
                                padding_mode="zeros", align_corners=None):
            return orig(input, grid, mode=mode, padding_mode=padding_mode,
                        align_corners=True)

        grid_sample_torch11._torch11_align_corners = True
        F.grid_sample = grid_sample_torch11

    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        from model import pwc_modules as ref_pwc  # noqa: E402
        from model import upflow as ref_upflow  # noqa: E402

    # The reference's flow upsamplers (pwc_modules.py:75-104) scale the
    # u/v channels IN-PLACE on chunk views — legal under torch 1.1, but
    # modern autograd rejects "output of a function that returns multiple
    # views modified inplace" as soon as gradients flow.  Replace with
    # out-of-place equivalents (bitwise-identical values: same interpolate,
    # same scalar multiplies, same cat) on BOTH the defining module and
    # upflow's from-imported bindings.
    if not getattr(ref_pwc.upsample2d_flow_as, "_grad_safe", False):
        import torch
        import torch.nn.functional as tf

        def upsample2d_flow_as(inputs, target_as, mode="bilinear",
                               if_rate=False):
            _, _, h, w = target_as.size()
            res = tf.interpolate(inputs, [h, w], mode=mode,
                                 align_corners=True)
            if if_rate:
                _, _, h_, w_ = inputs.size()
                u, v = res.chunk(2, dim=1)
                res = torch.cat([u * (w / w_), v * (h / h_)], dim=1)
            return res

        def upsample_flow(inputs, target_size=None, target_flow=None,
                          mode="bilinear"):
            if target_size is not None:
                h, w = target_size
            elif target_flow is not None:
                _, _, h, w = target_flow.size()
            else:
                raise ValueError("wrong input")
            _, _, h_, w_ = inputs.size()
            res = tf.interpolate(inputs, [h, w], mode=mode,
                                 align_corners=True)
            u, v = res.chunk(2, dim=1)
            return torch.cat([u * (w / w_), v * (h / h_)], dim=1)

        upsample2d_flow_as._grad_safe = True
        upsample_flow._grad_safe = True
        ref_pwc.upsample2d_flow_as = upsample2d_flow_as
        ref_pwc.upsample_flow = upsample_flow
        ref_upflow.upsample2d_flow_as = upsample2d_flow_as
        ref_upflow.upsample_flow = upsample_flow
    return ref_upflow


def build_reference_net(conf_updates: dict):
    """Build a reference ``UPFlow_net`` in eval mode on CPU.

    ``conf_updates`` uses the reference knob names (upflow.py:292-323).
    ``if_use_cor_pytorch`` is forced True (the CUDA extension is absent).
    """
    ref_upflow = load_reference_upflow()
    conf = ref_upflow.UPFlow_net.config()
    updates = dict(conf_updates)
    updates["if_use_cor_pytorch"] = True
    conf.update(updates)
    net = conf()
    net.eval()
    return net


class relaxed_mask_threshold:
    """Context manager: set BOTH frameworks' warp validity-mask threshold
    to the reference's own relaxed variant (0.9999, tools.py:1263).

    The default ``>= 1.0`` threshold (pwc_modules.py:205-206) is chaotic:
    whether the fp32 warped-ones sum is 1.0 or 1.0-1ulp at an interior
    pixel depends on the last bit of the flow, so two frameworks with
    different conv reduction orders can never agree on it bit-for-bit.
    Full-model comparisons neutralize it; op-level tests prove the 1.0
    threshold matches exactly given identical inputs.
    """

    def __init__(self, threshold: float = 0.9999):
        self.threshold = threshold

    def __enter__(self):
        import torch
        import torch.nn.functional as F

        import upflow_pytorch_tpu.ops.warp as warp_mod

        ref_upflow = load_reference_upflow()
        from model.pwc_modules import WarpingLayer_no_div

        self._warp_mod = warp_mod
        self._old_jax = warp_mod.MASK_THRESHOLD
        warp_mod.MASK_THRESHOLD = self.threshold

        thr = self.threshold

        def forward_relaxed(wl_self, x, flow):
            b, c, h, w = x.size()
            xx = torch.arange(0, w).view(1, 1, 1, -1).expand(b, 1, h, w)
            yy = torch.arange(0, h).view(1, 1, -1, 1).expand(b, 1, h, w)
            grid = torch.cat((xx, yy), 1).float() + flow
            grid[:, 0] = 2.0 * grid[:, 0] / max(w - 1, 1) - 1.0
            grid[:, 1] = 2.0 * grid[:, 1] / max(h - 1, 1) - 1.0
            grid = grid.permute(0, 2, 3, 1)
            warped = F.grid_sample(x, grid, padding_mode="zeros")
            ones = F.grid_sample(torch.ones_like(x), grid)
            return warped * (ones >= thr).float()

        self._wl_cls = WarpingLayer_no_div
        self._old_fwd = WarpingLayer_no_div.forward
        WarpingLayer_no_div.forward = forward_relaxed
        return self

    def __exit__(self, *exc):
        self._warp_mod.MASK_THRESHOLD = self._old_jax
        self._wl_cls.forward = self._old_fwd
        return False


def load_params_into_reference(net, torch_state_dict):
    """Strict-load a {name: np.ndarray} state dict into the torch net."""
    import torch

    tensors = {k: torch.from_numpy(v.copy()) for k, v in torch_state_dict.items()}
    missing, unexpected = net.load_state_dict(tensors, strict=False)
    # strict=False only to produce a readable error: every param/buffer the
    # torch model owns must be covered by the export, and vice versa.
    if missing or unexpected:
        raise AssertionError(
            "state dict mismatch: missing=%s unexpected=%s"
            % (sorted(missing), sorted(unexpected)))
    return net
