"""Configuration system.

Mirrors the knob surface of the reference config classes
(`UPFlow_net.config`, /root/reference/model/upflow.py:292-327;
`tools.abstract_config`, /root/reference/utils/tools.py:32-105) as frozen
dataclasses, plus the dict-update and experiment-name-string helpers the
reference exposes (`update`, `get_name`, `get_dict`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple


class ConfigBase:
    """Shared helpers mirroring ``tools.abstract_config`` semantics.

    ``updated(d)`` returns a copy with only *pre-declared* fields set
    (unknown keys in ``d`` are ignored), matching the reference's
    declared-attrs-only ``update`` (tools.py:76-90).  ``get_name()``
    builds the sorted ``key|value_`` experiment-name string
    (tools.py:35-60).
    """

    def updated(self, data: Dict[str, Any]):
        known = {f.name for f in dataclasses.fields(self)}
        accepted = {k: v for k, v in data.items() if k in known}
        return dataclasses.replace(self, **accepted)

    def get_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def get_name(self) -> str:
        items = sorted(dataclasses.asdict(self).items())
        return "".join("%s|%s_" % (k, v) for k, v in items)


@dataclasses.dataclass(frozen=True)
class UPFlowConfig(ConfigBase):
    """All 22 knobs of ``UPFlow_net.config`` (upflow.py:292-323), with the
    reference defaults, plus TPU-specific extensions at the bottom."""

    # --- occlusion check
    occ_type: str = "for_back_check"
    alpha_1: float = 0.1
    alpha_2: float = 0.5
    occ_check_obj_out_all: str = "obj"  # 'obj' | 'out' | 'all'
    stop_occ_gradient: bool = False
    # --- smoothness loss
    smooth_level: str = "final"  # 'final' | '1/4'
    smooth_type: str = "edge"  # 'edge' | 'delta'
    smooth_order_1_weight: float = 1.0
    smooth_order_2_weight: float = 0.0
    # --- photometric loss
    photo_loss_type: str = "abs_robust"  # abs_robust | charbonnier | L1 | SSIM
    photo_loss_delta: float = 0.4
    photo_loss_use_occ: bool = False
    photo_loss_census_weight: float = 0.0
    # --- cost-volume feature normalization
    if_norm_before_cost_volume: bool = False
    norm_moments_across_channels: bool = True
    norm_moments_across_images: bool = True
    # --- pyramid distillation
    multi_scale_distillation_weight: float = 0.0
    multi_scale_distillation_style: str = "upup"  # 'down' | 'upup'
    multi_scale_distillation_occ: bool = True
    # --- misc
    if_froze_pwc: bool = False
    input_or_sp_input: float = 1  # 1: raw input; else use im1_sp/im2_sp for fwd
    if_use_boundary_warp: bool = True
    if_sgu_upsample: bool = False
    # Reference knob selecting the torch fallback correlation
    # (if_use_cor_pytorch).  Here it selects the always-available pure-XLA
    # correlation instead of the Pallas kernel.
    if_use_cor_pytorch: bool = False

    # --- TPU-native extensions (not in the reference) ---
    # compute dtype for conv stacks; params stay fp32.
    compute_dtype: str = "float32"  # 'float32' | 'bfloat16'
    # rematerialize the decoder conv stacks in backward (trade FLOPs for
    # activation memory; enables larger train batches/resolutions)
    remat: bool = False
    # architecture constants (upflow.py:335-341); exposed for completeness
    search_range: int = 4
    output_level: int = 4

    @property
    def num_chs(self) -> Tuple[int, ...]:
        return (3, 16, 32, 64, 96, 128, 196)

    @property
    def estimator_f_channels(self) -> Tuple[int, ...]:
        return (128, 128, 96, 64, 32)

    @property
    def context_f_channels(self) -> Tuple[int, ...]:
        return (128, 128, 128, 96, 64, 32, 2)

    @property
    def dim_corr(self) -> int:
        return (self.search_range * 2 + 1) ** 2


@dataclasses.dataclass(frozen=True)
class KittiTrainDataConfig(ConfigBase):
    """Mirror of ``kitti_data_with_start_point.config``
    (kitti_dataset.py:269-282)."""

    crop_size: Tuple[int, int] = (256, 832)
    rho: int = 8
    swap_images: bool = True
    normalize: bool = True
    repeat: int | None = None
    horizontal_flip_aug: bool = True
    mv_type: str | None = None  # '2015' | '2012'


@dataclasses.dataclass(frozen=True)
class TrainerConfig(ConfigBase):
    """Mirror of ``Trainer.Config`` (simple_train.py:84-98)."""

    exp_dir: str = "./demo_exp"
    batchsize: int = 2
    num_workers: int = 4
    n_epoch: int = 1000
    batch_per_epoch: int = 500
    batch_per_print: int = 20
    lr: float = 1e-4
    weight_decay: float = 1e-4
    scheduler_gamma: float = 1.0
    # TPU extensions
    data_axis: int = 1  # number of data-parallel shards (mesh size)
    seed: int = 0
    # pad in-training eval inputs to multiples of N (compile-bounded eval:
    # a handful of shape buckets instead of one compile per native KITTI
    # size).  None = strict native-size eval (acceptance runs).
    eval_pad_to_multiple: int | None = 64
    # ARFlow spatial-transform equivariance (ex_runner recipe; 0 = off)
    eq_loss_weight: float = 0.0
    eq_loss_use_occ: bool = True
    # 'L1' = the reference's exact masked-L1 penalty (ex_runner.py:266-276);
    # 'abs_robust' = the robust variant (see losses/equivariance.py)
    eq_loss_type: str = "abs_robust"
