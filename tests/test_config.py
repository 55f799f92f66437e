"""Config system: reference knob surface, update semantics, name strings."""

import dataclasses

from upflow_pytorch_tpu.config import KittiTrainDataConfig, TrainerConfig, UPFlowConfig

# the 22 reference knobs (upflow.py:292-323)
REFERENCE_KNOBS = [
    "occ_type", "alpha_1", "alpha_2", "occ_check_obj_out_all",
    "stop_occ_gradient", "smooth_level", "smooth_type",
    "smooth_order_1_weight", "smooth_order_2_weight", "photo_loss_type",
    "photo_loss_delta", "photo_loss_use_occ", "photo_loss_census_weight",
    "if_norm_before_cost_volume", "norm_moments_across_channels",
    "norm_moments_across_images", "multi_scale_distillation_weight",
    "multi_scale_distillation_style", "multi_scale_distillation_occ",
    "if_froze_pwc", "input_or_sp_input", "if_use_boundary_warp",
]
REFERENCE_EXTRA = ["if_sgu_upsample", "if_use_cor_pytorch"]


def test_all_reference_knobs_present_with_defaults():
    c = UPFlowConfig()
    fields = {f.name for f in dataclasses.fields(c)}
    for k in REFERENCE_KNOBS + REFERENCE_EXTRA:
        assert k in fields, k
    # spot-check reference defaults (upflow.py:295-323)
    assert c.occ_type == "for_back_check"
    assert c.alpha_1 == 0.1 and c.alpha_2 == 0.5
    assert c.occ_check_obj_out_all == "obj"
    assert c.smooth_order_1_weight == 1.0
    assert c.photo_loss_type == "abs_robust"
    assert c.multi_scale_distillation_style == "upup"
    assert c.if_use_boundary_warp is True
    assert c.if_sgu_upsample is False


def test_updated_ignores_unknown_keys():
    c = UPFlowConfig().updated({"alpha_1": 0.2, "nonexistent_knob": 1})
    assert c.alpha_1 == 0.2
    assert not hasattr(c, "nonexistent_knob")


def test_get_name_is_sorted_key_value_string():
    c = TrainerConfig(lr=0.5)
    name = c.get_name()
    assert "lr|0.5_" in name
    # keys appear in sorted order
    positions = [name.index("%s|" % k) for k in sorted(c.get_dict())]
    assert positions == sorted(positions)


def test_dataset_config_knobs():
    d = KittiTrainDataConfig()
    assert d.crop_size == (256, 832) and d.rho == 8
    assert d.swap_images and d.normalize and d.horizontal_flip_aug
