"""KITTI dataset scanning/loading over a synthetic directory tree."""

import os

import numpy as np
import pytest

from upflow_pytorch_tpu.data.flow_io import write_flow_png, write_png
from upflow_pytorch_tpu.data.kitti import (
    KittiFlowEvalDataset,
    KittiMultiviewDataset,
    scan_eval_files,
    scan_multiview_pairs,
)

RNG = np.random.RandomState(5)
H, W = 48, 112


def _img():
    return RNG.randint(0, 256, (H, W, 3), np.uint8)


@pytest.fixture()
def kitti_root(tmp_path):
    root = str(tmp_path)
    base = os.path.join(root, "data_scene_flow", "training")
    for sub in ["image_2", "flow_occ", "flow_noc"]:
        os.makedirs(os.path.join(base, sub))
    for i in range(3):
        write_png(os.path.join(base, "image_2", "%06d_10.png" % i), _img())
        write_png(os.path.join(base, "image_2", "%06d_11.png" % i), _img())
        flow = RNG.randn(H, W, 2).astype(np.float32) * 5
        mask = np.ones((H, W), np.uint16)
        write_flow_png(os.path.join(base, "flow_occ", "%06d_10.png" % i), flow, mask)
        write_flow_png(os.path.join(base, "flow_noc", "%06d_10.png" % i), flow, mask)
    # test split
    tbase = os.path.join(root, "data_scene_flow", "testing", "image_2")
    os.makedirs(tbase)
    for i in range(2):
        write_png(os.path.join(tbase, "%06d_10.png" % i), _img())
        write_png(os.path.join(tbase, "%06d_11.png" % i), _img())
    # multiview
    mv = os.path.join(root, "data_scene_flow_multiview", "training", "image_2")
    os.makedirs(mv)
    for i in range(2):
        for fid in range(7, 16):
            write_png(os.path.join(mv, "%06d_%02d.png" % (i, fid)), _img())
    return root


def test_eval_dataset(kitti_root):
    ds = KittiFlowEvalDataset(kitti_root, "2015_train")
    assert len(ds) == 3
    s = ds[0]
    assert s.im1.shape == (1, H, W, 3)
    assert s.flow_occ.shape == (1, H, W, 2)
    assert s.mask_occ.dtype == np.float32
    assert np.isfinite(s.im1).all()
    # normalization: values roughly in [-0.5, 0.7]
    assert abs(s.im1).max() < 1.0

    test_ds = KittiFlowEvalDataset(kitti_root, "2015_test")
    assert len(test_ds) == 2
    assert test_ds[0].flow_occ is None
    assert test_ds[0].name == "000000_10"


def test_multiview_scan_excludes_gt_frames(kitti_root):
    pairs = scan_multiview_pairs(kitti_root, "2015", cache=False)
    # per sequence frames 7..15: pairs (7,8), (13,14), (14,15) survive
    # (frames 9-12 and their neighbors via pair exclusion are dropped)
    assert len(pairs) == 2 * 3
    for p1, p2 in pairs:
        f1 = int(p1[-6:-4])
        f2 = int(p2[-6:-4])
        assert f2 == f1 + 1
        assert not (9 <= f1 <= 12 or 9 <= f2 <= 12)


def test_multiview_dataset_crop_and_start(kitti_root):
    ds = KittiMultiviewDataset(kitti_root, "2015", crop_size=(32, 64), rho=4,
                               seed=1)
    item = ds[0]
    assert item["im1"].shape == (32, 64, 3)
    assert item["im1_raw"].shape == (H, W, 3)
    x, y = item["start"]
    assert 4 <= x < W - 4 - 64 and 4 <= y < H - 4 - 32
    # crop equals the raw slice at start
    np.testing.assert_array_equal(
        item["im1"], item["im1_raw"][int(y):int(y) + 32, int(x):int(x) + 64])


def test_scan_eval_files_pairs(kitti_root):
    items = scan_eval_files(kitti_root, "2015_train")
    assert all(it["im1"].endswith("_10.png") and it["im2"].endswith("_11.png")
               for it in items)
