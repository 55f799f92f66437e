"""Utils: meters, viz, debug, profiling, Sintel scan."""

import os

import numpy as np

from upflow_pytorch_tpu.utils.meters import AverageMeter, AvgMeterGroup
from upflow_pytorch_tpu.utils.viz import flow_error_image, flow_to_image
from upflow_pytorch_tpu.utils.debug import check_tensor, count_params

RNG = np.random.RandomState(23)


def test_average_meter_weighted():
    m = AverageMeter()
    m.update(1.0, num=1)
    m.update(3.0, num=3)
    assert m.avg == 2.5 and m.val == 3.0 and m.count == 4


def test_meter_group():
    g = AvgMeterGroup()
    g.update("photo_loss", 2.0, 2, "ph")
    g.update("photo_loss", 4.0, 2)
    s = g.print_all_losses()
    assert "ph=" in s and "3.0000" in s


def test_flow_to_image_properties():
    flow = np.zeros((16, 16, 2), np.float32)
    flow[:8, :, 0] = 5.0
    flow[8:, :, 1] = -5.0
    img = flow_to_image(flow)
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    # different directions get different colors
    assert not np.array_equal(img[0, 0], img[15, 0])
    # zero flow (radius 0) maps to (near) white
    z = flow_to_image(np.zeros((4, 4, 2), np.float32))
    assert z.min() >= 250


def test_flow_error_image():
    gt = RNG.randn(10, 12, 2).astype(np.float32) * 5
    pred = gt + 1.0
    mask = np.ones((10, 12, 1), np.float32)
    mask[0, 0] = 0
    img = flow_error_image(gt, pred, mask)
    assert img.shape == (10, 12, 3) and (img[0, 0] == 0).all()


def test_check_tensor_and_params():
    msg = check_tensor(np.ones((2, 3)), "x")
    assert "shape=(2, 3)" in msg
    assert count_params({"a": np.ones((4, 5)), "b": np.ones(7)}) == 27


def test_sintel_scan(tmp_path):
    from upflow_pytorch_tpu.data.flow_io import write_flo, write_png
    from upflow_pytorch_tpu.data.sintel import SintelEvalDataset, scan_sintel

    root = str(tmp_path)
    for scene in ["alley_1", "ambush_2"]:
        for sub in ["final", "flow", "occlusions"]:
            os.makedirs(os.path.join(root, "training", sub, scene))
        for f in range(3):
            img = RNG.randint(0, 256, (24, 32, 3), np.uint8)
            write_png(os.path.join(root, "training", "final", scene,
                                   "frame_%04d.png" % f), img)
            if f < 2:
                write_flo(os.path.join(root, "training", "flow", scene,
                                       "frame_%04d.flo" % f),
                          RNG.randn(24, 32, 2).astype(np.float32))
                occ = np.zeros((24, 32, 3), np.uint8)
                write_png(os.path.join(root, "training", "occlusions", scene,
                                       "frame_%04d.png" % f), occ)
    items = scan_sintel(root)
    assert len(items) == 4  # 2 scenes x 2 consecutive pairs
    ds = SintelEvalDataset(root)
    assert len(ds) == 4
    s = ds[0]
    assert s.im1.shape == (1, 24, 32, 3)
    assert s.flow_occ.shape == (1, 24, 32, 2)
    assert s.mask_noc.min() == 1.0  # no occlusions marked
