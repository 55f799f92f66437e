"""Flow/PNG codec round-trips + cross-check against cv2's PNG codec."""

import numpy as np
import pytest

from upflow_pytorch_tpu.data.flow_io import (
    read_flo,
    read_flow_png,
    read_png,
    write_flo,
    write_flow_png,
    write_png,
)

RNG = np.random.RandomState(7)


def test_png_roundtrip_8bit(tmp_path):
    img = RNG.randint(0, 256, (21, 33, 3), np.uint8)
    p = str(tmp_path / "a.png")
    write_png(p, img)
    np.testing.assert_array_equal(read_png(p), img)


def test_png_roundtrip_16bit(tmp_path):
    img = RNG.randint(0, 65536, (14, 27, 3), np.uint16)
    p = str(tmp_path / "b.png")
    write_png(p, img)
    np.testing.assert_array_equal(read_png(p), img)


def test_png_cross_check_with_cv2(tmp_path):
    cv2 = pytest.importorskip("cv2")
    img = RNG.randint(0, 65536, (10, 13, 3), np.uint16)
    p = str(tmp_path / "c.png")
    write_png(p, img)
    theirs = cv2.imread(p, cv2.IMREAD_UNCHANGED)[:, :, ::-1]  # BGR->RGB
    np.testing.assert_array_equal(theirs, img)
    # and read back something cv2 wrote (exercises PNG filter decoding)
    p2 = str(tmp_path / "d.png")
    cv2.imwrite(p2, img[:, :, ::-1])
    np.testing.assert_array_equal(read_png(p2), img)


def test_kitti_flow_png_roundtrip(tmp_path):
    flow = (RNG.rand(20, 30, 2).astype(np.float32) - 0.5) * 100
    mask = (RNG.rand(20, 30) > 0.3).astype(np.uint16)
    p = str(tmp_path / "flow.png")
    write_flow_png(p, flow, mask)
    flow2, mask2 = read_flow_png(p)
    # flow is quantized to 1/64 px in the format
    np.testing.assert_allclose(flow2, flow, atol=1 / 64 + 1e-6)
    np.testing.assert_array_equal(mask2[..., 0], mask)


def test_flo_roundtrip(tmp_path):
    flow = RNG.randn(11, 17, 2).astype(np.float32) * 10
    p = str(tmp_path / "x.flo")
    write_flo(p, flow)
    np.testing.assert_array_equal(read_flo(p), flow)
