"""Native C++ data path vs the pure-python codecs."""

import numpy as np
import pytest

from upflow_pytorch_tpu.data import native
from upflow_pytorch_tpu.data.flow_io import write_flow_png, write_png
from upflow_pytorch_tpu.data.image_io import normalize_image

RNG = np.random.RandomState(21)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable (no g++/zlib)")


def test_native_png_decode_8bit(tmp_path):
    img = RNG.randint(0, 256, (33, 47, 3), np.uint8)
    p = str(tmp_path / "a.png")
    write_png(p, img)
    np.testing.assert_array_equal(native.decode_png(p), img)


def test_native_png_decode_16bit(tmp_path):
    img = RNG.randint(0, 65536, (21, 29, 3), np.uint16)
    p = str(tmp_path / "b.png")
    write_png(p, img)
    np.testing.assert_array_equal(native.decode_png(p), img)


def test_native_png_decode_cv2_filters(tmp_path):
    """cv2-written PNGs exercise sub/up/average/paeth filters."""
    cv2 = pytest.importorskip("cv2")
    img = np.clip(np.cumsum(RNG.randint(0, 7, (64, 80, 3)), axis=1), 0,
                  255).astype(np.uint8)
    p = str(tmp_path / "c.png")
    cv2.imwrite(p, img[:, :, ::-1])
    np.testing.assert_array_equal(native.decode_png(p), img)


def test_native_flow_png(tmp_path):
    flow = ((RNG.rand(30, 40, 2) - 0.5) * 100).astype(np.float32)
    mask = (RNG.rand(30, 40) > 0.5).astype(np.uint16)
    p = str(tmp_path / "f.png")
    write_flow_png(p, flow, mask)
    nf, nm = native.decode_flow_png(p)
    np.testing.assert_allclose(nf, flow, atol=1 / 64 + 1e-6)
    np.testing.assert_array_equal(nm[..., 0], mask.astype(np.uint8))


def test_native_preprocess_matches_python():
    img = RNG.randint(0, 256, (25, 37, 3), np.uint8)
    for flip in (False, True):
        ref = normalize_image(img, True, flip)
        out = native.preprocess_image(img, flip)
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)
