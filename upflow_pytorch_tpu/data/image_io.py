"""Image reading + UnFlow normalization.

Mirrors ``img_func.get_process_img`` (/root/reference/dataset/kitti_dataset.py:43-66):
``(img - [104.92, 110.18, 114.79]) * 0.0039216`` on RGB uint8, HWC float32
output (the reference transposes to CHW; we stay NHWC-friendly).

Uses cv2/PIL when available for speed, falling back to the pure-numpy PNG
reader in ``flow_io``.
"""

from __future__ import annotations

import numpy as np

UNFLOW_MEAN = np.array([104.920005, 110.1753, 114.785955], np.float32)
UNFLOW_SCALE = np.float32(0.0039216)  # 1/255 (reference's stddev = 1/0.0039216)


def read_image(path: str) -> np.ndarray:
    """Read an image file -> (H, W, 3) uint8 RGB.

    Prefers the native C++ PNG decoder (data/native.py), then cv2/PIL,
    then the pure-python codec.
    """
    if path.lower().endswith(".png"):
        try:
            from upflow_pytorch_tpu.data import native
            if native.available():
                img = native.decode_png(path)
                if img.dtype == np.uint16:
                    img = (img >> 8).astype(np.uint8)
                if img.shape[2] == 1:
                    img = np.repeat(img, 3, axis=2)
                return img[:, :, :3]
        except Exception:
            pass
    try:
        import cv2
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise IOError("cv2 failed to read %s" % path)
        return img[:, :, ::-1]  # BGR -> RGB
    except ImportError:
        pass
    try:
        from PIL import Image
        return np.asarray(Image.open(path).convert("RGB"))
    except ImportError:
        from upflow_pytorch_tpu.data.flow_io import read_png
        img = read_png(path)
        if img.dtype == np.uint16:
            img = (img >> 8).astype(np.uint8)
        if img.shape[2] == 1:
            img = np.repeat(img, 3, axis=2)
        return img[:, :, :3]


def normalize_image(img: np.ndarray, normalize: bool = True,
                    horizontal_flip: bool = False) -> np.ndarray:
    """uint8 RGB HWC -> normalized float32 HWC."""
    img = np.asarray(img)
    if horizontal_flip:
        img = img[:, ::-1]
    img = img.astype(np.float32)
    if normalize:
        img = (img - UNFLOW_MEAN) * UNFLOW_SCALE
    return np.ascontiguousarray(img)


def process_image(path: str, normalize: bool = True,
                  horizontal_flip: bool = False) -> np.ndarray:
    return normalize_image(read_image(path), normalize, horizontal_flip)
