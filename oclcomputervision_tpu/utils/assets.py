"""Test/demo asset loading.

The reference keeps its ground-truth assets in ``images/`` (lenna.png,
frame10/11.png, flow10.flo, under_exposure.jpg); we vendor the same set
under ``assets/`` at the repo root so every test is runnable offline.
"""

from __future__ import annotations

import os

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ASSETS_DIR = os.path.join(_REPO_ROOT, "assets")


def asset_path(name: str) -> str:
    return os.path.join(ASSETS_DIR, name)


def load_image(name: str) -> np.ndarray:
    """Load an asset as an RGB uint8 array of shape [H, W, 3]."""
    path = asset_path(name) if not os.path.isabs(name) else name
    try:
        import cv2

        bgr = cv2.imread(path, cv2.IMREAD_COLOR)
        if bgr is None:
            raise FileNotFoundError(path)
        return bgr[..., ::-1].copy()
    except ImportError:
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB"))


def load_gray(name: str) -> np.ndarray:
    """Load an asset as a grayscale uint8 array [H, W] (BT.601, like cv2)."""
    path = asset_path(name) if not os.path.isabs(name) else name
    try:
        import cv2

        g = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if g is None:
            raise FileNotFoundError(path)
        return g
    except ImportError:
        rgb = load_image(path).astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        return np.round(y).clip(0, 255).astype(np.uint8)
