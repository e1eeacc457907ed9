"""Edge / distance-transform helpers for the CelebA-HQ-edge and DeepFashion
label pipelines (reference celebahqedge_dataset.py:69-116,
deepfashion_dataset.py:104-169, util/mask_to_edge.py).

skimage is not present in this environment, so `canny` is a standard Canny
implementation on scipy.ndimage with skimage's default parameters (sigma=1,
low=0.1, high=0.2 on [0,1] magnitude): gaussian smooth -> sobel -> quantized
non-max suppression -> hysteresis via connected components. Edge placement
matches skimage's within a pixel for natural images; the fine structure is a
training signal, not a checkpoint-parity surface.
"""

from __future__ import annotations

import cv2
import numpy as np
from scipy import ndimage as ndi


def mask_edges(edge: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Inter-region boundary map (celebahqedge_dataset.py:69-74): mark pixels
    whose right/down neighbor differs."""
    edge = edge.astype(bool)
    diff_h = t[:, 1:] != t[:, :-1]
    diff_v = t[1:, :] != t[:-1, :]
    edge[:, 1:] |= diff_h
    edge[:, :-1] |= diff_h
    edge[1:, :] |= diff_v
    edge[:-1, :] |= diff_v
    return edge.astype(np.uint8)


def distance_transform_map(edge: np.ndarray) -> np.ndarray:
    """cv2.distanceTransform(255 - edge*255, DIST_L1, 3) then clip(d/3)
    (celebahqedge_dataset.py:99-100, deepfashion_dataset.py:161-162)."""
    im_dist = cv2.distanceTransform(255 - edge * 255, cv2.DIST_L1, 3)
    return np.clip(im_dist / 3, 0, 255).astype(np.uint8)


def canny(gray: np.ndarray, sigma: float = 1.0, low: float = 0.1,
          high: float = 0.2) -> np.ndarray:
    """Canny edges of a uint8 grayscale image -> bool map."""
    img = gray.astype(np.float64) / 255.0
    # border-corrected gaussian smoothing (smooth a support mask too)
    ones = np.ones_like(img)
    sm = ndi.gaussian_filter(img, sigma, mode="constant")
    support = ndi.gaussian_filter(ones, sigma, mode="constant")
    sm = sm / np.maximum(support, 1e-12)

    gx = ndi.sobel(sm, axis=1, mode="reflect")
    gy = ndi.sobel(sm, axis=0, mode="reflect")
    mag = np.hypot(gx, gy)
    if mag.max() == 0:
        return np.zeros_like(gray, dtype=bool)

    # quantized-direction non-maximum suppression
    angle = np.rad2deg(np.arctan2(gy, gx)) % 180.0
    nms = np.zeros_like(mag)
    padded = np.pad(mag, 1, mode="constant")
    c = padded[1:-1, 1:-1]
    neighbors = {
        0: (padded[1:-1, 2:], padded[1:-1, :-2]),     # E/W
        45: (padded[:-2, 2:], padded[2:, :-2]),       # NE/SW
        90: (padded[:-2, 1:-1], padded[2:, 1:-1]),    # N/S
        135: (padded[:-2, :-2], padded[2:, 2:]),      # NW/SE
    }
    quant = (np.floor((angle + 22.5) / 45.0).astype(int) % 4) * 45
    for d, (n1, n2) in neighbors.items():
        sel = quant == d
        keep = sel & (c >= n1) & (c >= n2)
        nms[keep] = c[keep]

    strong = nms >= high
    weak = nms >= low
    # hysteresis: weak pixels connected to a strong pixel survive
    labels, n = ndi.label(weak, structure=np.ones((3, 3)))
    if n == 0:
        return strong
    keep_labels = np.unique(labels[strong])
    keep_labels = keep_labels[keep_labels > 0]
    return np.isin(labels, keep_labels)
