"""8-d normalized spatial-coordinate features
(reference ``Instance_Matching/utils/processing_tools.py:5-17``)."""
from __future__ import annotations

from functools import lru_cache

import numpy as np


@lru_cache(maxsize=8)
def _spatial_grid(h: int, w: int) -> np.ndarray:
    ws = np.arange(w, dtype=np.float32)
    hs = np.arange(h, dtype=np.float32)
    xmin = ws / w * 2 - 1
    xmax = (ws + 1) / w * 2 - 1
    xctr = (xmin + xmax) / 2
    ymin = hs / h * 2 - 1
    ymax = (hs + 1) / h * 2 - 1
    yctr = (ymin + ymax) / 2
    out = np.zeros((h, w, 8), dtype=np.float32)
    out[:, :, 0] = xmin[None, :]
    out[:, :, 1] = ymin[:, None]
    out[:, :, 2] = xmax[None, :]
    out[:, :, 3] = ymax[:, None]
    out[:, :, 4] = xctr[None, :]
    out[:, :, 5] = yctr[:, None]
    out[:, :, 6] = 1.0 / w
    out[:, :, 7] = 1.0 / h
    return out


def generate_spatial_batch(n: int, featmap_h: int, featmap_w: int) -> np.ndarray:
    """[N, h, w, 8] = [xmin, ymin, xmax, ymax, xctr, yctr, 1/W, 1/H] per cell."""
    grid = _spatial_grid(featmap_h, featmap_w)
    return np.broadcast_to(grid[None], (n, featmap_h, featmap_w, 8)).copy()
