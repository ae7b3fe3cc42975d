"""Small auxiliary morphology kernels.

M9 — binary dilation with a square structuring element, after the
reference's dev-tree section generator (dev/gen_sections.py:38-43).
Dev-scope in the reference (not part of calculate_metrics parity) but
part of the engine's kernel library: pure numpy shift-OR, no scipy.
"""

from __future__ import annotations

import numpy as np


def binary_dilate(img: np.ndarray, size: int = 3, iterations: int = 1) -> np.ndarray:
    """Dilate nonzero foreground by a size x size square element."""
    out = (np.asarray(img) != 0)
    r = size // 2
    for _ in range(iterations):
        acc = out.copy()
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                if dx == 0 and dy == 0:
                    continue
                shifted = np.zeros_like(out)
                ys = slice(max(0, dy), out.shape[0] + min(0, dy))
                xs = slice(max(0, dx), out.shape[1] + min(0, dx))
                ys_src = slice(max(0, -dy), out.shape[0] + min(0, -dy))
                xs_src = slice(max(0, -dx), out.shape[1] + min(0, -dx))
                shifted[ys, xs] = out[ys_src, xs_src]
                acc |= shifted
        out = acc
    return out.astype(np.uint8)
