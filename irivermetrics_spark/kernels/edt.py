"""Exact Euclidean distance transform (Felzenszwalb-Huttenlocher).

Reproduces scipy.ndimage.distance_transform_edt on a binary image
(reference: src/utils/calc_metrics.py:682-685): for each nonzero pixel,
the Euclidean distance to the nearest zero pixel; zero pixels get 0.
Separable two-pass lower-envelope-of-parabolas algorithm (public
algorithm, Felzenszwalb & Huttenlocher 2012), vectorized per row.
"""

from __future__ import annotations

import numpy as np

_INF = 1e18


def _dt1d_sq(f: np.ndarray) -> np.ndarray:
    """1-D squared distance transform of sampled function f (lower envelope)."""
    n = f.shape[0]
    d = np.empty(n, dtype=np.float64)
    v = np.empty(n, dtype=np.int64)
    z = np.empty(n + 1, dtype=np.float64)
    k = 0
    v[0] = 0
    z[0] = -_INF
    z[1] = _INF
    for q in range(1, n):
        s = ((f[q] + q * q) - (f[v[k]] + v[k] * v[k])) / (2.0 * q - 2.0 * v[k])
        while s <= z[k]:
            k -= 1
            s = ((f[q] + q * q) - (f[v[k]] + v[k] * v[k])) / (2.0 * q - 2.0 * v[k])
        k += 1
        v[k] = q
        z[k] = s
        z[k + 1] = _INF
    k = 0
    for q in range(n):
        while z[k + 1] < q:
            k += 1
        d[q] = (q - v[k]) ** 2 + f[v[k]]
    return d


def edt(binary: np.ndarray) -> np.ndarray:
    """Exact EDT: distance from nonzero pixels to nearest zero (float32)."""
    fg = np.asarray(binary) != 0
    h, w = fg.shape
    # squared distance along columns first
    f = np.where(fg, _INF, 0.0)
    d = np.empty((h, w), dtype=np.float64)
    for x in range(w):
        col = f[:, x]
        if (col == 0.0).all():
            d[:, x] = 0.0
        else:
            d[:, x] = _dt1d_sq(col)
    out = np.empty((h, w), dtype=np.float64)
    for y in range(h):
        out[y, :] = _dt1d_sq(d[y, :])
    return np.sqrt(out).astype(np.float32)
