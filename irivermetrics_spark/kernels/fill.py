"""Temporal nodata fill with exact reference semantics.

The reference fills in-corridor nodata (value 2) from time-neighbor
layers at offsets [+1, +2, -1, -2], first non-2 wins, processing layers
IN ORDER and IN PLACE — so a layer filled earlier feeds later layers
(cascade). It runs under dask map_overlap(depth={'time': 2},
boundary='reflect') on a single time chunk, which pads the series with
2 symmetric-reflected layers at each end before the sequential sweep
(reference: src/utils/calc_metrics.py:522-584). Afterwards everything
!= 1 binarizes to 0 (:585-590), which also makes the post-fill >= 95 %
validity check vacuous (it runs on the binarized array — reproduced
faithfully in the preprocess operator).

``fill_series`` reproduces that whole contraption per pixel, vectorized
over pixels: input (n_t, n_px) int8 in {0,1,2}, output same shape with
2s filled where possible.
"""

from __future__ import annotations

import numpy as np


def fill_series(values: np.ndarray) -> np.ndarray:
    """Sequential in-place temporal fill over a symmetric-reflect pad.

    values: (n_t, n_px) int8. Returns filled (n_t, n_px) — the center
    of the padded sweep; remaining 2s (unfillable) are preserved (the
    caller binarizes them to 0).
    """
    v = np.asarray(values)
    n = v.shape[0]
    if n == 0:
        return v.copy()
    # dask 'reflect' == numpy 'symmetric': [b, a | a b ... z | z, y]
    if n >= 2:
        pad_lo = v[[1, 0]]
        pad_hi = v[[n - 1, n - 2]]
    else:
        pad_lo = v[[0, 0]]
        pad_hi = v[[0, 0]]
    P = np.concatenate([pad_lo, v, pad_hi], axis=0).copy()
    m = P.shape[0]  # n + 4
    # interior sweep: layers 1 .. m-3 in order (covers all original layers)
    for num in range(1, m - 2):
        row = P[num]
        todo = row == 2
        if not todo.any():
            continue
        for off in (1, 2, -1, -2):
            adj = num + off
            if 0 <= adj < m:
                fill = todo & (P[adj] != 2)
                row[fill] = P[adj][fill]
                todo &= ~fill
                if not todo.any():
                    break
    # edge sweep (padded layers 0 and m-1) only mutates padding — skip.
    return P[2 : 2 + n]


def binarize(values: np.ndarray) -> np.ndarray:
    """Map to {0,1}: 1 stays 1, everything else (0, 2, -1) -> 0."""
    return (np.asarray(values) == 1).astype(np.int8)
