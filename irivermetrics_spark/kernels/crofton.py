"""Crofton perimeter (4 directions), after skimage perimeter_crofton.

Reproduces the semantics the reference gets from
skimage.measure.regionprops_table(properties=('perimeter_crofton',))
(src/utils/calc_metrics.py:1001): the Crofton formula estimates
perimeter from intercept counts with test lines in 4 directions,
computed from a histogram of 2x2 neighborhood configurations.
"""

from __future__ import annotations

import numpy as np

_SQRT2 = np.sqrt(2.0)
# weights for the 16 possible 2x2 configurations, 4-direction Crofton
_COEFS4 = np.array(
    [
        0.0,
        np.pi / 4.0 * (1.0 + 1.0 / _SQRT2),
        np.pi / (4.0 * _SQRT2),
        np.pi / (2.0 * _SQRT2),
        0.0,
        np.pi / 4.0 * (1.0 + 1.0 / _SQRT2),
        0.0,
        np.pi / (4.0 * _SQRT2),
        np.pi / 4.0,
        np.pi / 2.0,
        np.pi / (4.0 * _SQRT2),
        np.pi / (4.0 * _SQRT2),
        np.pi / 4.0,
        np.pi / 2.0,
        0.0,
        0.0,
    ]
)


def perimeter_crofton(binary: np.ndarray) -> float:
    """Crofton perimeter of the nonzero region(s) of a binary image."""
    img = np.pad((np.asarray(binary) != 0).astype(np.uint8), 1, mode="constant")
    # 2x2 configuration code at each position: [[1,4],[2,8]] weighting
    # (equivalent to skimage's correlate with [[0,0,0],[0,1,4],[0,2,8]])
    a = img[:-1, :-1].astype(np.intp)
    b = img[:-1, 1:].astype(np.intp)
    c = img[1:, :-1].astype(np.intp)
    d = img[1:, 1:].astype(np.intp)
    code = a + 4 * b + 2 * c + 8 * d
    h = np.bincount(code.ravel(), minlength=16)
    return float(_COEFS4 @ h)
