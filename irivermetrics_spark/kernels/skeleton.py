"""Zhang-Suen binary thinning (skeletonization), vectorized numpy.

Reproduces the reference's skeletonization semantics
(src/utils/calc_metrics.py:676-680: skimage.morphology.skeletonize,
whose 2-D default is Zhang's algorithm) on nonzero foreground. The
skeleton of each 8-connected component stays 8-connected, so
relabeling the skeleton in scan order aligns positionally with the
pool labels — the alignment the reference's label_df/area_df merge
relies on (quirk ledger SURVEY.md §7.3.2).
"""

from __future__ import annotations

import numpy as np


def skeletonize(img: np.ndarray) -> np.ndarray:
    """Thin nonzero foreground to a 1-px-wide skeleton (uint8 0/1)."""
    a = (np.asarray(img) != 0).astype(np.uint8)
    if a.size == 0 or a.max() == 0:
        return a
    pad = np.pad(a, 1, mode="constant")
    changed = True
    while changed:
        changed = False
        for step in (0, 1):
            p2 = pad[:-2, 1:-1]   # N
            p3 = pad[:-2, 2:]     # NE
            p4 = pad[1:-1, 2:]    # E
            p5 = pad[2:, 2:]      # SE
            p6 = pad[2:, 1:-1]    # S
            p7 = pad[2:, :-2]     # SW
            p8 = pad[1:-1, :-2]   # W
            p9 = pad[:-2, :-2]    # NW
            center = pad[1:-1, 1:-1]
            ring = [p2, p3, p4, p5, p6, p7, p8, p9]
            b = sum(r.astype(np.int8) for r in ring)
            # transitions 0->1 around the ring
            trans = np.zeros_like(b)
            for i in range(8):
                trans += ((ring[i] == 0) & (ring[(i + 1) % 8] == 1)).astype(np.int8)
            if step == 0:
                cond = (p2 * p4 * p6 == 0) & (p4 * p6 * p8 == 0)
            else:
                cond = (p2 * p4 * p8 == 0) & (p2 * p6 * p8 == 0)
            remove = (center == 1) & (b >= 2) & (b <= 6) & (trans == 1) & cond
            if remove.any():
                pad[1:-1, 1:-1][remove] = 0
                changed = True
    return pad[1:-1, 1:-1]
