"""Connected-component labeling (8-connectivity) + small-object removal.

Reproduces the semantics of scipy.ndimage.label(structure=ones(3,3))
followed by skimage remove_small_objects(min_size) as used by the
reference (src/utils/calc_metrics.py:669-674): labels are assigned in
row-major scan order of each component's first pixel, and components
with pixel count < min_size (strictly) are removed. Labels keep their
original numbers after removal (gaps allowed), exactly like the
reference — the positional re-labeling happens later in the
area/perimeter step.

Implementation: two-pass union-find with vectorized row scanning. This
runs per (section, time) group inside applyInPandas on arrays a few
hundred pixels across — the per-group grain the reference itself uses.
"""

from __future__ import annotations

import numpy as np


def label8(img: np.ndarray) -> tuple[np.ndarray, int]:
    """Label 8-connected nonzero regions; returns (labels int32, n)."""
    img = np.asarray(img) != 0
    h, w = img.shape
    labels = np.zeros((h, w), dtype=np.int32)
    parent = [0]  # union-find; parent[0] unused

    def find(a: int) -> int:
        root = a
        while parent[root] != root:
            root = parent[root]
        while parent[a] != root:
            parent[a], a = root, parent[a]
        return root

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb

    next_label = 1
    for y in range(h):
        row = img[y]
        xs = np.nonzero(row)[0]
        for x in xs:
            # neighbors already scanned: W, NW, N, NE
            cand = []
            if x > 0 and labels[y, x - 1]:
                cand.append(labels[y, x - 1])
            if y > 0:
                if x > 0 and labels[y - 1, x - 1]:
                    cand.append(labels[y - 1, x - 1])
                if labels[y - 1, x]:
                    cand.append(labels[y - 1, x])
                if x + 1 < w and labels[y - 1, x + 1]:
                    cand.append(labels[y - 1, x + 1])
            if not cand:
                labels[y, x] = next_label
                parent.append(next_label)
                next_label += 1
            else:
                m = min(find(c) for c in cand)
                labels[y, x] = m
                for c in cand:
                    union(m, c)

    if next_label == 1:
        return labels, 0
    # resolve + renumber roots in scan order of first appearance
    roots = np.asarray([find(i) for i in range(next_label)], dtype=np.int32)
    flat = labels.ravel()
    nz = flat != 0
    resolved = roots[flat[nz]]
    # order roots by first appearance in scan order
    first_seen = {}
    order = []
    for r in resolved:
        if r not in first_seen:
            first_seen[r] = len(order) + 1
            order.append(r)
    remap = np.zeros(next_label, dtype=np.int32)
    for r, newl in first_seen.items():
        remap[r] = newl
    flat[nz] = remap[resolved]
    return labels, len(order)


def remove_small(labels: np.ndarray, min_size: int) -> np.ndarray:
    """Zero out components with size < min_size; keep original numbers.

    Matches skimage.morphology.remove_small_objects on a labeled array
    (strict <, reference default min_pool_size=2 kills only 1-px pools;
    quirk ledger SURVEY.md §7.3.7).
    """
    if labels.max() == 0:
        return labels
    counts = np.bincount(labels.ravel())
    kill = counts < min_size
    kill[0] = False
    out = labels.copy()
    out[kill[labels]] = 0
    return out


def label_sizes(labels: np.ndarray) -> dict[int, int]:
    counts = np.bincount(labels.ravel())
    return {i: int(c) for i, c in enumerate(counts) if i > 0 and c > 0}
