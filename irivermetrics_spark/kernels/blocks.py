"""Per-(section, time) clip summarizer: pools -> rows.

Reproduces the reference's summarize_block
(src/utils/calc_metrics.py:725-806) on one 2-D binary water clip:

1. CCL (8-conn) + remove_small(min_pool_size)  [M1]
2. area + Crofton perimeter per pool, labels re-assigned arange(1..k)
   by ascending-label rank (the positional-merge quirk,
   src/utils/calc_metrics.py:1015)  [A6]
3. skeletonize + relabel (scan order)  [M2]
4. per skeleton label: double-BFS longest path; length uses the
   HARD-CODED 30 m pixel size (src/utils/calc_metrics.py:866)  [M4]
5. width = mean EDT over path pixels * 2 * actual pixel_size / 1e3
   (src/utils/calc_metrics.py:944-991)  [M3+M5]
6. positional merge of length rows with area rows on label  [J3]

Zero pools -> a single label=0 row of zeros with path None
(src/utils/calc_metrics.py:750-766).

This is plain numpy on clips a few hundred px across — the exact
per-group grain the reference uses; the Spark engine calls it inside
``applyInPandas`` per (scene, section, time) group.
"""

from __future__ import annotations

import numpy as np

from . import ccl, crofton, edt, graphpath, skeleton


def summarize_clip(water: np.ndarray, min_pool_size: int, pixel_size: float) -> list[dict]:
    """water: (h, w) 0/1 array for one (section, time) bbox clip."""
    labeled = ccl.remove_small(ccl.label8(water)[0], min_pool_size)
    present = np.unique(labeled)
    present = present[present > 0]
    if present.size == 0:
        return [
            dict(
                label=0,
                length_km=0.0,
                width_km=0.0,
                area_km2=0.0,
                perimeter_km=0.0,
                centroid_py=float("nan"),
                centroid_px=float("nan"),
                path=None,
            )
        ]

    # areas + Crofton perimeters + true pixel centroids, re-labeled
    # 1..k by ascending rank
    counts = np.bincount(labeled.ravel())
    area_rows = {}
    for rank, lab in enumerate(np.sort(present), start=1):
        region = labeled == lab
        rys, rxs = np.nonzero(region)
        area_rows[rank] = (
            float(counts[lab]) * pixel_size**2 / 1e6,
            crofton.perimeter_crofton(region) * pixel_size / 1e3,
            float(rys.mean()),
            float(rxs.mean()),
        )

    # skeleton of the labeled (nonzero) image, relabeled in scan order
    skel = skeleton.skeletonize(labeled != 0)
    labeled_skel = ccl.label8(skel)[0]
    skel_labels = np.unique(labeled_skel)
    skel_labels = skel_labels[skel_labels > 0]

    dist = edt.edt(labeled != 0)

    rows = []
    for lab in skel_labels:
        ys, xs = np.nonzero(labeled_skel == lab)  # row-major scan order
        length_m, path = graphpath.longest_path(ys, xs)
        if path.shape[0] > 0:
            widths = dist[
                np.clip(path[:, 0], 0, dist.shape[0] - 1),
                np.clip(path[:, 1], 0, dist.shape[1] - 1),
            ]
            width_km = float(widths.mean()) * pixel_size * 2.0 / 1e3
        else:
            width_km = float("nan")
        area_km2, perim_km, cy, cx = area_rows.get(
            int(lab), (float("nan"), float("nan"), float("nan"), float("nan"))
        )
        rows.append(
            dict(
                label=int(lab),
                length_km=length_m / 1e3,
                width_km=width_km,
                area_km2=area_km2,
                perimeter_km=perim_km,
                centroid_py=cy,
                centroid_px=cx,
                path=path,
            )
        )
    return rows
