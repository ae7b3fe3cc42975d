"""Raster -> vector polygonization (M8): pool masks to boundary rings.

Reproduces the semantics of rasterio.features.shapes(connectivity=8)
as used by the reference's polygon export
(src/utils/calc_metrics.py:1063-1117): each 8-connected pool becomes
one polygon whose geometry is the union of its pixel squares; holes
are preserved; the polygon area therefore equals
pixel_count * pixel_size^2 exactly.

Algorithm (from scratch): collect directed boundary unit-edges (water
on one side, background on the other) oriented clockwise in image
coordinates (interior on the right); chain edges into closed loops,
resolving corner-pinch ambiguities by the LEFT-most turn so
diagonal-touching squares merge into a single ring (8-connectivity);
collinear points are collapsed. Rings with positive signed area (in
y-down pixel coords, CW) are exteriors; the rest are holes, assigned
to the enclosing exterior by containment.
"""

from __future__ import annotations

import numpy as np

# direction encodings: R, D, L, U in (dx, dy), y grows downward
_DIRS = {(1, 0): 0, (0, 1): 1, (-1, 0): 2, (0, -1): 3}


def boundary_rings(mask: np.ndarray) -> list[np.ndarray]:
    """All closed boundary loops of nonzero regions, as (N, 2) arrays of
    (x, y) pixel-corner coordinates (first point not repeated)."""
    m = np.asarray(mask) != 0
    h, w = m.shape
    pad = np.zeros((h + 2, w + 2), dtype=bool)
    pad[1:-1, 1:-1] = m
    edges: dict[tuple[int, int], list[tuple[int, int]]] = {}

    def add(p, q):
        edges.setdefault(p, []).append(q)

    ys, xs = np.nonzero(m)
    for y, x in zip(ys.tolist(), xs.tolist()):
        if not pad[y, x + 1]:      # nothing above -> top edge, rightward
            add((x, y), (x + 1, y))
        if not pad[y + 2, x + 1]:  # nothing below -> bottom edge, leftward
            add((x + 1, y + 1), (x, y + 1))
        if not pad[y + 1, x]:      # nothing left -> left edge, upward
            add((x, y + 1), (x, y))
        if not pad[y + 1, x + 2]:  # nothing right -> right edge, downward
            add((x + 1, y), (x + 1, y + 1))

    rings = []
    while edges:
        start = next(iter(edges))
        loop = [start]
        prev_dir = None
        cur = start
        while True:
            outs = edges[cur]
            if len(outs) == 1 or prev_dir is None:
                nxt = outs.pop(0)
            else:
                # pinch corner: prefer the LEFT-most turn relative to the
                # incoming direction so corner-touching squares merge (8-conn)
                def turn(q):
                    d = (q[0] - cur[0], q[1] - cur[1])
                    return ((_DIRS[d] - prev_dir) + 4) % 4
                # max turn crosses into the diagonal square -> rings merge
                outs.sort(key=turn, reverse=True)
                nxt = outs.pop(0)
            if not edges[cur]:
                del edges[cur]
            prev_dir = _DIRS[(nxt[0] - cur[0], nxt[1] - cur[1])]
            if nxt == start:
                break
            loop.append(nxt)
            cur = nxt
        arr = np.asarray(loop, dtype=np.float64)
        rings.append(_collapse_collinear(arr))
    return rings


def _collapse_collinear(ring: np.ndarray) -> np.ndarray:
    n = ring.shape[0]
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        a = ring[(i - 1) % n]
        b = ring[i]
        c = ring[(i + 1) % n]
        if (b[0] - a[0]) * (c[1] - b[1]) == (b[1] - a[1]) * (c[0] - b[0]):
            keep[i] = False
    return ring[keep]


def signed_area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def polygons_from_mask(mask: np.ndarray) -> list[dict]:
    """[{exterior: (N,2) corner coords, holes: [rings], n_pixels}] per
    8-connected region (pixel-corner coordinate frame, x right y down)."""
    rings = boundary_rings(mask)
    if not rings:
        return []
    # y-down CW exteriors have positive signed area in (x, y-down)
    exteriors = [r for r in rings if signed_area(r) > 0]
    holes = [r for r in rings if signed_area(r) <= 0]
    out = []
    for ext in exteriors:
        out.append(dict(exterior=ext, holes=[], area_px=signed_area(ext)))
    for hole in holes:
        # assign hole to the smallest enclosing exterior
        hx, hy = hole[0]
        best = None
        for rec in out:
            e = rec["exterior"]
            if (e[:, 0].min() <= hx <= e[:, 0].max()) and (e[:, 1].min() <= hy <= e[:, 1].max()):
                if _point_in_ring(hx + 0.25, hy + 0.25, e):
                    if best is None or rec["area_px"] < best["area_px"]:
                        best = rec
        if best is not None:
            best["holes"].append(hole)
    for rec in out:
        rec["n_pixels"] = rec["area_px"] + sum(signed_area(h) for h in rec["holes"])
    return out


def _point_in_ring(px: float, py: float, ring: np.ndarray) -> bool:
    x, y = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    cond = (y > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x + (py - y) * (x2 - x) / (y2 - y)
    return bool(np.logical_xor.reduce(cond & (px < xint)))
