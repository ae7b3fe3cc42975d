"""Longest skeleton path via double BFS (tree-diameter heuristic).

Reproduces the reference's per-pool centerline computation
(src/utils/calc_metrics.py:808-942) without igraph:

- vertices: skeleton pixels of one label, in row-major scan order
  (matching the reference's np.argwhere ordering);
- edges: 8-neighbor pairs with identical label;
- start at the max-degree vertex (ties -> first, np.argmax semantics);
- BFS to the farthest vertex (ties -> smallest index, matching
  list.index(max) in the reference), BFS again from there, then the
  unweighted shortest path between the two endpoints is the
  centerline;
- path length = sum of Euclidean steps scaled by the HARD-CODED
  pixel_size=30 m (reference quirk, src/utils/calc_metrics.py:866),
  with < 2 points degenerating to 30 m (:937-938).

Pools are tens-to-hundreds of pixels, so this is plain local Python/
numpy inside the applyInPandas morphology kernel — never distributed.
"""

from __future__ import annotations

from collections import deque

import numpy as np

HARDCODED_LENGTH_PIXEL_SIZE = 30.0  # reference quirk: length always uses 30 m

_NBR = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


def longest_path(ys: np.ndarray, xs: np.ndarray) -> tuple[float, np.ndarray]:
    """(length_m, path[(y,x)...]) for the skeleton pixels of one label.

    ``ys``/``xs`` must be in row-major scan order (np.argwhere order).
    """
    n = ys.shape[0]
    if n == 0:
        return float("nan"), np.empty((0, 2), dtype=np.int64)
    idx = {(int(ys[i]), int(xs[i])): i for i in range(n)}
    adj: list[list[int]] = [[] for _ in range(n)]
    for i in range(n):
        y, x = int(ys[i]), int(xs[i])
        for dy, dx in _NBR:
            j = idx.get((y + dy, x + dx))
            if j is not None and j > i:
                adj[i].append(j)
                adj[j].append(i)

    deg = np.asarray([len(a) for a in adj])
    start = int(np.argmax(deg))
    far1 = _bfs_farthest(adj, start)
    far2 = _bfs_farthest(adj, far1)
    path = _bfs_path(adj, far1, far2)
    coords = np.stack([ys[path], xs[path]], axis=1).astype(np.int64)
    length = path_length_m(coords, HARDCODED_LENGTH_PIXEL_SIZE)
    return length, coords


def path_length_m(coords: np.ndarray, pixel_size: float) -> float:
    """Euclidean path length (diagonals sqrt(2)); <2 points -> pixel_size."""
    if coords.shape[0] < 2:
        return float(pixel_size)
    diffs = np.diff(coords.astype(np.float64), axis=0) * pixel_size
    return float(np.sum(np.sqrt((diffs * diffs).sum(axis=1))))


def _bfs_farthest(adj: list[list[int]], start: int) -> int:
    dist = _bfs_dist(adj, start)
    # unreachable stays -1 -> treated as never farthest; ties -> first index
    return int(np.argmax(dist))


def _bfs_dist(adj: list[list[int]], start: int) -> np.ndarray:
    n = len(adj)
    dist = np.full(n, -1, dtype=np.int64)
    dist[start] = 0
    dq = deque([start])
    while dq:
        u = dq.popleft()
        for v in adj[u]:
            if dist[v] < 0:
                dist[v] = dist[u] + 1
                dq.append(v)
    return dist


def _bfs_path(adj: list[list[int]], src: int, dst: int) -> list[int]:
    n = len(adj)
    prev = np.full(n, -1, dtype=np.int64)
    seen = np.zeros(n, dtype=bool)
    seen[src] = True
    dq = deque([src])
    while dq:
        u = dq.popleft()
        if u == dst:
            break
        for v in adj[u]:
            if not seen[v]:
                seen[v] = True
                prev[v] = u
                dq.append(v)
    path = [dst]
    while path[-1] != src:
        p = int(prev[path[-1]])
        if p < 0:
            break
        path.append(p)
    return path[::-1]
