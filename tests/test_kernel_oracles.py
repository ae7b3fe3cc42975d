"""Independent (non-circular) kernel oracles.

The parity suite's numpy oracle imports the engine's own kernels, so it
can't catch a kernel that diverges from the published semantics it
claims to reproduce (r1 ADVICE). The real skimage/scipy/igraph goldens
can't be generated in this sandbox (libraries absent, no network), so
these tests re-derive the semantics a SECOND way, from the published
definitions, sharing no code with the kernels:

- longest path: an independent reimplementation of the REFERENCE's
  documented algorithm (src/utils/calc_metrics.py:879-922: unweighted
  hop-BFS from the max-degree vertex, farthest tie -> lowest vertex
  index, euclidean length of the chosen path at 30 m) — on trees the
  path between the chosen endpoints is unique, so the semantics are
  fully determined; plus a brute weighted-diameter upper bound.
- Crofton perimeter: the continuous Crofton formula says the perimeter
  of a disk is pi*d; the discrete estimator must converge to it.
- EDT: brute-force min over all background pixels (also covered in
  test_kernels; here with rectangular + hollow shapes).
- CCL: flood fill (BFS) reimplemented locally.
"""

import heapq

import numpy as np
import pytest

from irivermetrics_spark.kernels import ccl, crofton, edt, graphpath

SQ2 = np.sqrt(2.0)


def _dijkstra_diameter(ys, xs):
    """Brute graph diameter of the 8-neighbor pixel graph (meters at the
    reference's hard-coded 30 m), plus the edge count for tree checks."""
    n = len(ys)
    pix = {(int(y), int(x)): i for i, (y, x) in enumerate(zip(ys, xs))}
    adj = [[] for _ in range(n)]
    n_edges = 0
    for i, (y, x) in enumerate(zip(ys, xs)):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == dx == 0:
                    continue
                j = pix.get((int(y) + dy, int(x) + dx))
                if j is not None:
                    w = 30.0 * (SQ2 if dy and dx else 1.0)
                    adj[i].append((j, w))
                    n_edges += 1
    n_edges //= 2
    best = 0.0
    for s in range(n):
        dist = [np.inf] * n
        dist[s] = 0.0
        pq = [(0.0, s)]
        while pq:
            d, u = heapq.heappop(pq)
            if d > dist[u]:
                continue
            for v, w in adj[u]:
                if d + w < dist[v]:
                    dist[v] = d + w
                    heapq.heappush(pq, (d + w, v))
        reach = [d for d in dist if np.isfinite(d)]
        best = max(best, max(reach))
    return best, n_edges


def _canonical_tree_shapes():
    L = [(0, 0), (1, 0), (2, 0), (3, 0), (3, 1), (3, 2)]
    Z = [(0, 2), (0, 3), (1, 2), (2, 1), (3, 0), (3, 1)]
    Y = [(0, 0), (1, 1), (2, 2), (0, 4), (1, 3), (3, 2), (4, 2), (5, 2)]
    stair = [(i, i) for i in range(7)]
    T = [(0, i) for i in range(5)] + [(j, 2) for j in range(1, 5)]
    return [L, Z, Y, stair, T]


def _reference_double_bfs_on_tree(ys, xs):
    """Independent reimplementation of the reference's algorithm
    (calc_metrics.py:879-922): max-degree start, hop-BFS farthest with
    lowest-index ties, unique tree path, euclidean length at 30 m."""
    n = len(ys)
    pix = {(int(y), int(x)): i for i, (y, x) in enumerate(zip(ys, xs))}
    adj = [[] for _ in range(n)]
    for i, (y, x) in enumerate(zip(ys, xs)):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == dx == 0:
                    continue
                j = pix.get((int(y) + dy, int(x) + dx))
                if j is not None:
                    adj[i].append(j)

    def hop_bfs(src):
        dist = [-1] * n
        dist[src] = 0
        q = [src]
        parent = [-1] * n
        while q:
            nq = []
            for u in q:
                for v in adj[u]:
                    if dist[v] < 0:
                        dist[v] = dist[u] + 1
                        parent[v] = u
                        nq.append(v)
            q = nq
        far = int(np.argmax(dist))  # argmax takes the lowest index on ties
        return far, parent

    start = int(np.argmax([len(a) for a in adj]))
    u, _ = hop_bfs(start)
    v, parent = hop_bfs(u)
    path = [v]
    while path[-1] != u:
        path.append(parent[path[-1]])
    pts = np.array([(ys[i], xs[i]) for i in path], dtype=np.float64)
    length = float(np.hypot(np.diff(pts[:, 0]), np.diff(pts[:, 1])).sum()) * 30.0
    return length


def test_longest_path_matches_reference_semantics_on_trees():
    rng = np.random.default_rng(17)
    cases = [set(s) for s in _canonical_tree_shapes()]
    for _ in range(300):
        # grow a random pixel blob; only tree-shaped ones are asserted
        pts = {(8, 8)}
        frontier = [(8, 8)]
        for _ in range(rng.integers(3, 12)):
            y, x = frontier[rng.integers(0, len(frontier))]
            dy, dx = rng.integers(-1, 2), rng.integers(-1, 2)
            p = (int(y + dy), int(x + dx))
            if 0 <= p[0] < 17 and 0 <= p[1] < 17:
                pts.add(p)
                frontier.append(p)
        cases.append(pts)

    checked = 0
    for pts in cases:
        arr = sorted(pts)  # row-major scan order
        if len(arr) < 2:
            continue  # degenerate single-pixel fallback (30 m quirk)
        ys = np.array([p[0] for p in arr])
        xs = np.array([p[1] for p in arr])
        brute, n_edges = _dijkstra_diameter(ys, xs)
        # only trees make the endpoint path unique (skeletons are trees)
        if n_edges != len(arr) - 1:
            continue
        got, path = graphpath.longest_path(ys, xs)
        expect = _reference_double_bfs_on_tree(ys, xs)
        assert got == pytest.approx(expect), (ys, xs)
        assert got <= brute + 1e-9  # never exceeds the true diameter
        checked += 1
    assert checked >= 15  # enough tree cases actually exercised


def test_crofton_converges_to_disk_circumference():
    """Continuous Crofton: perimeter(disk) = pi * d. The discrete
    4-direction estimator must be within 1.5 % at fine rasterization."""
    for r in (40, 80):
        n = 2 * r + 9
        yy, xx = np.mgrid[0:n, 0:n]
        disk = ((yy - n // 2) ** 2 + (xx - n // 2) ** 2 <= r * r)
        got = crofton.perimeter_crofton(disk)
        assert got == pytest.approx(2 * np.pi * r, rel=0.015)


def test_crofton_additive_and_translation_invariant():
    """True Crofton-functional properties: additivity over disjoint
    far-apart regions and translation invariance — independent of any
    coefficient table."""
    one = np.zeros((9, 9), dtype=np.uint8); one[2, 2] = 1
    shifted = np.zeros((9, 9), dtype=np.uint8); shifted[6, 5] = 1
    both = one | shifted
    p1 = crofton.perimeter_crofton(one)
    assert p1 > 0
    assert crofton.perimeter_crofton(shifted) == pytest.approx(p1)
    assert crofton.perimeter_crofton(both) == pytest.approx(2 * p1)
    # a longer region has more boundary
    two = np.zeros((3, 4), dtype=np.uint8); two[1, 1:3] = 1
    assert crofton.perimeter_crofton(two) > p1


def test_edt_hollow_rectangle_bruteforce():
    rng = np.random.default_rng(23)
    img = np.ones((14, 19), dtype=bool)
    img[0, :] = False
    img[5:8, 6:12] = False  # hole
    got = edt.edt(img)
    ys, xs = np.nonzero(~img)
    for y in range(img.shape[0]):
        for x in range(img.shape[1]):
            if not img[y, x]:
                assert got[y, x] == 0.0
                continue
            brute = np.sqrt(((ys - y) ** 2 + (xs - x) ** 2).min())
            assert got[y, x] == pytest.approx(brute), (y, x)


def test_ccl_matches_flood_fill():
    rng = np.random.default_rng(29)
    img = (rng.uniform(size=(20, 30)) > 0.6).astype(np.int8)
    labels, _ = ccl.label8(img)

    # local flood fill, shares no code with kernels.ccl
    seen = np.zeros_like(img, dtype=bool)
    comps = []
    for y in range(img.shape[0]):
        for x in range(img.shape[1]):
            if img[y, x] and not seen[y, x]:
                comp, stack = set(), [(y, x)]
                seen[y, x] = True
                while stack:
                    cy, cx = stack.pop()
                    comp.add((cy, cx))
                    for dy in (-1, 0, 1):
                        for dx in (-1, 0, 1):
                            ny, nx = cy + dy, cx + dx
                            if (0 <= ny < img.shape[0] and 0 <= nx < img.shape[1]
                                    and img[ny, nx] and not seen[ny, nx]):
                                seen[ny, nx] = True
                                stack.append((ny, nx))
                comps.append(comp)
    got = {}
    for y, x in zip(*np.nonzero(labels)):
        got.setdefault(labels[y, x], set()).add((int(y), int(x)))
    assert sorted(map(sorted, got.values())) == sorted(map(sorted, comps))
