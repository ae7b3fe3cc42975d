"""Water-detection kernel: decoded reflectance -> {1,0,-1} mask.

The reference drives the external `waterdetect` clustering package with
NDWI/MNDWI band combinations (src/utils/wd_batch.py:592-638 and
src/utils/WaterDetect.ini:62-145, water-cluster selection `maxndwi`).
This engine replaces the clustering dependency with deterministic
spectral-index thresholding — the documented engine water rule:

- rescale reflectance /10000 (reference: src/utils/wd_batch.py:651-654)
- NDWI  = (Green - NIR)   / (Green + NIR)
- MNDWI = (Green - SWIR2) / (Green + SWIR2)   (when >= 5 bands)
- water = index > threshold (default 0.0, McFeeters rule); MNDWI wins
  when available, else NDWI
- invalid pixels (NIR == 0 for 4-band, SWIR2 == 0 for 5-band;
  reference: src/utils/wd_batch.py:610-618) -> -1 (nodata), matching
  the reference's write_nodata(-1).

Band order contract (reference: src/utils/wd_batch.py:316-327):
[Blue, Green, Red, Nir (, Mir2)].
"""

from __future__ import annotations

import numpy as np

NDWI_THRESHOLD = 0.0


def water_mask(arr: np.ndarray, threshold: float = NDWI_THRESHOLD) -> np.ndarray:
    """(nbands, h, w) uint16 reflectance -> int8 mask {1,0,-1}.

    Only the bands the index uses are converted to float64 (the
    all-band ``arr.astype(float64)`` form converted 4-7 planes to use
    2 — same per-element ops on the used bands, bit-identical)."""
    nbands = arr.shape[0]
    green = arr[1].astype(np.float64) / 10000.0
    if nbands >= 5:
        swir2 = arr[4].astype(np.float64) / 10000.0
        invalid = arr[4] == 0
        num, den = green - swir2, green + swir2
    else:
        nir = arr[3].astype(np.float64) / 10000.0
        invalid = arr[3] == 0
        num, den = green - nir, green + nir
    with np.errstate(divide="ignore", invalid="ignore"):
        index = np.where(den != 0.0, num / den, 0.0)
    out = (index > threshold).astype(np.int8)
    out[invalid] = -1
    return out


def _indices(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(features (h*w, d) float64, ndwi flat, invalid flat bool) per the
    reference's band-key tables (change_ini, src/utils/wd_batch.py:
    487-498): 4-band -> ['ndwi', 'Nir']; >= 5-band ->
    ['mndwi', 'ndwi', 'Mir2']."""
    nbands = arr.shape[0]
    ref = arr.astype(np.float64) / 10000.0
    green, nir = ref[1], ref[3]
    with np.errstate(divide="ignore", invalid="ignore"):
        ndwi = np.where(green + nir != 0.0, (green - nir) / (green + nir), 0.0)
    if nbands >= 5:
        mir2 = ref[4]
        with np.errstate(divide="ignore", invalid="ignore"):
            mndwi = np.where(green + mir2 != 0.0, (green - mir2) / (green + mir2), 0.0)
        feats = np.stack([mndwi.ravel(), ndwi.ravel(), mir2.ravel()], axis=1)
        invalid = (arr[4] == 0).ravel()
    else:
        feats = np.stack([ndwi.ravel(), nir.ravel()], axis=1)
        invalid = (arr[3] == 0).ravel()
    return feats, ndwi.ravel(), invalid


def _kmeans(x: np.ndarray, k: int, n_iter: int = 25) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic Lloyd k-means: maximin (farthest-first) init seeded
    at the max-NDWI-axis point, lowest-index tie-breaks — same input,
    same clusters, every run (no RNG; the reference's sklearn path is
    seeded too, WaterDetect trains on a fixed subsample)."""
    centers = np.empty((k, x.shape[1]))
    centers[0] = x[int(np.argmax(x[:, 0]))]
    d2 = ((x - centers[0]) ** 2).sum(axis=1)
    for j in range(1, k):
        centers[j] = x[int(np.argmax(d2))]
        d2 = np.minimum(d2, ((x - centers[j]) ** 2).sum(axis=1))
    lbl = np.zeros(x.shape[0], dtype=np.int32)
    for _ in range(n_iter):
        dist = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        new = dist.argmin(axis=1).astype(np.int32)
        if np.array_equal(new, lbl) and _ > 0:
            break
        lbl = new
        for j in range(k):
            m = lbl == j
            if m.any():
                centers[j] = x[m].mean(axis=0)
    return lbl, centers


def _calinski_harabasz(x: np.ndarray, lbl: np.ndarray, centers: np.ndarray) -> float:
    n, k = x.shape[0], centers.shape[0]
    if k < 2:
        return 0.0
    mean = x.mean(axis=0)
    counts = np.bincount(lbl, minlength=k).astype(np.float64)
    b = float((counts[:, None] * (centers - mean) ** 2).sum())
    w = float(((x - centers[lbl]) ** 2).sum())
    if w == 0.0:
        return float("inf")
    return (b / max(k - 1, 1)) / (w / max(n - k, 1))


def water_mask_cluster(arr: np.ndarray, max_cluster: int | None = None,
                       reg: float | None = None, subsample: int = 100_000,
                       n_iter: int = 25) -> np.ndarray:
    """Clustering water rule -> int8 mask {1,0,-1}: the engine's
    deterministic k-means analog of the reference's
    ``wd.DWImageClustering`` (src/utils/wd_batch.py:620-630).

    Reference-parameter parity (change_ini, src/utils/wd_batch.py:
    483-505): defaults max_cluster=6 / reg=0.07 for 4-band inputs,
    max_cluster=3 / reg=0.08 for >= 5 bands; model order chosen by the
    Calinski-Harabasz score over k = 2..max_cluster (WaterDetect's
    cluster-count selection); clusters whose centroids sit closer than
    ``reg`` merge (the regularization role: near-identical spectral
    clusters collapse); the water cluster is the merged cluster whose
    member mean NDWI is highest (``detectwatercluster = maxndwi``,
    wd_batch.py:480); invalid pixels (Nir==0 / Mir2==0,
    wd_batch.py:610-618) -> -1.

    Scale shape mirrors WaterDetect's train/generalize split: the
    k-means trains on an evenly-strided deterministic subsample
    (<= ``subsample`` pixels), then EVERY pixel classifies by nearest
    centroid — vectorized, O(npix * k).
    Degenerate scenes (< 2 distinct feature rows) fall back to the
    threshold rule, documented engine behavior.
    """
    nbands = arr.shape[0]
    if max_cluster is None:
        max_cluster = 6 if nbands == 4 else 3
    if reg is None:
        reg = 0.07 if nbands == 4 else 0.08
    h, w = arr.shape[1], arr.shape[2]
    feats, ndwi, invalid = _indices(arr)
    valid_idx = np.nonzero(~invalid)[0]
    if valid_idx.size == 0:
        return np.full((h, w), -1, dtype=np.int8)
    xv = feats[valid_idx]
    # deterministic evenly-strided training subsample
    if valid_idx.size > subsample:
        train = xv[np.linspace(0, valid_idx.size - 1, subsample).astype(np.int64)]
    else:
        train = xv
    if np.unique(train, axis=0).shape[0] < 2:
        return water_mask(arr)
    best = None
    for k in range(2, max_cluster + 1):
        if k > train.shape[0]:
            break
        lbl, centers = _kmeans(train, k, n_iter=n_iter)
        score = _calinski_harabasz(train, lbl, centers)
        if best is None or score > best[0]:
            best = (score, lbl, centers)
    _, lbl, centers = best
    k = centers.shape[0]
    # regularization: merge centroid pairs closer than reg (union-find)
    parent = list(range(k))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in range(k):
        for j in range(i + 1, k):
            if np.sqrt(((centers[i] - centers[j]) ** 2).sum()) < reg:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    merged = np.asarray([find(i) for i in range(k)], dtype=np.int32)
    # classify every valid pixel by nearest trained centroid, chunked
    # so the (npix, k, d) broadcast never exceeds ~L3-sized blocks
    assign = np.empty(xv.shape[0], dtype=np.int32)
    step = 1 << 20
    for s in range(0, xv.shape[0], step):
        blk = xv[s:s + step]
        d = ((blk[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        assign[s:s + step] = d.argmin(axis=1)
    assign = merged[assign]
    # maxndwi: the merged cluster with the highest member mean NDWI
    ndwi_v = ndwi[valid_idx]
    groups = np.unique(assign)
    means = np.asarray([ndwi_v[assign == g].mean() for g in groups])
    water_group = int(groups[int(np.argmax(means))])
    out = np.zeros(h * w, dtype=np.int8)
    out[valid_idx[assign == water_group]] = 1
    out[invalid] = -1
    return out.reshape(h, w)
