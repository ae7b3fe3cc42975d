"""Clustering water rule (r3 VERDICT missing #2): deterministic k-means
analog of the reference's DWImageClustering — parameter defaults,
Calinski-Harabasz order selection, regularization merge, maxndwi
water-cluster pick — including a scene where the threshold rule and the
clustering rule genuinely disagree."""

import numpy as np

from irivermetrics_spark.kernels import water


def _scene(blocks, h=12, w=18):
    """Build a (4, h, w) uint16 scene from column-striped blocks of
    (green_refl, nir_refl) tuples (blue/red are constants)."""
    arr = np.zeros((4, h, w), dtype=np.uint16)
    arr[0] = 800   # Blue
    arr[2] = 900   # Red
    n = len(blocks)
    for i, (g, nir) in enumerate(blocks):
        sl = slice(i * w // n, (i + 1) * w // n)
        arr[1, :, sl] = int(round(g * 10000))
        arr[3, :, sl] = int(round(nir * 10000))
    return arr


def test_turbid_water_threshold_vs_cluster_disagree():
    """Turbid water (NDWI slightly below 0) is DRY under the threshold
    rule but is the maxndwi cluster under the clustering rule — the
    exact semantic gap the reference's clustering closes on turbid or
    shadowed scenes."""
    # land: ndwi = (0.10-0.30)/0.40 = -0.5; turbid: (0.19-0.21)/0.40 = -0.05
    arr = _scene([(0.10, 0.30), (0.19, 0.21)])
    thr = water.water_mask(arr)
    clu = water.water_mask_cluster(arr)
    assert thr.max() == 0  # threshold: nothing is water
    assert np.array_equal(clu[:, 9:], np.ones((12, 9), dtype=np.int8))
    assert np.array_equal(clu[:, :9], np.zeros((12, 9), dtype=np.int8))


def test_three_clusters_maxndwi_selects_clear_water():
    # land -0.5, turbid -0.05, clear water (0.35-0.15)/0.50 = +0.4
    arr = _scene([(0.10, 0.30), (0.19, 0.21), (0.35, 0.15)], w=18)
    clu = water.water_mask_cluster(arr)
    assert clu[:, 12:].min() == 1    # clear water cluster only
    assert clu[:, :12].max() == 0    # land + turbid stay dry
    # deterministic: identical output on repeat
    assert np.array_equal(clu, water.water_mask_cluster(arr))


def test_regularization_merges_near_identical_clusters():
    """Two spectrally-near water clusters (centroid distance < reg)
    merge, so BOTH mark water; with reg=0 only the max-NDWI one does."""
    # water A ndwi 0.40, water B ndwi 0.44 (distance ~0.04 < 0.07), land -0.5
    a = (0.35, 0.15)                  # ndwi 0.40, nir 0.15
    b = (0.36, 0.14)                  # ndwi 0.44, nir 0.14
    arr = _scene([(0.10, 0.30), a, b], w=18)
    merged = water.water_mask_cluster(arr, max_cluster=3, reg=0.07)
    assert merged[:, 6:].min() == 1 and merged[:, :6].max() == 0
    unmerged = water.water_mask_cluster(arr, max_cluster=3, reg=0.0)
    assert unmerged[:, 12:].min() == 1       # only B (maxndwi)
    assert unmerged[:, 6:12].max() == 0      # A dry without the merge


def test_invalid_and_degenerate():
    arr = _scene([(0.10, 0.30), (0.35, 0.15)])
    arr[3, :, 0] = 0  # Nir == 0 -> invalid
    clu = water.water_mask_cluster(arr)
    assert (clu[:, 0] == -1).all()
    # all-identical scene falls back to the threshold rule
    flat = _scene([(0.35, 0.15)])
    assert np.array_equal(water.water_mask_cluster(flat), water.water_mask(flat))
    # all-invalid scene
    nil = _scene([(0.1, 0.3)])
    nil[3] = 0
    assert (water.water_mask_cluster(nil) == -1).all()


def test_five_band_features_used():
    """>= 5 bands switch to ['mndwi','ndwi','Mir2'] features and the
    Mir2==0 invalid rule (reference band tables)."""
    arr = np.zeros((5, 8, 12), dtype=np.uint16)
    arr[0], arr[2] = 800, 900
    # land: green .10 mir2 .30 (mndwi -0.5); water: green .30 mir2 .05 (+0.714)
    arr[1, :, :6], arr[4, :, :6], arr[3, :, :6] = 1000, 3000, 3000
    arr[1, :, 6:], arr[4, :, 6:], arr[3, :, 6:] = 3000, 500, 1500
    clu = water.water_mask_cluster(arr)
    assert clu[:, 6:].min() == 1 and clu[:, :6].max() == 0
    arr[4, 0, :] = 0
    assert (water.water_mask_cluster(arr)[0] == -1).all()


def test_decode_path_matches_kernel(spark):
    """decode_points(water_rule='cluster') emits exactly the pixels the
    kernel marks on the same decoded array (integration parity)."""
    from irivermetrics_spark import codecs
    from irivermetrics_spark.operators import decode
    import pandas as pd

    arr = _scene([(0.10, 0.30), (0.19, 0.21)])
    grid = dict(gx0=0.0, gy0=12.0 * 30, ps=30.0, w=18, h=12)
    images = spark.createDataFrame(pd.DataFrame(dict(
        image_id=["sc1_2020-01-01"], bytes=[codecs.encode_image(arr)],
        w=[18], h=[12], fmt=["raw16"], caption=[""], phash=[0],
    )))
    pts = decode.decode_points(images, grid, water_rule="cluster").toPandas()
    pts = pts[pts["value"] != decode.SUMMARY_MARKER]
    expect = water.water_mask_cluster(arr)
    ys, xs = np.nonzero(expect != 0)
    got = set(zip(pts["px"].astype(int), pts["py"].astype(int)))
    assert got == set(zip(xs.tolist(), ys.tolist()))
    vals = {(int(r.px), int(r.py)): int(r.value) for r in pts.itertuples()}
    for x, y in got:
        assert vals[(x, y)] == int(expect[y, x])
