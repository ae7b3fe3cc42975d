"""Distributed cross-tile CCL vs single-image union-find oracle."""

import numpy as np
import pandas as pd

from irivermetrics_spark.kernels import ccl
from irivermetrics_spark.operators import distccl


def test_distributed_ccl_matches_local(spark):
    rng = np.random.default_rng(11)
    # a mask wide enough to span many 16px tiles, with snaking blobs
    h, w = 60, 200
    img = (rng.uniform(size=(h, w)) > 0.55).astype(np.int8)
    img[30, :] = 1  # a component crossing every tile column
    ys, xs = np.nonzero(img)
    pdf = pd.DataFrame(dict(scene="s", ds="d", px=xs.astype("int32"), py=ys.astype("int32")))
    pts = spark.createDataFrame(pdf)

    got = distccl.label_components(pts, tile=16).toPandas()
    assert len(got) == len(pdf)

    truth, _ = ccl.label8(img)
    truth_of = {(x, y): truth[y, x] for x, y in zip(xs, ys)}
    # same partition of pixels into components (label values may differ)
    grp_got = {}
    for rec in got.itertuples(index=False):
        grp_got.setdefault(rec.component, set()).add((rec.px, rec.py))
    grp_truth = {}
    for (x, y), lab in truth_of.items():
        grp_truth.setdefault(lab, set()).add((x, y))
    assert sorted(map(sorted, grp_got.values())) == sorted(map(sorted, grp_truth.values()))


def _partition_of(df_pdf, col="component"):
    grp = {}
    for rec in df_pdf.itertuples(index=False):
        grp.setdefault(getattr(rec, col), set()).add((rec.px, rec.py))
    return sorted(map(sorted, grp.values()))


def test_distccl_negative_coordinates(spark):
    """floor-division tiling: components straddling the origin (px or py
    in (-tile, tile)) must not be split or merged (r1 ADVICE bug: cast
    truncation collapsed (-T, T) into tile 0)."""
    rng = np.random.default_rng(3)
    h, w = 48, 96
    img = (rng.uniform(size=(h, w)) > 0.6).astype(np.int8)
    img[20, :] = 1
    ys, xs = np.nonzero(img)
    # shift so the grid straddles the origin in both axes
    sx, sy = xs.astype("int32") - 40, ys.astype("int32") - 24
    pdf = pd.DataFrame(dict(scene="s", ds="d", px=sx, py=sy))
    got = distccl.label_components(spark.createDataFrame(pdf), tile=16).toPandas()
    truth, _ = ccl.label8(img)
    tr = pd.DataFrame(dict(px=sx, py=sy, component=truth[ys, xs]))
    assert _partition_of(got) == _partition_of(tr)


def test_distccl_iterative_fallback_matches(spark):
    """edge_limit=0 forces the distributed min-label propagation; the
    partition must equal both the driver union-find and the oracle."""
    rng = np.random.default_rng(7)
    h, w = 40, 120
    img = (rng.uniform(size=(h, w)) > 0.55).astype(np.int8)
    img[15, :] = 1  # giant component crossing every tile column
    ys, xs = np.nonzero(img)
    pdf = pd.DataFrame(dict(scene="s", ds="d", px=xs.astype("int32"), py=ys.astype("int32")))
    pts = spark.createDataFrame(pdf)
    got_iter = distccl.label_components(pts, tile=8, edge_limit=0).toPandas()
    got_driver = distccl.label_components(pts, tile=8).toPandas()
    truth, _ = ccl.label8(img)
    tr = pd.DataFrame(dict(px=xs, py=ys, component=truth[ys, xs]))
    assert _partition_of(got_iter) == _partition_of(tr)
    assert _partition_of(got_iter) == _partition_of(got_driver)


def test_pack_label_disjoint():
    """Distinct (tx, ty) pairs can never share a packed range (the r1
    multiplicative tile id collided once ty >= 1_000_003)."""
    txs, tys = np.meshgrid(np.array([-1_000_003, -1, 0, 1, 1_000_003, 2_000_006]),
                           np.array([-2_000_006, -1_000_003, 0, 1_000_003]))
    packed = distccl.pack_label(txs.ravel(), tys.ravel(), np.zeros(txs.size), tile=256)
    assert len(set(packed.tolist())) == txs.size

