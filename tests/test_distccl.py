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
