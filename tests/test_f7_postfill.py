"""F7: the post-fill >= 95 % validity gate (src/utils/calc_metrics.py:592-611).

On the engine's own fill output the gate is vacuous by construction
(binarize maps every non-water value to 0, as in the reference), so the
tests exercise it on NON-binarized input where it can actually fire.
"""

import pandas as pd
from pyspark.sql import functions as F

from irivermetrics_spark.kernels import fill as fillk
from irivermetrics_spark.operators import fillop


def test_f7_fires_on_unfillable_dates(spark):
    rows = []
    # date A: 100 points, 10 still-invalid -> ratio 0.90 < 0.95: dropped
    rows += [("s", "2020-01-01", -1 if i < 10 else 1) for i in range(100)]
    # date B: 100 points, 2 invalid -> ratio 0.98: kept
    rows += [("s", "2020-01-02", -1 if i < 2 else 0) for i in range(100)]
    pts = spark.createDataFrame(pd.DataFrame(rows, columns=["scene", "ds", "value"]))
    kept = fillop.drop_low_postfill(pts).toPandas()
    assert list(kept.ds) == ["2020-01-02"]
    assert abs(kept.postfill_ratio.iloc[0] - 0.98) < 1e-9


def test_f7_vacuous_on_binarized_fill_output():
    """binarize() leaves no -1 values, so no date can fail — the
    reference quirk the engine reproduces by construction."""
    import numpy as np

    mat = np.array([[1, 2, 0], [2, 2, 2], [0, 1, 2]], dtype=np.int8)
    out = fillk.binarize(fillk.fill_series(mat))
    assert set(np.unique(out)).issubset({0, 1})


def test_f7_keeps_every_date_at_threshold_boundary(spark):
    # exactly 95% valid -> kept (>= threshold)
    rows = [("s", "2020-01-01", -1 if i < 5 else 1) for i in range(100)]
    pts = spark.createDataFrame(pd.DataFrame(rows, columns=["scene", "ds", "value"]))
    kept = fillop.drop_low_postfill(pts).toPandas()
    assert len(kept) == 1
