"""Export operators (M8/M10) on the Spark pipeline vs oracle-side truth."""

import numpy as np
import pytest

from irivermetrics_spark import synth
from irivermetrics_spark.kernels import ccl, polygonize
from irivermetrics_spark.oracle import numpy_oracle
from irivermetrics_spark.plans import pipeline


@pytest.fixture(scope="module")
def fx():
    return synth.make_fixture(w=80, h=40, n_dates=12, n_sections=3, seed=42)


@pytest.fixture(scope="module")
def oracle(fx):
    return numpy_oracle.run(fx)


@pytest.fixture(scope="module")
def result(spark, fx):
    grid = dict(gx0=fx.gx0, gy0=fx.gy0, ps=fx.pixel_size, w=fx.w, h=fx.h)
    return pipeline.run(spark, pipeline.images_df(spark, fx.images), fx.reaches, grid)


def test_polygons_match_oracle(result, oracle, fx):
    got = result["polygons"].toPandas()
    ps = fx.pixel_size
    # oracle-side: polygonize each feature clip per kept date
    expected = {}
    for r in fx.reaches:
        meta = oracle["feature_meta"][r["section"]]
        rs, cs, fmask = meta["rs"], meta["cs"], meta["mask"]
        for i, d in enumerate(oracle["kept_dates"]):
            clip = np.where(fmask == 1, oracle["cube"][i, rs, cs], 0)
            labeled = ccl.remove_small(ccl.label8(clip)[0], 2)
            polys = [
                p for p in polygonize.polygons_from_mask(labeled != 0)
                if p["n_pixels"] * ps * ps >= 2 * ps * ps
            ]
            if polys:
                expected[(d, r["section"])] = sorted(round(p["n_pixels"] * ps * ps, 6) for p in polys)
    got_grouped = {}
    for rec in got.itertuples(index=False):
        got_grouped.setdefault((rec.Date, rec.Section), []).append(round(rec.area_m2, 6))
    for k in got_grouped:
        got_grouped[k] = sorted(got_grouped[k])
    assert got_grouped == expected


def test_lines_and_points_counts(result, oracle):
    lines = result["lines"].toPandas()
    points = result["points"].toPandas()
    # every pool row with >1 path point -> one line -> 3 points
    n_expected = sum(
        1 for _, row in oracle["pools"].iterrows()
        if row["path"] is not None and getattr(row["path"], "shape", (0,))[0] > 1
    )
    assert len(lines) == n_expected
    assert len(points) == 3 * n_expected
    assert set(points["Type"]) <= {"coord_start", "coord_end", "mid_point"}


def test_line_lengths_consistent(result):
    lines = result["lines"].toPandas()
    # path length recomputed from line geometry with 30 m pixels should
    # match length_km (paths are in 10m pixels; ratio = 30/pixel_size)
    import numpy as np

    for rec in lines.head(20).itertuples(index=False):
        xs = np.asarray(rec.line_x)
        ys = np.asarray(rec.line_y)
        geo_len = np.hypot(np.diff(xs), np.diff(ys)).sum()
        ratio = 30.0 / synth.PIXEL_SIZE
        assert rec.length_km == pytest.approx(geo_len * ratio / 1e3, rel=1e-9)
