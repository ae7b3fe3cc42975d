"""decode._scene_date_py must equal the JVM with_scene_date exprs
row-for-row: decode_points now computes scene/date inside the kernel
(per image) instead of joining a broadcast dim built with the JVM
regexes, so the two implementations of the C1 parse must stay pinned
to each other on every id shape the regexes distinguish — including
Spark 4's ANSI to_date behavior (malformed calendar dates THROW on
both sides rather than yielding NULL)."""

import datetime

import pandas as pd
import pytest

from irivermetrics_spark.operators import decode

VALID_IDS = [
    "scene0_2018-01-01.tif",
    "scene12_2020_11_30",
    "SCENE_A_2019-02-28",          # scene regex stops at first non-alnum
    "_leading_underscore_2018-01-01",  # scene regex needs ^[A-Za-z0-9]+_
    "99_2001_01_02_extra_2002-03-04",  # first date match wins
    "no-underscore-2018-01-01",    # no scene match -> '' scene
    "x_9999-12-31",                # extreme but valid year
    "x_1583-01-01",
    "mixed_2018-01_02",            # mixed separators still match [-_]
    "uénicode_2018-01-01",    # non-ASCII: scene regex stops before it
    "١٢٣٤_2018-01-01",  # Arabic-Indic digits: Java \d
                                   # and [0-9] both reject as date digits
    "trail_2018-01-011",           # regex takes first 10-char window
    "a_2018-01-01b_2019-02-02",
]

# Spark 4 runs ANSI mode: to_date throws CAST_INVALID_INPUT both for a
# date-shaped match that is not a real calendar date AND for the ''
# that regexp_extract yields when the id has no date at all
INVALID_DATE_IDS = [
    "s1_2019-02-29",               # non-leap Feb 29
    "s1_2019-13-01",               # month 13
    "s1_2019-00-10",               # month 0
    "s1_2019-01-00",               # day 0
    "nodate_here",                 # no date match -> to_date('') throws
]


def test_scene_date_python_matches_jvm(spark):
    df = spark.createDataFrame(pd.DataFrame({"image_id": VALID_IDS}))
    jvm = decode.with_scene_date(df).select("image_id", "scene", "date").collect()
    assert len(jvm) == len(VALID_IDS)
    for row in jvm:
        scene_py, date_py = decode._scene_date_py(row["image_id"])
        assert scene_py == row["scene"], row["image_id"]
        assert date_py == row["date"], row["image_id"]


def test_scene_date_invalid_dates_raise_on_both_sides(spark):
    for bad in INVALID_DATE_IDS:
        with pytest.raises(ValueError):
            decode._scene_date_py(bad)
        df = spark.createDataFrame(pd.DataFrame({"image_id": [bad]}))
        with pytest.raises(Exception):  # Py4J SparkDateTimeException
            decode.with_scene_date(df).collect()


def test_scene_date_null_id():
    assert decode._scene_date_py(None) == (None, None)


def test_decode_points_emits_same_frame_as_dim_join(spark):
    """End-to-end: the kernel-emitted scene/date equals applying
    with_scene_date to the old undated point stream (column order,
    dtypes, values)."""
    import numpy as np

    from irivermetrics_spark import synth
    from irivermetrics_spark.plans import pipeline

    fx = synth.make_fixture(w=40, h=20, n_dates=3, n_sections=2, seed=11)
    grid = dict(gx0=fx.gx0, gy0=fx.gy0, ps=fx.pixel_size, w=fx.w, h=fx.h)
    images = pipeline.images_df(spark, fx.images)
    rings = [(np.asarray(r["ring_x"]), np.asarray(r["ring_y"])) for r in fx.reaches]
    pts = decode.decode_points(images, grid, res=9, corridor_rings=rings)
    assert pts.columns == ["image_id", "px", "py", "value", "cell", "date", "scene"]
    got = pts.orderBy("image_id", "px", "py").collect()
    assert len(got) > 0
    for r in got:
        scene, date = decode._scene_date_py(r["image_id"])
        assert r["scene"] == scene
        assert r["date"] == date
        assert isinstance(r["date"], datetime.date)
