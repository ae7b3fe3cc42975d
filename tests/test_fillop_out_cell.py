"""filled_water(out_cell_res=...) parity: the in-kernel cell key must be
bit-identical to the old separate hex_cell_udf stage (r8 — removes an
ArrowEvalPython round-trip of the whole water table from the flagship
metrics job)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from irivermetrics_spark import synth
from irivermetrics_spark.operators import fillop
from irivermetrics_spark.plans import pipeline


@pytest.fixture(scope="module")
def fill_inputs(spark):
    fx = synth.make_fixture(w=80, h=40, n_dates=12, n_sections=3, seed=42)
    grid = dict(gx0=fx.gx0, gy0=fx.gy0, ps=fx.pixel_size, w=fx.w, h=fx.h)
    res = pipeline.run(spark, pipeline.images_df(spark, fx.images), fx.reaches, grid)
    kept = res["kept"]
    kept_idx = kept.select(
        "scene", "date",
        F.date_format("date", "yyyy-MM-dd").alias("ds"),
        (F.row_number().over(Window.partitionBy("scene").orderBy("date")) - 1).alias("t_idx"),
        F.count("*").over(Window.partitionBy("scene")).alias("n_t"),
    )
    points_kept = res["mask_points"].join(
        F.broadcast(kept_idx.select("scene", "date", "t_idx", "n_t")), ["scene", "date"])
    return fx, grid, points_kept, kept_idx


def test_out_cell_res_matches_udf_stage(fill_inputs):
    fx, grid, points_kept, kept_idx = fill_inputs
    old = fillop.filled_water(points_kept, kept_idx, fx.reaches, grid) \
        .withColumn("cell", fillop.hex_cell_udf(9, grid)("px", "py"))
    new = fillop.filled_water(points_kept, kept_idx, fx.reaches, grid, out_cell_res=9)
    assert old.schema == new.schema
    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0
    assert new.count() > 0


def test_default_output_has_no_cell(fill_inputs):
    fx, grid, points_kept, kept_idx = fill_inputs
    out = fillop.filled_water(points_kept, kept_idx, fx.reaches, grid)
    assert out.columns == ["scene", "ds", "px", "py"]
