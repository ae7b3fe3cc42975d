"""Equivalence + timing for the in-kernel out_cell_res change (r8).

A: old shape — filled_water without cell, then hex_cell_udf withColumn
   (a second ArrowEvalPython over the whole water table).
B: new shape — out_cell_res attaches cell inside the fill kernel.

Values must be bit-identical (exceptAll both directions, schema-equal
after column reorder); timing is interleaved noop of the zonal-joined
water table (the stage the change affects).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    import tempfile

    from pyspark.sql import functions as F

    from irivermetrics_spark import synth
    from irivermetrics_spark.operators import fillop, zonal
    from irivermetrics_spark.plans import pipeline
    from irivermetrics_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("exp_kcell", master=f"local[{cpus}]",
                      shuffle_partitions=max(8, int(cpus)))

    fx = synth.make_fixture(w=326, h=111, n_dates=63, n_sections=7, n_scenes=32, seed=42)
    grid = dict(gx0=fx.gx0, gy0=fx.gy0, ps=fx.pixel_size, w=fx.w, h=fx.h)
    images = pipeline.images_df(spark, fx.images).repartition(int(cpus)).persist()
    images.count()

    # one full run to get the pipeline's own points_kept inputs
    res = pipeline.run(spark, images, fx.reaches, grid,
                       mask_path=tempfile.mkdtemp(prefix="kcell_mask_"))
    # rebuild the fill inputs exactly as pipeline.run does
    points = res["mask_points"]
    kept = res["kept"]
    from pyspark.sql import Window
    kept_idx = kept.select(
        "scene", "date",
        F.date_format("date", "yyyy-MM-dd").alias("ds"),
        (F.row_number().over(Window.partitionBy("scene").orderBy("date")) - 1).alias("t_idx"),
        F.count("*").over(Window.partitionBy("scene")).alias("n_t"),
    )
    kept_cols = F.broadcast(kept_idx.select("scene", "date", "t_idx", "n_t"))
    points_kept = points.join(kept_cols, ["scene", "date"])

    water_a = fillop.filled_water(points_kept, kept_idx, fx.reaches, grid) \
        .withColumn("cell", fillop.hex_cell_udf(9, grid)("px", "py"))
    water_b = fillop.filled_water(points_kept, kept_idx, fx.reaches, grid,
                                  out_cell_res=9)

    assert water_a.schema == water_b.schema, (water_a.schema, water_b.schema)
    d1 = water_a.exceptAll(water_b).count()
    d2 = water_b.exceptAll(water_a).count()
    n = water_b.count()
    print(f"rows={n} exceptAll a-b={d1} b-a={d2}", flush=True)
    assert d1 == 0 and d2 == 0

    # timing: noop the zonal-joined table (what the metrics job runs)
    cover = zonal.cover_df(spark, fx.reaches, 9)
    ja = zonal.zonal_join(water_a, cover, fx.reaches, grid)
    jb = zonal.zonal_join(water_b, cover, fx.reaches, grid)
    for rep in range(4):
        t0 = time.perf_counter(); noop(ja); ta = time.perf_counter() - t0
        t0 = time.perf_counter(); noop(jb); tb = time.perf_counter() - t0
        print(f"rep{rep} old={ta:.3f} new={tb:.3f}", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
