"""Equivalence + timing for the in-kernel out_cell_res change (r8).

A: old shape — filled_water without cell, then hex_cell_udf withColumn
   (a second ArrowEvalPython over the whole water table).
B: new shape — out_cell_res attaches cell inside the fill kernel.

Values must be bit-identical (exceptAll both directions, schema-equal).
Timing: interleaved noop of the zonal-joined water table with the plan
REBUILT per rep — AQE caches materialized query stages per Dataset
object, so repeated actions on the same object skip everything up to
the final stage and read absurdly fast (a first attempt on reused
objects read 0.1 s reps for a chain whose kernel alone costs ~1.8 s).
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
    res["metrics"].count()  # warm workers/codegen
    points_src = res["mask_points"]
    kept = res["kept"]
    from pyspark.sql import Window

    def build(new: bool):
        """Rebuild the fill inputs exactly as pipeline.run does — fresh
        plan objects every call so no AQE stage reuse across reps."""
        pts = points_src.filter("px >= 0")  # no-op filter -> fresh nodes
        kept_idx = kept.select(
            "scene", "date",
            F.date_format("date", "yyyy-MM-dd").alias("ds"),
            (F.row_number().over(Window.partitionBy("scene").orderBy("date")) - 1).alias("t_idx"),
            F.count("*").over(Window.partitionBy("scene")).alias("n_t"),
        )
        pk = pts.join(F.broadcast(kept_idx.select("scene", "date", "t_idx", "n_t")),
                      ["scene", "date"])
        if new:
            w = fillop.filled_water(pk, kept_idx, fx.reaches, grid, out_cell_res=9)
        else:
            w = fillop.filled_water(pk, kept_idx, fx.reaches, grid) \
                .withColumn("cell", fillop.hex_cell_udf(9, grid)("px", "py"))
        return w

    water_a, water_b = build(False), build(True)
    assert water_a.schema == water_b.schema, (water_a.schema, water_b.schema)
    d1 = water_a.exceptAll(water_b).count()
    d2 = water_b.exceptAll(water_a).count()
    n = water_b.count()
    print(f"rows={n} exceptAll a-b={d1} b-a={d2}", flush=True)
    assert d1 == 0 and d2 == 0

    # timing: noop the zonal-joined table (what the metrics job runs),
    # plan rebuilt per rep
    cover = zonal.cover_df(spark, fx.reaches, 9)
    for rep in range(5):
        t0 = time.perf_counter()
        noop(zonal.zonal_join(build(False), cover, fx.reaches, grid))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        noop(zonal.zonal_join(build(True), cover, fx.reaches, grid))
        tb = time.perf_counter() - t0
        print(f"rep{rep} old={ta:.3f} new={tb:.3f}", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
