"""Isolate flagship mask-write costs: decode Arrow transfer, scene/date
regex, parquet write, Observation overhead."""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(label, fn):
    t0 = time.time()
    out = fn()
    print(f"  {label:55s} {time.time() - t0:7.3f} s", flush=True)
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    import numpy as np
    from pyspark.sql import functions as F

    from irivermetrics_spark import synth
    from irivermetrics_spark.operators import decode
    from irivermetrics_spark.plans import pipeline
    from irivermetrics_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("prof_mw", master=f"local[{cpus}]", shuffle_partitions=max(8, int(cpus)))

    fx = synth.make_fixture(w=326, h=111, n_dates=63, n_sections=7, n_scenes=32, seed=42)
    grid = dict(gx0=fx.gx0, gy0=fx.gy0, ps=fx.pixel_size, w=fx.w, h=fx.h)
    images = pipeline.images_df(spark, fx.images).repartition(int(cpus)).persist()
    images.count()
    rings = [(np.asarray(r["ring_x"]), np.asarray(r["ring_y"])) for r in fx.reaches]

    # warm
    pts_w = decode.decode_points(images.limit(64), grid, res=9, corridor_rings=rings)
    noop(pts_w)

    pts = decode.decode_points(images, grid, res=9, corridor_rings=rings)
    print("rows:", timed("points count (full decode)", lambda: pts.count()))
    raw = images.select("image_id", "bytes").mapInPandas(
        lambda it: decode.decode_points.__wrapped__(it) if False else it, "image_id string, bytes binary")

    # decode WITHOUT with_scene_date: re-build the inner mapInPandas only
    inner = decode.decode_points(images, grid, res=9, corridor_rings=rings)
    # the version without scene/date: select only the kernel columns
    kern_only = inner.select("image_id", "px", "py", "value", "cell")
    for rep in range(2):
        timed(f"noop decode+scene_date (all cols) rep{rep}", lambda: noop(inner))
    for rep in range(2):
        timed(f"noop decode kernel cols only rep{rep}", lambda: noop(kern_only))

    for rep in range(2):
        d = tempfile.mkdtemp(prefix="mw_")
        timed(f"write parquet (all cols, snappy) rep{rep}",
              lambda: inner.write.mode("overwrite").parquet(d))
    sz = 0
    for root, _, fs in os.walk(d):
        for f_ in fs:
            sz += os.path.getsize(os.path.join(root, f_))
    print(f"  parquet bytes: {sz/1e6:.1f} MB")

    spark.conf.set("spark.sql.parquet.compression.codec", "zstd")
    d2 = tempfile.mkdtemp(prefix="mwz_")
    timed("write parquet zstd", lambda: inner.write.mode("overwrite").parquet(d2))
    spark.conf.set("spark.sql.parquet.compression.codec", "snappy")

    # with the Observation riding the write (the real bench shape)
    from pyspark.sql import Observation
    corridor_total = 99999  # shape-only probe: predicate cost, not values
    _row_kept_sql = (
        f"value = {decode.SUMMARY_MARKER} AND cell >= 0 "
        f"AND ({corridor_total} - (cell + 0)) / {corridor_total} >= 0.7D")
    obs = Observation()
    observed = inner.observe(
        obs,
        F.expr(f"collect_set(CASE WHEN {_row_kept_sql} THEN date END) AS d_kept"),
        F.expr(f"sum(CASE WHEN {_row_kept_sql} THEN 1 ELSE 0 END) AS n_kept"))
    d3 = tempfile.mkdtemp(prefix="mwo_")
    timed("write parquet + observe", lambda: observed.write.mode("overwrite").parquet(d3))

    # read-back + metrics-side: how long does the read cost?
    back = spark.read.parquet(d)
    timed("read-back noop", lambda: noop(back))
    spark.stop()


if __name__ == "__main__":
    main()
