"""Dump formatted physical plans of the key pipeline stages.

Run to verify the plans the engine is designed around:
- the zonal join is a BroadcastHashJoin (never a sort-merge on points)
- parquet scans show PushedFilters / pruned ReadSchema
- whole-stage codegen spans cover the relational stages
- AQE is active on the aggregate shuffles

Output goes to stdout; tools/../PLANS.md captures a reviewed snapshot.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from irivermetrics_spark import synth
    from irivermetrics_spark.operators import fillop, zonal
    from irivermetrics_spark.plans import pipeline
    from irivermetrics_spark.session import get_spark

    spark = get_spark("explain", master="local[4]", shuffle_partitions=8)
    fx = synth.make_fixture(w=80, h=40, n_dates=6, n_sections=3, seed=42)
    grid = dict(gx0=fx.gx0, gy0=fx.gy0, ps=fx.pixel_size, w=fx.w, h=fx.h)
    images = pipeline.images_df(spark, fx.images)
    res = pipeline.run(spark, images, fx.reaches, grid)

    print("=" * 30, "zonal join (water x cover)", "=" * 30)
    res["water_joined"].explain("formatted")
    print("=" * 30, "metrics fold", "=" * 30)
    res["metrics"].explain("formatted")

    # parquet pushdown check on the sf tables
    sf = "/root/testdata/sf0.01"
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") < "1996-01-01").select("l_orderkey", "l_extendedprice")
    print("=" * 30, "parquet pushdown (filter+prune)", "=" * 30)
    q.explain("formatted")
    spark.stop()


if __name__ == "__main__":
    main()
