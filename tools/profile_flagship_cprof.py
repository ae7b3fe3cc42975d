"""cProfile the driver side of one flagship rep (plan build + jobs).

py4j calls block the driver, so cumulative time against py4j frames
vs kernel frames tells us plan-construction cost vs job cost.
"""
from __future__ import annotations

import cProfile
import os
import pstats
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from irivermetrics_spark import synth
    from irivermetrics_spark.plans import pipeline
    from irivermetrics_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("prof_flag", master=f"local[{cpus}]", shuffle_partitions=max(8, int(cpus)))

    fx = synth.make_fixture(w=326, h=111, n_dates=63, n_sections=7, n_scenes=32, seed=42)
    grid = dict(gx0=fx.gx0, gy0=fx.gy0, ps=fx.pixel_size, w=fx.w, h=fx.h)
    images = pipeline.images_df(spark, fx.images).repartition(int(cpus)).persist()
    images.count()
    warm_fx = synth.make_fixture(w=326, h=111, n_dates=8, n_sections=7, n_scenes=1, seed=42)
    warm = pipeline.run(spark, pipeline.images_df(spark, warm_fx.images), warm_fx.reaches,
                        grid, mask_path=tempfile.mkdtemp(prefix="warm_"))
    warm["metrics"].count()

    def one_rep():
        res = pipeline.run(spark, images, fx.reaches, grid,
                           mask_path=tempfile.mkdtemp(prefix="prof_mask_"))
        res["metrics"].count()
        res["water_joined"].unpersist()

    t0 = time.time()
    pr = cProfile.Profile()
    pr.enable()
    one_rep()
    pr.disable()
    print(f"rep wall: {time.time() - t0:.3f} s", flush=True)
    st = pstats.Stats(pr)
    st.sort_stats("cumulative")
    st.print_stats(45)
    spark.stop()


if __name__ == "__main__":
    main()
