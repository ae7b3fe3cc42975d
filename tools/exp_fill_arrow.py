"""Experiment (r8): fill kernel via applyInArrow vs applyInPandas.

Same group keys, same fill math (shared _cell_universe + kernels.fill);
only the group-boundary serialization differs. Checks value equality
(exceptAll both ways) then times the full filled_water noop interleaved.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    import numpy as np
    import pyarrow as pa
    from pyspark.sql import functions as F

    from irivermetrics_spark import synth
    from irivermetrics_spark.kernels import fill as fillk
    from irivermetrics_spark.operators import decode, fillop
    from irivermetrics_spark.plans import pipeline
    from irivermetrics_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("exp_fill_arrow", master=f"local[{cpus}]",
                      shuffle_partitions=max(8, int(cpus)))

    fx = synth.make_fixture(w=326, h=111, n_dates=63, n_sections=7, n_scenes=32, seed=42)
    grid = dict(gx0=fx.gx0, gy0=fx.gy0, ps=fx.pixel_size, w=fx.w, h=fx.h)
    images = pipeline.images_df(spark, fx.images).repartition(int(cpus)).persist()
    images.count()
    rings_list = [(np.asarray(r["ring_x"]), np.asarray(r["ring_y"])) for r in fx.reaches]

    # run the pipeline front half once to get the real fill input shape
    import tempfile
    res = pipeline.run(spark, images, fx.reaches, grid,
                       mask_path=tempfile.mkdtemp(prefix="expfill_"))
    points = res["mask_points"]
    kept = res["kept"]
    from pyspark.sql import Window
    kept_idx = kept.select(
        "scene", "date",
        F.date_format("date", "yyyy-MM-dd").alias("ds"),
        (F.row_number().over(Window.partitionBy("scene").orderBy("date")) - 1).alias("t_idx"),
        F.count("*").over(Window.partitionBy("scene")).alias("n_t"))
    pk = points.join(F.broadcast(kept_idx.select("scene", "date", "t_idx", "n_t")),
                     ["scene", "date"]).persist()
    pk.count()

    fill_res = fillop.FILL_RES_DEFAULT
    rings = rings_list

    def filled_water_arrow(points_kept):
        def kernel(key, tbl):  # no annotations: pyspark's applyInArrow hint-inference raises on partial hints
            scene, cell = key[0].as_py(), int(key[1].as_py())
            ux, uy = fillop._cell_universe(cell, rings, grid)
            n_px = ux.shape[0]
            empty = pa.table({"scene": pa.array([], pa.string()),
                              "t_idx": pa.array([], pa.int32()),
                              "px": pa.array([], pa.int32()),
                              "py": pa.array([], pa.int32())})
            if n_px == 0:
                return empty
            n_t = int(tbl.column("n_t")[0].as_py())
            ukey = ux.astype(np.int64) << 32 | uy.astype(np.int64)
            order = np.argsort(ukey)
            su = ukey[order]
            px_a = tbl.column("px").to_numpy().astype(np.int64)
            py_a = tbl.column("py").to_numpy().astype(np.int64)
            pkey = px_a << 32 | py_a
            pos = np.minimum(np.searchsorted(su, pkey), su.size - 1)
            ok = su[pos] == pkey
            j = order[pos[ok]]
            t_a = tbl.column("t_idx").to_numpy().astype(np.int64)[ok]
            v_a = tbl.column("value").to_numpy()[ok]
            mat = np.zeros((n_t, n_px), dtype=np.int8)
            mat[t_a, j] = np.where(v_a == 1, 1, 2)
            out = fillk.binarize(fillk.fill_series(mat))
            ti, pi = np.nonzero(out)
            n = ti.shape[0]
            b = scene.encode("utf-8")
            offsets = (np.arange(n + 1, dtype=np.int32) * len(b))
            scene_arr = pa.StringArray.from_buffers(
                n, pa.py_buffer(memoryview(offsets)), pa.py_buffer(b * n))
            return pa.table({"scene": scene_arr,
                             "t_idx": pa.array(ti.astype(np.int32)),
                             "px": pa.array(ux[pi].astype(np.int32)),
                             "py": pa.array(uy[pi].astype(np.int32))})

        cell_of = fillop.hex_cell_udf(fill_res, grid)
        prepared = points_kept.withColumn("fill_cell", cell_of("px", "py"))
        filled = prepared.groupBy("scene", "fill_cell").applyInArrow(
            kernel, "scene string, t_idx int, px int, py int")
        dim = F.broadcast(kept_idx.select("scene", "t_idx", "ds"))
        return filled.join(dim, ["scene", "t_idx"]).select("scene", "ds", "px", "py")

    wa = filled_water_arrow(pk)
    wp = fillop.filled_water(pk, kept_idx, fx.reaches, grid, fill_res=fill_res)
    print("rows arrow:", wa.count(), " pandas:", wp.count(), flush=True)
    print("a-p:", wa.exceptAll(wp).count(), " p-a:", wp.exceptAll(wa).count(), flush=True)

    sc = spark.sparkContext
    for r in range(4):
        sc.setJobDescription(f"fill pandas rep{r}")
        t0 = time.time(); noop(wp); tp = time.time() - t0
        sc.setJobDescription(f"fill arrow rep{r}")
        t0 = time.time(); noop(wa); ta = time.time() - t0
        print(f"rep{r}: pandas {tp:.3f}s  arrow {ta:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
