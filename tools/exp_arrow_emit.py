"""Experiment (r8): decode emit-path variants at the Python->JVM boundary.

A: current kernel (mapInPandas, pd.Categorical columns — which the
   serializer EXPANDS back to object before conversion, see
   ArrowStreamPandasSerializer._create_array).
C: mapInArrow prototype — per-batch numpy accumulation, one RecordBatch
   built zero-copy, image_id/scene as DictionaryArray, date as date32
   from day ints. Verifies JVM acceptance + bit-identical rows, then
   times interleaved against A.
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

    from irivermetrics_spark import codecs, synth
    from irivermetrics_spark.kernels import water
    from irivermetrics_spark.functions import cellindex
    from irivermetrics_spark.operators import decode
    from irivermetrics_spark.plans import pipeline
    from irivermetrics_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("exp_arrow_emit", master=f"local[{cpus}]",
                      shuffle_partitions=max(8, int(cpus)))

    fx = synth.make_fixture(w=326, h=111, n_dates=63, n_sections=7, n_scenes=32, seed=42)
    grid = dict(gx0=fx.gx0, gy0=fx.gy0, ps=fx.pixel_size, w=fx.w, h=fx.h)
    gx0, gy0, ps = grid["gx0"], grid["gy0"], grid["ps"]
    images = pipeline.images_df(spark, fx.images).repartition(int(cpus)).persist()
    images.count()
    rings = [(np.asarray(r["ring_x"]), np.asarray(r["ring_y"])) for r in fx.reaches]
    res = 9

    # ---------- variant C: mapInArrow prototype ----------
    EPOCH = np.datetime64("1970-01-01", "D")

    def arrow_kernel(batches):
        from irivermetrics_spark.functions import geometry

        for rb in batches:
            ids = rb.column(rb.schema.get_field_index("image_id")).to_pylist()
            bufs = rb.column(rb.schema.get_field_index("bytes")).to_pylist()
            xs_l, ys_l, val_l, cell_l = [], [], [], []
            frame_ids, frame_scene, frame_day, lens = [], [], [], []
            for image_id, buf in zip(ids, bufs):
                arr = codecs.decode_image(bytes(buf))
                mask = water.water_mask(arr, water.NDWI_THRESHOLD)
                ys, xs = np.nonzero(mask != 0)
                scene, date = decode._scene_date_py(image_id)
                day = (np.datetime64(date, "D") - EPOCH).astype(np.int32)
                if ys.size:
                    vals = mask[ys, xs]
                    cx = gx0 + (xs + 0.5) * ps
                    cy = gy0 - (ys + 0.5) * ps
                    cells = cellindex.hex_cell(cx, cy, res)
                    xs_l.append(xs.astype(np.int32))
                    ys_l.append(ys.astype(np.int32))
                    val_l.append(vals.astype(np.int8))
                    cell_l.append(cells)
                    frame_ids.append(image_id)
                    frame_scene.append(scene)
                    frame_day.append(day)
                    lens.append(xs.size)
                # summary row (in-corridor invalid count)
                nod = vals == -1 if ys.size else np.zeros(0, dtype=bool)
                n_invalid = 0
                if ys.size and nod.any():
                    h, w = mask.shape
                    bm = decode._corridor_bitmap(rings, gx0, gy0, ps, h, w)
                    n_invalid = int(bm[ys[nod], xs[nod]].sum())
                xs_l.append(np.array([-1], dtype=np.int32))
                ys_l.append(np.array([-1], dtype=np.int32))
                val_l.append(np.array([decode.SUMMARY_MARKER], dtype=np.int8))
                cell_l.append(np.array([n_invalid], dtype=np.int64))
                frame_ids.append(image_id)
                frame_scene.append(scene)
                frame_day.append(day)
                lens.append(1)
            if not lens:
                continue
            lens_a = np.asarray(lens, dtype=np.int64)

            def repeated_utf8(strs):
                # plain utf8 array of per-frame strings repeated lens_a
                # times each, built from raw buffers (no per-row Python
                # objects): data = frame bytes tiled C-side, offsets =
                # cumsum of repeated widths (dictionary<utf8> would be
                # cheaper still but ArrowColumnVector can't read it)
                bs = [s.encode("utf-8") for s in strs]
                widths = np.fromiter((len(b) for b in bs), dtype=np.int64, count=len(bs))
                data = b"".join(b * int(n) for b, n in zip(bs, lens_a))
                row_w = np.repeat(widths, lens_a)
                offsets = np.empty(row_w.size + 1, dtype=np.int32)
                offsets[0] = 0
                np.cumsum(row_w, out=offsets[1:])
                return pa.StringArray.from_buffers(
                    int(lens_a.sum()), pa.py_buffer(memoryview(offsets)),
                    pa.py_buffer(data))

            days = np.repeat(np.asarray(frame_day, dtype=np.int32), lens_a)
            out = pa.record_batch(
                [
                    repeated_utf8(frame_ids),
                    pa.array(np.concatenate(xs_l)),
                    pa.array(np.concatenate(ys_l)),
                    pa.array(np.concatenate(val_l)),
                    pa.array(np.concatenate(cell_l)),
                    pa.array(days, type=pa.date32()),
                    repeated_utf8(frame_scene),
                ],
                names=["image_id", "px", "py", "value", "cell", "date", "scene"],
            )
            yield out

    schema = ("image_id string, px int, py int, value tinyint, "
              "cell long, date date, scene string")
    proto = images.select("image_id", "bytes").mapInArrow(arrow_kernel, schema)

    cur = decode.decode_points(images, grid, res=res, corridor_rings=rings)

    # --- correctness: bit-identical rows both directions ---
    print("rows proto:", proto.count(), " rows current:", cur.count(), flush=True)
    d1 = proto.exceptAll(cur).count()
    d2 = cur.exceptAll(proto).count()
    print(f"exceptAll proto-cur={d1} cur-proto={d2}", flush=True)

    # --- interleaved timing, 4 rounds ---
    sc = spark.sparkContext
    for r in range(4):
        sc.setJobDescription(f"A current rep{r}")
        t0 = time.time(); noop(cur); ta = time.time() - t0
        sc.setJobDescription(f"C arrow rep{r}")
        t0 = time.time(); noop(proto); tc = time.time() - t0
        print(f"rep{r}: current {ta:.3f}s  arrow-proto {tc:.3f}s", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
