"""Structured-Streaming ingest: incremental decode with exactly-once
file processing (checkpointed availableNow triggers)."""

import os
import tempfile

from irivermetrics_spark import synth
from irivermetrics_spark.plans import pipeline
from irivermetrics_spark.streaming import ingest


def test_stream_ingest_incremental(spark):
    fx = synth.make_fixture(w=40, h=20, n_dates=6, n_sections=2, seed=3)
    grid = dict(gx0=fx.gx0, gy0=fx.gy0, ps=fx.pixel_size, w=fx.w, h=fx.h)
    base = tempfile.mkdtemp(prefix="stream_")
    img_dir = os.path.join(base, "images")
    mask_dir = os.path.join(base, "mask")
    ckpt = os.path.join(base, "ckpt")

    all_images = pipeline.images_df(spark, fx.images)
    first = all_images.limit(3)
    first.write.mode("append").parquet(img_dir)

    q = ingest.start_mask_sink(ingest.stream_decode(spark, img_dir, grid), mask_dir, ckpt)
    q.awaitTermination(120)
    n1 = spark.read.parquet(mask_dir).select("image_id").distinct().count()
    assert n1 == 3

    # late-arriving scenes appended: only the delta is processed on restart
    all_images.exceptAll(first).write.mode("append").parquet(img_dir)
    q2 = ingest.start_mask_sink(ingest.stream_decode(spark, img_dir, grid), mask_dir, ckpt)
    q2.awaitTermination(120)
    masks = spark.read.parquet(mask_dir)
    assert masks.select("image_id").distinct().count() == len(fx.images)
    # exactly-once: no image decoded twice (distinct pixel rows per image)
    dup = masks.groupBy("image_id", "px", "py").count().where("count > 1").count()
    assert dup == 0


def test_stream_nc_ingest_restart_identical(spark):
    """Streaming serving layer over the reference's entry format: a
    directory of classic .nc water-mask cubes tails through the
    binaryFile FileStreamSource; a restart processes only the new cube
    and the final mask table equals the batch ingest exactly."""
    import numpy as np

    from irivermetrics_spark.kernels import netcdf
    from irivermetrics_spark.operators import ncingest

    fx = synth.make_fixture(w=40, h=20, n_dates=4, n_sections=2, n_scenes=3, seed=5)
    grid = dict(gx0=fx.gx0, gy0=fx.gy0, ps=fx.pixel_size, w=fx.w, h=fx.h)
    base = tempfile.mkdtemp(prefix="stream_nc_")
    nc_dir = os.path.join(base, "cubes")
    mask_dir = os.path.join(base, "mask")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(nc_dir)

    def write_cube(s):
        with open(os.path.join(nc_dir, f"scene{s}.nc"), "wb") as f:
            f.write(netcdf.write_wmask(fx.masks[s], [str(d) for d in fx.dates], grid))

    write_cube(0)
    write_cube(1)
    q = ingest.start_mask_sink(ingest.stream_nc_decode(spark, nc_dir, grid),
                               mask_dir, ckpt)
    q.awaitTermination(120)
    got1 = spark.read.parquet(mask_dir)
    assert sorted(r["scene"] for r in got1.select("scene").distinct().collect()) \
        == ["scene0", "scene1"]

    # restart with one late cube: only the delta decodes (exactly-once)
    write_cube(2)
    q2 = ingest.start_mask_sink(ingest.stream_nc_decode(spark, nc_dir, grid),
                                mask_dir, ckpt)
    q2.awaitTermination(120)
    streamed = spark.read.parquet(mask_dir)
    dup = streamed.groupBy("image_id", "px", "py").count().where("count > 1").count()
    assert dup == 0

    # batch-identical: same rows as the batch binaryFile ingest
    batch, _ = ncingest.read_wmask_nc(spark, nc_dir)
    key = ["image_id", "px", "py", "value", "cell"]
    a = streamed.select(*key).toPandas().sort_values(key).reset_index(drop=True)
    b = batch.select(*key).toPandas().sort_values(key).reset_index(drop=True)
    assert a.equals(b)
    assert len(a) and np.int8(-9) in set(a["value"].unique())  # summaries flow too
