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
