"""Streaming flagship slice e2e (SURVEY §2.10 stretch): incremental
image arrival -> exactly-once decode -> per-micro-batch F6->fill->wet
area, batch-identical and restart-safe."""

import os
import tempfile

from irivermetrics_spark import synth
from irivermetrics_spark.plans import pipeline
from irivermetrics_spark.streaming import metrics_stream


def test_streaming_wet_area_batch_identical_across_restart(spark):
    fx = synth.make_fixture(w=40, h=20, n_dates=6, n_sections=2, seed=19)
    grid = dict(gx0=fx.gx0, gy0=fx.gy0, ps=fx.pixel_size, w=fx.w, h=fx.h)
    base = tempfile.mkdtemp(prefix="mstream_")
    img_dir, mask_dir = os.path.join(base, "img"), os.path.join(base, "mask")
    out_dir, ckpt = os.path.join(base, "wet"), os.path.join(base, "ckpt")

    all_images = pipeline.images_df(spark, fx.images)

    # batch 1: first 4 scenes-dates arrive; query runs to completion
    first = all_images.limit(4)
    first.write.mode("append").parquet(img_dir)
    q = metrics_stream.start_flagship_stream(spark, img_dir, mask_dir, out_dir,
                                             ckpt, fx.reaches, grid)
    q.awaitTermination(180)
    got1 = spark.read.parquet(out_dir).toPandas()
    assert len(got1) > 0

    # kill/restart with late arrivals: remaining images land, a NEW query
    # resumes from the checkpoint — only the delta is decoded, and the
    # recomputed slice must equal the batch pipeline on ALL images
    all_images.exceptAll(first).write.mode("append").parquet(img_dir)
    q2 = metrics_stream.start_flagship_stream(spark, img_dir, mask_dir, out_dir,
                                              ckpt, fx.reaches, grid)
    q2.awaitTermination(180)

    got = spark.read.parquet(out_dir).toPandas().sort_values(
        ["scene", "ds"]).reset_index(drop=True)

    # exactly-once: no image decoded twice into the mask table
    masks = spark.read.parquet(mask_dir)
    dup = masks.groupBy("image_id", "px", "py").count().where("count > 1").count()
    assert dup == 0

    # batch oracle: the full batch pipeline over the original image table
    res = pipeline.run(spark, all_images, fx.reaches, grid)
    px_area = grid["ps"] ** 2 / 1e6
    want = (
        res["water_joined"].select("scene", "ds", "px", "py").distinct()
        .groupBy("scene", "ds").count()
        .toPandas().sort_values(["scene", "ds"]).reset_index(drop=True)
    )
    assert list(got.ds) == list(want.ds)
    assert list(got.n_wet_px) == list(want["count"])
    assert abs(got.wet_area_km2 - want["count"] * px_area).max() < 1e-12


def test_streaming_selective_scene_recompute(spark):
    """A micro-batch touching only one scene must replace only that
    scene's output partitions (dynamic overwrite) — the other scene's
    results survive verbatim, and totals still match the batch oracle."""
    fx = synth.make_fixture(w=40, h=20, n_dates=3, n_sections=2, n_scenes=2, seed=23)
    grid = dict(gx0=fx.gx0, gy0=fx.gy0, ps=fx.pixel_size, w=fx.w, h=fx.h)
    base = tempfile.mkdtemp(prefix="mstream2_")
    img_dir, mask_dir = os.path.join(base, "img"), os.path.join(base, "mask")
    out_dir, ckpt = os.path.join(base, "wet"), os.path.join(base, "ckpt")

    all_images = pipeline.images_df(spark, fx.images)
    s0 = all_images.filter("image_id LIKE 'scene0%'")
    s1 = all_images.filter("image_id LIKE 'scene1%'")

    s0.write.mode("append").parquet(img_dir)
    q = metrics_stream.start_flagship_stream(spark, img_dir, mask_dir, out_dir,
                                             ckpt, fx.reaches, grid)
    q.awaitTermination(180)
    before = spark.read.parquet(out_dir).toPandas()
    before0 = before[before.scene == "scene0"].sort_values("ds").reset_index(drop=True)
    assert len(before0) > 0 and set(before.scene) == {"scene0"}

    # batch 2: only scene1 arrives -> scene0 partitions must be untouched
    s1.write.mode("append").parquet(img_dir)
    q2 = metrics_stream.start_flagship_stream(spark, img_dir, mask_dir, out_dir,
                                              ckpt, fx.reaches, grid)
    q2.awaitTermination(180)
    after = spark.read.parquet(out_dir).toPandas()
    after0 = after[after.scene == "scene0"].sort_values("ds").reset_index(drop=True)
    assert set(after.scene) == {"scene0", "scene1"}
    assert list(after0.ds) == list(before0.ds)
    assert list(after0.n_wet_px) == list(before0.n_wet_px)

    # and the combined table equals the batch pipeline over everything
    res = pipeline.run(spark, all_images, fx.reaches, grid)
    want = (
        res["water_joined"].select("scene", "ds", "px", "py").distinct()
        .groupBy("scene", "ds").count().toPandas()
        .sort_values(["scene", "ds"]).reset_index(drop=True)
    )
    got = after.sort_values(["scene", "ds"]).reset_index(drop=True)
    assert list(got.scene) == list(want.scene) and list(got.ds) == list(want.ds)
    assert list(got.n_wet_px) == list(want["count"])


def test_streaming_nc_source_batch_identical(spark):
    """The reference's .nc entry format drives the SAME two-layer
    streaming pipeline: cubes stream in via binaryFile, a late cube
    restarts the query from checkpoint, and the final wet-area table
    equals the batch pipeline over all cubes' points."""
    from pyspark.sql import functions as F

    from irivermetrics_spark.kernels import netcdf
    from irivermetrics_spark.operators import ncingest

    fx = synth.make_fixture(w=40, h=20, n_dates=5, n_sections=2, n_scenes=3, seed=23)
    grid = dict(gx0=fx.gx0, gy0=fx.gy0, ps=fx.pixel_size, w=fx.w, h=fx.h)
    base = tempfile.mkdtemp(prefix="mstream_nc_")
    nc_dir, mask_dir = os.path.join(base, "cubes"), os.path.join(base, "mask")
    out_dir, ckpt = os.path.join(base, "wet"), os.path.join(base, "ckpt")
    os.makedirs(nc_dir)

    def write_cube(s):
        with open(os.path.join(nc_dir, f"scene{s}.nc"), "wb") as f:
            f.write(netcdf.write_wmask(fx.masks[s], [str(d) for d in fx.dates], grid))

    write_cube(0)
    write_cube(1)
    q = metrics_stream.start_flagship_stream(spark, nc_dir, mask_dir, out_dir,
                                             ckpt, fx.reaches, grid, source="nc")
    q.awaitTermination(180)

    write_cube(2)  # late cube, new query resumes from checkpoint
    q2 = metrics_stream.start_flagship_stream(spark, nc_dir, mask_dir, out_dir,
                                              ckpt, fx.reaches, grid, source="nc")
    q2.awaitTermination(180)

    got = spark.read.parquet(out_dir).toPandas().sort_values(
        ["scene", "ds"]).reset_index(drop=True)
    # batch reference: same cubes through the batch binaryFile ingest
    batch_pts, _ = ncingest.read_wmask_nc(
        spark, nc_dir,
        corridor_rings=[(r["ring_x"], r["ring_y"]) for r in fx.reaches])
    want, pres = metrics_stream.wet_area_slice(spark, batch_pts, fx.reaches, grid)
    want = want.toPandas().sort_values(["scene", "ds"]).reset_index(drop=True)
    assert got[["scene", "ds", "n_wet_px"]].equals(want[["scene", "ds", "n_wet_px"]])
    assert sorted(got["scene"].unique()) == ["scene0", "scene1", "scene2"]
    pres["kept"].unpersist()
    pres["water_joined"].unpersist()
