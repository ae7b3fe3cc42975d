"""images_df must pin a byte-safe Arrow batch row count for its
wide-binary createDataFrame and restore the session default after —
the session's 10000-row default crosses the 2 GiB int32-offset limit
of an Arrow binary column at ~200 KB/row image tables (observed as a
silent AQE hang materializing the cached image table at the 384-scene
scaling input, r8)."""

from irivermetrics_spark import synth
from irivermetrics_spark.plans import pipeline

KEY = "spark.sql.execution.arrow.maxRecordsPerBatch"


def test_images_df_restores_conf_and_rows(spark):
    before = spark.conf.get(KEY)
    fx = synth.make_fixture(w=40, h=20, n_dates=3, n_sections=2, seed=5)
    df = pipeline.images_df(spark, fx.images)
    assert spark.conf.get(KEY) == before
    assert df.count() == len(fx.images)
    assert df.columns == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]


def test_images_df_restores_conf_on_error(spark):
    before = spark.conf.get(KEY)
    try:
        pipeline.images_df(spark, object())  # not a frame -> raises
    except Exception:
        pass
    assert spark.conf.get(KEY) == before
