"""Stateful streaming: applyInPandasWithState dedup across micro-batches
and the watermarked windowed wet-area aggregate."""

import os
import tempfile

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from irivermetrics_spark.streaming import stateful

DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("text", T.StringType(), False),
])


def _write_docs(spark, path, rows):
    spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]), DOC_SCHEMA) \
        .write.mode("append").parquet(path)


def test_stream_dedup_suppresses_cross_batch_duplicates(spark):
    base = tempfile.mkdtemp(prefix="sdedup_")
    src = os.path.join(base, "docs")
    ckpt = os.path.join(base, "ckpt")

    _write_docs(spark, src, [(1, "aaa"), (2, "bbb"), (3, "aaa")])
    sink = os.path.join(base, "out")

    def run_once(_name):
        stream = spark.readStream.schema(DOC_SCHEMA).parquet(src)
        out = stateful.stream_dedup_exact(stream)

        def write_batch(df, _bid):
            df.write.mode("append").parquet(sink)

        q = (out.writeStream.foreachBatch(write_batch)
             .option("checkpointLocation", ckpt)
             .outputMode("update").trigger(availableNow=True).start())
        q.awaitTermination(120)
        return spark.read.parquet(sink).toPandas()

    got1 = run_once("dedup1")
    # within-batch dup (doc 3 == doc 1) suppressed, keeper = lowest id
    assert sorted(got1.doc_id) == [1, 2]

    # second micro-batch: one true new doc + two cross-batch duplicates
    _write_docs(spark, src, [(10, "aaa"), (11, "ccc"), (12, "bbb")])
    got2 = run_once("dedup2")  # sink accumulates: batch 1 rows + the new one
    assert sorted(got2.doc_id) == [1, 2, 11]  # 10 and 12 suppressed by state


def test_stream_dedup_state_writes_bounded_by_new_hashes(spark):
    """Per-batch state I/O must scale with the batch's NEW hashes, not
    the corpus (r2 ADVICE: the old bucket design rewrote the full
    sorted seen-list every batch). Pinned via the state operator's
    numRowsUpdated progress metric."""
    base = tempfile.mkdtemp(prefix="sdedupb_")
    src = os.path.join(base, "docs")
    ckpt = os.path.join(base, "ckpt")
    sink = os.path.join(base, "out")

    def run_once():
        stream = spark.readStream.schema(DOC_SCHEMA).parquet(src)
        out = stateful.stream_dedup_exact(stream)
        q = (out.writeStream.foreachBatch(lambda df, _b: df.write.mode("append").parquet(sink))
             .option("checkpointLocation", ckpt)
             .outputMode("update").trigger(availableNow=True).start())
        q.awaitTermination(120)
        ups = [p["stateOperators"][0]["numRowsUpdated"]
               for p in q.recentProgress if p.get("stateOperators")]
        return sum(ups)

    # batch 1: 20 docs, 20 distinct -> 20 state-row writes
    _write_docs(spark, src, [(i, f"t{i}") for i in range(20)])
    assert run_once() == 20
    # batch 2: 21 docs, 20 duplicates of the whole corpus + 1 new ->
    # exactly ONE state-row write (the old design rewrote every
    # touched bucket's full list)
    _write_docs(spark, src, [(100 + i, f"t{i}") for i in range(20)] + [(999, "brand_new")])
    assert run_once() == 1
    got = spark.read.parquet(sink).toPandas()
    assert sorted(got.doc_id) == sorted(list(range(20)) + [999])


def test_stream_dedup_watermarked_bounded_state(spark):
    """The TTL alternative: duplicates inside the horizon suppressed,
    state evicted beyond the watermark."""
    import datetime as dt
    base = tempfile.mkdtemp(prefix="sdedupw_")
    src = os.path.join(base, "docs")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ])
    t0 = dt.datetime(2021, 1, 1)
    rows = [(1, "aaa", t0), (2, "aaa", t0 + dt.timedelta(hours=1)), (3, "bbb", t0)]
    spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text", "ts"]), schema) \
        .write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    out = stateful.stream_dedup_watermarked(stream, watermark="1 day")
    q = (out.writeStream.format("memory").queryName("wdedup")
         .option("checkpointLocation", os.path.join(base, "ckpt"))
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select * from wdedup").toPandas()
    assert sorted(got.doc_id) == [1, 3]  # doc 2 suppressed inside horizon


def test_stream_wet_area_windows(spark):
    base = tempfile.mkdtemp(prefix="swet_")
    src = os.path.join(base, "pts")
    schema = T.StructType([
        T.StructField("scene", T.StringType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("value", T.IntegerType(), False),
    ])
    import datetime as dt
    rows = (
        [("s0", dt.date(2020, 1, 1), 1)] * 5
        + [("s0", dt.date(2020, 1, 2), 1)] * 3
        + [("s0", dt.date(2020, 1, 1), -1)] * 2  # nodata ignored
    )
    spark.createDataFrame(pd.DataFrame(rows, columns=["scene", "date", "value"]), schema) \
        .write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    agg = stateful.stream_wet_area(stream, pixel_area_km2=1e-4)
    q = (agg.writeStream.format("memory").queryName("wet")
         .option("checkpointLocation", os.path.join(base, "ckpt"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select * from wet").toPandas().sort_values("date").reset_index(drop=True)
    # append mode only emits windows the watermark has closed; with a
    # single availableNow batch nothing may close — re-check in update
    if len(got) == 0:
        q2 = (stateful.stream_wet_area(spark.readStream.schema(schema).parquet(src), 1e-4)
              .writeStream.format("memory").queryName("wet_u")
              .option("checkpointLocation", os.path.join(base, "ckpt_u"))
              .outputMode("update").trigger(availableNow=True).start())
        q2.awaitTermination(120)
        got = spark.sql("select * from wet_u").toPandas().sort_values("date").reset_index(drop=True)
    assert list(got.n_wet_px) == [5, 3]
    assert got.wet_area_km2.iloc[0] == 5e-4


def test_stream_phash_neardup_cross_batch(spark):
    """Perceptual near-dup across micro-batches: re-encodes of artwork
    already seen on the stream are flagged dups (keeper = first-seen),
    new artwork passes, broken payloads quarantine instead of killing
    the query, and the popcount/banding matches the batch operator."""
    import os
    import tempfile

    import numpy as np

    from irivermetrics_spark import codecs
    from tests.test_semdedup_phash import _artwork, _encode_variants

    base = tempfile.mkdtemp(prefix="sphash_")
    src = os.path.join(base, "imgs")
    ckpt = os.path.join(base, "ckpt")
    sink = os.path.join(base, "out")
    IMG_SCHEMA = T.StructType([
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("fmt", T.StringType(), False),
    ])
    va = _encode_variants(_artwork(0))
    vb = _encode_variants(_artwork(1))

    def write_imgs(rows):
        spark.createDataFrame(pd.DataFrame(rows, columns=["image_id", "bytes", "fmt"]),
                              IMG_SCHEMA).write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema(IMG_SCHEMA).parquet(src)
        out = stateful.stream_phash_neardup(stream, max_hamming=6)

        def write_batch(df, _bid):
            stateful.phash_verdicts(df).write.mode("append").parquet(sink)

        q = (out.writeStream.foreachBatch(write_batch)
             .option("checkpointLocation", ckpt)
             .outputMode("update").trigger(availableNow=True).start())
        q.awaitTermination(180)
        return spark.read.parquet(sink).toPandas()

    # batch 1: artwork A twice (raw16 + jpeg re-encode), artwork B once
    write_imgs([("a1", va["raw16"][0], codecs.FMT_RAW16), ("a2", va["jpeg"][0], "jpeg"),
                ("b1", vb["raw16"][0], codecs.FMT_RAW16)])
    got1 = run_once().set_index("image_id")
    assert not got1.loc["a1"].is_dup and not got1.loc["b1"].is_dup
    assert got1.loc["a2"].is_dup and got1.loc["a2"].keeper == "a1"

    # batch 2: a webp re-encode of A with a LOWER id (keeper stays the
    # first-seen a1), a png re-encode of B, and a poison payload
    write_imgs([("a0", va["webp"][0], "webp"), ("b2", vb["png"][0], "png"),
                ("broken", b"\x89PNG\r\nnope", "png")])
    got2 = run_once().set_index("image_id")
    assert got2.loc["a0"].is_dup and got2.loc["a0"].keeper == "a1"
    assert got2.loc["b2"].is_dup and got2.loc["b2"].keeper == "b1"
    assert "broken" not in got2.index  # quarantined, query survived
    assert not got2.bucket_full.any()


def test_popcount64_matches_python():
    import numpy as np

    from irivermetrics_spark.operators.dedup import popcount64

    rng = np.random.default_rng(3)
    vals = np.concatenate([
        rng.integers(-2**63, 2**63 - 1, 200, dtype=np.int64),
        np.array([0, -1, 1, 2**62, -2**63], dtype=np.int64),
    ])
    got = popcount64(vals)
    want = [bin(int(np.uint64(v))).count("1") for v in vals.astype(np.uint64)]
    assert got.tolist() == want
