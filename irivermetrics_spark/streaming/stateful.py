"""Stateful / windowed Structured-Streaming operators.

The reference has no streaming surface; these are the engine's
production-shape extensions (SURVEY §2.10 bonus) built on the two
canonical Spark mechanisms:

- ``stream_wet_area``: event-time windowed aggregation with a
  watermark — the incremental form of the per-(scene, date) wet-pixel
  series; late scenes inside the watermark revise their window, older
  ones are dropped deterministically.
- ``stream_dedup_exact``: a custom stateful operator via
  ``applyInPandasWithState`` — exactly-once exact dedup of a document
  stream across micro-batches. State is the set of seen content hashes
  per hash-prefix bucket (256-way partitioned so no single state blob
  grows with the corpus; at larger scale widen the prefix).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T


def stream_wet_area(points: DataFrame, pixel_area_km2: float,
                    watermark: str = "30 days") -> DataFrame:
    """Streaming per-(scene, day) wet area with late-data watermark.

    ``points``: streaming mask points (scene, date, value) — value==1
    is water. Returns an append-mode-compatible windowed aggregate.
    """
    wet = points.where(F.col("value") == 1).withColumn("ts", F.col("date").cast("timestamp"))
    return (
        wet.withWatermark("ts", watermark)
        .groupBy("scene", F.window("ts", "1 day").alias("win"))
        .agg(F.count("*").alias("n_wet_px"))
        .select(
            "scene",
            F.col("win.start").cast("date").alias("date"),
            "n_wet_px",
            (F.col("n_wet_px") * F.lit(pixel_area_km2)).alias("wet_area_km2"),
        )
    )


DEDUP_OUT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text_md5", T.StringType()),
])
DEDUP_STATE_SCHEMA = T.StructType([T.StructField("seen", T.ArrayType(T.StringType()))])


def _dedup_state_fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    # buffer ALL Arrow chunks of the group before choosing keepers — a
    # group split across chunks would otherwise pick a per-chunk-first
    # doc_id, making the emitted keeper depend on Arrow batch sizing
    pdf = pd.concat(list(pdfs), ignore_index=True).sort_values("doc_id")
    fresh_rows = []
    for doc_id, md5 in zip(pdf["doc_id"], pdf["text_md5"]):
        if md5 not in seen:
            seen.add(md5)
            fresh_rows.append((int(doc_id), md5))
    if fresh_rows:
        yield pd.DataFrame(fresh_rows, columns=["doc_id", "text_md5"])
    state.update((sorted(seen),))


def stream_dedup_exact(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """First occurrence of each distinct text across the whole stream.

    Custom stateful operator: hash the text, bucket by a 2-hex-char
    prefix (256 state shards), keep the seen-hash set per bucket in
    GroupState. Emits (doc_id, text_md5) rows for first occurrences
    only — duplicates in later micro-batches are suppressed exactly.
    """
    keyed = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.md5(F.col(text_col)).alias("text_md5"),
    ).withColumn("bucket", F.substring("text_md5", 1, 2))
    return keyed.groupBy("bucket").applyInPandasWithState(
        _dedup_state_fn,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
