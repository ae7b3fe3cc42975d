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
  stream across micro-batches. State is keyed by the FULL content hash:
  one O(1) existence row per distinct document ever seen. Per-batch
  state writes are bounded by the number of NEW hashes in that batch —
  nothing proportional to the corpus is ever re-serialized (r2 shipped
  a 256-bucket design whose full sorted seen-list was rewritten every
  micro-batch: O(corpus/256) serialization per batch, growing forever).
  Total state-store size still grows with the distinct corpus — that is
  inherent to exact global dedup — but it lives in the state store
  (use the RocksDB provider at scale: incremental snapshots, spill to
  disk), not in any single group's blob.
- ``stream_dedup_watermarked``: the bounded-state alternative when
  "duplicate" only needs to hold within an event-time horizon —
  watermarked ``dropDuplicates``; Spark evicts state older than the
  watermark, so state is O(distinct docs per horizon).
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
# value-less existence state: the keeper id is stored only so restarts
# re-emit deterministically if ever needed; the row never grows
DEDUP_STATE_SCHEMA = T.StructType([T.StructField("first_id", T.LongType())])


def _dedup_state_fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    if state.exists:
        # known hash: suppress every occurrence; the state row is not
        # rewritten, so a duplicate-heavy batch costs zero state I/O
        return
    md5 = key[0]
    # keeper = lowest doc_id across ALL Arrow chunks of this group in
    # this batch (per-chunk-first would depend on Arrow batch sizing)
    best = None
    for pdf in pdfs:
        if len(pdf):
            m = int(pdf["doc_id"].min())
            best = m if best is None or m < best else best
    if best is None:
        return
    state.update((best,))
    yield pd.DataFrame({"doc_id": [best], "text_md5": [md5]})


def stream_dedup_exact(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """First occurrence of each distinct text across the whole stream.

    Custom stateful operator keyed by the full content hash: each
    distinct text owns one O(1) GroupState row (its keeper id). A new
    hash writes exactly one state row; a duplicate touches its row
    read-only — per-batch state-write volume is bounded by the batch's
    new-hash count, never by corpus size. Emits (doc_id, text_md5) for
    first occurrences only.
    """
    keyed = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.md5(F.col(text_col)).alias("text_md5"),
    )
    return keyed.groupBy("text_md5").applyInPandasWithState(
        _dedup_state_fn,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


PHASH_DEDUP_OUT_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("phash", T.LongType()),
    T.StructField("keeper", T.StringType()),
    T.StructField("bucket_full", T.BooleanType()),
])
# per-bucket state: the phashes ever seen in this band bucket and the
# image that introduced each — appending a new phash rewrites THIS
# bucket's row only, never anything corpus-sized
PHASH_STATE_SCHEMA = T.StructType([
    T.StructField("phashes", T.ArrayType(T.LongType())),
    T.StructField("keepers", T.ArrayType(T.StringType())),
])


def _phash_state_fn(max_hamming: int, state_cap: int):
    import numpy as np

    from ..operators.dedup import popcount64

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            ph_list, kp_list = (list(v) for v in state.get)
        else:
            ph_list, kp_list = [], []
        batch = pd.concat(list(pdfs), ignore_index=True)
        if not len(batch):
            return
        # deterministic within-batch order (Arrow chunking must not
        # decide who becomes a bucket's keeper)
        batch = batch.sort_values("image_id")
        dirty = False
        out_kp, out_full = [], []
        for image_id, ph in zip(batch["image_id"], batch["phash"]):
            full = False
            if ph_list:
                d = popcount64(np.asarray(ph_list, dtype=np.int64) ^ np.int64(ph))
                hits = np.nonzero(d <= max_hamming)[0]
            else:
                hits = ()
            if len(hits):
                keeper = min(kp_list[i] for i in hits)
            else:
                keeper = image_id
                if len(ph_list) < state_cap:
                    ph_list.append(int(ph))
                    kp_list.append(str(image_id))
                    dirty = True
                else:
                    full = True  # recall loss is visible, never silent
            out_kp.append(keeper)
            out_full.append(full)
        if dirty:
            state.update((ph_list, kp_list))
        yield pd.DataFrame({"image_id": batch["image_id"].to_numpy(),
                            "phash": batch["phash"].to_numpy(),
                            "keeper": out_kp, "bucket_full": out_full})

    return fn


def stream_phash_neardup(images: DataFrame, max_hamming: int = 3,
                         n_blocks: int | None = None, state_cap: int = 1024,
                         on_error: str = "quarantine") -> DataFrame:
    """Streaming perceptual image near-dup: per-band verdicts against
    every image EVER seen on the stream.

    The streaming form of ``multimodal.phash_neardup``: the same
    decode + phash64 pass, the same pigeonhole band keys
    (dedup.hamming_band_keys — batch and stream bucket identically),
    but instead of a self-join the bucket is a ``GroupState`` holding
    the (phash, introducing image) pairs seen so far. A new image
    emits one verdict row per band: ``keeper`` = the lexicographically
    smallest stored match within ``max_hamming`` (or its own id if the
    band has none). Reduce the per-band rows to one verdict per image
    with ``phash_verdicts`` inside ``foreachBatch``.

    Costs/limits (all deliberate): appending a new phash rewrites only
    that bucket's state row; per-batch state I/O is bounded by the
    batch's new-phash count x bands, never corpus size (state-store
    total still grows with distinct phashes — exact-forever semantics,
    use the RocksDB provider at scale). ``state_cap`` bounds any one
    bucket; overflow rows report ``bucket_full=true`` instead of
    silently losing recall. Keeper chains collapse one hop per batch
    (A~B, B~C in ONE batch keeps A and maps C->B); run the batch
    ``cluster_duplicates`` over accumulated pairs when full transitive
    collapse matters.

    ``on_error="quarantine"`` (default here, unlike batch: a poison
    payload must not kill a long-running query) drops undecodable
    rows from the hash stream; route them via with_format_detail.
    """
    from ..operators.dedup import hamming_band_keys
    from ..operators.multimodal import phash_images

    hashed = phash_images(images, on_error=on_error)
    if on_error == "quarantine":
        hashed = hashed.where(F.col("phash").isNotNull()).select("image_id", "phash")
    keys = hamming_band_keys("phash", max_hamming, n_blocks)
    banded = hashed.select(
        "image_id", "phash", F.posexplode(F.array(*keys)).alias("combo", "bucket"))
    return banded.groupBy("combo", "bucket").applyInPandasWithState(
        _phash_state_fn(max_hamming, state_cap),
        outputStructType=PHASH_DEDUP_OUT_SCHEMA,
        stateStructType=PHASH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def phash_verdicts(per_band: DataFrame) -> DataFrame:
    """One verdict per image from stream_phash_neardup's per-band rows
    (call on the batch DataFrame inside ``foreachBatch``): a matched
    keeper from ANY band wins (min for determinism); an image with no
    match in any band keeps itself. ``is_dup`` = suppress this row."""
    matched = F.min(F.when(F.col("keeper") != F.col("image_id"), F.col("keeper")))
    return (
        per_band.groupBy("image_id")
        .agg(F.first("phash").alias("phash"), matched.alias("matched"),
             F.max("bucket_full").alias("bucket_full"))
        .select("image_id", "phash",
                F.coalesce("matched", "image_id").alias("keeper"),
                "bucket_full",
                (F.coalesce("matched", "image_id") != F.col("image_id")).alias("is_dup"))
    )


def stream_dedup_watermarked(docs: DataFrame, id_col: str = "doc_id",
                             text_col: str = "text", event_col: str = "ts",
                             watermark: str = "7 days") -> DataFrame:
    """Bounded-state dedup: suppress duplicates within an event-time
    horizon via watermarked ``dropDuplicates`` — Spark evicts state
    rows older than the watermark, so total state is O(distinct docs
    per horizon) instead of O(corpus). The right tool when exact
    forever-dedup isn't required (e.g. rolling crawl ingestion)."""
    keyed = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.md5(F.col(text_col)).alias("text_md5"),
        F.col(event_col).cast("timestamp").alias("ts"),
    )
    return keyed.withWatermark("ts", watermark).dropDuplicates(["text_md5"])
