"""Deterministic global shuffle + sharded dataset writer — the last
step of a training-data pipeline (after curation/dedup/packing, data
is globally shuffled and written as N stable shards the trainer
streams).

``DataFrame.orderBy(rand())`` is neither reproducible across re-runs
nor stable under input repartitioning; the standard trick (FineWeb /
Dolma style) is ordering by a seeded hash of the id — a pure function
of (id, seed), so the permutation is identical on every run, machine
and partitioning, and appending new rows never reorders old ones
relative to each other.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def global_shuffle(docs: DataFrame, seed: int = 0,
                   id_col: str = "doc_id") -> DataFrame:
    """Deterministic pseudo-random total order: sort by
    ``(xxhash64(id, seed), id)`` — the id tiebreak keeps the order
    total even under hash collisions. One range-partitioned sort
    (Spark samples split points), no Python."""
    h = F.xxhash64(F.col(id_col).cast("string"), F.lit(int(seed)))
    return docs.orderBy(h.asc(), F.col(id_col).asc())


def shard_assignments(docs: DataFrame, n_shards: int, seed: int = 0,
                      id_col: str = "doc_id") -> DataFrame:
    """Adds ``shard`` (pmod of the seeded id-hash) and ``shard_pos``
    — deterministic position inside the shard under the same
    (hash, id) order ``global_shuffle`` uses."""
    from pyspark.sql import Window

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    h = F.xxhash64(F.col(id_col).cast("string"), F.lit(int(seed)))
    out = docs.withColumn("shard", F.pmod(h, F.lit(int(n_shards))).cast("int"))
    w = (Window.partitionBy("shard")
         .orderBy(h.asc(), F.col(id_col).asc()))
    return out.withColumn("shard_pos", (F.row_number().over(w) - 1).cast("bigint"))


def write_shards(docs: DataFrame, path: str, n_shards: int, seed: int = 0,
                 id_col: str = "doc_id") -> DataFrame:
    """Write ``docs`` as ``n_shards`` parquet shard directories
    (``shard=K/``), each internally ordered by the deterministic
    shuffle key — re-running on the same input produces byte-stable
    shard membership and row order. Returns the manifest (shard,
    n_rows) as a DataFrame.

    Plan: one shuffle (repartition on the shard column — every shard
    is exactly one write task via partitionBy) + an in-partition sort;
    no driver-side loop over shards, so 10^5 shards cost the same
    orchestration as 10."""
    assigned = shard_assignments(docs, n_shards, seed, id_col)
    (assigned.repartition(int(n_shards), F.col("shard"))
     .sortWithinPartitions(F.col("shard"), F.col("shard_pos"))
     .write.mode("overwrite").partitionBy("shard").parquet(path))
    spark = docs.sparkSession
    return (spark.read.parquet(path)
            .groupBy("shard").agg(F.count(F.lit(1)).alias("n_rows"))
            .orderBy("shard"))


def mix_corpora(docs: DataFrame, weights: dict[str, float],
                key_col: str = "source", id_col: str = "doc_id",
                total_rows: int | None = None, seed: int = 0,
                max_repeat: int = 100) -> DataFrame:
    """Deterministic corpus mixing — resample so each key's share of
    the output matches ``weights`` (the Dolma / RedPajama / Pile
    source-weighting step between curation and shuffling). A key's
    sampling rate may exceed 1: whole epochs duplicate every row
    (``repeat_idx`` marks the copy) and the fractional remainder is a
    seeded-hash thin, so the result is a pure function of
    (id, seed) — identical across runs, machines and partitionings.
    Keys absent from ``weights`` are dropped.

    ``total_rows`` sets the target output size (default: the summed
    row count of the weighted keys, i.e. same-size remix). The only
    driver action is one tiny groupBy(key).count() collect — bounded
    by the number of corpora, not rows; selection itself is a narrow
    explode + filter, no extra shuffle."""
    if not weights:
        raise ValueError("weights must name at least one corpus key")
    if any(w < 0 for w in weights.values()) or sum(weights.values()) <= 0:
        raise ValueError("weights must be non-negative and sum > 0")
    counts = {
        r["k"]: r["n"]
        for r in (docs.where(F.col(key_col).isin(list(weights)))
                  .groupBy(F.col(key_col).alias("k"))
                  .agg(F.count(F.lit(1)).alias("n")).collect())}
    missing = [k for k in weights if k not in counts]
    if missing:
        raise ValueError(f"weighted keys absent from the corpus: {missing}")
    wsum = float(sum(weights.values()))
    total = int(total_rows) if total_rows is not None else sum(counts.values())
    rates = {k: (weights[k] / wsum * total) / counts[k] for k in weights}
    too_hot = {k: r for k, r in rates.items() if r > max_repeat}
    if too_hot:
        raise ValueError(
            f"repeat factor over max_repeat={max_repeat} for {too_hot}; "
            "raise max_repeat explicitly if many epochs are intended")
    # per-key (whole epochs, fractional remainder in millionths)
    n_rep = F.create_map(*[
        x for k, r in rates.items() for x in (F.lit(k), F.lit(int(r)))])
    frac_ppm = F.create_map(*[
        x for k, r in rates.items()
        for x in (F.lit(k), F.lit(int(round((r - int(r)) * 1_000_000))))])
    h = F.pmod(F.xxhash64(F.col(id_col).cast("string"), F.lit(int(seed))),
               F.lit(1_000_000))
    out = (docs.where(F.col(key_col).isin(list(weights)))
           .withColumn("__nrep", n_rep[F.col(key_col)])
           .withColumn("__frac", frac_ppm[F.col(key_col)])
           .withColumn("repeat_idx",
                       F.explode(F.sequence(F.lit(0), F.col("__nrep"))))
           .where((F.col("repeat_idx") < F.col("__nrep"))
                  | (h < F.col("__frac")))
           .drop("__nrep", "__frac"))
    return out
