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
