"""Sequence packing: assemble variable-length documents into
fixed-token-budget training sequences (the sample-packing step between
curation and tokenizer sharding — T5/LLM pretraining's "pack to 512 /
8192 tokens with minimal padding").

Exact global bin packing is NP-hard and inherently sequential; the
distributed-standard approximation used here is bucketed first-fit-
decreasing: documents hash into independent buckets (one shuffle),
each bucket runs FFD locally in an ``applyInPandas`` group. Fill
ratios stay within a few percent of global FFD because token-length
distributions are i.i.d. across hash buckets, while every bucket
packs in parallel and bucket size — not corpus size — bounds executor
memory. Assignment is fully deterministic: bucket = seeded id-hash,
within-bucket order = (tokens desc, id), so re-runs and different
input partitionings produce identical packs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACKED_SCHEMA = ("doc_id string, n_tokens bigint, bucket int, pack_id string, "
                 "pack_total bigint, pack_docs int, oversize boolean")


def pack_sequences(docs: DataFrame, seq_len: int, token_col: str = "n_tokens",
                   id_col: str = "doc_id", n_buckets: int | None = None,
                   seed: int = 0) -> DataFrame:
    """Returns one row per document with its pack assignment:
    ``pack_id`` ("<bucket>-<k>"), ``pack_total`` (token sum of the
    pack), ``pack_docs``, and ``oversize`` (doc alone exceeds
    ``seq_len`` — packed alone; truncation is the caller's policy
    decision, not silently applied here).

    One shuffle (repartition by bucket); per-bucket FFD is O(n log n)
    sort + first-fit scan. Choose ``n_buckets`` ~ cluster cores at
    scale; defaults to the session's default parallelism.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len {seq_len} must be positive")
    spark = docs.sparkSession
    if n_buckets is None:
        n_buckets = spark.sparkContext.defaultParallelism
    n_buckets = max(int(n_buckets), 1)

    d = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.col(token_col).cast("bigint").alias("n_tokens"),
        F.pmod(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)),
               F.lit(n_buckets)).cast("int").alias("bucket"))

    def ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        bad = pdf[pdf["n_tokens"].isna()]
        if len(bad):
            # a null count would otherwise surface as an opaque
            # NaN-to-int pandas error deep in the task — name the rows
            ids = ", ".join(sorted(bad["doc_id"].astype(str))[:5])
            raise ValueError(
                f"pack_sequences: null n_tokens for doc_id(s) {ids}"
                f"{'...' if len(bad) > 5 else ''} — compute token counts "
                "(textops.token_count) or filter null rows before packing")
        pdf = pdf.sort_values(["n_tokens", "doc_id"],
                              ascending=[False, True], kind="mergesort")
        bucket = int(pdf["bucket"].iloc[0])
        remaining: list[int] = []   # free capacity per open pack
        members: list[list[int]] = []
        assign = []
        for row_i, (tok,) in enumerate(zip(pdf["n_tokens"])):
            tok = int(tok)
            placed = None
            if tok <= seq_len:
                for b, free in enumerate(remaining):
                    if free >= tok:
                        placed = b
                        break
            if placed is None:
                placed = len(remaining)
                remaining.append(seq_len)
                members.append([])
            remaining[placed] -= tok
            members[placed].append(row_i)
            assign.append(placed)
        totals = [seq_len - r for r in remaining]
        ndocs = [len(m) for m in members]
        out = pdf.copy()
        out["pack_id"] = [f"{bucket}-{b}" for b in assign]
        out["pack_total"] = [totals[b] for b in assign]
        out["pack_docs"] = [ndocs[b] for b in assign]
        out["oversize"] = out["n_tokens"] > seq_len
        return out

    # applyInPandas guarantees each bucket arrives WHOLE in one call
    # (mapInPandas would split large partitions into Arrow batches and
    # fracture a bucket into colliding pack_ids)
    return d.groupBy("bucket").applyInPandas(ffd, PACKED_SCHEMA)
