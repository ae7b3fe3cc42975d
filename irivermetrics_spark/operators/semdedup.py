"""SemDeDup-style semantic deduplication over embedding columns.

Near-duplicate *meaning* (not near-duplicate bytes): cluster the
embedding space with k-means, then compare pairs ONLY within a
cluster — the Abbas et al. 2023 "SemDeDup" recipe that made semantic
pruning tractable on LAION/web-text corpora. MinHash (dedup.py) finds
lexical copies; SRP near-dup (similarity.py) finds high-cosine pairs
bucketed by random projections; this operator finds them bucketed by
*learned* structure, which concentrates genuinely-similar pairs far
better when the corpus is clusterable.

Spark-first shape (designed for the 10^9-row regime):

1. **train** — reuse the IVF coarse quantizer (ivf.train_centroids):
   a bounded deterministic sample to the driver, a few Lloyd
   iterations in numpy. The model is k×dim floats — tiny; broadcast.
2. **assign** — one vectorized pandas-UDF pass over the corpus
   (ivf.ivf_assign); embarrassingly parallel, no shuffle.
3. **pair scan** — a self-equi-join ON THE CLUSTER ID. With k chosen
   ~sqrt(N) the expected per-cluster candidate work is O(N) total,
   never the all-pairs cross product. Exact JVM-side cosine
   (similarity.cosine_expr) filters at the threshold.
4. **keep** — connected components over the duplicate pairs
   (dedup.cluster_duplicates / keep_canonical share the distributed
   union-find in distccl.resolve_components); keeper = min id.

``n_clusters=1`` degenerates to the exact brute-force pair scan — the
configuration the DuckDB oracle pins bit-for-bit (the same
nprobe=n_lists trick that makes ann_ivf provably exact). Recall at
n_clusters>1 is pinned by pytest on clusterable synthetic data.

Reference scope note: the reference engine (tayerthiaggo/irivermetrics)
has no embedding operators at all — this is part of the LLM-pipeline
extension surface, same family as operators/similarity.py.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import ivf
from .similarity import cosine_expr


def semdedup_pairs(embeddings: DataFrame, n_clusters: int = 16, threshold: float = 0.95,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   sample: int = 2048, iters: int = 8, seed: int = 13,
                   round_to: int | None = None,
                   centroids: np.ndarray | None = None,
                   assigned: DataFrame | None = None) -> DataFrame:
    """(id_a, id_b, cosine) with cosine >= threshold, compared within
    k-means clusters only.

    centroids / assigned: pass a trained model and a persisted
    ``ivf.ivf_assign`` output to amortize across repeated calls (the
    assigned table IS the index at scale — same contract as
    ivf.ivf_topk). round_to rounds the cosine BEFORE thresholding so a
    cross-engine last-ulp difference cannot flip a borderline pair.
    """
    if n_clusters < 1:
        raise ValueError(f"n_clusters={n_clusters} must be >= 1")
    if assigned is None:
        if centroids is None:
            if n_clusters == 1:
                # exact mode needs no model — every row lands in list 0
                assigned = embeddings.select(
                    F.col(id_col).alias("id"), F.col(vec_col).alias("vec"),
                    F.lit(0).alias("list_id"))
            else:
                centroids = ivf.train_centroids(
                    embeddings, n_lists=n_clusters, sample=sample, iters=iters,
                    seed=seed, vec_col=vec_col)
        if assigned is None:
            assigned = ivf.ivf_assign(embeddings, centroids, id_col, vec_col)
    left = assigned.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"), "list_id")
    right = assigned.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"), "list_id")
    cos = cosine_expr("vec_a", "vec_b")
    if round_to is not None:
        cos = F.round(cos, round_to)
    return (
        left.join(right, "list_id")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def semdedup_keep(embeddings: DataFrame, n_clusters: int = 16, threshold: float = 0.95,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  **kwargs) -> DataFrame:
    """Rows that survive semantic dedup: duplicate components collapse
    to their min-id keeper (connected components over the pair graph,
    so A~B, B~C keeps only A even when cos(A,C) < threshold)."""
    from .dedup import keep_canonical

    pairs = semdedup_pairs(embeddings, n_clusters, threshold, id_col, vec_col, **kwargs)
    return keep_canonical(embeddings, pairs, id_col=id_col)
