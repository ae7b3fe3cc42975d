"""Model-based quality classification — the fastText-shaped filter the
big public pipelines run after the cheap heuristics (CCNet trains a
wiki-vs-crawl classifier; RefinedWeb and FineWeb-Edu gate on a learned
quality score). From scratch on Spark: logistic regression over
hashing-trick word uni+bigram features, trained by distributed
full-batch gradient descent.

Spark-first split of work:
- featurization is pure JVM column expressions (split -> xxhash64 -> pmod
  index arrays, codegen'd, no Python);
- each epoch is ONE job: an Arrow-batched ``mapInPandas`` computes dense
  per-partition gradient partials against the broadcast weight vector
  (fastText-style mean-of-token-weights linear layer), the driver sums
  the bounded partials (n_partitions x 8·n_features bytes — the frame is
  coalesced to ``grad_partitions`` first so the collect is capped) and
  steps. Weights are 2^18 float64 = 2 MiB by default: broadcastable at
  any corpus size; epochs, not rows, bound driver traffic.

The reference engine has no ML surface; this lives on the LLM side
(SURVEY §2.12).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_FEATURES = 1 << 18


def featurize(docs: DataFrame, text_col: str = "text",
              n_features: int = DEFAULT_FEATURES, seed: int = 0) -> DataFrame:
    """Adds ``__fidx``: hashed feature indices of lowercased word
    unigrams + bigrams (hashing trick, disjoint seeds per n-gram
    order). Pure JVM expressions — the array rides Arrow into the
    gradient kernel."""
    words = F.filter(F.split(F.lower(F.col(text_col)), r"(?U)\s+", -1),
                     lambda w: F.length(w) > 0)
    nw = F.size(words)
    bigrams = F.zip_with(
        F.slice(words, 1, F.greatest(nw - 1, F.lit(0))),
        F.slice(words, 2, F.greatest(nw - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b))
    uni = F.transform(words, lambda w: F.pmod(
        F.xxhash64(w, F.lit(int(seed))), F.lit(int(n_features))).cast("int"))
    bi = F.transform(bigrams, lambda g: F.pmod(
        F.xxhash64(g, F.lit(int(seed) + 1)), F.lit(int(n_features))).cast("int"))
    return docs.withColumn("__fidx", F.concat(uni, bi))


def _grad_kernel(n_features: int, bc_w, bc_b):
    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w = bc_w.value
        b = bc_b.value
        grad = np.zeros(n_features, dtype=np.float64)
        gb = 0.0
        n = 0
        loss = 0.0
        for pdf in batches:
            for idx_arr, y in zip(pdf["__fidx"], pdf["__y"]):
                if idx_arr is None or y is None or y != y:
                    continue  # NULL text/label rows carry no gradient
                idx = np.asarray(idx_arr, dtype=np.int64)
                if idx.size == 0:
                    continue
                inv = 1.0 / idx.size
                z = w[idx].sum() * inv + b
                p = 1.0 / (1.0 + np.exp(-z))
                err = p - float(y)
                np.add.at(grad, idx, err * inv)
                gb += err
                n += 1
                eps = 1e-12
                loss -= float(y) * np.log(p + eps) + (1 - float(y)) * np.log(1 - p + eps)
        yield pd.DataFrame({"grad": [grad.tobytes()], "gb": [gb],
                            "n": [n], "loss": [loss]})

    return compute


def train_quality_classifier(docs: DataFrame, label_col: str,
                             text_col: str = "text",
                             n_features: int = DEFAULT_FEATURES,
                             epochs: int = 60, lr: float = 10.0,
                             l2: float = 1e-6, seed: int = 0,
                             grad_partitions: int = 32) -> dict:
    """Distributed full-batch logistic regression. ``label_col`` is
    0/1 (1 = high quality, e.g. a curated reference corpus vs raw
    crawl). Returns ``{"w": ndarray, "b": float, "n_features": int,
    "seed": int, "losses": [per-epoch mean loss]}`` — feed to
    ``score_quality``. Deterministic: full-batch gradients have no
    sampling order, so the model is a pure function of (corpus,
    hyperparameters). The default ``lr`` looks large because the
    fastText-style mean-of-token features scale each per-weight
    gradient by ~1/n_tokens^2; the loss is convex, so the bound is
    curvature — lr=10 descends monotonically on word-bag corpora,
    larger rates oscillate before converging."""
    spark = docs.sparkSession
    feat = (featurize(docs, text_col, n_features, seed)
            .select(F.col("__fidx"),
                    F.col(label_col).cast("double").alias("__y"))
            .coalesce(int(grad_partitions))
            .persist())
    try:
        w = np.zeros(n_features, dtype=np.float64)
        b = 0.0
        losses = []
        schema = "grad binary, gb double, n long, loss double"
        for _ in range(int(epochs)):
            bc_w = spark.sparkContext.broadcast(w)
            bc_b = spark.sparkContext.broadcast(b)
            parts = feat.mapInPandas(
                _grad_kernel(int(n_features), bc_w, bc_b), schema).collect()
            bc_w.unpersist()
            bc_b.unpersist()
            g = np.zeros(n_features, dtype=np.float64)
            gb = 0.0
            n = 0
            loss = 0.0
            for r in parts:
                g += np.frombuffer(r["grad"], dtype=np.float64)
                gb += r["gb"]
                n += r["n"]
                loss += r["loss"]
            if n == 0:
                raise ValueError("no rows with at least one token")
            w -= lr * (g / n + l2 * w)
            b -= lr * (gb / n)
            losses.append(loss / n)
        return {"w": w, "b": b, "n_features": int(n_features),
                "seed": int(seed), "losses": losses}
    finally:
        feat.unpersist()


def score_quality(docs: DataFrame, model: dict,
                  text_col: str = "text") -> DataFrame:
    """Adds ``quality_prob`` (sigmoid of the linear score). One
    broadcast of the weight vector, one Arrow pass; empty docs score
    sigmoid(b)."""
    n_features = int(model["n_features"])
    spark = docs.sparkSession
    bc_w = spark.sparkContext.broadcast(np.asarray(model["w"], dtype=np.float64))
    b = float(model["b"])
    feat = featurize(docs, text_col, n_features, int(model["seed"]))
    cols = [c for c in feat.columns if c != "__fidx"]
    schema_tail = ", quality_prob double"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w = bc_w.value
        for pdf in batches:
            probs = np.empty(len(pdf), dtype=np.float64)
            for i, idx_arr in enumerate(pdf["__fidx"]):
                if idx_arr is None:
                    probs[i] = np.nan  # NULL text scores NULL, not 0.5
                    continue
                idx = np.asarray(idx_arr, dtype=np.int64)
                z = (w[idx].sum() / idx.size if idx.size else 0.0) + b
                probs[i] = 1.0 / (1.0 + np.exp(-z))
            out = pdf.drop(columns=["__fidx"])
            out["quality_prob"] = probs
            yield out

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in feat.schema.fields if f.name != "__fidx") + schema_tail
    return feat.select(*cols, "__fidx").mapInPandas(kernel, out_schema)
