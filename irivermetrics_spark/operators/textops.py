"""Text-analysis operators for large-scale training-data pipelines.

All JVM-side built-in expressions (codegen'd, shuffle-light) except the
document fingerprint, which is a vectorized pandas UDF (polynomial
rolling hash — no SQL equivalent). Operates on the ``documents`` table
(doc_id, text, lang, source, n_chars).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small marker lexicon for the n-gram language heuristic
EN_MARKERS = [" the ", " and ", " of ", " a "]


def token_count(text: Column) -> Column:
    """Whitespace token count (limit -1 keeps trailing empties so the
    result matches ANSI string_split semantics exactly)."""
    return F.size(F.split(text, " ", -1)).cast("bigint")


def punct_ratio(text: Column) -> Column:
    """Fraction of punctuation characters."""
    stripped = F.regexp_replace(text, r"[^\w\s]", "")
    return (F.length(text) - F.length(stripped)) / F.greatest(F.length(text), F.lit(1))


def marker_score(text: Column, markers: list[str] = EN_MARKERS) -> Column:
    """Language-ID heuristic: total occurrences of marker n-grams per
    100 chars (occurrences counted via length-difference — pure SQL)."""
    occ = None
    for m in markers:
        c = (F.length(text) - F.length(F.replace(text, F.lit(m), F.lit("")))) / F.lit(len(m))
        occ = c if occ is None else occ + c
    return occ * 100.0 / F.greatest(F.length(text), F.lit(1))


def quality_score(text: Column) -> Column:
    """Composite quality score: length band + punctuation sanity +
    marker density (the usual cheap pretraining filters)."""
    n = F.length(text)
    len_ok = F.when((n >= 100) & (n <= 20000), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(text) < 0.2, 1.0).otherwise(0.0)
    markers = F.least(marker_score(text) / 5.0, F.lit(1.0))
    return (len_ok + punct_ok + markers) / 3.0


def with_text_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return (
        docs.withColumn("n_tokens", token_count(t))
        .withColumn("punct_ratio", punct_ratio(t))
        .withColumn("marker_score", marker_score(t))
        .withColumn("quality", quality_score(t))
    )


FP_BASE = np.uint64(1000003)
FP_MOD_MASK = np.uint64((1 << 61) - 1)


def fingerprint_series(texts: pd.Series) -> pd.Series:
    """Deterministic 61-bit polynomial rolling hash of normalized text."""
    out = np.empty(len(texts), dtype=np.int64)
    for i, s in enumerate(texts):
        data = np.frombuffer(" ".join(str(s).lower().split()).encode("utf-8"), dtype=np.uint8)
        h = np.uint64(0)
        for chunk_start in range(0, len(data), 4096):
            chunk = data[chunk_start : chunk_start + 4096].astype(np.uint64)
            for b in chunk:
                h = ((h * FP_BASE) + b) & FP_MOD_MASK
        out[i] = np.int64(h)
    return pd.Series(out)


def with_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    fp = F.pandas_udf(fingerprint_series, "long")
    return docs.withColumn("fingerprint", fp(F.col(text_col)))
