"""Skew handling: explicit key salting (P13).

Dense river-corridor cells (or hot users/dates in the relational
tables) concentrate rows on few keys; AQE's skew-join splitting covers
joins, but skewed *aggregations* benefit from classic two-phase
salting: add salt = pmod(hash(row), buckets), partially aggregate on
(key, salt), then finish on key. Both phases are plain hash aggregates
— the salt only widens the shuffle key space of the first phase.

The reference has no skew machinery (it loops features serially,
SURVEY.md §4 P13); this is the engine's scale-path addition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, entropy_cols: list[str], buckets: int = 16,
              col_name: str = "salt") -> DataFrame:
    """Deterministic salt column derived from row content."""
    return df.withColumn(col_name, F.pmod(F.xxhash64(*entropy_cols), F.lit(buckets)))


def salted_agg(df: DataFrame, keys: list[str], entropy_cols: list[str],
               aggs: dict[str, Column], buckets: int = 16) -> DataFrame:
    """Two-phase salted aggregation for sum/count-like (associative)
    aggregates: partial on (keys + salt), final on keys.

    ``aggs`` maps output name -> phase-1 aggregate column; phase 2 sums
    the partials (correct for sum/count; compose avg as sum/count).
    """
    salted = with_salt(df, entropy_cols, buckets)
    partial = salted.groupBy(*keys, "salt").agg(
        *[c.alias(f"__p_{name}") for name, c in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(f"__p_{name}").alias(name) for name in aggs]
    )
