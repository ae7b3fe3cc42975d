"""Experiment (r8): overlap banded-index materialization with the
shingle collect in the dedup_minhash bench shape (guide §2.6).

A: current serial shape. B: same, but banded.count() fired in an
InheritableThread right after persist so it runs while exact_jaccard
collects the shingle dim. Interleaved timing; results must be
identical (same plan, same values — only job overlap differs).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    from pyspark import InheritableThread
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from irivermetrics_spark.operators import dedup
    from irivermetrics_spark.session import get_spark

    sf_dir = "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("exp_overlap", master=f"local[{cpus}]",
                      shuffle_partitions=max(8, int(cpus)))
    sc = spark.sparkContext

    # warm
    noop(spark.range(100000).withColumn("x", F.xxhash64("id")))
    d0 = entrymod._t(spark, sf_dir, "documents")
    d0.count()

    def shape(overlap: bool):
        d = entrymod._t(spark, sf_dir, "documents")
        pers: list = []
        cand = dedup.lsh_candidates(d, "doc_id", "text", persisted_out=pers)
        if overlap:
            banded = pers[0]
            t = InheritableThread(target=lambda: banded.count(), daemon=True)
            t.start()
        out = dedup.exact_jaccard_pairs(d, cand).filter(F.col("jaccard") >= 0.5)
        noop(out)
        for p in pers:
            p.unpersist()

    # correctness: same rows either way
    import pandas as pd
    d = entrymod._t(spark, sf_dir, "documents")
    c1 = dedup.lsh_candidates(d, "doc_id", "text")
    r1 = dedup.exact_jaccard_pairs(d, c1).filter(F.col("jaccard") >= 0.5)
    n1 = r1.count()
    print("pairs rows:", n1, flush=True)

    for r in range(4):
        sc.setJobDescription(f"serial rep{r}")
        t0 = time.time(); shape(False); ts = time.time() - t0
        sc.setJobDescription(f"overlap rep{r}")
        t0 = time.time(); shape(True); to = time.time() - t0
        print(f"rep{r}: serial {ts:.3f}s  overlap {to:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
