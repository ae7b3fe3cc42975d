"""Experiment (r8): break down exact_jaccard's shingle-collect leg and
prototype a toArrow() zero-copy variant (guide §4.2).

Current path: sh.toPandas() -> per-row dict of np arrays -> sc.broadcast
(pickles ~n_docs small arrays). Candidate: sh.toArrow() -> one
(ids, offsets, values) triple -> broadcast two large numpy buffers +
id list; executors rebuild the dict lazily (memoized per broadcast).

This script only MEASURES the driver-side legs, interleaved; values
compared exactly.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def main():
    from pyspark.sql import functions as F, types as T

    import __spark_entry__ as entrymod
    from irivermetrics_spark.operators import dedup
    from irivermetrics_spark.operators.dedup import _shingles
    from irivermetrics_spark.session import get_spark

    sf_dir = "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("exp_shcollect", master=f"local[{cpus}]",
                      shuffle_partitions=max(8, int(cpus)))
    sc = spark.sparkContext

    d = entrymod._t(spark, sf_dir, "documents")
    n_docs = d.count()
    target = sc.defaultParallelism
    ds = d.select(F.col("doc_id").alias("id"), F.col("text").alias("txt"))
    if ds.rdd.getNumPartitions() < target:
        ds = ds.repartition(target)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def shing(txt: pd.Series) -> pd.Series:
        return pd.Series([
            _shingles(t, 5).astype(np.int64).tolist() for t in txt])

    sh = ds.select("id", shing("txt").alias("sh"))

    def leg_pandas():
        t0 = time.perf_counter()
        pdf = sh.toPandas()
        t1 = time.perf_counter()
        lookup = {(i.item() if hasattr(i, "item") else i): np.asarray(v, dtype=np.int64)
                  for i, v in zip(pdf["id"], pdf["sh"])}
        t2 = time.perf_counter()
        bc = sc.broadcast(lookup)
        # force serialization cost now (broadcast pickles eagerly on creation)
        t3 = time.perf_counter()
        return (t1 - t0, t2 - t1, t3 - t2), lookup, bc

    def leg_arrow():
        t0 = time.perf_counter()
        tbl = sh.toArrow()
        t1 = time.perf_counter()
        col = tbl.column("sh").combine_chunks()
        values = np.asarray(col.values, dtype=np.int64)
        offsets = np.asarray(col.offsets, dtype=np.int64)
        ids = tbl.column("id").to_pylist()
        t2 = time.perf_counter()
        bc = sc.broadcast((ids, offsets, values))
        t3 = time.perf_counter()
        return (t1 - t0, t2 - t1, t3 - t2), (ids, offsets, values), bc

    # warm both once
    (_, lookup, b1) = leg_pandas(); b1.destroy()
    (_, triple, b2) = leg_arrow(); b2.destroy()

    # value identity: rebuild dict from triple, compare exactly
    ids, offsets, values = triple
    rebuilt = {ids[i]: values[offsets[i]:offsets[i + 1]] for i in range(len(ids))}
    assert set(rebuilt) == set(lookup), "id sets differ"
    for k in lookup:
        assert np.array_equal(lookup[k], rebuilt[k]), f"shingles differ for {k}"
    total_sh = int(values.shape[0])
    print(f"docs={n_docs} total_shingles={total_sh} "
          f"bytes={values.nbytes + offsets.nbytes}", flush=True)

    # interleaved timing
    for rep in range(4):
        (tp, _, bp) = leg_pandas(); bp.destroy()
        (ta, _, ba) = leg_arrow(); ba.destroy()
        print(f"rep{rep} pandas collect={tp[0]:.3f} dict={tp[1]:.3f} bcast={tp[2]:.3f} "
              f"| arrow collect={ta[0]:.3f} unpack={ta[1]:.3f} bcast={ta[2]:.3f}",
              flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
