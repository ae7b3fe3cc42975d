"""Per-stage profiling for the r8 optimization round (guide §1).

Times individual components of the bench queries with the noop sink so
we see where the wall-clock goes before changing anything. Not part of
the frozen bench contract — bench.py stays the official harness.

Usage: python tools/profile_r08.py [sf_dir] [what ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
WHAT = set(sys.argv[2:]) or {"minhash", "relational", "flagship"}


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"  {label:55s} {dt:7.3f} s", flush=True)
    return out


def main():
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from irivermetrics_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("profile_r08", master=f"local[{cpus}]",
                      shuffle_partitions=max(8, int(cpus)))
    sc = spark.sparkContext

    # warm python workers + codegen once
    warm = spark.range(100000).withColumn("x", F.xxhash64("id"))
    noop(warm)
    import pandas as pd

    def _warm_fn(it):
        for pdf in it:
            yield pdf
    noop(spark.range(10000).repartition(32).mapInPandas(_warm_fn, "id long"))

    if "minhash" in WHAT:
        from irivermetrics_spark.operators import dedup
        print("== dedup_minhash stage split ==", flush=True)
        sc.setJobDescription("minhash: read+count")
        d = timed("read documents (plan)", lambda: entrymod._t(spark, SF_DIR, "documents"))
        timed("documents count", lambda: d.count())
        t_all0 = time.time()
        sc.setJobDescription("minhash: signatures+banded persist")
        sig = dedup.minhash_signatures(d.select("doc_id", "text"), "text", 64, 5)
        banded = dedup._banded(sig, "doc_id", 64, 16).persist()
        timed("banded persist materialize (count)", lambda: banded.count())
        sc.setJobDescription("minhash: banded self-join pairs")
        lite = banded.select("band", "bucket", "id")
        pairs_ids = (
            lite.alias("l").join(lite.alias("r"), ["band", "bucket"])
            .where(F.col("l.id") < F.col("r.id"))
            .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"]))
        timed("self-join + dedup (noop)", lambda: noop(pairs_ids))
        sig1 = banded.filter(F.col("band") == 0).select("id", "minhash")
        cand = dedup._with_est_jaccard(pairs_ids, sig1, 64)
        sc.setJobDescription("minhash: est-jaccard join-back")
        timed("cand with est_jaccard (noop)", lambda: noop(cand))
        cand_p = cand.persist()
        cand_p.count()
        sc.setJobDescription("minhash: exact jaccard (dict path)")
        timed("exact_jaccard dict path on persisted cand (noop)",
              lambda: noop(dedup.exact_jaccard_pairs(d, cand_p).filter(F.col("jaccard") >= 0.5)))
        sc.setJobDescription("minhash: exact jaccard (jvm path)")
        timed("exact_jaccard JVM path on persisted cand (noop)",
              lambda: noop(dedup.exact_jaccard_pairs(d, cand_p, broadcast_shingles=False)
                           .filter(F.col("jaccard") >= 0.5)))
        print(f"  (stage-split total {time.time() - t_all0:.3f} s)")
        banded.unpersist()
        cand_p.unpersist()
        # full bench shape, twice
        def bench_shape():
            dd = entrymod._t(spark, SF_DIR, "documents")
            c = dedup.lsh_candidates(dd, "doc_id", "text")
            noop(dedup.exact_jaccard_pairs(dd, c).filter(F.col("jaccard") >= 0.5))
        sc.setJobDescription("minhash: full bench shape")
        timed("bench shape run 1", bench_shape)
        timed("bench shape run 2", bench_shape)

    if "relational" in WHAT:
        print("== relational: plan-build vs execute ==", flush=True)
        qs = dict(entrymod.queries())
        for name in ["j1_star", "a7_fold", "w2_topk", "j6_fill", "f6_validity",
                     "dedup_exact", "ann_brute", "text_quality"]:
            sc.setJobDescription(f"rel: {name}")
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            t_build = time.time() - t0
            t0 = time.time()
            noop(df)
            t_run1 = time.time() - t0
            t0 = time.time()
            df2 = qs[name](spark, SF_DIR)
            noop(df2)
            t_run2 = time.time() - t0
            print(f"  {name:20s} build {t_build:6.3f}  exec1 {t_run1:6.3f}  build+exec2 {t_run2:6.3f}", flush=True)

    if "textops" in WHAT or "relational" in WHAT:
        from irivermetrics_spark.operators import sharding, textops
        print("== c4_line_dedup / chunk_shard ==", flush=True)
        d = entrymod._t(spark, SF_DIR, "documents").select("doc_id", "text")
        sc.setJobDescription("c4: line dedup")
        timed("c4_line_dedup run1", lambda: noop(textops.remove_repeated_lines(d, min_df=25)))
        timed("c4_line_dedup run2", lambda: noop(textops.remove_repeated_lines(d, min_df=25)))
        def chunk_shape():
            chunks = textops.chunk_documents(d, max_tokens=128, overlap=16)
            cid = F.concat_ws("#", "doc_id", "chunk_idx")
            noop(sharding.shard_assignments(
                chunks.withColumn("chunk_id", cid), n_shards=64, id_col="chunk_id"))
        sc.setJobDescription("chunk_shard")
        timed("chunk_shard run1", chunk_shape)
        timed("chunk_shard run2", chunk_shape)

    if "flagship" in WHAT:
        import tempfile

        from irivermetrics_spark import synth
        from irivermetrics_spark.plans import pipeline
        print("== flagship stage split ==", flush=True)
        sf = 0.1
        n_scenes = max(1, int(round(320 * sf)))
        fx = timed("make_fixture", lambda: synth.make_fixture(
            w=326, h=111, n_dates=63, n_sections=7, n_scenes=n_scenes, seed=42))
        grid = dict(gx0=fx.gx0, gy0=fx.gy0, ps=fx.pixel_size, w=fx.w, h=fx.h)
        images = pipeline.images_df(spark, fx.images).repartition(32).persist()
        images.count()
        warm_fx = synth.make_fixture(w=326, h=111, n_dates=8, n_sections=7, n_scenes=1, seed=42)
        warm = pipeline.run(spark, pipeline.images_df(spark, warm_fx.images), warm_fx.reaches,
                            grid, mask_path=tempfile.mkdtemp(prefix="warm_"))
        warm["metrics"].count()

        for rep in range(2):
            t0 = time.time()
            sc.setJobDescription("flagship: pipeline.run() plan build")
            res = pipeline.run(spark, images, fx.reaches, grid,
                               mask_path=tempfile.mkdtemp(prefix="prof_mask_"))
            t_build = time.time() - t0
            t0 = time.time()
            sc.setJobDescription("flagship: metrics count")
            n = res["metrics"].count()
            t_run = time.time() - t0
            print(f"  rep{rep}: plan-build+maskwrite {t_build:6.3f}  metrics job {t_run:6.3f}  rows {n}", flush=True)
            res["water_joined"].unpersist()

        # decode-only timing
        from irivermetrics_spark.operators import decode
        import numpy as np
        rings = [(np.asarray(r["ring_x"]), np.asarray(r["ring_y"])) for r in fx.reaches]
        sc.setJobDescription("flagship: decode only")
        pts = decode.decode_points(images, grid, res=9, corridor_rings=rings)
        timed("decode_points only (noop)", lambda: noop(pts))
        timed("decode_points only again (noop)", lambda: noop(pts))

    spark.stop()


if __name__ == "__main__":
    main()
