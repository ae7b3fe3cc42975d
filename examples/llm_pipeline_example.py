"""End-to-end training-data preparation over the synthetic corpus:
the LLM-pipeline operator suite chained the way a real 100 TB curation
job would run.

    documents --exact dedup--> --duplicated-span removal-->
              --boilerplate line removal--> --quality + repetition filter-->
              --MinHash-LSH near-dup clusters--> --keeper per cluster-->
    embeddings --IVF ANN--> nearest-neighbor retrieval for the keepers
    train split --pack to 512 tokens--> --global shuffle--> N shards

Every stage is a DataFrame transformation (bucketed candidate
generation, no all-pairs anywhere); the same code runs unchanged on a
multi-executor cluster — parallelism only changes partition counts.

Run:  python examples/llm_pipeline_example.py  [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from irivermetrics_spark.operators import dedup, ivf, textops  # noqa: E402
from irivermetrics_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("llm_pipeline", master="local[8]", shuffle_partitions=16)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 0. HTML -> text front door: a real crawl arrives as markup, so
    # simulate the page chrome (head/script/nav/footer) around each
    # synthetic body, then strip it with the from-scratch extractor —
    # the nav/footer link blocks fall to the link-density cut and the
    # body survives verbatim. Rows with broken markup would land in
    # html_error instead of failing the job.
    from irivermetrics_spark.operators import htmltext

    pages = docs.withColumn(
        "html",
        F.concat(
            F.lit("<html><head><title>page</title><script>var a=1;"
                  "</script></head><body><nav><a href='/'>Home</a> "
                  "<a href='/x'>About</a> <a href='/y'>More</a></nav><p>"),
            F.col("text"),
            F.lit("</p><footer><a href='/t'>Terms</a> "
                  "<a href='/p'>Privacy</a></footer></body></html>")))
    docs = (htmltext.with_html_text(pages.drop("text"))
            .where(F.col("html_error").isNull())
            .drop("html", "html_blocks_kept", "html_blocks_dropped",
                  "html_error"))

    # 1. exact dedup (md5 groupBy, one shuffle): keep the min-id doc
    # of every identical-text group
    keep_ids = docs.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")).select("doc_id")
    exact = docs.join(keep_ids, "doc_id")
    n1 = exact.count()

    # 1b. exact duplicated-span removal (ExactSubstr, Lee et al. 2022):
    # excise every repeated 8-token span except its globally-first
    # occurrence — rolling-hash window joins, one shuffle
    from irivermetrics_spark.operators import spandedup

    despanned = spandedup.remove_duplicate_spans(
        exact.select(F.col("doc_id").cast("string").alias("doc_id"), "text"),
        k=8)
    n1b = despanned.where(F.col("n_tokens_removed") > 0).count()
    exact = (exact.drop("text").join(
        despanned.select(F.col("doc_id").cast("bigint").alias("doc_id"), "text"),
        "doc_id"))

    # 1c. cross-document boilerplate removal (C4/RefinedWeb line
    # dedup): drop lines repeated across >= 25 docs — nav menus,
    # footers, cookie banners. The synthetic corpus is single-line
    # word soup, so simulate the crawl chrome a real shard carries: a
    # per-site footer line on every page (exactly what this stage
    # exists to strip — the page body survives untouched)
    exact = exact.withColumn(
        "text", F.concat_ws("\n", F.col("text"),
                            F.concat(F.lit("(c) "), F.col("source"),
                                     F.lit(" - subscribe to our newsletter"))))
    exact = textops.remove_repeated_lines(exact, min_df=25)
    n_boiler = exact.where(F.col("lines_removed") > 0).count()
    exact = exact.drop("lines_removed")

    # 2. quality + repetition gate + PII scrub (all JVM column
    # expressions — the pii regexp chain fuses into the same scan)
    feats = textops.with_pii_redaction(
        textops.with_repetition_signals(textops.with_text_features(exact)))
    kept = feats.filter(
        (F.col("quality") >= 0.3) & (F.col("dup_line_frac") <= 0.3)
        & (F.col("top_bigram_frac") <= 0.5))
    n_pii = kept.where("has_pii").count()
    kept = kept.drop("text").withColumnRenamed("redacted_text", "text")

    # 2b. CCNet-style perplexity gate: train a char-trigram LM on the
    # surviving corpus, drop the worst-perplexity tail (OOV-heavy /
    # non-fluent pages). One groupBy to train, broadcast join to score.
    lm, oov_logp, _ = textops.train_char_lm(kept)
    lm = lm.persist()
    scored = textops.with_perplexity(kept, lm, oov_logp)
    cut = scored.approxQuantile("perplexity", [0.95], 0.01)[0]
    kept = scored.filter(F.col("perplexity") <= cut)
    n2 = kept.count()

    # 3. MinHash-LSH near-dup clusters -> one keeper per cluster
    cand = dedup.lsh_candidates(kept, "doc_id", "text")
    pairs = dedup.exact_jaccard_pairs(kept, cand).filter(F.col("jaccard") >= 0.8)
    # keeper = the highest-quality member of each cluster (not an
    # arbitrary min-id): the well-formed copy of a page survives
    keepers = dedup.keep_canonical(kept, pairs, "doc_id", rank_col="quality")
    n3 = keepers.count()

    # 4. ANN retrieval over the embedding table for a sample of keepers
    em = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = ivf.train_centroids(em, n_lists=8)
    assigned = ivf.ivf_assign(em, cents).persist()
    queries = em.limit(5)
    hits = ivf.ivf_topk(em, queries, cents, k=3, nprobe=3, assigned=assigned)
    n4 = hits.count()

    # 5. the 10^9-vector memory-bound variant of the same retrieval:
    # IVF list routing + product-quantized (m-byte) scoring inside the
    # probed lists + exact rerank — the persisted (id, list_id, codes)
    # index IS the ANN index at scale
    from irivermetrics_spark.operators import pq

    books = pq.train_pq(em, m=8, k=32)
    index = pq.ivf_pq_index(em, cents, books).persist()
    hits_pq = pq.ivf_pq_topk(em, queries, cents, books, topk=3, nprobe=3,
                             shortlist=8, index=index)
    n5 = hits_pq.count()

    # 6. final training prep: stable train/val/test split, then pack
    # the train docs into fixed-token-budget sequences (bucketed FFD)
    from irivermetrics_spark.operators import packing

    split = textops.split_by_hash(keepers)
    # pack budgets count REAL tokens: train the byte-level BPE on the
    # surviving corpus and recount post-redaction text with it (the
    # whitespace word count undercounts by the subword factor)
    from irivermetrics_spark.operators import bpe

    tok = bpe.train_bpe(keepers, vocab_size=512)
    train = (bpe.with_bpe_tokens(split.where("split = 'train'"), tok,
                                 with_ids=False)
             .withColumn("n_tokens", F.col("bpe_n_tokens").cast("bigint"))
             .drop("bpe_n_tokens"))
    packed = packing.pack_sequences(train, seq_len=512, n_buckets=8)
    n_packs = packed.select("pack_id").distinct().count()
    fill = packed.groupBy("pack_id").agg(F.first("pack_total").alias("t")) \
        .agg(F.round(F.avg("t") / 512, 3).alias("f")).first()["f"]

    # 7. ship it: the PACKED artifact (doc rows tagged with their
    # pack) goes through the deterministic shuffle into N stable
    # parquet shards. Sharding on pack_id keeps every pack whole
    # inside one shard; doc_id rides along as the within-pack order.
    import tempfile

    from irivermetrics_spark.operators import sharding

    out_dir = os.path.join(tempfile.mkdtemp(prefix="irm_shards_"), "train")
    shipped = (train.select("doc_id", "text")
               .join(packed.where(~F.col("oversize"))
                     .select(F.col("doc_id").cast("bigint").alias("doc_id"),
                             "pack_id"), "doc_id"))
    manifest = sharding.write_shards(shipped, out_dir, n_shards=4,
                                     id_col="pack_id",
                                     extra_order_cols=["doc_id"]).toPandas()

    # 8. SFT tail: a conversation table (synthesized from the curated
    # docs) flattens into templated training text + assistant loss
    # spans in one pure-JVM fold — the same chat-formatting front door
    # an instruction-tuning corpus runs before packing.
    from irivermetrics_spark.operators import chatformat

    convos = keepers.limit(50).select(
        "doc_id",
        F.array(
            F.struct(F.lit("user").alias("role"),
                     F.concat(F.lit("Summarize: "),
                              F.substring("text", 1, 120)).alias("content")),
            F.struct(F.lit("assistant").alias("role"),
                     F.substring("text", 1, 60).alias("content")),
        ).alias("messages"))
    sft = chatformat.format_chat(convos)
    n_sft = sft.where("text IS NOT NULL").count()
    span_rows = sft.select(F.explode("assistant_spans")).count()

    print(f"\ndocuments: {n0} -> exact-deduped {n1} "
          f"(span-trimmed {n1b}, boilerplate-trimmed {n_boiler}) "
          f"-> quality-kept {n2} "
          f"(pii-scrubbed {n_pii}) "
          f"-> near-dup keepers {n3}; ANN rows for 5 queries: {n4} "
          f"(IVF exact-rerank) / {n5} (IVF-routed PQ); "
          f"train split packed into {n_packs} x 512-token sequences "
          f"at {fill:.1%} mean fill; "
          f"shipped {int(manifest['n_rows'].sum())} rows as "
          f"{len(manifest)} stable shards -> {out_dir}; "
          f"SFT tail: {n_sft} conversations formatted with "
          f"{span_rows} assistant loss spans")
    print(hits.orderBy("query_id", "rank").toPandas().to_string(index=False))
    spark.stop()


if __name__ == "__main__":
    main()
