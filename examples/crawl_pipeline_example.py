"""End-to-end CRAWL ingestion: the web front door ahead of the LLM
curation suite, chained the way a Common-Crawl-scale job would run.

    *.warc.gz --WARC record parse--> --HTTP split + charset decode-->
              --HTML -> text--> --URL normalize + canonical dedup-->
              --per-domain cap--> --blocklist--> --robots.txt filter-->
              curated text corpus

The WARC input is synthesized here from the testdata documents table
(each doc becomes an HTTP response record wrapping its text in page
chrome; a few poison files exercise the dead-letter path), then read
back through the REAL distributed reader — binaryFile scan, one
mapInPandas per step, file-grain parallelism (the Common Crawl layout:
many ~1 GB files; records inside a member-gzipped file are not
byte-range splittable without an external index).

Run:  python examples/crawl_pipeline_example.py  [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from irivermetrics_spark.kernels import warc as warck  # noqa: E402
from irivermetrics_spark.operators import htmltext, robots, urlops, warcingest  # noqa: E402
from irivermetrics_spark.session import get_spark  # noqa: E402


def synth_warcs(docs, outdir: str, files: int = 8) -> None:
    """Write the documents table out as member-gzipped WARC files —
    the synth step only; everything after runs the real readers."""
    rows = docs.select("doc_id", "text", "source").collect()
    buckets = [[] for _ in range(files)]
    for r in rows:
        dom = f"site{r.doc_id % 17}" + (".co.uk" if r.doc_id % 3 == 0 else ".com")
        url = (f"HTTP://WWW.{dom.upper()}:80/p/{r.doc_id}"
               f"?utm_source=crawl&id={r.doc_id % 5}")
        html = ("<html><head><title>t</title></head><body>"
                "<nav><a href='/'>Home</a> <a href='/a'>About</a> "
                f"<a href='/c'>Contact</a></nav><h1>{r.source}</h1>"
                f"<p>{r.text}</p><footer><a href='/t'>Terms</a> | "
                "<a href='/p'>Privacy</a></footer></body></html>").encode()
        http = warck.build_http_response(html, chunked=(r.doc_id % 4 == 0))
        buckets[r.doc_id % files].append(warck.build_record(
            "response", http, target_uri=url,
            content_type="application/http; msgtype=response"))
    for i, recs in enumerate(buckets):
        with open(os.path.join(outdir, f"crawl-{i:03d}.warc.gz"), "wb") as f:
            f.write(warck.write_warc_gz(recs))
    # poison: a corrupt archive must dead-letter, not fail the job
    with open(os.path.join(outdir, "crawl-bad.warc.gz"), "wb") as f:
        f.write(b"\x1f\x8b\x08\x00not really gzip at all")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("crawl_pipeline", master="local[8]", shuffle_partitions=16)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    with tempfile.TemporaryDirectory() as warc_dir:
        synth_warcs(docs, warc_dir)

        # 1. WARC -> decoded HTML pages (errors stay as rows, never fail)
        all_rows = warcingest.read_warc(spark, warc_dir)
        dead = all_rows.filter(F.col("warc_error").isNotNull()).count()
        pages = warcingest.read_warc_responses(spark, warc_dir)

        # 2. HTML -> text (boilerplate nav/footer cut by link density)
        texts = htmltext.with_html_text(
            pages.select(F.col("target_uri").alias("url"),
                         F.col("text").alias("html")))
        texts = texts.filter(F.col("html_error").isNull() & (F.col("text") != ""))

        # 3. URL canonicalization + registered domain
        parts = urlops.with_url_parts(texts)
        n_pages = parts.count()

        # 4. canonical-URL dedup (re-crawls of ?utm variants collapse),
        #    then per-domain cap and a blocklist
        parts = parts.withColumn("doc_id",
                                 F.xxhash64("url_norm").cast("bigint"))
        unique = urlops.dedup_by_url(parts)
        capped = urlops.cap_per_domain(unique, cap=20)
        kept = urlops.filter_blocked_domains(capped, ["site13.com", "site3.co.uk"])

        # 5. robots.txt politeness: the per-host policy dimension
        #    (synthesized here; a real job ingests fetched bodies),
        #    broadcast-joined and decided in one Arrow pass
        robots_rows = []
        for k in range(17):
            for suffix in (".com", ".co.uk"):
                body = ("User-agent: *\nDisallow: /p/\n"
                        if k % 5 == 0 else
                        "User-agent: *\nDisallow: /private/\n")
                robots_rows.append((f"www.site{k}{suffix}", body))
        robots_df = spark.createDataFrame(
            robots_rows, "host string, robots_txt string")
        polite = robots.filter_by_robots(kept, robots_df, "trainbot",
                                         url_col="url_norm",
                                         broadcast_rules=True)
        kept = polite.where("robots_allowed")

        n_unique, n_kept = unique.count(), kept.count()
        doms = (kept.groupBy("url_registered_domain").count()
                .orderBy(F.desc("count")).limit(5).collect())

    print(f"warc dead-letter rows : {dead}")
    print(f"decoded html pages    : {n_pages}")
    print(f"unique canonical urls : {n_unique}")
    print(f"after cap + blocklist + robots : {n_kept}")
    print("top domains           :",
          ", ".join(f"{r.url_registered_domain}={r['count']}" for r in doms))
    assert dead >= 1 and n_kept <= n_unique <= n_pages
    spark.stop()


if __name__ == "__main__":
    main()
