"""SparkSession factory tuned for this engine.

Local-mode defaults follow the sandbox (single JVM, N threads); on a
real cluster the same confs apply per executor. AQE is always on: it
replaces the reference's hand-tuned date-batching heuristic
(reference: src/irm_main.py:146-151) with runtime partition coalescing
and handles skew joins on dense river-corridor cells.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _driver_mem() -> str:
    """Local-mode driver heap: SPARK_GRAFT_DRIVER_MEM, else 8g.

    8g is the measured-fastest local default: an r8 A/B at bench sf0.1
    local[32] read the whole suite ~2-5 s SLOWER with a host-derived
    31g heap (larger G1 regions/card tables hurt the many short jobs
    far more than extra headroom helps). Very large local runs
    (sf >= 1.0 image tables) can raise it via the env var; a cluster
    deployment sizes executor memory per node instead (guide §5)."""
    return os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")


def get_spark(
    app_name: str = "irivermetrics_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    # match shuffle width to parallelism in local mode; a cluster would
    # size this to 2-3x total cores (or leave it to AQE coalescing)
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = 32 if n == "*" else max(8, int(n))
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # batch sizing (guide §4.2): rows capped at the Spark default
        # 10000 — the old 2048 row cap guarded wide binary image rows,
        # but Spark 4's maxBytesPerBatch (64 MB, stated explicitly)
        # already bounds those by BYTES (~218 rows/batch at 300 KB
        # images), so the row cap only throttled narrow-row UDF stages
        # into 5x more batches. r8 interleaved A/B on the flagship rep:
        # 2048 -> 10000 read 2.65/2.73 -> 2.50/2.52 s.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.execution.arrow.maxBytesPerBatch", str(64 * 1024 * 1024))
        .config("spark.driver.memory", _driver_mem())
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
