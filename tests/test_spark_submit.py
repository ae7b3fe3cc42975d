"""North-rule launch shape: the committed --py-files zip must actually
run a pipeline job under a REAL ``spark-submit`` (fresh JVM, package
imported from the zip, not from the repo checkout)."""

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = """
import json, sys
from pyspark.sql import SparkSession

spark = (SparkSession.builder.appName("submit-smoke")
         .config("spark.sql.shuffle.partitions", "4").getOrCreate())
# the package must resolve from --py-files, not a checkout
from irivermetrics_spark import synth
from irivermetrics_spark.plans import pipeline

fx = synth.make_fixture(w=40, h=20, n_dates=3, n_sections=2, seed=31)
grid = dict(gx0=fx.gx0, gy0=fx.gy0, ps=fx.pixel_size, w=fx.w, h=fx.h)
res = pipeline.run(spark, pipeline.images_df(spark, fx.images), fx.reaches, grid)
out = dict(metrics_rows=res["metrics"].count(),
           kept=res["kept"].count(),
           pkg=__import__("irivermetrics_spark").__file__)
with open(sys.argv[1], "w") as f:
    json.dump(out, f)
spark.stop()
"""


def test_spark_submit_py_files_runs_pipeline():
    zip_path = os.path.join(REPO, "dist", "irivermetrics_spark.zip")
    assert os.path.exists(zip_path)
    base = tempfile.mkdtemp(prefix="submit_")
    job = os.path.join(base, "job.py")
    result = os.path.join(base, "result.json")
    with open(job, "w") as f:
        f.write(JOB)
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable)
    # cwd OUTSIDE the repo so the import can only come from the zip
    proc = subprocess.run(
        ["spark-submit", "--master", "local[2]",
         "--py-files", zip_path, job, result],
        cwd=base, env=env, capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = json.load(open(result))
    assert out["metrics_rows"] == 3 * 2  # n_dates x n_sections (all kept)
    assert out["kept"] == 3
    assert "irivermetrics_spark.zip" in out["pkg"]  # imported FROM the zip
