"""Build the --py-files zip for spark-submit deployment (north rule).

Usage:
  python tools/package.py            # -> dist/irivermetrics_spark.zip
  spark-submit --py-files dist/irivermetrics_spark.zip your_job.py

The package is pure Python + numpy/pandas (both preinstalled on Spark
executors' Python), so a single zip is the whole deployment artifact.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "irivermetrics_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(REPO, "irivermetrics_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    print(build())
