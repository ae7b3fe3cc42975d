"""Two-parallelism scaling evidence (north rule: N vs 4N executors).

Runs bench.py twice on IDENTICAL input — local[8] then local[32] —
and writes BENCH/BASELINE.md with throughput at both plus the scaling
efficiency eff = (thru@32 / thru@8) / 4 (target >= 0.8). A real
multi-executor cluster is unavailable in this sandbox; parallelism
level is the only variable between the runs (same JVM memory, same
data, same plan).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    r8 = run(8, sf_dir)
    r32 = run(32, sf_dir)
    thru8 = r8["images_per_sec"]
    thru32 = r32["images_per_sec"]
    eff = (thru32 / thru8) / 4.0
    stamp = datetime.now(timezone.utc).isoformat()
    md = f"""# BENCH/BASELINE — measured numbers

Generated {stamp} by tools/scaling_run.py. Same input, same plan; only
`--master local[N]` differs (sandbox stand-in for N vs 4N executors,
see BASELINE.md note).

## Flagship image pipeline (decode -> NDWI -> hex tile -> PIP zonal
## join -> validity filter -> temporal fill -> morphology -> metrics)

| parallelism | images | wall sec | images/sec |
|---|---|---|---|
| local[8]  | {r8["images"]} | {r8["queries"]["flagship_pipeline"]} | {thru8} |
| local[32] | {r32["images"]} | {r32["queries"]["flagship_pipeline"]} | {thru32} |

**Scaling efficiency (thru@32 / thru@8) / 4 = {eff:.3f}** (target >= 0.8).

## Headline relational suite (sec)

| query | local[8] | local[32] |
|---|---|---|
""" + "\n".join(
        f"| {k} | {r8['queries'].get(k, '-')} | {r32['queries'].get(k, '-')} |"
        for k in r8["queries"]
    ) + f"""

Raw JSON:

```json
{json.dumps(r8)}
{json.dumps(r32)}
```
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"eff": eff, "thru8": thru8, "thru32": thru32}))


if __name__ == "__main__":
    main()
