"""The committed spark-submit artifact must match the source tree
(r1 ADVICE: dist/ was built at an older commit and deployed stale code).
This is the CI gate: edit source -> `python tools/package.py` or this
test fails."""

import os
import sys
import zipfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def _entries(zpath):
    with zipfile.ZipFile(zpath) as z:
        return {i.filename: i.CRC for i in z.infolist()}


def test_dist_zip_matches_source(tmp_path):
    import package

    committed = os.path.join(package.REPO, "dist", "irivermetrics_spark.zip")
    assert os.path.exists(committed), "run: python tools/package.py"
    fresh = package.build(str(tmp_path / "fresh.zip"))
    a, b = _entries(committed), _entries(fresh)
    assert a == b, (
        "dist/irivermetrics_spark.zip is stale vs the source tree — "
        f"rebuild with tools/package.py (changed: "
        f"{sorted(set(a.items()) ^ set(b.items()))[:6]})"
    )
