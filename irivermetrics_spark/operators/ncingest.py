"""S5: NetCDF water-mask cube ingest -> the engine's mask-point table.

The reference's de-facto entry format (examples/irm_example.ipynb cell
3: ``xr.open_dataset('tests/wmask_ts.nc').water`` handed straight to
``calculate_metrics``). Files load through Spark's ``binaryFile``
source and decode inside ``mapInPandas`` — one task per .nc cube, so a
directory of thousands of scene cubes ingests fully distributed; the
classic-format parse itself is kernels/netcdf.py (from scratch, no
netCDF library in this environment).

Output schema matches operators/decode.decode_points exactly
(image_id, px, py, value, cell + scene/date), so the result drops into
``api.calculate_metrics`` / ``plans.pipeline.run(points=...)`` with no
special-casing: water pixels emit value 1, nodata emits -1, and each
(scene, date) adds one fused summary row (value -9) carrying the
in-corridor invalid count when ``corridor_rings`` is given (F6 fused),
else the presence-only marker -1.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..functions import cellindex, geometry
from ..kernels import netcdf
from .decode import POINTS_SCHEMA, SUMMARY_MARKER, with_scene_date


def _scene_name(path: str) -> str:
    base = os.path.splitext(os.path.basename(path))[0]
    return re.sub(r"[^A-Za-z0-9]", "", base) or "nc"


def nc_mask_points(files: DataFrame, grid: dict, res: int = 9,
                   corridor_rings: list | None = None,
                   var: str = "water") -> DataFrame:
    """binaryFile frame (path, content) -> mask-point rows.

    grid: the engine's uniform target grid (gx0, gy0, ps, w, h); every
    cube is asserted against it map-side, like the S1 image-table
    uniformity check — mixed-grid .nc inputs fail loudly per file.
    """
    gx0, gy0, ps = float(grid["gx0"]), float(grid["gy0"]), float(grid["ps"])
    expected_hw = (int(grid["h"]), int(grid["w"]))

    def kernel(batches):
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                scene = _scene_name(row["path"])
                cube, dates, g = netcdf.read_wmask(bytes(row["content"]), var=var)
                if (g["h"], g["w"]) != expected_hw or not (
                        np.isclose(g["gx0"], gx0) and np.isclose(g["gy0"], gy0)
                        and np.isclose(g["ps"], ps)):
                    raise ValueError(
                        f"{row['path']}: cube grid {g} != target "
                        f"{dict(gx0=gx0, gy0=gy0, ps=ps, w=expected_hw[1], h=expected_hw[0])} "
                        "(uniform-grid contract)")
                for t, d in enumerate(dates):
                    image_id = f"{scene}_{d}"
                    mask = cube[t]
                    ys, xs = np.nonzero(mask != 0)
                    n_invalid = 0
                    if ys.size:
                        vals = mask[ys, xs]
                        cx = gx0 + (xs + 0.5) * ps
                        cy = gy0 - (ys + 0.5) * ps
                        cells = cellindex.hex_cell(cx, cy, res)
                        out.append(pd.DataFrame(dict(
                            image_id=image_id, px=xs.astype(np.int32),
                            py=ys.astype(np.int32), value=vals.astype(np.int8),
                            cell=cells)))
                        if corridor_rings is not None:
                            nod = vals == -1
                            if nod.any():
                                member = np.zeros(int(nod.sum()), dtype=bool)
                                mx, my = cx[nod], cy[nod]
                                for ring_x, ring_y in corridor_rings:
                                    todo = ~member
                                    if not todo.any():
                                        break
                                    member[todo] = geometry.point_in_polygon(
                                        mx[todo], my[todo], ring_x, ring_y)
                                n_invalid = int(member.sum())
                    summary_cell = (np.int64(n_invalid) if corridor_rings is not None
                                    else np.int64(-1))
                    out.append(pd.DataFrame(dict(
                        image_id=[image_id], px=np.int32(-1), py=np.int32(-1),
                        value=np.int8(SUMMARY_MARKER), cell=summary_cell)))
            yield pd.concat(out, ignore_index=True) if out else pd.DataFrame(
                dict(image_id=pd.Series(dtype="str"), px=pd.Series(dtype="int32"),
                     py=pd.Series(dtype="int32"), value=pd.Series(dtype="int8"),
                     cell=pd.Series(dtype="int64")))

    pts = files.select("path", "content").mapInPandas(kernel, schema=POINTS_SCHEMA)
    return with_scene_date(pts)


def read_wmask_nc(spark: SparkSession, path: str, res: int = 9,
                  corridor_rings: list | None = None,
                  var: str = "water") -> tuple[DataFrame, dict]:
    """Path (file, directory or glob of classic .nc cubes) ->
    (mask-point DataFrame, grid dict).

    The grid comes from ONE driver-side header parse of the first file
    (cheap: the classic header is a few hundred bytes plus coords);
    every file is then re-asserted against it inside the distributed
    kernel. The returned frame feeds ``api.calculate_metrics`` as
    ``da_wmask`` directly — reference workflow parity:
    ``calculate_metrics(xr.open_dataset(nc).water, rcor_extent)``.
    """
    files = spark.read.format("binaryFile").load(path)
    first = files.select("content").limit(1).collect()
    if not first:
        raise ValueError(f"no files under {path}")
    _, _, grid = netcdf.read_wmask(bytes(first[0]["content"]), var=var)
    return nc_mask_points(files, grid, res=res,
                          corridor_rings=corridor_rings, var=var), grid
