"""The reference's example notebook (examples/irm_example.ipynb),
re-expressed against this engine — same two tests, same entry forms.

Reference workflow (cells 3-7):

    ds = xr.open_dataset('tests/wmask_ts.nc')
    metrics = calculate_metrics(ds.water, 'tests/rcor_extent.shp')
    metrics_df = calculate_metrics(ds.water, rcor_extent,
                                   export_PP=True, export_shp=True)
    metrics_df_folder = calculate_metrics(folderPath, rcor_extent)

Here the NetCDF cube and the polygon shapefile are synthesized
deterministically (no external data in the sandbox), then flow through
the same two entry forms: a classic-NetCDF path string and a ``.shp``
corridor path string.

Run:  python examples/irm_example.py
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from irivermetrics_spark import api, synth  # noqa: E402
from irivermetrics_spark.kernels import netcdf, shapefile as shpk  # noqa: E402
from irivermetrics_spark.plans import pipeline  # noqa: E402
from irivermetrics_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("irm_example", master="local[8]", shuffle_partitions=16)
    fx = synth.make_fixture(w=80, h=40, n_dates=10, n_sections=3, seed=11)
    grid = dict(gx0=fx.gx0, gy0=fx.gy0, ps=fx.pixel_size, w=fx.w, h=fx.h)

    with tempfile.TemporaryDirectory() as td:
        # ---- inputs shaped exactly like the reference fixtures ----
        ncpath = os.path.join(td, "wmask_ts.nc")
        with open(ncpath, "wb") as f:
            f.write(netcdf.write_wmask(fx.masks[0], [str(d) for d in fx.dates], grid))
        shp_base = os.path.join(td, "rcor_extent")
        shapes = [[(np.asarray(r["ring_x"]), np.asarray(r["ring_y"]))]
                  for r in fx.reaches]
        fields = [("section", "C", 16, 0)]
        recs = [(str(r["section"]),) for r in fx.reaches]
        for ext, buf in shpk.write_shapefile(shpk.POLYGON, shapes, fields, recs).items():
            with open(f"{shp_base}.{ext}", "wb") as f:
                f.write(buf)

        # ---- Test 1: NetCDF file + rcor_extent.shp ----
        outdir = os.path.join(td, "results")
        os.makedirs(outdir)
        res = api.calculate_metrics(
            spark, ncpath, f"{shp_base}.shp",
            section_name_col="section", export_PP=True, export_shp=True,
            outdir=outdir)
        mdf = res["metrics"].toPandas()
        print(f"\nTest 1 (NetCDF + .shp): {len(mdf)} metric rows")
        print(mdf.sort_values(["section", "date"]).head(8).to_string(index=False))
        print("exports:", sorted(p for p in os.listdir(outdir))[:8])

        # ---- Test 2: folder-of-images form (the image table) ----
        images = pipeline.images_df(spark, fx.images)
        res2 = api.calculate_metrics(spark, images, f"{shp_base}.shp",
                                     grid=grid, section_name_col="section")
        print(f"\nTest 2 (image table): {res2['metrics'].count()} metric rows")

        # ---- Test 3: module 1 exports per-date YYYY-MM-DD.tif masks
        # (wd_batch export_tif=True), module 2 re-ingests the folder —
        # the reference's two-module file workflow end-to-end ----
        tifdir = os.path.join(td, "wmasks")
        api.waterdetect_batch(spark, images, grid=grid, reaches=fx.reaches,
                              export_tif=True, outdir=tifdir)
        res3 = api.calculate_metrics(spark, tifdir, f"{shp_base}.shp",
                                     grid=grid, section_name_col="section")
        print(f"\nTest 3 (per-date .tif folder): {res3['metrics'].count()} metric rows "
              f"from {len(os.listdir(tifdir))} mask files")

    spark.stop()


if __name__ == "__main__":
    main()
