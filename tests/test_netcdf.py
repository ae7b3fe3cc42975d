"""S5 NetCDF cube ingest (r3 VERDICT missing #1): from-scratch classic
NetCDF-3 codec round-trips + the reference workflow e2e — a synthesized
wmask_ts.nc through ``api.calculate_metrics(<path>.nc, reaches)`` must
match the image-table pipeline on the same truth masks exactly."""

import os
import tempfile

import numpy as np
import pytest

from irivermetrics_spark.kernels import netcdf


def test_roundtrip_types_and_attrs():
    rng = np.random.default_rng(3)
    dims = {"t": 0, "y": 4, "x": 5}
    variables = {
        "b": (("t", "y", "x"), {"_FillValue": np.int8(-1)},
              rng.integers(-1, 2, (6, 4, 5)).astype(np.int8)),
        "s": (("y", "x"), {}, rng.integers(-999, 999, (4, 5)).astype(np.int16)),
        "i": (("x",), {}, np.arange(5, dtype=np.int32) * 1000),
        "f": (("y",), {}, rng.random(4).astype(np.float32)),
        "d": (("t",), {"units": "days since 2001-02-03"},
              np.arange(6, dtype=np.float64) * 0.5),
    }
    gattrs = {"title": "test", "version": np.int32(7),
              "coeffs": np.array([1.5, -2.5], dtype=np.float64)}
    for version in (1, 2):
        buf = netcdf.write_netcdf3(dims, variables, gattrs, version=version)
        assert buf[:4] == b"CDF" + bytes([version])
        nc = netcdf.read_netcdf3(buf)
        assert nc["dims"] == dims
        assert nc["gattrs"]["title"] == "test" and nc["gattrs"]["version"] == 7
        assert np.allclose(nc["gattrs"]["coeffs"], [1.5, -2.5])
        for name, (vdims, attrs, data) in variables.items():
            v = nc["vars"][name]
            assert v["dims"] == vdims
            assert np.array_equal(v["data"], data), name
            assert v["data"].dtype == data.dtype, name
        assert nc["vars"]["b"]["attrs"]["_FillValue"] == -1


def test_two_record_vars_slab_padding():
    """The per-record slab pads to 4 bytes ONLY with >= 2 record vars;
    a 3-byte int8 slab exercises the padded interleave."""
    dims = {"t": 0, "x": 3}
    a = np.arange(12, dtype=np.int8).reshape(4, 3)
    t = np.arange(4, dtype=np.int32)
    variables = {"a": (("t", "x"), {}, a), "t": (("t",), {}, t)}
    nc = netcdf.read_netcdf3(netcdf.write_netcdf3(dims, variables))
    assert np.array_equal(nc["vars"]["a"]["data"], a)
    assert np.array_equal(nc["vars"]["t"]["data"], t)


def test_single_record_var_no_padding():
    """Spec special case: exactly one record var -> recsize is the
    UNPADDED slab size (an int8 5-elem slab would desync otherwise)."""
    dims = {"t": 0, "x": 5}
    a = (np.arange(15, dtype=np.int8) - 7).reshape(3, 5)
    nc = netcdf.read_netcdf3(netcdf.write_netcdf3(dims, {"a": (("t", "x"), {}, a)}))
    assert np.array_equal(nc["vars"]["a"]["data"], a)


def test_netcdf4_rejected():
    with pytest.raises(ValueError, match="NetCDF-4|classic"):
        netcdf.read_netcdf3(b"\x89HDF\r\n\x1a\n" + b"\x00" * 32)


def test_wmask_roundtrip_and_southup_flip():
    rng = np.random.default_rng(11)
    cube = rng.integers(-1, 2, (5, 7, 9)).astype(np.int8)
    dates = [f"2020-03-{d:02d}" for d in (1, 5, 9, 13, 17)]
    grid = dict(gx0=500000.0, gy0=7_000_000.0, ps=30.0)
    for version in (1, 2):
        back, dback, gback = netcdf.read_wmask(
            netcdf.write_wmask(cube, dates, grid, version=version))
        assert np.array_equal(back, cube) and dback == dates
        assert np.isclose(gback["gx0"], grid["gx0"])
        assert np.isclose(gback["gy0"], grid["gy0"]) and gback["ps"] == 30.0
        assert gback["w"] == 9 and gback["h"] == 7
    # fixed (non-record) time dim also reads back
    back, dback, _ = netcdf.read_wmask(
        netcdf.write_wmask(cube, dates, grid, record_time=False))
    assert np.array_equal(back, cube) and dback == dates
    # a south-up cube (ascending y coords) flips to the engine's
    # north-up frame
    ys = (grid["gy0"] - (np.arange(7)[::-1] + 0.5) * 30.0)
    xs = (grid["gx0"] + (np.arange(9) + 0.5) * 30.0)
    dims = {"time": 0, "y": 7, "x": 9}
    variables = {
        "time": (("time",), {"units": "days since 2020-03-01"},
                 np.array([0, 4, 8, 12, 16], dtype=np.int32)),
        "y": (("y",), {}, ys), "x": (("x",), {}, xs),
        "water": (("time", "y", "x"), {}, cube[:, ::-1, :]),
    }
    back, dback, gback = netcdf.read_wmask(netcdf.write_netcdf3(dims, variables))
    assert np.array_equal(back, cube) and dback == dates
    assert np.isclose(gback["gy0"], grid["gy0"])


def test_nc_e2e_matches_image_pipeline(spark):
    """Reference-workflow parity: calculate_metrics on a synthesized
    .nc cube == the image-table pipeline on the same truth masks
    (the nc path exercises the presence-only validity fallback)."""
    from irivermetrics_spark import api, synth
    from irivermetrics_spark.plans import pipeline

    fx = synth.make_fixture(w=60, h=30, n_dates=8, n_sections=2, seed=7)
    grid = dict(gx0=fx.gx0, gy0=fx.gy0, ps=fx.pixel_size, w=fx.w, h=fx.h)
    with tempfile.TemporaryDirectory() as td:
        ncpath = os.path.join(td, "scene0_ts.nc")
        with open(ncpath, "wb") as f:
            f.write(netcdf.write_wmask(
                fx.masks[0], [str(d) for d in fx.dates], grid))
        nc_res = api.calculate_metrics(spark, ncpath, fx.reaches)
        img_res = pipeline.run(spark, pipeline.images_df(spark, fx.images),
                               fx.reaches, grid)
        cols = ["date", "section"]
        a = (nc_res["metrics"].toPandas().drop(columns=["scene"])
             .sort_values(cols).reset_index(drop=True))
        b = (img_res["metrics"].toPandas().drop(columns=["scene"])
             .sort_values(cols).reset_index(drop=True))
        num = [c for c in a.columns if a[c].dtype.kind in "if"]
        assert len(a) == len(b) > 0
        assert list(a.columns) == list(b.columns)
        for c in num:
            assert np.allclose(a[c].to_numpy(dtype=float),
                               b[c].to_numpy(dtype=float), equal_nan=True), c


def test_reference_shapefile_fixture_reads():
    """The reference repo's own rcor_extent.shp parses through the
    from-scratch reader with the reference's section-naming rule
    (0-based feature index; section_name_col selects a DBF field)."""
    from irivermetrics_spark import api

    path = "/root/reference/tests/rcor_extent.shp"
    if not os.path.exists(path):
        pytest.skip("reference fixture not present")
    reaches = api.read_reaches(None, path)
    assert [r["section"] for r in reaches] == [str(i) for i in range(7)]
    for r in reaches:
        assert len(r["ring_x"]) >= 4 and r["area_m2"] > 1e5
        assert r["xmax"] > r["xmin"] and r["ymax"] > r["ymin"]
    named = api.read_reaches(None, path, section_name_col="ORIG_FID")
    assert [r["section"] for r in named] == ["586", "585", "584", "583", "582", "581", "580"]
    with pytest.raises(ValueError, match="section_name_col"):
        api.read_reaches(None, path, section_name_col="nope")


def test_nc_plus_shp_end_to_end(spark):
    """The reference notebook's exact entry forms — a .nc path and a
    .shp corridor path — produce the same metrics as in-memory
    reaches (examples/irm_example.py is the narrated version)."""
    from irivermetrics_spark import api, synth
    from irivermetrics_spark.kernels import shapefile as shpk

    fx = synth.make_fixture(w=60, h=30, n_dates=6, n_sections=2, seed=9)
    grid = dict(gx0=fx.gx0, gy0=fx.gy0, ps=fx.pixel_size, w=fx.w, h=fx.h)
    with tempfile.TemporaryDirectory() as td:
        ncpath = os.path.join(td, "wmask_ts.nc")
        with open(ncpath, "wb") as f:
            f.write(netcdf.write_wmask(fx.masks[0], [str(d) for d in fx.dates], grid))
        shapes = [[(np.asarray(r["ring_x"]), np.asarray(r["ring_y"]))]
                  for r in fx.reaches]
        files = shpk.write_shapefile(shpk.POLYGON, shapes,
                                     [("section", "C", 16, 0)],
                                     [(str(r["section"]),) for r in fx.reaches])
        for ext, buf in files.items():
            with open(os.path.join(td, f"rcor.{ext}"), "wb") as f:
                f.write(buf)
        via_files = api.calculate_metrics(
            spark, ncpath, os.path.join(td, "rcor.shp"),
            section_name_col="section")
        via_mem = api.calculate_metrics(spark, ncpath, fx.reaches, grid=grid)
        a = (via_files["metrics"].toPandas().drop(columns=["scene"])
             .sort_values(["date", "section"]).reset_index(drop=True))
        b = (via_mem["metrics"].toPandas().drop(columns=["scene"])
             .sort_values(["date", "section"]).reset_index(drop=True))
        assert len(a) == len(b) > 0
        for c in a.columns:
            if a[c].dtype.kind in "if":
                assert np.allclose(a[c].astype(float), b[c].astype(float),
                                   equal_nan=True), c
            else:
                assert (a[c] == b[c]).all(), c


def test_nc_directory_ingest_multi_scene(spark):
    """A DIRECTORY of per-scene cubes ingests distributed (one task per
    file) and yields both scenes' (scene, date) dimensions."""
    from irivermetrics_spark.operators import ncingest
    from irivermetrics_spark import synth

    fx = synth.make_fixture(w=40, h=20, n_dates=4, n_sections=2, n_scenes=2, seed=13)
    grid = dict(gx0=fx.gx0, gy0=fx.gy0, ps=fx.pixel_size, w=fx.w, h=fx.h)
    with tempfile.TemporaryDirectory() as td:
        for s in range(2):
            with open(os.path.join(td, f"scene{s}.nc"), "wb") as f:
                f.write(netcdf.write_wmask(
                    fx.masks[s], [str(d) for d in fx.dates], grid))
        pts, g = ncingest.read_wmask_nc(spark, td)
        assert g["w"] == 40 and g["h"] == 20
        pdf = pts.toPandas()
        scenes = sorted(pdf["scene"].unique())
        assert scenes == ["scene0", "scene1"]
        # per (scene, date) presence summaries keep the dim complete
        summ = pdf[pdf["value"] == -9]
        assert len(summ) == 2 * 4
        # water points match the truth masks per scene
        for s in range(2):
            sub = pdf[(pdf["scene"] == f"scene{s}") & (pdf["value"] == 1)]
            assert len(sub) == int((fx.masks[s] == 1).sum())
        # mixed-grid cubes fail loudly
        bad = dict(grid, gx0=grid["gx0"] + 30.0)
        with open(os.path.join(td, "scene9.nc"), "wb") as f:
            f.write(netcdf.write_wmask(
                fx.masks[0], [str(d) for d in fx.dates], bad))
        with pytest.raises(Exception, match="uniform-grid"):
            ncingest.read_wmask_nc(spark, td)[0].count()


def test_nc_aoi_clip_and_all_dry(spark):
    """The nc ingest's buffered-AOI clip matches the shared emission
    contract (points outside the buffer never emit), and an all-dry
    cube still yields its full (scene, date) dimension via summary
    rows (zero-branch metrics downstream)."""
    from irivermetrics_spark.operators import ncingest
    from irivermetrics_spark import synth

    fx = synth.make_fixture(w=40, h=20, n_dates=3, n_sections=2, seed=21)
    grid = dict(gx0=fx.gx0, gy0=fx.gy0, ps=fx.pixel_size, w=fx.w, h=fx.h)
    # a vertical line on the left edge with a tight buffer: only
    # pixels within 3 px of x=2 survive the clip
    lx = fx.gx0 + 2.5 * fx.pixel_size
    lines = [(np.asarray([lx, lx]), np.asarray([fx.gy0, fx.gy0 - 20 * fx.pixel_size]))]
    buf_m = 3.0 * fx.pixel_size
    with tempfile.TemporaryDirectory() as td:
        with open(os.path.join(td, "s0.nc"), "wb") as f:
            f.write(netcdf.write_wmask(fx.masks[0], [str(d) for d in fx.dates], grid))
        pts, _ = ncingest.read_wmask_nc(spark, td, aoi=(lines, buf_m))
        pdf = pts.toPandas()
        body = pdf[pdf["value"] != -9]
        if len(body):
            cx = grid["gx0"] + (body["px"].to_numpy() + 0.5) * grid["ps"]
            assert np.all(np.abs(cx - lx) <= buf_m + 1e-9)
        # clip strictly reduces (fixture has water across the raster)
        full = ncingest.read_wmask_nc(spark, td)[0].toPandas()
        assert len(body) < len(full[full["value"] != -9])

        # all-dry cube: summaries alone keep the date dimension
        dry = np.zeros_like(fx.masks[0])
        with open(os.path.join(td, "s0.nc"), "wb") as f:
            f.write(netcdf.write_wmask(dry, [str(d) for d in fx.dates], grid))
        pdf2 = ncingest.read_wmask_nc(spark, td)[0].toPandas()
        assert (pdf2["value"] == -9).all() and len(pdf2) == 3
        from irivermetrics_spark import api
        res = api.calculate_metrics(spark, os.path.join(td, "s0.nc"), fx.reaches)
        m = res["metrics"].toPandas()
        assert len(m) == 3 * 2 and (m["npools"] == 0).all()
        assert np.allclose(m["wet_area_km2"], 0.0)
