"""S2 completion: true CRS warp (geographic-degree rasters onto the
planar grid) and geographic reach layers (the reference reprojects
mixed-CRS scenes, src/utils/wd_batch.py:364-366, and estimates a UTM
zone for geographic vector layers, src/utils/calc_metrics.py:343-348)."""

import numpy as np
import pandas as pd

from irivermetrics_spark import api, codecs, synth
from irivermetrics_spark.functions import geometry
from irivermetrics_spark.kernels import resample
from irivermetrics_spark.operators import decode
from irivermetrics_spark.plans import pipeline

M_PER_DEG_LAT = np.pi * geometry.EARTH_R_M / 180.0


def _deg_grid_for(grid, factor=2.7):
    """A square-degree source grid oversampling the planar grid."""
    lon_w, lat_n = geometry.planar_to_lonlat(grid["gx0"], grid["gy0"])
    ps_deg = (grid["ps"] / M_PER_DEG_LAT) / factor
    # cover the full planar extent in both axes (lon needs the cos scale)
    m_per_deg_lon = M_PER_DEG_LAT * np.cos(np.radians(-18.0))
    w_deg = int(np.ceil(grid["w"] * grid["ps"] / m_per_deg_lon / ps_deg)) + 2
    h_deg = int(np.ceil(grid["h"] * grid["ps"] / M_PER_DEG_LAT / ps_deg)) + 2
    return dict(gx0=float(lon_w), gy0=float(lat_n), ps=float(ps_deg), w=w_deg, h=h_deg)


def _rasterize_on_deg_grid(bands, grid, deg):
    """Point-sample the planar raster at degree-grid pixel centers."""
    lons = deg["gx0"] + (np.arange(deg["w"]) + 0.5) * deg["ps"]
    lats = deg["gy0"] - (np.arange(deg["h"]) + 0.5) * deg["ps"]
    x, _ = geometry.lonlat_to_planar(lons, np.zeros_like(lons))
    _, y = geometry.lonlat_to_planar(np.zeros_like(lats), lats)
    col = np.clip(np.floor((x - grid["gx0"]) / grid["ps"]).astype(int), 0, grid["w"] - 1)
    row = np.clip(np.floor((grid["gy0"] - y) / grid["ps"]).astype(int), 0, grid["h"] - 1)
    return bands[:, row[:, None], col[None, :]]


def test_warp_from_lonlat_bilinear_psnr():
    """A smooth analytic field rasterized on a square-degree grid and
    warped onto the planar grid must match the directly-rasterized
    planar truth at PSNR >= 40 dB."""
    grid = dict(gx0=1000.0, gy0=2000.0, ps=30.0, w=64, h=48)

    def field(x, y):
        return 1000.0 + 800.0 * np.sin(x / 400.0) * np.cos(y / 300.0)

    xs = grid["gx0"] + (np.arange(grid["w"]) + 0.5) * grid["ps"]
    ys = grid["gy0"] - (np.arange(grid["h"]) + 0.5) * grid["ps"]
    truth = field(xs[None, :], ys[:, None])[None, :, :]

    deg = _deg_grid_for(grid, factor=1.9)
    lons = deg["gx0"] + (np.arange(deg["w"]) + 0.5) * deg["ps"]
    lats = deg["gy0"] - (np.arange(deg["h"]) + 0.5) * deg["ps"]
    sx, _ = geometry.lonlat_to_planar(lons, np.zeros_like(lons))
    _, sy = geometry.lonlat_to_planar(np.zeros_like(lats), lats)
    src = field(sx[None, :], sy[:, None])[None, :, :]

    got = resample.warp_from_lonlat(src, deg, grid, method="bilinear")
    mse = float(np.mean((got - truth) ** 2))
    psnr = 10 * np.log10((truth.max() - truth.min()) ** 2 / mse)
    assert psnr >= 40.0, psnr


def test_lonlat_decode_exact_point_parity(spark):
    """A scene georeferenced in geographic degrees (oversampled from the
    planar truth) must decode to EXACTLY the same mask points as the
    planar original through decode_points(reproject, crs='lonlat')."""
    fx = synth.make_fixture(w=48, h=24, n_dates=2, n_sections=1, seed=9)
    grid = dict(gx0=fx.gx0, gy0=fx.gy0, ps=fx.pixel_size, w=fx.w, h=fx.h)
    pdf = fx.images.copy().iloc[:2].reset_index(drop=True)

    deg = _deg_grid_for(grid)
    rows = []
    for i in range(len(pdf)):
        bands = codecs.decode_image(bytes(pdf.loc[i, "bytes"]))
        deg_bands = _rasterize_on_deg_grid(bands, grid, deg)
        rows.append(dict(
            image_id=pdf.loc[i, "image_id"], bytes=codecs.encode_image(deg_bands),
            w=deg["w"], h=deg["h"], fmt=codecs.FMT_RAW16,
            caption="", phash=0,
            gx0=deg["gx0"], gy0=deg["gy0"], ps=deg["ps"], crs="lonlat",
        ))
    geo_images = spark.createDataFrame(pd.DataFrame(rows))
    planar_images = pipeline.images_df(spark, pdf)

    got = decode.decode_points(geo_images, grid, reproject=True).filter(
        "value != -9").select("scene", "date", "px", "py", "value").toPandas()
    want = decode.decode_points(planar_images, grid).filter(
        "value != -9").select("scene", "date", "px", "py", "value").toPandas()
    key = ["scene", "date", "px", "py", "value"]
    got_s = set(map(tuple, got[key].itertuples(index=False)))
    want_s = set(map(tuple, want[key].itertuples(index=False)))
    assert got_s == want_s


def test_reaches_to_planar_roundtrip_and_estimate():
    fx = synth.make_fixture(w=40, h=20, n_dates=2, n_sections=2, seed=4)
    geo = []
    for r in fx.reaches:
        lon, lat = geometry.planar_to_lonlat(r["ring_x"], r["ring_y"])
        geo.append(dict(section=r["section"], ring_x=lon, ring_y=lat))
    # explicit origin: exact round-trip back to the original frame
    back = api.reaches_to_planar(geo, -18.0, 120.0)
    for r0, r1 in zip(fx.reaches, back):
        assert np.allclose(r0["ring_x"], r1["ring_x"], atol=1e-6)
        assert np.allclose(r0["ring_y"], r1["ring_y"], atol=1e-6)
        assert np.isclose(r0["area_m2"], r1["area_m2"], rtol=1e-6)
    # estimated plane (the estimate-UTM analog): for a layer whose
    # coordinates sit near its own center (the real geographic-layer
    # case — the fixture's huge planar offsets map to absurd latitudes
    # under the fixed-origin bridge, so shift them local first), the
    # estimated plane preserves metric areas
    local = []
    for r in fx.reaches:
        rx = np.asarray(r["ring_x"]) - fx.gx0
        ry = np.asarray(r["ring_y"]) - fx.gy0
        lon, lat = geometry.planar_to_lonlat(rx, ry)
        local.append(dict(section=r["section"], ring_x=lon, ring_y=lat))
    est = api.reaches_to_planar(local)
    for r0, r1 in zip(fx.reaches, est):
        assert np.isclose(r0["area_m2"], r1["area_m2"], rtol=1e-3)


def test_calculate_metrics_accepts_lonlat_reaches(spark):
    fx = synth.make_fixture(w=40, h=20, n_dates=3, n_sections=2, seed=12)
    grid = dict(gx0=fx.gx0, gy0=fx.gy0, ps=fx.pixel_size, w=fx.w, h=fx.h)
    images = pipeline.images_df(spark, fx.images)
    geo = []
    for r in fx.reaches:
        lon, lat = geometry.planar_to_lonlat(r["ring_x"], r["ring_y"])
        geo.append(dict(section=r["section"], ring_x=lon, ring_y=lat))
    res_p = api.calculate_metrics(spark, images, fx.reaches, grid=grid)
    res_g = api.calculate_metrics(spark, images, geo, grid=grid, reaches_crs="lonlat")
    cols = ["scene", "date", "section", "npools", "wet_area_km2"]
    a = res_p["metrics"].toPandas()[cols].sort_values(["date", "section"]).reset_index(drop=True)
    b = res_g["metrics"].toPandas()[cols].sort_values(["date", "section"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_exact=False, rtol=1e-9)


def test_true_utm_forward_inverse_and_properties():
    """WGS84 UTM (Snyder series): exact round-trip, E=500000 on the
    central meridian, k0 scale on the meridian, and euclidean UTM
    distances near the CM agreeing with great-circle distances."""
    lon = np.array([120.0, 121.4, 118.9])
    lat = np.array([-18.0, -17.2, -19.5])
    E, N, z = geometry.lonlat_to_utm(lon, lat)
    assert z == 51
    lon2, lat2 = geometry.utm_to_lonlat(E, N, z, south=True)
    assert np.abs(lon2 - lon).max() < 1e-7 and np.abs(lat2 - lat).max() < 1e-7
    Ecm, _, _ = geometry.lonlat_to_utm(np.array([123.0]), np.array([-18.0]), zone=51)
    assert abs(Ecm[0] - 500000.0) < 1e-6
    # scale factor on the CM is exactly k0 (ellipsoidal meridian radius)
    Ea, Na, _ = geometry.lonlat_to_utm(np.array([123.0]), np.array([-18.0005]), zone=51)
    Eb, Nb, _ = geometry.lonlat_to_utm(np.array([123.0]), np.array([-17.9995]), zone=51)
    R1 = (geometry._WGS84_A * (1 - geometry._E2)
          / (1 - geometry._E2 * np.sin(np.radians(-18.0)) ** 2) ** 1.5)
    expect = 0.9996 * R1 * np.radians(0.001)
    assert abs(float(Nb[0] - Na[0]) / expect - 1) < 1e-6
    # euclidean-vs-haversine near the CM: same distance to ~0.3 %
    # (k0 + spherical-vs-ellipsoid earth models)
    p = geometry.lonlat_to_utm(np.array([122.9, 123.1]), np.array([-18.0, -18.1]), zone=51)
    d_utm = float(np.hypot(np.diff(p[0]), np.diff(p[1]))[0])
    d_hav = float(geometry.haversine_m(np.array([-18.0]), np.array([122.9]),
                                       np.array([-18.1]), np.array([123.1]))[0])
    assert abs(d_utm / d_hav - 1) < 0.005


def test_reaches_to_planar_utm_frame():
    """frame='utm' lands a geographic layer in true UTM meters with
    positive shoelace areas close to the local-plane areas (the two
    metric frames agree at corridor scale)."""
    fx = synth.make_fixture(w=40, h=20, n_dates=2, n_sections=2, seed=4)
    local_geo = []
    for r in fx.reaches:
        rx = np.asarray(r["ring_x"]) - fx.gx0
        ry = np.asarray(r["ring_y"]) - fx.gy0
        lon, lat = geometry.planar_to_lonlat(rx, ry)
        local_geo.append(dict(section=r["section"], ring_x=lon, ring_y=lat))
    utm = api.reaches_to_planar(local_geo, frame="utm")
    loc = api.reaches_to_planar(local_geo)
    for ru, rl in zip(utm, loc):
        assert ru["area_m2"] > 0
        assert abs(ru["area_m2"] / rl["area_m2"] - 1) < 0.01


def test_wide_scene_utm_warp_beats_tangent_plane():
    """Datum-grade raster warp (r3 VERDICT missing #4): on a wide
    (400 km x 240 km) scene, meridian convergence bends UTM rows enough
    that the separable tangent-plane bridge falls below the 40 dB gate,
    while the Snyder-UTM-composed mesh warp passes it."""
    zone, south = 51, True  # central meridian 123E
    E0, N0, ps = 300_000.0, 8_000_000.0, 1000.0
    w, h = 400, 240
    dst = dict(gx0=E0, gy0=N0, ps=ps, w=w, h=h)

    def field(lon, lat):
        return 1000.0 + 500.0 * np.sin(2 * np.pi * lon / 0.5) * np.cos(2 * np.pi * lat / 0.5)

    xs = E0 + (np.arange(w) + 0.5) * ps
    ys = N0 - (np.arange(h) + 0.5) * ps
    ee, nn = np.meshgrid(xs, ys)
    lon_t, lat_t = geometry.utm_to_lonlat(ee.ravel(), nn.ravel(), zone, south)
    truth = field(lon_t, lat_t).reshape(h, w)[None, :, :]

    margin = 0.3
    ps_deg = 0.004
    lon_min, lat_max = lon_t.min() - margin, lat_t.max() + margin
    deg = dict(gx0=float(lon_min), gy0=float(lat_max), ps=ps_deg,
               w=int((lon_t.max() + margin - lon_min) / ps_deg) + 2,
               h=int((lat_max - (lat_t.min() - margin)) / ps_deg) + 2)
    lons = deg["gx0"] + (np.arange(deg["w"]) + 0.5) * ps_deg
    lats = deg["gy0"] - (np.arange(deg["h"]) + 0.5) * ps_deg
    src = field(lons[None, :], lats[:, None])[None, :, :]

    utm_out = resample.warp_from_lonlat(src, deg, dst, method="bilinear",
                                        frame="utm", zone=zone, south=south)
    # the tangent-plane user path: anchor the plane at the scene center
    # and express the same UTM grid corner in that frame
    clon, clat = geometry.utm_to_lonlat(
        np.array([E0 + w / 2 * ps]), np.array([N0 - h / 2 * ps]), zone, south)
    lat0, lon0 = float(clat[0]), float(clon[0])
    glon, glat = geometry.utm_to_lonlat(np.array([E0]), np.array([N0]), zone, south)
    tx, ty = geometry.lonlat_to_planar(float(glon[0]), float(glat[0]), lat0, lon0)
    dst_tan = dict(gx0=float(tx), gy0=float(ty), ps=ps, w=w, h=h)
    tan_out = resample.warp_from_lonlat(src, deg, dst_tan, lat0, lon0,
                                        method="bilinear")

    def psnr(got):
        mse = np.mean((got - truth) ** 2)
        return 10 * np.log10((truth.max() - truth.min()) ** 2 / mse)

    p_utm, p_tan = psnr(utm_out), psnr(tan_out)
    assert p_utm >= 40.0, (p_utm, p_tan)
    assert p_tan < 40.0, (p_utm, p_tan)


def test_decode_utm_warp_frame(spark):
    """End-to-end datum-grade ingest: a lonlat-georeferenced row warps
    onto a TRUE UTM target grid inside the decode kernel
    (decode_points(warp_frame='utm')), emitting exactly the points the
    standalone Snyder-composed warp + water rule produce."""
    from irivermetrics_spark import codecs
    from irivermetrics_spark.kernels import resample as rsk, water
    from irivermetrics_spark.operators import decode as dec

    zone, south = 51, True
    E0, N0, ps = 500_000.0, 8_000_000.0, 30.0
    W, H = 40, 24
    grid = dict(gx0=E0, gy0=N0, ps=ps, w=W, h=H)
    ee, nn = np.meshgrid(E0 + (np.arange(W) + 0.5) * ps,
                         N0 - (np.arange(H) + 0.5) * ps)
    lon_t, lat_t = geometry.utm_to_lonlat(ee.ravel(), nn.ravel(), zone, south)
    ps_deg = 0.0002
    lon0d, lat0d = lon_t.min() - 0.002, lat_t.max() + 0.002
    sw = int((lon_t.max() + 0.002 - lon0d) / ps_deg) + 2
    sh = int((lat0d - (lat_t.min() - 0.002)) / ps_deg) + 2
    lons = lon0d + (np.arange(sw) + 0.5) * ps_deg
    stripe = (lons > lon_t.min() + 0.004) & (lons < lon_t.min() + 0.009)
    arr = np.zeros((4, sh, sw), np.uint16)
    arr[0], arr[2] = 800, 900
    arr[1] = np.where(stripe[None, :], 3000, 1000)   # green
    arr[3] = np.where(stripe[None, :], 1000, 3000)   # nir -> water ndwi > 0
    images = spark.createDataFrame(pd.DataFrame([dict(
        image_id="u1_2020-01-01", bytes=codecs.encode_image(arr),
        w=sw, h=sh, fmt="raw16", caption="", phash=0,
        gx0=float(lon0d), gy0=float(lat0d), ps=float(ps_deg), crs="lonlat")]))
    pts = dec.decode_points(images, grid, reproject=True, warp_frame="utm",
                            utm_zone=zone, utm_south=south).toPandas()
    pts = pts[pts["value"] != dec.SUMMARY_MARKER]
    direct = rsk.warp_from_lonlat(
        arr, dict(gx0=float(lon0d), gy0=float(lat0d), ps=ps_deg), grid,
        frame="utm", zone=zone, south=south)
    em = water.water_mask(direct)
    ys, xs = np.nonzero(em != 0)
    assert len(pts) > 0
    assert set(zip(pts["px"].astype(int), pts["py"].astype(int))) == \
        set(zip(xs.tolist(), ys.tolist()))
