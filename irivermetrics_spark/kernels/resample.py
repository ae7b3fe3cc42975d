"""Affine grid resampling (S2): mixed-CRS/mixed-resolution scenes onto
the reference grid.

The reference reprojects every scene whose CRS or resolution differs
from the reference image (src/utils/wd_batch.py:329-373,
rioxarray ``rio.reproject``, nearest by default). The engine equivalent
is a pure-numpy affine resample between two north-up pixel grids
(gx0/gy0 = outer corner, ps = pixel size; the same georeferencing
contract as the rest of the engine):

- ``nearest``  — reproduces rioxarray's default for reflectance;
  exact inverse of integer block-replication (the mixed-resolution
  parity test relies on this).
- ``bilinear`` — for smooth fields; the PSNR-gated test checks >= 40 dB
  against analytic resampling of a band-limited field.

Out-of-coverage target pixels get 0 — the nodata value of the
reflectance contract (wd_batch.py:300 na_value), which water_mask maps
to -1 (invalid).

Rotation/shear terms are out of scope: both grids are axis-aligned
(the engine's uniform-grid contract, SURVEY §2.1/S1); a full-CRS warp
factors into this resample after a coordinate transform.
"""

from __future__ import annotations

import numpy as np


def _target_centers(dst_grid: dict) -> tuple[np.ndarray, np.ndarray]:
    xs = dst_grid["gx0"] + (np.arange(dst_grid["w"], dtype=np.float64) + 0.5) * dst_grid["ps"]
    ys = dst_grid["gy0"] - (np.arange(dst_grid["h"], dtype=np.float64) + 0.5) * dst_grid["ps"]
    return xs, ys


def resample_nearest(arr: np.ndarray, src_grid: dict, dst_grid: dict) -> np.ndarray:
    """(nbands, h_src, w_src) -> (nbands, dst.h, dst.w), nearest pixel."""
    xs, ys = _target_centers(dst_grid)
    return _sample_nearest_at(arr, src_grid, xs, ys)


def resample_bilinear(arr: np.ndarray, src_grid: dict, dst_grid: dict) -> np.ndarray:
    """(nbands, h_src, w_src) -> (nbands, dst.h, dst.w), bilinear in the
    pixel-center frame; edges clamp, fully-outside pixels get 0."""
    xs, ys = _target_centers(dst_grid)
    return _sample_bilinear_at(arr, src_grid, xs, ys)


def resample(arr: np.ndarray, src_grid: dict, dst_grid: dict, method: str = "nearest") -> np.ndarray:
    if (src_grid["gx0"] == dst_grid["gx0"] and src_grid["gy0"] == dst_grid["gy0"]
            and src_grid["ps"] == dst_grid["ps"] and arr.shape[1] == dst_grid["h"]
            and arr.shape[2] == dst_grid["w"]):
        return arr  # already on the target grid
    if method == "nearest":
        return resample_nearest(arr, src_grid, dst_grid)
    if method == "bilinear":
        return resample_bilinear(arr, src_grid, dst_grid)
    raise ValueError(f"unknown resample method {method!r}")


def warp_from_lonlat(arr: np.ndarray, src_grid_deg: dict, dst_grid: dict,
                     lat0: float = -18.0, lon0: float = 120.0,
                     method: str = "nearest", frame: str = "tangent",
                     zone: int | None = None, south: bool = True) -> np.ndarray:
    """CRS warp (S2 completion): a source raster georeferenced in
    GEOGRAPHIC DEGREES (north-up: gx0 = west lon edge, gy0 = north lat
    edge, ps = degrees/pixel) resampled onto the engine's planar-meter
    target grid.

    The reference reprojects any scene whose CRS differs from the
    reference CRS (src/utils/wd_batch.py:364-366 rio.reproject); the
    engine composes its planar<->lonlat bridge
    (functions/geometry.py:planar_to_lonlat, origin ``lat0``/``lon0``)
    with the affine samplers above. The tangent-plane transform maps
    x->lon and y->lat independently, so the warp stays SEPARABLE —
    the samplers' 1-D row/col index math applies unchanged, no 2-D
    coordinate mesh is ever materialized.

    ``frame="utm"`` (datum-grade, r3 VERDICT missing #4): the target
    grid is a TRUE WGS84 UTM grid (``zone``/``south`` — the reference
    reprojects onto ``estimate_utm_crs()``, src/utils/wd_batch.py:
    329-373), and target centers invert through the Snyder
    transverse-Mercator series (functions/geometry.py:utm_to_lonlat).
    Meridian convergence bends raster rows, so this path is NOT
    separable — it samples a full 2-D coordinate mesh. The tangent
    plane stays the default: near the AOI center it is
    indistinguishable and costs no mesh.
    """
    from ..functions import geometry

    xs, ys = _target_centers(dst_grid)
    if frame == "utm":
        if zone is None:
            raise ValueError("frame='utm' requires zone= (and south=)")
        ee, nn = np.meshgrid(xs, ys)
        lon, lat = geometry.utm_to_lonlat(ee.ravel(), nn.ravel(), zone, south)
        lon, lat = lon.reshape(ee.shape), lat.reshape(ee.shape)
        if method == "nearest":
            return _sample_nearest_mesh(arr, src_grid_deg, lon, lat)
        if method == "bilinear":
            return _sample_bilinear_mesh(arr, src_grid_deg, lon, lat)
        raise ValueError(f"unknown resample method {method!r}")
    if frame != "tangent":
        raise ValueError(f"unknown warp frame {frame!r} (tangent|utm)")
    lon, _ = geometry.planar_to_lonlat(xs, np.zeros_like(xs), lat0, lon0)
    _, lat = geometry.planar_to_lonlat(np.zeros_like(ys), ys, lat0, lon0)
    # x- and y-degree steps differ (cos(lat0) scaling), so the square-
    # pixel resample_* entry points don't apply — sample directly at
    # the transformed center arrays instead.
    if method == "nearest":
        return _sample_nearest_at(arr, src_grid_deg, lon, lat)
    if method == "bilinear":
        return _sample_bilinear_at(arr, src_grid_deg, lon, lat)
    raise ValueError(f"unknown resample method {method!r}")


def _sample_nearest_mesh(arr: np.ndarray, src_grid: dict, X: np.ndarray,
                         Y: np.ndarray) -> np.ndarray:
    """Sample (nbands, h, w) at a full (H, W) coordinate mesh in the
    source frame — the non-separable path (e.g. UTM-composed warps)."""
    nb, hs, ws = arr.shape
    col = np.floor((X - src_grid["gx0"]) / src_grid["ps"]).astype(np.int64)
    row = np.floor((src_grid["gy0"] - Y) / src_grid["ps"]).astype(np.int64)
    ok = (col >= 0) & (col < ws) & (row >= 0) & (row < hs)
    out = np.zeros((nb,) + X.shape, dtype=arr.dtype)
    if ok.any():
        out[:, ok] = arr[:, row[ok], col[ok]]
    return out


def _sample_bilinear_mesh(arr: np.ndarray, src_grid: dict, X: np.ndarray,
                          Y: np.ndarray) -> np.ndarray:
    nb, hs, ws = arr.shape
    fc = (X - src_grid["gx0"]) / src_grid["ps"] - 0.5
    fr = (src_grid["gy0"] - Y) / src_grid["ps"] - 0.5
    inside = (fc >= -0.5) & (fc <= ws - 0.5) & (fr >= -0.5) & (fr <= hs - 0.5)
    c0 = np.clip(np.floor(fc).astype(np.int64), 0, ws - 1)
    r0 = np.clip(np.floor(fr).astype(np.int64), 0, hs - 1)
    c1 = np.minimum(c0 + 1, ws - 1)
    r1 = np.minimum(r0 + 1, hs - 1)
    wc = np.clip(fc - c0, 0.0, 1.0)[None, :, :]
    wr = np.clip(fr - r0, 0.0, 1.0)[None, :, :]
    a = arr.astype(np.float64)
    top = a[:, r0, c0] * (1 - wc) + a[:, r0, c1] * wc
    bot = a[:, r1, c0] * (1 - wc) + a[:, r1, c1] * wc
    out = (top * (1 - wr) + bot * wr) * inside[None, :, :]
    if np.issubdtype(arr.dtype, np.integer):
        return np.clip(np.rint(out), np.iinfo(arr.dtype).min, np.iinfo(arr.dtype).max).astype(arr.dtype)
    return out.astype(arr.dtype)


def _sample_nearest_at(arr: np.ndarray, src_grid: dict, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Sample (nbands, h, w) at explicit center coordinates in the
    source frame (same math as resample_nearest, centers injected)."""
    nb, hs, ws = arr.shape
    col = np.floor((xs - src_grid["gx0"]) / src_grid["ps"]).astype(np.int64)
    row = np.floor((src_grid["gy0"] - ys) / src_grid["ps"]).astype(np.int64)
    ok_c = (col >= 0) & (col < ws)
    ok_r = (row >= 0) & (row < hs)
    out = np.zeros((nb, ys.shape[0], xs.shape[0]), dtype=arr.dtype)
    if ok_c.any() and ok_r.any():
        out[np.ix_(np.arange(nb), ok_r, ok_c)] = arr[:, row[ok_r][:, None], col[ok_c][None, :]]
    return out


def _sample_bilinear_at(arr: np.ndarray, src_grid: dict, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    nb, hs, ws = arr.shape
    fc = (xs - src_grid["gx0"]) / src_grid["ps"] - 0.5
    fr = (src_grid["gy0"] - ys) / src_grid["ps"] - 0.5
    inside_c = (fc >= -0.5) & (fc <= ws - 0.5)
    inside_r = (fr >= -0.5) & (fr <= hs - 0.5)
    c0 = np.clip(np.floor(fc).astype(np.int64), 0, ws - 1)
    r0 = np.clip(np.floor(fr).astype(np.int64), 0, hs - 1)
    c1 = np.minimum(c0 + 1, ws - 1)
    r1 = np.minimum(r0 + 1, hs - 1)
    wc = np.clip(fc - c0, 0.0, 1.0)[None, None, :]
    wr = np.clip(fr - r0, 0.0, 1.0)[None, :, None]
    a = arr.astype(np.float64)
    top = a[:, r0[:, None], c0[None, :]] * (1 - wc) + a[:, r0[:, None], c1[None, :]] * wc
    bot = a[:, r1[:, None], c0[None, :]] * (1 - wc) + a[:, r1[:, None], c1[None, :]] * wc
    out = top * (1 - wr) + bot * wr
    out *= (inside_r[None, :, None] & inside_c[None, None, :])
    if np.issubdtype(arr.dtype, np.integer):
        return np.clip(np.rint(out), np.iinfo(arr.dtype).min, np.iinfo(arr.dtype).max).astype(arr.dtype)
    return out.astype(arr.dtype)
