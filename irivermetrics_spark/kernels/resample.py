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
    nb, hs, ws = arr.shape
    xs, ys = _target_centers(dst_grid)
    col = np.floor((xs - src_grid["gx0"]) / src_grid["ps"]).astype(np.int64)
    row = np.floor((src_grid["gy0"] - ys) / src_grid["ps"]).astype(np.int64)
    ok_c = (col >= 0) & (col < ws)
    ok_r = (row >= 0) & (row < hs)
    out = np.zeros((nb, ys.shape[0], xs.shape[0]), dtype=arr.dtype)
    if ok_c.any() and ok_r.any():
        rs = row[ok_r][:, None]
        cs = col[ok_c][None, :]
        block = arr[:, rs, cs]
        out[np.ix_(np.arange(nb), ok_r, ok_c)] = block
    return out


def resample_bilinear(arr: np.ndarray, src_grid: dict, dst_grid: dict) -> np.ndarray:
    """(nbands, h_src, w_src) -> (nbands, dst.h, dst.w), bilinear in the
    pixel-center frame; edges clamp, fully-outside pixels get 0."""
    nb, hs, ws = arr.shape
    xs, ys = _target_centers(dst_grid)
    fc = (xs - src_grid["gx0"]) / src_grid["ps"] - 0.5   # fractional src col
    fr = (src_grid["gy0"] - ys) / src_grid["ps"] - 0.5   # fractional src row
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
