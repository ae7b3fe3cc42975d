"""Sequential numpy oracle implementing the reference pipeline semantics.

A straight, single-process re-statement of calculate_metrics
(reference: src/irm_main.py:117-236 + src/utils/calc_metrics.py) over
the synthetic fixture's dense mask cube. The Spark engine must match
this oracle exactly: kept dates, corridor/feature pixel memberships
(join rows), filled cube, per-pool rows, and the final metrics table.

Quirk ledger reproduced here (SURVEY.md §7.3): sequential in-place
temporal fill over reflect padding; vacuous >= 95 % post-fill check
(computed on binarized data); hard-coded 30 m length pixel; positional
label merge; AWRe's 2*sqrt(area)/pi radii; LPSEC NaN semantics;
feature masks all_touched=True vs corridor center-rule.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions import geometry
from ..kernels import blocks, fill
from ..synth import Fixture


def corridor_mask(fx: Fixture) -> np.ndarray:
    """Center-rule rasterization of the dissolved reach polygons (J2)."""
    out = np.zeros((fx.h, fx.w), dtype=np.uint8)
    for r in fx.reaches:
        out |= geometry.rasterize_polygon(
            r["ring_x"], r["ring_y"], fx.gx0, fx.gy0, fx.pixel_size, fx.w, fx.h, all_touched=False
        )
    return out


def feature_clip(fx: Fixture, r: dict) -> tuple[slice, slice, np.ndarray]:
    """Bbox clip slices + all_touched mask (in clip frame) for a reach.

    clip_data keeps pixels whose CENTER coordinate lies within the
    polygon bounds (reference: src/utils/calc_metrics.py:420-424).
    """
    xs = fx.px_x(np.arange(fx.w))
    ys = fx.px_y(np.arange(fx.h))
    ci = np.nonzero((xs >= r["xmin"]) & (xs <= r["xmax"]))[0]
    ri = np.nonzero((ys >= r["ymin"]) & (ys <= r["ymax"]))[0]
    cs = slice(int(ci[0]), int(ci[-1]) + 1)
    rs = slice(int(ri[0]), int(ri[-1]) + 1)
    full = geometry.rasterize_polygon(
        r["ring_x"], r["ring_y"], fx.gx0, fx.gy0, fx.pixel_size, fx.w, fx.h, all_touched=True
    )
    return rs, cs, full[rs, cs]


def run(fx: Fixture, scene: int = 0, min_pool_size: int = 2,
        section_length: float = float("nan")) -> dict:
    masks = fx.masks[scene].astype(np.int8)  # (n_t, h, w) in {1,0,-1}
    n_t0 = masks.shape[0]
    dates = [d.isoformat() for d in fx.dates]

    # F5: drop all-null dates — int cube has no NaN, never triggers
    corridor = corridor_mask(fx).astype(bool)
    corridor_total = int(corridor.sum())

    # mark fillable nodata inside corridor (-1 -> 2)
    cube = masks.copy()
    mark = (cube == -1) & corridor[None, :, :]
    cube[mark] = 2

    # F6: keep dates with >= 70 % valid in-corridor pixels
    valid = (cube != 2) & corridor[None, :, :]
    ratio = valid.sum(axis=(1, 2)) / corridor_total
    keep = ratio >= 0.7
    cube = cube[keep]
    kept_dates = [d for d, k in zip(dates, keep) if k]

    # outside corridor -> -1 (reference :518)
    cube = np.where(corridor[None, :, :], cube, -1).astype(np.int8)

    # temporal fill (sequential, reflect-padded) then binarize
    n_t, h, w = cube.shape
    filled = fill.fill_series(cube.reshape(n_t, h * w)).reshape(n_t, h, w)
    cube = fill.binarize(filled)

    # F7 (>= 95 % post-fill) runs on binarized data -> always passes
    post_valid_ratio = np.ones(n_t)
    assert (post_valid_ratio >= 0.95).all()

    pixel_area_km2 = fx.pixel_size**2 / 1e6
    pool_rows = []
    persistence = {}
    join_rows = set()
    feature_meta = {}
    for r in fx.reaches:
        rs, cs, fmask = feature_clip(fx, r)
        feature_meta[r["section"]] = dict(rs=rs, cs=cs, mask=fmask, area_km2=r["area_m2"] / 1e6)
        feat = np.where(fmask[None, :, :] == 1, cube[:, rs, cs], 0)

        # persistence metrics (A1-A3)
        pp = feat.mean(axis=0)
        sel = pp > 0.1
        pp_mean = float(pp[sel].mean()) if sel.any() else float("nan")
        ra_area = float(pp[pp > 0.9].sum()) * pixel_area_km2
        persistence[r["section"]] = (pp_mean, ra_area)

        # join rows golden: water pixels assigned to this section
        for i, d in enumerate(kept_dates):
            ys, xs_ = np.nonzero(feat[i])
            for y, x in zip(ys, xs_):
                join_rows.add((d, r["section"], int(x + cs.start), int(y + rs.start)))

        # morphology per date
        for i, d in enumerate(kept_dates):
            for row in blocks.summarize_clip(feat[i], min_pool_size, fx.pixel_size):
                pool_rows.append(
                    dict(
                        date=d,
                        section=r["section"],
                        section_area_km2=r["area_m2"] / 1e6,
                        section_length_km=section_length,
                        pp_mean=pp_mean,
                        ra_area=ra_area,
                        **row,
                    )
                )

    pools_df = pd.DataFrame(pool_rows)
    metrics = fold_metrics(pools_df)
    return dict(
        corridor=corridor,
        kept_dates=kept_dates,
        cube=cube,
        pools=pools_df,
        metrics=metrics,
        join_rows=join_rows,
        persistence=persistence,
        feature_meta=feature_meta,
    )


def fold_metrics(pools_df: pd.DataFrame) -> pd.DataFrame:
    """The A7 per-(date, section) fold (reference process_metrics,
    src/utils/calc_metrics.py:225-293), sequential pandas version."""
    out = []
    for (d, s), g in pools_df.groupby(["date", "section"], observed=False):
        areas = g["area_km2"].to_numpy(dtype=np.float64)
        lengths = g["length_km"].to_numpy(dtype=np.float64)
        widths = g["width_km"].to_numpy(dtype=np.float64)
        perims = g["perimeter_km"].to_numpy(dtype=np.float64)
        section_area = g["section_area_km2"].iloc[0]
        section_length = g["section_length_km"].iloc[0]
        pp_mean = g["pp_mean"].iloc[0]
        ra_area = g["ra_area"].iloc[0]
        if areas.sum() == 0:
            lpsec = np.nan if (np.isnan(section_length) or section_length == 0) else 0.0
            out.append(dict(date=d, section=s, section_area_km2=section_area,
                            section_length_km=section_length, npools=0, wet_area_km2=0.0,
                            wet_length_km=0.0, wet_perimeter_km=0.0, AWMSI=0.0,
                            AWRe=np.nan, AWMPA=0.0, AWMPL=0.0, AWMPW=0.0, PF=0.0,
                            PFL=0.0, APSEC=0.0, LPSEC=lpsec,
                            **{"pp_mean_%": pp_mean, "ra_area_km2": ra_area}))
            continue
        ta, tp, tl = areas.sum(), perims.sum(), lengths.sum()
        awmsi = float(np.sum((0.25 * perims / np.sqrt(areas)) * (areas / ta)))
        awmpa = float(np.average(areas, weights=areas))
        radii = 2.0 * (np.sqrt(areas) / np.pi)  # reference's non-standard radius
        awre = float(np.nansum((radii / lengths) * areas) / ta)
        awmpl = float(np.average(lengths, weights=areas))
        awmpw = float(np.average(widths, weights=areas))
        npools = int(areas.size)
        # LPSEC quirk: `not isnan(L) or L != 0` -> NaN section_length still
        # evaluates the division and propagates NaN
        lpsec = (tl / section_length) * 100 if (not np.isnan(section_length) or section_length != 0) else np.nan
        out.append(dict(date=d, section=s, section_area_km2=section_area,
                        section_length_km=section_length, npools=npools,
                        wet_area_km2=float(ta), wet_length_km=float(tl),
                        wet_perimeter_km=float(tp), AWMSI=awmsi, AWRe=awre,
                        AWMPA=awmpa, AWMPL=awmpl, AWMPW=awmpw,
                        PF=float(npools / ta), PFL=float(npools / tl),
                        APSEC=float(ta / section_area * 100), LPSEC=lpsec,
                        **{"pp_mean_%": pp_mean, "ra_area_km2": ra_area}))
    df = pd.DataFrame(out).sort_values(by=["section", "date"]).reset_index(drop=True)
    df["npools"] = df["npools"].astype("int32")
    return df
