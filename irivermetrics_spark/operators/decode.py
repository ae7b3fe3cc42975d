"""Image decode + water mask + tiling: the module-1 stage (S2/C4).

Turns the image table (image_id, bytes, w, h, fmt, caption, phash)
into sparse water/nodata pixel points with their hex-cell key:

    (image_id, px, py, value int8 in {1,-1}, cell long)

All heavy work happens inside a batched ``mapInArrow`` kernel —
decode, NDWI thresholding, cell assignment are vectorized numpy per
image, and the output record batches are assembled zero-copy from
those arrays; only water and nodata pixels are emitted (dry pixels are
implicit zeros), so output volume tracks actual surface water, not
grid size. The scene/date columns are computed per image inside the
kernel (reference C1 date-from-filename parity,
src/utils/wd_batch.py:345-360).

Scale notes: the stage is embarrassingly parallel per image row;
emitting point rows (not tiles) makes every downstream stage an
ordinary relational op. ``spark.sql.execution.arrow.maxRecordsPerBatch``
bounds Arrow batch memory for wide binary rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import codecs
from ..functions import cellindex
from ..kernels import water

POINTS_SCHEMA = "image_id string, px int, py int, value tinyint, cell long"

# decode_points emits scene/date from INSIDE the kernel (2 compiled-
# regex matches per IMAGE — ~2k evaluations at bench scale) instead of
# joining a broadcast scene/date dimension onto ~7.5M point rows: the
# dim build added a distinct Exchange + a broadcast-build stage chain
# that serialized ahead of the mask-write job (r8 measurement; the dim
# join itself was the r8-bonus fix for the original per-point-row
# regex). Same C1 semantics as with_scene_date, pinned by
# tests/test_decode_scene_date_parity.py.
POINTS_DATED_SCHEMA = POINTS_SCHEMA + ", date date, scene string"


SUMMARY_MARKER = -9  # value of fused per-image summary rows (px=py=-1)
QUARANTINE_MARKER = -10  # value of per-image quarantine rows (px=py=-1)


def empty_points_pdf() -> pd.DataFrame:
    """Zero-row frame with the POINTS_SCHEMA dtypes (Arrow needs them)."""
    return pd.DataFrame(
        dict(image_id=pd.Series(dtype="str"), px=pd.Series(dtype="int32"),
             py=pd.Series(dtype="int32"), value=pd.Series(dtype="int8"),
             cell=pd.Series(dtype="int64")))


# the C1 patterns in Python-regex form: [0-9] spelled explicitly so the
# match set equals Java's default ASCII \d (Python \d is Unicode-wide)
_DATE_RE_PY = __import__("re").compile(r"([0-9]{4}[-_][0-9]{2}[-_][0-9]{2})")
_SCENE_RE_PY = __import__("re").compile(r"^([A-Za-z0-9]+)_")


def _scene_date_py(image_id):
    """(scene, date) of one image id — the kernel-side twin of
    :func:`with_scene_date` (same values row-for-row; pinned by
    tests/test_decode_scene_date_parity.py). Matching Spark ANSI
    semantics: regexp_extract yields '' on no-match and NULL on null
    input; a date-shaped match that is not a real calendar date RAISES
    (Spark 4's ANSI to_date throws CAST_INVALID_INPUT there) — so a
    malformed id still fails the job loudly, and quarantine mode
    diverts it per image. (Year 0000 — which ANSI to_date accepts but
    datetime cannot represent — also raises; out of datetime's range
    either way.)"""
    import datetime

    if image_id is None:
        return None, None
    m = _SCENE_RE_PY.match(image_id)
    scene = m.group(1) if m else ""
    dm = _DATE_RE_PY.search(image_id)
    if dm is None:
        # regexp_extract no-match yields '' and ANSI to_date('') throws
        raise ValueError(
            f"image id {image_id!r}: no yyyy-mm-dd date in id "
            "(ANSI to_date parity — the C1 contract requires a date)")
    iso = dm.group(1).replace("_", "-")
    y, mo, d = iso.split("-")
    try:
        date = datetime.date(int(y), int(mo), int(d))
    except ValueError as ex:
        raise ValueError(
            f"image id {image_id!r}: extracted date {iso!r} is not a "
            "valid calendar date (ANSI to_date parity)") from ex
    return scene, date


# per-worker corridor-membership bitmaps: in-corridor is a pure
# function of (polygon layer, grid), and the per-image PIP over nodata
# points was the decode kernel's hottest line (~75 % of emit time in
# the r5 profile). One full-grid PIP per worker per (rings, grid)
# amortizes across every image that task decodes; pixel centers use
# the SAME float expression, so the booleans are bit-identical to the
# per-point path. Gated to 4M-pixel grids (4 MB bitmap + bounded temp
# rows); larger rasters keep the per-point path.
_BITMAP_PIXEL_GATE = 4_000_000
_RINGS_DIGEST_MEMO: dict[int, tuple] = {}  # id -> (rings ref, digest)
_CORRIDOR_BITMAPS: dict[tuple, np.ndarray] = {}


def _corridor_bitmap(corridor_rings: list, gx0: float, gy0: float, ps: float,
                     h: int, w: int) -> np.ndarray:
    from ..functions import geometry

    # the memo holds a REFERENCE to the rings object next to its digest
    # and re-checks identity: keying on a bare id() would alias a
    # recycled address (freed list of a previous job in a reused python
    # worker) to the old digest and silently reuse the WRONG bitmap
    memo = _RINGS_DIGEST_MEMO.get(id(corridor_rings))
    if memo is not None and memo[0] is corridor_rings:
        digest = memo[1]
    else:
        import hashlib

        hsh = hashlib.sha1()
        for rx, ry in corridor_rings:
            hsh.update(np.ascontiguousarray(rx, dtype=np.float64).tobytes())
            hsh.update(np.ascontiguousarray(ry, dtype=np.float64).tobytes())
        digest = hsh.hexdigest()
        if len(_RINGS_DIGEST_MEMO) > 64:
            _RINGS_DIGEST_MEMO.clear()
        _RINGS_DIGEST_MEMO[id(corridor_rings)] = (corridor_rings, digest)
    key = (digest, float(gx0), float(gy0), float(ps), int(h), int(w))
    bm = _CORRIDOR_BITMAPS.get(key)
    if bm is not None:
        return bm
    bm = np.zeros((h, w), dtype=bool)
    cx_row = gx0 + (np.arange(w) + 0.5) * ps
    step = max(1, 262_144 // max(w, 1))  # ~2 MB of float64 temps per band
    for y0 in range(0, h, step):
        y1 = min(y0 + step, h)
        cy = gy0 - (np.arange(y0, y1) + 0.5) * ps
        cxf = np.broadcast_to(cx_row, (y1 - y0, w)).ravel()
        cyf = np.repeat(cy, w)
        member = np.zeros(cxf.shape[0], dtype=bool)
        for ring_x, ring_y in corridor_rings:
            todo = ~member
            if not todo.any():
                break
            member[todo] = geometry.point_in_polygon(cxf[todo], cyf[todo], ring_x, ring_y)
        bm[y0:y1] = member.reshape(y1 - y0, w)
    if len(_CORRIDOR_BITMAPS) >= 8:  # a few MB each — keep the hot few
        _CORRIDOR_BITMAPS.pop(next(iter(_CORRIDOR_BITMAPS)))
    _CORRIDOR_BITMAPS[key] = bm
    return bm


def _emit_mask_arrays(mask: np.ndarray, gx0: float, gy0: float,
                      ps: float, res: int, corridor_rings: list | None,
                      aoi_lines: list | None = None,
                      aoi_buffer: float = 0.0):
    """{1,0,-1} mask -> (px int32, py int32, value int8, cell int64,
    summary_cell int).

    THE shared emission contract of every mask-producing kernel (the
    image decode and the NetCDF cube ingest): sparse water/nodata
    points with hex cell keys, optional buffered-AOI clip, and one
    fused summary value per image — in-corridor invalid count when
    ``corridor_rings`` is given (F6 fused), else the presence marker
    -1. Centralized so the two ingest paths cannot diverge. Returns
    bare numpy columns so the Arrow emit path can assemble record
    batches without intermediate pandas frames (guide §4.2)."""
    from ..functions import geometry

    ys, xs = np.nonzero(mask != 0)
    if ys.size and aoi_lines is not None:
        cx = gx0 + (xs + 0.5) * ps
        cy = gy0 - (ys + 0.5) * ps
        keep = geometry.min_dist_to_polylines(cx, cy, aoi_lines) <= aoi_buffer
        ys, xs = ys[keep], xs[keep]
    vals = cells = None
    if ys.size:
        vals = mask[ys, xs]
        cx = gx0 + (xs + 0.5) * ps
        cy = gy0 - (ys + 0.5) * ps
        cells = cellindex.hex_cell(cx, cy, res)
    if corridor_rings is not None:
        nod = vals == -1 if ys.size else np.zeros(0, dtype=bool)
        n_invalid = 0
        if ys.size and nod.any():
            h, w = mask.shape
            if h * w <= _BITMAP_PIXEL_GATE:
                bm = _corridor_bitmap(corridor_rings, gx0, gy0, ps, h, w)
                n_invalid = int(bm[ys[nod], xs[nod]].sum())
            else:
                member = np.zeros(int(nod.sum()), dtype=bool)
                mx, my = cx[nod], cy[nod]
                for ring_x, ring_y in corridor_rings:
                    todo = ~member
                    if not todo.any():
                        break
                    member[todo] = geometry.point_in_polygon(mx[todo], my[todo], ring_x, ring_y)
                n_invalid = int(member.sum())
        summary_cell = n_invalid
    else:
        summary_cell = -1  # presence marker only
    if ys.size:
        return xs.astype(np.int32), ys.astype(np.int32), vals.astype(np.int8), cells, summary_cell
    return (np.empty(0, np.int32), np.empty(0, np.int32),
            np.empty(0, np.int8), np.empty(0, np.int64), summary_cell)


def emit_mask_rows(image_id: str, mask: np.ndarray, gx0: float, gy0: float,
                   ps: float, res: int, corridor_rings: list | None,
                   aoi_lines: list | None = None,
                   aoi_buffer: float = 0.0) -> list[pd.DataFrame]:
    """{1,0,-1} mask -> [points frame (if any), summary frame].

    pandas wrapper over :func:`_emit_mask_arrays` for the NetCDF
    ingest's mapInPandas kernel; values identical to the decode path."""
    px, py, vals, cells, summary_cell = _emit_mask_arrays(
        mask, gx0, gy0, ps, res, corridor_rings,
        aoi_lines=aoi_lines, aoi_buffer=aoi_buffer)
    out = []
    if px.size:
        out.append(pd.DataFrame(dict(
            image_id=image_id, px=px, py=py, value=vals, cell=cells)))
    out.append(pd.DataFrame(dict(
        image_id=[image_id], px=np.int32(-1), py=np.int32(-1),
        value=np.int8(SUMMARY_MARKER), cell=np.int64(summary_cell))))
    return out


def decode_points(images: DataFrame, grid: dict, res: int = 9,
                  threshold: float = water.NDWI_THRESHOLD,
                  corridor_rings: list | None = None,
                  aoi: tuple[list, float] | None = None,
                  min_bands: int = 4,
                  reproject: bool = False,
                  resample_method: str = "nearest",
                  plane_origin: tuple[float, float] = (-18.0, 120.0),
                  water_rule: str = "threshold",
                  warp_frame: str = "tangent",
                  utm_zone: int | None = None,
                  utm_south: bool = True,
                  on_undecodable: str = "raise") -> DataFrame:
    """images -> sparse mask points with hex cell keys + scene/date cols.

    ``grid``: dict(gx0, gy0, ps) — uniform georeferencing (validated by
    `validate_uniform_grid`).

    The kernel emits one fused summary row per image (px=py=-1,
    value=SUMMARY_MARKER). With ``corridor_rings`` (list of (ring_x,
    ring_y) arrays) its ``cell`` carries the in-corridor invalid count,
    so the >= 70 % validity filter needs no second pass over the points
    — the map-side fusion that removes a whole stage from the pipeline.
    Without rings, ``cell`` = -1: a presence-only marker that keeps the
    (scene, date) dimension complete even for images that emitted zero
    mask points (an all-dry valid image must still produce its
    zero-branch metrics row downstream).

    ``aoi``: (lines, buffer_m) — the module-1 buffered-AOI clip
    (src/utils/wd_batch.py:425-447): only pixels within ``buffer_m`` of
    any polyline are emitted. Fused into the decode kernel — the clip
    is a per-pixel predicate, so it costs no extra stage and the point
    volume shrinks at the source.

    ``min_bands``: the reference's band-count contract
    (src/utils/wd_batch.py:316-327): fewer bands than Blue,Green,Red,
    Nir is a hard error, raised per image inside the kernel so a
    mis-shaped table fails loudly instead of producing wrong masks.

    ``reproject``: S2 mixed-grid ingest (src/utils/wd_batch.py:329-373:
    scenes off the reference CRS/resolution are reprojected before
    detection). The image table must then carry per-row source-grid
    columns (gx0 double, gy0 double, ps double); each decoded raster is
    affine-resampled onto the target ``grid`` inside the same kernel —
    map-side, no extra stage, mixed and already-aligned rows can share
    one table (aligned rows short-circuit through kernels.resample).
    An optional per-row ``crs`` column extends this to MIXED-CRS
    tables (the reference reprojects such scenes,
    src/utils/wd_batch.py:364-366): rows marked ``"lonlat"`` carry
    their source grid in geographic degrees and are warped onto the
    planar target through the engine's tangent-plane bridge
    (kernels.resample.warp_from_lonlat, origin ``plane_origin``);
    rows marked ``"planar"`` (or with no crs column) take the affine
    path.

    ``on_undecodable``: ``"raise"`` (default — the reference-parity
    contract: a malformed scene fails the run loudly) or
    ``"quarantine"`` — any image whose decode/contract-check raises
    (lossy-VP8 webp, truncated bytes, band/shape violations) emits ONE
    quarantine row (px=py=-1, value=QUARANTINE_MARKER, cell=-1)
    instead of failing the task: the web-crawl regime, where a single
    bad payload must never kill a 10^6-row partition. Split the output
    with :func:`quarantined` / :func:`drop_quarantined`.
    """
    if on_undecodable not in ("raise", "quarantine"):
        raise ValueError(f"on_undecodable {on_undecodable!r} (raise|quarantine)")
    if water_rule not in ("threshold", "cluster"):
        # validated driver-side: quarantine mode must divert DATA
        # failures only — a config typo inside the kernel would
        # otherwise quarantine 100% of rows and "succeed" empty
        raise ValueError(f"unknown water_rule {water_rule!r} (threshold|cluster)")
    quarantine = on_undecodable == "quarantine"
    gx0, gy0, ps = grid["gx0"], grid["gy0"], grid["ps"]
    expected_hw = (grid["h"], grid["w"]) if "h" in grid and "w" in grid else None
    aoi_lines, aoi_buffer = None, 0.0
    if aoi is not None:
        aoi_lines = [(np.asarray(lx, dtype=np.float64), np.asarray(ly, dtype=np.float64))
                     for lx, ly in aoi[0]]
        aoi_buffer = float(aoi[1])

    def kernel(batches):
        import pyarrow as pa

        from ..kernels import resample as resamplek

        epoch_ord = 719163  # datetime.date(1970, 1, 1).toordinal()
        neg1_i32 = np.full(1, -1, dtype=np.int32)
        neg1_i64 = np.full(1, -1, dtype=np.int64)
        summary_val = np.full(1, SUMMARY_MARKER, dtype=np.int8)
        quarantine_val = np.full(1, QUARANTINE_MARKER, dtype=np.int8)

        for rb in batches:
            names = rb.schema.names
            cols_in = {n: rb.column(i) for i, n in enumerate(names)}
            ids = cols_in["image_id"].to_pylist()
            bufs = cols_in["bytes"].to_pylist()
            src_grids = None
            if reproject:
                crs_list = (cols_in["crs"].to_pylist() if "crs" in names
                            else ["planar"] * len(ids))
                src_grids = list(zip(cols_in["gx0"].to_pylist(),
                                     cols_in["gy0"].to_pylist(),
                                     cols_in["ps"].to_pylist(), crs_list))
            # per-frame accumulators: numpy point columns + the frame's
            # (image_id, scene, date, n_rows) — one record batch is
            # assembled per input batch with no intermediate pandas
            # frames (the old per-image pd.DataFrame build + concat +
            # serializer conversion was ~half the kernel's CPU;
            # guide §4.2 — hand whole batches to vectorized code)
            xs_l: list = []
            ys_l: list = []
            val_l: list = []
            cell_l: list = []
            f_id: list = []
            f_scene: list = []
            f_date: list = []
            f_len: list = []

            def decode_one(i: int, image_id: str, buf) -> int:
                arr = codecs.decode_image(bytes(buf))
                if arr.shape[0] < min_bands:
                    raise ValueError(
                        f"{image_id}: {arr.shape[0]} bands < required {min_bands} "
                        "(band order contract: Blue,Green,Red,Nir[,Mir2])"
                    )
                if src_grids is None and expected_hw is not None and arr.shape[1:] != expected_hw:
                    # S1 uniformity, asserted map-side per image — no
                    # separate driver-side distinct() action barrier
                    raise ValueError(
                        f"{image_id}: raster shape {arr.shape[1:]} != grid {expected_hw} "
                        "(uniform-grid contract; pass reproject=True for mixed grids)"
                    )
                if src_grids is not None:
                    sgx0, sgy0, sps, scrs = src_grids[i]
                    src_g = dict(gx0=float(sgx0), gy0=float(sgy0), ps=float(sps))
                    dst_g = dict(gx0=gx0, gy0=gy0, ps=ps, w=grid["w"], h=grid["h"])
                    if scrs == "lonlat":
                        # warp_frame="utm" + utm_zone: the target grid
                        # is a TRUE WGS84 UTM grid (the reference's
                        # estimate_utm_crs form) and the inverse runs
                        # through the Snyder series — datum-grade on
                        # wide scenes where the tangent plane drifts
                        arr = resamplek.warp_from_lonlat(
                            arr, src_g, dst_g, plane_origin[0], plane_origin[1],
                            method=resample_method, frame=warp_frame,
                            zone=utm_zone, south=utm_south)
                    elif scrs == "planar":
                        arr = resamplek.resample(arr, src_g, dst_g, method=resample_method)
                    else:
                        raise ValueError(f"{image_id}: unknown crs {scrs!r} (planar|lonlat)")
                if water_rule == "threshold":
                    mask = water.water_mask(arr, threshold)
                elif water_rule == "cluster":
                    # the reference's DWImageClustering analog
                    # (kernels/water.py:water_mask_cluster) — fused in
                    # the same decode pass, still one kernel per image
                    mask = water.water_mask_cluster(arr)
                else:
                    raise ValueError(
                        f"unknown water_rule {water_rule!r} (threshold|cluster)")
                px, py, vals, cells, summary_cell = _emit_mask_arrays(
                    mask, gx0, gy0, ps, res, corridor_rings,
                    aoi_lines=aoi_lines, aoi_buffer=aoi_buffer)
                n_frames = 0
                if px.size:
                    xs_l.append(px)
                    ys_l.append(py)
                    val_l.append(vals)
                    cell_l.append(cells)
                    f_len.append(px.size)
                    n_frames = 1
                xs_l.append(neg1_i32)
                ys_l.append(neg1_i32)
                val_l.append(summary_val)
                cell_l.append(np.full(1, summary_cell, dtype=np.int64))
                f_len.append(1)
                return n_frames + 1

            for i, (image_id, buf) in enumerate(zip(ids, bufs)):
                if not quarantine:
                    n_frames = decode_one(i, image_id, buf)
                else:
                    try:
                        n_frames = decode_one(i, image_id, buf)
                    except Exception:
                        xs_l.append(neg1_i32)
                        ys_l.append(neg1_i32)
                        val_l.append(quarantine_val)
                        cell_l.append(neg1_i64)
                        f_len.append(1)
                        n_frames = 1
                # scene/date computed per IMAGE in Python (2 regex
                # matches + one date parse each — ~2k evaluations at
                # bench scale): cheaper than both the per-point-row JVM
                # regex (7.5M evaluations) and the r8-bonus broadcast
                # dim join, whose distinct Exchange + broadcast build
                # serialized ahead of the mask-write job. Runs OUTSIDE
                # the quarantine catch: a malformed date in the id
                # fails loudly on both sides (ANSI to_date parity).
                scene, date = _scene_date_py(image_id)
                f_id.extend([image_id] * n_frames)
                f_scene.extend([scene] * n_frames)
                f_date.extend([date] * n_frames)

            if not f_len:
                continue
            lens_a = np.asarray(f_len, dtype=np.int64)
            n_rows = int(lens_a.sum())

            def rep_utf8(strs: list) -> "pa.Array":
                # plain utf8 built from raw buffers: per-frame bytes
                # tiled C-side + cumsum offsets — no per-row Python
                # objects. (dictionary<utf8> converts 30x faster still
                # but Spark's ArrowColumnVector cannot read dictionary
                # vectors from a Python worker — getUTF8String throws —
                # so plain utf8 is the efficient encoding that works.)
                if any(s is None for s in strs):
                    # null ids (quarantined null-id rows): rare, object path
                    return pa.array(np.repeat(np.array(strs, dtype=object), lens_a),
                                    type=pa.string())
                bs = [s.encode("utf-8") for s in strs]
                widths = np.fromiter((len(b) for b in bs), dtype=np.int64,
                                     count=len(bs))
                data = b"".join(b * int(n) for b, n in zip(bs, lens_a))
                offsets = np.empty(n_rows + 1, dtype=np.int32)
                offsets[0] = 0
                np.cumsum(np.repeat(widths, lens_a), out=offsets[1:])
                return pa.StringArray.from_buffers(
                    n_rows, pa.py_buffer(memoryview(offsets)), pa.py_buffer(data))

            if any(d is None for d in f_date):
                date_arr = pa.array(np.repeat(np.array(f_date, dtype=object), lens_a),
                                    type=pa.date32())
            else:
                days = np.fromiter((d.toordinal() - epoch_ord for d in f_date),
                                   dtype=np.int32, count=len(f_date))
                date_arr = pa.array(np.repeat(days, lens_a), type=pa.date32())
            yield pa.record_batch(
                [rep_utf8(f_id),
                 pa.array(np.concatenate(xs_l)),
                 pa.array(np.concatenate(ys_l)),
                 pa.array(np.concatenate(val_l)),
                 pa.array(np.concatenate(cell_l)),
                 date_arr,
                 rep_utf8(f_scene)],
                names=["image_id", "px", "py", "value", "cell", "date", "scene"])

    cols = ["image_id", "bytes"] + (["gx0", "gy0", "ps"] if reproject else [])
    if reproject and "crs" in images.columns:
        cols.append("crs")
    # scene/date ride out of the kernel (see POINTS_DATED_SCHEMA) —
    # batch and streaming take the identical path, no dim join, no
    # per-point-row regex. mapInArrow, not mapInPandas: the output
    # columns are assembled zero-copy from the kernel's numpy arrays
    # (the pandas serializer re-expands Categoricals and converts
    # object columns per-element; measured ~0.3 s/decode-job slower
    # at bench scale, r8).
    return images.select(*cols).mapInArrow(kernel, schema=POINTS_DATED_SCHEMA)


def quarantined(points: DataFrame) -> DataFrame:
    """The quarantine frame: one row per undecodable image
    (decode_points(on_undecodable='quarantine'))."""
    return points.filter(F.col("value") == QUARANTINE_MARKER)


def drop_quarantined(points: DataFrame) -> DataFrame:
    """Mask points + summaries with quarantine rows removed — safe to
    feed into pipeline.run/fillop like a clean decode output."""
    return points.filter(F.col("value") != QUARANTINE_MARKER)


def with_scene_date(df: DataFrame, col: str = "image_id") -> DataFrame:
    """C1: parse scene + ISO date out of the image id (JVM-side regexp)."""
    return df.withColumn(
        "date",
        F.to_date(F.regexp_replace(F.regexp_extract(F.col(col), r"(\d{4}[-_]\d{2}[-_]\d{2})", 1), "_", "-")),
    ).withColumn("scene", F.regexp_extract(F.col(col), r"^([A-Za-z0-9]+)_", 1))


def validate_uniform_grid(images: DataFrame) -> None:
    """S1 uniformity assert: all images share one (w, h) raster grid."""
    distinct = images.select("w", "h").distinct().count()
    if distinct != 1:
        raise ValueError(f"non-uniform raster grid: {distinct} distinct (w, h) shapes")
