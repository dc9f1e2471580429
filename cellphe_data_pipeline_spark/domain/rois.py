"""ROI polygon operators (S9/S10/F16/F9/O4-array — SURVEY §2.1/§2.8).

The reference stores ROIs in ImageJ .zip files keyed by filename
(parse_xml.py:47-67) and re-reads them per frame
(frame_features_image.py:47). The engine keeps ROIs relational — an
``array<struct<x:int,y:int>>`` column in Parquet — so ROI "lookup" is a
plain join (J4/J5) and the zip format becomes an edge-side export.

Kernels:
- ``interpolate_rois`` (F16, parse_xml.py:13-45): Bresenham-close the
  gaps between consecutive vertices (wrapping last→first), then
  order-preserving dedup (O4, parse_xml.py:38-41). Per-row array work
  on short polygons (20-200 vertices) → an Arrow-batched pandas UDF;
  no shuffle at all, embarrassingly parallel over partitions.
- ``clip_negative`` (F9, frame_features_image.py:55-56): pure
  ``transform``/``greatest`` expression, codegen.
- ``roi_filename`` (F3, parse_xml.py:202-211): zero-pad to data-driven
  widths — the widths are aggregates broadcast back (two-pass), never a
  driver collect.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

COORDS_TYPE = ArrayType(
    StructType([StructField("x", IntegerType()), StructField("y", IntegerType())])
)


def clip_negative(coords: Column) -> Column:
    """F9: clamp coordinates at 0 (np.maximum(roi, 0))."""
    return F.transform(
        coords,
        lambda c: F.struct(
            F.greatest(c["x"], F.lit(0)).alias("x"),
            F.greatest(c["y"], F.lit(0)).alias("y"),
        ),
    )


def _bresenham(x0: int, y0: int, x1: int, y1: int) -> list[tuple[int, int]]:
    """Integer line from (x0,y0) to (x1,y1), endpoint excluded — the
    classic Bresenham walk (same contract as skimage.draw.line used at
    parse_xml.py:31, which returns inclusive; we exclude the endpoint so
    consecutive segments don't double vertices)."""
    pts = []
    dx, dy = abs(x1 - x0), -abs(y1 - y0)
    sx, sy = (1 if x0 < x1 else -1), (1 if y0 < y1 else -1)
    err = dx + dy
    x, y = x0, y0
    while (x, y) != (x1, y1):
        pts.append((x, y))
        e2 = 2 * err
        if e2 >= dy:
            err += dy
            x += sx
        if e2 <= dx:
            err += dx
            y += sy
    return pts


def _interp_one(coords: list) -> list[tuple[int, int]]:
    if not coords:
        return []
    pts: list[tuple[int, int]] = []
    n = len(coords)
    for i in range(n):
        x0, y0 = coords[i]
        x1, y1 = coords[(i + 1) % n]  # wrap last→first (parse_xml.py:33-36)
        pts.extend(_bresenham(int(x0), int(y0), int(x1), int(y1)))
    if not pts:  # single-vertex ROI
        pts = [(int(coords[0][0]), int(coords[0][1]))]
    # O4: dedup keeping first-occurrence order (parse_xml.py:38-41)
    seen: set[tuple[int, int]] = set()
    out = []
    for p in pts:
        if p not in seen:
            seen.add(p)
            out.append(p)
    return out


def interpolate_rois(df: DataFrame, coords_col: str = "coords") -> DataFrame:
    """F16+O4: gap-free ROI polygons via Bresenham + order-preserving
    dedup, as an Arrow-batched pandas UDF over the coords array."""

    @F.pandas_udf(COORDS_TYPE)
    def interp(s: pd.Series) -> pd.Series:
        return s.map(
            lambda coords: [
                {"x": x, "y": y}
                for x, y in _interp_one(
                    [(c["x"], c["y"]) for c in coords] if coords is not None else []
                )
            ]
        )

    return df.withColumn(coords_col, interp(F.col(coords_col)))


def roi_filename(
    df: DataFrame,
    frame_col: str = "FRAME",
    track_col: str = "TRACK_ID",
    id_col: str = "ID",
    out_col: str = "ROI_FILENAME",
) -> DataFrame:
    """F3: `FRAME-TRACK-ID` zero-padded to the max digit width of each
    component (parse_xml.py:202-211) — widths via aggregate + broadcast
    join-back (two-pass, SURVEY §7 hard part #3)."""
    widths = df.agg(
        *[
            F.max(F.length(F.col(c).cast("string"))).alias(f"_w_{c}")
            for c in (frame_col, track_col, id_col)
        ]
    )
    padded = F.concat_ws(
        "-",
        F.lpad(F.col(frame_col).cast("string"), F.col(f"_w_{frame_col}"), "0"),
        F.lpad(F.col(track_col).cast("string"), F.col(f"_w_{track_col}"), "0"),
        F.lpad(F.col(id_col).cast("string"), F.col(f"_w_{id_col}"), "0"),
    )
    return (
        df.crossJoin(F.broadcast(widths))
        .withColumn(out_col, padded)
        .drop(*[f"_w_{c}" for c in (frame_col, track_col, id_col)])
    )


def roi_mask_points(df: DataFrame, coords_col: str = "coords") -> DataFrame:
    """S11 analogue: rasterise ROI boundaries to (row-key, x, y) pixel
    rows — the relational form of the uint16 mask PNG (the binary PNG
    encode itself is an edge-side export, out of engine core)."""
    return df.withColumn("_pt", F.explode(F.col(coords_col))).select(
        *[c for c in df.columns if c != coords_col],
        F.col("_pt.x").alias("px"),
        F.col("_pt.y").alias("py"),
    )


ROI_ZIP_SCHEMA_DDL = "group_key string, roi_zip binary, n_rois int"


def rois_to_zip(df: DataFrame, group_col: str, name_col: str = "ROI_filename",
                coords_col: str = "coords") -> DataFrame:
    """S9/S12 sink shape (parse_xml.py:47-67, main.nf:376-390): package
    each group's ROIs into ONE zip payload — (group_key, roi_zip binary,
    n_rois). Entry format: `<name>.roi` containing the vertex list as
    little-endian int32 pairs (the ImageJ .roi polygon payload needs the
    `roifile` writer, absent here — the container/entry layout and the
    relational->archive boundary are the real, tested parts; swap the
    entry serializer for `roifile.roiwrite` in production).

    One zip per GROUP (frame or timelapse), built inside applyInPandas —
    archives parallelise across groups, no driver collect."""
    import io
    import struct
    import zipfile

    import pandas as pd  # noqa: F811

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
            for _, r in pdf.sort_values(name_col).iterrows():
                payload = b"".join(
                    struct.pack("<ii", int(c["x"]), int(c["y"])) for c in r[coords_col]
                )
                zf.writestr(f"{r[name_col]}.roi", payload)
        return pd.DataFrame(
            [
                {
                    "group_key": str(pdf[group_col].iloc[0]),
                    "roi_zip": buf.getvalue(),
                    "n_rois": len(pdf),
                }
            ]
        )

    return (
        df.select(group_col, name_col, coords_col)
        .groupBy(group_col)
        .applyInPandas(pack, ROI_ZIP_SCHEMA_DDL)
    )


def rois_from_zip(df: DataFrame, zip_col: str = "roi_zip") -> DataFrame:
    """S10 source: unpack the zip payload back to (name, coords) rows —
    the inverse of :func:`rois_to_zip` (reference reads the archive per
    frame, frame_features_image.py:47)."""
    import io
    import struct
    import zipfile

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("coords", COORDS_TYPE),
        ]
    )

    @F.udf(T.ArrayType(schema))
    def unpack(blob):
        out = []
        with zipfile.ZipFile(io.BytesIO(bytes(blob))) as zf:
            for entry in sorted(zf.namelist()):
                raw = zf.read(entry)
                pts = [
                    {"x": x, "y": y}
                    for x, y in struct.iter_unpack("<ii", raw)
                ]
                out.append({"name": entry.removesuffix(".roi"), "coords": pts})
        return out

    return df.withColumn("_rois", F.explode(unpack(F.col(zip_col)))).select(
        *[c for c in df.columns if c != zip_col],
        F.col("_rois.name").alias("name"),
        F.col("_rois.coords").alias("coords"),
    )
