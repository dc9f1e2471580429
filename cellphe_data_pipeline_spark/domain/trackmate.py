"""S8/S2 — XML sources (SURVEY §2.1).

``parse_trackmate_xml`` re-expresses parse_xml.py:77-113: one TrackMate
XML document → three relational outputs (spots, edges, rois). The
reference walks an ElementTree on one node; here each XML document is a
row, every attribute list is extracted with a single ``xpath()`` call
(document order), and the per-spot lists are zipped positionally with
``arrays_zip`` + ``posexplode`` — the whole parse is one JVM-side
projection, no Python, and scales to millions of XML documents (one per
timelapse) by ordinary partition parallelism.

``parse_ome_companion`` re-expresses the 3 xpath processes + positional
channel merge of main.nf:257-303/425-437 (S2 + J6): all three
attributes in ONE pass — the positional zip the reference does across
process boundaries happens inside ``arrays_zip`` for free.

ROI boundary text (parse_xml.py:97-100): the spot element's text
payload is a flat whitespace-separated float list; reshaped to
array<struct<x,y>> and translated by the spot position (F11), with
negative clip (F9, frame_features_image.py:55-56) left to
``domain.rois`` so the raw parse stays lossless.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: TrackMate spot attributes parsed as doubles (parse_xml.py:170-196).
SPOT_DOUBLE_ATTRS = (
    "QUALITY",
    "POSITION_X",
    "POSITION_Y",
    "POSITION_Z",
    "POSITION_T",
    "RADIUS",
    "MEAN_INTENSITY_CH1",
    "MEDIAN_INTENSITY_CH1",
    "MIN_INTENSITY_CH1",
    "MAX_INTENSITY_CH1",
    "TOTAL_INTENSITY_CH1",
    "STD_INTENSITY_CH1",
    "CONTRAST_CH1",
    "SNR_CH1",
    "AREA",
    "PERIMETER",
    "CIRCULARITY",
    "SOLIDITY",
    "SHAPE_INDEX",
)


def _xpath(colname: str, path: str) -> Column:
    return F.expr(f"xpath({colname}, '{path}')")


def parse_trackmate_spots(
    df: DataFrame, xml_col: str = "xml", doc_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Spots table from TrackMate XML: one row per <Spot>, typed columns
    ID/name/FRAME ints + SPOT_DOUBLE_ATTRS doubles + boundary float list.

    1-indexing at the edge (ID+1? — the reference keeps raw TrackMate ids
    for spots and 1-indexes FRAME/TRACK_ID at export, parse_xml.py:198-200;
    we keep raw values here and 1-index in the export projection).
    """
    attrs = {
        "ID": _xpath(xml_col, "//Spot/@ID"),
        "name": _xpath(xml_col, "//Spot/@name"),
        "FRAME": _xpath(xml_col, "//Spot/@FRAME"),
        "boundary": _xpath(xml_col, "//Spot/text()"),
        **{a: _xpath(xml_col, f"//Spot/@{a}") for a in SPOT_DOUBLE_ATTRS},
    }
    zipped = F.arrays_zip(*[v.alias(k) for k, v in attrs.items()])
    out = df.select(*doc_cols, F.posexplode(zipped).alias("_pos", "_s"))
    # filter-then-cast: an empty/whitespace-only text node yields []
    # (split of "" gives [""], whose ANSI cast would fail the job);
    # try_cast tolerates malformed floats as null
    boundary = F.transform(
        F.filter(
            F.split(F.trim(F.col("_s.boundary")), r"\s+"), lambda v: v != ""
        ),
        lambda v: v.try_cast("double"),
    )
    return out.select(
        *doc_cols,
        F.col("_s.ID").cast("int").alias("ID"),
        F.col("_s.name").alias("LABEL"),  # name→LABEL rename (parse_xml.py:103)
        F.col("_s.FRAME").cast("int").alias("FRAME"),
        # try_cast: an empty or malformed attribute value reads as null
        # instead of failing the job under ANSI mode (and the engine's
        # own sink emits NULL attr values as empty strings)
        *[F.col(f"_s.{a}").try_cast("double").alias(a) for a in SPOT_DOUBLE_ATTRS],
        boundary.alias("boundary_flat"),
    )


def parse_trackmate_edges(
    df: DataFrame, xml_col: str = "xml", doc_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Edge list from TrackMate XML (G1 — parse_xml.py:108-113)."""
    zipped = F.arrays_zip(
        _xpath(xml_col, "//Edge/@SPOT_SOURCE_ID").alias("src"),
        _xpath(xml_col, "//Edge/@SPOT_TARGET_ID").alias("dst"),
    )
    out = df.select(*doc_cols, F.explode(zipped).alias("_e"))
    return out.select(
        *doc_cols,
        F.col("_e.src").cast("int").alias("src"),
        F.col("_e.dst").cast("int").alias("dst"),
    )


def spot_rois(spots: DataFrame) -> DataFrame:
    """ROI polygons from parsed spots (parse_xml.py:97-101): reshape the
    flat boundary list to (x,y) int pairs translated by the spot
    position. Output: (ID, FRAME, coords array<struct<x:int,y:int>>)."""
    n_pairs = F.size("boundary_flat") / 2
    idx = F.sequence(F.lit(0), (n_pairs - 1).cast("int"))
    coords = F.transform(
        idx,
        lambda i: F.struct(
            F.round(F.element_at("boundary_flat", i * 2 + 1) + F.col("POSITION_X"))
            .cast("int")
            .alias("x"),
            F.round(F.element_at("boundary_flat", i * 2 + 2) + F.col("POSITION_Y"))
            .cast("int")
            .alias("y"),
        ),
    )
    return spots.filter(F.size("boundary_flat") >= 2).select(
        "ID", "FRAME", coords.alias("coords")
    )


def parse_ome_companion(df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """S2+J6 in one pass: (FileName, IFD, FirstT) per TiffData element of
    an OME companion XML (main.nf:257-303, zip-merge 425-437)."""
    zipped = F.arrays_zip(
        _xpath(xml_col, "//TiffData/UUID/@FileName").alias("filename"),
        _xpath(xml_col, "//TiffData/@IFD").alias("ifd"),
        _xpath(xml_col, "//TiffData/@FirstT").alias("first_t"),
    )
    return df.select(F.explode(zipped).alias("_t")).select(
        F.col("_t.filename").alias("filename"),
        F.col("_t.ifd").cast("int").alias("ifd"),
        F.col("_t.first_t").cast("int").alias("first_t"),
    )


#: The reference's exact 24-column GUI-export order (parse_xml.py:170-196).
EXPORT_COLUMNS = (
    "LABEL",
    "ID",
    "TRACK_ID",
    "QUALITY",
    "POSITION_X",
    "POSITION_Y",
    "POSITION_Z",
    "POSITION_T",
    "FRAME",
    "RADIUS",
    "VISIBILITY",
    "MEAN_INTENSITY_CH1",
    "MEDIAN_INTENSITY_CH1",
    "MIN_INTENSITY_CH1",
    "MAX_INTENSITY_CH1",
    "TOTAL_INTENSITY_CH1",
    "STD_INTENSITY_CH1",
    "CONTRAST_CH1",
    "SNR_CH1",
    "AREA",
    "PERIMETER",
    "CIRCULARITY",
    "SOLIDITY",
    "SHAPE_INDEX",
)


def export_trackmate_features(spots: DataFrame, tracks: DataFrame) -> DataFrame:
    """The `trackmate_features.csv` export projection (P9/P12 +
    1-indexing, parse_xml.py:166-211): spots ⋈ track assignment, FRAME
    and TRACK_ID 1-indexed (parse_xml.py:198-200), int casts, the fixed
    24-column order, plus ROI_FILENAME zero-padded to data-driven widths
    (F3). `tracks` = renumber_tracks output (already 1-indexed)."""
    from cellphe_data_pipeline_spark.domain.rois import roi_filename

    joined = spots.join(
        tracks.select(F.col("ID"), F.col("TRACK_ID")), "ID"
    ).withColumns(
        {
            "FRAME": (F.col("FRAME") + 1).cast("int"),  # 1-index at the edge
            "ID": F.col("ID").cast("int"),
            "TRACK_ID": F.col("TRACK_ID").cast("int"),
            "VISIBILITY": F.lit(1).cast("int"),
        }
    )
    named = roi_filename(joined)  # FRAME-TRACK-ID, data-driven widths
    return named.select(*EXPORT_COLUMNS, "ROI_FILENAME")


def spots_to_trackmate_xml(
    spots: DataFrame,
    edges: DataFrame,
    group_col: str | None = None,
) -> DataFrame:
    """TrackMate XML SINK (r5c) — the write half of the engine's
    TrackMate surface (the reference only PARSES, parse_xml.py; the
    sink closes the round-trip so downstream TrackMate/Fiji tooling can
    consume engine output). One XML document per ``group_col`` value
    (or one overall), assembled relationally: per-spot/per-edge element
    strings via format_string (codegen), per-frame concat_ws +
    collect_list, then the document concat — no Python in the loop.

    Fidelity contract:
    - the spot name comes from a ``LABEL`` column when present
      (TrackMate labels are user-editable) and falls back to
      ``ID<id>``;
    - EVERY ``SPOT_DOUBLE_ATTRS`` column present on the input is
      emitted (missing columns are simply absent — the parser reads
      them as null either way), at %.6f — 1e-6 precision, enough for
      mask-centroid positions (pixel-count means), documented rather
      than hidden;
    - a spot with a null/empty boundary emits a single-space text node:
      the parser's positional ``//Spot/text()`` zip SKIPS text-less
      elements, so an empty element would silently shift every later
      spot's boundary onto the wrong spot (the space keeps the text
      list aligned; it parses back as an empty boundary).
    Output: (group?, xml string).

    Scale: a document per group (a timelapse), built by two combinable
    collect_list aggregations; the XML string is driver-sized per
    GROUP, not per corpus — the same bound as the reference's one-XML-
    per-timelapse layout."""
    g = [group_col] if group_col else []
    present = [a for a in SPOT_DOUBLE_ATTRS if a in spots.columns]
    # EVERY present column's attr is emitted on EVERY row — the
    # parser's positional xpath zip (like //Spot/text()) skips elements
    # missing an attr, so per-row omission would misalign every later
    # spot. A NULL value emits an EMPTY attr string, which the parser's
    # try_cast reads back as null (never a fake 0.0).
    attr_frags = [
        F.when(
            F.col(a).isNotNull(), F.format_string(f' {a}="%.6f"', F.col(a))
        ).otherwise(F.lit(f' {a}=""'))
        for a in present
    ]
    name_col = (
        F.coalesce(F.col("LABEL"), F.format_string("ID%d", F.col("ID")))
        if "LABEL" in spots.columns
        else F.format_string("ID%d", F.col("ID"))
    )
    # LABEL is user-editable; escape XML metacharacters (& FIRST, so
    # the entities introduced by the later replaces aren't re-escaped)
    # or a label like 'R&D <x>' emits a document neither this module's
    # own xpath parser nor Fiji/TrackMate can read back.
    for raw, ent in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;")):
        name_col = F.replace(name_col, F.lit(raw), F.lit(ent))
    boundary = F.when(
        F.coalesce(F.col("boundary_txt"), F.lit("")) == "", F.lit(" ")
    ).otherwise(F.col("boundary_txt"))
    spot_el = F.concat(
        F.format_string('<Spot ID="%d" name="%s" FRAME="%d"', F.col("ID"),
                        name_col, F.col("FRAME")),
        *attr_frags,
        F.format_string(' VISIBILITY="1">%s</Spot>', boundary),
    )
    frames = (
        spots.withColumn("_el", spot_el)
        .groupBy(*g, "FRAME")
        .agg(
            F.concat_ws(
                "", F.array_sort(F.collect_list(F.struct(F.col("ID"), F.col("_el"))))
                .getField("_el")
            ).alias("_spots")
        )
        .select(
            *g,
            "FRAME",
            F.format_string(
                '<SpotsInFrame frame="%d">%s</SpotsInFrame>', F.col("FRAME"), F.col("_spots")
            ).alias("_sif"),
        )
    )
    spots_xml = frames.groupBy(*g).agg(
        F.concat_ws(
            "",
            F.array_sort(F.collect_list(F.struct(F.col("FRAME"), F.col("_sif"))))
            .getField("_sif"),
        ).alias("_allspots")
    )
    edge_el = F.format_string(
        '<Edge SPOT_SOURCE_ID="%d" SPOT_TARGET_ID="%d"/>', F.col("src"), F.col("dst")
    )
    edges_xml = edges.withColumn("_el", edge_el).groupBy(*g).agg(
        F.concat_ws(
            "",
            F.array_sort(
                F.collect_list(F.struct(F.col("src"), F.col("dst"), F.col("_el")))
            ).getField("_el"),
        ).alias("_alledges")
    )
    joined = spots_xml.join(edges_xml, g, "left") if g else spots_xml.crossJoin(
        edges_xml
    )
    return joined.select(
        *g,
        F.concat(
            F.lit('<?xml version="1.0" encoding="UTF-8"?><TrackMate><Model>'
                  "<AllSpots>"),
            F.col("_allspots"),
            F.lit("</AllSpots><AllTracks><Track>"),
            F.coalesce(F.col("_alledges"), F.lit("")),
            F.lit("</Track></AllTracks></Model></TrackMate>"),
        ).alias("xml"),
    )
