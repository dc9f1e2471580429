"""Input resolution + frame canonicalisation (E2 steps 1-2, SURVEY §3).

Reference: main.nf:418-468 — glob the raw dir, branch 4 ways (OME
companion / JPEGs / single stacked TIFF / many per-frame TIFFs),
replace spaces in names (F2, :322-337), natural-sort (O2, :353-355) and
renumber to the canonical ``frame_%05d`` naming (W4, :349-358).

Engine form: one binaryFile scan + a dispatch on extension/companion
presence; every branch lands in the same canonical frames relation
(timelapse_id, global_index, frame_name, height, width, data), so
downstream stages never know which branch produced a frame. The
OME-companion branch derives the global index from the companion's
FirstT (S2) joined on (filename, ifd); the other branches derive it
from the natural-sorted file order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cellphe_data_pipeline_spark.domain.images import scan_images, split_frames
from cellphe_data_pipeline_spark.domain.trackmate import parse_ome_companion
from cellphe_data_pipeline_spark.functions.scalars import natural_sort_key


def classify_inputs(binaries: DataFrame) -> DataFrame:
    """S1 dispatch: tag each file ome_companion / image / other by name
    (main.nf:418-452's glob branches as one predicate column)."""
    name = F.element_at(F.split(F.col("path"), "/"), -1)
    ext = F.lower(F.element_at(F.split(name, r"\."), -1))
    kind = (
        F.when(F.lower(name).contains("companion.ome"), "ome_companion")
        .when(ext.isin("jpg", "jpeg", "tif", "tiff", "fake"), "image")
        .otherwise("other")
    )
    return binaries.withColumn("file_name", name).withColumn("kind", kind)


def canonical_frames(
    binaries: DataFrame, companions: DataFrame | None = None
) -> DataFrame:
    """Canonicalise every branch to
    (path, global_index, frame_name, height, width, data).

    - With `companions` (OME XML rows): global index = FirstT joined on
      (file_name, ifd) — the reference's 3-xpath + positional merge.
    - Without: frames ordered by (natural sort of the SPACE-NORMALISED
      file name, page index), numbered 1..N per timelapse root.
    Frame names are `frame_%05d` with spaces replaced (F2+F4).
    """
    tagged = classify_inputs(binaries)
    frames = split_frames(tagged.filter(F.col("kind") == "image"))
    name = F.element_at(F.split(F.col("path"), "/"), -1)
    norm_name = F.regexp_replace(name, " ", "_")  # F2

    if companions is not None:
        ome = parse_ome_companion(companions)
        joined = frames.withColumn("file_name", name).join(
            F.broadcast(ome),
            (F.col("file_name") == F.col("filename"))
            & (F.col("frame_index") == F.col("ifd")),
        )
        idx = F.col("first_t") + 1  # 1-indexed like the reference
        base = joined
    else:
        # Scale-safe numbering: number a NARROW (path, frame_index)
        # projection with the two-pass partition-offset form, then hash-
        # join back — the binary frame payloads never cross a single-
        # partition window NOR an Arrow boundary.
        from cellphe_data_pipeline_spark.operators.scale import global_row_number

        keys = global_row_number(
            frames.select("path", "frame_index"),
            [natural_sort_key(norm_name), F.col("frame_index")],
            "_rn",
        )
        base = frames.join(keys, ["path", "frame_index"])
        idx = F.col("_rn")

    return base.select(
        "path",
        idx.cast("int").alias("global_index"),
        F.format_string("frame_%05d.tiff", idx.cast("int")).alias("frame_name"),
        "height",
        "width",
        "data",
    )


def resolve_input(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """E2 entry: scan a raw directory and produce the canonical frame
    relation, auto-detecting the OME-companion branch."""
    binaries = classify_inputs(scan_images(spark, path, glob=glob))
    comps = binaries.filter(F.col("kind") == "ome_companion").select(
        F.col("content").cast("string").alias("xml")
    )
    # Branch dispatch is a deliberate plan-build action (isEmpty = scan
    # until first match, the minimal probe). A lazy union-of-branches was
    # considered and rejected: the no-companion branch's scale-safe
    # numbering pass runs real jobs when constructed, so building BOTH
    # branches would do strictly more work than this one probe — and the
    # reference's channel branch (main.nf:425-452) is likewise decided
    # at wiring time.
    return canonical_frames(
        binaries, companions=None if comps.isEmpty() else comps
    )
