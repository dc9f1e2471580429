"""QC report tables (tracking_qc.qmd / segmentation_qc.qmd — SURVEY §5).

The reference renders two human-QC HTML reports per run; every figure in
them is backed by a small relational query. The engine emits those
tables directly (plot rendering is presentation, not engine):

tracking_qc.qmd:
  - :30-35  duplicate (FRAME, TRACK_ID) spots           (P5)
  - :44-63  track lengths raw vs filtered + summary     (A2/U2/A3 exact median)
  - :82-122 position summaries on unique spots          (P6/A3)
  - :106-140 frame-to-frame + cumulative distance       (W1/F5/P8/W2)
  - :151-164 total distance per track + summary         (A4/A3)
segmentation_qc.qmd:
  - :159-181 per-cell pixel areas + cells/frame         (A5/P7/A2)
  - :182-214 area + count summaries                     (A3)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cellphe_data_pipeline_spark.functions.scalars import euclid
from cellphe_data_pipeline_spark.operators.aggregates import multistat_summary
from cellphe_data_pipeline_spark.operators.qc_filters import rows_with_group_count


def tracking_qc(
    spots_raw: DataFrame,
    spots_filtered: DataFrame,
    track_col: str = "TRACK_ID",
    frame_col: str = "frame",
    x_col: str = "x",
    y_col: str = "y",
) -> dict[str, DataFrame]:
    """All tracking-QC tables from the raw and QC-filtered spot tables."""
    dup_spots = rows_with_group_count(
        spots_raw, [frame_col, track_col], "n > 1"
    )

    def lengths(df: DataFrame, tag: str) -> DataFrame:
        return (
            df.groupBy(track_col)
            .agg(F.count(F.lit(1)).alias("track_length"))
            .withColumn("type", F.lit(tag))
        )

    track_lengths = lengths(spots_raw, "raw").unionByName(
        lengths(spots_filtered, "filtered")
    )
    length_summary = multistat_summary(track_lengths, ["type"], "track_length")

    w = Window.partitionBy(track_col).orderBy(frame_col)
    dists = (
        spots_filtered.withColumn(
            "frame_dist",
            euclid(
                F.col(x_col),
                F.col(y_col),
                F.lag(x_col).over(w),
                F.lag(y_col).over(w),
            ),
        )
        .filter(F.col("frame_dist").isNotNull())  # P8
        .withColumn(
            "cum_frame_dist",
            F.sum("frame_dist").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    total_dist = dists.groupBy(track_col).agg(
        F.sum("frame_dist").alias("total_dist")
    )
    return {
        "duplicate_spots": dup_spots,
        "track_lengths": track_lengths,
        "track_length_summary": length_summary,
        "frame_distances": dists,
        "total_distance": total_dist,
        "total_distance_summary": multistat_summary(
            total_dist.withColumn("_all", F.lit("all")), ["_all"], "total_dist"
        ).drop("_all"),
    }


def segmentation_highlight_frames(
    masks: DataFrame, method: str = "outline", stride: int = 10
) -> DataFrame:
    """The pixel table behind the segmentation report's highlight
    figures (r6 — routes the last unconnected config key,
    ``params.QC.segmentation_highlight``, main.nf:107): every
    ``stride``-th frame (the report plots ``i % 10 == 0``,
    segmentation_qc.qmd:56-58), rendered as boundary pixels
    (``'outline'`` → M6 :func:`mask_boundary_overlay`) or every
    labeled pixel (``'fill'`` → :func:`mask_fill_pixels`). An unknown
    method falls back to 'outline' EXACTLY like the report
    (segmentation_qc.qmd:30-35 warns and defaults) rather than
    raising — config files are user-supplied."""
    from cellphe_data_pipeline_spark.domain.images import (
        mask_boundary_overlay,
        mask_fill_pixels,
    )

    if method not in ("fill", "outline"):
        method = "outline"  # the report's documented fallback
    sel = masks.filter((F.col("frame_index") % stride) == 0)
    return mask_fill_pixels(sel) if method == "fill" else mask_boundary_overlay(sel)


def segmentation_qc(mask_histogram: DataFrame) -> dict[str, DataFrame]:
    """Segmentation-QC tables from the A5 label histogram
    (path, frame_index, mask_id, n): per-cell areas (background
    dropped, P7), cells per frame, and their summaries."""
    areas = mask_histogram.filter(F.col("mask_id") != 0).select(
        "path", "frame_index", "mask_id", F.col("n").alias("area_px")
    )
    cells_per_frame = areas.groupBy("path", "frame_index").agg(
        F.count(F.lit(1)).alias("n_cells")
    )
    return {
        "cell_areas": areas,
        "area_summary": multistat_summary(areas, ["path"], "area_px"),
        "cells_per_frame": cells_per_frame,
        "cells_per_frame_summary": multistat_summary(
            cells_per_frame, ["path"], "n_cells"
        ),
    }
