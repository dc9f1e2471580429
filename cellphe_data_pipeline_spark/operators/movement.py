"""Movement / trajectory features (M5 — SURVEY §2.10).

Re-expresses create_frame_summary_features.py:22-52 (reference: pandas
groupby-transform on a single node) as pure native window functions —
zero Python in the plan:

- start position  = first x/y per key ordered by time
  (reference: idxmin + join-back, create_frame_summary_features.py:23-25;
  here: ``first() over`` — one window, no extra shuffle or join)
- ``Dis``  = distance from start                 (lines 28-30)
- ``frame_dist`` = lag-1 step distance, null→0   (lines 33-36)
- ``Trac`` = cumulative path length              (line 39)
- ``D2T``  = straightness ratio Dis/Trac, 0/0→0  (lines 40-41)
- ``Vel``  = framerate * frame_dist / Δt, first-Δt null→1 (lines 44-49;
  Δt==0 also → 1, guarding simultaneous observations the reference's
  frame indexing cannot produce but wall-clock time can)

Scale: one hash-partition shuffle on the key, then every feature is
computed inside a single sorted window pass (whole-stage codegen).
At 100 TB with ~billions of keys this is the minimal-shuffle plan:
no join-back, no driver collect, skew bounded by max rows per key
(a cell/entity trajectory, thousands of rows at most).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cellphe_data_pipeline_spark.functions.scalars import euclid, safe_ratio

DEFAULT_FRAMERATE = 0.0028  # create_frame_summary_features.py:14 default


def movement_features(
    df: DataFrame,
    key: str,
    order: list[str],
    x: str,
    y: str,
    time_col: Column | None = None,
    framerate: float = DEFAULT_FRAMERATE,
) -> DataFrame:
    """Append Dis/Trac/D2T/Vel (+ frame_dist) per `key` trajectory.

    `order` must make the per-key ordering total (include a unique
    tiebreaker column) — window semantics are deterministic only then.
    `time_col` is a numeric expression for Δt (defaults to the first
    `order` column cast to double).
    """
    w = Window.partitionBy(key).orderBy(*order)
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t = time_col if time_col is not None else F.col(order[0]).cast("double")

    x_c, y_c = F.col(x), F.col(y)
    df = df.withColumns(
        {
            "x_start": F.first(x_c).over(w_cum),
            "y_start": F.first(y_c).over(w_cum),
            "_x_lag": F.lag(x_c).over(w),
            "_y_lag": F.lag(y_c).over(w),
            "_t_diff": t - F.lag(t).over(w),
        }
    )
    df = df.withColumns(
        {
            "Dis": euclid(x_c, y_c, F.col("x_start"), F.col("y_start")),
            "frame_dist": F.coalesce(
                euclid(x_c, y_c, F.col("_x_lag"), F.col("_y_lag")), F.lit(0.0)
            ),
        }
    )
    df = df.withColumn("Trac", F.sum("frame_dist").over(w_cum))
    df = df.withColumns(
        {
            "D2T": safe_ratio(F.col("Dis"), F.col("Trac")),
            "Vel": F.lit(framerate)
            * F.col("frame_dist")
            / F.when(F.col("_t_diff").isNull() | (F.col("_t_diff") == 0), F.lit(1.0)).otherwise(
                F.col("_t_diff")
            ),
        }
    )
    return df.drop("_x_lag", "_y_lag", "_t_diff")
