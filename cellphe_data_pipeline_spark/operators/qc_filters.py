"""QC filters (P1/P2/P5/P6 — SURVEY §2.2).

Reference: filter_size_and_observations (main.nf:178-188, R dplyr)
  filter(AREA >= minimum_cell_size)
  group_by(TRACK_ID) |> filter(n() >= minimum_observations)

The group-cardinality HAVING-that-keeps-rows is expressed as a window
count, NOT groupBy+join-back: one shuffle on the key instead of two,
and no broadcast of a potentially huge key list. At 100 TB the window
form is also AQE-skew-splittable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def filter_size_and_observations(
    df: DataFrame,
    area_col: str = "AREA",
    key: str = "TRACK_ID",
    minimum_cell_size: float = 50.0,
    minimum_observations: int = 50,
) -> DataFrame:
    """P1 + P2: scalar predicate, then keep all rows of keys whose
    surviving group size meets the threshold (main.nf:180-185)."""
    sized = df.filter(F.col(area_col) >= F.lit(minimum_cell_size))
    n = F.count(F.lit(1)).over(Window.partitionBy(key))
    return (
        sized.withColumn("_n", n)
        .filter(F.col("_n") >= F.lit(minimum_observations))
        .drop("_n")
    )


def rows_with_group_count(
    df: DataFrame, keys: list[str], predicate: str
) -> DataFrame:
    """Generic keep-rows-by-group-cardinality (P5 duplicate-key detector
    `n > 1` tracking_qc.qmd:30-35; P6 unique-key filter `n == 1`
    tracking_qc.qmd:82-84). `predicate` is a SQL boolean over column `n`.
    """
    n = F.count(F.lit(1)).over(Window.partitionBy(*keys))
    return df.withColumn("n", n).filter(F.expr(predicate))
