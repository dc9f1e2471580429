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


def expectations_audit(
    df: DataFrame, rules: dict[str, "F.Column"]
) -> DataFrame:
    """Generic row-level data-quality expectations (r9) — the
    deequ/dbt-tests engine surface the reference hand-rolls per QC
    notebook (tracking_qc.qmd's duplicate/NA/size checks, each its own
    dplyr block): every rule is a named boolean Column evaluated
    per row; the output carries ``passed`` plus the sorted
    ``failed_rules`` array, so one pass feeds BOTH the clean branch
    (``filter(passed)``) and the quarantine branch with its
    per-rule diagnosis — no second scan, no per-rule job.

    Scale shape: rules are plain Column expressions, so everything
    row-local stays in whole-stage codegen; a referential rule is
    expressed by the CALLER as a broadcast-joined flag column before
    calling (see p15's existence flag — the rule itself stays a
    Column). NULL rule results count as FAILURES (an expectation that
    cannot be evaluated is not met — the SQL trap where
    ``value BETWEEN a AND b`` is NULL, not false, on NULL input).
    """
    checks = [
        (name, F.coalesce(col.cast("boolean"), F.lit(False)))
        for name, col in rules.items()
    ]
    # array_sort is the ONE place the sorted-failed_rules contract
    # lives (r9 review: sorting the dict AND the array was the same
    # work twice); F.filter preserves element order, so the sort runs
    # once on a bounded array
    failed = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(~ok, F.lit(name)).otherwise(F.lit(None))
                    for name, ok in checks
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    out = df.withColumn("failed_rules", failed)
    return out.withColumn("passed", F.size("failed_rules") == 0)


def observe_stats(df: DataFrame, name: str, metrics: dict[str, "F.Column"]):
    """In-flight pipeline observability (r11, p16) — p15's expectations
    audit moved INTO the job: ``df.observe`` attaches named aggregate
    metrics to a point in the plan, computed as an accumulator
    side-channel WHILE the enclosing action runs — row counts, null
    rates, domain violations arrive with the job's own result, not
    from a second pass (at 100 TB nobody re-scans the input to learn
    the output was wrong). Returns ``(observed_df, observation)``;
    read ``observation.get`` AFTER an action has run over the
    returned frame.

    Mechanics and limits, recorded:
      - metrics must be aggregate expressions with NO distinct and no
        result-dependent short-circuits (Spark enforces this at
        analysis time) — they fold map-side like any partial agg, so
        the side-channel costs no extra shuffle and no second scan;
      - the metric point OBSERVES the rows flowing through that exact
        plan node: place it on the source to audit ingest, after a
        filter to audit the surviving branch;
      - values surface through the JVM QueryExecutionListener /
        observedMetrics machinery — ``Observation`` is PySpark's
        blessed wrapper over that listener (streaming surfaces the
        same node per micro-batch via ``progress.observedMetrics``);
      - AQE re-planning preserves observe nodes (the collected metrics
        survive runtime plan rewrites — pinned by test)."""
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *[c.alias(n) for n, c in metrics.items()]), obs
