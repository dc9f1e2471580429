"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``cellphe_data_pipeline_spark.queries`` — a
registry of (spark callable, DuckDB oracle SQL) pairs, one per
implemented operator from SURVEY.md §2 plus the training-data-pipeline
extensions (dedup / text / similarity).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# importable regardless of the caller's cwd
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from cellphe_data_pipeline_spark.queries import REGISTRY  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (M5 movement features — SURVEY §2.10, the
    reference's create_frame_summary_features.py:22-52 chain) at
    sf0.001. Also exercises the nanos-timestamp `events` read that
    blocked round 1."""
    return REGISTRY["m5_movement_features"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: e.fn for name, e in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query;
    non-SQL-expressible kernels (wavelet UDAF) are omitted → the driver
    records a weaker rows-only check for those."""
    return {name: e.sql for name, e in REGISTRY.items() if e.sql is not None}
