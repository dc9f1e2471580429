"""Parquet table sources for the driver's synthetic star schema.

Columnar Parquet replaces the reference's CSV interchange at every stage
boundary (main.nf:157,201,216,233,249 → SURVEY §2.1 S6): predicate
pushdown + column pruning reach the scan, so a 2-column projection reads
2 columns, not the whole row — the difference between touching 100 TB
and touching 2 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from cellphe_data_pipeline_spark.schemas import TEST_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema table. Schema comes from parquet footers
    (already explicit/typed — written by the driver); no inference pass."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TEST_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (mirrors the DuckDB oracle's
    pre-registered views) so queries can be pure SQL where convenient."""
    for name in TEST_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
