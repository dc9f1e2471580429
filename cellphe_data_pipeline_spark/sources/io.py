"""Tabular sources/sinks (S6/S7/S13/S14/S15 — SURVEY §2.1).

The reference's interchange format is headered CSV at every stage
boundary (main.nf:157,201,216,233,249) with hand-rolled empty-result
handling (frame_features_image.py:72-78) and a published-dir result
tree (main.nf:26 etc.). The engine keeps CSV at the EDGES (ingest /
export, with explicit schemas — never inference in production paths)
and uses Parquet for every internal stage boundary: columnar pruning +
predicate pushdown are what make a 2-column projection of a 100 TB
stage read 2 columns.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    """S6 source: headered CSV with an EXPLICIT schema (no inference
    pass — inference reads the data twice and guesses types)."""
    return spark.read.csv(path, schema=schema, header=header, mode="PERMISSIVE")


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """S6 sink. Always writes the header even for empty frames — the
    engine-side equivalent of the reference's header-only empty CSV
    (S7, frame_features_image.py:72-78)."""
    df.write.mode("overwrite").option("header", header).csv(path)


def empty_with_schema(spark: SparkSession, schema: T.StructType) -> DataFrame:
    """S7: schema-safe empty relation — downstream `unionByName` keeps
    working (the reference hand-writes a header-only CSV for this)."""
    return spark.createDataFrame([], schema)


def read_config(spark: SparkSession, path: str) -> dict:
    """S13 source: one JSON config document → driver-side dict (the
    reference's params-file, main.nf:3-10). Driver-side by design:
    config is broadcast into closures, not a distributed relation."""
    [row] = spark.read.text(path, wholetext=True).collect()
    return json.loads(row["value"])


def write_config(spark: SparkSession, config: dict, path: str) -> None:
    """S13 sink: persist the run's config snapshot for provenance
    (save_*_config, main.nf:57-89)."""
    df = spark.createDataFrame([(json.dumps(config, indent=2, sort_keys=True),)], "value string")
    df.coalesce(1).write.mode("overwrite").text(path)


def read_lines(spark: SparkSession, path: str) -> DataFrame:
    """S14: text source, one trimmed row per line (splitText·trim,
    main.nf:425-434)."""
    return spark.read.text(path).select(F.trim(F.col("value")).alias("value"))


def publish(df: DataFrame, path: str, partition_by: tuple[str, ...] = ()) -> None:
    """S15: stage-boundary sink — checkpointed Parquet replacing the
    reference's publishDir copy tree; also the engine's `-resume`
    equivalent (a published stage is a re-readable cut point)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


# ---------------------------------------------------------------------
# Snapshot manifests (r10, s20): the table-format core in miniature —
# an immutable parquet-file pool plus per-snapshot manifests (explicit
# file lists). A new snapshot REUSES every untouched data file
# (copy-on-write at file granularity), readers resolve a manifest then
# read exactly its files (never a directory listing race), old
# snapshots stay readable forever (time travel / rollback = read an
# older manifest). This is the Iceberg/Delta contract stripped to what
# plain parquet + JSON can carry; it lacks their atomic catalog swap —
# the manifest write is the commit point, single-writer assumed.
# ---------------------------------------------------------------------


def snapshot_data_files(path: str) -> list[str]:
    """All parquet data files under a written slice dir, sorted."""
    import os

    out = []
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                out.append(os.path.join(root, f))
    return sorted(out)


def snapshot_commit(table_dir: str, snapshot_id: int, files: list[str]) -> None:
    """Commit a snapshot: write its explicit file list as
    manifests/v{id}.json. The manifest IS the snapshot — data files
    are immutable and shared across snapshots."""
    import os

    mdir = os.path.join(table_dir, "manifests")
    os.makedirs(mdir, exist_ok=True)
    with open(os.path.join(mdir, f"v{snapshot_id}.json"), "w") as f:
        json.dump({"snapshot_id": snapshot_id, "files": sorted(files)}, f)


def snapshot_files(table_dir: str, snapshot_id: int) -> list[str]:
    import os

    with open(os.path.join(table_dir, "manifests", f"v{snapshot_id}.json")) as f:
        return json.load(f)["files"]


def snapshot_read(spark: SparkSession, table_dir: str, snapshot_id: int) -> DataFrame:
    """Time-travel read: resolve the manifest, read exactly its files.
    Partition values live IN the data (no path-derived columns), so a
    manifest can mix files from any write batch."""
    return spark.read.parquet(*snapshot_files(table_dir, snapshot_id))
