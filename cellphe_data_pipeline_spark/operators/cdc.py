"""Change-data-capture maintenance: latest-wins upsert merge.

The maintenance half of a large-scale training-data pipeline: a keyed
base snapshot (the published corpus/state table) plus an op log of
inserts/updates/deletes (tombstones) folds into the next snapshot.
This is the MERGE INTO / SCD-type-1 shape every incremental ingest
loop runs, expressed as ONE union + ONE key-partitioned window — the
|B|+|C| single-shuffle plan (the same composition idiom as the as-of
join, joins.py asof_join), never a join of base against changes.

Scale shape:
- Cost is one shuffle of base+changes on the merge key; with the base
  bucketed by key (operators/scale.py bucketed_table) the base side's
  exchange disappears and only the (much smaller) change log moves.
- Deletes are data (tombstone rows win the window then drop), so the
  plan is append-only — no per-key point lookups, no driver loops.
- The window frame is row_number-only: no full-partition buffering;
  AQE handles skewed hot keys (many updates to one key) by splitting
  the sort spill, and a salted pre-aggregation of the change log
  (keep only its per-key winner first) bounds any hot key to one row
  per salt — that pre-pass is `collapse_log`, reused for the base
  snapshot build.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def collapse_log(
    df: DataFrame, keys: list[str], seq: list[Column | str]
) -> DataFrame:
    """Per-key winner of an op log under descending ``seq`` order
    (latest wins; pass a unique tiebreaker last for determinism).
    ONE combinable shape: row_number over the key window. Run this on
    a change log BEFORE merging to bound hot keys to a single row."""
    order = [F.col(s).desc() if isinstance(s, str) else s for s in seq]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    seq: list[Column | str],
    delete_col: str = "is_delete",
) -> DataFrame:
    """Latest-wins MERGE of an op log into a keyed snapshot.

    ``base``: one row per key (no ``delete_col`` needed — it is added
    as false). ``changes``: op log with ``delete_col`` marking
    tombstones. Any change beats the base row for its key; among
    changes the greatest ``seq`` wins (tie-break with a unique column).
    A winning tombstone removes the key from the output; the output
    drops ``delete_col`` and carries the winner's remaining columns.

    Plan: union + one key-window + filter — a single |B|+|C| shuffle
    on the merge key, no join.
    """
    if delete_col not in base.columns:
        base = base.withColumn(delete_col, F.lit(False))
    b = base.withColumn("_src", F.lit(0))
    c = changes.withColumn("_src", F.lit(1))
    u = b.unionByName(c)
    order = [F.col("_src").desc()] + [
        F.col(s).desc() if isinstance(s, str) else s for s in seq
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        u.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (~F.col(delete_col)))
        .drop("_rn", "_src", delete_col)
    )
