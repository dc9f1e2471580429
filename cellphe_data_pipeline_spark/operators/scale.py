"""Scale-path operators: bucketed co-located joins and skew salting.

These are the two levers the 100 TB deployment pulls that small-scale
code never needs (SURVEY §4; engine-side additions):

- **Bucketing** (`publish_bucketed` / `bucketed_join_ready`): the fact
  tables of the domain (spots, frame features) are re-joined on the
  same keys at every stage (J2/J3). Writing them bucketed+sorted by
  that key makes every later join a zero-shuffle zip of co-located
  buckets — `.explain` shows SortMergeJoin with NO Exchange on either
  side. At 100 TB that's the difference between re-shuffling petabytes
  per query and never shuffling them again.
- **Salting** (`salted_join`): a skewed build key (one hot cell/frame/
  token) overloads a single reducer. Salting splits each hot left key
  into `salt` shards and replicates the matching right rows per shard:
  shuffle balance restored at the cost of a bounded `salt`× replication
  of the (small) right side. AQE's skew-join handles moderate skew
  automatically; salting is the deterministic heavy-skew fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def publish_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """S15 scale variant: persist a stage output bucketed (and sorted)
    by its join key so downstream equi-joins on that key are
    exchange-free. Hive-style bucketing via saveAsTable (bucket metadata
    lives in the catalog)."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols is None:
        sort_cols = bucket_cols
    w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: left side gets a deterministic per-row salt
    (hash of the full row id space, NOT random — reproducible plans),
    right side is replicated `salt`× via explode. Join key becomes
    (key, salt): a hot key's rows now spread over `salt` reducers.

    Use when one side has pathological key skew that AQE's split
    threshold doesn't catch; `salt` bounds right-side replication.

    Only ``inner`` and ``left`` joins are supported: the right side is
    replicated `salt`×, so right/full outer joins would emit each
    UNMATCHED right row `salt` times (matched rows are fine — they pair
    with exactly one left salt value). Inner/left never surface
    unmatched right rows, so replication is invisible.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: "
            "right-side replication would duplicate unmatched right rows"
        )
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)).cast("int")
    l = left.withColumn("_salt", lsalt)
    r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l.join(r, [key, "_salt"], how)
    return out.drop("_salt")
