"""Lineage cutting with a cluster-honest replicated variant.

The engine cuts lineage at iterative/reused frontiers (CC rounds,
minhash signatures, the pipeline's kernel-stage boundaries) so each
expensive stage runs once and downstream plans re-optimise from a flat
scan. The default cut is ``localCheckpoint`` — fastest on local[n] and
on healthy clusters, but its blocks live on the executors that computed
them with no replication: lose an executor and every plan reading the
cut fails unrecoverably (Spark cannot recompute a truncated lineage).

For real-cluster runs the engine therefore offers a REPLICATED cut:
write the frame to parquet under a durable directory (the same S15
publish idiom the reference uses for its stage outputs — main.nf:26,95
``publishDir`` — which is exactly a lineage cut that survives worker
loss) and read it back. Enable it by setting either

- Spark conf ``spark.cellphe.checkpointDir``, or
- env var ``CELLPHE_CHECKPOINT_DIR``

to a directory on shared storage (HDFS/S3/NFS). Unset (the default),
every ``cut_lineage`` call is a plain ``localCheckpoint`` and plans are
byte-identical to previous rounds.

Semantics notes:
- The parquet variant is always EAGER (the write materialises); lazy
  local cuts (``eager=False`` — the fused probe/materialise trick in
  the CC loop and minhash) degrade to eager under the flag. That trades
  one extra job per loop round for executor-loss safety — the right
  trade on a 1000-executor cluster where preemption is routine.
- Parquet round-trips preserve every type the engine uses (nested
  structs/arrays/binary included) but not non-parquet-able frames; all
  call sites cut relational frames, which are.
- Files are NOT auto-deleted: on a cluster the directory doubles as a
  resumable-stage cache (delete per run-id externally). Use a per-run
  subdirectory when invoking.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame

#: Spark conf key that switches every cut_lineage() to the replicated
#: parquet variant. Checked at CALL time so a long-lived session can
#: flip modes between jobs.
CHECKPOINT_DIR_CONF = "spark.cellphe.checkpointDir"
CHECKPOINT_DIR_ENV = "CELLPHE_CHECKPOINT_DIR"


def _replicated_dir(df: DataFrame) -> str | None:
    try:
        d = df.sparkSession.conf.get(CHECKPOINT_DIR_CONF, None)
    except Exception:
        d = None
    return d or os.environ.get(CHECKPOINT_DIR_ENV) or None


def cut_lineage(df: DataFrame, eager: bool = True, name: str = "cut") -> DataFrame:
    """Cut ``df``'s lineage; replicated (parquet) when configured.

    Default: ``df.localCheckpoint(eager=eager)`` — single-process
    blocks, fastest, fragile to executor loss. With
    ``spark.cellphe.checkpointDir`` (or ``$CELLPHE_CHECKPOINT_DIR``)
    set: write to ``<dir>/<name>-<uuid>.parquet`` and read back — the
    cut survives any worker failure because the storage layer, not
    executor block managers, holds the data.
    """
    base = _replicated_dir(df)
    if base is None:
        return df.localCheckpoint(eager=eager)
    path = os.path.join(base, f"{name}-{uuid.uuid4().hex}.parquet")
    df.write.mode("error").parquet(path)
    return df.sparkSession.read.parquet(path)
