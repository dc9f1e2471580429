"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads);
the same config block is what we would ship to a 1000-executor cluster —
the only per-deployment knobs are master/shuffle-partition count.

Scale rationale (100 TB target):
- AQE on (coalesce partitions + skew-join splitting) so the static
  ``spark.sql.shuffle.partitions`` only needs to be an upper bound; on a
  real cluster set it to ~2-3x total cores and let AQE coalesce.
- Arrow transfer on: every pandas-UDF kernel (wavelets, image decode)
  moves columnar batches, not pickled rows.
- Session timezone pinned to UTC: deterministic timestamp semantics,
  required for DuckDB-oracle hash equality.
- 128 MiB parquet split size: keeps per-task input bounded so executor
  memory sizing is independent of total data volume.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "cellphe-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master=None`` → ``local[$SPARK_GRAFT_CPUS]`` (driver contract);
    on a cluster, pass the real master / rely on spark-submit.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # r16: AQE's coalescing floor (default 1 MiB) decides the
        # MINIMUM post-shuffle partition size, and with
        # parallelismFirst=true (default) it is also the coalescing
        # TARGET. At byte-light/CPU-heavy stages (window chains over
        # narrow rows) the 1 MiB floor collapses the post-shuffle stage
        # to 1-4 tasks and serialises the work (measured at sf0.1,
        # ABBA-interleaved: m5's window chain median 0.61s at a 256 KiB
        # floor vs 1.06s at 1 MiB; a8 similar; shuffle-chain queries
        # j10/t6 within noise). 64-128 KiB floors over-fragment the
        # multi-exchange queries, so 256 KiB is the measured optimum.
        # The floor only ever SPLITS nothing — partitions bigger than it
        # are untouched — so at 100 TB (partitions >> 1 MiB) the knob is
        # inert. Env-overridable for deployments whose per-task overhead
        # dominates at 256 KiB.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PART", "262144"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE demote sort-merge joins to shuffled-hash when the
        # per-partition build side fits 128 MiB (default 0 disables the
        # rule entirely): bucket/grid/band keys are massively duplicated
        # in this engine's join family, and SMJ's per-key-group handling
        # measured 9-12x slower than SHJ on them (SCALE.md r7, j7
        # 13.0s -> 1.1s). The explicit SHUFFLE_HASH hints on the grid
        # joins stay as plan-tested guarantees; this conf extends the
        # same protection, stat-driven and memory-bounded, to every
        # other join at runtime.
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "134217728")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bound pandas-UDF batch memory: image rows carry raster payloads,
        # so a 10k-row default Arrow batch could hold GBs (SURVEY §7 hard
        # part #6); 256 rows bounds executor memory independent of corpus
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.filterPushdown", "true")
        # The driver's events.parquet stores TIMESTAMP(NANOS) which Spark's
        # vectorized reader rejects (PARQUET_TYPE_ILLEGAL); read as long nanos
        # and convert in sources.tables.load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "33554432")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
