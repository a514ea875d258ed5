"""SparkSession factory with scale-oriented defaults.

Local testing runs ``local[N]``; the same configuration carries to a
real cluster (AQE for runtime re-planning / skew joins, broadcast
threshold, partition-size caps). Nothing here is local-mode-specific
except the master URL, which the caller may override.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "scratchdata-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for the analytics engine.

    Defaults follow the 100 TB design notes in SURVEY.md §4:
    AQE on (adaptive join selection, skew-join splitting, partition
    coalescing), arrow-accelerated Python interop, and a shuffle
    partition count sized from the env (``SPARK_GRAFT_CPUS``) so tiny
    local runs don't pay 200-task overhead while cluster runs can
    raise it.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # 128 MB input splits: good parquet scan granularity at scale.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # bound output file size on writes (compaction, copy, ingest)
        .config("spark.sql.files.maxRecordsPerFile", str(5_000_000))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # testdata parquet carries TIMESTAMP(NANOS); read as ntz.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    # Extra driver jars (JDBC drivers for the real-backend integration
    # tests — e.g. the ClickHouse JDBC jar). Must be set before the
    # JVM starts; a second getOrCreate in the same process cannot add
    # jars retroactively.
    extra_jars = os.environ.get("SPARK_GRAFT_EXTRA_JARS")
    if extra_jars:
        builder = builder.config("spark.jars", extra_jars)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
