"""SparkSession factory tuned for this engine.

Local testing runs on local[N]; the same settings are what we would ship on a
real cluster (AQE, skew-join handling, broadcast threshold, Arrow). Partition
counts are sized by ``spark.sql.shuffle.partitions`` — on a 1000-executor
cluster you would raise it (or rely on AQE coalescing, which is enabled).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "osmpbf_spark", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-minded defaults.

    - AQE on: runtime coalescing, skew-join splitting, dynamic broadcast.
    - Arrow on: vectorized Python<->JVM transfer for the pandas UDF paths and
      for the osmpbf data source's batch emission.
    - shuffle.partitions matches local core count; on a real cluster this is
      set to ~2-3x total cores or left to AQE's coalescing.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        # let the osmpbf Python DataSource receive pushed filters (it prunes
        # whole blocks via BlobHeader.indexdata stats at planning time)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # events.parquet stores TIMESTAMP(NANOS), which Spark's parquet reader
        # rejects; read nanos as long session-wide (catalog.load rebuilds the
        # TimestampType column). Global config belongs here, not per-read.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    # Make `spark.read.format("osmpbf")` available on every session.
    from osmpbf_spark.sources.pbf import register

    register(spark)
    return spark
