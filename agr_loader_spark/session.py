"""SparkSession factory used by tests, bench, and the driver contract.

The reference runs 8 sink worker processes + 10 download processes
(src/default_env_vars.yml:12-13); here parallelism is a core count on a
single local JVM (the sandbox stand-in for executor count — see
BENCH/BASELINE.md for the N vs 4N scaling protocol).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "agr_loader_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build a local SparkSession tuned for the engine.

    AQE is on (runtime partition coalescing + skew-join splitting);
    shuffle partitions default to the core count — at cluster scale this
    is replaced by AQE's initialPartitionNum sizing against
    spark.sql.files.maxPartitionBytes.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    return builder.getOrCreate()
