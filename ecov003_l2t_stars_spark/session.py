"""SparkSession factory.

Centralizes the configuration the engine depends on:

- Arrow execution for pandas-UDF exchange (the engine's only Python hot
  path — everything else stays JVM-side in whole-stage codegen).
- AQE with skew-join handling: the transcript workload is key-skewed by
  design (hot conversations, FIXTURES.md), the analog of the reference
  pinning one BLAS thread per worker and hand-sizing its ``pmap`` fan-out
  (``process_ECOSTRESS_data_fusion_distributed_bias.jl:32-40``).
- Shuffle partitions sized for the local[] harness; on a real cluster this
  is overridden by spark-submit conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ecov003-l2t-stars-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(int(cpus), 8)
        except ValueError:
            shuffle_partitions = 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        # allow joins to reuse an existing hash(conv_id) partitioning when
        # join keys are (conv_id, bucket): subset co-partitioning avoids
        # re-shuffling both sides of every grid/obs join
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
