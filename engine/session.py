"""SparkSession factory with scale-oriented defaults.

Single place where shuffle partitioning / AQE / Arrow flags are set so that
tests, jobs, and benches all run with the same execution profile. Designed for
multi-executor clusters (the 100 TB target); validated on local[N].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "linkgraph-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession.

    Defaults:
    - AQE on (runtime partition coalescing + skew-join splitting), which at
      cluster scale re-plans per-stage from observed shuffle statistics.
    - Arrow enabled for the pandas-UDF extraction path (batched, no
      per-row Python).
    - shuffle partitions sized from parallelism (override per-workload; at
      100 TB this would be ~2-3x total executor cores).
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[%s]" % (
        os.environ.get("SPARK_GRAFT_CPUS", "*")
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # iterative jobs leak shuffle files + checkpoint blocks until the
        # ContextCleaner runs, and the cleaner only fires on driver GC — with
        # a large heap that can be never. Periodic GC keeps per-iteration
        # times flat instead of degrading as temp state accumulates.
        .config("spark.cleaner.periodicGC.interval", "30s")
        .config("spark.ui.showConsoleProgress", "false")
    )
    if shuffle_partitions is not None:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
