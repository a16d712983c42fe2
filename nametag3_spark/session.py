"""SparkSession factory tuned for this engine.

Local mode here, but every config is chosen to also be correct on a
multi-executor cluster at 100 TB: AQE (runtime coalesce + skew-join
splitting), Arrow for pandas UDFs, UTC session timezone (so parquet
timestamps compare bit-identically against the DuckDB oracle), and
shuffle partitions sized to cores rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "nametag3_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cores}]"
    shuffle_partitions = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Scan split size, parameterised (guide §6.1): the bench inputs
        # are a handful of single-file tables far below the 128m default,
        # so default splits collapse every scan to one task; 16m lets a
        # multi-row-group file (e.g. a larger driver-generated SF) scan
        # in parallel, and a single-row-group file still costs one task
        # either way (empty splits are free). At warehouse scale set
        # SPARK_GRAFT_MAX_PARTITION_BYTES to 256m-1g: there the input is
        # thousands of files and LARGER splits cut task-scheduling
        # overhead and the map-side shuffle block count (§2.2).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "16m"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # one model / tokenizer instance per reused Python worker
        # (reference shares model instances per checkpoint path,
        #  nametag3_server.py:437-444 — here: worker reuse + module cache)
        .config("spark.python.worker.reuse", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
