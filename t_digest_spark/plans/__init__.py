"""SparkSession builders tuned for the sketch workload.

Scale posture (SURVEY.md §4): AQE on (runtime shuffle coalescing + skew-join
splitting), Arrow enabled for every pandas-UDF boundary, shuffle partitions
sized to the core count (digest rows are tiny — a handful of KB per group —
so the default 200 would produce mostly-empty reducers at test scale, while a
real 1000-executor run should raise it to ~2-4x total cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "t-digest-spark", master: str | None = None,
              shuffle_partitions: int | None = None,
              arrow_batch_size: int = 65536,
              extra_conf: dict | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus if str(cpus).isdigit() else 32)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_size))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Pin event-time semantics to UTC: Spark timestamps are instants
        # truncated/formatted in the SESSION timezone (default: JVM system
        # TZ), so date_trunc/window/CAST-to-date results silently shift on
        # a cluster whose nodes run non-UTC — and diverge from the naive-
        # timestamp oracles. This sandbox happens to be UTC; production
        # clusters are not guaranteed to be.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # extra_conf applies LAST so caller overrides of the baked-in keys win
    for key, val in (extra_conf or {}).items():
        builder = builder.config(key, val)
    return builder.getOrCreate()
