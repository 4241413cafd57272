"""SparkSession factory with scale-oriented defaults.

The reference (aphp/edsnlp) configures execution via
``Stream.set_processing`` (edsnlp/core/stream.py:361-476); here execution
policy is Spark conf.  Defaults are tuned for the local[32] test harness but
chosen to be the *same* knobs one would set on a 1000-executor cluster:
AQE on (runtime re-planning, skew-join splitting), modest shuffle
partitions locally (cluster: ~2-3x total cores), Arrow enabled for every
pandas-UDF hop.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # Let Catalyst re-plan at runtime: coalesce tiny shuffle partitions,
    # split skewed ones, demote/promote join strategies on real stats.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any toPandas / pandas-UDF boundary.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Shuffle sizing: env-parameterised so a cluster deployment sets it
    # to ~2-3x total executor cores (and lets AQE coalesce down); the
    # local default matches local[32].  AQE's coalescePartitions makes
    # the exact value non-critical — it is a ceiling, not a target.
    "spark.sql.shuffle.partitions":
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"),
    # Broadcast small dims aggressively (nation/region/terms tables).
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
}


def get_spark(app_name: str = "edsnlp-spark", master: str | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    for k, v in {**_DEFAULTS, **(extra_conf or {})}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
