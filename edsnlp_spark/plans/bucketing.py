"""Bucketed (co-located) joins: pre-shuffle once, join shuffle-free.

At 100 TB, the dominant cost of the notes ⋈ entities / orders ⋈ lineitem
joins is the shuffle.  Bucketing both sides by the join key at WRITE time
means every subsequent join on that key is a local zip of co-located
buckets — no Exchange in the plan.  This is the storage-layout half of
the engine's scale posture (the runtime half is AQE + broadcast dims).

``write_bucketed`` persists a DataFrame as a bucketed table;
``bucketed_join`` joins two bucketed tables and (in tests) the plan is
asserted Exchange-free on the join key.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int = 8,
                   sort_by: str | None = None) -> None:
    spark = df.sparkSession
    # A table dir can survive from a previous session whose catalog is
    # gone; overwrite then fails with LOCATION_ALREADY_EXISTS. Drop both.
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table)
    if os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str) -> DataFrame:
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the executed plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")
