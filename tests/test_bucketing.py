"""Bucketed co-located join: the join itself must be shuffle-free."""

from __future__ import annotations

from pyspark.sql import functions as F

from edsnlp_spark.plans.bucketing import (
    bucketed_join, exchange_count, write_bucketed,
)


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .withColumnRenamed("l_orderkey", "o_orderkey")
    write_bucketed(orders, "orders_b", "o_orderkey", buckets=8)
    write_bucketed(lineitem, "lineitem_b", "o_orderkey", buckets=8)

    # Force the big-table path: at 100 TB neither side broadcasts, which
    # is exactly when bucketing pays; locally the tables are tiny and the
    # planner would broadcast (bypassing buckets entirely).
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "orders_b", "lineitem_b", "o_orderkey")
        n = j.count()
        assert n == lineitem.count()  # every lineitem has its order
        assert exchange_count(j) == 0, "bucketed join must be co-located"

        # sanity: same join on raw (unbucketed) parquet shuffles
        raw = orders.join(lineitem, "o_orderkey")
        raw.count()
        assert exchange_count(raw) >= 1, "raw join should shuffle"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
