"""Relational-core queries with DuckDB oracles.

Each entry exercises one operator class from SURVEY.md §2.2 (joins,
windows, sessionization, as-of, interval joins, set ops, aggregations,
rollups) on the driver's TPC-H-ish tables.  Spark impl and oracle SQL are
written independently (DataFrame API vs ANSI SQL) and must agree on
row count + schema + values at sf0.01.

Float policy: every float aggregate is explicitly rounded in BOTH
implementations (sums -> 2 decimals, ratios/avgs -> 4) so summation-order
differences between engines cannot flip the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _ntz_epoch() -> F.Column:
    # built lazily: F.lit needs an active session at call time
    return F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")


def _epoch_s(col) -> F.Column:
    """Epoch seconds of a TIMESTAMP_NTZ holding UTC wall-clock — pure
    NTZ arithmetic, independent of spark.sql.session.timeZone."""
    return F.timestamp_diff("SECOND", _ntz_epoch(), F.col(col) if
                            isinstance(col, str) else col)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a testdata table, normalizing events.ts across driver data
    generations: TIMESTAMP(NANOS) (Spark rejects without the
    nanosAsLong runtime conf -> read long, convert) or TIMESTAMP(MICROS)
    (read natively as TIMESTAMP_NTZ).  Either way ``ts`` is emitted as a
    TIMESTAMP_NTZ carrying the stored UTC wall-clock — matching DuckDB's
    naive reading of the same parquet — and every downstream consumer
    uses NTZ-pure arithmetic (``_epoch_s``, date_trunc on NTZ), so NO
    session conf is mutated and results don't depend on
    spark.sql.session.timeZone (round-3 ADVICE #1: the previous
    session.timeZone=UTC mutation made query results order-dependent).
    """
    if name == "events":
        # required to read TIMESTAMP(NANOS) parquet at all; affects only
        # how nanos columns parse, not the semantics of other queries
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        dt = dict(df.dtypes).get("ts")
        if dt == "bigint":
            df = df.withColumn(
                "ts",
                F.timestamp_add("MICROSECOND",
                                (F.col("ts") / 1000).cast("long"),
                                _ntz_epoch()),
            )
        elif dt == "timestamp":
            # instant-typed generation: epoch micros -> UTC NTZ, tz-free
            df = df.withColumn(
                "ts", F.timestamp_add("MICROSECOND", F.unix_micros("ts"),
                                      _ntz_epoch()))
    return df


# ---- aggregation: TPC-H Q1 shape --------------------------------------

def pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# ---- multi-way join with broadcast dims -------------------------------

def revenue_by_nation(spark, sf_dir):
    """customer ⋈ orders ⋈ lineitem ⋈ nation(broadcast) ⋈ region(broadcast).

    The two dim tables are explicitly broadcast — at 100 TB the fact-side
    join keys shuffle once and the dims ride along to every executor.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


REVENUE_BY_NATION_SQL = """
SELECT r_name, n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# ---- window top-k per group (the filter_spans/top-k pattern) ----------

def top_orders_per_customer(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey",
                F.round("o_totalprice", 2).alias("total"),
                F.col("rn").cast("bigint").alias("rn"))
    )


TOP_ORDERS_PER_CUSTOMER_SQL = """
SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS total, rn
FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY o_custkey
      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 3
"""


# ---- set ops: anti / semi joins ---------------------------------------

def customers_without_orders(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select(
        "c_custkey", "c_name"
    )


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def suppliers_with_recent_shipments(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    recent = li.filter(F.col("l_shipdate") >= F.lit("1997-01-01"))
    return s.join(
        recent, s["s_suppkey"] == recent["l_suppkey"], "left_semi"
    ).select("s_suppkey", "s_name")


SUPPLIERS_WITH_RECENT_SHIPMENTS_SQL = """
SELECT s_suppkey, s_name FROM supplier
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_suppkey = s_suppkey
                AND l_shipdate >= TIMESTAMP '1997-01-01')
"""


# ---- grouping sets / rollup (micro+macro metric keys) -----------------

def sales_rollup(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
             F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_price", "n",
        )
    )


SALES_ROLLUP_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       ROUND(SUM(l_extendedprice), 2) AS sum_price,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# ---- sessionization (the qualifier-boundary pattern on events) --------

def event_sessions(spark, sf_dir):
    """Gap>30min sessionization per user — same window-sum-over-flags
    pattern the qualifier engine uses for boundary ids (SURVEY §2.7)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.withColumn(
        "new_session",
        F.when(
            _epoch_s("ts") - F.lag(_epoch_s("ts")).over(w) > 1800, 1
        ).otherwise(F.lit(0)),
    ).withColumn("session_id", F.sum("new_session").over(w))
    return flagged.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )


EVENT_SESSIONS_SQL = """
WITH flagged AS (
  SELECT *,
    CASE WHEN epoch(ts) - LAG(epoch(ts)) OVER w > 1800 THEN 1 ELSE 0 END
      AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT *, SUM(new_session) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events,
       MIN(event_id) AS first_event, MAX(event_id) AS last_event,
       ROUND(SUM(value), 2) AS session_value
FROM sess GROUP BY user_id, session_id
"""


# ---- as-of join (span↔nearest-date pattern, SURVEY §2.2 join #2) ------

def purchase_asof_signup(spark, sf_dir):
    """For each purchase, the most recent preceding signup/login of the
    same user — as-of join via IGNORE NULLS last() window, no self-join."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ref = F.when(
        F.col("event_type").isin("signup", "login"), F.col("event_id")
    )
    out = e.withColumn("prev_auth_event", F.last(ref, ignorenulls=True).over(w))
    return out.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "prev_auth_event"
    )


PURCHASE_ASOF_SIGNUP_SQL = """
SELECT event_id, user_id, prev_auth_event
FROM (
  SELECT *,
    LAST_VALUE(CASE WHEN event_type IN ('signup','login') THEN event_id END
               IGNORE NULLS) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_auth_event
  FROM events
)
WHERE event_type = 'purchase'
"""


# ---- interval join (span-overlap pattern, SURVEY §2.2 join #3) --------

def close_event_pairs(spark, sf_dir):
    """Pairs of events by the same user within 5 minutes — the span
    overlap/proximity self-join, time-bucketed for scale.

    A user-only equi-join makes one hot user a single quadratic task.
    Instead each event gets a 5-min bucket (floor(epoch/300)); side A is
    replicated to buckets {b-1, b, b+1} and the join key is
    (user_id, bucket), so a qualifying pair (|Δt| <= 300) meets in
    exactly one bucket — B's own — and a hot user's pair work spreads
    over all their active buckets instead of one shuffle key."""
    e = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts",
        F.floor(_epoch_s("ts") / 300).alias("bucket"),
    )
    a = e.select(
        F.col("user_id").alias("a_user_id"),
        F.col("event_id").alias("a_event_id"),
        F.col("ts").alias("a_ts"),
        F.explode(F.array(F.col("bucket") - 1, F.col("bucket"),
                          F.col("bucket") + 1)).alias("a_jbucket"),
    )
    pairs = a.join(
        e,
        (F.col("a_user_id") == F.col("user_id"))
        & (F.col("a_jbucket") == F.col("bucket"))
        & (F.col("a_event_id") < F.col("event_id"))
        & (F.abs(_epoch_s("a_ts") - _epoch_s("ts")) <= 300),
    )
    return pairs.groupBy(F.col("a_user_id").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


CLOSE_EVENT_PAIRS_SQL = """
SELECT a.user_id AS user_id, COUNT(*) AS n_pairs
FROM events a JOIN events b
  ON a.user_id = b.user_id AND a.event_id < b.event_id
 AND ABS(epoch(a.ts) - epoch(b.ts)) <= 300
GROUP BY a.user_id
"""


# ---- time-bucket rollup (hypertable/tumbling-window analog) -----------

def hourly_event_rollup(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss")
            .alias("hour"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.avg("value"), 4).alias("avg_value"))
    )


HOURLY_EVENT_ROLLUP_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type,
       COUNT(*) AS n, ROUND(AVG(value), 4) AS avg_value
FROM events GROUP BY 1, 2
"""


# ---- semi-structured extraction (props JSON) --------------------------

def props_k_stats(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.avg("k"), 4).alias("avg_k"),
             F.max("k").alias("max_k"))
    )


PROPS_K_STATS_SQL = """
SELECT event_type, COUNT(*) AS n,
       ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
FROM events GROUP BY event_type
"""


QUERIES = {
    "pricing_summary": (pricing_summary, PRICING_SUMMARY_SQL),
    "revenue_by_nation": (revenue_by_nation, REVENUE_BY_NATION_SQL),
    "top_orders_per_customer": (
        top_orders_per_customer, TOP_ORDERS_PER_CUSTOMER_SQL),
    "customers_without_orders": (
        customers_without_orders, CUSTOMERS_WITHOUT_ORDERS_SQL),
    "suppliers_with_recent_shipments": (
        suppliers_with_recent_shipments, SUPPLIERS_WITH_RECENT_SHIPMENTS_SQL),
    "sales_rollup": (sales_rollup, SALES_ROLLUP_SQL),
    "event_sessions": (event_sessions, EVENT_SESSIONS_SQL),
    "purchase_asof_signup": (purchase_asof_signup, PURCHASE_ASOF_SIGNUP_SQL),
    "close_event_pairs": (close_event_pairs, CLOSE_EVENT_PAIRS_SQL),
    "hourly_event_rollup": (hourly_event_rollup, HOURLY_EVENT_ROLLUP_SQL),
    "props_k_stats": (props_k_stats, PROPS_K_STATS_SQL),
}
