"""Skew-handling utilities: salting for hot keys (SURVEY.md §4 posture).

AQE's skew-join splitting covers most cases at runtime; explicit salting
remains the tool when a single group key dominates an AGGREGATION (AQE
does not split skewed aggregation groups) or when a broadcast is
impossible and one join key holds a large share of rows.

``salted_agg`` implements the classic two-phase aggregate: spray each
key across ``salt`` sub-groups (map-side partial aggregation still
applies within each), then combine the partials.  Works for any
algebraic aggregate expressed as (partial_fn, merge_fn) pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def with_salt(df: DataFrame, salt: int, col_name: str = "__salt") -> DataFrame:
    """Deterministic spread column (hash of all columns mod salt) — keeps
    results reproducible, unlike rand()-based salting."""
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                         F.lit(salt)).cast("int")
    )


def salted_count_sum(df: DataFrame, key_cols: list[str], value_col: str,
                     salt: int = 16) -> DataFrame:
    """Two-phase count+sum per key, robust to a dominant hot key.

    Phase 1 groups on (key, salt) — the hot key's rows split into
    ``salt`` parallel partials; phase 2 merges the partials per key.
    """
    salted = with_salt(df, salt)
    partial = salted.groupBy(*key_cols, "__salt").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum(value_col).alias("__sum"),
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("__cnt").alias("count"),
        F.sum("__sum").alias("sum"),
    )


def replicate_broadcast_join(big: DataFrame, small: DataFrame,
                             key: str, salt: int = 8) -> DataFrame:
    """Skewed equi-join without broadcast support: salt the big side,
    replicate the small side across all salt values, join on
    (key, salt).  Use when the small side is too large to broadcast but
    the big side's key distribution is heavily skewed."""
    big_s = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                         F.lit(salt)).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    small_r = small.withColumn("__salt", salts)
    return big_s.join(small_r, [key, "__salt"]).drop("__salt")
