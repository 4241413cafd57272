"""Mergeable sketches: deterministic HyperLogLog + count-min.

Counting distinct elements (vocabulary size, distinct n-gram windows,
distinct URLs) with an exact ``groupBy().distinct().count()`` shuffles
the full key set; a HyperLogLog sketch (Flajolet et al. 2007) gets the
same answer to ~1.04/sqrt(m) relative error with m registers — a
fixed-size, MERGEABLE state (per-partition partial aggregation; at
1000 executors every task contributes at most m rows to one tiny
shuffle).

Spark ships ``approx_count_distinct`` (its own HLL++); this
implementation exists because the sketch must be DETERMINISTIC AND
ENGINE-PORTABLE: hashing is the repo-standard md5 60-bit prefix and
every floating step is either exact integer math or an identical
IEEE expression, so a DuckDB oracle running the same algorithm
reproduces the estimate bit-for-bit — the property the driver's
value-hash gate needs and no builtin sketch provides.

Parity design notes:
- register index = top ``p`` bits, suffix = low ``60 - p`` bits (pure
  integer ops);
- rho (first-1-bit position) uses floor(log2(suffix)) CORRECTED by an
  exact power-of-two comparison, so a 1-ulp libm difference between
  engines cannot change it;
- the harmonic sum Z = sum(2^-rho) is accumulated as the INTEGER
  sum(2^(R - rho)) with R = 60 - p + 1 (fits a long: m * 2^R < 2^63
  for p >= 7) — no float summation-order sensitivity;
- the final estimate is one identical float expression over those
  exact integers (plus the standard linear-counting small-range
  correction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def hll_register_rows(col: Column, p: int = 9) -> tuple[Column, Column]:
    """(idx, rho) register coordinates for one value: idx = top p bits
    of the md5 60-bit prefix, rho = first-1-bit position in the
    remaining w = 60 - p bits (w + 1 if the suffix is all zeros)."""
    w = 60 - p
    h = F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    # pure integer ops: a float division would round h above 2^53
    idx = F.shiftright(h, w)
    suffix = h % F.lit(1 << w)                      # h & (2^w - 1)
    # greatest(.,1) guards log2(0) = -Inf (the suffix=0 branch below
    # never reads l, but ANSI mode would fail the cast regardless)
    l0 = F.floor(F.log2(F.greatest(suffix, F.lit(1)))).cast("long")
    p2 = F.pow(F.lit(2.0), l0.cast("double"))       # exact for l0 <= 51
    l = (F.when(p2 > suffix, l0 - 1)
         .when(p2 * 2 <= suffix, l0 + 1)
         .otherwise(l0))                            # exact floor(log2)
    rho = F.when(suffix == 0, F.lit(w + 1)).otherwise(F.lit(w) - l)
    return idx, rho.cast("long")


def hll_distinct_by(df: DataFrame, group_cols: list[str], col: str,
                    p: int = 9) -> DataFrame:
    """Per-group HLL cardinality estimates: one row per distinct
    ``group_cols`` value (one row total when empty) with (m, v_empty,
    approx_distinct), m = 2^p registers, standard error ~1.04/sqrt(m)
    (~4.6% at p=9), linear-counting correction below 2.5m;
    ``approx_distinct`` rounded to 4dp.

    Scale shape: register state is groups x m rows MAX after the first
    groupBy (partial map-side max per register — every task contributes
    at most groups x m rows to the exchange), then one groups-sized
    rollup.  This is how a sketch composes INTO an analysis pipeline
    (VERDICT r7 #8): the per-source vocabulary-saturation monitor uses
    it where an exact per-source distinct would shuffle the full token
    set."""
    if not 7 <= p <= 14:
        raise ValueError(f"hll_distinct requires 7 <= p <= 14 (got {p})")
    m = 1 << p
    w = 60 - p
    r_scale = w + 1                                  # max rho
    idx, rho = hll_register_rows(F.col(col), p)
    regs = (
        df.select(*group_cols, idx.alias("idx"), rho.alias("rho"))
        .groupBy(*group_cols, "idx").agg(F.max("rho").alias("mr"))
    )
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("npresent"),
        F.sum(F.pow(F.lit(2.0), (F.lit(r_scale) - F.col("mr"))
                    .cast("double")).cast("long")).alias("s"),
    )
    v = F.lit(m) - F.col("npresent")
    # coalesce: SUM over zero rows is NULL (empty input -> all registers
    # empty -> pure linear counting, estimate 0, not NULL)
    z_scaled = v * F.lit(1 << r_scale) + F.coalesce(F.col("s"), F.lit(0))
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    e = (alpha * F.lit(float(m)) * F.lit(float(m))
         * F.lit(float(1 << r_scale)) / z_scaled)
    est = F.when((e <= F.lit(2.5 * m)) & (v > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / v)) \
        .otherwise(e)
    return agg.select(
        *group_cols,
        F.lit(m).cast("bigint").alias("m"),
        v.cast("bigint").alias("v_empty"),
        F.round(est, 4).alias("approx_distinct"),
    )


def hll_distinct(df: DataFrame, col: str, p: int = 9) -> DataFrame:
    """One-row DataFrame (m, v_empty, approx_distinct): the global HLL
    cardinality estimate — :func:`hll_distinct_by` with no groups."""
    return hll_distinct_by(df, [], col, p)


def cms_cells(col: Column, d: int, w: int) -> Column:
    """array<struct<r,cell>>: the d salted-md5 cell coordinates of one
    value in a d x w count-min sketch (Cormode & Muthukrishnan 2005).
    Salting by row index keeps the d hash functions independent while
    staying engine-portable (the oracle rebuilds md5(i || ':' || x))."""
    return F.array(*[
        F.struct(
            F.lit(i).alias("r"),
            (F.conv(F.substring(
                F.md5(F.concat(F.lit(f"{i}:"), col)), 1, 8), 16, 10)
             .cast("long") % F.lit(w)).alias("cell"),
        )
        for i in range(d)
    ])


def cms_point_estimates(df: DataFrame, col: str, probes: list[str],
                        d: int = 4, w: int = 1024) -> DataFrame:
    """Count-min point estimates for ``probes`` over ``df[col]``:
    (key, est) with est = min over the d rows of the sketch cell the
    key hashes to — an OVERestimate within eps*N (eps ~ e/w) with
    probability 1 - (1/2)^d, never an underestimate.

    Scale shape: the sketch is ONE groupBy over (row, cell) — at most
    d*w cells survive (config-bounded, partial map-side aggregation at
    1000 executors), the classic bounded-memory answer to "how hot are
    these keys" that an exact per-key groupBy of a 100 TB corpus
    would pay a full vocabulary shuffle for.  Probes join the tiny
    cell table and take a min — no second corpus pass.
    """
    if not probes:
        raise ValueError("cms_point_estimates requires at least one probe")
    if d < 1 or w < 2:
        raise ValueError(f"cms_point_estimates needs d >= 1, w >= 2 "
                         f"(got d={d}, w={w})")
    sketch = (
        df.select(F.explode(cms_cells(F.col(col), d, w)).alias("rc"))
        .groupBy(F.col("rc.r").alias("r"), F.col("rc.cell").alias("cell"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    probe_df = df.sparkSession.createDataFrame(
        [(p,) for p in probes], "key string")
    probe_cells = probe_df.select(
        "key", F.explode(cms_cells(F.col("key"), d, w)).alias("rc")
    ).select("key", F.col("rc.r").alias("r"), F.col("rc.cell").alias("cell"))
    return (
        probe_cells.join(sketch, ["r", "cell"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce("c", F.lit(0))).cast("bigint").alias("est"))
    )


# ---- Bloom filter: mergeable set-membership (r9) ------------------------
#
# The third classic sketch next to HLL (distinct counts) and CMS (heavy
# hitters): APPROXIMATE SET MEMBERSHIP with zero false negatives and a
# tunable false-positive rate (Bloom 1970) — the production shape for
# decontamination and cross-corpus "seen before?" probes where the
# reference set is huge but the QUESTION is boolean.  The filter is a
# set of bit positions: config-bounded (<= m rows), MERGEABLE by plain
# union-distinct, persistable between ingest batches, and — unlike the
# exact hash index — its size is capped by m regardless of corpus
# growth (the FP rate, (1 - e^(-kn/m))^k, is what degrades instead).
#
# Engine-portable determinism: position_j(v) = md5(j ":" v) 60-bit
# prefix mod m — the repo-standard salted-md5 recipe (same as CMS
# rows), so a DuckDB oracle reproduces every bit.


def bloom_positions(col: Column, k: int = 4, m: int = 1 << 18) -> Column:
    """The k bit positions of value ``col`` (array<long>, DISTINCT —
    two hash functions may collide on one bit, and membership must
    then require only the distinct set)."""
    if k < 1 or m < 2:
        raise ValueError("bloom requires k >= 1 and m >= 2")
    return F.array_distinct(F.array(*[
        F.conv(F.substring(
            F.md5(F.concat(F.lit(f"{j}:"), col)), 1, 15), 16, 10)
        .cast("long") % F.lit(m)
        for j in range(k)
    ]))


def bloom_build(df: DataFrame, col: str, k: int = 4,
                m: int = 1 << 18) -> DataFrame:
    """Build the filter over ``df[col]`` -> (bit) distinct positions.

    Scale shape: one explode + one distinct bounded by m rows TOTAL
    (partial map-side dedup); the result is the artifact you persist /
    broadcast / union with the next batch's filter."""
    return df.select(F.explode(
        bloom_positions(F.col(col), k, m)).alias("bit")).distinct()


def bloom_probe(values: DataFrame, col: str, bits: DataFrame,
                k: int = 4, m: int = 1 << 18) -> DataFrame:
    """Membership probe -> (col, maybe_member): true iff EVERY distinct
    bit position of the value is set in the filter (no false negatives;
    false positives at the standard Bloom rate).

    Scale shape: probe DISTINCT values only (Zipf: occurrences >>
    types), explode their positions, ONE equi-join against the bit set
    (deliberately un-hinted — AQE broadcasts the filter when m is
    small), and a per-value count compared to its own distinct-position
    count.  Join volume is k x distinct probes, never corpus
    occurrences."""
    vals = values.select(F.col(col).alias("__v")).distinct().select(
        "__v", bloom_positions(F.col("__v"), k, m).alias("__ps"))
    exploded = vals.select("__v", F.size("__ps").alias("__np"),
                           F.explode("__ps").alias("bit"))
    hits = (
        exploded.join(bits, "bit")
        .groupBy("__v", "__np")
        .agg(F.count(F.lit(1)).alias("__nhit"))
        .select("__v", (F.col("__nhit") == F.col("__np")).alias("__mm"))
    )
    return (
        values.join(hits, values[col] == hits["__v"], "left")
        .select(*[values[c] for c in values.columns],
                F.coalesce("__mm", F.lit(False)).alias("maybe_member"))
    )


def histogram_quantiles(hist: DataFrame,
                        quantiles: list[tuple[int, int, str]] = (
                            (1, 2, "p50"), (9, 10, "p90"),
                            (99, 100, "p99")),
                        group_col: str = "source",
                        bucket_col: str = "len_bucket",
                        count_col: str = "n_docs") -> DataFrame:
    """Rank-based quantile ESTIMATES from a log2-bucket histogram
    sketch (the quantile member of the sketch family next to
    HLL/CMS/Bloom): for quantile num/den over n items, the estimate is
    the lower bound 2^b of the first bucket whose cumulative count
    reaches the target rank ceil(q*n) — so ``est <= exact < 2*est`` by
    construction (the 2x band is the sketch's resolution; pinned in
    test_histogram_quantiles_error_bound).

    All arithmetic is integer (target rank = (num*n + den-1) DIV den;
    estimate = 2^b exact in int64 for b < 53), so the estimates are
    engine-exact.  The histogram plane is mergeable (counts add) and
    config-bounded (groups x ~40 buckets) — windows over it are free,
    and the sketch composes with streaming ingest the same way the
    HLL register plane does.

    -> (group_col, q_label, n, est) one row per group x quantile.
    """
    from pyspark.sql import Window

    spark = hist.sparkSession
    qdf = spark.createDataFrame(
        [(int(a), int(b), str(lbl)) for a, b, lbl in quantiles],
        "q_num long, q_den long, q_label string")
    w = (Window.partitionBy(group_col).orderBy(bucket_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = hist.select(
        F.col(group_col), F.col(bucket_col).alias("__b"),
        F.sum(count_col).over(w).alias("__cum"),
        F.sum(F.col(count_col)).over(
            Window.partitionBy(group_col)).alias("__n"))
    hit = (
        cum.crossJoin(F.broadcast(qdf))
        .filter(F.col("__cum")
                >= F.expr("(q_num * __n + q_den - 1) DIV q_den"))
        .groupBy(group_col, "q_label")
        .agg(F.min("__b").alias("__eb"), F.first("__n").alias("n"))
    )
    return hit.select(
        F.col(group_col), F.col("q_label"),
        F.col("n").cast("long").alias("n"),
        F.pow(F.lit(2.0), F.col("__eb").cast("double"))
         .cast("long").alias("est"))
