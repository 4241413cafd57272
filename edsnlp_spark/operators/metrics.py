"""NER / span-attribute metrics as grouped aggregations.

Parity targets: edsnlp/metrics/ner.py:34-100 (exact span P/R/F1), :66
(token-level), :109 (overlap/dice); edsnlp/metrics/span_attribute.py:166
(attribute accuracy/F1); micro = rollup over labels.

All metrics take two entity DataFrames (pred, gold) on the entities
plane and return per-label + micro rows — pure joins and aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..core.caching import scoped, tracked_persist


def _prf(per: DataFrame) -> DataFrame:
    prec = F.try_divide(F.col("tp"), F.col("tp") + F.col("fp"))
    rec = F.try_divide(F.col("tp"), F.col("tp") + F.col("fn"))
    f1 = F.try_divide(2 * prec * rec, prec + rec)
    return per.select(
        "label", "tp", "fp", "fn",
        F.round(prec, 4).alias("precision"),
        F.round(rec, 4).alias("recall"),
        F.round(f1, 4).alias("f1"),
    )


def _with_micro(per: DataFrame) -> DataFrame:
    micro = per.groupBy().agg(
        F.lit("micro").alias("label"), F.sum("tp").alias("tp"),
        F.sum("fp").alias("fp"), F.sum("fn").alias("fn"))
    return per.unionByName(micro)


def ner_exact_metrics(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """Exact-boundary match: a TP requires identical
    (note_id, start_char, end_char, label)."""
    keys = ["note_id", "start_char", "end_char", "label"]
    p = pred.select(*keys).withColumn("p", F.lit(1))
    g = gold.select(*keys).withColumn("g", F.lit(1))
    j = p.join(g, keys, "full_outer")
    per = j.groupBy("label").agg(
        F.sum(F.when(F.col("p").isNotNull() & F.col("g").isNotNull(), 1)
              .otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("p").isNotNull() & F.col("g").isNull(), 1)
              .otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("p").isNull() & F.col("g").isNotNull(), 1)
              .otherwise(0)).alias("fn"),
    )
    return _prf(_with_micro(per))


def ner_overlap_metrics(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """Lenient match: pred counts as TP when it overlaps any gold span of
    the same label (metrics/ner.py:109 overlap semantics); symmetric for
    recall."""
    p = pred.select(
        "note_id", "label",
        F.col("start_char").alias("p_s"), F.col("end_char").alias("p_e"),
    ).withColumn("p_id", F.monotonically_increasing_id())
    g = gold.select(
        F.col("note_id").alias("g_note"), F.col("label").alias("g_label"),
        F.col("start_char").alias("g_s"), F.col("end_char").alias("g_e"),
    ).withColumn("g_id", F.monotonically_increasing_id())
    overlap = (
        (F.col("note_id") == F.col("g_note"))
        & (F.col("label") == F.col("g_label"))
        & (F.col("p_s") < F.col("g_e")) & (F.col("g_s") < F.col("p_e"))
    )
    matched_p = p.join(g, overlap, "left").groupBy(
        "p_id", "label").agg((F.count("g_id") > 0).alias("hit"))
    matched_g = g.join(
        p, overlap, "left"
    ).groupBy("g_id", F.col("g_label").alias("label")).agg(
        (F.count("p_id") > 0).alias("hit"))
    tp_fp = matched_p.groupBy("label").agg(
        F.sum(F.when(F.col("hit"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(~F.col("hit"), 1).otherwise(0)).alias("fp"))
    fn = matched_g.groupBy("label").agg(
        F.sum(F.when(~F.col("hit"), 1).otherwise(0)).alias("fn"))
    per = tp_fp.join(fn, "label", "full_outer").na.fill(
        {"tp": 0, "fp": 0, "fn": 0})
    return _prf(_with_micro(per))


def span_attribute_accuracy(pred: DataFrame, gold: DataFrame,
                            attrs: list[str]) -> DataFrame:
    """Per-attribute accuracy over aligned spans (span_attribute.py:166):
    spans aligned on exact boundaries, each attribute compared."""
    keys = ["note_id", "start_char", "end_char"]
    p = pred.select(*keys, *[F.col(a).alias(f"p_{a}") for a in attrs])
    g = gold.select(*keys, *[F.col(a).alias(f"g_{a}") for a in attrs])
    j = p.join(g, keys, "inner")
    rows = []
    for a in attrs:
        rows.append(j.groupBy().agg(
            F.lit(a).alias("attribute"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(
                F.col(f"p_{a}").eqNullSafe(F.col(f"g_{a}")), 1
            ).otherwise(0)).alias("correct"),
        ))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.withColumn(
        "accuracy", F.round(F.try_divide(F.col("correct"), F.col("n")), 4))


def dep_parsing_metrics(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """UAS / LAS for dependency parsing (metrics/dep_parsing.py:29-46):
    PRF over the sets of (doc, token, head) arcs — LAS additionally
    requires the dependency label to match.

    Inputs are dependency planes ``(note_id, token_i, head_i, label)``
    (the shape ``parse_dependencies`` emits). Distributed as two
    equi-joins on arc keys; no driver-side sets.
    """
    def one(name: str, keys: list[str]) -> DataFrame:
        p = pred.select(*keys).distinct()
        g = gold.select(*keys).distinct()
        tp = p.join(g, keys, "inner").count()
        np_, ng = p.count(), g.count()
        prec = tp / np_ if np_ else 0.0
        rec = tp / ng if ng else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        return (tp, np_, ng, prec, rec, f1, name)

    rows = [one("uas", ["note_id", "token_i", "head_i"]),
            one("las", ["note_id", "token_i", "head_i", "label"])]
    spark = pred.sparkSession
    return spark.createDataFrame(
        [(n, t, a, b, round(p, 4), round(r, 4), round(f, 4))
         for (t, a, b, p, r, f, n) in rows],
        "metric string, tp long, n_pred long, n_gold long, "
        "precision double, recall double, f1 double",
    )


def rouge_n(cands: DataFrame, refs: DataFrame, n: int = 1,
            id_col: str = "pair_id", text_col: str = "text") -> DataFrame:
    """ROUGE-N (Lin 2004): clipped n-gram overlap P/R/F1 per
    candidate/reference pair — the summarization/generation eval
    metric a training platform scores model outputs with.

    -> (id_col, n, overlap, n_cand, n_ref, precision, recall, f1):
    ``overlap`` = sum over shared n-grams of min(cand count, ref
    count); precision = overlap/n_cand, recall = overlap/n_ref,
    f1 = 2pr/(p+r), all rounded 4dp with explicit 0-guards — exact
    integer counts in, one double division out, so a SQL oracle
    writing the same arithmetic matches bit-for-bit.

    Scale shape: n-grams come from ONE lookahead-regexp pass per text
    (the token_shingles lesson — HOF slicing is interpreted per
    element), the per-pair gram counts partial-aggregate map-side, and
    the clipped overlap is an equi-join on (pair, gram) touching only
    SHARED grams.  Both sides use the corpus single-space tokenization
    model.
    """
    if n < 1:
        raise ValueError("rouge_n requires n >= 1")

    def grams(text):
        if n == 1:
            return F.split(text, " ", -1)
        # [^ ]* (not +): consecutive spaces yield EMPTY tokens under
        # the split() model, and the n=1 path (and list-slice oracles)
        # count them — the n-gram pass must too, or P/R/F1 diverge
        # between engines and between n=1/n>=2 on double-spaced text
        # (ADVICE r10 #3).  Each match still consumes at least the
        # separator space, so the scan advances.
        tok = r"[^ ]*"
        rx = "(?=(" + tok + (r" " + tok) * (n - 1) + r"))" + tok + " "
        return F.regexp_extract_all(text, F.lit(rx), F.lit(1))

    def counted(df, cnt_name, tot_name):
        g = df.select(F.col(id_col), grams(F.col(text_col)).alias("__g"))
        tot = g.select(F.col(id_col),
                       F.size("__g").cast("long").alias(tot_name))
        per = (g.select(F.col(id_col), F.explode("__g").alias("gram"))
               .groupBy(id_col, "gram")
               .agg(F.count(F.lit(1)).alias(cnt_name)))
        return per, tot

    cper, ctot = counted(cands, "cc", "n_cand")
    rper, rtot = counted(refs, "rc", "n_ref")
    ov = (cper.join(rper, [id_col, "gram"])
          .groupBy(id_col)
          .agg(F.sum(F.least("cc", "rc")).alias("overlap")))
    base = (ctot.join(rtot, id_col)
            .join(ov, id_col, "left")
            .select(F.col(id_col), F.lit(int(n)).alias("n"),
                    F.coalesce("overlap", F.lit(0)).cast("long")
                     .alias("overlap"),
                    "n_cand", "n_ref"))
    p = F.when(F.col("n_cand") > 0,
               F.col("overlap").cast("double") / F.col("n_cand")
               ).otherwise(F.lit(0.0))
    r = F.when(F.col("n_ref") > 0,
               F.col("overlap").cast("double") / F.col("n_ref")
               ).otherwise(F.lit(0.0))
    f = F.when(F.col("overlap") > 0,
               F.lit(2.0) * p * r / (p + r)).otherwise(F.lit(0.0))
    return base.select(
        id_col, "n", "overlap", "n_cand", "n_ref",
        F.round(p, 4).alias("precision"),
        F.round(r, 4).alias("recall"),
        F.round(f, 4).alias("f1"))


def _lcs_len(a: list, b: list) -> int:
    """Exact LCS length via the row-relaxation dp — the within-row
    dependency vectorizes as one prefix-max per row:
    cur = accumulate-max(max(prev[j], prev[j-1] + match_j))."""
    import numpy as np

    if not a or not b:
        return 0
    bn = np.array(b, dtype=object)
    prev = np.zeros(len(b) + 1, dtype=np.int64)
    for x in a:
        match = (bn == x).astype(np.int64)
        t = np.maximum(prev[1:], prev[:-1] + match)
        cur = np.empty_like(prev)
        cur[0] = 0
        np.maximum.accumulate(t, out=cur[1:])
        prev = cur
    return int(prev[-1])


def rouge_l(cands: DataFrame, refs: DataFrame,
            id_col: str = "pair_id", text_col: str = "text",
            max_tokens: int = 64) -> DataFrame:
    """ROUGE-L (Lin 2004 §3): LCS-based P/R/F1 per candidate/reference
    pair — order-sensitive where ROUGE-N is multiset overlap, so it
    rewards in-sequence agreement.

    -> (id_col, lcs, n_cand, n_ref, precision, recall, f1): all counts
    exact ints, P = lcs/n_cand, R = lcs/n_ref, F1 = 2PR/(P+R), rounded
    4dp with 0-guards — same arithmetic conventions as
    :func:`rouge_n`, so a SQL oracle matches bit-for-bit.

    Both sequences are TRUNCATED to ``max_tokens`` (never padded):
    the per-pair dp is O(max_tokens^2), keeping the work per pair
    config-bounded at any corpus scale — and letting the oracle replay
    the dp as a bounded recursive CTE (prefix-max by doubling passes).
    The dp itself runs as ONE Arrow pass (numpy row relaxation — the
    within-row dependency becomes a vector prefix-max, no per-cell
    Python loop)."""
    if max_tokens < 1:
        raise ValueError("rouge_l requires max_tokens >= 1")
    mt = int(max_tokens)

    def toks(df, name):
        return df.select(
            F.col(id_col),
            F.slice(F.split(F.col(text_col), " ", -1), 1, mt)
            .alias(name))

    joined = toks(cands, "__a").join(toks(refs, "__b"), id_col)
    ddl = f"{id_col} long, lcs long, n_cand long, n_ref long"

    def run(batches):
        import pandas as pd
        for pdf in batches:
            rows = []
            for pid, a, b in zip(pdf[id_col], pdf["__a"], pdf["__b"]):
                a, b = list(a), list(b)
                rows.append((pid, _lcs_len(a, b), len(a), len(b)))
            yield pd.DataFrame(rows, columns=[
                id_col, "lcs", "n_cand", "n_ref"])

    base = joined.mapInPandas(run, ddl)
    p = F.when(F.col("n_cand") > 0,
               F.col("lcs").cast("double") / F.col("n_cand")
               ).otherwise(F.lit(0.0))
    r = F.when(F.col("n_ref") > 0,
               F.col("lcs").cast("double") / F.col("n_ref")
               ).otherwise(F.lit(0.0))
    f = F.when(F.col("lcs") > 0,
               F.lit(2.0) * p * r / (p + r)).otherwise(F.lit(0.0))
    return base.select(
        id_col, "lcs", "n_cand", "n_ref",
        F.round(p, 4).alias("precision"),
        F.round(r, 4).alias("recall"),
        F.round(f, 4).alias("f1"))


@scoped("metrics")
def binary_auc_calibration(scored: DataFrame, score_col: str = "score",
                           label_col: str = "label",
                           n_buckets: int = 10) -> DataFrame:
    """Classifier-quality monitoring for model-based filtering (the
    FineWeb/CCNet quality-model loop): per-score-decile calibration
    (mean predicted score vs observed positive rate) plus the
    Mann-Whitney AUC -> one row per nonempty bucket
    ``(bucket, n_docs, avg_score, pos_rate, auc)`` (auc repeated on
    every row — it is a corpus-level scalar).

    Engine-exact arithmetic: scores are 1e6-integer-quantized, so the
    rank statistic uses MIDRANK DOUBLES kept as integers
    (2*midrank = 2*N_below + c + 1 per tie group) and every sum is an
    exact int64; the only float ops are the three final divisions,
    written identically in the SQL oracle.  Degenerate corpora (all
    positive / all negative) pin AUC at 0.5.

    Scale shape: ONE groupBy on the quantized score (<= 1e6 + 1
    distinct values — corpus-size-independent, the histogram-quantiles
    bound), a cumulative window over that bounded plane, and a 1-row
    totals broadcast; the corpus itself is touched by exactly one
    partial-aggregated shuffle."""
    from pyspark.sql import Window

    if n_buckets < 1:
        raise ValueError("binary_auc_calibration requires n_buckets >= 1")
    s6r = F.round(F.col(score_col) * 1e6, 0).cast("long")
    # in-data-path range guard (ADVICE r13 #2): a score outside [0, 1]
    # would silently produce a negative bucket id (trunc-division) and
    # an out-of-range quantized plane; raise instead.  The guard feeds
    # the groupBy key, so Catalyst cannot prune it.
    s6 = F.when((s6r >= 0) & (s6r <= 1_000_000), s6r).otherwise(
        F.raise_error(F.lit(
            "binary_auc_calibration: score outside [0, 1] — quantized "
            "rank statistics and decile buckets require bounded scores")))
    d = scored.select(s6.alias("s6"),
                      F.col(label_col).cast("long").alias("y"))
    # agg feeds the range-totals plane AND the cumulative plane, and
    # cum (below) feeds the AUC totals, the decile groupBy and the
    # final crossJoin — unpersisted, the corpus scan + partial-agg
    # shuffle re-executes once per reference (measured 0.52 -> 1.24s
    # at sf0.1 when the r14 two-pass prefix sum added the extra
    # reference).  The plane is bounded at <= 1e6 + 1 rows.
    agg = tracked_persist(
        d.groupBy("s6").agg(F.count(F.lit(1)).alias("c"),
                            F.sum("y").alias("p")),
        "metrics")
    # two-pass range-partitioned prefix sum (r14, VERDICT r13 #8): the
    # former global Window.orderBy("s6") funneled the whole (bounded,
    # but up to 1e6+1-row) plane through ONE task.  s6 DIV 16384 gives
    # <= 62 ordered ranges: per-range totals prefix-sum on a 62-row
    # plane, then a PARTITIONED window supplies the within-range
    # prefix — identical `below` values, no single-task ceiling.
    agg = agg.withColumn("__part", F.expr("s6 DIV 16384"))
    wpt = Window.orderBy("__part").rowsBetween(
        Window.unboundedPreceding, -1)
    parts = (agg.groupBy("__part").agg(F.sum("c").alias("__pc"))
             .withColumn("__pbelow",
                         F.coalesce(F.sum("__pc").over(wpt),
                                    F.lit(0).cast("long")))
             .drop("__pc"))
    w = Window.partitionBy("__part").orderBy("s6").rowsBetween(
        Window.unboundedPreceding, -1)
    cum = (agg.join(F.broadcast(parts), "__part")
           .withColumn(
               "below",
               F.col("__pbelow")
               + F.coalesce(F.sum("c").over(w), F.lit(0).cast("long")))
           .drop("__part", "__pbelow"))
    tot = cum.agg(
        F.sum(F.col("p") * (2 * F.col("below") + F.col("c") + 1))
        .alias("s2"),
        F.sum("c").alias("n"), F.sum("p").alias("np"))
    auc = tot.select(
        F.when((F.col("np") == 0) | (F.col("np") == F.col("n")),
               F.lit(0.5))
        .otherwise(F.round(
            (F.col("s2") - F.col("np") * (F.col("np") + 1))
            / (F.lit(2.0) * F.col("np") * (F.col("n") - F.col("np"))),
            6)).alias("auc"))
    step = 1000000 // n_buckets
    b = cum.groupBy(
        F.least(F.col("s6") / F.lit(step),
                F.lit(n_buckets - 1)).cast("long").alias("bucket")
    ).agg(
        F.sum("c").cast("bigint").alias("n_docs"),
        F.round(F.sum(F.col("s6") * F.col("c"))
                / (F.lit(1e6) * F.sum("c")), 6).alias("avg_score"),
        F.round(F.sum("p") / (F.lit(1.0) * F.sum("c")), 6)
        .alias("pos_rate"),
    )
    return b.crossJoin(F.broadcast(auc))
