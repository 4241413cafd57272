"""NER / span-attribute metrics as grouped aggregations.

Parity targets: edsnlp/metrics/ner.py:34-100 (exact span P/R/F1), :66
(token-level), :109 (overlap/dice); edsnlp/metrics/span_attribute.py:166
(attribute accuracy/F1); micro = rollup over labels.

All metrics take two entity DataFrames (pred, gold) on the entities
plane and return per-label + micro rows — pure joins and aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


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
