"""CoNLL-U reader: token tables from .conllu files.

Parity target: edsnlp/data/conll.py — sentences separated by blank
lines; token lines are 10 tab-separated columns (ID FORM LEMMA UPOS XPOS
FEATS HEAD DEPREL DEPS MISC); comment lines start with '#'.

Spark design: per-line read + window-based sentence grouping — the blank
line is a boundary flag, sentence id is its running sum per file: the
same sessionization pattern as qualifier boundaries (no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

CONLL_COLS = [
    "id", "form", "lemma", "upos", "xpos", "feats", "head", "deprel",
    "deps", "misc",
]


def read_conll(spark: SparkSession, path: str) -> DataFrame:
    """-> (doc_path, sent_id, token columns...) one row per token."""
    lines = spark.read.text(path).select(
        F.input_file_name().alias("doc_path"),
        F.monotonically_increasing_id().alias("line_no"),
        F.col("value").alias("line"),
    )
    w = Window.partitionBy("doc_path").orderBy("line_no")
    with_sent = lines.withColumn(
        "sent_id",
        F.sum(F.when(F.trim("line") == "", 1).otherwise(0)).over(w),
    )
    toks = with_sent.filter(
        (F.trim("line") != "") & ~F.col("line").startswith("#")
    )
    parts = F.split("line", "\t")
    return toks.select(
        "doc_path", "sent_id",
        *[parts.getItem(i).alias(c) for i, c in enumerate(CONLL_COLS)],
    )
