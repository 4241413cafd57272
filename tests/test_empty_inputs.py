"""Empty-input robustness: every core operator must return an EMPTY,
correctly-typed frame on empty input — not throw.  Production pipelines
hit empty partitions/splits constantly (a filter that matches nothing,
a date-gated subset with no dates)."""

from pyspark.sql import functions as F


def _empty_notes(spark):
    return spark.createDataFrame([], "note_id long, note_text string")


def test_pipeline_on_empty_notes(spark):
    from edsnlp_spark.core.base import Pipeline
    from edsnlp_spark.operators.tokenizer import Tokenizer
    from edsnlp_spark.operators.sentences import SentenceSegmenter
    out = Pipeline([Tokenizer(mode="pretokenized"), SentenceSegmenter()])(
        _empty_notes(spark))
    assert out.count() == 0
    assert "tokens" in out.columns and "sentences" in out.columns


def test_matchers_on_empty_notes(spark):
    from edsnlp_spark.core.base import Pipeline
    from edsnlp_spark.operators.tokenizer import Tokenizer
    from edsnlp_spark.operators.matcher import PhraseMatcher, RegexMatcher
    notes = Pipeline([Tokenizer(mode="pretokenized")])(_empty_notes(spark))
    assert PhraseMatcher({"x": ["a"]}).entities(notes).count() == 0
    assert RegexMatcher({"x": [r"\d+"]}).entities(notes).count() == 0
    assert RegexMatcher({"x": ["a+"]}, native="unchecked") \
        .entities(notes).count() == 0


def test_qualifier_on_empty_entities(spark):
    from edsnlp_spark.core.base import Pipeline
    from edsnlp_spark.operators.tokenizer import Tokenizer
    from edsnlp_spark.operators.sentences import SentenceSegmenter
    from edsnlp_spark.operators.matcher import PhraseMatcher
    from edsnlp_spark.operators.qualifiers import QualifierEngine
    notes = Pipeline([Tokenizer(mode="pretokenized"), SentenceSegmenter()])(
        spark.createDataFrame([(1, "rien a signaler")],
                              "note_id long, note_text string"))
    ents = PhraseMatcher({"sym": ["absent_term"]}).entities(notes)
    out = QualifierEngine("negated", {"preceding": ["sans"]}) \
        .qualify(notes, ents)
    assert out.count() == 0
    assert "negated" in out.columns


def test_filter_spans_and_packing_empty(spark):
    from edsnlp_spark.operators.filter_spans import filter_spans
    from edsnlp_spark.operators.packing import pack_documents
    ents = spark.createDataFrame(
        [], "note_id long, start_char int, end_char int, label string, "
            "lexical_variant string, span_type string")
    assert filter_spans(ents).count() == 0
    assert pack_documents(_empty_notes(spark), budget=100).count() == 0


def test_pii_and_dedup_empty(spark):
    from edsnlp_spark.operators.pii import PIIScrubber
    from edsnlp_spark.operators.dedup import token_shingles
    notes = _empty_notes(spark)
    assert PIIScrubber().entities(notes).count() == 0
    assert PIIScrubber().transform(notes).count() == 0
    one = spark.createDataFrame([(1, "")], "note_id long, note_text string")
    rows = one.select(token_shingles(F.col("note_text"), 3).alias("sh")) \
        .collect()
    assert rows[0].sh == []
