"""Disorder config-pipe tests (DisorderMatcher + 16 configs)."""

import edsnlp_spark as es
from edsnlp_spark.core.base import Pipeline
from edsnlp_spark.operators.tokenizer import Tokenizer, Normalizer
from edsnlp_spark.operators.sentences import SentenceSegmenter
from edsnlp_spark.operators.disorders import DISORDER_CONFIGS


def test_all_disorder_pipes_registered(spark):
    for name in DISORDER_CONFIGS:
        assert f"eds.{name}" in es.available()
    assert "eds.suicide_attempt" in es.available()
    assert "eds.umls" in es.available()


def test_diabetes_status(spark):
    notes = Pipeline([Tokenizer(), Normalizer(), SentenceSegmenter()])(
        spark.createDataFrame(
            [(1, "Patient diabétique insulinodépendant."),
             (2, "Diabète équilibré sous metformine."),
             (3, "Pas de pathologie.")],
            "note_id long, note_text string")).persist()
    m = es.create("eds.diabetes")
    rows = {r["note_id"]: r["status"] for r in m.entities(notes).collect()}
    assert rows == {1: 2, 2: 1}


def test_solid_tumor_metastasis(spark):
    notes = Pipeline([Tokenizer(), Normalizer(), SentenceSegmenter()])(
        spark.createDataFrame(
            [(1, "Cancer du poumon avec métastases hépatiques."),
             (2, "Tumeur bénigne surveillée.")],
            "note_id long, note_text string")).persist()
    rows = {r["note_id"]: r["status"]
            for r in es.create("eds.solid_tumor").entities(notes).collect()}
    assert rows == {1: 2, 2: 1}
