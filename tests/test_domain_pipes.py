"""Tests for history (cross-pipe), scores, TNM, ADICAP, terminology."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import edsnlp_spark as es
from edsnlp_spark.operators.tokenizer import Tokenizer, Normalizer
from edsnlp_spark.operators.sentences import SentenceSegmenter
from edsnlp_spark.operators.matcher import PhraseMatcher
from edsnlp_spark.operators.history import HistoryQualifier
from edsnlp_spark.operators.scores import (
    ScoreMatcher, parse_tnm, AdicapDecoder,
)
from edsnlp_spark.operators.terminology import (
    TerminologyMatcher, LexiconMatcher,
)


def pipe_notes(spark, rows):
    df = spark.createDataFrame(
        rows, "note_id long, note_text string, note_datetime timestamp")
    return es.Pipeline([Tokenizer(), Normalizer(), SentenceSegmenter()])(df)


def test_history_cross_pipe(spark):
    import datetime as dt
    now = dt.datetime(2024, 6, 1)
    rows = [
        # (a) cue-based: 'ancien' cue (not a section header), then the
        # 'Actuellement' termination resets the scope
        (1, "Ancien diabète. Actuellement une pneumopathie.", now),
        # (b) section gating: everything under the header is history
        (2, "Antécédents : diabète ancien.", now),
        # (c) old date precedes the mention
        (3, "En 12/01/2010 diagnostic de diabète.", now),
        # current: no cue, no section, no old date
        (4, "Le patient a un diabète.", now),
    ]
    notes = pipe_notes(spark, rows).persist()
    ents = PhraseMatcher({"dis": ["diabete", "pneumopathie"]}).entities(notes)
    hq = HistoryQualifier(history_limit_days=365)
    out = {(r["note_id"], r["lexical_variant"]): r["history"]
           for r in hq.qualify(notes, ents).collect()}
    assert out[(1, "diabète")] is True
    assert out[(1, "pneumopathie")] is False  # after "Actuellement" cue reset
    assert out[(2, "diabète")] is True        # section containment
    assert out[(3, "diabète")] is True        # 2010 << 2024 - 365d
    assert out[(4, "diabète")] is False


def test_score_matcher(spark):
    df = spark.createDataFrame(
        [(1, "Charlson : 6. SOFA à 3."), (2, "charlson=55"), (3, "rien")],
        "note_id long, note_text string",
    )
    ch = ScoreMatcher("charlson", ["charlson"], max_value=40)
    rows = ch.entities(df).collect()
    assert [(r["note_id"], r["value"]) for r in rows] == [(1, 6.0)]  # 55 > max
    sofa = ScoreMatcher("sofa", ["sofa"], max_value=24)
    assert sofa.entities(df).collect()[0]["value"] == 3.0
    # emergency priority (scores/emergency/priority/patterns.py: 0..5)
    pr = spark.createDataFrame(
        [(1, "priorite : 2 a l'arrivee"), (2, "priorite 9")],
        "note_id long, note_text string")
    prm = ScoreMatcher("emergency_priority", ["priorite"], max_value=5)
    assert [(r["note_id"], r["value"]) for r in prm.entities(pr).collect()] \
        == [(1, 2.0)]  # 9 > max dropped


def test_tnm(spark):
    df = spark.createDataFrame(
        [(1, "Tumeur classée pT2 N1 M0."), (2, "stade T4"), (3, "rien")],
        "note_id long, t string")
    out = df.select("note_id", parse_tnm(F.col("t")).alias("tnm")).collect()
    assert out[0]["tnm"]["norm"] == "pT2N1M0"
    assert out[0]["tnm"]["prefix"] == "p" and out[0]["tnm"]["n"] == "1"
    assert out[1]["tnm"]["norm"] == "T4" and out[1]["tnm"]["m"] is None
    assert out[2]["tnm"] is None


def test_adicap(spark):
    # Golden from the reference docstring example (adicap/adicap.py:100-108)
    # plus the dotted spelling (patterns.py:7 d1_4 with optional dots).
    df = spark.createDataFrame(
        [(1, "Prélèvement codé BHGS0040 au laboratoire."),
         (2, "Codification : B.H.GS.0040")],
        "note_id long, note_text string")
    rows = AdicapDecoder().entities(df).orderBy("note_id").collect()
    for r in rows:
        assert r["code"] == "BHGS0040"
        assert r["sampling_mode"] == "BIOPSIE CHIRURGICALE"
        assert r["technic"] == "HISTOLOGIE ET CYTOLOGIE PAR INCLUSION"
        assert r["organ"] == "SEIN (ÉGALEMENT UTILISÉ CHEZ L'HOMME)"
        assert r["pathology"] == "PATHOLOGIE GÉNÉRALE NON TUMORALE"
        assert r["pathology_type"] == "ETAT SUBNORMAL - LESION MINEURE"
        assert r["behaviour_type"] == "CARACTERES GENERAUX"
    assert rows[1]["lexical_variant"] == "B.H.GS.0040"


def test_lexicon_matcher_real_dictionaries(spark):
    # Real resources: reference drugs.json (5 789 ATC forms) and
    # cim10.csv.gz (169 208 ICD-10 forms incl. code variants).
    notes = pipe_notes(spark, [
        (1, "Patient sous paracetamol : acide acetylsalicylique arrêté.", None),
        (2, "Diabete sucre de type 2 ; insuffisance cardiaque congestive.", None),
        (3, "Code E110 rapporté, forme E 1.10 aussi.", None)]).persist()
    drugs = LexiconMatcher("drug", "drugs")
    got = sorted((r["kb_id"], r["lexical_variant"])
                 for r in drugs.entities(notes).collect())
    assert ("N02BE01", "paracetamol") in got
    # multi-token + multi-concept form (two ATC codes for aspirin)
    assert ("B01AC06", "acide acetylsalicylique") in got
    assert ("N02BA01", "acide acetylsalicylique") in got
    cim = LexiconMatcher("cim10", "cim10")
    got = {(r["kb_id"], r["lexical_variant"])
           for r in cim.entities(notes).collect()}
    assert ("E11", "Diabete sucre de type 2") in got
    assert ("I500", "insuffisance cardiaque congestive") in got
    # greedy sub-span also present (filter_spans resolves downstream)
    assert ("I50", "insuffisance cardiaque") in got
    # code-variant spellings (cim10/patterns.py:11-16: E110, E 1.10)
    assert ("E110", "E110") in got
    assert ("E110", "E 1.10") in got


def test_terminology_kb_id(spark):
    notes = pipe_notes(spark, [
        (1, "Prescription de Doliprane et morphine.", None)]).persist()
    m = TerminologyMatcher("drug", {
        "N02BE01": ["paracetamol", "doliprane"], "N02AA01": ["morphine"]})
    rows = sorted((r["kb_id"], r["lexical_variant"])
                  for r in m.entities(notes).collect())
    assert rows == [("N02AA01", "morphine"), ("N02BE01", "Doliprane")]
    assert all(r["label"] == "drug" for r in m.entities(notes).collect())


def test_registry_domain_pipes(spark):
    for name in ("eds.covid", "eds.drugs", "eds.cim10", "eds.charlson",
                 "eds.tnm", "eds.adicap", "eds.history_full"):
        assert name in es.available(), name


def test_tnm_reference_goldens(spark):
    """The parseable cases of the reference TNM golden set
    (tests/pipelines/ner/test_tnm.py): suffixes, micro-modifiers,
    residual R, slash separators, repeated prefixes, UICC year
    expansion."""
    cases = [
        ("TNM: aTxN1M0", "aTxN1M0"),
        ("TNM: p Tx N1M 0", "pTxN1M0"),
        ("TNM: p Tx N1M 0 (UICC 20)", "pTxN1M0 (UICC 2020)"),
        ("TNM: aTxN1M0 (UICC 68)", "aTxN1M0 (UICC 1968)"),
        ("TNM: aTxN1 R2", "aTxN1R2"),
        ("TNM: pT2c N0 R0 (TNM 2010)", "pT2cN0R0 (TNM 2010)"),
        ("TNM: aTx / N1 / M0", "aTxN1M0"),
        ("TNM: pT2 N1mi", "pT2N1mi"),
        ("TNM: pT1bN0(sn)", "pT1bN0sn"),
        ("TNM: pT1 pN1 M0", "pT1N1M0"),
        ("TNM: cT3N0M0", "cT3N0M0"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], "t string")
    out = df.select(parse_tnm(F.col("t")).alias("tnm")).collect()
    for (txt, exp), row in zip(cases, out):
        assert row["tnm"] is not None, txt
        assert row["tnm"]["norm"] == exp, (txt, row["tnm"]["norm"], exp)


def test_elston_ellis_computed_and_sofa_method(spark):
    """Reference score goldens (tests/pipelines/ner/test_score.py):
    '(architecture : 3 + noyaux : 3 + mitoses : 1)' sums to 7 -> grade
    2; 'SOFA maximum : 12' carries method=Maximum."""
    from edsnlp_spark.operators.scores import (
        parse_elston_ellis, parse_sofa_method)
    df = spark.createDataFrame(
        [("grade 2 selon Elston et Ellis "
          "(architecture : 3 + noyaux : 3 + mitoses : 1).",),
         ("(2+1,1)",), ("rien",)], "t string")
    out = df.select(parse_elston_ellis(F.col("t")).alias("ee")).collect()
    assert out[0]["ee"]["total"] == 7 and out[0]["ee"]["grade"] == 2
    assert out[1]["ee"]["total"] == 4 and out[1]["ee"]["grade"] == 1
    assert out[2]["ee"] is None
    m = spark.createDataFrame(
        [("SOFA maximum : 12",), ("sofa 24h : 8",), ("SOFA : 3",)],
        "t string")
    got = [r["m"] for r in
           m.select(parse_sofa_method(F.col("t")).alias("m")).collect()]
    assert got == ["Maximum", "24H", None]


def test_covid_reference_regex(spark):
    """Reference covid pattern (covid/patterns.py): disease-context
    prefix folds into the span; spaced/hyphen variants match."""
    from edsnlp_spark import registry
    m = registry.create("eds.covid")
    df = spark.createDataFrame(
        [(1, "Pneumopathie à COVID-19 confirmée."),
         (2, "Positif au corona virus."),
         (3, "sars cov 2 détecté."),
         (4, "rien ici")],
        "note_id long, note_text string")
    got = {r["note_id"]: r["lexical_variant"]
           for r in m.entities(df).collect()}
    assert got[1] == "Pneumopathie à COVID-19"
    assert got[2] == "corona virus"
    assert got[3] == "sars cov 2"
    assert 4 not in got
