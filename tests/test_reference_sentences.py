"""Reference sentence-segmentation goldens
(mirrors tests/pipelines/core/test_sentences.py of the reference).

Sentence texts are compared by slicing the source text between
consecutive sentence START chars (rstripped on both sides): the
reference's spaCy spans end at newline TOKENS our tokenizer treats as
gaps, so trailing whitespace is the one representational difference.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from edsnlp_spark.core.base import Pipeline
from edsnlp_spark.operators.tokenizer import Tokenizer
from edsnlp_spark.operators.sentences import (
    DEFAULT_CAPITALIZED_SHAPES, LEGACY_CAPITALIZED_SHAPES,
    SentenceSegmenter, generate_capitalized_shapes,
)

TEXT = (
    "Le patient est admis pour des douleurs dans le bras droit. "
    "mais n'a pas de problème de locomotion. \n"
    "Historique d'AVC dans la famille\n"
    "Mais ne semble pas en être un\n"
    "Pourrait être un cas de rhume.\n"
    "Motif :\n"
    "Douleurs dans le bras droit !"
    "Il est contaminé à E.Coli? c'est un problème, il faut s'en occuper."
)


def seg_texts(spark, text, excluded_newlines=None, **cfg):
    if excluded_newlines is not None:
        df = spark.createDataFrame(
            [(0, text, excluded_newlines)],
            "note_id long, note_text string, exc array<int>")
        cfg["excluded_newlines_col"] = "exc"
    else:
        df = spark.createDataFrame([(0, text)],
                                   "note_id long, note_text string")
    out = Pipeline([Tokenizer(), SentenceSegmenter(**cfg)])(df).collect()[0]
    sents = sorted(out["sentences"], key=lambda s: s["sent_id"])
    starts = [s["start"] for s in sents] + [len(text)]
    return [text[a:b].rstrip() for a, b in zip(starts, starts[1:])]


def test_sentences_main_golden(spark):
    assert seg_texts(spark, TEXT) == [
        "Le patient est admis pour des douleurs dans le bras droit.",
        "mais n'a pas de problème de locomotion.",
        "Historique d'AVC dans la famille",
        "Mais ne semble pas en être un",
        "Pourrait être un cas de rhume.",
        "Motif :",
        "Douleurs dans le bras droit !",
        "Il est contaminé à E.Coli?",
        "c'est un problème, il faut s'en occuper.",
    ]


def test_sentences_main_golden_endlines_excluded(spark):
    # the reference's endlines=True variant: the newline after
    # "famille" is EXCLUDED -> the two lines merge
    exc = [TEXT.index("famille") + len("famille")]
    got = seg_texts(spark, TEXT, excluded_newlines=exc)
    assert got[2] == "Historique d'AVC dans la famille\nMais ne semble " \
                     "pas en être un"
    assert len(got) == 8


@pytest.mark.parametrize("text", ["02.04.2018", "E.Coli"])
def test_false_positives(spark, text):
    assert seg_texts(spark, text) == [text]


@pytest.mark.parametrize("text", [
    "10.10.2010:RCP", "10.10.2010 : RCP",
    "02.04.2018 : RCP", "10/10/2010 : RCP",
])
def test_false_positives_dotted_dates_with_labels(spark, text):
    assert seg_texts(spark, text) == [text]


def test_newlines_double(spark):
    cfg = dict(punct_chars=(), check_capitalized=False,
               min_newline_count=2, hard_newline_count=None)
    text = ("Lundi\nMardi\nMercredi\nLe patient est admis. "
            "Des douleurs dans le bras droit\n\n\n\njeudi.")
    assert len(seg_texts(spark, text, **cfg)) == 2
    cfg["check_capitalized"] = True
    text2 = ("Lundi\nMardi\nMercredi\nLe patient est admis. "
             "Des douleurs dans le bras droit\n\n\njeudi.")
    assert len(seg_texts(spark, text2, **cfg)) == 1


def test_hard_newlines_force_split_before_date(spark):
    text = "ANTECEDANT\n\n15/03/2020 Antécédant 1\nv antecedant numero 2\n"
    assert seg_texts(spark, text, hard_newline_count=2) == [
        "ANTECEDANT",
        "15/03/2020 Antécédant 1\nv antecedant numero 2",
    ]


def test_sentences_bullet_edge_cases(spark):
    cfg = dict(use_bullet_start=True, bullet_starters=("-",),
               hard_newline_count=2)
    t1 = "Le patient - âgé de 45 ans - présente des symptômes."
    assert len(seg_texts(spark, t1, **cfg)) == 1
    t2 = "Symptômes:   \n- Fièvre\t\n- Toux"
    assert seg_texts(spark, t2, **cfg) == ["Symptômes:", "- Fièvre", "- Toux"]
    t3 = "Item:\n_ Premier point\n_ Deuxième point"
    assert len(seg_texts(spark, t3, **cfg)) == 1


def test_sentences_multiple_bullet_types(spark):
    text = "Liste mixte:\n- Point A\n* Point B\n• Point C\n· Point D"
    got = seg_texts(spark, text, use_bullet_start=True,
                    hard_newline_count=2)
    assert len(got) == 5  # header + 4 bullets


def test_all_caps_sections_expanded_mode(spark):
    cfg = dict(use_bullet_start=True, bullet_starters=("-",),
               hard_newline_count=2)
    assert seg_texts(spark, "CONCLUSION\nSuite\n", **cfg) == \
        ["CONCLUSION", "Suite"]
    assert seg_texts(spark, "EVOLUTION\n- Fièvre\n- Toux\n", **cfg) == \
        ["EVOLUTION", "- Fièvre", "- Toux"]


def test_custom_shapes_override_titlecase_only(spark):
    got = seg_texts(spark, "Titre\nSuite\n", capitalized_shapes=("Xxxxx",),
                    use_bullet_start=True, bullet_starters=("-",),
                    hard_newline_count=2)
    assert got == ["Titre", "Suite"]


def test_disable_capitalized_rule_keeps_bullets_only(spark):
    got = seg_texts(spark, "CONCLUSION\n- Fièvre\n- Toux\n",
                    check_capitalized=False, use_bullet_start=True,
                    bullet_starters=("-",), hard_newline_count=2)
    assert "- Fièvre" in got and "- Toux" in got


@pytest.mark.parametrize("mode, expected", [
    ("legacy", ["Une première phrase.", "Une deuxième",
                "Peut-être un autre\nET encore une."]),
    ("expanded", ["Une première phrase.", "Une deuxième",
                  "Peut-être un autre", "ET encore une."]),
])
def test_capitalized_modes(spark, mode, expected):
    text = ("Une première phrase. Une deuxième\n"
            "Peut-être un autre\nET encore une.")
    got = seg_texts(spark, text, capitalized_mode=mode,
                    use_bullet_start=False, hard_newline_count=2)
    assert got == expected


@pytest.mark.parametrize("text, expected", [
    ("ÉTAT CIVIL  \nSuite\n", ["ÉTAT CIVIL", "Suite"]),
    ("CONCLUSION\r\n- Fièvre\r\n", ["CONCLUSION", "- Fièvre"]),
])
def test_newline_robustness_with_expanded_mode(spark, text, expected):
    got = seg_texts(spark, text, use_bullet_start=True,
                    bullet_starters=("-",), hard_newline_count=2)
    assert got == expected


def test_legacy_mode_behavior_non_regression(spark):
    got = seg_texts(spark, "hémoculture\n\nCONCLUSION\nSuite\n",
                    capitalized_mode="legacy", use_bullet_start=True,
                    bullet_starters=("-",), hard_newline_count=None)
    assert got == ["hémoculture\n\nCONCLUSION", "Suite"]


def test_generate_capitalized_shapes_contract():
    shapes = generate_capitalized_shapes()
    assert isinstance(shapes, tuple)
    assert len(shapes) == len(set(shapes))
    assert DEFAULT_CAPITALIZED_SHAPES == generate_capitalized_shapes(
        upper_min=2, upper_max=13, x_min=2, x_max=12,
        include_apostrophe=True)
    assert LEGACY_CAPITALIZED_SHAPES == ("X'", "Xx", "Xxx", "Xxxx", "Xxxxx")
    s_none = generate_capitalized_shapes(include_all_caps=False,
                                         include_titlecase=False,
                                         include_apostrophe=False)
    assert s_none == tuple()


def test_tokenizer_exceptions_and_acronyms(spark):
    """language.py:44-66 tokenizer details feeding segmentation."""
    from edsnlp_spark.functions.text import tokenize
    df = spark.createDataFrame(
        [(0, "Dr. Dupont et M. Martin: E.Coli, 3,5 mg et 3,55 mg")],
        "note_id long, note_text string")
    toks = [t["text"] for t in
            df.select(tokenize(F.col("note_text")).alias("t"))
            .collect()[0]["t"]]
    assert toks == ["Dr.", "Dupont", "et", "M.", "Martin", ":", "E.",
                    "Coli", ",", "3,5", "mg", "et", "3", ",", "55", "mg"]
