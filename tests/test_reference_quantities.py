"""Reference quantity-pipe goldens (mirrors the mention-level cases of
tests/pipelines/misc/test_quantities.py): quantity_mentions must
reproduce the reference's span list — values, units, labels and
str(value) norms — including unit propagation, composites, fractions,
ranges, unitless context rules and the non-match guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from edsnlp_spark.operators.quantities import quantity_mentions

MAIN_TEXT = (
    "Le patient fait 1 m 50 kg. La tumeur fait 2.0cm x 3cm. \n"
    "Une autre tumeur plus petite fait 2 par 1mm.\n"
    "Les trois éléments font 8, 13 et 15dm.\n"
)


def mentions(spark, text, **kw):
    notes = spark.createDataFrame(
        [(0, text)], "note_id long, note_text string").persist()
    out = sorted(quantity_mentions(notes, **kw).collect(),
                 key=lambda r: (r.start_char, r.end_char))
    notes.unpersist()
    return out


def test_quantities_component_golden(spark):
    got = [(r.label, r.norm) for r in mentions(spark, MAIN_TEXT)]
    assert got == [
        ("size", "1 m"), ("weight", "50 kg"),
        ("size", "2.0 cm"), ("size", "3 cm"),
        ("size", "2 mm"), ("size", "1 mm"),
        ("size", "8 dm"), ("size", "13 dm"), ("size", "15 dm"),
    ]


def test_quantities_component_scaling(spark):
    si = [r.value_si for r in mentions(spark, MAIN_TEXT)]
    # SI: m / kg->g base (mass base is grams in the registry)
    assert abs(si[0] - 1.0) < 1e-9           # 1 m
    assert abs(si[1] - 50000.0) < 1e-9       # 50 kg in g
    assert abs(si[2] - 0.02) < 1e-9          # 2.0 cm in m
    assert abs(si[4] - 0.002) < 1e-9         # 2 mm
    assert abs(si[8] - 1.5) < 1e-9           # 15 dm


@pytest.mark.parametrize("text,res", [
    ("1m50", "1.5 m"),
    ("1,50cm", "1.5 cm"),
    ("1kg300", "1.3 kg"),
])
def test_measure_str(spark, text, res):
    got = mentions(spark, text)
    assert len(got) == 1 and got[0].norm == res


@pytest.mark.parametrize("text,res", [
    ("deux m", "2 m"),
    ("2 m", "2 m"),
    ("⅛ m", "0.125 m"),
    ("0 m", "0 m"),
])
def test_numbers(spark, text, res):
    got = mentions(spark, text)
    assert [r.norm for r in got] == [res]


def test_numbers_no_propagation_across_junk(spark):
    got = mentions(spark, "55 @ 77777 cm")
    assert [r.norm for r in got] == ["77777 cm"]


@pytest.mark.parametrize("text,res,snippet", [
    ("Le patient fait entre 1 et 2m", "1-2 m", "entre 1 et 2m"),
    ("On mesure de 2 à 2.5 dl d'eau", "2-2.5 dl", "de 2 à 2.5 dl"),
])
def test_ranges(spark, text, res, snippet):
    got = mentions(spark, text, all_units=True)
    rng = [r for r in got if r.value_high is not None]
    assert len(rng) == 1
    assert rng[0].norm == res
    assert rng[0].lexical_variant == snippet


@pytest.mark.parametrize("text", [
    "On délivre à 10 g / h.",
    "Le patient grandit de 10 cm par jour ",
    "Truc 10cma truc",
    "01.42.43.56.78 m",
])
def test_non_matches(spark, text):
    assert mentions(spark, text) == []


@pytest.mark.parametrize("text,res", [
    ("BMI: 24 .", "24 kg_per_m2"),
    ("Le patient mesure 1.5 ", "1.5 m"),
    ("Le patient mesure 152 ", "152 cm"),
    ("Le patient pèse 34 ", "34 kg"),
])
def test_unitless_context(spark, text, res):
    got = mentions(spark, text)
    assert [r.norm for r in got] == [res]


def test_operator_all_mode(spark):
    got = mentions(spark, "< 5 µl et supérieur à 8 ui", all_units=True)
    assert [(r.label, r.norm, r.operator) for r in got] == [
        ("µl", "<5 µl", "<"), ("ui", ">8 ui", ">")]
