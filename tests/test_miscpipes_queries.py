"""Behavioral edges for the r13 misc-pipe driver queries (the value
parity itself is covered by tests/test_oracle_parity.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from edsnlp_spark.operators.tables import TablesExtractor
from edsnlp_spark.operators.pollution import PollutionTagger, strip_pollution
from edsnlp_spark.operators.misc_pipes import consultation_dates
from edsnlp_spark.operators.matcher import RegexMatcher
from edsnlp_spark.operators.disorders import SUICIDE_ATTEMPT_PATTERNS


def test_table_sessionization_two_tables(spark):
    """Two pipe runs separated by a prose line -> two table_ids; the
    2-cell line is NOT a table line (min_cells=2 keeps > 2 cells)."""
    txt = "a|b|c\nd|e|f|g\nplain prose line\nh|i|j\nk|l\n"
    df = spark.createDataFrame([(1, txt)], "note_id long, note_text string")
    cells = TablesExtractor(min_cells=2).tables(df).collect()
    tables = {}
    for r in cells:
        tables.setdefault(r.table_id, set()).add((r.row_id, r.col_id, r.cell))
    assert set(tables) == {1, 2}
    assert (1, 0, "a") in tables[1] and (2, 3, "g") in tables[1]
    assert tables[2] == {(1, 0, "h"), (1, 1, "i"), (1, 2, "j")}
    # the 2-cell "k|l" line never appears
    assert all(r.cell not in ("k", "l") for r in cells)


def test_consultation_dates_cue_window_gates(spark):
    """A date outside every cue window is dropped; town/document cues
    only fire when their family is enabled."""
    pad = "y" * 80
    txt = (f"consultation du 12/03/2021. {pad} "
           f"le 05/07/2020 sans contexte. {pad} signe le 01/02/2019.")
    df = spark.createDataFrame([(1, txt)], "note_id long, note_text string")
    rows = consultation_dates(
        df, consultation_mention=True, town_mention=False,
        document_date_mention=False).collect()
    assert {(r.cue_kind, r.consultation_date) for r in rows} == {
        ("consultation", "2021-03-12")}
    rows = consultation_dates(
        df, consultation_mention=True, town_mention=False,
        document_date_mention=True).collect()
    assert {(r.cue_kind, r.consultation_date) for r in rows} == {
        ("consultation", "2021-03-12"), ("document_date", "2019-02-01")}


def test_suicide_match_requires_pollution_strip(spark):
    """The polluted mention only matches AFTER the strip; a bars-only
    doc stays matchless."""
    df = spark.createDataFrame(
        [(1, "scan table tentative de nbnbnbnbnb suicide"),
         (2, "scan table auto-\nlyse"),
         (3, "scan table nbnbnbnbnb")],
        "note_id long, note_text string")
    matcher = RegexMatcher(SUICIDE_ATTEMPT_PATTERNS, attr="TEXT",
                           text_col="excluded_text")
    # without the strip: raw text, no matches
    raw = matcher.entities(
        df.withColumn("excluded_text", F.col("note_text")))
    assert raw.count() == 0
    clean = strip_pollution(PollutionTagger()(df))
    got = {(r.note_id, r.label, r.lexical_variant)
           for r in matcher.entities(clean).collect()}
    assert got == {(1, "suicide_attempt_unspecific", "tentative de suicide"),
                   (2, "autolysis", "autolyse")}
    lens = {r.note_id: r.excluded_text for r in clean.collect()}
    assert lens[1] == "scan table tentative de suicide"
    assert lens[2] == "scan table autolyse"


def test_binary_auc_calibration_hand_computed(spark):
    """Midrank AUC on a tied score set: scores asc [.3(-), .8(-),
    .8(+), .9(+)] -> positive midranks {2.5, 4}, U = 3.5, AUC =
    0.875; degenerate single-class corpora pin AUC at 0.5."""
    from edsnlp_spark.operators.metrics import binary_auc_calibration

    df = spark.createDataFrame(
        [(0.9, 1), (0.8, 0), (0.8, 1), (0.3, 0)],
        "score double, label int")
    rows = binary_auc_calibration(df).collect()
    assert {r.auc for r in rows} == {0.875}
    by_bucket = {r.bucket: r for r in rows}
    assert by_bucket[3].n_docs == 1 and by_bucket[3].pos_rate == 0.0
    assert by_bucket[8].n_docs == 2 and by_bucket[8].pos_rate == 0.5
    assert by_bucket[9].n_docs == 1 and by_bucket[9].pos_rate == 1.0
    assert by_bucket[8].avg_score == 0.8
    # all-positive corpus: AUC degenerates to 0.5
    pos = spark.createDataFrame([(0.4, 1), (0.6, 1)],
                                "score double, label int")
    assert {r.auc for r in binary_auc_calibration(pos).collect()} \
        == {0.5}
    # score = 1.0 lands in the TOP bucket (least-clamp), not bucket 10
    edge = spark.createDataFrame([(1.0, 1), (0.0, 0)],
                                 "score double, label int")
    assert {r.bucket for r in binary_auc_calibration(edge).collect()} \
        == {0, 9}
