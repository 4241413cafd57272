"""CSV/JSON trackers (loggers.py:43-167) and GenericScorer
(trainer.py:89-186) parity tests."""

from __future__ import annotations

import csv
import json
import warnings

import pytest

from edsnlp_spark.training import (CSVTracker, GenericScorer, JSONTracker,
                                   flatten_dict, sanitize_hparams)


def test_flatten_and_sanitize():
    flat = flatten_dict({"a": {"b": 1, "c": [2, 3]}, "d": 4})
    assert flat == {"a/b": 1, "a/c/0": 2, "a/c/1": 3, "d": 4}
    s = sanitize_hparams({"x": 1, "y": [1, 2], "z": "ok"})
    assert s == {"x": 1, "y": "[1, 2]", "z": "ok"}


def test_csv_tracker_columns_fixed_on_first_log(tmp_path):
    t = CSVTracker(logging_dir=str(tmp_path))
    t.log({"loss": 0.5, "ner": {"f": 0.1}}, step=0)
    # missing column -> empty; new column -> warning, not logged
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        t.log({"loss": 0.4, "other": 1.0}, step=1)
    assert any("new field 'other'" in str(x.message) for x in w)
    t.finish()
    rows = list(csv.reader(open(tmp_path / "metrics.csv")))
    assert rows[0] == ["step", "loss", "ner/f"]
    assert rows[1] == ["0", "0.5", "0.1"]
    assert rows[2] == ["1", "0.4", ""]


def test_json_tracker_rewrites_full_log(tmp_path):
    t = JSONTracker(logging_dir=str(tmp_path))
    t.log({"loss": 0.5}, step=0)
    t.log({"loss": 0.25}, step=1)
    logs = json.load(open(tmp_path / "metrics.json"))
    assert logs == [{"step": 0, "loss": 0.5}, {"step": 1, "loss": 0.25}]


def test_generic_scorer_speed_and_metrics(spark):
    import edsnlp_spark as es
    from edsnlp_spark.operators.metrics import ner_exact_metrics

    nlp = es.blank()
    nlp.add_pipe("eds.matcher", terms={"covid": ["covid"]})
    notes = spark.createDataFrame(
        [(1, "patient covid positif"), (2, "pas de covid ici")],
        "note_id long, note_text string")
    gold = (nlp.pipe(notes)
            .select("note_id", "start_char", "end_char", "label"))

    def metric(pred, gold_df):
        p = pred.select("note_id", "start_char", "end_char", "label")
        return ner_exact_metrics(p, gold_df)

    scorer = GenericScorer(speed=True, ner=metric)
    scores = scorer(nlp, notes, gold)
    assert scores["speed"]["dps"] > 0 and scores["speed"]["wps"] > 0
    ner_rows = {r["label"]: r for r in scores["ner"]}
    assert ner_rows["covid"]["f1"] == pytest.approx(1.0)
