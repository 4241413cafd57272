"""Reference golden: tests/pipelines/qualifiers/test_history.py.

The reference's parametrized test (use_sections x use_dates x
exclude_birthdate, history_limit=15, note_datetime=2020-08-11,
birth_datetime=1978-11-23) over one hospitalisation report with five
entities ["toux", "asthme", "asthme", "toux", "asthme"]. Its assertion
matrix:

  * ents[0].history is (not exclude_birthdate)     [if use_dates]
  * ents[1].history is True                        [always: 'antécédent' cue]
  * ents[2].history is (not use_dates)             [if use_sections]
  * ents[3].history is (not use_dates)             [if use_sections]
  * ents[4].history is True                        [if use_sections]

Exercises: recent-date veto (history.py:576), closest-dates-only
resolution (history.py:493-546), section titles as terminations
(history.py:385), birthdate exclusion (history.py:453), relative /
current / absolute date classification (history.py:395-460).
"""

import datetime
import json
import os

import pytest
from pyspark.sql import functions as F

from edsnlp_spark.core.base import Pipeline
from edsnlp_spark.operators.tokenizer import Tokenizer
from edsnlp_spark.operators.sentences import SentenceSegmenter
from edsnlp_spark.operators.matcher import PhraseMatcher
from edsnlp_spark.operators.sections import SectionSegmenter
from edsnlp_spark.operators.history import HistoryQualifier

TEXT = """COMPTE RENDU D'HOSPITALISATION du 11/07/2018 au 12/07/2018

MOTIF D'HOSPITALISATION
Monsieur Dupont 30\n2 Jean Michel, de sexe masculin, âgée de 39 ans,
née le 23/11/1978, est admis pour une toux.
Il a été hospitalisé du 11/08/2019 au 17/08/2019,
avec un antécédent d'asthme il y a 25 jours.

ANTÉCÉDENTS
Antécédents médicaux :
Premier épisode: il a été hospitalisé pour asthme cette semaine-ci,
il y a 3 jours, le 13 août 2020.
Hier, le patient est venu pour une toux dont les symptômes,
seraient apparus il y a 2 mois.
L'asthme est critique
"""

_PATS = json.load(open(os.path.join(
    os.path.dirname(__file__), "..",
    "edsnlp_spark", "resources", "qualifier_patterns.json")))


def _notes(spark):
    df = spark.createDataFrame(
        [(1, TEXT,
          datetime.datetime(2020, 8, 11),
          datetime.datetime(1978, 11, 23))],
        "note_id long, note_text string, note_datetime timestamp, "
        "birth_datetime timestamp")
    return Pipeline([Tokenizer(), SentenceSegmenter()])(df).persist()


@pytest.mark.parametrize("use_sections", [True, False])
@pytest.mark.parametrize("use_dates", [True, False])
@pytest.mark.parametrize("exclude_birthdate", [True, False])
def test_reference_history_golden(spark, use_sections, use_dates,
                                  exclude_birthdate):
    notes = _notes(spark)
    ents = PhraseMatcher(
        {"respiratoire": ["asthmatique", "asthme", "toux"]},
        attr="NORM").entities(notes)
    hq = HistoryQualifier(
        history_limit_days=15,
        cues={"history": _PATS["history"]["history"],
              "termination": _PATS["termination_default"]},
        use_sections=use_sections,
        use_dates=use_dates,
        exclude_birthdate=exclude_birthdate,
        section_names=tuple(_PATS["history"]["sections_history"]),
        sections=SectionSegmenter("reference"),
    )
    out = hq.qualify(notes, ents)
    rows = out.orderBy("start_char").select(
        "lexical_variant", "history").collect()
    texts = [r["lexical_variant"].lower() for r in rows]
    assert texts == ["toux", "asthme", "asthme", "toux", "asthme"]
    hist = [r["history"] for r in rows]

    if use_dates:
        assert hist[0] is (not exclude_birthdate)
    assert hist[1] is True
    if use_sections:
        assert hist[2] is (not use_dates)
        assert hist[3] is (not use_dates)
        assert hist[4] is True
