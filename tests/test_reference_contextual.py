"""The reference contextual-matcher matrix
(tests/pipelines/core/test_contextual_matcher.py:12-235): one cancer
config run under every combination of include_assigned x replace_entity
x reduce_mode(stage) x reduce_mode(metastase), asserting the exact
entity spans and assigned values of the reference suite.

Expectations are derived from the reference algorithm
(contextual_matcher.py:260-400); each golden below matches the
corresponding EXAMPLES entry (scalars appear as single-element lists —
the engine's assigned column is uniformly map<string,array<string>>).
"""

from __future__ import annotations

import pytest

from edsnlp_spark import registry
from edsnlp_spark.core.base import Pipeline
from edsnlp_spark.operators.tokenizer import Tokenizer, Normalizer
from edsnlp_spark.operators.sentences import SentenceSegmenter

TEXT = ("Le patient présente une métastasis sur un cancer métastasé au "
        "stade 3 voire au stade 4.")

# (include_assigned, replace_entity, reduce_stage, reduce_metastase) ->
# [(entity_text, {assigned})]
S3 = "stade 3"
S4 = "stade 4"
BIG3 = "cancer métastasé au stade 3"
BIG34 = "cancer métastasé au stade 3 voire au stade 4"
CANCER = "cancer "

CASES = [
    # include_assigned=True, replace_entity=True
    ((True, True, None, None),
     [(BIG3, {"stage": ["3"], "metastase": ["metastase"]}),
      (S4, {"stage": ["4"], "metastase": ["metastase"]})]),
    ((True, True, None, "keep_first"),
     [(BIG3, {"stage": ["3"], "metastase": ["metastase"]}),
      (S4, {"stage": ["4"], "metastase": ["metastase"]})]),
    ((True, True, "keep_first", None),
     [(BIG3, {"stage": ["3"], "metastase": ["metastase"]})]),
    ((True, True, "keep_last", None),
     [(BIG34, {"stage": ["4"], "metastase": ["metastase"]})]),
    # include_assigned=True, replace_entity=False
    ((True, False, None, None),
     [(BIG34, {"stage": ["3", "4"], "metastase": ["metastase"]})]),
    ((True, False, "keep_first", None),
     [(BIG3, {"stage": ["3"], "metastase": ["metastase"]})]),
    ((True, False, "keep_last", None),
     [(BIG34, {"stage": ["4"], "metastase": ["metastase"]})]),
    # include_assigned=False, replace_entity=True
    ((False, True, None, None),
     [(S3, {"stage": ["3"], "metastase": ["metastase"]}),
      (S4, {"stage": ["4"], "metastase": ["metastase"]})]),
    ((False, True, "keep_first", None),
     [(S3, {"stage": ["3"], "metastase": ["metastase"]})]),
    ((False, True, "keep_last", None),
     [(S4, {"stage": ["4"], "metastase": ["metastase"]})]),
    # include_assigned=False, replace_entity=False
    ((False, False, None, None),
     [(CANCER.strip(), {"stage": ["3", "4"], "metastase": ["metastase"]})]),
    ((False, False, "keep_first", None),
     [(CANCER.strip(), {"stage": ["3"], "metastase": ["metastase"]})]),
    ((False, False, "keep_last", None),
     [(CANCER.strip(), {"stage": ["4"], "metastase": ["metastase"]})]),
]


def make_matcher(include_assigned, replace_entity, red_stage, red_meta):
    return registry.create("eds.contextual_matcher", label="Cancer",
                           include_assigned=include_assigned, patterns=[
        dict(source="Solide",
             regex=[r"cancer", r"tumeur", r"adeno(carcinom|[\s-]?k)",
                    r"neoplas", r"melanom"],
             regex_attr="NORM",
             exclude=dict(regex="benign|benin", window=3),
             assign=[
                 dict(name="stage", regex="stade (I{1,3}V?|[1234])",
                      window=[-10, 10], replace_entity=replace_entity,
                      reduce_mode=red_stage),
                 dict(name="metastase", regex="(metasta)", window=10,
                      reduce_mode=red_meta),
             ]),
        dict(source="Lymphome", regex=["lymphom", "lymphangio"],
             regex_attr="NORM"),
    ])


@pytest.mark.parametrize("params,expected", CASES)
def test_contextual_matrix(spark, params, expected):
    include_assigned, replace_entity, red_stage, red_meta = params
    m = make_matcher(*params)
    notes = Pipeline([Tokenizer(), Normalizer(), SentenceSegmenter()])(
        spark.createDataFrame([(0, TEXT)],
                              "note_id long, note_text string")).persist()
    rows = sorted(m.entities(notes).collect(),
                  key=lambda r: (r.start_char, r.end_char))
    got = [(r.lexical_variant,
            {k: list(v) for k, v in r.assigned.items()}) for r in rows]
    assert got == expected, params
