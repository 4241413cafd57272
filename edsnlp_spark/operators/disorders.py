"""Disorder/behavior NER pipes: config-not-code (SURVEY.md §2.6).

Parity target: edsnlp/pipes/ner/disorders/base.py:14 (DisorderMatcher) —
each of the 16 disorder pipes is a ContextualMatcher parameterization:
anchor patterns plus a ``status`` span attribute (1 = present, 2 =
aggravated/specific form, e.g. metastasis for solid_tumor), detection-
only semantics with qualification left to the §2.7 qualifiers.

The pattern bundles below are curated subsets with the reference's
structure; production deployments load the full lists as data into the
same shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .matcher import PhraseMatcher
from .. import registry


class DisorderMatcher:
    """Anchor scan + optional status-2 cue within a token window."""

    def __init__(self, name: str, patterns: list[str],
                 status2_cues: list[str] | None = None,
                 window: tuple[int, int] = (-5, 5), attr: str = "NORM"):
        self.name = name
        self._anchor = PhraseMatcher({name: patterns}, attr=attr)
        self._status2 = (
            PhraseMatcher({"s2": status2_cues}, attr=attr)
            if status2_cues else None
        )
        self.window = window

    def entities(self, notes: DataFrame) -> DataFrame:
        ents = self._anchor.entities(notes)
        if self._status2 is None:
            return ents.withColumn("status", F.lit(1))
        cues = self._status2.entities(notes).select(
            F.col("note_id").alias("c_note"),
            F.col("tok_start").alias("c_s"), F.col("tok_end").alias("c_e"),
        )
        before, after = self.window
        joined = ents.join(
            cues,
            (ents["note_id"] == cues["c_note"])
            & (cues["c_e"] > ents["tok_start"] + before)
            & (cues["c_s"] < ents["tok_end"] + after),
            "left",
        )
        return joined.groupBy(*ents.columns).agg(
            F.when(F.count("c_note") > 0, F.lit(2)).otherwise(F.lit(1))
            .alias("status")
        )


# name -> (anchor patterns, status-2 cues or None)
DISORDER_CONFIGS: dict[str, tuple[list[str], list[str] | None]] = {
    "aids": (["sida", "vih stade c"], None),
    "alcohol": (["alcoolisme", "ethylisme", "oh chronique", "alcoolique"],
                ["sevre", "sevrage"]),
    "cerebrovascular_accident": (["avc", "accident vasculaire cerebral",
                                  "ait", "accident ischemique transitoire"],
                                 None),
    "ckd": (["insuffisance renale chronique", "irc", "nephropathie chronique",
             "dialyse"], ["dialyse", "greffe renale"]),
    "congestive_heart_failure": (["insuffisance cardiaque",
                                  "decompensation cardiaque",
                                  "cardiopathie"], None),
    "connective_tissue_disease": (["lupus", "sclerodermie", "polyarthrite",
                                   "connectivite"], None),
    "copd": (["bpco", "bronchopneumopathie chronique obstructive",
              "emphyseme"], ["oxygenotherapie"]),
    "dementia": (["demence", "alzheimer", "troubles cognitifs majeurs"],
                 None),
    "diabetes": (["diabete", "diabetique"],
                 ["insulinodependant", "insulino-dependant", "complique"]),
    "hemiplegia": (["hemiplegie", "paraplegie", "tetraplegie"], None),
    "leukemia": (["leucemie", "lam", "llc"], None),
    "liver_disease": (["cirrhose", "hepatopathie", "hepatite chronique"],
                      ["decompensee", "varices oesophagiennes"]),
    "lymphoma": (["lymphome", "hodgkin", "lnh"], None),
    "myocardial_infarction": (["infarctus du myocarde", "idm", "syndrome "
                               "coronarien aigu", "sca"], None),
    "peptic_ulcer_disease": (["ulcere gastrique", "ulcere duodenal",
                              "ulcere gastroduodenal"], None),
    "peripheral_vascular_disease": (["arteriopathie", "aomi",
                                     "arterite"], None),
    "solid_tumor": (["cancer", "tumeur", "carcinome", "neoplasie"],
                    ["metastase", "metastases", "metastatique"]),
    "tobacco": (["tabagisme", "tabagique", "fumeur", "fumeuse"],
                ["sevre", "ancien fumeur"]),
}

for _name, (_pats, _s2) in DISORDER_CONFIGS.items():
    registry.register(f"eds.{_name}")(
        lambda name=_name, pats=_pats, s2=_s2, **kw:
        DisorderMatcher(name, pats, s2, **kw)
    )


@registry.register("eds.suicide_attempt")
def _make_suicide_attempt(**kw):
    return DisorderMatcher(
        "suicide_attempt",
        ["tentative de suicide", "ts medicamenteuse", "autolyse",
         "intoxication medicamenteuse volontaire", "imv"],
        **kw,
    )


@registry.register("eds.umls")
def _make_umls(concepts=None, **kw):
    """UMLS tier: approximate dictionary matching (SimstringMatcher, the
    reference's own engine for 100k+-term dictionaries)."""
    from .simstring import SimstringMatcher
    return SimstringMatcher(concepts or {}, **kw)
