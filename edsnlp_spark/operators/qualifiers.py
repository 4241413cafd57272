"""Rule-based qualifiers: negation / family / hypothesis / history /
reported_speech — ONE parameterized relational engine.

Parity target: RuleBasedQualifier (edsnlp/pipes/qualifiers/base.py:63) and
its five subclasses (negation.py:52-364, family.py:51, hypothesis.py:51,
history.py:56, reported_speech.py:51).  The shared algorithm:

1. scan cue terms by class (pseudo / preceding / following / verbs /
   termination) on NORM;
2. cut the document into *boundaries*: sentence segments further split at
   termination cues (negation.py:303-313);
3. an entity is qualified iff a preceding-class cue exists in the same
   boundary ending at-or-before the entity, or a following-class cue
   starting at-or-after it;
4. pseudo cues suppress overlapping real cues (negation.py:307).

Spark design (SURVEY.md §2.7): this is sessionization + an interval join.
- cue scan = PhraseMatcher broadcast join;
- boundary ids = cut points (sentence starts ∪ termination-cue ends)
  -> intervals via a lead() window per note;
- entity/cue -> boundary assignment = equi-join on note_id + containment
  predicate (per-note row counts are tiny, AQE handles skew);
- qualification = grouped EXISTS (left semi join) per direction;
- pseudo suppression = left anti join on span overlap.

All five pipes are configs of this one class.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, Window, functions as F

from ..core.base import Transformer
from .matcher import PhraseMatcher
from .. import registry


class QualifierEngine(Transformer):
    name = "eds.qualifier"

    def __init__(self, qualifier: str,
                 cues: dict[str, Iterable[str]],
                 attr: str = "NORM",
                 within_ents: bool = False):
        """cues: {'preceding': [...], 'following': [...], 'pseudo': [...],
        'termination': [...], 'verbs': [...]} — classes as enumerated at
        negation.py:327-332; any subset may be provided.

        within_ents (negation.py:346-354): when False (the reference's
        default), a cue whose span lies inside a qualified entity does
        not count as evidence for that entity — relationally, the cue
        join adds a non-containment predicate.
        """
        self.qualifier = qualifier
        self.cues = {k: list(v) for k, v in cues.items() if v}
        self.attr = attr
        self.within_ents = within_ents
        self._cue_matcher = PhraseMatcher(
            {cls: terms for cls, terms in self.cues.items()},
            attr=attr, span_type="cue",
        )

    # -- relational pieces -------------------------------------------------

    def _cue_table(self, notes: DataFrame) -> DataFrame:
        cues = self._cue_matcher.entities(notes).select(
            "note_id", "tok_start", "tok_end", F.col("label").alias("cue_class")
        )
        pseudo = cues.filter(F.col("cue_class") == "pseudo")
        real = cues.filter(F.col("cue_class") != "pseudo")
        if "pseudo" in self.cues:
            # Suppress real cues overlapped by a pseudo span (anti overlap
            # join — negation.py:307 semantics).
            p = pseudo.select(
                F.col("note_id").alias("p_note"),
                F.col("tok_start").alias("p_s"), F.col("tok_end").alias("p_e"),
            )
            real = real.join(
                p,
                (real["note_id"] == p["p_note"])
                & (real["tok_start"] < p["p_e"]) & (p["p_s"] < real["tok_end"]),
                "left_anti",
            )
        return real

    def _boundaries(self, notes: DataFrame, cues: DataFrame) -> DataFrame:
        """(note_id, b_start, b_end, boundary_id) token-index intervals."""
        sent_cuts = notes.select(
            "note_id", F.explode("sentences").alias("s")
        ).select("note_id", F.col("s.tok_start").alias("cut"))
        term_cuts = cues.filter(F.col("cue_class") == "termination").select(
            "note_id", F.col("tok_end").alias("cut")
        )
        ntoks = notes.select("note_id", F.size("tokens").alias("cut"))
        cuts = sent_cuts.unionByName(term_cuts).unionByName(ntoks).distinct()
        w = Window.partitionBy("note_id").orderBy("cut")
        return (
            cuts.withColumn("b_end", F.lead("cut").over(w))
            .filter(F.col("b_end").isNotNull())
            .select(
                "note_id", F.col("cut").alias("b_start"), "b_end",
                F.row_number().over(w).alias("boundary_id"),
            )
        )

    def _assign_boundary(self, df: DataFrame, bounds: DataFrame,
                         pos_col: str) -> DataFrame:
        b = bounds.select(
            F.col("note_id").alias("b_note"), "b_start", "b_end", "boundary_id"
        )
        return df.join(
            b,
            (df["note_id"] == b["b_note"])
            & (df[pos_col] >= b["b_start"]) & (df[pos_col] < b["b_end"]),
            "left",
        ).drop("b_note", "b_start", "b_end")

    # -- public API --------------------------------------------------------

    def qualify(self, notes: DataFrame, entities: DataFrame) -> DataFrame:
        """entities (flat plane, with tok_start/tok_end) + boolean column
        named after the qualifier.

        Plan shape matters at scale: each derived table (cues, boundaries)
        is referenced more than once downstream, so we persist them —
        otherwise the lazy subtree (tokenize -> scan -> window) is
        re-planned and re-executed per reference, which blows up both
        optimizer time and runtime (observed 100x on 500 docs).  The
        qualification itself is ONE left join on (note_id, boundary_id)
        followed by a grouped max — no semi-join + join-back double pass.
        Duplicate entity rows (identical on all columns) collapse.
        """
        cues = self._cue_table(notes).persist()
        bounds = self._boundaries(notes, cues).persist()
        ents_b = self._assign_boundary(entities, bounds, "tok_start")
        active = cues.filter(F.col("cue_class") != "termination")
        cues_b = self._assign_boundary(active, bounds, "tok_start").select(
            F.col("note_id").alias("c_note"), F.col("boundary_id").alias("c_bid"),
            F.col("tok_start").alias("c_s"), F.col("tok_end").alias("c_e"),
            "cue_class",
        )
        preceding_classes = [c for c in ("preceding", "verbs") if c in self.cues]
        joined = ents_b.join(
            cues_b,
            (F.col("note_id") == F.col("c_note"))
            & (F.col("boundary_id") == F.col("c_bid")),
            "left",
        )
        hit = (
            (F.col("cue_class").isin(preceding_classes)
             & (F.col("c_e") <= F.col("tok_start")))
            | ((F.col("cue_class") == "following")
               & (F.col("c_s") >= F.col("tok_end")))
        )
        if self.within_ents:
            # negation.py:346-354: a cue contained in the entity span
            # itself qualifies it (multi-word entities embedding a cue).
            hit = hit | (
                (F.col("c_s") >= F.col("tok_start"))
                & (F.col("c_e") <= F.col("tok_end"))
                & (F.col("cue_class") != "termination")
            )
        return joined.groupBy(*entities.columns).agg(
            F.coalesce(F.max(F.when(hit, True)), F.lit(False)).alias(self.qualifier)
        )

    def transform(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError(
            "QualifierEngine operates on (notes, entities); use .qualify()"
        )


# ---- French default cue configs ---------------------------------------
# Curated subsets of the reference's pattern lists (negation/patterns.py,
# family/patterns.py, hypothesis/patterns.py, history/patterns.py,
# reported_speech/patterns.py).  Matched on NORM (lower, accent-folded).

NEGATION_CUES = {
    "preceding": ["pas de", "pas d'", "aucun", "aucune", "sans", "absence de",
                  "negatif pour", "ni", "jamais de", "n'a pas de",
                  "ne presente pas de", "n'est pas", "non"],
    # multi-word negation verb phrases (the reference's "ne ... pas"
    # preceding_regex, negation/patterns.py:104; single-verb forms are
    # added from the full conjugation table by default_cues())
    "verbs": ["ne presente pas", "ne montre pas", "ne retrouve pas",
              "n'objective pas", "ne met pas en evidence"],
    "following": ["negatif", "negative", "exclu", "exclue", "ecarte", "ecartee"],
    "pseudo": ["pas exclu", "non exclu", "sans doute", "sans difficulte",
               "pas necessairement"],
    "termination": ["mais", "cependant", "toutefois", "neanmoins", "hormis"],
}

FAMILY_CUES = {
    "preceding": ["antecedents familiaux", "dans la famille", "chez le pere",
                  "chez la mere", "chez son pere", "chez sa mere", "familial",
                  "familiale", "sa mere", "son pere", "sa soeur", "son frere",
                  "grand-mere", "grand-pere", "tante", "oncle"],
    "termination": ["chez le patient", "chez la patiente",
                    "pour sa part", "quant a lui", "quant a elle"],
}

HYPOTHESIS_CUES = {
    "preceding": ["pourrait etre", "peut etre un", "possible", "probable",
                  "suspicion de", "doute sur", "evoquant", "evocateur de",
                  "hypothese de", "suspecte", "eventuel", "eventuelle",
                  "si le patient"],
    "following": ["possible", "probable", "a confirmer", "non confirme",
                  "suspecte", "suspectee"],
    "pseudo": ["pas possible", "impossible"],
    "termination": ["mais", "cependant", "confirme que"],
}

HISTORY_CUES = {
    "preceding": ["antecedents", "antecedent", "atcd", "histoire de",
                  "il y a", "ancien", "ancienne", "en 19", "en 20",
                  "autrefois", "auparavant", "a l'age de"],
    "termination": ["actuellement", "aujourd'hui", "ce jour",
                    "a l'admission", "examen clinique"],
}

REPORTED_SPEECH_CUES = {
    "preceding": ["le patient dit", "le patient rapporte", "la patiente dit",
                  "la patiente rapporte", "selon le patient",
                  "selon la patiente", "d'apres le patient", "se plaint de",
                  "decrit", "signale", "rapporte", "affirme", "declare"],
    "termination": ["a l'examen", "objectivement"],
}

_DEFAULTS = {
    "negation": NEGATION_CUES,
    "family": FAMILY_CUES,
    "hypothesis": HYPOTHESIS_CUES,
    "history": HISTORY_CUES,
    "reported_speech": REPORTED_SPEECH_CUES,
}

_DEFAULTS_EXPANDED: dict = {}


def default_cues(qualifier: str) -> dict:
    """Static cue lists + the reference's full verb-conjugation
    expansion (built lazily: reads resources/verbs.parquet once).

    Parity for the conjugation filters:
    * negation (negation.py:247-272): preceding verbs = Indicatif
      Présent ∪ Participe Présent ∪ Participe Passé ∪ Infinitif
      Présent of the 8 negation lemmas; following += Participe Passé.
    * hypothesis (hypothesis.py:230-263): preceding verbs = ALL
      conjugations of the 9 verbs_hyp lemmas ∪ Conditionnel of the 693
      verbs_eds lemmas; following += Participe Passé of verbs_hyp.
    * reported_speech (reported_speech.py:202-228): verbs = Indicatif
      Présent 3s/3p ∪ Participe Présent ∪ Participe Passé of its 41
      lemmas.
    """
    if qualifier in _DEFAULTS_EXPANDED:
        return _DEFAULTS_EXPANDED[qualifier]
    from ..resources import conjugated_terms, qualifier_verb_lemmas
    cues = {k: list(v) for k, v in _DEFAULTS[qualifier].items()}
    if qualifier == "negation":
        lem = qualifier_verb_lemmas("negation")
        cues["verbs"] = sorted(set(cues.get("verbs", [])) | set(
            conjugated_terms(lem, lambda d:
                ((d["mode"] == "Indicatif") & (d["tense"] == "Présent"))
                | d["tense"].isin(["Participe Présent", "Participe Passé",
                                   "Infinitif Présent"]))))
        cues["following"] = sorted(set(cues.get("following", [])) | set(
            conjugated_terms(lem, lambda d: d["tense"] == "Participe Passé")))
    elif qualifier == "hypothesis":
        hyp = qualifier_verb_lemmas("hypothesis_hyp")
        eds = qualifier_verb_lemmas("hypothesis_eds")
        cues["verbs"] = sorted(
            set(conjugated_terms(hyp))
            | set(conjugated_terms(eds, lambda d: d["mode"] == "Conditionnel")))
        cues["following"] = sorted(set(cues.get("following", [])) | set(
            conjugated_terms(hyp, lambda d: d["tense"] == "Participe Passé")))
    elif qualifier == "reported_speech":
        lem = qualifier_verb_lemmas("reported_speech")
        cues["verbs"] = sorted(set(cues.get("verbs", [])) | set(
            conjugated_terms(lem, lambda d:
                ((d["mode"] == "Indicatif") & (d["tense"] == "Présent")
                 & d["person"].isin(["3s", "3p"]))
                | d["tense"].isin(["Participe Présent", "Participe Passé"]))))
    _DEFAULTS_EXPANDED[qualifier] = cues
    return cues


def make_qualifier(qualifier: str, cues: dict | None = None, **kw) -> QualifierEngine:
    return QualifierEngine(qualifier, cues or default_cues(qualifier), **kw)


for _q in _DEFAULTS:
    registry.register(f"eds.{_q}")(
        lambda qualifier=_q, **kw: make_qualifier(qualifier, **kw)
    )
