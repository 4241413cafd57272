"""Disorder/behavior NER pipes: config-not-code (SURVEY.md §2.6).

Parity target: edsnlp/pipes/ner/disorders/base.py:14 (DisorderMatcher) —
each of the 16 disorder pipes is a ContextualMatcher parameterization:
anchor patterns plus a ``status`` span attribute (1 = present, 2 =
aggravated/specific form, e.g. metastasis for solid_tumor), detection-
only semantics with qualification left to the §2.7 qualifiers.

Two tiers: the curated ``DisorderMatcher`` (lightweight phrase subset)
and ``ReferenceDisorderMatcher`` (the FULL reference pattern bundles
from resources/disorder_patterns.json — 18 pipes, 62 sources, 429
anchor regexes — with windowed excludes/assigns and each pipe's
process() keep/status rules).
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

# ``full=True`` loads the complete reference pattern bundle
# (ReferenceDisorderMatcher below); default stays the lightweight
# curated matcher.
for _name, (_pats, _s2) in DISORDER_CONFIGS.items():
    registry.register(f"eds.{_name}")(
        lambda name=_name, pats=_pats, s2=_s2, full=False, **kw:
        (ReferenceDisorderMatcher(name, **kw) if full
         else DisorderMatcher(name, pats, s2, **kw))
    )


# FULL reference modality patterns (pipes/ner/suicide_attempt/
# patterns.py, verbatim; two mechanical adaptations: leading (?i)
# scoped for OR-joining, one variable-width lookbehind split into
# two fixed-width ones).
SUICIDE_ATTEMPT_PATTERNS: dict[str, list[str]] = {
    'suicide_attempt_unspecific': [
        '\\b(?<!\\.)(?<!Voie\\s\\d\\s\\:\\s)(?<!Voie\\sd.abord\\s\\:\\s)(?<!surface\\s)(?<!d[ée]sorientation\\s)(?<!abord\\s)(?<!ECG\\s:\\s)(?<!volume\\s)(?<!\\d\\s[mc]m\\sde\\sla\\s)(?<!\\d[mc]m\\sde\\sla\\s)(?<!au\\scontact\\sde\\sla\\s)T\\.?S\\.?(?![\\.A-Za-z])(?!\\sapyr[eé]tique)(?!.+TRANSSEPTAL)(?!.+T[34])(?!.+en\\sr.gression)\\b',
        '(?<!\\.)T\\.S\\.(?![A-Za-z])',
        '\\b(?<!.)TS\\.\\B',
        '(?i:tentative[s]?\\s+de\\s+sui?cide)',
        '(?i:tent[ée]\\s+de\\s+((se\\s+(suicider|tuer))|(mettre\\s+fin\\s+[àa]\\s+((ses\\s+jours?)|(sa\\s+vie)))))',
    ],
    'autolysis': [
        "(?i:tentative\\s+d'autolyse)",
        '(?i:autolyse)',
    ],
    'intentional_drug_overdose': [
        '(?i:(intoxication|ingestion)\\s+m[ée]dicamenteuse\\s+volontaire)',
        '(?i:\\b(i\\.?m\\.?v\\.?)\\b)',
        '(?i:(intoxication|ingestion)\\s*([a-zA-Z0-9_éàèôê\\-]+\\s*){0,3}\\s*volontaire)',
        'TS\\s+med\\s+polymedicamenteuse',
        'TS\\s+(poly)?([\\s-])?m[ée]dicamenteuse',
    ],
    'jumping_from_height': [
        '(?i:tentative[s]?\\s+de\\s+d[ée]fenestration)',
        '(?i:(?<!id[ée]e\\sde\\s)(?<!id[ée]es\\sde\\s)d[ée]fenestration(?!\\saccidentelle))',
        '(?i:d[ée]fenestration\\s+volontaire)',
        '(?i:d[ée]fenestration\\s+intentionnelle)',
        '(?i:jet.r?\\sd.un\\spont)',
    ],
    'cuts': [
        '(?i:phl[ée]botomie)',
    ],
    'strangling': [
        '(?i:pendaison)',
    ],
    'self_destructive_behavior': [
        '(?i:autodestruction)',
    ],
    'burn_gas_caustic': [
        '(?i:ing[eé]stion\\sde\\s(produit\\s)?caustique)',
    ],
}


@registry.register("eds.suicide_attempt")
def _make_suicide_attempt(full: bool = True, **kw):
    """Modality-labeled suicide-attempt matcher: the label IS the
    modality (suicide_attempt.py:129-147 sets
    span._.suicide_attempt_modality = span.label_). full=False keeps
    the lightweight phrase subset."""
    if full:
        from .matcher import RegexMatcher
        return RegexMatcher(SUICIDE_ATTEMPT_PATTERNS, attr="TEXT", **kw)
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


# ---------------------------------------------------------------------------
# Full reference pattern bundles (resources/disorder_patterns.json,
# snapshotted verbatim from pipes/ner/disorders/*/patterns.py and
# behaviors/{alcohol,tobacco}/patterns.py by
# scripts/build_disorder_patterns.py).
# ---------------------------------------------------------------------------

import json as _json
import os as _os


def load_reference_patterns() -> dict:
    path = _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), "resources", "disorder_patterns.json")
    with open(path) as f:
        return _json.load(f)


def _win(w):
    """Reference int-window semantics (span_getters.py ContextWindow.
    validate): w<0 -> (w, 0) tokens before, w>0 -> (0, w) after; pairs
    pass through; None -> whole sentence (the limit_to_sentence default,
    models.py:27-43, clamps every window to the anchor's sentence)."""
    if w is None:
        return (None, None)
    if isinstance(w, int):
        return (w, 0) if w < 0 else (0, w)
    return (int(w[0]), int(w[1]))


def _name_eq_factory(e):
    """Closure factory (CLAUDE.md HOF-lambda gotcha): binds the outer
    struct so the inner single-arg lambda stays single-arg."""
    return lambda x: x["as_name"] == e["as_name"]


def _in_hits_factory():
    """forall predicate: the required include label is among the hits
    (closure factory per HOF gotcha)."""
    return lambda lbl: F.array_contains(F.col("__inc_hit"), lbl)


def _key_missing_factory():
    """map_filter predicate: keep entries whose key is NOT already in
    the grouped ``assigned`` map (closure factory per HOF gotcha)."""
    return lambda k, v: ~F.map_contains_key(F.col("assigned"), k)


class ReferenceDisorderMatcher:
    """One of the reference's 18 disorder/behavior pipes at FULL pattern
    breadth: regex anchors per source, exclude anti-joins and assign
    extractions in token windows clamped to the anchor's sentence
    (contextual_matcher.py:200-311 + models.py:27-43), then the
    per-disorder keep/status rules of each ``<name>.py process()``.

    Distributed shape: two regex scans (anchors, cues) -> token-anchor
    join vs the tokens plane -> windowed cue joins -> grouped exclude
    count + assigned map -> native status rules.

    Scale bound: the token-anchor join duplicates each note's tokens
    array once per anchor/cue row before the F.filter count, so cost is
    O(spans_per_note x tokens_per_note) — clinical notes keep both
    small; for long documents chunk with SplitDocs first (same guidance
    as tokenize()).  All joins are note_id equi-joins; the cue metadata
    table is broadcast.  Documented deviations:
    the opportunist/stopped negation re-check (aids.py:155,
    alcohol.py:119) is approximated by assign presence, and diabetes'
    whole-sentence far-complication sweep (diabetes.py:114-139) is
    covered only within the ±3/12-token assign windows.
    """

    def __init__(self, name: str, attr: str = "NORM",
                 use_patterns_metastasis_ct_scan: bool = False,
                 use_tnm: bool = False,
                 patterns: list[dict] | None = None,
                 include_assigned: bool = False):
        """``patterns`` overrides the named bundle with user-supplied
        source-dicts in the reference's ContextualMatcher schema
        ({source, regex, exclude: {regex, window}, assign: [{name,
        regex, window, reduce_mode, replace_entity, required}],
        regex_attr}) — this is the general regex contextual-matcher
        surface; the 18 disorder names are presets.  In patterns mode
        the output follows the reference ContextualMatcher span-list
        semantics exactly (replace_entity / include_assigned /
        keep_first / keep_last / multi-value assigns,
        contextual_matcher.py:260-400); presets keep the disorder
        status-rule pipeline."""
        from .matcher import RegexMatcher
        self.name = name
        self._contextual_mode = patterns is not None
        self.include_assigned = include_assigned
        # per (source, assign name): rule order, reduce, replace, required
        self.assign_opts: dict[tuple[str, str], tuple] = {}
        if patterns is not None:
            pats = list(patterns)
        else:
            data = load_reference_patterns()
            pats = list(data[name])
            if name == "solid_tumor" and use_patterns_metastasis_ct_scan:
                pats += data["solid_tumor_metastasis_ct_scan"]
        self.use_tnm = use_tnm and name == "solid_tumor"
        anchor_pats: dict[str, list[str]] = {}
        cue_pats: dict[str, list[str]] = {}
        self.snippet_assigns: list[tuple[str, str, str, tuple]] = []
        # source -> labels of include rules that must ALL match
        # (SingleIncludeModel: a required cue in the window)
        self.include_rules: dict[str, list[str]] = {}
        self.cue_meta: list[tuple[str, str, str, str | None,
                                  tuple[int | None, int | None]]] = []
        ex_pats: dict[str, list[str]] = {}
        anchor_pats_text: dict[str, list[str]] = {}
        for p in pats:
            src = p["source"]
            rx = p["regex"]
            rxl = [rx] if isinstance(rx, str) else list(rx)
            # per-source regex_attr: acronym sources match case-sensitive
            # TEXT (e.g. \bLAGC\b); default/None -> NORM (base.py attr)
            if p.get("regex_attr") == "TEXT":
                anchor_pats_text[src] = rxl
            else:
                anchor_pats[src] = rxl
            ex = p.get("exclude") or []
            for i, e in enumerate(ex if isinstance(ex, list) else [ex]):
                lbl = f"{src}~ex~{i}"
                r = e["regex"]
                ex_pats[lbl] = [r] if isinstance(r, str) else list(r)
                self.cue_meta.append(
                    (lbl, "exclude", src, None, _win(e.get("window"))))
            inc = p.get("include") or []
            for i, e in enumerate(inc if isinstance(inc, list) else [inc]):
                lbl = f"{src}~in~{i}"
                r = e["regex"]
                ex_pats[lbl] = [r] if isinstance(r, str) else list(r)
                self.cue_meta.append(
                    (lbl, "include", src, None, _win(e.get("window"))))
                self.include_rules.setdefault(src, []).append(lbl)
            asg = p.get("assign") or []
            for rule_idx, a in enumerate(asg if isinstance(asg, list)
                                         else [asg]):
                r = a["regex"]
                rl = [r] if isinstance(r, str) else list(r)
                self.assign_opts[(src, a["name"])] = (
                    rule_idx, a.get("reduce_mode"),
                    bool(a.get("replace_entity")), bool(a.get("required")))
                if any("^" in x.replace("[^", "").replace("\\^", "")
                       for x in rl):
                    # snippet-relative pattern (zero_after's `^` means
                    # the WINDOW start, i.e. the anchor): evaluated
                    # inline on the anchor row, not via the cue scan
                    self.snippet_assigns.append(
                        (src, a["name"], rl[0], _win(a.get("window"))))
                    continue
                lbl = f"{src}~as~{a['name']}"
                cue_pats[lbl] = rl
                self.cue_meta.append(
                    (lbl, "assign", src, a["name"], _win(a.get("window"))))
        self._anchor_m = (RegexMatcher(anchor_pats, attr=attr,
                                       span_type=name)
                          if anchor_pats else None)
        self._anchor_m_text = (RegexMatcher(anchor_pats_text, attr="TEXT",
                                            span_type=name)
                               if anchor_pats_text else None)
        # assign values are the FIRST CAPTURE GROUP's span when the regex
        # has one (contextual_matcher.py:288-302 create_span on the match
        # group) — excludes use the full match
        self._as_m = (RegexMatcher(cue_pats, attr=attr, span_type="cue",
                                   span_from_group=True)
                      if cue_pats else None)
        self._ex_m = (RegexMatcher(ex_pats, attr=attr, span_type="cue")
                      if ex_pats else None)

    @staticmethod
    def _tok_anchor(ents: DataFrame, notes: DataFrame,
                    expand: bool = True) -> DataFrame:
        """Char anchors -> token anchors + sentence token bounds.

        ``expand`` re-aligns char spans to full token boundaries and
        re-slices the matched text — the reference's
        ``alignment_mode="expand"`` (base.py:55)."""
        plane = notes.select(
            "note_id", F.col("note_text").alias("__txt"),
            F.col("tokens").alias("__toks"),
            F.col("sentences").alias("__sents"))
        sc, ec = F.col("start_char"), F.col("end_char")
        sent = F.element_at(F.filter(
            "__sents", lambda s: (s["start"] <= sc) & (sc < s["end"])), 1)
        out = (
            ents.join(plane, "note_id")
            .withColumn("tok_start", F.size(F.filter(
                "__toks", lambda t: t["start"] < sc)).cast("int"))
            .withColumn("tok_end", F.size(F.filter(
                "__toks", lambda t: t["start"] < ec)).cast("int"))
            .withColumn("sent_lo", F.coalesce(sent["tok_start"], F.lit(0)))
            .withColumn("sent_hi", F.coalesce(
                sent["tok_end"], F.size("__toks").cast("int")))
        )
        if expand:
            xs = F.coalesce(
                F.try_element_at("__toks", F.col("tok_start") + 1)["start"],
                sc)
            xe = F.coalesce(
                F.when(F.col("tok_end") >= 1,
                       F.try_element_at("__toks", F.col("tok_end"))["end"]),
                ec)
            out = (
                out.withColumn("start_char", xs)
                .withColumn("end_char", xe)
                .withColumn("lexical_variant", F.substring(
                    "__txt", F.col("start_char") + 1,
                    F.col("end_char") - F.col("start_char")))
            )
        return out.drop("__txt", "__toks", "__sents")

    def entities(self, notes: DataFrame) -> DataFrame:
        """notes needs (note_id, note_text, tokens, sentences)."""
        spark = notes.sparkSession
        planes = [m.entities(notes) for m in
                  (self._anchor_m, self._anchor_m_text) if m is not None]
        raw_anchors = planes[0]
        for extra in planes[1:]:
            raw_anchors = raw_anchors.unionByName(extra)
        anchors = self._tok_anchor(raw_anchors, notes) \
            .withColumnRenamed("label", "source")
        if self._as_m is None and self._ex_m is None:
            return anchors.select(
                "note_id", "start_char", "end_char", "source",
                "lexical_variant",
                F.lit(self.name).alias("label"), F.lit(1).alias("status"),
                F.expr("cast(map() as map<string,string>)").alias("assigned"),
            )
        meta = spark.createDataFrame(
            [(lbl, kind, src, asname, w[0], w[1])
             for (lbl, kind, src, asname, w) in self.cue_meta],
            "c_label string, kind string, c_source string, as_name string, "
            "w_before int, w_after int")
        cue_planes = [m.entities(notes)
                      for m in (self._as_m, self._ex_m) if m is not None]
        raw_cues = cue_planes[0]
        for extra in cue_planes[1:]:
            raw_cues = raw_cues.unionByName(extra)
        cues = raw_cues.select(
            "note_id",
            F.col("label").alias("c_label"),
            "start_char", "end_char", "lexical_variant",
            "full_start", "full_end",
        ).join(F.broadcast(meta), "c_label")
        c_tok = self._tok_anchor(cues, notes) \
            .select("note_id", "kind", "c_label", "c_source", "as_name",
                    "w_before", "w_after",
                    F.col("lexical_variant").alias("c_text"),
                    F.col("tok_start").alias("c_ts"),
                    F.col("tok_end").alias("c_te"),
                    F.col("start_char").alias("c_sc"),
                    F.col("end_char").alias("c_ec"),
                    F.col("full_start").alias("c_fs"),
                    F.col("full_end").alias("c_fe"))
        a = anchors.alias("a")
        c = c_tok.alias("c")
        # window clamped to the anchor's sentence (limit_to_sentence)
        lo = F.greatest(
            F.coalesce(F.col("a.tok_start") + F.col("c.w_before"),
                       F.lit(-1 << 30)),
            F.col("a.sent_lo"))
        hi = F.least(
            F.coalesce(F.col("a.tok_end") + F.col("c.w_after"),
                       F.lit(1 << 30)),
            F.col("a.sent_hi"))
        inside_anchor = (F.col("c.c_sc") >= F.col("a.start_char")) & \
            (F.col("c.c_ec") <= F.col("a.end_char"))
        j = a.join(
            c,
            (F.col("a.note_id") == F.col("c.note_id"))
            & (F.col("a.source") == F.col("c.c_source"))
            & (F.col("c.c_ts") >= lo) & (F.col("c.c_te") <= hi),
            "left",
        )
        key = ["a.note_id", "a.source", "a.start_char", "a.end_char",
               "a.lexical_variant", "a.tok_start", "a.tok_end"]
        extra_aggs = []
        if self._contextual_mode:
            extra_aggs.append(
                F.array_sort(F.filter(
                    F.collect_list(F.when(
                        F.col("c.kind") == "assign",
                        F.struct(
                            F.col("c.c_sc").alias("g_s"),
                            F.col("c.c_ec").alias("g_e"),
                            F.col("c.c_text").alias("g_text"),
                            F.col("c.c_fs").alias("f_s"),
                            F.col("c.c_fe").alias("f_e"),
                            F.col("c.as_name").alias("name"),
                        ))),
                    lambda s: s.isNotNull())).alias("__asg"))
        grouped = j.groupBy(*[F.col(k) for k in key]).agg(
            *extra_aggs,
            # exclude matches NOT inside the anchor span kill it
            # (SingleExcludeModel doc, models.py:46-55)
            F.sum(F.when((F.col("c.kind") == "exclude")
                         & ~inside_anchor, 1).otherwise(0))
            .alias("__n_ex"),
            F.array_distinct(F.filter(
                F.collect_list(F.when(F.col("c.kind") == "include",
                                      F.col("c.c_label"))),
                lambda v: v.isNotNull())).alias("__inc_hit"),
            # first-by-position value per assign name (reference keeps a
            # list per name; status rules need key presence + a value, so
            # dedupe by name keeping the earliest match)
            F.map_from_entries(F.aggregate(
                F.array_sort(F.filter(
                    F.collect_list(F.when(
                        F.col("c.kind") == "assign",
                        F.struct(F.col("c.as_name"), F.col("c.c_sc"),
                                 F.col("c.c_text")))),
                    lambda s: s.isNotNull(),
                )),
                F.expr("cast(array() as array<struct<"
                       "as_name:string,c_text:string>>)"),
                lambda acc, e: F.when(
                    F.exists(acc, _name_eq_factory(e)), acc
                ).otherwise(F.array_append(acc, F.struct(
                    e["as_name"].alias("as_name"),
                    e["c_text"].alias("c_text")))),
            )).alias("assigned"),
        )
        out = grouped.filter(F.col("__n_ex") == 0).drop("__n_ex")
        if self.include_rules:
            # every include rule of the anchor's source must have fired
            need = F.create_map(*[
                x for src, lbls in self.include_rules.items()
                for x in (F.lit(src),
                          F.array(*[F.lit(v) for v in lbls]))])
            required = need[F.col("source")]
            out = out.filter(
                required.isNull()
                | F.forall(required, _in_hits_factory())
            )
        out = out.drop("__inc_hit")
        if self._contextual_mode:
            return self._contextual_finish(out, notes)
        out = self._add_snippet_assigns(out, notes)
        result = self._apply_rules(out).withColumn(
            "label", F.lit(self.name))
        if self.use_tnm:
            result = result.unionByName(
                self._tnm_entities(notes), allowMissingColumns=True)
        return result

    def _tnm_entities(self, notes: DataFrame) -> DataFrame:
        """solid_tumor use_tnm (solid_tumor.py:122-137): TNM mentions as
        additional solid_tumor spans, metastatic when M=1."""
        from .matcher import RegexMatcher
        rx = (r"(?i:\b(?:([cpyraum]) ?)?T ?([0-4x]|is)(?: ?N ?([0-3x]))?"
              r"(?: ?M ?([01x]))?)")
        t = RegexMatcher({"tnm": [rx]}, attr="TEXT").entities(notes)
        m1 = F.regexp_extract(
            F.lower("lexical_variant"), r"m ?(1)", 1) == "1"
        return t.select(
            "note_id", "start_char", "end_char",
            F.lit("tnm").alias("source"), "lexical_variant",
            F.when(m1, 2).otherwise(1).alias("status"),
            F.expr("cast(map() as map<string,string>)").alias("assigned"),
            F.lit(self.name).alias("label"),
        )

    def _contextual_finish(self, out: DataFrame,
                           notes: DataFrame) -> DataFrame:
        """Reference ContextualMatcher output semantics
        (contextual_matcher.py:260-400), applied per anchor over its
        collected assign matches in an Arrow stage (the algorithm is a
        per-row fold over a handful of matches — exactly the
        'semantics built-ins can't express' case):

        * reduce_mode keep_first/keep_last pick the match closest
          to / farthest from the anchor start; None keeps ALL values;
        * required=True drops the anchor when the assign has no match;
        * replace_entity spawns one entity per kept match of that
          assign (full-match spans), each carrying its own value when
          reduce_mode is None;
        * include_assigned merges the anchor with the kept full-match
          spans (and, under replace_entity, with the CLOSEST
          replacement, the rest staying separate entities).
        """
        import pandas as pd  # noqa: F401

        opts = dict(self.assign_opts)
        include_assigned = self.include_assigned
        label = self.name

        def finish(batches):
            for pdf in batches:
                rows = []
                for _, r in pdf.iterrows():
                    src = r["source"]
                    a_s, a_e = int(r["start_char"]), int(r["end_char"])
                    asg = r["__asg"]
                    asg = [] if asg is None else list(asg)
                    by_name: dict[str, list] = {}
                    for e in asg:
                        by_name.setdefault(e["name"], []).append(e)
                    # required assigns (reference: return [] when a
                    # required assign has no match)
                    if any(req for (s2, nm), (_i, _r, _p, req)
                           in opts.items()
                           if s2 == src and nm not in by_name):
                        continue
                    replace_key, kept = None, {}
                    for nm in sorted(by_name,
                                     key=lambda n: opts.get((src, n),
                                                            (0,))[0]):
                        g = by_name[nm]
                        _, reduce_mode, repl, _req = opts.get(
                            (src, nm), (0, None, False, False))
                        if repl:
                            replace_key = nm
                        if reduce_mode == "keep_first":
                            g = [min(g, key=lambda e:
                                     abs(int(e["g_s"]) - a_s))]
                        elif reduce_mode == "keep_last":
                            g = [max(g, key=lambda e:
                                     abs(int(e["g_s"]) - a_s))]
                        kept[nm] = g
                    if replace_key is not None:
                        kept[replace_key] = sorted(
                            kept[replace_key],
                            key=lambda e: abs(int(e["g_s"]) - a_s))
                    # assigned values render in NORM like the reference
                    # (ext get_text(attr) with the pattern's regex_attr)
                    from ..functions.text import py_norm_text
                    ext = {nm: [py_norm_text(e["g_text"]) for e in g]
                           for nm, g in kept.items()}

                    def emit(s, e, assigned):
                        rows.append((int(r["note_id"]), src, int(s),
                                     int(e), assigned))

                    if replace_key is None:
                        s, e = a_s, a_e
                        if include_assigned and kept:
                            fs = [int(x["f_s"]) for g in kept.values()
                                  for x in g]
                            fe = [int(x["f_e"]) for g in kept.values()
                                  for x in g]
                            s, e = min([s] + fs), max([e] + fe)
                        emit(s, e, ext)
                    else:
                        reps = kept[replace_key]
                        red = opts.get((src, replace_key),
                                       (0, None, False, False))[1]
                        if include_assigned:
                            first, rest = reps[0], reps[1:]
                            others_s = [int(x["f_s"]) for nm, g in
                                        kept.items() if nm != replace_key
                                        for x in g]
                            others_e = [int(x["f_e"]) for nm, g in
                                        kept.items() if nm != replace_key
                                        for x in g]
                            s = min([int(first["f_s"]), a_s] + others_s)
                            e = max([int(first["f_e"]), a_e] + others_e)
                            spans = [(s, e)] + [(int(x["f_s"]),
                                                 int(x["f_e"]))
                                                for x in rest]
                        else:
                            spans = [(int(x["f_s"]), int(x["f_e"]))
                                     for x in reps]
                        for idx, (s, e) in enumerate(spans):
                            assigned = {
                                k: ([v[idx]] if (k == replace_key
                                                 and red is None) else v)
                                for k, v in ext.items()}
                            emit(s, e, assigned)
                yield pd.DataFrame(
                    rows, columns=["note_id", "source", "start_char",
                                   "end_char", "assigned"])

        res = out.mapInPandas(
            finish,
            "note_id long, source string, start_char int, end_char int, "
            "assigned map<string,array<string>>")
        slim = notes.select("note_id", F.col("note_text").alias("__txt"))
        return res.join(slim, "note_id").select(
            "note_id", "start_char", "end_char",
            F.lit(label).alias("label"), "source",
            F.substring(F.col("__txt"), F.col("start_char") + 1,
                        F.col("end_char") - F.col("start_char"))
            .alias("lexical_variant"),
            "assigned", F.lit(1).alias("status"),
        )

    def _add_snippet_assigns(self, out: DataFrame,
                             notes: DataFrame) -> DataFrame:
        """Evaluate snippet-relative assign patterns (regexes whose `^`
        means the window start = the anchor, e.g. the behaviors'
        zero_after) inline: the snippet text is rebuilt from the tokens
        plane per anchor, the pattern's group 1 is the assigned value."""
        if not self.snippet_assigns:
            return out
        from ..functions.text import norm_text
        plane = notes.select(
            "note_id", norm_text(F.col("note_text")).alias("__ntext"),
            F.col("tokens").alias("__toks"))
        j = out.join(plane, "note_id")
        entries = []
        for (src, as_name, rx, (before, after)) in self.snippet_assigns:
            # window start at the anchor (before<=0 shifts don't move the
            # snippet origin in the reference either: snippet text starts
            # at min(anchor, window) and zero_after uses (0, N))
            end_tok = F.least(
                F.col("tok_end") + F.lit(after if after is not None else 0),
                F.size("__toks"))
            snip_end = F.coalesce(
                F.when(end_tok >= 1,
                       F.try_element_at("__toks", end_tok)["end"]),
                F.col("end_char"))
            snippet = F.substring(
                "__ntext", F.col("start_char") + 1,
                F.greatest(snip_end - F.col("start_char"), F.lit(0)))
            val = F.regexp_extract(snippet, rx, 1)
            entries.append(F.when(
                (F.col("source") == src) & (val != ""),
                F.create_map(F.lit(as_name), val)))
        merged = F.col("assigned")
        for e in entries:
            merged = F.map_concat(
                merged,
                F.coalesce(
                    # don't duplicate a key the cue join already set
                    F.map_filter(e, _key_missing_factory()),
                    F.expr("cast(map() as map<string,string>)")))
        return j.withColumn("assigned", merged).drop("__ntext", "__toks")

    def _apply_rules(self, df: DataFrame) -> DataFrame:
        """Per-disorder keep/status rules, ported from each
        ``<name>.py process()`` (file:line cited per rule)."""
        src = F.col("source")
        has = lambda k: F.map_contains_key(F.col("assigned"), k)  # noqa: E731
        n_assigned = F.size(F.map_keys(F.col("assigned")))
        name = self.name
        keep = F.lit(True)
        status = F.lit(1)
        if name == "aids":              # aids.py:141-157
            keep = ~((src == "hiv") & ~(has("opportunist") | has("stage")))
        elif name == "cerebrovascular_accident":  # cva.py:105-114
            keep = ~((src == "with_localization") & ~has("brain_localized")) \
                & ~((src == "ischemia") & ~has("brain"))
        elif name == "ckd":             # ckd.py:117-139
            dfg_ok = F.regexp_replace(
                F.element_at(F.col("assigned"), "dfg"), ",", ".") \
                .try_cast("double") < 60
            keep = ~((src == "dialysis") & ~has("chronic")) \
                & ~((src == "general")
                    & ~(has("stage") | has("status")
                        | F.coalesce(dfg_ok, F.lit(False))))
        elif name == "connective_tissue_disease":  # ctd.py:101-107
            v = F.col("lexical_variant")
            keep = ~((src == "lupus") & (v == F.upper(v)))
        elif name == "copd":            # copd.py:104-109
            keep = ~((src == "oxygen") & (n_assigned == 0))
        elif name == "diabetes":        # diabetes.py:120-137
            complicated = (src == "complicated") | F.exists(
                F.map_keys(F.col("assigned")),
                lambda k: k.startswith("complicated"))
            keep = ~((F.col("lexical_variant") == "db") & (n_assigned == 0))
            status = F.when(complicated, 2).otherwise(1)
        elif name == "liver_disease":   # liver_disease.py:106-111
            status = F.when(src.isin("moderate_severe", "transplant"), 2) \
                .otherwise(1)
        elif name == "myocardial_infarction":  # mi.py:106-112
            keep = ~((src == "with_localization") & ~has("heart_localized"))
        elif name == "peptic_ulcer_disease":   # pud.py:101-106
            keep = ~((src == "generic") & (n_assigned == 0))
        elif name == "peripheral_vascular_disease":  # pvd.py:105-111
            keep = ~((src == "ischemia") & ~has("peripheral"))
        elif name == "solid_tumor":     # solid_tumor.py:139-155
            stage4 = F.regexp_extract(
                F.element_at(F.col("assigned"), "stage"), r"(\d+)", 1) \
                .try_cast("int") == 4
            status = F.when(
                src.isin("metastasis", "metastasis_ct_scan")
                | has("metastasis")
                | F.coalesce(stage4, F.lit(False)), 2).otherwise(1)
        elif name in ("alcohol", "tobacco"):
            # behaviors/*/: 'stopped' -> ABSTINENCE (status 2);
            # 'zero_after'/'secondhand'/PA==0 -> negated mention
            status = F.when(has("stopped"), 2).otherwise(1)
            pa0 = F.regexp_extract(
                F.element_at(F.col("assigned"), "PA"), r"(\d+)", 1) \
                .try_cast("int") == 0
            neg = has("zero_after") | (
                F.lit(name == "tobacco")
                & (has("secondhand")
                   | (has("PA") & ~has("stopped")
                      & F.coalesce(pa0, F.lit(False)))))
            return df.filter(keep).select(
                "note_id", "start_char", "end_char", "source",
                "lexical_variant", status.alias("status"),
                neg.alias("negated"), "assigned")
        return df.filter(keep).select(
            "note_id", "start_char", "end_char", "source",
            "lexical_variant", status.alias("status"), "assigned")


DETAILED_STATUS_MAPPINGS = {
    # base.py:52 default {1: None}; overrides per pipe
    "diabetes": {1: "WITHOUT_COMPLICATION", 2: "WITH_COMPLICATION"},
    "liver_disease": {1: "MILD", 2: "MODERATE_TO_SEVERE"},
    "solid_tumor": {1: "LOCALIZED", 2: "METASTASIS"},
    "alcohol": {1: None, 2: "ABSTINENCE"},
    "tobacco": {1: None, 2: "ABSTINENCE"},
}


def detailed_status(name: str, status: Column) -> Column:
    mapping = DETAILED_STATUS_MAPPINGS.get(name, {1: None})
    out = F.lit(None).cast("string")
    for k, v in mapping.items():
        if v is not None:
            out = F.when(status == k, F.lit(v)).otherwise(out)
    return out
