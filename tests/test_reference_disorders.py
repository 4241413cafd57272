"""Full-breadth disorder pipes vs the reference's own golden sets
(tests/pipelines/ner/disorders/*.py): doc-level has_match +
detailed_status + behavior negation flags."""

from __future__ import annotations

from pyspark.sql import functions as F

from edsnlp_spark.core.base import Pipeline
from edsnlp_spark.operators.disorders import (
    ReferenceDisorderMatcher, detailed_status)
from edsnlp_spark.operators.sentences import SentenceSegmenter
from edsnlp_spark.operators.tokenizer import Tokenizer


def prep(spark, texts):
    return Pipeline([Tokenizer(), SentenceSegmenter()])(
        spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                              "note_id long, note_text string")).persist()


def doc_status(m, notes):
    return {r["note_id"]: r["mx"] for r in
            m.entities(notes).groupBy("note_id")
             .agg(F.max("status").alias("mx")).collect()}


def test_diabetes_reference_golden(spark):
    texts = [
        "Présence d'un DT2", "Présence d'un DNID", "Patient diabétique",
        "Un diabète insipide",
        "Atteinte neurologique d'origine diabétique",
        "Une rétinopathie diabétique",
        "Il y a un mal perforant plantaire",
        "Le patient a un diabète non insulino-dépendant",
        "Il est diabétique sans insulino dépendance",
    ]
    expected = ["WITHOUT_COMPLICATION", "WITHOUT_COMPLICATION",
                "WITHOUT_COMPLICATION", None, "WITH_COMPLICATION",
                "WITH_COMPLICATION", "WITH_COMPLICATION",
                "WITHOUT_COMPLICATION", "WITHOUT_COMPLICATION"]
    st = doc_status(ReferenceDisorderMatcher("diabetes"), prep(spark, texts))
    got = [{1: "WITHOUT_COMPLICATION", 2: "WITH_COMPLICATION"}.get(
        st.get(i)) for i in range(len(texts))]
    assert got == expected
    # assign values match the reference strings (expand alignment)
    m = ReferenceDisorderMatcher("diabetes")
    rows = m.entities(prep(spark, texts)).filter(
        F.map_contains_key("assigned", "insulin")).collect()
    assert sorted(r["assigned"]["insulin"] for r in rows) == \
        ["non insulino-dépendant", "sans insulino dépendance"]


def test_solid_tumor_reference_golden(spark):
    texts = [
        "Présence d'un carcinome intra-hépatique.", "Patient avec un K sein.",
        "Il y a une tumeur bénigne", "Tumeur métastasée",
        "Cancer du poumon au stade 4", "Cancer du poumon au stade 2",
        "Présence de nombreuses lésions secondaires",
        "Patient avec fracture abcddd secondaire. Cancer de",
        "Patient avec lesions non ciblées", "TNM: pTx N1 M1",
    ]
    expected = ["LOCALIZED", "LOCALIZED", None, "METASTASIS", "METASTASIS",
                "LOCALIZED", "METASTASIS", "METASTASIS", "METASTASIS",
                "METASTASIS"]
    m = ReferenceDisorderMatcher(
        "solid_tumor", use_patterns_metastasis_ct_scan=True, use_tnm=True)
    st = doc_status(m, prep(spark, texts))
    got = [{1: "LOCALIZED", 2: "METASTASIS"}.get(st.get(i))
           for i in range(len(texts))]
    assert got == expected


def test_copd_reference_golden(spark):
    texts = [
        "Une fibrose interstitielle diffuse idiopathique",
        "Patient atteint de pneumoconiose",
        "Présence d'une HTAP.",
        "On voit une hypertension pulmonaire minime",
        "La patiente a été mis sous oxygénorequérance",
        "La patiente est sous oxygénorequérance au long cours",
    ]
    expected = [True, True, True, False, False, True]
    st = doc_status(ReferenceDisorderMatcher("copd"), prep(spark, texts))
    assert [i in st for i in range(len(texts))] == expected


def test_ckd_reference_golden(spark):
    texts = [
        "Patient atteint d'une glomérulopathie.",
        "Patient atteint d'une tubulopathie aigüe.",
        "Patient transplanté rénal",
        "Présence d'une insuffisance rénale aigüe sur chronique",
        "Le patient a été dialysé",
        "Le patient est dialysé chaque lundi",
        "Présence d'une IRC",
        "Présence d'une IRC sévère",
        "Présence d'une IRC de classe IV",
        "Présence d'une IRC avec DFG à 30",
        "Présence d'une maladie rénale avec DFG à 110",
    ]
    expected = [True, False, True, False, False, True, False, True,
                True, True, False]
    st = doc_status(ReferenceDisorderMatcher("ckd"), prep(spark, texts))
    # the reference gate is `len(ents) >= has_match` (test_all.py:97) —
    # required-presence only; extra spans (e.g. acute_on_chronic on
    # text 3) are allowed there too
    for i, exp in enumerate(expected):
        if exp:
            assert i in st, f"text {i} should match"
    # the exclusion-driven absences ARE strict in the patterns
    assert 1 not in st      # tubulopathie aigüe (exclude 'aigu')
    assert 4 not in st      # 'a été dialysé' without chronicity assign
    assert 6 not in st      # bare IRC without stage/status/dfg


def test_tobacco_reference_golden(spark):
    # reference tests/pipelines/ner/behaviors/tobacco.py minus the
    # 'ne fume aucun truc' case (that flag comes from the separate
    # eds.negation pipe, not the tobacco matcher)
    texts = [
        "Tabagisme évalué à 15 PA", "Patient tabagique",
        "Tabagisme festif", "On a un tabagisme ancien",
        "Tabac: 0", "Tabagisme passif",
        "Tabac: sevré depuis 5 ans", "Le patient fume 0 PA.",
    ]
    exp_match = [True, True, False, True, True, True, True, True]
    exp_status = [None, None, None, "ABSTINENCE", None, None,
                  "ABSTINENCE", None]
    exp_neg = [False, False, None, False, True, True, False, True]
    m = ReferenceDisorderMatcher("tobacco")
    notes = prep(spark, texts)
    rows = m.entities(notes).groupBy("note_id").agg(
        F.max("status").alias("mx"),
        F.max(F.col("negated").cast("int")).alias("neg")).collect()
    st = {r["note_id"]: r for r in rows}
    assert [i in st for i in range(len(texts))] == exp_match
    got_status = [
        ("ABSTINENCE" if st[i]["mx"] == 2 else None) if i in st else None
        for i in range(len(texts))]
    assert got_status == exp_status
    got_neg = [bool(st[i]["neg"]) if i in st else None
               for i in range(len(texts))]
    assert got_neg == [v if v is not None else None for v in exp_neg][
        :len(got_neg)] or True  # placeholder replaced below
    for i, v in enumerate(exp_neg):
        if v is None:
            continue
        assert got_neg[i] == v, (i, got_neg[i], v)


# ---- remaining 13 reference golden sets, generic runner ----------------
# (tests/pipelines/ner/disorders/*.py; the reference gate is
# `len(ents) >= has_match` + detailed_status of the first span +
# negation flags where the pipe itself sets them)

REFERENCE_GOLDENS = {'aids': {'assign': None,
          'detailled_status': [None, None, None, None],
          'has_match': [True, False, True, True],
          'texts': ['Patient atteint du VIH au stade SIDA.',
                    'Patient atteint du VIH.',
                    'Il y a un VIH avec coinfection pneumocystose',
                    "Présence d'un VIH stade C"]},
 'alcohol': {'assign': None,
             'detailled_status': [None,
                                  None,
                                  None,
                                  None,
                                  'ABSTINENCE',
                                  None,
                                  None,
                                  'ABSTINENCE',
                                  None],
             'has_match': [True,
                           True,
                           False,
                           False,
                           True,
                           True,
                           True,
                           True,
                           True],
             'negation': [None,
                          None,
                          None,
                          None,
                          None,
                          None,
                          True,
                          None,
                          True],
             'texts': ['Patient alcoolique.',
                       'OH chronique.',
                       "Prise d'alcool occasionnelle",
                       "Application d'un pansement alcoolisé",
                       'Alcoolisme sevré',
                       'Alcoolisme non sevré',
                       'Alcool: 0',
                       'Le patient est en cours de sevrage éthylotabagique',
                       'Patient alcoolique: non.']},
 'cerebrovascular_accident': {'assign': None,
                              'detailled_status': None,
                              'has_match': [False,
                                            True,
                                            True,
                                            False,
                                            True,
                                            True,
                                            True],
                              'texts': ['Patient hospitalisé à AVC.',
                                        'Hospitalisation pour un AVC.',
                                        'Saignement intracranien',
                                        'Thrombose périphérique',
                                        'Thrombose sylvienne',
                                        'Infarctus cérébral',
                                        'Soigné via un thrombolyse']},
 'congestive_heart_failure': {'assign': None,
                              'detailled_status': None,
                              'has_match': [True, True, False, True, False],
                              'texts': ["Présence d'un oedème pulmonaire",
                                        "Le patient est équipé d'un "
                                        'pace-maker',
                                        'Un cardiopathie non décompensée',
                                        'Insuffisance cardiaque',
                                        'Insuffisance cardiaque minime']},
 'connective_tissue_disease': {'assign': None,
                               'detailled_status': None,
                               'has_match': [True, True, False, True, True],
                               'texts': ["Présence d'une sclérodermie.",
                                         "Patient atteint d'un lupus.",
                                         "Présence d'anticoagulants "
                                         'lupiques,',
                                         'Il y a une MICI.',
                                         'Syndrome de Raynaud']},
 'dementia': {'assign': None,
              'detailled_status': None,
              'has_match': [True, True, False, True],
              'texts': ["D'importants déficits cognitifs",
                        'Patient atteint de démence',
                        'On retrouve des anti-SLA',
                        'Une maladie de Charcot']},
 'hemiplegia': {'assign': None,
                'detailled_status': None,
                'has_match': [True, True, True],
                'texts': ['Patient hémiplégique',
                          'Paralysie des membres inférieurs',
                          'Patient en LIS']},
 'leukemia': {'assign': None,
              'detailled_status': None,
              'has_match': [True, False, True, True],
              'texts': ['Sydrome myéloprolifératif',
                        'Sydrome myéloprolifératif bénin',
                        "Patient atteint d'une LAM",
                        'Une maladie de Vaquez']},
 'liver_disease': {'assign': None,
                   'detailled_status': ['MILD',
                                        'MILD',
                                        'MODERATE_TO_SEVERE',
                                        'MODERATE_TO_SEVERE'],
                   'has_match': [True, True, True, True],
                   'texts': ['Il y a une fibrose hépatique',
                             'Une hépatite B chronique',
                             'Le patient consulte pour une cirrhose',
                             'Greffe hépatique.']},
 'lymphoma': {'assign': None,
              'detailled_status': None,
              'has_match': [True, True, True, False],
              'texts': ['Un lymphome de Hodgkin.',
                        "Atteint d'un Waldenstörm",
                        'Un LAGC',
                        'anti LAGC: 10^4/mL']},
 'myocardial_infarction': {'assign': None,
                           'detailled_status': None,
                           'has_match': [True, False, True, False, True],
                           'texts': ['Une cardiopathie ischémique',
                                     'Une cardiopathie non-ischémique',
                                     "Présence d'un stent sur la marginale",
                                     "Présence d'un stent périphérique",
                                     'infarctus du myocarde']},
 'peptic_ulcer_disease': {'assign': None,
                          'detailled_status': None,
                          'has_match': [True, True, False, True],
                          'texts': ["Beaucoup d'ulcères gastriques",
                                    "Présence d'UGD",
                                    'La patient à des ulcères',
                                    'Au niveau gastrique: blabla blabla '
                                    'blabla blabla blabla quelques '
                                    'ulcères']},
 'peripheral_vascular_disease': {'assign': None,
                                 'detailled_status': None,
                                 'has_match': [True,
                                               True,
                                               False,
                                               True,
                                               False,
                                               False,
                                               True,
                                               False,
                                               True,
                                               True,
                                               False,
                                               True,
                                               False],
                                 'texts': ['Un AOMI',
                                           "Présence d'un infarctus rénal",
                                           'Une angiopathie cérébrale',
                                           'Une angiopathie',
                                           'Une thrombose cérébrale',
                                           'Une thrombose des veines '
                                           'superficielles',
                                           'Une thrombose',
                                           'Effectuer un bilan '
                                           'pre-trombose',
                                           'Une ischémie des MI est '
                                           'remarquée.',
                                           "Plusieurs cas d'EP",
                                           "Effectuer des cures d'EP",
                                           'Le patient est hypertendu',
                                           'Une hypertension portale']}}


import pytest


@pytest.mark.parametrize("disorder", sorted(REFERENCE_GOLDENS))
def test_reference_disorder_goldens(spark, disorder):
    g = REFERENCE_GOLDENS[disorder]
    texts = g["texts"]
    notes = prep(spark, texts)
    m = ReferenceDisorderMatcher(disorder)
    cols = [F.max("status").alias("mx")]
    has_neg = disorder in ("alcohol", "tobacco")
    if has_neg:
        cols.append(F.max(F.col("negated").cast("int")).alias("neg"))
    rows = m.entities(notes).groupBy("note_id").agg(*cols).collect()
    st = {r["note_id"]: r for r in rows}
    det = g["detailled_status"]
    det = det if isinstance(det, list) else [det] * len(texts)
    for i, must in enumerate(g["has_match"]):
        if must:
            assert i in st, f"{disorder} text {i} should match"
            exp = det[i]
            if exp is not None:
                got = detailed_status(
                    disorder,
                    F.lit(st[i]["mx"]))  # mapping is static; resolve below
                mapping = {1: None, 2: None}
                from edsnlp_spark.operators.disorders import (
                    DETAILED_STATUS_MAPPINGS)
                mapping = DETAILED_STATUS_MAPPINGS.get(disorder, {1: None})
                assert mapping.get(st[i]["mx"]) == exp, \
                    f"{disorder} text {i}: status {st[i]['mx']} != {exp}"
    if has_neg and g.get("negation"):
        for i, v in enumerate(g["negation"]):
            if v is not None and i in st:
                assert bool(st[i]["neg"]) == v, f"{disorder} neg text {i}"


def test_contextual_matcher_regex_schema(spark):
    """eds.contextual_matcher accepts the reference's native regex
    source-dict schema (contextual_matcher.py:20-460) via the registry
    and runs the full windowed exclude/assign engine."""
    from edsnlp_spark import registry
    m = registry.create("eds.contextual_matcher", label="cancer", patterns=[
        dict(source="solide",
             regex=[r"cancer", r"tumeur"],
             exclude=dict(regex=["benin", "benigne"], window=[-3, 5]),
             assign=[dict(name="stage", regex=r"stade (\d)", window=7)],
             regex_attr="NORM"),
    ])
    notes = prep(spark, [
        "Cancer du poumon au stade 3",
        "Tumeur bénigne du sein",
        "On observe une tumeur.",
    ])
    rows = {r["note_id"]: r for r in m.entities(notes).collect()}
    assert set(rows) == {0, 2}
    # patterns mode follows the reference span-list semantics: default
    # reduce_mode=None keeps a LIST of values
    assert rows[0]["assigned"]["stage"] == ["3"]
    assert rows[2]["assigned"] == {}


def test_contextual_matcher_include_rule(spark):
    """SingleIncludeModel: a required cue must appear in the window or
    the anchor is dropped."""
    from edsnlp_spark import registry
    m = registry.create("eds.contextual_matcher", label="chute", patterns=[
        dict(source="s1", regex=[r"chute"],
             include=dict(regex=["mecanique"], window=[-4, 4])),
    ])
    notes = prep(spark, [
        "chute mecanique de sa hauteur",
        "chute dans les escaliers",
    ])
    got = {r["note_id"] for r in m.entities(notes).collect()}
    assert got == {0}


def test_suicide_attempt_reference_golden(spark):
    """Reference modality golden set (tests/pipelines/ner/
    test_suicide_attempt.py): span label = modality; guarded TS
    acronym rejects 'surface TS'; idea-only defenestration rejected."""
    from edsnlp_spark import registry
    m = registry.create("eds.suicide_attempt")
    cases = [
        ("J'ai vu le patient à cause d'une TS médicamenteuse.",
         "suicide_attempt_unspecific"),
        ("J'ai vu le patient à cause d'une IMV.",
         "intentional_drug_overdose"),
        ("surface TS", None),
        ("Patiente hospitalisée à cause d'une Tentative d'autolyse.",
         "autolysis"),
        ("Le patient exprime des idées de défenestration", None),
        ("vu aux urgences suite à une défenestration volontaire",
         "jumping_from_height"),
        ("amené par les pompiers à cause d'une phlebotomie", "cuts"),
        ("Antécédents :\n- pendaison (2010)", "strangling"),
        ("plusieurs événements d'autodestruction",
         "self_destructive_behavior"),
        ("suspicion d'ingestion de caustique avec des idées suicidaires",
         "burn_gas_caustic"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(cases)],
        "note_id long, note_text string")
    got = {}
    for r in m.entities(df).collect():
        got.setdefault(r["note_id"], set()).add(r["label"])
    for i, (txt, exp) in enumerate(cases):
        if exp is None:
            assert i not in got, (txt, got.get(i))
        else:
            assert exp in got.get(i, set()), (txt, got.get(i))
