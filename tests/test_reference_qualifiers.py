"""The reference's OWN qualifier test examples, run through the Spark
qualifier engine with the full snapshotted pattern sets.

Sources (inline-markup examples, parsed like utils/examples.py):
* tests/pipelines/qualifiers/test_negation.py:10-36   (22 entities)
* tests/pipelines/qualifiers/test_family.py:9-28      (9 entities)
* tests/pipelines/qualifiers/test_hypothesis.py:9-20  (6 entities)
* tests/pipelines/qualifiers/test_reported_speech.py:9-43 (6 entities)

Each example marks entities with ``<ent key=value>span</ent>``; the
expected qualifier value derives from the modifier (NEG/AFF, FAMILY/
PATIENT, HYP/CERT, REPORTED plus bare booleans).
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

import edsnlp_spark as es
from edsnlp_spark.operators.tokenizer import Tokenizer, Normalizer
from edsnlp_spark.operators.sentences import SentenceSegmenter
from edsnlp_spark.operators.qualifiers import make_qualifier


def parse_example(example: str):
    """(text, [(start_char, end_char, modifiers)]).

    Like the reference's utils/examples.py: the entity regex requires a
    closing ``</ent>``, so the one unclosed ``<ent>maladie écartée`` in
    the negation list yields NO entity there either (its assertion loop
    is vacuous) — we drop the tag but keep the text."""
    text, ents, open_ent = "", [], None
    i = 0
    while i < len(example):
        m = re.match(r"<ent([^>]*)>", example[i:])
        if m:
            mods = dict(re.findall(r"(\w+)=(\S+)", m.group(1)))
            open_ent = (len(text), mods)
            i += m.end()
            continue
        if example.startswith("</ent>", i):
            s, mods = open_ent
            ents.append((s, len(text), mods))
            open_ent = None
            i += 6
            continue
        text += example[i]
        i += 1
    return text, ents


TRUTHY = {"NEG", "FAMILY", "HYP", "REPORTED", "true", "True"}
FALSY = {"AFF", "PATIENT", "CERT", "DIRECT", "false", "False"}


def expected_value(mods: dict) -> bool:
    for v in mods.values():
        if v in TRUTHY:
            return True
        if v in FALSY:
            return False
    raise AssertionError(f"unmapped modifiers {mods}")


def run_qualifier(spark, qualifier: str, examples: list[str]):
    """Parse all examples into one notes plane + one entities plane,
    qualify once, return {(note_id, start_char): value}."""
    parsed = [parse_example(e) for e in examples]
    notes = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(parsed)],
        "note_id long, note_text string")
    ndf = es.Pipeline([Tokenizer(), Normalizer(), SentenceSegmenter()])(
        notes).persist()
    ent_rows = [
        (i, s, e)
        for i, (_, ents) in enumerate(parsed)
        for (s, e, _) in ents
    ]
    edf = spark.createDataFrame(
        ent_rows, "note_id long, start_char int, end_char int")
    toks = ndf.select("note_id", F.col("tokens").alias("__toks"))
    sc, ec = F.col("start_char"), F.col("end_char")
    aligned = edf.join(toks, "note_id").select(
        "note_id", "start_char", "end_char",
        F.size(F.filter("__toks", lambda t: t["end"] <= sc))
        .cast("int").alias("tok_start"),
        F.size(F.filter("__toks", lambda t: t["start"] < ec))
        .cast("int").alias("tok_end"),
    )
    out = make_qualifier(qualifier).qualify(ndf, aligned).collect()
    got = {(r["note_id"], r["start_char"]): r[qualifier] for r in out}
    want = {
        (i, s): expected_value(mods)
        for i, (_, ents) in enumerate(parsed)
        for (s, _, mods) in ents
    }
    assert set(got) == set(want)
    mism = {
        k: (got[k], want[k], parsed[k[0]][0])
        for k in want if got[k] is not want[k]
    }
    assert not mism, f"{len(mism)} mismatches: {mism}"


NEGATION_EXAMPLES = [
    "<ent polarity_=NEG>métas,tases</ent> : non",
    (
        "Pas de <ent negated=true>lésion pulmonaire avec "
        "l'absence de lésion secondaire</ent>."
    ),
    "Cancer non <ent negation=true>métastasé</ent>.",
    "Absence d'<ent negated=true>image osseuse d'allure évolutive</ent>.",
    "il n'y a pas de <ent polarity_=NEG>métas,tases</ent>",
    "Le patient n'est pas <ent polarity_=NEG>malade</ent>.",
    "Aucun <ent polarity_=NEG>traitement</ent>.",
    "Le <ent polarity_=AFF>scan</ent> révèle une grosseur.",
    "il y a des <ent polarity_=AFF>métastases</ent>",
    "aucun doute sur les <ent polarity_=AFF>métastases</ent>",
    "il n'y a pas de <ent polarity_=NEG>métastases</ent>",
    "il n'y a pas d' <ent polarity_=NEG>métastases</ent>",
    "il n'y a pas d'<ent polarity_=NEG>métastases</ent>",
    "il n'y a pas d'amélioration de la <ent negated=false>maladie</ent>",
    "<ent negated=true>maladie écartée",
    "Le patient ne <ent negated=true>fume</ent> pas.",
    "Le patient ne <ent negated=true>fume vraiment vraiment</ent> pas.",
    "Le patient ne <ent negated=false>fume</ent> que des cigares.",
    "Le résultat exclut un <ent negated=true>SMD</ent>",
    "Le résultat ne permet pas d'exclure un <ent negated=false>SMD</ent>",
    "Situation aggravée par une <ent negated=false>neutropénie fébrile</ent>."
    "Patient est traité d'une cure d'<ent negated=false>ALECTINIB</ent> "
    "depuis le ...",
]

FAMILY_EXAMPLES = [
    (
        "Le père est <ent family=True>asthmatique</ent>, "
        "sans traitement traitement particulier."
    ),
    "Son père est atteint de la <ent family=True>COVID</ent>",
    "Son père a une infection au <ent family=True>COVID</ent>",
    "Son père a une possible infection au <ent family=True>COVID</ent>",
    (
        "Le père du patient a eu un <ent family_=FAMILY>cancer du colon</ent>. "
        "La mère se porte bien."
    ),
    "Antécédents familiaux : <ent family_=FAMILY>diabète</ent>.",
    "Un <ent family_=PATIENT>relevé</ent> sanguin a été effectué.",
    (
        "Antécédent familiaux de diabète mais pas "
        "<ent family_=PATIENT>détecté</ent> jusqu'ici."
    ),
    "mère : <ent family=True>diabète de type II</ent>",
]

HYPOTHESIS_EXAMPLES = [
    "Possible <ent hypothesis_=HYP>covid-19</ent>",
    (
        "Plusieurs <ent hypothesis_=HYP>diagnostics</ent> sont envisagés. "
        "Le patient est informé."
    ),
    "même si <ent hypothesis=False>le patient est jeune</ent>.",
    "Suspicion de <ent hypothesis_=HYP>diabète</ent>.",
    "Le ligament est <ent hypothesis_=CERT>rompu</ent>.",
    "Probablement du diabète mais pas de <ent hypothesis_=CERT>cécité</ent>.",
]

RSPEECH_EXAMPLES = [
    (
        "Elles sont décrites par X.x. comme des appels à l'aide "
        "« La <ent reported_speech_=REPORTED>pendaison</ent> "
        "a permis mon hospitalisation »."
    ),
    (
        "Rapporte une tristesse de l'humeur avec des idées "
        "<ent reported_speech_=REPORTED>suicidiares</ent> à "
        "type de pendaison,"
    ),
    (
        "Décrit un fléchissement thymique depuis environ "
        "1 semaine avec idées suicidaires scénarisées "
        "(<ent reported_speech_=REPORTED>intoxication "
        "médicamenteuse volontaire)</ent>"
    ),
    (
        "Dit ne pas savoir comment elle est tombé. "
        'Minimise la chute. Dit que "ça arrive. Badaboum". '
        "Dit ne pas avoir fait <ent reported_speech_=REPORTED>IMV</ent>."
    ),
    (
        "Le patient parle \"d'en finir\", et dit qu'il a pensé "
        "plusieurs fois à se pendre où à se faire une "
        "<ent reported_speech_=REPORTED>phlébotomie</ent> "
        "lorsqu'il était dans la rue, diminution de ces "
        "idées noires depuis qu'il vit chez son fils"
    ),
    "le patient est admis pour coronavirus. il dit qu'il n'est "
    "pas <ent reported_speech=True>malade</ent>.\n"
    "les tests sont positifs.\n"
    "il est <ent reported_speech=False>malade</ent>",
]


def test_reference_negation_suite(spark):
    run_qualifier(spark, "negation", NEGATION_EXAMPLES)


def test_reference_family_suite(spark):
    run_qualifier(spark, "family", FAMILY_EXAMPLES)


def test_reference_hypothesis_suite(spark):
    run_qualifier(spark, "hypothesis", HYPOTHESIS_EXAMPLES)


def test_reference_reported_speech_suite(spark):
    run_qualifier(spark, "reported_speech", RSPEECH_EXAMPLES)
