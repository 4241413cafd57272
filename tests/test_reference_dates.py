"""The reference's OWN eds.dates test examples (tests/pipelines/misc/
test_dates.py:14-72), run through temporal_mentions.

Each example marks date/duration mentions with ``<ent norm='...' ...>``;
we assert the exact span set per note and the reference norm() string
(models.py AbsoluteDate/Relative/Duration norms, incl. '????'
placeholders for missing components and 'HHhMMm' time tails).
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from edsnlp_spark.operators.dates import temporal_mentions


def parse_example(example: str):
    text, ents = "", []
    i = 0
    open_ent = None
    while i < len(example):
        m = re.match(r"<ent([^>]*)>", example[i:])
        if m:
            mods = {}
            for am in re.finditer(r"(\w+)=(?:'([^']*)'|(\S+))", m.group(1)):
                mods[am.group(1)] = am.group(2) if am.group(2) is not None \
                    else am.group(3)
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


# The reference suite verbatim (test_dates.py:14-72).
EXAMPLES = [
    (
        "Le patient est venu en <ent norm='2019-??-??' year=2019>2019</ent> pour une "
        "consultation"
    ),
    "Le patient est venu <ent norm='-1 day' direction=past day=1>hier</ent>",
    "le <ent norm='2021-09-04' day=4 month=9 year=2021>04/09/2021</ent>",
    (
        "Il est cas contact <ent norm='-7 days' direction=past week=1>"
        "depuis la semaine dernière</ent>"
    ),
    "le <ent norm='????-08-09' day=9 month=8>09/08</ent>",
    "Le patient est venu le <ent norm='????-08-04' day=4 month=8>4 août</ent>",
    (
        "Le patient est venu le <ent norm='????-08-04 11h13m' day=4 month=8 "
        "hour=11 minute=13>4 août à 11h13</ent>"
    ),
    "Il est venu le <ent norm='????-09-01' day=1 month=9>1er Septembre</ent> pour",
    (
        "Il est venu en <ent norm='2020-10-??' month=10 year=2020>octobre 2020</ent> "
        "pour..."
    ),
    (
        "Il est venu <ent norm='-90 days' direction=past month=3>il y a "
        "trois mois</ent> pour..."
    ),
    (
        "Il lui était arrivé la même chose <ent norm='-365 days' "
        "direction=past year=1>il y a un an</ent>."
    ),
    (
        "Il est venu le <ent norm='2001-09-20' day=20 month=9 "
        "year=2001>20/09/2001</ent> pour..."
    ),
    (
        "Consultation du <ent norm='2019-07-03' bound=from "
        "day=3 month=7 year=2019>03 07 19</ent>"
    ),
    "En <ent norm='2017-11-??' month=11 year=2017>11/2017</ent> stabilité sur...",
    "<ent norm='-90 days' direction=past month=3>depuis 3 mois</ent>",
    "- <ent norm='2004-12-??' month=12 year=2004>Décembre 2004</ent> :",
    "- <ent norm='2005-06-??' month=6 year=2005>Juin 2005</ent>:  ",
    "<ent norm='2017-09-??' month=9 year=2017>sept 2017</ent> :",
    (
        "<ent norm='-365 days' direction=past year=1>il y a 1 an</ent> "
        "<ent norm='during 30 days' mode=duration month=1>pdt 1 mois</ent>"
    ),
    (
        "Prélevé le : <ent norm='2016-04-22' day=22 month=4 year=2016>22/04/2016</ent> "
        "\n78 rue du Général Leclerc"
    ),
    "Le <ent norm='????-01-07' day=7 month=1>07/01</ent>.",
    "Il est venu en <ent norm='????-08-??' month=8>août</ent>.",
    "Il est venu <ent norm='~0 day' day=0 direction=current>ce jour</ent>.",
    "CS le <ent norm='2017-01-11' day=11 month=1 year=2017>11-01-2017</ent> 1/3",
    "Vu le <ent norm='2017-01-11' day=11 month=1 year=2017>11 janvier\n2017</ent> .",
]


def test_reference_dates_suite(spark):
    parsed = [parse_example(e) for e in EXAMPLES]
    notes = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(parsed)],
        "note_id long, note_text string")
    out = temporal_mentions(notes).collect()
    got = {}
    for r in out:
        got.setdefault(r["note_id"], {})[(r["start_char"], r["end_char"])] = r
    failures = []
    for i, (text, ents) in enumerate(parsed):
        want_spans = {(s, e): mods for (s, e, mods) in ents}
        have = got.get(i, {})
        if set(have) != set(want_spans):
            failures.append(
                f"[{i}] {text!r}: spans {sorted(have)} != "
                f"{sorted(want_spans)}")
            continue
        for (s, e), mods in want_spans.items():
            r = have[(s, e)]
            if r["norm"] != mods["norm"]:
                failures.append(
                    f"[{i}] {text!r} span {text[s:e]!r}: norm "
                    f"{r['norm']!r} != {mods['norm']!r}")
            if mods.get("direction") and mods["direction"] != "current" \
                    and r["direction"] != mods["direction"]:
                failures.append(
                    f"[{i}] {text[s:e]!r}: direction {r['direction']!r}"
                    f" != {mods['direction']!r}")
            if mods.get("bound") and r["bound"] != mods["bound"]:
                failures.append(
                    f"[{i}] {text[s:e]!r}: bound {r['bound']!r} != "
                    f"{mods['bound']!r}")
    assert not failures, "\n".join(failures)


def test_dates_bound_relative_to_duration(spark):
    """Reference test_dates.py:301-317: 'depuis hier' parses as a past
    relative with a from-bound and a -1 day offset."""
    df = spark.createDataFrame(
        [(1, "Mal au bras depuis hier.")], "note_id long, note_text string")
    rows = temporal_mentions(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["kind"] == "relative"
    assert r["direction"] == "past"
    assert r["bound"] == "from"
    assert r["offset_seconds"] == -86400
    assert r["norm"] == "-1 day"
