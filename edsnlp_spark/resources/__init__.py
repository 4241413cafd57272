"""Terminology resource data, converted from the reference's shipped
dictionaries (edsnlp/resources/*.csv.gz|json*) into parquet by
``scripts/build_resources.py``:

* ``drugs.parquet``  — 5 789  (kb_id=ATC, term, key, n) rows
  (reference edsnlp/pipes/ner/drugs/factory.py:22 resources/drugs.json)
* ``cim10.parquet``  — 169 208 (kb_id=ICD-10, term, key, n) rows
  (reference edsnlp/pipes/ner/cim10/factory.py:22, patterns.py:10-33
  short/long/code-variant expansion)
* ``adicap.parquet`` — 7 623 (dim, code, label) decode rows
  (reference edsnlp/utils/resources.py:get_adicap_dict)
* ``verbs.parquet``  — 36 465 (verb, mode, tense, person, term)
  conjugations (reference edsnlp/utils/resources.py:get_verbs)

``key`` is the engine's PhraseMatcher n-gram key — the space-joined,
tokenizer-split, NORM-folded surface form — precomputed at build time so
the DuckDB oracles can reproduce matching without reimplementing the
tokenizer in SQL; ``n`` is its token count.
"""

from __future__ import annotations

import os

RESOURCE_DIR = os.path.dirname(os.path.abspath(__file__))


def resource_path(name: str) -> str:
    """Absolute path of a bundled resource parquet (name without ext)."""
    p = os.path.join(RESOURCE_DIR, f"{name}.parquet")
    if not os.path.exists(p):
        raise FileNotFoundError(
            f"resource {name!r} not built — run scripts/build_resources.py")
    return p


def load_resource(spark, name: str):
    """Read a bundled resource as a DataFrame.

    Local-file read: fine in local mode and on a cluster whenever the
    repo is shipped to executors (the tables are ≤2 MB); for a real
    deployment the same parquet goes to shared storage and only this
    path changes.
    """
    return spark.read.parquet(resource_path(name))


# -- driver-side conjugation lookups (qualifier cue construction) --------
# Cue term lists live on the driver (they become the PhraseMatcher's
# broadcast terms table), so these read the parquet with pyarrow, not
# Spark.  Cached: the verbs table is read once per process.

_VERBS_PD = None
_QUAL_LEMMAS = None


def _verbs_pd():
    global _VERBS_PD
    if _VERBS_PD is None:
        import pyarrow.parquet as pq
        _VERBS_PD = pq.read_table(resource_path("verbs")).to_pandas()
    return _VERBS_PD


def qualifier_verb_lemmas(set_name: str) -> list:
    """Reference lemma selection for a qualifier ('negation',
    'hypothesis_hyp', 'hypothesis_eds', 'reported_speech')."""
    global _QUAL_LEMMAS
    if _QUAL_LEMMAS is None:
        import pyarrow.parquet as pq
        df = pq.read_table(resource_path("qualifier_verbs")).to_pandas()
        _QUAL_LEMMAS = {
            k: sorted(g["lemma"]) for k, g in df.groupby("set")}
    return _QUAL_LEMMAS[set_name]


def conjugated_terms(lemmas, predicate=None) -> list:
    """Unique conjugated surface forms of ``lemmas``; ``predicate`` is a
    pandas-mask function over columns (verb, mode, tense, person) —
    mirrors the reference's get_verbs + .loc filters
    (edsnlp/utils/resources.py:11, negation.py:247-272)."""
    df = _verbs_pd()
    df = df[df["verb"].isin(set(lemmas))]
    if predicate is not None:
        df = df[predicate(df)]
    return sorted(df["term"].unique())
