"""One-time conversion of the reference's terminology resource data into
repo-local parquet under ``edsnlp_spark/resources/``.

The reference ships real dictionaries (edsnlp/resources/*.csv.gz|json*);
the data IS the semantics of eds.cim10 / eds.drugs / eds.adicap and the
verb-conjugation breadth of the qualifiers, so we load it — but into our
own storage layout:

* ``drugs.parquet``   — (kb_id, term, key, n): ATC code -> surface form,
  plus the engine's precomputed PhraseMatcher n-gram ``key`` (normalized
  space-joined tokens) and its token count ``n``.  Precomputing the key
  at build time lets DuckDB oracles reproduce matching exactly without
  reimplementing the tokenizer in SQL.
* ``cim10.parquet``   — same shape for ICD-10 labels + code variants
  (reference pipes/ner/cim10/patterns.py:10-33 expansion: short, long,
  code, A00.0 / A 000 / A 00.0 forms).
* ``adicap.parquet``  — flattened (dim, code, label) decode table plus
  per-dimension labels as code='' rows
  (reference utils/resources.py:get_adicap_dict nested dict).
* ``verbs.parquet``   — (verb, mode, tense, person, term) conjugation
  table (reference utils/resources.py:get_verbs).

Run from the repo root:  python scripts/build_resources.py
"""

from __future__ import annotations

import csv
import gzip
import json
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from edsnlp_spark.functions.text import py_norm_text  # noqa: E402
from edsnlp_spark.operators.matcher import _tokenize_term  # noqa: E402

REF = "/root/reference/edsnlp/resources"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "edsnlp_spark", "resources",
)


def term_key(term: str) -> tuple[str, int]:
    toks = _tokenize_term(py_norm_text(term))
    return " ".join(toks), len(toks)


def write_concepts(name: str, concepts: dict[str, list[str]]) -> None:
    kb_ids, terms, keys, ns = [], [], [], []
    seen = set()
    for kb_id, forms in concepts.items():
        for form in forms:
            if not isinstance(form, str) or not form.strip():
                continue
            key, n = term_key(form)
            if not key or (kb_id, key) in seen:
                continue
            seen.add((kb_id, key))
            kb_ids.append(kb_id)
            terms.append(form)
            keys.append(key)
            ns.append(n)
    table = pa.table({
        "kb_id": pa.array(kb_ids, pa.string()),
        "term": pa.array(terms, pa.string()),
        "key": pa.array(keys, pa.string()),
        "n": pa.array(ns, pa.int32()),
    })
    pq.write_table(table, os.path.join(OUT, f"{name}.parquet"),
                   compression="zstd")
    print(f"{name}.parquet: {table.num_rows} rows")


def build_drugs() -> None:
    with open(os.path.join(REF, "drugs.json")) as f:
        write_concepts("drugs", json.load(f))


def build_cim10() -> None:
    # Reference expansion (cim10/patterns.py:10-33): each code matches on
    # its short label, long label, and 4 code spellings.
    concepts: dict[str, list[str]] = {}
    with gzip.open(os.path.join(REF, "cim10.csv.gz"), "rt") as f:
        for r in csv.DictReader(f):
            code = r["code"]
            concepts[code] = [
                r["short"], r["long"], code,
                code[:2] + "." + code[2:],
                code[0] + " " + code[1:],
                code[0] + " " + code[1] + "." + code[2:],
            ]
    write_concepts("cim10", concepts)


def build_adicap() -> None:
    with gzip.open(os.path.join(REF, "adicap.json.gz"), "rt") as f:
        d = json.load(f)
    dims, codes, labels = [], [], []
    for dim, entry in d.items():
        dims.append(dim)
        codes.append("")
        labels.append(entry["label"])
        for code, label in entry["codes"].items():
            dims.append(dim)
            codes.append(code)
            labels.append(label)
    table = pa.table({
        "dim": pa.array(dims, pa.string()),
        "code": pa.array(codes, pa.string()),
        "label": pa.array(labels, pa.string()),
    })
    pq.write_table(table, os.path.join(OUT, "adicap.parquet"),
                   compression="zstd")
    print(f"adicap.parquet: {table.num_rows} rows")


def build_verbs() -> None:
    cols: dict[str, list[str]] = {
        "verb": [], "mode": [], "tense": [], "person": [], "term": []}
    with gzip.open(os.path.join(REF, "verbs.csv.gz"), "rt") as f:
        for r in csv.DictReader(f):
            for c in cols:
                cols[c].append(r[c] or "")
    table = pa.table({c: pa.array(v, pa.string()) for c, v in cols.items()})
    pq.write_table(table, os.path.join(OUT, "verbs.parquet"),
                   compression="zstd")
    print(f"verbs.parquet: {table.num_rows} rows")


def build_qualifier_verbs() -> None:
    """Per-qualifier verb-lemma selections from the reference's pattern
    files (pattern DATA, not code: the lemma lists are the semantics of
    which verbs imply negation / hypothesis / reported speech).

    * negation/patterns.py:148  ``verbs``
    * hypothesis/patterns.py:108 ``verbs_hyp``, :120 ``verbs_eds``
    * reported_speech/patterns.py:3 ``verbs``
    """
    import re as _re
    qual_dir = "/root/reference/edsnlp/pipes/qualifiers"
    sets = {}
    for fname, var, key in [
        ("negation/patterns.py", "verbs", "negation"),
        ("hypothesis/patterns.py", "verbs_hyp", "hypothesis_hyp"),
        ("hypothesis/patterns.py", "verbs_eds", "hypothesis_eds"),
        ("reported_speech/patterns.py", "verbs", "reported_speech"),
    ]:
        src = open(os.path.join(qual_dir, fname)).read()
        m = _re.search(var + r"(?::\s*List\[str\])?\s*=\s*\[(.*?)\]", src, _re.S)
        sets[key] = sorted(set(_re.findall(r'"([^"]+)"', m.group(1))))
    ks, ls = [], []
    for key, lemmas in sets.items():
        for lemma in lemmas:
            ks.append(key)
            ls.append(lemma)
    table = pa.table({"set": pa.array(ks, pa.string()),
                      "lemma": pa.array(ls, pa.string())})
    pq.write_table(table, os.path.join(OUT, "qualifier_verbs.parquet"),
                   compression="zstd")
    print(f"qualifier_verbs.parquet: {table.num_rows} rows "
          f"({ {k: len(v) for k, v in sets.items()} })")


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    build_drugs()
    build_cim10()
    build_adicap()
    build_verbs()
    build_qualifier_verbs()
