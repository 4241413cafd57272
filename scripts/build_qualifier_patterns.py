"""Snapshot the reference's FULL qualifier cue pattern lists into
edsnlp_spark/resources/qualifier_patterns.json.

Sources (pure-data modules, loaded standalone via importlib so nothing
of the reference package executes):

* edsnlp/pipes/qualifiers/negation/patterns.py   (pseudo / preceding /
  preceding_regex / following / verbs)
* edsnlp/pipes/qualifiers/hypothesis/patterns.py (pseudo / preceding /
  following / verbs_hyp / verbs_eds)
* edsnlp/pipes/qualifiers/family/patterns.py     (family)
* edsnlp/pipes/qualifiers/history/patterns.py    (history / sections_history)
* edsnlp/pipes/qualifiers/reported_speech/patterns.py
  (preceding / following / verbs / quotation regex)
* edsnlp/pipes/terminations.py                   (default termination set,
  used by negation / hypothesis / family per their __init__ wiring)

Verb LEMMA lists are stored as *_lemmas; the engine expands them through
resources/verbs.parquet at cue-build time (the same per-pipe mode/tense
filters as negation.py:247-272, hypothesis.py:230-263,
reported_speech.py:202-228).
"""

from __future__ import annotations

import importlib.util
import json
import os

REF = "/root/reference/edsnlp/pipes"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "edsnlp_spark", "resources", "qualifier_patterns.json",
)


def load(path: str):
    spec = importlib.util.spec_from_file_location("pat", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    neg = load(f"{REF}/qualifiers/negation/patterns.py")
    hyp = load(f"{REF}/qualifiers/hypothesis/patterns.py")
    fam = load(f"{REF}/qualifiers/family/patterns.py")
    his = load(f"{REF}/qualifiers/history/patterns.py")
    rsp = load(f"{REF}/qualifiers/reported_speech/patterns.py")
    term = load(f"{REF.rsplit('/', 1)[0]}/pipes/terminations.py")

    data = {
        "termination_default": sorted(set(term.termination)),
        "negation": {
            "pseudo": sorted(set(neg.pseudo)),
            "preceding": sorted(set(neg.preceding)),
            "preceding_regex": list(neg.preceding_regex),
            "following": sorted(set(neg.following)),
            "verb_lemmas": sorted(set(neg.verbs)),
        },
        "hypothesis": {
            "pseudo": sorted(set(hyp.pseudo)),
            "preceding": sorted(set(hyp.preceding)),
            "following": sorted(set(hyp.following)),
            "verbs_hyp_lemmas": sorted(set(hyp.verbs_hyp)),
            "verbs_eds_lemmas": sorted(set(hyp.verbs_eds)),
        },
        "family": {"family": sorted(set(fam.family))},
        "history": {
            "history": sorted(set(his.history)),
            "sections_history": sorted(set(his.sections_history)),
        },
        "reported_speech": {
            "preceding": sorted(set(rsp.preceding)),
            "following": sorted(set(rsp.following)),
            "verb_lemmas": sorted(set(rsp.verbs)),
            "quotation": rsp.quotation,
        },
    }
    with open(OUT, "w", encoding="utf-8") as f:
        json.dump(data, f, ensure_ascii=False, indent=1, sort_keys=True)
    sizes = {
        k: {c: (len(v) if isinstance(v, list) else 1) for c, v in d.items()}
        for k, d in data.items() if isinstance(d, dict)
    }
    print(json.dumps(sizes, indent=1))
    print("terminations:", len(data["termination_default"]))


if __name__ == "__main__":
    main()
