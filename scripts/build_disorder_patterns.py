"""One-time snapshot of the reference's 16 disorder/behavior pattern
bundles into ``edsnlp_spark/resources/disorder_patterns.json``.

Each reference pipe (edsnlp/pipes/ner/disorders/<name>/patterns.py,
behaviors/{alcohol,tobacco}/patterns.py) ships ``default_patterns`` — a
list of ContextualMatcher source-dicts (regex anchors, exclude windows,
assign extractions).  The pattern data IS the semantics; we serialize it
verbatim (tuples -> lists) and the engine consumes the JSON.

Run from the repo root:  python scripts/build_disorder_patterns.py
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import types

REF = "/root/reference/edsnlp/pipes/ner"

# Pattern files import one helper (get_AVC_care_site) from the reference
# package; shim it so the files load standalone.


def _get_avc_care_site(prefix: bool = True):
    import pandas as pd
    df = pd.read_csv("/root/reference/edsnlp/resources/AVC.csv.gz")
    col = (df.care_site_name.str.split(" ").str[:2].str.join(" ")
           if prefix else df.care_site_name)
    return set(col.to_list())


def _install_shim():
    base = "/root/reference/edsnlp"
    # Stub package hierarchy with __path__ so relative imports inside
    # pattern files (``from ..terms import ...``) resolve WITHOUT
    # executing the reference package __init__ files.
    for name, path in [
        ("edsnlp", base),
        ("edsnlp.pipes", base + "/pipes"),
        ("edsnlp.pipes.ner", base + "/pipes/ner"),
        ("edsnlp.pipes.ner.disorders", base + "/pipes/ner/disorders"),
        ("edsnlp.pipes.ner.behaviors", base + "/pipes/ner/behaviors"),
        ("edsnlp.utils", base + "/utils"),
    ]:
        m = types.ModuleType(name)
        m.__path__ = [path]
        sys.modules[name] = m
    res = types.ModuleType("edsnlp.utils.resources")
    res.get_AVC_care_site = _get_avc_care_site
    sys.modules["edsnlp.utils.resources"] = res


_install_shim()
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "edsnlp_spark", "resources",
    "disorder_patterns.json")

DISORDERS = [
    ("aids", "disorders/aids"),
    ("cerebrovascular_accident", "disorders/cerebrovascular_accident"),
    ("ckd", "disorders/ckd"),
    ("congestive_heart_failure", "disorders/congestive_heart_failure"),
    ("connective_tissue_disease", "disorders/connective_tissue_disease"),
    ("copd", "disorders/copd"),
    ("dementia", "disorders/dementia"),
    ("diabetes", "disorders/diabetes"),
    ("hemiplegia", "disorders/hemiplegia"),
    ("leukemia", "disorders/leukemia"),
    ("liver_disease", "disorders/liver_disease"),
    ("lymphoma", "disorders/lymphoma"),
    ("myocardial_infarction", "disorders/myocardial_infarction"),
    ("peptic_ulcer_disease", "disorders/peptic_ulcer_disease"),
    ("peripheral_vascular_disease", "disorders/peripheral_vascular_disease"),
    ("solid_tumor", "disorders/solid_tumor"),
    ("alcohol", "behaviors/alcohol"),
    ("tobacco", "behaviors/tobacco"),
]


def load_patterns(subpath: str):
    path = os.path.join(REF, subpath, "patterns.py")
    modname = "edsnlp.pipes.ner." + subpath.replace("/", ".") + ".patterns"
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod.default_patterns


# Three reference patterns use variable-width lookbehind / duplicate
# group names that Python `re` rejects (the reference matches with its
# own engine).  Mechanical, semantics-preserving rewrites:
# bounded lookbehind -> conjunction of fixed-width lookbehinds;
# duplicate named group -> renamed second occurrence.
_REGEX_FIXES = {
    r"(?<!pre.?)(gref?fe|transplant).{1,12}(hepatique|foie)":
        r"(?<!pre)(?<!pre.)(gref?fe|transplant).{1,12}(hepatique|foie)",
    r"(?<!(25.{0,10}))\boh\b":
        "".join(r"(?<!25" + "." * i + ")" for i in range(11)) + r"\boh\b",
    (r"(?P<quantity>[\d]{1,3})[^\.,-;\(\)]{0,10}(?:\bp/?a\b|paquets?.?annee)"
     r"|(?:\bp/?a\b|paquets?.?annee)[^\.,-;\(\)]{0,10}(?P<quantity>[\d]{1,3})"):
        (r"(?P<quantity>[\d]{1,3})[^\.,-;\(\)]{0,10}(?:\bp/?a\b|paquets?.?annee)"
         r"|(?:\bp/?a\b|paquets?.?annee)[^\.,-;\(\)]{0,10}(?P<quantity2>[\d]{1,3})"),
}


def jsonable(x):
    if isinstance(x, dict):
        return {k: jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [jsonable(v) for v in x]
    if isinstance(x, str):
        return _REGEX_FIXES.get(x, x)
    return x


def main():
    out = {}
    for name, sub in DISORDERS:
        pats = jsonable(load_patterns(sub))
        out[name] = pats
        n_src = len(pats)
        n_rx = sum(len(p.get("regex", []) if isinstance(p.get("regex"), list)
                       else [p.get("regex")]) for p in pats)
        print(f"{name}: {n_src} sources, {n_rx} anchor regexes")
    # optional pattern bundle toggled by use_patterns_metastasis_ct_scan
    # (solid_tumor.py:101-106)
    modname = "edsnlp.pipes.ner.disorders.solid_tumor.patterns"
    out["solid_tumor_metastasis_ct_scan"] = [
        jsonable(sys.modules[modname].metastasis_ct_scan)]
    with open(OUT, "w") as f:
        json.dump(out, f, ensure_ascii=False, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
