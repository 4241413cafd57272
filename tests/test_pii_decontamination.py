"""PII scrubbing + benchmark decontamination (training-data pipeline
operators; no reference analog — see operators/pii.py docstring)."""

from pyspark.sql import functions as F

from edsnlp_spark.operators.pii import PIIScrubber


def test_pii_entities_exact_offsets(spark):
    df = spark.createDataFrame(
        [(1, "mail: a.b@x.org tel: 06 12 34 56 78"),
         (2, "nir 184117799887742 compte FR7600000000000000000001234 ok"),
         (3, "rien ici")],
        "note_id long, note_text string")
    rows = {(r.note_id, r.label, r.lexical_variant, r.start_char)
            for r in PIIScrubber().entities(df).collect()}
    assert (1, "email", "a.b@x.org", 6) in rows
    assert (1, "phone", "06 12 34 56 78", 21) in rows
    assert (2, "nir", "184117799887742", 4) in rows
    assert (2, "iban", "FR7600000000000000000001234", 27) in rows
    assert not any(nid == 3 for nid, *_ in rows)
    # offsets index the source text exactly
    texts = {1: "mail: a.b@x.org tel: 06 12 34 56 78",
             2: "nir 184117799887742 compte FR7600000000000000000001234 ok"}
    for nid, _, var, start in rows:
        assert texts[nid][start:start + len(var)] == var


def test_pii_redaction_replaces_all_classes(spark):
    df = spark.createDataFrame(
        [(1, "a.b@x.org et 06 12 34 56 78 et 184117799887742")],
        "note_id long, note_text string")
    out = PIIScrubber().transform(df).collect()[0]
    assert out.note_text_redacted == "[EMAIL] et [PHONE] et [NIR]"


def test_pii_redaction_is_native(spark):
    # the scrub must stay a pure JVM projection — no Python stage
    df = spark.createDataFrame([(1, "x")], "note_id long, note_text string")
    plan = PIIScrubber().transform(df)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "Python" not in plan and "Arrow" not in plan


def test_decontamination_flags_canary_docs(spark, sf_dir):
    from edsnlp_spark.queries.textops import decontamination_overlap
    out = decontamination_overlap(spark, sf_dir)
    rows = {r.doc_id: (r.n_hits, r.contaminated) for r in out.collect()}
    # eval docs excluded from the output
    assert not any(d % 97 == 0 for d in rows)
    # every canary-injected corpus doc is flagged, nothing else is
    for d, (n, flag) in rows.items():
        if d % 31 == 5:
            assert flag and n >= 3  # the pure-canary shingles at least
        else:
            assert not flag and n == 0
