"""Tests: metrics, span getters, endlines."""

from __future__ import annotations

from pyspark.sql import functions as F

from edsnlp_spark.operators.metrics import (
    ner_exact_metrics, ner_overlap_metrics, span_attribute_accuracy,
)
from edsnlp_spark.functions.span_getters import (
    deduplicate_spans, get_spans, set_span_group, union_span_groups,
)
from edsnlp_spark.operators.endlines import EndLinesClassifier

ENT_DDL = ("note_id long, start_char int, end_char int, label string, "
           "lexical_variant string, span_type string")


def ents(spark, rows):
    return spark.createDataFrame(rows, ENT_DDL)


def test_ner_exact_metrics(spark):
    pred = ents(spark, [(1, 0, 5, "a", "x", "ents"), (1, 10, 15, "a", "y", "ents"),
                        (1, 20, 25, "b", "z", "ents")])
    gold = ents(spark, [(1, 0, 5, "a", "x", "ents"), (1, 30, 35, "a", "w", "ents"),
                        (1, 20, 25, "b", "z", "ents")])
    m = {r["label"]: r for r in ner_exact_metrics(pred, gold).collect()}
    assert (m["a"]["tp"], m["a"]["fp"], m["a"]["fn"]) == (1, 1, 1)
    assert m["a"]["precision"] == 0.5 and m["a"]["recall"] == 0.5
    assert m["b"]["f1"] == 1.0
    assert (m["micro"]["tp"], m["micro"]["fp"], m["micro"]["fn"]) == (2, 1, 1)


def test_ner_overlap_metrics(spark):
    # pred span overlaps gold partially -> TP under overlap semantics
    pred = ents(spark, [(1, 0, 8, "a", "x", "ents")])
    gold = ents(spark, [(1, 5, 12, "a", "x", "ents")])
    m = {r["label"]: r for r in ner_overlap_metrics(pred, gold).collect()}
    assert (m["a"]["tp"], m["a"]["fp"], m["a"]["fn"]) == (1, 0, 0)
    # exact metrics would call this a miss
    e = {r["label"]: r for r in ner_exact_metrics(pred, gold).collect()}
    assert e["a"]["tp"] == 0


def test_span_attribute_accuracy(spark):
    ddl = ENT_DDL + ", negation boolean"
    pred = spark.createDataFrame(
        [(1, 0, 5, "a", "x", "ents", True), (1, 10, 15, "a", "y", "ents", False)],
        ddl)
    gold = spark.createDataFrame(
        [(1, 0, 5, "a", "x", "ents", True), (1, 10, 15, "a", "y", "ents", True)],
        ddl)
    r = span_attribute_accuracy(pred, gold, ["negation"]).collect()[0]
    assert (r["n"], r["correct"], r["accuracy"]) == (2, 1, 0.5)


def test_span_getters(spark):
    e = ents(spark, [(1, 0, 5, "covid", "x", "ents"),
                     (1, 0, 5, "covid", "x", "ents"),   # duplicate
                     (1, 6, 9, "dis", "y", "ents"),
                     (1, 10, 12, "covid", "z", "dates")])
    assert get_spans(e, {"ents": True}).count() == 3
    assert get_spans(e, {"ents": ["covid"]}).count() == 2
    assert get_spans(e, {"dates": True, "ents": ["dis"]}).count() == 2
    assert deduplicate_spans(e).count() == 3
    g = set_span_group(get_spans(e, {"ents": ["dis"]}), "diseases")
    assert g.collect()[0]["span_type"] == "diseases"
    assert union_span_groups(e, g).count() == 5


def test_endlines(spark):
    text = ("Le patient va bien.\n"       # true end (punctuation)
            "Compte rendu du jour\n"      # artifact: next starts lowercase
            "suite de la ligne coupée.\n"
            "CONCLUSION :\n"              # true end (colon)
            "rien à signaler")
    df = spark.createDataFrame([(1, text)], "note_id long, note_text string")
    t = EndLinesClassifier().endlines_table(df).orderBy("line_no").collect()
    assert [r["true_end"] for r in t] == [True, False, True, True, True]
    clean = EndLinesClassifier()(df).collect()[0]["clean_text"]
    assert "Compte rendu du jour suite de la ligne coupée." in clean
    assert "Le patient va bien.\nCompte" in clean


def test_endlines_ml_model(spark):
    """Unsupervised EndlinesModel (model.py:15-660 analog): trained on
    a corpus where real ends carry terminal punctuation + uppercase
    continuations and artifacts wrap mid-sentence, it must call a
    mid-sentence wrap an artifact and a sentence-final newline real —
    without ever seeing a label."""
    from edsnlp_spark.operators.endlines import (
        EndLinesClassifier, EndlinesModel,
    )
    import random
    rng = random.Random(7)
    words = ["patient", "examen", "bilan", "normal", "douleur", "traitement",
             "jours", "depuis", "sans", "signe", "clinique", "resultat"]

    def sentence():
        n = rng.randint(6, 12)
        toks = [rng.choice(words) for _ in range(n)]
        return (" ".join(toks) + ".").capitalize()

    docs = []
    for i in range(40):
        sents = [sentence() for _ in range(6)]
        text_parts = []
        for s in sents:
            toks = s.split(" ")
            cut = rng.randint(2, len(toks) - 2)
            # artifact wrap mid-sentence + real end after the period
            text_parts.append(" ".join(toks[:cut]) + "\n"
                              + " ".join(toks[cut:]))
        docs.append((i, "\n".join(text_parts)))
    notes = spark.createDataFrame(docs, "note_id long, note_text string")
    model = EndlinesModel().fit(notes)

    probe = spark.createDataFrame(
        [(100, "Le patient presente une douleur\nabdominale depuis trois "
               "jours.\nExamen clinique normal.")],
        "note_id long, note_text string",
    )
    t = {r["line_no"]: r["true_end"]
         for r in model.predict(probe).collect()}
    assert t[0] is False   # mid-sentence wrap -> artifact
    assert t[1] is True    # after 'jours.' -> real end

    # trained path through the Transformer splices artifacts to spaces
    out = EndLinesClassifier(model=model).transform(probe).collect()[0]
    assert "douleur abdominale" in out["clean_text"]
    assert "jours.\nExamen" in out["clean_text"]


def test_dep_parsing_metrics(spark):
    """UAS/LAS per metrics/dep_parsing.py:29-46: arc sets with and
    without the label."""
    from edsnlp_spark.operators.metrics import dep_parsing_metrics
    gold = spark.createDataFrame(
        [(1, 0, 1, "nsubj"), (1, 1, 1, "root"), (1, 2, 1, "obj")],
        "note_id long, token_i int, head_i int, label string")
    pred = spark.createDataFrame(
        [(1, 0, 1, "nsubj"), (1, 1, 1, "root"), (1, 2, 0, "obj")],
        "note_id long, token_i int, head_i int, label string")
    out = {r["metric"]: r for r in dep_parsing_metrics(pred, gold).collect()}
    assert out["uas"]["tp"] == 2 and round(out["uas"]["f1"], 4) == 0.6667
    assert out["las"]["tp"] == 2  # the wrong-head arc also has wrong key
    # label-mismatch case: same head, different label -> uas counts, las not
    pred2 = spark.createDataFrame(
        [(1, 0, 1, "obj"), (1, 1, 1, "root"), (1, 2, 1, "obj")],
        "note_id long, token_i int, head_i int, label string")
    out2 = {r["metric"]: r for r in dep_parsing_metrics(pred2, gold).collect()}
    assert out2["uas"]["tp"] == 3 and out2["las"]["tp"] == 2


def test_rouge_n_hand_computed(spark):
    from edsnlp_spark.operators.metrics import rouge_n

    cand = spark.createDataFrame([(0, "a b a c")],
                                 "pair_id long, text string")
    ref = spark.createDataFrame([(0, "a b b")],
                                "pair_id long, text string")
    r1 = rouge_n(cand, ref, 1).collect()[0]
    # clipped: min(2,1) for 'a' + min(1,2) for 'b' = 2
    assert (r1.overlap, r1.n_cand, r1.n_ref) == (2, 4, 3)
    assert (r1.precision, r1.recall, r1.f1) == (0.5, 0.6667, 0.5714)
    r2 = rouge_n(cand, ref, 2).collect()[0]
    assert (r2.overlap, r2.n_cand, r2.n_ref) == (1, 3, 2)
    assert (r2.precision, r2.recall, r2.f1) == (0.3333, 0.5, 0.4)


def test_rouge_n_double_spaces_follow_split_model(spark):
    """ADVICE r10 #3: consecutive spaces yield EMPTY tokens under the
    split() model; the n>=2 n-gram pass must count them exactly like
    the n=1 path (and the list-slice oracles) do."""
    from collections import Counter

    from edsnlp_spark.operators.metrics import rouge_n

    texts = [
        (0, "a  b a", "a  b"),          # mid-text double space
        (1, " a b", "a b "),            # leading / trailing space
        (2, "a   b", "a  b"),           # triple vs double
    ]
    cand = spark.createDataFrame([(i, c) for i, c, _ in texts],
                                 "pair_id long, text string")
    ref = spark.createDataFrame([(i, r) for i, _, r in texts],
                                "pair_id long, text string")
    for n in (1, 2, 3):
        got = {r.pair_id: (r.overlap, r.n_cand, r.n_ref)
               for r in rouge_n(cand, ref, n).collect()}
        for i, c, r in texts:
            ct, rt = c.split(" "), r.split(" ")
            cg = Counter(tuple(ct[j:j + n])
                         for j in range(len(ct) - n + 1))
            rg = Counter(tuple(rt[j:j + n])
                         for j in range(len(rt) - n + 1))
            ov = sum(min(cg[g], rg[g]) for g in cg)
            assert got[i] == (ov, sum(cg.values()), sum(rg.values())), (
                n, i, got[i])


def test_rouge_n_zero_overlap_and_missing_pairs(spark):
    from edsnlp_spark.operators.metrics import rouge_n

    cand = spark.createDataFrame([(0, "x y"), (1, "p q")],
                                 "pair_id long, text string")
    ref = spark.createDataFrame([(0, "z w")],
                                "pair_id long, text string")
    rows = rouge_n(cand, ref, 1).collect()
    assert len(rows) == 1  # pair 1 has no reference -> dropped
    r = rows[0]
    assert r.overlap == 0 and r.precision == 0.0 and r.f1 == 0.0


def test_rouge_l_matches_python_reference(spark):
    """r11: LCS-based ROUGE-L vs a textbook O(mn) Python dp, including
    truncation semantics and repeated tokens."""
    import random

    from edsnlp_spark.operators.metrics import _lcs_len, rouge_l

    def ref_lcs(a, b):
        m, n = len(a), len(b)
        dp = [[0] * (n + 1) for _ in range(m + 1)]
        for i in range(1, m + 1):
            for j in range(1, n + 1):
                dp[i][j] = (dp[i - 1][j - 1] + 1 if a[i - 1] == b[j - 1]
                            else max(dp[i - 1][j], dp[i][j - 1]))
        return dp[m][n]

    rnd = random.Random(31)
    vocab = ["x", "y", "z", "w"]
    pairs = [(i, [rnd.choice(vocab) for _ in range(rnd.randrange(1, 90))],
              [rnd.choice(vocab) for _ in range(rnd.randrange(1, 90))])
             for i in range(20)]
    for _, a, b in pairs:
        assert _lcs_len(a, b) == ref_lcs(a, b)
    cand = spark.createDataFrame([(i, " ".join(a)) for i, a, _ in pairs],
                                 "pair_id long, text string")
    ref = spark.createDataFrame([(i, " ".join(b)) for i, _, b in pairs],
                                "pair_id long, text string")
    got = {r.pair_id: (r.lcs, r.n_cand, r.n_ref)
           for r in rouge_l(cand, ref, max_tokens=64).collect()}
    for i, a, b in pairs:
        ta, tb = a[:64], b[:64]
        assert got[i] == (ref_lcs(ta, tb), len(ta), len(tb)), i


def test_rouge_l_hand_and_edges(spark):
    from edsnlp_spark.operators.metrics import rouge_l

    cand = spark.createDataFrame([(0, "a b c d"), (1, "x y")],
                                 "pair_id long, text string")
    ref = spark.createDataFrame([(0, "a c b d"), (1, "p q")],
                                "pair_id long, text string")
    rows = {r.pair_id: r for r in rouge_l(cand, ref).collect()}
    # LCS('abcd','acbd') = 3 ('a c d' or 'a b d')
    r0 = rows[0]
    assert (r0.lcs, r0.n_cand, r0.n_ref) == (3, 4, 4)
    assert (r0.precision, r0.recall, r0.f1) == (0.75, 0.75, 0.75)
    r1 = rows[1]
    assert r1.lcs == 0 and r1.f1 == 0.0
