"""Fuzzy span re-alignment (operators/fuzzy_align.py) — mirrors the
reference's tests/utils/test_fuzzy_aligment.py cases and the LLM
markup-extractor end-to-end behavior when the model alters its echo."""

from __future__ import annotations

from edsnlp_spark.operators.fuzzy_align import align_spans
from edsnlp_spark.operators.llm import llm_markup_extract


def test_align_insertions_and_whitespace():
    # Annotated on the OLD revision; the new one inserts " modified ",
    # stretches whitespace inside a span and rewords "texts" -> "text"
    # (reference test_align shape).
    old = ("This is a small sample\n\n\ndoc\n  . "
           "It contains some texts to be annotated. ")
    new = ("This is a  modified  small   sample \ndoc\n . "
           "It contains some text to be annotated.")
    spans = [
        (old.index("small sample"), old.index("small sample") + 12),
        (old.index("\ndoc\n"), old.index("\ndoc\n") + 5),
        (old.index("texts"), old.index("texts") + 5),
    ]
    got = align_spans(old, spans, new, threshold=0.0)
    # whitespace stretching inside the span is absorbed: the raw landed
    # span covers the whole stretched phrase
    s, e = got[0]
    assert new[s:e] == "small   sample"
    s, e = got[1]
    assert new[s:e].strip() == "doc"
    # "texts" -> "text": the 5-char collapsed span lands over the
    # reworded token (one char of neighborhood bleeds in, as in the
    # reference's expand-mode span landing)
    s, e = got[2]
    assert "text" in new[s:e] and len(new[s:e]) == 5


def test_align_identical_region_exact():
    old = "Le patient est malade et fatigue."
    new = "Apres examen le patient est   malade et fatigue."
    s0 = old.index("malade")
    got = align_spans(old, [(s0, s0 + 6)], new, threshold=0.0)
    assert got[0] is not None
    s, e = got[0]
    assert new[s:e] == "malade"


def test_ambiguous_tiny_span_dropped():
    # A <=2-char span matching >20 places is unalignable (reference
    # test_ambiguous_exact_match).
    line = "this is ambiguous: xy , where should we annotate ?\n"
    old = line * 25 + "this is ambiguous xy , where should we annotate ?\n" \
        + line * 24
    new = line * 50
    b = len(line) * 25 + len("this is ambiguous ")
    got = align_spans(old, [(b, b + 2)], new, threshold=0.0,
                      sim_scheme=[(10, 0.7)])
    assert got == [None]


def test_missing_span_dropped():
    # Nothing resembling the old text exists in the new one
    # (reference test_missing).
    old = "this is a sample: abcd, where should we annotate ?"
    new = "the cat sat on the mat, and eat mice when he is hungry."
    b = old.index("abcd")
    got = align_spans(old, [(b, b + 4), (b + 9, b + 9)], new, threshold=0.0,
                      sim_scheme=[(10, 0.7)])
    assert got == [None, None]


def test_zero_zero_span_passthrough():
    got = align_spans("abc def", [(0, 0)], "xyz abc", threshold=0.0)
    assert got == [(0, 0)]


def test_begin_is_end_fallback():
    # The span text itself was rewritten, but its right context
    # survives: the aligner anchors on the 10 following chars and the
    # span END lands at the anchor start (reference begin_is_end mode).
    old = "diagnostic: carcinome epidermoide du poumon gauche confirme"
    new = "diagnostic: neoplasie du poumon gauche confirme"
    b = old.index("carcinome epidermoide")
    got = align_spans(old, [(b, b + len("carcinome epidermoide"))], new,
                      threshold=0.0)
    assert got[0] is not None
    s, e = got[0]
    assert new[:e].endswith("neoplasie"[-1]) or e == new.index(" du poumon")


def test_llm_markup_realign_end_to_end(spark):
    """Fake LLM normalizes whitespace and paraphrases the lead-in; spans
    must still land on the SOURCE text (llm_markup_extractor.py:335)."""
    src = "Le  patient   est malade.  Pas de fievre."

    async def fake(prompt):
        # echo with collapsed whitespace + dropped lead-in word
        return ("patient est <ent label=dis>malade</ent>. "
                "Pas de <ent label=sym>fievre</ent>.")

    notes = spark.createDataFrame([(1, src)], "note_id long, note_text string")
    rows = sorted(
        llm_markup_extract(notes, complete_fn=fake).collect(),
        key=lambda r: r.start_char)
    assert [(r.label, src[r.start_char:r.end_char]) for r in rows] == [
        ("dis", "malade"), ("sym", "fievre")]
    assert [r.lexical_variant for r in rows] == ["malade", "fievre"]


def test_llm_markup_exact_echo_unchanged(spark):
    """When the echo matches the source, offsets pass through untouched."""
    src = "Le patient est malade."

    async def fake(prompt):
        return "Le patient est <ent label=dis>malade</ent>."

    notes = spark.createDataFrame([(1, src)], "note_id long, note_text string")
    rows = llm_markup_extract(notes, complete_fn=fake).collect()
    assert len(rows) == 1
    assert src[rows[0].start_char:rows[0].end_char] == "malade"


def test_align_property_whitespace_mutations():
    """Property: for spans over non-space tokens, collapsing/stretching
    whitespace anywhere in the document must not change what text the
    aligned span selects (modulo surrounding whitespace)."""
    import random
    rng = random.Random(42)
    words = ["alpha", "beta", "gamma", "delta", "omega", "sigma",
             "kappa", "lambda", "mu", "nu"]
    for trial in range(25):
        n = rng.randint(5, 12)
        toks = [rng.choice(words) + str(i) for i in range(n)]
        old = " ".join(toks)
        # mutate whitespace: random runs of spaces/newlines/tabs
        seps = [rng.choice([" ", "  ", "\n", " \n ", "\t", "   "])
                for _ in range(n - 1)]
        new = toks[0] + "".join(s + t for s, t in zip(seps, toks[1:]))
        # span = one random token
        k = rng.randrange(n)
        b = old.index(toks[k])
        got = align_spans(old, [(b, b + len(toks[k]))], new, threshold=0.0)
        assert got[0] is not None, (trial, toks[k])
        s, e = got[0]
        assert new[s:e].strip() == toks[k], (trial, new[s:e], toks[k])
