"""Native text expressions: tokenizer, normalizers, quality stats.

Everything here is pure Spark SQL (whole-stage-codegen'd, no Python in
the hot path).

Tokenizer parity: the reference tokenizes with a single regex tuned for
French clinical text (edsnlp/language.py:46-116, regex at :61-80 — words,
numbers, per-newline tokens, punctuation as single tokens).  We reproduce
that shape with a configurable token regex whose trailing catch-all
alternative matches any single non-whitespace char, so the regex
*partitions all non-whitespace text*.  That property makes
char offsets recoverable natively: tokens appear in order and gaps
between consecutive tokens are pure whitespace, so
``locate(token, text, prev_end+1)`` is provably the true start offset.
The offset computation is a fold (``aggregate``) over
``regexp_extract_all`` — no UDF.

Normalizers parity: eds.accents (char map,
edsnlp/pipes/core/normalizer/accents/accents.py:11) and eds.quotes
(quotes.py:11) are ``translate``/``regexp_replace`` projections.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Word-ish tokens first, then decimal numbers, then any single
# non-space char (punctuation, symbols).  The trailing catch-all
# guarantees the partition property documented above.  Whitespace is an
# EXPLICIT class: Java's \s is ASCII-only while Python's is Unicode-wide,
# so NBSP & friends must be excluded by hand to keep the engine's
# semantics identical to the reference's Python tokenizer (found by the
# hypothesis property test on '\xa0').
_WS = ("\\s\\x1c-\\x1f\\x85\xa0\u1680"
       "\u2000-\u200a\u2028\u2029\u202f\u205f\u3000")
# Elisions split like the reference EDSTokenizer (language.py:63-66
# ``default = [^sep]+(?:['ˊ](?=alpha|$))?``): a word may *end* with an
# apostrophe when a letter (or end-of-text) follows, so "d'anomalie"
# tokenizes as ["d'", "anomalie"] — this is what lets apostrophe-bearing
# qualifier cues ("pas d'", "n'a pas de") build n-gram keys that match
# corpus n-grams.
# Reference EDSTokenizer structure (language.py:44-80), re-expressed in
# the Java/Python-shared regex subset:
# * tokenizer exceptions keep their dot ("Dr." one token);
# * acronyms: capital + caps/digits + dot followed by a word char
#   ("E.Coli" -> ["E.", "Coli"]) — this is what keeps "E.Coli" from
#   triggering a sentence boundary (reference test_sentences.py:64-72);
# * numbers: digits with ONE optional decimal digit ("3,5" one token,
#   "3,55" -> ["3", ",", "55"]) per num_like at language.py:63.
TOKENIZER_EXCEPTIONS_RX = r"Dr\.|Pr\.|M\.|Mme\.|Mlle\.|(?i:ep\.)"
ACRONYM_RX = r"[A-Z][A-Z0-9]*\.(?=[A-Za-z0-9_À-ɏ])"
NUM_RX = r"\d+(?:[.,]\d(?![.,]?[0-9])|(?![.,]?[0-9]))?"
WORD_REGEX = (
    TOKENIZER_EXCEPTIONS_RX
    + "|" + ACRONYM_RX
    + "|" + NUM_RX
    + r"|[A-Za-zÀ-ɏ]+(?:['’](?=[A-Za-zÀ-ɏ]|$))?|[^" + _WS + r"]"
)

# Accent fold used by eds.accents (accents.py:11 char list).
_ACCENTED = "àáâäãåçèéêëìíîïñòóôöõùúûüýÿÀÁÂÄÃÅÇÈÉÊËÌÍÎÏÑÒÓÔÖÕÙÚÛÜÝŸ"
_PLAIN = "aaaaaaceeeeiiiinooooouuuuyyAAAAAACEEEEIIIINOOOOOUUUUYY"

# Exotic quotes/apostrophes normalized by eds.quotes (quotes.py:11).
_QUOTES = "‘’‚‛‹›“”„‟«»"
_QUOTES_TO = "''''''\"\"\"\"\"\""


# Python-side mirror of norm_text for driver-side term normalization and
# the exact-regex UDF path.  ONE normalization shared by all paths (the
# quote and accent domains are disjoint and quote-fold outputs are
# unaccented, so a single translate == quotes-then-accents composition).
# Length-preserving by construction: char offsets survive.
_PY_NORM_TABLE = str.maketrans(_ACCENTED + _QUOTES, _PLAIN + _QUOTES_TO)


def py_norm_text(s: str, lowercase: bool = True) -> str:
    """Driver/UDF-side NORM, identical to the ``norm_text`` Column
    expression: fixed char-table accent fold + quote fold + lower.
    Chars outside the table pass through unchanged on BOTH sides."""
    out = s.translate(_PY_NORM_TABLE)
    return out.lower() if lowercase else out


def normalize_accents(col: Column) -> Column:
    """eds.accents: strip diacritics via char map (native translate)."""
    return F.translate(col, _ACCENTED, _PLAIN)


def normalize_quotes(col: Column) -> Column:
    """eds.quotes: fold exotic quotes/apostrophes to ASCII."""
    return F.translate(col, _QUOTES, _QUOTES_TO)


def norm_text(col: Column, lowercase: bool = True, accents: bool = True,
              quotes: bool = True) -> Column:
    """eds.normalizer composition (normalizer.py:15): NORM attribute.

    The reference computes NORM per token; since our normalizers are
    length-preserving char maps, computing NORM on the whole text keeps
    char offsets aligned between TEXT and NORM space — this is what makes
    regex-on-NORM offset mapping trivial for the accent/quote/lower
    subset (the general excluded-token case is handled in the matcher).
    """
    out = col
    if quotes:
        out = normalize_quotes(out)
    if accents:
        out = normalize_accents(out)
    if lowercase:
        out = F.lower(out)
    return out


_EMPTY_INT_ARR = "cast(array() as array<int>)"
_TOK_CHUNK = 64


def let_bound(value: Column, body) -> Column:
    """Let-binding for Column expressions: evaluate ``value`` ONCE per
    row and expose it to ``body`` as a bound lambda variable.

    Motivation (measured, see CLAUDE.md): referencing a computed
    expression inside a higher-order-function lambda re-evaluates it per
    element, and array-valued fold ACCUMULATORS are deep-copied per step
    (a flat ``aggregate``+``array_append`` prefix-sum is O(n²) and 20×
    slower than this pattern at 20k elements).  Wrapping the value in a
    1-element array and ``transform``-ing over it turns every inner
    reference into a cheap bound-variable lookup.
    """
    return F.element_at(F.transform(F.array(value), body), 1)


def tokenize(text: Column, regex: str = WORD_REGEX) -> Column:
    """Offset-bearing tokens as array<struct<i,text,start,end>> — native.

    0-based, end-exclusive offsets, matching the reference's span
    convention (converters.py:690-707).  LINEAR in document length:

    - ``regexp_extract_all`` gives the in-order tokens;
    - ``split`` on the SAME regex gives the (whitespace-only, by the
      partition property in the module docstring) gaps between them, so
      ``start_k = sum(len(gap_j)+len(tok_j) for j<k) + len(gap_k)``;
    - the prefix sums are computed chunk-wise (chunks of 64) with
      scalar-or-bounded fold accumulators, with the pair/chunk-start
      arrays let-bound (see ``let_bound``) so nothing is re-evaluated
      per element and no fold accumulator grows with the document.

    A 100k-token document tokenizes in well under a second on one core;
    no pre-chunking (SplitDocs) is needed at any realistic note size.
    """
    t = F.coalesce(text, F.lit(""))
    toks = F.regexp_extract_all(t, F.lit(regex), F.lit(0))
    gaps = F.split(t, regex)

    # (gap_len, tok_len) pairs; gaps has exactly ntokens+1 entries.
    pairs = F.zip_with(
        F.slice(gaps, 1, F.size(toks)), toks,
        lambda g, tk: F.struct(F.length(g).cast("int").alias("g"),
                               F.length(tk).cast("int").alias("t")))

    def with_pairs(P):
        n = F.size(P)
        m = F.ceil(n / F.lit(_TOK_CHUNK)).cast("int")
        # per-chunk total lengths (scalar fold per chunk — O(n) overall)
        csums = F.transform(
            F.sequence(F.lit(0), m - 1),
            lambda ci: F.aggregate(
                F.slice(P, ci * _TOK_CHUNK + 1, _TOK_CHUNK),
                F.lit(0).cast("int"),
                lambda a, e: (a + e["g"] + e["t"]).cast("int")))
        # exclusive prefix over the m chunk sums (m ≈ n/64, so the
        # per-step accumulator copy is O(n²/64²) — negligible)
        cstarts = F.aggregate(
            csums,
            F.struct(F.lit(0).cast("int").alias("run"),
                     F.expr(_EMPTY_INT_ARR).alias("out")),
            lambda acc, s: F.struct(
                (acc["run"] + s).cast("int").alias("run"),
                F.array_append(acc["out"], acc["run"]).alias("out")),
            lambda acc: acc["out"])

        def with_cstarts(CST):
            # per chunk: fold its 64 pairs into absolute token starts,
            # cursor seeded from the chunk-start prefix; accumulator
            # array is bounded at 64 ints so per-step copies stay O(64).
            return F.flatten(F.transform(
                F.sequence(F.lit(0), F.size(CST) - 1),
                lambda ci: F.aggregate(
                    F.slice(P, ci * _TOK_CHUNK + 1, _TOK_CHUNK),
                    F.struct(F.element_at(CST, ci + 1).alias("run"),
                             F.expr(_EMPTY_INT_ARR).alias("out")),
                    lambda acc, e: F.struct(
                        (acc["run"] + e["g"] + e["t"]).cast("int").alias("run"),
                        F.array_append(
                            acc["out"],
                            (acc["run"] + e["g"]).cast("int")).alias("out")),
                    lambda acc: acc["out"])))

        return let_bound(cstarts, with_cstarts)

    starts = F.when(F.size(toks) == 0, F.expr(_EMPTY_INT_ARR)).otherwise(
        let_bound(pairs, with_pairs))
    zipped = F.zip_with(
        toks, starts,
        lambda tk, s: F.struct(tk.alias("text"), s.alias("start"),
                               (s + F.length(tk)).cast("int").alias("end")))
    return F.transform(
        zipped,
        lambda x, i: F.struct(
            i.cast("int").alias("i"), x["text"].alias("text"),
            x["start"].alias("start"), x["end"].alias("end")))


def tokenize_pretokenized(text: Column) -> Column:
    """Offset-bearing tokens for PRETOKENIZED text (tokens separated by
    single spaces) — the reference's whitespace tokenizer for
    already-tokenized corpora.  Same linear chunked-prefix-sum core as
    ``tokenize`` with the trivial token regex; repeated/leading spaces
    just become longer gaps.
    """
    return tokenize(text, regex="[^ ]+")


def token_texts(text: Column, regex: str = WORD_REGEX) -> Column:
    """Token strings only (no offsets) — the cheap analytical path."""
    return F.regexp_extract_all(F.coalesce(text, F.lit("")), F.lit(regex), F.lit(0))


def word_tokens(text: Column) -> Column:
    """Whitespace-ish word split used by the text-analysis aggregates
    (token_count / quality / lang-id), chosen because it is expressible
    identically in ANSI SQL for the DuckDB oracle."""
    return F.filter(F.split(F.coalesce(text, F.lit("")), r"\s+"), lambda t: t != "")


# ---- text-analysis metrics (north-star "text analysis" ops) -----------

def char_count(text: Column) -> Column:
    return F.length(F.coalesce(text, F.lit("")))


def token_count(text: Column) -> Column:
    return F.size(word_tokens(text))


def avg_word_len(text: Column) -> Column:
    toks = word_tokens(text)
    return F.when(
        F.size(toks) > 0,
        F.aggregate(toks, F.lit(0).cast("bigint"), lambda a, t: a + F.length(t))
        / F.size(toks),
    ).otherwise(F.lit(None).cast("double"))


def punct_ratio(text: Column) -> Column:
    """Fraction of non-space chars that are not alphanumeric."""
    t = F.coalesce(text, F.lit(""))
    nonspace = F.length(F.regexp_replace(t, r"\s", ""))
    alnum = F.length(F.regexp_replace(t, r"[^A-Za-z0-9À-ɏ]", ""))
    return F.when(nonspace > 0, (nonspace - alnum) / nonspace).otherwise(
        F.lit(None).cast("double")
    )


def stopword_ratio(text: Column, stopwords: list[str]) -> Column:
    toks = word_tokens(F.lower(text))
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.when(
        F.size(toks) > 0,
        F.size(F.filter(toks, lambda t: F.array_contains(sw, t))) / F.size(toks),
    ).otherwise(F.lit(None).cast("double"))


# GPT-2-style pretokenizer pattern (the public BPE splitter shape:
# optional leading space + letter runs | digit runs | other-symbol runs),
# restricted to constructs Java and DuckDB regex share. Each pretoken
# maps to >=1 BPE token; the count is the standard cheap lower-bound
# estimate training pipelines use for budgeting.
BPE_SPLIT_RX = r" ?[A-Za-zÀ-ɏ]+| ?[0-9]+| ?[^\sA-Za-zÀ-ɏ0-9]+"


def bpe_token_count(text: Column, chars_per_token: float = 4.0) -> Column:
    """BPE-ish token count: number of GPT-style pretokens plus an extra
    token per ceil(len/4) chars within long pretokens (long words split
    into multiple BPE units; ~4 chars/token is the published average for
    English-like text). Pure regexp projection."""
    pretoks = F.regexp_extract_all(
        F.coalesce(text, F.lit("")), F.lit(BPE_SPLIT_RX), F.lit(0))
    per = F.transform(
        pretoks,
        lambda p: F.greatest(
            F.ceil(F.length(F.trim(p)) / F.lit(chars_per_token)),
            F.lit(1).cast("bigint")),
    )
    return F.coalesce(
        F.aggregate(per, F.lit(0).cast("bigint"), lambda a, x: a + x),
        F.lit(0).cast("bigint"))
