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
WORD_REGEX = (
    r"[A-Za-zÀ-ɏ]+(?:['’](?=[A-Za-zÀ-ɏ]|$))?|\d+(?:[.,]\d+)?|[^" + _WS + r"]"
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


def tokenize(text: Column, regex: str = WORD_REGEX) -> Column:
    """Offset-bearing tokens as array<struct<i,text,start,end>> — native.

    Fold over the in-order match list; ``locate`` from the previous
    token's end recovers exact char offsets (see module docstring for the
    proof sketch).  0-based, end-exclusive offsets, matching the
    reference's span convention (converters.py:690-707).

    Scale bound: the fold's array_append copies the accumulator, so cost
    is O(tokens^2) per document — immaterial for clinical notes (~100s
    of tokens) but real for 10k+-token documents.  At that shape, chunk
    first (``SplitDocs`` re-anchors offsets) so each tokenize call sees
    a bounded token count; the pretokenized fast path below is linear.
    """
    toks = F.regexp_extract_all(F.coalesce(text, F.lit("")), F.lit(regex), F.lit(0))
    # acc: struct<pos:int (1-based locate cursor), out:array<token>>
    zero = F.struct(
        F.lit(0).cast("int").alias("pos"),
        F.expr(
            "cast(array() as array<struct<i:int,text:string,start:int,end:int>>)"
        ).alias("out"),
    )

    # Lambda let-bindings don't exist in Spark SQL, so locate() appears
    # three times per step; each scan starts from the cursor, so total
    # work stays near-linear in text length.  locate is 1-based; 0 =
    # not-found cannot happen given the partition property.
    safe_text = F.coalesce(text, F.lit(""))
    return F.aggregate(
        toks,
        zero,
        lambda acc, t: F.struct(
            (_locate(t, safe_text, acc["pos"] + 1) + F.length(t) - F.lit(1))
            .cast("int")
            .alias("pos"),
            F.array_append(
                acc["out"],
                F.struct(
                    F.size(acc["out"]).cast("int").alias("i"),
                    t.alias("text"),
                    (_locate(t, safe_text, acc["pos"] + 1) - F.lit(1))
                    .cast("int")
                    .alias("start"),
                    (_locate(t, safe_text, acc["pos"] + 1) - F.lit(1) + F.length(t))
                    .cast("int")
                    .alias("end"),
                ),
            ).alias("out"),
        ),
        lambda acc: acc["out"],
    )


def _locate(substr: Column, string: Column, pos: Column) -> Column:
    """1-based locate(substr, string, pos) as a Column expression."""
    return F.call_function("locate", substr, string, pos)


def tokenize_pretokenized(text: Column) -> Column:
    """Offset-bearing tokens for PRETOKENIZED text (tokens separated by
    exactly one space, no leading/trailing space) — the reference's
    whitespace tokenizer for already-tokenized corpora.

    Offsets come from a prefix-sum fold (no per-token string scans), so
    this is much cheaper than the locate-fold general tokenizer.  The
    single-space precondition is the caller's contract; on free text use
    ``tokenize`` instead.
    """
    toks = F.split(F.coalesce(text, F.lit("")), " ")
    toks = F.filter(toks, lambda t: t != "")
    zero = F.struct(
        F.lit(0).cast("int").alias("pos"),
        F.expr(
            "cast(array() as array<struct<i:int,text:string,start:int,end:int>>)"
        ).alias("out"),
    )
    return F.aggregate(
        toks,
        zero,
        lambda acc, t: F.struct(
            (acc["pos"] + F.length(t) + 1).cast("int").alias("pos"),
            F.array_append(
                acc["out"],
                F.struct(
                    F.size(acc["out"]).cast("int").alias("i"),
                    t.alias("text"),
                    acc["pos"].alias("start"),
                    (acc["pos"] + F.length(t)).cast("int").alias("end"),
                ),
            ).alias("out"),
        ),
        lambda acc: acc["out"],
    )


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
