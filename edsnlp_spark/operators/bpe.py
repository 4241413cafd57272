"""BPE tokenizer training (Sennrich, Haddow & Birch, ACL 2016).

The missing piece between corpus curation and model training: learn the
merge table itself from the corpus.  The classic algorithm never
iterates over the raw corpus — it operates on the WORD-FREQUENCY table
(word -> count, one corpus pass), then repeatedly (a) counts adjacent
symbol pairs weighted by word frequency, (b) merges the most frequent
pair everywhere.  That is exactly the Spark-friendly formulation:

- the vocabulary pass is ONE corpus shuffle (groupBy word), after which
  the corpus is never touched again;
- each merge iteration is one explode + groupBy over the vocab table
  (partial map-side aggregation; pair space is bounded by symbol
  inventory^2) + ONE driver row (the argmax pair) + a per-row projection
  applying the merge to each word's symbol array;
- the vocab table is persisted and its lineage cut with an eager
  localCheckpoint every few rounds (the r6 lesson: per-iteration plan
  rewrites otherwise stack 2N projections into the logical plan).

Determinism: ties on pair count break lexicographically (left, then
right symbol) — pinned by the differential test against a pure-Python
reference implementation of the paper's algorithm.

No SQL oracle: the merge loop is inherently iterative/stateful (the
driver gate records a rows-only check if queried); correctness is
carried by the exact-sequence differential test instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..core.caching import scoped, tracked_persist


def _apply_merge(symbols, left: str, right: str):
    """In-row merge application: fold the symbol array, joining every
    adjacent (left, right) occurrence left-to-right (greedy, non-
    overlapping — after a merge the new symbol cannot re-pair with the
    consumed right element, matching the reference algorithm).  Word
    symbol arrays are short (characters of one word), so the growing
    accumulator stays bounded — the r3 O(n^2) fold trap needs unbounded
    arrays."""
    merged = left + right

    def step(acc, s):
        # try_element_at: ANSI element_at errors on an empty array
        # (CLAUDE.md r2); the size guard below doesn't short-circuit
        last = F.try_element_at(acc, F.lit(-1))
        return (
            F.when(
                (F.size(acc) > 0) & (last == F.lit(left))
                & (s == F.lit(right)),
                F.concat(F.slice(acc, 1, F.size(acc) - 1),
                         F.array(F.lit(merged))),
            )
            .otherwise(F.concat(acc, F.array(s)))
        )

    return F.aggregate(symbols, F.array().cast("array<string>"), step)


@scoped("bpe")
def bpe_train(docs: DataFrame, n_merges: int = 50,
              id_col: str = "doc_id", text_col: str = "text",
              end_of_word: str = "</w>") -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus -> ordered list of
    (left, right) symbol pairs.  Stops early when no pair occurs twice.

    Scale: one corpus shuffle builds (word, freq); every iteration
    after that runs on the vocabulary table only (Heaps' law: million-
    scale rows for a web corpus — a small DataFrame by Spark standards,
    and the 2-row argmax collect is bounded by construction).
    """
    if n_merges < 1:
        raise ValueError("bpe_train requires n_merges >= 1")
    words = docs.select(
        F.explode(F.split(F.col(text_col), " ", -1)).alias("w")
    ).filter(F.col("w") != "").groupBy("w").agg(
        F.count(F.lit(1)).alias("freq"))
    vocab = words.select(
        "freq",
        F.concat(
            F.split(F.col("w"), "", -1).cast("array<string>"),
            F.array(F.lit(end_of_word)),
        ).alias("sym"),
    )
    vocab = tracked_persist(vocab, "bpe")
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        pairs = (
            vocab.select(
                "freq",
                F.explode(F.zip_with(
                    F.slice(F.col("sym"), 1, F.size("sym") - 1),
                    F.slice(F.col("sym"), 2, F.size("sym") - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("c"))
        )
        top = pairs.orderBy(F.col("c").desc(), "l", "r").limit(1).collect()
        if not top or top[0]["c"] < 2:
            break
        left, right = top[0]["l"], top[0]["r"]
        merges.append((left, right))
        new_vocab = vocab.select(
            "freq", _apply_merge(F.col("sym"), left, right).alias("sym"))
        # cut lineage: each round adds a projection + fold on top of the
        # last; checkpoint keeps the logical plan O(1) across rounds
        if (i + 1) % 8 == 0:
            new_vocab = new_vocab.localCheckpoint(eager=True)
        else:
            new_vocab = tracked_persist(new_vocab, "bpe")
        vocab = new_vocab
    return merges


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]],
               id_col: str = "doc_id", text_col: str = "text",
               end_of_word: str = "</w>") -> DataFrame:
    """Apply a learned merge list -> (id_col, tokens array<string>):
    split each word to characters + end-of-word, then replay the merges
    in order — a pure per-row projection (the ENCODE path a training
    pipeline runs at full corpus scale; merges are pipeline config)."""
    word_sym = F.transform(
        F.split(F.col(text_col), " ", -1),
        lambda w: F.concat(F.split(w, "", -1).cast("array<string>"),
                           F.array(F.lit(end_of_word))),
    )
    out = word_sym
    for left, right in merges:
        out = _nested_apply(out, left, right)
    return docs.select(F.col(id_col), F.flatten(out).alias("tokens"))


def _nested_apply(words_col, left: str, right: str):
    # closure factory (CLAUDE.md: default-arg capture in a HOF lambda
    # receives the array index)
    def apply_one(sym):
        return _apply_merge(sym, left, right)
    return F.transform(words_col, apply_one)
