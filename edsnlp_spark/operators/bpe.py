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

from ..core.caching import release_plane, scoped, tracked_persist


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
    # ADVICE r7 #1: at most ~2 vocab planes stay cached.  ``retired``
    # is the previous round's plane, dropped as soon as its successor
    # is MATERIALIZED (the next round's argmax collect, or an eager
    # checkpoint) — never before, or the unpersisted subtree would
    # silently recompute (the round-1 lazy-blowup hazard).  Earlier
    # checkpoint RDD blocks are freed by the ContextCleaner when the
    # Python handle is rebound.
    retired: DataFrame | None = None
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
        # the collect materialized ``vocab``; its predecessor is free
        if retired is not None:
            release_plane(retired, "bpe")
            retired = None
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
            # eager checkpoint already materialized the successor
            release_plane(vocab, "bpe")
        else:
            new_vocab = tracked_persist(new_vocab, "bpe")
            retired = vocab
        vocab = new_vocab
    return merges


def _apply_merge_batch(symbols, pairs: list[tuple[str, str]],
                       sep: str = "\x00",
                       merged: list[str] | None = None):
    """In-row application of a BATCH of mutually non-interacting merges
    (disjoint symbol sets) in ONE fold: the step looks the (last, cur)
    pair up in a literal K-entry map instead of stacking K fold layers.
    Disjointness makes the single greedy left-to-right pass equivalent
    to applying the K merges sequentially in any order: a merge's
    output symbol cannot be an operand of another batch member, and a
    pair's occurrence count cannot be consumed by a merge that shares
    none of its symbols.  ``sep`` joins (last, cur) into the map key —
    a symbol containing the separator byte would alias keys, so
    callers must not admit \\x00 inside tokens (corpus text never does).
    """
    kv: list = []
    outs = merged if merged is not None else [l + r for l, r in pairs]
    for (left, right), out in zip(pairs, outs):
        kv.append(F.lit(f"{left}{sep}{right}"))
        kv.append(F.lit(out))
    table = F.create_map(*kv)

    def step(acc, s):
        last = F.try_element_at(acc, F.lit(-1))
        merged = F.try_element_at(table, F.concat(last, F.lit(sep), s))
        return (
            F.when((F.size(acc) > 0) & merged.isNotNull(),
                   F.concat(F.slice(acc, 1, F.size(acc) - 1),
                            F.array(merged)))
            .otherwise(F.concat(acc, F.array(s)))
        )

    return F.aggregate(symbols, F.array().cast("array<string>"), step)


def _adopt_disjoint(candidates: list[tuple[str, str]],
                    want: int) -> list[tuple[str, str]]:
    """Greedy scan of a (count desc, left, right)-ordered candidate
    list, adopting up to ``want`` pairs whose symbol sets — operands
    AND concatenated output — are pairwise disjoint.

    The output check matters both ways (ADVICE r9 #1): without it,
    adopting ('abc','d') then a later candidate ('ab','c') whose OUTPUT
    'abc' equals the earlier OPERAND would let the single greedy fold
    in :func:`_apply_merge_batch` merge the 'abc' CREATED in-round
    with 'd' ([ab,c,d] -> [abcd]), diverging from the documented
    sequential equivalence.
    """
    adopted: list[tuple[str, str]] = []
    used: set[str] = set()
    for left, right in candidates:
        if left in used or right in used or (left + right) in used:
            continue
        adopted.append((left, right))
        used.update((left, right, left + right))
        if len(adopted) >= want:
            break
    return adopted


@scoped("bpe")
def bpe_train_batched(docs: DataFrame, n_merges: int = 50,
                      batch: int = 64,
                      id_col: str = "doc_id", text_col: str = "text",
                      end_of_word: str = "</w>") -> list[tuple[str, str]]:
    """Batched BPE training (VERDICT r8 #4): recompute pair counts once
    per round and adopt up to ``batch`` top-count MUTUALLY
    NON-INTERACTING pairs per round, instead of one driver-sequenced
    Spark job per merge.  A 30k-merge production table goes from 30k
    sequential jobs (days of driver round-trips) to ~30k/batch rounds
    of two jobs each (one bounded top-M collect + one eager checkpoint).

    Semantics vs the exact sequential algorithm (Sennrich 2016):

    - WITHIN a round the adopted pairs have pairwise-disjoint symbol
      sets INCLUDING their output symbols (greedy scan of the count
      table in (count desc, left, right) order, skipping any pair
      whose operands OR concatenated output share a symbol with an
      already-adopted one — without the output check, adopting
      ('abc','d') then ('ab','c') would let the single fold merge the
      'abc' CREATED in-round into 'abcd'), so applying them in one
      fold equals applying them sequentially — and their counts are
      mutually unaffected, so the adopted counts are the true counts.
    - ACROSS a round boundary this is the standard batched
      approximation: a pair CREATED by an earlier merge in the same
      round (e.g. ('ab','c') after ('a','b')) only becomes adoptable
      next round, so it can be sequenced later than the exact
      algorithm would place it whenever it would have out-counted the
      batch tail.  Exact when no created/modified pair outranks the
      round's adopted set — pinned by the differential test
      (tests/test_operators.py) on corpora with and without that
      property; ``batch=1`` degenerates to the exact algorithm.

    Measured wall times (local[32], warm JVM; sequential =
    :func:`bpe_train`).  The raw sf0.1 corpus has only 31 distinct
    words and EXHAUSTS at ~110 merges (seq 17.2s vs batched 1.8s to
    exhaustion), so the 500/5000 rows use a derived 961-word corpus
    (adjacent-token pair-words over the same 5k docs; measured
    2026-08-15):

    ==========  =====================  ===========
    n_merges    sequential             batched(64)
    ==========  =====================  ===========
    50          31.3 s                 2.6 s
    500         ~165 s (0.33 s/merge)  11.5 s
    5000        (~7 min* to exhaust)   38.2 s
    ==========  =====================  ===========

    (*the 961-word vocabulary exhausts at 1,264 merges; sequential
    extrapolated from its measured 0.33 s/merge steady rate, batched
    measured to the same exhaustion point.)  On chain-heavy corpora
    the adopted SEQUENCE differs from sequential's wherever a
    created pair would have outranked the round tail (e.g. sequential
    learns ('l','o') then ('lo','w'); a round of 4 adopts
    ('w','</w>') before ('lo','w') exists) — the tokenizer remains
    encoding-valid, and the differential test pins both the exact
    cases and the adversarial one.

    Scale posture unchanged from :func:`bpe_train`: one corpus shuffle
    builds the word-frequency table; every round after that is a
    vocabulary-table explode + groupBy (partial agg, pair space bounded
    by symbol inventory squared), a top-M collect bounded by
    ``4 * batch + 8`` rows, and one per-row batch fold; the vocab plane
    is eagerly checkpointed per round (O(1) logical plan, r6 lesson).
    """
    if n_merges < 1:
        raise ValueError("bpe_train_batched requires n_merges >= 1")
    if batch < 1:
        raise ValueError("bpe_train_batched requires batch >= 1")
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
    retired: DataFrame | None = None
    while len(merges) < n_merges:
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
        want = min(batch, n_merges - len(merges))
        # top-M collect, M bounded by config: enough headroom to find
        # `want` disjoint pairs even when the head of the count table
        # chains through shared symbols
        top = (pairs.filter(F.col("c") >= 2)
               .orderBy(F.col("c").desc(), "l", "r")
               .limit(4 * want + 8).collect())
        if retired is not None:
            # this round's collect materialized the lazy checkpoint of
            # the current vocab, so its predecessor is now free —
            # never sooner, or the fold would recompute from scratch
            release_plane(retired, "bpe")
            retired = None
        adopted = _adopt_disjoint(
            [(row["l"], row["r"]) for row in top], want)
        if not adopted:
            break
        merges.extend(adopted)
        if len(merges) >= n_merges:
            # the final round's successor vocab is never read (the
            # trainer returns merges only) — building and eagerly
            # checkpointing it was a pure wasted materialization
            # (r15, guide §1.2 "don't compute things you throw away")
            break
        # one fold applies the whole round; a LAZY checkpoint still
        # cuts lineage at materialization time (old checkpoint blocks
        # are freed by the ContextCleaner when the Python handle
        # rebinds) but folds the checkpoint write into the NEXT
        # round's top-M collect job instead of paying a dedicated job
        # per round (r15; mirrors the wordpiece trainer)
        retired = vocab
        vocab = vocab.select(
            "freq",
            _apply_merge_batch(F.col("sym"), adopted).alias("sym"),
        ).localCheckpoint(eager=False)
    return merges


# The expression path replays merges as NESTED per-row folds — one
# transform(aggregate(...)) layer PER MERGE — so the expression tree
# grows linearly in merges and hits the 64KB-codegen / plan-size cliff
# around a few hundred merges (VERDICT r7 #3).  Production merge
# tables are 30k-50k entries; beyond this threshold the merge list is
# applied as DATA in an Arrow-batched encoder instead.
EXPR_PATH_MAX_MERGES = 64


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]],
               id_col: str = "doc_id", text_col: str = "text",
               end_of_word: str = "</w>",
               engine: str = "auto") -> DataFrame:
    """Apply a learned merge list -> (id_col, tokens array<string>):
    split each word to characters + end-of-word, then replay the merges
    in order (Sennrich 2016 encode semantics — each merge applied
    greedily left-to-right, in learned order).

    ``engine``:

    - ``"expr"`` — pure Catalyst projection (one fold layer per
      merge).  JVM-side and shuffle-free, but the expression tree is
      O(merges) and falls off the codegen/plan-size cliff around a few
      hundred merges — only valid for small tables.
    - ``"arrow"`` — ``mapInPandas`` encoder applying the merge list as
      DATA (VERDICT r7 #4): per Arrow batch, each DISTINCT word is
      encoded once (sequential merge replay with an O(1) symbol-set
      skip per merge, then memoized), so the per-row cost is a cache
      lookup for every repeated word.  Plan size is O(1) in merges;
      this is the path a production tokenizer (30k-50k merges) runs.
      Still a pure per-row projection — no shuffle; the merge table
      ships once per task in the serialized closure (a few hundred KB
      at 30k merges).  Measured at sf0.1 (5k docs x ~170 tokens),
      1200 merges: 0.47-0.55s warm / 2.2s cold, local[32].
    - ``"auto"`` (default) — ``"expr"`` up to EXPR_PATH_MAX_MERGES
      (=64), ``"arrow"`` beyond.

    The two paths are differential-tested for identical output
    (tests/test_operators.py test_bpe_encode_arrow_matches_expr) —
    including multi-space/empty-word edges: Spark's split('', '')
    yields [''], so an empty word encodes to ['', end_of_word] on both
    paths.
    """
    if engine not in ("auto", "expr", "arrow"):
        raise ValueError(f"unknown bpe_encode engine {engine!r}")
    if engine == "auto":
        engine = "expr" if len(merges) <= EXPR_PATH_MAX_MERGES \
            else "arrow"
    if engine == "arrow":
        return _bpe_encode_arrow(docs, merges, id_col, text_col,
                                 end_of_word)
    word_sym = F.transform(
        F.split(F.col(text_col), " ", -1),
        lambda w: F.concat(F.split(w, "", -1).cast("array<string>"),
                           F.array(F.lit(end_of_word))),
    )
    out = word_sym
    for left, right in merges:
        out = _nested_apply(out, left, right)
    return docs.select(F.col(id_col), F.flatten(out).alias("tokens"))


def _encode_word(word: str, merges: list[tuple[str, str]],
                 end_of_word: str) -> list[str]:
    """Sequential merge replay for one word — the exact Python
    equivalent of :func:`_apply_merge` applied per merge in order
    (greedy left-to-right, non-overlapping; the merged symbol never
    re-pairs with its consumed right element within the same merge).
    The symbol-SET membership test skips merges whose parts are absent
    in O(1), which is what makes 30k-merge tables tractable: a short
    word intersects only a handful of them."""
    # Spark's split('', '') is [''] — keep the empty-word edge identical
    syms = list(word) if word else [""]
    syms.append(end_of_word)
    symset = set(syms)
    for left, right in merges:
        if left not in symset or right not in symset:
            continue
        out: list[str] = []
        i, n = 0, len(syms)
        changed = False
        while i < n:
            if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
                changed = True
            else:
                out.append(syms[i])
                i += 1
        if changed:
            syms = out
            symset = set(syms)
    return syms


def _bpe_encode_arrow(docs: DataFrame, merges: list[tuple[str, str]],
                      id_col: str, text_col: str,
                      end_of_word: str) -> DataFrame:
    import pandas as pd

    id_type = docs.schema[id_col].dataType.simpleString()
    merge_list = [(str(left), str(right)) for left, right in merges]

    def encode_batches(batches):
        # word cache lives for the whole TASK (across Arrow batches):
        # Zipf's law means most word occurrences hit the cache
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks = []
            for text in pdf[text_col]:
                if text is None:
                    # mirror the expr path: F.split(NULL) propagates a
                    # null tokens row instead of crashing the task
                    # (ADVICE r8 #2)
                    toks.append(None)
                    continue
                row: list[str] = []
                for w in text.split(" "):
                    enc = cache.get(w)
                    if enc is None:
                        enc = _encode_word(w, merge_list, end_of_word)
                        cache[w] = enc
                    row.extend(enc)
                toks.append(row)
            yield pd.DataFrame({id_col: pdf[id_col], "tokens": toks})

    return docs.select(id_col, text_col).mapInPandas(
        encode_batches, f"{id_col} {id_type}, tokens array<string>")


def _nested_apply(words_col, left: str, right: str):
    # closure factory (CLAUDE.md: default-arg capture in a HOF lambda
    # receives the array index)
    def apply_one(sym):
        return _apply_merge(sym, left, right)
    return F.transform(words_col, apply_one)
