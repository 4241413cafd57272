"""Physical-plan assertions: the 100 TB posture is checked, not assumed.

Each test reads `.explain` output of a headline query and asserts the
plan property that matters at scale: filter pushdown to parquet, column
pruning, broadcast joins for dims, and no Python (BatchEvalPython /
ArrowEvalPython) in native paths.
"""

from __future__ import annotations

import pytest

from edsnlp_spark.queries import all_queries

QS = all_queries()


def plan_of(spark, sf_dir, name) -> str:
    df = QS[name][0](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def explain_formatted(spark, sf_dir, name) -> str:
    df = QS[name][0](spark, sf_dir)
    return spark.sparkContext._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_pricing_summary_pushdown_and_pruning(spark, sf_dir):
    s = explain_formatted(spark, sf_dir, "pricing_summary")
    # shipdate filter reaches the parquet scan
    assert "PushedFilters" in s and "l_shipdate" in s.split("PushedFilters", 1)[1]
    # unused columns (l_orderkey etc.) are pruned from the read schema
    read_schema = s.split("ReadSchema", 1)[1].splitlines()[0]
    assert "l_orderkey" not in read_schema and "l_comment" not in read_schema


def test_revenue_by_nation_broadcasts_dims(spark, sf_dir):
    s = plan_of(spark, sf_dir, "revenue_by_nation")
    assert s.count("BroadcastHashJoin") >= 2  # nation and region at least


def test_native_queries_have_no_python_stage(spark, sf_dir):
    for name in ("pricing_summary", "revenue_by_nation", "event_sessions",
                 "purchase_asof_signup", "phrase_match_tokens",
                 "negation_tokens", "minhash_lsh_dedup", "embedding_topk",
                 "filter_spans_greedy", "dates_extraction",
                 "quantities_extraction", "simhash_fingerprints"):
        s = plan_of(spark, sf_dir, name)
        assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s \
            and "MapInPandas" not in s, f"{name} has a Python stage"


def test_phrase_match_terms_join_is_broadcast(spark, sf_dir):
    s = plan_of(spark, sf_dir, "phrase_match_tokens")
    assert "BroadcastHashJoin" in s


def test_wholestage_codegen_present(spark, sf_dir):
    # AQE only finalizes (and shows codegen stages) after execution.
    df = QS["pricing_summary"][0](spark, sf_dir)
    df.collect()
    s = df._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes mark WholeStageCodegen stages in the plan string
    assert "*(1)" in s and "*(2)" in s, s[:400]


def test_r2_queries_plan_shapes(spark, sf_dir):
    """Round-2 operators keep the scale posture: equi-joins (broadcast
    at this SF) for candidate generation, no cartesian products, and
    the stop-shingle capped Jaccard never goes all-pairs."""
    for name in ("embedding_neardup", "ngram_jaccard_capped",
                 "drugs_lexicon_match", "quantity_operators"):
        s = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in s, f"{name} went all-pairs"
        assert "BroadcastNestedLoopJoin" not in s, f"{name} nested-loop"
    # near-dup candidates come from a bucket equi-join
    s = plan_of(spark, sf_dir, "embedding_neardup")
    assert "BroadcastHashJoin" in s or "SortMergeJoin" in s


def test_quantity_operators_native(spark, sf_dir):
    s = plan_of(spark, sf_dir, "quantity_operators")
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s \
        and "MapInPandas" not in s


def test_umls_scale_no_broadcast(spark, sf_dir):
    """The 200k-form lexicon tier must NOT broadcast the terms table:
    the anchor join is a shuffle-hash join (hinted), which is the only
    place a ShuffledHashJoin can appear in this plan."""
    s = plan_of(spark, sf_dir, "a0_umls_scale_match")
    assert "ShuffledHashJoin" in s, "anchor join lost the shuffle_hash hint"
    # the terms range-generator side must not appear under a broadcast
    assert "BroadcastExchange" not in s.split("ShuffledHashJoin")[1][:2000] \
        or "Range" not in s.split("ShuffledHashJoin")[1][:500]


def test_domain_queries_native_and_broadcast(spark, sf_dir):
    # these round-3 domain queries stay JVM-side end-to-end (including
    # reported_speech: a plain quotation regex routes through the native
    # locate fold — only zero-width patterns take the exact Arrow path,
    # which is why history_qualifier is exempt: its date regexes carry
    # \b and deliberately run exact)
    for name in ("a0_tnm_mentions", "adicap_decode", "charlson_scores",
                 "a0_sentence_boundaries", "family_tokens",
                 "reported_speech_tokens"):
        s = plan_of(spark, sf_dir, name)
        assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s \
            and "MapInPandas" not in s, f"{name} has a Python stage"
    # the 11 adicap dim lookups are all broadcast map-side joins
    s = plan_of(spark, sf_dir, "adicap_decode")
    assert s.count("BroadcastHashJoin") >= 11
    # the history date leg is pre-gated by the cheap digit rlike before
    # the multi-family regex pass
    s = plan_of(spark, sf_dir, "history_qualifier")
    assert "RLIKE" in s or "rlike" in s


def test_quantity_mentions_plan_shape(spark, sf_dir):
    """Mention engine: no cartesian products; the propagation windows
    partition by note_id (bounded state), and only the 64-char prefix
    window rides the shuffle, not the document text."""
    s = plan_of(spark, sf_dir, "quantity_mentions")
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s
    assert "__prefix" in s and "__norm" not in s.split("Window")[0]


def test_gopher_repetition_is_shuffle_free(spark, sf_dir):
    # r4: per-doc repetition stats are an in-row sorted-run fold — the
    # plan must have NO hash-partition Exchange (the old (doc, gram)
    # groupBy shuffled one row per distinct bigram).  The only allowed
    # Exchange is the round-robin repartition that spreads the small
    # local parquet split across cores.
    s = plan_of(spark, sf_dir, "gopher_repetition")
    assert "hashpartitioning" not in s
    assert "HashAggregate" not in s and "SortAggregate" not in s


def test_gopher_line_repetition_is_shuffle_free(spark, sf_dir):
    s = plan_of(spark, sf_dir, "gopher_line_repetition")
    assert "hashpartitioning" not in s
    assert "HashAggregate" not in s and "SortAggregate" not in s


def test_bm25_batch_plan_shape(spark, sf_dir):
    """r7: the inverted-index batch BM25 must (a) broadcast the query
    side into the postings join (never shuffle the corpus by term for
    a small query set), (b) plan the per-query top-k as a bounded
    window, and (c) have no cartesian product."""
    s = plan_of(spark, sf_dir, "bm25_search_batch")
    assert "BroadcastHashJoin" in s
    assert "CartesianProduct" not in s
    from edsnlp_spark.core import caching
    caching.release("retrieval")


def test_strip_duplicated_spans_plan_shape(spark, sf_dir):
    """r7: keeper election must be a (partial) hash aggregate on the
    window hash, never a Window.partitionBy(h) — the hot-boilerplate
    skew rule from VERDICT r6 #2 applies to the removal half too; and
    reconstruction joins LEFT so untouched docs pass through."""
    s = plan_of(spark, sf_dir, "a0_strip_duplicated_spans")
    assert "partial_count" in s or "HashAggregate" in s
    # the only Window ops allowed are none — ranges merge via
    # collect_set, not a per-hash window
    assert "Window" not in s
    from edsnlp_spark.core import caching
    caching.release("dedup")


def test_dsir_plan_shape(spark, sf_dir):
    """r7: DSIR's top-k must plan as TakeOrderedAndProject (per-
    partition heaps), the ratio table must broadcast, and the corpus
    must never cross-join anything its own size."""
    s = plan_of(spark, sf_dir, "dsir_selection")
    assert "TakeOrderedAndProject" in s
    assert "BroadcastHashJoin" in s
    assert "CartesianProduct" not in s
    from edsnlp_spark.core import caching
    caching.release("selection")


def test_hll_plan_is_one_small_exchange(spark, sf_dir):
    """r7: the HLL register aggregation exchanges at most 2^p rows —
    the plan is scan -> partial agg -> exchange -> final agg with no
    join and no window."""
    s = plan_of(spark, sf_dir, "hll_distinct_windows")
    assert "Join" not in s and "Window" not in s
    assert "HashAggregate" in s


def test_source_vocab_saturation_plan_shape(spark, sf_dir):
    """r8 (VERDICT r7 #8): the composed sketch stage must keep the HLL
    scale shape inside the pipeline — register state partially
    aggregated map-side (HashAggregate on (src, idx), bounded by
    sources x 2^p rows per task), totals carried IN the register rows
    (no second corpus scan, no join), no window, no cartesian."""
    s = plan_of(spark, sf_dir, "a0_source_vocab_saturation")
    assert "Join" not in s and "Window" not in s
    assert "CartesianProduct" not in s
    assert "HashAggregate" in s
    # one scan of documents only — totals ride the register aggregate
    assert s.count("Scan parquet") == 1


def test_r9_candidate_joins_are_equi_joins(spark, sf_dir):
    """r9 plan pins: the Bloom probe, the contrastive cell join and the
    RRF fusion must all plan as EQUI-joins — a CartesianProduct or
    BroadcastNestedLoopJoin anywhere means a candidate generator lost
    its key and went corpus-quadratic."""
    for name in ("a0_bloom_decontamination", "a0_contrastive_pairs",
                 "a0_hybrid_retrieval", "a0_duplication_profile"):
        s = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in s, name
        if name == "a0_hybrid_retrieval":
            # the BM25 tier deliberately crossJoins two 1-ROW broadcast
            # stat tables (n_docs/sum_dl, then the df-enriched totals);
            # those plan as BroadcastNestedLoopJoin and are bounded by
            # construction — anything beyond them is a real bug
            assert s.count("BroadcastNestedLoopJoin") <= 2, name
        else:
            assert "BroadcastNestedLoopJoin" not in s, name


def test_temperature_mixture_is_two_pass(spark, sf_dir):
    """The mixture filter must be a projection over a broadcast quota
    table — no corpus-sized shuffle (the per-source count aggregate is
    the only exchange of corpus rows)."""
    s = plan_of(spark, sf_dir, "a0_temperature_mixture")
    assert "BroadcastHashJoin" in s
    assert "CartesianProduct" not in s


def test_ner_crf_is_single_python_stage(spark, sf_dir):
    """The CRF head is ONE Arrow-batched python stage (the numpy
    forward+decode), never row-at-a-time BatchEvalPython."""
    s = plan_of(spark, sf_dir, "a0_ner_crf_viterbi")
    assert s.count("MapInPandas") == 1
    assert "BatchEvalPython" not in s
