"""Benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) and print ONE JSON line with per-query wall times.

Each query is fully materialized via a count-ish action (collect on
aggregates is small; larger outputs use count) so the measured time is
the real end-to-end plan execution, not lazy-plan construction.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from edsnlp_spark.queries import all_queries
from edsnlp_spark.session import get_spark

# Headline set: one per operator family (aggregation, join, window,
# sessionization, as-of, interval join, NLP pipeline, dedup, ANN).
# R1_SET is the round-1 headline set, reported separately as
# `value_r01_set` so cross-round totals stay comparable after the
# round-2 additions below.
R1_SET = [
    "pricing_summary",
    "revenue_by_nation",
    "top_orders_per_customer",
    "event_sessions",
    "purchase_asof_signup",
    "close_event_pairs",
    "phrase_match_tokens",
    "negation_tokens",
    "minhash_lsh_dedup",
    "embedding_topk",
    "doc_quality",
    "quantities_extraction",
]
HEADLINE = R1_SET + [
    # round-2 additions: real-dictionary lexicon join, full temporal
    # model, embedding near-dup pairs
    "drugs_lexicon_match",
    "durations_extraction",
    "embedding_neardup",
    # round-3 additions: 200k-form lexicon over the non-broadcast
    # (shuffle-hash) anchor join (the UMLS dictionary tier) and the
    # mention-level quantity engine (propagation windows + Arrow scan)
    "a0_umls_scale_match",
    "quantity_mentions",
    # round-3 continuation: the reference-exact sentence machine at
    # 150k docs, the three-evidence history combine, and the ADICAP
    # dictionary decode (11 broadcast dim joins)
    "a0_sentence_boundaries",
    "history_qualifier",
    "adicap_decode",
    # round-3 session-2: training-data pipeline additions — PII scrub
    # (pure codegen projection), benchmark decontamination (shingle
    # broadcast join), sequence packing (sharded greedy fold)
    "pii_redaction",
    "decontamination_overlap",
    "a0_sequence_packing",
    # the composed curation pass (quality -> dedup -> PII -> split ->
    # pack in one Catalyst plan)
    "corpus_curation",
    # round-6 additions: span-granular exact-substring dedup, BM25
    # lexical retrieval, PQ-compressed ADC ANN and the composed IVF-PQ
    "exact_substring_dedup",
    "bm25_search",
    "pq_adc_topk",
    "embedding_topk_ivfpq",
    # round-7 additions: the bigram-LM perplexity filter (driver-green
    # since r6 but unbenched — VERDICT r6 #4), batch BM25 (inverted
    # index, queries as a DataFrame), and exact-substring span removal
    "bigram_logppl",
    "bm25_search_batch",
    "a0_strip_duplicated_spans",
    "dsir_selection",
    "hll_distinct_windows",
    "a0_winnowing_fp",
    "ccnet_buckets",
    "cms_token_counts",
    "diversity_sample",
    "cross_corpus_dedup",
    "bpe_encoding",
    "a0_source_divergence",
    "bm25_eval_metrics",
    # round-8 additions: curation with span-granular dedup, the
    # HLL-composed source vocabulary monitor, TF-IDF keywords
    "a0_corpus_curation_strip",
    "a0_source_vocab_saturation",
    "a0_tfidf_keywords",
    "a0_knn_label_propagation",
    "a0_simhash_neardup_capped",
    "a0_badwords_filter",
    "a0_weighted_doc_sample",
    "a0_document_chunking",
    "a0_tokenizer_fertility",
    "a0_bigram_pmi",
    "a0_corpus_length_profile",
    "a0_dedup_recall_eval",
    # round-9 additions: RRF hybrid retrieval (both index tiers in one
    # plan), the real linear+CRF Viterbi NER head, Bloom-filter
    # decontamination, contrastive hard-negative mining, the
    # duplication-profile rollup and temperature mixture sampling
    "a0_hybrid_retrieval",
    "a0_ner_crf_viterbi",
    "a0_bloom_decontamination",
    "a0_contrastive_pairs",
    "a0_duplication_profile",
    "a0_temperature_mixture",
    # round-10 additions: the persisted-index ANN read path (IVFADC-R
    # over cell-partitioned saved codes; the one-time index build is
    # paid in whichever consumer runs first COLD — warm times are the
    # search half only), and the trained language-ID scorer (an
    # integer-quantized perceptron export running as a pure projection)
    "a0_ivfpq_indexed_search",
    "a0_langid_trained",
    "a0_cross_minhash_dedup",
    # full tokenizer lifecycle: RETRAINS 128 batched merges + arrow
    # encode every run by design (~6.5s warm at sf0.1 — the cost IS
    # two training rounds; the encode alone is ~0.5s)
    "a0_bpe_lifecycle",
    # round-10 session-2 additions: positional phrase search (postings
    # intersection), integer-exact PageRank (RETRAINS nothing but runs
    # 8 checkpointed iterations over the 1995 co-purchase graph), MMR
    # result diversification, and the unigram-LM tokenizer lifecycle
    # (RETRAINS 2 hard-EM rounds per run by design, like bpe_lifecycle)
    "a0_phrase_search",
    "a0_pagerank_copurchase",
    "a0_mmr_diversified_search",
    "a0_unigram_tokenizer",
    # ROUGE-N eval metrics + BM25 over the persisted inverted index
    # (the indexed path pays the one-time build in whichever run is
    # first COLD, like a0_ivfpq_indexed_search)
    "a0_rouge_overlap",
    "a0_bm25_indexed_search",
    "a0_length_quantiles",
    "a0_chunk_retrieval",
    "a0_clustering_coefficient",
    "a0_related_parts_ppr",
    "a0_multimodal_decode",
    "a0_graph_walks",
    # round-11 additions: trained graph embeddings (RETRAINS the full
    # walks -> pairs -> association -> power-iteration pipeline per
    # run by design), ANN over the trained vectors, incremental
    # component resolution, the distilled negation head (RETRAINS 8
    # perceptron epochs per run), stdlib-zlib PNG decode (all 5
    # filters) and integer-Goertzel WAV spectral probes
    "a0_graph_embeddings",
    "a0_trained_ann_topk",
    "a0_dedup_components_incremental",
    "a0_negation_distillation",
    "a0_png_decode",
    "a0_wav_spectral",
    # WordPiece lifecycle (RETRAINS 48 merges per run by design, like
    # its BPE/unigram siblings)
    "a0_wordpiece_lifecycle",
    # ROUGE-L (order-sensitive LCS eval; 64-token-truncated Arrow dp)
    "a0_rouge_l",
    # round-12 additions: baseline JPEG decode (huffman + IDCT +
    # exact-int color), the migrated trained-vector similarity tier,
    # and ingest-shaped incremental components (the
    # a0_dedup_components_incremental row above now times the
    # band-index probe path; its best re-baselines on first run)
    "a0_jpeg_decode",
    "a0_dedup_keeper_election",
    # round-13 additions: the last pytest-only misc pipes (tables /
    # reason+consultation_dates / pollution-strip -> suicide matcher),
    # MJPEG-in-MP4 container decode, and the ingest-shaped keeper
    # election over the persisted keeper index
    "a0_table_cells",
    "a0_note_dates",
    "a0_suicide_pollution",
    "a0_mp4_frames",
    "a0_dedup_keeper_incremental",
    "a0_quality_auc",
]

# Timed and reported, but OUTSIDE the headline total / regression gate
# (VERDICT r8 #3): the narrow (7,8)-simhash config is known-superlinear
# BY MATH on clone-heavy data (2^8 values/band; its 10x OUTPUT itself
# grows ~112x) — it exists as a stress/eval configuration; the
# production scale path is a0_simhash_neardup_capped (Manku config,
# headline).  Keeping it in the headline set unannotated would let one
# eval-config query dominate the longitudinal total.
EVAL_ONLY = [
    "a0_simhash_neardup",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="edsnlp-spark-bench")
    qs = all_queries()

    # Warm the JVM/codegen paths once so per-query times reflect steady
    # state (the driver measures the same process repeatedly).
    spark.range(1).count()

    # Host-speed calibration (r8): a fixed CPU-bound JVM probe whose
    # cost is independent of this repo's code.  Shared-host load has
    # produced phantom regression flags in 4 of 7 rounds (r8: 9 flags,
    # ALL on plans untouched for 1-8 rounds, incl. r1-era
    # pricing_summary at 1.72x); comparing calib_sec against the value
    # recorded alongside each bench_best era tells "slow host" apart
    # from "slow code" — read flags against the calibration ratio.
    def _cpu_probe(k: int = 3) -> tuple[float, list[float]]:
        samples = []
        for _ in range(k):
            t0 = time.perf_counter()
            spark.range(400_000_000).selectExpr(
                "sum(id * 3 % 7) as s").collect()
            samples.append(time.perf_counter() - t0)
        return round(min(samples), 3), samples

    calib_sec, calib_samples = _cpu_probe()
    # Second probe, SHUFFLE/memory-bound: the arithmetic probe misses
    # memory-bandwidth contention (observed r8: calib_ratio 1.0 while
    # two runs 90 min apart differed 15% across the board and flags
    # came and went on untouched plans) — a hash-aggregate exchange
    # feels exactly that kind of neighbor.
    shuffle_samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(50_000_000).selectExpr("id % 1000000 as k") \
            .groupBy("k").count().count()
        shuffle_samples.append(time.perf_counter() - t0)
    calib_shuffle_sec = round(min(shuffle_samples), 3)
    print(f"# host calibration: cpu {calib_sec}s "
          f"(samples {[round(s, 3) for s in calib_samples]}), "
          f"shuffle {calib_shuffle_sec}s "
          f"(samples {[round(s, 3) for s in shuffle_samples]})",
          file=sys.stderr)

    # Mid-run calibration re-probes (VERDICT r11 #1): the one-shot
    # start-of-run calib is blind to load waves that arrive mid-bench
    # (r11: 12 flags on untouched plans at start-calib 1.12; the r11c
    # discard showed the failure mode exactly).  A cheap 1-sample cpu
    # probe fires at the loop midpoint and at the end, so every flag
    # can be read against host speed AT (roughly) flag time.
    calib_marks: list[tuple[str, float]] = [("start", calib_sec)]

    times: dict[str, float] = {}
    cold: dict[str, float] = {}
    midpoint = len(HEADLINE) // 2
    for qi, name in enumerate(HEADLINE):
        if qi == midpoint:
            mid_sec, _ = _cpu_probe(k=1)
            calib_marks.append(("mid", mid_sec))
            print(f"# mid-run calib: cpu {mid_sec}s", file=sys.stderr)
        fn, _ = qs[name]
        # Cold run includes codegen/compile of the query's expression
        # tree; the warm number is the BEST of two steady-state runs —
        # a single sample is hostage to host-load spikes (observed 2-3x
        # swings on a shared box), and min-of-2 is the standard defense.
        # Cache cleared between runs so internally-persisted tables
        # don't cross-contaminate.
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        cold[name] = round(time.perf_counter() - t0, 3)
        warm = []
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            warm.append(time.perf_counter() - t0)
        times[name] = round(min(warm), 3)
        print(f"# {name}: warm {times[name]}s / cold {cold[name]}s ({n} rows)",
              file=sys.stderr)

    # eval-only configs: timed identically, reported separately, never
    # in the total or the regression gate (see EVAL_ONLY above)
    eval_times: dict[str, float] = {}
    for name in EVAL_ONLY:
        fn, _ = qs[name]
        spark.catalog.clearCache()
        fn(spark, sf_dir).count()  # codegen warm-up
        warm = []
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            warm.append(time.perf_counter() - t0)
        eval_times[name] = round(min(warm), 3)
        print(f"# eval-only {name}: warm {eval_times[name]}s",
              file=sys.stderr)

    # Regression guard: compare each warm time against the best recorded
    # run (bench_best.json, committed) and flag >1.3x slowdowns loudly,
    # so breadth additions can't silently tax the hot paths.  The best
    # file only updates when a query improves.
    best_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_best.json")
    best: dict[str, float] = {}
    if os.path.exists(best_path):
        with open(best_path) as f:
            best = {k: float(v) for k, v in json.load(f).items()}
    # "__calib__" in bench_best.json records the FASTEST host probe
    # ever seen; calib_ratio > ~1.3 means the whole host is that much
    # slower than the bests' era and same-sized query flags are load,
    # not code.
    calib_best = best.get("__calib__", calib_sec)
    calib_ratio = round(calib_sec / calib_best, 2) if calib_best else None
    shuffle_best = best.get("__calib_shuffle__", calib_shuffle_sec)
    calib_shuffle_ratio = round(calib_shuffle_sec / shuffle_best, 2) \
        if shuffle_best else None
    print(f"# calib ratio vs best host: cpu {calib_ratio}x, "
          f"shuffle {calib_shuffle_ratio}x", file=sys.stderr)
    # Calib-aware flag gate (r14, VERDICT r13 #7): per-query bests were
    # recorded across host eras; on a host measuring calib_ratio > 1 a
    # flat 1.3x gate sprays unactionable flags (r13: 30 flags, all
    # host-era; the idle-host run-4 datum proved the host CLASS floors
    # ~1.5x above the __calib__ era).  The gate scales by the measured
    # start-of-run cpu calib ratio — raw per-query ratios stay in the
    # artifact unchanged, so the driver still sees absolute slowdowns;
    # only the flag/probe machinery stops chasing host speed.
    # ADVICE r14 #2: the scaling is CAPPED at 1.5x — on a persistently
    # 2x-loaded host an uncapped gate would silently de-flag a genuine
    # 1.5x code regression for the whole run — and queries that exceed
    # the flat 1.3x bar but not the scaled gate are emitted as a
    # separate `watch` list instead of being dropped entirely.
    flag_gate = 1.3 * min(max(1.0, calib_ratio or 1.0), 1.5)
    print(f"# flag gate: {round(flag_gate, 2)}x of best "
          f"(1.3 x min(max(1, cpu calib), 1.5))", file=sys.stderr)
    regressions = {
        name: {"warm": t, "best": best[name],
               "ratio": round(t / best[name], 2)}
        for name, t in times.items()
        if name in best and best[name] > 0.05 and t > flag_gate * best[name]
    }
    watch = {
        name: round(t / best[name], 2)
        for name, t in times.items()
        if name in best and best[name] > 0.05
        and 1.3 * best[name] < t <= flag_gate * best[name]
    }
    if watch:
        print(f"# watch (above 1.3x, de-flagged by calib): "
              f"{watch}", file=sys.stderr)
    # Single samples carry lucky/unlucky bias at EVERY magnitude: a
    # 0.165s "best" vs a ~0.30s steady-state floor flags a phantom
    # 1.8x (r4), embedding_neardup repro'd it at 1-2s (r6/r7), and a
    # host spike during one r7 run inflated simhash_neardup's
    # best-of-2 to 2.6x (6-run probe immediately showed the 2.05s
    # steady state).  So: EVERY flagged regression gets a 6-run
    # re-probe; the flag survives only if the distribution MIN still
    # exceeds the threshold.  Probe cost is bounded — it only runs for
    # flagged queries.
    # bench_best.json must stay best-of-2 for EVERY query — probe minima
    # (best-of-8) would ratchet sub-second bests toward lucky outliers,
    # re-creating the phantom-regression bias the probe exists to
    # correct (ADVICE r5) — so 'improved' is computed from the
    # pre-probe times.
    end_sec, _ = _cpu_probe(k=1)
    calib_marks.append(("end", end_sec))
    print(f"# end-of-run calib: cpu {end_sec}s", file=sys.stderr)

    pre_probe_times = dict(times)
    for name in list(regressions):
        fn, _ = qs[name]
        # host speed AT PROBE TIME, so the flag is adjudicated against
        # the load that actually surrounded its samples
        probe_calib, _ = _cpu_probe(k=1)
        regressions[name]["calib_at_probe"] = (
            round(probe_calib / calib_best, 2) if calib_best else None)
        samples = []
        for _ in range(6):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        probe_min = round(min(samples), 3)
        print(f"# probe6 {name}: min {probe_min}s "
              f"(calib_at_probe {regressions[name]['calib_at_probe']}x, "
              f"samples {[round(s, 3) for s in samples]})", file=sys.stderr)
        times[name] = min(times[name], probe_min)
        if probe_min <= flag_gate * best[name]:
            del regressions[name]
        else:
            # report the same value written to times — a probe_min
            # WORSE than the best-of-2 warm time must not overwrite it
            # (ADVICE r5: internally inconsistent report)
            regressions[name]["warm"] = times[name]
            regressions[name]["ratio"] = round(times[name] / best[name], 2)
    improved = {name: t for name, t in pre_probe_times.items()
                if name not in best or t < best[name]}
    if calib_sec < best.get("__calib__", float("inf")):
        improved["__calib__"] = calib_sec
    if calib_shuffle_sec < best.get("__calib_shuffle__", float("inf")):
        improved["__calib_shuffle__"] = calib_shuffle_sec
    if improved and os.environ.get("SPARK_GRAFT_FREEZE_BEST") != "1":
        best.update(improved)
        with open(best_path, "w") as f:
            json.dump(best, f, indent=1, sort_keys=True)
    for name, r in regressions.items():
        print(f"# REGRESSION {name}: {r['warm']}s vs best {r['best']}s "
              f"({r['ratio']}x)", file=sys.stderr)

    # Scale evidence (r4): when the 10x replica exists (generated by
    # scripts/gen_scale10x.py into .scale10x/, gitignored), run the five
    # heaviest queries against it once — codegen is already warm from
    # the sf0.1 loop, so the measured ratio is the DATA-scale curve, not
    # compile time.  Near-linear (ratio <= ~12x for 10x rows) is the
    # pass bar; SCALE.md records the analysis.
    scale_set = ["history_qualifier", "durations_extraction",
                 "negation_tokens", "a0_sentence_boundaries",
                 "quantity_mentions",
                 # r7 (VERDICT r6 #3): the round-6 heavies get timed 10x
                 # ratios, not just SCALE_SWEEP correctness
                 "embedding_topk_ivfpq", "pq_adc_topk",
                 "exact_substring_dedup", "bm25_search", "bigram_logppl",
                 # r8 (VERDICT r7 #6): timed 10x ratios for the r7
                 # heavies too.  a0_simhash_neardup's ratio (~32x) is
                 # the 8-bit-block config's inherent candidate density
                 # on the duplicate-heavy replica (its OUTPUT pair set
                 # itself grows ~800x there); a0_simhash_neardup_capped
                 # is the Manku-config scale path (~4x) — see SCALE.md.
                 "a0_simhash_neardup", "a0_simhash_neardup_capped",
                 "dsir_selection",
                 "a0_source_divergence", "a0_winnowing_fp",
                 "bm25_search_batch",
                 # r9: timed 10x ratios for the round's two heavies
                 "a0_hybrid_retrieval", "a0_ner_crf_viterbi",
                 # r10: the session-2 heavies — 8 checkpointed PageRank
                 # iterations and the retraining unigram lifecycle
                 "a0_pagerank_copurchase", "a0_unigram_tokenizer",
                 # r11: the retraining embedding pipeline, the indexed
                 # chunk-retrieval read path (VERDICT r10 #2's 'done'
                 # bar: the 10x ratio must drop from corpus-linear to
                 # the indexed profile) and incremental components
                 "a0_graph_embeddings", "a0_chunk_retrieval",
                 "a0_dedup_components_incremental",
                 # r15 (VERDICT r14 #8): the query whose r13 plan was
                 # the single-task global-window hazard — its 10x ratio
                 # is the proof the partitioned-prefix fix banks at
                 # scale — plus the reworked tokenizer lifecycles
                 "a0_quality_auc", "a0_bpe_lifecycle",
                 "a0_wordpiece_lifecycle"]
    scale_dir = os.environ.get(
        "SPARK_GRAFT_SCALE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".scale10x"))
    scale_10x: dict[str, dict] = {}
    if os.path.isdir(scale_dir) and \
            os.environ.get("SPARK_GRAFT_SKIP_SCALE") != "1":
        for name in scale_set:
            fn, _ = qs[name]
            # best-of-2 like the sf0.1 loop: a single 10x sample under a
            # shared-host load spike once inflated a 7x ratio to 19x
            samples = []
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                n = fn(spark, scale_dir).count()
                samples.append(time.perf_counter() - t0)
            secs = round(min(samples), 3)
            base = times.get(name) or eval_times.get(name)
            scale_10x[name] = {
                "sec": secs,
                "ratio_vs_sf01": round(secs / base, 2) if base else None,
                "rows": n,
            }
            print(f"# scale10x {name}: {secs}s "
                  f"({scale_10x[name]['ratio_vs_sf01']}x vs sf0.1, "
                  f"{n} rows)", file=sys.stderr)

    total = round(sum(times.values()), 3)
    worst_regression = None
    if regressions:
        worst_name = max(regressions, key=lambda n: regressions[n]["ratio"])
        worst_regression = {"query": worst_name, **regressions[worst_name]}
    # Compact summary: the driver captures only the last 2000 chars of
    # stdout, so the LAST line must stay well under that (r4's ~4 KB
    # line left BENCH_r04.parsed null).  Full per-query detail (cold
    # times, regression table, scale_10x rows) goes to BENCH_DETAIL.json
    # next to this script.
    summary = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "total_cold": round(sum(cold.values()), 3),
        "value_r01_set": round(sum(times[n] for n in R1_SET), 3),
        "n_queries": len(times),
        "calib_sec": calib_sec,
        "calib_ratio": calib_ratio,
        "calib_shuffle_sec": calib_shuffle_sec,
        "calib_shuffle_ratio": calib_shuffle_ratio,
        # mid-run load visibility (VERDICT r11 #1): cpu probe at the
        # headline midpoint and end, as (label, sec) pairs
        "calib_marks": calib_marks,
        "flag_gate": round(flag_gate, 2),
        "n_regressions": len(regressions),
        "worst_regression": worst_regression,
        "eval_only": eval_times,
        "scale_10x_max_ratio": max(
            (r["ratio_vs_sf01"] for name, r in scale_10x.items()
             if r["ratio_vs_sf01"] and name not in EVAL_ONLY),
            default=None),
        # VERDICT r14 #5a: the sf0.1 8-vs-32-core ratios are overhead-
        # dominated (fixed costs, not parallel fraction).  The driver
        # reruns this bench at a lower core count; the 10x-replica
        # scale-set total is the number whose low-vs-high-core ratio
        # actually measures parallel fraction, so it rides the summary
        # line as ONE scalar.
        "scale_10x_total": round(
            sum(r["sec"] for name, r in scale_10x.items()
                if name not in EVAL_ONLY), 3) if scale_10x else None,
        # the eval-only configs' ratios, kept visible but separate —
        # the narrow simhash's superlinearity is documented, not a
        # regression (SCALE.md)
        "scale_10x_max_ratio_eval_only": max(
            (r["ratio_vs_sf01"] for name, r in scale_10x.items()
             if r["ratio_vs_sf01"] and name in EVAL_ONLY),
            default=None),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    detail = dict(summary, queries_cold=cold, regressions=regressions,
                  scale_10x=scale_10x)
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    spark.stop()
    # The summary must be the LAST stdout line, must parse, and must fit
    # the driver's tail capture (last 2000 chars; r4's ~4KB line left
    # BENCH_r04.parsed null).  Self-validate both, flush stderr first,
    # then emit.  If the per-query map pushes the line over budget,
    # keep only the slowest queries in the line (the full map is always
    # in BENCH_DETAIL.json, and `full_map` names that file) rather than
    # failing or overflowing.
    # VERDICT r14 #5b: pure slowest-N truncation made the round-over-
    # round comparison lie by omission — a query that got FASTER fell
    # out of the window and showed as "dropped", while the slower query
    # it displaced showed as "new".  The truncation now always RETAINS
    # every name present in the previous committed round's summary (so
    # the comparison's common set never loses an improved query), and
    # the line is emitted compact to buy the extra entries room.
    summary["full_map"] = os.path.basename(detail_path)
    prev_names: set[str] = set()
    try:
        import glob as _glob
        import re as _re
        benches = sorted(
            _glob.glob(os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "BENCH_r[0-9]*.json")),
            key=lambda p: int(_re.search(r"r(\d+)", p).group(1)))
        if benches:
            with open(benches[-1]) as f:
                prev = json.load(f)
            prev_names = set((prev.get("parsed") or {})
                             .get("queries", {}))
    except Exception:
        prev_names = set()

    def _dump(s: dict) -> str:
        return json.dumps(s, separators=(",", ":"))

    # Degrade ladder when the line overflows: (1) shrink the slowest-N
    # window; (2) drop purely-diagnostic fields from the LINE (they all
    # stay in BENCH_DETAIL.json) — measured: retention + the full field
    # set lands ~30 chars over budget, so this step is what usually
    # saves the retention; (3) only as a last resort give up prev-name
    # retention.
    droppable = ["worst_regression", "calib_marks",
                 "scale_10x_max_ratio_eval_only", "eval_only",
                 "calib_shuffle_sec", "calib_shuffle_ratio"]
    line = _dump(summary)
    keep_n = len(summary["queries"])
    retain_prev = True
    while len(line) >= 1500 and keep_n > 10:
        keep_n = max(10, keep_n - 5)
        slowest = dict(sorted(times.items(), key=lambda kv: -kv[1])
                       [:keep_n])
        if retain_prev:
            # previous-round names survive the cut so the driver's
            # round-over-round common set never loses an improved query
            slowest.update({n: times[n] for n in prev_names
                            if n in times})
        summary["queries"] = slowest
        summary["queries_truncated_to_slowest"] = len(slowest)
        line = _dump(summary)
        if keep_n == 10 and len(line) >= 1500:
            if droppable:
                summary.pop(droppable.pop(0), None)
                line = _dump(summary)
                keep_n = 15  # re-enter the loop for one more pass
            elif retain_prev:
                # diagnostics gone and retention alone still blows the
                # budget: degrade to pure slowest-N rather than overflow
                retain_prev = False
                keep_n = len(times)
    json.loads(line)
    assert len(line) < 1500, f"bench summary line too long: {len(line)}"
    print(f"# detail -> {detail_path} ({len(json.dumps(detail))} bytes); "
          f"summary line {len(line)} chars", file=sys.stderr)
    sys.stderr.flush()
    sys.stdout.flush()
    print(line, flush=True)


if __name__ == "__main__":
    main()
