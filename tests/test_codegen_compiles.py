"""Guard: the heavy expression trees actually COMPILE.

Whole-stage codegen silently falls back to interpreted eval when a
generated method exceeds the JVM's 64 KB limit — correctness survives
but the stage runs 5-10x slower, and `.count()`-based benches never see
it because column pruning removes the giant projections.  This suite
sets ``spark.sql.codegen.fallback=false`` so a codegen compile failure
raises instead of de-optimizing, and fully materializes (collect, no
pruning) the queries that historically overflowed:

* temporal_mentions' ~50-extract classification fused into a broadcast
  join doConsume (fixed: persisted compact plane in dates.py),
* history date_table's recency classification (fixed: persist barrier),
* history's per-boundary flag HOFs (fixed: let-bound derived arrays),
* quantity extractor trees referenced once per output column (fixed:
  let_bound + single inline()).

Adjacent .select()s are NOT a fix — Catalyst's ProjectCollapsing fuses
them back (see CLAUDE.md round-3 gotchas).
"""

import pytest

GUARDED = [
    "history_qualifier",
    "dates_extraction",
    "durations_extraction",
    "quantity_operators",
    "composed_units",
    "negation_tokens",
    "quantity_mentions",
    "corpus_curation",
    "gopher_repetition",
]


@pytest.fixture()
def strict_codegen(spark):
    old = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    yield spark
    spark.conf.set("spark.sql.codegen.fallback", old)


@pytest.mark.parametrize("name", GUARDED)
def test_query_compiles_under_strict_codegen(strict_codegen, sf_dir, name):
    from edsnlp_spark.queries import all_queries

    spark = strict_codegen
    fn, _ = all_queries()[name]
    # Full materialization on a sample: column pruning must not hide the
    # giant projections, and a compile failure must surface as an error.
    rows = fn(spark, sf_dir).limit(50).collect()
    assert len(rows) > 0
