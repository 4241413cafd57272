"""Greedy sequence packing (operators/packing.py)."""

from pyspark.sql import functions as F

from edsnlp_spark.operators.packing import pack_documents


def _mk(spark, rows):
    return spark.createDataFrame(rows, "note_id long, note_text string")


def test_packing_respects_budget_and_order(spark):
    docs = _mk(spark, [(i, " ".join(["w"] * n))
                       for i, n in enumerate([10, 20, 70, 5, 90, 15, 40])])
    out = pack_documents(docs, budget=100, n_shards=1).collect()
    by_id = {r.note_id: r for r in out}
    # greedy in id order: 10+20+70=100 | 5+90=95 | 15+40=55
    assert [by_id[i].pack_id for i in range(7)] == [0, 0, 0, 1, 1, 2, 2]
    sums = {}
    for r in out:
        sums[r.pack_id] = sums.get(r.pack_id, 0) + r.n_tokens
    assert all(s <= 100 for s in sums.values())


def test_packing_oversized_doc_gets_own_pack(spark):
    docs = _mk(spark, [(0, " ".join(["w"] * 300)),
                       (1, " ".join(["w"] * 10)),
                       (2, " ".join(["w"] * 300))])
    out = {r.note_id: r.pack_id
           for r in pack_documents(docs, budget=100, n_shards=1).collect()}
    assert out == {0: 0, 1: 1, 2: 2}


def test_packing_shards_are_independent(spark):
    docs = _mk(spark, [(i, " ".join(["w"] * 60)) for i in range(20)])
    out = pack_documents(docs, budget=120, n_shards=4).collect()
    for r in out:
        assert r.shard == r.note_id % 4
    # within a shard: 5 docs of 60 at budget 120 -> packs [0,0,1,1,2]
    for shard in range(4):
        packs = [r.pack_id for r in sorted(
            (x for x in out if x.shard == shard), key=lambda x: x.note_id)]
        assert packs == [0, 0, 1, 1, 2]


def test_packing_linear_on_many_docs_per_shard(spark):
    # > chunk size (64) docs in one shard: chunked fold stays exact
    docs = _mk(spark, [(i, " ".join(["w"] * 7)) for i in range(200)])
    out = pack_documents(docs, budget=21, n_shards=1).collect()
    packs = [r.pack_id for r in sorted(out, key=lambda x: x.note_id)]
    assert packs == [i // 3 for i in range(200)]
