"""IVF ANN: recall vs exact brute force must be high at n_probe=3/8."""

from pyspark.sql import functions as F

from edsnlp_spark.operators.similarity import brute_force_topk, ivf_topk
from edsnlp_spark.queries.relational import _t


def test_ivf_recall_vs_exact(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    exact = brute_force_topk(emb, queries, k=10)
    approx = ivf_topk(emb, queries, k=10, n_cells=8, n_probe=3)
    e = {(r["q_id"], r["n_id"]) for r in exact.collect()}
    a = {(r["q_id"], r["n_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # approx candidates are a subset of the corpus, ranked consistently
    assert all(r["rank"] >= 1 for r in approx.collect())


def test_cosine_neardup_bucketed(spark):
    """cosine_neardup finds same-bucket near-identical pairs with exact
    cosine, and never emits a pair whose signatures differ."""
    from edsnlp_spark.operators.similarity import cosine_neardup

    planes = [[1.0 if j == i else 0.0 for j in range(4)] for i in range(2)]
    rows = [
        (1, [1.0, 0.2, 0.0, 0.0]),   # bucket 11
        (2, [1.0, 0.21, 0.0, 0.0]),  # bucket 11, near-dup of 1
        (3, [-1.0, 0.2, 0.0, 0.0]),  # bucket 01 — same-ish but other bucket
        (4, [0.0, -1.0, 1.0, 0.0]),  # bucket 10 (x=0 -> sign >= 0 -> '1')
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r["a_id"], r["b_id"]): r["cos_sim"]
           for r in cosine_neardup(emb, planes, threshold=0.9).collect()}
    assert set(got) == {(1, 2)}
    assert got[(1, 2)] > 0.999
    # lowering the threshold still cannot cross buckets
    loose = cosine_neardup(emb, planes, threshold=-1.0)
    assert {(r["a_id"], r["b_id"]) for r in loose.collect()} == {(1, 2)}
