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
