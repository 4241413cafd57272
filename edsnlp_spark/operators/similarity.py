"""Similarity search over embedding columns (north-star ANN ops).

Baseline: brute-force cosine top-k — a broadcast join of the (small)
query set against the full corpus, ranked per query.  Scale path:
LSH-bucketed search via random hyperplane signatures — candidates only
meet inside a bucket (equi-join), turning O(Q x N) into O(Q x N / 2^bits)
per table scan.  All arithmetic in double precision, left-to-right, so a
DuckDB oracle reproduces values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..core.caching import scoped, tracked_persist


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(emb: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     q_id_col: str = "q_id", q_vec_col: str = "q_vec") -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries is expected to be small — broadcast it; the corpus streams
    through one projection + per-query top-k (window over rank).
    """
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    qvec = F.transform(F.col(q_vec_col), lambda x: x.cast("double"))
    corpus = emb.select(F.col(id_col).alias("n_id"), vec.alias("v"))
    qs = queries.select(F.col(q_id_col).alias("q_id"), qvec.alias("qv"))
    scored = (
        corpus.join(F.broadcast(qs), F.col("n_id") != F.col("q_id"))
        .select(
            "q_id", "n_id",
            cosine(F.col("qv"), F.col("v")).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", F.col("rank").cast("bigint"),
                F.round("cos", 4).alias("cos_sim"))
    )


def _centers_arr(centers: list[list[float]]) -> Column:
    """Literal array<struct<cell,cv>> of centroids (broadcast-in-plan)."""
    return F.array(*[
        F.struct(F.lit(i).alias("cell"),
                 F.array(*[F.lit(float(x)) for x in c]).alias("cv"))
        for i, c in enumerate(centers)
    ])


def ivf_topk(emb: DataFrame, queries: DataFrame, k: int = 10,
             n_cells: int = 16, n_probe: int = 2, seed: int = 42,
             centroids: list[list[float]] | None = None,
             id_col: str = "vec_id", vec_col: str = "embedding",
             q_id_col: str = "q_id", q_vec_col: str = "q_vec") -> DataFrame:
    """IVF-style ANN: coarse quantizer cells + n_probe search.  Each query
    probes its ``n_probe`` nearest cells (by cosine) and ranks only those
    cells' vectors.

    Two index-build paths:

    * ``centroids=None`` — MLlib KMeans fit (environment-dependent init;
      recall asserted in pytest).
    * ``centroids=[...]`` — precomputed centroid list.  This is the
      realistic production shape: the IVF index is built offline (one
      KMeans batch job) and the broadcast centroid table is index
      metadata.  Deterministic, so a SQL oracle can reproduce the exact
      cell assignment (ties broken by lower cell id).

    The cluster assignment is a one-time batch job (like building an
    index); per-query work drops from O(N) to O(N * n_probe / n_cells).
    Assignment with given centroids is a pure projection (no shuffle):
    argmax over a literal centroid array.
    """
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    corpus = emb.select(F.col(id_col).alias("n_id"), vec.alias("v"))

    if centroids is None:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        train = corpus.withColumn("features", array_to_vector(F.col("v")))
        model = KMeans(k=n_cells, seed=seed, featuresCol="features").fit(train)
        assigned = model.transform(train).select(
            "n_id", "v", F.col("prediction").alias("cell"))
        centers = [list(map(float, c)) for c in model.clusterCenters()]
    else:
        centers = [list(map(float, c)) for c in centroids]
        carr = _centers_arr(centers)
        assigned = corpus.withColumn(
            "cell",
            F.sort_array(F.transform(
                carr,
                lambda c: F.struct(
                    (-cosine(F.col("v"), c["cv"])).alias("negcos"),
                    c["cell"].alias("cell"),
                ),
            ))[0]["cell"],
        )

    centers_arr = _centers_arr(centers)
    qvec = F.transform(F.col(q_vec_col), lambda x: x.cast("double"))
    qs = queries.select(F.col(q_id_col).alias("q_id"), qvec.alias("qv"))
    # pick the n_probe closest centroids per query (tiny: done via array ops)
    probed = qs.select(
        "q_id", "qv",
        F.explode(F.slice(
            F.sort_array(F.transform(
                centers_arr,
                lambda c: F.struct(
                    (-cosine(F.col("qv"), c["cv"])).alias("negcos"),
                    c["cell"].alias("cell"),
                ),
            )),
            1, n_probe,
        )).alias("p"),
    ).select("q_id", "qv", F.col("p.cell").alias("cell"))

    scored = (
        assigned.join(F.broadcast(probed), "cell")
        .filter(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id", cosine(F.col("qv"), F.col("v")).alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", F.col("rank").cast("bigint"),
                F.round("cos", 4).alias("cos_sim"))
    )


def hyperplane_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: one bit per plane (sign of dot)."""
    return F.concat(*[
        F.when(
            dot(vec, F.array(*[F.lit(float(x)) for x in p])) >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for p in planes
    ])


def lsh_topk(emb: DataFrame, queries: DataFrame, planes: list[list[float]],
             k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding",
             q_id_col: str = "q_id", q_vec_col: str = "q_vec") -> DataFrame:
    """Approximate top-k: rank only within the query's LSH bucket."""
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    qvec = F.transform(F.col(q_vec_col), lambda x: x.cast("double"))
    corpus = emb.select(
        F.col(id_col).alias("n_id"), vec.alias("v"),
        hyperplane_signature(vec, planes).alias("bucket"),
    )
    qs = queries.select(
        F.col(q_id_col).alias("q_id"), qvec.alias("qv"),
        hyperplane_signature(qvec, planes).alias("bucket"),
    )
    scored = (
        corpus.join(F.broadcast(qs), "bucket")
        .filter(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id", cosine(F.col("qv"), F.col("v")).alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", F.col("rank").cast("bigint"),
                F.round("cos", 4).alias("cos_sim"))
    )


def cosine_neardup(emb: DataFrame, planes: list[list[float]],
                   threshold: float = 0.9, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS (the dedup variant of
    similarity search): candidate generation by identical
    random-hyperplane signature, exact cosine verify inside the bucket
    only — never all-pairs, so the join scales with bucket occupancy
    (2^n_planes buckets), not corpus^2.

    Returns (a_id, b_id, cos_sim) with a_id < b_id.
    """
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sig = hyperplane_signature(vec, planes)
    base = emb.select(F.col(id_col).alias("id"), vec.alias("v"),
                      sig.alias("bucket"))
    a = base.select(F.col("id").alias("a_id"), F.col("v").alias("a_v"),
                    F.col("bucket").alias("a_bucket"))
    b = base.select(F.col("id").alias("b_id"), F.col("v").alias("b_v"),
                    F.col("bucket").alias("b_bucket"))
    cos = cosine(F.col("a_v"), F.col("b_v"))
    return (
        a.join(b, (F.col("a_bucket") == F.col("b_bucket"))
               & (F.col("a_id") < F.col("b_id")))
        .select("a_id", "b_id", F.round(cos, 4).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


@scoped("semdedup")
def semdedup(emb: DataFrame, centroids: list[list[float]],
             threshold: float = 0.95,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication for training corpora — cluster embeddings with a
    coarse quantizer, then within each cluster drop the HIGHER-id member
    of every pair whose cosine clears ``threshold``.

    -> (id_col, cell, keep) for every input vector.

    Scale shape: assignment is a pure projection over the broadcast
    centroid literal (no shuffle); the pairwise cosine is a per-cell
    self-join, so quadratic work is confined to cluster cells (the
    paper's point — never a corpus-level cross join).  Cell sizes are
    governed by the centroid count, exactly like the IVF index above.
    """
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    carr = _centers_arr([list(map(float, c)) for c in centroids])
    assigned = emb.select(
        F.col(id_col).alias("__id"), vec.alias("v")
    ).withColumn(
        "cell",
        F.sort_array(F.transform(
            carr,
            lambda c: F.struct(
                (-cosine(F.col("v"), c["cv"])).alias("negcos"),
                c["cell"].alias("cell"),
            ),
        ))[0]["cell"],
    )
    assigned = tracked_persist(assigned, "semdedup")
    a = assigned.select("cell", F.col("__id").alias("a_id"),
                        F.col("v").alias("a_v"))
    b = assigned.select("cell", F.col("__id").alias("b_id"),
                        F.col("v").alias("b_v"))
    dropped = (
        a.join(b, "cell")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(cosine(F.col("a_v"), F.col("b_v")) >= F.lit(threshold))
        .select(F.col("b_id").alias("__id"))
        .distinct()
    )
    return (
        assigned.join(dropped.withColumn("__drop", F.lit(True)),
                      "__id", "left")
        .select(F.col("__id").alias(id_col), "cell",
                F.coalesce(~F.col("__drop"), F.lit(True)).alias("keep"))
    )
