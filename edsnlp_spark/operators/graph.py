"""Graph analytics over edge DataFrames: integer-exact PageRank.

Companion to the connected-components tiers in ``operators/dedup.py``
(reference analog: the co-occurrence / linkage analyses a corpus
platform runs over dedup and citation graphs; PageRank itself is
Brin & Page 1998).

Determinism policy: ranks are INTEGER-scaled (``scale`` ~ 1.0) and
every update uses only int64 ops — contribution = rank DIV out-degree,
damping = (17 * in_sum) DIV 20 for d=0.85 — so Spark's
nondeterministic partial-aggregation order cannot produce float drift
and a DuckDB oracle writing the same integer arithmetic reproduces
ranks bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..core.caching import scoped, tracked_persist

#: damping factor 0.85 as the exact rational 17/20
_DAMP_NUM, _DAMP_DEN = 17, 20


@scoped("graph")
def pagerank(edges: DataFrame, iterations: int = 8,
             scale: int = 1_000_000,
             src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """PageRank over a directed edge list -> (node, rank) with ``rank``
    int64-scaled by ``scale`` (rank/scale ~ the conventional value for
    the un-normalized 'every node starts at 1.0' formulation).

    r0(v) = scale;  r_{t+1}(v) = floor(0.15*scale)
                                 + (17 * sum_{u->v} (r_t(u) DIV deg(u))) DIV 20

    Nodes are the distinct edge endpoints; a node with no in-edges
    settles at the teleport term.  Dangling mass (nodes with no
    OUT-edges) is dropped, the common simplification — document it to
    consumers rather than hiding a renormalization pass.

    Scale shape: the degree-enriched edge plane is computed once and
    persisted (read every iteration); each iteration is ONE
    shuffle-on-dst aggregation (partial map-side combine applies —
    contributions are plain int64 sums) plus a left join back to the
    node plane.  Lineage is cut per round with an eager
    localCheckpoint (the r6 connected-components lesson: persist alone
    leaves the logical plan doubling per round).  At 1000x data the
    per-iteration cost is the edge shuffle — there is no driver-side
    state at all (no collect; ranks live distributed).
    """
    if iterations < 0:
        raise ValueError("pagerank requires iterations >= 0")
    base = int(scale * 3) // _DAMP_DEN  # floor(0.15 * scale)
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    edges_d = tracked_persist(e.join(deg, "src"), "graph")
    nodes = tracked_persist(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node"))).distinct(), "graph")
    ranks = nodes.select(
        "node", F.lit(int(scale)).cast("long").alias("rank"))
    ranks = ranks.localCheckpoint(eager=True)
    for _ in range(iterations):
        contribs = (
            edges_d.join(ranks, edges_d["src"] == ranks["node"])
            .select(F.col("dst"),
                    F.expr("rank DIV deg").alias("c"))
            .groupBy("dst").agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                F.col("node"),
                (F.lit(base)
                 + F.expr(f"({_DAMP_NUM} * coalesce(in_sum, 0))"
                          f" DIV {_DAMP_DEN}")).alias("rank"))
            .localCheckpoint(eager=True)
        )
    return ranks
