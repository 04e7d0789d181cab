"""Link-graph quality weighting: distributed PageRank over an edge list.

Web-scale curation pipelines weight documents by the link structure of
their hosts (CCNet / RefinedWeb-style provenance scoring): a host's
PageRank is a cheap, content-free quality prior that survives to 100 TB
because the graph is tiny next to the corpus (hosts, not documents).
This module implements the standard damped power iteration as pure
DataFrame ops — each round is ONE join + ONE groupBy-sum over
(node, rank) pairs, never document payloads.

Scale notes (the parts that matter at 10^9 nodes):
- every exchange carries (node:long, rank:double) — 16 B/row;
- the per-round dangling-mass aggregate collects ONE scalar (same
  class as the Lloyd-mean / watermark collects elsewhere);
- each round ends in an eager ``localCheckpoint`` — the same
  analyzer-OOM fix ``dedup_components`` measured: an iterative loop
  that only re-derives lineage nests the plan tree and dies generating
  the plan string after ~10 rounds;
- all scalar constants ((1-d)/N, d, 1/N) are computed ONCE driver-side
  and inlined as literals so reruns and twin implementations see
  bit-identical arithmetic.

No counterpart in the reference (a JDBC connectivity plugin); this is
part of the training-data curation surface the engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Damped PageRank after ``iters`` power-iteration rounds.

    Returns (node, rank) for every node appearing as a source or a
    destination. Dangling nodes (no out-edges) redistribute their mass
    uniformly, so ranks sum to 1 at every round:

        r'(v) = (1-d)/N + d * ( Σ_{u→v} r(u)/deg(u) + D/N ),
        D = Σ_{dangling u} r(u)

    ``edges`` is treated as a multiset — parallel edges contribute
    multiply, exactly as both a replayed SQL twin and a literal
    adjacency matrix would. A fixed iteration count (not an epsilon
    stopping rule) keeps the result deterministic and replayable.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")

    e = edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"))
    nodes = (
        e.select(F.col("__src").alias("node"))
        .unionByName(e.select(F.col("__dst").alias("node")))
        .distinct()
    )
    # out-degree rides with the edges once, so each round's contribution
    # join touches only (edge, rank) — deg is never re-derived in-loop
    deg = e.groupBy("__src").agg(F.count(F.lit(1)).alias("__deg"))
    e_deg = e.join(deg, "__src").persist()
    nodes_deg = nodes.join(
        deg.select(F.col("__src").alias("node"), "__deg"), "node", "left"
    ).localCheckpoint()

    n_nodes = nodes_deg.count()
    if n_nodes == 0:
        raise ValueError("pagerank needs at least one edge")
    inv_n = 1.0 / n_nodes
    base = (1.0 - damping) / n_nodes

    try:
        ranks = nodes_deg.withColumn("rank", F.lit(inv_n))
        for _ in range(iters):
            contribs = (
                e_deg.join(
                    ranks.select(F.col("node").alias("__src"), "rank"), "__src")
                .groupBy(F.col("__dst").alias("node"))
                .agg(F.sum(F.col("rank") / F.col("__deg")).alias("__c"))
            )
            # dangling mass: one scalar — nodes with no out-edges spread
            # their rank uniformly (keeps Σrank = 1 every round)
            dangling = ranks.filter(F.col("__deg").isNull()).agg(
                F.coalesce(F.sum("rank"), F.lit(0.0))).first()[0]
            ranks = (
                nodes_deg.join(contribs, "node", "left")
                .select(
                    "node", "__deg",
                    (F.lit(base) + F.lit(damping)
                     * (F.coalesce(F.col("__c"), F.lit(0.0))
                        + F.lit(dangling) * F.lit(inv_n))).alias("rank"),
                )
            ).localCheckpoint()
        return ranks.select("node", "rank")
    finally:
        e_deg.unpersist()
