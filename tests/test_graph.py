"""PageRank: power-iteration parity vs an independent numpy twin."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest

from logstash_integration_jdbc_spark.operators.graph import pagerank


def np_pagerank(edge_list, iters, d):
    """Independent twin: dense power iteration with uniform dangling
    redistribution over the edge MULTISET (parallel edges count)."""
    nodes = sorted({u for e in edge_list for u in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = Counter(s for s, _ in edge_list)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for s, t in edge_list:
            contrib[idx[t]] += r[idx[s]] / deg[s]
        dangling = sum(r[idx[u]] for u in nodes if u not in deg)
        r = (1.0 - d) / n + d * (contrib + dangling / n)
    return {u: r[idx[u]] for u in nodes}


# a sink (5: no out-edges), a hub (1), a parallel edge (2->1 twice)
EDGES = [(1, 2), (1, 3), (2, 1), (2, 1), (3, 1), (3, 4), (4, 5), (1, 5)]


def test_matches_numpy_twin_with_dangling_and_parallel_edges(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, iters=5).collect()}
    exp = np_pagerank(EDGES, 5, 0.85)
    assert set(got) == set(exp)
    for u in exp:
        assert abs(got[u] - exp[u]) < 1e-12, u
    # mass is conserved every round (dangling redistribution)
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_rank_ordering_reflects_structure(spark):
    # every node links to 0; 0 links only to 1. The hub pair {0, 1}
    # trades mass (their relative order oscillates, decaying ~d² per
    # round — asserted against the twin above), but both must sit far
    # above the in-link-less leaves, which hold exactly the teleport
    # floor (1-d)/N.
    edges = [(i, 0) for i in range(1, 8)] + [(0, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, iters=8).collect()}
    leaves = [got[i] for i in range(2, 8)]
    floor = (1.0 - 0.85) / 8
    assert all(abs(v - floor) < 1e-12 for v in leaves)
    assert min(got[0], got[1]) > 10 * floor


def test_validation(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(ValueError, match="iters"):
        pagerank(df, iters=0)
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=1.0)
    with pytest.raises(ValueError, match="at least one edge"):
        pagerank(df.limit(0))
