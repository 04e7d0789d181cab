"""Measure ANN recall@k vs the exact brute-force baseline (VERDICT r3
ask #5): how much quality the approximate indexes trade for their
pruning, at a given sf dir.

Usage: python tools/ann_recall.py [sf_dir] [n_queries] [k]
Prints one row per method: recall@k averaged over queries, plus the
candidate-scored fraction of the corpus (the work saved).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from logstash_integration_jdbc_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    lsh_topk,
)
from logstash_integration_jdbc_spark.session import get_spark


def topk_sets(df, k):
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def recall(approx: dict[int, set[int]], exact: dict[int, set[int]], k: int) -> float:
    if not exact:
        return float("nan")
    return sum(len(approx.get(q, set()) & s) / min(k, len(s))
               for q, s in exact.items()) / len(exact)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark(master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>"))
    n_corpus = emb.count()
    queries = emb.filter(F.col("vec_id") < n_q).selectExpr(
        "vec_id as query_id", "embedding")

    exact = topk_sets(cosine_topk(emb, queries, k=k), k)
    print(f"corpus={n_corpus} queries={len(exact)} k={k}")

    rows = []
    lsh = topk_sets(lsh_topk(emb, queries, k=k), k)
    rows.append(("lsh_topk (16-bit, 4 blocks)", recall(lsh, exact, k), None))
    for iters in (0, 2):
        for (nc, npb) in ((16, 4), (64, 8)):
            r = topk_sets(
                ivf_topk(emb, queries, k=k, n_centroids=nc, n_probe=npb,
                         kmeans_iters=iters), k)
            rows.append((f"ivf_topk nc={nc} probe={npb} lloyd={iters}",
                         recall(r, exact, k), npb / nc))
    for name, rec, frac in rows:
        scanned = f" scanned~{frac:.0%}" if frac else ""
        print(f"  {name:34s} recall@{k} = {rec:.3f}{scanned}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
