"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast of the (small) query
set against the (huge) corpus, scored with ``zip_with``/``aggregate``
expressions (JVM, codegen) and reduced with a per-query top-k window.
Scale path: IVF — corpus pre-assigned to its nearest centroid
(one-time map pass), queries probe only the ``n_probe`` nearest
centroid buckets → the scan touches n_probe/n_centroids of the data.
Sign-LSH sketches serve the near-dup variant (dedup.embedding_near_dups).

Everything is deterministic: centroids are chosen by id, hyperplanes by
fixed hash coefficients.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for every query (brute force baseline).

    corpus × broadcast(queries) — map-only scoring over the corpus, then
    a per-query top-k. Excludes self-matches when ids collide.
    Returns (query_id, vec_id, cosine, rank).
    """
    q = queries.select(
        F.col(query_id), F.col(vec_col).alias("__qvec")
    )
    scored = corpus.select(F.col(corpus_id), F.col(vec_col)).crossJoin(F.broadcast(q))
    scored = scored.select(
        query_id,
        corpus_id,
        cosine_expr(F.col(vec_col), F.col("__qvec")).alias("cosine"),
    ).filter(F.col(corpus_id) != F.col(query_id))
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# -- sign-LSH ----------------------------------------------------------------

def _plane_coeff(bit: int, dim_idx: int) -> float:
    """Deterministic pseudo-gaussian hyperplane coefficient in [-1, 1]."""
    x = (bit * 1_000_003 + dim_idx * 7919 + 12345) * 6364136223846793005 % (1 << 63)
    return (x % 2_000_001) / 1_000_000.0 - 1.0


def hyperplane_sketch(vec: Column, bits: int = 16) -> Column:
    """bits-wide sign sketch as a bigint (random-hyperplane LSH).

    sign(v·p_i) per deterministic plane p_i; bit i set iff positive.
    Pure expressions — the per-plane dot product is a zip_with over a
    literal coefficient array.
    """
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        # coefficient array literal per plane; element_at is 1-based
        plane = F.array(*[F.lit(_plane_coeff(i, j)) for j in range(64)])
        d = F.aggregate(
            F.zip_with(vec, F.slice(plane, 1, F.size(vec)), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out = out + F.when(d > 0, F.lit(1 << i).cast("bigint")).otherwise(F.lit(0))
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 16,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share ≥1 of 4 sketch chunks.

    The 16-bit sketch splits into 4 nibbles-of-4-bits blocks; a corpus row
    is a candidate for a query iff some block matches (pigeonhole over
    small angular distance). Exact cosine ranks the candidates.
    """
    def with_blocks(df: DataFrame, idc: str) -> DataFrame:
        sk = hyperplane_sketch(F.col(vec_col), bits)
        return df.select(F.col(idc), F.col(vec_col), sk.alias("__sk")).select(
            idc, vec_col,
            F.posexplode(F.array(*[
                F.shiftright(F.col("__sk"), b * 4).bitwiseAND(F.lit(0xF))
                for b in range(bits // 4)
            ])).alias("__blk", "__val"),
        )

    c = with_blocks(corpus, corpus_id)
    q = with_blocks(queries, query_id).withColumnRenamed(vec_col, "__qvec")
    cand = (
        c.join(F.broadcast(q), ["__blk", "__val"])
        .filter(F.col(corpus_id) != F.col(query_id))
        .select(query_id, corpus_id, vec_col, "__qvec")
        .dropDuplicates([query_id, corpus_id])
    )
    scored = cand.select(
        query_id, corpus_id,
        cosine_expr(F.col(vec_col), F.col("__qvec")).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(corpus_id))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# -- IVF ----------------------------------------------------------------------

def ivf_index(corpus: DataFrame, n_centroids: int = 16,
              corpus_id: str = "vec_id", vec_col: str = "embedding") -> tuple[DataFrame, DataFrame]:
    """Assign each corpus vector to its nearest centroid (one map pass).

    Centroids: the vectors with the n_centroids smallest ids —
    deterministic, no iterative k-means (a production system would run a
    few Lloyd iterations the same way: broadcast centroids, re-assign,
    re-average; assignment is the part that matters for the plan shape).
    Returns (assigned_corpus, centroids).
    """
    centroids = (
        corpus.orderBy(corpus_id).limit(n_centroids)
        .select(F.col(corpus_id).alias("centroid_id"), F.col(vec_col).alias("__cvec"))
    )
    assigned = (
        corpus.crossJoin(F.broadcast(centroids))
        .withColumn("__sim", cosine_expr(F.col(vec_col), F.col("__cvec")))
    )
    w = Window.partitionBy(corpus_id).orderBy(F.desc("__sim"), F.asc("centroid_id"))
    assigned = (
        assigned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(corpus_id, vec_col, "centroid_id")
    )
    return assigned, centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: probe the n_probe nearest centroid buckets per query.

    At scale the assigned corpus is written bucketed/partitioned by
    centroid_id so a probe prunes partitions; here the join on
    centroid_id expresses the same pruning.
    """
    assigned, centroids = ivf_index(corpus, n_centroids, corpus_id, vec_col)
    q = queries.select(F.col(query_id), F.col(vec_col).alias("__qvec"))
    qc = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("__sim", cosine_expr(F.col("__qvec"), F.col("__cvec")))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("__sim"), F.asc("centroid_id"))
    probes = (
        qc.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_probe)
        .select(query_id, "centroid_id", "__qvec")
    )
    cand = assigned.join(F.broadcast(probes), "centroid_id").filter(
        F.col(corpus_id) != F.col(query_id)
    )
    scored = cand.select(
        query_id, corpus_id,
        cosine_expr(F.col(vec_col), F.col("__qvec")).alias("cosine"),
    )
    w2 = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(corpus_id))
    return scored.withColumn("rank", F.row_number().over(w2)).filter(F.col("rank") <= k)
