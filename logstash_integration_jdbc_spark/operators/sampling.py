"""Deterministic sampling / dataset splitting for training pipelines.

Train/val/test assignment and subsampling must be (a) reproducible
across runs and engines, (b) leakage-safe — every row sharing a key
(conversation, document family) lands on the same side of every split —
and (c) map-only at 100 TB. All three fall out of hashing the KEY, not
rolling per-row randoms: ``u = pmod(xxhash64(key#seed), 10^6)/10^6`` is
a uniform-enough deterministic number that any engine with an XXH64
twin can replicate bit-exactly (the DuckDB oracle uses the pure-Python
``functions/xxhash.py`` implementation).

The hash input is the STRING ``key#seed`` (single-argument xxhash64):
multi-column xxhash64 chains seeds through typed per-column kernels,
which the cross-engine twin would have to mirror per type; one UTF-8
string hash keeps the contract engine-neutral.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_BUCKETS = 1_000_000


def hash_uniform(key: Column, seed: int = 42) -> Column:
    """Deterministic uniform in [0, 1) from a key column (stringified)."""
    salted = F.concat(key.cast("string"), F.lit(f"#{seed}"))
    return F.pmod(F.xxhash64(salted), F.lit(HASH_BUCKETS)) / float(HASH_BUCKETS)


def split_by_hash(df: DataFrame, key: Column,
                  fractions: dict[str, float], seed: int = 42,
                  out_col: str = "split") -> DataFrame:
    """Assign every row to a named split by key hash.

    ``fractions`` maps split name → fraction; they must sum to 1 (±1e-9).
    Same key ⇒ same split (leakage control across rows of one
    conversation/document); realized proportions converge on the
    fractions as distinct keys grow. Map-only CASE expression.
    """
    if not fractions:
        raise ValueError("fractions must not be empty")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    u = hash_uniform(key, seed)
    items = list(fractions.items())
    expr = None
    cum = 0.0
    for name, frac in items[:-1]:
        cum += frac
        expr = F.when(u < cum, name) if expr is None else expr.when(u < cum, name)
    last = items[-1][0]
    expr = expr.otherwise(F.lit(last)) if expr is not None else F.lit(last)
    return df.withColumn(out_col, expr)


def pack_sequences(df: DataFrame, budget: int,
                   id_col: str = "doc_id", text_col: str = "text",
                   n_buckets: int = 64, seed: int = 42) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences:
    (doc_id, n_tokens, bucket, seq_idx) where (bucket, seq_idx) names
    the packed sequence.

    The packing is DETERMINISTIC and cluster-size-independent: docs
    hash into ``n_buckets`` fixed buckets (not Spark partitions), each
    bucket packs ITS docs in ascending id order with greedy first-fit
    (start a new sequence when the running token total would exceed
    ``budget``; a doc longer than the budget occupies its own sequence
    — truncation is the trainer's policy, not the packer's). Rerun,
    resume, or a different executor count reproduce identical
    sequences — the property a resumable curation pipeline needs.

    Scale: one map pass (token count + bucket hash), ONE shuffle on the
    bucket key, and an Arrow-batched per-bucket kernel that is O(docs
    in bucket); n_buckets bounds kernel memory and sets packing
    parallelism independently of input partitioning.
    """
    import pandas as pd

    from logstash_integration_jdbc_spark.operators.textstats import token_count

    base = df.select(
        F.col(id_col),
        token_count(F.col(text_col)).alias("n_tokens"),
        F.pmod(
            F.xxhash64(F.concat(F.col(id_col).cast("string"),
                                F.lit(f"#pack{seed}"))),
            F.lit(n_buckets),
        ).cast("int").alias("bucket"),
    )

    def pack(key, pdf):
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        seqs = []
        seq, used = 0, 0
        for n in pdf["n_tokens"]:
            n = int(n)
            if used > 0 and used + n > budget:
                seq += 1
                used = 0
            seqs.append(seq)
            used += n
        pdf["seq_idx"] = pd.Series(seqs, dtype="int64")
        return pdf

    return base.groupBy("bucket").applyInPandas(
        pack, schema=f"{id_col} bigint, n_tokens int, bucket int, seq_idx bigint")


def sample_by_hash(df: DataFrame, key: Column, fraction: float,
                   seed: int = 42) -> DataFrame:
    """Keep a deterministic ``fraction`` of keys (not rows): rerunning,
    resuming, or running on another engine keeps the SAME subset, and
    sampling composes with itself (fraction 0.5 then 0.2 over the same
    seed keeps nested subsets only if seeds differ — pass distinct
    seeds for independent draws)."""
    if not (0.0 <= fraction <= 1.0):
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(hash_uniform(key, seed) < fraction)


def sample_weighted(df: DataFrame, key: Column, weight: Column,
                    scale: float = 1.0, seed: int = 42) -> DataFrame:
    """Importance sampling: keep each row with probability
    ``clamp(weight * scale, 0, 1)``, decided deterministically by the
    key hash (same key + seed ⇒ same decision on every run/engine).

    The standard quality-proportional downsample: pass a quality score
    in [0, 1] as ``weight`` and ``scale`` < 1 to thin the corpus while
    biasing retention toward high-quality documents. Map-only.
    """
    p = F.least(F.greatest(weight * F.lit(scale), F.lit(0.0)), F.lit(1.0))
    return df.filter(hash_uniform(key, seed) < p)


def quota_per_group(df: DataFrame, group_col: str, quota: int,
                    order_col: str | None = None, seed: int = 42,
                    tiebreak_col: str | None = None) -> DataFrame:
    """Cap rows per group at ``quota`` — the domain-balancing step that
    stops one source/domain from dominating a training mix.

    Which rows survive is deterministic: ordered by ``order_col``
    ascending when given (e.g. a perplexity — keep the best), else by
    the key hash (an unbiased random-but-reproducible draw;
    ``tiebreak_col`` must then name a unique id column). One shuffle on
    the group key; rank via a bounded per-group window — at 100 TB a
    pathologically hot group concentrates on one task, so pre-filter
    obvious floods (or salt + two-stage quota) if a single group may
    exceed executor memory.
    """
    if quota <= 0:
        raise ValueError(f"quota must be positive, got {quota}")
    from pyspark.sql import Window

    if order_col is not None:
        order = [F.col(order_col).asc()]
        if tiebreak_col:
            order.append(F.col(tiebreak_col).asc())
    else:
        if not tiebreak_col:
            raise ValueError(
                "quota_per_group: tiebreak_col (a unique id) is required "
                "when order_col is not given")
        order = [hash_uniform(F.col(tiebreak_col), seed).asc(),
                 F.col(tiebreak_col).asc()]
    w = Window.partitionBy(group_col).orderBy(*order)
    return (df.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= quota)
            .drop("_rk"))


def temperature_sample(df: DataFrame, source_col: str, key: Column,
                       tau: float = 2.0, seed: int = 42) -> DataFrame:
    """Temperature-based source mixing (the T5/mT5 and Pile recipe):
    downsample each source so realized proportions follow
    ``n_s^(1/τ)`` instead of raw ``n_s`` — τ>1 flattens the mix toward
    uniform (small sources gain relative share), τ=1 is a no-op, τ→∞
    is fully uniform.

    Single-pass form: keep-probability ``p_s ∝ n_s^(1/τ−1)`` scaled so
    the largest p_s is 1 (pure downsampling — upsampling is the
    trainer's epoch policy, duplicating rows here would skew dedup and
    token accounting downstream). Source counts come from one tiny
    aggregate (source cardinality is small by definition — domains,
    corpora); the probabilities ride the plan as a literal map and the
    draw is the shared deterministic key hash — same key, same verdict,
    across runs/engines. Map-only after the count.
    """
    if tau <= 0:
        raise ValueError(f"tau must be positive, got {tau}")
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n")).collect()
    if not counts:
        return df
    raw = {r[source_col]: float(r["n"]) ** (1.0 / tau - 1.0) for r in counts}
    mx = max(raw.values())
    entries: list[Column] = []
    for s, v in raw.items():
        entries += [F.lit(s), F.lit(v / mx)]
    p = F.element_at(F.create_map(*entries), F.col(source_col))
    return df.filter(hash_uniform(key, seed) < p)


def filter_top_quantile(df: DataFrame, score_col: str, keep_frac: float,
                        group_col: str | None = None,
                        tiebreak_col: str = "doc_id") -> DataFrame:
    """Keep the top ``keep_frac`` of rows per group by score — the
    classifier-threshold curation step (FineWeb-Edu-style "keep the
    best-scoring p%"), expressed as a RANK gate instead of a fixed
    threshold so the retention rate is exact per group regardless of
    score distribution drift between sources. A pathologically hot
    group ranks in one window task — for billion-row groups use
    ``filter_above_quantile`` (threshold form, map-only filter).

    Deterministic and engine-replayable: survivors are the first
    ``ceil(keep_frac * n_group)`` rows ordered by (score DESC,
    tiebreak ASC) — integer rank arithmetic, no float quantile
    interpolation to diverge between engines. One shuffle on the group
    key (or a single global window when ``group_col`` is None — use
    groups at scale: a global ordering funnels into one task).
    """
    if not (0.0 <= keep_frac <= 1.0):
        raise ValueError(f"keep_frac must be in [0, 1], got {keep_frac}")
    from pyspark.sql import Window

    parts = [group_col] if group_col else []
    order = [F.col(score_col).desc(), F.col(tiebreak_col).asc()]
    w = Window.partitionBy(*parts).orderBy(*order)
    wn = Window.partitionBy(*parts)
    return (df.withColumn("_rk", F.row_number().over(w))
              .withColumn("_n", F.count(F.lit(1)).over(wn))
              .where(F.col("_rk") <= F.ceil(F.lit(keep_frac) * F.col("_n")))
              .drop("_rk", "_n"))


def token_budget_per_group(df: DataFrame, group_col: str, budget: int,
                           token_col: str, seed: int = 42,
                           tiebreak_col: str = "doc_id") -> DataFrame:
    """Cap each group's TOKEN total at ``budget`` — the data-mixing
    step that fills per-source token quotas for a training run (quota
    by tokens, not documents: a source of long documents exhausts its
    share with fewer rows).

    Docs are admitted in deterministic key-hash order (an unbiased,
    reproducible draw — same seed, same admitted set on every run,
    engine, and cluster size) until the running token total would
    stay within ``budget``; the first doc that crosses the budget and
    everything after it is dropped (admit-while-fits, no truncation —
    cutting documents is the trainer's policy).

    One shuffle on the group key; the running total is a bounded
    per-group window sum. Same hot-group caveat as ``quota_per_group``.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    from pyspark.sql import Window

    w = (Window.partitionBy(group_col)
         .orderBy(hash_uniform(F.col(tiebreak_col), seed).asc(),
                  F.col(tiebreak_col).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (df.withColumn("_cum", F.sum(F.col(token_col)).over(w))
              .where(F.col("_cum") <= budget)
              .drop("_cum"))


def filter_above_quantile(df: DataFrame, score_col: str, q: float,
                          group_col: str, approx: bool = False,
                          accuracy: int = 10000) -> DataFrame:
    """Keep rows whose score is STRICTLY above the per-group ``q``
    quantile — the scale path for quantile-based curation.

    ``filter_top_quantile`` guarantees an exact retention rate but
    ranks every row of a group in ONE window task — at 100 TB a
    billion-row source funnels into a single executor. This variant
    trades exact retention for a scale-free plan: a tiny per-group
    aggregate computes the score threshold (one row per group — source
    cardinality is small by definition), the thresholds broadcast-join
    back, and the filter is map-only. No giant window, no hot task;
    retention is approximately ``1-q`` (ties at the threshold drop,
    score distribution skew shifts it).

    ``approx=True`` swaps the exact interpolated ``percentile`` for
    ``approx_percentile`` (KLL-sketch, mergeable, one pass) — the
    setting for corpora where even the exact percentile's per-group
    sort buffer matters. Exact by default so cross-engine oracles can
    replay the threshold bit-for-bit.
    """
    if not (0.0 < q < 1.0):
        raise ValueError(f"q must be in (0, 1), got {q}")
    from pyspark.sql.functions import broadcast

    fn = "approx_percentile" if approx else "percentile"
    acc = f", {accuracy}" if approx else ""
    thr = df.groupBy(group_col).agg(
        F.expr(f"{fn}({score_col}, {q!r}{acc})").alias("_thr"))
    return (df.join(broadcast(thr), group_col)
              .where(F.col(score_col) > F.col("_thr"))
              .drop("_thr"))
