"""Hashed random-projection text embeddings (model-free).

Gives raw text an ``array<double>`` embedding column INSIDE the engine
so the embedding-space operators (`semantic_dedup`, `cosine_topk`,
`exact_cosine_pairs`) compose with text corpora without an external
model: the classic signed-random-projection / feature-hashing
construction (Charikar 2002 simhash un-thresholded; Weinberger et al.
2009 hashing trick) — component j of a document's vector is the sum
over token occurrences of ±1 by bit j of the token's xxhash64.
Documents sharing most tokens get high cosine; disjoint vocabularies
decorrelate (E[cos] = 0 under the hash).

Scale design: the whole operator is MAP-ONLY — token hashing is the
JVM's ``xxhash64`` inside a Catalyst ``transform`` (same staged-hash
pattern the minhash path measured at 8.4× vs string concat), and the
bit-projection reduce is one Arrow ``pandas_udf`` whose interior is a
single numpy broadcast (`(h >> j) & 1`) — no Python loops over tokens,
no shuffle, deterministic across runs and cluster sizes.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .textstats import tokens_expr

_PROJ_UDFS: dict[int, object] = {}


def _projection_udf(dim: int):
    """±1-bit projection reduce: array<long> token hashes → dim sums."""
    import numpy as np

    if dim in _PROJ_UDFS:
        return _PROJ_UDFS[dim]

    shifts = np.arange(dim, dtype=np.uint64)

    @pandas_udf("array<double>")
    def proj(hashes: pd.Series) -> pd.Series:
        out = []
        for arr in hashes:
            if arr is None or len(arr) == 0:
                out.append(np.zeros(dim, dtype=np.float64))
                continue
            h = np.asarray(arr, dtype=np.int64).astype(np.uint64)
            bits = ((h[:, None] >> shifts[None, :]) & 1).astype(np.int64)
            out.append((bits * 2 - 1).sum(axis=0).astype(np.float64))
        return pd.Series(out)

    _PROJ_UDFS[dim] = proj
    return proj


def embed_text(df: DataFrame, text_col: str = "text",
               out_col: str = "embedding", dim: int = 64) -> DataFrame:
    """Append a ``dim``-component hashed bag-of-words embedding.

    ``dim`` is capped at 64 (one xxhash64 supplies the sign bits); a
    wider space would chain salted hashes per 64-bit block — raise the
    cap there if recall at extreme scale demands it.
    """
    if not 1 <= dim <= 64:
        raise ValueError("embed_text: dim must be in [1, 64] "
                         "(one xxhash64 word of sign bits)")
    hashes = F.transform(tokens_expr(F.col(text_col)),
                         lambda t: F.xxhash64(t))
    return df.withColumn(out_col, _projection_udf(dim)(hashes))
