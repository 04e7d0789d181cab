"""Per-stage row-count lineage via DataFrame.observe — zero extra actions.

The north_star requires per-partition lineage and row-count metrics per
stage. ``df.observe(name, exprs...)`` attaches accumulator-backed metrics
to the existing action: no second pass over the data, no ``count()``
jobs — at 100 TB an extra count per stage would double the I/O.

IMPORTANT measured caveat: every ``observe`` inserts a CollectMetrics
plan node that splits whole-stage codegen. Three observe points made the
pipeline's write job ~90% slower. Collect ALL of a job's metrics in ONE
observe on the terminal frame (conditional ``sum(when(...))`` per stage
flag) — which is what ``pipeline.run_pipeline`` does via
``Router.write_all(extra_observe=...)``. Use this collector only for
multi-action jobs where metric points genuinely cannot share a node.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class LineageCollector:
    """Attach observation points; harvest after the job's actions run."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self._observations: dict[str, Any] = {}

    def observe(self, df: DataFrame, stage: str, **extra) -> DataFrame:
        from pyspark.sql import Observation

        obs = Observation(stage)
        exprs = [F.count(F.lit(1)).alias("rows")]
        for name, col in extra.items():
            exprs.append(col.alias(name))
        self._observations[stage] = obs
        return df.observe(obs, *exprs)

    def metrics(self) -> dict[str, dict[str, Any]]:
        out: dict[str, dict[str, Any]] = {}
        for stage, obs in self._observations.items():
            try:
                out[stage] = dict(obs.get)
            except Exception:
                out[stage] = {}
        return out
