"""The flagship end-to-end job: parse → enrich → route → aggregate.

One resumable batch over a transcript table, reproducing the reference's
pipeline semantics (incremental checkpointed scan → lookup enrichment
with defaults/tags → tag-routed fan-out) with Spark-native physics:

- scan: parquet/Iceberg read with the watermark predicate pushed into the
  file scan (S2);
- parse: grok-compiled ``regexp_extract`` — whole-stage codegen, zero
  Python (north_star "no per-row Python");
- enrich: broadcast hash joins with jdbc_static semantics (J2/J4/R1-R3)
  against max_rows-guarded dimensions (S9);
- route: tag/predicate fan-out to hour-partitioned, salt-spread sinks (R4);
- aggregate: per-sink (role, tool, hour) counts — map-side partial agg;
- checkpoint: scalar max-ts watermark + per-partition cursors written
  atomically ONLY after all sinks committed (at-least-once, S3).

Every stage carries an ``observe`` metric — per-stage row counts with no
extra actions (LineageCollector).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_integration_jdbc_spark.functions.parse import parse_tool_calls
from logstash_integration_jdbc_spark.operators.aggregate import hourly_counts
from logstash_integration_jdbc_spark.operators.lookup import (
    OK_COL,
    TAGS_COL,
    Lookup,
    LookupProcessor,
)
from logstash_integration_jdbc_spark.operators.router import Route, Router
from logstash_integration_jdbc_spark.plans.lineage import LineageCollector
from logstash_integration_jdbc_spark.sources.loader import DimensionLoader
from logstash_integration_jdbc_spark.sources.scan import (
    incremental_scan,
    max_watermark,
    partition_cursors,
)
from logstash_integration_jdbc_spark.sources.value_tracking import ValueTracker

def _fmt_run_id(watermark) -> str:
    s = str(watermark)
    return "".join(ch for ch in s if ch.isalnum())


TAG_TOOL_DEFAULT = "_tool_dim_default_used"
TAG_TOOL_FAILURE = "_tool_lookup_failure"
TAG_ROLE_DEFAULT = "_role_dim_default_used"


@dataclass
class PipelineConfig:
    transcripts_path: str
    tool_dim_path: str
    role_dim_path: str
    out_dir: str
    checkpoint_path: str | None = None
    clean_run: bool = False
    record_last_run: bool = True
    tracking_column: str = "ts"
    n_salts: int = 8
    max_dim_rows: int = 1_000_000
    extra: dict[str, Any] = field(default_factory=dict)


def build_lookups(spark: SparkSession, cfg: PipelineConfig) -> LookupProcessor:
    tool_loader = DimensionLoader(
        "tool_dim", lambda: spark.read.parquet(cfg.tool_dim_path), max_rows=cfg.max_dim_rows
    )
    role_loader = DimensionLoader(
        "role_dim", lambda: spark.read.parquet(cfg.role_dim_path), max_rows=cfg.max_dim_rows
    )
    tool_lookup = Lookup(
        id="tool_info",
        dim=tool_loader.get(),
        on=[("tool", "=", "tool")],
        parameters={"tool": "[tool_call]"},  # parsed field, field-ref scheme
        select=["tool_name", "tool_category"],
        default_hash={"tool_name": "unknown", "tool_category": "unknown"},
        tag_on_failure=[TAG_TOOL_FAILURE],
        tag_on_default_use=[TAG_TOOL_DEFAULT],
    )
    role_lookup = Lookup(
        id="role_info",
        dim=role_loader.get(),
        on=[("role", "=", "role")],
        parameters={"role": "[role]"},
        select=["role_label", "role_rank"],
        default_hash={"role_label": "unknown", "role_rank": -1},
        tag_on_failure=["_role_lookup_failure"],
        tag_on_default_use=[TAG_ROLE_DEFAULT],
    )
    return LookupProcessor([tool_lookup, role_lookup])


def enrich(df: DataFrame, processor: LookupProcessor) -> DataFrame:
    return processor.enhance(df)


def build_router() -> Router:
    defaults_used = F.array_contains(F.col(TAGS_COL), TAG_TOOL_DEFAULT) | F.array_contains(
        F.col(TAGS_COL), TAG_ROLE_DEFAULT
    )
    return Router(
        routes=[
            Route("parse_miss", ~F.col("parse_ok")),
            Route("defaults_used", defaults_used),
            Route("matched", F.col(OK_COL) & F.col("parse_ok")),
        ],
        default_sink="failed",
    )


def run_pipeline(spark: SparkSession, cfg: PipelineConfig) -> dict[str, Any]:
    """Execute one resumable batch; returns metrics + sink counts."""
    t0 = time.time()
    lineage = LineageCollector(spark)

    tracker = ValueTracker(
        path=cfg.checkpoint_path,
        tracking_type="timestamp",
        clean_run=cfg.clean_run,
        record_last_run=cfg.record_last_run,
    )

    raw = spark.read.parquet(cfg.transcripts_path)
    scanned = incremental_scan(raw, cfg.tracking_column, tracker.value)
    scanned = lineage.observe(scanned, "scan")

    parsed = parse_tool_calls(scanned)
    parsed = lineage.observe(parsed, "parse",
                             parse_hits=F.sum(F.col("parse_ok").cast("long")))

    processor = build_lookups(spark, cfg)
    enriched = enrich(parsed, processor)
    enriched = lineage.observe(
        enriched, "enrich",
        lookups_ok=F.sum(F.col(OK_COL).cast("long")),
    )

    # run_id: deterministic per batch (the starting watermark) — a rerun
    # of a failed batch regenerates the same id and dynamically overwrites
    # exactly its own sink partitions.
    run_id = _fmt_run_id(tracker.value)

    router = build_router()
    enriched = enriched.persist()
    try:
        sink_counts = router.write_all(
            enriched, os.path.join(cfg.out_dir, "sinks"),
            ts_col="ts", salt_col="conv_id", n_salts=cfg.n_salts,
            run_id=run_id, already_persisted=True,
        )

        # per-sink hourly aggregates for this batch
        agg_counts: dict[str, int] = {}
        for name, sink_df in router.split(enriched).items():
            agg = hourly_counts(sink_df).withColumn("run_id", F.lit(run_id))
            (agg.write.mode("overwrite").partitionBy("run_id")
                .parquet(os.path.join(cfg.out_dir, "agg", name)))
            agg_counts[name] = agg.count()
    finally:
        enriched.unpersist()

    # Checkpoint: advance ONLY now, after every sink committed
    # (at-least-once; a failure above leaves the old watermark intact and
    # the rerun overwrites the same hour partitions idempotently).
    new_mark = max_watermark(scanned, cfg.tracking_column)
    cursors = partition_cursors(scanned, ts_col=cfg.tracking_column)
    if new_mark is not None:
        tracker.set_value(new_mark)
        tracker.set_partitions(cursors)
    tracker.write()

    metrics = {
        "run_id": run_id,
        "elapsed_sec": time.time() - t0,
        "stages": lineage.metrics(),
        "sinks": sink_counts,
        "agg_rows": agg_counts,
        "watermark": str(tracker.value),
    }
    if cfg.out_dir:
        os.makedirs(cfg.out_dir, exist_ok=True)
        with open(os.path.join(cfg.out_dir, "metrics.json"), "w", encoding="utf-8") as fh:
            json.dump(metrics, fh, default=str, indent=2)
    return metrics
