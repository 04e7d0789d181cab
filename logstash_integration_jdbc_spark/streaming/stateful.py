"""Custom stateful streaming operator: per-conversation running state.

The reference's only state is the scalar ``sql_last_value`` cursor; the
north_star extends this to per-conversation cursors. In Structured
Streaming that is a custom stateful operator —
``applyInPandasWithState`` — tracking, per ``conv_id``:

    (n_turns seen, max turn_idx, max ts, n_tool_calls)

State lives in the streaming state store (checkpointed, resumes across
``availableNow`` invocations exactly like the ValueTracker file does for
the batch pipeline). The update function is Arrow-batched: it receives
pandas DataFrames per group — no per-row Python.

Scale note: state is partitioned by conv_id across executors; a hot
conversation is a single group (state updates are O(batch) appends, not
O(history)), and the state row is constant-size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_turns long, max_turn_idx int, max_ts timestamp, n_tool_calls long"
OUTPUT_SCHEMA = (
    "conv_id string, n_turns long, max_turn_idx int, max_ts timestamp, "
    "n_tool_calls long"
)


def _update_conversation(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.exists:
        n_turns, max_turn_idx, max_ts, n_tool_calls = state.get
    else:
        n_turns, max_turn_idx, max_ts, n_tool_calls = 0, -1, None, 0
    for pdf in pdfs:
        n_turns += len(pdf)
        if len(pdf):
            max_turn_idx = max(max_turn_idx, int(pdf["turn_idx"].max()))
            batch_max_ts = pdf["ts"].max()
            max_ts = batch_max_ts if max_ts is None else max(max_ts, batch_max_ts)
            if "parse_ok" in pdf.columns:
                n_tool_calls += int(pdf["parse_ok"].sum())
    state.update((n_turns, max_turn_idx, max_ts, n_tool_calls))
    yield pd.DataFrame(
        [{"conv_id": conv_id, "n_turns": n_turns, "max_turn_idx": max_turn_idx,
          "max_ts": max_ts, "n_tool_calls": n_tool_calls}]
    )


def conversation_state(stream: DataFrame) -> DataFrame:
    """Streaming per-conversation cursor via applyInPandasWithState."""
    return (
        stream.groupBy("conv_id")
        .applyInPandasWithState(
            _update_conversation,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_conversation_tracker(
    spark, transcripts_path: str, out_dir: str, checkpoint_dir: str
) -> None:
    """One availableNow pass updating per-conversation cursors."""
    from logstash_integration_jdbc_spark.functions.parse import parse_tool_calls

    schema = spark.read.parquet(transcripts_path).schema
    stream = spark.readStream.schema(schema).parquet(transcripts_path)
    parsed = parse_tool_calls(stream).select("conv_id", "turn_idx", "ts", "parse_ok")
    states = conversation_state(parsed)
    q = (
        states.writeStream.outputMode("update")
        .foreachBatch(lambda df, bid: df.write.mode("overwrite")
                      .parquet(f"{out_dir}/batch={bid}"))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
