"""Multiline assembly — the logstash ``multiline`` codec, columnar.

Stack traces, SQL dumps, and wrapped log lines arrive as many physical
lines per logical event; the codec folds them back together (public
logstash-codec-multiline semantics: ``pattern`` + ``negate`` +
``what => previous|next``). The streaming codec buffers lines per
source; the columnar form needs no buffer:

1. a boolean "this line STARTS a new event" per row,
2. its running sum over (source, line order) = the event ordinal,
3. one groupBy (source, ordinal) gathering the lines in order.

Config mapping from the codec:

- ``what => previous`` + ``negate => false`` (the common stack-trace
  shape: continuation lines match the pattern, e.g. leading
  whitespace): start ⇔ NOT match.
- ``what => previous`` + ``negate => true``: start ⇔ match (e.g.
  every event begins with a timestamp).
- ``what => next``: a matching line belongs to the FOLLOWING event —
  equivalently, a line starts an event iff the PREVIOUS line did not
  match; pass ``what="next"`` and the shift happens via ``lag``.

Physical shape: one exchange on the group key; the window and the
groupBy share that partitioning. Lines before the first start form
event ordinal 0 and are tagged orphaned (the codec would flush them
with ``_multiline`` semantics on stream start).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def multiline_assemble(df: DataFrame, start_cond: Column, *,
                       group_cols: Sequence[str] = ("source",),
                       order_cols: Sequence[str] = ("line_no",),
                       text_col: str = "line", sep: str = "\n",
                       what: str = "previous") -> DataFrame:
    """Fold physical lines into logical events.

    Output: group_cols + ``event_no`` (1-based; 0 = orphaned leading
    lines), ``message`` (lines joined by ``sep`` in order), ``n_lines``,
    ``first_line``/``last_line`` (the order value span), ``orphaned``.
    """
    if what not in ("previous", "next"):
        raise ValueError(f"what must be 'previous' or 'next', got {what!r}")
    gcols = [F.col(c) for c in group_cols]
    ocols = [F.col(c) for c in order_cols]
    w = Window.partitionBy(*gcols).orderBy(*ocols)
    if what == "next":
        # a line starts an event iff the previous line did NOT ask to
        # attach forward (first line of each group always starts)
        start = ~F.coalesce(F.lag(start_cond).over(w), F.lit(False))
    else:
        start = start_cond
    df = df.withColumn("_event_no", F.sum(start.cast("long")).over(w))
    if len(order_cols) == 1:
        key = ocols[0]
    else:
        key = F.struct(*[c.alias(f"o{i}") for i, c in enumerate(ocols)])
    piece = F.struct(key.alias("k"), F.col(text_col).alias("line"))
    g = df.groupBy(*gcols, F.col("_event_no").alias("event_no")).agg(
        F.array_sort(F.collect_list(piece)).alias("_lines"),
        F.count(F.lit(1)).alias("n_lines"),
        F.min(ocols[0]).alias("first_line"),
        F.max(ocols[0]).alias("last_line"))
    return (g.withColumn(
                "message",
                F.array_join(F.transform(F.col("_lines"), lambda p: p["line"]),
                             sep))
             .withColumn("orphaned", F.col("event_no") == 0)
             .select(*group_cols, "event_no", "message", "n_lines",
                     "first_line", "last_line", "orphaned"))
