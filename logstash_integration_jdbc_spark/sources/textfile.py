"""Raw log-file ingestion — the ``file`` input, Spark-first.

The reference integration assumes rows arrive from a database, but a
logstash deployment's other ingest half is the file input (public
logstash-input-file semantics: tail files, one event per line, path
carried on the event). The columnar equivalents:

- ``read_log_lines``: ``spark.read.text`` over a path/glob with the
  per-file provenance (``source``) and a per-file line ordinal
  (``line_no``) — the two columns every downstream parse/multiline
  stage keys on. Line ordinals come from ``monotonically_increasing_id``
  ranked within each file: Spark reads each split sequentially, so
  ranking the monotonic id per file reproduces physical line order;
  deterministic for a given snapshot of the files (this is a batch
  reader — the file input's tail/sincedb streaming behavior maps to
  Structured Streaming's file source, ``readStream.text``, with
  checkpointing standing in for sincedb).
- ``read_multiline_logs``: compose with the multiline codec in one
  call (operators/multiline.py).

Globs, partition-discovery, and compression (.gz etc.) all come free
from the Spark text source.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def read_log_lines(spark, path: str, *, wholetext: bool = False,
                   line_sep: str | None = None) -> DataFrame:
    """(source, line_no, line) per physical line under ``path``.

    ``wholetext=True`` yields one row per FILE (line_no 0) — the shape
    for whole-document parsing. ``line_sep`` overrides the newline
    delimiter (the codec's ``delimiter`` option).
    """
    df = spark.read.text(path, wholetext=wholetext, lineSep=line_sep)
    df = df.select(
        F.input_file_name().alias("source"),
        F.monotonically_increasing_id().alias("_mid"),
        F.col("value").alias("line"),
    )
    w = Window.partitionBy("source").orderBy("_mid")
    return (df.withColumn("line_no", F.row_number().over(w) - 1)
              .select("source", "line_no", "line"))


def read_multiline_logs(spark, path: str, start_cond: Column, *,
                        what: str = "previous", sep: str = "\n",
                        line_sep: str | None = None) -> DataFrame:
    """One logical event per row: file lines folded by the multiline
    codec (``start_cond`` over the ``line`` column)."""
    from logstash_integration_jdbc_spark.operators.multiline import (
        multiline_assemble,
    )

    lines = read_log_lines(spark, path, line_sep=line_sep)
    return multiline_assemble(lines, start_cond, group_cols=("source",),
                              order_cols=("line_no",), text_col="line",
                              sep=sep, what=what)
