"""Charset re-encoding (P4): per-column or global.

The input re-encodes string columns from a source charset to UTF-8
(``charset`` / ``columns_charset``,
/root/reference/lib/logstash/inputs/jdbc.rb:220-239,396-409). Spark-side:
the bytes are reinterpreted via ``encode``/``decode`` built-ins —
JVM-vectorized, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def convert_charset(df: DataFrame, charset: str | None = None,
                    columns_charset: dict[str, str] | None = None) -> DataFrame:
    """Re-decode string columns that were mis-read in ``charset``.

    ``columns_charset`` overrides per column (reference: columns_charset
    takes precedence over charset for listed columns, jdbc.rb:396-409).
    """
    columns_charset = columns_charset or {}
    string_cols = [c for c, t in df.dtypes if t == "string"]
    for c in string_cols:
        cs = columns_charset.get(c, charset)
        if cs is None or cs.upper() in ("UTF-8", "UTF8"):
            continue
        # original bytes were charset `cs` but got read as if latin-1/UTF-8;
        # reinterpret: string → bytes in cs → decode UTF-8 path of reference
        # is byte-preserving, so: encode to binary using cs, decode as UTF-8.
        df = df.withColumn(c, F.decode(F.encode(F.col(c), cs), "UTF-8"))
    return df
