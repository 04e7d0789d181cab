"""PySpark-native parse → enrich → route → aggregate analytics engine.

A from-scratch reimagination of the query/data-processing capabilities of
``logstash-plugins/logstash-integration-jdbc`` (incremental checkpointed
scans, cached lookup enrichment, dimension-table joins, tag-based routing,
windowed aggregation) as an idiomatic Spark DataFrame pipeline over
transcript tables ``(conv_id, turn_idx, role, text, tool, ts)``.

Nothing here is a port: the reference delegates all relational work to a
remote database via SQL strings (see SURVEY.md §2); this engine owns the
relational plan natively via Catalyst and expresses the reference's
*pipeline* semantics (watermark checkpoints, lookup defaults/tags, routing)
as declarative column expressions and broadcast hash joins.
"""

__version__ = "0.1.0"

from logstash_integration_jdbc_spark.session import get_spark  # noqa: F401
