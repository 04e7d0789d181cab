from logstash_integration_jdbc_spark.plans.lineage import LineageCollector  # noqa: F401
