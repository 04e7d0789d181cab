from logstash_integration_jdbc_spark.sources.generator import (  # noqa: F401
    gen_role_dim,
    gen_tool_dim,
    gen_transcripts,
)
from logstash_integration_jdbc_spark.sources.scan import (  # noqa: F401
    incremental_scan,
    load_testdata,
    read_statement_file,
    scan_table,
)
from logstash_integration_jdbc_spark.sources.value_tracking import (  # noqa: F401
    ValueTracker,
)
from logstash_integration_jdbc_spark.sources.loader import DimensionLoader  # noqa: F401
