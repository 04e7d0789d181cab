from logstash_integration_jdbc_spark.operators.lookup import (  # noqa: F401
    Lookup,
    LookupProcessor,
    streaming_lookup,
)
from logstash_integration_jdbc_spark.operators.router import (  # noqa: F401
    Route,
    Router,
)
from logstash_integration_jdbc_spark.operators.aggregate import (  # noqa: F401
    hourly_counts,
)
from logstash_integration_jdbc_spark.operators.skew import salted_repartition  # noqa: F401
