from logstash_integration_jdbc_spark.streaming.stream import (  # noqa: F401
    run_streaming_pipeline,
    streaming_hourly_counts,
)
from logstash_integration_jdbc_spark.streaming.stateful import (  # noqa: F401
    conversation_state,
    run_conversation_tracker,
)
