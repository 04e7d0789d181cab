from logstash_integration_jdbc_spark.functions.interpolate import (  # noqa: F401
    field_ref,
    param_expr,
    sprintf_expr,
)
from logstash_integration_jdbc_spark.functions.parse import (  # noqa: F401
    GrokParser,
    parse_tool_calls,
)
from logstash_integration_jdbc_spark.functions.timezone import (  # noqa: F401
    local_to_utc,
)
from logstash_integration_jdbc_spark.functions.charset import (  # noqa: F401
    convert_charset,
)
