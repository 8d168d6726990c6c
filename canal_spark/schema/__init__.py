from canal_spark.schema.ddl import (  # noqa: F401
    DdlCommand,
    mysql_type_to_spark,
    parse_ddl,
    parse_ddl_statements,
)
from canal_spark.schema.tracker import SchemaTracker  # noqa: F401
