from canal_spark.schema.ddl import DdlCommand, parse_ddl  # noqa: F401
from canal_spark.schema.tracker import SchemaTracker  # noqa: F401
