from canal_spark.operators.filters import envelope_filter  # noqa: F401
from canal_spark.operators.lww import changes_from_events, collapse_lww  # noqa: F401
