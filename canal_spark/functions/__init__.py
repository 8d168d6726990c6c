"""Training-data pipeline operators over document/embedding tables.

Beyond the reference's CDC operators, a 100 TB training-data lake needs
dedup, similarity search, text analysis, and multimodal plumbing — all
implemented with built-in JVM-side functions (whole-stage codegen) except
where Arrow-batched pandas UDFs are genuinely required.
"""

from canal_spark.functions import dedup, similarity, text  # noqa: F401
