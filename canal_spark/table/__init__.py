from canal_spark.table.lake import LakeTable  # noqa: F401
