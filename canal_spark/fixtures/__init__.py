from canal_spark.fixtures.generator import (  # noqa: F401
    CdcLogSpec,
    generate_base_table,
    generate_cdc_log,
)
