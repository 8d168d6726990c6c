"""DDL classification — the DruidDdlParser analog.

The reference parses DDL SQL into a DdlResult (type, schema, table, rename
chain) with a full SQL AST library and a regex fallback
(parse/.../mysql/ddl/DruidDdlParser.java:46-180, SimpleDdlParser.java), and
keeps a skip-list of statements that don't change row shape
(MemoryTableMeta.apply, parse/.../tsdb/MemoryTableMeta.java:76-84).

DDL volume is tiny (a handful per billions of DML), so this runs driver-side
in plain Python — deliberately NOT vectorized.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import types as T

# statements that never alter the subscribed table's row shape
_IGNORED = re.compile(
    r"(?i)^\s*(create\s+(unique\s+)?index|drop\s+index|grant|revoke|flush|"
    r"set\s|analyze|optimize|repair|comment|begin|commit|rollback)"
)

# MySQL type name → Spark type (LogEventConvert.java:762-847 type kernel,
# collapsed to the lake's logical types)
_MYSQL_TO_SPARK: dict[str, T.DataType] = {
    "tinyint": T.IntegerType(), "smallint": T.IntegerType(),
    "mediumint": T.IntegerType(), "int": T.IntegerType(),
    "integer": T.IntegerType(), "bigint": T.LongType(),
    "float": T.FloatType(), "double": T.DoubleType(),
    "decimal": T.DecimalType(38, 18), "bit": T.LongType(),
    "date": T.DateType(), "datetime": T.TimestampType(),
    "timestamp": T.TimestampType(), "time": T.StringType(),
    "year": T.IntegerType(), "char": T.StringType(),
    "varchar": T.StringType(), "text": T.StringType(),
    "tinytext": T.StringType(), "mediumtext": T.StringType(),
    "longtext": T.StringType(), "json": T.StringType(),
    "enum": T.StringType(), "set": T.StringType(),
    "blob": T.BinaryType(), "binary": T.BinaryType(),
    "varbinary": T.BinaryType(), "string": T.StringType(),
}


@dataclass(frozen=True)
class DdlCommand:
    kind: str  # ADD_COLUMN | RENAME_COLUMN | DROP_COLUMN | TRUNCATE | IGNORE
    schema: str | None = None
    table: str | None = None
    column: str | None = None
    new_name: str | None = None
    dtype: T.DataType | None = None
    sql: str = ""


def _split_table(qualified: str) -> tuple[str | None, str]:
    qualified = qualified.strip().strip("`")
    if "." in qualified:
        s, t = qualified.split(".", 1)
        return s.strip("`"), t.strip("`")
    return None, qualified


def parse_ddl(sql: str) -> DdlCommand:
    s = (sql or "").strip().rstrip(";").strip()
    if not s or _IGNORED.match(s):
        return DdlCommand(kind="IGNORE", sql=s)

    m = re.match(r"(?i)truncate\s+(table\s+)?([\w.`]+)", s)
    if m:
        sch, tbl = _split_table(m.group(2))
        return DdlCommand(kind="TRUNCATE", schema=sch, table=tbl, sql=s)

    m = re.match(
        r"(?i)alter\s+table\s+([\w.`]+)\s+add\s+(column\s+)?`?(\w+)`?\s+(\w+)", s
    )
    if m:
        sch, tbl = _split_table(m.group(1))
        dtype = _MYSQL_TO_SPARK.get(m.group(4).lower(), T.StringType())
        return DdlCommand(kind="ADD_COLUMN", schema=sch, table=tbl,
                          column=m.group(3), dtype=dtype, sql=s)

    m = re.match(
        r"(?i)alter\s+table\s+([\w.`]+)\s+rename\s+column\s+`?(\w+)`?\s+to\s+`?(\w+)`?",
        s,
    )
    if m:
        sch, tbl = _split_table(m.group(1))
        return DdlCommand(kind="RENAME_COLUMN", schema=sch, table=tbl,
                          column=m.group(2), new_name=m.group(3), sql=s)

    m = re.match(r"(?i)alter\s+table\s+([\w.`]+)\s+drop\s+(column\s+)?`?(\w+)`?", s)
    if m:
        sch, tbl = _split_table(m.group(1))
        return DdlCommand(kind="DROP_COLUMN", schema=sch, table=tbl,
                          column=m.group(3), sql=s)

    return DdlCommand(kind="IGNORE", sql=s)
