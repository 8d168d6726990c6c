"""DDL parsing — the DruidDdlParser analog.

The reference parses the full MySQL DDL grammar into typed results with a
SQL AST library plus a regex fallback (parse/.../mysql/ddl/
DruidDdlParser.java:46-180, SimpleDdlParser.java), exercises it against a
160-file alter corpus (parse/src/test/resources/ddl/alter/test_*.sql,
MemoryTableMeta_DDL_Test.java:27-58), and keeps a skip-list of statements
that don't change row shape (MemoryTableMeta.apply,
parse/.../tsdb/MemoryTableMeta.java:76-84).

This module covers the everyday grammar a CDC pipeline actually meets:

- multi-clause ``ALTER TABLE t ADD c1 INT, ADD c2 TEXT, DROP c3`` →
  expanded into one ``DdlCommand`` per clause, applied in order;
- ``ADD [COLUMN] (a INT, b TEXT)`` parenthesized batches;
- ``MODIFY [COLUMN] c type`` and ``CHANGE [COLUMN] old new type``;
- ``FIRST`` / ``AFTER col`` column positioning;
- ``RENAME [TO|AS]`` table renames (both the ALTER clause and the
  standalone ``RENAME TABLE a TO b`` statement);
- index/constraint/default/engine clauses classified IGNORE (no row-shape
  change);
- the full type kernel incl. parametrized types and unsigned widening
  (LogEventConvert.java:762-847: ``int unsigned`` overflows int32 → LONG,
  ``bigint unsigned`` overflows int64 → DECIMAL(20,0), ``decimal(p,s)``
  carries its precision).

DDL volume is tiny (a handful per billions of DML), so this runs
driver-side in plain Python — deliberately NOT vectorized.
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

# ALTER clauses that never alter row shape (indexes, constraints, defaults,
# table options, partitioning, charset conversions)
_IGNORED_CLAUSE = re.compile(
    r"(?i)^(?:add\s+(?:index|key|constraint|primary\s+key|unique|fulltext|"
    r"spatial|foreign\s+key|partition)|drop\s+(?:index|key|primary\s+key|"
    r"foreign\s+key|partition|check|constraint)|alter\s+(?:column\s+)?\w+\s+"
    r"(?:set|drop)\s+default|rename\s+(?:index|key)|convert\s+to|"
    r"(?:default\s+)?character\s+set|collate|engine|auto_increment|"
    r"comment|row_format|order\s+by|force|algorithm|lock|"
    r"enable\s+keys|disable\s+keys|partition\s+by)\b"
)

# simple (non-parametrized) MySQL type name → Spark type
_MYSQL_TO_SPARK: dict[str, T.DataType] = {
    "float": T.FloatType(), "double": T.DoubleType(), "real": T.DoubleType(),
    "date": T.DateType(), "datetime": T.TimestampType(),
    "timestamp": T.TimestampType(), "time": T.StringType(),
    "year": T.IntegerType(), "char": T.StringType(),
    "varchar": T.StringType(), "text": T.StringType(),
    "tinytext": T.StringType(), "mediumtext": T.StringType(),
    "longtext": T.StringType(), "json": T.StringType(),
    "enum": T.StringType(), "set": T.StringType(),
    "blob": T.BinaryType(), "tinyblob": T.BinaryType(),
    "mediumblob": T.BinaryType(), "longblob": T.BinaryType(),
    "binary": T.BinaryType(), "varbinary": T.BinaryType(),
    "bit": T.LongType(), "boolean": T.BooleanType(), "bool": T.BooleanType(),
    "string": T.StringType(),
}

_TYPE_RE = re.compile(r"(?i)^(\w+)\s*(?:\(([^)]*)\))?")


def mysql_type_to_spark(type_str: str) -> T.DataType:
    """Full type kernel: base(params) [unsigned] → Spark logical type.

    Unsigned integer widening mirrors LogEventConvert.java:762-847: an
    unsigned value can exceed its signed container, so each unsigned int
    type maps to the next wider Spark type."""
    s = (type_str or "").strip()
    m = _TYPE_RE.match(s)
    if not m:
        return T.StringType()
    base = m.group(1).lower()
    params = m.group(2)
    unsigned = bool(re.search(r"(?i)\bunsigned\b", s))

    if base in ("tinyint", "smallint", "mediumint"):
        return T.IntegerType()  # unsigned still fits int32
    if base in ("int", "integer"):
        return T.LongType() if unsigned else T.IntegerType()
    if base == "bigint":
        return T.DecimalType(20, 0) if unsigned else T.LongType()
    if base in ("decimal", "numeric"):
        if params:
            parts = [p.strip() for p in params.split(",")]
            try:
                prec = int(parts[0])
                scale = int(parts[1]) if len(parts) > 1 else 0
                return T.DecimalType(min(prec, 38), min(scale, 38))
            except ValueError:
                pass
        return T.DecimalType(10, 0)
    return _MYSQL_TO_SPARK.get(base, T.StringType())


@dataclass(frozen=True)
class DdlCommand:
    # ADD_COLUMN | RENAME_COLUMN | DROP_COLUMN | MODIFY_COLUMN |
    # CHANGE_COLUMN | RENAME_TABLE | TRUNCATE | IGNORE
    kind: str
    schema: str | None = None
    table: str | None = None
    column: str | None = None
    new_name: str | None = None
    dtype: T.DataType | None = None
    position: tuple[str, str | None] | None = None  # ("FIRST", None) | ("AFTER", col)
    sql: str = ""


def _split_table(qualified: str) -> tuple[str | None, str]:
    qualified = qualified.strip().strip("`")
    if "." in qualified:
        s, t = qualified.split(".", 1)
        return s.strip("`"), t.strip("`")
    return None, qualified


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on separators outside parens/quotes (decimal(10,2), enum('a,b'))."""
    parts, cur, depth, quote = [], [], 0, None
    for ch in s:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
        elif ch in "'\"`":
            quote = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


# column definition: name, type token (with optional parens + unsigned),
# then attribute tail (NULL/DEFAULT/COMMENT/FIRST/AFTER/...)
_COLDEF_RE = re.compile(
    r"(?i)^`?([\w$]+)`?\s+"
    r"(\w+(?:\s*\([^)]*\))?(?:\s+unsigned)?(?:\s+zerofill)?)"
    r"(.*)$"
)
_POSITION_RE = re.compile(r"(?i)\b(?:(first)|after\s+`?([\w$]+)`?)\s*$")


def _parse_position(tail: str) -> tuple[str, str | None] | None:
    m = _POSITION_RE.search(tail.strip())
    if not m:
        return None
    return ("FIRST", None) if m.group(1) else ("AFTER", m.group(2))


def _parse_coldef(text: str, sch: str | None, tbl: str,
                  sql: str) -> DdlCommand:
    m = _COLDEF_RE.match(text.strip())
    if not m:
        return DdlCommand(kind="IGNORE", sql=sql)
    name, type_str, tail = m.group(1), m.group(2), m.group(3)
    return DdlCommand(
        kind="ADD_COLUMN", schema=sch, table=tbl, column=name,
        dtype=mysql_type_to_spark(type_str), position=_parse_position(tail),
        sql=sql,
    )


def _parse_alter_clause(clause: str, sch: str | None, tbl: str,
                        sql: str) -> list[DdlCommand]:
    c = clause.strip()
    if _IGNORED_CLAUSE.match(c):
        return [DdlCommand(kind="IGNORE", sql=sql)]

    m = re.match(r"(?i)^add\s+(column\s+)?\((.*)\)\s*$", c)
    if m:  # ADD COLUMN (a INT, b TEXT)
        return [
            _parse_coldef(d, sch, tbl, sql)
            for d in _split_top_level(m.group(2))
        ]
    m = re.match(r"(?i)^add\s+(column\s+)?(.*)$", c)
    if m:
        return [_parse_coldef(m.group(2), sch, tbl, sql)]

    m = re.match(r"(?i)^modify\s+(column\s+)?(.*)$", c)
    if m:
        cmd = _parse_coldef(m.group(2), sch, tbl, sql)
        if cmd.kind == "IGNORE":
            return [cmd]
        return [DdlCommand(kind="MODIFY_COLUMN", schema=sch, table=tbl,
                           column=cmd.column, dtype=cmd.dtype,
                           position=cmd.position, sql=sql)]

    m = re.match(r"(?i)^change\s+(column\s+)?`?([\w$]+)`?\s+(.*)$", c)
    if m:
        old = m.group(2)
        cmd = _parse_coldef(m.group(3), sch, tbl, sql)
        if cmd.kind == "IGNORE":
            return [cmd]
        return [DdlCommand(kind="CHANGE_COLUMN", schema=sch, table=tbl,
                           column=old, new_name=cmd.column, dtype=cmd.dtype,
                           position=cmd.position, sql=sql)]

    m = re.match(r"(?i)^rename\s+column\s+`?([\w$]+)`?\s+to\s+`?([\w$]+)`?", c)
    if m:
        return [DdlCommand(kind="RENAME_COLUMN", schema=sch, table=tbl,
                           column=m.group(1), new_name=m.group(2), sql=sql)]

    m = re.match(r"(?i)^rename\s+(?:to|as)\s+([\w.`$]+)", c)
    if m:
        nsch, ntbl = _split_table(m.group(1))
        return [DdlCommand(kind="RENAME_TABLE", schema=sch, table=tbl,
                           new_name=f"{nsch}.{ntbl}" if nsch else ntbl,
                           sql=sql)]

    m = re.match(r"(?i)^drop\s+(column\s+)?`?([\w$]+)`?\s*$", c)
    if m:
        return [DdlCommand(kind="DROP_COLUMN", schema=sch, table=tbl,
                           column=m.group(2), sql=sql)]

    return [DdlCommand(kind="IGNORE", sql=sql)]


def parse_ddl_statements(sql: str) -> list[DdlCommand]:
    """Parse one DDL statement into its ordered list of commands (a
    multi-clause ALTER yields one command per clause)."""
    s = (sql or "").strip().rstrip(";").strip()
    if not s or _IGNORED.match(s):
        return [DdlCommand(kind="IGNORE", sql=s)]

    m = re.match(r"(?i)^truncate\s+(table\s+)?([\w.`$]+)", s)
    if m:
        sch, tbl = _split_table(m.group(2))
        return [DdlCommand(kind="TRUNCATE", schema=sch, table=tbl, sql=s)]

    m = re.match(r"(?i)^rename\s+table\s+(.*)$", s)
    if m:  # RENAME TABLE a TO b[, c TO d]
        out = []
        for pair in _split_top_level(m.group(1)):
            pm = re.match(r"(?i)^([\w.`$]+)\s+to\s+([\w.`$]+)$", pair.strip())
            if pm:
                sch, tbl = _split_table(pm.group(1))
                nsch, ntbl = _split_table(pm.group(2))
                out.append(DdlCommand(
                    kind="RENAME_TABLE", schema=sch, table=tbl,
                    new_name=f"{nsch}.{ntbl}" if nsch else ntbl, sql=s))
        return out or [DdlCommand(kind="IGNORE", sql=s)]

    m = re.match(r"(?i)^alter\s+table\s+([\w.`$]+)\s+(.*)$", s, re.DOTALL)
    if m:
        sch, tbl = _split_table(m.group(1))
        out: list[DdlCommand] = []
        for clause in _split_top_level(m.group(2)):
            out.extend(_parse_alter_clause(clause, sch, tbl, s))
        return out or [DdlCommand(kind="IGNORE", sql=s)]

    return [DdlCommand(kind="IGNORE", sql=s)]


def parse_ddl(sql: str) -> DdlCommand:
    """Single-command view (first parsed command) — legacy entry point for
    callers that predate multi-clause support."""
    return parse_ddl_statements(sql)[0]
