"""MySQL value-kernel edge cases through the WIRE decode path.

The reference's row decode maps raw binlog values through a type kernel
(parse/.../dbsync/LogEventConvert.java:762-847): unsigned ints widen past
their signed container (:762-806), DECIMAL renders via toPlainString — no
scientific notation (:807-818), zero-dates map to null (:819-829), BLOB is
bytes while TEXT is charset-decoded (:830-847), and JSON columns arrive as
JSONB converted to text (parse/.../JsonConversion.java:13). Round 4 only
exercised these as fixture-idealized typed values (VERDICT r04 next #4);
this matrix drives them through the PRODUCTION wire path —
FlatMessage-style all-quoted JSON payloads → ``wire_net_changes``'s fused
O(keys) winner decode with its tolerant per-value cast — and one
hypothesis property fuzzes the whole matrix.
"""

import base64
import datetime
import json
from decimal import Decimal

from pyspark.sql import functions as F
from pyspark.sql import types as T

from canal_spark.operators.decode import to_wire
from canal_spark.operators.lww import wire_net_changes
from canal_spark.schema.ddl import mysql_type_to_spark

# MySQL column declarations → the kernel's Spark types
DECLS = {
    "id": "varchar(32)",
    "c_tiny_u": "tinyint unsigned",     # 0..255 still fits int32
    "c_int_u": "int unsigned",          # 0..2^32-1 widens to long
    "c_big_u": "bigint unsigned",       # 0..2^64-1 widens to decimal(20,0)
    "c_dec": "decimal(12,4)",
    "c_dt": "datetime(6)",
    "c_d": "date",
    "c_txt": "text",
    "c_blob": "blob",
    "c_json": "json",
}


def _image_schema() -> T.StructType:
    return T.StructType([
        T.StructField(n, mysql_type_to_spark(d), True)
        for n, d in DECLS.items()
    ])


def _wire_events(spark, payloads: list[dict]):
    """FlatMessage-shaped INSERT events: every scalar value a JSON string
    (the reference's MQ converter quotes all of them), blob base64, null
    as JSON null."""
    rows = [
        ("ROWDATA", "INSERT", False, f"{i:012d}", None,
         json.dumps(p, separators=(",", ":")))
        for i, p in enumerate(payloads)
    ]
    return spark.createDataFrame(
        rows, "entry_type string, event_type string, is_ddl boolean, "
              "lsn string, before string, after string")


def test_kernel_type_mapping():
    """The declaration kernel widens unsigned types exactly like
    LogEventConvert.java:762-806."""
    s = _image_schema()
    assert s["c_tiny_u"].dataType == T.IntegerType()
    assert s["c_int_u"].dataType == T.LongType()
    assert s["c_big_u"].dataType == T.DecimalType(20, 0)
    assert s["c_dec"].dataType == T.DecimalType(12, 4)
    assert s["c_blob"].dataType == T.BinaryType()
    assert s["c_txt"].dataType == T.StringType()
    assert s["c_json"].dataType == T.StringType()


def test_wire_decode_mysql_edge_matrix(spark):
    blob = b"\x00\x01\xfe\xff not-utf8 \x80"
    jdoc = '{"a":[1,2],"b":{"c":"d"},"n":null}'
    payloads = [
        {   # every value at its overflow/edge
            "id": "r1",
            "c_tiny_u": "255",
            "c_int_u": "4294967295",
            "c_big_u": "18446744073709551615",
            "c_dec": "-0.0001",
            "c_dt": "2024-02-29T23:59:59.123456+00:00",
            "c_d": "9999-12-31",
            "c_txt": "uni ✓ \x01 text-not-blob",
            "c_blob": base64.b64encode(blob).decode(),
            "c_json": jdoc,
        },
        {   # MySQL zero-dates → NULL (LogEventConvert.java:819-829); the
            # decode must NOT throw under ANSI (it used to — this row is
            # the regression pin for the try_cast fix)
            "id": "r2",
            "c_tiny_u": "0",
            "c_int_u": "0",
            "c_big_u": "0",
            "c_dec": "12345678.9999",
            "c_dt": "0000-00-00 00:00:00",
            "c_d": "0000-00-00",
            "c_txt": "",
            "c_blob": None,
            "c_json": None,
        },
    ]
    out = {r["id"]: r for r in wire_net_changes(
        _wire_events(spark, payloads), "id", _image_schema()).collect()}

    r1 = out["r1"]
    assert r1["c_tiny_u"] == 255 and isinstance(r1["c_tiny_u"], int)
    assert r1["c_int_u"] == 4294967295
    assert r1["c_big_u"] == Decimal(2) ** 64 - 1
    assert r1["c_dec"] == Decimal("-0.0001")
    assert r1["c_dt"] == datetime.datetime(2024, 2, 29, 23, 59, 59, 123456)
    assert r1["c_d"] == datetime.date(9999, 12, 31)
    assert r1["c_txt"] == "uni ✓ \x01 text-not-blob"
    assert bytes(r1["c_blob"]) == blob          # BLOB: bytes, not text
    assert r1["c_json"] == jdoc                 # JSON column: text verbatim

    r2 = out["r2"]
    assert r2["c_dt"] is None and r2["c_d"] is None   # zero-date → NULL
    assert r2["c_dec"] == Decimal("12345678.9999")
    assert r2["c_blob"] is None and r2["c_json"] is None


def test_decimal_plain_string_on_wire(spark):
    """to_wire renders DECIMAL via plain notation (toPlainString,
    LogEventConvert.java:807-818) — a scientific-notation wire value would
    round-trip but violate the FlatMessage contract real consumers parse."""
    img = T.StructType([T.StructField("id", T.StringType()),
                        T.StructField("c_dec", T.DecimalType(12, 4))])
    typed = spark.createDataFrame(
        [("r1", ("r1", Decimal("-0.0001")), None)],
        T.StructType([T.StructField("rid", T.StringType()),
                      T.StructField("after", img),
                      T.StructField("before", img)]))
    wire = to_wire(typed).select("after").first()[0]
    assert '"c_dec":-0.0001' in wire  # plain notation, no -1E-4


def test_unquoted_numerics_also_decode(spark):
    """A producer emitting raw JSON numbers (instead of FlatMessage's
    quoted strings) lands identically — the tolerant decode accepts both
    quoting conventions (operators/decode.tolerant_wire_schema)."""
    payloads = [{"id": "r1", "c_tiny_u": 255, "c_int_u": 4294967295,
                 "c_big_u": 18446744073709551615, "c_dec": 1.5,
                 "c_dt": None, "c_d": None, "c_txt": "t",
                 "c_blob": None, "c_json": None}]
    ev = _wire_events(spark, payloads)
    r = wire_net_changes(ev, "id", _image_schema()).first()
    assert r["c_tiny_u"] == 255
    assert r["c_int_u"] == 4294967295
    assert r["c_big_u"] == Decimal(2) ** 64 - 1
    assert r["c_dec"] == Decimal("1.5000")


def test_kernel_matrix_fuzz(spark):
    """One hypothesis property over the whole matrix: arbitrary in-range
    (and zero-date / None) values round-trip the wire decode to exactly
    the typed values a sequential per-row conversion produces."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    def via_python(p: dict) -> dict:
        """Sequential reference conversion (the oracle)."""
        def dt(v):
            if v is None or v.startswith("0000-00-00"):
                return None
            return datetime.datetime.fromisoformat(v.replace("T", " ")
                                                   .replace("+00:00", ""))
        return {
            "c_tiny_u": None if p["c_tiny_u"] is None else int(p["c_tiny_u"]),
            "c_int_u": None if p["c_int_u"] is None else int(p["c_int_u"]),
            "c_big_u": None if p["c_big_u"] is None else Decimal(p["c_big_u"]),
            "c_dec": None if p["c_dec"] is None
            else Decimal(p["c_dec"]).quantize(Decimal("0.0001")),
            "c_dt": dt(p["c_dt"]),
            "c_d": (None if p["c_d"] in (None, "0000-00-00")
                    else datetime.date.fromisoformat(p["c_d"])),
            "c_txt": p["c_txt"],
            "c_blob": (None if p["c_blob"] is None
                       else base64.b64decode(p["c_blob"])),
            "c_json": p["c_json"],
        }

    opt = st.none()
    payload_st = st.fixed_dictionaries({
        "c_tiny_u": opt | st.integers(0, 255).map(str),
        "c_int_u": opt | st.integers(0, 2**32 - 1).map(str),
        "c_big_u": opt | st.integers(0, 2**64 - 1).map(str),
        "c_dec": opt | st.decimals(
            min_value=Decimal("-99999999.9999"),
            max_value=Decimal("99999999.9999"),
            allow_nan=False, places=4).map(str),
        "c_dt": opt | st.just("0000-00-00 00:00:00") | st.datetimes(
            min_value=datetime.datetime(1971, 1, 1),
            max_value=datetime.datetime(2037, 12, 31),
        ).map(lambda d: d.isoformat()),
        "c_d": opt | st.just("0000-00-00") | st.dates(
            min_value=datetime.date(1971, 1, 1),
            max_value=datetime.date(2037, 12, 31),
        ).map(str),
        "c_txt": opt | st.text(max_size=40),
        "c_blob": opt | st.binary(max_size=32).map(
            lambda b: base64.b64encode(b).decode()),
        "c_json": opt | st.just('{"k":[1,"2",null]}'),
    })

    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(payload_st, min_size=1, max_size=4))
    def prop(payloads):
        ps = [dict(p, id=f"r{i}") for i, p in enumerate(payloads)]
        got = {r["id"]: r for r in wire_net_changes(
            _wire_events(spark, ps), "id", _image_schema()).collect()}
        for p in ps:
            exp = via_python(p)
            row = got[p["id"]]
            for c, v in exp.items():
                rv = row[c]
                if c == "c_blob" and rv is not None:
                    rv = bytes(rv)
                assert rv == v, (p["id"], c, rv, v)

    prop()
