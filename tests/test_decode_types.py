"""Wire-codec type breadth: to_wire → decode_images must be an exact
inverse for every type the DDL kernel can emit (LogEventConvert.java:
762-847 value kernel + JsonConversion.java JSON columns — VERDICT r01
"type-conversion kernel breadth")."""

import datetime
from decimal import Decimal

from pyspark.sql import functions as F
from pyspark.sql import types as T

from canal_spark.operators.decode import decode_images, to_wire
from canal_spark.schema.ddl import mysql_type_to_spark

# one column per distinct kernel target type, with edgy values
FIELDS = [
    ("c_int", T.IntegerType(), [2147483647, -2147483648, 0, None]),
    ("c_long", T.LongType(), [9223372036854775807, -9223372036854775808, 1, None]),
    ("c_unsigned_big", T.DecimalType(20, 0),
     [Decimal(2) ** 64 - 1, Decimal(0), Decimal(1), None]),
    ("c_dec", T.DecimalType(12, 4),
     [Decimal("12345678.9999"), Decimal("-0.0001"), Decimal("0.1000"), None]),
    ("c_float", T.FloatType(), [1.5, -0.25, 3.0, None]),
    ("c_double", T.DoubleType(), [0.1, -2.5e300, 1e-300, None]),
    ("c_bool", T.BooleanType(), [True, False, True, None]),
    ("c_str", T.StringType(), ["plain", "uni ✓ \x01 sep", "", None]),
    ("c_json", T.StringType(), ['{"a": [1, 2], "b": {"c": "d"}}', "[]", "{}", None]),
    ("c_bin", T.BinaryType(), [b"\x00\x01\xff", b"", b"abc", None]),
    ("c_date", T.DateType(),
     [datetime.date(2024, 2, 29), datetime.date(1970, 1, 1),
      datetime.date(9999, 12, 31), None]),
    ("c_ts", T.TimestampType(),
     [datetime.datetime(2024, 2, 29, 23, 59, 59, 123456),
      datetime.datetime(1970, 1, 1, 0, 0, 0),
      datetime.datetime(2038, 1, 19, 3, 14, 7), None]),
    ("c_arr", T.ArrayType(T.IntegerType()), [[1, 2, 3], [], [50256], None]),
]


def test_wire_roundtrip_all_kernel_types(spark):
    image = T.StructType([T.StructField(n, t, True) for n, t, _ in FIELDS])
    rows = [
        tuple(vals[i] for _, _, vals in FIELDS)
        for i in range(4)
    ]
    typed = spark.createDataFrame(
        [(f"r{i}", row, row) for i, row in enumerate(rows)],
        T.StructType([
            T.StructField("rid", T.StringType()),
            T.StructField("after", image),
            T.StructField("before", image),
        ]),
    )
    wire = to_wire(typed)
    assert dict(wire.dtypes)["after"] == "string"
    back = decode_images(wire, image)
    a = sorted(typed.select("rid", "after", "before").collect())
    b = sorted(back.select("rid", "after", "before").collect())
    assert a == b


def test_decode_projects_and_backfills(spark):
    """Decoding with a NARROWER schema drops fields (needField projection);
    with a WIDER schema, missing fields decode to NULL (post-ADD-COLUMN)."""
    image = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("n_tok", T.IntegerType()),
    ])
    typed = spark.createDataFrame(
        [("r1", ("d1", 5), None)],
        T.StructType([
            T.StructField("rid", T.StringType()),
            T.StructField("after", image),
            T.StructField("before", image),
        ]))
    wire = to_wire(typed)
    narrow = T.StructType([T.StructField("doc_id", T.StringType())])
    wide = image.add("quality", T.LongType())
    got_n = decode_images(wire, narrow).select("after").collect()[0][0]
    assert got_n.asDict() == {"doc_id": "d1"}
    got_w = decode_images(wire, wide).select("after").collect()[0][0]
    assert got_w.asDict() == {"doc_id": "d1", "n_tok": 5, "quality": None}


def test_ddl_kernel_to_codec_path():
    """Every type the ALTER grammar can produce is a type the codec can
    carry (smoke: mysql type string → Spark type → usable in from_json)."""
    for mysql_t in ["int", "int unsigned", "bigint", "bigint unsigned",
                    "decimal(12,4)", "float", "double", "date",
                    "datetime", "timestamp", "varchar(64)", "text",
                    "json", "enum('a','b')", "blob", "bit", "boolean"]:
        st = mysql_type_to_spark(mysql_t)
        T.StructType([T.StructField("c", st, True)]).json()  # serializable
