"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and (where present) its
``oracle_sql()`` on DuckDB over the same parquet tables, then compares
row count, column names, and exact values (rows sorted by all columns,
column order by name). Usage:

    python tools/check_correctness.py [sf_dir] [query ...]

Driver-faithfulness (VERDICT r04 next #1b — the old gate could NOT
reproduce the driver's red rows):

- ``oracle_sql()`` is evaluated BEFORE any query runs, in a state where
  no query has recorded an sf dir — the driver's order.
- ``SPARK_GRAFT_CORRECTNESS_SF_DIR`` is only pinned when an sf_dir was
  explicitly passed on argv; a bare run leaves the env untouched exactly
  like the driver (oracles then resolve their default sf0.01).
- A float column on one side vs an integer column on the other is a
  FAILURE, not a cast-and-compare: the driver hashes value strings, so
  DuckDB's ``SUM(BIGINT) -> HUGEINT -> pandas float64`` (``12.0``) never
  hash-equals Spark's int64 (``12``) even when the integers are equal.
  The old ``astype`` normalization masked exactly this for two rounds
  (cdc_agg_rollup, VERDICT r04 wrong #1).
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df.sort_values(list(df.columns), ignore_index=True)


def main() -> int:
    explicit_sf = len(sys.argv) > 1 and os.path.isdir(sys.argv[1])
    sf_dir = sys.argv[1] if explicit_sf else "/root/testdata/sf0.01"
    only = set(sys.argv[2:] if explicit_sf else sys.argv[1:])

    if explicit_sf:
        # pin the expected-state oracles to THIS gate's sf dir — without it,
        # a gate at any sf other than the driver-contract sf0.01 compared
        # queries at sf X against oracles at sf0.01 and red-ed out
        # spuriously (VERDICT r03 missing #1)
        os.environ["SPARK_GRAFT_CORRECTNESS_SF_DIR"] = sf_dir
    else:
        os.environ.pop("SPARK_GRAFT_CORRECTNESS_SF_DIR", None)

    import __spark_entry__ as ent
    from canal_spark.session import get_spark

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    # driver order: the oracle SQL strings (and any expected-state parquet
    # they materialize) are produced before a single query has run
    oracles = ent.oracle_sql()
    qs = ent.queries()
    spark = get_spark("check_correctness")
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(sdf)} (rows-only) [{dt:.1f}s]")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        s, d = _norm(sdf), _norm(ddf)
        if list(s.columns) != list(d.columns):
            failures.append(name)
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(d.columns)}")
            continue
        if len(s) != len(d):
            failures.append(name)
            print(f"FAIL {name}: rows {len(s)} vs {len(d)}")
            continue
        bad = reason = None
        for c in s.columns:
            a, b = s[c], d[c]
            a_f, b_f = a.dtype.kind == "f", b.dtype.kind == "f"
            if a_f != b_f and not (a.isna().any() or b.isna().any()):
                # one side float, the other integral, and NOT the
                # nullable-int-becomes-float64 pandas artifact (no NaNs):
                # the driver's value hash sees "12.0" vs "12" -> red
                bad, reason = c, (f"dtype kind mismatch (spark {a.dtype} vs "
                                  f"duck {b.dtype}) — driver hash would differ")
                break
            if a_f or b_f:
                eq = np.allclose(a.astype(float), b.astype(float),
                                 rtol=0, atol=0, equal_nan=True)
            else:
                eq = a.equals(b.astype(a.dtype)) if a.dtype != b.dtype else a.equals(b)
            if not eq:
                bad, reason = c, "values differ"
                break
        if bad:
            failures.append(name)
            print(f"FAIL {name}: column '{bad}': {reason}")
            if reason == "values differ":
                merged = pd.DataFrame({"spark": s[bad], "duck": d[bad]})
                print(merged[merged["spark"] != merged["duck"]].head(5))
        else:
            ftypes = [c for c in s.columns if s[c].dtype.kind == "f"]
            note = f" (float cols: {ftypes})" if ftypes else ""
            print(f"ok   {name}: rows={len(s)} cols={len(s.columns)} exact{note} [{dt:.1f}s]")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
