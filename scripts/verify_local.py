"""Local mimic of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 on Spark AND the
matching ``oracle_sql()`` on DuckDB, then compares:
  - row count
  - sorted column names
  - order-insensitive multiset of row values (columns sorted by name,
    floats compared exactly INCLUDING the sign of zero, and every
    numeric tagged by python type — queries are written to be
    bit-reproducible and type-identical across engines)

GATE PARITY (r10, closing the r9 blind spot): both sides are fetched
through PANDAS — ``DataFrame.toPandas()`` for Spark and ``cur.df()``
for DuckDB — because that is the driver's conversion pipeline. The r9
reds both hid behind the old ``fetchall()`` fetch: DuckDB's Python
client returns HUGEINT as Python int, but its pandas client converts
HUGEINT (any uncast SUM over BIGINT) to float64, which the driver then
hashes as a float while Spark emits int64 (t26). Likewise a top-level
list cell survives fetchall() but crashes the driver's pandas
``sort_values`` canonicalizer (p15). Fetching through pandas makes the
local gate see exactly what the driver sees; ``norm_cell`` then tags
the pandas-made types. A top-level collection column is reported as a
failure outright, mirroring the driver's crash.

Usage: python scripts/verify_local.py [query_name ...]
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("VERIFY_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def from_pandas(v):
    """Collapse pandas/numpy wrapper scalars to the plain-Python value
    the driver's hash would see, PRESERVING the numeric family the
    pandas conversion chose (np.float64 -> float, np.int64 -> int):
    that family skew is exactly what the r9 t26 red was made of, so it
    must survive into norm_cell's type tags."""
    if v is None or v is pd.NaT or v is pd.NA:
        return None
    if isinstance(v, np.generic):
        return v.item()
    if isinstance(v, np.ndarray):
        return [from_pandas(x) for x in v.tolist()]
    if isinstance(v, (pd.Timestamp,)):
        return v.to_pydatetime()
    return v


def norm_cell(v):
    # NOTE: deliberately NO -0.0 → 0.0 normalization here, and numeric
    # values carry a TYPE TAG. The driver hashes raw values, so the
    # local gate must distinguish everything Python's `==` blurs:
    # r8's a13 red (`-0.0` vs `+0.0`) passed locally only because this
    # function used to erase the sign, and `5 == 5.0 == Decimal(5)`
    # would likewise hide an int-vs-float-vs-decimal engine skew.
    # Engine/oracle pairs normalize zero sign themselves
    # (scalars.round_z / `ROUND(..)+0.0`) and cast types identically.
    v = from_pandas(v)
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        if v == 0.0:
            # Python == treats -0.0 == 0.0; tag the sign so the gate
            # fails exactly where the driver's bit hash would.
            return ("f", "zero", math.copysign(1.0, v))
        return ("f", v)
    if isinstance(v, decimal.Decimal):
        return ("d", str(v))
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        # date == midnight-timestamp ACROSS ENGINES: Spark DATE
        # toPandas as datetime.date while DuckDB DATE .df()'s as
        # datetime64[ns] midnight — and the driver demonstrably
        # accepts that pair (e4 was driver-green in r5 with exactly
        # this skew), so the local gate must not be stricter
        return datetime.datetime(v.year, v.month, v.day).isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        # recurse: numerics INSIDE array/struct cells must get the same
        # tags (r9 review — a [-0.0] vs [0.0] array element would pass
        # Python list equality and fail a driver bit hash)
        return ("a", tuple(norm_cell(x) for x in v))
    if isinstance(v, dict):
        return ("m", tuple(sorted((k, norm_cell(x)) for k, x in v.items())))
    return v


def collection_cols(pdf: pd.DataFrame) -> list[str]:
    """Top-level array/map/struct cells crash the driver's pandas
    sort_values canonicalizer ('unhashable type: list' — the r9 p15
    red). Detect them from the fetched frame: any object-dtype column
    whose first non-null value is a list/dict/ndarray."""
    bad = []
    for c in pdf.columns:
        if pdf[c].dtype != object:
            continue
        s = pdf[c].dropna()
        if len(s) and isinstance(s.iloc[0], (list, dict, np.ndarray)):
            bad.append(str(c))
    return bad


def canon(pdf: pd.DataFrame):
    cols = list(pdf.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = list(pdf.itertuples(index=False, name=None))
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def main():
    import __spark_entry__ as entry_mod
    from cellphe_data_pipeline_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            s_pdf = sdf.toPandas()
            s_cols = list(sdf.columns)
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok   {name}: rows-only ({len(s_pdf)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            d_pdf = con.execute(sql).df()
            d_cols = list(d_pdf.columns)
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = []
        bad_cols = sorted(set(collection_cols(s_pdf)) | set(collection_cols(d_pdf)))
        if bad_cols:
            problems.append(
                f"top-level collection columns (driver canonicalizer crashes): {bad_cols}"
            )
        if len(s_pdf) != len(d_pdf):
            problems.append(f"rowcount spark={len(s_pdf)} duck={len(d_pdf)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if not problems:
            cs, cd = canon(s_pdf), canon(d_pdf)
            if cs != cd:
                diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
                problems.append(f"values differ, first diffs: {diffs}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_pdf)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
