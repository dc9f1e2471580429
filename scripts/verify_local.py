"""Local mimic of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 on Spark AND the
matching ``oracle_sql()`` on DuckDB, then compares:
  - row count
  - sorted column names
  - order-insensitive multiset of row values (columns sorted by name,
    floats compared exactly INCLUDING the sign of zero, and every
    numeric tagged by python type — queries are written to be
    bit-reproducible and type-identical across engines)

Usage: python scripts/verify_local.py [query_name ...]
"""

from __future__ import annotations

import decimal
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("VERIFY_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    # NOTE: deliberately NO -0.0 → 0.0 normalization here, and numeric
    # values carry a TYPE TAG. The driver hashes raw values, so the
    # local gate must distinguish everything Python's `==` blurs:
    # r8's a13 red (`-0.0` vs `+0.0`) passed locally only because this
    # function used to erase the sign, and `5 == 5.0 == Decimal(5)`
    # would likewise hide an int-vs-float-vs-decimal engine skew.
    # Engine/oracle pairs normalize zero sign themselves
    # (scalars.round_z / `ROUND(..)+0.0`) and cast types identically.
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


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
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
            s_rows = [tuple(r) for r in sdf.collect()]
            s_cols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok   {name}: rows-only ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            cur = con.execute(sql)
            d_cols = [d[0] for d in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if not problems:
            cs, cd = canon(s_rows, s_cols), canon(d_rows, d_cols)
            if cs != cd:
                diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
                problems.append(f"values differ, first diffs: {diffs}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
