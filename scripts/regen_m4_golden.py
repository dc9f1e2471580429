"""Regenerate the m4_static_features golden VALUES oracle in place.

    python scripts/regen_m4_golden.py

Executes the registered m4 query at sf0.01 (the fixture ignores sf),
formats the rows (floats rounded to 6, matching the query's rounding),
and rewrites the SQL literal inside queries.py between the
m4_static_features @register header and `def m4`.

ANTI-CIRCULARITY INVARIANT — read before running. This golden is
produced BY the engine, so by itself it can only pin regressions, not
prove correctness. It is a legitimate oracle ONLY while every feature
it contains is independently cross-checked by a direct-numpy oracle
test in tests/test_domain.py (the per-block closed-form tests +
tests/test_regen_guard.py, which asserts that coverage is exhaustive
over STATIC_FEATURE_NAMES). Therefore:

  1. NEVER regen to "fix" a golden mismatch you can't explain — that
     buries a kernel bug in the oracle.
  2. Before regenerating after a kernel change, add/extend the
     direct-numpy oracle test for EVERY feature whose values change,
     and get `pytest tests/test_domain.py tests/test_regen_guard.py`
     green first.
  3. Only then regen, and commit the golden change together with the
     kernel + test change so the diff shows all three moving at once.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES_PY = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "cellphe_data_pipeline_spark",
    "queries.py",
)


def fmt(v):
    if isinstance(v, str):
        return f"'{v}'"
    return repr(round(v, 6)) if isinstance(v, float) else str(v)


def main() -> None:
    from cellphe_data_pipeline_spark.domain.features import STATIC_FEATURE_NAMES
    from cellphe_data_pipeline_spark.queries import REGISTRY
    from cellphe_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="regen-m4-golden")
    rows = (
        REGISTRY["m4_static_features"]
        .fn(spark, "/root/testdata/sf0.01")
        .orderBy("FrameID", "CellID")
        .collect()
    )
    names = list(STATIC_FEATURE_NAMES)

    select_lines = [
        "    SELECT path,",
        "           CAST(f AS INT) AS FrameID,",
        "           CAST(c AS INT) AS CellID,",
        "           rf AS ROI_filename,",
    ]
    for i, n in enumerate(names, start=4):
        comma = "," if i < len(names) + 3 else ""
        select_lines.append(f"           CAST(v{i} AS DOUBLE) AS {n}{comma}")
    vals = ",\n".join(
        "      ("
        + ", ".join(
            [fmt(r["path"]), str(r["FrameID"]), str(r["CellID"]), fmt(r["ROI_filename"])]
            + [fmt(r[n]) for n in names]
        )
        + ")"
        for r in rows
    )
    tcols = ", ".join(
        ["path", "f", "c", "rf"] + [f"v{i}" for i in range(4, len(names) + 4)]
    )
    new_sql = (
        "\n".join(select_lines)
        + "\n    FROM (VALUES\n"
        + vals
        + f"\n    ) AS t({tcols})\n    "
    )

    src = open(QUERIES_PY).read()
    pat = re.compile(
        r'(@register\(\n    "m4_static_features",\n    """\n)(.*?)(""",\n\)\ndef m4)',
        re.S,
    )
    m = pat.search(src)
    assert m, "m4_static_features golden block not found in queries.py"
    open(QUERIES_PY, "w").write(src[: m.start(2)] + new_sql + src[m.end(2):])
    print(f"regenerated: {len(rows)} rows x {len(names) + 4} cols -> {QUERIES_PY}")


if __name__ == "__main__":
    main()
