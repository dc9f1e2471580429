"""Measured scaling curve for the d3 MinHash+LSH near-dup path (r11,
verdict ask #6): wall time AND total shuffle bytes at sf0.001 / 0.01 /
0.1 (documents table grows ~100x across the range), each SF in a FRESH
JVM so no cache or codegen warmth leaks across points.

Method:
  - per SF, a subprocess builds the engine session with the Spark
    event log enabled, runs d3_minhash_near_dups TWICE (run 1 warms
    the JVM/codegen/python workers; run 2 is the timed sample), stops
    the session, then parses the event log: the sum of every task's
    "Shuffle Bytes Written" is the whole-run shuffle volume — it sees
    through lineage cuts and sub-jobs, which executed-plan metric
    traversal does not (d3 stages shingles behind a lazy
    localCheckpoint).
  - shuffle bytes are reported for the timed run only (jobs after the
    warm run's last job id).

Output: one JSON line per SF plus a summary with the scaling exponent
alpha where wall ~ data^alpha (alpha = slope of log wall vs log SF).

Usage: python scripts/d3_scaling_probe.py [--sfs 0.001,0.01,0.1]
       [--query=<registry name>] [--table=<x-axis row-count table>]
(r11: generalised — any registered query, x-axis rows from any table;
the d3 default keeps the original behaviour byte-for-byte.)
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUNNER = r"""
import glob, json, os, sys, time
sys.path.insert(0, {repo!r})
from cellphe_data_pipeline_spark.session import get_spark

sf_dir = {sf_dir!r}
evdir = {evdir!r}
os.makedirs(evdir, exist_ok=True)
spark = get_spark(
    app_name="d3-probe",
    extra_conf={{
        "spark.eventLog.enabled": "true",
        "spark.eventLog.compress": "false",
        "spark.eventLog.dir": "file://" + evdir,
    }},
)
from cellphe_data_pipeline_spark.queries import REGISTRY
fn = REGISTRY[{query!r}].fn

fn(spark, sf_dir).collect()  # warm: JVM, codegen, python workers
warm_last_job = max(
    spark.sparkContext.statusTracker().getJobIdsForGroup(None), default=-1
)

t0 = time.monotonic()
rows = len(fn(spark, sf_dir).collect())
wall = time.monotonic() - t0
app_id = spark.sparkContext.applicationId
spark.stop()

shuffle_write = 0
records = 0
job_of_stage = {{}}
timed_stages = set()
per_stage = {{}}
paths = [
    p
    for pat in (app_id + "*", "*" + app_id + "*/*")
    for p in glob.glob(os.path.join(evdir, pat))
    if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
]
for path in paths:
    with open(path) as f:
        for line in f:
            ev = json.loads(line)
            if ev.get("Event") == "SparkListenerJobStart":
                if ev["Job ID"] > warm_last_job:
                    for sid in ev["Stage IDs"]:
                        timed_stages.add(sid)
            elif ev.get("Event") == "SparkListenerTaskEnd":
                if ev["Stage ID"] in timed_stages:
                    m = ev.get("Task Metrics") or {{}}
                    sw = m.get("Shuffle Write Metrics") or {{}}
                    shuffle_write += sw.get("Shuffle Bytes Written", 0)
                    records += sw.get("Shuffle Records Written", 0)
                    b = sw.get("Shuffle Bytes Written", 0)
                    if b:
                        sid = ev["Stage ID"]
                        per_stage[sid] = per_stage.get(sid, 0) + b
top = sorted(per_stage.values(), reverse=True)
print(json.dumps({{
    "sf_dir": sf_dir, "rows": rows, "wall_s": round(wall, 3),
    "shuffle_write_bytes": shuffle_write,
    "shuffle_records": records,
    "shuffle_stages": len(per_stage),
    "top_stage_bytes": top[:4],
}}))
"""


def main() -> None:
    sfs = ["0.001", "0.01", "0.1"]
    query = "d3_minhash_near_dups"
    table = "documents"
    for a in sys.argv[1:]:
        if a.startswith("--sfs"):
            sfs = a.split("=", 1)[1].split(",")
        elif a.startswith("--query"):
            query = a.split("=", 1)[1]
        elif a.startswith("--table"):
            table = a.split("=", 1)[1]
    results = []
    for sf in sfs:
        # r14: an absolute path is used as the SF dir verbatim — the
        # third-decade probe points at a synthetic 50k-doc corpus
        # (scripts/synth_docs_decade.py) outside /root/testdata
        sf_dir = sf if sf.startswith("/") else f"/root/testdata/sf{sf}"
        evdir = f"/tmp/cellphe_stage/probe_ev_{query}_{sf}"
        code = _RUNNER.format(repo=REPO, sf_dir=sf_dir, evdir=evdir, query=query)
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=7200,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        if not line:
            print(out.stdout, out.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"probe failed at sf{sf}")
        r = json.loads(line[-1])
        r["sf"] = sf if sf.startswith("/") else float(sf)
        # the honest x-axis: documents rows (sf0.001 and sf0.01 ship
        # the SAME 500-row documents table; only sf0.1 is 10x)
        import duckdb

        # a Spark-written table is a DIRECTORY of part files (the
        # synthetic third-decade corpus); testdata ships single files
        tpath = f"{sf_dir}/{table}.parquet"
        if os.path.isdir(tpath):
            tpath = f"{tpath}/*.parquet"
        r["n_docs"] = duckdb.sql(
            f"SELECT COUNT(*) FROM read_parquet('{tpath}')"
        ).fetchone()[0]
        results.append(r)
        print(json.dumps(r))
    distinct = {r["n_docs"]: r for r in results}
    if len(distinct) >= 2:
        pts = sorted(distinct.values(), key=lambda r: r["n_docs"])
        lo, hi = pts[0], pts[-1]
        ratio = hi["n_docs"] / lo["n_docs"]
        alpha = math.log(hi["wall_s"] / lo["wall_s"]) / math.log(ratio)
        beta = math.log(
            hi["shuffle_write_bytes"] / max(1, lo["shuffle_write_bytes"])
        ) / math.log(ratio)
        print(
            json.dumps(
                {
                    "summary": f"{query} scaling",
                    "wall_exponent_alpha": round(alpha, 3),
                    "shuffle_bytes_exponent": round(beta, 3),
                    "note": "alpha<=1 is linear-or-better in data volume",
                }
            )
        )


if __name__ == "__main__":
    main()
