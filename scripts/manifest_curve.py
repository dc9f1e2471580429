"""Measured commit/read-cost-vs-file-count curve for the two snapshot
manifest tiers (r13, s27 — the r12 verdict's ask #4).

Pure-metadata probe, no Spark: synthetic file paths drive the commit
protocol exactly as real writers do (the commit functions never touch
data bytes — that is the point of a manifest). Per table size N
(files), each tier's table is grown by appends of BATCH files, then we
measure the MARGINAL cost of the next commit and of one full read
resolution:

  - flat tier (snapshot_commit_atomic): every commit rewrites the full
    N-entry file list -> commit bytes grow ~linearly with N (the
    listing wall the r12 verdict names);
  - sharded tier (snapshot_commit_sharded): an append writes ONE shard
    (BATCH entries) + one manifest list (~40 B/shard) -> commit bytes
    ~flat in N; a delete rewrites only intersecting shards.

Read resolution (snapshot_files) is one JSON parse for flat vs
1 + N/BATCH opens for sharded — the honest trade the docstring
records: sharding moves cost from the WRITE path (every commit) to the
READ path (many small opens), which is the right side at scale because
commits happen per-stream-batch while full-listing reads are rare
(planners prune shards by stats first). Output: one JSON line per
(tier, N) plus exponent summaries.

Usage: python scripts/manifest_curve.py [--sizes 100,1000,10000]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cellphe_data_pipeline_spark.sources.io import (  # noqa: E402
    snapshot_commit_atomic,
    snapshot_commit_sharded,
    snapshot_compact_manifests,
    snapshot_files,
)

BATCH = 100


def _paths(lo: int, hi: int) -> list[str]:
    return [f"/pool/data/f{i:09d}.parquet" for i in range(lo, hi)]


def _dir_bytes(mdir: str) -> int:
    if not os.path.isdir(mdir):  # first commit: no manifests yet
        return 0
    return sum(
        os.path.getsize(os.path.join(mdir, f)) for f in os.listdir(mdir)
    )


def probe(tier: str, n_files: int) -> dict:
    table = tempfile.mkdtemp(prefix=f"mcurve_{tier}_{n_files}_")
    try:
        # grow the table to n_files via BATCH-sized appends
        acc: list[str] = []
        parent = 0
        for lo in range(0, n_files - BATCH, BATCH):
            batch = _paths(lo, lo + BATCH)
            if tier == "flat":
                acc += batch
                parent = snapshot_commit_atomic(table, parent, list(acc))
            else:
                parent, _ = snapshot_commit_sharded(table, parent, batch)
        mdir = os.path.join(table, "manifests")
        before = _dir_bytes(mdir)
        # marginal commit: the LAST append, timed
        batch = _paths(n_files - BATCH, n_files)
        t0 = time.perf_counter()
        if tier == "flat":
            acc += batch
            parent = snapshot_commit_atomic(table, parent, list(acc))
        else:
            parent, _ = snapshot_commit_sharded(table, parent, batch)
        commit_s = time.perf_counter() - t0
        commit_bytes = _dir_bytes(mdir) - before
        # full read resolution, best of 3 (page cache warm = realistic
        # for a busy metadata pool)
        read_s = min(
            _timed(lambda: snapshot_files(table, parent)) for _ in range(3)
        )
        n_resolved = len(snapshot_files(table, parent))
        assert n_resolved == n_files, (n_resolved, n_files)
        out = {
            "tier": tier,
            "n_files": n_files,
            "commit_s": round(commit_s, 6),
            "commit_bytes": commit_bytes,
            "read_s": round(read_s, 6),
        }
        if tier == "sharded":
            # the read-side fix: manifest-list compaction merges the
            # per-commit shard dribble; resolution cost collapses back
            # toward the flat tier's single parse while commit cost
            # stays O(changed shards)
            parent, info = snapshot_compact_manifests(
                table, min_files=BATCH + 1, files_per_shard=25 * BATCH
            )
            assert len(snapshot_files(table, parent)) == n_files
            out["read_s_after_manifest_compaction"] = round(
                min(
                    _timed(lambda: snapshot_files(table, parent))
                    for _ in range(3)
                ),
                6,
            )
            out["shards_after_compaction"] = len(info["kept"]) + len(
                info["new"]
            )
        return out
    finally:
        shutil.rmtree(table, ignore_errors=True)


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    sizes = [100, 1000, 10000]
    for a in sys.argv[1:]:
        if a.startswith("--sizes"):
            sizes = [int(s) for s in a.split("=", 1)[1].split(",")]
    rows = []
    for tier in ("flat", "sharded"):
        for n in sizes:
            r = probe(tier, n)
            rows.append(r)
            print(json.dumps(r))
    for tier in ("flat", "sharded"):
        pts = [r for r in rows if r["tier"] == tier]
        lo, hi = pts[0], pts[-1]
        ratio = hi["n_files"] / lo["n_files"]
        beta_bytes = math.log(
            hi["commit_bytes"] / max(1, lo["commit_bytes"])
        ) / math.log(ratio)
        alpha_read = math.log(
            max(1e-9, hi["read_s"]) / max(1e-9, lo["read_s"])
        ) / math.log(ratio)
        print(
            json.dumps(
                {
                    "summary": f"{tier} manifest tier",
                    "commit_bytes_exponent": round(beta_bytes, 3),
                    "read_wall_exponent": round(alpha_read, 3),
                    "note": "commit exponent ~0 = O(changed) commits; "
                    "~1 = full-list rewrite per commit",
                }
            )
        )


if __name__ == "__main__":
    main()
