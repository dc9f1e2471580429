"""M3 — cell tracking by frame-pair linking (SURVEY §2.10, Phase 4).

Reference: track_images.py:24-201 drives TrackMate's JVM LAP tracker
over ALL masks of a timelapse as one global 32-CPU task
(nextflow.config:46-51). Global LAP optimisation is inherently
sequential across frames; the engine's documented deviation (SURVEY §7
hard part #5) is *same-shape, simplified* linking:

  - per consecutive frame pair, assign detections greedily by ascending
    centroid distance under ``linking_max_distance`` — the
    NearestNeighbor tracker option of README.md:152-160; or, with
    ``method="lap"``, by a per-frame-pair Hungarian assignment
    (minimum total distance — TrackMate's frame-to-frame LAP step,
    track_images.py:74-123) solved by scipy when installed, else the
    built-in O(n^3) numpy Hungarian. Greedy stays the default (it is
    the documented oracle semantics);
  - gap closing: an unmatched track end may re-link ≤ ``max_frame_gap``
    frames later within ``gap_closing_max_distance``
    (ALLOW_GAP_CLOSING / MAX_FRAME_GAP=4 / GAP_CLOSING_MAX_DISTANCE,
    templates/cyto3.json:27-29);
  - deterministic: candidate pairs sorted by (distance, src id, dst id).

Parallelism: ``applyInPandas`` grouped by timelapse — tracking is
global per timelapse (the reference runs it as one task too), but
timelapses parallelise across the cluster; one group = one timelapse's
detections (~72k rows for the documented 721-frame run — bounded, fits
a pandas kernel comfortably). The cross-timelapse fan-out is where the
100 TB parallelism lives, exactly like the reference's per-run Slurm
jobs.

Output edges feed G1-G4 (``domain.lineage.renumber_tracks``) unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EDGES_SCHEMA = T.StructType(
    [
        T.StructField("timelapse_id", T.StringType()),
        T.StructField("src", T.LongType()),
        T.StructField("dst", T.LongType()),
        T.StructField("gap", T.IntegerType()),
        T.StructField("dist", T.DoubleType()),
    ]
)


#: cost sentinel for forbidden (out-of-range) assignment pairs
_LAP_BIG = 1e12


def _hungarian(cost: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Minimum-cost assignment. Prefers scipy's Jonker-Volgenant solver
    when installed; otherwise the classic O(n^3) potentials + shortest-
    augmenting-path Hungarian (square-padded with a constant, which
    preserves the optimum over the real cells)."""
    try:
        from scipy.optimize import linear_sum_assignment  # type: ignore

        return linear_sum_assignment(cost)
    except ImportError:
        pass
    n_rows, n_cols = cost.shape
    n = max(n_rows, n_cols)
    a = np.zeros((n, n))
    a[:n_rows, :n_cols] = cost
    INF = float("inf")
    u = [0.0] * (n + 1)
    v = [0.0] * (n + 1)
    p = [0] * (n + 1)  # p[j] = row matched to column j (1-indexed)
    way = [0] * (n + 1)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = [INF] * (n + 1)
        used = [False] * (n + 1)
        while True:
            used[j0] = True
            i0, delta, j1 = p[j0], INF, 0
            for j in range(1, n + 1):
                if not used[j]:
                    cur = a[i0 - 1][j - 1] - u[i0] - v[j]
                    if cur < minv[j]:
                        minv[j] = cur
                        way[j] = j0
                    if minv[j] < delta:
                        delta = minv[j]
                        j1 = j
            for j in range(n + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    rows, cols = [], []
    for j in range(1, n + 1):
        if p[j] <= n_rows and j <= n_cols:
            rows.append(p[j] - 1)
            cols.append(j - 1)
    order = np.argsort(rows)
    return np.array(rows)[order], np.array(cols)[order]


def _close_gaps_segment_lap(
    pdf: pd.DataFrame,
    edges: list[tuple[int, int, int, float]],
    max_frame_gap: int,
    gap_closing_max_distance: float,
) -> list[tuple[int, int, int, float]]:
    """TrackMate's second LAP phase, lite (track_images.py:74-123
    semantics: ALLOW_GAP_CLOSING / MAX_FRAME_GAP /
    GAP_CLOSING_MAX_DISTANCE): after frame-to-frame linking, ONE
    Hungarian assignment over (segment end × segment start) candidate
    pairs — minimising TOTAL reconnection distance globally, where the
    inline greedy closure commits to locally-shortest links first.

    Candidates: end e → start s with 2 ≤ frame(s) − frame(e) ≤
    max_frame_gap + 1 (a difference of 1 is consecutive — phase 1's
    job) and dist ≤ gap_closing_max_distance. Splitting/merging
    (TrackMate's other phase-2 blocks) stay out of scope per SURVEY §7.
    """
    nxt = {s: d for s, d, _, _ in edges}
    prv = {d: s for s, d, _, _ in edges}
    spot = {
        int(r["id"]): (int(r["frame"]), float(r["x"]), float(r["y"]))
        for _, r in pdf.iterrows()
    }
    seg_ends = [i for i in spot if i not in nxt]      # no outgoing link
    seg_starts = [i for i in spot if i not in prv]    # no incoming link
    cands: list[tuple[float, int, int, int]] = []
    for e in seg_ends:
        fe, xe, ye = spot[e]
        for s in seg_starts:
            fs, xs, ys = spot[s]
            dframe = fs - fe
            if dframe < 2 or dframe > max_frame_gap + 1:
                continue
            d = float(np.hypot(xs - xe, ys - ye))
            if d <= gap_closing_max_distance:
                cands.append((d, e, s, dframe - 1))
    if not cands:
        return edges
    srcs = sorted({e for _, e, _, _ in cands})
    dsts = sorted({s for _, _, s, _ in cands})
    s_ix = {e: i for i, e in enumerate(srcs)}
    d_ix = {s: i for i, s in enumerate(dsts)}
    cost = np.full((len(srcs), len(dsts)), _LAP_BIG)
    meta: dict[tuple[int, int], tuple[float, int]] = {}
    for d, e, s, gap in cands:
        if d < cost[s_ix[e], d_ix[s]]:
            cost[s_ix[e], d_ix[s]] = d
            meta[(s_ix[e], d_ix[s])] = (d, gap)
    out = list(edges)
    for r, c in zip(*_hungarian(cost)):
        if cost[r, c] >= _LAP_BIG:
            continue
        d, gap = meta[(r, c)]
        out.append((srcs[r], dsts[c], gap, d))
    return out


def _link_one(
    pdf: pd.DataFrame,
    linking_max_distance: float,
    max_frame_gap: int,
    gap_closing_max_distance: float,
    method: str = "greedy",
    gap_strategy: str = "inline",
) -> pd.DataFrame:
    # segment-LAP closure: phase 1 links consecutive frames ONLY (gap
    # candidates excluded), phase 2 reconnects segments globally
    inline_gap = max_frame_gap if gap_strategy == "inline" else 0
    frames = sorted(pdf["frame"].unique())
    by_frame = {
        f: pdf[pdf["frame"] == f][["id", "x", "y"]].to_numpy() for f in frames
    }
    # open track ends: spot id -> (frame, x, y)
    open_ends: dict[int, tuple[int, float, float]] = {}
    edges: list[tuple[int, int, int, float]] = []
    for f in frames:
        dets = by_frame[f]
        # candidate links (dist, src, dst, gap): open ends within the
        # distance window; gap = frames skipped (0 = consecutive)
        cands = []
        for src, (ef, ex, ey) in open_ends.items():
            gap = f - ef - 1
            if gap > inline_gap:
                continue
            limit = linking_max_distance if gap == 0 else gap_closing_max_distance
            for det in dets:
                d = float(np.hypot(det[1] - ex, det[2] - ey))
                if d <= limit:
                    cands.append((d, int(src), int(det[0]), gap))
        if method == "lap" and cands:
            # Hungarian per frame: minimise TOTAL link distance instead
            # of taking locally-shortest links first. Forbidden pairs
            # (outside the window) carry the _LAP_BIG sentinel and are
            # dropped from the solution afterwards, so non-assignment
            # stays allowed exactly as in greedy mode.
            srcs = sorted({s for _, s, _, _ in cands})
            dsts = sorted({t for _, _, t, _ in cands})
            s_ix = {s: i for i, s in enumerate(srcs)}
            d_ix = {t: i for i, t in enumerate(dsts)}
            cost = np.full((len(srcs), len(dsts)), _LAP_BIG)
            meta: dict[tuple[int, int], tuple[float, int]] = {}
            for d, s, t, gap in cands:
                if d < cost[s_ix[s], d_ix[t]]:
                    cost[s_ix[s], d_ix[t]] = d
                    meta[(s_ix[s], d_ix[t])] = (d, gap)
            for r, c in zip(*_hungarian(cost)):
                if cost[r, c] >= _LAP_BIG:
                    continue
                d, gap = meta[(r, c)]
                src, dst = srcs[r], dsts[c]
                edges.append((src, dst, gap, d))
                open_ends.pop(src, None)
        else:
            cands.sort()  # greedy by (distance, src, dst) — deterministic
            used_src: set[int] = set()
            used_dst: set[int] = set()
            for d, src, dst, gap in cands:
                if src in used_src or dst in used_dst:
                    continue
                used_src.add(src)
                used_dst.add(dst)
                edges.append((src, dst, gap, d))
                open_ends.pop(src, None)  # the end moved forward to dst
        # every detection of this frame is now an open end (matched ones
        # continue their track under the new spot id; unmatched ones
        # start prospective tracks); ends past the gap window expire
        for det in dets:
            open_ends[int(det[0])] = (f, float(det[1]), float(det[2]))
        open_ends = {
            i: (ef, ex, ey)
            for i, (ef, ex, ey) in open_ends.items()
            if f - ef - 1 <= inline_gap
        }
    if gap_strategy == "segment_lap" and max_frame_gap > 0:
        edges = _close_gaps_segment_lap(
            pdf, edges, max_frame_gap, gap_closing_max_distance
        )
    tl = pdf["timelapse_id"].iloc[0] if len(pdf) else ""
    return pd.DataFrame(
        [(tl, s, d, g, dist) for s, d, g, dist in edges],
        columns=["timelapse_id", "src", "dst", "gap", "dist"],
    )


def track_detections(
    detections: DataFrame,
    linking_max_distance: float = 70.0,
    max_frame_gap: int = 4,
    gap_closing_max_distance: float = 90.0,
    method: str = "greedy",
    gap_strategy: str = "inline",
) -> DataFrame:
    """M3: link per-frame detections into track edges.

    `detections`: (timelapse_id, id, frame, x, y) — id unique per
    timelapse. Returns EDGES_SCHEMA rows (src, dst spot ids + the gap
    length and link distance for QC). ``method``: "greedy" (default,
    the documented oracle semantics) or "lap" (per-frame-pair Hungarian
    minimum-total-distance assignment). ``gap_strategy``: "inline"
    (default — gap candidates compete inside each frame's assignment)
    or "segment_lap" (TrackMate phase-2 shape: consecutive-frame
    linking first, then ONE global Hungarian over segment end/start
    reconnection candidates)."""

    if method not in ("greedy", "lap"):
        raise ValueError(f"method must be 'greedy' or 'lap', got {method!r}")
    if gap_strategy not in ("inline", "segment_lap"):
        raise ValueError(
            f"gap_strategy must be 'inline' or 'segment_lap', got {gap_strategy!r}"
        )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        return _link_one(
            pdf.sort_values(["frame", "id"]),
            linking_max_distance,
            max_frame_gap,
            gap_closing_max_distance,
            method,
            gap_strategy,
        )

    # CPU-bound per-timelapse kernel over narrow rows — keep the groups
    # spread across cores despite AQE's byte-based coalescing
    # (operators/scale.py `repartition_for_cpu_kernel`)
    from cellphe_data_pipeline_spark.operators.scale import (
        repartition_for_cpu_kernel,
    )

    return (
        repartition_for_cpu_kernel(
            detections.select("timelapse_id", "id", "frame", "x", "y"),
            "timelapse_id",
        )
        .groupBy("timelapse_id")
        .applyInPandas(kernel, EDGES_SCHEMA)
    )
