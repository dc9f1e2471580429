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
    built-in O(n^3) numpy Hungarian; or, with ``method="kalman"``, by
    greedy assignment against constant-velocity PREDICTED positions
    (TrackMate's Kalman tracker family, README.md:152-160). Greedy
    stays the default (it is the documented oracle semantics);
  - gap closing: an unmatched track end may re-link ≤ ``max_frame_gap``
    frames later within ``gap_closing_max_distance``
    (ALLOW_GAP_CLOSING / MAX_FRAME_GAP=4 / GAP_CLOSING_MAX_DISTANCE,
    templates/cyto3.json:27-29);
  - splitting/merging: 1→2 division and 2→1 fusion links between
    segment starts/ends and track middles one frame apart
    (ALLOW_TRACK_SPLITTING / SPLITTING_MAX_DISTANCE /
    ALLOW_TRACK_MERGING / MERGING_MAX_DISTANCE,
    templates/cyto3.json:31-38) — ``_split_merge_lap``;
  - LAP cost shaping (r6/r7, all opt-in): the no-link alternative
    (ALTERNATIVE_LINKING_COST_FACTOR × CUTOFF_PERCENTILE of the
    candidate cost distribution, templates/cyto3.json:26,30) via the
    Jaqaman-augmented matrix — applied in phase 1 AND (r7) each
    phase-2 block (gap closing, splitting, merging) — and TrackMate's
    published feature-penalty factor for all four penalty maps
    (LINKING/GAP_CLOSING/SPLITTING/MERGING_FEATURE_PENALTIES,
    cyto3.json:24,30,33-35). r8 adds ``gap_strategy="joint_lap"`` —
    TrackMate's ACTUAL phase-2 discipline: gap closing, splitting and
    merging traded off in ONE Jaqaman matrix with one shared
    alternative cost b over the combined candidate distribution
    (_joint_segment_lap), closing the former block-independence
    deviation (the sequential strategies remain the default for
    bit-stable goldens; there each block computes its own b).
    Remaining documented deviation: the penalty denominator hardens
    (f1+f2) to |f1|+|f2| (identical for TrackMate's nonnegative stock
    features — see _penalty_factor);
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


def _build_spot_feats(
    pdf, penalty_keys: set[str]
) -> tuple[dict[int, tuple[int, float, float]], dict[int, dict[str, float]]]:
    """One iterrows pass building the (frame, x, y) spot lookup and the
    per-spot penalty-feature dict (TrackMate's UPPERCASE keys matched
    case-insensitively against detection columns) — shared by all three
    phase-2 entry points (r8 review: three verbatim copies; one pass,
    because a second iterrows over a ~72k-row timelapse group doubles
    the slowest pandas primitive)."""
    cols_by_upper = {c.upper(): c for c in pdf.columns}
    use = {k: cols_by_upper[k] for k in penalty_keys if k in cols_by_upper}
    spot: dict[int, tuple[int, float, float]] = {}
    feats: dict[int, dict[str, float]] = {}
    for _, r in pdf.iterrows():
        i = int(r["id"])
        spot[i] = (int(r["frame"]), float(r["x"]), float(r["y"]))
        if use:
            feats[i] = {k: float(r[c]) for k, c in use.items() if pd.notna(r[c])}
    return spot, feats


def _close_gaps_segment_lap(
    pdf: pd.DataFrame,
    edges: list[tuple[int, int, int, float]],
    max_frame_gap: int,
    gap_closing_max_distance: float,
    gap_closing_feature_penalties: dict[str, float] | None = None,
    alternative_cost_factor: float | None = None,
    cutoff_percentile: float = 0.9,
) -> list[tuple[int, int, int, float]]:
    """TrackMate's second LAP phase, lite (track_images.py:74-123
    semantics: ALLOW_GAP_CLOSING / MAX_FRAME_GAP /
    GAP_CLOSING_MAX_DISTANCE): after frame-to-frame linking, ONE
    Hungarian assignment over (segment end × segment start) candidate
    pairs — minimising TOTAL reconnection distance globally, where the
    inline greedy closure commits to locally-shortest links first.

    Candidates: end e → start s with 2 ≤ frame(s) − frame(e) ≤
    max_frame_gap + 1 (a difference of 1 is consecutive — phase 1's
    job) and dist ≤ gap_closing_max_distance. Splitting/merging are the
    separate ``_split_merge_lap`` pass (runs after this one).

    r7 cost shaping: ``gap_closing_feature_penalties``
    (GAP_CLOSING_FEATURE_PENALTIES, templates/cyto3.json:30) switches
    candidate costs to penalised squared distances gated at limit²
    (:func:`_penalty_factor`); ``alternative_cost_factor`` extends the
    no-link alternative to this phase-2 block (:func:`_lap_picks`) —
    closing the r6 review gap where phase 2 force-assigned every
    within-window candidate. Defaults keep r6 behaviour bit-for-bit.
    """
    nxt = {s: d for s, d, _, _ in edges}
    prv = {d: s for s, d, _, _ in edges}
    spot, feats = _build_spot_feats(
        pdf, set(gap_closing_feature_penalties or {})
    )
    limit = gap_closing_max_distance
    seg_ends = [i for i in spot if i not in nxt]      # no outgoing link
    seg_starts = [i for i in spot if i not in prv]    # no incoming link
    cands: list[tuple[float, int, int, int, float]] = []  # (cost, e, s, gap, d)
    for e in seg_ends:
        fe, xe, ye = spot[e]
        for s in seg_starts:
            fs, xs, ys = spot[s]
            dframe = fs - fe
            if dframe < 2 or dframe > max_frame_gap + 1:
                continue
            d = float(np.hypot(xs - xe, ys - ye))
            if d > limit:
                continue
            if gap_closing_feature_penalties:
                cst = d * d * _penalty_factor(
                    gap_closing_feature_penalties,
                    feats.get(e, {}),
                    feats.get(s, {}),
                )
                if cst <= limit * limit:
                    cands.append((cst, e, s, dframe - 1, d))
            else:
                cands.append((d, e, s, dframe - 1, d))
    if not cands:
        return edges
    srcs = sorted({e for _, e, _, _, _ in cands})
    dsts = sorted({s for _, _, s, _, _ in cands})
    s_ix = {e: i for i, e in enumerate(srcs)}
    d_ix = {s: i for i, s in enumerate(dsts)}
    cost = np.full((len(srcs), len(dsts)), _LAP_BIG)
    meta: dict[tuple[int, int], tuple[float, int]] = {}
    for cst, e, s, gap, d in cands:
        if cst < cost[s_ix[e], d_ix[s]]:
            cost[s_ix[e], d_ix[s]] = cst
            meta[(s_ix[e], d_ix[s])] = (d, gap)
    out = list(edges)
    for r, c in _lap_picks(
        cost,
        alternative_cost_factor,
        cutoff_percentile,
        squared=bool(gap_closing_feature_penalties),
    ):
        d, gap = meta[(r, c)]
        out.append((srcs[r], dsts[c], gap, d))
    return out


def _penalty_factor(
    penalties: dict[str, float],
    fa: dict[str, float],
    fb: dict[str, float],
) -> float:
    """TrackMate feature-penalty cost factor (the PUBLIC formula —
    Jaqaman et al. 2008 supplementary / TrackMate docs "Linking costs
    calculation"): per penalised feature, term = 3*p*|f1-f2|/(f1+f2)
    (0 when the sum is 0 or the feature is absent); the squared-
    distance cost is multiplied by (1 + sum(terms))^2. A pair of
    identical feature values is unpenalised; dissimilar values push
    the candidate's cost up and can push it past the acceptance
    threshold entirely."""
    s = 0.0
    for feat, p in penalties.items():
        a = fa.get(feat)
        b = fb.get(feat)
        if a is None or b is None:
            continue
        # DOCUMENTED DEVIATION (r7, per review): the published
        # denominator is (f1 + f2); this uses |f1| + |f2|. Identical
        # for TrackMate's nonnegative stock features (AREA, intensity,
        # radius...), but a deliberate hardening for signed custom
        # features, where (f1 + f2) can be zero or negative and the
        # published ratio becomes unbounded/negative-cost.
        tot = abs(a) + abs(b)
        if tot:
            s += 3.0 * float(p) * abs(a - b) / tot
    return (1.0 + s) ** 2


def _lap_picks(
    cost: np.ndarray,
    alternative_cost_factor: float | None = None,
    cutoff_percentile: float = 0.9,
    squared: bool = False,
) -> list[tuple[int, int]]:
    """Solve one LAP block, optionally with TrackMate's NO-LINK
    alternative (r7 — shared by phase 1 linking, phase 2 gap closing
    and the split/merge blocks, closing the r6 review gap where only
    phase 1 honoured ALTERNATIVE_LINKING_COST_FACTOR).

    Without the factor: plain Hungarian; sentinel cells are dropped
    from the solution (non-assignment allowed). With it: costs switch
    to squared form (``squared=True`` marks matrices already in
    squared/penalised units), b = factor x the cutoff-percentile of
    the finite candidate costs, and the Jaqaman-augmented square
    matrix offers every row and column a diagonal alternative at cost
    b — so a within-window candidate costlier than b stays UNLINKED
    instead of being force-assigned (Jaqaman et al. 2008)."""
    if alternative_cost_factor is None:
        return [
            (r, c) for r, c in zip(*_hungarian(cost)) if cost[r, c] < _LAP_BIG
        ]
    sq = np.where(cost < _LAP_BIG, cost if squared else cost * cost, _LAP_BIG)
    finite = sq[sq < _LAP_BIG]
    if finite.size == 0:
        return []
    b = float(alternative_cost_factor) * float(
        np.percentile(finite, float(cutoff_percentile) * 100.0)
    )
    n, m2 = sq.shape
    full = np.full((n + m2, n + m2), _LAP_BIG)
    full[:n, :m2] = sq
    full[:n, m2:] = np.where(np.eye(n, dtype=bool), b, _LAP_BIG)
    full[n:, :m2] = np.where(np.eye(m2, dtype=bool), b, _LAP_BIG)
    full[n:, m2:] = np.where(sq.T < _LAP_BIG, b, _LAP_BIG)
    return [
        (r, c)
        for r, c in zip(*_hungarian(full))
        if r < n and c < m2 and full[r, c] < _LAP_BIG
    ]


def _split_merge_lap(
    pdf: pd.DataFrame,
    edges: list[tuple[int, int, int, float]],
    allow_splitting: bool,
    splitting_max_distance: float,
    allow_merging: bool,
    merging_max_distance: float,
    splitting_feature_penalties: dict[str, float] | None = None,
    merging_feature_penalties: dict[str, float] | None = None,
    alternative_cost_factor: float | None = None,
    cutoff_percentile: float = 0.9,
) -> list[tuple[int, int, int, float]]:
    """TrackMate phase-2 splitting/merging blocks, lite
    (track_images.py:74-123 wiring; templates/cyto3.json:31-38 enables
    both by default with SPLITTING_MAX_DISTANCE 5.0 /
    MERGING_MAX_DISTANCE 50.0):

    - SPLIT: a segment START s (no incoming link after linking + gap
      closing) may attach to a MIDDLE spot m of another track (a spot
      with both incoming and outgoing links) one frame EARLIER, within
      ``splitting_max_distance`` — emitting a second outgoing edge
      m → s, the 1→2 division link.
    - MERGE: a segment END e (no outgoing link) may attach to a middle
      spot m one frame LATER within ``merging_max_distance`` — emitting
      a second incoming edge e → m, the 2→1 fusion link.

    Each side is ONE Hungarian assignment (starts × middles and
    ends × middles), so a middle hosts at most one split and one merge —
    the assignment discipline of TrackMate's joint phase-2 matrix,
    solved as two independent blocks (documented deviation: the
    reference's single matrix also trades split/merge links against
    gap-closing alternatives). Runs AFTER gap closing so gap-closed
    starts/ends are no longer candidates. Emitted edges carry gap=0
    (adjacent frames by construction).

    Feature penalties (r6 — SPLITTING/MERGING_FEATURE_PENALTIES,
    templates/cyto3.json:33-35, e.g. {"AREA": 0.5} biasing merges
    toward similar-area pairs): when a penalty map is given, the cost
    switches to TrackMate's convention — squared distance times
    :func:`_penalty_factor`, accepted iff cost <= max_distance**2 —
    so dissimilar-feature pairs rank worse in the assignment and can
    be rejected outright, exactly the JVM tracker's behaviour.
    Feature keys are TrackMate's UPPERCASE names matched
    case-insensitively against the detection columns (AREA -> area).
    No penalties (the default) keeps the original plain-distance cost
    bit-for-bit (goldens unchanged).
    """
    has_out = {e[0] for e in edges}
    has_in = {e[1] for e in edges}
    spot, feats = _build_spot_feats(
        pdf,
        set(splitting_feature_penalties or {})
        | set(merging_feature_penalties or {}),
    )
    mid_by_frame: dict[int, list[int]] = {}
    for i in spot:
        if i in has_out and i in has_in:
            mid_by_frame.setdefault(spot[i][0], []).append(i)

    def one_side(
        loose: list[int],
        frame_delta: int,
        max_dist: float,
        penalties: dict[str, float] | None = None,
    ) -> list[tuple[int, int, float]]:
        """Assign loose spots (starts or ends) to middles at
        frame + frame_delta; returns (loose, middle, dist) picks.
        With ``penalties``, costs are TrackMate's penalised squared
        distances gated at max_dist**2 (see the function docstring);
        the returned third element stays the RAW distance either way
        (the emitted edge's dist column is a geometric quantity)."""
        cands: list[tuple[float, int, int, float]] = []  # (cost, a, m, d)
        for a in loose:
            fa, xa, ya = spot[a]
            for m in mid_by_frame.get(fa + frame_delta, []):
                _, xm, ym = spot[m]
                d = float(np.hypot(xm - xa, ym - ya))
                if penalties:
                    cost = d * d * _penalty_factor(
                        penalties, feats.get(a, {}), feats.get(m, {})
                    )
                    if cost <= max_dist * max_dist:
                        cands.append((cost, a, m, d))
                elif d <= max_dist:
                    cands.append((d, a, m, d))
        if not cands:
            return []
        lefts = sorted({a for _, a, _, _ in cands})
        mids = sorted({m for _, _, m, _ in cands})
        l_ix = {a: i for i, a in enumerate(lefts)}
        m_ix = {m: i for i, m in enumerate(mids)}
        cost = np.full((len(lefts), len(mids)), _LAP_BIG)
        dist_of: dict[tuple[int, int], float] = {}
        for cst, a, m, d in cands:
            if cst < cost[l_ix[a], m_ix[m]]:
                cost[l_ix[a], m_ix[m]] = cst
                dist_of[(l_ix[a], m_ix[m])] = d
        out = []
        # r7: the no-link alternative now reaches the split/merge
        # blocks too (each block gets its own b over its own candidate
        # distribution — documented deviation: TrackMate's joint
        # phase-2 matrix shares one; see the module docstring)
        for r, c in _lap_picks(
            cost, alternative_cost_factor, cutoff_percentile, squared=bool(penalties)
        ):
            out.append((lefts[r], mids[c], dist_of[(r, c)]))
        return out

    out = list(edges)
    if allow_splitting:
        starts = [i for i in spot if i not in has_in]
        for s, m, d in one_side(
            starts, -1, splitting_max_distance, splitting_feature_penalties
        ):
            out.append((m, s, 0, d))  # parent middle → child start
    if allow_merging:
        ends = [i for i in spot if i not in has_out]
        for e, m, d in one_side(
            ends, +1, merging_max_distance, merging_feature_penalties
        ):
            out.append((e, m, 0, d))  # dying end → surviving middle
    return out


def _joint_segment_lap(
    pdf: pd.DataFrame,
    edges: list[tuple[int, int, int, float]],
    max_frame_gap: int,
    gap_closing_max_distance: float,
    allow_splitting: bool,
    splitting_max_distance: float,
    allow_merging: bool,
    merging_max_distance: float,
    gap_closing_feature_penalties: dict[str, float] | None = None,
    splitting_feature_penalties: dict[str, float] | None = None,
    merging_feature_penalties: dict[str, float] | None = None,
    alternative_cost_factor: float | None = None,
    cutoff_percentile: float = 0.9,
) -> list[tuple[int, int, int, float]]:
    """TrackMate's phase 2 as ONE matrix (r8 — closes the module
    deviation "phase 2 solves its blocks independently"): the Jaqaman
    et al. 2008 segment-linking layout (their Fig. 1c; TrackMate's
    JaqamanSegmentCostMatrixCreator, track_images.py:74-123 drives it
    via the settings dict):

    - rows = segment ENDS (gap-closing / merging sources) then track
      MIDDLES (splitting sources);
    - cols = segment STARTS (gap-closing / splitting targets) then
      MIDDLES (merging targets);
    - blocks: ends x starts = gap closing, ends x middles = merging,
      middles x starts = splitting, middles x middles = forbidden.

    One Hungarian solve trades the three link kinds against each
    other: an end with both a far within-window reconnection and a
    cheap fusion takes the fusion and LEAVES THE START UNLINKED —
    the sequential two-pass form structurally cannot (gap closing
    runs first and consumes the end). With
    ``alternative_cost_factor`` the no-link alternative b = factor x
    percentile is computed over the COMBINED candidate distribution
    (one b for all of phase 2 — TrackMate's semantics), via the same
    :func:`_lap_picks` augmentation.

    Costs are ALWAYS TrackMate's phase-2 units here: squared distance
    x penalty factor, gated at limit² (the raw-distance convention of
    the separate blocks is a no-penalty r6 compatibility surface; a
    joint matrix needs all blocks in one coherent unit). Assignment
    discipline: each end closes one gap OR merges once; each middle
    hosts at most one split (row) and one merge (col); each start
    receives at most one reconnection or split. Emitted edges carry
    the RAW distance and gap count, same as the sequential passes.
    """
    nxt = {s for s, _, _, _ in edges}
    prv = {d for _, d, _, _ in edges}
    spot, feats = _build_spot_feats(
        pdf,
        set(gap_closing_feature_penalties or {})
        | set(splitting_feature_penalties or {})
        | set(merging_feature_penalties or {}),
    )
    ends = [i for i in spot if i not in nxt]
    starts = [i for i in spot if i not in prv]
    mids_by_frame: dict[int, list[int]] = {}
    for i in spot:
        if i in nxt and i in prv:
            mids_by_frame.setdefault(spot[i][0], []).append(i)

    def pf(pmap: dict[str, float] | None, a: int, b_: int) -> float:
        if not pmap:
            return 1.0
        return _penalty_factor(pmap, feats.get(a, {}), feats.get(b_, {}))

    # (cost, row_spot, col_spot, kind, gap, rawdist); kind: g/s/m
    cands: list[tuple[float, int, int, str, int, float]] = []
    if max_frame_gap > 0:
        lim2 = gap_closing_max_distance * gap_closing_max_distance
        for e in ends:
            fe, xe, ye = spot[e]
            for s in starts:
                fs, xs, ys = spot[s]
                if not (2 <= fs - fe <= max_frame_gap + 1):
                    continue
                d = float(np.hypot(xs - xe, ys - ye))
                cst = d * d * pf(gap_closing_feature_penalties, e, s)
                if cst <= lim2:
                    cands.append((cst, e, s, "g", fs - fe - 1, d))
    if allow_merging:
        lim2 = merging_max_distance * merging_max_distance
        for e in ends:
            fe, xe, ye = spot[e]
            for m in mids_by_frame.get(fe + 1, []):
                _, xm, ym = spot[m]
                d = float(np.hypot(xm - xe, ym - ye))
                cst = d * d * pf(merging_feature_penalties, e, m)
                if cst <= lim2:
                    cands.append((cst, e, m, "m", 0, d))
    if allow_splitting:
        lim2 = splitting_max_distance * splitting_max_distance
        for s in starts:
            fs, xs, ys = spot[s]
            for m in mids_by_frame.get(fs - 1, []):
                _, xm, ym = spot[m]
                d = float(np.hypot(xm - xs, ym - ys))
                cst = d * d * pf(splitting_feature_penalties, m, s)
                if cst <= lim2:
                    cands.append((cst, m, s, "s", 0, d))
    if not cands:
        return edges
    row_ends = sorted({r for _, r, _, k, _, _ in cands if k in ("g", "m")})
    row_mids = sorted({r for _, r, _, k, _, _ in cands if k == "s"})
    col_starts = sorted({c for _, _, c, k, _, _ in cands if k in ("g", "s")})
    col_mids = sorted({c for _, _, c, k, _, _ in cands if k == "m"})
    r_ix = {i: x for x, i in enumerate(row_ends)}
    r_ix.update({i: len(row_ends) + x for x, i in enumerate(row_mids)})
    c_ix = {i: x for x, i in enumerate(col_starts)}
    c_ix.update({i: len(col_starts) + x for x, i in enumerate(col_mids)})
    n_r = len(row_ends) + len(row_mids)
    n_c = len(col_starts) + len(col_mids)
    cost = np.full((n_r, n_c), _LAP_BIG)
    meta: dict[tuple[int, int], tuple[str, int, float]] = {}
    for cst, r, c, kind, gap, d in cands:
        ri, ci = r_ix[r], c_ix[c]
        if cst < cost[ri, ci]:
            cost[ri, ci] = cst
            meta[(ri, ci)] = (kind, gap, d)
    row_spots = row_ends + row_mids
    col_spots = col_starts + col_mids
    gaps_: list[tuple[int, int, int, float]] = []
    splits: list[tuple[int, int, int, float]] = []
    merges_: list[tuple[int, int, int, float]] = []
    for ri, ci in _lap_picks(
        cost, alternative_cost_factor, cutoff_percentile, squared=True
    ):
        kind, gap, d = meta[(ri, ci)]
        r, c = row_spots[ri], col_spots[ci]
        if kind == "g":
            gaps_.append((r, c, gap, d))        # end → start
        elif kind == "s":
            splits.append((r, c, 0, d))          # parent middle → child start
        else:
            merges_.append((r, c, 0, d))         # dying end → surviving middle
    # same emission order as the sequential passes: gaps, splits, merges
    return list(edges) + sorted(gaps_) + sorted(splits) + sorted(merges_)


def _link_one(
    pdf: pd.DataFrame,
    linking_max_distance: float,
    max_frame_gap: int,
    gap_closing_max_distance: float,
    method: str = "greedy",
    gap_strategy: str = "inline",
    allow_splitting: bool = False,
    splitting_max_distance: float = 5.0,
    allow_merging: bool = False,
    merging_max_distance: float = 50.0,
    alternative_cost_factor: float | None = None,
    cutoff_percentile: float = 0.9,
    splitting_feature_penalties: dict[str, float] | None = None,
    merging_feature_penalties: dict[str, float] | None = None,
    linking_feature_penalties: dict[str, float] | None = None,
    gap_closing_feature_penalties: dict[str, float] | None = None,
) -> pd.DataFrame:
    # segment-LAP closure: phase 1 links consecutive frames ONLY (gap
    # candidates excluded), phase 2 reconnects segments globally
    inline_gap = max_frame_gap if gap_strategy == "inline" else 0
    frames = sorted(pdf["frame"].unique())
    by_frame = {
        f: pdf[pdf["frame"] == f][["id", "x", "y"]].to_numpy() for f in frames
    }
    # LINKING/GAP_CLOSING_FEATURE_PENALTIES (r7 — the remaining two
    # penalty maps of the reference's settings dict,
    # track_images.py settings / templates/cyto3.json:24,30): when
    # either is present, phase-1 candidate costs switch to TrackMate's
    # penalised SQUARED distances gated at limit² (factor 1 where a
    # map is empty, keeping mixed candidates in coherent units);
    # without penalties costs stay raw distances, bit-identical to r6.
    pen_active = bool(linking_feature_penalties) or bool(
        gap_closing_feature_penalties
    )
    feats: dict[int, dict[str, float]] = {}
    if pen_active:
        by_upper = {c.upper(): c for c in pdf.columns}
        use = {
            k: by_upper[k]
            for k in {
                **(linking_feature_penalties or {}),
                **(gap_closing_feature_penalties or {}),
            }
            if k in by_upper
        }
        for _, r in pdf.iterrows():
            feats[int(r["id"])] = {
                k: float(r[c]) for k, c in use.items() if pd.notna(r[c])
            }
    # open track ends: spot id -> (frame, x, y)
    open_ends: dict[int, tuple[int, float, float]] = {}
    # per-end constant-velocity estimate (method="kalman"): set when a
    # link lands, consulted to PREDICT the end's position at frame f —
    # TrackMate's Kalman tracker semantics, lite (predict + gate +
    # assign; no covariance update — the constant-velocity point
    # prediction is the part that changes which links are possible).
    # New tracks have no history -> velocity 0 -> identical to greedy.
    vel: dict[int, tuple[float, float]] = {}
    edges: list[tuple[int, int, int, float]] = []
    for f in frames:
        dets = by_frame[f]
        det_pos = {int(det[0]): (float(det[1]), float(det[2])) for det in dets}
        # candidate links (dist, src, dst, gap): open ends within the
        # distance window; gap = frames skipped (0 = consecutive)
        cands = []
        for src, (ef, ex, ey) in open_ends.items():
            gap = f - ef - 1
            if gap > inline_gap:
                continue
            limit = linking_max_distance if gap == 0 else gap_closing_max_distance
            if method == "kalman":
                vx, vy = vel.get(src, (0.0, 0.0))
                ex_, ey_ = ex + vx * (f - ef), ey + vy * (f - ef)
            else:
                ex_, ey_ = ex, ey
            for det in dets:
                d = float(np.hypot(det[1] - ex_, det[2] - ey_))
                if d > limit:
                    continue
                if pen_active:
                    pmap = (
                        linking_feature_penalties
                        if gap == 0
                        else gap_closing_feature_penalties
                    )
                    factor = (
                        _penalty_factor(
                            pmap, feats.get(int(src), {}), feats.get(int(det[0]), {})
                        )
                        if pmap
                        else 1.0
                    )
                    cost = d * d * factor
                    if cost <= limit * limit:
                        cands.append((cost, int(src), int(det[0]), gap, d))
                else:
                    cands.append((d, int(src), int(det[0]), gap, d))
        if method == "lap" and cands:
            # Hungarian per frame: minimise TOTAL link distance instead
            # of taking locally-shortest links first. Forbidden pairs
            # (outside the window) carry the _LAP_BIG sentinel and are
            # dropped from the solution afterwards, so non-assignment
            # stays allowed exactly as in greedy mode.
            srcs = sorted({s for _, s, _, _, _ in cands})
            dsts = sorted({t for _, _, t, _, _ in cands})
            s_ix = {s: i for i, s in enumerate(srcs)}
            d_ix = {t: i for i, t in enumerate(dsts)}
            cost = np.full((len(srcs), len(dsts)), _LAP_BIG)
            meta: dict[tuple[int, int], tuple[float, int]] = {}
            for cst, s, t, gap, d in cands:
                if cst < cost[s_ix[s], d_ix[t]]:
                    cost[s_ix[s], d_ix[t]] = cst
                    meta[(s_ix[s], d_ix[t])] = (d, gap)
            # TrackMate's no-link alternative
            # (ALTERNATIVE_LINKING_COST_FACTOR + CUTOFF_PERCENTILE,
            # templates/cyto3.json:26,30; Jaqaman et al. 2008) — see
            # _lap_picks. A solution with L links totals
            # sum(C_linked) + (n+m-L)*b, so the net decision rule is
            # exactly "a candidate joins iff its marginal cost <= b".
            # With penalties active the matrix is ALREADY in squared
            # penalised units (squared=True skips the re-square).
            picks = _lap_picks(
                cost, alternative_cost_factor, cutoff_percentile, squared=pen_active
            )
            for r, c in picks:
                d, gap = meta[(r, c)]
                src, dst = srcs[r], dsts[c]
                edges.append((src, dst, gap, d))
                if src in open_ends:
                    _, ex0, ey0 = open_ends[src]
                    dx0, dy0 = det_pos[dst]
                    vel[dst] = ((dx0 - ex0) / (gap + 1), (dy0 - ey0) / (gap + 1))
                open_ends.pop(src, None)
        else:
            cands.sort()  # greedy by (cost, src, dst) — deterministic
            used_src: set[int] = set()
            used_dst: set[int] = set()
            for _cst, src, dst, gap, d in cands:
                if src in used_src or dst in used_dst:
                    continue
                used_src.add(src)
                used_dst.add(dst)
                edges.append((src, dst, gap, d))
                if src in open_ends:
                    _, ex0, ey0 = open_ends[src]
                    dx0, dy0 = det_pos[dst]
                    vel[dst] = ((dx0 - ex0) / (gap + 1), (dy0 - ey0) / (gap + 1))
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
    if gap_strategy == "joint_lap":
        # r8: TrackMate's actual phase-2 discipline — gap closing,
        # splitting and merging traded off in ONE Jaqaman matrix with
        # one shared no-link alternative (see _joint_segment_lap)
        tl = pdf["timelapse_id"].iloc[0] if len(pdf) else ""
        return pd.DataFrame(
            [
                (tl, s, d, g, dist)
                for s, d, g, dist in _joint_segment_lap(
                    pdf,
                    edges,
                    max_frame_gap,
                    gap_closing_max_distance,
                    allow_splitting,
                    splitting_max_distance,
                    allow_merging,
                    merging_max_distance,
                    gap_closing_feature_penalties,
                    splitting_feature_penalties,
                    merging_feature_penalties,
                    alternative_cost_factor,
                    cutoff_percentile,
                )
            ],
            columns=["timelapse_id", "src", "dst", "gap", "dist"],
        )
    if gap_strategy == "segment_lap" and max_frame_gap > 0:
        edges = _close_gaps_segment_lap(
            pdf,
            edges,
            max_frame_gap,
            gap_closing_max_distance,
            gap_closing_feature_penalties,
            alternative_cost_factor,
            cutoff_percentile,
        )
    if allow_splitting or allow_merging:
        edges = _split_merge_lap(
            pdf,
            edges,
            allow_splitting,
            splitting_max_distance,
            allow_merging,
            merging_max_distance,
            splitting_feature_penalties,
            merging_feature_penalties,
            alternative_cost_factor,
            cutoff_percentile,
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
    allow_splitting: bool = False,
    splitting_max_distance: float = 5.0,
    allow_merging: bool = False,
    merging_max_distance: float = 50.0,
    alternative_cost_factor: float | None = None,
    cutoff_percentile: float = 0.9,
    splitting_feature_penalties: dict[str, float] | None = None,
    merging_feature_penalties: dict[str, float] | None = None,
    linking_feature_penalties: dict[str, float] | None = None,
    gap_closing_feature_penalties: dict[str, float] | None = None,
) -> DataFrame:
    """M3: link per-frame detections into track edges.

    `detections`: (timelapse_id, id, frame, x, y) — id unique per
    timelapse. Returns EDGES_SCHEMA rows (src, dst spot ids + the gap
    length and link distance for QC). ``method``: "greedy" (default,
    the documented oracle semantics), "lap" (per-frame-pair Hungarian
    minimum-total-distance assignment), or "kalman" (constant-velocity
    point prediction before the greedy gate+assign — TrackMate's
    KalmanTracker option, lite: the track's velocity estimate carries
    its predicted position forward, so fast movers keep their identity
    through crossings that fool raw nearest-distance linking).
    ``gap_strategy``: "inline"
    (default — gap candidates compete inside each frame's assignment),
    "segment_lap" (TrackMate phase-2 shape: consecutive-frame
    linking first, then ONE global Hungarian over segment end/start
    reconnection candidates; splitting/merging solved as separate
    blocks afterwards), or "joint_lap" (r8 — TrackMate's ACTUAL
    phase-2 matrix: gap closing, splitting and merging traded off in
    one Jaqaman assignment with one shared no-link alternative; costs
    in squared penalised units throughout — see _joint_segment_lap).

    ``allow_splitting`` / ``allow_merging`` enable the phase-2
    division/fusion blocks (ALLOW_TRACK_SPLITTING /
    SPLITTING_MAX_DISTANCE / ALLOW_TRACK_MERGING / MERGING_MAX_DISTANCE,
    templates/cyto3.json:31-38 — the reference template turns BOTH on):
    a 1→2 split edge from a track middle to a nearby next-frame segment
    start, a 2→1 merge edge from a segment end to a nearby next-frame
    track middle (``_split_merge_lap``). Defaults mirror the reference
    template's distances; downstream G4 renumbering already assigns
    split children new track ids (domain/lineage.py).

    r6 LAP cost knobs (all OFF by default — defaults reproduce the
    pre-r6 behaviour bit-for-bit):
    ``alternative_cost_factor`` + ``cutoff_percentile``
    (ALTERNATIVE_LINKING_COST_FACTOR / CUTOFF_PERCENTILE,
    templates/cyto3.json:26,30) give every LAP row/column a no-link
    alternative at factor x the cutoff-percentile of the candidate
    cost distribution — expensive within-window links stay unlinked
    instead of being force-assigned (method="lap" only);
    ``splitting_feature_penalties`` / ``merging_feature_penalties``
    (e.g. {"AREA": 0.5}, templates/cyto3.json:33-35) bias the phase-2
    division/fusion assignment toward feature-similar pairs with
    TrackMate's published penalty formula (see
    :func:`_penalty_factor`).

    r7 completes the reference's settings-dict penalty surface
    (track_images.py settings; every template carries the keys —
    templates/cyto3.json:24,30): ``linking_feature_penalties``
    (LINKING_FEATURE_PENALTIES) shapes phase-1 frame-to-frame costs
    and ``gap_closing_feature_penalties``
    (GAP_CLOSING_FEATURE_PENALTIES) shapes gap-closing costs — both
    switch candidates to penalised squared distances gated at their
    limit², in every method (greedy ordering, LAP matrix, Kalman
    gate). The no-link alternative now also reaches the phase-2
    blocks (gap closing + split/merge, per-block b). All defaults
    keep the pre-r7 output bit-for-bit."""

    if method not in ("greedy", "lap", "kalman"):
        raise ValueError(
            f"method must be 'greedy', 'lap', or 'kalman', got {method!r}"
        )
    if gap_strategy not in ("inline", "segment_lap", "joint_lap"):
        raise ValueError(
            "gap_strategy must be 'inline', 'segment_lap' or 'joint_lap',"
            f" got {gap_strategy!r}"
        )
    if not (0.0 < float(cutoff_percentile) <= 1.0):
        # TrackMate configs express this as a FRACTION (cyto3.json:30 =
        # 0.9); a percent-convention value like 90 would otherwise
        # crash np.percentile deep inside an executor task
        raise ValueError(
            "cutoff_percentile must be a fraction in (0, 1], got "
            f"{cutoff_percentile!r} — TrackMate's CUTOFF_PERCENTILE "
            "convention (e.g. 0.9), not a percent"
        )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        return _link_one(
            pdf.sort_values(["frame", "id"]),
            linking_max_distance,
            max_frame_gap,
            gap_closing_max_distance,
            method,
            gap_strategy,
            allow_splitting,
            splitting_max_distance,
            allow_merging,
            merging_max_distance,
            alternative_cost_factor,
            cutoff_percentile,
            splitting_feature_penalties,
            merging_feature_penalties,
            linking_feature_penalties,
            gap_closing_feature_penalties,
        )

    # CPU-bound per-timelapse kernel over narrow rows — keep the groups
    # spread across cores despite AQE's byte-based coalescing
    # (operators/scale.py `repartition_for_cpu_kernel`)
    from cellphe_data_pipeline_spark.operators.scale import (
        repartition_for_cpu_kernel,
    )

    # narrow projection by default; penalised features widen it with
    # exactly the columns the penalty maps name (case-insensitive
    # TrackMate keys -> detection columns, e.g. AREA -> area)
    cols = ["timelapse_id", "id", "frame", "x", "y"]
    pen_keys = (
        set(splitting_feature_penalties or {})
        | set(merging_feature_penalties or {})
        | set(linking_feature_penalties or {})
        | set(gap_closing_feature_penalties or {})
    )
    if pen_keys:
        by_upper = {c.upper(): c for c in detections.columns}
        missing = sorted(k for k in pen_keys if k not in by_upper)
        if missing:
            raise ValueError(
                f"feature penalties name columns absent from detections: {missing}"
            )
        cols += [by_upper[k] for k in sorted(pen_keys) if by_upper[k] not in cols]
    return (
        repartition_for_cpu_kernel(
            detections.select(*cols),
            "timelapse_id",
        )
        .groupBy("timelapse_id")
        .applyInPandas(kernel, EDGES_SCHEMA)
    )


def overlap_links(
    pixels: DataFrame,
    iou_threshold: float = 0.3,
    mutual: bool = True,
) -> DataFrame:
    """The reference's OVERLAP tracker option (track_images.py:74-123
    tracker menu, README.md:152-160) — linking by mask IoU between
    consecutive frames — expressed FULLY RELATIONALLY over the
    mask-pixel table (images.mask_pixels), no sequential kernel:

      intersection = equi-join of frame f pixels with frame f+1 pixels
                     on (path, px, py) + ONE combinable pair count;
      areas        = per-label pixel counts;
      IoU          = inter / (area_a + area_b - inter);
      links        = per-source argmax (min(struct(-iou, dst)) — ties
                     to the lower dst id), thresholded; with
                     ``mutual=True`` ALSO per-target argmax and keep
                     only agreeing pairs (the 1-1 matching the
                     reference's tracker produces).

    Scale: pixel self-join keyed on (path, px, py) — co-partitioned,
    no cartesian; everything downstream is combinable aggregation.
    Where centroid trackers need the sequential per-timelapse kernel
    (tracking is inherently ordered), overlap linking is pure joins —
    the shape that parallelises across a 1000-executor cluster with no
    per-key state at all. Output: (path, frame_index, src_mask,
    dst_mask, iou).

    The pixel table is pinned once (hub-table rule: it feeds both join
    sides AND the area counts — 3 consumers), and the scored pair table
    once more (feeds the links + both argmax sides); without the cuts
    the upstream decode/segment kernels re-execute per consumer."""
    px = pixels.select(
        "path",
        "frame_index",
        F.col("mask_id"),
        "px",
        "py",
    ).localCheckpoint(eager=True)
    a = px.select(
        "path",
        F.col("frame_index").alias("f"),
        F.col("mask_id").alias("src_mask"),
        "px",
        "py",
    )
    b = px.select(
        "path",
        (F.col("frame_index") - 1).alias("f"),
        F.col("mask_id").alias("dst_mask"),
        "px",
        "py",
    )
    inter = (
        a.join(b, ["path", "f", "px", "py"])
        .groupBy("path", "f", "src_mask", "dst_mask")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    areas = px.groupBy("path", "frame_index", "mask_id").agg(
        F.count(F.lit(1)).alias("area")
    )
    scored = (
        inter.join(
            areas.select(
                "path",
                F.col("frame_index").alias("f"),
                F.col("mask_id").alias("src_mask"),
                F.col("area").alias("area_a"),
            ),
            ["path", "f", "src_mask"],
        )
        .join(
            areas.select(
                "path",
                (F.col("frame_index") - 1).alias("f"),
                F.col("mask_id").alias("dst_mask"),
                F.col("area").alias("area_b"),
            ),
            ["path", "f", "dst_mask"],
        )
        .withColumn(
            "iou",
            F.col("inter")
            / (F.col("area_a") + F.col("area_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("iou") >= iou_threshold)
    ).localCheckpoint(eager=True)
    best_src = (
        scored.groupBy("path", "f", "src_mask")
        .agg(F.min(F.struct(-F.col("iou"), F.col("dst_mask"))).alias("m"))
        .select("path", "f", "src_mask", F.col("m.dst_mask").alias("dst_mask"))
    )
    links = scored.join(best_src, ["path", "f", "src_mask", "dst_mask"], "left_semi")
    if mutual:
        best_dst = (
            scored.groupBy("path", "f", "dst_mask")
            .agg(F.min(F.struct(-F.col("iou"), F.col("src_mask"))).alias("m"))
            .select("path", "f", "dst_mask", F.col("m.src_mask").alias("src_mask"))
        )
        links = links.join(
            best_dst, ["path", "f", "dst_mask", "src_mask"], "left_semi"
        )
    return links.select(
        "path",
        F.col("f").alias("frame_index"),
        "src_mask",
        "dst_mask",
        F.round("iou", 6).alias("iou"),
    )
