"""Join operators (J1-J7 — SURVEY §2.3).

Most reference joins are plain equi-joins that Catalyst plans directly
(J1 broadcast: create_frame_summary_features.py:23-25; J2 composite:
:55; J3 id lookup: parse_xml.py:166-167) — those live inline in the
query catalog. This module implements the two that need real engine
work:

- ``zip_join`` (J6, main.nf:435-437): positional merge of ordered
  relations via row_number. The reference relies on channel emission
  order; the engine makes the order an explicit sort key.
- ``density_self_join`` (J7, create_frame_summary_features.py:57-62):
  the reference DISABLED this per-frame pairwise-distance density
  feature — "doesn't work with large datasets, runs out of memory" —
  and hard-codes dens=0. This grid-bucketed range join is the flagship
  Spark win: never materialises the quadratic pair set.

Scale design of ``density_self_join``:
- Grid cell size == radius r. A point's neighbors within r can only lie
  in its own or the 8 adjacent cells, so each probe joins exactly 9
  candidate cells instead of the whole frame.
- Build side is exploded 9x into neighbor cells (factor-9 data, NOT
  factor-N^2), probe side stays 1x; the equi-join key is
  (frame, cell_x, cell_y) — a plain hash-partitioned shuffle that AQE
  can skew-split. No broadcast, no cartesian: `.explain` shows a single
  SortMergeJoin/ShuffledHashJoin on the composite key.
- The exact distance predicate filters candidates after the equi-join;
  per-point counts come from one map-side-combinable groupBy.
- At 100 TB: shuffle volume is ~10x the point set (9x build + 1x
  probe), independent of frame population; the quadratic blow-up the
  reference hit cannot occur. Hot frames are split by AQE skew-join.
- The grid equi-join is pinned to a SHUFFLED HASH join (probe-side
  hint) rather than sort-merge (r7): grid keys are massively
  duplicated (hundreds of points per cell), and SMJ's per-key buffer
  handling made the join 9-12x slower than SHJ at sf0.1 (measured:
  j7 13.0s -> 1.1s, identical output). The hinted (hash-map) side is
  the UN-exploded point set, so per-task maps hold ~points/partitions
  rows — bounded by shuffle-partition sizing exactly like any other
  aggregation state, and SHJ spills if oversized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def zip_join(
    left: DataFrame,
    right: DataFrame,
    left_order: list[str],
    right_order: list[str],
    rn_col: str = "rn",
) -> DataFrame:
    """J6: positional zip — pair the i-th row of each side in its sort
    order (inner on position => truncates to the shorter side).

    Each side is numbered with the scale-safe two-pass partition-offset
    form (operators/scale.global_row_number) — range-partitioned sort +
    driver-side prefix-sum of per-partition counts — so neither side
    ever funnels through a single-partition window, and billion-row
    zips stay parallel end to end.
    """
    from cellphe_data_pipeline_spark.operators.scale import global_row_number

    lhs = global_row_number(left, list(left_order), rn_col)
    rhs = global_row_number(right, list(right_order), rn_col)
    return lhs.join(rhs, rn_col)


def density_self_join(
    df: DataFrame,
    frame_col: str,
    x_col: str,
    y_col: str,
    id_col: str,
    radius: float,
) -> DataFrame:
    """J7: per-point neighbor count within `radius` in the same frame.

    Output: all original rows + ``density`` = number of OTHER points in
    the same frame with euclidean distance <= radius (the reference's
    disabled dens feature, un-stubbed).

    SYMMETRIC half-stencil (r7): instead of the classic 9-cell build
    explode that discovers every ORDERED pair (each unordered pair
    found twice — once per endpoint), the build side is exploded into
    only 5 cells — its own plus the 4 "forward" neighbors, the
    adjacent cells strictly greater in (cy, cx) lex order — so every
    cross-cell unordered pair is discovered exactly ONCE (by the probe
    point in the greater cell); same-cell pairs are halved by the
    ``_id < _bid`` predicate. Each surviving pair then credits BOTH
    endpoints (one explode of the two ids) before the count. Join
    candidate volume and distance evaluations drop ~2x versus the
    9-cell form — measured 18.4s -> ~10s at sf0.1 (SCALE.md) with
    bit-identical output (the d5/j7 oracle covers it).
    """
    r = float(radius)
    cx = F.floor(F.col(x_col) / F.lit(r)).cast("long")
    cy = F.floor(F.col(y_col) / F.lit(r)).cast("long")

    probe = df.select(
        F.col(frame_col).alias("_f"),
        F.col(id_col).alias("_id"),
        F.col(x_col).alias("_x"),
        F.col(y_col).alias("_y"),
        cx.alias("_cx"),
        cy.alias("_cy"),
    )
    # build side: each point copied into its own cell + the 4 forward
    # neighbors (dy>0, or dy=0 and dx>0) — the half stencil
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in ((0, 0), (1, 0), (-1, 1), (0, 1), (1, 1))
        ]
    )
    build = (
        df.select(
            F.col(frame_col).alias("_f"),
            F.col(id_col).alias("_bid"),
            F.col(x_col).alias("_bx"),
            F.col(y_col).alias("_by"),
            cx.alias("_bcx"),
            cy.alias("_bcy"),
        )
        .withColumn("_o", F.explode(offsets))
        .select(
            "_f",
            "_bid",
            "_bx",
            "_by",
            (F.col("_bcx") + F.col("_o.dx")).alias("_cx"),
            (F.col("_bcy") + F.col("_o.dy")).alias("_cy"),
            ((F.col("_o.dx") == 0) & (F.col("_o.dy") == 0)).alias("_same"),
        )
    )
    dx = F.col("_x") - F.col("_bx")
    dy = F.col("_y") - F.col("_by")
    # cheap id predicate FIRST: halves same-cell candidates before the
    # distance arithmetic runs (cross-cell pairs are unique already)
    pairs = (
        probe.hint("SHUFFLE_HASH").join(build, ["_f", "_cx", "_cy"])
        .filter(
            (~F.col("_same") | (F.col("_id") < F.col("_bid")))
            & (dx * dx + dy * dy <= F.lit(r * r))
        )
        .select(
            "_f",
            F.explode(F.array(F.col("_id"), F.col("_bid"))).alias("_id"),
        )
    )
    counts = pairs.groupBy("_f", "_id").agg(F.count(F.lit(1)).alias("density"))
    return (
        df.join(
            counts.withColumnsRenamed({"_f": frame_col, "_id": id_col}),
            [frame_col, id_col],
            "left",
        )
        .withColumn("density", F.coalesce(F.col("density"), F.lit(0)))
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str],
    tie_col: str | None = None,
) -> DataFrame:
    """As-of join — for every LEFT row, the most recent STRICTLY PRIOR
    RIGHT row with the same key. Spark has no native ASOF JOIN; the
    sort-merge formulation here is the scale-correct composition:

    union the two tagged streams, ONE window shuffle partitioned by key
    ordered by (ts, tie, side), and carry the right side's columns
    forward with ``last(..., ignorenulls=True)`` over the strictly-
    preceding frame. Shuffle volume = |L| + |R| on the key — the same
    cost as one equi-join, versus the naive theta-join
    (L ⋈ R on key AND r.ts < l.ts, then argmax) which materialises
    every historical pair. Left rows order AFTER right rows at equal
    timestamps (side ordinal breaks the tie), so "strictly prior"
    includes same-timestamp right rows — DuckDB ASOF (<=) semantics;
    ``tie_col`` makes the ordering total when timestamps can collide.
    """
    order = [F.col(ts)] + ([F.col(tie_col)] if tie_col else []) + [F.col("_side")]
    l = left.withColumn("_side", F.lit(1))
    r = right.withColumn("_side", F.lit(0))
    carried = {c: f"_r_{c}" for c in right_cols}
    r = r.select(
        key,
        ts,
        *([tie_col] if tie_col and tie_col in right.columns else []),
        "_side",
        *[F.col(c).alias(a) for c, a in carried.items()],
    )
    lcols = [c for c in left.columns if c != "_side"]
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(a, ignorenulls=True).over(w).alias(f"asof_{c}")
            for c, a in carried.items()
        ],
    )
    return filled.filter(F.col("_side") == 1).select(
        *lcols, *[f"asof_{c}" for c in right_cols]
    )


def interval_self_join_count(
    df: DataFrame,
    ts_col: str,
    id_col: str,
    key_col: str,
    window_seconds: int,
) -> DataFrame:
    """Temporal interval self-join (engine extension — SURVEY §2.3 lists
    interval joins as absent from the reference): for each row, count
    rows of OTHER keys whose timestamp lies within ±window_seconds.

    Same shape as the J7 spatial grid join but in 1-D time: bucket =
    floor(unix_micros / window); the build side is exploded into its
    ±1 neighbor buckets, the join is a plain hash equi-join on bucket,
    and the exact |Δt| predicate filters the candidates — never a
    nested-loop theta join, so at 100 TB the shuffle is keyed by time
    bucket and the per-task candidate set is bounded by bucket density
    (skewed hot buckets split by AQE).
    """
    win_us = int(window_seconds) * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    bucket = F.floor(us / F.lit(win_us)).cast("long")

    probe = df.select(
        F.col(id_col).alias("_id"),
        F.col(key_col).alias("_key"),
        us.alias("_us"),
        bucket.alias("_b"),
    )
    build = (
        df.select(
            F.col(key_col).alias("_bkey"),
            us.alias("_bus"),
            bucket.alias("_bb"),
        )
        .withColumn("_o", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select("_bkey", "_bus", (F.col("_bb") + F.col("_o")).alias("_b"))
    )
    counts = (
        probe.hint("SHUFFLE_HASH").join(build, "_b")
        .filter(
            (F.col("_key") != F.col("_bkey"))
            & (F.abs(F.col("_us") - F.col("_bus")) <= F.lit(win_us))
        )
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("n_nearby"))
    )
    return (
        df.join(
            counts.withColumnRenamed("_id", id_col), id_col, "left"
        ).withColumn("n_nearby", F.coalesce(F.col("n_nearby"), F.lit(0)))
    )


def nearest_neighbor_join(
    probes: DataFrame,
    corpus: DataFrame,
    frame_col: str,
    x_col: str,
    y_col: str,
    id_col: str,
    radius: float,
    exclude_self: bool = True,
) -> DataFrame:
    """Radius-bounded spatial nearest-neighbor JOIN (r5c) — J7's grid
    machinery pointed at the argmin problem: for each probe point, the
    single closest corpus point in the same frame/group within
    ``radius`` (probes with no neighbor in range are absent — the
    radius is what keeps the candidate set grid-bounded; an unbounded
    NN needs ring-expansion, out of scope).

    ``exclude_self`` (default True) drops candidate pairs with EQUAL
    ids — correct when the probes are a subset of the corpus (the j11
    self-kNN shape). When probing one table against a DIFFERENT table
    whose id space may coincide, pass ``exclude_self=False`` or a
    genuinely shared id scheme: otherwise a corpus point that happens
    to share a probe's id would be wrongly suppressed.

    Plan: corpus exploded into its 9 neighboring cells (cell size =
    radius guarantees every ≤radius pair shares a cell), hash equi-join
    on (frame, cell), exact distance filter, then ONE combinable
    min(struct) argmin per probe — never a cartesian, never a theta
    join. Ties break on neighbor id (deterministic; distances are
    bit-identical expressions on both engines). Output: (frame, id,
    neighbor_id, dist2).
    """
    r = float(radius)

    def cells(df, idc, xc, yc, prefix):
        return df.select(
            F.col(frame_col).alias("_f"),
            F.col(idc).alias(f"_{prefix}id"),
            F.col(xc).alias(f"_{prefix}x"),
            F.col(yc).alias(f"_{prefix}y"),
            F.floor(F.col(xc) / F.lit(r)).cast("long").alias("_cx"),
            F.floor(F.col(yc) / F.lit(r)).cast("long").alias("_cy"),
        )

    probe = cells(probes, id_col, x_col, y_col, "p")
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    build = (
        cells(corpus, id_col, x_col, y_col, "b")
        .withColumn("_o", F.explode(offsets))
        .select(
            "_f",
            "_bid",
            "_bx",
            "_by",
            (F.col("_cx") + F.col("_o.dx")).alias("_cx"),
            (F.col("_cy") + F.col("_o.dy")).alias("_cy"),
        )
    )
    dx = F.col("_px") - F.col("_bx")
    dy = F.col("_py") - F.col("_by")
    d2 = dx * dx + dy * dy
    pair_filter = d2 <= F.lit(r * r)
    if exclude_self:
        pair_filter = (F.col("_pid") != F.col("_bid")) & pair_filter
    return (
        probe.hint("SHUFFLE_HASH").join(build, ["_f", "_cx", "_cy"])
        .filter(pair_filter)
        .select("_f", "_pid", "_bid", d2.alias("_d2"))
        .groupBy("_f", "_pid")
        .agg(F.min(F.struct(F.col("_d2"), F.col("_bid"))).alias("_m"))
        .select(
            F.col("_f").alias(frame_col),
            F.col("_pid").alias(id_col),
            F.col("_m._bid").alias("neighbor_id"),
            F.col("_m._d2").alias("dist2"),
        )
    )


def asof_join_cogroup(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str],
    tie_col: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join via ``cogroup().applyInPandas`` (r11, j16) — the
    as-of contract under the OTHER physical strategy, and the decision
    record for when each is right (the two agree except at CROSS-SIDE
    ts collisions: asof_join interleaves by a shared tie column, this
    kernel admits every same-ts right row — DuckDB ASOF <= semantics;
    both variants are pinned by their own oracles and by test):

    - ``asof_join`` (union + one key window) stays entirely JVM-side —
      prefer it whenever the per-key logic is expressible relationally.
    - This kernel co-shuffles BOTH sides on the key and hands each
      key's two Arrow batches to ONE pandas callback
      (``pd.merge_asof``). Same shuffle volume (|L|+|R| on the key, the
      two Exchanges of a shuffle join), plus Arrow serialization both
      ways — strictly more expensive HERE, but the callback is
      arbitrary imperative code: use this shape when the per-key
      alignment is something a window cannot say (DTW, per-key
      curve fitting, stateful simulation replay — the m3 trackers are
      this pattern's heavy users). j16 registers it against the same
      oracle family as j9 precisely so the cogroup path's SEMANTICS
      are pinned by hash, not just its plumbing.

    Per-key state must fit one executor's memory (the applyInPandas
    contract — one group, one Arrow batch); a hot key needs the j8
    salt-and-merge treatment. Ties: right rows sorted by (ts, tie_col),
    the LAST eligible row wins ⇒ max (ts, tie_col) with r.ts <= l.ts,
    exact matches included — DuckDB ASOF (<=) semantics, total given
    unique tie_col. ``direction`` (r11, j17) extends the contract the
    window-union form cannot express without a second mirrored window:
    'backward' (default, most recent at-or-before) or 'forward' (next
    at-or-after — attribution's "next purchase after the view" shape);
    forward ties take the FIRST (ts, tie_col) at-or-after, the mirror
    of backward's last-at-or-before."""
    import pandas as pd
    from pyspark.sql import types as T

    out_fields = list(left.schema.fields)
    int_like = set()
    for c in right_cols:
        f = right.schema[c]
        out_fields.append(T.StructField(f"asof_{c}", f.dataType, True))
        if isinstance(f.dataType, (T.LongType, T.IntegerType)):
            int_like.add(f"asof_{c}")
    out_schema = T.StructType(out_fields)
    lcols = left.columns
    # Both sides often derive from the SAME scan (self-cogroup), so
    # their same-named columns share Catalyst attribute ids — the
    # deduplication pass then silently DROPS the right side's duplicate
    # from the Arrow batch (observed: right `ts` vanishing). Re-alias
    # every non-key right column to a fresh name before grouping.
    r_pre = right.select(
        F.col(key).alias(key),
        F.col(ts).alias("_r_ts"),
        *([F.col(tie_col).alias("_r_tie")] if tie_col else []),
        *[F.col(c).alias(f"asof_{c}") for c in right_cols],
    )
    r_sort = ["_r_ts"] + (["_r_tie"] if tie_col else [])
    r_keep = ["_r_ts"] + [f"asof_{c}" for c in right_cols]

    def align(lp: pd.DataFrame, rp: pd.DataFrame) -> pd.DataFrame:
        # a key present on only ONE side arrives with the other side as
        # an EMPTY frame (which may carry no columns at all) — handle
        # both one-sided cases before touching column labels
        if lp.empty:
            return pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in out_fields}
            )
        if rp.empty:
            out = lp.copy()
            for c in right_cols:
                out[f"asof_{c}"] = pd.Series(dtype="object")
            return out
        lp = lp.sort_values(ts)
        rp = rp.sort_values(r_sort)[r_keep]
        out = pd.merge_asof(
            lp, rp, left_on=ts, right_on="_r_ts",
            direction=direction, allow_exact_matches=True,
        ).drop(columns=["_r_ts"])
        for c in int_like:  # NaN-safe integers for the Arrow return trip
            out[c] = out[c].astype("Int64")
        return out

    return (
        left.groupBy(key)
        .cogroup(r_pre.groupBy(key))
        .applyInPandas(align, schema=out_schema)
        .select(*lcols, *[f"asof_{c}" for c in right_cols])
    )
