"""Property tests for M5 movement features (SURVEY §5; reference
invariants from create_frame_summary_features.py:22-52)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cellphe_data_pipeline_spark.operators.movement import movement_features


def _trajectories(spark):
    rows = []
    # cell 1: unit steps along x; cell 2: stationary; cell 3: zig-zag
    for i in range(6):
        rows.append((1, i + 1, float(i), 0.0))
    for i in range(4):
        rows.append((2, i + 1, 5.0, 5.0))
    for i, (x, y) in enumerate([(0, 0), (1, 1), (0, 0), (1, 1), (2, 0)]):
        rows.append((3, i + 1, float(x), float(y)))
    return spark.createDataFrame(rows, "cell_id int, frame_id int, x double, y double")


def test_movement_invariants(spark):
    df = _trajectories(spark)
    out = movement_features(df, key="cell_id", order=["frame_id"], x="x", y="y").collect()
    by_cell: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["cell_id"], r["frame_id"])):
        by_cell.setdefault(r["cell_id"], []).append(r)
    for rows in by_cell.values():
        # first frame: no displacement yet
        assert rows[0]["frame_dist"] == 0.0
        assert rows[0]["Dis"] == 0.0
        assert rows[0]["Trac"] == 0.0
        assert rows[0]["D2T"] == 0.0  # 0/0 -> 0 (F7)
        assert rows[0]["Vel"] == 0.0
        prev_trac = 0.0
        for r in rows:
            # Trac nondecreasing; Dis <= Trac (triangle ineq); D2T in [0,1]
            assert r["Trac"] >= prev_trac - 1e-12
            assert r["Dis"] <= r["Trac"] + 1e-9
            assert 0.0 <= r["D2T"] <= 1.0 + 1e-12
            prev_trac = r["Trac"]


def test_movement_exact_values(spark):
    df = _trajectories(spark)
    out = {
        (r["cell_id"], r["frame_id"]): r
    for r in movement_features(df, key="cell_id", order=["frame_id"], x="x", y="y").collect()}
    # cell 1 walks unit steps: at frame k (1-based), Dis = Trac = k-1
    for k in range(1, 7):
        r = out[(1, k)]
        assert math.isclose(r["Dis"], k - 1.0)
        assert math.isclose(r["Trac"], k - 1.0)
        if k > 1:
            assert math.isclose(r["D2T"], 1.0)
            assert math.isclose(r["Vel"], 0.0028 * 1.0 / 1.0)
    # stationary cell: everything 0
    for k in range(1, 5):
        r = out[(2, k)]
        assert r["Dis"] == 0.0 and r["Trac"] == 0.0 and r["D2T"] == 0.0
    # zig-zag returns to start at frame 3: Dis=0 but Trac>0 -> D2T=0
    r = out[(3, 3)]
    assert r["Dis"] == 0.0 and r["Trac"] > 0 and r["D2T"] == 0.0


def test_filter_invariants(spark):
    from cellphe_data_pipeline_spark.operators.qc_filters import filter_size_and_observations

    rows = [(t, f, float(a)) for t, f, a in [
        (1, 1, 60), (1, 2, 70), (1, 3, 80),   # kept: 3 obs, all big
        (2, 1, 60), (2, 2, 10), (2, 3, 65),   # 1 small row drops -> 2 obs -> gone
        (3, 1, 90), (3, 2, 95),               # only 2 obs -> gone
        (4, 1, 5),                            # too small -> gone
    ]]
    df = spark.createDataFrame(rows, "track_id int, frame int, area double")
    out = filter_size_and_observations(
        df, area_col="area", key="track_id", minimum_cell_size=50, minimum_observations=3
    ).collect()
    assert all(r["area"] >= 50 for r in out)
    counts: dict[int, int] = {}
    for r in out:
        counts[r["track_id"]] = counts.get(r["track_id"], 0) + 1
    assert counts == {1: 3}


def test_movement_invariants_hypothesis(spark):
    """SURVEY §5 property test: the M5 invariants hold on arbitrary
    random trajectories, not just the hand-built ones."""
    from hypothesis import given, settings, strategies as st

    coord = st.floats(min_value=-1e4, max_value=1e4, allow_nan=False, width=32)
    traj = st.lists(st.tuples(coord, coord), min_size=1, max_size=20)

    @settings(max_examples=15, deadline=None)
    @given(st.lists(traj, min_size=1, max_size=3))
    def check(trajs):
        rows = [
            (c, f + 1, float(x), float(y))
            for c, t in enumerate(trajs)
            for f, (x, y) in enumerate(t)
        ]
        df = spark.createDataFrame(rows, "cell_id int, frame_id int, x double, y double")
        out = movement_features(df, key="cell_id", order=["frame_id"], x="x", y="y").collect()
        by_cell: dict = {}
        for r in sorted(out, key=lambda r: (r["cell_id"], r["frame_id"])):
            by_cell.setdefault(r["cell_id"], []).append(r)
        for rs in by_cell.values():
            assert rs[0]["frame_dist"] == 0.0 and rs[0]["Dis"] == 0.0
            assert rs[0]["D2T"] == 0.0  # 0/0 -> 0
            prev = 0.0
            for r in rs:
                assert r["Trac"] >= prev - 1e-9          # nondecreasing
                assert r["Dis"] <= r["Trac"] + 1e-6      # triangle ineq
                assert 0.0 <= r["D2T"] <= 1.0 + 1e-9
                prev = r["Trac"]

    check()
