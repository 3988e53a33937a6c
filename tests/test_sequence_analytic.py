"""Event-sequence analytics (stages/sequence.py) and keyed analytic
windows (stages/analytic.py) vs brute-force pandas references."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from zen3geo_ray.stages import analytic, sequence


def _events(n=4000, seed=1, n_keys=60, nblocks=6):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, n_keys, n).astype(np.int64),
        "ts_us": rng.integers(0, 500_000, n).astype(np.int64),
        "event_type": rng.choice(["view", "click", "purchase", "scroll"], n),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(nblocks)
    return df, ds


def test_transition_counts(ray_session):
    df, ds = _events()
    out = sequence.transition_counts(
        ds, key_col="user_id", order_col="event_id", type_col="event_type"
    ).to_pandas().sort_values(["event_type", "next_event_type"]).reset_index(drop=True)

    s = df.sort_values(["user_id", "event_id"])
    nxt = s.groupby("user_id")["event_type"].shift(-1)
    exp = (
        pd.DataFrame({"event_type": s["event_type"], "next_event_type": nxt})
        .dropna()
        .value_counts(["event_type", "next_event_type"])
        .reset_index(name="n")
        .sort_values(["event_type", "next_event_type"])
        .reset_index(drop=True)
    )
    exp["n"] = exp["n"].astype(np.int64)
    pd.testing.assert_frame_equal(out, exp)
    assert out["n"].sum() == len(df) - df["user_id"].nunique()


def test_funnel_conversion(ray_session):
    df, ds = _events(seed=2)
    within = np.int64(40_000)
    out = sequence.funnel_conversion(
        ds, key_col="user_id", ts_col="ts_us", type_col="event_type",
        from_type="view", to_type="purchase", within_us=int(within)
    ).to_pandas().set_index("user_id").sort_index()

    rows = {}
    for uid, g in df.groupby("user_id"):
        f = g.loc[g["event_type"] == "view", "ts_us"].to_numpy()
        p = g.loc[g["event_type"] == "purchase", "ts_us"].to_numpy()
        if len(f) == 0:
            continue
        conv = sum(bool(np.any((p > t) & (p - t <= within))) for t in f)
        rows[uid] = (len(f), conv)
    exp = pd.DataFrame.from_dict(rows, orient="index",
                                 columns=["n_from", "n_conv"]).sort_index()
    assert np.array_equal(out["n_from"].to_numpy(), exp["n_from"].to_numpy())
    assert np.array_equal(out["n_conv"].to_numpy(), exp["n_conv"].to_numpy())


def test_funnel_strictly_after_and_horizon():
    # unit-level check of the lexsort tie rule: purchase at SAME ts does
    # not count; exactly-at-horizon does.
    df = pd.DataFrame({
        "user_id": np.zeros(4, dtype=np.int64),
        "ts_us": np.array([100, 100, 200, 300], dtype=np.int64),
        "event_type": ["purchase", "view", "view", "purchase"],
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df))
    out = sequence.funnel_conversion(
        ds, key_col="user_id", ts_col="ts_us", type_col="event_type",
        from_type="view", to_type="purchase", within_us=100,
    ).to_pandas()
    # view@100: next purchase is @300 (gap 200 > 100) -> no.
    # view@200: purchase@300 gap 100 <= 100 -> yes.
    assert out["n_from"].iloc[0] == 2 and out["n_conv"].iloc[0] == 1


def test_cumulative_distinct(ray_session):
    df, ds = _events(seed=3)
    out = sequence.cumulative_distinct(
        ds, key_col="user_id", order_col="event_id", type_col="event_type"
    ).to_pandas().sort_values("event_id").reset_index(drop=True)

    s = df.sort_values(["user_id", "event_id"])
    first = ~s.duplicated(["user_id", "event_type"], keep="first")
    exp = first.astype(np.int64).groupby(s["user_id"]).cumsum()
    s = s.assign(n_types=exp).sort_values("event_id").reset_index(drop=True)
    assert np.array_equal(out["n_types"].to_numpy(), s["n_types"].to_numpy())
    assert out["n_types"].max() <= 4


def test_gapfill_counts(ray_session):
    df, ds = _events(seed=4, n=800, n_keys=12)
    unit = 50_000
    out = sequence.gapfill_counts(
        ds, key_col="user_id", ts_col="ts_us", unit_us=unit
    ).to_pandas().sort_values(["user_id", "unit_us"]).reset_index(drop=True)

    frames = []
    for uid, g in df.groupby("user_id"):
        hb = g["ts_us"].to_numpy() // unit
        dense = np.arange(hb.min(), hb.max() + 1, dtype=np.int64)
        cnt = pd.Series(hb).value_counts().reindex(dense, fill_value=0)
        frames.append(pd.DataFrame({
            "user_id": np.int64(uid), "unit_us": dense * unit,
            "n": cnt.to_numpy().astype(np.int64)}))
    exp = pd.concat(frames, ignore_index=True)
    pd.testing.assert_frame_equal(out, exp)
    # densified: consecutive buckets per key, zeros present
    assert (out.groupby("user_id")["unit_us"].diff().dropna() == unit).all()


def _orders(n=3000, seed=5, n_keys=40, nblocks=5):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "uid": np.arange(n, dtype=np.int64),
        "k": rng.integers(0, n_keys, n).astype(np.int64),
        "cents": rng.integers(100, 1_000_000, n).astype(np.int64),
    })
    return df, rd.from_arrow(pa.Table.from_pandas(df)).repartition(nblocks)


def test_share_of_key(ray_session):
    df, ds = _orders()
    out = analytic.share_of_key(ds, key_col="k", value_col="cents") \
        .to_pandas().sort_values("uid").reset_index(drop=True)
    tot = df.groupby("k")["cents"].transform("sum")
    exp = df["cents"].to_numpy().astype(np.float64) / tot.to_numpy().astype(np.float64)
    assert np.array_equal(out["share"].to_numpy(), exp)  # bit-exact
    sums = out.groupby("k")["share"].sum()
    assert np.allclose(sums, 1.0)


def test_first_last_nth(ray_session):
    df, ds = _orders(seed=6)
    out = analytic.first_last_nth(
        ds, key_col="k", order_col="uid", value_col="cents", nth=3
    ).to_pandas().set_index("k").sort_index()
    for k, g in df.sort_values("uid").groupby("k"):
        v = g["cents"].to_numpy()
        assert out.loc[k, "first_v"] == v[0]
        assert out.loc[k, "last_v"] == v[-1]
        assert out.loc[k, "n"] == len(v)
        if len(v) >= 3:
            assert out.loc[k, "nth_v"] == v[2]
        else:
            assert np.isnan(out.loc[k, "nth_v"])


def test_first_last_nth_short_groups(ray_session):
    # keys with fewer than nth rows yield null nth_v, not a wrong value
    df = pd.DataFrame({
        "uid": np.arange(4, dtype=np.int64),
        "k": np.array([0, 0, 1, 2], dtype=np.int64),
        "cents": np.array([10, 20, 30, 40], dtype=np.int64),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df))
    out = analytic.first_last_nth(
        ds, key_col="k", order_col="uid", value_col="cents", nth=2
    ).to_pandas().set_index("k").sort_index()
    assert out.loc[0, "nth_v"] == 20
    assert np.isnan(out.loc[1, "nth_v"]) and np.isnan(out.loc[2, "nth_v"])


def test_mad_outliers(ray_session):
    df, ds = _orders(seed=7, n_keys=4)
    df["k"] = df["k"].astype(np.int64)
    out = analytic.mad_outliers(
        ds, key_cols=["k"], value_col="cents", uid_col="uid", k=1
    ).to_pandas().sort_values("uid").reset_index(drop=True)

    med = df.groupby("k")["cents"].median()
    med2 = (2 * med).round().astype(np.int64)
    dev2 = np.abs(2 * df["cents"].to_numpy()
                  - med2.reindex(df["k"]).to_numpy())
    mad2 = pd.Series(dev2).groupby(df["k"].to_numpy()).median()
    flag = dev2 > 1 * mad2.reindex(df["k"]).to_numpy()
    exp = df.loc[flag, "uid"].to_numpy()
    assert np.array_equal(out["uid"].to_numpy(), np.sort(exp))
    assert 0 < len(out) < len(df)


def test_cube2(ray_session):
    rng = np.random.default_rng(8)
    n = 2000
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], n),
        "b": rng.choice(["p", "q"], n),
        "v": rng.integers(1, 50, n).astype(np.float64),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(4)
    out = analytic.cube2(ds, dim1="a", dim2="b", value_col="v").to_pandas()
    assert len(out) == 3 * 2 + 3 + 2 + 1
    fine = out[out["a"].notna() & out["b"].notna()]
    exp_fine = df.groupby(["a", "b"]).agg(n=("v", "size"), v_sum=("v", "sum"))
    for (a, b), r in exp_fine.iterrows():
        row = fine[(fine["a"] == a) & (fine["b"] == b)].iloc[0]
        assert row["n"] == r["n"] and row["v_sum"] == r["v_sum"]
    lv1 = out[out["a"].notna() & out["b"].isna()].set_index("a")
    exp1 = df.groupby("a")["v"].sum()
    assert np.array_equal(lv1["v_sum"].sort_index().to_numpy(),
                          exp1.sort_index().to_numpy())
    total = out[out["a"].isna() & out["b"].isna()]
    assert total["n"].iloc[0] == n and total["v_sum"].iloc[0] == df["v"].sum()


def test_cohort_retention_planted(ray_session):
    """Hand-built cohorts: users 1,2 start unit 0 (user 1 returns at
    units 1 and 3; user 2 at 1), user 3 starts unit 2 and returns at 3;
    duplicate events within a unit count once."""
    from zen3geo_ray.stages.sequence import cohort_retention

    U = 10  # unit_us
    rows = [  # (user, t_us)
        (1, 0), (1, 5), (1, 12), (1, 33),
        (2, 3), (2, 19),
        (3, 25), (3, 25), (3, 31),
    ]
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows],
                       pa.timestamp("us")),
    })).repartition(3)
    out = cohort_retention(ds, unit_us=U, n_buckets=4).to_pandas()
    got = {(r.cohort, r.offset): r.n_keys for r in out.itertuples()}
    assert got == {
        (0, 0): 2,   # users 1, 2
        (0, 1): 2,   # both return in unit 1
        (0, 3): 1,   # user 1 at unit 3
        (2, 0): 1,   # user 3 cohort
        (2, 1): 1,   # user 3 at unit 3
    }


def test_skyline2d_reference(ray_session):
    """Frontier vs the direct O(n^2) domination check, with duplicate
    pairs and x/y ties crossing block boundaries."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages.analytic import skyline2d

    rng = np.random.default_rng(21)
    x = rng.integers(0, 12, 400).astype(np.int64)
    y = rng.integers(0, 12, 400).astype(np.int64)
    ds = rd.from_arrow(pa.table({"x": pa.array(x), "y": pa.array(y)})) \
        .repartition(5)
    out = skyline2d(ds, "x", "y", n_buckets=4).to_pandas()

    pairs = {}
    for xi, yi in zip(x.tolist(), y.tolist()):
        pairs[(xi, yi)] = pairs.get((xi, yi), 0) + 1
    want = {}
    for (xi, yi), c in pairs.items():
        dominated = any(
            xb >= xi and yb >= yi and (xb > xi or yb > yi)
            for (xb, yb) in pairs)
        if not dominated:
            want[(xi, yi)] = c
    got = {(int(r.x), int(r.y)): int(r.n_rows) for r in out.itertuples()}
    assert got == want and len(got) >= 1


def test_skyline2d_goldens(ray_session):
    """Hand-checked: (3,1) dominated by (3,2); (1,3) survives; the
    duplicate (3,2) pair keeps count 2."""
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages.analytic import skyline2d

    t = pa.table({"x": pa.array([3, 3, 3, 1, 2], pa.int64()),
                  "y": pa.array([1, 2, 2, 3, 2], pa.int64())})
    out = skyline2d(rd.from_arrow(t), "x", "y", n_buckets=2).to_pandas()
    got = {(int(r.x), int(r.y)): int(r.n_rows) for r in out.itertuples()}
    assert got == {(3, 2): 2, (1, 3): 1}


def test_od_counts_golden(ray_session):
    import ray.data as rd

    from zen3geo_ray.stages.sequence import od_counts

    # user 1: cells 5 -> 5 -> 7 (one stay, one move); ties on ts break
    # by id: user 2 has two events at t=10 -> order by id gives 3 -> 9
    t = pa.table({
        "u": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "ts": pa.array([1, 2, 3, 10, 10], pa.int64()),
        "id": pa.array([100, 101, 102, 201, 200], pa.int64()),
        "cell": pa.array([5, 5, 7, 9, 3], pa.int64()),
    })
    out = od_counts(rd.from_arrow(t).repartition(2), key_col="u",
                    ts_col="ts", id_col="id",
                    n_buckets=2).to_pandas().sort_values(
        ["cell_from", "cell_to"]).reset_index(drop=True)
    got = list(zip(out.cell_from, out.cell_to, out.n))
    assert got == [(3, 9, 1), (5, 5, 1), (5, 7, 1)]


def test_flow_reciprocity_golden(ray_session):
    import ray.data as rd

    from zen3geo_ray.stages.sequence import flow_reciprocity

    # dyad (1,2): 5 fwd / 3 rev -> mutual, 2*min = 6; dyad (1,3): 2/0
    # -> asymmetric; (3,3) is a self-loop and must be excluded
    od = pa.table({
        "cell_from": pa.array([1, 2, 1, 3], pa.int64()),
        "cell_to": pa.array([2, 1, 3, 3], pa.int64()),
        "n": pa.array([5, 3, 2, 9], pa.int64()),
    })
    out = flow_reciprocity(
        rd.from_arrow(od).repartition(2), n_buckets=2).to_pandas().iloc[0]
    assert int(out.w_total) == 10
    assert int(out.w_recip) == 6
    assert int(out.m_dyads) == 1
    assert int(out.a_dyads) == 1
    assert out.recip_w == 0.6
    assert out.recip_b == 2.0 / 3.0


def test_flow_reciprocity_empty(ray_session):
    import ray.data as rd

    from zen3geo_ray.stages.sequence import flow_reciprocity

    od = pa.table({
        "cell_from": pa.array([4], pa.int64()),
        "cell_to": pa.array([4], pa.int64()),
        "n": pa.array([2], pa.int64()),
    })
    out = flow_reciprocity(rd.from_arrow(od)).to_pandas().iloc[0]
    assert int(out.w_total) == 0 and out.recip_w == 0.0
    assert out.recip_b == 0.0


def test_staypoints_golden(ray_session):
    import ray.data as rd

    from zen3geo_ray.stages.sequence import staypoints

    # user 1: 5,5,7,5,5,5 -> runs [5x2], [7x1], [5x3]; min 2 keeps two
    t = pa.table({
        "u": pa.array([1] * 6 + [2] * 2, pa.int64()),
        "ts": pa.array([1, 2, 3, 4, 5, 6, 1, 2], pa.int64()),
        "id": pa.array(list(range(8)), pa.int64()),
        "cell": pa.array([5, 5, 7, 5, 5, 5, 9, 9], pa.int64()),
    })
    out = staypoints(rd.from_arrow(t).repartition(2), key_col="u",
                     ts_col="ts", id_col="id", min_events=2,
                     n_buckets=2).to_pandas().sort_values(
        ["u", "start_tu"]).reset_index(drop=True)
    got = list(zip(out.u, out.cell, out.n_events, out.start_tu,
                   out.end_tu))
    assert got == [(1, 5, 2, 1, 2), (1, 5, 3, 4, 6), (2, 9, 2, 1, 2)]


def test_trajectory_stats_golden(ray_session):
    import ray.data as rd

    # user 1: (0,0) -> (3,4) -> (3,4)  (ts tie at 20 broken by id)
    # user 2: single event at (5,5)
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2],
        "tu": [10, 20, 20, 7],
        "eid": [3, 1, 2, 9],
        "nx": [0, 3, 3, 5],
        "ny": [0, 4, 4, 5],
    })
    out = (sequence.trajectory_stats(
        rd.from_arrow(pa.Table.from_pandas(df)).repartition(3),
        key_col="user_id", ts_col="tu", id_col="eid", n_buckets=4)
        .to_pandas().sort_values("user_id").reset_index(drop=True))
    assert out.loc[0, "n"] == 3 and out.loc[0, "steps"] == 2
    assert out.loc[0, "manhattan"] == 7      # |3|+|4| then 0
    assert out.loc[0, "net"] == 7
    # rog_num = 3*(0 + 25 + 25) - 6^2 - 8^2 = 150 - 36 - 64 = 50
    assert out.loc[0, "rog_num"] == 50
    assert out.loc[1, "n"] == 1 and out.loc[1, "steps"] == 0
    assert out.loc[1, "manhattan"] == 0 and out.loc[1, "net"] == 0
    assert out.loc[1, "rog_num"] == 0


def test_kaplan_meier_golden(ray_session):
    import math

    import ray.data as rd

    from zen3geo_ray.stages.sequence import KM_SCALE, kaplan_meier

    # day_us=1 so ts IS the day.  m = 5; censor window 1 day ->
    # deaths: u1 (dur 3), u2/u4 (dur 2); censored: u3 (dur 5), u5 (0)
    rows = [("u1", 0), ("u1", 3), ("u2", 1), ("u2", 3),
            ("u3", 0), ("u3", 5), ("u4", 2), ("u4", 4), ("u5", 5)]
    t = pa.table({"k": pa.array([r[0] for r in rows]),
                  "tu": pa.array([r[1] for r in rows], pa.int64())})
    out = kaplan_meier(rd.from_arrow(t).repartition(3), key_col="k",
                       ts_col="tu", day_us=1, censor_days=1,
                       n_buckets=2).to_pandas()
    assert out.t_day.tolist() == [2, 3]
    assert out.n_risk.tolist() == [4, 2]
    assert out.n_death.tolist() == [2, 1]
    assert out.n_censor.tolist() == [0, 0]
    t2 = math.floor((math.log(2) - math.log(4)) * float(KM_SCALE))
    t3 = math.floor((math.log(1) - math.log(2)) * float(KM_SCALE))
    assert out.ls_q.tolist() == [t2, t2 + t3]
    assert out.log_surv.tolist() == [
        float(t2) / float(KM_SCALE), float(t2 + t3) / float(KM_SCALE)]


def test_kaplan_meier_last_risk_set_dies(ray_session):
    import math

    import ray.data as rd

    from zen3geo_ray.stages.sequence import (KM_SCALE, KM_ZERO_Q,
                                             kaplan_meier)

    # u3 censored at dur 0 (lday 9 = m); u1 dies at dur 1, u2 at dur 4
    # where n_risk == n_death == 1 -> the S = 0 sentinel term
    rows = [("u1", 0), ("u1", 1), ("u2", 0), ("u2", 4), ("u3", 9)]
    t = pa.table({"k": pa.array([r[0] for r in rows]),
                  "tu": pa.array([r[1] for r in rows], pa.int64())})
    out = kaplan_meier(rd.from_arrow(t), key_col="k", ts_col="tu",
                       day_us=1, censor_days=1, n_buckets=2).to_pandas()
    assert out.t_day.tolist() == [1, 4]
    assert out.n_risk.tolist() == [2, 1]
    t1 = math.floor((math.log(1) - math.log(2)) * float(KM_SCALE))
    assert out.ls_q.tolist() == [t1, t1 + KM_ZERO_Q]


def test_funnel_depth_golden(ray_session):
    import ray.data as rd

    from zen3geo_ray.stages.sequence import funnel_depth

    # u1: view(1) click(2) purchase(3)        -> depth 3
    # u2: view(1) purchase(2) click(3)        -> depth 2 (purchase
    #     precedes the matched click -> not counted)
    # u3: click(1) view(2)                    -> depth 1 (click before
    #     the first view doesn't count)
    # u4: purchase only                       -> no view, emits nothing
    # u5: view and click at the SAME ts, click's event_id greater ->
    #     strictly-after by the (ts, id) total order -> depth 2
    rows = [
        (1, 1, 10, "view"), (1, 2, 11, "click"), (1, 3, 12, "purchase"),
        (2, 1, 20, "view"), (2, 2, 21, "purchase"), (2, 3, 22, "click"),
        (3, 1, 30, "click"), (3, 2, 31, "view"),
        (4, 1, 40, "purchase"),
        (5, 7, 50, "view"), (5, 7, 51, "click"),
    ]
    t = pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "tu": pa.array([r[1] for r in rows], pa.int64()),
        "eid": pa.array([r[2] for r in rows], pa.int64()),
        "typ": pa.array([r[3] for r in rows]),
    })
    out = funnel_depth(rd.from_arrow(t).repartition(3), key_col="u",
                       ts_col="tu", id_col="eid", type_col="typ",
                       steps=["view", "click", "purchase"],
                       n_buckets=2).to_pandas()
    got = {int(r.depth): int(r.n_users) for r in out.itertuples()}
    assert got == {1: 1, 2: 2, 3: 1}


def test_last_touch_attribution_golden(ray_session):
    import ray.data as rd

    from zen3geo_ray.stages.sequence import last_touch_attribution

    # u1: view(1) click(2) purchase(3, 100)   -> click credited
    # u2: view(1) purchase(50, 200)           -> window 10 missed ->
    #     direct (an OLDER view can never rescue a window miss)
    # u3: purchase(1, 300) view(2)            -> later touch ignored ->
    #     direct
    # u4: click at the SAME ts as the purchase, smaller event_id ->
    #     strictly-before by the (ts, id) total order -> click
    rows = [
        (1, 1, 10, "view", 0), (1, 2, 11, "click", 0),
        (1, 3, 12, "purchase", 100),
        (2, 1, 20, "view", 0), (2, 50, 21, "purchase", 200),
        (3, 1, 30, "purchase", 300), (3, 2, 31, "view", 0),
        (4, 7, 40, "click", 0), (4, 7, 41, "purchase", 400),
    ]
    t = pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "tu": pa.array([r[1] for r in rows], pa.int64()),
        "eid": pa.array([r[2] for r in rows], pa.int64()),
        "typ": pa.array([r[3] for r in rows]),
        "cents": pa.array([r[4] for r in rows], pa.int64()),
    })
    out = last_touch_attribution(
        rd.from_arrow(t).repartition(3), key_col="u", ts_col="tu",
        id_col="eid", type_col="typ", value_col="cents",
        conv_type="purchase", window=10, n_buckets=2).to_pandas()
    got = {r.touch_type: (int(r.conversions), int(r.credited))
           for r in out.itertuples()}
    assert got == {"click": (2, 500), "direct": (2, 500)}


def test_ewma_last_k_exact(ray_session):
    import ray.data as rd

    from zen3geo_ray.stages.sequence import ewma_last_k

    # u1: values 1..5 in ts order, k=3 -> last 3 are 3,4,5 with
    # weights 1,2,4 -> num = 3+8+20 = 31, denom = 7
    # u2: one value 10 -> num = 10*4 = 40, denom = 4 (truncated renorm)
    # u3: ties at equal ts break by event_id (7 is most recent)
    rows = [(1, t, 10 + t, v) for t, v in enumerate([1, 2, 3, 4, 5])]
    rows += [(2, 0, 20, 10)]
    rows += [(3, 5, 30, 6), (3, 5, 31, 7)]
    t = pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "tu": pa.array([r[1] for r in rows], pa.int64()),
        "eid": pa.array([r[2] for r in rows], pa.int64()),
        "v": pa.array([r[3] for r in rows], pa.int64()),
    })
    out = ewma_last_k(rd.from_arrow(t).repartition(2), key_col="u",
                      ts_col="tu", id_col="eid", value_col="v",
                      k=3, n_buckets=2).to_pandas().set_index("u")
    assert int(out.loc[1, "ewma_num"]) == 3 * 1 + 4 * 2 + 5 * 4
    assert out.loc[1, "ewma"] == 31.0 / 7.0
    assert (int(out.loc[2, "ewma_num"]), out.loc[2, "ewma"]) == (40, 10.0)
    # u3: most recent = eid 31 (v=7) weight 4, then v=6 weight 2
    assert int(out.loc[3, "ewma_num"]) == 7 * 4 + 6 * 2
    assert out.loc[3, "ewma"] == 40.0 / 6.0


def test_dtw_pairs_reference(ray_session):
    import ray.data as rd

    from zen3geo_ray.stages.sequence import dtw_pairs

    def ref_dtw(x, y):
        L = len(x)
        C = [[0] * L for _ in range(L)]
        for i in range(L):
            for j in range(L):
                c = abs(x[i] - y[j])
                if i == 0 and j == 0:
                    C[i][j] = c
                elif i == 0:
                    C[i][j] = C[i][j - 1] + c
                elif j == 0:
                    C[i][j] = C[i - 1][j] + c
                else:
                    C[i][j] = c + min(C[i - 1][j], C[i][j - 1],
                                      C[i - 1][j - 1])
        return C[L - 1][L - 1]

    # three users over 4 days (day_us=1): u1 and u2 identical -> 0;
    # u3 shifted by one day (DTW absorbs the shift cheaply)
    rows = []
    series = {1: [5, 9, 2, 7], 2: [5, 9, 2, 7], 3: [0, 5, 9, 2]}
    for u, vals in series.items():
        for d, v in enumerate(vals):
            if v:
                rows.append((u, d, v))
    t = pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "tu": pa.array([r[1] for r in rows], pa.int64()),
        "c": pa.array([r[2] for r in rows], pa.int64())})
    out = dtw_pairs(rd.from_arrow(t).repartition(3), key_col="u",
                    ts_col="tu", value_col="c", length=4, day_us=1,
                    n_buckets=2).to_pandas()
    got = {(int(r.key_a), int(r.key_b)): int(r.dtw)
           for r in out.itertuples()}
    want = {(a, b): ref_dtw(series[a], series[b])
            for a in series for b in series if a < b}
    assert got == want
    assert got[(1, 2)] == 0
