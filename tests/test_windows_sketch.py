"""Windowing (sliding/session) and HLL-sketch tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from zen3geo_ray.stages import sketch, windows


def test_sliding_window_expand():
    ts = np.array(["2024-01-01T00:30", "2024-01-01T02:30"], dtype="datetime64[us]")
    batch = pa.table({"ts": ts, "k": ["a", "b"]})
    out = windows.sliding_window_expand(
        batch, ts_col="ts", size_units=3, unit_us=3_600_000_000, keep_cols=["k"]
    ).to_pandas()
    # each row lands in 3 windows ending at its own hour
    assert len(out) == 6
    h0 = int(ts[0].astype("datetime64[us]").astype(np.int64) // 3_600_000_000)
    assert sorted(out[out.k == "a"]["window"]) == [h0 - 2, h0 - 1, h0]


def test_sessionize_matches_pandas(ray_session):
    rng = np.random.default_rng(0)
    n = 3000
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + np.sort(rng.integers(0, 86_400_000_000, n)).astype("timedelta64[us]")
    user = rng.integers(0, 40, n)
    tbl = pa.table({"user_id": user, "ts": ts})
    gap = 15 * 60 * 1_000_000
    out = windows.sessionize(
        rd.from_arrow(tbl).repartition(6), key_col="user_id", ts_col="ts",
        gap_us=gap,
    ).to_pandas()
    # pandas oracle
    df = pd.DataFrame({"user_id": user, "t": ts.astype(np.int64)}).sort_values(
        ["user_id", "t"], kind="mergesort"
    )
    new = (df.groupby("user_id")["t"].diff().fillna(gap + 1) > gap).astype(int)
    df["sid"] = new.groupby(df["user_id"]).cumsum() - 1
    exp = (
        df.groupby(["user_id", "sid"])
        .agg(n_events=("t", "size"), start_us=("t", "min"), end_us=("t", "max"))
        .reset_index()
        .rename(columns={"sid": "session_idx"})
    )
    g = out.sort_values(["user_id", "session_idx"]).reset_index(drop=True)
    e = exp.sort_values(["user_id", "session_idx"]).reset_index(drop=True)
    assert len(g) == len(e)
    for c in ("user_id", "session_idx", "n_events", "start_us", "end_us"):
        assert np.array_equal(g[c].to_numpy().astype(np.int64),
                              e[c].to_numpy().astype(np.int64)), c


def test_hll_accuracy():
    rng = np.random.default_rng(1)
    for true_n in (50, 5_000, 200_000):
        vals = rng.integers(0, 1 << 60, true_n).astype(np.uint64)
        regs = sketch.hll_from_hashes(sketch.splitmix64(vals))
        est = sketch.hll_estimate(regs)
        assert est == pytest.approx(true_n, rel=0.06)


def test_hll_merge_equals_union():
    rng = np.random.default_rng(2)
    a = rng.integers(0, 1 << 60, 10_000).astype(np.uint64)
    b = rng.integers(0, 1 << 60, 10_000).astype(np.uint64)
    ra = sketch.hll_from_hashes(sketch.splitmix64(a))
    rb = sketch.hll_from_hashes(sketch.splitmix64(b))
    runion = sketch.hll_from_hashes(sketch.splitmix64(np.concatenate([a, b])))
    assert np.array_equal(sketch.hll_merge(ra, rb), runion)


def test_approx_distinct_pipeline(ray_session):
    rng = np.random.default_rng(3)
    n = 30_000
    key = rng.integers(0, 3, n)
    val = rng.integers(0, 2_000, n)
    tbl = pa.table({"k": key, "v": val})
    out = sketch.approx_distinct(
        rd.from_arrow(tbl).repartition(8), ["k"], "v"
    ).to_pandas()
    exact = pd.DataFrame({"k": key, "v": val}).groupby("k")["v"].nunique()
    for _, row in out.iterrows():
        assert row["approx_distinct"] == pytest.approx(exact[row["k"]], rel=0.08)


def test_hll_overlap_accuracy(ray_session):
    """Pairwise union/intersection estimates land within the HLL error
    envelope of the exact set sizes, and the singles agree with
    approx_distinct on the same data."""
    rng = np.random.default_rng(5)
    n = 30_000
    key = rng.integers(0, 3, n)
    # overlapping value ranges: key k draws from [k*800, k*800 + 2000)
    val = rng.integers(0, 2_000, n) + key * 800
    tbl = pa.table({"k": key.astype(np.int64), "v": val.astype(np.int64)})
    out = sketch.hll_overlap(
        rd.from_arrow(tbl).repartition(8), "k", "v").to_pandas()
    assert len(out) == 3  # pairs (0,1), (0,2), (1,2)
    sets = {k: set(val[key == k].tolist()) for k in (0, 1, 2)}
    for r in out.itertuples(index=False):
        a, b = sets[int(r.key_a)], sets[int(r.key_b)]
        assert r.a_distinct == pytest.approx(len(a), rel=0.08)
        assert r.union_distinct == pytest.approx(len(a | b), rel=0.08)
        # inclusion-exclusion inherits ~3x the relative error budget
        assert r.intersect_distinct == pytest.approx(
            len(a & b), abs=0.25 * len(a | b))
        assert r.intersect_distinct \
            == pytest.approx(r.a_distinct + r.b_distinct - r.union_distinct)


def test_sliding_agg_dense_matches_fanout(ray_session):
    """Dense (prefix-sum + sparse-table) sliding aggregates == the
    fan-out implementation, at a big window size and with gaps."""
    rng = np.random.default_rng(23)
    n = 3000
    base = np.datetime64("2024-01-01T00:00:00", "us")
    # clustered + gapped event times across ~6 days
    ts = base + (rng.integers(0, 150, n) * 3600 + rng.integers(0, 3600, n)).astype(
        "timedelta64[s]"
    ).astype("timedelta64[us]")
    tbl = pa.table({
        "k": pa.array(rng.choice(["a", "b", "c"], n)),
        "ts": pa.array(ts),
        "v": pa.array(rng.integers(-500, 500, n), pa.int64()),
    })
    kw = dict(ts_col="ts", key_col="k", value_col="v",
              unit_us=3_600_000_000, aggs=["sum", "min", "max"])
    for size in (1, 3, 24):
        dense = windows.sliding_agg_dense(
            rd.from_arrow(tbl).repartition(4), size_units=size, **kw
        ).to_pandas().sort_values(["k", "window"]).reset_index(drop=True)
        fan = windows.sliding_agg(
            rd.from_arrow(tbl).repartition(4), size_units=size, **kw
        ).to_pandas().sort_values(["k", "window"]).reset_index(drop=True)
        fan = fan[dense.columns]
        pd.testing.assert_frame_equal(
            dense, fan, check_dtype=False, obj=f"size={size}"
        )


def test_rmq_levels_and_query():
    rng = np.random.default_rng(5)
    arr = rng.integers(-1000, 1000, 500).astype(np.int64)
    for ufunc in (np.minimum, np.maximum):
        levels = windows._rmq_levels(arr, 64, ufunc)
        a = rng.integers(0, 450, 200)
        b = a + rng.integers(0, 50, 200)
        b = np.minimum(b, len(arr) - 1)
        got = windows._rmq_query(levels, a, b, ufunc)
        exp = np.array([ufunc.reduce(arr[x:y + 1]) for x, y in zip(a, b)])
        assert np.array_equal(got, exp)


def test_approx_top_k_bounds_and_exact_case(ray_session):
    """Bounded-capacity heavy hitters: (a) true counts sit inside the
    reported [n_lo, n_hi] for every reported key; (b) heavy skew keeps
    the true top keys in the report; (c) with capacity >= block distinct
    the result equals the exact GROUP BY top-k."""
    from zen3geo_ray.stages.sketch import approx_top_k

    rng = np.random.default_rng(13)
    # zipf-ish skew over 500 keys
    keys = rng.zipf(1.5, 20_000) % 500
    tbl = pa.table({"k": pa.array(keys.astype(np.int64))})
    truth = pd.Series(keys).value_counts()

    # bounded capacity: approximation with valid bounds
    out = approx_top_k(
        rd.from_arrow(tbl).repartition(8), "k", k=10, capacity=50
    ).to_pandas()
    assert len(out) == 10
    for _, r in out.iterrows():
        t = int(truth.get(int(r["k"]), 0))
        assert r["n_lo"] <= t <= r["n_hi"], (r.tolist(), t)
    top_true = set(truth.index[:3].astype(int))
    assert top_true <= set(out["k"].astype(int))

    # generous capacity: exact — equals GROUP BY count top-k
    exact = approx_top_k(
        rd.from_arrow(tbl).repartition(8), "k", k=10, capacity=4096
    ).to_pandas()
    expect = (
        truth.rename_axis("k").reset_index(name="n")
        .sort_values(["n", "k"], ascending=[False, True]).head(10)
    )
    assert exact["k"].astype(int).tolist() == expect["k"].astype(int).tolist()
    assert exact["n_lo"].tolist() == expect["n"].tolist()
    assert (exact["n_lo"] == exact["n_hi"]).all()


def test_sliding_dense_sparse_key_huge_gap(ray_session):
    """A key with events separated by a huge unit gap must not
    materialize the full span (gap-splitting) and must still match the
    fan-out result exactly."""
    base = np.datetime64("2020-01-01T00:00:00", "us")
    hours = np.array([0, 1, 2, 1_000_000, 1_000_005], dtype=np.int64)
    tbl = pa.table({
        "k": pa.array(["x"] * 5),
        "ts": pa.array(base + (hours * 3600).astype("timedelta64[s]")
                       .astype("timedelta64[us]")),
        "v": pa.array([10, 20, 30, 40, 50], pa.int64()),
    })
    kw = dict(ts_col="ts", key_col="k", value_col="v",
              unit_us=3_600_000_000, size_units=24,
              aggs=["sum", "min", "max"])
    dense = windows.sliding_agg_dense(
        rd.from_arrow(tbl), **kw
    ).to_pandas().sort_values("window").reset_index(drop=True)
    fan = windows.sliding_agg(
        rd.from_arrow(tbl), **kw
    ).to_pandas().sort_values("window").reset_index(drop=True)
    fan = fan[dense.columns]
    pd.testing.assert_frame_equal(dense, fan, check_dtype=False)
    # windows exist only near the two clusters, never across the gap
    u0 = int(base.astype(np.int64) // 3_600_000_000)  # epoch-hour of base
    w = dense["window"].to_numpy() - u0
    assert ((w <= 2) | (w >= 1_000_000 - 23)).all()


# --- QuantileSketch (deterministic mergeable compactor stack) -------------


def _rank_window(sorted_vals, est):
    lt = int(np.searchsorted(sorted_vals, est, side="left"))
    le = int(np.searchsorted(sorted_vals, est, side="right"))
    return lt, le


def test_quantile_sketch_bound_holds():
    rng = np.random.default_rng(7)
    v = np.round(rng.lognormal(3, 1, 150_000) * 100)
    sk = sketch.QuantileSketch.from_values(v, capacity=512)
    assert sk.n == len(v)
    assert sk.err <= 2 * len(v) // 512 + 512  # ~2N/c
    sv = np.sort(v)
    for q in (0.01, 0.25, 0.5, 0.75, 0.9, 0.99):
        est = sk.query([q])[0]
        k = max(int(np.ceil(q * sk.n)), 1)
        lt, le = _rank_window(sv, est)
        assert lt < k + sk.err and le >= k - sk.err, q


def test_quantile_sketch_merge_order_invariant_bound():
    rng = np.random.default_rng(3)
    v = rng.normal(0, 1000, 80_000).round()
    sv = np.sort(v)
    chunks = np.array_split(v, 23)
    for perm_seed in (0, 1):
        order = np.random.default_rng(perm_seed).permutation(len(chunks))
        m = None
        for i in order:
            s = sketch.QuantileSketch.from_values(chunks[i], capacity=256)
            m = s if m is None else m.merge(s)
        assert m.n == len(v)  # weight exactly preserved through merges
        for q in (0.1, 0.5, 0.9):
            est = m.query([q])[0]
            k = max(int(np.ceil(q * m.n)), 1)
            lt, le = _rank_window(sv, est)
            assert lt < k + m.err and le >= k - m.err


def test_quantile_sketch_serialization_roundtrip():
    v = np.arange(10_000, dtype=np.float64)
    sk = sketch.QuantileSketch.from_values(v, capacity=128)
    rt = sketch.QuantileSketch.from_bytes(sk.to_bytes())
    assert rt.n == sk.n and rt.err == sk.err and rt.capacity == sk.capacity
    assert all(np.array_equal(a, b) for a, b in zip(rt.levels, sk.levels))
    assert np.array_equal(rt.query([0.25, 0.5, 0.99]), sk.query([0.25, 0.5, 0.99]))


def test_quantile_sketch_small_exact():
    # below capacity the sketch never compacts: err == 0, quantiles exact
    v = np.array([5.0, 1.0, 9.0, 3.0, 7.0])
    sk = sketch.QuantileSketch.from_values(v, capacity=16)
    assert sk.err == 0
    assert sk.query([0.5])[0] == 5.0
    assert sk.query([0.2])[0] == 1.0
    assert sk.query([1.0])[0] == 9.0


def test_grouped_approx_quantiles_vs_exact(ray_session):
    rng = np.random.default_rng(11)
    n = 60_000
    key = rng.integers(0, 4, n)
    val = np.round(rng.lognormal(4, 0.7, n) * 100)
    ds = rd.from_arrow(pa.table({"k": key, "v": val})).repartition(8)
    out = sketch.grouped_approx_quantiles(
        ds, ["k"], "v", qs=[0.25, 0.5, 0.9], capacity=256, n_buckets=4
    ).to_pandas().set_index("k")
    df = pd.DataFrame({"k": key, "v": val})
    for k_val, grp in df.groupby("k"):
        sv = np.sort(grp["v"].to_numpy())
        row = out.loc[k_val]
        assert int(row["n"]) == len(sv)
        for q, lab in ((0.25, "p25"), (0.5, "p50"), (0.9, "p90")):
            kk = max(int(np.ceil(q * len(sv))), 1)
            lt, le = _rank_window(sv, row[lab])
            assert lt < kk + row["err"] and le >= kk - row["err"], (k_val, q)


def test_mulrot64_matches_sql_mirror():
    import duckdb

    from zen3geo_ray.functions.hashing import mulrot64, sql_mulrot_ctes

    rng = np.random.default_rng(9)
    xs = np.concatenate([
        rng.integers(0, 1 << 63, 500).astype(np.uint64) * np.uint64(2)
        + rng.integers(0, 2, 500).astype(np.uint64),  # full 64-bit range
        np.array([0, 1, (1 << 64) - 1], dtype=np.uint64),
    ])
    want = [int(v) for v in mulrot64(xs)]
    # pass exact values via HUGEINT literals; fetch via fetchall —
    # fetchdf() would round HUGEINT columns through float64
    vals = ", ".join(f"({i}, {int(v)}::HUGEINT)" for i, v in enumerate(xs))
    sql = (f"WITH src AS (SELECT * FROM (VALUES {vals}) AS s(i, x)), "
           + sql_mulrot_ctes("src", "i", "x")
           + " SELECT h FROM mh ORDER BY i")
    got = [int(r[0]) for r in duckdb.sql(sql).fetchall()]
    assert got == want


def test_hll_accuracy_mulrot_and_small_p():
    from zen3geo_ray.functions.hashing import mulrot64

    rng = np.random.default_rng(4)
    for true_n in (5_000, 200_000):
        vals = rng.integers(0, 1 << 60, true_n).astype(np.uint64)
        est = sketch.hll_estimate(sketch.hll_from_hashes(mulrot64(vals)))
        assert est == pytest.approx(true_n, rel=0.06)
    # p=6 (the oracle query's size): looser envelope, still sane
    vals = rng.integers(0, 1 << 60, 20_000).astype(np.uint64)
    est = sketch.hll_estimate(
        sketch.hll_from_hashes(mulrot64(vals), 6))
    assert est == pytest.approx(20_000, rel=0.45)


def test_hll_estimate_exact_rational_determinism():
    # same registers in any storage order -> bit-identical estimate
    rng = np.random.default_rng(6)
    regs = rng.integers(0, 20, 1 << 12).astype(np.uint8)
    a = sketch.hll_estimate(regs)
    # merging with itself (max) changes nothing
    assert sketch.hll_estimate(sketch.hll_merge(regs, regs)) == a
    # linear-counting branch fires with zeros present and tiny load
    regs2 = np.zeros(64, dtype=np.uint8)
    regs2[:10] = 1
    est2 = sketch.hll_estimate(regs2)
    import math

    assert est2 == 64.0 * math.log(64.0 / 54.0)


def test_cms_never_underestimates_and_is_block_invariant(ray_session):
    from zen3geo_ray.stages.sketch import (cms_estimate, cms_from_values,
                                           count_min)

    rng = np.random.default_rng(12)
    vals = rng.zipf(1.4, 50_000)
    vals = vals[vals < 10_000].astype(np.int64)
    tbl = pa.table({"v": vals})
    cms = count_min(rd.from_arrow(tbl).repartition(9), "v", d=4, w_bits=10)
    # block-split invariance: distributed merge == single-pass sketch
    assert np.array_equal(cms, cms_from_values(vals, 4, 10))
    uniq, counts = np.unique(vals, return_counts=True)
    est = cms_estimate(cms, uniq, 10)
    assert (est >= counts).all()  # the CMS guarantee
    # heavy keys estimate near-exactly at this load factor
    top = np.argsort(-counts)[:20]
    assert (est[top] - counts[top] <= counts[top] * 0.1 + 50).all()


def test_cms_empty_input(ray_session):
    from zen3geo_ray.stages.sketch import count_min

    empty = pa.table({"v": pa.array([], pa.int64())})
    cms = count_min(rd.from_arrow(empty), "v", d=4, w_bits=6)
    assert cms.shape == (4, 64) and cms.sum() == 0


def test_cusum_changepoint_reference(ray_session):
    """Planted mean shift: key 1 jumps from ~0 to ~100 at position 21
    — cp_i must land on the boundary; straight-line argmax parity on
    every key (ties -> smallest i)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages.windows import cusum_changepoint

    rng = np.random.default_rng(13)
    rows = []
    for key in range(6):
        n = int(rng.integers(5, 40))
        v = rng.integers(-3, 4, n)
        if key == 1:
            n = 40
            v = np.concatenate([rng.integers(-2, 3, 20),
                                100 + rng.integers(-2, 3, 20)])
        for i, x in enumerate(v):
            rows.append((key, i, int(x)))
    t = pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "o": pa.array([r[1] for r in rows], pa.int64()),
        "v": pa.array([r[2] for r in rows], pa.int64()),
    })
    out = cusum_changepoint(rd.from_arrow(t).repartition(4), "k", ["o"],
                            "v", id_col="o", n_buckets=3).to_pandas()
    got = {int(r.k): (int(r.n), int(r.cp_i), int(r.g_max))
           for r in out.itertuples()}
    # straight-line reference
    import collections
    byk = collections.defaultdict(list)
    for k, o, v in rows:
        byk[k].append((o, v))
    for k, seq in byk.items():
        seq.sort()
        vals = [v for _, v in seq]
        n = len(vals)
        tot = sum(vals)
        best, bi = -1, None
        s = 0
        for i, v in enumerate(vals, 1):
            s += v
            gv = abs(n * s - i * tot)
            if gv > best:
                best, bi = gv, i
        assert got[k] == (n, bi, best), k
    # the planted shift is found at the boundary
    assert got[1][1] == 20


def test_interval_union_length_reference(ray_session):
    """Merged coverage vs a straight-line sweep, with nested,
    overlapping, touching, and disjoint intervals crossing blocks."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages.windows import interval_union_length

    rng = np.random.default_rng(7)
    rows = []
    for k in range(5):
        n = int(rng.integers(3, 30))
        s = rng.integers(0, 1000, n)
        ln = rng.integers(1, 200, n)
        rows += [(k, int(a), int(a + b)) for a, b in zip(s, ln)]
    rows += [(9, 0, 10), (9, 10, 20), (9, 5, 7), (9, 50, 60)]
    t = pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "s": pa.array([r[1] for r in rows], pa.int64()),
        "e": pa.array([r[2] for r in rows], pa.int64()),
    })
    out = interval_union_length(rd.from_arrow(t).repartition(4),
                                "k", "s", "e", n_buckets=3).to_pandas()
    got = {int(r.k): (int(r.n_iv), int(r.covered))
           for r in out.itertuples()}

    import collections
    byk = collections.defaultdict(list)
    for k, s, e in rows:
        byk[k].append((s, e))
    for k, ivs in byk.items():
        ivs.sort()
        cov, hi = 0, -1
        for s, e in ivs:
            if s > hi:
                cov += e - s
                hi = e
            elif e > hi:
                cov += e - hi
                hi = e
        assert got[k] == (len(ivs), cov), k
    assert got[9] == (4, 30)  # touching merges, nested absorbs


def test_kmv_exact_below_k(ray_session):
    import ray.data as rd

    from zen3geo_ray.stages.sketch import kmv_distinct

    t = pa.table({"g": pa.array(["a"] * 40 + ["b"] * 10),
                  "v": pa.array(list(range(20)) * 2 + list(range(5)) * 2,
                                pa.int64())})
    out = kmv_distinct(rd.from_arrow(t).repartition(3), ["g"], "v",
                       k=64).to_pandas().sort_values("g")
    # below k: exact distinct counts, est == n_kept
    assert out.n_kept.tolist() == [20, 5]
    assert out.est.tolist() == [20.0, 5.0]


def test_kmv_estimate_envelope(ray_session):
    import ray.data as rd

    from zen3geo_ray.stages.sketch import kmv_distinct

    n = 20_000
    t = pa.table({"g": pa.array(["x"] * n),
                  "v": pa.array(np.arange(n, dtype=np.int64))})
    k = 256
    out = kmv_distinct(rd.from_arrow(t).repartition(8), ["g"], "v",
                       k=k).to_pandas().iloc[0]
    assert int(out.n_kept) == k
    # KMV relative error ~ 1/sqrt(k-2) ~ 6%; allow 4 sigma
    assert abs(float(out.est) - n) / n < 0.25
    # mergeability: one block must give the identical sketch
    one = kmv_distinct(rd.from_arrow(t).repartition(1), ["g"], "v",
                       k=k).to_pandas().iloc[0]
    assert one.kth == out.kth and one.est == out.est


def test_benford_golden(ray_session):
    import ray.data as rd

    from zen3geo_ray.stages.profile import BENFORD_P, benford_profile

    # 100, 2xx, 9xxx -> digits 1, 2, 9; zeros and negatives drop
    t = pa.table({"v": pa.array([100, 250, 299, 9001, 0, -7], pa.int64())})
    out = benford_profile(rd.from_arrow(t).repartition(2),
                          "v").to_pandas()
    assert out.digit.tolist() == [1, 2, 9]
    assert out.obs.tolist() == [1, 2, 1]
    assert out.exp.tolist() == [4 * BENFORD_P[0], 4 * BENFORD_P[1],
                                4 * BENFORD_P[8]]
    e = 4 * BENFORD_P[1]
    assert out.chi2_term.iloc[1] == (2.0 - e) * (2.0 - e) / e


def test_ams_f2_accuracy_and_block_invariance(ray_session):
    # Zipf-ish frequencies: key k appears ~1000//(k+1) times.
    rng = np.random.default_rng(7)
    vals = np.concatenate(
        [np.full(1000 // (k + 1), k, dtype=np.int64) for k in range(200)])
    rng.shuffle(vals)
    exact = int(sum(int(c) ** 2 for c in
                    pd.Series(vals).value_counts().to_numpy()))
    outs = []
    for nblocks in (1, 7):
        ds = rd.from_arrow(pa.table({"v": vals})).repartition(nblocks)
        out = sketch.ams_f2(ds, "v").to_pandas()
        assert int(out["f2_exact"][0]) == exact
        outs.append(int(out["f2_est"][0]))
    # merged sketch is block-boundary invariant
    assert outs[0] == outs[1]
    # median-of-means within ~3x sqrt(2/per) relative error envelope
    assert abs(outs[0] - exact) <= 1.5 * exact
