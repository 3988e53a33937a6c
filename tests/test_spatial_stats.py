"""Spatial statistics (Moran's I / Geary's C / Gi* / semivariogram)
against brute-force references on tiny grids."""

import math

import numpy as np
import pyarrow as pa
import pytest


def _cells_ds(cells, repartition=3):
    import ray.data as rd

    t = pa.table({"cell": pa.array(np.asarray(cells, dtype=np.int64))})
    return rd.from_arrow(t).repartition(repartition)


def _brute(cells):
    """(sorted unique cells, counts)"""
    u, c = np.unique(np.asarray(cells, dtype=np.int64), return_counts=True)
    return u, c.astype(np.int64)


def _rook_w(u, res):
    from zen3geo_ray.geom.cells import _grid_dims

    nc, nr = _grid_dims(res)
    s = set(u.tolist())
    pairs = []
    for cell in u.tolist():
        x, y = cell % nc, cell // nc
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            if 0 <= x + dx < nc and 0 <= y + dy < nr:
                nb = cell + dy * nc + dx
                if nb in s:
                    pairs.append((cell, nb))
    return pairs  # ordered (both directions)


RES = 2  # 8 x 4 grid


def test_morans_i_brute(ray_session):
    from zen3geo_ray.stages.spatial_stats import morans_i

    rng = np.random.default_rng(7)
    cells = rng.integers(0, 32, size=400)
    out = morans_i(_cells_ds(cells), res=RES, n_buckets=2).to_pandas()
    u, x = _brute(cells)
    pairs = _rook_w(u, RES)
    idx = {c: i for i, c in enumerate(u.tolist())}
    n, w = len(u), len(pairs)
    xb = x.mean()
    z = x - xb
    num = sum(z[idx[a]] * z[idx[b]] for a, b in pairs)
    den = (z * z).sum()
    assert int(out.n_cells.iloc[0]) == n
    assert int(out.w_pairs.iloc[0]) == w
    assert out.moran_i.iloc[0] == pytest.approx(n / w * num / den, rel=1e-12)
    dd = sum((x[idx[a]] - x[idx[b]]) ** 2 for a, b in pairs)
    assert out.geary_c.iloc[0] == pytest.approx(
        (n - 1) * dd / (2 * w * den), rel=1e-12)


def test_morans_i_checkerboard_negative(ray_session):
    """A perfect checkerboard is maximal negative autocorrelation."""
    from zen3geo_ray.stages.spatial_stats import morans_i

    cells = []
    for cell in range(32):
        x, y = cell % 8, cell // 8
        cells.extend([cell] * (3 if (x + y) % 2 == 0 else 1))
    out = morans_i(_cells_ds(cells), res=RES, n_buckets=2).to_pandas()
    assert out.moran_i.iloc[0] == -1.0
    assert out.geary_c.iloc[0] > 1.0  # dissimilar neighbors


def test_getis_ord_brute(ray_session):
    from zen3geo_ray.stages.spatial_stats import getis_ord_g

    rng = np.random.default_rng(11)
    cells = rng.integers(0, 32, size=300)
    out = getis_ord_g(_cells_ds(cells), res=RES, n_buckets=2).to_pandas()
    u, x = _brute(cells)
    assert list(out.cell) == u.tolist()
    n, s = len(u), int(x.sum())
    q2 = int((x.astype(object) * x).sum())
    idx = {c: i for i, c in enumerate(u.tolist())}
    for r in out.itertuples():
        nb = [b for a, b in _rook_w(u, RES) if a == r.cell]
        wi, li = 1 + len(nb), int(x[idx[r.cell]]) + sum(
            int(x[idx[b]]) for b in nb)
        assert (int(r.wi), int(r.li)) == (wi, li)
        xb, s2 = s / n, q2 / n - (s / n) ** 2
        expect = (li - xb * wi) / math.sqrt(
            s2 * (n * wi - wi * wi) / (n - 1))
        assert r.gi == pytest.approx(expect, rel=1e-9)


def test_semivariogram_brute(ray_session):
    from zen3geo_ray.geom.cells import _grid_dims
    from zen3geo_ray.stages.spatial_stats import semivariogram

    rng = np.random.default_rng(3)
    cells = rng.integers(0, 32, size=500)
    out = semivariogram(_cells_ds(cells), res=RES, max_lag=2,
                        n_buckets=2).to_pandas()
    u, x = _brute(cells)
    nc, nr = _grid_dims(RES)
    idx = {c: i for i, c in enumerate(u.tolist())}
    for h in (1, 2):
        n_h, ssd = 0, 0
        for i, a in enumerate(u.tolist()):
            ax, ay = a % nc, a // nc
            for j, b in enumerate(u.tolist()):
                if j <= i:
                    continue
                bx, by = b % nc, b // nc
                if max(abs(ax - bx), abs(ay - by)) == h:
                    n_h += 1
                    ssd += int(x[i] - x[j]) ** 2
        row = out[out.h == h].iloc[0]
        assert (int(row.n_pairs), int(row.ssd)) == (n_h, ssd)
        assert row.gamma == ssd / (2 * n_h)


def test_dissolve_stats_golden(ray_session):
    """2x2 block -> perimeter 8, squareness exactly 1.0; diagonal pair
    -> no adjacency, squareness 0.5."""
    from zen3geo_ray.stages.spatial_stats import dissolve_stats

    # res 2 grid is 8x4; cell = ny*8 + nx
    block = [0, 1, 8, 9]          # (0,0),(1,0),(0,1),(1,1)
    diag = [3, 12]                # (3,0),(4,1) — not rook-adjacent
    t = pa.table({
        "g": pa.array(["a"] * 8 + ["b"] * 2),
        "cell": pa.array(np.array(block * 2 + diag, dtype=np.int64)),
    })
    import ray.data as rd

    out = dissolve_stats(rd.from_arrow(t).repartition(3), res=RES,
                         group_col="g", n_buckets=2).to_pandas() \
        .set_index("g")
    assert (int(out.loc["a", "area"]), int(out.loc["a", "adj_pairs"]),
            int(out.loc["a", "perimeter"])) == (4, 4, 8)
    assert out.loc["a", "squareness"] == 1.0
    assert (int(out.loc["b", "area"]), int(out.loc["b", "adj_pairs"]),
            int(out.loc["b", "perimeter"])) == (2, 0, 8)
    assert out.loc["b", "squareness"] == 0.5


def test_idw_fill_golden(ray_session):
    """Single known cell: the disk around it fills with est == its
    value; occupied cells are excluded; weights follow 2^20 // d2."""
    from zen3geo_ray.stages.spatial_stats import idw_fill

    # cell 9 = (1,1) on the 8x4 res-2 grid, count 5
    t = pa.table({"cell": pa.array([9] * 5, pa.int64())})
    import ray.data as rd

    out = idw_fill(rd.from_arrow(t), res=RES, radius=1,
                   n_buckets=2).to_pandas().set_index("cell")
    # all 8 ring-1 neighbors in-grid, none occupied
    assert sorted(out.index) == [0, 1, 2, 8, 10, 16, 17, 18]
    w1, w2 = (1 << 20) // 1, (1 << 20) // 2
    for cell in out.index:
        dx, dy = abs(cell % 8 - 1), abs(cell // 8 - 1)
        wq = w1 if dx + dy == 1 else w2
        r = out.loc[cell]
        assert (int(r.num), int(r.den)) == (5 * wq, wq)
        assert r.est == 5.0


def test_idw_fill_two_sources(ray_session):
    """Midpoint between two unequal sources weights by 1/d^2."""
    from zen3geo_ray.stages.spatial_stats import idw_fill

    # (1,1)=cell 9 count 2 and (5,1)=cell 13 count 10; target (3,1)=11
    t = pa.table({"cell": pa.array([9] * 2 + [13] * 10, pa.int64())})
    import ray.data as rd

    out = idw_fill(rd.from_arrow(t).repartition(2), res=RES, radius=2,
                   n_buckets=2).to_pandas().set_index("cell")
    w4 = (1 << 20) // 4  # both sources at d2 = 4
    r = out.loc[11]
    assert (int(r.num), int(r.den)) == (w4 * 2 + w4 * 10, 2 * w4)
    assert r.est == 6.0


def test_ripley_k_brute(ray_session):
    from zen3geo_ray.geom.cells import _grid_dims
    from zen3geo_ray.stages.spatial_stats import ripley_k

    rng = np.random.default_rng(19)
    cells = rng.integers(0, 32, size=250)
    out = ripley_k(_cells_ds(cells), res=RES, max_lag=2,
                   n_buckets=2).to_pandas().set_index("h")
    u, x = _brute(cells)
    nc, nr = _grid_dims(RES)
    n = int(x.sum())
    for h in (1, 2):
        pairs = int((x * (x - 1)).sum())
        for i, a in enumerate(u.tolist()):
            for j, b in enumerate(u.tolist()):
                if i == j:
                    continue
                d = max(abs(a % nc - b % nc), abs(a // nc - b // nc))
                if d <= h:
                    pairs += int(x[i]) * int(x[j])
        assert int(out.loc[h, "pairs"]) == pairs
        assert out.loc[h, "k"] == float(32 * pairs) / float(n * n)


def test_dispersion_index(ray_session):
    from zen3geo_ray.stages.spatial_stats import dispersion_index

    # uniform 1 per cell over the whole 8x4 grid -> variance 0
    out = dispersion_index(_cells_ds(list(range(32))), res=RES,
                           n_buckets=2).to_pandas().iloc[0]
    assert (int(out.m_cells), int(out.n_points)) == (32, 32)
    assert out.vmr == 0.0 and out.chi2 == 0.0

    # everything in ONE cell -> maximal clustering: vmr = (M-n... )
    out2 = dispersion_index(_cells_ds([5] * 64), res=RES,
                            n_buckets=2).to_pandas().iloc[0]
    n, m = 64, 32
    q2 = n * n
    want = m * (m * q2 - n * n) / (n * m * (m - 1))
    assert out2.vmr == want and out2.chi2 == (m - 1) * want


def test_proximity_golden(ray_session):
    """Single occupied cell at (2,1): ring distance fills outward."""
    from zen3geo_ray.stages.spatial_stats import proximity

    t = pa.table({"cell": pa.array([10] * 3, pa.int64())})  # (2,1)
    import ray.data as rd

    out = proximity(rd.from_arrow(t), res=RES, max_dist=2,
                    n_buckets=2).to_pandas().set_index("cell")
    assert 10 not in out.index  # occupied cells never emitted
    # ring 1 cells around (2,1)
    for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1), (1, 1), (-1, -1),
                   (1, -1), (-1, 1)):
        assert int(out.loc[10 + dy * 8 + dx, "dist"]) == 1
    # a ring-2 example: (4,1) = 12
    assert int(out.loc[12, "dist"]) == 2
    # beyond max_dist: (5,1) = 13 absent
    assert 13 not in out.index


def test_colocation_golden(ray_session):
    """Two adjacent 'a' cells, one 'b' neighbor; majority rule applies
    within a cell (count desc, mark asc tie)."""
    from zen3geo_ray.stages.spatial_stats import colocation_counts

    rows = (
        [(0, "a")] * 3 + [(0, "b")] * 1      # cell 0 majority a
        + [(1, "a")] * 2 + [(1, "b")] * 2    # cell 1 tie -> a (asc)
        + [(2, "b")] * 4                     # cell 2 majority b
    )
    t = pa.table({"cell": pa.array([c for c, _ in rows], pa.int64()),
                  "lang": pa.array([m for _, m in rows])})
    import ray.data as rd

    out = colocation_counts(rd.from_arrow(t).repartition(3), res=RES,
                            mark_col="lang", n_buckets=2).to_pandas()
    got = {(r.ma, r.mb): int(r.n_pairs) for r in out.itertuples()}
    # adjacencies: 0-1 (a,a), 1-2 (a,b)
    assert got == {("a", "a"): 1, ("a", "b"): 1}


def test_local_moran_brute(ray_session):
    """LISA per cell vs the textbook z-form; sum of LISA relates to
    global Moran (sum num == n^2 * global num identity checked via
    signs)."""
    from zen3geo_ray.stages.spatial_stats import local_moran

    rng = np.random.default_rng(23)
    cells = rng.integers(0, 32, size=400)
    out = local_moran(_cells_ds(cells), res=RES,
                      n_buckets=2).to_pandas().set_index("cell")
    u, x = _brute(cells)
    n, s = len(u), int(x.sum())
    q2 = int((x.astype(object) * x).sum())
    idx = {c: i for i, c in enumerate(u.tolist())}
    xb = s / n
    m2 = (q2 / n) - xb * xb
    for cell in u.tolist():
        nb = [b for a, b in _rook_w(u, RES) if a == cell]
        lsum = sum(int(x[idx[b]]) for b in nb)
        k = len(nb)
        want = ((x[idx[cell]] - xb)
                * (lsum - xb * k)) / m2
        r = out.loc[cell]
        assert (int(r.k)) == k
        assert r.lisa == pytest.approx(want, rel=1e-9)


def test_emerging_hotspots_store(ray_session, tmp_path):
    """Run 1 seeds the store; run 2 merges — a cell that only becomes
    hot after the merge is 'new'; re-running getis on the merged data
    directly agrees with gi_new."""
    from zen3geo_ray.stages.spatial_stats import (
        emerging_hotspots,
        getis_ord_g,
    )

    store = str(tmp_path / "store")
    # run 1: diffuse background, one mild bump at cell 9
    run1 = [c for c in range(32)] + [9] * 4
    out1 = emerging_hotspots(_cells_ds(run1), store, res=RES,
                             n_buckets=2).to_pandas()
    assert (out1.status.isin(("new",))).all()  # first run: no history
    # run 2: big spike at cell 20
    run2 = [20] * 40
    out2 = emerging_hotspots(_cells_ds(run2), store, res=RES,
                             n_buckets=2).to_pandas().set_index("cell")
    assert out2.loc[20, "status"] == "new"
    # gi_new agrees with a direct Gi* over the merged counts
    merged = run1 + run2
    direct = getis_ord_g(_cells_ds(merged), res=RES,
                         n_buckets=2).to_pandas().set_index("cell")
    for cell in out2.index:
        assert out2.loc[cell, "gi_new"] == direct.loc[cell, "gi"]
    # the store now carries both runs
    import pyarrow.parquet as pq
    import glob
    tot = sum(sum(pq.read_table(f).column("x").to_pylist())
              for f in glob.glob(store + "/*.parquet"))
    assert tot == len(run1) + len(run2)


def test_temporal_gi_burst(ray_session):
    """A planted burst hour scores highest; gap bins break the
    neighborhood."""
    from zen3geo_ray.stages.spatial_stats import temporal_gi

    h = 3_600_000_000
    ts = []
    for b in range(10):
        ts += [b * h + 7] * (50 if b == 4 else 5)  # burst at bin 4
    t = pa.table({"ts": pa.array(np.array(ts, dtype=np.int64),
                                 pa.timestamp("us"))})
    import ray.data as rd

    out = temporal_gi(rd.from_arrow(t).repartition(3), bin_us=h,
                      n_buckets=2).to_pandas().set_index("bin")
    assert len(out) == 10
    assert (out.loc[4, "wi"], out.loc[4, "li"]) == (3, 60)
    assert out.gi.idxmax() in (3, 4, 5)
    assert out.loc[4, "gi"] > 1.0


def test_lisa_sums_to_global_moran(ray_session):
    """Cross-op identity: sum of LISA integer numerators equals the
    global Moran numerator (both over z' = n*x - S), and both dens
    agree — pins the two implementations against each other."""
    from zen3geo_ray.stages.spatial_stats import local_moran, morans_i

    rng = np.random.default_rng(41)
    cells = rng.integers(0, 32, size=600)
    ds = _cells_ds(cells)
    li = local_moran(ds, res=RES, n_buckets=2).to_pandas()
    mo = morans_i(ds, res=RES, n_buckets=2).to_pandas().iloc[0]
    u, x = _brute(cells)
    n, s = len(u), int(x.sum())
    q2 = int((x.astype(object) * x).sum())
    den = n * n * q2 - n * s * s
    # morans_i reports I = n*num/(W*den); reconstruct num
    got_moran_num = mo.moran_i * mo.w_pairs * den / n
    assert int(li.num.sum()) == pytest.approx(got_moran_num, rel=1e-9)


def test_proximity_label_tie(ray_session):
    """Equidistant sources: smallest source cell id wins."""
    from zen3geo_ray.stages.spatial_stats import proximity_label

    # sources at (1,1)=9 and (5,1)=13; (3,1)=11 is ring-2 from both
    t = pa.table({"cell": pa.array([9, 13], pa.int64())})
    import ray.data as rd

    out = proximity_label(rd.from_arrow(t), res=RES, max_dist=2,
                          n_buckets=2).to_pandas().set_index("cell")
    assert (int(out.loc[11, "dist"]), int(out.loc[11, "nearest"])) \
        == (2, 9)
    # adjacent to 13 only
    assert (int(out.loc[14, "dist"]), int(out.loc[14, "nearest"])) \
        == (1, 13)
    # a closer ring always beats a smaller id farther away:
    # (2,1)=10 is ring-1 from 9 -> dist 1 nearest 9
    assert (int(out.loc[10, "dist"]), int(out.loc[10, "nearest"])) \
        == (1, 9)


def test_morans_i_weighted(ray_session):
    """value_col sums replace counts; equal weights reduce to the
    count statistic scaled consistently."""
    import ray.data as rd

    from zen3geo_ray.stages.spatial_stats import morans_i

    rng = np.random.default_rng(29)
    cells = rng.integers(0, 32, size=200)
    vals = rng.integers(1, 50, size=200)
    t = pa.table({"cell": pa.array(cells.astype(np.int64)),
                  "v": pa.array(vals.astype(np.int64))})
    ds = rd.from_arrow(t).repartition(3)
    out = morans_i(ds, res=RES, value_col="v",
                   n_buckets=2).to_pandas().iloc[0]
    # brute force over per-cell value sums
    u = np.unique(cells)
    x = np.array([int(vals[cells == c].sum()) for c in u])
    pairs = _rook_w(u, RES)
    idx = {c: i for i, c in enumerate(u.tolist())}
    z = x - x.mean()
    num = sum(z[idx[a]] * z[idx[b]] for a, b in pairs)
    den = (z * z).sum()
    want = len(u) / len(pairs) * num / den
    assert out.moran_i == pytest.approx(want, rel=1e-12)

    # all-ones weights == plain counts
    t1 = pa.table({"cell": pa.array(cells.astype(np.int64)),
                   "v": pa.array(np.ones(200, np.int64))})
    a = morans_i(rd.from_arrow(t1), res=RES, value_col="v",
                 n_buckets=2).to_pandas().iloc[0]
    b = morans_i(_cells_ds(cells), res=RES,
                 n_buckets=2).to_pandas().iloc[0]
    assert a.moran_i == b.moran_i and a.geary_c == b.geary_c


def test_join_counts_brute(ray_session):
    from zen3geo_ray.stages.spatial_stats import join_count_stats

    rng = np.random.default_rng(31)
    cells = rng.integers(0, 32, size=300)
    out = join_count_stats(_cells_ds(cells), res=RES,
                           n_buckets=2).to_pandas().iloc[0]
    u, x = _brute(cells)
    pairs = _rook_w(u, RES)
    n, s = len(u), int(x.sum())
    black = {c: (n * int(v) > s) for c, v in zip(u.tolist(), x.tolist())}
    # directed-once = half the ordered pairs
    bb = sum(black[a] and black[b] for a, b in pairs) // 2
    ww = sum((not black[a]) and (not black[b]) for a, b in pairs) // 2
    bw = sum(black[a] != black[b] for a, b in pairs) // 2
    nb = sum(black.values())
    assert int(out.n_cells) == n
    assert int(out.n_black) == nb
    assert int(out.w_pairs) == len(pairs)
    assert (int(out.bb), int(out.ww), int(out.bw)) == (bb, ww, bw)
    assert int(out.bb) + int(out.ww) + int(out.bw) == len(pairs) // 2
    assert out.e_bb == pytest.approx(
        len(pairs) / 2 * nb * (nb - 1) / (n * (n - 1)), rel=1e-12)


def test_join_counts_checkerboard_all_bw(ray_session):
    """Alternating high/low occupancy -> every adjacent pair is mixed."""
    from zen3geo_ray.stages.spatial_stats import join_count_stats

    cells = []
    for c in range(32):  # full 8x4 grid, checkerboard 3-vs-1 counts
        x, y = c % 8, c // 8
        cells.extend([c] * (3 if (x + y) % 2 == 0 else 1))
    out = join_count_stats(_cells_ds(cells), res=RES,
                           n_buckets=2).to_pandas().iloc[0]
    assert int(out.bb) == 0 and int(out.ww) == 0
    assert int(out.bw) == int(out.w_pairs) // 2


def test_eb_rates_golden(ray_session):
    import ray.data as rd

    from zen3geo_ray.stages.spatial_stats import eb_rates

    t = pa.table({"cell": pa.array([0, 0, 0, 5, 5, 9], pa.int64()),
                  "v": pa.array([10, 20, 30, 100, 200, 6], pa.int64())})
    out = eb_rates(rd.from_arrow(t).repartition(2), res=RES,
                   value_col="v", m=2).to_pandas()
    assert out.cell.tolist() == [0, 5, 9]
    assert out.x.tolist() == [3, 2, 1]
    assert out.v.tolist() == [60, 300, 6]
    theta = 366.0 / 6.0  # global rate
    assert out.raw.tolist() == [20.0, 150.0, 6.0]
    want = [(60.0 + 2 * theta) / 5.0, (300.0 + 2 * theta) / 4.0,
            (6.0 + 2 * theta) / 3.0]
    assert out.smoothed.tolist() == pytest.approx(want, rel=1e-12)
    # shrinkage: low-count cell pulled hardest toward theta
    pull = np.abs(out.smoothed.to_numpy() - out.raw.to_numpy())
    assert pull[2] > pull[0]


def test_mann_kendall_goldens(ray_session):
    import math

    import ray.data as rd

    from zen3geo_ray.stages.spatial_stats import mann_kendall

    # cell 0: strictly increasing counts 1,2,3 over bins -> S = +3
    # cell 5: all-equal counts (ties) -> S = 0, var18 = 0, z null
    rows_c, rows_b = [], []
    for b, reps in ((0, 1), (1, 2), (2, 3)):
        rows_c += [0] * reps
        rows_b += [b] * reps
    for b in (0, 1, 2):
        rows_c += [5] * 2
        rows_b += [b] * 2
    t = pa.table({"cell": pa.array(rows_c, pa.int64()),
                  "bin": pa.array(rows_b, pa.int64())})
    out = mann_kendall(rd.from_arrow(t).repartition(3),
                       n_buckets=2).to_pandas().sort_values("cell")
    r0 = out[out.cell == 0].iloc[0]
    assert (int(r0.t_bins), int(r0.s_stat)) == (3, 3)
    # T=3, no ties: var18 = 3*2*11 = 66; z = (3-1)/sqrt(66/18)
    assert int(r0.var18) == 66
    assert r0.z == 2.0 / math.sqrt(66.0 / 18.0)
    r5 = out[out.cell == 5].iloc[0]
    assert (int(r5.s_stat), int(r5.var18)) == (0, 0)
    assert np.isnan(r5.z)


def test_theil_sen_goldens(ray_session):
    import ray.data as rd

    from zen3geo_ray.stages.spatial_stats import THEIL_SCALE, theil_sen

    # cell 0: counts 1,2,4 at bins 0,1,3 -> pair slopes 1, 1, 1 ->
    # median slope exactly 1.0.  cell 5: counts 2,1 at bins 0,3 ->
    # one pair, slope -1/3: floor(-2^20/3) = -349526 (floor, not
    # trunc — pins the negative-numerator convention).  cell 9: one
    # occupied bin -> no pairs -> dropped.
    rows_c, rows_b = [], []
    for b, reps in ((0, 1), (1, 2), (3, 4)):
        rows_c += [0] * reps
        rows_b += [b] * reps
    rows_c += [5, 5, 5]
    rows_b += [0, 0, 3]
    rows_c += [9]
    rows_b += [7]
    t = pa.table({"cell": pa.array(rows_c, pa.int64()),
                  "bin": pa.array(rows_b, pa.int64())})
    out = theil_sen(rd.from_arrow(t).repartition(3),
                    n_buckets=2).to_pandas().sort_values("cell")
    assert out.cell.tolist() == [0, 5]
    r0 = out[out.cell == 0].iloc[0]
    assert (int(r0.t_bins), int(r0.n_pairs)) == (3, 3)
    assert int(r0.slope_q) == THEIL_SCALE
    assert r0.slope == 1.0
    r5 = out[out.cell == 5].iloc[0]
    assert int(r5.n_pairs) == 1
    assert int(r5.slope_q) == -349526
    assert r5.slope == -349526.0 / float(THEIL_SCALE)


def test_theil_sen_even_pair_lower_median(ray_session):
    import ray.data as rd

    from zen3geo_ray.stages.spatial_stats import THEIL_SCALE, theil_sen

    # 4 bins, counts 1,2,4,8 at bins 0,1,2,3 -> 6 pair slopes (scaled):
    # 1, 3/2, 7/3, 2, 3, 4 -> sorted [1, 1.5, 2, 7/3, 3, 4]; lower
    # median (index (6-1)//2 = 2) = 2.0
    rows_c, rows_b = [], []
    for b, reps in ((0, 1), (1, 2), (2, 4), (3, 8)):
        rows_c += [0] * reps
        rows_b += [b] * reps
    t = pa.table({"cell": pa.array(rows_c, pa.int64()),
                  "bin": pa.array(rows_b, pa.int64())})
    out = theil_sen(rd.from_arrow(t), n_buckets=2).to_pandas().iloc[0]
    assert int(out.n_pairs) == 6
    assert int(out.slope_q) == 2 * THEIL_SCALE


def test_knox_brute(ray_session):
    import itertools

    import ray.data as rd

    from zen3geo_ray.geom.cells import _grid_dims
    from zen3geo_ray.stages.spatial_stats import knox_test

    rng = np.random.default_rng(43)
    n = 150
    cells_v = rng.integers(0, 32, n).astype(np.int64)
    ts = rng.integers(0, 1000, n).astype(np.int64)
    eid = np.arange(n, dtype=np.int64)
    tau = 60
    t = pa.table({"cell": pa.array(cells_v), "tu": pa.array(ts),
                  "eid": pa.array(eid)})
    out = knox_test(rd.from_arrow(t).repartition(3), res=RES,
                    tau_us=tau, n_buckets=2).to_pandas().iloc[0]
    nc, _ = _grid_dims(RES)
    bx, bns, bnt = 0, 0, 0
    for i, j in itertools.combinations(range(n), 2):
        sp = (abs(cells_v[i] % nc - cells_v[j] % nc) <= 1
              and abs(cells_v[i] // nc - cells_v[j] // nc) <= 1)
        tm = abs(int(ts[i]) - int(ts[j])) <= tau
        bns += sp
        bnt += tm
        bx += sp and tm
    assert (int(out.n), int(out.ns), int(out.nt), int(out.x)) \
        == (n, bns, bnt, bx)
    assert out.ex == float(bns * bnt) / float(n * (n - 1) // 2)


def test_regions_via_components_golden(ray_session):
    """4-connectivity labeling: an L-shape region + a diagonal-only
    pair (NOT connected under rook) + a singleton."""
    import ray.data as rd

    from zen3geo_ray.stages.graph import connected_components

    # grid 8x4 (RES=2): occupied {0,1,9} L-shape; {19, 26} diagonal;
    # {31} singleton
    occ = np.array([0, 1, 9, 19, 26, 31], dtype=np.int64)
    nc = 8
    nx, ny = occ % nc, occ // nc
    srcs, dsts = [occ], [occ]
    s = set(occ.tolist())
    for off, ok in ((1, nx < nc - 1), (nc, ny < 4 - 1)):
        for c, good in zip(occ.tolist(), ok.tolist()):
            if good and c + off in s:
                srcs.append(np.array([c], np.int64))
                dsts.append(np.array([c + off], np.int64))
    e = rd.from_arrow(pa.table({"src": pa.array(np.concatenate(srcs)),
                                "dst": pa.array(np.concatenate(dsts))}))
    lab = connected_components(e).to_pandas().sort_values("node")
    comp = dict(zip(lab.node, lab.comp))
    assert comp[0] == comp[1] == comp[9] == 0
    assert comp[19] != comp[26]  # diagonal is NOT 4-connected
    assert comp[31] == 31


def test_flow_accumulation_chain_and_ties(ray_session):
    from zen3geo_ray.stages.spatial_stats import flow_accumulation

    # res=2: 8x4 grid.  Row y=1: cells 8..11 with heights 4,3,2,1 ->
    # a straight drainage chain; (2,2)=18 h3 ties between (3,2)=19 h1
    # (dir 0) and (3,3)=27 h1 (dir 1) -> dir order picks 19.
    cells_ = ([8] * 4 + [9] * 3 + [10] * 2 + [11]
              + [18] * 3 + [19] + [27])
    out = flow_accumulation(_cells_ds(cells_), res=RES, rounds=6) \
        .to_pandas().set_index("cell")
    assert out.loc[8, "flow_to"] == 9 and out.loc[8, "acc"] == 1
    assert out.loc[9, "flow_to"] == 10 and out.loc[9, "acc"] == 2
    assert out.loc[10, "flow_to"] == 11 and out.loc[10, "acc"] == 3
    assert out.loc[11, "flow_to"] == -1 and out.loc[11, "acc"] == 4
    assert out.loc[18, "flow_to"] == 19          # dir-order tiebreak
    assert out.loc[19, "flow_to"] == -1 and out.loc[19, "acc"] == 2
    assert out.loc[27, "flow_to"] == -1 and out.loc[27, "acc"] == 1


def test_watershed_chain_and_basins(ray_session):
    from zen3geo_ray.stages.spatial_stats import watershed_label

    # same DEM as the flowacc golden: chain 8->9->10->11 (one basin of
    # 4 ending at sink 11), 18->19 (basin of 2), 27 isolated (basin 1)
    cells_ = ([8] * 4 + [9] * 3 + [10] * 2 + [11]
              + [18] * 3 + [19] + [27])
    out = watershed_label(_cells_ds(cells_), res=RES,
                          jump_rounds=6).to_pandas().set_index("cell")
    assert out.loc[8, "sink"] == 11 and out.loc[8, "basin_n"] == 4
    assert out.loc[9, "sink"] == 11
    assert out.loc[10, "sink"] == 11
    assert out.loc[11, "sink"] == 11 and out.loc[11, "basin_n"] == 4
    assert out.loc[18, "sink"] == 19 and out.loc[18, "basin_n"] == 2
    assert out.loc[19, "sink"] == 19
    assert out.loc[27, "sink"] == 27 and out.loc[27, "basin_n"] == 1
    # partition invariant: basin sizes sum to the cell count per sink
    assert out.groupby("sink")["basin_n"].first().sum() == len(out)


def test_quadtree_leaves_golden(ray_session):
    from zen3geo_ray.stages.partition import quadtree_leaves

    # res_max=2 (8x4), res_min=1 (4x2).  res-1 cell 0 covers res-2
    # cells {0,1,8,9}; put 5 points there (over cap 4) so those stay
    # res-2 leaves; res-1 cell 3 covers {6,7,14,15}; put 2 points ->
    # one res-1 leaf.
    cells_ = [0, 0, 1, 8, 9, 6, 15]
    out = quadtree_leaves(_cells_ds(cells_), res_max=2, res_min=1,
                          cap=4).to_pandas()
    got = {(int(r.depth), int(r.cell)): int(r.n)
           for r in out.itertuples()}
    assert got == {(2, 0): 2, (2, 1): 1, (2, 8): 1, (2, 9): 1,
                   (1, 3): 2}
    # invariant: leaf sums == point count
    assert out["n"].sum() == len(cells_)


def test_uniformity_chi2_goldens(ray_session):
    import ray.data as rd

    from zen3geo_ray.stages.spatial_stats import uniformity_chi2

    # cell 0: perfectly uniform over 7 dows (2 each, n=14) -> chi2 = 0
    # cell 5: all 6 events in one dow -> i = (7*6-6)^2 + 6*36 = 1512,
    #         chi2 = 1512/42 = 36 (the k-1 * n maximal-concentration
    #         value: (k-1)*n = 36)
    rows_c = [0] * 14 + [5] * 6
    rows_t = list(range(7)) * 2 + [3] * 6
    t = pa.table({"cell": pa.array(rows_c, pa.int64()),
                  "cat": pa.array(rows_t, pa.int64())})
    out = uniformity_chi2(rd.from_arrow(t).repartition(3),
                          n_buckets=2).to_pandas().set_index("cell")
    assert int(out.loc[0, "i_num"]) == 0 and out.loc[0, "chi2"] == 0.0
    assert int(out.loc[5, "n"]) == 6
    assert int(out.loc[5, "i_num"]) == (42 - 6) ** 2 + 6 * 36
    assert out.loc[5, "chi2"] == 36.0


def test_haar_energy_goldens(ray_session):
    import ray.data as rd

    from zen3geo_ray.stages.spatial_stats import haar_energy

    # cell 0: one event at the origin day (global min): v = e_0 ->
    # d_l = [1, 0, ...] at every level -> energy 1 at all levels.
    # cell 5: alternating 2,0,2,0... over days 0..7 (levels=3, W=8):
    # level1 d = [2,2,2,2] -> e=16; a=[2,2,2,2]; level2 d=[0,0] e=0;
    # level3 d=[0] e=0.
    rows = []
    rows += [(0, 100)]
    for day in range(0, 8, 2):
        rows += [(5, 100 + day)] * 2
    t = pa.table({"cell": pa.array([r[0] for r in rows], pa.int64()),
                  "bin": pa.array([r[1] for r in rows], pa.int64())})
    out = haar_energy(rd.from_arrow(t).repartition(3), levels=3,
                      n_buckets=2).to_pandas()
    got = {(int(r.cell), int(r.level)): int(r.energy)
           for r in out.itertuples()}
    assert got == {(0, 1): 1, (0, 2): 1, (0, 3): 1,
                   (5, 1): 16, (5, 2): 0, (5, 3): 0}


def test_haar_energy_parseval(ray_session):
    """Unnormalized-Haar Parseval: sum over levels of energy_l / 2^l
    plus (total)^2 / 2^L equals the time-domain energy Σ v²."""
    import ray.data as rd

    from zen3geo_ray.stages.spatial_stats import haar_energy

    rng = np.random.default_rng(5)
    days = rng.integers(0, 16, 300)
    t = pa.table({"cell": pa.array(np.zeros(300, np.int64)),
                  "bin": pa.array(days.astype(np.int64))})
    out = haar_energy(rd.from_arrow(t).repartition(3), levels=4,
                      n_buckets=2).to_pandas()
    v = np.bincount(days, minlength=16).astype(np.int64)
    lhs = sum(int(r.energy) / (2 ** int(r.level))
              for r in out.itertuples())
    lhs += int(v.sum()) ** 2 / 2 ** 4
    assert lhs == float((v * v).sum())


def test_clark_evans_goldens(ray_session):
    import math

    from zen3geo_ray.stages.spatial_stats import clark_evans

    # occupied cells 0 and 1 are rook-adjacent (dist 1); cell 27 has
    # no occupied neighbor within 2 rings -> counted far, excluded
    out = clark_evans(_cells_ds([0, 0, 1, 27]), res=RES,
                      max_dist=2).to_pandas().iloc[0]
    assert (int(out.n_occ), int(out.n_found), int(out.n_far)) == (3, 2, 1)
    assert int(out.sum_d) == 2
    assert out.r_ce == (2.0 / 2.0) / (0.5 * math.sqrt(32.0 / 3.0))

    # diagonal pair at Chebyshev distance 2: (0,0) and (2,2) = cells
    # 0 and 18
    o2 = clark_evans(_cells_ds([0, 18]), res=RES,
                     max_dist=3).to_pandas().iloc[0]
    assert int(o2.sum_d) == 4 and int(o2.n_found) == 2


def test_ruggedness_index_goldens(ray_session):
    import math

    from zen3geo_ray.stages.spatial_stats import ruggedness_index

    # cells 0 (h=3) and 1 (h=1) are adjacent; 27 (h=2) is isolated
    out = ruggedness_index(_cells_ds([0, 0, 0, 1, 27, 27]),
                           res=RES).to_pandas().set_index("cell")
    assert (int(out.loc[0, "n_nbrs"]), int(out.loc[0, "tri2"])) == (1, 4)
    assert out.loc[0, "tri"] == 2.0
    assert (int(out.loc[1, "n_nbrs"]), int(out.loc[1, "tri2"])) == (1, 4)
    assert (int(out.loc[27, "n_nbrs"]), int(out.loc[27, "tri2"])) == (0, 0)
    assert out.loc[27, "tri"] == 0.0
    # diagonal neighbors count too: 9=(1,1) borders 0
    o2 = ruggedness_index(_cells_ds([0, 9, 9, 9]),
                          res=RES).to_pandas().set_index("cell")
    assert int(o2.loc[0, "tri2"]) == 4 and int(o2.loc[0, "n_nbrs"]) == 1
    assert o2.loc[9, "tri"] == math.sqrt(4.0)


def test_hausdorff_cells_golden(ray_session):
    import ray.data as rd

    from zen3geo_ray.geom.cells import _grid_dims
    from zen3geo_ray.stages.spatial_stats import hausdorff_cells

    nc, _nr = _grid_dims(6)
    # A = {(0,0), (5,0)}; B = {(0,0), (1,3)}  (x, y) on the res-6 grid
    # h(A,B): a1 shares a cell (0), a2 -> nearest b2 at cheb
    #         max(|5-1|,|0-3|) = 4 -> h_ab = 4
    # h(B,A): b1 -> 0, b2 -> min(cheb to (0,0)=3, to (5,0)=4) = 3
    a = [(0, 0), (5, 0)]
    b = [(0, 0), (1, 3)]
    rows = ([("A", x + y * nc) for x, y in a]
            + [("B", x + y * nc) for x, y in b])
    t = pa.table({"g": pa.array([r[0] for r in rows]),
                  "cell": pa.array([r[1] for r in rows], pa.int64())})
    out = hausdorff_cells(rd.from_arrow(t).repartition(2), res=6,
                          max_dist=8, group_a="A", group_b="B",
                          n_buckets=2).to_pandas().iloc[0]
    assert (int(out.h_ab), int(out.h_ba), int(out.hausdorff)) == (4, 3, 4)
    assert (int(out.n_far_ab), int(out.n_far_ba)) == (0, 0)

    # bounded-search contract: max_dist=2 leaves a2 and b2 unmatched
    out2 = hausdorff_cells(rd.from_arrow(t), res=6, max_dist=2,
                           group_a="A", group_b="B").to_pandas().iloc[0]
    assert (int(out2.h_ab), int(out2.n_far_ab)) == (0, 1)
    assert (int(out2.h_ba), int(out2.n_far_ba)) == (0, 1)


def test_coverage_by_ring_golden(ray_session):
    import ray.data as rd

    from zen3geo_ray.geom.cells import _grid_dims
    from zen3geo_ray.stages.spatial_stats import coverage_by_ring

    nc, nr = _grid_dims(6)
    # one occupied cell at the (0,0) corner: ring h adds the L-shaped
    # band of (h+1)^2 - h^2 = 2h+1 in-bounds cells
    t = pa.table({"cell": pa.array([0], pa.int64())})
    out = coverage_by_ring(rd.from_arrow(t), res=6,
                           max_dist=2).to_pandas()
    assert out.dist.tolist() == [0, 1, 2]
    assert out.n_cells.tolist() == [1, 3, 5]
    assert out.cum_cells.tolist() == [1, 4, 9]
    assert out.frac.tolist()[-1] == 9.0 / (nc * nr)
