"""Per-group convex hull boundary + diameter (stages/hull.py)."""

import numpy as np
import pyarrow as pa


def _brute_boundary(pts: np.ndarray) -> list[tuple[int, int]]:
    pts = np.unique(pts, axis=0)
    out = []
    for p in pts:
        for q in pts:
            if (q == p).all():
                continue
            cr = ((q[0] - p[0]) * (pts[:, 1] - p[1])
                  - (q[1] - p[1]) * (pts[:, 0] - p[0]))
            if (cr >= 0).all():
                out.append((int(p[0]), int(p[1])))
                break
    return sorted(out)


def test_boundary_kernel_fuzz():
    from zen3geo_ray.stages.hull import _boundary_points

    rng = np.random.default_rng(11)
    for _ in range(120):
        n = int(rng.integers(1, 40))
        dom = int(rng.choice([3, 6, 25, 200]))
        pts = rng.integers(0, dom, size=(n, 2)).astype(np.int64)
        got = sorted(map(tuple, _boundary_points(pts)))
        assert got == _brute_boundary(pts)
    # all-collinear: every distinct point is on the boundary
    t = np.array([0, 3, 5, 9], dtype=np.int64)
    pts = np.stack([t * 2 + 1, t * 3 + 4], axis=1)
    assert sorted(map(tuple, _boundary_points(pts))) == \
        sorted(map(tuple, pts))
    # single distinct point: no supporting q exists -> empty
    assert len(_boundary_points(np.array([[5, 5], [5, 5]],
                                         dtype=np.int64))) == 0


def test_hull_boundary_distributed(ray_session):
    """Block-local pruning is lossless: many blocks, groups scattered
    across all of them, result equals the single-set brute force."""
    import ray.data as rd

    from zen3geo_ray.stages.hull import hull_boundary

    rng = np.random.default_rng(23)
    g = rng.integers(0, 5, 600).astype(np.int64)
    x = rng.integers(0, 50, 600).astype(np.int64)
    y = rng.integers(0, 40, 600).astype(np.int64)
    ds = rd.from_arrow(pa.table({"g": g, "x": x, "y": y})).repartition(7)
    out = hull_boundary(ds, group_col="g", x_col="x", y_col="y",
                        n_buckets=3).to_pandas()
    got = sorted(zip(out["g"].astype(np.int64),
                     out["x"].astype(np.int64),
                     out["y"].astype(np.int64)))
    want = []
    for key in np.unique(g):
        pts = np.stack([x[g == key], y[g == key]], axis=1)
        want += [(int(key), px, py) for px, py in _brute_boundary(pts)]
    assert got == sorted(want) and len(want) > 10


def test_group_diameter_distributed(ray_session):
    import ray.data as rd

    from zen3geo_ray.stages.hull import group_diameter

    rng = np.random.default_rng(29)
    g = rng.integers(0, 4, 300).astype(np.int64)
    x = rng.integers(-30, 60, 300).astype(np.int64)
    y = rng.integers(0, 45, 300).astype(np.int64)
    # group 9: a single point -> d2 = 0
    g = np.concatenate([g, [9]])
    x = np.concatenate([x, [7]])
    y = np.concatenate([y, [8]])
    ds = rd.from_arrow(pa.table({"g": g, "x": x, "y": y})).repartition(5)
    out = group_diameter(ds, group_col="g", x_col="x", y_col="y",
                         n_buckets=3).to_pandas()
    got = dict(zip(out["g"].astype(np.int64), out["d2"].astype(np.int64)))
    for key in np.unique(g):
        xs, ys = x[g == key], y[g == key]
        dx = xs[:, None] - xs[None, :]
        dy = ys[:, None] - ys[None, :]
        assert got[int(key)] == int((dx * dx + dy * dy).max())
    assert got[9] == 0


def test_kendall_counts_bruteforce(ray_session):
    """Exact concordant/discordant counts vs the O(n^2) loop, ties in
    both coordinates, groups scattered across blocks."""
    import ray.data as rd

    from zen3geo_ray.stages.zonal import kendall_counts

    rng = np.random.default_rng(31)
    g = rng.integers(0, 3, 400).astype(np.int64)
    x = rng.integers(0, 12, 400).astype(np.int64)
    y = rng.integers(0, 9, 400).astype(np.int64)
    ds = rd.from_arrow(pa.table({"g": g, "x": x, "y": y})).repartition(6)
    out = kendall_counts(ds, "g", "x", "y", n_buckets=2).to_pandas()
    got = {int(r.g): (int(r.n), int(r.concordant), int(r.discordant))
           for r in out.itertuples()}
    for key in np.unique(g):
        xs, ys = x[g == key], y[g == key]
        dx = xs[:, None] - xs[None, :]
        dy = ys[:, None] - ys[None, :]
        conc = int(((dx > 0) & (dy > 0)).sum())
        disc = int(((dx > 0) & (dy < 0)).sum())
        assert got[int(key)] == (len(xs), conc, disc)


def test_token_entropy_matches_direct(ray_session):
    """Quantized per-group entropy equals the direct histogram
    computation (and h is within quantization error of true entropy)."""
    import math
    from collections import Counter

    import ray.data as rd

    from zen3geo_ray.stages.tfidf import token_entropy

    docs = [("en", "a b a c a b"), ("en", "a d"),
            ("fr", "x x x"), ("fr", "y x z z"),
            ("de", "solo")]
    t = pa.table({"lang": [d[0] for d in docs],
                  "text": [d[1] for d in docs]})
    out = token_entropy(rd.from_arrow(t).repartition(3),
                        group_col="lang", scale=65536,
                        n_buckets=2).to_pandas()
    got = {r.lang: (int(r.n), int(r.s), float(r.h))
           for r in out.itertuples()}
    for lang in ("en", "fr", "de"):
        cnt = Counter(w for lg, tx in docs if lg == lang
                      for w in tx.split())
        n = sum(cnt.values())
        s = sum(math.floor(c * math.log(c) * 65536.0)
                for c in cnt.values())
        h = math.log(n) - s / (float(n) * 65536.0)
        assert got[lang] == (n, s, h)
        true_h = -sum((c / n) * math.log(c / n) for c in cnt.values())
        assert abs(got[lang][2] - true_h) < 1e-3
    assert got["de"] == (1, 0, 0.0)


def test_jaccard_sim_join_complete(ray_session):
    """Prefix filtering is COMPLETE: result equals the brute-force
    all-pairs set over shingle sets, including a tau-boundary pair."""
    import ray.data as rd

    from zen3geo_ray.stages.dedup import jaccard_sim_join

    docs = [
        (0, "a b c d e f g h"),
        (1, "a b c d e f g h"),          # exact dup of 0
        (2, "a b c d e f g x"),          # near dup of 0
        (3, "p q r s t u v w"),          # unrelated
        (4, "p q r s t u v w x y z"),    # superset of 3
        (5, "one two"),                  # < 3 tokens: no shingles
        (6, "a b c p q r s t u v w"),    # mixed
    ]
    t = pa.table({"doc_id": pa.array([d[0] for d in docs], pa.int64()),
                  "text": [d[1] for d in docs]})
    out = jaccard_sim_join(
        rd.from_arrow(t).repartition(3), k=3, tau_num=1, tau_den=2,
        n_buckets=3).to_pandas()
    got = {(int(r.i), int(r.j)): (int(r.inter), int(r.si), int(r.sj))
           for r in out.itertuples()}
    assert len(got) == len(out)

    def shset(text):
        ts = text.split()
        return {" ".join(ts[i:i + 3]) for i in range(len(ts) - 2)} \
            if len(ts) >= 3 else set()

    want = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            a, b = shset(docs[i][1]), shset(docs[j][1])
            if not a or not b:
                continue
            inter = len(a & b)
            if inter * 2 >= 1 * (len(a) + len(b) - inter):
                want[(i, j)] = (inter, len(a), len(b))
    assert got == want
    assert (0, 1) in got and (3, 4) in got and (0, 3) not in got


def test_twap_per_key(ray_session):
    """Quantized TWAP vs the direct per-key computation, including a
    single-event key (span 0 -> NULL twap) and ts ties."""
    import math

    import ray.data as rd

    from zen3geo_ray.stages.sequence import twap_per_key

    rows = [  # (user, t, value, uid)
        (1, 0, 2.5, 1), (1, 10, 4.0, 2), (1, 30, 1.0, 3),
        (2, 5, 7.25, 4), (2, 5, 3.0, 5), (2, 9, 1.5, 6),  # tie at t=5
        (3, 100, 9.9, 7),                                  # single event
    ]
    t = pa.table({"user_id": pa.array([r[0] for r in rows], pa.int64()),
                  "t": pa.array([r[1] for r in rows], pa.int64()),
                  "value": pa.array([r[2] for r in rows], pa.float64()),
                  "event_id": pa.array([r[3] for r in rows], pa.int64())})
    out = twap_per_key(rd.from_arrow(t).repartition(3),
                       "user_id", "t", "value", "event_id",
                       n_buckets=2).to_pandas()
    got = {int(r.user_id): (int(r.n), int(r.s), int(r.span),
                            None if r.span == 0 else float(r.twap))
           for r in out.itertuples()}
    # user 1: floor(2.5*10) + floor(4.0*20) = 25 + 80 = 105, span 30
    assert got[1] == (3, 105, 30, 105.0 / 30.0)
    # user 2: tie order by uid -> 7.25 holds 0us, 3.0 holds 4us
    s2 = math.floor(7.25 * 0) + math.floor(3.0 * 4)
    assert got[2] == (3, s2, 4, s2 / 4.0)
    assert got[3] == (1, 0, 0, None)


def test_ohlc_bars(ray_session):
    import ray.data as rd

    from zen3geo_ray.stages.sequence import ohlc_bars

    rows = [  # (user, hour, t, value, uid)
        (1, 0, 3, 5.0, 1), (1, 0, 1, 2.0, 2), (1, 0, 9, 4.0, 3),
        (1, 1, 12, 8.0, 4),
        (2, 0, 2, 1.0, 5), (2, 0, 2, 6.0, 6),  # tie -> uid order
    ]
    t = pa.table({"user_id": pa.array([r[0] for r in rows], pa.int64()),
                  "hour": pa.array([r[1] for r in rows], pa.int64()),
                  "t": pa.array([r[2] for r in rows], pa.int64()),
                  "value": pa.array([r[3] for r in rows], pa.float64()),
                  "event_id": pa.array([r[4] for r in rows], pa.int64())})
    out = ohlc_bars(rd.from_arrow(t).repartition(3),
                    "user_id", "hour", "t", "value", "event_id",
                    n_buckets=2).to_pandas()
    got = {(int(r.user_id), int(r.hour)):
           (int(r.n), r.open, r.high, r.low, r.close)
           for r in out.itertuples()}
    assert got[(1, 0)] == (3, 2.0, 5.0, 2.0, 4.0)
    assert got[(1, 1)] == (1, 8.0, 8.0, 8.0, 8.0)
    assert got[(2, 0)] == (2, 1.0, 6.0, 1.0, 6.0)


def test_rle_runs(ray_session):
    import ray.data as rd

    from zen3geo_ray.stages.sequence import rle_runs

    rows = [  # (user, type, t, uid)
        (1, "a", 0, 1), (1, "a", 1, 2), (1, "b", 2, 3), (1, "a", 3, 4),
        (2, "x", 0, 5), (2, "x", 0, 6),  # tie -> uid order, one run
        (3, "q", 9, 7),
    ]
    t = pa.table({"user_id": pa.array([r[0] for r in rows], pa.int64()),
                  "event_type": [r[1] for r in rows],
                  "t": pa.array([r[2] for r in rows], pa.int64()),
                  "event_id": pa.array([r[3] for r in rows], pa.int64())})
    out = rle_runs(rd.from_arrow(t).repartition(3),
                   "user_id", "event_type", "t", "event_id",
                   n_buckets=2).to_pandas()
    got = sorted((int(r.user_id), int(r.run_id), r.event_type,
                  int(r.run_len)) for r in out.itertuples())
    assert got == [(1, 1, "a", 2), (1, 2, "b", 1), (1, 3, "a", 1),
                   (2, 1, "x", 2), (3, 1, "q", 1)]


def test_normalized_dedup(ray_session):
    import ray.data as rd

    from zen3geo_ray.stages.dedup import normalized_dedup

    docs = [
        (5, "Hello, World!"), (2, "hello   world"), (9, "HELLO-WORLD"),
        (3, "another page"), (7, "Another page?"),
        (4, "unique text here"),
    ]
    t = pa.table({"doc_id": pa.array([d[0] for d in docs], pa.int64()),
                  "text": [d[1] for d in docs]})
    out = normalized_dedup(rd.from_arrow(t).repartition(3),
                           n_buckets=2).to_pandas()
    got = dict(zip(out["doc_id"].astype(np.int64),
                   out["n_dups"].astype(np.int64)))
    assert got == {2: 3, 3: 2, 4: 1}


def test_span_corruption_index(ray_session):
    """Spans are in-block, non-overlapping, deterministic; trailing
    partial blocks unmasked."""
    import ray.data as rd

    from zen3geo_ray.stages.corpus import span_corruption_index

    texts = ["w" + " w" * 46, "x y"]  # 47 tokens -> 2 full 20-blocks; 2 tokens -> none
    t = pa.table({"doc_id": pa.array([10, 11], pa.int64()),
                  "text": texts})
    out = span_corruption_index(
        rd.from_arrow(t).repartition(2), block=20, span_len=3
    ).to_pandas().sort_values(["doc_id", "block"])
    assert out["doc_id"].tolist() == [10, 10]
    assert out["block"].tolist() == [0, 1]
    for r in out.itertuples():
        off = ((10 * 2654435761 + r.block * 40503) % 2147483647) % 18
        assert r.start == r.block * 20 + off
        assert r.block * 20 <= r.start <= r.block * 20 + 17
        assert r.mlen == 3
    # determinism
    out2 = span_corruption_index(
        rd.from_arrow(t), block=20, span_len=3).to_pandas()
    assert sorted(map(tuple, out2.to_numpy().tolist())) == \
        sorted(map(tuple, out.to_numpy().tolist()))


def test_kl_divergence_by_group(ray_session):
    """Quantized per-group KL vs direct computation; identical
    distributions give ~0, disjoint vocab gives large positive."""
    import math
    from collections import Counter

    import ray.data as rd

    from zen3geo_ray.stages.tfidf import kl_divergence_by_group

    docs = [("s1", "a b a b"), ("s1", "a b"),
            ("s2", "a b a b a b"),          # same distribution as s1
            ("s3", "z z q q z")]            # disjoint vocab
    t = pa.table({"source": [d[0] for d in docs],
                  "text": [d[1] for d in docs]})
    out = kl_divergence_by_group(
        rd.from_arrow(t).repartition(2), group_col="source",
        scale=65536, n_buckets=2).to_pandas()
    got = {r.source: (int(r.n), int(r.s), float(r.kl))
           for r in out.itertuples()}

    all_cnt = Counter(w for _, tx in docs for w in tx.split())
    big_n = sum(all_cnt.values())
    for src_ in ("s1", "s2", "s3"):
        cnt = Counter(w for s_, tx in docs if s_ == src_
                      for w in tx.split())
        n = sum(cnt.values())
        s = sum(math.floor(c * (math.log(c) - math.log(n)
                                - math.log(all_cnt[w]) + math.log(big_n))
                           * 65536.0) for w, c in cnt.items())
        assert got[src_] == (n, s, s / (float(n) * 65536.0))
    # s2: p(a)=p(b)=1/2 vs corpus q(a)=q(b)=6/17 -> KL = ln(17/12)
    assert abs(got["s2"][2] - math.log(17 / 12)) < 1e-4
    assert got["s3"][2] > 1.0


def test_rect_union_area_bruteforce(ray_session):
    """Exact union area per group vs a pixel-grid brute force, with
    heavy overlap and rects spanning multiple cells."""
    import ray.data as rd

    from zen3geo_ray.stages.zonal import rect_union_area

    rng = np.random.default_rng(37)
    n = 120
    g = rng.integers(0, 3, n).astype(np.int64)
    x0 = rng.integers(0, 300, n).astype(np.int64)
    y0 = rng.integers(0, 250, n).astype(np.int64)
    x1 = x0 + rng.integers(5, 180, n)
    y1 = y0 + rng.integers(5, 140, n)
    t = pa.table({"g": g, "x0": x0, "y0": y0, "x1": x1, "y1": y1})
    out = rect_union_area(rd.from_arrow(t).repartition(4),
                          cell=64, n_buckets=4).to_pandas()
    got = dict(zip(out["g"].astype(np.int64),
                   out["area"].astype(np.int64)))
    for key in np.unique(g):
        grid = np.zeros((520, 520), dtype=bool)
        for a, b, c, d in zip(x0[g == key], y0[g == key],
                              x1[g == key], y1[g == key]):
            grid[a:c, b:d] = True
        assert got[int(key)] == int(grid.sum())


def test_grouped_weighted_median(ray_session):
    import ray.data as rd

    from zen3geo_ray.stages.zonal import grouped_weighted_median

    rows = [  # (key, v, w)
        (1, 10, 1), (1, 20, 2), (1, 30, 1),   # cum 1,3,4; 2cw>=4 at v=20
        (2, 5, 10),                            # single value
        (3, 1, 1), (3, 2, 1),                  # even split -> lower = 1
    ]
    t = pa.table({"k": pa.array([r[0] for r in rows], pa.int64()),
                  "v": pa.array([r[1] for r in rows], pa.int64()),
                  "w": pa.array([r[2] for r in rows], pa.int64())})
    out = grouped_weighted_median(
        rd.from_arrow(t).repartition(3), ["k"], "v", "w",
        n_buckets=2).to_pandas()
    got = {int(r.k): (int(r.wmedian), int(r.total_w))
           for r in out.itertuples()}
    assert got == {1: (20, 4), 2: (5, 10), 3: (1, 2)}


def test_incremental_sim_join_two_runs(ray_session, tmp_path):
    """Run 2 finds new-vs-stored AND new-vs-new pairs, never
    stored-vs-stored; union of both runs == the one-shot join."""
    import ray.data as rd

    from zen3geo_ray.stages.dedup import (incremental_sim_join,
                                          jaccard_sim_join)

    docs = [
        (0, "a b c d e f g h"), (2, "a b c d e f g h"),   # old dup pair
        (1, "a b c d e f g h"),                            # new, dups 0/2
        (3, "p q r s t u v w"), (5, "p q r s t u v w"),    # new-new pair
        (4, "m n o p q r s t u v"),                        # old, unrelated-ish
    ]
    t = pa.table({"doc_id": pa.array([d[0] for d in docs], pa.int64()),
                  "text": [d[1] for d in docs]})
    full = rd.from_arrow(t)
    evens = full.filter(lambda r: r["doc_id"] % 2 == 0)
    odds = full.filter(lambda r: r["doc_id"] % 2 == 1)
    store = str(tmp_path / "simstore")

    r1 = incremental_sim_join(evens, store, k=3, tau_num=4,
                              tau_den=5).to_pandas()
    p1 = {(int(r.i), int(r.j)) for r in r1.itertuples()}
    assert p1 == {(0, 2)}  # within-run pair of the seed batch

    r2 = incremental_sim_join(odds, store, k=3, tau_num=4,
                              tau_den=5).to_pandas()
    p2 = {(int(r.i), int(r.j)) for r in r2.itertuples()}
    assert p2 == {(0, 1), (1, 2), (3, 5)}  # no stored-vs-stored (0,2)

    ref = jaccard_sim_join(full, k=3, tau_num=4, tau_den=5).to_pandas()
    pref = {(int(r.i), int(r.j)) for r in ref.itertuples()}
    assert p1 | p2 == pref


def test_incremental_sim_join_probe_store_independent(ray_session,
                                                      tmp_path):
    """Probe SHUFFLE volume is store-size-independent (round-4 verdict
    item 1): stored postings are semi-filtered by the new batch's
    broadcast prefix-hash set, so a store sharing NO prefix hash with
    the batch contributes ZERO posting rows to the pair shuffle — at
    50 rows and at 8x that alike — and the postings sidecar means the
    probe never re-shingles stored sets (deleting the stored _set files
    leaves an unrelated probe fully functional)."""
    import os

    import ray.data as rd

    from zen3geo_ray.stages.dedup import incremental_sim_join

    def mk(ids, texts):
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.large_string())}))

    probe_texts = ["qq ww ee rr tt yy uu ii"] * 2

    for mult, tag in ((1, "small"), (8, "big")):
        store = str(tmp_path / tag)
        n = 50 * mult
        seed = mk(list(range(10_000, 10_000 + n)),
                  [f"aa bb cc dd ee x{i} y{i} z{i}" for i in range(n)])
        incremental_sim_join(seed, store, k=3, tau_num=4, tau_den=5)
        st: dict = {}
        out = incremental_sim_join(
            mk([1, 3], probe_texts), store, k=3, tau_num=4, tau_den=5,
            stats=st).to_pandas()
        assert st["store_rows"] == n
        # unrelated store: zero stored postings survive the semi-filter
        assert st["old_posting_rows"] == 0
        assert {(int(r.i), int(r.j)) for r in out.itertuples()} \
            == {(1, 3)}

    # sidecar reuse: with the stored *sets* gone (postings kept), an
    # unrelated probe still runs — proof the probe reads the 24-byte
    # sidecar, not the set text
    store = str(tmp_path / "small")
    for entry in os.listdir(store):
        if entry.startswith("run-"):
            for root, _, files in os.walk(os.path.join(store, entry)):
                for fn in files:
                    os.remove(os.path.join(root, fn))
    st2: dict = {}
    out2 = incremental_sim_join(
        mk([21, 23], ["mm nn oo pp kk ll jj hh"] * 2), store,
        k=3, tau_num=4, tau_den=5, stats=st2).to_pandas()
    assert st2["old_posting_rows"] == 0
    assert {(int(r.i), int(r.j)) for r in out2.itertuples()} == {(21, 23)}


def test_max_drawdown(ray_session):
    import ray.data as rd

    from zen3geo_ray.stages.sequence import max_drawdown

    rows = [  # (user, t, c, uid): series 10, 8, 12, 3, 9
        (1, 0, 10, 1), (1, 1, 8, 2), (1, 2, 12, 3), (1, 3, 3, 4),
        (1, 4, 9, 5),
        (2, 0, 5, 6),  # single event: drawdown 0
    ]
    t = pa.table({"user_id": pa.array([r[0] for r in rows], pa.int64()),
                  "t": pa.array([r[1] for r in rows], pa.int64()),
                  "c": pa.array([r[2] for r in rows], pa.int64()),
                  "event_id": pa.array([r[3] for r in rows], pa.int64())})
    out = max_drawdown(rd.from_arrow(t).repartition(3),
                       "user_id", "t", "c", "event_id",
                       n_buckets=2).to_pandas()
    got = {int(r.user_id): (int(r.n), int(r.max_drawdown), int(r.peak))
           for r in out.itertuples()}
    assert got == {1: (5, 9, 12), 2: (1, 0, 5)}


def test_linear_interp_grid(ray_session):
    """Interpolated values at known brackets; on-event grid points take
    the event value; unbracketed edges drop; ts ties dedupe to max uid."""
    import ray.data as rd

    from zen3geo_ray.stages.sequence import linear_interp_grid

    H = 3_600_000_000
    rows = [  # (user, t, v, uid)
        (1, H * 10, 4.0, 1), (1, H * 12, 8.0, 2),   # interp at h=11 -> 6
        (1, H * 12, 99.0, 3),                        # tie: uid 3 wins
        (2, H * 11, 5.0, 4),                         # single event
    ]
    t = pa.table({"user_id": pa.array([r[0] for r in rows], pa.int64()),
                  "t": pa.array([r[1] for r in rows], pa.int64()),
                  "value": pa.array([r[2] for r in rows], pa.float64()),
                  "event_id": pa.array([r[3] for r in rows], pa.int64())})
    out = linear_interp_grid(rd.from_arrow(t).repartition(2),
                             "user_id", "t", "value", "event_id",
                             hour_lo=9, hour_hi=13,
                             n_buckets=2).to_pandas()
    got = {(int(r.user_id), int(r.h)): float(r.val)
           for r in out.itertuples()}
    # user 1: h=9 unbracketed (no prev), h=13 unbracketed (no next)
    assert set(k[1] for k in got if k[0] == 1) == {10, 11, 12}
    assert got[(1, 10)] == 4.0
    assert got[(1, 11)] == 4.0 + (99.0 - 4.0) * 0.5  # tie winner 99.0
    assert got[(1, 12)] == 99.0
    # user 2: only h=11 is ON the single event; others unbracketed
    assert set(k[1] for k in got if k[0] == 2) == {11}
    assert got[(2, 11)] == 5.0


def test_jsd_source_pairs(ray_session):
    """Pairwise quantized JSD: identical distributions give exactly 0
    (every ln argument pair is equal), disjoint vocab gives ~ln 2,
    and every pair matches the direct per-term computation."""
    import math
    from collections import Counter

    import ray.data as rd

    from zen3geo_ray.stages.tfidf import jsd_source_pairs

    docs = [("s1", "a b a b"), ("s1", "a b"),
            ("s2", "a b a b a b"),          # same distribution as s1
            ("s3", "z z q q z")]            # disjoint vocab
    t = pa.table({"source": [d[0] for d in docs],
                  "text": [d[1] for d in docs]})
    out = jsd_source_pairs(
        rd.from_arrow(t).repartition(2), group_col="source",
        scale=65536, n_buckets=2).to_pandas()
    got = {(r.src_a, r.src_b): r for r in out.itertuples()}
    assert set(got) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}

    cnts = {s: Counter() for s in ("s1", "s2", "s3")}
    for s_, tx in docs:
        cnts[s_].update(tx.split())
    ns = {s: sum(c.values()) for s, c in cnts.items()}

    def s_term(a, b):
        ca, cb, na, nb = cnts[a], cnts[b], ns[a], ns[b]
        return sum(math.floor(
            c * (math.log(2 * c * nb) - math.log(c * nb + cb[w] * na))
            * 65536.0) for w, c in ca.items())

    for a, b in got:
        r = got[(a, b)]
        assert (int(r.n_a), int(r.n_b)) == (ns[a], ns[b])
        assert int(r.s_a) == s_term(a, b)
        assert int(r.s_b) == s_term(b, a)
        assert r.jsd == (float(r.s_a) / float(r.n_a)
                         + float(r.s_b) / float(r.n_b)) / (2.0 * 65536.0)
    # identical distributions -> exactly zero both sides
    assert got[("s1", "s2")].jsd == 0.0
    # disjoint vocab -> JSD == ln 2 (up to quantization)
    assert abs(got[("s1", "s3")].jsd - math.log(2.0)) < 1e-4


def test_vocab_drift_two_runs(ray_session, tmp_path):
    """Cross-run drift: run 1 on an empty store (uniform smoothed
    baseline), run 2 against run 1's counts — both rows match the
    direct add-one-smoothed KL computation; the store accumulates."""
    import math
    from collections import Counter

    import ray.data as rd

    from zen3geo_ray.stages.tfidf import vocab_drift

    store = str(tmp_path / "vstore")
    r1_docs = ["a b a", "b c"]
    r2_docs = ["a a d d d"]

    def table(docs):
        return rd.from_arrow(pa.table({"text": docs}))

    def expect(run_docs, store_cnt):
        r = Counter(w for d in run_docs for w in d.split())
        big_r = sum(r.values())
        big_s = sum(store_cnt.values())
        vocab = set(r) | set(store_cnt)
        big_v = len(vocab)
        t = sum(math.floor(c * (math.log(c) - math.log(big_r)
                                - math.log(store_cnt[w] + 1)
                                + math.log(big_s + big_v)) * 65536.0)
                for w, c in r.items())
        v_new = sum(1 for w in r if store_cnt[w] == 0)
        c_new = sum(c for w, c in r.items() if store_cnt[w] == 0)
        return (big_s, big_r, len([w for w in store_cnt
                                   if store_cnt[w] > 0]), len(r),
                v_new, c_new, t,
                float(t) / (float(big_r) * 65536.0))

    out1 = vocab_drift(table(r1_docs), store).to_pandas().iloc[0]
    got1 = (int(out1.n_store), int(out1.n_run), int(out1.v_store),
            int(out1.v_run), int(out1.v_new), int(out1.c_new),
            int(out1.t_sum), float(out1.drift))
    assert got1 == expect(r1_docs, Counter())

    st1 = Counter(w for d in r1_docs for w in d.split())
    out2 = vocab_drift(table(r2_docs), store).to_pandas().iloc[0]
    got2 = (int(out2.n_store), int(out2.n_run), int(out2.v_store),
            int(out2.v_run), int(out2.v_new), int(out2.c_new),
            int(out2.t_sum), float(out2.drift))
    assert got2 == expect(r2_docs, st1)
    assert int(out2.v_new) == 1 and int(out2.c_new) == 3   # token d

    # run 3 sees the union of runs 1+2 in the store
    st2 = st1 + Counter(w for d in r2_docs for w in d.split())
    out3 = vocab_drift(table(["c c"]), store).to_pandas().iloc[0]
    assert int(out3.n_store) == sum(st2.values())
    assert int(out3.v_new) == 0


def test_pyramid_counts_levels(ray_session):
    """Every coarser level's cell count equals the sum of its children
    at base res, and level totals all equal the row count."""
    import ray.data as rd

    from zen3geo_ray.geom import cells
    from zen3geo_ray.stages.spatial_stats import pyramid_counts

    rng = np.random.default_rng(3)
    lon = rng.uniform(-170, 170, 4000)
    lat = rng.uniform(-80, 80, 4000)
    res = 6
    t = pa.table({"cell": pa.array(cells.cell_of(lon, lat, res),
                                   pa.int64())})
    out = pyramid_counts(rd.from_arrow(t).repartition(4), res=res,
                         deltas=[0, 2, 4], n_buckets=4).to_pandas()
    assert sorted(out["level"].unique()) == [2, 4, 6]
    for lv in (2, 4, 6):
        assert int(out[out.level == lv]["n"].sum()) == 4000
    # parent identity: level-4 count == sum of its res-6 children
    base = out[out.level == 6]
    par = cells.parent(base["cell"].to_numpy(), 6, 4)
    import pandas as pd
    roll = pd.DataFrame({"cell": par, "n": base["n"].to_numpy()}) \
        .groupby("cell", as_index=False)["n"].sum()
    lvl4 = out[out.level == 4].sort_values("cell").reset_index(drop=True)
    assert roll.sort_values("cell").reset_index(drop=True).equals(lvl4[["cell", "n"]])


def test_densify_segments_exact(ray_session):
    import ray.data as rd

    from zen3geo_ray.stages.join import densify_segments

    segs = pa.table({"sid": pa.array([1], pa.int64()),
                     "x0": pa.array([10], pa.int64()),
                     "y0": pa.array([20], pa.int64()),
                     "x1": pa.array([18], pa.int64()),
                     "y1": pa.array([4], pa.int64())})
    out = densify_segments(rd.from_arrow(segs), k=4).to_pandas() \
        .sort_values("j").reset_index(drop=True)
    # point j on the x4 lattice: (x0*4 + j*dx, y0*4 + j*dy)
    assert list(out["xk"]) == [40 + j * 8 for j in range(5)]
    assert list(out["yk"]) == [80 - j * 16 for j in range(5)]
