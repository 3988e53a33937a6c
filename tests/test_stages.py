"""Tests for knn / zonal / stack / dedup / ann / extract stages."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from zen3geo_ray.geom import cells
from zen3geo_ray.sources.corpus import pages_table
from zen3geo_ray.stages import ann, dedup, extract, knn, stack, zonal


# --- knn ------------------------------------------------------------------

def test_haversine_known():
    # London -> Paris ~343 km
    d = knn.haversine_km(-0.1276, 51.5072, 2.3522, 48.8566)
    assert 330 < float(d) < 350


def test_kring_knn_matches_bruteforce(ray_session):
    rng = np.random.default_rng(5)
    n = 5000
    lon = rng.uniform(-10, 10, n)
    lat = rng.uniform(40, 50, n)
    res = 6
    tbl = pa.table(
        {
            "pid": np.arange(n),
            "lon": lon,
            "lat": lat,
            "cell": cells.cell_of(lon, lat, res),
        }
    )
    queries = {"query_id": np.array([0, 1]), "lon": np.array([0.0, 5.0]),
               "lat": np.array([45.0, 42.0])}
    j = knn.KRingKNN(queries, res=res, ring_k=2, k=5)
    ds = rd.from_arrow(tbl)
    out = knn.finalize_topk(
        ds.map_batches(j, batch_format="pyarrow", batch_size=512), k=5
    ).to_pandas()
    for qi in (0, 1):
        d = knn.haversine_km(queries["lon"][qi], queries["lat"][qi], lon, lat)
        expected = set(np.argsort(d, kind="stable")[:5].tolist())
        got = set(out[out.query_id == qi].sort_values("rank")["pid"].tolist())
        assert got == expected  # ring at res6/k2 covers the 5-NN radius here


# --- zonal ----------------------------------------------------------------

def test_zonal_aggregate_matches_pandas(ray_session):
    rng = np.random.default_rng(0)
    n = 20_000
    key = rng.integers(0, 50, n)
    val = rng.uniform(0, 100, n)
    tbl = pa.table({"cell": key, "v": val})
    out = (
        zonal.zonal_aggregate(
            rd.from_arrow(tbl).repartition(8),
            ["cell"],
            {"v": ["sum", "min", "max", "mean"]},
        )
        .to_pandas()
        .sort_values("cell")
        .reset_index(drop=True)
    )
    exp = (
        pd.DataFrame({"cell": key, "v": val})
        .groupby("cell")
        .agg(n=("v", "size"), v_sum=("v", "sum"), v_min=("v", "min"),
             v_max=("v", "max"), v_mean=("v", "mean"))
        .reset_index()
    )
    assert np.array_equal(out["cell"], exp["cell"])
    assert np.array_equal(out["n"], exp["n"])
    assert np.allclose(out["v_sum"], exp["v_sum"])
    assert np.allclose(out["v_min"], exp["v_min"])
    assert np.allclose(out["v_max"], exp["v_max"])
    assert np.allclose(out["v_mean"], exp["v_mean"])


def test_topk_cells(ray_session):
    key = np.repeat([3, 1, 2], [100, 50, 10])
    out = zonal.topk_cells(rd.from_arrow(pa.table({"cell": key})), ["cell"], 2)
    got = out.to_pandas()
    assert got["cell"].tolist() == [3, 1]
    assert got["n"].tolist() == [100, 50]


# --- stack / mosaic / dedup ----------------------------------------------

def test_stack_series_sorted(ray_session):
    tbl = pa.table(
        {"cell": [1, 1, 1, 2], "ts": [3, 1, 2, 9], "v": [30.0, 10.0, 20.0, 90.0]}
    )
    out = stack.stack_series(rd.from_arrow(tbl), ["cell"], ["ts"], "v").to_pandas()
    out = out.sort_values("cell").reset_index(drop=True)
    assert list(out["v_stack"][0]) == [10.0, 20.0, 30.0]
    assert out["n_layers"].tolist() == [3, 1]


def test_first_valid_mosaic(ray_session):
    tbl = pa.table(
        {
            "cell": [1, 1, 1],
            "ts": [2, 1, 3],
            "v": pa.array([20.0, None, 30.0], pa.float64()),
        }
    )
    out = stack.first_valid_mosaic(rd.from_arrow(tbl), ["cell"], ["ts"], ["v"]).to_pandas()
    # ts=1 is null -> first valid is ts=2 value
    assert out["v"].tolist() == [20.0]


def test_dedup_first_partition_invariant(ray_session):
    pages = pages_table(2000)
    ds = rd.from_arrow(pages).repartition(7)
    out = stack.dedup_first(ds, ["url"], ["warc_ts", "url"]).to_pandas()
    pdf = pages.to_pandas()
    exp = pdf.sort_values(["warc_ts", "url"], kind="mergesort").groupby("url").head(1)
    assert len(out) == pdf["url"].nunique()
    merged = out.merge(exp[["url", "warc_ts"]], on="url", suffixes=("", "_exp"))
    assert (merged["warc_ts"] == merged["warc_ts_exp"]).all()


def test_exact_dedup(ray_session):
    tbl = pa.table(
        {"doc_id": [1, 2, 3, 4], "text": ["aaa", "bbb", "aaa", "ccc"]}
    )
    out = dedup.exact_dedup(rd.from_arrow(tbl), order_cols=["doc_id"]).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2, 4]


# --- minhash / simhash ----------------------------------------------------

def test_minhash_similar_docs_collide():
    a = "the quick brown fox jumps over the lazy dog " * 5
    b = a + "tail"
    c = "completely different content about mountains and rivers " * 5
    sig = dedup.minhash_signatures([a, b, c], num_perm=64)
    sim_ab = (sig[0] == sig[1]).mean()
    sim_ac = (sig[0] == sig[2]).mean()
    assert sim_ab > 0.8
    assert sim_ac < 0.2


def test_minhash_lsh_groups(ray_session):
    base = "some long enough document text for shingling purposes here "
    docs = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": [base * 4, base * 4 + "x", "other unrelated totally " * 8],
        }
    )
    out = dedup.minhash_lsh_groups(rd.from_arrow(docs), id_col="doc_id").to_pandas()
    g = dict(zip(out["doc_id"], out["dup_group"]))
    assert g[1] == g[2] == 1
    assert g[3] == 3


def test_simhash_hamming():
    a = "the quick brown fox jumps over the lazy dog " * 3
    b = a + "!"
    c = "zxqwv entirely different stream of words " * 4
    h = dedup.simhash64([a, b, c])
    ham_ab = bin(int(h[0]) ^ int(h[1])).count("1")
    ham_ac = bin(int(h[0]) ^ int(h[2])).count("1")
    assert ham_ab <= 6
    assert ham_ac > 10


def test_ngram_jaccard():
    assert dedup.ngram_jaccard("abcdefgh", "abcdefgh") == 1.0
    assert dedup.ngram_jaccard("abcdefgh", "zzzzzzzz") == 0.0
    assert 0.0 < dedup.ngram_jaccard("abcdefghij", "abcdefghiX") < 1.0


# --- ann ------------------------------------------------------------------

def test_brute_force_knn_matches_numpy(ray_session):
    rng = np.random.default_rng(2)
    n, d = 2000, 16
    m = rng.standard_normal((n, d)).astype(np.float32)
    tbl = pa.table(
        {"vec_id": np.arange(n), "embedding": pa.array(list(m), pa.list_(pa.float32()))}
    )
    q = rng.standard_normal((3, d)).astype(np.float32)
    blob = {"query_id": np.arange(3), "matrix": q}
    out = ann.brute_force_knn(
        rd.from_arrow(tbl).repartition(4), blob, k=10
    ).to_pandas()
    mn = ann.normalize(m)
    qn = ann.normalize(q)
    sims = mn @ qn.T
    for qi in range(3):
        exp = set(np.argsort(-sims[:, qi], kind="stable")[:10].tolist())
        got = set(out[out.query_id == qi]["vec_id"].tolist())
        assert got == exp


def test_lsh_knn_recall(ray_session):
    rng = np.random.default_rng(4)
    n, d = 3000, 32
    m = rng.standard_normal((n, d)).astype(np.float32)
    tbl = pa.table(
        {"vec_id": np.arange(n), "embedding": pa.array(list(m), pa.list_(pa.float32()))}
    )
    blob = {"query_id": np.array([0]), "matrix": m[:1] + 0.01}
    out = ann.lsh_knn(rd.from_arrow(tbl), blob, k=5, n_planes=4).to_pandas()
    # the near-identical vector must be found (lands in the same bucket)
    assert 0 in out["vec_id"].tolist()


# --- extract --------------------------------------------------------------

def test_pages_to_points_pipeline(ray_session):
    pages = pages_table(300)
    ds = rd.from_arrow(pages)
    pts = extract.pages_to_points(ds, res=10, check_identity=True)
    out = pts.to_pandas()
    assert len(out) == 300
    assert "html" not in out.columns
    assert {"lon", "lat", "cell", "text"} <= set(out.columns)
    # cells consistent with coords
    c = cells.cell_of(out["lon"].to_numpy(), out["lat"].to_numpy(), 10)
    assert np.array_equal(c, out["cell"].to_numpy())


def test_text_extractor_check_catches_mismatch():
    bad = pa.table(
        {
            "url": ["u"],
            "html": [b"<p>hello</p>"],
            "text": pa.array(["WRONG"], pa.large_string()),
        }
    )
    with pytest.raises(AssertionError, match="text mismatch"):
        extract.TextExtractor(check=True)(bad)


def test_grouped_quantiles_matches_numpy(ray_session):
    """Exact discrete quantiles (DuckDB quantile_disc convention:
    idx = max(ceil(q*n)-1, 0)) vs a direct sorted-array reference,
    including singleton and even/odd group sizes."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages.zonal import grouped_quantiles

    rng = np.random.default_rng(3)
    keys = rng.integers(0, 7, 5000)
    vals = rng.integers(-1000, 1000, 5000).astype(np.int64)
    keys[0] = 99  # singleton group
    tbl = pa.table({"k": pa.array(keys.astype(np.int64)), "v": pa.array(vals)})
    qs = [0.25, 0.5, 0.75, 0.9]
    out = grouped_quantiles(
        rd.from_arrow(tbl).repartition(6), ["k"], "v", qs=qs
    ).to_pandas().sort_values("k").reset_index(drop=True)
    df = pd.DataFrame({"k": keys, "v": vals})
    for _, r in out.iterrows():
        sv = np.sort(df[df.k == r["k"]]["v"].to_numpy())
        for q in qs:
            idx = max(int(np.ceil(q * len(sv))) - 1, 0)
            assert r[f"p{int(q * 100)}"] == sv[idx], (r["k"], q)


def test_profile_columns_with_nulls(ray_session):
    import pyarrow as pa
    import numpy as np
    import ray.data as rd

    from zen3geo_ray.stages.profile import profile_columns

    t = pa.table({
        "x": pa.array([1.0, None, 3.5, 3.5, -2.0, None], pa.float64()),
        "s": pa.array(["b", "a", None, "b", "c", "a"], pa.string()),
    })
    out = profile_columns(rd.from_arrow(t).repartition(3), ["x"], ["s"])
    rows = {r["col_name"]: r for r in out.to_pylist()}
    x = rows["x"]
    assert (x["n"], x["nulls"], x["min_num"], x["max_num"], x["ndv"]) == (6, 2, -2.0, 3.5, 3)
    assert x["min_str"] is None and x["max_str"] is None
    s = rows["s"]
    assert (s["n"], s["nulls"], s["min_str"], s["max_str"], s["ndv"]) == (6, 1, "a", "c", 3)
    assert s["min_num"] is None and s["max_num"] is None


def test_grouped_quantiles_cont_matches_numpy(ray_session):
    # percentile_cont == numpy 'linear' interpolation
    from zen3geo_ray.stages.zonal import grouped_quantiles_cont
    rng = np.random.default_rng(21)
    n = 3000
    key = rng.integers(0, 6, n).astype(np.int64)
    val = rng.integers(0, 500, n).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": key, "v": val})).repartition(5)
    out = (grouped_quantiles_cont(ds, ["k"], "v", qs=[0.25, 0.5, 0.9])
           .to_pandas().sort_values("k").reset_index(drop=True))
    for _, row in out.iterrows():
        g = val[key == row["k"]]
        for q, lab in [(0.25, "p25"), (0.5, "p50"), (0.9, "p90")]:
            assert row[lab] == pytest.approx(
                np.quantile(g, q, method="linear"), rel=1e-12)


def test_grouped_regression_matches_numpy(ray_session):
    n = 4000
    rng = np.random.default_rng(5)
    k = rng.integers(0, 7, n).astype(np.int64)
    x = rng.integers(0, 500, n).astype(np.int64)
    y = 3 * x + rng.integers(-40, 40, n) + 10 * k
    ds = rd.from_arrow(pa.table({"k": k, "x": x, "y": y})).repartition(6)
    out = (zonal.grouped_regression(ds, ["k"], "x", "y")
           .to_pandas().sort_values("k").reset_index(drop=True))
    for kk in range(7):
        m = k == kk
        slope, intercept = np.polyfit(x[m].astype(float),
                                      y[m].astype(float), 1)
        row = out[out["k"] == kk].iloc[0]
        assert abs(row["slope"] - slope) < 1e-8
        assert abs(row["intercept"] - intercept) < 1e-6
        assert row["n"] == m.sum()


def test_grouped_regression_zero_variance_null(ray_session):
    ds = rd.from_arrow(pa.table({
        "k": np.zeros(10, np.int64),
        "x": np.full(10, 5, np.int64),
        "y": np.arange(10, dtype=np.int64)})).repartition(3)
    out = zonal.grouped_regression(ds, ["k"], "x", "y").to_pandas()
    assert out["slope"].isna().all() and out["intercept"].isna().all()


def test_grouped_mode_tie_breaks_smallest(ray_session):
    k = np.array([1, 1, 1, 1, 2, 2, 2], np.int64)
    v = np.array([9, 3, 9, 3, 7, 7, 1], np.int64)  # k=1 tie 3/9 -> 3
    ds = rd.from_arrow(pa.table({"k": k, "v": v})).repartition(4)
    out = (zonal.grouped_mode(ds, ["k"], "v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out["mode_v"].tolist() == [3, 7]
    assert out["mode_n"].tolist() == [2, 2]


def test_grouped_mode_string_values(ray_session):
    # string value column passes through (no int cast); ties break to the
    # lexicographically smallest value — pins the raster_mode query path
    k = np.array([1, 1, 1, 1, 2, 2, 2], np.int64)
    v = np.array(["en", "de", "en", "de", "fr", "fr", "aa"])
    ds = rd.from_arrow(pa.table({"k": k, "v": v})).repartition(4)
    out = (zonal.grouped_mode(ds, ["k"], "v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out["mode_v"].tolist() == ["de", "fr"]
    assert out["mode_n"].tolist() == [2, 2]


def test_grouped_mode_matches_pandas(ray_session):
    n = 5000
    rng = np.random.default_rng(17)
    k = rng.integers(0, 50, n).astype(np.int64)
    v = rng.integers(0, 12, n).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": k, "v": v})).repartition(8)
    out = (zonal.grouped_mode(ds, ["k"], "v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    df = pd.DataFrame({"k": k, "v": v})
    cnt = df.groupby(["k", "v"]).size().reset_index(name="n")
    cnt = cnt.sort_values(["k", "n", "v"], ascending=[True, False, True])
    exp = cnt.groupby("k", as_index=False).first()
    assert np.array_equal(out["mode_v"].to_numpy(), exp["v"].to_numpy())
    assert np.array_equal(out["mode_n"].to_numpy(), exp["n"].to_numpy())


def test_grouped_hhi_matches_pandas(ray_session):
    # multi-block input with the SAME (key, value) pair split across
    # blocks — pins re-sum-before-square
    rng = np.random.default_rng(23)
    k = rng.integers(0, 5, 4000)
    v = rng.integers(0, 11, 4000)
    ds = rd.from_arrow(pa.table({"k": k, "v": v})).repartition(7)
    out = (zonal.grouped_hhi(ds, ["k"], "v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    import pandas as pd
    df = pd.DataFrame({"k": k, "v": v})
    for i, row in out.iterrows():
        c = df[df["k"] == row["k"]]["v"].value_counts().to_numpy().astype(np.int64)
        assert row["n"] == c.sum()
        assert row["n_vals"] == len(c)
        want = np.float64((c.astype(np.int64) ** 2).sum()) / (
            np.float64(c.sum()) * np.float64(c.sum()))
        assert row["hhi"] == want


def test_grouped_hhi_single_value_is_one(ray_session):
    ds = rd.from_arrow(pa.table({"k": [1, 1, 1], "v": ["a", "a", "a"]}))
    out = zonal.grouped_hhi(ds, ["k"], "v").to_pandas()
    assert out["hhi"].tolist() == [1.0]
    assert out["n_vals"].tolist() == [1]


def test_split_records_sentences(ray_session):
    from zen3geo_ray.stages.corpus import split_records

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["One. Two!  Three? ok", "no delimiters here", None],
    })
    out = (split_records(rd.from_arrow(t).repartition(2),
                         r"[.!?]+[\t\n\f\r ]+")
           .to_pandas().sort_values(["doc_id", "part_idx"])
           .reset_index(drop=True))
    got = list(map(tuple, out.itertuples(index=False)))
    assert got == [(1, 1, "One"), (1, 2, "Two"), (1, 3, "Three"),
                   (1, 4, "ok"), (2, 1, "no delimiters here")]


def test_split_records_keeps_empty_when_asked(ray_session):
    from zen3geo_ray.stages.corpus import split_records

    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": ["a,,b,"]})
    out = (split_records(rd.from_arrow(t), ",", drop_empty=False)
           .to_pandas().sort_values("part_idx").reset_index(drop=True))
    assert out["part"].tolist() == ["a", "", "b", ""]
    assert out["part_idx"].tolist() == [1, 2, 3, 4]


# --- spearman / gini ------------------------------------------------------

def _avg_ranks(a: np.ndarray) -> np.ndarray:
    """Straight-line average ranks (1-based, ties share the mean)."""
    order = np.argsort(a, kind="stable")
    ranks = np.empty(len(a), dtype=np.float64)
    i = 0
    sa = a[order]
    while i < len(a):
        j = i
        while j < len(a) and sa[j] == sa[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    return ranks


def test_spearman_matches_reference(ray_session):
    rng = np.random.default_rng(3)
    x = rng.integers(0, 30, 500).astype(np.int64)
    y = (x // 2 + rng.integers(0, 10, 500)).astype(np.int64)
    ds = rd.from_arrow(pa.table({"x": pa.array(x), "y": pa.array(y)})) \
        .repartition(4)
    out = zonal.spearman_corr(ds, "x", "y", n_buckets=4).to_pandas()
    rx, ry = _avg_ranks(x), _avg_ranks(y)
    want = float(np.corrcoef(rx, ry)[0, 1])
    assert int(out["n"][0]) == 500
    assert abs(float(out["rho"][0]) - want) < 1e-12


def test_spearman_perfect_and_degenerate(ray_session):
    x = np.arange(100, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"x": pa.array(x), "y": pa.array(x * 3)}))
    out = zonal.spearman_corr(ds, "x", "y").to_pandas()
    # cov/(sqrt*sqrt) op order leaves ~1 ulp: 0.9999999999999999
    assert abs(float(out["rho"][0]) - 1.0) < 1e-15
    flat = rd.from_arrow(pa.table({"x": pa.array(x),
                                   "y": pa.array(np.zeros(100, np.int64))}))
    out2 = zonal.spearman_corr(flat, "x", "y").to_pandas()
    assert out2["rho"].isna().all()


def test_grouped_gini_reference(ray_session):
    """Gini vs the direct mean-absolute-difference definition."""
    rng = np.random.default_rng(5)
    rows = []
    for g, vals in (("a", rng.integers(1, 50, 300)),
                    ("b", np.full(200, 7)),
                    ("c", np.array([0, 0, 0, 10]))):
        rows += [(g, int(v)) for v in vals]
    t = pa.table({"k": pa.array([r[0] for r in rows]),
                  "v": pa.array([r[1] for r in rows], pa.int64())})
    out = zonal.grouped_gini(rd.from_arrow(t).repartition(3), ["k"], "v",
                             n_buckets=4).to_pandas().set_index("k")

    def direct(v):
        v = np.asarray(v, dtype=np.float64)
        n = len(v)
        mad = np.abs(v[:, None] - v[None, :]).sum() / (n * n)
        return mad / (2.0 * v.mean())

    for g, vals in (("a", [r[1] for r in rows if r[0] == "a"]),
                    ("b", [7] * 200),
                    ("c", [0, 0, 0, 10])):
        want = direct(vals)
        assert abs(float(out.loc[g, "gini"]) - want) < 1e-12, g
    assert int(out.loc[b"b".decode(), "n"]) == 200
    # all-equal values -> gini 0; extreme concentration -> 3/4 * ...
    assert float(out.loc["b", "gini"]) == 0.0


def test_welch_ttest_reference(ray_session):
    """t and df vs the straight-line Welch formulas (scipy-free)."""
    rng = np.random.default_rng(17)
    va = rng.integers(40, 80, 120).astype(np.int64)
    vb = rng.integers(50, 95, 90).astype(np.int64)
    t = pa.table({
        "g": pa.array(["a"] * 120 + ["b"] * 90 + ["c"] * 10),
        "v": pa.array(np.concatenate(
            [va, vb, np.zeros(10, np.int64)])),
    })
    out = zonal.welch_ttest(rd.from_arrow(t).repartition(4),
                            "g", "v", "a", "b").to_pandas().iloc[0]
    m1, m2 = va.mean(), vb.mean()
    s1 = va.var(ddof=1) / len(va)
    s2 = vb.var(ddof=1) / len(vb)
    want_t = (m1 - m2) / np.sqrt(s1 + s2)
    want_df = (s1 + s2) ** 2 / (s1 ** 2 / (len(va) - 1)
                                + s2 ** 2 / (len(vb) - 1))
    assert int(out["n1"]) == 120 and int(out["n2"]) == 90
    assert abs(float(out["t"]) - want_t) < 1e-10
    assert abs(float(out["df"]) - want_df) < 1e-8


def test_welch_ttest_degenerate(ray_session):
    t = pa.table({"g": pa.array(["a", "a", "b", "b"]),
                  "v": pa.array([5, 5, 5, 5], pa.int64())})
    out = zonal.welch_ttest(rd.from_arrow(t), "g", "v",
                            "a", "b").to_pandas().iloc[0]
    assert out["m1"] == 5.0 and out["m2"] == 5.0
    assert np.isnan(out["t"]) and np.isnan(out["df"])


def test_mann_whitney_reference(ray_session):
    """u2 and z vs the straight-line rank-sum computation (ties
    included)."""
    rng = np.random.default_rng(23)
    va = rng.integers(0, 25, 150).astype(np.int64)
    vb = rng.integers(5, 30, 100).astype(np.int64)
    t = pa.table({"g": pa.array(["a"] * 150 + ["b"] * 100),
                  "v": pa.array(np.concatenate([va, vb]))})
    out = zonal.mann_whitney_u(rd.from_arrow(t).repartition(4),
                               "g", "v", "a", "b",
                               n_buckets=4).to_pandas().iloc[0]
    pooled = np.concatenate([va, vb])
    order = np.argsort(pooled, kind="stable")
    ranks = np.empty(len(pooled), dtype=np.float64)
    i = 0
    sp = pooled[order]
    while i < len(sp):
        j = i
        while j < len(sp) and sp[j] == sp[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    r1 = ranks[:150].sum()
    u = r1 - 150 * 151 / 2.0
    assert int(out["u2"]) == int(round(2 * u))
    n1, n2, n = 150, 100, 250
    _, tie_counts = np.unique(pooled, return_counts=True)
    ties = float((tie_counts * (tie_counts ** 2 - 1)).sum())
    var_u = n1 * n2 / 12.0 * ((n + 1) - ties / (n * (n - 1)))
    want_z = (u - n1 * n2 / 2.0) / np.sqrt(var_u)
    assert abs(float(out["z"]) - want_z) < 1e-10


def test_ks_distance_reference(ray_session):
    rng = np.random.default_rng(29)
    va = rng.integers(0, 40, 200).astype(np.int64)
    vb = (rng.integers(0, 40, 120) + 6).astype(np.int64)
    t = pa.table({"g": pa.array(["a"] * 200 + ["b"] * 120),
                  "v": pa.array(np.concatenate([va, vb]))})
    out = zonal.ks_distance(rd.from_arrow(t).repartition(3),
                            "g", "v", "a", "b",
                            n_buckets=4).to_pandas().iloc[0]
    vals = np.unique(np.concatenate([va, vb]))
    best = -1
    for v in vals:
        diff = abs(int((va <= v).sum()) * 120 - int((vb <= v).sum()) * 200)
        best = max(best, diff)
    assert int(out["d_num"]) == best
    assert int(out["d_den"]) == 200 * 120
    assert abs(float(out["d"]) - best / (200 * 120)) < 1e-15
    # identical groups -> D = 0
    t2 = pa.table({"g": pa.array(["a", "b"] * 50),
                   "v": pa.array(np.tile([1, 1], 50).astype(np.int64))})
    out2 = zonal.ks_distance(rd.from_arrow(t2), "g", "v",
                             "a", "b").to_pandas().iloc[0]
    assert int(out2["d_num"]) == 0


# --- nearest rect join ----------------------------------------------------

def test_nearest_rect_join_goldens(ray_session):
    """Hand-checked: inside a rect -> d2 = 0 with smallest covering id;
    outside -> clamped corner/edge distance."""
    from zen3geo_ray.stages.knn import nearest_rect_join

    rects = {
        "poly_id": np.array([5, 2], dtype=np.int64),
        "minx": np.array([0.0, 10.0]),
        "miny": np.array([0.0, 10.0]),
        "maxx": np.array([4.0, 14.0]),
        "maxy": np.array([4.0, 14.0]),
    }
    pts = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "lon": pa.array([1.0, 7.0, 11.0]),
        "lat": pa.array([1.0, 4.0, 20.0]),
    })
    out = nearest_rect_join(rd.from_arrow(pts), rects) \
        .to_pandas().set_index("doc_id").sort_index()
    assert int(out.loc[0, "poly_id"]) == 5 and out.loc[0, "d2"] == 0.0
    # point (7,4): rect5 edge dx=3,dy=0 -> 9; rect2 corner dx=3,dy=6 -> 45
    assert int(out.loc[1, "poly_id"]) == 5 and out.loc[1, "d2"] == 9.0
    # point (11,20): above rect2 -> dy=6 -> 36
    assert int(out.loc[2, "poly_id"]) == 2 and out.loc[2, "d2"] == 36.0


def test_nearest_rect_join_tie_smallest_id(ray_session):
    from zen3geo_ray.stages.knn import nearest_rect_join

    rects = {
        "poly_id": np.array([9, 3], dtype=np.int64),
        "minx": np.array([0.0, 0.0]),
        "miny": np.array([0.0, 0.0]),
        "maxx": np.array([4.0, 4.0]),
        "maxy": np.array([4.0, 4.0]),
    }
    pts = pa.table({"doc_id": pa.array([0], pa.int64()),
                    "lon": pa.array([2.0]), "lat": pa.array([2.0])})
    out = nearest_rect_join(rd.from_arrow(pts), rects).to_pandas()
    assert int(out["poly_id"][0]) == 3


def test_oneway_anova_reference(ray_session):
    """F and eta^2 vs the straight-line one-way ANOVA formulas."""
    rng = np.random.default_rng(31)
    groups, vals = [], []
    for g, (lo, hi, n) in enumerate([(40, 80, 120), (55, 95, 90),
                                     (30, 60, 70)]):
        groups += [f"g{g}"] * n
        vals.append(rng.integers(lo, hi, n).astype(np.int64))
    t = pa.table({"g": pa.array(groups),
                  "v": pa.array(np.concatenate(vals))})
    out = zonal.oneway_anova(rd.from_arrow(t).repartition(5),
                             "g", "v").to_pandas().iloc[0]
    allv = np.concatenate(vals)
    n, k = len(allv), 3
    gm = allv.mean()
    ssb = sum(len(v) * (v.mean() - gm) ** 2 for v in vals)
    ssw = sum(((v - v.mean()) ** 2).sum() for v in vals)
    want_f = (ssb / (k - 1)) / (ssw / (n - k))
    assert (int(out["k"]), int(out["n"])) == (k, n)
    assert abs(float(out["ssb"]) - ssb) < 1e-6
    assert abs(float(out["ssw"]) - ssw) < 1e-6
    assert abs(float(out["f_stat"]) - want_f) < 1e-10
    assert abs(float(out["eta_sq"]) - ssb / (ssb + ssw)) < 1e-12


def test_oneway_anova_degenerate(ray_session):
    t = pa.table({"g": pa.array(["a", "a", "b", "b"]),
                  "v": pa.array([7, 7, 7, 7], pa.int64())})
    out = zonal.oneway_anova(rd.from_arrow(t), "g", "v") \
        .to_pandas().iloc[0]
    assert (int(out["k"]), int(out["n"])) == (2, 4)
    assert np.isnan(out["f_stat"]) and np.isnan(out["eta_sq"])


def test_kruskal_wallis_reference(ray_session):
    """H and the tie-corrected H vs the straight-line average-rank
    computation, plus a hand-computed tie-free golden."""
    rng = np.random.default_rng(31)
    sizes = {"a": 120, "b": 90, "c": 140}
    vals = {g: rng.integers(0, 40, sz).astype(np.int64)
            for g, sz in sizes.items()}
    gcol = sum(([g] * sizes[g] for g in ("a", "b", "c")), [])
    t = pa.table({"g": pa.array(gcol),
                  "v": pa.array(np.concatenate(
                      [vals[g] for g in ("a", "b", "c")]))})
    out = zonal.kruskal_wallis(rd.from_arrow(t).repartition(4),
                               "g", "v", ["a", "b", "c"],
                               n_buckets=4).to_pandas().iloc[0]
    pooled = np.concatenate([vals[g] for g in ("a", "b", "c")])
    order = np.argsort(pooled, kind="stable")
    ranks = np.empty(len(pooled), dtype=np.float64)
    i = 0
    sp = pooled[order]
    while i < len(sp):
        j = i
        while j < len(sp) and sp[j] == sp[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    n = len(pooled)
    lo = 0
    ssum = 0.0
    for g in ("a", "b", "c"):
        r = ranks[lo:lo + sizes[g]]
        lo += sizes[g]
        ssum += r.sum() ** 2 / sizes[g]
    h_ref = 12.0 / (n * (n + 1)) * ssum - 3 * (n + 1)
    _, tc = np.unique(pooled, return_counts=True)
    corr = 1.0 - float((tc ** 3 - tc).sum()) / (n ** 3 - n)
    assert int(out["n"]) == n and int(out["k"]) == 3
    assert int(out["t3t"]) == int((tc ** 3 - tc).sum())
    assert out["h"] == pytest.approx(h_ref, rel=1e-12)
    assert out["h_adj"] == pytest.approx(h_ref / corr, rel=1e-12)

    # tie-free golden: groups {1,2} and {3,4} -> ranks 1..4,
    # R1=3, R2=7, H = 12/(4*5)*(9/2+49/2) - 3*5 = 12/20*29 - 15 = 2.4
    tg = pa.table({"g": pa.array(["x", "x", "y", "y"]),
                   "v": pa.array([1, 2, 3, 4], pa.int64())})
    o2 = zonal.kruskal_wallis(rd.from_arrow(tg), "g", "v",
                              ["x", "y"]).to_pandas().iloc[0]
    assert o2["h"] == pytest.approx(2.4, abs=1e-12)
    assert int(o2["t3t"]) == 0 and o2["h_adj"] == o2["h"]


def test_roc_auc_reference(ray_session):
    """AUC vs the direct pairwise-comparison definition (ties count
    half), plus the perfect-separation golden."""
    rng = np.random.default_rng(41)
    vp = rng.integers(0, 20, 80).astype(np.int64)
    vn = rng.integers(0, 20, 120).astype(np.int64)
    t = pa.table({"g": pa.array(["p"] * 80 + ["n"] * 120),
                  "v": pa.array(np.concatenate([vp, vn]))})
    out = zonal.roc_auc(rd.from_arrow(t).repartition(4), "g", "v",
                        "p", "n", n_buckets=4).to_pandas().iloc[0]
    wins = (vp[:, None] > vn[None, :]).sum()
    ties = (vp[:, None] == vn[None, :]).sum()
    want = (wins + 0.5 * ties) / (80 * 120)
    assert int(out.n_pos) == 80 and int(out.n_neg) == 120
    assert out.auc == pytest.approx(want, rel=1e-12)

    t2 = pa.table({"g": pa.array(["p", "p", "n", "n"]),
                   "v": pa.array([10, 9, 2, 1], pa.int64())})
    o2 = zonal.roc_auc(rd.from_arrow(t2), "g", "v", "p", "n") \
        .to_pandas().iloc[0]
    assert o2.auc == 1.0


def test_average_precision_reference(ray_session):
    """Quantized AP vs the direct step-sweep definition (distinct
    descending thresholds, Δtp·precision terms), plus goldens."""
    rng = np.random.default_rng(43)
    vp = rng.integers(0, 15, 60).astype(np.int64)
    vn = rng.integers(0, 15, 140).astype(np.int64)
    t = pa.table({"g": pa.array(["p"] * 60 + ["n"] * 140),
                  "v": pa.array(np.concatenate([vp, vn]))})
    out = zonal.average_precision(
        rd.from_arrow(t).repartition(4), "g", "v", "p", "n",
        n_buckets=4).to_pandas().iloc[0]
    # reference: exact (unquantized) step AP
    want = 0.0
    tp = fp = 0
    for v in sorted(set(np.concatenate([vp, vn]).tolist()), reverse=True):
        dtp = int((vp == v).sum())
        dfp = int((vn == v).sum())
        tp += dtp
        fp += dfp
        want += dtp * tp / (tp + fp)
    want /= 60
    assert int(out.n_pos) == 60 and int(out.n_neg) == 140
    # quantization error < 2^-30 per unit
    assert out.ap == pytest.approx(want, abs=1e-8)

    # perfect separation -> AP exactly 1
    t2 = pa.table({"g": pa.array(["p", "p", "n", "n"]),
                   "v": pa.array([10, 9, 2, 1], pa.int64())})
    o2 = zonal.average_precision(rd.from_arrow(t2), "g", "v", "p", "n") \
        .to_pandas().iloc[0]
    assert o2.ap == 1.0
    # all-tied -> AP = prevalence (one threshold, P = n_pos/n)
    t3 = pa.table({"g": pa.array(["p", "n", "n", "n"]),
                   "v": pa.array([5, 5, 5, 5], pa.int64())})
    o3 = zonal.average_precision(rd.from_arrow(t3), "g", "v", "p", "n") \
        .to_pandas().iloc[0]
    assert o3.ap == pytest.approx(0.25, abs=1e-8)


def test_fd_check_golden(ray_session):
    from zen3geo_ray.stages.profile import fd_check

    t = pa.table({
        "k": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "d": pa.array(["a", "a", "b", "c", "c", "d"]),
    })
    out = fd_check(rd.from_arrow(t).repartition(3), "k", "d",
                   n_buckets=2).to_pandas().iloc[0]
    # key 1 has {a,b} (violated), 2 has {c}, 3 has {d}
    assert out.fd == "k->d"
    assert (int(out.n_keys), int(out.n_violated), int(out.max_card)) \
        == (3, 1, 2)
    # a holding FD
    t2 = pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                   "d": pa.array(["a", "a", "b"])})
    o2 = fd_check(rd.from_arrow(t2), "k", "d").to_pandas().iloc[0]
    assert (int(o2.n_keys), int(o2.n_violated), int(o2.max_card)) \
        == (2, 0, 1)


def test_decile_gains_golden(ray_session):
    # 10 rows, scores 10..1 descending, positives at the top 3 scores
    g = ["p"] * 3 + ["n"] * 7
    v = list(range(10, 0, -1))
    t = pa.table({"g": pa.array(g), "v": pa.array(v, pa.int64())})
    out = zonal.decile_gains(rd.from_arrow(t).repartition(3), "g", "v",
                             "p", "n", n_bins=5, n_buckets=2).to_pandas()
    # 5 bins of 2 rows each (all values distinct): top bin rate 1.0,
    # second bin has one positive, rest 0
    assert out.bin.tolist() == [0, 1, 2, 3, 4]
    assert out.n.tolist() == [2, 2, 2, 2, 2]
    assert out.n_pos.tolist() == [2, 1, 0, 0, 0]
    assert out.rate.tolist() == [1.0, 0.5, 0.0, 0.0, 0.0]

    # ties share a bin: all values equal -> ONE bin 0 with everything
    t2 = pa.table({"g": pa.array(["p", "n", "n", "n"]),
                   "v": pa.array([7, 7, 7, 7], pa.int64())})
    o2 = zonal.decile_gains(rd.from_arrow(t2), "g", "v", "p", "n",
                            n_bins=4).to_pandas()
    assert o2.bin.tolist() == [0] and o2.n.tolist() == [4]
    assert o2.rate.tolist() == [0.25]


def test_k_anonymity_golden(ray_session):
    from zen3geo_ray.stages.profile import k_anonymity

    t = pa.table({
        "a": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "b": pa.array(["x", "x", "x", "y", "y", "z"]),
    })
    out = k_anonymity(rd.from_arrow(t).repartition(3), ["a", "b"], 3,
                      n_buckets=2).to_pandas().iloc[0]
    # classes: (1,x)=3 ok, (2,y)=2 exposed, (3,z)=1 exposed
    assert (int(out.n_rows), int(out.n_classes), int(out.min_class)) \
        == (6, 3, 1)
    assert (int(out.n_rows_exposed), int(out.n_classes_exposed)) == (3, 2)


def test_ols2_matches_lstsq(ray_session):
    rng = np.random.default_rng(3)
    x1 = rng.integers(0, 24, 400).astype(np.int64)
    x2 = rng.integers(0, 7, 400).astype(np.int64)
    y = 100 + 3 * x1 - 5 * x2 + rng.integers(-10, 11, 400)
    t = pa.table({"y": pa.array(y), "x1": pa.array(x1),
                  "x2": pa.array(x2)})
    out = zonal.ols2(rd.from_arrow(t).repartition(4),
                     "y", "x1", "x2").to_pandas().iloc[0]
    X = np.column_stack([np.ones(400), x1, x2]).astype(float)
    ref, *_ = np.linalg.lstsq(X, y.astype(float), rcond=None)
    assert out.b0 == pytest.approx(ref[0], rel=1e-9)
    assert out.b1 == pytest.approx(ref[1], rel=1e-9)
    assert out.b2 == pytest.approx(ref[2], rel=1e-9)
    # exact-fit golden: y = 2 + x1 + 4*x2 with independent regressors
    x1g = np.array([0, 1, 2, 0, 1, 2], np.int64)
    x2g = np.array([0, 0, 1, 1, 2, 2], np.int64)
    yg = 2 + x1g + 4 * x2g
    tg = pa.table({"y": pa.array(yg), "x1": pa.array(x1g),
                   "x2": pa.array(x2g)})
    og = zonal.ols2(rd.from_arrow(tg), "y", "x1", "x2") \
        .to_pandas().iloc[0]
    assert (og.b0, og.b1, og.b2) == (2.0, 1.0, 4.0)
    # collinear regressors -> det 0 -> NULL coefficients
    tc = pa.table({"y": pa.array([1, 2, 3], pa.int64()),
                   "x1": pa.array([1, 2, 3], pa.int64()),
                   "x2": pa.array([2, 4, 6], pa.int64())})
    oc = zonal.ols2(rd.from_arrow(tc), "y", "x1", "x2") \
        .to_pandas().iloc[0]
    assert oc.det == 0.0 and np.isnan(oc.b0)


def test_psi_two_groups_reference(ray_session):
    import math

    g = ["p"] * 50 + ["n"] * 70
    rng = np.random.default_rng(9)
    v = np.concatenate([rng.integers(0, 500, 50),
                        rng.integers(100, 700, 70)]).astype(np.int64)
    t = pa.table({"g": pa.array(g), "v": pa.array(v)})
    out = zonal.psi_two_groups(rd.from_arrow(t).repartition(3),
                               "g", "v", "p", "n",
                               bin_width=100).to_pandas().iloc[0]
    # direct smoothed PSI over the union of observed bins
    bins = sorted(set((v // 100).tolist()))
    a = np.array([(v[:50] // 100 == bb).sum() for bb in bins])
    b = np.array([(v[50:] // 100 == bb).sum() for bb in bins])
    m = len(bins)
    da, db = 50 + m, 70 + m
    want = sum((
        ((av + 1) / da - (bv + 1) / db)
        * math.log(((av + 1) / da) / ((bv + 1) / db))
        for av, bv in zip(a, b)))
    assert int(out.n_bins) == m
    assert out.psi == pytest.approx(want, abs=1e-4)
    # identical distributions -> PSI ~ 0
    t2 = pa.table({"g": pa.array(["p", "n"] * 40),
                   "v": pa.array(list(range(40)) * 2, pa.int64())})
    o2 = zonal.psi_two_groups(rd.from_arrow(t2), "g", "v", "p", "n",
                              bin_width=10).to_pandas().iloc[0]
    assert abs(o2.psi) < 1e-4
