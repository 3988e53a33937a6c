"""n-gram corpus ops: repetition stats, decontamination, top-k grams,
keyed prefix scan and shuffle-to-shards."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data as rd

from zen3geo_ray.stages import scan
from zen3geo_ray.stages.ngrams import (
    benchmark_shingle_set,
    contamination,
    repetition_stats,
    top_ngrams,
)
from zen3geo_ray.stages.partition import shuffle_to_shards


def _docs(texts, nblocks=3):
    t = pa.table({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": pa.array(texts, pa.string()),
    })
    return rd.from_arrow(t).repartition(nblocks)


def test_repetition_stats_known_values(ray_session):
    # "a b c a b c a b": 8 tokens -> 6 3-shingles, runs abc x2, bca x2,
    # cab x2 -> 3 distinct, max_rep 2, dup_frac 0.5
    out = (repetition_stats(_docs(["a b c a b c a b", "x y", "a a a a a"]),
                            k=3)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["n_shingles"].tolist() == [6, 1, 3]
    assert out["n_distinct"].tolist() == [3, 1, 1]
    assert out["max_rep"].tolist() == [2, 1, 3]
    assert out["dup_frac"].tolist() == [0.5, 0.0, 2.0 / 3.0]


def test_repetition_stats_empty_and_whitespace_doc(ray_session):
    # empty / all-ws docs follow the dedup convention: ONE seed shingle
    out = (repetition_stats(_docs(["", "   ", "q w e"]), k=3)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["n_shingles"].tolist() == [1, 1, 1]
    assert out["dup_frac"].tolist() == [0.0, 0.0, 0.0]


def test_contamination_distinct_hits(ray_session):
    # doc 2 repeats the benchmark 2-shingle twice -> n_hits counts it ONCE
    bench = _docs(["secret alpha beta"], nblocks=1)
    ref = ray.put(benchmark_shingle_set(bench, k=2))
    train = _docs([
        "secret alpha gamma",            # shares "secret alpha"
        "secret alpha beta secret alpha beta",  # shares several, repeated
        "totally clean words here",
    ])
    out = (contamination(train, ref, k=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [0, 1]
    assert out.loc[0, "n_hits"] == 1
    # doc 1's grams: (secret alpha) x2, (alpha beta) x2, (beta secret) x1
    # -> 2 DISTINCT benchmark hits, repeats not double-counted
    assert out.loc[1, "n_hits"] == 2


def test_top_ngrams_exact_with_cross_bucket_ties(ray_session):
    texts = ["p q p q p q", "a b a b", "z z z z"]
    # bigrams: "p q" x3, "q p" x2, "a b" x2, "b a" x1, "z z" x3
    out = top_ngrams(_docs(texts), n=2, k_top=3, n_buckets=4).to_pandas()
    assert out["gram"].tolist() == ["p q", "z z", "a b"]
    assert out["n"].tolist() == [3, 3, 2]


def test_keyed_prefix_scan_spanning_keys(ray_session):
    # one key spans several blocks; carries must chain through all of them
    n = 5000
    rng = np.random.default_rng(7)
    key = np.sort(rng.integers(0, 4, n)).astype(np.int64)  # few fat keys
    order = np.arange(n, dtype=np.int64)
    val = rng.integers(1, 100, n).astype(np.int64)
    perm = rng.permutation(n)
    ds = rd.from_arrow(pa.table({
        "k": key[perm], "o": order[perm], "v": val[perm]
    })).repartition(9)
    out = (scan.keyed_prefix_scan(ds, "k", "o", "v", out_col="cum")
           .to_pandas().sort_values("o").reset_index(drop=True))
    df = pd.DataFrame({"k": key, "v": val})
    exp = df.groupby("k")["v"].cumsum().to_numpy()
    assert np.array_equal(out["cum"].to_numpy(), exp)


def test_keyed_prefix_scan_count_exclusive_uint64_order(ray_session):
    # value_col=None counts rows; uint64 order column (the shards path)
    n = 3000
    rng = np.random.default_rng(11)
    key = rng.integers(0, 5, n).astype(np.int64)
    order = rng.permutation(n).astype(np.uint64) * np.uint64(2**60 // n)
    ds = rd.from_arrow(pa.table({
        "k": pa.array(key, pa.int64()), "o": pa.array(order, pa.uint64())
    })).repartition(6)
    out = (scan.keyed_prefix_scan(ds, "k", "o", None, out_col="rank",
                                  inclusive=False)
           .to_pandas().sort_values("o").reset_index(drop=True))
    df = pd.DataFrame({"k": key[np.argsort(order)]})
    exp = df.groupby("k").cumcount().to_numpy()
    assert np.array_equal(out["rank"].to_numpy(), exp)


def test_shuffle_to_shards_is_permutation(ray_session):
    n = 4000
    ds = rd.from_arrow(pa.table({
        "doc_id": np.arange(n, dtype=np.int64)})).repartition(5)
    out = shuffle_to_shards(ds, "doc_id", n_shards=6).to_pandas()
    assert len(out) == n
    assert set(out.columns) == {"doc_id", "shard", "pos"}
    for s, g in out.groupby("shard"):
        assert sorted(g["pos"].tolist()) == list(range(len(g)))
    # deterministic: second run identical
    out2 = (shuffle_to_shards(ds, "doc_id", n_shards=6).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    assert out.sort_values("doc_id").reset_index(drop=True).equals(out2)


def test_keyed_prefix_scan_string_keys(ray_session):
    # string partition key (the domain-quota path); ranks per source
    n = 2000
    rng = np.random.default_rng(3)
    src = np.array([f"src{i}" for i in rng.integers(0, 7, n)])
    order = rng.permutation(n).astype(np.int64)
    ds = rd.from_arrow(pa.table({
        "src": pa.array(src, pa.string()),
        "o": pa.array(order, pa.int64()),
    })).repartition(8)
    out = (scan.keyed_prefix_scan(ds, "src", "o", None, out_col="rank",
                                  inclusive=False)
           .to_pandas().sort_values("o").reset_index(drop=True))
    df = pd.DataFrame({"src": src[np.argsort(order)]})
    exp = df.groupby("src").cumcount().to_numpy()
    assert np.array_equal(out["rank"].to_numpy(), exp)


def test_quota_per_key_deterministic_cap(ray_session):
    from zen3geo_ray.stages.partition import quota_per_key
    n = 900
    rng = np.random.default_rng(5)
    src = np.array([f"d{i}" for i in rng.integers(0, 4, n)])
    t = pa.table({"doc_id": np.arange(n, dtype=np.int64),
                  "source": pa.array(src, pa.string())})
    ds = rd.from_arrow(t).repartition(6)
    out = quota_per_key(ds, "source", "doc_id", 50).to_pandas()
    assert set(out.columns) == {"doc_id", "source"}
    assert (out.groupby("source").size() <= 50).all()
    # every key with >=50 rows keeps exactly 50
    full = pd.Series(src).value_counts()
    kept = out.groupby("source").size()
    for s, c in full.items():
        assert kept.get(s, 0) == min(c, 50)
    # deterministic
    out2 = quota_per_key(ds, "source", "doc_id", 50).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])


def test_keyed_lag_block_boundaries(ray_session):
    n = 4000
    rng = np.random.default_rng(13)
    key = rng.integers(0, 3, n).astype(np.int64)  # fat keys span blocks
    order = rng.permutation(n).astype(np.int64)
    val = rng.integers(-50, 50, n).astype(np.int64)
    ds = rd.from_arrow(pa.table({
        "k": key, "o": order, "v": val
    })).repartition(7)
    out = (scan.keyed_lag(ds, "k", "o", "v", out_col="prev")
           .to_pandas().sort_values(["k", "o"]).reset_index(drop=True))
    srt = np.lexsort((order, key))
    df = pd.DataFrame({"k": key[srt], "v": val[srt]})
    exp = df.groupby("k")["v"].shift(1)
    got = out["prev"]
    assert got.isna().equals(exp.isna())
    assert np.array_equal(got.dropna().to_numpy(),
                          exp.dropna().to_numpy())


def test_keyed_rank_ties_span_blocks(ray_session):
    # few fat keys + coarse values -> tie runs guaranteed to span blocks
    n = 6000
    rng = np.random.default_rng(23)
    key = rng.integers(0, 3, n).astype(np.int64)
    val = rng.integers(0, 5, n).astype(np.int64)
    uid = rng.permutation(n).astype(np.int64)
    ds = rd.from_arrow(pa.table({
        "k": key, "v": val, "u": uid
    })).repartition(11)
    out = (scan.keyed_rank(ds, "k", "v", "u")
           .to_pandas().sort_values("u").reset_index(drop=True))
    df = pd.DataFrame({"k": key[np.argsort(uid)], "v": val[np.argsort(uid)]})
    exp_rnk = df.groupby("k")["v"].rank(method="min").astype(int)
    exp_dnk = df.groupby("k")["v"].rank(method="dense").astype(int)
    assert np.array_equal(out["rnk"].to_numpy(), exp_rnk.to_numpy())
    assert np.array_equal(out["dnk"].to_numpy(), exp_dnk.to_numpy())


def test_keyed_rank_single_value_key_many_blocks(ray_session):
    # one key, ONE value across many blocks: the run_len accumulation path
    n = 2000
    uid = np.random.default_rng(1).permutation(n).astype(np.int64)
    ds = rd.from_arrow(pa.table({
        "k": np.zeros(n, np.int64), "v": np.full(n, 7, np.int64),
        "u": uid})).repartition(9)
    out = scan.keyed_rank(ds, "k", "v", "u").to_pandas()
    assert (out["rnk"] == 1).all() and (out["dnk"] == 1).all()


def test_keyed_window_matches_duckdb(ray_session):
    import duckdb
    n = 5000
    rng = np.random.default_rng(7)
    key = rng.integers(0, 6, n).astype(np.int64)
    val = rng.integers(0, 4, n).astype(np.int64)   # coarse -> fat tie runs
    uid = rng.permutation(n).astype(np.int64)
    t = pa.table({"k": key, "v": val, "u": uid})
    out = (scan.keyed_window(rd.from_arrow(t).repartition(13),
                             "k", "v", "u", ntile=4)
           .to_pandas().sort_values("u").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT u, CAST(ROW_NUMBER() OVER w2 AS BIGINT) AS rn,
               CAST(RANK() OVER w AS BIGINT) AS rnk,
               CAST(DENSE_RANK() OVER w AS BIGINT) AS dnk,
               PERCENT_RANK() OVER w AS prnk,
               CUME_DIST() OVER w AS cume,
               CAST(NTILE(4) OVER w2 AS BIGINT) AS nt
        FROM t WINDOW w AS (PARTITION BY k ORDER BY v),
                      w2 AS (PARTITION BY k ORDER BY v, u)
        ORDER BY u
    """).fetchdf()
    for c in ("rn", "rnk", "dnk", "nt"):
        assert np.array_equal(out[c].to_numpy(), exp[c].to_numpy()), c
    for c in ("prnk", "cume"):
        assert np.array_equal(out[c].to_numpy(), exp[c].to_numpy()), c


def test_keyed_window_single_row_keys(ray_session):
    # n_k == 1 keys: percent_rank must be exactly 0.0, cume 1.0, ntile 1
    t = pa.table({"k": np.arange(40, dtype=np.int64),
                  "v": np.zeros(40, np.int64),
                  "u": np.arange(40, dtype=np.int64)})
    out = scan.keyed_window(rd.from_arrow(t).repartition(7),
                            "k", "v", "u").to_pandas()
    assert (out["prnk"] == 0.0).all() and (out["cume"] == 1.0).all()
    assert (out["nt"] == 1).all() and (out["rn"] == 1).all()


def test_keyed_window_one_key_one_value_many_blocks(ray_session):
    # the multi-boundary run-total accumulation path
    n = 3000
    uid = np.random.default_rng(3).permutation(n).astype(np.int64)
    t = pa.table({"k": np.zeros(n, np.int64),
                  "v": np.full(n, 9, np.int64), "u": uid})
    out = scan.keyed_window(rd.from_arrow(t).repartition(11),
                            "k", "v", "u").to_pandas()
    assert (out["rnk"] == 1).all() and (out["cume"] == 1.0).all()
    assert (out["prnk"] == 0.0).all()
    assert sorted(out["rn"]) == list(range(1, n + 1))


def test_keyed_lead_matches_pandas(ray_session):
    n = 4000
    rng = np.random.default_rng(11)
    key = rng.integers(0, 37, n).astype(np.int64)
    order = rng.permutation(n).astype(np.int64)
    val = rng.integers(0, 1000, n).astype(np.int64)
    ds = rd.from_arrow(pa.table({
        "k": key, "o": order, "x": val})).repartition(9)
    out = (scan.keyed_lead(ds, "k", "o", "x", out_col="nxt")
           .to_pandas().sort_values(["k", "o"]).reset_index(drop=True))
    df = (pd.DataFrame({"k": key, "o": order, "x": val})
          .sort_values(["k", "o"]).reset_index(drop=True))
    exp = df.groupby("k")["x"].shift(-1)
    assert out["nxt"].isna().equals(exp.isna())
    assert np.array_equal(out["nxt"].dropna().to_numpy(),
                          exp.dropna().to_numpy())


def test_keyed_rolling_matches_duckdb(ray_session):
    import duckdb
    n = 4000
    rng = np.random.default_rng(29)
    key = rng.integers(0, 5, n).astype(np.int64)   # fat keys span blocks
    order = rng.permutation(n).astype(np.int64)
    val = rng.integers(-50, 50, n).astype(np.int64)
    t = pa.table({"k": key, "o": order, "v": val})
    out = (scan.keyed_rolling(rd.from_arrow(t).repartition(12),
                              "k", "o", "v", n=10)
           .to_pandas().sort_values(["k", "o"]).reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT k, o,
          SUM(v) OVER w AS s, CAST(COUNT(v) OVER w AS BIGINT) AS c,
          MIN(v) OVER w AS mn, MAX(v) OVER w AS mx
        FROM t WINDOW w AS (PARTITION BY k ORDER BY o
          ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
        ORDER BY k, o
    """).fetchdf()
    assert np.array_equal(out["roll_sum"].to_numpy(),
                          exp["s"].to_numpy().astype(np.int64))
    assert np.array_equal(out["roll_cnt"].to_numpy(), exp["c"].to_numpy())
    assert np.array_equal(out["roll_min"].to_numpy(), exp["mn"].to_numpy())
    assert np.array_equal(out["roll_max"].to_numpy(), exp["mx"].to_numpy())


def test_keyed_rolling_frame1_and_single_key(ray_session):
    nrows = 500
    order = np.random.default_rng(2).permutation(nrows).astype(np.int64)
    v = np.arange(nrows, dtype=np.int64)
    t = pa.table({"k": np.zeros(nrows, np.int64), "o": order, "v": v})
    out1 = (scan.keyed_rolling(rd.from_arrow(t).repartition(7),
                               "k", "o", "v", n=1)
            .to_pandas().sort_values("o").reset_index(drop=True))
    assert np.array_equal(out1["roll_sum"].to_numpy(),
                          out1["v"].to_numpy())
    assert (out1["roll_cnt"] == 1).all()
    # n=3 over a single key across many blocks: boundary carries
    out3 = (scan.keyed_rolling(rd.from_arrow(t).repartition(9),
                               "k", "o", "v", n=3)
            .to_pandas().sort_values("o").reset_index(drop=True))
    sv = out3["v"].to_numpy()
    exp = pd.Series(sv).rolling(3, min_periods=1).sum().to_numpy()
    assert np.array_equal(out3["roll_sum"].to_numpy(),
                          exp.astype(np.int64))


def test_zipf_fit_reference(ray_session):
    """Slope matches the straight quantized-ln LSQ on a synthetic
    perfect-Zipf corpus (alpha ~ 1)."""
    import math

    import ray.data as rd

    from zen3geo_ray.stages.ngrams import zipf_fit

    # token w_r appears floor(1000/r) times -> near-perfect Zipf
    words = []
    for r in range(1, 21):
        words += [f"w{r:02d}"] * (1000 // r)
    text = " ".join(words)
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array([text])})
    out = zipf_fit(rd.from_arrow(t), top_v=20,
                   n_buckets=2).to_pandas().iloc[0]
    sc = float(1 << 16)
    xs = [math.floor(math.log(float(r)) * sc) for r in range(1, 21)]
    ys = [math.floor(math.log(float(1000 // r)) * sc)
          for r in range(1, 21)]
    v, sx, sy = 20, sum(xs), sum(ys)
    num = v * sum(a * b for a, b in zip(xs, ys)) - sx * sy
    den = v * sum(a * a for a in xs) - sx * sx
    assert (int(out["num"]), int(out["den"])) == (num, den)
    assert out["slope"] == float(num) / float(den)
    assert 0.9 < out["alpha"] < 1.1
