"""Data-mixing samplers (stages/partition.py) and min-max scaling
(stages/analytic.py) vs brute-force references."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from zen3geo_ray.functions.hashing import knuth_hash
from zen3geo_ray.stages.analytic import minmax_scale
from zen3geo_ray.stages.partition import temperature_sample, weighted_bernoulli


def _tbl(n=3000, seed=7, nblocks=5):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": rng.choice([f"s{i}" for i in range(8)], n,
                             p=[0.4, 0.2, 0.1, 0.1, 0.08, 0.06, 0.04, 0.02]),
        "w": rng.integers(1, 2000, n).astype(np.int64),
    })
    return df, rd.from_arrow(pa.Table.from_pandas(df)).repartition(nblocks)


def test_temperature_sample_exact_survivors(ray_session):
    df, ds = _tbl()
    out = temperature_sample(ds, "source", "doc_id").to_pandas()
    ref = df.assign(__h=knuth_hash(df["doc_id"].to_numpy()))
    exp_ids = set()
    for s, g in ref.groupby("source"):
        m = max(1, int(np.floor(np.sqrt(float(len(g))))))
        exp_ids |= set(
            g.sort_values(["__h", "doc_id"]).head(m)["doc_id"])
    assert set(out["doc_id"]) == exp_ids
    # per-source size == max(1, floor(sqrt(n)))
    sizes = out.groupby("source").size()
    for s, g in df.groupby("source"):
        assert sizes[s] == max(1, int(np.floor(np.sqrt(float(len(g))))))


def test_temperature_sample_partitioning_independent(ray_session):
    df, _ = _tbl()
    a = temperature_sample(
        rd.from_arrow(pa.Table.from_pandas(df)).repartition(2),
        "source", "doc_id").to_pandas()
    b = temperature_sample(
        rd.from_arrow(pa.Table.from_pandas(df)).repartition(11),
        "source", "doc_id").to_pandas()
    assert set(a["doc_id"]) == set(b["doc_id"])


def test_weighted_bernoulli(ray_session):
    df, ds = _tbl()
    out = weighted_bernoulli(ds, "doc_id", "w", denom_log2=10).to_pandas()
    h = knuth_hash(df["doc_id"].to_numpy()).astype(np.int64)
    keep = h * 1024 < np.minimum(df["w"].to_numpy(), 1024) * (1 << 32)
    assert set(out["doc_id"]) == set(df.loc[keep, "doc_id"])
    # higher weight -> higher survival rate (sanity on determinism too)
    lo = df[df["w"] < 300]
    hi = df[df["w"] > 1024]
    assert keep[hi.index].mean() == 1.0  # p clamps to 1 at w >= 1024
    assert keep[lo.index].mean() < 0.5


def test_minmax_scale(ray_session):
    df, ds = _tbl()
    out = minmax_scale(
        ds, key_cols=["source"], value_col="w").to_pandas()
    stats = df.groupby("source")["w"].agg(["min", "max"])
    exp = (df["w"].to_numpy()
           - stats.loc[df["source"], "min"].to_numpy()).astype(np.float64)
    rng = (stats.loc[df["source"], "max"].to_numpy()
           - stats.loc[df["source"], "min"].to_numpy()).astype(np.float64)
    exp = exp / rng
    got = out.set_index("doc_id").loc[df["doc_id"], "scaled"].to_numpy()
    np.testing.assert_array_equal(got, exp)


def test_minmax_degenerate_group_null(ray_session):
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "source": pa.array(["a", "a", "b"]),
        "w": pa.array([5, 9, 7], pa.int64()),
    })
    out = minmax_scale(rd.from_arrow(t), key_cols=["source"],
                       value_col="w").to_pandas().set_index("doc_id")
    assert out.loc[0, "scaled"] == 0.0 and out.loc[1, "scaled"] == 1.0
    assert np.isnan(out.loc[2, "scaled"])


def test_cooccurrence_pairs(ray_session):
    from zen3geo_ray.stages.sequence import cooccurrence_pairs
    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "u": rng.integers(0, 80, 2000).astype(np.int64),
        "t": rng.choice(["a", "b", "c", "d", "e"], 2000),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(4)
    out = cooccurrence_pairs(ds, key_col="u", item_col="t").to_pandas()
    got = {(r.t1, r.t2): r.n for r in out.itertuples()}
    exp: dict = {}
    for _, g in df.groupby("u"):
        items = sorted(set(g["t"]))
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                k = (items[i], items[j])
                exp[k] = exp.get(k, 0) + 1
    assert got == exp


def test_winsorize(ray_session):
    from zen3geo_ray.stages.analytic import winsorize
    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "i": np.arange(3000, dtype=np.int64),
        "g": rng.choice(["x", "y"], 3000),
        "v": rng.integers(0, 10_000, 3000).astype(np.int64),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(5)
    out = winsorize(ds, key_cols=["g"], value_col="v",
                    q_lo=0.1, q_hi=0.9).to_pandas().set_index("i")
    for g, grp in df.groupby("g"):
        lo = np.quantile(grp["v"].to_numpy(), 0.1)  # type-7 = linear interp
        hi = np.quantile(grp["v"].to_numpy(), 0.9)
        exp = np.clip(grp["v"].to_numpy().astype(np.float64), lo, hi)
        np.testing.assert_allclose(
            out.loc[grp["i"], "w"].to_numpy(), exp, rtol=1e-12)
        assert (out.loc[grp["i"], "w"] >= lo - 1e-9).all()
        assert (out.loc[grp["i"], "w"] <= hi + 1e-9).all()
