"""pivot_table wide conditional aggregation + ordered group_concat."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from zen3geo_ray.stages.pivot import (
    distinct_small,
    group_concat,
    pivot_table,
    sanitize,
)


def _ds(n=2000, seed=4, nblocks=5):
    rng = np.random.default_rng(seed)
    t = pa.table({
        "k": rng.integers(0, 300, n).astype(np.int64),
        "cat": pa.array(np.array(["A-1", "B 2", "c"]
                                 )[rng.integers(0, 3, n)], pa.string()),
        "v": rng.integers(-10, 100, n).astype(np.int64),
        "o": np.arange(n, dtype=np.int64),
    })
    return t, rd.from_arrow(t).repartition(nblocks)


def test_sanitize_and_distinct(ray_session):
    assert sanitize("A-1") == "a_1" and sanitize("B 2") == "b_2"
    _, ds = _ds()
    assert distinct_small(ds, "cat") == ["A-1", "B 2", "c"]


def test_pivot_table_counts_and_sums(ray_session):
    t, ds = _ds()
    out = (pivot_table(ds, ["k"], "cat", "v").to_pandas()
           .sort_values("k").reset_index(drop=True))
    df = t.to_pandas()
    for cat, frag in [("A-1", "a_1"), ("B 2", "b_2"), ("c", "c")]:
        exp_n = df[df["cat"] == cat].groupby("k").size()
        exp_s = df[df["cat"] == cat].groupby("k")["v"].sum()
        got_n = out.set_index("k")[f"n_{frag}"]
        got_s = out.set_index("k")[f"sum_{frag}"]
        assert got_n.eq(exp_n.reindex(got_n.index, fill_value=0)).all()
        assert got_s.eq(exp_s.reindex(got_s.index, fill_value=0)).all()
    assert len(out) == df["k"].nunique()


def test_pivot_count_only_no_value(ray_session):
    _, ds = _ds(300)
    out = pivot_table(ds, ["k"], "cat").to_pandas()
    assert set(c for c in out.columns if c != "k") == \
        {"n_a_1", "n_b_2", "n_c"}


def test_group_concat_ordered(ray_session):
    t, ds = _ds(500, seed=9)
    out = (group_concat(ds, ["k"], "cat", ["o"], sep="|").to_pandas()
           .sort_values("k").reset_index(drop=True))
    df = t.to_pandas().sort_values("o")
    exp = df.groupby("k")["cat"].agg("|".join)
    got = out.set_index("k")["cat_seq"]
    assert got.eq(exp.reindex(got.index)).all()


def test_melt_stacks_columns(ray_session):
    t = pa.table({"id": np.arange(4, dtype=np.int64),
                  "a": np.array([1, 2, 3, 4], np.int64),
                  "b": np.array([10, 20, 30, 40], np.int64)})
    from zen3geo_ray.stages.pivot import melt
    out = (melt(rd.from_arrow(t).repartition(2), ["id"], ["a", "b"])
           .to_pandas().sort_values(["id", "variable"])
           .reset_index(drop=True))
    assert len(out) == 8
    assert out[out["variable"] == "a"]["value"].tolist() == [1, 2, 3, 4]
    assert out[out["variable"] == "b"]["value"].tolist() == [10, 20, 30, 40]


def test_histogram_clamps_and_zero_bins(ray_session):
    from zen3geo_ray.stages.profile import histogram
    x = np.array([-5, 0, 9, 10, 19, 95, 1000], np.int64)
    ds = rd.from_arrow(pa.table({"x": x})).repartition(3)
    out = (histogram(ds, "x", lo=0, width=10, n_bins=5).to_pandas()
           .sort_values("bin").reset_index(drop=True))
    # bins: [-5,0,9]->0, [10,19]->1, none->2,3, [95,1000]->4 (clamped)
    assert out["bin"].tolist() == [0, 1, 2, 3, 4]
    assert out["n"].tolist() == [3, 2, 0, 0, 2]
