"""Hash-join tests: built-in path, bucketed fallback, query parity."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from zen3geo_ray.stages.hashjoin import bucketed_join, equi_join


@pytest.fixture
def sides():
    rng = np.random.default_rng(3)
    left = pa.table(
        {
            "k": rng.integers(0, 50, 500),
            "lv": rng.uniform(0, 10, 500),
        }
    )
    right = pa.table(
        {
            "k": np.arange(40),  # keys 40..49 unmatched on the left->right
            "rname": [f"r{i}" for i in range(40)],
        }
    )
    return left, right


def _expected(left, right, how):
    return (
        left.to_pandas()
        .merge(right.to_pandas(), on="k", how=how)
        .sort_values(["k", "lv"], kind="mergesort")
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("how", ["inner", "left"])
def test_bucketed_join_matches_pandas(ray_session, sides, how):
    left, right = sides
    out = (
        bucketed_join(
            rd.from_arrow(left).repartition(4),
            rd.from_arrow(right).repartition(2),
            ["k"],
            how=how,
            n_buckets=8,
        )
        .to_pandas()
        .sort_values(["k", "lv"], kind="mergesort")
        .reset_index(drop=True)
    )
    exp = _expected(left, right, how)
    assert len(out) == len(exp)
    assert np.array_equal(out["k"], exp["k"])
    assert np.allclose(out["lv"], exp["lv"])
    assert out["rname"].fillna("").tolist() == exp["rname"].fillna("").tolist()


def test_equi_join_inner(ray_session, sides):
    left, right = sides
    out = (
        equi_join(
            rd.from_arrow(left),
            rd.from_arrow(right),
            ["k"],
            num_partitions=4,
        )
        .to_pandas()
        .sort_values(["k", "lv"], kind="mergesort")
        .reset_index(drop=True)
    )
    exp = _expected(left, right, "inner")
    assert len(out) == len(exp)
    assert np.array_equal(out["k"].to_numpy(), exp["k"].to_numpy())


def test_bucketed_join_rejects_overlapping_columns(ray_session):
    a = rd.from_arrow(pa.table({"k": [1], "v": [1.0]}))
    b = rd.from_arrow(pa.table({"k": [1], "v": [2.0]}))
    with pytest.raises(ValueError, match="overlap"):
        bucketed_join(a, b, ["k"])


def test_join_agg_query_matches_oracle(ray_session):
    import duckdb

    from zen3geo_ray.pipelines.queries import build_oracles, q_join_agg

    sf = "/root/testdata/sf0.001"
    got = q_join_agg(sf).to_pandas()
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    exp = con.sql(build_oracles()["join_agg"]).fetchdf()
    g = got.sort_values("o_orderpriority").reset_index(drop=True)
    e = exp.sort_values("o_orderpriority").reset_index(drop=True)
    assert g["o_orderpriority"].tolist() == e["o_orderpriority"].tolist()
    assert g["n"].astype("int64").tolist() == e["n"].astype("int64").tolist()
    assert np.allclose(g["l_quantity_sum"], e["l_quantity_sum"])


def test_bloom_anti_join_matches_bucketed(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.functions.bloom import bloom_anti_join
    from zen3geo_ray.stages.hashjoin import bucketed_join

    rng = np.random.default_rng(9)
    left = pa.table({"k": pa.array(rng.integers(0, 5000, 8000), pa.int64())})
    right = pa.table(
        {"k": pa.array(np.unique(rng.integers(0, 5000, 2000)), pa.int64())}
    )
    lds, rds = rd.from_arrow(left), rd.from_arrow(right)
    exact = bucketed_join(lds, rds, ["k"], how="anti", n_buckets=8).to_pandas()
    bloomed = bloom_anti_join(
        lds, rds, "k", n_keys_hint=2000, n_buckets=8
    ).to_pandas()
    assert sorted(bloomed["k"]) == sorted(exact["k"])


def test_bloom_exact_semi_join_matches_bucketed(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.functions.bloom import bloom_exact_semi_join
    from zen3geo_ray.stages.hashjoin import bucketed_join

    rng = np.random.default_rng(11)
    left = pa.table({"k": pa.array(rng.integers(0, 5000, 8000), pa.int64()),
                     "pay": pa.array(np.arange(8000), pa.int64())})
    right = pa.table(
        {"k": pa.array(np.unique(rng.integers(0, 5000, 1500)), pa.int64())}
    )
    lds, rds = rd.from_arrow(left), rd.from_arrow(right)
    exact = bucketed_join(lds, rds, ["k"], how="semi", n_buckets=8).to_pandas()
    bloomed = bloom_exact_semi_join(
        lds, rds, "k", n_keys_hint=1500, n_buckets=8
    ).to_pandas()
    assert sorted(zip(bloomed["k"], bloomed["pay"])) \
        == sorted(zip(exact["k"], exact["pay"]))


def test_sort_merge_join_matches_hash(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages.hashjoin import bucketed_join, sort_merge_join

    rng = np.random.default_rng(10)
    left = pa.table({"k": pa.array(rng.integers(0, 300, 2000), pa.int64()),
                     "lv": pa.array(np.arange(2000), pa.int64())})
    right = pa.table({"k": pa.array(rng.integers(0, 300, 500), pa.int64()),
                      "rv": pa.array(np.arange(500), pa.int64())})
    lds, rds = rd.from_arrow(left), rd.from_arrow(right)
    h = bucketed_join(lds, rds, ["k"], n_buckets=8).to_pandas()
    s = sort_merge_join(lds, rds, ["k"], n_buckets=8).to_pandas()
    key = ["k", "lv", "rv"]
    assert (
        h.sort_values(key).reset_index(drop=True)[key]
        .equals(s.sort_values(key).reset_index(drop=True)[key])
    )


def test_asof_join_golden(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages.hashjoin import asof_join

    left = pa.table({"k": pa.array([1, 1, 2, 3], pa.int64()),
                     "t": pa.array([10, 20, 5, 7], pa.int64()),
                     "lid": pa.array([0, 1, 2, 3], pa.int64())})
    right = pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                      "t": pa.array([9, 15, 99], pa.int64()),
                      "v": pa.array([100, 200, 300], pa.int64())})
    out = (
        asof_join(rd.from_arrow(left), rd.from_arrow(right),
                  by=["k"], on="t", n_buckets=4)
        .to_pandas().sort_values("lid").reset_index(drop=True)
    )
    # lid0 (k1,t10) -> v100 (t9); lid1 (k1,t20) -> v200 (t15);
    # lid2 (k2,t5) -> none (right t99 > 5); lid3 (k3) -> none
    assert out["v"].tolist()[:2] == [100.0, 200.0]
    assert pd.isna(out["v"].iloc[2]) and pd.isna(out["v"].iloc[3])


def test_asof_join_matches_pandas_merge_asof(ray_session):
    """Distributed asof == single-frame pd.merge_asof on random data."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages.hashjoin import asof_join

    rng = np.random.default_rng(33)
    nl, nr = 800, 300
    left = pd.DataFrame({
        "k": rng.integers(0, 20, nl),
        "t": rng.integers(0, 10_000, nl),
        "lid": np.arange(nl),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 20, nr),
        "t": rng.integers(0, 10_000, nr),
        "v": np.arange(nr),
    }).drop_duplicates(["k", "t"])
    exp = pd.merge_asof(
        left.sort_values("t", kind="mergesort"),
        right.sort_values("t", kind="mergesort"),
        on="t", by="k", direction="backward",
    ).sort_values("lid").reset_index(drop=True)
    got = (
        asof_join(
            rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False)),
            rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False)),
            by=["k"], on="t", n_buckets=8,
        )
        .to_pandas().sort_values("lid").reset_index(drop=True)
    )
    assert (got["lid"].to_numpy() == exp["lid"].to_numpy()).all()
    gv, ev = got["v"].to_numpy(dtype=float), exp["v"].to_numpy(dtype=float)
    assert ((gv == ev) | (np.isnan(gv) & np.isnan(ev))).all()


def test_broadcast_semi_both_paths_and_anti(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages.hashjoin import broadcast_semi

    rng = np.random.default_rng(31)
    left = pa.table({"k": pa.array(rng.integers(0, 100, 5000), pa.int64()),
                     "v": pa.array(np.arange(5000), pa.int64())})
    keys = pa.table({"k": pa.array([3, 7, 7, 42, 99, 120], pa.int64())})
    want_semi = left.to_pandas()[left.to_pandas()["k"].isin([3, 7, 42, 99])]
    for thr in (2_000_000, 0):  # broadcast path, then bucketed fallback
        got = broadcast_semi(rd.from_arrow(left).repartition(4),
                             rd.from_arrow(keys), "k",
                             threshold=thr, n_buckets=4).to_pandas()
        assert sorted(got["v"]) == sorted(want_semi["v"]), thr
        anti = broadcast_semi(rd.from_arrow(left).repartition(4),
                              rd.from_arrow(keys), "k", anti=True,
                              threshold=thr, n_buckets=4).to_pandas()
        assert sorted(anti["v"]) == sorted(
            set(range(5000)) - set(want_semi["v"])), thr
    # empty key side keeps nothing (semi) / everything (anti)
    empty = rd.from_arrow(keys.slice(0, 0))
    assert broadcast_semi(rd.from_arrow(left), empty, "k").count() == 0
    assert broadcast_semi(rd.from_arrow(left), empty, "k",
                          anti=True).count() == 5000
