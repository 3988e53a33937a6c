"""Range-join tests: sweep kernel goldens + broadcast vs bucketed parity."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from zen3geo_ray.stages.rangejoin import (
    _match_intervals,
    bucketed_range_join,
    make_broadcast_range_join,
)


def test_match_intervals_overlapping():
    v = np.array([1.0, 5.0, 9.0, 20.0])
    lo = np.array([0.0, 4.0, 4.5, 30.0])
    hi = np.array([6.0, 10.0, 5.5, 40.0])
    vi, ii = _match_intervals(v, lo, hi)
    pairs = sorted(zip(vi.tolist(), ii.tolist()))
    # v=1 -> [0,6); v=5 -> [0,6),[4,10),[4.5,5.5); v=9 -> [4,10); v=20 -> none
    assert pairs == [(0, 0), (1, 0), (1, 1), (1, 2), (2, 1)]


def test_match_intervals_half_open():
    vi, ii = _match_intervals(
        np.array([10.0]), np.array([0.0, 10.0]), np.array([10.0, 20.0])
    )
    # hi exclusive, lo inclusive: 10 matches only [10, 20)
    assert (vi.tolist(), ii.tolist()) == ([0], [1])


def test_broadcast_vs_bucketed_range_join(ray_session):
    rng = np.random.default_rng(17)
    n, m = 3000, 80
    vals = rng.uniform(0, 1000, n)
    left = pa.table({"lid": pa.array(np.arange(n), pa.int64()),
                     "v": pa.array(vals, pa.float64())})
    lo = rng.uniform(0, 950, m)
    length = rng.uniform(1, 60, m)
    right = pa.table({"win": pa.array(np.arange(m), pa.int64()),
                      "lo": pa.array(lo, pa.float64()),
                      "hi": pa.array(lo + length, pa.float64())})

    blob = {"lo": lo, "hi": lo + length,
            "keep": {"win": np.arange(m, dtype=np.int64)},
            "keep_types": {"win": pa.int64()}}
    bro = (
        rd.from_arrow(left)
        .map_batches(make_broadcast_range_join(blob, value_col="v"),
                     batch_format="pyarrow")
        .to_pandas()
    )
    buck = bucketed_range_join(
        rd.from_arrow(left), rd.from_arrow(right),
        value_col="v", lo_col="lo", hi_col="hi",
        bucket_width=64.0, n_buckets=8,
    ).to_pandas()
    a = sorted(zip(bro["lid"], bro["win"]))
    b = sorted(zip(buck["lid"].astype(np.int64), buck["win"].astype(np.int64)))
    assert len(a) > 0
    assert a == b


def test_keyed_range_join_matches_pandas(ray_session):
    """by= + interval join: every (key, lo<=v<hi) pair, once — verified
    against a brute-force pandas merge on random data with overlapping
    per-key intervals spanning multiple slabs."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages.rangejoin import keyed_range_join

    rng = np.random.default_rng(11)
    nl, nr = 4000, 300
    left = pd.DataFrame({
        "user": rng.integers(0, 50, nl),
        "t": rng.integers(0, 10_000, nl).astype(np.int64),
        "lid": np.arange(nl, dtype=np.int64),
    })
    lo = rng.integers(0, 9_000, nr).astype(np.int64)
    right = pd.DataFrame({
        "r_user": rng.integers(0, 50, nr),
        "lo": lo,
        "hi": lo + rng.integers(1, 3_000, nr).astype(np.int64),
        "rid": np.arange(nr, dtype=np.int64),
    })
    got = keyed_range_join(
        rd.from_arrow(pa.Table.from_pandas(left)).repartition(4),
        rd.from_arrow(pa.Table.from_pandas(right)).repartition(3),
        left_key="user", right_key="r_user", value_col="t",
        lo_col="lo", hi_col="hi", bucket_width=512, n_buckets=16,
    ).to_pandas()
    exp = left.merge(right, left_on="user", right_on="r_user")
    exp = exp[(exp["t"] >= exp["lo"]) & (exp["t"] < exp["hi"])]
    gk = sorted(zip(got["lid"], got["rid"]))
    ek = sorted(zip(exp["lid"], exp["rid"]))
    assert gk == ek
    assert len(gk) == len(set(gk))  # no double-counted pair


def test_keyed_range_join_slab_edges(ray_session):
    """Half-open boundaries on exact slab edges (hi on an edge must not
    leak into the next slab; v == lo included, v == hi excluded)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages.rangejoin import keyed_range_join

    left = pd.DataFrame({"k": [1, 1, 1, 2], "t": np.array([0, 512, 1024, 512], dtype=np.int64),
                         "lid": np.arange(4, dtype=np.int64)})
    right = pd.DataFrame({"rk": [1, 2], "lo": np.array([0, 512], dtype=np.int64),
                          "hi": np.array([1024, 1024], dtype=np.int64),
                          "rid": np.array([0, 1], dtype=np.int64)})
    got = keyed_range_join(
        rd.from_arrow(pa.Table.from_pandas(left)),
        rd.from_arrow(pa.Table.from_pandas(right)),
        left_key="k", right_key="rk", value_col="t",
        lo_col="lo", hi_col="hi", bucket_width=512, n_buckets=4,
    ).to_pandas()
    pairs = sorted(zip(got["lid"], got["rid"]))
    assert pairs == [(0, 0), (1, 0), (3, 1)]  # t=1024 == hi excluded


def test_lpm_lookup_laminar(ray_session):
    """Longest-prefix semantics on a nested laminar family: points in
    a child match the child, points only in the parent match the
    parent, points outside everything get (-1, -1)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages.rangejoin import lpm_lookup

    table = pa.table({
        "lo": pa.array([0, 100, 16, 40, 18], pa.int64()),
        "hi": pa.array([99, 199, 31, 47, 19], pa.int64()),
        "len": pa.array([8, 8, 16, 16, 24], pa.int64()),
        "rid": pa.array([1, 2, 10, 11, 20], pa.int64())})
    pts = pa.table({"pid": pa.array(list(range(7)), pa.int64()),
                    "x": pa.array([5, 18, 30, 45, 150, 250, 99],
                                  pa.int64())})
    out = lpm_lookup(rd.from_arrow(pts).repartition(2), table,
                     x_col="x").to_pandas().set_index("pid")
    want = {0: (8, 1),    # parent only
            1: (24, 20),  # deepest of three nested
            2: (16, 10),  # middle child
            3: (16, 11),  # second child
            4: (8, 2),    # second parent
            5: (-1, -1),  # outside
            6: (8, 1)}    # parent hi boundary inclusive
    for pid, (ln, rid) in want.items():
        assert (int(out.loc[pid, "len"]), int(out.loc[pid, "rid"])) \
            == (ln, rid), pid
