"""Distributed prefix scan + sequence packing tests."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from zen3geo_ray.stages import scan


def _sorted_ds(n=5000, seed=0, nblocks=7):
    rng = np.random.default_rng(seed)
    t = pa.table({
        "doc_id": np.arange(n, dtype=np.int64),
        "tok": rng.integers(1, 500, n).astype(np.int64),
    })
    return t, rd.from_arrow(t).repartition(nblocks)


def test_prefix_scan_matches_numpy(ray_session):
    t, ds = _sorted_ds()
    out = scan.prefix_scan(ds, "doc_id", "tok").to_pandas().sort_values("doc_id")
    exp = np.cumsum(t.column("tok").to_numpy())
    assert np.array_equal(out["tok_cum"].to_numpy(), exp)


def test_prefix_scan_exclusive(ray_session):
    t, ds = _sorted_ds(n=1000, nblocks=4)
    out = scan.prefix_scan(ds, "doc_id", "tok", inclusive=False).to_pandas().sort_values("doc_id")
    v = t.column("tok").to_numpy()
    exp = np.cumsum(v) - v
    assert np.array_equal(out["tok_cum"].to_numpy(), exp)


def test_prefix_scan_unsorted_within_block(ray_session):
    # rows shuffled WITHIN each contiguous block range: scan must sort locally
    rng = np.random.default_rng(3)
    n = 1200
    ids = np.arange(n, dtype=np.int64)
    tok = rng.integers(1, 9, n).astype(np.int64)
    blocks = []
    for s in range(0, n, 300):
        perm = rng.permutation(300)
        blocks.append(pa.table({"doc_id": ids[s:s+300][perm],
                                "tok": tok[s:s+300][perm]}))
    ds = rd.from_arrow(blocks)
    out = scan.prefix_scan(ds, "doc_id", "tok").to_pandas().sort_values("doc_id")
    assert np.array_equal(out["tok_cum"].to_numpy(), np.cumsum(tok))


def test_prefix_scan_overlap_raises(ray_session):
    a = pa.table({"doc_id": np.array([0, 5], dtype=np.int64),
                  "tok": np.ones(2, dtype=np.int64)})
    b = pa.table({"doc_id": np.array([3, 9], dtype=np.int64),
                  "tok": np.ones(2, dtype=np.int64)})
    with pytest.raises(ValueError, match="overlap"):
        scan.prefix_scan(rd.from_arrow([a, b]), "doc_id", "tok")


def test_pack_sequences_straddle_convention(ray_session):
    t, ds = _sorted_ds(n=2000, seed=5, nblocks=5)
    budget = 10_000
    out = scan.pack_sequences(ds, "doc_id", "tok", budget).to_pandas().sort_values("doc_id")
    v = t.column("tok").to_numpy()
    cum = np.cumsum(v)
    exp_shard = (cum - v) // budget
    assert np.array_equal(out["shard"].to_numpy(), exp_shard)
    # shards are contiguous runs in doc order and roughly budget-sized
    sh = out["shard"].to_numpy()
    assert (np.diff(sh) >= 0).all()
    per = out.groupby("shard")["tok"].sum().to_numpy()
    assert (per[:-1] >= budget - 500).all()  # full shards reach ~budget


def test_pack_span_index_golden(ray_session):
    """Concat-and-split spans: tokens [3,5,4,0,2] budget 4 -> doc1
    straddles the chunk0/1 boundary, doc3 (0 tokens) emits nothing,
    chunk boundaries land exactly where the concatenation cuts."""
    t = pa.table({"doc_id": np.arange(5, dtype=np.int64),
                  "tok": np.array([3, 5, 4, 0, 2], dtype=np.int64)})
    out = (scan.pack_span_index(rd.from_arrow(t).repartition(2),
                                "doc_id", "tok", budget=4)
           .to_pandas().sort_values(["doc_id", "chunk_id"])
           .reset_index(drop=True))
    rows = list(map(tuple, out[["doc_id", "chunk_id", "doc_off",
                                "chunk_off", "n_tok"]].to_numpy()))
    assert rows == [
        (0, 0, 0, 0, 3),           # start 0..3
        (1, 0, 0, 3, 1),           # start 3, 1 token finishes chunk 0
        (1, 1, 1, 0, 4),           # remaining 4 fill chunk 1
        (2, 2, 0, 0, 4),           # start 8..12: exactly chunk 2
        (4, 3, 0, 0, 2),           # start 12..14 (doc3 skipped)
    ]


def test_pack_span_index_invariants(ray_session):
    """Random corpus: per-doc slices cover every token exactly once,
    every chunk except the last sums to exactly budget, and slices tile
    each chunk contiguously."""
    t, ds = _sorted_ds(n=1500, seed=11, nblocks=6)
    budget = 777
    out = (scan.pack_span_index(ds, "doc_id", "tok", budget)
           .to_pandas())
    v = t.column("tok").to_numpy()
    # per-doc coverage
    per_doc = out.groupby("doc_id")["n_tok"].sum()
    assert np.array_equal(per_doc.to_numpy(), v[per_doc.index.to_numpy()])
    assert per_doc.to_numpy().sum() == v.sum()
    # chunk totals
    per_chunk = (out.groupby("chunk_id")["n_tok"].sum()
                 .sort_index().to_numpy())
    assert (per_chunk[:-1] == budget).all()
    assert per_chunk[-1] == v.sum() - budget * (len(per_chunk) - 1)
    # contiguous tiling inside each chunk
    for _, g in out.sort_values(["chunk_id", "chunk_off"]).groupby("chunk_id"):
        off = g["chunk_off"].to_numpy()
        nt = g["n_tok"].to_numpy()
        assert off[0] == 0
        assert np.array_equal(off[1:], (off + nt)[:-1])


def test_quantile_normalize_golden(ray_session):
    """Two groups of different sizes map onto the pooled order: the
    mapped distribution is identical across groups (the defining
    property), ranks are exact floor-division picks."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages.scan import quantile_normalize

    # group a: values 10,20,30,40 (uids 0..3); group b: 5,15 (uids 4,5)
    df = pd.DataFrame({
        "uid": np.arange(6, dtype=np.int64),
        "g": ["a"] * 4 + ["b"] * 2,
        "v": np.array([10, 20, 30, 40, 5, 15], dtype=np.int64)})
    out = quantile_normalize(
        rd.from_arrow(pa.Table.from_pandas(df)).repartition(3),
        key_col="g", value_col="v", uid_col="uid",
        n_buckets=2).to_pandas().sort_values("uid").reset_index(drop=True)
    # pooled order by (v, uid): 5,10,15,20,30,40 -> G[1..6]
    G = {1: 5, 2: 10, 3: 15, 4: 20, 5: 30, 6: 40}
    # group a (n=4): r=1..4 -> (r*6)//4 = 1,3,4,6
    # group b (n=2): r=1,2 -> (r*6)//2 = 3,6
    want_rank = {0: 1, 1: 3, 2: 4, 3: 6, 4: 3, 5: 6}
    for r in out.itertuples():
        assert int(r.g_rank) == want_rank[int(r.uid)]
        assert int(r.q_value) == G[int(r.g_rank)]
    # both groups' max maps to the same global max value
    assert int(out.loc[3, "q_value"]) == int(out.loc[5, "q_value"]) == 40


def test_quantile_normalize_identity_single_group(ray_session):
    """With one group the mapping is the identity on values."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages.scan import quantile_normalize

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "uid": np.arange(50, dtype=np.int64),
        "g": ["x"] * 50,
        "v": rng.integers(0, 20, 50).astype(np.int64)})
    out = quantile_normalize(
        rd.from_arrow(pa.Table.from_pandas(df)).repartition(4),
        key_col="g", value_col="v", uid_col="uid",
        n_buckets=2).to_pandas()
    assert (out["q_value"].to_numpy() == out["v"].to_numpy()).all()
