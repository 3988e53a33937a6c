"""Round-4 regression tests: int64 exactness through padded bucketed
joins (ADVICE high — values above 2^53 used to corrupt via the pandas
float64 fallback), kcore empty-core short-circuit, pregel actor-pool
hygiene, string doc ids through the incremental MinHash store, and the
order-unbiased partition samplers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

BIG = 2 ** 60 + 1  # far above 2^53 — float64 cannot represent it


def _arrow(ds) -> pa.Table:
    parts = [pa.table(b) if not isinstance(b, pa.Table) else b
             for b in ds.iter_batches(batch_format="pyarrow")]
    if not parts:
        return pa.table({})
    return pa.concat_tables(parts, promote_options="default")


def test_bucketed_join_int64_payload_exact(ray_session):
    import ray.data as rd

    from zen3geo_ray.stages.hashjoin import bucketed_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "dst": pa.array([BIG, BIG + 2, 7], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "val": pa.array([2 ** 61 + 5, 11], pa.int64()),
    }))
    t = _arrow(bucketed_join(left, right, ["k"]))
    got = dict(zip(t.column("k").to_pylist(), t.column("dst").to_pylist()))
    assert got == {1: BIG, 2: BIG + 2}
    vals = dict(zip(t.column("k").to_pylist(), t.column("val").to_pylist()))
    assert vals[1] == 2 ** 61 + 5


def test_bucketed_left_join_nulls_stay_int64(ray_session):
    import ray.data as rd

    from zen3geo_ray.stages.hashjoin import bucketed_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "dst": pa.array([BIG, BIG + 2, 7], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([1], pa.int64()),
        "val": pa.array([2 ** 61 + 5], pa.int64()),
    }))
    t = _arrow(bucketed_join(left, right, ["k"], how="left"))
    assert t.schema.field("val").type == pa.int64()
    vals = dict(zip(t.column("k").to_pylist(), t.column("val").to_pylist()))
    assert vals == {1: 2 ** 61 + 5, 2: None, 3: None}
    dst = dict(zip(t.column("k").to_pylist(), t.column("dst").to_pylist()))
    assert dst == {1: BIG, 2: BIG + 2, 3: 7}


def test_asof_join_int64_payload_exact(ray_session):
    import ray.data as rd

    from zen3geo_ray.stages.hashjoin import asof_join

    left = rd.from_arrow(pa.table({
        "u": pa.array([1, 1], pa.int64()),
        "t": pa.array([5, 1], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "u": pa.array([1], pa.int64()),
        "t": pa.array([3], pa.int64()),
        "payload": pa.array([2 ** 61 + 7], pa.int64()),
    }))
    t = _arrow(asof_join(left, right, ["u"], "t"))
    assert t.schema.field("payload").type == pa.int64()
    by_t = dict(zip(t.column("t").to_pylist(),
                    t.column("payload").to_pylist()))
    assert by_t == {1: None, 5: 2 ** 61 + 7}


def test_graph_bucketed_path_big_ids(ray_session):
    """The ADVICE repro: dst=2^60+1 through the bucketed (>threshold)
    graph path came back as 2^60.  Force the bucketed path and check
    components + pagerank carry 64-bit ids exactly."""
    import ray.data as rd

    from zen3geo_ray.stages.graph import connected_components, pagerank

    a, b, c = BIG, BIG + 2, BIG + 4
    edges = rd.from_arrow(pa.table({
        "src": pa.array([a, b, 5], pa.int64()),
        "dst": pa.array([b, c, 6], pa.int64()),
    }))
    comp = _arrow(connected_components(edges, broadcast_threshold=0,
                                       n_buckets=4))
    got = dict(zip(comp.column("node").to_pylist(),
                   comp.column("comp").to_pylist()))
    assert got == {a: a, b: a, c: a, 5: 5, 6: 5}

    pr = _arrow(pagerank(edges, iters=2, broadcast_threshold=0,
                         n_buckets=4))
    prb = _arrow(pagerank(edges, iters=2, n_buckets=4))  # broadcast path
    da = dict(zip(pr.column("node").to_pylist(), pr.column("pr").to_pylist()))
    db = dict(zip(prb.column("node").to_pylist(),
                  prb.column("pr").to_pylist()))
    assert da == db  # bit-parity between the two execution paths
    assert set(da) == {a, b, c, 5, 6}


@pytest.mark.parametrize("threshold", [0, 10 ** 9])
def test_kcore_empty_core_both_paths(ray_session, threshold):
    """A 5-node path graph has an empty 3-core; rounds >= 2 used to
    crash (KeyError 'deg' broadcast / None schema bucketed)."""
    import ray.data as rd

    from zen3geo_ray.stages.graph import kcore

    edges = rd.from_arrow(pa.table({
        "src": pa.array([1, 2, 3, 4], pa.int64()),
        "dst": pa.array([2, 3, 4, 5], pa.int64()),
    }))
    out = kcore(edges, k=3, rounds=3, broadcast_threshold=threshold,
                n_buckets=4)
    t = _arrow(out)
    assert t.num_rows == 0
    assert set(out.schema().names) == {"node", "deg"}


def test_pinned_pagerank_empty_graph_kills_shards(ray_session):
    import ray
    import ray.data as rd

    from zen3geo_ray.stages.pregel import pinned_pagerank

    def alive_actors():
        return {aid for aid, info in ray._private.state.actors().items()
                if info.get("State") == "ALIVE"}

    before = alive_actors()
    empty = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                    "dst": pa.array([], pa.int64())}))
    out = pinned_pagerank(empty, n_shards=2)
    assert out.count() == 0
    import time
    deadline = time.time() + 15
    alive = set()
    while time.time() < deadline:
        alive = alive_actors()
        if not (alive - before):
            break
        time.sleep(0.5)
    assert not (alive - before), "GraphShard actors leaked"


def test_incremental_minhash_dedup_string_ids(ray_session, tmp_path):
    import ray.data as rd

    from zen3geo_ray.stages.dedup import incremental_minhash_dedup

    store = str(tmp_path / "sigstore")
    texts = ["the quick brown fox jumps over the lazy dog " * 4,
             "an entirely different document about graph engines " * 4]
    run1 = rd.from_arrow(pa.table({
        "doc_id": pa.array(["a1", "a2"]), "text": pa.array(texts)}))
    out1 = incremental_minhash_dedup(run1, store, num_perm=16, bands=8,
                                     agree_min=12)
    assert sorted(out1.to_pandas()["doc_id"]) == ["a1", "a2"]

    run2 = rd.from_arrow(pa.table({
        "doc_id": pa.array(["b1", "b2"]),
        "text": pa.array([texts[0], "yet another novel corpus entry " * 5]),
    }))
    out2 = incremental_minhash_dedup(run2, store, num_perm=16, bands=8,
                                     agree_min=12)
    assert sorted(out2.to_pandas()["doc_id"]) == ["b2"]  # b1 == a1 dropped


def test_uniform_value_sample_order_unbiased(ray_session):
    """Key-clustered input: the first blocks hold only small values; a
    prefix sample would place every cut point inside them.  The uniform
    sampler must produce balanced partitions anyway."""
    import ray.data as rd

    from zen3geo_ray.stages.partition import uniform_value_sample

    lo = np.arange(2000, dtype=np.int64)            # first blocks
    hi = np.arange(10 ** 6, 10 ** 6 + 8000, dtype=np.int64)  # later blocks
    ds = rd.from_arrow(pa.table({"v": pa.array(np.concatenate([lo, hi]))})) \
        .repartition(10)
    s = uniform_value_sample(ds, "v", 1000)
    assert len(s) == 1000
    frac_hi = float((s >= 10 ** 6).mean())
    assert 0.7 < frac_hi < 0.9  # population is 80% hi


def test_range_partition_by_morton_clustered_balanced(ray_session):
    import ray.data as rd

    from zen3geo_ray.stages.partition import range_partition_by_morton

    rng = np.random.default_rng(7)
    # clustered layout: all western-hemisphere points first
    lon = np.concatenate([rng.uniform(-170, -10, 3000),
                          rng.uniform(10, 170, 3000)])
    lat = rng.uniform(-80, 80, 6000)
    ds = rd.from_arrow(pa.table({"lon": pa.array(lon),
                                 "lat": pa.array(lat)})).repartition(8)
    df = range_partition_by_morton(ds, num_partitions=8).to_pandas()
    counts = df["partition"].value_counts()
    assert counts.max() < 3 * counts.mean()


def test_choose_salt_exact_hot_key(ray_session):
    import ray.data as rd

    from zen3geo_ray.stages.partition import choose_salt

    # hot key LAST — a prefix sample would miss it entirely
    cold = pa.table({"k": pa.array(np.arange(1000, dtype=np.int64))})
    hot = pa.table({"k": pa.array(np.full(5000, -1, dtype=np.int64))})
    ds = rd.from_arrow(cold).union(rd.from_arrow(hot))
    assert choose_salt(ds, "k", target_rows_per_group=1000) == 5


def test_incremental_minhash_broadcast_vs_bucketed_parity(ray_session,
                                                          tmp_path):
    """The broadcast store probe (zero shuffles) and the bucketed
    three-shuffle path must keep the SAME survivors."""
    import ray.data as rd

    from zen3geo_ray.stages.dedup import incremental_minhash_dedup

    rng = np.random.default_rng(5)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    base = [" ".join(rng.choice(words, 30)) for _ in range(40)]
    run1 = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(40), pa.int64()),
        "text": pa.array(base)}))
    # run2 = 20 copies of stored docs + 20 fresh docs
    fresh = [" ".join(rng.choice(words, 30)) + " novel" for _ in range(20)]
    run2 = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(100, 140), pa.int64()),
        "text": pa.array(base[:20] + fresh)}))

    outs = {}
    for label, thresh in (("broadcast", 10 ** 9), ("bucketed", 0)):
        store = str(tmp_path / f"store_{label}")
        incremental_minhash_dedup(run1, store, num_perm=16, bands=8,
                                  agree_min=12).count()
        out = incremental_minhash_dedup(run2, store, num_perm=16, bands=8,
                                        agree_min=12,
                                        broadcast_store=thresh)
        outs[label] = sorted(out.to_pandas()["doc_id"])
    assert outs["broadcast"] == outs["bucketed"]
    # the 20 exact copies must be dropped on both paths
    assert all(d >= 120 for d in outs["broadcast"])


def test_incremental_embedding_dedup_paths_parity(ray_session, tmp_path):
    """Broadcast vs bucketed store probe keep the same survivors; near-
    identical vectors to stored ones drop, novel directions survive."""
    import ray.data as rd

    from zen3geo_ray.stages.dedup import incremental_embedding_dedup

    rng = np.random.default_rng(19)
    base = rng.normal(size=(30, 16)).astype(np.float32)
    run1 = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(30), pa.int64()),
        "embedding": pa.array([v for v in base],
                              pa.list_(pa.float32())),
    }))
    # run2: 10 tiny perturbations of stored vectors + 10 fresh ones
    near = base[:10] + rng.normal(scale=1e-4, size=(10, 16)) \
        .astype(np.float32)
    fresh = rng.normal(size=(10, 16)).astype(np.float32)
    run2 = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(100, 120), pa.int64()),
        "embedding": pa.array([v for v in np.vstack([near, fresh])],
                              pa.list_(pa.float32())),
    }))
    outs = {}
    for label, thresh in (("broadcast", 10 ** 9), ("bucketed", 0)):
        store = str(tmp_path / f"emb_{label}")
        incremental_embedding_dedup(run1, store, sign_dims=6,
                                    threshold=0.9).count()
        out = incremental_embedding_dedup(run2, store, sign_dims=6,
                                          threshold=0.9,
                                          broadcast_store=thresh)
        outs[label] = sorted(out.to_pandas()["vec_id"])
    assert outs["broadcast"] == outs["bucketed"]
    # every near-copy (100..109) dropped; random fresh vectors are far
    # from cosine 0.9 of anything stored w.h.p.
    assert all(v >= 110 for v in outs["broadcast"])
    assert len(outs["broadcast"]) >= 8


def test_compact_store_exact(ray_session, tmp_path):
    """Three incremental runs -> compact -> a fourth run behaves as if
    never compacted (parallel uncompacted store as control), and file
    count is bounded."""
    import os

    import ray.data as rd

    from zen3geo_ray.stages.dedup import (
        compact_store,
        incremental_exact_dedup,
    )

    store_a = str(tmp_path / "a")
    store_b = str(tmp_path / "b")

    def docs(texts, base):
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(np.arange(base, base + len(texts)),
                               pa.int64()),
            "text": pa.array(texts, pa.large_string()),
        }))

    batches = [["aa", "bb"], ["bb", "cc"], ["cc", "dd", "ee"]]
    for i, texts in enumerate(batches):
        for store in (store_a, store_b):
            incremental_exact_dedup(docs(texts, 10 * i), store) \
                .materialize()
    stats = compact_store(store_a, n_files=2)
    assert stats["files_before"] >= 3
    assert stats["files_after"] <= 2
    assert stats["rows"] == 5  # aa bb cc dd ee

    out_a = incremental_exact_dedup(docs(["ee", "ff"], 90), store_a) \
        .to_pandas()
    out_b = incremental_exact_dedup(docs(["ee", "ff"], 90), store_b) \
        .to_pandas()
    assert sorted(out_a["text"]) == sorted(out_b["text"]) == ["ff"]


def test_compact_store_minhash_schema_preserved(ray_session, tmp_path):
    """The fixed-size-binary signature column must survive compaction
    byte-identically (no pandas float corruption path)."""
    import pyarrow.parquet as pq2

    import ray.data as rd

    from zen3geo_ray.stages.dedup import (
        compact_store,
        incremental_minhash_dedup,
    )

    store = str(tmp_path / "s")
    base = "some long enough document text for shingling here "
    for i, texts in enumerate([[base * 3], [base * 3 + "xyz tail"]]):
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([100 + i], pa.int64()),
            "text": pa.array(texts, pa.large_string()),
        }))
        incremental_minhash_dedup(ds, store, num_perm=16, bands=8) \
            .materialize()
    import os
    files_before = [os.path.join(r, f) for r, _, fs in os.walk(store)
                    for f in fs if f.endswith(".parquet")]
    schema_before = pq2.read_schema(files_before[0])
    rows_before = sum(pq2.read_metadata(f).num_rows
                      for f in files_before)
    stats = compact_store(store, n_files=1)
    files_after = [os.path.join(r, f) for r, _, fs in os.walk(store)
                   for f in fs if f.endswith(".parquet")]
    assert stats["rows"] == rows_before
    schema_after = pq2.read_schema(files_after[0])
    assert schema_after.equals(schema_before)
