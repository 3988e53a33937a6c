"""mmr_topk: greedy maximal-marginal-relevance selection tests.

Reference semantics (Carbonell & Goldstein 1998, integer-exact form):
quantize q = floor(x * 2^20) + 2^20; rel = q . q_query; greedy score
a*rel - b*max_sim(selected); argmax ties to the smallest id; the
candidate pool is the global top-`pool` by (rel DESC, id).
"""

import numpy as np
import pyarrow as pa
import ray.data as rd

from zen3geo_ray.stages.ann import MMR_SCALE_BITS, mmr_topk

_OFF = 1 << MMR_SCALE_BITS


def _ref_mmr(vecs, ids, qvec, k, pool, a, b):
    q = (np.floor(vecs.astype(np.float64) * _OFF) + _OFF).astype(np.int64)
    qq = (np.floor(qvec.astype(np.float64) * _OFF) + _OFF).astype(np.int64)
    rel = q @ qq
    order = np.lexsort((ids, -rel))[:pool]
    ids, rel, q = ids[order], rel[order], q[order]
    sims = q @ q.T
    sel, rows = [], []
    remaining = np.ones(len(ids), bool)
    for r in range(1, min(k, len(ids)) + 1):
        ms = sims[:, sel].max(axis=1) if sel else np.zeros(len(ids), np.int64)
        score = a * rel - b * ms
        cand = np.flatnonzero(remaining)
        pick = cand[np.lexsort((ids[cand], -score[cand]))[0]]
        sel.append(pick)
        remaining[pick] = False
        rows.append((r, ids[pick], rel[pick], score[pick]))
    return rows


def _dataset(vecs, ids, blocks):
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
    })
    return rd.from_arrow(tbl).repartition(blocks)


def test_mmr_matches_reference_across_blocks(ray_session):
    rng = np.random.default_rng(7)
    n, dim = 300, 16
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    ids = rng.permutation(n).astype(np.int64)
    qvec = vecs[0].copy()
    out = mmr_topk(_dataset(vecs, ids, 7), qvec, k=6, pool=25,
                   a_num=7, b_num=3).to_pandas()
    ref = _ref_mmr(vecs, ids, qvec, 6, 25, 7, 3)
    assert list(out["rank"]) == [r for r, *_ in ref]
    assert list(out["vec_id"]) == [i for _, i, *_ in ref]
    assert list(out["rel"]) == [rl for *_, rl, _ in ref]
    assert list(out["score"]) == [s for *_, s in ref]


def test_mmr_diversity_beats_pure_relevance(ray_session):
    # two tight clusters: pure top-k would take the whole near cluster;
    # MMR with a strong diversity weight must mix in the far cluster.
    base = np.zeros((40, 8), np.float32)
    base[:20, 0] = 1.0
    base[:20, 1] = np.linspace(0, 0.05, 20)
    base[20:, 2] = 1.0
    base[20:, 3] = np.linspace(0, 0.05, 20)
    ids = np.arange(40, dtype=np.int64)
    q = np.zeros(8, np.float32)
    q[0] = 1.0
    q[2] = 0.2
    out = mmr_topk(_dataset(base, ids, 3), q, k=6, pool=40,
                   a_num=1, b_num=5).to_pandas()
    picked = set(out["vec_id"])
    assert picked & set(range(20)) and picked & set(range(20, 40))


def test_mmr_small_input_truncates(ray_session):
    vecs = np.eye(3, 4, dtype=np.float32)
    ids = np.array([5, 3, 9], np.int64)
    out = mmr_topk(_dataset(vecs, ids, 1), vecs[1], k=10, pool=10).to_pandas()
    assert len(out) == 3 and list(out["rank"]) == [1, 2, 3]
    # rank 1 is the max-relevance row (the query itself)
    assert out["vec_id"][0] == 3
