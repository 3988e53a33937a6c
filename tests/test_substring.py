"""Exact substring dedup (the suffix-array family, round-3 verdict #7):
brute-force parity for dup_spans, and the winnowing guarantee — every
duplicated span of length >= L + w - 1 shares a selected fingerprint
on each copy (Schleimer/Wilkerson/Aiken 2003)."""

import numpy as np
import pyarrow as pa
import pytest

from zen3geo_ray.stages.substring import (
    rolling_hashes,
    winnow_positions,
)

L = 8
W = 4


def _docs():
    # engineered duplications: a shared 20-char run, a within-doc
    # repeat, and unique tails
    shared = "the quick brown fox "  # 20 chars
    return {
        1: shared + "jumps over one lazy dog",
        2: "prefix padding " + shared + "trails off uniquely here",
        3: "zz" + "abcdefgh" * 2 + "qq unique suffix text",  # within-doc
        4: "completely unrelated content with no repeats at all",
        5: "tiny",  # below L: no windows
    }


def _brute_spans(docs, L):
    from collections import defaultdict

    locs = defaultdict(list)
    for did, t in docs.items():
        for p in range(len(t) - L + 1):
            locs[t[p:p + L]].append((did, p))
    dup = defaultdict(list)
    for gram, ps in locs.items():
        if len(ps) >= 2:
            for did, p in ps:
                dup[did].append(p)
    spans = []
    for did, ps in dup.items():
        ps = sorted(ps)
        s, e = ps[0], ps[0] + L
        for p in ps[1:]:
            if p > e:
                spans.append((did, s, e))
                s, e = p, p + L
            else:
                e = max(e, p + L)
        spans.append((did, s, e))
    return sorted(spans)


def test_dup_spans_matches_bruteforce(ray_session):
    import ray.data as rd

    from zen3geo_ray.stages.substring import dup_spans

    docs = _docs()
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values())),
    }))
    out = dup_spans(ds, L=L, n_buckets=4).to_pandas()
    got = sorted(zip(out.doc_id, out.span_start, out.span_end))
    assert got == _brute_spans(docs, L)
    # doc 4 (unique) and doc 5 (too short) emit nothing
    assert 4 not in set(out.doc_id) and 5 not in set(out.doc_id)
    # the within-doc repeat in doc 3 is one merged span over both copies
    d3 = out[out.doc_id == 3]
    assert len(d3) == 1
    s, e = int(d3.span_start.iloc[0]), int(d3.span_end.iloc[0])
    assert docs[3][s:e] == "abcdefgh" * 2


def test_rolling_hash_equals_direct():
    t = "some moderately long test string with repeats repeats"
    h = rolling_hashes(t, L)
    B = np.uint64(1000003)
    for p in (0, 3, len(t) - L):
        want = np.uint64(0)
        with np.errstate(over="ignore"):
            for ch in t[p:p + L]:
                want = want * B + np.uint64(ord(ch))
        assert h[p] == want
    assert len(rolling_hashes("shrt", L)) == 0


def test_winnow_density_and_coverage():
    rng = np.random.default_rng(13)
    h = rng.integers(0, 2 ** 63, 5000).astype(np.uint64)
    sel = winnow_positions(h, W)
    # every w-window contains a selected position (coverage)
    for s in range(len(h) - W + 1):
        assert ((sel >= s) & (sel < s + W)).any()
    # expected density ~ 2/(w+1)
    assert len(sel) / len(h) < 3.0 / (W + 1)


def test_winnowing_guarantee_finds_long_duplicates(ray_session):
    """Any duplicate of length >= L + w - 1 must collide on >= 1
    winnowed fingerprint in BOTH copies."""
    import ray.data as rd

    from zen3geo_ray.stages.substring import winnowed_candidates

    rng = np.random.default_rng(17)
    alpha = list("abcdefghijklmnopqrstuvwxyz ")
    dup_run = "".join(rng.choice(alpha, L + W - 1))  # exactly the bound
    docs = {
        10: "".join(rng.choice(alpha, 60)) + dup_run
            + "".join(rng.choice(alpha, 40)),
        11: "".join(rng.choice(alpha, 35)) + dup_run
            + "".join(rng.choice(alpha, 70)),
        12: "".join(rng.choice(alpha, 90)),
    }
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values())),
    }))
    cand = winnowed_candidates(ds, L=L, w=W, n_buckets=4).to_pandas()
    by_fp = cand.groupby("fp")["doc_id"].agg(set)
    assert any({10, 11} <= s for s in by_fp), \
        "winnowing guarantee violated: shared long run not fingerprinted"


def test_strip_dup_spans_golden(ray_session):
    import ray.data as rd

    from zen3geo_ray.stages.substring import strip_dup_spans

    docs = _docs()
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values())),
    }))
    out = strip_dup_spans(ds, L=L, n_buckets=4).to_pandas() \
        .set_index("doc_id")
    spans = {}
    for did, s, e in _brute_spans(docs, L):
        spans.setdefault(did, []).append((s, e))
    for did, t in docs.items():
        parts, prev = [], 0
        for s, e in sorted(spans.get(did, [])):
            parts.append(t[prev:s])
            prev = e
        parts.append(t[prev:])
        want = "".join(parts)
        assert out.loc[did, "clean_text"] == want
        assert out.loc[did, "removed_chars"] == len(t) - len(want)
    # span-free and too-short docs pass through untouched
    assert out.loc[4, "clean_text"] == docs[4]
    assert out.loc[5, "clean_text"] == "tiny"
    assert int(out["removed_chars"].loc[[4, 5]].sum()) == 0


def test_strip_dup_spans_bucketed_path_parity(ray_session):
    import ray.data as rd

    from zen3geo_ray.stages.substring import strip_dup_spans

    docs = _docs()
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values())),
    }))
    a = strip_dup_spans(ds, L=L, n_buckets=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = strip_dup_spans(ds, L=L, n_buckets=4,
                        broadcast_spans=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_winnowed_dup_spans_end_to_end(ray_session):
    """The scale path recovers every planted duplicated run of length
    >= L + w - 1 with its FULL extent, and every span it reports is
    contained in the exact operator's output."""
    import ray.data as rd

    from zen3geo_ray.stages.substring import dup_spans, winnowed_dup_spans

    rng = np.random.default_rng(61)
    alpha = list("abcdefghijklmnopqrstuvwxyz ")
    run_a = "".join(rng.choice(alpha, L + W - 1))     # exactly the bound
    run_b = "".join(rng.choice(alpha, 3 * L))          # long shared run
    docs = {
        1: "".join(rng.choice(alpha, 40)) + run_a
           + "".join(rng.choice(alpha, 30)) + run_b,
        2: run_b + "".join(rng.choice(alpha, 25)) + run_a
           + "".join(rng.choice(alpha, 50)),
        3: "".join(rng.choice(alpha, 120)),
    }
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values())),
    }))
    wspans = winnowed_dup_spans(ds, L=L, w=W, n_buckets=4).to_pandas()
    espans = dup_spans(ds, L=L, n_buckets=4).to_pandas()

    # every winnowed span is inside an exact span (no false content)
    for _, r in wspans.iterrows():
        covered = espans[(espans.doc_id == r.doc_id)
                         & (espans.span_start <= r.span_start)
                         & (espans.span_end >= r.span_end)]
        assert len(covered) == 1, (r.doc_id, r.span_start, r.span_end)

    # both planted runs recovered at FULL extent in both docs
    for did, t in list(docs.items())[:2]:
        got = wspans[wspans.doc_id == did]
        for run in (run_a, run_b):
            s = t.find(run)
            hit = got[(got.span_start <= s) & (got.span_end >= s + len(run))]
            assert len(hit) == 1, (did, run[:10])
    assert 3 not in set(wspans.doc_id)


@pytest.mark.parametrize("broadcast_docs", [2_000_000, 0],
                         ids=["broadcast", "bucketed-semi"])
def test_winnow_restrict_parity(ray_session, broadcast_docs):
    """winnow_restrict_dup_spans is BIT-IDENTICAL to dup_spans: the
    L-w+1-gram winnowed pass covers every match >= L (SWA guarantee),
    so restricting the exact pass to candidate docs loses nothing —
    on both the broadcast-ids and the bucketed-semi-join paths."""
    import ray.data as rd

    from zen3geo_ray.stages.substring import (
        dup_spans,
        winnow_restrict_dup_spans,
    )

    docs = _docs()
    ds = rd.from_items(
        [{"doc_id": k, "text": v} for k, v in docs.items()])
    exact = sorted(map(tuple, dup_spans(ds, L=L, n_buckets=4)
                       .to_pandas().to_numpy()))
    got = sorted(map(tuple, winnow_restrict_dup_spans(
        ds, L=L, w=W, n_buckets=4, broadcast_docs=broadcast_docs)
        .to_pandas().to_numpy()))
    assert got == exact
    assert exact == _brute_spans(docs, L)


def test_winnow_restrict_no_candidates(ray_session):
    """A corpus with no duplicated windows returns a typed empty span
    table (the zero-candidate early exit)."""
    import ray.data as rd

    from zen3geo_ray.stages.substring import winnow_restrict_dup_spans

    ds = rd.from_items([
        {"doc_id": 1, "text": "abcdefghijklmnop"},
        {"doc_id": 2, "text": "qrstuvwxyz012345"},
    ])
    out = winnow_restrict_dup_spans(ds, L=L, w=W, n_buckets=4)
    assert out.count() == 0
    # to_pandas() drops columns on empty datasets; the SCHEMA is typed
    assert out.schema().names == ["doc_id", "span_start", "span_end"]


def test_cdc_chunks_reassembly_and_locality(ray_session):
    """CDC invariants: chunks concatenate back to the exact doc, and a
    PREFIX INSERTION only re-chunks a bounded head — every chunk after
    the first post-insertion cut is byte-identical (the property that
    makes content-defined chunking dedup-friendly, unlike fixed-width
    blocks which all shift)."""
    import numpy as np
    import ray.data as rd

    from zen3geo_ray.stages.substring import cdc_chunks

    rng = np.random.default_rng(5)
    base = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 400))
    shifted = "XYZ-INSERTED-" + base
    ds = rd.from_items([{"doc_id": 1, "text": base},
                        {"doc_id": 2, "text": shifted},
                        {"doc_id": 3, "text": ""},
                        {"doc_id": 4, "text": "tiny"}])
    out = cdc_chunks(ds, k=5, divisor=16).to_pandas()
    by_doc = {d: g.sort_values("chunk_idx") for d, g in out.groupby("doc_id")}
    # reassembly: concatenation restores the doc byte-for-byte
    assert "".join(by_doc[1]["chunk_text"]) == base
    assert "".join(by_doc[2]["chunk_text"]) == shifted
    # empty doc emits nothing; sub-k doc emits one whole-doc chunk
    assert 3 not in by_doc
    assert by_doc[4]["chunk_text"].tolist() == ["tiny"]
    # locality: the two chunkings share a long common suffix
    c1 = by_doc[1]["chunk_text"].tolist()
    c2 = by_doc[2]["chunk_text"].tolist()
    common = 0
    while (common < min(len(c1), len(c2))
           and c1[-1 - common] == c2[-1 - common]):
        common += 1
    assert len(c1) >= 10           # cuts actually fire
    assert common >= len(c1) - 3   # only a bounded head re-chunked
