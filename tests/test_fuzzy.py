"""Edit-distance-1 term matching (deletion-neighborhood / SymSpell)."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from zen3geo_ray.stages.fuzzy import (
    build_term_index,
    fuzzy_term_matches,
    levenshtein,
)


def test_levenshtein_known():
    assert levenshtein("query", "quary") == 1
    assert levenshtein("hash", "hash") == 0
    assert levenshtein("hash,", "hash") == 1
    assert levenshtein("table", "tabel") == 2  # transposition = 2 edits
    assert levenshtein("", "abc") == 3


def test_deletion_index_completeness():
    # every ed<=1 pair must share a variant
    import itertools
    words = ["scan", "scat", "scans", "can", "sdan", "xcan", "sca"]
    idx = build_term_index(["scan"])
    for w in words:
        assert levenshtein(w, "scan") <= 1
        variants = {w} | {w[:i] + w[i + 1:] for i in range(len(w))}
        assert any(v in idx for v in variants), w


def test_fuzzy_term_matches_ds(ray_session):
    docs = pa.table({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": pa.array([
            "the quary planner uses a hash join",   # quary~query, hash
            "full table scan is slow",              # scan
            "nothing relevant here",
            "scat singing and scans galore",        # scat~scan, scans~scan
            "hash, hash. hash!",                    # punct variants of hash
            "q u e r y spaced out letters",
        ], pa.string()),
    })
    terms = ["query", "hash", "scan"]
    out = (fuzzy_term_matches(rd.from_arrow(docs).repartition(3), terms)
           .to_pandas().sort_values(["doc_id", "term"])
           .reset_index(drop=True))
    got = set(map(tuple, out.to_numpy()))
    assert got == {
        (0, "query"), (0, "hash"),
        (1, "scan"),
        (3, "scan"),
        (4, "hash"),
    }


def test_fuzzy_matches_duckdb_levenshtein(ray_session):
    import duckdb
    rng = np.random.default_rng(9)
    vocab = ["query", "quary", "hash", "cash", "hashes", "scan", "scat",
             "join", "coin", "merge", "marge", "table", "tabel", "xyz"]
    texts = [" ".join(rng.choice(vocab, 8)) for _ in range(300)]
    docs = pa.table({"doc_id": np.arange(300, dtype=np.int64),
                     "text": pa.array(texts, pa.string())})
    terms = ["query", "hash", "scan", "join"]
    out = (fuzzy_term_matches(rd.from_arrow(docs).repartition(4), terms)
           .to_pandas())
    got = set(map(tuple, out.to_numpy()))
    con = duckdb.connect()
    con.register("docs", docs.to_pandas())
    exp = con.sql(r"""
        WITH terms(term) AS (VALUES ('query'), ('hash'), ('scan'), ('join')),
        tok AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w
                FROM docs)
        SELECT DISTINCT doc_id, term FROM tok JOIN terms
        ON levenshtein(w, term) <= 1
    """).fetchdf()
    assert got == set(map(tuple, exp.to_numpy()))


def test_levenshtein_pairs_matches_scalar():
    import itertools

    from zen3geo_ray.stages.fuzzy import levenshtein, levenshtein_pairs

    words = ["", "a", "ab", "ba", "abc", "ring", "rink", "small ring",
             "small rig", "widget", "wdgets", "naïve", "naive", "née"]
    pairs = list(itertools.product(words, words))
    got = levenshtein_pairs([p[0] for p in pairs],
                            [p[1] for p in pairs])
    want = [levenshtein(a, b) for a, b in pairs]
    assert got.tolist() == want


def test_edit_distance_join_brute(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from zen3geo_ray.stages.fuzzy import edit_distance_join, levenshtein

    rng = np.random.default_rng(11)
    alpha = list("abcd")
    names = ["".join(rng.choice(alpha, rng.integers(3, 7)))
             for _ in range(120)]
    df = pd.DataFrame({
        "pid": np.arange(120, dtype=np.int64),
        "nm": names,
        "blk": (np.arange(120, dtype=np.int64) % 5)})
    out = edit_distance_join(
        rd.from_arrow(pa.Table.from_pandas(df)).repartition(3),
        id_col="pid", text_col="nm", block_col="blk", max_dist=2,
        n_buckets=3).to_pandas().sort_values(
        ["id_a", "id_b"]).reset_index(drop=True)
    exp = []
    for _, g in df.groupby("blk"):
        r = g.reset_index(drop=True)
        for i in range(len(r)):
            for j in range(i + 1, len(r)):
                d = levenshtein(r.nm[i], r.nm[j])
                if d <= 2:
                    a, b = int(r.pid[i]), int(r.pid[j])
                    exp.append((min(a, b), max(a, b), d))
    exp.sort()
    got = list(zip(out.id_a, out.id_b, out.dist))
    assert [(int(a), int(b), int(d)) for a, b, d in got] == exp
    assert len(exp) > 20   # fixture actually exercises matches
