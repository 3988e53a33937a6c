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
