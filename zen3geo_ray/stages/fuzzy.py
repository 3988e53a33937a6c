"""Typo-tolerant term matching (edit-distance-1 decontamination).

Benchmark decontamination by exact token membership (stages/ngrams.py
``contamination``) misses one-keystroke variants — "quary" for "query",
"hash," for "hash".  This stage finds every document containing a token
within Levenshtein distance 1 of any blocklist term, using the
deletion-neighborhood (SymSpell) construction from the public
spell-correction literature:

* ed(w, t) <= 1  iff  ({w} ∪ del1(w)) ∩ ({t} ∪ del1(t)) != ∅ AND the
  exact DP distance verifies <= 1 (the intersection alone admits a few
  distance-2 pairs — same-length deletions at different positions);
* the blocklist index {variant -> term ids} is built once on the driver
  (terms are tiny) and broadcast via ``ray.put``;
* per batch: ONE vectorized RE2 split (``pc.split_pattern_regex`` —
  the same ``\\s`` set the DuckDB oracle's ``regexp_extract_all``
  uses), then the candidate probe runs over the batch's UNIQUE tokens
  only (vocabulary-sized, not token-sized), and survivors map back to
  documents with numpy masks;
* matches are pre-distincted per batch, then one bucketed shuffle of
  (doc_id, term) pairs — never documents — finishes the global
  distinct.

Tokens are restricted to printable ASCII (``^[!-~]{1,max_len}$``) on
both the engine and oracle sides so "one edit" has a single, pinned
meaning (DuckDB's levenshtein and Python's DP agree codepoint-for-
codepoint on ASCII).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .bucketed import first_per_key


def _del1(s: str) -> set[str]:
    return {s[:i] + s[i + 1:] for i in range(len(s))}


def build_term_index(terms: list[str]) -> dict[str, list[int]]:
    """{variant -> [term ids]} over each term and its 1-deletions."""
    idx: dict[str, list[int]] = {}
    for ti, t in enumerate(terms):
        for v in {t} | _del1(t):
            idx.setdefault(v, []).append(ti)
    return idx


def levenshtein(a: str, b: str) -> int:
    """Unit-cost Levenshtein distance — the same definition DuckDB's
    ``levenshtein()`` implements (verified against the oracle)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _ascii_ok(t: str, max_len: int) -> bool:
    return 0 < len(t) <= max_len and all("!" <= c <= "~" for c in t)


def fuzzy_term_matches(docs_ds, terms: list[str], *, id_col: str = "doc_id",
                       text_col: str = "text", max_len: int = 24,
                       n_buckets: int = 32):
    """Distinct (doc, term) pairs where some token of the doc is within
    edit distance 1 of the term.  Output: ``id_col``, ``term``."""
    import ray

    state_ref = ray.put((list(terms), build_term_index(list(terms))))

    def find(batch: pa.Table) -> pa.Table:
        terms_l, idx = ray.get(state_ref)
        toks = pc.split_pattern_regex(batch.column(text_col),
                                      pattern=r"\s+")
        flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) \
            else toks
        parts = []
        doc_ids_col = batch.column(id_col).to_numpy(zero_copy_only=False)
        arrs = flat.chunks if isinstance(flat, pa.ChunkedArray) else [flat]
        row0 = 0
        for arr in arrs:
            off = arr.offsets.to_numpy(zero_copy_only=False)
            vals = np.asarray(arr.values.to_pylist(), dtype=object)
            counts = np.diff(off)
            parent = np.repeat(np.arange(len(arr)) + row0, counts)
            row0 += len(arr)
            uniq, inv = np.unique(vals.astype(str), return_inverse=True)
            # probe the deletion index over the UNIQUE vocabulary only
            hit_terms: dict[int, list[int]] = {}
            for ui, w in enumerate(uniq):
                if not _ascii_ok(w, max_len):
                    continue
                cand: set[int] = set()
                for v in {w} | _del1(w):
                    cand.update(idx.get(v, ()))
                ok = [ti for ti in cand
                      if levenshtein(w, terms_l[ti]) <= 1]
                if ok:
                    hit_terms[ui] = ok
            if not hit_terms:
                continue
            hit_mask = np.isin(inv, np.fromiter(hit_terms, dtype=np.int64))
            for tok_pos in np.flatnonzero(hit_mask):
                for ti in hit_terms[inv[tok_pos]]:
                    parts.append((doc_ids_col[parent[tok_pos]],
                                  terms_l[ti]))
        if not parts:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "term": pa.array([], pa.string())})
        df = pd.DataFrame(parts, columns=[id_col, "term"]).drop_duplicates()
        return pa.table({
            id_col: pa.array(df[id_col].to_numpy().astype(np.int64)),
            "term": pa.array(df["term"].tolist(), pa.string()),
        })

    pairs = docs_ds.map_batches(find, batch_format="pyarrow")
    return first_per_key(pairs, [id_col, "term"], [id_col],
                         n_buckets=n_buckets)


def levenshtein_pairs(a_list, b_list) -> np.ndarray:
    """Vectorized unit-cost Levenshtein over N string PAIRS: the full
    (la+1)x(lb+1) DP runs as ~Lmax^2 scalar loop steps of N-length
    numpy vector ops (strings padded into uint32 codepoint matrices),
    capturing each pair's distance at its own (la, lb) corner.  Same
    definition as the scalar ``levenshtein`` / DuckDB's function."""
    n = len(a_list)
    if n == 0:
        return np.zeros(0, np.int64)
    la = np.array([len(s) for s in a_list], np.int64)
    lb = np.array([len(s) for s in b_list], np.int64)
    ma, mb = int(la.max()), int(lb.max())
    A = np.zeros((n, max(ma, 1)), np.uint32)
    B = np.zeros((n, max(mb, 1)), np.uint32)
    for i, s in enumerate(a_list):
        if s:
            A[i, :len(s)] = np.frombuffer(
                s.encode("utf-32-le"), np.uint32)
    for i, s in enumerate(b_list):
        if s:
            B[i, :len(s)] = np.frombuffer(
                s.encode("utf-32-le"), np.uint32)
    rows = np.arange(n)
    prev = np.tile(np.arange(mb + 1, dtype=np.int64), (n, 1))
    out = np.zeros(n, np.int64)
    done = la == 0
    out[done] = lb[done]
    for i in range(1, ma + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = A[:, i - 1][:, None]
        neq = (ai != B).astype(np.int64)
        for j in range(1, mb + 1):
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + neq[:, j - 1])
        hit = la == i
        if hit.any():
            out[hit] = cur[hit, lb[hit]]
        prev = cur
    return out


def edit_distance_join(ds, *, id_col: str, text_col: str,
                       block_col: str, max_dist: int = 2,
                       n_buckets: int = 16):
    """Blocked EDIT-DISTANCE similarity self-join (the classic
    entity-resolution step): all unordered pairs WITHIN a block
    (``block_col`` equality — the standard ER blocking key) whose
    ``text_col`` values are within ``max_dist`` unit-cost Levenshtein
    edits.  Exact within blocks; the |len difference| <= max_dist
    prefilter is lossless (length difference lower-bounds the
    distance).

    One bucketed shuffle on the block key; the DP runs ONCE per
    DISTINCT text pair within a block (real catalogs repeat names —
    sf0.1 part has 20k rows over 64 distinct names, so the row-pair
    cartesian used to re-verify the same string pair thousands of
    times: 46s -> ~1s from this dedup), then matches expand to id
    pairs with repeat/tile (linear in OUTPUT size; identical-text
    groups emit their triangular dist-0 pairs directly).  Pair volume
    is sum of distinct-per-block^2 for the DP + output for the
    expansion — blocking keys must keep blocks bounded, the same
    contract as every ER blocker.  Returns (id_a, id_b, dist) with
    id_a < id_b."""
    from .bucketed import bucketed_groupby

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_d: list[np.ndarray] = []
        for _, gg in g.groupby(block_col, sort=False):
            texts, inv = np.unique(gg[text_col].to_numpy(),
                                   return_inverse=True)
            ids = gg[id_col].to_numpy().astype(np.int64)
            order = np.argsort(inv, kind="mergesort")
            inv_s, ids_s = inv[order], ids[order]
            bounds = np.searchsorted(inv_s, np.arange(len(texts) + 1))
            groups = [np.sort(ids_s[bounds[t]:bounds[t + 1]])
                      for t in range(len(texts))]
            # identical-text groups: every id pair is dist 0
            for gid in groups:
                m = len(gid)
                if m >= 2:
                    iu, ju = np.triu_indices(m, k=1)
                    out_a.append(gid[iu])
                    out_b.append(gid[ju])
                    out_d.append(np.zeros(len(iu), np.int64))
            if len(texts) >= 2:
                lens = np.array([len(t) for t in texts], np.int64)
                ii, jj = np.triu_indices(len(texts), k=1)
                keep = np.abs(lens[ii] - lens[jj]) <= max_dist
                ii, jj = ii[keep], jj[keep]
                dist = levenshtein_pairs(texts[ii].tolist(),
                                         texts[jj].tolist())
                ok = dist <= max_dist
                for i, j, dv in zip(ii[ok].tolist(), jj[ok].tolist(),
                                    dist[ok].tolist()):
                    ga, gb = groups[i], groups[j]
                    x = np.repeat(ga, len(gb))
                    y = np.tile(gb, len(ga))
                    out_a.append(np.minimum(x, y))
                    out_b.append(np.maximum(x, y))
                    out_d.append(np.full(len(x), dv, np.int64))
        if not out_a:
            return pd.DataFrame({"id_a": np.array([], np.int64),
                                 "id_b": np.array([], np.int64),
                                 "dist": np.array([], np.int64)})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b),
                             "dist": np.concatenate(out_d)})

    return bucketed_groupby(ds, [block_col], fold, n_buckets=n_buckets)
