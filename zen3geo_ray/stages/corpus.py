"""Corpus preparation operators: token-window chunking and inverted-index
construction — the steps between curation and training-shard writing.

Training-data prep ops with no reference analog (zen3geo delegates no
text processing; SURVEY §2.3 extensions).  Tokenization is the shared
RE2-``\\s`` convention (stages/dedup.py `_WS_CPS`, CLAUDE.md invariant)
so every statistic restates in DuckDB ``regexp_extract_all(text, '\\S+')``
arithmetic.

Scale shapes:
* ``chunk_documents`` — pure ``map_batches``, NO shuffle: each doc's
  overlapping token windows are enumerated with one arange/repeat pass
  and the chunk texts are materialized by a single vectorized
  ``binary_join`` over a sliced ListArray — no per-doc Python, no
  per-chunk string building.  Output volume is ~n_tokens/stride rows per
  doc (inherent to overlapped chunking).
* ``postings`` — the classic inverted-index shape: per-batch (token,
  doc, tf) partials (each doc lives in exactly one batch row, so the
  pairs are globally unique), then ONE bucketed shuffle keyed by token;
  document ids concatenate in sorted order per token.  Shuffle volume is
  |distinct (token, doc) pairs|, never |tokens|; per-bucket work is
  vectorized except the vocabulary-bounded join of postings strings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .bucketed import bucketed_groupby
from .ngrams import tokens_flat


def chunk_documents(ds, *, id_col: str = "doc_id", text_col: str = "text",
                    size: int, overlap: int = 0):
    """Split each document into ``size``-token chunks overlapping by
    ``overlap`` tokens (stride = size - overlap).  Chunk starts are
    0, stride, 2*stride, …; the count is ``1 + ceil(max(n-size,0)/stride)``
    so every token is covered and the last window is the only short one.
    Docs with zero tokens emit nothing.

    Output: (id_col, chunk_idx, tok_start, n_toks, chunk_text) with
    ``chunk_text`` = the window's tokens joined by a single space —
    mirrors ``array_to_string(toks[s+1 : least(s+size, n)], ' ')``.
    """
    if not (0 <= overlap < size):
        raise ValueError("require 0 <= overlap < size")
    stride = size - overlap

    def fn(batch: pa.Table) -> pa.Table:
        t, _, _ = _chunk_batch(batch, id_col=id_col, text_col=text_col,
                               size=size, stride=stride)
        return t

    return ds.map_batches(fn, batch_format="pyarrow")


def _chunk_batch(batch: pa.Table, *, id_col: str, text_col: str,
                 size: int, stride: int, extra_cols: tuple = ()):
    """One batch of ``chunk_documents`` (one doc per input row): returns
    ``(chunk table, chunk_doc batch-row indices, ndocs)`` so callers that
    need the doc<->chunk alignment (per-doc rebuilds without a join) can
    reuse it; ``extra_cols`` are carried per chunk like ``id_col``."""
    flat, doc_of, ndocs = tokens_flat(batch, text_col)
    n = np.bincount(doc_of, minlength=ndocs).astype(np.int64)
    n_chunks = np.where(
        n > 0,
        1 + (np.maximum(n - size, 0) + stride - 1) // stride,
        0,
    ).astype(np.int64)
    total = int(n_chunks.sum())
    if total == 0:
        cols = {
            id_col: pa.array([], batch.column(id_col).type),
            "chunk_idx": pa.array([], pa.int64()),
            "tok_start": pa.array([], pa.int64()),
            "n_toks": pa.array([], pa.int64()),
            "chunk_text": pa.array([], pa.string()),
        }
        for c in extra_cols:
            cols[c] = pa.array([], batch.column(c).type)
        return pa.table(cols), np.zeros(0, dtype=np.int64), ndocs
    chunk_doc = np.repeat(np.arange(ndocs), n_chunks)
    cum_chunks = np.zeros(ndocs, dtype=np.int64)
    np.cumsum(n_chunks[:-1], out=cum_chunks[1:])
    chunk_idx = np.arange(total, dtype=np.int64) - cum_chunks[chunk_doc]
    tok_start = chunk_idx * stride
    n_toks = np.minimum(size, n[chunk_doc] - tok_start)
    doc_base = np.zeros(ndocs, dtype=np.int64)
    np.cumsum(n[:-1], out=doc_base[1:])
    abs_start = doc_base[chunk_doc] + tok_start
    # flat token indices of every chunk in one arange pass
    off = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(n_toks, out=off[1:])
    idx = (
        np.arange(off[-1], dtype=np.int64)
        - np.repeat(off[:-1], n_toks)
        + np.repeat(abs_start, n_toks)
    )
    vals = flat.take(pa.array(idx))
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    la = pa.ListArray.from_arrays(pa.array(off, pa.int32()), vals)
    cols = {
        id_col: batch.column(id_col).take(pa.array(chunk_doc)),
        "chunk_idx": pa.array(chunk_idx, pa.int64()),
        "tok_start": pa.array(tok_start, pa.int64()),
        "n_toks": pa.array(n_toks, pa.int64()),
        "chunk_text": pc.binary_join(la, " "),
    }
    for c in extra_cols:
        cols[c] = batch.column(c).take(pa.array(chunk_doc))
    return pa.table(cols), chunk_doc, ndocs


def postings(ds, *, id_col: str = "doc_id", text_col: str = "text",
             n_buckets: int = 32):
    """Inverted index: per token, document frequency ``df``, total term
    frequency ``tf``, and ``postings`` = comma-joined doc ids in
    ascending id order — ``string_agg(doc_id, ',' ORDER BY doc_id)``
    over per-doc term counts.

    Each document's text is one input row, so per-batch (token, doc, c)
    partials are globally unique pairs; the bucketed reduce then needs
    no distinct pass.
    """

    def partial(batch: pa.Table) -> pa.Table:
        flat, doc_of, _ = tokens_flat(batch, text_col)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)[doc_of]
        # pure-Arrow combiner (no per-token Python objects)
        pairs = pa.table({
            "w": flat,
            "d": pa.array(ids, batch.column(id_col).type),
        })
        vc = pairs.group_by(["w", "d"]).aggregate([([], "count_all")])
        return vc.rename_columns(["w", "d", "c"]).set_column(
            2, "c", vc.column(2).cast(pa.int64()))

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["w", "d"], kind="mergesort")
        # vocabulary-bounded: one Python join call per DISTINCT token
        agg = g.groupby("w", sort=False).agg(
            df=("d", "size"),
            tf=("c", "sum"),
            postings=("d", lambda s: ",".join(map(str, s))),
        ).reset_index()
        agg["df"] = agg["df"].astype(np.int64)
        agg["tf"] = agg["tf"].astype(np.int64)
        return agg

    return bucketed_groupby(partials, ["w"], fn, n_buckets=n_buckets)


def length_buckets(ds, *, text_col: str = "text", bucket_tokens: int = 16):
    """Inference-batching plan: docs bucket by ``n_tokens //
    bucket_tokens``; per bucket report ``n`` docs, ``max_tok`` (the padded
    sequence length) and ``pad_waste = n * max_tok - sum(n_tok)`` — the
    padding overhead a length-sorted batcher would pay.

    Combiner-first: per-batch (bucket, count, sum, max) partials bound
    the shuffle by |buckets per block|; the waste derives from the final
    exact integer aggregates.
    """
    from .zonal import zonal_aggregate

    def add_bucket(b: pa.Table) -> pa.Table:
        _, doc_of, ndocs = tokens_flat(b, text_col)
        n_tok = np.bincount(doc_of, minlength=ndocs).astype(np.int64)
        return pa.table({
            "bucket": pa.array(n_tok // bucket_tokens, pa.int64()),
            "n_tok": pa.array(n_tok, pa.int64()),
        })

    agg = zonal_aggregate(ds.map_batches(add_bucket, batch_format="pyarrow"),
                          ["bucket"], {"n_tok": ["sum", "max"]})

    def fin(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        mx = b.column("n_tok_max").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        s = b.column("n_tok_sum").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "bucket": b.column("bucket"),
            "n": pa.array(n, pa.int64()),
            "max_tok": pa.array(mx, pa.int64()),
            "pad_waste": pa.array(n * mx - s, pa.int64()),
        })

    return agg.map_batches(fin, batch_format="pyarrow")


def char_pair_counts(ds, *, text_col: str = "text", n_buckets: int = 32):
    """BPE merge-candidate counting — the first step of byte-pair-encoding
    tokenizer TRAINING: corpus-wide counts of adjacent character pairs
    WITHIN tokens (whitespace pre-tokenization, the GPT-2 convention).
    Output: (pair, n) with ``pair`` the two characters concatenated.

    Per batch, texts decode once into a contiguous codepoint buffer
    (the stages/dedup.py pattern); a pair survives iff neither side is
    RE2-``\\s`` whitespace and the pair doesn't cross a doc boundary
    (boundaries are masked by offset, NOT an in-band sentinel, so every
    legal codepoint — including U+10FFFD — counts correctly).  Counts
    combine per batch via ``np.unique`` on a packed ``cp1 * 2^21 + cp2``
    key (codepoints < 2^21), so the single bucketed shuffle is bounded
    by the alphabet², never the corpus; pair strings materialize only
    for the distinct survivors.
    """
    from .dedup import _WS_CPS

    def partial(batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column(text_col).to_pylist()]
        joined = "".join(texts)
        cps = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        empty = pa.table({"pair": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if len(cps) < 2:
            return empty
        a, b = cps[:-1], cps[1:]
        bad = np.isin(a, _WS_CPS) | np.isin(b, _WS_CPS)
        # mask pairs straddling doc boundaries by offset
        lens = np.fromiter((len(t) for t in texts), dtype=np.int64,
                           count=len(texts))
        cross = np.cumsum(lens)[:-1] - 1
        cross = cross[(cross >= 0) & (cross < len(a))]
        bad[cross] = True
        key = (a[~bad].astype(np.int64) << 21) | b[~bad].astype(np.int64)
        if len(key) == 0:
            return empty
        uniq, counts = np.unique(key, return_counts=True)
        pairs = [chr(int(k) >> 21) + chr(int(k) & 0x1FFFFF) for k in uniq]
        return pa.table({"pair": pa.array(pairs, pa.string()),
                         "n": pa.array(counts.astype(np.int64), pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def fn(g):
        out = g.groupby("pair", sort=False, as_index=False)["n"].sum()
        out["n"] = out["n"].astype(np.int64)
        return out

    return bucketed_groupby(partials, ["pair"], fn, n_buckets=n_buckets)


def split_records(ds, pattern: str, *, id_col: str = "doc_id",
                  text_col: str = "text", out_col: str = "part",
                  idx_col: str = "part_idx", drop_empty: bool = True):
    """Regex record/sentence splitter: one output row per regex-delimited
    part of each document — (id, 1-based part index, part text).

    Pure ``map_batches`` flat map, NO shuffle: ``pc.split_pattern_regex``
    (RE2) builds the list column, explode is zero-copy via list offsets
    + ``list_parent_indices``.  RE2 has no lookbehind, so the delimiter
    itself is consumed — identical on both sides of the oracle
    (DuckDB ``regexp_split_to_array`` is RE2 too; parity probed for
    adjacent/leading/trailing delimiters).  Null text splits like ''.
    Sentence splitting = ``pattern=r"[.!?]+[\\t\\n\\f\\r ]+"``."""

    def fn(b: pa.Table) -> pa.Table:
        texts = pc.fill_null(b.column(text_col), "")
        parts = pc.split_pattern_regex(texts, pattern)
        la = parts.combine_chunks()
        flat = pc.list_flatten(la)
        parents = pc.list_parent_indices(la).to_numpy(zero_copy_only=False)
        offs = la.offsets.to_numpy(zero_copy_only=False)
        counts = np.diff(offs)
        total = int(counts.sum())
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1]  # rebased
        idx = (np.arange(total, dtype=np.int64)
               - np.repeat(starts.astype(np.int64), counts) + 1)
        ids = b.column(id_col).take(pa.array(parents))
        out = pa.table({id_col: ids,
                        idx_col: pa.array(idx),
                        out_col: flat})
        if drop_empty:
            out = out.filter(pc.greater(pc.utf8_length(out.column(out_col)),
                                        pa.scalar(0, pa.int32())))
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def block_dedup(ds, *, id_col: str = "doc_id", text_col: str = "text",
                size: int = 4, n_buckets: int = 64):
    """Paragraph/line-level exact dedup (the Dolma/RedPajama cleaning
    step) over separator-free text: the dedup unit is the ``size``-token
    BLOCK (``chunk_documents`` with zero overlap).  Corpus-wide, every
    distinct block text keeps only its FIRST occurrence — lexicographic
    min (doc, block index), deterministic — and each doc is rebuilt from
    its surviving blocks in order.  Docs whose every block duplicates an
    earlier one come back empty; zero-token docs pass through as ''.

    Output: (id_col, clean_text, n_blocks, n_kept).

    Scale shape: block rows shuffle ONCE keyed by an fnv1a hash of the
    block text (grouping inside the bucket is on the text itself, so
    collisions cost only balance, never correctness); winners shuffle
    once by doc for the vectorized binary_join rebuild; one bucketed
    LEFT join attaches the per-doc block counts so fully-deduped docs
    still emit a row.  Nothing materializes on the driver.
    """
    from ..functions.hashing import fnv1a_str_array
    from .hashjoin import bucketed_join

    chunks = chunk_documents(ds, id_col=id_col, text_col=text_col,
                             size=size, overlap=0)

    def project(b: pa.Table) -> pa.Table:
        txt = b.column("chunk_text")
        h = fnv1a_str_array(txt.to_pylist()).view(np.int64)
        return pa.table({
            id_col: b.column(id_col),
            "chunk_idx": b.column("chunk_idx"),
            "chunk_text": txt,
            "__ch": pa.array(h),
        })

    rows = chunks.map_batches(project, batch_format="pyarrow")

    def first_per_block(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                id_col: pd.Series([], dtype="int64"),
                "chunk_idx": pd.Series([], dtype="int64"),
                "chunk_text": pd.Series([], dtype="object")})
        o = np.lexsort((g["chunk_idx"].to_numpy(),
                        g[id_col].to_numpy(),
                        g["chunk_text"].to_numpy()))
        t = g["chunk_text"].to_numpy()[o]
        new = np.ones(len(t), dtype=bool)
        new[1:] = t[1:] != t[:-1]
        return g.iloc[o[new]][[id_col, "chunk_idx", "chunk_text"]]

    winners = bucketed_groupby(rows, ["__ch"], first_per_block,
                               n_buckets=n_buckets)

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        o = np.lexsort((g["chunk_idx"].to_numpy(), g[id_col].to_numpy()))
        d = g[id_col].to_numpy()[o]
        texts = pa.array(g["chunk_text"].to_numpy()[o], pa.string())
        new = np.ones(len(d), dtype=bool)
        new[1:] = d[1:] != d[:-1]
        starts = np.flatnonzero(new)
        off = np.append(starts, len(d)).astype(np.int32)
        la = pa.ListArray.from_arrays(pa.array(off, pa.int32()), texts)
        return pd.DataFrame({
            id_col: d[starts],
            "kept_text": pc.binary_join(la, " ").to_pylist(),
            "n_kept": np.diff(off).astype(np.int64)})

    rebuilt = bucketed_groupby(winners, [id_col], rebuild,
                               n_buckets=n_buckets)

    def meta(b: pa.Table) -> pa.Table:
        _, doc_of, ndocs = tokens_flat(b, text_col)
        n = np.bincount(doc_of, minlength=ndocs).astype(np.int64)
        return pa.table({
            id_col: b.column(id_col),
            "n_blocks": pa.array((n + size - 1) // size),
        })

    metas = ds.map_batches(meta, batch_format="pyarrow")
    joined = bucketed_join(metas, rebuilt, [id_col], how="left",
                           n_buckets=n_buckets)

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b.column(id_col),
            "clean_text": pc.fill_null(b.column("kept_text"), ""),
            "n_blocks": b.column("n_blocks"),
            "n_kept": pc.fill_null(pc.cast(b.column("n_kept"), pa.int64()),
                                   0),
        })

    return joined.map_batches(finalize, batch_format="pyarrow")


def strip_boilerplate(ds, *, id_col: str = "doc_id",
                      text_col: str = "text", source_col: str = "source",
                      size: int = 4, min_docs: int = 2,
                      frac_num: int = 1, frac_den: int = 20,
                      n_buckets: int = 64):
    """CCNet/Dolma-style per-SOURCE boilerplate removal: a block (the
    ``size``-token chunk, same dedup unit as ``block_dedup``) is
    BOILERPLATE within source s when it occurs in >= ``min_docs``
    distinct docs of s AND ``df * frac_den >= frac_num * n_docs(s)`` —
    an integer cross-multiplied document-frequency threshold (nav bars,
    footers, cookie banners: content frequent WITHIN a site).  EVERY
    occurrence is dropped (contrast ``block_dedup``, which keeps the
    first); each doc rebuilds from its surviving blocks in order.

    Output: (id_col, clean_text, n_blocks, n_kept), one row per doc
    (fully-boilerplate and zero-token docs come back as '').

    100-TB shape: the only all-to-all is the (source, block)
    doc-frequency reduce, and it moves per-batch PARTIAL counts — one
    doc per input row makes within-batch distinct (doc, block) pairs
    globally distinct, so the partials are exact — bucketed by a block
    rolling hash (grouping stays on the text; collisions cost balance,
    never correctness).  Per-source doc totals are a |sources|-bounded
    reduce, the filtered boilerplate set is df-bounded; both broadcast
    once via ``ray.put`` and the strip + rebuild is ONE stateless map
    pass — the corpus itself never shuffles.  Source-prefixed keys are
    length-prefixed (``len(s):s + block``) so the pairing is injective
    without a reserved separator byte.
    """
    from ..functions.hashing import fnv1a_str_array

    def df_partial(b: pa.Table) -> pa.Table:
        t, _, _ = _chunk_batch(b, id_col=id_col, text_col=text_col,
                               size=size, stride=size,
                               extra_cols=(source_col,))
        if t.num_rows == 0:
            return pa.table({"s": pa.array([], pa.string()),
                             "p": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64()),
                             "__ch": pa.array([], pa.int64())})
        d = pd.DataFrame({
            "i": t.column(id_col).to_numpy(zero_copy_only=False),
            "s": t.column(source_col).to_numpy(zero_copy_only=False),
            "p": t.column("chunk_text").to_numpy(zero_copy_only=False),
        })
        cnt = (d.drop_duplicates(["i", "p"])
               .groupby(["s", "p"], sort=False, as_index=False).size())
        h = fnv1a_str_array(cnt["p"].tolist()).view(np.int64)
        return pa.table({
            "s": pa.array(cnt["s"].to_numpy(), pa.string()),
            "p": pa.array(cnt["p"].to_numpy(), pa.string()),
            "df": pa.array(cnt["size"].to_numpy().astype(np.int64)),
            "__ch": pa.array(h),
        })

    def tot_partial(b: pa.Table) -> pa.Table:
        s, c = np.unique(
            b.column(source_col).to_numpy(zero_copy_only=False),
            return_counts=True)
        return pa.table({"s": pa.array(s, pa.string()),
                         "nd": pa.array(c.astype(np.int64))})

    tot = bucketed_groupby(
        ds.map_batches(tot_partial, batch_format="pyarrow"), ["s"],
        lambda g: g.groupby("s", sort=False, as_index=False)["nd"].sum(),
        n_buckets=min(n_buckets, 16)).to_pandas()
    nd_map = dict(zip(tot["s"], tot["nd"].astype("int64")))

    def boil_reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["s", "p"], sort=False, as_index=False)["df"].sum()
        dfv = out["df"].to_numpy().astype(np.int64)
        nd = out["s"].map(nd_map).to_numpy().astype(np.int64)
        keep = (dfv >= min_docs) & (dfv * frac_den >= frac_num * nd)
        return out.loc[keep, ["s", "p"]]

    boil = bucketed_groupby(
        ds.map_batches(df_partial, batch_format="pyarrow"),
        ["__ch"], boil_reduce, n_buckets=n_buckets).to_pandas()
    keys = (boil["s"].str.len().astype(str) + ":" + boil["s"]
            + boil["p"]).to_numpy() if len(boil) else np.array([], object)

    import ray as _ray

    ref = _ray.put(keys) if _ray.is_initialized() else keys

    def strip(b: pa.Table, _ref=ref) -> pa.Table:
        from .graph import _get_blob

        kv = _ref if isinstance(_ref, np.ndarray) else _get_blob(_ref)
        t, chunk_doc, ndocs = _chunk_batch(
            b, id_col=id_col, text_col=text_col, size=size, stride=size,
            extra_cols=(source_col,))
        n_blocks = np.bincount(chunk_doc, minlength=ndocs).astype(np.int64)
        keep = np.ones(t.num_rows, dtype=bool)
        if t.num_rows and len(kv):
            big = pa.large_string()
            src = pc.cast(t.column(source_col), big)
            para = pc.cast(t.column("chunk_text"), big)
            key = pc.binary_join_element_wise(
                pc.cast(pc.utf8_length(src), big), pa.scalar(":", big),
                src, para, pa.scalar("", big))
            keep = ~pc.is_in(
                key, value_set=pa.array(kv, big)).to_numpy(
                    zero_copy_only=False)
        counts = np.bincount(chunk_doc[keep],
                             minlength=ndocs).astype(np.int64)
        off = np.zeros(ndocs + 1, dtype=np.int64)
        np.cumsum(counts, out=off[1:])
        texts = t.column("chunk_text").filter(pa.array(keep))
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        la = pa.ListArray.from_arrays(pa.array(off, pa.int32()),
                                      pc.cast(texts, pa.string()))
        return pa.table({
            id_col: b.column(id_col),
            "clean_text": pc.binary_join(la, " "),
            "n_blocks": pa.array(n_blocks),
            "n_kept": pa.array(counts),
        })

    return ds.map_batches(strip, batch_format="pyarrow")


def phrase_search(ds, phrases, *, id_col: str = "doc_id",
                  text_col: str = "text"):
    """Positional phrase search: for each query phrase, every document
    where the phrase's tokens occur CONSECUTIVELY, with the occurrence
    count and the 1-based token position of the first hit — the
    phrase-query leg of the retrieval family (postings/tfidf/bm25 are
    bag-of-words; this is the order-sensitive exact-match complement).

    Output: (pid, id_col, n_hits, first_pos), one row per (phrase, doc)
    with >= 1 hit; ``pid`` indexes ``phrases``.

    100-TB shape: pure ``map_batches``, NO shuffle — one doc per input
    row means per-doc hit counts reduce in-batch.  Matching is K
    shifted vectorized equality passes over the flat token array per
    phrase (K = phrase length), with a doc-boundary guard — never a
    Python loop over tokens; cost is O(tokens x sum of phrase lengths).
    Phrases tokenize with the shared RE2 ``\\S+`` convention.
    """
    import re as _re

    plists = [_re.findall(r"[^\t\n\f\r ]+", p) for p in phrases]

    def fn(b: pa.Table) -> pa.Table:
        flat, doc_of, ndocs = tokens_flat(b, text_col)
        toks = flat.to_numpy(zero_copy_only=False)
        n = np.bincount(doc_of, minlength=ndocs).astype(np.int64)
        doc_base = np.zeros(ndocs, dtype=np.int64)
        np.cumsum(n[:-1], out=doc_base[1:])
        N = len(toks)
        ids = b.column(id_col)
        out_pid, out_doc, out_hits, out_first = [], [], [], []
        for pid, pt in enumerate(plists):
            k = len(pt)
            if k == 0 or N < k:
                continue
            w = N - k + 1
            mask = toks[:w] == pt[0]
            for j in range(1, k):
                mask &= toks[j:j + w] == pt[j]
            mask &= doc_of[:w] == doc_of[k - 1:]
            idx = np.flatnonzero(mask)
            if len(idx) == 0:
                continue
            d = doc_of[idx]
            pos = idx - doc_base[d] + 1
            new = np.ones(len(d), dtype=bool)
            new[1:] = d[1:] != d[:-1]
            starts = np.flatnonzero(new)
            out_pid.append(np.full(len(starts), pid, dtype=np.int64))
            out_doc.append(ids.take(pa.array(d[starts])))
            out_hits.append(np.diff(np.append(starts, len(d)))
                            .astype(np.int64))
            out_first.append(pos[starts])
        if not out_pid:
            return pa.table({"pid": pa.array([], pa.int64()),
                             id_col: pa.array([], ids.type),
                             "n_hits": pa.array([], pa.int64()),
                             "first_pos": pa.array([], pa.int64())})
        doc_arr = pa.concat_arrays(
            [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
             for a in out_doc])
        return pa.table({"pid": pa.array(np.concatenate(out_pid)),
                         id_col: doc_arr,
                         "n_hits": pa.array(np.concatenate(out_hits)),
                         "first_pos": pa.array(np.concatenate(out_first))})

    return ds.map_batches(fn, batch_format="pyarrow")


def bpe_learn(docs, *, rounds: int = 3, top_v: int | None = None,
              id_col: str = "doc_id", text_col: str = "text",
              n_buckets: int = 64):
    """BPE tokenizer TRAINING (Sennrich et al. 2016): learn ``rounds``
    merges over the whitespace-pretokenized corpus.

    The distributed part is the word counting — combiner-first
    ``np.unique`` partials, one vocab-bounded bucketed sum (optionally
    capped to ``top_v`` words by count desc / word asc).  The merge
    rounds then run on the BOUNDED vocabulary table (the model-sized
    state, exactly how production BPE trainers work: corpus-size work
    happens once, per-round work is |vocab|): each round counts
    adjacent symbol pairs weighted by word count, picks the top pair
    (count desc, pair-string asc — deterministic), and merges it
    everywhere LEFT-TO-RIGHT NON-OVERLAPPING — encoded as sequential
    ``str.replace`` over DOUBLE-SPACE-joined symbol sequences with
    single-space sentinels, which makes the semantics identical to
    DuckDB's ``replace`` so the SQL oracle mirrors every round.

    Output: (step, lhs, rhs, n) — the learned merge table.
    """
    _, _, merges = _bpe_train(docs, rounds=rounds, top_v=top_v,
                              text_col=text_col, n_buckets=n_buckets)
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "step": pa.array([m[0] for m in merges], pa.int64()),
        "lhs": pa.array([m[1] for m in merges], pa.string()),
        "rhs": pa.array([m[2] for m in merges], pa.string()),
        "n": pa.array([m[3] for m in merges], pa.int64()),
    }))


def _bpe_train(docs, *, rounds: int, top_v: int | None,
               text_col: str, n_buckets: int):
    """Shared BPE trainer: returns (words, final seqs, merges)."""

    def count_partial(b: pa.Table) -> pa.Table:
        flat, _, _ = tokens_flat(b, text_col)
        w, c = np.unique(flat.to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"w": pa.array(w, pa.string()),
                         "c": pa.array(c.astype(np.int64))})

    counts = bucketed_groupby(
        docs.map_batches(count_partial, batch_format="pyarrow"),
        ["w"],
        lambda g: g.groupby("w", sort=False, as_index=False)["c"].sum(),
        n_buckets=n_buckets).to_pandas()
    if top_v is not None:
        counts = counts.sort_values(["c", "w"], ascending=[False, True],
                                    kind="mergesort").head(top_v)
    words = counts["w"].tolist()
    wc = counts["c"].to_numpy().astype(np.int64)
    seqs = ["  ".join(w) for w in words]

    merges = []
    for step in range(1, rounds + 1):
        pair_n: dict[str, int] = {}
        for s, c in zip(seqs, wc):
            syms = s.split("  ")
            for a, b in zip(syms, syms[1:]):
                p = a + " " + b
                pair_n[p] = pair_n.get(p, 0) + int(c)
        if not pair_n:
            break
        top = min(pair_n.items(), key=lambda kv: (-kv[1], kv[0]))
        pair, n = top
        left, right = pair.split(" ")
        merged = left + right
        pat = " " + left + "  " + right + " "
        rep = " " + merged + " "
        seqs = [(" " + s + " ").replace(pat, rep).strip(" ")
                for s in seqs]
        merges.append((np.int64(step), left, right, np.int64(n)))
    return words, seqs, merges


def bpe_token_counts(docs, *, rounds: int = 3, top_v: int | None = None,
                     id_col: str = "doc_id", text_col: str = "text",
                     n_buckets: int = 64):
    """Tokenizer APPLICATION: train ``rounds`` BPE merges (see
    :func:`bpe_learn`), then count each doc's tokens UNDER the trained
    tokenizer — the sizing pass every training-data pipeline runs
    before sharding.  The word→symbol-count table is the model: it
    broadcasts once via ``ray.put`` (sorted word array + counts) and
    scoring is one stateless map with exact int64 segment sums.

    Output: (id_col, n_bpe_tokens), one row per doc with >= 1 token.
    Words outside a ``top_v``-capped vocabulary count as their
    character count (fully-split fallback).
    """
    words, seqs, _ = _bpe_train(docs, rounds=rounds, top_v=top_v,
                                text_col=text_col, n_buckets=n_buckets)
    warr = np.array(words, dtype=object)
    ns = np.array([len(s.split("  ")) for s in seqs], dtype=np.int64)
    o = np.argsort(warr)
    warr, ns = warr[o], ns[o]

    import ray as _ray

    blob = (warr, ns)
    ref = _ray.put(blob) if _ray.is_initialized() else blob

    def count(b: pa.Table, _ref=ref) -> pa.Table:
        from .graph import _get_blob

        ws, nsym = _ref if isinstance(_ref, tuple) else _get_blob(_ref)
        flat, doc_of, ndocs = tokens_flat(b, text_col)
        toks = flat.to_numpy(zero_copy_only=False)
        out = np.zeros(ndocs, dtype=np.int64)
        if len(toks):
            p = np.searchsorted(ws, toks)
            p[p == len(ws)] = 0
            hit = ws[p] == toks
            lens = np.fromiter((len(t) for t in toks), dtype=np.int64,
                               count=len(toks))
            per_tok = np.where(hit, nsym[p], lens)
            starts = np.flatnonzero(
                np.concatenate([[True], doc_of[1:] != doc_of[:-1]]))
            out[doc_of[starts]] = np.add.reduceat(per_tok, starts)
        keep = out > 0
        ids = b.column(id_col).to_numpy(zero_copy_only=False)[keep]
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "n_bpe_tokens": pa.array(out[keep])})

    return docs.map_batches(count, batch_format="pyarrow")


def text_tiling_boundaries(ds, *, id_col: str = "doc_id",
                           text_col: str = "text",
                           block_tokens: int = 8):
    """TextTiling-style TOPIC-BOUNDARY detection (Hearst 1997 recast in
    exact integers): split each doc into fixed ``block_tokens`` token
    blocks, score every adjacent block pair by the number of DISTINCT
    shared tokens, and report the gaps that are STRICT local minima of
    that overlap (both neighbors higher) — the low-cohesion points
    where topics change.  Interior gaps only; docs under three blocks
    emit nothing.  Output: (id, gap, overlap) per boundary, where
    ``gap`` g sits between blocks g and g+1 (0-based).

    Pure stateless map_batches — tokenization, per-(doc, block)
    distinct sets, adjacent-intersection counts and the valley test
    are all vectorized per batch; nothing shuffles.  Integer counts,
    so the SQL oracle matches bit-exactly.
    """

    def fn(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        flat, doc_of, ndocs = tokens_flat(b, text_col)
        toks = flat.to_numpy(zero_copy_only=False)
        if len(toks) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "gap": pa.array([], pa.int64()),
                             "overlap": pa.array([], pa.int64())})
        # token position within doc -> block id
        starts = np.flatnonzero(
            np.concatenate([[True], doc_of[1:] != doc_of[:-1]]))
        pos = np.arange(len(doc_of)) - np.repeat(
            starts, np.diff(np.append(starts, len(doc_of))))
        blk = pos // block_tokens
        # distinct (doc, blk, token) triples
        df = pd.DataFrame({"d": doc_of, "b": blk, "w": toks})
        df = df.drop_duplicates(["d", "b", "w"])
        nxt = df.copy()
        nxt["b"] = nxt["b"] - 1
        ov = df.merge(nxt, on=["d", "b", "w"]).groupby(
            ["d", "b"], sort=False).size().reset_index(name="ov")
        # all interior gaps with 0-overlap defaults
        ntok = np.bincount(doc_of, minlength=ndocs)
        nblk = (ntok + block_tokens - 1) // block_tokens
        m = np.maximum(nblk - 1, 0).astype(np.int64)
        if int(m.sum()) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "gap": pa.array([], pa.int64()),
                             "overlap": pa.array([], pa.int64())})
        gd = np.repeat(np.arange(ndocs), m)
        offs = np.concatenate([[0], np.cumsum(m)[:-1]])
        gg = np.arange(int(m.sum())) - np.repeat(offs, m)
        gaps = pd.DataFrame({"d": gd, "b": gg.astype(np.int64)})
        gaps = gaps.merge(ov, on=["d", "b"], how="left")
        gaps["ov"] = gaps["ov"].fillna(0).astype(np.int64)
        d_a = gaps["d"].to_numpy()
        g_a = gaps["b"].to_numpy()
        o_a = gaps["ov"].to_numpy()
        # strict local minima among interior gaps of the same doc
        same_prev = np.concatenate([[False], d_a[1:] == d_a[:-1]])
        same_next = np.concatenate([d_a[:-1] == d_a[1:], [False]])
        prev_o = np.concatenate([[0], o_a[:-1]])
        next_o = np.concatenate([o_a[1:], [0]])
        keep = same_prev & same_next & (o_a < prev_o) & (o_a < next_o)
        return pa.table({
            id_col: pa.array(ids[d_a[keep]].astype(np.int64)),
            "gap": pa.array(g_a[keep]),
            "overlap": pa.array(o_a[keep]),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def span_corruption_index(docs, *, id_col: str = "doc_id",
                          text_col: str = "text", block: int = 20,
                          span_len: int = 3, hash_a: int = 2654435761,
                          hash_c: int = 40503, hash_p: int = 2147483647):
    """T5/UL2-style SPAN-CORRUPTION masking index: for every FULL
    ``block``-token window of each doc, one masked span of
    ``span_len`` tokens at a hash-chosen offset — deterministic
    (RNG-free, so the index is reproducible and resumable), one span
    per block ⇒ a fixed ~span_len/block corruption rate with
    non-overlapping spans by construction.

    Offset rule (SQL-safe multiply-add arithmetic, no xor):
    ``off = ((id·A + blk·C) mod P) mod (block − span_len + 1)``;
    the trailing partial block stays unmasked.  Pure stateless map —
    nothing shuffles; output rows are n_tokens/block per doc.

    Output: ``(id_col, block, start, mlen)`` — start is the global
    token index of the span, all int64.
    """
    from .ngrams import tokens_flat

    win = block - span_len + 1

    def fn(b: pa.Table) -> pa.Table:
        _, doc_of, ndocs = tokens_flat(b, text_col)
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        nt = np.bincount(doc_of, minlength=ndocs)
        nblk = (nt // block).astype(np.int64)
        ridx = np.repeat(np.arange(ndocs), nblk)
        blk = (np.concatenate([np.arange(k) for k in nblk.tolist()])
               if ndocs else np.array([], dtype=np.int64)
               ).astype(np.int64)
        did = ids[ridx].astype(np.int64)
        off = ((did * hash_a + blk * hash_c) % hash_p) % win
        return pa.table({
            id_col: pa.array(did),
            "block": pa.array(blk),
            "start": pa.array(blk * block + off),
            "mlen": pa.array(np.full(len(blk), span_len,
                                     dtype=np.int64)),
        })

    return docs.map_batches(fn, batch_format="pyarrow")
