"""Bag-of-words / TF-IDF featurization over the documents table.

The text-featurization operator a training pipeline runs before
classical models or as model-input statistics: a document-frequency
vocabulary (top-V terms) plus per-doc term counts.

Scale shapes:
* per-doc term counts — one vectorized pass per batch over the SHARED
  poly64 tokenizer (``dedup.token_hashes_batch`` — same hashes the
  MinHash/SimHash suite and the SQL oracles use), distinct (doc, term)
  pairs with counts via one lexsort + run-length, no Python per doc;
* document frequency — (doc, term) rows are already distinct, so df is
  a keyed row count (coarse-bucket reduce);
* vocabulary — local top-V per block, then a single tiny final top-V:
  only V rows per block ever move, the term universe never collects;
* featurize — the V-term vocabulary is a driver-side dict (bounded),
  broadcast into a map_batches filter.

All values are integers (term = poly64 hash as int64, tf, df), so the
whole pipeline is oracle-exact; idf/tf-idf floats are derived client-
side where bit-parity is not required.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import token_hashes_batch


def doc_term_counts(batch: pa.Table, *, id_col: str = "doc_id",
                    text_col: str = "text") -> pa.Table:
    """(doc_id, term, tf) rows — one row per DISTINCT (doc, token-hash)
    with its in-doc count.  term is the poly64 token hash viewed int64."""
    texts = batch.column(text_col).to_pylist()
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    th, off = token_hashes_batch(texts)
    ndocs = len(texts)
    doc_idx = np.repeat(np.arange(ndocs), np.diff(off))
    if len(th) == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "term": pa.array([], pa.int64()),
                         "tf": pa.array([], pa.int64())})
    order = np.lexsort((th, doc_idx))
    d = doc_idx[order]
    h = th[order]
    new = np.concatenate([[True], (d[1:] != d[:-1]) | (h[1:] != h[:-1])])
    starts = np.flatnonzero(new)
    tf = np.diff(np.concatenate([starts, [len(h)]]))
    return pa.table({
        id_col: pa.array(ids[d[starts]], pa.int64()),
        "term": pa.array(h[starts].view(np.int64), pa.int64()),
        "tf": pa.array(tf.astype(np.int64), pa.int64()),
    })


def _local_top_v(g: pd.DataFrame, v: int) -> pd.DataFrame:
    # df desc, term ascending in UNSIGNED order (matches SQL HUGEINT asc)
    g = g.assign(_tu=g["term"].to_numpy().view(np.uint64))
    g = g.sort_values(["df", "_tu"], ascending=[False, True],
                      kind="mergesort").head(v)
    return g.drop(columns=["_tu"])


def build_vocabulary(docs_ds=None, *, id_col: str = "doc_id",
                     text_col: str = "text", top_v: int = 20,
                     n_buckets: int = 64, terms_ds=None):
    """Top-``top_v`` terms by document frequency -> a SMALL Dataset of
    (term, df) rows (ties broken by unsigned term order).  Only V rows
    per block survive the local prune; the final reduce sees
    blocks x V rows.  Pass ``terms_ds`` (a doc_term_counts output) to
    reuse an already-tokenized term table instead of ``docs_ds``."""
    from .bucketed import bucketed_groupby

    terms = terms_ds if terms_ds is not None else docs_ds.map_batches(
        lambda b: doc_term_counts(b, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
    )
    dfv = bucketed_groupby(
        terms,
        ["term"],
        lambda g: g.groupby("term", sort=False)
        .size().rename("df").reset_index(),
        n_buckets=n_buckets,
    )
    pruned = dfv.map_batches(
        lambda b: pa.Table.from_pandas(
            _local_top_v(b.to_pandas(), top_v), preserve_index=False
        ),
        batch_format="pyarrow",
    ).repartition(1)
    return pruned.map_batches(
        lambda b: pa.Table.from_pandas(
            _local_top_v(b.to_pandas(), top_v), preserve_index=False
        ),
        batch_format="pyarrow",
    )


def tfidf_features(docs_ds, *, id_col: str = "doc_id",
                   text_col: str = "text", top_v: int = 20,
                   n_buckets: int = 64):
    """(doc_id, term, tf, df) rows for the top-``top_v``-df vocabulary —
    integer-exact (idf = ln(N/df) is a trivial client-side derivation
    whose float libm would break bit-parity, so it stays out of the
    oracle surface).  The vocabulary is collected driver-side (V rows,
    bounded) and broadcast into the filter.  The term table is
    tokenized ONCE and materialized (distinct (doc, term) rows —
    spillable object-store residency), then consumed by both the
    vocabulary reduce and the featurize filter."""
    terms = docs_ds.map_batches(
        lambda b: doc_term_counts(b, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
    ).materialize()
    vocab_tbl = build_vocabulary(
        top_v=top_v, n_buckets=n_buckets, terms_ds=terms
    ).to_pandas()
    order = np.argsort(vocab_tbl["term"].to_numpy())
    vocab_terms = vocab_tbl["term"].to_numpy()[order]
    vocab_dfs = vocab_tbl["df"].to_numpy().astype(np.int64)[order]

    def featurize(b: pa.Table) -> pa.Table:
        t = b.column("term").to_numpy(zero_copy_only=False)
        keep = np.isin(t, vocab_terms)
        out = b.filter(pa.array(keep))
        tt = out.column("term").to_numpy(zero_copy_only=False)
        # vectorized df lookup via searchsorted on the sorted vocab
        dfs = vocab_dfs[np.searchsorted(vocab_terms, tt)]
        return out.append_column("df", pa.array(dfs, pa.int64()))

    return terms.map_batches(featurize, batch_format="pyarrow")
