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


def bm25_topk(docs, terms: list[str], *, k: int = 20,
              id_col: str = "doc_id", text_col: str = "text",
              k1: float = 1.25, b: float = 0.75):
    """BM25 top-k retrieval for a fixed query-term list — the classic
    lexical search scorer over a corpus, in two passes:

    1. STATS: one combiner-first map emits a single partial row per
       batch (n docs with tokens, Σdl, per-term document frequencies);
       the driver folds the bounded partials into the corpus constants.
    2. SCORE: stateless map computes every matching doc's score and
       keeps a LOCAL top-k per block; one single-block finale reduces
       blocks x k rows to the global top-k.  Nothing else shuffles.

    Bit-parity discipline (the oracle value-checks scores): k1 = 1.25
    and b = 0.75 are exactly-representable doubles; idf is the LOG-FREE
    ratio ((N - df) + 0.5) / (df + 0.5) (libm-free — DuckDB and numpy
    ln may differ in the last ulp); per-term contributions follow ONE
    parenthesization mirrored by the SQL; the final score adds the
    fixed-order term contributions explicitly, never via an unordered
    SUM.  Ties break doc id ascending.

    Output: (id_col, score), the global top-k.
    """
    import pandas as pd

    from .ngrams import tokens_flat

    terms = list(terms)
    t_arr = np.array(terms, dtype=object)

    def stats_partial(batch: pa.Table) -> pa.Table:
        flat, doc_of, ndocs = tokens_flat(batch, text_col)
        toks = flat.to_numpy(zero_copy_only=False)
        n = np.bincount(doc_of, minlength=ndocs)
        cols = {"n_docs": pa.array([int((n > 0).sum())], pa.int64()),
                "sum_dl": pa.array([int(n.sum())], pa.int64())}
        for j, t in enumerate(terms):
            tf = np.bincount(doc_of[toks == t], minlength=ndocs)
            cols[f"df_{j}"] = pa.array([int((tf > 0).sum())], pa.int64())
        return pa.table(cols)

    parts = docs.map_batches(stats_partial,
                             batch_format="pyarrow").to_pandas()
    n_corpus = int(parts["n_docs"].sum())
    sum_dl = int(parts["sum_dl"].sum())
    df = np.array([int(parts[f"df_{j}"].sum()) for j in range(len(terms))],
                  dtype=np.int64)
    if n_corpus == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "score": pa.array([], pa.float64())}))
    avgdl = np.float64(sum_dl) / np.float64(n_corpus)
    idf = ((n_corpus - df) + 0.5) / (df + 0.5)  # (T,) doubles

    def score_local(batch: pa.Table) -> pa.Table:
        flat, doc_of, ndocs = tokens_flat(batch, text_col)
        toks = flat.to_numpy(zero_copy_only=False)
        dl = np.bincount(doc_of, minlength=ndocs).astype(np.int64)
        score = np.zeros(ndocs, dtype=np.float64)
        any_hit = np.zeros(ndocs, dtype=bool)
        with np.errstate(invalid="ignore"):
            dl_ratio = dl.astype(np.float64) / avgdl
        for j in range(len(terms)):
            tf = np.bincount(doc_of[toks == t_arr[j]],
                             minlength=ndocs).astype(np.float64)
            denom = tf + k1 * ((1.0 - b) + b * dl_ratio)
            contrib = idf[j] * ((tf * (k1 + 1.0)) / np.where(
                denom == 0.0, 1.0, denom))
            contrib = np.where(tf > 0, contrib, 0.0)
            any_hit |= tf > 0
            score = score + contrib  # fixed term order
        keep = any_hit
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)[keep]
        sc = score[keep]
        o = np.lexsort((ids, -sc))[:k]
        return pa.table({id_col: pa.array(ids[o], pa.int64()),
                         "score": pa.array(sc[o], pa.float64())})

    local = docs.map_batches(score_local, batch_format="pyarrow")

    def finale(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sc = batch.column("score").to_numpy(zero_copy_only=False)
        o = np.lexsort((ids, -sc))[:k]
        return pa.table({id_col: pa.array(ids[o], pa.int64()),
                         "score": pa.array(sc[o], pa.float64())})

    return local.repartition(1).map_batches(finale,
                                            batch_format="pyarrow")


def chi2_feature_select(docs, *, text_col: str = "text",
                        label_col: str = "lang", label_val: str = "en",
                        top_k: int = 50, min_df: int = 5,
                        n_buckets: int = 32):
    """Chi-square token feature selection for document classifiers
    (the fastText-quality-filter feature-picking step): rank tokens by
    the 2x2 chi-square between PRESENCE-in-doc and a binary label
    ``label_col == label_val``.

    chi2 = T * (a*d - b*c)^2 / ((a+b)(c+d)(a+c)(b+d)) over the
    contingency cells a (token & label) / b (token & ~label) /
    c (~token & label) / d (~token & ~label).  All cell arithmetic is
    exact int64 (delta = a*d - b*c stays exact while T^2 < 2^63); the
    final value enters ONE shared float expression shape —
    (T·(Δ·Δ)) / ((ab·cd)·(ac·bd)) — so the DOUBLE value-checks
    bit-exactly (oracle ``chi2_tokens``).  Degenerate tokens (a margin
    of zero, e.g. a token present in EVERY doc) are dropped, mirroring
    the SQL WHERE.

    Output: ``(w, n_pos, df, chi2)``, ``top_k`` rows by
    (chi2 DESC, w) — ``n_pos`` = labeled docs containing w, ``df`` =
    all docs containing w.

    100-TB shape: per-batch (token -> df/a partials) over per-doc
    DISTINCT tokens bound the one shuffle by |vocab per block|; totals
    fold one bounded row per block on the driver; top-k is local-
    then-one-block.  The label margin (T, P) is two scalars — no
    label-side shuffle exists at all.
    """
    from .bucketed import bucketed_groupby
    from .ngrams import tokens_flat

    def partial(b: pa.Table) -> pa.Table:
        flat, doc_of, ndocs = tokens_flat(b, text_col)
        y = (b.column(label_col).to_numpy(zero_copy_only=False)
             == label_val).astype(np.int64)
        df = pd.DataFrame({
            "w": flat.to_numpy(zero_copy_only=False), "d": doc_of,
        }).drop_duplicates()
        df["a"] = y[df["d"].to_numpy()]
        g = df.groupby("w", sort=False, as_index=False).agg(
            df_=("d", "size"), a=("a", "sum"))
        return pa.table({
            "w": pa.array(g["w"].to_numpy(), pa.string()),
            "df": pa.array(g["df_"].to_numpy().astype(np.int64)),
            "a": pa.array(g["a"].to_numpy().astype(np.int64)),
        })

    partials = docs.map_batches(partial, batch_format="pyarrow")
    cnt = bucketed_groupby(
        partials, ["w"],
        lambda g: g.groupby("w", sort=False, as_index=False)
        [["df", "a"]].sum(),
        n_buckets=n_buckets)

    def tot_partial(b: pa.Table) -> pa.Table:
        y = (b.column(label_col).to_numpy(zero_copy_only=False)
             == label_val)
        return pa.table({"t": pa.array([b.num_rows], pa.int64()),
                         "p": pa.array([int(y.sum())], pa.int64())})

    tp = docs.map_batches(tot_partial, batch_format="pyarrow").to_pandas()
    t = int(tp["t"].sum()) if len(tp) else 0
    p = int(tp["p"].sum()) if len(tp) else 0

    def score(b: pa.Table) -> pa.Table:
        df_ = b.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
        a = b.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = df_ >= min_df
        w = b.column("w").to_numpy(zero_copy_only=False)[keep]
        df_, a = df_[keep], a[keep]
        bb = df_ - a
        c = p - a
        d = t - p - bb
        ab, cd, ac, bd = a + bb, c + d, a + c, bb + d
        ok = (ab > 0) & (cd > 0) & (ac > 0) & (bd > 0)
        w, a, df_ = w[ok], a[ok], df_[ok]
        delta = (a * d[ok] - bb[ok] * c[ok]).astype(np.float64)
        chi2 = ((float(t) * (delta * delta))
                / ((ab[ok].astype(np.float64) * cd[ok].astype(np.float64))
                   * (ac[ok].astype(np.float64)
                      * bd[ok].astype(np.float64))))
        return pa.table({
            "w": pa.array(w, pa.string()),
            "n_pos": pa.array(a), "df": pa.array(df_),
            "chi2": pa.array(chi2, pa.float64()),
        })

    scored = cnt.map_batches(score, batch_format="pyarrow")

    def local_top(b: pa.Table) -> pa.Table:
        g = b.to_pandas().sort_values(
            ["chi2", "w"], ascending=[False, True],
            kind="mergesort").head(top_k)
        return pa.Table.from_pandas(
            g, preserve_index=False).replace_schema_metadata(None)

    return (scored.map_batches(local_top, batch_format="pyarrow")
            .repartition(1)
            .map_batches(local_top, batch_format="pyarrow",
                         batch_size=None))


def rrf_fuse(lists, *, id_col: str = "doc_id", rrf_k: int = 60,
             top_k: int = 20):
    """Reciprocal-rank fusion of ranked lists — the hybrid-retrieval
    combiner (Cormack et al. 2009; BM25 + dense lists in every modern
    RAG data stack).  Each input is a ``(id, score)`` Dataset ALREADY
    bounded to its own top-k (fusion operates on result lists, not
    corpora — the inputs are driver-bounded by contract, like seed
    sets).  Ranks are (score DESC, id) 1-based; the fused score adds
    ``1.0 / (rrf_k + rank)`` per list IN INPUT ORDER, missing entries
    contribute 0.0 — left-associated additions with one shared shape,
    so the DOUBLE value-checks bit-exactly (oracle ``rrf``).

    Output: ``(id_col, rrf)``, ``top_k`` rows by (rrf DESC, id).
    """
    import ray.data as rd

    ranked = []
    for ds_ in lists:
        df = ds_.to_pandas().sort_values(
            ["score", id_col], ascending=[False, True],
            kind="mergesort").reset_index(drop=True)
        ranked.append(dict(zip(df[id_col].to_numpy(),
                               np.arange(1, len(df) + 1))))
    ids = sorted(set().union(*[r.keys() for r in ranked]))
    vals = []
    for i in ids:
        v = 0.0
        for r in ranked:
            v = v + (1.0 / (rrf_k + r[i]) if i in r else 0.0)
        vals.append(v)
    out = pd.DataFrame({id_col: ids, "rrf": vals}).sort_values(
        ["rrf", id_col], ascending=[False, True],
        kind="mergesort").head(top_k)
    return rd.from_arrow(pa.Table.from_pandas(
        out, preserve_index=False).replace_schema_metadata(None))


def ir_eval(docs, query_terms: list[list[str]], *, k: int = 20,
            id_col: str = "doc_id", text_col: str = "text",
            k1: float = 1.25, b: float = 0.75):
    """Retrieval-quality evaluation — precision@k / recall@k /
    reciprocal rank per query, the offline metric loop every search /
    RAG data pipeline runs after reranking.

    Relevance is DETERMINISTIC (no human qrels in a synthetic corpus):
    a doc is relevant to a query iff it contains EVERY query term at
    least once — the boolean-AND oracle both sides can mirror exactly.
    Per query:

    1. ``bm25_topk`` ranks the corpus (two streaming passes, local
       top-k pruning); the bounded k-row result is collected and ranks
       assigned by (score DESC, id).
    2. ONE combined relevance pass over the corpus for ALL queries:
       per batch emit Q int partials (relevant-doc counts) plus the
       ranks of relevant ranked docs found in the batch (<= Q*k rows).
       The corpus streams once; nothing shuffles.

    Metrics use single int/int divisions (correctly-rounded doubles,
    bit-exact vs SQL): precision = hits / n_ret, recall = hits / n_rel
    (0.0 when n_rel = 0), rr = 1 / first_relevant_rank (0.0 when no
    relevant doc is ranked).

    Output: one row per query — (query_id, n_rel, n_ret, hits,
    precision, recall, rr).
    """
    from .ngrams import tokens_flat

    queries = [list(t) for t in query_terms]
    rank_of = []   # per query: {doc_id: 1-based rank}
    n_rets = []
    for terms in queries:
        df = bm25_topk(docs, terms, k=k, id_col=id_col,
                       text_col=text_col, k1=k1, b=b).to_pandas()
        if len(df) == 0:  # no matching docs: empty frame loses schema
            rank_of.append({})
            n_rets.append(0)
            continue
        df = df.sort_values(["score", id_col], ascending=[False, True],
                            kind="mergesort").reset_index(drop=True)
        rank_of.append(dict(zip(df[id_col].to_numpy().astype(np.int64),
                                np.arange(1, len(df) + 1))))
        n_rets.append(len(df))

    def rel_partial(batch: pa.Table) -> pa.Table:
        flat, doc_of, ndocs = tokens_flat(batch, text_col)
        toks = flat.to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        qcol, ncol, rrank = [], [], []
        for qi, terms in enumerate(queries):
            rel = np.ones(ndocs, dtype=bool)
            for t in terms:
                rel &= np.bincount(doc_of[toks == t],
                                   minlength=ndocs) > 0
            qcol.append(qi)
            ncol.append(int(rel.sum()))
            rmap = rank_of[qi]
            hit_ranks = [rmap[i] for i in ids[rel] if i in rmap]
            rrank.append(np.array(sorted(hit_ranks), dtype=np.int64))
        return pa.table({
            "query_id": pa.array(qcol, pa.int64()),
            "n_rel": pa.array(ncol, pa.int64()),
            "hit_ranks": pa.array(rrank, pa.list_(pa.int64())),
        })

    parts = docs.map_batches(rel_partial, batch_format="pyarrow") \
        .to_pandas()
    rows = []
    for qi in range(len(queries)):
        p = parts[parts["query_id"] == qi]
        n_rel = int(p["n_rel"].sum())
        ranks = np.concatenate(
            [np.asarray(h, dtype=np.int64) for h in p["hit_ranks"]]
        ) if len(p) else np.array([], np.int64)
        hits = int(len(ranks))
        n_ret = n_rets[qi]
        rows.append({
            "query_id": qi, "n_rel": n_rel, "n_ret": n_ret,
            "hits": hits,
            "precision": (np.float64(hits) / np.float64(n_ret)
                          if n_ret else 0.0),
            "recall": (np.float64(hits) / np.float64(n_rel)
                       if n_rel else 0.0),
            "rr": (1.0 / np.float64(ranks.min()) if hits else 0.0),
        })
    out = pd.DataFrame(rows)
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


def ndcg_eval(docs, query_terms: list[list[str]], *, k: int = 10,
              id_col: str = "doc_id", text_col: str = "text",
              k1: float = 1.25, b: float = 0.75):
    """nDCG@k with GRADED relevance for the BM25 rankings — the ranking
    metric precision/recall can't see (order sensitivity).

    Relevance grade = number of DISTINCT query terms a doc contains
    (0..T, deterministic, SQL-mirrorable).  DCG@k = Σ_{r=1..k}
    grade_r · c_r over the (score DESC, id) ranking with the discount
    constants c_r = 1/log2(r+1) PRECOMPUTED as doubles and inlined
    into the SQL oracle — no libm call on either side — summed in
    fixed left-associative rank order.  IDCG@k uses the global
    per-grade counts (one combiner-first corpus pass: T ints per
    batch per query): ideal grade at rank r falls out of the
    cumulative counts; nDCG = DCG/IDCG is the one extra division.

    Scale shape: per query ``bm25_topk``'s two streaming passes plus
    ONE shared relevance pass for all queries — per batch the partial
    is T ints + ≤k (rank, grade) pairs; nothing else moves.

    Output: (query_id, n_ret, dcg, idcg, ndcg).
    """
    import math

    from .ngrams import tokens_flat

    queries = [list(t) for t in query_terms]
    disc = [1.0 / math.log2(r + 1) for r in range(1, k + 1)]

    rank_of, n_rets = [], []
    for terms in queries:
        df = bm25_topk(docs, terms, k=k, id_col=id_col,
                       text_col=text_col, k1=k1, b=b).to_pandas()
        if len(df):
            df = df.sort_values(["score", id_col],
                                ascending=[False, True],
                                kind="mergesort").reset_index(drop=True)
        rank_of.append(dict(zip(
            df[id_col].to_numpy().astype(np.int64) if len(df) else [],
            np.arange(1, len(df) + 1))))
        n_rets.append(len(df))

    def grade_partial(batch: pa.Table) -> pa.Table:
        flat, doc_of, ndocs = tokens_flat(batch, text_col)
        toks = flat.to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        qcol, gcounts, pairs = [], [], []
        for qi, terms in enumerate(queries):
            grade = np.zeros(ndocs, dtype=np.int64)
            for t in terms:
                grade += (np.bincount(doc_of[toks == t],
                                      minlength=ndocs) > 0)
            cnt = np.bincount(grade, minlength=len(terms) + 1)
            qcol.append(qi)
            gcounts.append(cnt.astype(np.int64))
            rmap = rank_of[qi]
            pr = [(rmap[i], int(g)) for i, g in zip(ids, grade)
                  if i in rmap]
            pairs.append(np.array(sorted(pr), dtype=np.int64).reshape(-1))
        return pa.table({
            "query_id": pa.array(qcol, pa.int64()),
            "gcounts": pa.array([g for g in gcounts],
                                pa.list_(pa.int64())),
            "rank_grades": pa.array([p for p in pairs],
                                    pa.list_(pa.int64())),
        })

    parts = docs.map_batches(grade_partial, batch_format="pyarrow") \
        .to_pandas()
    rows = []
    for qi, terms in enumerate(queries):
        t_max = len(terms)
        p = parts[parts["query_id"] == qi]
        cnt = np.zeros(t_max + 1, dtype=np.int64)
        grade_at = {}
        for g in p["gcounts"]:
            cnt += np.asarray(g, dtype=np.int64)
        for rg in p["rank_grades"]:
            a = np.asarray(rg, dtype=np.int64).reshape(-1, 2)
            for r, g in a:
                grade_at[int(r)] = int(g)
        # cumulative ideal counts from the top grade down (grade 0 ends)
        cum = np.cumsum(cnt[1:][::-1])  # [n_T, n_T + n_{T-1}, ...]
        dcg = 0.0
        idcg = 0.0
        for r in range(1, k + 1):
            dcg = dcg + float(grade_at.get(r, 0)) * disc[r - 1]
            ig = 0.0
            for j in range(t_max):          # j=0 -> grade T, ...
                if r <= int(cum[j]):
                    ig = float(t_max - j)
                    break
            idcg = idcg + ig * disc[r - 1]
        rows.append({
            "query_id": qi, "n_ret": n_rets[qi], "dcg": dcg,
            "idcg": idcg,
            "ndcg": (dcg / idcg) if idcg > 0.0 else 0.0,
        })
    out = pd.DataFrame(rows)
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


def token_entropy(docs, *, text_col: str = "text",
                  group_col: str = "lang", scale: int = 65536,
                  n_buckets: int = 16):
    """Per-group SHANNON ENTROPY of the token distribution (nats) —
    the corpus-diversity gate — with SUMMATION-ORDER-FREE float
    discipline: each vocab term contributes the exact INTEGER
    ``floor(c · ln(c) · scale)`` (both sides compute the identical
    double first — math.log is bit-identical to DuckDB's ln on this
    libm — so the floor agrees), integer terms sum in any order, and
    the single float finale ``ln(n) − s / (n · scale)`` shares one
    parenthesization with the oracle.

    H = ln(n) − (1/n)·Σ_w c_w·ln(c_w), quantized per term.  The
    integer sum stays exact while n·ln(n)·scale < 2^63 (n per group
    ≲ 5·10¹² at scale 2^16).

    100-TB shape: per-block (group, token, count) partials bound the
    one shuffle by |vocab per block|; documents never shuffle.  The
    finale's only Python loop is over DISTINCT count values (ln
    memoized per value), not tokens.

    Output: ``(group_col, n, s, h)`` — n, s int64; h DOUBLE.
    """
    import math

    from .bucketed import bucketed_groupby
    from .ngrams import tokens_flat

    def partial(b: pa.Table) -> pa.Table:
        flat, doc_of, _ = tokens_flat(b, text_col)
        grp = b.column(group_col).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            group_col: grp[doc_of],
            "w": flat.to_numpy(zero_copy_only=False),
        })
        g = df.groupby([group_col, "w"], sort=False,
                       as_index=False).size()
        return pa.table({
            group_col: pa.array(g[group_col].to_numpy(), pa.string()),
            "w": pa.array(g["w"].to_numpy(), pa.string()),
            "c": pa.array(g["size"].to_numpy().astype(np.int64)),
        })

    partials = docs.map_batches(partial, batch_format="pyarrow")

    def finale(df: pd.DataFrame) -> pd.DataFrame:
        cnt = df.groupby([group_col, "w"], as_index=False)["c"].sum()
        gs, ns, ss, hs = [], [], [], []
        for key, gg in cnt.groupby(group_col, sort=False):
            c = gg["c"].to_numpy(dtype=np.int64)
            n = int(c.sum())
            s = 0
            uniq, reps = np.unique(c, return_counts=True)
            for cv, k in zip(uniq.tolist(), reps.tolist()):
                s += k * math.floor(cv * math.log(cv) * float(scale))
            gs.append(key)
            ns.append(n)
            ss.append(s)
            hs.append(math.log(n) - s / (float(n) * float(scale)))
        return pd.DataFrame({group_col: gs,
                             "n": pd.Series(ns, dtype="int64"),
                             "s": pd.Series(ss, dtype="int64"),
                             "h": pd.Series(hs, dtype="float64")})

    return bucketed_groupby(partials, [group_col], finale,
                            n_buckets=n_buckets)


def kl_divergence_by_group(docs, *, text_col: str = "text",
                           group_col: str = "source",
                           scale: int = 65536, n_buckets: int = 16):
    """Per-group KL DIVERGENCE of the token distribution from the
    whole-corpus distribution (nats) — the data-mixing diagnostic
    (which sources are token-distribution outliers): KL(p_g || q) =
    (1/n_g)·Σ_w c_gw·(ln c_gw − ln n_g − ln c_w + ln N).

    Same order-free float discipline as token_entropy: each (group,
    token) term quantizes to the exact INTEGER floor(c·(ln c − ln n_g
    − ln c_w + ln N)·scale) — every ln is math.log == DuckDB ln on
    this libm, the combination shares one parenthesization — so the
    integer sum commutes and the one float finale s/(n_g·scale)
    value-checks bit-exactly.

    Plan: per-block (group, token, count) partials → ONE bucketed
    shuffle on token attaches the corpus count c_w → ONE bucketed
    shuffle on group computes n_g and the term sum (ln memoized over
    distinct count values); N is a single driver scalar.  Documents
    never shuffle.

    Output: ``(group_col, n, s, kl)`` — n, s int64; kl DOUBLE >= 0
    (up to quantization).
    """
    import math

    from .bucketed import bucketed_groupby
    from .ngrams import tokens_flat

    def partial(b: pa.Table) -> pa.Table:
        flat, doc_of, _ = tokens_flat(b, text_col)
        grp = b.column(group_col).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            group_col: grp[doc_of],
            "w": flat.to_numpy(zero_copy_only=False),
        })
        g = df.groupby([group_col, "w"], sort=False,
                       as_index=False).size()
        return pa.table({
            group_col: pa.array(g[group_col].to_numpy(), pa.string()),
            "w": pa.array(g["w"].to_numpy(), pa.string()),
            "c": pa.array(g["size"].to_numpy().astype(np.int64)),
        })

    parts = docs.map_batches(partial, batch_format="pyarrow")

    def attach_ct(df: pd.DataFrame) -> pd.DataFrame:
        cnt = df.groupby([group_col, "w"], as_index=False)["c"].sum()
        cnt["ct"] = cnt.groupby("w")["c"].transform("sum")
        return cnt

    rows = bucketed_groupby(parts, ["w"], attach_ct,
                            n_buckets=n_buckets).materialize()

    tot = rows.map_batches(
        lambda b: pa.table({"n": pa.array(
            [int(np.sum(b.column("c").to_numpy(zero_copy_only=False)))],
            pa.int64())}),
        batch_format="pyarrow").to_pandas()
    big_n = int(tot["n"].sum())
    ln_n = math.log(big_n) if big_n > 0 else 0.0

    def finale(df: pd.DataFrame) -> pd.DataFrame:
        gs, ns, ss, ks = [], [], [], []
        for key, gg in df.groupby(group_col, sort=False):
            c = gg["c"].to_numpy(dtype=np.int64)
            ct = gg["ct"].to_numpy(dtype=np.int64)
            n_g = int(c.sum())
            lut = {int(v): math.log(int(v))
                   for v in np.unique(np.concatenate([c, ct]))}
            ln_c = np.array([lut[int(v)] for v in c])
            ln_ct = np.array([lut[int(v)] for v in ct])
            term = c * (ln_c - math.log(n_g) - ln_ct + ln_n) \
                * float(scale)
            s = int(np.floor(term).astype(np.int64).sum())
            gs.append(key)
            ns.append(n_g)
            ss.append(s)
            ks.append(s / (float(n_g) * float(scale)))
        return pd.DataFrame({group_col: gs,
                             "n": pd.Series(ns, dtype="int64"),
                             "s": pd.Series(ss, dtype="int64"),
                             "kl": pd.Series(ks, dtype="float64")})

    return bucketed_groupby(rows, [group_col], finale,
                            n_buckets=n_buckets)


def jsd_source_pairs(docs, *, text_col: str = "text",
                     group_col: str = "source", scale: int = 65536,
                     n_buckets: int = 16):
    """Pairwise JENSEN-SHANNON divergence between per-group token
    distributions (nats) — the source-similarity matrix a data-mixing
    pipeline publishes.  For groups a, b with token counts c_a, c_b
    and totals n_a, n_b, and M the even mixture:

        JSD = 1/2·Σ_w (c_a/n_a)·ln(p_a/m) + 1/2·Σ_w (c_b/n_b)·ln(p_b/m)
        ln(p_a/m) = ln(2·c_a·n_b) − ln(c_a·n_b + c_b·n_a)

    — every ln argument is an exact integer, so the same quantized-ln
    discipline as kl_divergence_by_group applies: per-(pair, token)
    terms floor(c_a·(ln(2 c_a n_b) − ln(c_a n_b + c_b n_a))·scale)
    are order-free int64 sums (math.log == DuckDB ln on this libm,
    one shared parenthesization), and the finale
    (s_a/n_a + s_b/n_b) / (2·scale) is the ONE float shape.

    Plan: per-block (group, token, count) partials → ONE bucketed
    shuffle on token; inside each bucket the per-token count matrix
    over the (domain-bounded) group list yields all ordered-pair term
    partials vectorized; the per-pair reduce is groups² rows.  The
    corpus never shuffles.  Returns one row per UNORDERED pair
    (src_a < src_b): (src_a, src_b, n_a, n_b, s_a, s_b, jsd)."""
    import math

    import ray.data as rd

    from .bucketed import bucketed_groupby
    from .ngrams import tokens_flat

    def partial(b: pa.Table) -> pa.Table:
        flat, doc_of, _ = tokens_flat(b, text_col)
        grp = b.column(group_col).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            group_col: grp[doc_of],
            "w": flat.to_numpy(zero_copy_only=False),
        })
        g = df.groupby([group_col, "w"], sort=False, as_index=False).size()
        return pa.table({
            group_col: pa.array(g[group_col].to_numpy(), pa.string()),
            "w": pa.array(g["w"].to_numpy(), pa.string()),
            "c": pa.array(g["size"].to_numpy().astype(np.int64)),
        })

    parts = docs.map_batches(partial, batch_format="pyarrow").materialize()

    totals = bucketed_groupby(
        parts, [group_col],
        lambda g: g.groupby(group_col, as_index=False)["c"].sum(),
        n_buckets=4).to_pandas().sort_values(group_col)
    srcs = totals[group_col].tolist()
    n_of = {s: int(v) for s, v in zip(srcs, totals["c"])}
    S = len(srcs)
    fscale = float(scale)

    def pair_fold(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g.groupby(["w", group_col], as_index=False)["c"].sum()
        mat = cnt.pivot_table(index="w", columns=group_col, values="c",
                              fill_value=0, aggfunc="sum")
        V = np.zeros((len(mat), S), dtype=np.int64)
        for j, s in enumerate(srcs):
            if s in mat.columns:
                V[:, j] = mat[s].to_numpy().astype(np.int64)
        ns = np.array([n_of[s] for s in srcs], dtype=np.int64)
        sa_l, sb_l, s_l = [], [], []
        # one ln LUT per bucket over every distinct integer argument
        args = []
        for a in range(S):
            ca = V[:, a]
            m = ca > 0
            for b_ in range(S):
                if b_ == a:
                    continue
                args.append(2 * ca[m] * ns[b_])
                args.append(ca[m] * ns[b_] + V[m, b_] * ns[a])
        if not args:
            return pd.DataFrame({"sa": [], "sb": [], "s": []})
        u = np.unique(np.concatenate(args))
        lg = np.array([math.log(int(v)) for v in u], np.float64)

        def ln(v):
            return lg[np.searchsorted(u, v)]

        for a in range(S):
            ca = V[:, a]
            m = ca > 0
            cam = ca[m]
            for b_ in range(S):
                if b_ == a:
                    continue
                ln1 = ln(2 * cam * ns[b_])
                ln2 = ln(cam * ns[b_] + V[m, b_] * ns[a])
                t = np.floor(cam * (ln1 - ln2) * fscale).astype(np.int64)
                sa_l.append(srcs[a])
                sb_l.append(srcs[b_])
                s_l.append(int(t.sum()))
        return pd.DataFrame({"sa": sa_l, "sb": sb_l,
                             "s": pd.Series(s_l, dtype="int64")})

    pp = bucketed_groupby(parts, ["w"], pair_fold,
                          n_buckets=n_buckets).to_pandas()
    if not len(pp):
        return rd.from_arrow(pa.table({
            "src_a": pa.array([], pa.string()),
            "src_b": pa.array([], pa.string()),
            "n_a": pa.array([], pa.int64()),
            "n_b": pa.array([], pa.int64()),
            "s_a": pa.array([], pa.int64()),
            "s_b": pa.array([], pa.int64()),
            "jsd": pa.array([], pa.float64())}))
    agg = pp.groupby(["sa", "sb"], as_index=False)["s"].sum()
    key = {(r.sa, r.sb): int(r.s) for r in agg.itertuples()}
    rows = {"src_a": [], "src_b": [], "n_a": [], "n_b": [],
            "s_a": [], "s_b": [], "jsd": []}
    for i in range(S):
        for j in range(i + 1, S):
            a, b_ = srcs[i], srcs[j]
            sa = key.get((a, b_), 0)
            sb = key.get((b_, a), 0)
            na, nb = n_of[a], n_of[b_]
            rows["src_a"].append(a)
            rows["src_b"].append(b_)
            rows["n_a"].append(na)
            rows["n_b"].append(nb)
            rows["s_a"].append(sa)
            rows["s_b"].append(sb)
            rows["jsd"].append(
                (float(sa) / float(na) + float(sb) / float(nb))
                / (2.0 * fscale))
    return rd.from_arrow(pa.table({
        "src_a": pa.array(rows["src_a"], pa.string()),
        "src_b": pa.array(rows["src_b"], pa.string()),
        "n_a": pa.array(rows["n_a"], pa.int64()),
        "n_b": pa.array(rows["n_b"], pa.int64()),
        "s_a": pa.array(rows["s_a"], pa.int64()),
        "s_b": pa.array(rows["s_b"], pa.int64()),
        "jsd": pa.array(rows["jsd"], pa.float64())}))


def vocab_drift(docs, store_dir: str, *, text_col: str = "text",
                scale: int = 65536, n_buckets: int = 16) -> pa.Table:
    """CROSS-RUN vocabulary-drift monitor — the training-data drift
    alarm beside the incremental dedup stores: compares this run's
    unigram distribution against the ACCUMULATED store distribution,
    then appends this run's (token, count) rows to the store (a
    directory of plain parquet files, append-only, one per run —
    delete to reset; the incremental_exact_dedup store contract).

    Drift is KL(run ‖ store⁺) with add-one smoothing on the store
    side over the UNION vocabulary (so unseen tokens are defined):

        q_w = (s_w + 1) / (S + V)
        term_w = floor(r_w·(ln r_w − ln R − ln(s_w+1) + ln(S+V))·scale)
        drift  = Σ term_w / (R·scale)

    — the kl_sources quantized-ln discipline: every ln argument is an
    exact integer, term sums are order-free int64, the finale is ONE
    float shape.  Plan: per-block (token, count) partials → one
    bucketed token shuffle merging run + store counts (vocab-bounded
    rows materialize); totals and the term sum reduce to scalars via
    block partials; documents never shuffle.  Returns ONE row
    (n_store, n_run, v_store, v_run, v_new, c_new, t_sum, drift)."""
    import math
    import os
    import uuid

    import pyarrow.parquet as _pq
    import ray.data as rd

    from .bucketed import bucketed_groupby
    from .ngrams import tokens_flat

    def partial(b: pa.Table) -> pa.Table:
        flat, _doc_of, _ = tokens_flat(b, text_col)
        df = pd.DataFrame({"w": flat.to_numpy(zero_copy_only=False)})
        g = df.groupby("w", sort=False, as_index=False).size()
        return pa.table({
            "w": pa.array(g["w"].to_numpy(), pa.string()),
            "c": pa.array(g["size"].to_numpy().astype(np.int64))})

    run = bucketed_groupby(
        docs.map_batches(partial, batch_format="pyarrow"), ["w"],
        lambda g: g.groupby("w", as_index=False)["c"].sum(),
        n_buckets=n_buckets).materialize()

    store_files = [
        os.path.join(root, fn)
        for root, _, files in os.walk(store_dir or "")
        for fn in files if fn.endswith(".parquet")
    ] if os.path.isdir(store_dir) else []

    tagged = run.map_batches(
        lambda b: pa.table({"w": b.column("w"),
                            "r": b.column("c"),
                            "s": pa.array(np.zeros(len(b), np.int64))}),
        batch_format="pyarrow")
    if store_files:
        old = rd.read_parquet(store_dir, columns=["w", "c"]).map_batches(
            lambda b: pa.table({
                "w": b.column("w"),
                "r": pa.array(np.zeros(len(b), np.int64)),
                "s": b.column("c").cast(pa.int64())}),
            batch_format="pyarrow")
        tagged = tagged.union(old)
    rows = bucketed_groupby(
        tagged, ["w"],
        lambda g: g.groupby("w", as_index=False)[["r", "s"]].sum(),
        n_buckets=n_buckets).materialize()

    tot = rows.map_batches(
        lambda b: pa.table({
            "r": pa.array([int(np.sum(b.column("r").to_numpy(
                zero_copy_only=False)))], pa.int64()),
            "s": pa.array([int(np.sum(b.column("s").to_numpy(
                zero_copy_only=False)))], pa.int64()),
            "v": pa.array([len(b)], pa.int64()),
            "v_run": pa.array([int(np.sum(b.column("r").to_numpy(
                zero_copy_only=False) > 0))], pa.int64()),
            "v_store": pa.array([int(np.sum(b.column("s").to_numpy(
                zero_copy_only=False) > 0))], pa.int64())}),
        batch_format="pyarrow").to_pandas()
    big_r = int(tot["r"].sum())
    big_s = int(tot["s"].sum())
    big_v = int(tot["v"].sum())
    v_run = int(tot["v_run"].sum())
    v_store = int(tot["v_store"].sum())
    fscale = float(scale)
    ln_r_tot = math.log(big_r) if big_r > 0 else 0.0
    ln_sv = math.log(big_s + big_v) if big_s + big_v > 0 else 0.0

    def term_partial(b: pa.Table) -> pa.Table:
        r = b.column("r").to_numpy(zero_copy_only=False).astype(np.int64)
        s = b.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
        m = r > 0
        r, s = r[m], s[m]
        u = np.unique(np.concatenate([r, s + 1]))
        lg = np.array([math.log(int(v)) for v in u], np.float64)
        ln_r = lg[np.searchsorted(u, r)]
        ln_s1 = lg[np.searchsorted(u, s + 1)]
        t = np.floor(r * (ln_r - ln_r_tot - ln_s1 + ln_sv)
                     * fscale).astype(np.int64)
        new = s == 0
        return pa.table({
            "t": pa.array([int(t.sum())], pa.int64()),
            "v_new": pa.array([int(new.sum())], pa.int64()),
            "c_new": pa.array([int(r[new].sum())], pa.int64())})

    tp = rows.map_batches(term_partial, batch_format="pyarrow").to_pandas()
    t_sum = int(tp["t"].sum())
    v_new = int(tp["v_new"].sum())
    c_new = int(tp["c_new"].sum())

    os.makedirs(store_dir, exist_ok=True)
    run_dir = os.path.join(store_dir, f"run-{uuid.uuid4().hex[:12]}")
    run.write_parquet(run_dir)

    return pa.table({
        "n_store": pa.array([big_s], pa.int64()),
        "n_run": pa.array([big_r], pa.int64()),
        "v_store": pa.array([v_store], pa.int64()),
        "v_run": pa.array([v_run], pa.int64()),
        "v_new": pa.array([v_new], pa.int64()),
        "c_new": pa.array([c_new], pa.int64()),
        "t_sum": pa.array([t_sum], pa.int64()),
        "drift": pa.array(
            [float(t_sum) / (float(big_r) * fscale) if big_r > 0
             else 0.0], pa.float64())})
