"""Corpus n-gram operators: repetition signals, benchmark decontamination,
exact corpus-wide top-k n-grams.

Training-data curation ops with no reference analog (zen3geo delegates no
text processing; SURVEY §2.3 extensions).  All arithmetic is
oracle-mirrorable: shingles are the same poly64 token-hash folds as
``stages/dedup.py`` (multiply-add mod 2^64, RE2-``\\s`` tokenization), so
every statistic restates in DuckDB HUGEINT arithmetic.

Scale shapes:
* ``repetition_stats`` — pure ``map_batches``; per-doc arithmetic only,
  no shuffle (the Gopher-style duplicate-ngram quality signal);
* ``contamination`` — per-block distinct on the SMALL benchmark side →
  bounded streaming driver union → ``ray.put`` broadcast → per-batch
  sorted-membership test: the classic broadcast-semi-join shape, the big
  training side never shuffles;
* ``top_ngrams`` — per-batch partial counts (the word-count combiner) →
  bucketed global sum keyed by gram → per-bucket top-k (exact: buckets
  partition grams, so the global top-k under (count DESC, gram ASC) is a
  subset of the union of per-bucket top-ks) → tiny final sort.  Shuffle
  volume is |distinct grams per block|, never |tokens|.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .bucketed import bucketed_groupby
from .dedup import token_hashes_batch, token_shingle_hashes

# RE2 \s — keep in sync with stages/dedup.py _WS_CPS (CLAUDE.md invariant)
_WS_PATTERN = "[\t\n\f\r ]+"


def _doc_shingles(texts, k: int) -> tuple[np.ndarray, np.ndarray]:
    th, toff = token_hashes_batch(texts)
    return token_shingle_hashes(th, toff, k)


def tokens_flat(batch: pa.Table, text_col: str):
    """Vectorized RE2-``\\s+`` tokenization of a batch: returns
    ``(flat_tokens, doc_of, ndocs)`` — the flattened non-empty token
    StringArray, each token's source-row index, and the batch row count.
    Null texts count as empty (the ``(t or '')`` convention of the
    shingle path).  The shared front half of every token-level corpus
    operator."""
    col = pc.fill_null(batch.column(text_col), "")
    sp = pc.split_pattern_regex(col, pattern=_WS_PATTERN)
    flat = pc.list_flatten(sp)
    lens = pc.list_value_length(sp).to_numpy(zero_copy_only=False)
    doc_of = np.repeat(np.arange(len(lens)), lens)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return flat.filter(pa.array(nonempty)), doc_of[nonempty], len(lens)


def _per_doc_runs(sh: np.ndarray, soff: np.ndarray):
    """Sort each doc's shingles and find equal-value runs.

    Returns ``(doc_of_run, run_len, run_off, rep_vals)``: runs are
    contiguous groups of one (doc, shingle-value) pair; ``run_off`` is
    the per-doc run-range offsets (len ndocs+1) and ``rep_vals`` each
    run's shingle value (i.e. the doc's DISTINCT shingles, doc-major).
    """
    ndocs = len(soff) - 1
    counts = np.diff(soff)
    doc_of = np.repeat(np.arange(ndocs), counts)
    order = np.lexsort((sh, doc_of))
    ds_ = doc_of[order]
    ss = sh[order]
    if len(ss) == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.zeros(ndocs + 1, np.int64), np.empty(0, np.uint64))
    new_run = np.concatenate(
        [[True], (ds_[1:] != ds_[:-1]) | (ss[1:] != ss[:-1])]
    )
    run_starts = np.flatnonzero(new_run)
    run_len = np.diff(np.concatenate([run_starts, [len(ss)]]))
    doc_of_run = ds_[run_starts]
    runs_per_doc = np.bincount(doc_of_run, minlength=ndocs)
    run_off = np.concatenate([[0], np.cumsum(runs_per_doc)])
    return doc_of_run, run_len, run_off, ss[run_starts]


def repetition_stats(ds, text_col: str = "text", id_col: str = "doc_id",
                     k: int = 3):
    """Per-doc duplicate-shingle statistics (repetition quality signal).

    Output columns: ``n_shingles`` (k-token shingle count, the dedup
    convention ``max(n_tokens-k+1, 1)``), ``n_distinct`` (distinct
    shingle hashes), ``max_rep`` (occurrences of the most repeated
    shingle) and ``dup_frac = (n_shingles - n_distinct) / n_shingles``
    — the Gopher-style "fraction of duplicate n-grams" filter signal.
    """

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        sh, soff = _doc_shingles(texts, k)
        n = np.diff(soff).astype(np.int64)
        _, run_len, run_off, _ = _per_doc_runs(sh, soff)
        ndocs = len(n)
        n_distinct = np.diff(run_off).astype(np.int64)
        max_rep = np.zeros(ndocs, dtype=np.int64)
        has = n_distinct > 0
        if run_len.size:
            # reduceat over per-doc run ranges (every doc here has >=1
            # shingle, but guard empty batches)
            max_rep[has] = np.maximum.reduceat(
                run_len, run_off[:-1][has]
            ).astype(np.int64)
        dup_frac = (n - n_distinct).astype(np.float64) / n.astype(np.float64)
        return pa.table({
            id_col: batch.column(id_col),
            "n_shingles": pa.array(n, pa.int64()),
            "n_distinct": pa.array(n_distinct, pa.int64()),
            "max_rep": pa.array(max_rep, pa.int64()),
            "dup_frac": pa.array(dup_frac, pa.float64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def benchmark_shingle_set(ds, text_col: str = "text", k: int = 8) -> np.ndarray:
    """Distinct shingle hashes of a (small) benchmark corpus.

    Per-block distinct inside ``map_batches``, then a bounded STREAMING
    driver union (``iter_batches`` — never more than one partial plus the
    accumulator in memory).  Benchmark/eval sets are small by definition
    (thousands of docs); the result is meant for ``ray.put`` broadcast.
    """

    def partial(b: pa.Table) -> pa.Table:
        sh, _ = _doc_shingles(b.column(text_col).to_pylist(), k)
        return pa.table({"s": pa.array(np.unique(sh), pa.uint64())})

    acc = np.empty(0, dtype=np.uint64)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        part = b.column("s").to_numpy(zero_copy_only=False)
        acc = np.union1d(acc, part)
    return acc


def contamination(ds, bench_ref, text_col: str = "text",
                  id_col: str = "doc_id", k: int = 8):
    """Flag training docs sharing any k-token shingle with a benchmark set.

    ``bench_ref``: ``ray.put`` handle of the SORTED uint64 hash array from
    :func:`benchmark_shingle_set` (broadcast once, read zero-copy in every
    task — never re-shipped per batch).  Returns only contaminated docs:
    ``(id_col, n_hits)`` with ``n_hits`` = DISTINCT overlapping shingles.
    """
    import ray

    def fn(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        texts = batch.column(text_col).to_pylist()
        sh, soff = _doc_shingles(texts, k)
        ndocs = len(soff) - 1
        # one representative per (doc, value) run -> DISTINCT-hit counting
        doc_of_run, _, _, rep_vals = _per_doc_runs(sh, soff)
        if len(rep_vals) and len(bench):
            pos = np.searchsorted(bench, rep_vals)
            pos = np.minimum(pos, len(bench) - 1)
            hit = bench[pos] == rep_vals
            n_hits = np.bincount(doc_of_run[hit], minlength=ndocs)
        else:
            n_hits = np.zeros(ndocs, np.int64)
        keep = n_hits > 0
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            id_col: pa.array(ids, batch.column(id_col).type),
            "n_hits": pa.array(n_hits[keep].astype(np.int64), pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def _gram_partial(batch: pa.Table, text_col: str, n: int) -> pa.Table:
    """Per-batch n-gram partial counts — vectorized token split
    (pyarrow RE2 kernel), adjacency within doc, pandas value_counts."""
    flat, doc_of, _ = tokens_flat(batch, text_col)
    m = len(doc_of)
    if m < n:
        return pa.table({"gram": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    base = np.arange(m - n + 1)
    ok = doc_of[base] == doc_of[base + n - 1]
    base = base[ok]
    if len(base) == 0:
        return pa.table({"gram": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    parts = [flat.take(pa.array(base + j)) for j in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    vc = pa.table({"gram": grams}).group_by(["gram"]).aggregate(
        [([], "count_all")])
    return vc.rename_columns(["gram", "n"]).set_column(
        1, "n", vc.column(1).cast(pa.int64()))


def top_ngrams(ds, text_col: str = "text", n: int = 2, k_top: int = 20,
               n_buckets: int = 32):
    """EXACT corpus-wide top-k token n-grams (count DESC, gram ASC ties).

    Word-count at scale: per-batch combiner (value_counts) bounds shuffle
    volume by distinct grams per block; a bucketed global sum then keeps
    only each bucket's top-k (exact — grams partition across buckets), and
    the final sort touches ``n_buckets * k_top`` rows.
    """
    partials = ds.map_batches(
        lambda b: _gram_partial(b, text_col, n), batch_format="pyarrow"
    )

    def bucket_top(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("gram", sort=False, as_index=False)["n"].sum()
        agg = agg.sort_values(["n", "gram"], ascending=[False, True],
                              kind="mergesort")
        return agg.head(k_top)

    top = bucketed_groupby(partials, ["gram"], bucket_top,
                           n_buckets=n_buckets)
    return top.sort(["n", "gram"], descending=[True, False]).limit(k_top)


def skipgram_counts(ds, text_col: str = "text", window: int = 2,
                    n_buckets: int = 32):
    """Corpus-wide skip-gram co-occurrence counts: (w1, w2, n) where w2
    follows w1 within ``window`` positions inside one doc (distances
    1..window, summed) — the word2vec-style context-count matrix.

    Same combiner-first shape as :func:`top_ngrams`: per-batch pair
    counts (one shifted-view pass per distance, no per-row Python) bound
    the single bucketed shuffle by |distinct pairs per block| ≤ vocab².
    """

    def partial(batch: pa.Table) -> pa.Table:
        flat, doc_of, _ = tokens_flat(batch, text_col)
        m = len(doc_of)
        w1_parts, w2_parts = [], []
        for d in range(1, window + 1):
            if m <= d:
                break
            base = np.arange(m - d)
            ok = doc_of[base] == doc_of[base + d]
            base = base[ok]
            if len(base):
                w1_parts.append(flat.take(pa.array(base)))
                w2_parts.append(flat.take(pa.array(base + d)))
        if not w1_parts:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        pairs = pa.table({
            "w1": pa.concat_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                 else a for a in w1_parts]),
            "w2": pa.concat_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                 else a for a in w2_parts]),
        })
        # pure-Arrow combiner (no per-pair Python objects)
        vc = pairs.group_by(["w1", "w2"]).aggregate([([], "count_all")])
        return vc.rename_columns(["w1", "w2", "n"]).set_column(
            2, "n", vc.column(2).cast(pa.int64()))

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["w1", "w2"], sort=False, as_index=False)["n"].sum()
        out["n"] = out["n"].astype(np.int64)
        return out

    return bucketed_groupby(partials, ["w1", "w2"], fn, n_buckets=n_buckets)


def collocations(ds, text_col: str = "text", *, top_k: int = 50,
                 min_count: int = 5, n_buckets: int = 32,
                 broadcast_vocab: int = 2_000_000):
    """PMI collocation mining: the corpus's top ``top_k`` adjacent-token
    bigrams ranked by pointwise mutual information against the unigram
    product model — the classic collocation-extraction surface (Church &
    Hanks 1990) for phrase mining / tokenizer-merge candidates.

    The score is the PMI EXPONENTIAL p(xy)/(p(x)p(y)), computed log-free
    so the oracle (query ``colloc``) value-checks the DOUBLE bit-exactly:
    ``pmi = (c_xy * (N * N)) / ((M * c_x) * c_y)`` with exact int64
    counts entering ONE shared float expression shape on both sides
    (rank-equivalent to log-PMI; ties break on (w1, w2)).  ``min_count``
    drops hapax pairs before any join.

    Output: ``(w1, w2, c_xy, c_x, c_y, pmi)``, ``top_k`` rows by
    (pmi DESC, w1, w2).

    100-TB shape: bigram and unigram counts are combiner-first
    (vocab²- / vocab-bounded shuffles); corpus totals fold one bounded
    partial row per block on the driver; the unigram table attaches via
    ``ray.put`` broadcast below ``broadcast_vocab`` rows (zero extra
    shuffles) or two bucketed hash joins above it; top-k runs per-block
    locally before a single-block finale — the full score table never
    sits on the driver.
    """
    import ray

    big = skipgram_counts(ds, text_col, window=1,
                          n_buckets=n_buckets).materialize()

    def upartial(batch: pa.Table) -> pa.Table:
        flat, _, _ = tokens_flat(batch, text_col)
        w, c = np.unique(flat.to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"w": pa.array(w, pa.string()),
                         "cu": pa.array(c.astype(np.int64))})

    ucnt = bucketed_groupby(
        ds.map_batches(upartial, batch_format="pyarrow"), ["w"],
        lambda g: g.groupby("w", sort=False, as_index=False)["cu"].sum(),
        n_buckets=n_buckets).materialize()

    def _total(counts_ds, col: str) -> int:
        parts = counts_ds.map_batches(
            lambda b: pa.table({"s": pa.array(
                [int(b.column(col).to_numpy().sum())] if b.num_rows
                else [0], pa.int64())}),
            batch_format="pyarrow").to_pandas()
        return int(parts["s"].sum()) if len(parts) else 0

    n_tok = _total(ucnt, "cu")
    m_big = _total(big, "n")
    if n_tok == 0 or m_big == 0:
        return big.map_batches(lambda b: pa.table({
            "w1": pa.array([], pa.string()),
            "w2": pa.array([], pa.string()),
            "c_xy": pa.array([], pa.int64()),
            "c_x": pa.array([], pa.int64()),
            "c_y": pa.array([], pa.int64()),
            "pmi": pa.array([], pa.float64())}), batch_format="pyarrow")
    nn = float(n_tok) * float(n_tok)
    md = float(m_big)

    filt = big.map_batches(
        lambda b: b.filter(pa.array(
            b.column("n").to_numpy(zero_copy_only=False) >= min_count)),
        batch_format="pyarrow")

    def _pmi(c, cx, cy):
        return ((c.astype(np.float64) * nn)
                / ((md * cx.astype(np.float64)) * cy.astype(np.float64)))

    if ucnt.count() <= broadcast_vocab:
        udf = ucnt.to_pandas()
        order = np.argsort(udf["w"].to_numpy(), kind="mergesort")
        ws = udf["w"].to_numpy()[order]
        cs = udf["cu"].to_numpy()[order].astype(np.int64)
        ref = ray.put((ws, cs)) if ray.is_initialized() else (ws, cs)

        def score_bc(b: pa.Table, _ref=ref) -> pa.Table:
            from .graph import _get_blob

            vw, vc = _ref if isinstance(_ref, tuple) else _get_blob(_ref)
            w1 = b.column("w1").to_numpy(zero_copy_only=False)
            w2 = b.column("w2").to_numpy(zero_copy_only=False)
            c = b.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
            # every bigram token exists in the unigram table by
            # construction: searchsorted hits are exact
            cx = vc[np.searchsorted(vw, w1)]
            cy = vc[np.searchsorted(vw, w2)]
            return pa.table({
                "w1": b.column("w1"), "w2": b.column("w2"),
                "c_xy": pa.array(c), "c_x": pa.array(cx),
                "c_y": pa.array(cy), "pmi": pa.array(_pmi(c, cx, cy)),
            })

        scored = filt.map_batches(score_bc, batch_format="pyarrow")
    else:
        from .hashjoin import bucketed_join

        u1 = ucnt.map_batches(
            lambda b: b.rename_columns(["w1", "c_x"]),
            batch_format="pyarrow")
        u2 = ucnt.map_batches(
            lambda b: b.rename_columns(["w2", "c_y"]),
            batch_format="pyarrow")
        j = bucketed_join(bucketed_join(filt, u1, ["w1"],
                                        n_buckets=n_buckets),
                          u2, ["w2"], n_buckets=n_buckets)

        def score_j(b: pa.Table) -> pa.Table:
            c = b.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
            cx = b.column("c_x").to_numpy(
                zero_copy_only=False).astype(np.int64)
            cy = b.column("c_y").to_numpy(
                zero_copy_only=False).astype(np.int64)
            return pa.table({
                "w1": b.column("w1"), "w2": b.column("w2"),
                "c_xy": pa.array(c), "c_x": pa.array(cx),
                "c_y": pa.array(cy), "pmi": pa.array(_pmi(c, cx, cy)),
            })

        scored = j.map_batches(score_j, batch_format="pyarrow")

    def local_top(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(
            ["pmi", "w1", "w2"], ascending=[False, True, True],
            kind="mergesort").head(top_k)
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    return (scored.map_batches(local_top, batch_format="pyarrow")
            .repartition(1)
            .map_batches(local_top, batch_format="pyarrow",
                         batch_size=None))


def zipf_fit(ds, *, text_col: str = "text", top_v: int = 64,
             ln_scale: int = 1 << 16, n_buckets: int = 32):
    """Zipf rank-frequency slope over the EXACT corpus top-V unigrams
    (count desc, token asc ties — the top_ngrams rule): least squares
    of y = quantized ln(count) on x = quantized ln(rank), the classic
    corpus-health diagnostic (natural text ~ -1; boilerplate-heavy or
    templated corpora deviate).

    Quantized-ln discipline: x_r = floor(ln(r)*2^16) and
    y_r = floor(ln(n_r)*2^16) are identical integers on both sides
    (math.log == DuckDB ln on this glibc), all LSQ moments are exact
    int64 sums over V rows, slope = ONE float division
    num/den = (V*Sxy - Sx*Sy)/(V*Sxx - Sx^2); alpha = -slope.

    Output one row (v, num, den, slope, alpha)."""
    import math

    top = top_ngrams(ds, text_col=text_col, n=1, k_top=top_v,
                     n_buckets=n_buckets).to_pandas()
    v = len(top)
    sc = float(ln_scale)
    xs = [math.floor(math.log(float(r)) * sc) for r in range(1, v + 1)]
    ys = [math.floor(math.log(float(c)) * sc)
          for c in top["n"].tolist()]
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    num = v * sxy - sx * sy
    den = v * sxx - sx * sx
    slope = float(num) / float(den) if den else None
    return pa.table({
        "v": pa.array([v], pa.int64()),
        "num": pa.array([num], pa.int64()),
        "den": pa.array([den], pa.int64()),
        "slope": pa.array([slope], pa.float64()),
        "alpha": pa.array([-slope if slope is not None else None],
                          pa.float64()),
    })
