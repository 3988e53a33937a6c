"""Batched model-inference stage — the GPU-shaped scoring pipeline.

The canonical shape for "run a model over 100 TB of rows": a callable
CLASS passed to ``map_batches(Cls, concurrency=N, batch_size=B,
num_gpus=g)`` — the checkpoint loads ONCE per actor in ``__init__``
(never per batch), inference is one vectorized matmul per batch, and the
actor pool's ``concurrency x num_gpus`` is sized to the cluster's
accelerators while every other stage stays on CPUs.  No GPU exists in
this sandbox, so the "model" is a deterministic integer linear head —
but the stage shape (resource sizing, per-actor state, batch-level
vectorization, typed output schema) is exactly what a real
torch/ONNX scorer drops into.

The integer head is also ORACLE-EXACT: embeddings quantize to int64
milliunits, logits are int64 dot products (order-independent exact
sums), argmax ties break to the lowest class — every step restates in
DuckDB SQL, so the driver value-checks the whole inference pipeline
(query ``score_docs``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def make_linear_model(n_classes: int = 4, dim: int = 64) -> dict:
    """Deterministic integer linear head: W[c, d] = ((c*131 + d*17) % 19) - 9.

    Stands in for loading a checkpoint; the arithmetic is restated by the
    SQL oracle so scores verify bit-exactly."""
    c = np.arange(n_classes, dtype=np.int64)[:, None]
    d = np.arange(dim, dtype=np.int64)[None, :]
    w = ((c * 131 + d * 17) % 19) - 9
    return {"W": w, "n_classes": n_classes, "dim": dim}


class BatchScorer:
    """Actor-pool map_batches fn: embedding rows -> (id, cls, logit).

    Model blob fetched once per actor (``ray.put`` the model, pass the
    ref); scoring is one int64 matmul per batch.  quant=1000 quantizes
    float embeddings to milliunits so sums are exact in any order."""

    def __init__(self, model_ref_or_blob, id_col: str = "vec_id",
                 vec_col: str = "embedding", quant: int = 1000):
        blob = model_ref_or_blob
        try:
            import ray

            if isinstance(blob, ray.ObjectRef):
                blob = ray.get(blob)
        except (ImportError, TypeError):
            pass
        self.W = np.asarray(blob["W"], dtype=np.int64)  # (C, D)
        self.id_col = id_col
        self.vec_col = vec_col
        self.quant = quant

    def __call__(self, batch: pa.Table) -> pa.Table:
        arr = batch.column(self.vec_col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        m = flat.reshape(len(arr), -1)
        qx = np.rint(m * self.quant).astype(np.int64)       # (n, D)
        logits = qx @ self.W.T                              # (n, C) int64
        cls = np.argmax(logits, axis=1)                     # ties -> lowest c
        best = logits[np.arange(len(logits)), cls]
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "cls": pa.array(cls.astype(np.int64), pa.int64()),
                "logit": pa.array(best, pa.int64()),
            }
        )


def make_scorer_fn(model_ref, id_col: str = "vec_id",
                   vec_col: str = "embedding"):
    """Task-form scorer with a per-worker-process memoized model — the
    stateless twin of ``score_embeddings`` (same output, no actor-pool
    reservation: tasks share CPUs elastically with the read; right for
    small/CPU models, while the actor pool + num_gpus form is right when
    the model load is heavy or needs an accelerator)."""
    import uuid

    from .join import _PROCESS_CACHE

    # cache key: the ObjectRef hex for ray.put models; a fresh uuid per
    # factory call for raw blobs (str(blob) would be numpy's TRUNCATED
    # repr — two different large models could silently share a key)
    try:
        import ray

        is_ref = isinstance(model_ref, ray.ObjectRef)
    except ImportError:
        is_ref = False
    tag = str(model_ref) if is_ref else f"blob-{uuid.uuid4().hex}"
    key = ("scorer", tag, id_col, vec_col)

    def score_batch(batch: pa.Table) -> pa.Table:
        s = _PROCESS_CACHE.get(key)
        if s is None:
            s = BatchScorer(model_ref, id_col=id_col, vec_col=vec_col)
            _PROCESS_CACHE[key] = s
        return s(batch)

    return score_batch


def score_embeddings(ds, model_blob_or_ref, *, id_col: str = "vec_id",
                     vec_col: str = "embedding", batch_size: int = 1024,
                     concurrency=2, num_gpus: float = 0):
    """The inference stage, sized like a real model run: actor pool of
    ``concurrency`` scorers, each holding the model; ``num_gpus`` > 0
    reserves accelerator slices per actor on a GPU cluster (0 here —
    the sandbox has none; the resource plumbing is what transfers)."""
    kwargs = dict(
        fn_constructor_args=(model_blob_or_ref, id_col, vec_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    if num_gpus:
        kwargs["num_gpus"] = num_gpus
    return ds.map_batches(BatchScorer, **kwargs)


def unigram_lm_scores(docs, *, id_col: str = "doc_id",
                      text_col: str = "text", top_v: int = 24,
                      n_buckets: int = 64,
                      keep_cols: list[str] | None = None):
    """CCNet-style LM quality scoring, two passes: TRAIN a unigram LM
    (corpus token counts, capped to the ``top_v`` most frequent tokens
    — ties break count desc then token asc, so the vocabulary is
    deterministic), BROADCAST it once via ``ray.put``, then SCORE every
    doc in one map pass.  Stands in for the perplexity-filter step of a
    real curation pipeline; the "perplexity" here is integer-exact so
    the oracle can value-check it: freq_sum (sum of the corpus counts
    of the doc's in-vocab tokens), n_oov (tokens outside the vocab),
    and avg_freq = freq_sum / n_tokens (ONE IEEE division of exact
    ints — no float-summation-order hazard).

    Output: (id_col, n_tokens, freq_sum, n_oov, avg_freq), one row per
    doc with >= 1 token.

    100-TB shape: count partials are combiner-first (np.unique per
    batch), the count reduce shuffles |vocab|-bounded rows, the model
    is top_v rows however large the corpus, and scoring is stateless
    map_batches with a per-worker memoized blob fetch.
    """
    import pandas as pd

    from .bucketed import bucketed_groupby
    from .ngrams import tokens_flat

    def count_partial(b: pa.Table) -> pa.Table:
        flat, _, _ = tokens_flat(b, text_col)
        w, c = np.unique(
            flat.to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"w": pa.array(w, pa.string()),
                         "c": pa.array(c.astype(np.int64))})

    partials = docs.map_batches(count_partial, batch_format="pyarrow")
    counts = bucketed_groupby(
        partials, ["w"],
        lambda g: g.groupby("w", sort=False, as_index=False)["c"].sum(),
        n_buckets=n_buckets)

    def top(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["c", "w"], ascending=[False, True],
                             kind="mergesort").head(top_v)

    pruned = counts.map_batches(
        lambda b: pa.Table.from_pandas(top(b.to_pandas()),
                                       preserve_index=False),
        batch_format="pyarrow").repartition(1)
    vocab = pruned.map_batches(
        lambda b: pa.Table.from_pandas(top(b.to_pandas()),
                                       preserve_index=False),
        batch_format="pyarrow").to_pandas()

    w_sorted = np.sort(vocab["w"].to_numpy())
    order = np.argsort(vocab["w"].to_numpy())
    c_sorted = vocab["c"].to_numpy()[order].astype(np.int64)

    import ray as _ray

    blob = (w_sorted, c_sorted)
    ref = _ray.put(blob) if _ray.is_initialized() else blob

    def score(b: pa.Table, _ref=ref) -> pa.Table:
        from .graph import _get_blob

        ws, cs = _ref if isinstance(_ref, tuple) else _get_blob(_ref)
        flat, doc_of, ndocs = tokens_flat(b, text_col)
        toks = flat.to_numpy(zero_copy_only=False)
        n = np.bincount(doc_of, minlength=ndocs).astype(np.int64)
        if len(toks):
            p = np.searchsorted(ws, toks)
            p[p == len(ws)] = 0
            hit = ws[p] == toks
            f = np.where(hit, cs[p], np.int64(0))
            # doc_of is sorted: exact int64 segment sums via reduceat
            # (bincount's float64 weights would round above 2^53)
            starts = np.flatnonzero(
                np.concatenate([[True], doc_of[1:] != doc_of[:-1]]))
            fs = np.zeros(ndocs, dtype=np.int64)
            fs[doc_of[starts]] = np.add.reduceat(f, starts)
            oov = np.zeros(ndocs, dtype=np.int64)
            oov[doc_of[starts]] = np.add.reduceat(
                (~hit).astype(np.int64), starts)
        else:
            fs = np.zeros(ndocs, dtype=np.int64)
            oov = np.zeros(ndocs, dtype=np.int64)
        keep = n > 0
        ids = b.column(id_col).to_numpy(zero_copy_only=False)[keep]
        nk, fk, ok = n[keep], fs[keep], oov[keep]
        out = pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_tokens": pa.array(nk),
            "freq_sum": pa.array(fk),
            "n_oov": pa.array(ok),
            "avg_freq": pa.array(fk.astype(np.float64) / nk),
        })
        for c in keep_cols or []:
            out = out.append_column(c, b.column(c).filter(
                pa.array(keep)))
        return out

    return docs.map_batches(score, batch_format="pyarrow")


def bigram_lm_scores(docs, *, id_col: str = "doc_id",
                     text_col: str = "text", top_v: int = 24,
                     n_buckets: int = 64):
    """Bigram-LM quality scoring — the order-sensitive upgrade of
    :func:`unigram_lm_scores` (a doc full of frequent words in garbage
    ORDER scores high under a unigram LM but low here).  Same two-pass
    shape: TRAIN corpus bigram counts capped to the ``top_v`` most
    frequent bigrams (ties count desc then bigram asc), BROADCAST the
    table once, SCORE every doc in one map pass.

    Bigrams are adjacent non-empty ``\\S+`` tokens space-joined (tokens
    contain no whitespace, so the join is injective).  All outputs are
    integer-exact except ``avg_freq`` — ONE IEEE division of exact
    ints, so the oracle value-checks it bit-exactly.

    Output: (id_col, n_bigrams, freq_sum, n_oov, avg_freq), one row per
    doc with >= 2 tokens.

    100-TB shape: identical to the unigram stage — combiner-first count
    partials, a |distinct-bigrams|-bounded reduce, a ``top_v``-row model
    however large the corpus, stateless scoring maps.
    """
    import pandas as pd
    import pyarrow.compute as pc

    from .bucketed import bucketed_groupby
    from .ngrams import tokens_flat

    def doc_bigrams(b: pa.Table):
        """(bigram StringArray, doc_of) for one batch."""
        flat, doc_of, ndocs = tokens_flat(b, text_col)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        if len(flat) < 2:
            return pa.array([], pa.string()), np.empty(0, np.int64), ndocs
        same = doc_of[1:] == doc_of[:-1]
        # separator type must match the inputs (large_string vs string)
        sep = pa.scalar(" ", type=flat.type)
        joined = pc.binary_join_element_wise(
            flat.slice(0, len(flat) - 1), flat.slice(1), sep)
        return joined.filter(pa.array(same)), doc_of[:-1][same], ndocs

    def count_partial(b: pa.Table) -> pa.Table:
        big, _, _ = doc_bigrams(b)
        w, c = np.unique(
            big.to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"w": pa.array(w, pa.string()),
                         "c": pa.array(c.astype(np.int64))})

    partials = docs.map_batches(count_partial, batch_format="pyarrow")
    counts = bucketed_groupby(
        partials, ["w"],
        lambda g: g.groupby("w", sort=False, as_index=False)["c"].sum(),
        n_buckets=n_buckets)

    def top(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["c", "w"], ascending=[False, True],
                             kind="mergesort").head(top_v)

    pruned = counts.map_batches(
        lambda b: pa.Table.from_pandas(top(b.to_pandas()),
                                       preserve_index=False),
        batch_format="pyarrow").repartition(1)
    vocab = pruned.map_batches(
        lambda b: pa.Table.from_pandas(top(b.to_pandas()),
                                       preserve_index=False),
        batch_format="pyarrow").to_pandas()

    w_sorted = np.sort(vocab["w"].to_numpy())
    order = np.argsort(vocab["w"].to_numpy())
    c_sorted = vocab["c"].to_numpy()[order].astype(np.int64)

    import ray as _ray

    blob = (w_sorted, c_sorted)
    ref = _ray.put(blob) if _ray.is_initialized() else blob

    def score(b: pa.Table, _ref=ref) -> pa.Table:
        from .graph import _get_blob

        ws, cs = _ref if isinstance(_ref, tuple) else _get_blob(_ref)
        big, doc_of, ndocs = doc_bigrams(b)
        toks = big.to_numpy(zero_copy_only=False)
        n = np.bincount(doc_of, minlength=ndocs).astype(np.int64)
        if len(toks):
            p = np.searchsorted(ws, toks)
            p[p == len(ws)] = 0
            hit = ws[p] == toks
            f = np.where(hit, cs[p], np.int64(0))
            # doc_of is sorted: exact int64 segment sums via reduceat
            starts = np.flatnonzero(
                np.concatenate([[True], doc_of[1:] != doc_of[:-1]]))
            fs = np.zeros(ndocs, dtype=np.int64)
            fs[doc_of[starts]] = np.add.reduceat(f, starts)
            oov = np.zeros(ndocs, dtype=np.int64)
            oov[doc_of[starts]] = np.add.reduceat(
                (~hit).astype(np.int64), starts)
        else:
            fs = np.zeros(ndocs, dtype=np.int64)
            oov = np.zeros(ndocs, dtype=np.int64)
        keep = n > 0
        ids = b.column(id_col).to_numpy(zero_copy_only=False)[keep]
        nk, fk, ok = n[keep], fs[keep], oov[keep]
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_bigrams": pa.array(nk),
            "freq_sum": pa.array(fk),
            "n_oov": pa.array(ok),
            "avg_freq": pa.array(fk.astype(np.float64) / nk),
        })

    return docs.map_batches(score, batch_format="pyarrow")


def dsir_weights(docs, *, id_col: str = "doc_id", text_col: str = "text",
                 n_buckets: int = 64, target_mod: int = 13,
                 target_rem: int = 7):
    """DSIR-style importance weights for data selection (Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling"): hash every token into ``n_buckets`` buckets (the
    poly64 token hash mod n_buckets — the corpus-wide hashed-unigram
    feature), estimate the TARGET distribution from the in-domain
    subset (``doc_id % target_mod == target_rem``, the decontam
    membership convention) and the RAW distribution from the rest, then
    weight every raw doc by how target-like its hashed features are.

    DSIR's log-likelihood ratio ``sum_w log(p_t(w)/p_r(w))`` is a
    float-summation-order hazard, so the weight is restated
    integer-exactly: per doc, ``tf_sum = sum_w (target_count[bucket(w)]
    + 1)`` and ``rf_sum = sum_w (raw_count[bucket(w)] + 1)`` (add-one
    smoothing), and ``ratio = tf_sum / rf_sum`` — ONE IEEE division of
    exact ints, same rank ordering intent, bit-checkable by the oracle.

    Output: (id_col, n_tokens, tf_sum, rf_sum, ratio), one row per RAW
    doc with >= 1 token.

    100-TB shape: pass 1 reduces each block to ``n_buckets`` partial
    rows (the only thing that reaches the driver); the 2x``n_buckets``
    model broadcasts once via ``ray.put``; scoring is a stateless map —
    the corpus never shuffles.
    """
    from .dedup import token_hashes_batch

    def partial(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        texts = b.column(text_col).to_pylist()
        th, off = token_hashes_batch(texts)
        bkt = (th % np.uint64(n_buckets)).astype(np.int64)
        cnt = np.diff(off)
        is_t = np.repeat(ids % target_mod == target_rem, cnt)
        ct = np.bincount(bkt[is_t], minlength=n_buckets)
        cr = np.bincount(bkt[~is_t], minlength=n_buckets)
        return pa.table({
            "bkt": pa.array(np.arange(n_buckets, dtype=np.int64)),
            "ct": pa.array(ct.astype(np.int64)),
            "cr": pa.array(cr.astype(np.int64)),
        })

    # bounded driver collect: n_buckets rows per block
    parts = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("bkt", sort=True)[["ct", "cr"]].sum()
    ct = np.zeros(n_buckets, np.int64)
    cr = np.zeros(n_buckets, np.int64)
    ct[agg.index.to_numpy()] = agg["ct"].to_numpy()
    cr[agg.index.to_numpy()] = agg["cr"].to_numpy()

    import ray as _ray

    blob = (ct, cr)
    ref = _ray.put(blob) if _ray.is_initialized() else blob

    def score(b: pa.Table, _ref=ref) -> pa.Table:
        from .graph import _get_blob

        ctv, crv = _ref if isinstance(_ref, tuple) else _get_blob(_ref)
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        raw = ids % target_mod != target_rem
        texts = b.column(text_col).to_pylist()
        th, off = token_hashes_batch(
            [t for t, r in zip(texts, raw) if r])
        ids = ids[raw]
        bkt = (th % np.uint64(n_buckets)).astype(np.int64)
        n = np.diff(off)
        ndocs = len(n)
        tf = np.zeros(ndocs, np.int64)
        rf = np.zeros(ndocs, np.int64)
        if len(bkt):
            doc_of = np.repeat(np.arange(ndocs), n)
            # doc_of is sorted: exact int64 segment sums via reduceat
            starts = np.flatnonzero(
                np.concatenate([[True], doc_of[1:] != doc_of[:-1]]))
            tf[doc_of[starts]] = np.add.reduceat(ctv[bkt] + 1, starts)
            rf[doc_of[starts]] = np.add.reduceat(crv[bkt] + 1, starts)
        keep = n > 0
        nk, fk, rk = n[keep], tf[keep], rf[keep]
        return pa.table({
            id_col: pa.array(ids[keep], pa.int64()),
            "n_tokens": pa.array(nk.astype(np.int64)),
            "tf_sum": pa.array(fk),
            "rf_sum": pa.array(rk),
            "ratio": pa.array(fk.astype(np.float64) / rk),
        })

    return docs.map_batches(score, batch_format="pyarrow")


def ccnet_buckets(docs, *, id_col: str = "doc_id", text_col: str = "text",
                  lang_col: str = "lang", top_v: int = 24,
                  scale: int = 1024, n_buckets: int = 64):
    """CCNet-style HEAD / MIDDLE / TAIL bucketing (Wenzek et al. 2020):
    score every doc with the broadcast unigram LM, quantize the
    perplexity analog to the integer ``s = (freq_sum · scale) //
    n_tokens`` (exact floor division — no float anywhere), then assign
    per-LANGUAGE thirds by exact rank: ``bucket = (3·(rank−1)) // n``
    with RANK ties sharing a bucket (0 = tail / lowest avg frequency,
    2 = head).  Output: (id, lang, s, bucket).

    Scale notes: the rank pass is ONE range-partition sort over (lang,
    s, id) — the exact, oracle-checkable form of CCNet's
    sampled-threshold gate (at 100 TB you'd swap in thresholds from
    ``uniform_value_sample`` and skip the sort; both ends of that trade
    live in this repo).  ``freq_sum · scale`` must stay below 2^63 —
    with the default scale 1024 that holds until a single token's
    corpus count passes ~9e15.
    """
    from .scan import keyed_rank

    scores = unigram_lm_scores(docs, id_col=id_col, text_col=text_col,
                               top_v=top_v, n_buckets=n_buckets,
                               keep_cols=[lang_col])

    def add_s(b: pa.Table) -> pa.Table:
        fs = b.column("freq_sum").to_numpy(zero_copy_only=False)
        nt = b.column("n_tokens").to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: b.column(id_col),
            lang_col: b.column(lang_col),
            "s": pa.array((fs * scale) // nt, pa.int64()),
        })

    sc = scores.map_batches(add_s, batch_format="pyarrow").materialize()

    def lang_partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({lang_col: b.column(lang_col).to_pandas()})
        out = df.groupby(lang_col, sort=False, as_index=False).size()
        return pa.table({
            lang_col: pa.array(out[lang_col].astype(str)),
            "_n": pa.array(out["size"].to_numpy().astype(np.int64)),
        })

    lp = sc.map_batches(lang_partial, batch_format="pyarrow").to_pandas()
    n_of = lp.groupby(lang_col)["_n"].sum().to_dict()

    ranked = keyed_rank(sc, lang_col, "s", id_col)

    def assign(b: pa.Table) -> pa.Table:
        langs = b.column(lang_col).to_pylist()
        rnk = b.column("rnk").to_numpy(zero_copy_only=False)
        nl = np.array([n_of[l] for l in langs], dtype=np.int64)
        return pa.table({
            id_col: b.column(id_col).cast(pa.int64()),
            lang_col: b.column(lang_col),
            "s": b.column("s").cast(pa.int64()),
            "bucket": pa.array((3 * (rnk - 1)) // nl, pa.int64()),
        })

    return ranked.map_batches(assign, batch_format="pyarrow")


def naive_bayes_confusion(docs, *, id_col: str = "doc_id",
                          text_col: str = "text",
                          label_col: str = "source",
                          top_v: int = 512, scale: int = 65536,
                          train_parity: int = 0, n_buckets: int = 64):
    """Multinomial NAIVE BAYES source classifier as pure dataflow —
    the fastText-style quality/domain-classifier leg of a curation
    pipeline, ORACLE-EXACT end to end: train on the ``train_parity``
    half of ids, classify the other half, return the confusion
    matrix.

    The feature set is the ``top_v`` most frequent TRAIN tokens
    (count desc, token asc — the unigram_lm vocabulary rule);
    out-of-vocabulary tokens are skipped (fixed-feature-set
    convention).  All scores are exact integers:

        q_like(w,c) = floor((ln(cnt_wc + 1) − ln(tok_c + V))·scale)
        q_prior(c)  = floor((ln(nd_c) − ln(nd))·scale)
        score(d,c)  = q_prior(c) + Σ_w m_dw·q_like(w,c)

    (add-one smoothing over the V-token vocabulary; every ln argument
    an exact integer — the kl discipline).  argmax ties break to the
    SMALLEST class label.  Test docs with zero in-vocab tokens are
    not classified (they emit no row).

    100-TB shape: the vocabulary and the V×K q_like matrix broadcast
    once via ray.put (V·K int64 — feature-capped, never corpus-
    bound); class counts shuffle vocabulary-bounded rows; scoring is
    one stateless map pass; the confusion reduce is classes².
    Returns (true_{label_col}, pred_{label_col}, n)."""
    import math

    import pandas as pd
    import ray as _ray

    from .bucketed import bucketed_groupby
    from .ngrams import tokens_flat

    def half(parity):
        def fn(b: pa.Table) -> pa.Table:
            ids = b.column(id_col).to_numpy(zero_copy_only=False)
            return b.filter(pa.array(ids % 2 == parity))

        return fn

    train = docs.map_batches(half(train_parity),
                             batch_format="pyarrow").materialize()
    test = docs.map_batches(half(1 - train_parity),
                            batch_format="pyarrow")

    # ---- vocabulary: pooled train counts, top_v ---------------------
    def count_partial(b: pa.Table) -> pa.Table:
        flat, _, _ = tokens_flat(b, text_col)
        w, c = np.unique(
            flat.to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({"w": pa.array(w, pa.string()),
                         "c": pa.array(c.astype(np.int64))})

    counts = bucketed_groupby(
        train.map_batches(count_partial, batch_format="pyarrow"), ["w"],
        lambda g: g.groupby("w", sort=False, as_index=False)["c"].sum(),
        n_buckets=n_buckets)

    def top(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["c", "w"], ascending=[False, True],
                             kind="mergesort").head(top_v)

    vocab = top(counts.map_batches(
        lambda b: pa.Table.from_pandas(top(b.to_pandas()),
                                       preserve_index=False),
        batch_format="pyarrow").to_pandas())
    ws = np.sort(vocab["w"].to_numpy())
    V = len(ws)

    # ---- per-class stats over the train half ------------------------
    def cls_partial(b: pa.Table) -> pa.Table:
        flat, doc_of, _ = tokens_flat(b, text_col)
        lab = b.column(label_col).to_numpy(zero_copy_only=False)
        toks = flat.to_numpy(zero_copy_only=False)
        p = np.searchsorted(ws, toks)
        p[p == V] = 0 if V else 0
        hit = (ws[p] == toks) if V else np.zeros(len(toks), bool)
        df = pd.DataFrame({"c": lab[doc_of][hit], "w": toks[hit]})
        g = df.groupby(["c", "w"], sort=False, as_index=False).size()
        return pa.table({
            "c": pa.array(g["c"].to_numpy(), pa.string()),
            "w": pa.array(g["w"].to_numpy(), pa.string()),
            "cnt": pa.array(g["size"].to_numpy().astype(np.int64))})

    cwc = bucketed_groupby(
        train.map_batches(cls_partial, batch_format="pyarrow"),
        ["c", "w"],
        lambda g: g.groupby(["c", "w"], as_index=False)["cnt"].sum(),
        n_buckets=n_buckets).to_pandas()   # <= V x K rows

    nd = train.map_batches(
        lambda b: pa.Table.from_pandas(pd.DataFrame(
            {label_col: b.column(label_col).to_pandas()})
            .groupby(label_col, as_index=False).size()
            .rename(columns={"size": "_n"}), preserve_index=False)
        .replace_schema_metadata(None),
        batch_format="pyarrow").to_pandas() \
        .groupby(label_col, as_index=False)["_n"].sum()
    classes = sorted(nd[label_col].tolist())
    K = len(classes)
    nd_of = {c: int(v) for c, v in zip(nd[label_col], nd["_n"])}
    n_docs = sum(nd_of.values())
    cix = {c: i for i, c in enumerate(classes)}

    cnt_m = np.zeros((max(V, 1), K), np.int64)
    if len(cwc):
        wi = np.searchsorted(ws, cwc["w"].to_numpy())
        ci = np.array([cix[c] for c in cwc["c"]], np.int64)
        cnt_m[wi, ci] = cwc["cnt"].to_numpy().astype(np.int64)
    tok_c = cnt_m.sum(axis=0).astype(np.int64)

    fs = float(scale)
    lut_args = np.unique(cnt_m + 1)
    lut = {int(v): math.log(int(v)) for v in lut_args}
    Q = np.empty((max(V, 1), K), np.int64)
    for j in range(K):
        ln_den = math.log(int(tok_c[j]) + V)
        col = np.array([lut[int(v)] for v in cnt_m[:, j] + 1])
        Q[:, j] = np.floor((col - ln_den) * fs).astype(np.int64)
    prior = np.array(
        [math.floor((math.log(nd_of[c]) - math.log(n_docs)) * fs)
         for c in classes], np.int64)

    ref = _ray.put((ws, Q, prior)) if _ray.is_initialized() else \
        (ws, Q, prior)

    classes_arr = np.array(classes)

    def classify(b: pa.Table, _ref=ref) -> pa.Table:
        from .graph import _get_blob

        wsb, Qb, pb = _ref if isinstance(_ref, tuple) else _get_blob(_ref)
        flat, doc_of, ndocs = tokens_flat(b, text_col)
        toks = flat.to_numpy(zero_copy_only=False)
        lab = b.column(label_col).to_numpy(zero_copy_only=False)
        p = np.searchsorted(wsb, toks)
        p[p == len(wsb)] = 0
        hit = (wsb[p] == toks) if len(wsb) else np.zeros(len(toks), bool)
        d_hit = doc_of[hit]
        q_rows = Qb[p[hit]]
        scores = np.zeros((ndocs, Qb.shape[1]), np.int64)
        if len(d_hit):
            starts = np.flatnonzero(
                np.concatenate([[True], d_hit[1:] != d_hit[:-1]]))
            scores[d_hit[starts]] = np.add.reduceat(q_rows, starts,
                                                    axis=0)
        has = np.zeros(ndocs, bool)
        has[d_hit] = True
        scores = scores + pb[None, :]
        pred = np.argmax(scores, axis=1)   # first max = smallest label
        df = pd.DataFrame({
            "true_lab": lab[has],
            "pred_lab": classes_arr[pred[has]]})
        g = df.groupby(["true_lab", "pred_lab"], sort=False,
                       as_index=False).size()
        return pa.table({
            f"true_{label_col}": pa.array(g["true_lab"].to_numpy(),
                                          pa.string()),
            f"pred_{label_col}": pa.array(g["pred_lab"].to_numpy(),
                                          pa.string()),
            "n": pa.array(g["size"].to_numpy().astype(np.int64))})

    parts = test.map_batches(classify, batch_format="pyarrow")
    tc, pc = f"true_{label_col}", f"pred_{label_col}"
    return bucketed_groupby(
        parts, [tc, pc],
        lambda g: g.groupby([tc, pc], as_index=False)["n"].sum(),
        n_buckets=min(n_buckets, 8))


def heldout_cross_entropy(docs, *, id_col: str = "doc_id",
                          text_col: str = "text", scale: int = 65536,
                          n_buckets: int = 16):
    """Held-out CROSS-ENTROPY of an add-one-smoothed unigram LM — the
    LM-quality eval loop: train counts on the EVEN-id half, evaluate
    on the ODD half,

        H = ln(S_train + V) − (1/N_held)·Σ_w c_held(w)·ln(c_train(w)+1)

    (V = whole-corpus distinct vocabulary).  The quantized-ln
    discipline throughout (token_entropy): each vocab term is the
    exact INTEGER c_held·floor(ln(c_train+1)·scale) — order-free sum —
    and ONE shared float finale; math.log == DuckDB ln on this libm.

    Plan: per-block (token, c_train, c_held) partials → ONE bucketed
    shuffle on token → per-bucket scalar partials (nv, s_train,
    n_held, qs) → a bounded driver finale (n_buckets rows).
    Documents never shuffle.  Output one row
    (n_held, d, qs, h) with d = S_train + V.
    """
    import math

    import pandas as pd

    from .bucketed import bucketed_groupby
    from .ngrams import tokens_flat

    def partial(b: pa.Table) -> pa.Table:
        flat, doc_of, _ = tokens_flat(b, text_col)
        ids = b.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        held = (ids[doc_of] % 2 == 1)
        df = pd.DataFrame({
            "w": flat.to_numpy(zero_copy_only=False),
            "ct": (~held).astype(np.int64),
            "ch": held.astype(np.int64)})
        g = df.groupby("w", sort=False, as_index=False).sum()
        return pa.table({
            "w": pa.array(g["w"].to_numpy(), pa.string()),
            "ct": pa.array(g["ct"].to_numpy().astype(np.int64)),
            "ch": pa.array(g["ch"].to_numpy().astype(np.int64))})

    parts = docs.map_batches(partial, batch_format="pyarrow")

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("w", sort=False, as_index=False)[["ct", "ch"]] \
            .sum()
        ct = agg["ct"].to_numpy(dtype=np.int64)
        ch = agg["ch"].to_numpy(dtype=np.int64)
        # vectorized over DISTINCT train counts: the quantized-ln value
        # is computed once per distinct ct (math.log == np.log on this
        # libm element-wise? NOT guaranteed — keep math.log per distinct
        # value, gathered by inverse index, summed as int64)
        u, inv = np.unique(ct, return_inverse=True)
        qvals = np.array([math.floor(math.log(float(v + 1))
                                     * float(scale))
                          for v in u.tolist()], dtype=np.int64)
        qs = int((ch * qvals[inv]).sum())
        return pd.DataFrame({
            "nv": pd.Series([len(agg)], dtype="int64"),
            "s_train": pd.Series([int(ct.sum())], dtype="int64"),
            "n_held": pd.Series([int(ch.sum())], dtype="int64"),
            "qs": pd.Series([qs], dtype="int64")})

    bp = bucketed_groupby(parts, ["w"], bucket_fold,
                          n_buckets=n_buckets).to_pandas()
    nv = int(bp["nv"].sum())
    s_train = int(bp["s_train"].sum())
    n_held = int(bp["n_held"].sum())
    qs = int(bp["qs"].sum())
    d = s_train + nv
    h = (math.log(float(d))
         - float(qs) / (float(n_held) * float(scale))) \
        if n_held > 0 and d > 0 else None
    return pa.table({
        "n_held": pa.array([n_held], pa.int64()),
        "d": pa.array([d], pa.int64()),
        "qs": pa.array([qs], pa.int64()),
        "h": pa.array([h], pa.float64())})
