"""Exact substring (suffix-family) deduplication.

The classic training-data dedup family this engine lacked (Lee et al.
2022, "Deduplicating Training Data Makes Language Models Better" —
public: suffix arrays find all duplicated spans of >= N tokens across
a corpus).  Two cooperating layers:

* :func:`dup_spans` — EXACT duplicated-span detection: every length-L
  character window that occurs at >= 2 distinct (doc, pos) locations
  is a duplicate window; per doc, overlapping duplicate windows merge
  into MAXIMAL spans (interval union).  Grouping is on the WINDOW TEXT
  itself — no hash, no collisions — so the operator is bit-exact and
  SQL-mirrorable (oracle ``dup_spans``).  Shuffle volume is L bytes per
  character (the suffix-array memory blowup in shuffle form): right for
  verification scale, documented as NOT the 100-TB path.
* :func:`winnowed_candidates` — the 100-TB path: per-doc ROLLING
  poly64 hashes of the L-windows (vectorized, one 1-D pass per window
  position class), ROBUST WINNOWING (Schleimer/Wilkerson/Aiken 2003,
  "Winnowing: Local Algorithms for Document Fingerprinting") selects
  the window-minimum hash of every w consecutive windows, so only
  ~2/(w+1) of positions ever shuffle — with the paper's GUARANTEE that
  any duplicated span of length >= L + w - 1 shares at least one
  selected fingerprint on every copy.  Candidates verify downstream by
  actual text comparison (or feed :func:`dup_spans` restricted to
  candidate docs).  The guarantee is pinned by a test comparing
  winnowed candidates against the exact operator.

Span semantics: [start, end) character offsets, 0-based — a span's
text is ``text[start:end]``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .bucketed import bucketed_groupby

#: poly64 base — multiply-add mod 2^64 (the engine's SQL-mirrorable
#: hash discipline; no xor so DuckDB INT128 arithmetic could mirror it)
_B = np.uint64(1000003)


def window_rows(batch: pa.Table, *, L: int, id_col: str = "doc_id",
                text_col: str = "text") -> pa.Table:
    """All length-L character windows: (doc_id, pos, gram, gram_h).

    ``gram_h`` is the window's poly64 rolling hash (vectorized — L 1-D
    passes per doc, no per-window Python hashing): downstream shuffles
    BUCKET on it (equal grams always share it, so per-gram semantics
    hold) while exactness still comes from grouping on the gram TEXT
    inside each bucket — hashing a fixed int column is ~5x cheaper than
    FNV over a million short strings per shuffle."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    out_ids, out_pos, out_gram, out_h = [], [], [], []
    for i, t in enumerate(batch.column(text_col).to_pylist()):
        n = len(t)
        if n < L:
            continue
        m = n - L + 1
        out_ids.append(np.full(m, ids[i]))
        out_pos.append(np.arange(m, dtype=np.int64))
        out_gram.extend(t[p:p + L] for p in range(m))
        out_h.append(rolling_hashes(t, L).view(np.int64))
    if not out_ids:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "pos": pa.array([], pa.int64()),
                         "gram": pa.array([], pa.string()),
                         "gram_h": pa.array([], pa.int64())})
    return pa.table({
        id_col: pa.array(np.concatenate(out_ids)),
        "pos": pa.array(np.concatenate(out_pos)),
        "gram": pa.array(out_gram, pa.string()),
        "gram_h": pa.array(np.concatenate(out_h)),
    })


def _merge_spans(g: pd.DataFrame, L: int, id_col: str) -> pd.DataFrame:
    """Per-doc interval union of [pos, pos+L) windows -> maximal spans.

    Fully vectorized across ALL docs in the bucket: one lexsort, then a
    SEGMENTED running-max of interval ends (the classic add-g*K offset
    trick keeps the cummax from crossing doc boundaries), island breaks
    where a window starts past the running end, reduceat finales — no
    per-doc Python loop (that loop was 5s of the sf0.1 wall)."""
    if len(g) == 0:
        return pd.DataFrame(
            {id_col: pd.Series([], dtype="int64"),
             "span_start": pd.Series([], dtype="int64"),
             "span_end": pd.Series([], dtype="int64")})
    doc = g[id_col].to_numpy()
    pos = g["pos"].to_numpy().astype(np.int64)
    order = np.lexsort((pos, doc))
    doc, pos = doc[order], pos[order]
    end = pos + L
    # doc group ordinals (docs are contiguous after the lexsort)
    new_doc = np.ones(len(doc), dtype=bool)
    new_doc[1:] = doc[1:] != doc[:-1]
    gid = np.cumsum(new_doc) - 1
    K = np.int64(end.max() + 1)
    seg_max = np.maximum.accumulate(end + gid * K) - gid * K
    brk = new_doc.copy()
    brk[1:] |= pos[1:] > seg_max[:-1]
    starts = np.flatnonzero(brk)
    span_end = np.maximum.reduceat(end, starts)
    return pd.DataFrame({id_col: doc[starts],
                         "span_start": pos[starts],
                         "span_end": span_end})


def dup_spans(docs, *, L: int = 30, id_col: str = "doc_id",
              text_col: str = "text", n_buckets: int = 64):
    """Maximal duplicated character spans >= L per doc (exact).

    A window is duplicated iff its text occurs at >= 2 (doc, pos)
    locations corpus-wide (within-doc repeats count — exactly the
    suffix-array duplicate definition).  Returns (doc_id, span_start,
    span_end) sorted semantics-free; spans are the interval union of
    the doc's duplicated windows.

    Plan: window explosion -> ONE bucketed group BUCKETED on the
    window's rolling hash but GROUPED on the gram text (count >= 2
    keeps member locations — exact, collision-immune) -> ONE bucketed
    per-doc interval merge.  Both reduces are coarse-bucket vectorized.
    """
    wins = docs.map_batches(
        lambda b: window_rows(b, L=L, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
    )

    def dup_members(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g.groupby("gram", sort=False)["pos"].transform("size")
        return g[cnt >= 2][[id_col, "pos"]]

    members = bucketed_groupby(wins, ["gram_h"], dup_members,
                               n_buckets=n_buckets)
    return bucketed_groupby(
        members, [id_col], lambda g: _merge_spans(g, L, id_col),
        n_buckets=n_buckets)


def _codepoints(t: str) -> np.ndarray:
    """Vectorized codepoints (UTF-32-LE view — no Python char loop)."""
    return np.frombuffer(t.encode("utf-32-le"), dtype="<u4").astype(np.uint64)


def rolling_hashes(t: str, L: int) -> np.ndarray:
    """poly64 hashes of every length-L window: H[p] = Σ c[p+i]·B^(L-1-i)
    mod 2^64 — computed as L vectorized 1-D passes (the per-perm-pass
    discipline; no quadratic temporaries)."""
    c = _codepoints(t)
    n = len(c)
    if n < L:
        return np.empty(0, dtype=np.uint64)
    m = n - L + 1
    h = np.zeros(m, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(L):
            h = h * _B + c[i:i + m]
    return h


def winnow_positions(h: np.ndarray, w: int) -> np.ndarray:
    """Robust-winnowing position selection: indexes p where h[p] is the
    minimum of some w-window of consecutive hashes (rightmost minimum
    per window — the standard tie rule, deterministic)."""
    if len(h) == 0:
        return np.empty(0, dtype=np.int64)
    if len(h) <= w:
        # fewer windows than w: select the global (rightmost) minimum
        return np.array([len(h) - 1 - int(np.argmin(h[::-1]))],
                        dtype=np.int64)
    sw = np.lib.stride_tricks.sliding_window_view(h, w)
    # rightmost min: argmin over the reversed window
    rev = sw[:, ::-1]
    idx = (w - 1) - np.argmin(rev, axis=1)
    sel = idx + np.arange(len(sw), dtype=np.int64)
    return np.unique(sel)


def winnowed_candidates(docs, *, L: int = 30, w: int = 8,
                        id_col: str = "doc_id", text_col: str = "text",
                        n_buckets: int = 64):
    """Scale path: (doc_id, pos, fp) fingerprint rows for WINNOWED
    window positions only (~2/(w+1) of all positions), grouped to the
    colliding fingerprints (>= 2 locations).  Guarantee: every
    duplicated span of length >= L + w - 1 shares >= 1 selected
    fingerprint on each copy, so downstream verification misses
    nothing above that length.  Only 24-byte fixed rows shuffle."""

    def fp_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        oi, op, oh = [], [], []
        for i, t in enumerate(batch.column(text_col).to_pylist()):
            h = rolling_hashes(t, L)
            if len(h) == 0:
                continue
            pos = winnow_positions(h, w)
            oi.append(np.full(len(pos), ids[i]))
            op.append(pos)
            oh.append(h[pos])
        if not oi:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "fp": pa.array([], pa.int64())})
        return pa.table({
            id_col: pa.array(np.concatenate(oi)),
            "pos": pa.array(np.concatenate(op)),
            "fp": pa.array(np.concatenate(oh).view(np.int64)),
        })

    fps = docs.map_batches(fp_rows, batch_format="pyarrow")

    def colliding(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g.groupby("fp", sort=False)["pos"].transform("size")
        return g[cnt >= 2]

    return bucketed_groupby(fps, ["fp"], colliding, n_buckets=n_buckets)


def strip_dup_spans(docs, *, L: int = 30, id_col: str = "doc_id",
                    text_col: str = "text", n_buckets: int = 64,
                    broadcast_spans: int = 2_000_000):
    """Remove every duplicated span (ALL copies) from every doc — the
    cleaning step over :func:`dup_spans` (the Lee et al. "drop
    duplicated substrings" variant; keeping one canonical copy is a
    policy layer above this primitive).  Returns (doc_id, clean_text,
    removed_chars); span-free docs pass through unchanged.

    Two shapes: when the span table fits one object (<=
    ``broadcast_spans`` rows — spans are a tiny fraction of docs by
    construction) it ships once via ``ray.put`` sorted by doc, and the
    rewrite is ONE map pass over the docs (searchsorted per batch; the
    per-affected-doc string splice is the inherent serial work).
    Above it, spans LEFT-join onto the docs keyed by id and the gap
    concatenation runs inside coarse buckets — documents shuffle twice,
    unavoidable for a shuffled text-rewriting op."""
    from .hashjoin import bucketed_join

    spans = dup_spans(docs, L=L, id_col=id_col, text_col=text_col,
                      n_buckets=n_buckets).materialize()

    def _splice(t: str, s: np.ndarray, e: np.ndarray) -> str:
        parts, prev = [], 0
        for a, b_ in zip(s, e):  # spans are disjoint and few per doc
            parts.append(t[prev:a])
            prev = b_
        parts.append(t[prev:])
        return "".join(parts)

    if spans.count() <= broadcast_spans:
        import ray as _ray

        sdf = spans.to_pandas()
        order = np.lexsort((sdf["span_start"].to_numpy(),
                            sdf[id_col].to_numpy()))
        blob = (sdf[id_col].to_numpy()[order],
                sdf["span_start"].to_numpy()[order].astype(np.int64),
                sdf["span_end"].to_numpy()[order].astype(np.int64))
        ref = _ray.put(blob) if _ray.is_initialized() else blob

        def rewrite(b: pa.Table, _ref=ref) -> pa.Table:
            from .graph import _get_blob

            sid, ss, se = _get_blob(_ref) if not isinstance(_ref, tuple) \
                else _ref
            ids = b.column(id_col).to_numpy(zero_copy_only=False)
            texts = b.column(text_col).to_pylist()
            lo = np.searchsorted(sid, ids, side="left")
            hi = np.searchsorted(sid, ids, side="right")
            cleans, removed = [], np.zeros(len(b), dtype=np.int64)
            for i, t in enumerate(texts):
                if hi[i] == lo[i]:
                    cleans.append(t)
                    continue
                c = _splice(t, ss[lo[i]:hi[i]], se[lo[i]:hi[i]])
                cleans.append(c)
                removed[i] = len(t) - len(c)
            return pa.table({id_col: b.column(id_col),
                             "clean_text": pa.array(cleans, pa.string()),
                             "removed_chars": pa.array(removed)})

        return docs.map_batches(
            lambda b: b.select([id_col, text_col]), batch_format="pyarrow"
        ).map_batches(rewrite, batch_format="pyarrow")

    joined = bucketed_join(
        docs.map_batches(lambda b: b.select([id_col, text_col]),
                         batch_format="pyarrow"),
        spans, [id_col], how="left", n_buckets=n_buckets)

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        has = g["span_start"].notna().to_numpy()
        out_ids, out_clean, out_rm = [], [], []
        # passthrough docs arrive as exactly one null-span row each
        miss = g[~has]
        out_ids.extend(miss[id_col].tolist())
        out_clean.extend(miss[text_col].tolist())
        out_rm.extend([0] * len(miss))
        sub = g[has]
        if len(sub):
            doc = sub[id_col].to_numpy()
            ss = sub["span_start"].to_numpy(dtype=np.int64)
            se = sub["span_end"].to_numpy(dtype=np.int64)
            texts = sub[text_col].to_numpy()
            order = np.lexsort((ss, doc))
            doc, ss, se, texts = doc[order], ss[order], se[order], \
                texts[order]
            new_doc = np.ones(len(doc), dtype=bool)
            new_doc[1:] = doc[1:] != doc[:-1]
            starts = np.append(np.flatnonzero(new_doc), len(doc))
            for j in range(len(starts) - 1):
                a, b_ = starts[j], starts[j + 1]
                t = texts[a]
                c = _splice(t, ss[a:b_], se[a:b_])
                out_ids.append(doc[a])
                out_clean.append(c)
                out_rm.append(len(t) - len(c))
        return pd.DataFrame({id_col: out_ids, "clean_text": out_clean,
                             "removed_chars": np.asarray(out_rm,
                                                         dtype=np.int64)})

    return bucketed_groupby(joined, [id_col], per_doc, n_buckets=n_buckets)


def _merge_intervals(g: pd.DataFrame, id_col: str) -> pd.DataFrame:
    """Interval union of explicit [span_start, span_end) rows per doc —
    the general form of :func:`_merge_spans` (same vectorized segmented
    running-max, no per-doc loop)."""
    if len(g) == 0:
        return pd.DataFrame(
            {id_col: pd.Series([], dtype="int64"),
             "span_start": pd.Series([], dtype="int64"),
             "span_end": pd.Series([], dtype="int64")})
    doc = g[id_col].to_numpy()
    s = g["span_start"].to_numpy().astype(np.int64)
    e = g["span_end"].to_numpy().astype(np.int64)
    order = np.lexsort((s, doc))
    doc, s, e = doc[order], s[order], e[order]
    new_doc = np.ones(len(doc), dtype=bool)
    new_doc[1:] = doc[1:] != doc[:-1]
    gid = np.cumsum(new_doc) - 1
    K = np.int64(e.max() + 1)
    seg_max = np.maximum.accumulate(e + gid * K) - gid * K
    brk = new_doc.copy()
    brk[1:] |= s[1:] > seg_max[:-1]
    starts = np.flatnonzero(brk)
    return pd.DataFrame({id_col: doc[starts],
                         "span_start": s[starts],
                         "span_end": np.maximum.reduceat(e, starts)})


def winnowed_dup_spans(docs, *, L: int = 30, w: int = 8,
                       id_col: str = "doc_id", text_col: str = "text",
                       n_buckets: int = 64):
    """The 100-TB substring-dedup path END TO END: winnowed fingerprint
    candidates -> anchor pairs -> two bucketed text joins -> EXACT
    window verify (collision-immune) + maximal left/right extension ->
    per-doc interval union.  Returns (doc_id, span_start, span_end).

    Coverage guarantee (winnowing): every duplicated run of length >=
    L + w - 1 shares a fingerprint on each copy, so its FULL extent is
    recovered by the extension; shorter duplicates may be missed — the
    documented recall/volume trade vs :func:`dup_spans` (which shuffles
    every window; this path shuffles ~2/(w+1) fingerprint rows plus
    candidate texts only).  Pinned by a test against dup_spans on
    planted long runs."""
    from .hashjoin import bucketed_join

    cands = winnowed_candidates(docs, L=L, w=w, id_col=id_col,
                                text_col=text_col, n_buckets=n_buckets)

    def mk_pairs(g: pd.DataFrame) -> pd.DataFrame:
        fp = g["fp"].to_numpy()
        doc = g[id_col].to_numpy()
        pos = g["pos"].to_numpy().astype(np.int64)
        order = np.lexsort((pos, doc, fp))
        fp, doc, pos = fp[order], doc[order], pos[order]
        new_run = np.ones(len(fp), dtype=bool)
        new_run[1:] = fp[1:] != fp[:-1]
        run_first = np.maximum.accumulate(
            np.where(new_run, np.arange(len(fp)), 0))
        members = ~new_run  # everyone pairs with its run's anchor
        return pd.DataFrame({
            "a_doc": doc[run_first[members]],
            "a_pos": pos[run_first[members]],
            "b_doc": doc[members],
            "b_pos": pos[members],
        }).drop_duplicates()

    pairs = bucketed_groupby(cands, ["fp"], mk_pairs,
                             n_buckets=n_buckets).materialize()

    def _extend(x: str, y: str, p: int, q: int):
        if x[p:p + L] != y[q:q + L]:
            return None  # poly64 collision — exact check kills it
        lo = 0
        while p - lo - 1 >= 0 and q - lo - 1 >= 0 \
                and x[p - lo - 1] == y[q - lo - 1]:
            lo += 1
        hi = L
        nx, ny = len(x), len(y)
        while p + hi < nx and q + hi < ny and x[p + hi] == y[q + hi]:
            hi += 1
        return lo, hi

    # BROADCAST-PAIRS text fetch (the volume fix): the candidate pair
    # table is winnow-sparse, so it ships once via ray.put and ONE map
    # over the docs emits only the CANDIDATE texts, tagged by pair id —
    # the corpus itself never enters a join shuffle (the naive
    # two-bucketed-join attach ships every document's text twice).
    pdf = pairs.to_pandas()
    if len(pdf) == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "span_start": pa.array([], pa.int64()),
            "span_end": pa.array([], pa.int64())}))
    import ray as _ray

    pid = np.arange(len(pdf), dtype=np.int64)
    sides = []
    for side, (dc, pc) in enumerate((("a_doc", "a_pos"),
                                     ("b_doc", "b_pos"))):
        d = pdf[dc].to_numpy()
        o = np.argsort(d, kind="mergesort")
        sides.append((d[o], pid[o], pdf[pc].to_numpy()[o].astype(np.int64),
                      side))
    blob = tuple(sides)
    ref = _ray.put(blob) if _ray.is_initialized() else blob

    def fetch(b: pa.Table, _ref=ref) -> pa.Table:
        from .graph import _get_blob

        sd = _get_blob(_ref) if not isinstance(_ref, tuple) else _ref
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        texts = b.column(text_col).to_pylist()
        out_pid, out_side, out_pos, out_txt, out_doc = [], [], [], [], []
        for d_arr, p_arr, pos_arr, side in sd:
            lo = np.searchsorted(d_arr, ids, side="left")
            hi = np.searchsorted(d_arr, ids, side="right")
            for i in np.flatnonzero(hi > lo):
                for j in range(lo[i], hi[i]):
                    out_pid.append(p_arr[j])
                    out_side.append(side)
                    out_pos.append(pos_arr[j])
                    out_txt.append(texts[i])
                    out_doc.append(ids[i])
        return pa.table({
            "pid": pa.array(np.asarray(out_pid, dtype=np.int64)),
            "side": pa.array(np.asarray(out_side, dtype=np.int8)),
            "pos": pa.array(np.asarray(out_pos, dtype=np.int64)),
            "txt": pa.array(out_txt, pa.string()),
            "doc": pa.array(np.asarray(out_doc, dtype=np.int64)),
        })

    fetched = docs.map_batches(fetch, batch_format="pyarrow")

    def verify_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["pid", "side"], kind="mergesort")
        pids = g["pid"].to_numpy()
        new = np.ones(len(g), dtype=bool)
        new[1:] = pids[1:] != pids[:-1]
        starts = np.append(np.flatnonzero(new), len(g))
        docs_o, ss, es = [], [], []
        sidev = g["side"].to_numpy()
        posv = g["pos"].to_numpy()
        txtv = g["txt"].to_numpy()
        docv = g["doc"].to_numpy()
        for j in range(len(starts) - 1):
            a, b_ = starts[j], starts[j + 1]
            if b_ - a != 2 or sidev[a] == sidev[b_ - 1]:
                continue  # incomplete pair (shouldn't happen)
            x, y = txtv[a], txtv[a + 1]
            p, q = int(posv[a]), int(posv[a + 1])
            r = _extend(x, y, p, q)
            if r is None:
                continue
            lo, hi = r
            for dd, s0 in ((docv[a], p), (docv[a + 1], q)):
                docs_o.append(dd)
                ss.append(s0 - lo)
                es.append(s0 + hi)
        return pd.DataFrame({id_col: docs_o,
                             "span_start": np.asarray(ss, dtype=np.int64),
                             "span_end": np.asarray(es, dtype=np.int64)})

    spans = bucketed_groupby(fetched, ["pid"], verify_group,
                             n_buckets=n_buckets)
    return bucketed_groupby(spans, [id_col],
                            lambda g: _merge_intervals(g, id_col),
                            n_buckets=n_buckets)


def winnow_restrict_dup_spans(docs, *, L: int = 30, w: int = 8,
                              id_col: str = "doc_id",
                              text_col: str = "text",
                              n_buckets: int = 64,
                              broadcast_docs: int = 2_000_000):
    """EXACT :func:`dup_spans` output at winnowed cost — the verified
    scale path for suffix-family dedup.

    A winnowed fingerprint pass with gram length ``L - w + 1`` and
    window ``w`` carries the SWA-2003 guarantee for every match of
    length >= (L - w + 1) + w - 1 = L: both copies of any duplicated
    length-L window select one SHARED fingerprint (identical hash
    sequences + the deterministic rightmost-min tie rule pick the same
    value), so every doc that owns a duplicated window is a CANDIDATE.
    Restricting the exact window pass to candidate docs is therefore
    LOSSLESS — the composition returns bit-identical spans to
    ``dup_spans(docs, L=L)`` while the expensive L-bytes-per-character
    window shuffle touches only the (winnow-sparse) duplicated docs;
    clean docs ship 16-byte fingerprint rows at ~2/(w+1) density and
    nothing else.  poly64 collisions can only ADD candidate docs (the
    exact pass groups on window text), never lose spans.

    Candidate ids broadcast via ``ray.put`` below ``broadcast_docs``
    fingerprint rows (one map-side filter, zero extra shuffles); above
    it the restriction is a bucketed SEMI join keyed on the doc id.
    """
    Lw = L - w + 1
    if Lw < 2:
        raise ValueError(f"need L - w + 1 >= 2 grams (L={L}, w={w})")
    cands = winnowed_candidates(docs, L=Lw, w=w, id_col=id_col,
                                text_col=text_col, n_buckets=n_buckets)
    ids = cands.select_columns([id_col]).materialize()
    n_rows = ids.count()
    if n_rows == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "span_start": pa.array([], pa.int64()),
            "span_end": pa.array([], pa.int64())}))
    if n_rows <= broadcast_docs:
        import ray as _ray

        uniq = np.unique(ids.to_pandas()[id_col].to_numpy())
        ref = _ray.put(uniq) if _ray.is_initialized() else uniq

        def keep(b: pa.Table, _ref=ref) -> pa.Table:
            from .graph import _get_blob

            u = _ref if isinstance(_ref, np.ndarray) else _get_blob(_ref)
            v = b.column(id_col).to_numpy(zero_copy_only=False)
            p = np.searchsorted(u, v)
            p[p == len(u)] = 0
            return b.filter(pa.array(u[p] == v))

        subset = docs.map_batches(keep, batch_format="pyarrow")
    else:
        from .hashjoin import bucketed_join

        subset = bucketed_join(docs, ids, [id_col], how="semi",
                               n_buckets=n_buckets)
    return dup_spans(subset, L=L, id_col=id_col, text_col=text_col,
                     n_buckets=n_buckets)


def cdc_chunks(docs, *, k: int = 8, divisor: int = 64,
               id_col: str = "doc_id", text_col: str = "text"):
    """CONTENT-DEFINED CHUNKING (the rolling-hash cut rule of
    Rabin/FastCDC-style storage dedup, public technique): a cut falls
    after character ``p + k - 1`` whenever the poly64 hash of the
    length-``k`` window starting at ``p`` is ≡ 0 mod ``divisor`` —
    boundaries depend only on LOCAL content, so an insertion early in a
    doc re-chunks O(1) chunks instead of shifting every fixed-width
    block (the property that makes CDC the dedup-friendly chunking).
    Expected chunk length ≈ ``divisor`` chars.

    Pure ``map_batches`` — NO shuffle; per doc the cut positions come
    from ONE vectorized rolling-hash pass.  Docs with empty text emit
    nothing; docs shorter than ``k`` emit one whole-doc chunk.

    Output: (id_col, chunk_idx, chunk_start, chunk_text); a cut landing
    exactly at the doc end produces no empty trailing chunk.
    """

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        oi, ox, os_, ot = [], [], [], []
        for i, t in enumerate(batch.column(text_col).to_pylist()):
            n = len(t)
            if n == 0:
                continue
            h = rolling_hashes(t, k)
            cuts = (np.flatnonzero(h % np.uint64(divisor) == 0)
                    .astype(np.int64) + k)
            starts = np.concatenate([[np.int64(0)], cuts])
            ends = np.append(cuts, np.int64(n))
            keep = ends > starts
            starts, ends = starts[keep], ends[keep]
            m = len(starts)
            oi.append(np.full(m, ids[i]))
            ox.append(np.arange(m, dtype=np.int64))
            os_.append(starts)
            ot.extend(t[s:e] for s, e in zip(starts, ends))
        if not oi:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "chunk_idx": pa.array([], pa.int64()),
                             "chunk_start": pa.array([], pa.int64()),
                             "chunk_text": pa.array([], pa.string())})
        return pa.table({
            id_col: pa.array(np.concatenate(oi)),
            "chunk_idx": pa.array(np.concatenate(ox)),
            "chunk_start": pa.array(np.concatenate(os_)),
            "chunk_text": pa.array(ot, pa.string()),
        })

    return docs.map_batches(fn, batch_format="pyarrow")


def cdc_dedup_stats(docs, *, k: int = 8, divisor: int = 64,
                    id_col: str = "doc_id", text_col: str = "text",
                    n_buckets: int = 64):
    """Corpus-wide CDC dedup accounting — the "storage dedup ratio"
    aggregate: ONE row (total_chunks, distinct_chunks, total_chars,
    distinct_chars) over the :func:`cdc_chunks` output.

    Scale shape: chunk rows shuffle ONCE bucketed on an fnv1a hash of
    the chunk text (equal chunks share a bucket, so per-bucket distinct
    counts are globally exact partials); a single-block finale sums the
    B partial rows.  Nothing driver-side but the 4-int result.
    """
    import pandas as pd

    from ..functions.hashing import fnv1a_str_array
    from .bucketed import bucketed_groupby

    ch = cdc_chunks(docs, k=k, divisor=divisor, id_col=id_col,
                    text_col=text_col)

    def add_hash(b: pa.Table) -> pa.Table:
        txt = b.column("chunk_text")
        h = fnv1a_str_array(txt.to_pylist()).view(np.int64)
        return pa.table({"chunk_text": txt, "__h": pa.array(h)})

    rows = ch.map_batches(add_hash, batch_format="pyarrow")

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        t = g["chunk_text"].to_numpy()
        lens = np.fromiter((len(x) for x in t), dtype=np.int64,
                           count=len(t))
        uniq, first = np.unique(t, return_index=True)
        return pd.DataFrame({
            "total_chunks": [np.int64(len(t))],
            "distinct_chunks": [np.int64(len(uniq))],
            "total_chars": [lens.sum()],
            "distinct_chars": [lens[first].sum()],
        })

    parts = bucketed_groupby(rows, ["__h"], partial, n_buckets=n_buckets)

    def finale(b: pa.Table) -> pa.Table:
        return pa.table({
            c: pa.array([int(pa.compute.sum(b.column(c)).as_py() or 0)],
                        pa.int64())
            for c in ["total_chunks", "distinct_chunks", "total_chars",
                      "distinct_chars"]})

    return parts.repartition(1).map_batches(finale,
                                            batch_format="pyarrow")
