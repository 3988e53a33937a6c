"""Distributed exact k-means + SemDeDup-style semantic dedup.

The clustering family the curation literature uses to bound quadratic
near-dup work (SemDeDup, Abbas et al. 2023: k-means the embedding space,
then search for duplicates only WITHIN each cluster).  Everything here is
integer-exact so the DuckDB oracle mirrors it bit-for-bit:

- embeddings quantize to ``q = floor(x * 2^SCALE_BITS) + 2^SCALE_BITS``
  (float32 -> float64 multiply by a power of two is exact; the offset
  makes values non-negative so truncating integer division == floor on
  both sides — DuckDB's ``//`` truncates toward zero, Python's floors);
- distances are int64 sums of squared diffs (dim 64, |q| <= 2^21 ->
  dist^2 <= 2^48, no overflow);
- Lloyd updates are component-wise integer means ``sum // count`` with
  keep-previous-centroid semantics for empty clusters;
- ties in argmin break to the SMALLEST cluster index.

Scale shape (the reason k-means earns a distributed implementation):
each Lloyd iteration is ONE streaming ``map_batches`` pass over the
column-pruned read emitting k x (dim+1) integer partials per BLOCK —
state is k-bounded, there is NO shuffle at all, and the corpus never
materializes.  Seeds (the k smallest ids' vectors) come from a per-block
top-k partial reduce, also shuffle-free.  SemDeDup then shuffles ONLY
(id, cluster, qvec) rows once, bucketed by cluster, and runs the
quadratic scan within clusters — exactly the bound the paper buys with
clustering (cluster size ~ n/k; pick k ~ n / 10k docs at corpus scale).

Reference parity note: the reference (zen3geo) has no clustering; this
extends the LLM-data-pipeline operator set (SURVEY.md "beyond the
reference" list: embedding-space dedup).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .bucketed import bucketed_groupby

SCALE_BITS = 20
_OFF = 1 << SCALE_BITS


def _quant_matrix(batch: pa.Table, col: str) -> np.ndarray:
    """(n, dim) int64 quantized matrix — exact on every lane.

    float32 -> float64 is exact; multiplying by 2^SCALE_BITS only shifts
    the exponent (exact); floor then offsets into non-negative ints.
    """
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(batch)
    dim = flat.size // n if n else 0
    q = np.floor(flat * float(1 << SCALE_BITS)).astype(np.int64) + _OFF
    return q.reshape(n, dim)


def _assign(q: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """argmin_c ||q - c||^2 with smallest-index tie-break, all int64.

    Per-centroid 1-D passes (the numpy-broadcast-pathology lesson from
    stages/dedup.py): k passes over (n, dim) rather than one (n, k, dim)
    temporary.
    """
    n = q.shape[0]
    best = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    lab = np.zeros(n, dtype=np.int64)
    for c in range(cents.shape[0]):
        d = q - cents[c]          # (n, dim) int64
        dist = np.einsum("ij,ij->i", d, d)
        upd = dist < best         # strict: ties keep the earlier (smaller) c
        best[upd] = dist[upd]
        lab[upd] = c
    return lab


def seed_centroids(ds, *, id_col: str, vec_col: str, k: int) -> np.ndarray:
    """(k, dim) int64 seeds = the quantized vectors of the k SMALLEST ids.

    Per-block top-k partial -> tiny driver merge: no sort, no shuffle;
    at most k rows per block reach the driver.
    """
    def local_top(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        q = _quant_matrix(b, vec_col)
        take = np.argsort(ids, kind="stable")[:k]
        return pa.table({
            "__id": pa.array(ids[take], pa.int64()),
            "__q": pa.array(list(q[take]), pa.list_(pa.int64())),
        })

    part = ds.map_batches(local_top, batch_format="pyarrow").to_pandas()
    part = part.sort_values("__id", kind="mergesort").head(k)
    return np.stack([np.asarray(v, dtype=np.int64) for v in part["__q"]])


def lloyd_iterate(ds, cents: np.ndarray, *, vec_col: str) -> np.ndarray:
    """One exact Lloyd update: assign against ``cents``, return the new
    (k, dim) centroid matrix.  ONE streaming pass; per-block partials are
    (k, dim+1) int64 — the driver reduce is k-bounded.

    Empty clusters keep their previous centroid (mirrored by the oracle's
    COALESCE left join).  int64 component sums cap at rows_per_cluster *
    2^21; raise ``k`` (or shard the sum) beyond ~2^41 rows per cluster.
    """
    kk, dim = cents.shape

    def partial(b: pa.Table) -> pa.Table:
        q = _quant_matrix(b, vec_col)
        lab = _assign(q, cents)
        sums = np.zeros((kk, dim), dtype=np.int64)
        np.add.at(sums, lab, q)
        cnt = np.bincount(lab, minlength=kk).astype(np.int64)
        return pa.table({
            "__c": pa.array(np.arange(kk, dtype=np.int64)),
            "__n": pa.array(cnt, pa.int64()),
            "__s": pa.array(list(sums), pa.list_(pa.int64())),
        })

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = cents.copy()
    for c in range(kk):
        rows = part[part["__c"] == c]
        n = int(rows["__n"].sum())
        if n == 0:
            continue
        s = np.sum(np.stack([np.asarray(v, np.int64) for v in rows["__s"]]),
                   axis=0)
        out[c] = s // n           # non-negative -> floor == truncate
    return out


def pq_train(ds, *, id_col: str = "vec_id", vec_col: str = "embedding",
             n_sub: int = 4, k: int = 8, iters: int = 2) -> list[np.ndarray]:
    """Product-quantization codebooks (Jégou, Douze & Schmid 2011):
    split the vector into ``n_sub`` contiguous subspaces and k-means
    each — the memory-bounded ANN representation (a 64-dim float vector
    compresses to n_sub code bytes).  FUSED Lloyd: every iteration is
    ONE streaming pass emitting n_sub x k x (sub_dim+1) int64 partials
    per block (no shuffle; corpus never materializes), so training all
    subspaces costs the same scans as training one.  Same integer
    discipline as ``kmeans_assign`` — the ``pq_codes`` oracle re-derives
    every codebook bit-for-bit.  Returns n_sub (k, sub_dim) int64
    codebooks."""
    seeds = seed_centroids(ds, id_col=id_col, vec_col=vec_col, k=k)
    dim = seeds.shape[1]
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    sd = dim // n_sub
    books = [seeds[:, s * sd:(s + 1) * sd].copy() for s in range(n_sub)]

    for _ in range(iters):
        def partial(b: pa.Table) -> pa.Table:
            q = _quant_matrix(b, vec_col)
            ss, cc, nn, sums = [], [], [], []
            for s in range(n_sub):
                qs = q[:, s * sd:(s + 1) * sd]
                lab = _assign(qs, books[s])
                sm = np.zeros((k, sd), dtype=np.int64)
                np.add.at(sm, lab, qs)
                ss += [s] * k
                cc += list(range(k))
                nn += list(np.bincount(lab, minlength=k).astype(np.int64))
                sums += [row for row in sm]
            return pa.table({
                "__s": pa.array(np.array(ss, np.int64)),
                "__c": pa.array(np.array(cc, np.int64)),
                "__n": pa.array(np.array(nn, np.int64)),
                "__sum": pa.array([r for r in sums], pa.list_(pa.int64())),
            })

        part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        nxt = [b.copy() for b in books]
        for s in range(n_sub):
            for c in range(k):
                rows = part[(part["__s"] == s) & (part["__c"] == c)]
                n = int(rows["__n"].sum())
                if n == 0:
                    continue  # empty cluster keeps its previous centroid
                tot = np.sum(np.stack([np.asarray(v, np.int64)
                                       for v in rows["__sum"]]), axis=0)
                nxt[s][c] = tot // n
        books = nxt
    return books


def pq_codes(ds, *, id_col: str = "vec_id", vec_col: str = "embedding",
             n_sub: int = 4, k: int = 8, iters: int = 2,
             books: list[np.ndarray] | None = None):
    """(codebooks, long-form code Dataset (id_col, sub, code)) — one
    encode pass after training; rows never shuffle."""
    if books is None:
        books = pq_train(ds, id_col=id_col, vec_col=vec_col,
                         n_sub=n_sub, k=k, iters=iters)
    sd = books[0].shape[1]

    def enc(b: pa.Table) -> pa.Table:
        q = _quant_matrix(b, vec_col)
        ids = b.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        parts = []
        for s in range(len(books)):
            lab = _assign(q[:, s * sd:(s + 1) * sd], books[s])
            parts.append(pa.table({
                id_col: pa.array(ids),
                "sub": pa.array(np.full(len(ids), s, np.int64)),
                "code": pa.array(lab),
            }))
        return pa.concat_tables(parts)

    return books, ds.map_batches(enc, batch_format="pyarrow")


def pq_adc_topk(ds, qvec: np.ndarray, *, id_col: str = "vec_id",
                vec_col: str = "embedding", n_sub: int = 4, k: int = 8,
                iters: int = 2, top: int = 10,
                books: list[np.ndarray] | None = None) -> pa.Table:
    """Asymmetric-distance top-k: quantize the query once, precompute
    the n_sub x k lookup tables (||q_s - centroid||^2, int64), then ONE
    streaming pass encodes each row and sums n_sub table lookups —
    distance work per vector is n_sub adds instead of dim multiplies.
    Per-block local top-``top`` + single-block finale (the mmr pool
    contract); ties break to the smallest id.  Returns a pa.Table
    (rank, id_col, dist)."""
    if books is None:
        books = pq_train(ds, id_col=id_col, vec_col=vec_col,
                         n_sub=n_sub, k=k, iters=iters)
    sd = books[0].shape[1]
    qq = (np.floor(np.asarray(qvec, dtype=np.float64)
                   * float(1 << SCALE_BITS)).astype(np.int64) + _OFF)
    tables = []
    for s in range(n_sub):
        d = books[s] - qq[s * sd:(s + 1) * sd]
        tables.append(np.einsum("ij,ij->i", d, d))

    def scan(b: pa.Table) -> pa.Table:
        q = _quant_matrix(b, vec_col)
        ids = b.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        dist = np.zeros(len(ids), dtype=np.int64)
        for s in range(n_sub):
            lab = _assign(q[:, s * sd:(s + 1) * sd], books[s])
            dist += tables[s][lab]
        order = np.lexsort((ids, dist))[:top]
        return pa.table({id_col: pa.array(ids[order]),
                         "dist": pa.array(dist[order])})

    def fin(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        dist = b.column("dist").to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, dist))[:top]
        return pa.table({
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            id_col: pa.array(ids[order]),
            "dist": pa.array(dist[order]),
        })

    df = ds.map_batches(scan, batch_format="pyarrow") \
        .repartition(1).map_batches(fin, batch_format="pyarrow").to_pandas()
    return pa.table({
        "rank": pa.array(df["rank"].to_numpy().astype(np.int64)),
        id_col: pa.array(df[id_col].to_numpy().astype(np.int64)),
        "dist": pa.array(df["dist"].to_numpy().astype(np.int64)),
    })


def ivfpq_topk(ds, qvec: np.ndarray, *, id_col: str = "vec_id",
               vec_col: str = "embedding", n_lists: int = 8,
               n_probe: int = 2, n_sub: int = 4, k: int = 8,
               iters: int = 2, top: int = 10) -> pa.Table:
    """IVF-PQ top-k (the standard billion-scale ANN composition): a
    coarse integer k-means partitions vectors into ``n_lists`` inverted
    lists, PQ codes give O(n_sub) asymmetric distances, and the query
    scans ONLY the ``n_probe`` lists whose coarse centroids are nearest
    — per-query work drops by ~n_lists/n_probe.  PQ encodes the RAW
    vectors, not residuals (residual encoding would need signed
    quantization; raw-vector PQ keeps the oracle's integer discipline —
    recall at equal code budget is slightly lower, the
    `ivfpq_ann`-vs-`ann` test pins how much).  Probe choice ties to the
    smallest list id; everything int64, mirrored by the ``ivfpq_ann``
    oracle."""
    cents, _ = kmeans_assign(ds, id_col=id_col, vec_col=vec_col,
                             k=n_lists, iters=iters)
    books = pq_train(ds, id_col=id_col, vec_col=vec_col,
                     n_sub=n_sub, k=k, iters=iters)
    sd = books[0].shape[1]
    qq = (np.floor(np.asarray(qvec, dtype=np.float64)
                   * float(1 << SCALE_BITS)).astype(np.int64) + _OFF)
    dc = cents - qq
    cd = np.einsum("ij,ij->i", dc, dc)
    probe = np.sort(np.lexsort((np.arange(n_lists), cd))[:n_probe])
    tables = []
    for s in range(n_sub):
        d = books[s] - qq[s * sd:(s + 1) * sd]
        tables.append(np.einsum("ij,ij->i", d, d))

    def scan(b: pa.Table) -> pa.Table:
        q = _quant_matrix(b, vec_col)
        ids = b.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        m = np.isin(_assign(q, cents), probe)
        q, ids = q[m], ids[m]
        dist = np.zeros(len(ids), dtype=np.int64)
        for s in range(n_sub):
            lab = _assign(q[:, s * sd:(s + 1) * sd], books[s])
            dist += tables[s][lab]
        order = np.lexsort((ids, dist))[:top]
        return pa.table({id_col: pa.array(ids[order]),
                         "dist": pa.array(dist[order])})

    def fin(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        dist = b.column("dist").to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, dist))[:top]
        return pa.table({
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            id_col: pa.array(ids[order]),
            "dist": pa.array(dist[order]),
        })

    df = ds.map_batches(scan, batch_format="pyarrow") \
        .repartition(1).map_batches(fin, batch_format="pyarrow").to_pandas()
    return pa.table({
        "rank": pa.array(df["rank"].to_numpy().astype(np.int64)),
        id_col: pa.array(df[id_col].to_numpy().astype(np.int64)),
        "dist": pa.array(df["dist"].to_numpy().astype(np.int64)),
    })


def kmeans_assign(ds, *, id_col: str = "vec_id", vec_col: str = "embedding",
                  k: int = 8, iters: int = 2,
                  keep_cols: list[str] | None = None):
    """Distributed exact k-means: returns (centroids, assignments Dataset
    with columns (id_col, cluster, *keep_cols)).  iters Lloyd updates
    from the k-smallest-id seeds, then one final assignment pass —
    iters + 2 shuffle-free streaming scans total.  ``keep_cols`` carries
    extra input columns (e.g. a ground-truth label for purity
    evaluation) through the final pass unchanged."""
    cents = seed_centroids(ds, id_col=id_col, vec_col=vec_col, k=k)
    for _ in range(iters):
        cents = lloyd_iterate(ds, cents, vec_col=vec_col)

    def final(b: pa.Table) -> pa.Table:
        q = _quant_matrix(b, vec_col)
        lab = _assign(q, cents)
        out = pa.table({
            id_col: b.column(id_col).cast(pa.int64()),
            "cluster": pa.array(lab, pa.int64()),
        })
        for c in keep_cols or []:
            out = out.append_column(c, b.column(c))
        return out

    return cents, ds.map_batches(final, batch_format="pyarrow")


def cluster_purity(ds, *, id_col: str = "vec_id",
                   vec_col: str = "embedding", truth_col: str = "label",
                   k: int = 8, iters: int = 2, n_buckets: int = 16):
    """Clustering-quality PURITY evaluation: k-means the vectors, then
    per cluster report size and the majority ground-truth class —
    (cluster, n, top_truth, top_n), ties broken by the smallest truth
    value.  Global purity = Σ top_n / Σ n (one division, derivable).

    One extra combiner-first pass past ``kmeans_assign``: batches emit
    (cluster, truth, partial count) rows — bounded by k × #classes per
    batch — and ONE bucketed argmax reduce closes it; vectors never
    shuffle.  All counts int64, so the chained-SQL oracle matches
    bit-exact."""
    _, asg = kmeans_assign(ds, id_col=id_col, vec_col=vec_col, k=k,
                           iters=iters, keep_cols=[truth_col])

    def pair_partial(b: pa.Table) -> pa.Table:
        c = b.column("cluster").to_numpy(zero_copy_only=False)
        t = b.column(truth_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        if len(t) and (t.min() < 0 or t.max() >= (1 << 32)):
            raise ValueError("cluster_purity: truth labels must be "
                             "non-negative 32-bit integers")
        key = c * (1 << 32) + t
        u, n = np.unique(key, return_counts=True)
        return pa.table({
            "cluster": pa.array((u >> 32).astype(np.int64)),
            "_t": pa.array((u & ((1 << 32) - 1)).astype(np.int64)),
            "_n": pa.array(n.astype(np.int64)),
        })

    def argmax(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["cluster", "_t"], sort=False,
                      as_index=False)["_n"].sum()
        c = s["cluster"].to_numpy().astype(np.int64)
        t = s["_t"].to_numpy().astype(np.int64)
        n = s["_n"].to_numpy().astype(np.int64)
        o = np.lexsort((t, -n, c))
        c, t, n = c[o], t[o], n[o]
        first = np.ones(len(c), dtype=bool)
        first[1:] = c[1:] != c[:-1]
        tot = np.add.reduceat(n, np.flatnonzero(first)) if len(c) else n
        return pd.DataFrame({"cluster": c[first], "n": tot,
                             "top_truth": t[first], "top_n": n[first]})

    parts = asg.map_batches(pair_partial, batch_format="pyarrow")
    out = bucketed_groupby(parts, ["cluster"], argmax, n_buckets=n_buckets)
    return out.map_batches(
        lambda b: pa.table({
            "cluster": pc.cast(b.column("cluster"), pa.int64()),
            "n": pc.cast(b.column("n"), pa.int64()),
            "top_truth": pc.cast(b.column("top_truth"), pa.int64()),
            "top_n": pc.cast(b.column("top_n"), pa.int64()),
        }),
        batch_format="pyarrow")


def semdedup(ds, *, id_col: str = "vec_id", vec_col: str = "embedding",
             k: int = 8, iters: int = 2, eps2_q: int | None = None,
             cos_tau: float = 0.9, n_buckets: int = 32):
    """SemDeDup: k-means the embeddings, then WITHIN each cluster drop
    any vector that has a smaller-id neighbor at quantized squared
    distance <= eps2_q (default: the integer threshold matching cosine
    ``cos_tau`` on unit vectors, floor((2 - 2*cos_tau) * 2^(2*SCALE))).

    Returns (id_col, cluster, kept) for every vector.  The only shuffle
    moves (id, cluster, qvec) rows bucketed by cluster; the quadratic
    neighbor scan is cluster-local (the bound clustering exists to buy).
    """
    if eps2_q is None:
        eps2_q = int(np.floor((2.0 - 2.0 * cos_tau) * float(1 << (2 * SCALE_BITS))))

    cents = seed_centroids(ds, id_col=id_col, vec_col=vec_col, k=k)
    for _ in range(iters):
        cents = lloyd_iterate(ds, cents, vec_col=vec_col)

    def tag(b: pa.Table) -> pa.Table:
        q = _quant_matrix(b, vec_col)
        lab = _assign(q, cents)
        return pa.table({
            id_col: b.column(id_col).cast(pa.int64()),
            "cluster": pa.array(lab, pa.int64()),
            "__q": pa.array([v.tobytes() for v in q], pa.binary()),
        })

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def bucket_fn(df: pd.DataFrame) -> pd.DataFrame:
        ids_out, cl_out, kept_out = [], [], []
        for c, g in df.groupby("cluster", sort=False):
            ids = g[id_col].to_numpy(dtype=np.int64)
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            m = np.stack([
                np.frombuffer(v, dtype=np.int64)
                for v in g["__q"].to_numpy()[order]
            ])
            n = len(ids)
            kept = np.ones(n, dtype=bool)
            # blocked lower-triangular scan: rows [s:e) vs ALL j < i.
            # ||a-b||^2 = ||a||^2 + ||b||^2 - 2 a.b, all int64-exact
            # (dots <= dim * 2^42 = 2^48).  Dropped rows still count as
            # neighbors for later rows — the EXISTS-smaller-id rule the
            # SQL oracle mirrors verbatim.
            sq = np.einsum("ij,ij->i", m, m)
            step = 1024
            for s in range(1, n, step):
                e = min(s + step, n)
                drop = np.zeros(e - s, dtype=bool)
                for cs in range(0, e, 8192):               # bound the tile
                    ce = min(cs + 8192, e)
                    dots = m[s:e] @ m[cs:ce].T             # (b, tile) int64
                    dist = sq[s:e, None] + sq[None, cs:ce] - 2 * dots
                    lower = (np.arange(s, e)[:, None]
                             > np.arange(cs, ce)[None, :])
                    drop |= np.any((dist <= eps2_q) & lower, axis=1)
                kept[s:e] &= ~drop
            ids_out.append(ids)
            cl_out.append(np.full(n, c, dtype=np.int64))
            kept_out.append(kept)
        if not ids_out:
            return pd.DataFrame({id_col: np.array([], np.int64),
                                 "cluster": np.array([], np.int64),
                                 "kept": np.array([], bool)})
        return pd.DataFrame({
            id_col: np.concatenate(ids_out),
            "cluster": np.concatenate(cl_out),
            "kept": np.concatenate(kept_out),
        })

    return bucketed_groupby(tagged, ["cluster"], bucket_fn,
                            n_buckets=n_buckets)


def grid_dbscan(pts, *, id_col: str = "doc_id", lon_col: str = "lon",
                lat_col: str = "lat", lon0: float = -180.0,
                lat0: float = -90.0, cell_deg: float = 5.0,
                min_pts: int = 10, key_mul: int = 1024,
                n_buckets: int = 32, max_rounds: int = 50,
                broadcast_threshold: int = 2_000_000):
    """Grid-based spatial DBSCAN (STING / grid-DBSCAN): density
    clustering of a point table without any pairwise distance pass.

    Cells of ``cell_deg`` degrees bin the points; cells holding
    >= ``min_pts`` points are CORE; core cells connected through
    8-neighbor adjacency (self included) form clusters labeled by the
    MINIMUM cell key (``key = ix * key_mul + iy`` — pack is exact while
    ``iy < key_mul``); every cell's label is the min component over the
    core cells among itself + its 8 neighbors (for a core cell that IS
    its own component — adjacent cores share it by construction), which
    uniformly covers core and BORDER cells; points inherit their cell's
    label, cells with no core neighbor are NOISE and drop out.

    Scale shape: cell counts are combiner-first (one bucketed reduce of
    per-batch partials — points shuffle only as (cell, count) rows);
    the adjacency/join/label work is all CELL-bounded (9x cell rows at
    worst); the final point labeling is one broadcast lookup when the
    cell table fits (``ray.put`` + per-worker searchsorted) and one
    bucketed join otherwise.  Points themselves never shuffle on the
    broadcast path.
    """
    from .graph import connected_components
    from .hashjoin import bucketed_join

    mp = np.int64(min_pts)
    km = np.int64(key_mul)

    def cell_partial(b: pa.Table) -> pa.Table:
        lon = b.column(lon_col).to_numpy(zero_copy_only=False)
        lat = b.column(lat_col).to_numpy(zero_copy_only=False)
        ix = np.floor((lon - lon0) / cell_deg).astype(np.int64)
        iy = np.floor((lat - lat0) / cell_deg).astype(np.int64)
        key, cnt = np.unique(ix * km + iy, return_counts=True)
        return pa.table({"ckey": pa.array(key),
                         "_c": pa.array(cnt.astype(np.int64))})

    cells = bucketed_groupby(
        pts.map_batches(cell_partial, batch_format="pyarrow"),
        ["ckey"],
        lambda g: g.groupby("ckey", sort=False, as_index=False)["_c"].sum(),
        n_buckets=n_buckets,
    ).materialize()

    import pyarrow.compute as pc

    core = cells.map_batches(
        lambda b: b.filter(pc.greater_equal(
            b.column("_c"), pa.scalar(int(mp), pa.int64()))).select(["ckey"]),
        batch_format="pyarrow",
    ).materialize()

    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]

    def expand_core(b: pa.Table) -> pa.Table:
        k = b.column("ckey").to_numpy(zero_copy_only=False)
        srcs, nbrs = [], []
        for dx, dy in offs:
            srcs.append(k)
            nbrs.append(k + np.int64(dx) * km + np.int64(dy))
        return pa.table({"src": pa.array(np.concatenate(srcs)),
                         "ckey": pa.array(np.concatenate(nbrs))})

    # (origin core cell, candidate neighbor key) semi-joined against the
    # core set -> undirected core adjacency incl. the (0,0) self-loop,
    # so isolated core cells survive as singleton components
    nbr = core.map_batches(expand_core, batch_format="pyarrow")
    edges = bucketed_join(nbr, core, ["ckey"], how="semi",
                          n_buckets=n_buckets).map_batches(
        lambda b: pa.table({"src": b.column("src"),
                            "dst": b.column("ckey")}),
        batch_format="pyarrow")

    comp = connected_components(edges, max_rounds=max_rounds,
                                n_buckets=n_buckets).materialize()

    # label every cell (core AND border): min component over the core
    # cells among self + 8 neighbors
    def expand_cells(b: pa.Table) -> pa.Table:
        k = b.column("ckey").to_numpy(zero_copy_only=False)
        origs, nbrs = [], []
        for dx, dy in offs:
            origs.append(k)
            nbrs.append(k + np.int64(dx) * km + np.int64(dy))
        return pa.table({"cell": pa.array(np.concatenate(origs)),
                         "node": pa.array(np.concatenate(nbrs))})

    cand = cells.map_batches(expand_cells, batch_format="pyarrow")
    hit = bucketed_join(cand, comp, ["node"], n_buckets=n_buckets)

    labels = bucketed_groupby(
        hit.map_batches(lambda b: b.select(["cell", "comp"]),
                        batch_format="pyarrow"),
        ["cell"],
        lambda g: g.groupby("cell", sort=False, as_index=False)["comp"].min(),
        n_buckets=n_buckets,
    ).materialize()

    n_cells = labels.count()

    def point_keys(b: pa.Table) -> pa.Table:
        lon = b.column(lon_col).to_numpy(zero_copy_only=False)
        lat = b.column(lat_col).to_numpy(zero_copy_only=False)
        ix = np.floor((lon - lon0) / cell_deg).astype(np.int64)
        iy = np.floor((lat - lat0) / cell_deg).astype(np.int64)
        return pa.table({id_col: b.column(id_col),
                         "cell": pa.array(ix * km + iy)})

    keyed = pts.map_batches(point_keys, batch_format="pyarrow")

    if n_cells <= broadcast_threshold:
        import ray

        ldf = labels.to_pandas()
        order = np.argsort(ldf["cell"].to_numpy(), kind="mergesort")
        lref = ray.put((ldf["cell"].to_numpy()[order].astype(np.int64),
                        ldf["comp"].to_numpy()[order].astype(np.int64)))

        def attach(b: pa.Table, _ref=lref) -> pa.Table:
            ks, lv = _get_cells_blob(_ref)
            c = b.column("cell").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(ks, c)
            pos_c = np.clip(pos, 0, max(len(ks) - 1, 0))
            ok = (len(ks) > 0) & (ks[pos_c] == c) if len(ks) else \
                np.zeros(len(c), bool)
            t = b.filter(pa.array(ok))
            return pa.table({id_col: t.column(id_col),
                             "cluster": pa.array(
                                 lv[pos_c[ok]] if len(ks) else
                                 np.array([], np.int64))})

        return keyed.map_batches(attach, batch_format="pyarrow")

    j = bucketed_join(keyed, labels.map_batches(
        lambda b: b.rename_columns(["cell", "cluster"]),
        batch_format="pyarrow"), ["cell"], n_buckets=n_buckets)
    return j.map_batches(lambda b: b.select([id_col, "cluster"]),
                         batch_format="pyarrow")


_CELLS_CACHE: dict = {}


def _get_cells_blob(ref):
    import ray

    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key not in _CELLS_CACHE:
        _CELLS_CACHE.clear()
        _CELLS_CACHE[key] = ray.get(ref)
    return _CELLS_CACHE[key]


def knn_label_agreement(ds, *, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        label_col: str = "label", k: int = 5):
    """kNN LABEL-AGREEMENT scoring (the Confident-Learning-style label
    NOISE detector for an EVALUATION SET): for every vector, how many
    of its k nearest neighbors (exact integer quantized L2, ties →
    smaller id, self excluded) share its label.  Low agreement flags
    probable mislabels.  Output: (id, label, k_used, agree, noisy)
    with ``noisy`` = agree·2 < k_used.

    Scale contract: the REFERENCE SIDE is the whole table, broadcast
    once via ``ray.put`` as a quantized int64 matrix — this is the
    eval-set / audit-sample shape (size-bounded by design), NOT a
    corpus-scale all-pairs; for corpora, run it on a sample or swap
    the reference side for the IVF/LSH candidates in stages/ann.
    Per batch one integer distance panel + vectorized top-k; nothing
    shuffles.
    """
    import ray

    whole = ds.to_pandas()
    ids_all = whole[id_col].to_numpy().astype(np.int64)
    lab_all = whole[label_col].to_numpy().astype(np.int64)
    mat = np.stack([np.asarray(v, dtype=np.float64)
                    for v in whole[vec_col]])
    q_all = (np.floor(mat * float(1 << SCALE_BITS)).astype(np.int64)
             + _OFF)
    order = np.argsort(ids_all, kind="stable")
    ref = ray.put((ids_all[order], lab_all[order], q_all[order]))

    def fn(b: pa.Table, _ref=ref) -> pa.Table:
        import ray as _ray

        from .graph import _get_blob

        ids_r, lab_r, q_r = _get_blob(_ref) \
            if isinstance(_ref, _ray.ObjectRef) else _ref
        q = _quant_matrix(b, vec_col)
        ids = b.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        lab = b.column(label_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n, m = len(ids), len(ids_r)
        agree = np.zeros(n, dtype=np.int64)
        kk = np.zeros(n, dtype=np.int64)
        # per-row panels in bounded slabs (keep peak memory flat)
        for lo in range(0, n, 256):
            hi = min(lo + 256, n)
            d = np.zeros((hi - lo, m), dtype=np.int64)
            for c in range(q.shape[1]):
                diff = q[lo:hi, c:c + 1] - q_r[:, c][None, :]
                d += diff * diff
            # exclude self by id
            self_mask = ids[lo:hi, None] == ids_r[None, :]
            d[self_mask] = np.iinfo(np.int64).max
            kk_i = min(k, m - 1)
            # top-k by (dist, id): ids_r is sorted so stable argsort
            # over d breaks ties toward the smaller id
            part = np.argsort(d, axis=1, kind="stable")[:, :kk_i]
            neigh_lab = lab_r[part]
            agree[lo:hi] = (neigh_lab
                            == lab[lo:hi, None]).sum(axis=1)
            kk[lo:hi] = kk_i
        return pa.table({
            id_col: pa.array(ids),
            label_col: pa.array(lab),
            "k_used": pa.array(kk),
            "agree": pa.array(agree),
            "noisy": pa.array((agree * 2 < kk)),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def label_centroids(ds, *, vec_col: str = "embedding",
                    label_col: str = "label", dim: int = 64,
                    scale: int = 1 << 20, n_buckets: int = 8):
    """Per-label embedding CENTROIDS (the class-prototype table kNN /
    semdedup diagnostics read) with SUMMATION-ORDER-FREE float
    discipline: every element quantizes to the exact INTEGER
    ``floor(float64(v) · scale)`` (float32 storage widens exactly, the
    product is one identical double both sides), integer sums commute
    across blocks, and the mean is ONE shared float shape
    ``s / (n · scale)``.

    Combiner-first: each block reduces to (label, d, s, n) partials —
    label-count × dim bounded — before one tiny bucketed merge;
    vectors never shuffle.  Output: ``(label, d, n, s, mean)``.
    """
    import pandas as pd

    from .bucketed import bucketed_groupby

    def partial(b: pa.Table) -> pa.Table:
        labs = b.column(label_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        vec = np.stack([np.asarray(v, dtype=np.float64)
                        for v in b.column(vec_col).to_pylist()])
        q = np.floor(vec * float(scale)).astype(np.int64)
        u, inv = np.unique(labs, return_inverse=True)
        s = np.zeros((len(u), dim), dtype=np.int64)
        np.add.at(s, inv, q)
        n = np.bincount(inv, minlength=len(u)).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(u, dim)),
            "d": pa.array(np.tile(np.arange(dim, dtype=np.int64),
                                  len(u))),
            "s": pa.array(s.reshape(-1)),
            "n": pa.array(np.repeat(n, dim)),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def finale(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["label", "d"], as_index=False)[["s", "n"]].sum()
        g["mean"] = (g["s"].to_numpy(dtype=np.float64)
                     / (g["n"].to_numpy(dtype=np.float64)
                        * float(scale)))
        return g[["label", "d", "n", "s", "mean"]]

    return bucketed_groupby(parts, ["label"], finale,
                            n_buckets=n_buckets)


def centroid_cosine_pairs(ds, *, vec_col: str = "embedding",
                          label_col: str = "label", dim: int = 64,
                          scale: int = 1 << 20, n_buckets: int = 8):
    """Pairwise COSINE similarity between label centroids (the class-
    confusability matrix): computed over the QUANTIZED integer sum
    vectors from label_centroids, so the dot products and norms are
    exact Python ints (they overflow int64 — 64 dims of ~1e9 sums),
    and the one float finale ``num / (sqrt(da) · sqrt(db))`` mirrors
    bit-exactly because IEEE sqrt is correctly rounded (unlike ln, no
    libm hazard at all).

    The centroid table is label-count × dim bounded, so the pairing
    runs driver-side on a tiny pivot; vectors never shuffle (one
    combiner pass + one tiny reduce inside label_centroids).

    Output: ``(la, lb, cos)`` for la < lb, cos DOUBLE.
    """
    import math

    cent = label_centroids(ds, vec_col=vec_col, label_col=label_col,
                           dim=dim, scale=scale,
                           n_buckets=n_buckets).to_pandas()
    labs = np.sort(cent["label"].unique())
    piv = {int(lab): np.zeros(dim, dtype=object) for lab in labs}
    for r in cent.itertuples():
        piv[int(r.label)][int(r.d)] = int(r.s)
    la_, lb_, cos_ = [], [], []
    for i in range(len(labs)):
        for j in range(i + 1, len(labs)):
            a, b = piv[int(labs[i])], piv[int(labs[j])]
            num = int(sum(x * y for x, y in zip(a, b)))
            da = int(sum(x * x for x in a))
            db = int(sum(y * y for y in b))
            la_.append(int(labs[i]))
            lb_.append(int(labs[j]))
            cos_.append(float(num)
                        / (math.sqrt(float(da)) * math.sqrt(float(db)))
                        if da and db else None)
    return pa.table({"la": pa.array(la_, pa.int64()),
                     "lb": pa.array(lb_, pa.int64()),
                     "cos": pa.array(cos_, pa.float64())})


def gram_power_iteration(ds, *, vec_col: str = "embedding",
                         dim: int = 64, scale: int = 1 << 16,
                         rounds: int = 6, vscale: int = 1 << 20,
                         n_buckets: int = 8) -> pa.Table:
    """Top PRINCIPAL DIRECTION of the embedding column — integer
    power iteration on the distributed exact Gram matrix (the pagerank
    fixed-point discipline applied to PCA):

        w = S v  (exact Python-int matvec on the d x d integer Gram)
        v <- floor(w * vscale / max|w|)   (max-normalization)

    from v0 = vscale * 1.  Every round is integer-exact, and the
    floor-div of SIGNED ints mirrors in SQL as
    ``(a - (((a % m) + m) % m)) // m`` (nonneg-remainder identity —
    DuckDB's // truncates, Python's floors; the identity makes both
    compute floor).  Finale: the Rayleigh quotient
    eig = (v'Sv / v'v) / scale^2 — one shared float shape, the top
    eigenvalue of the gram matrix.  Output (d, v, eig): the int64
    direction vector (max-normalized to ±vscale) + the eigenvalue
    repeated per row.

    Distributed shape: the ONLY corpus pass is gram_matrix's
    constant-size combiner reduce; the d x d iteration is a bounded
    driver finale (d <= a few hundred)."""
    g = gram_matrix(ds, vec_col=vec_col, dim=dim, scale=scale,
                    n_buckets=n_buckets).to_pandas()
    s_full = [[0] * dim for _ in range(dim)]
    for r in g.itertuples():
        i, j, s = int(r.i), int(r.j), int(r.s)
        s_full[i][j] = s
        s_full[j][i] = s

    def fdiv(a: int, m: int) -> int:
        return (a - (((a % m) + m) % m)) // m

    v = [vscale] * dim
    for _ in range(rounds):
        w = [sum(s_full[i][j] * v[j] for j in range(dim))
             for i in range(dim)]
        m = max(abs(x) for x in w)
        if m == 0:
            break
        v = [fdiv(x * vscale, m) for x in w]

    num = sum(v[i] * s_full[i][j] * v[j]
              for i in range(dim) for j in range(dim))
    den = sum(x * x for x in v)
    eig = (float(num) / float(den) / float(scale * scale)) \
        if den else None
    return pa.table({
        "d": pa.array(list(range(dim)), pa.int64()),
        "v": pa.array(v, pa.int64()),
        "eig": pa.array([eig] * dim, pa.float64()),
    })


def gram_matrix(ds, *, vec_col: str = "embedding", dim: int = 64,
                scale: int = 1 << 16, n_buckets: int = 8):
    """EXACT integer Gram matrix of the quantized embedding column —
    the PCA / whitening / covariance precursor, and the canonical
    combiner-first shape: every block reduces to the SAME d(d+1)/2
    upper-triangle rows (one d x d int64 matmul per block), so the
    all-to-all moves a CONSTANT ~2k rows per block regardless of input
    size; vectors never shuffle.

    Elements quantize to floor(float64(v) * scale) (the label_centroids
    discipline), so cross-block int64 sums commute and the float
    ``gram`` finale is ONE shared shape s / (n * scale^2) — the SQL
    oracle value-checks.  int64 bound: |q| <= scale, so each partial
    product is <= scale^2 and the global sum needs
    rows * scale^2 < 2^63 (2^16 scale -> ~2^30 rows; drop scale for
    bigger corpora).

    Returns (i, j, n, s, gram) for 0 <= i <= j < dim."""
    iu, ju = np.triu_indices(dim)

    def partial(b: pa.Table) -> pa.Table:
        vec = np.stack([np.asarray(v, dtype=np.float64)
                        for v in b.column(vec_col).to_pylist()])
        q = np.floor(vec * float(scale)).astype(np.int64)
        g = q.T @ q
        return pa.table({
            "i": pa.array(iu.astype(np.int64)),
            "j": pa.array(ju.astype(np.int64)),
            "s": pa.array(g[iu, ju]),
            "n": pa.array(np.full(len(iu), len(q), np.int64)),
        })

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["i", "j"], sort=False, as_index=False)[
            ["s", "n"]].sum()
        den = out["n"].to_numpy().astype(np.float64) \
            * float(scale) * float(scale)
        out["gram"] = out["s"].to_numpy().astype(np.float64) / den
        return out[["i", "j", "n", "s", "gram"]]

    return bucketed_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["i", "j"], combine, n_buckets=n_buckets)


SIL_SCALE = 1 << 12   # (b2-a2)*SIL_SCALE must stay < 2^63: dists are
#                       <= dim * (2*2^20)^2 ~ 2^48, so 2^12 is the
#                       largest safe quantizer with headroom.


def silhouette_score(ds, *, id_col: str = "vec_id",
                     vec_col: str = "embedding", k: int = 8,
                     iters: int = 2, scale: int = SIL_SCALE,
                     n_buckets: int = 8):
    """SIMPLIFIED SILHOUETTE (centroid-based, squared-distance
    variant) of the k-means clustering — the clustering-quality
    companion of cluster_purity that needs no ground truth: per
    point, with a2 = ||q − c_own||² and b2 = min over OTHER centroids,

        s_q = floor((b2 − a2)·scale / max(a2, b2, 1))

    an exact integer in [−scale, scale] (floor-div mirrors in SQL via
    the nonneg-remainder identity); per-cluster sil = Σs_q/(n·scale)
    is the ONE float shape.  Same Lloyd scans as kmeans_assign; the
    silhouette pass recomputes the assignment inline against the
    final centroids, so everything is ONE extra streaming pass plus a
    k-row reduce — vectors never shuffle.
    Returns (cluster, n, s_sum, sil)."""
    import pandas as pd

    from .bucketed import bucketed_groupby

    cents = seed_centroids(ds, id_col=id_col, vec_col=vec_col, k=k)
    for _ in range(iters):
        cents = lloyd_iterate(ds, cents, vec_col=vec_col)

    def partial(b: pa.Table) -> pa.Table:
        q = _quant_matrix(b, vec_col)
        n = q.shape[0]
        dists = np.empty((n, cents.shape[0]), np.int64)
        for c in range(cents.shape[0]):
            d = q - cents[c]
            dists[:, c] = np.einsum("ij,ij->i", d, d)
        own = np.argmin(dists, axis=1)   # first min = smallest cluster
        rows = np.arange(n)
        a2 = dists[rows, own]
        masked = dists.copy()
        masked[rows, own] = np.iinfo(np.int64).max
        b2 = masked.min(axis=1)
        den = np.maximum(np.maximum(a2, b2), 1)
        s_q = ((b2 - a2) * scale) // den
        df = pd.DataFrame({"cluster": own, "n": np.ones(n, np.int64),
                           "s_sum": s_q})
        g = df.groupby("cluster", sort=False, as_index=False).sum()
        return pa.Table.from_pandas(
            g, preserve_index=False).replace_schema_metadata(None)

    parts = ds.map_batches(partial, batch_format="pyarrow")
    fscale = float(scale)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("cluster", as_index=False)[["n", "s_sum"]].sum()
        out["sil"] = np.array(
            [float(int(s)) / (float(int(n)) * fscale)
             for s, n in zip(out["s_sum"], out["n"])], np.float64)
        return out

    return bucketed_groupby(parts, ["cluster"], fold,
                            n_buckets=n_buckets)


def knn_confusion(ds, *, id_col: str = "vec_id",
                  vec_col: str = "embedding", label_col: str = "label",
                  k: int = 5, train_parity: int = 0):
    """kNN CLASSIFIER evaluation as dataflow — the nonparametric
    sibling of scoring.naive_bayes_confusion: the ``train_parity``
    half of ids is the broadcast reference set, the other half is
    classified by MAJORITY label among its k nearest train vectors
    (exact integer quantized L2, distance ties → smaller id, vote
    ties → smaller label), and the confusion matrix comes back.

    Same scale contract as knn_label_agreement: the train side
    broadcasts once via ``ray.put`` (eval-set shape — swap in the
    IVF/LSH candidates from stages/ann for corpus-scale); the test
    side streams, nothing shuffles but the classes² confusion
    partials.  Returns (true_label, pred_label, n)."""
    import pandas as pd
    import ray

    from .bucketed import bucketed_groupby

    def half(parity):
        def fn(b: pa.Table) -> pa.Table:
            ids = b.column(id_col).to_numpy(zero_copy_only=False)
            return b.filter(pa.array(ids % 2 == parity))

        return fn

    train = ds.map_batches(half(train_parity),
                           batch_format="pyarrow").to_pandas()
    ids_r = train[id_col].to_numpy().astype(np.int64)
    lab_r = train[label_col].to_numpy().astype(np.int64)
    mat = np.stack([np.asarray(v, dtype=np.float64)
                    for v in train[vec_col]])
    q_r = (np.floor(mat * float(1 << SCALE_BITS)).astype(np.int64)
           + _OFF)
    order = np.argsort(ids_r, kind="stable")
    ids_r, lab_r, q_r = ids_r[order], lab_r[order], q_r[order]
    ref = ray.put((ids_r, lab_r, q_r)) if ray.is_initialized() \
        else (ids_r, lab_r, q_r)

    def fn(b: pa.Table, _ref=ref) -> pa.Table:
        from .graph import _get_blob

        idr, lbr, qr = _ref if isinstance(_ref, tuple) \
            else _get_blob(_ref)
        q = _quant_matrix(b, vec_col)
        lab = b.column(label_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n, m = len(lab), len(idr)
        kk = min(k, m)
        pred = np.zeros(n, dtype=np.int64)
        for lo in range(0, n, 256):
            hi = min(lo + 256, n)
            d = np.zeros((hi - lo, m), dtype=np.int64)
            for c in range(q.shape[1]):
                diff = q[lo:hi, c:c + 1] - qr[:, c][None, :]
                d += diff * diff
            # idr sorted ascending -> stable argsort ties to smaller id
            part = np.argsort(d, axis=1, kind="stable")[:, :kk]
            neigh = lbr[part]                      # (rows, kk)
            for r in range(hi - lo):
                vals, cnts = np.unique(neigh[r], return_counts=True)
                # majority; ties -> smallest label (np.unique sorts
                # vals ascending, argmax takes the first max)
                pred[lo + r] = vals[np.argmax(cnts)]
        df = pd.DataFrame({"true_label": lab, "pred_label": pred})
        g = df.groupby(["true_label", "pred_label"], sort=False,
                       as_index=False).size()
        return pa.table({
            "true_label": pa.array(g["true_label"].to_numpy(),
                                   pa.int64()),
            "pred_label": pa.array(g["pred_label"].to_numpy(),
                                   pa.int64()),
            "n": pa.array(g["size"].to_numpy().astype(np.int64))})

    parts = ds.map_batches(half(1 - train_parity),
                           batch_format="pyarrow").map_batches(
        fn, batch_format="pyarrow")
    return bucketed_groupby(
        parts, ["true_label", "pred_label"],
        lambda g: g.groupby(["true_label", "pred_label"],
                            as_index=False)["n"].sum(),
        n_buckets=4)
