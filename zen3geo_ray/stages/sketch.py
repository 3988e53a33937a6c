"""Mergeable sketches: HyperLogLog distinct-count (approximate path).

The exact distinct path is queries.q_distinct_users (pair-dedup); at
100 TB a per-cell distinct over billions of keys wants a sketch: one
HLL per (key, batch) emitted from map_batches, OR-merged in a tiny
groupby — the classic partial→final sketch plan (sketches are designed
to be mergeable, so the shuffle moves 2^P-byte registers, not keys).

Standard HLL (Flajolet et al.) with P-bit register index + linear
counting for the small range.  Verified in tests against exact counts
within the ~1.04/sqrt(2^P) error envelope (no SQL oracle — the driver's
rows-only check applies if exposed as a query).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import splitmix64

P = 12  # 4096 registers; relative error ~1.6%
M = 1 << P


def hll_from_hashes(h: np.ndarray, p: int = P) -> np.ndarray:
    """uint64 hashes -> (2^p,) uint8 register array."""
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    with np.errstate(over="ignore"):
        rest = h << np.uint64(p)
    # rank = leading zeros of the remaining 64-p bits, +1 (cap at 64-p+1)
    lz = np.full(len(h), 64 - p, dtype=np.int64)
    nonzero = rest != 0
    # leading zero count via float64 exponent trick is lossy; use bit loop
    v = rest[nonzero]
    lzv = np.zeros(len(v), dtype=np.int64)
    shift = 32
    with np.errstate(over="ignore"):
        while shift:
            mask = (v >> np.uint64(64 - shift)) == 0
            lzv[mask] += shift
            v = np.where(mask, v << np.uint64(shift), v)
            shift //= 2
    lz[nonzero] = lzv
    rank = np.minimum(lz, 64 - p) + 1
    regs = np.zeros(1 << p, dtype=np.uint8)
    np.maximum.at(regs, idx, rank.astype(np.uint8))
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """HLL estimate with an EXACT-RATIONAL harmonic denominator: the
    2^-reg terms sum as python integers scaled by 2^R (R = max rank),
    so the float result is ONE shared expression shape over two exact
    integers — deterministic and SQL-value-checkable (the bm25
    discipline); a float accumulation would depend on summation
    order."""
    import math

    m = len(regs)
    p = m.bit_length() - 1
    rr = 64 - p + 1
    vals, cnts = np.unique(regs, return_counts=True)
    num = sum(int(c) << (rr - int(v)) for v, c in zip(vals, cnts))
    zeros = int(np.count_nonzero(regs == 0))
    mf = float(m)
    est = (0.7213 / (1.0 + 1.079 / mf)) * mf * mf \
        * float(1 << rr) / float(num)
    if est <= 2.5 * mf and zeros:
        return mf * math.log(mf / float(zeros))  # linear counting
    return est


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def approx_distinct(ds, key_cols: list[str], value_col: str,
                    p: int = P, hasher=splitmix64):
    """groupby(key) -> approximate distinct count of value_col.

    Partial: one HLL register blob per (key, batch); final: OR-merge per
    key + estimate.  Shuffle volume = |keys per batch| x 2^p bytes.
    ``hasher=mulrot64`` (functions/hashing.py) makes the whole pipeline
    SQL-mirrorable — the ``approx_users`` oracle value-checks the float
    estimates; the splitmix64 default cannot be mirrored (its
    multipliers overflow DuckDB INT128).
    """
    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(value_col).to_numpy(zero_copy_only=False)
        h = hasher(vals.astype(np.uint64) + np.uint64(0x9E37))
        keys = [batch.column(c).to_numpy(zero_copy_only=False) for c in key_cols]
        import pandas as pd

        df = pd.DataFrame({c: k for c, k in zip(key_cols, keys)})
        df["_h"] = h
        rows = {c: [] for c in key_cols}
        blobs = []
        for kv, g in df.groupby(key_cols, sort=False):
            if not isinstance(kv, tuple):
                kv = (kv,)
            for c, v in zip(key_cols, kv):
                rows[c].append(v)
            blobs.append(hll_from_hashes(g["_h"].to_numpy(), p).tobytes())
        out = {c: pa.array(rows[c]) for c in key_cols}
        out["hll"] = pa.array(blobs, pa.binary())
        return pa.table(out)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pa.Table:
        out_keys = {c: [] for c in key_cols}
        ests = []
        for kv, grp in g.groupby(key_cols, sort=False):
            if not isinstance(kv, tuple):
                kv = (kv,)
            regs = np.zeros(1 << p, dtype=np.uint8)
            for blob in grp["hll"]:
                regs = hll_merge(regs, np.frombuffer(blob, dtype=np.uint8))
            for c, v in zip(key_cols, kv):
                out_keys[c].append(v)
            ests.append(hll_estimate(regs))
        cols = {c: pa.array(out_keys[c]) for c in key_cols}
        cols["approx_distinct"] = pa.array(np.asarray(ests), pa.float64())
        return pa.table(cols)

    from .bucketed import bucketed_groupby

    return bucketed_groupby(partials, key_cols, lambda g: merge(g).to_pandas())


def hll_overlap(ds, key_col: str, value_col: str,
                p: int = P, hasher=splitmix64):
    """HLL SET-OPERATION estimates between every pair of keys — the
    audience-overlap panel: for key pair (a < b), approximate |A|, |B|,
    |A ∪ B| (register-wise MAX merge — exact over the sketches, the
    defining HLL property) and |A ∩ B| by inclusion-exclusion.

    Per-key register blobs come from the same partial→merge plan as
    ``approx_distinct``; the K merged blobs (K = distinct keys, small
    by contract — event types, sources, languages) are driver-collected
    and the K²/2 pair combines are numpy maxima.  Floats follow the
    ``hll_estimate`` exact-rational discipline, so with
    ``hasher=mulrot64`` every column value-checks against the SQL
    mirror; intersect = (a + b) - union, one shared left-assoc shape.

    Returns (key_a, key_b, a_distinct, b_distinct, union_distinct,
    intersect_distinct)."""
    import ray.data as rd

    from .bucketed import bucketed_groupby

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(value_col).to_numpy(zero_copy_only=False)
        h = hasher(vals.astype(np.uint64) + np.uint64(0x9E37))
        df = pd.DataFrame({key_col: batch.column(key_col).to_numpy(
            zero_copy_only=False)})
        df["_h"] = h
        keys, blobs = [], []
        for kv, g in df.groupby(key_col, sort=False):
            keys.append(kv)
            blobs.append(hll_from_hashes(g["_h"].to_numpy(), p).tobytes())
        return pa.table({key_col: pa.array(keys),
                         "hll": pa.array(blobs, pa.binary())})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        keys, blobs = [], []
        for kv, grp in g.groupby(key_col, sort=False):
            regs = np.zeros(1 << p, dtype=np.uint8)
            for blob in grp["hll"]:
                regs = hll_merge(regs, np.frombuffer(blob, dtype=np.uint8))
            keys.append(kv)
            blobs.append(regs.tobytes())
        return pd.DataFrame({key_col: keys, "hll": blobs})

    per_key = bucketed_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        [key_col], merge).to_pandas()
    per_key = per_key.sort_values(key_col, kind="mergesort")
    ks = per_key[key_col].tolist()
    regs = [np.frombuffer(b, dtype=np.uint8) for b in per_key["hll"]]
    ests = [hll_estimate(r) for r in regs]

    ka, kb, ea, eb, eu, ei = [], [], [], [], [], []
    for i in range(len(ks)):
        for j in range(i + 1, len(ks)):
            u = hll_estimate(hll_merge(regs[i], regs[j]))
            ka.append(ks[i])
            kb.append(ks[j])
            ea.append(ests[i])
            eb.append(ests[j])
            eu.append(u)
            ei.append(ests[i] + ests[j] - u)
    return rd.from_arrow(pa.table({
        "key_a": pa.array(ka), "key_b": pa.array(kb),
        "a_distinct": pa.array(ea, pa.float64()),
        "b_distinct": pa.array(eb, pa.float64()),
        "union_distinct": pa.array(eu, pa.float64()),
        "intersect_distinct": pa.array(ei, pa.float64())}))


# --- count-min sketch -------------------------------------------------------

#: row seeds for the CMS hash lanes (value + seed -> mulrot64); spaced
#: arbitrary constants, mirrored verbatim by the ``cms_users`` oracle.
CMS_SEEDS = (40503, 122404, 204305, 286206)


def cms_from_values(vals: np.ndarray, d: int, w_bits: int) -> np.ndarray:
    """(d, 2^w_bits) int64 counters for one value batch: lane r indexes
    by the top w_bits of mulrot64(v + seed_r).  Pure integer — the SQL
    oracle recomputes every counter exactly."""
    from ..functions.hashing import mulrot64

    w = 1 << w_bits
    out = np.zeros((d, w), dtype=np.int64)
    u = vals.astype(np.uint64)
    for r in range(d):
        idx = (mulrot64(u + np.uint64(CMS_SEEDS[r]))
               >> np.uint64(64 - w_bits)).astype(np.int64)
        out[r] = np.bincount(idx, minlength=w)
    return out


def count_min(ds, value_col: str, *, d: int = 4,
              w_bits: int = 10) -> np.ndarray:
    """Global count-min sketch of a column (Cormode & Muthukrishnan):
    each block folds into ONE d x 2^w_bits counter blob (32 KiB at the
    defaults), a single-block finale sums them elementwise — counter
    addition is exact and commutative, so the merged sketch is
    independent of block boundaries.  Shuffle volume = #blocks x 32 KiB
    regardless of row count; the sketch itself is driver-sized."""
    w = 1 << w_bits

    def partial(b: pa.Table) -> pa.Table:
        vals = b.column(value_col).to_numpy(zero_copy_only=False)
        blob = cms_from_values(vals, d, w_bits).tobytes()
        return pa.table({"cms": pa.array([blob], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").repartition(1)

    def fin(b: pa.Table) -> pa.Table:
        tot = np.zeros(d * w, dtype=np.int64)
        for blob in b.column("cms").to_pylist():
            tot += np.frombuffer(blob, dtype=np.int64)
        return pa.table({"cms": pa.array([tot.tobytes()], pa.binary())})

    out = parts.map_batches(fin, batch_format="pyarrow").to_pandas()
    if len(out) == 0:
        return np.zeros((d, w), dtype=np.int64)
    return np.frombuffer(out["cms"][0],
                         dtype=np.int64).reshape(d, w).copy()


def cms_estimate(cms: np.ndarray, vals: np.ndarray,
                 w_bits: int) -> np.ndarray:
    """Point-frequency estimates: min over lanes of the value's counter
    (never underestimates; overestimate bounded by collisions)."""
    from ..functions.hashing import mulrot64

    u = vals.astype(np.uint64)
    est = None
    for r in range(cms.shape[0]):
        idx = (mulrot64(u + np.uint64(CMS_SEEDS[r]))
               >> np.uint64(64 - w_bits)).astype(np.int64)
        e = cms[r][idx]
        est = e if est is None else np.minimum(est, e)
    return est.astype(np.int64)


# --- approximate heavy hitters (space-saving-style block summaries) --------


def topk_block_summary(batch: pa.Table, key_col: str,
                       capacity: int) -> pa.Table:
    """Per-block heavy-hitter partial: exact within-block counts,
    truncated to the ``capacity`` most frequent keys; ``thr`` = the
    largest DROPPED count (0 when nothing dropped — then the block
    summary is exact).  One extra META row (is_meta=1) per block carries
    the block's threshold to the merge."""
    keys = batch.column(key_col)
    counts = pa.table({key_col: keys}).group_by(key_col).aggregate(
        [(key_col, "count")]
    )
    cnt = counts.column(f"{key_col}_count").to_numpy(zero_copy_only=False)
    order = np.argsort(-cnt, kind="stable")
    kept = order[:capacity]
    thr = int(cnt[order[capacity]]) if len(order) > capacity else 0
    n = len(kept)
    kept_keys = counts.column(key_col).take(pa.array(kept))
    key_type = kept_keys.type
    return pa.table({
        key_col: pa.concat_arrays(
            [kept_keys.combine_chunks(), pa.nulls(1, key_type)]
        ),
        "cnt": pa.array(np.concatenate([cnt[kept], [0]]), pa.int64()),
        "thr": pa.array(
            np.concatenate([np.full(n, thr, dtype=np.int64), [thr]]),
            pa.int64(),
        ),
        "is_meta": pa.array(
            np.concatenate([np.zeros(n, dtype=np.int8), [1]]), pa.int8()
        ),
    })


def approx_top_k(ds, key_col: str, k: int, capacity: int = 4096,
                 n_buckets: int = 64):
    """Distributed approximate top-k by count with DETERMINISTIC bounds.

    Per-block summaries keep only ``capacity`` counters (bounded state —
    the space-saving shape: at 100 TB the distinct-key set never
    materializes); the merge derives, for every surviving key,
    ``n_lo`` = sum of its present counts (a LOWER bound on the true
    count) and ``n_hi`` = n_lo + sum of the thresholds of blocks where
    the key was truncated (an UPPER bound).  Top-k is taken by ``n_hi``
    (desc, key asc) — a superset guarantee: any key whose true count
    beats the k-th upper bound is present.  When ``capacity`` >= the
    per-block distinct-key count every thr is 0, n_lo == n_hi == exact,
    and the result equals the exact GROUP BY top-k (the oracle case).
    """
    import pyarrow.compute as pc

    from .bucketed import bucketed_groupby

    parts = ds.map_batches(
        lambda b: topk_block_summary(b, key_col, capacity),
        batch_format="pyarrow",
    ).materialize()  # bounded: blocks x capacity rows; consumed twice
    # total threshold over blocks: sum of the one meta row per block
    meta = parts.map_batches(
        lambda b: b.filter(pc.equal(b.column("is_meta"), pa.scalar(1, pa.int8()))),
        batch_format="pyarrow",
    )
    thr_total = int(meta.sum("thr") or 0)
    data = parts.map_batches(
        lambda b: b.filter(
            pc.equal(b.column("is_meta"), pa.scalar(0, pa.int8()))
        ).drop_columns(["is_meta"]),
        batch_format="pyarrow",
    )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(key_col, sort=False).agg(
            n_lo=("cnt", "sum"), thr_present=("thr", "sum")
        ).reset_index()
        agg["n_hi"] = agg["n_lo"] + (thr_total - agg["thr_present"])
        return agg[[key_col, "n_lo", "n_hi"]]

    merged = bucketed_groupby(data, [key_col], combine, n_buckets=n_buckets)

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_hi", key_col], ascending=[False, True],
                          kind="mergesort").head(k)
        return g

    # final top-k over the (bounded) merged summary
    out = merged.map_batches(
        lambda b: pa.Table.from_pandas(
            topk(b.to_pandas()), preserve_index=False
        ),
        batch_format="pyarrow",
    ).repartition(1)
    return out.map_batches(
        lambda b: pa.Table.from_pandas(
            topk(b.to_pandas()), preserve_index=False
        ),
        batch_format="pyarrow",
    )


# --- mergeable quantile sketch (deterministic compactor stack) ------------
#
# The approximate sibling of zonal.grouped_quantiles: the exact path
# shuffles one row per DISTINCT (key, value) — bounded by the value
# domain — which is the right plan for integer cents but not for
# high-cardinality doubles at 100 TB.  This sketch is the classic
# Munro-Paterson / KLL compactor stack made DETERMINISTIC (alternate
# elements of a sorted buffer, no randomness) so that it carries an
# EXACT self-reported worst-case rank-error bound:
#
#   * level h holds sorted items of weight 2^h;
#   * compacting a sorted run of m items at level h promotes every
#     second item (1-based even positions) to level h+1 and keeps the
#     odd leftover; for ANY threshold t the weighted count of items < t
#     changes by at most 2^h — so the sketch's ``err`` accumulator,
#     incremented by 2^h per compaction op, is a guaranteed bound on
#     |estimated rank - true rank| for every quantile query;
#   * merge = per-level concatenation + the same compaction pass, and
#     the bounds ADD — mergeability is what makes it a one-shuffle
#     distributed plan (fixed-size binary rows move, never values).
#
# With capacity c the sketch holds <= c*log2(N/c) items and err <=
# ~2N/c, i.e. a 512-capacity sketch answers any quantile of a billion
# rows within 0.4% rank error from a few KiB of state.


class QuantileSketch:
    """Deterministic mergeable rank sketch over float64 values.

    ``err`` is an exact accumulated upper bound on the absolute rank
    error of any quantile estimate; ``n`` is the exact total weight
    (compaction preserves weight, odd leftovers stay at their level).
    """

    __slots__ = ("capacity", "levels", "err", "n")

    def __init__(self, capacity: int = 512):
        self.capacity = int(capacity)
        self.levels: list[np.ndarray] = []
        self.err = 0
        self.n = 0

    @classmethod
    def from_values(cls, values: np.ndarray, capacity: int = 512) -> "QuantileSketch":
        sk = cls(capacity)
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v):
            sk.levels = [np.sort(v)]
            sk.n = len(v)
            sk._compact()
        return sk

    def _compact(self) -> None:
        h = 0
        while h < len(self.levels):
            arr = self.levels[h]
            if len(arr) > self.capacity:
                # whole-level compaction: one op, error 2^h, regardless
                # of m — cheaper in error than repeated small compactions
                m = len(arr) & ~1  # even prefix
                promoted = arr[1:m:2]
                self.levels[h] = arr[m:]  # odd leftover (or empty)
                if h + 1 == len(self.levels):
                    self.levels.append(promoted)
                else:
                    lv = self.levels[h + 1]
                    self.levels[h + 1] = np.sort(np.concatenate([lv, promoted])) if len(lv) else promoted
                self.err += 1 << h
            h += 1

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        assert other.capacity == self.capacity
        for h, arr in enumerate(other.levels):
            if not len(arr):
                continue
            if h == len(self.levels):
                self.levels.append(arr)
            else:
                lv = self.levels[h]
                self.levels[h] = np.sort(np.concatenate([lv, arr])) if len(lv) else arr
        self.err += other.err
        self.n += other.n
        self._compact()
        return self

    def _flat(self):
        vals = [a for a in self.levels if len(a)]
        if not vals:
            return np.empty(0), np.empty(0, dtype=np.int64)
        w = np.concatenate([
            np.full(len(a), 1 << h, dtype=np.int64)
            for h, a in enumerate(self.levels) if len(a)
        ])
        v = np.concatenate(vals)
        order = np.argsort(v, kind="mergesort")
        return v[order], w[order]

    def query(self, qs) -> np.ndarray:
        """quantile_disc-style: smallest item whose cumulative weight
        reaches ceil(q * n) (clamped to >= 1)."""
        v, w = self._flat()
        if not len(v):
            return np.full(len(qs), np.nan)
        cum = np.cumsum(w)
        out = np.empty(len(qs))
        for i, q in enumerate(qs):
            k = max(int(np.ceil(q * self.n)), 1)
            out[i] = v[min(int(np.searchsorted(cum, k)), len(v) - 1)]
        return out

    # fixed-width serialization: the shuffle row payload
    def to_bytes(self) -> bytes:
        lens = np.array([len(a) for a in self.levels], dtype=np.int64)
        head = np.array([self.capacity, len(lens), self.err, self.n],
                        dtype=np.int64)
        body = (np.concatenate([a for a in self.levels if len(a)])
                if lens.sum() else np.empty(0))
        return head.tobytes() + lens.tobytes() + body.astype(np.float64).tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "QuantileSketch":
        head = np.frombuffer(b, dtype=np.int64, count=4)
        sk = cls(int(head[0]))
        nlev = int(head[1])
        sk.err = int(head[2])
        sk.n = int(head[3])
        lens = np.frombuffer(b, dtype=np.int64, count=nlev, offset=32)
        body = np.frombuffer(b, dtype=np.float64, offset=32 + 8 * nlev)
        off = 0
        for ln in lens:
            sk.levels.append(body[off:off + int(ln)].copy())
            off += int(ln)
        return sk


def grouped_approx_quantiles(ds, key_cols: list[str], value_col: str,
                             qs: list[float], capacity: int = 512,
                             n_buckets: int = 32):
    """groupby(key) -> approximate quantiles via mergeable sketches.

    Partial: one serialized sketch row per (key, batch); final: per-key
    merge + query.  Shuffle volume = |keys per batch| x O(capacity *
    log(batch/capacity)) bytes — value cardinality never matters, the
    plan that replaces grouped_quantiles when values are continuous.
    Output: key cols + p{q} estimate cols + ``n`` (exact) + ``err``
    (guaranteed rank-error bound of every estimate).
    """
    from .bucketed import bucketed_groupby

    labels = [f"p{int(round(q * 100))}" for q in qs]

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({c: batch.column(c).to_numpy(zero_copy_only=False)
                           for c in key_cols})
        df["_v"] = batch.column(value_col).to_numpy(zero_copy_only=False)
        rows = {c: [] for c in key_cols}
        blobs = []
        for key, grp in df.groupby(key_cols, sort=False):
            key = key if isinstance(key, tuple) else (key,)
            for c, kv in zip(key_cols, key):
                rows[c].append(kv)
            blobs.append(QuantileSketch.from_values(
                grp["_v"].to_numpy(), capacity).to_bytes())
        t = pa.table({c: pa.array(v) for c, v in rows.items()})
        return t.append_column("_sk", pa.array(blobs, pa.binary()))

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out_rows = []
        for key, grp in g.groupby(key_cols, sort=False):
            key = key if isinstance(key, tuple) else (key,)
            sk = None
            for b in grp["_sk"]:
                s = QuantileSketch.from_bytes(b)
                sk = s if sk is None else sk.merge(s)
            est = sk.query(qs)
            row = dict(zip(key_cols, key))
            row.update({lab: float(e) for lab, e in zip(labels, est)})
            row["n"] = sk.n
            row["err"] = sk.err
            out_rows.append(row)
        return pd.DataFrame(out_rows)

    return bucketed_groupby(parts, key_cols, merge, n_buckets=n_buckets)


# --- k-minimum-values distinct sketch --------------------------------------


def kmv_distinct(ds, key_cols: list[str], value_col: str,
                 k: int = 64, hasher=splitmix64):
    """groupby(key) -> KMV (k-minimum-values, Bar-Yossef et al. 2002)
    distinct estimate of ``value_col``: keep the k smallest DISTINCT
    64-bit hash values per key; with a full sketch the estimator is
    (k-1) * 2^64 / h_(k), with fewer than k hashes the count is exact.

    Partial: per (key, block) the k smallest unique hashes as ONE
    fixed-bound binary blob (<= 8k bytes) — the shuffle moves blobs,
    never raw values; final: merge-unique-truncate per key (min-k is
    mergeable by construction).  ``hasher=mulrot64`` makes every column
    SQL-mirrorable (the ``kmv`` oracle VALUE-checks est/kth — uint64
    order equals nonneg HUGEINT order, and both sides share the one
    float division); the splitmix64 default cannot be mirrored.

    Returns (key_cols..., n_kept, kth, est): kth = the k-th smallest
    hash as an exactly-cast DOUBLE (uint64 exceeds int64), est the
    distinct-count estimate."""
    ksmall = int(k)

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(value_col).to_numpy(zero_copy_only=False)
        h = hasher(vals.astype(np.uint64) + np.uint64(0x9E37))
        df = pd.DataFrame({c: batch.column(c).to_numpy(zero_copy_only=False)
                           for c in key_cols})
        df["_h"] = h
        keys = {c: [] for c in key_cols}
        blobs = []
        for kv, g in df.groupby(key_cols, sort=False):
            if not isinstance(kv, tuple):
                kv = (kv,)
            hs = np.unique(g["_h"].to_numpy())[:ksmall]  # sorted ascending
            for c, v in zip(key_cols, kv):
                keys[c].append(v)
            blobs.append(hs.tobytes())
        out = {c: pa.array(keys[c]) for c in key_cols}
        out["kmv"] = pa.array(blobs, pa.binary())
        return pa.table(out)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        keys = {c: [] for c in key_cols}
        n_kept, kth, est = [], [], []
        for kv, grp in g.groupby(key_cols, sort=False):
            if not isinstance(kv, tuple):
                kv = (kv,)
            hs = np.unique(np.concatenate(
                [np.frombuffer(b, dtype=np.uint64) for b in grp["kmv"]]
            ))[:ksmall]
            for c, v in zip(key_cols, kv):
                keys[c].append(v)
            n = int(len(hs))
            n_kept.append(n)
            hk = int(hs[-1]) if n else 0
            kth.append(float(hk) if n else None)
            if n == ksmall and hk > 0:
                est.append(float((ksmall - 1) << 64) / float(hk))
            else:
                est.append(float(n))
        out = {c: keys[c] for c in key_cols}
        out["n_kept"] = np.asarray(n_kept, dtype=np.int64)
        out["kth"] = np.asarray(kth, dtype=np.float64)
        out["est"] = np.asarray(est, dtype=np.float64)
        return pd.DataFrame(out)

    from .bucketed import bucketed_groupby

    return bucketed_groupby(partials, key_cols, fold)


def ams_f2(ds, value_col: str, *, lanes: int = 32, groups: int = 4,
           n_buckets: int = 16):
    """AMS second-frequency-moment sketch (Alon–Matias–Szegedy '96)
    beside the exact F2 = SUM(f_v^2) of a key column — one row
    ``(f2_exact, f2_est)``.

    Signs come from the bits of one :func:`mulrot63` hash per distinct
    key (bijective below 2^63, so distinct keys get distinct sign
    rows); lane sums S_l = SUM_v sign_l(v) * f_v decompose over key
    buckets, so ONE bucketed shuffle of per-block partial counts feeds
    both the exact F2 (``_exact_dot`` guard) and a ``lanes``-int64 blob
    per bucket.  The finale is median-of-means over ``groups`` groups,
    all integer (floor-div mean, middle-two median) so the DuckDB
    oracle matches bit-exactly.  Estimator variance is the classic
    2*F2^2/per_group bound; at the defaults (8 lanes x 4 groups) the
    median is within ~sqrt(2/8)*F2 of truth w.h.p. — the value of the
    sketch is the CONSTANT-size mergeable state (256 B/bucket), the
    same contract as count_min/hll above."""
    import pandas as pd

    from ..functions.hashing import mulrot63
    from .bucketed import bucketed_groupby
    from .spatial_stats import _exact_dot, _isum

    per = lanes // groups
    if per * groups != lanes:
        raise ValueError("lanes must be a multiple of groups")

    def partial(b: pa.Table) -> pa.Table:
        v = b.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        u, c = np.unique(v, return_counts=True)
        return pa.table({"u": pa.array(u),
                         "c": pa.array(c.astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def fold(g: "pd.DataFrame") -> "pd.DataFrame":
        tot = g.groupby("u", sort=False)["c"].sum()
        f = tot.to_numpy().astype(np.int64)
        users = tot.index.to_numpy().astype(np.int64)
        h = mulrot63(users.astype(np.uint64))
        s = np.zeros(lanes, dtype=np.int64)
        for lane in range(lanes):   # per-lane 1-D passes (CLAUDE.md)
            sign = (((h >> np.uint64(lane)) & np.uint64(1)).astype(
                np.int64) * 2 - 1)
            s[lane] = _exact_dot(sign, f)
        return pd.DataFrame({"sq": [_exact_dot(f, f)],
                             "lanes": [s.tobytes()]})

    bucketed = bucketed_groupby(parts, ["u"], fold, n_buckets)

    def fin(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({"f2_exact": pa.array([0], pa.int64()),
                             "f2_est": pa.array([0], pa.int64())})
        sq = _isum(b.column("sq").to_numpy(zero_copy_only=False))
        tot = np.zeros(lanes, dtype=np.int64)
        for blob in b.column("lanes").to_pylist():
            tot += np.frombuffer(blob, dtype=np.int64)
        means = sorted(
            _exact_dot(tot[i * per:(i + 1) * per],
                       tot[i * per:(i + 1) * per]) // per
            for i in range(groups))
        mid = groups // 2
        est = (means[mid] if groups % 2 == 1
               else (means[mid - 1] + means[mid]) // 2)
        return pa.table({"f2_exact": pa.array([sq], pa.int64()),
                         "f2_est": pa.array([int(est)], pa.int64())})

    return bucketed.repartition(1).map_batches(
        fin, batch_format="pyarrow", batch_size=None)
