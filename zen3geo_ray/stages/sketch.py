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
_ALPHA = 0.7213 / (1 + 1.079 / M)


def hll_from_hashes(h: np.ndarray) -> np.ndarray:
    """uint64 hashes -> (M,) uint8 register array."""
    idx = (h >> np.uint64(64 - P)).astype(np.int64)
    rest = h << np.uint64(P)
    # rank = leading zeros of the remaining 64-P bits, +1 (cap at 64-P+1)
    lz = np.full(len(h), 64 - P, dtype=np.int64)
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
    rank = np.minimum(lz, 64 - P) + 1
    regs = np.zeros(M, dtype=np.uint8)
    np.maximum.at(regs, idx, rank.astype(np.uint8))
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    regs = regs.astype(np.float64)
    est = _ALPHA * M * M / np.sum(2.0 ** (-regs))
    zeros = np.count_nonzero(regs == 0)
    if est <= 2.5 * M and zeros:
        return M * np.log(M / zeros)  # linear counting
    return est


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def approx_distinct(ds, key_cols: list[str], value_col: str):
    """groupby(key) -> approximate distinct count of value_col.

    Partial: one HLL register blob per (key, batch); final: OR-merge per
    key + estimate.  Shuffle volume = |keys per batch| x 4 KiB.
    """
    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(value_col).to_numpy(zero_copy_only=False)
        h = splitmix64(vals.astype(np.uint64) + np.uint64(0x9E37))
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
            blobs.append(hll_from_hashes(g["_h"].to_numpy()).tobytes())
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
            regs = np.zeros(M, dtype=np.uint8)
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
