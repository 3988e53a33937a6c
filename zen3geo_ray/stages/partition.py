"""Explicit partitioning & skew handling (north-star: "cell-key range
partitioning plus salted shuffles to break hot-cell skew").

Three tools, used by increasing cost:

1. **Combiner-first** (stages/zonal.py) — for associative aggregates the
   per-batch partial bound per-key shuffle volume to |blocks|; hot cells
   stop mattering.  Always prefer this.
2. **Salted two-level reduce** (here) — for reduces that are mergeable
   but too heavy per batch (big per-key state): group on (key, salt)
   where salt = hash(row) % S, reduce partials, then a second tiny
   groupby on key merges.  S is chosen from a driver-side key histogram
   (``choose_salt``).
3. **Range partition by Morton cell** (here) — for sorted/clustered
   output layouts: sample Morton keys → cut points → repartition so each
   output partition covers a contiguous space-filling-curve range
   (locality for downstream range scans), written resumably via
   state/lineage.py keyed on the coarse cell.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import knuth_hash
from ..geom import cells


def choose_salt(ds, key_col: str, target_rows_per_group: int = 100_000) -> int:
    """Pick a salt factor S such that the hottest key's rows split into
    ~target-sized partial groups.

    The hottest-key count is EXACT, not sampled: a combiner-first count
    (per-batch ``np.unique`` partials, one coarse-bucket sum) feeds a
    scalar ``Dataset.max`` — at most one row per (key, batch) shuffles
    and no key table ever reaches the driver.  (The previous
    ``limit()``-prefix sample under-counted hot keys on any clustered
    input — the same order bias fixed in the ANN tuner and the Morton
    boundary sampler.)"""
    from .bucketed import bucketed_groupby

    def partial(b: pa.Table) -> pa.Table:
        col = b.column(key_col)
        vals, counts = np.unique(
            col.to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table({key_col: pa.array(vals),
                         "_c": pa.array(counts.astype(np.int64))})

    counts = bucketed_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        [key_col],
        lambda g: g.groupby(key_col, sort=False, as_index=False)["_c"].sum(),
    )
    hottest = counts.max("_c")
    if hottest is None:
        return 1
    return max(1, min(256, -(-int(hottest) // target_rows_per_group)))


def add_salt(batch: pa.Table, *, salt: int, row_key_col: str,
             out_col: str = "_salt") -> pa.Table:
    """Deterministic salt from a per-row id column (NOT random — retries
    must produce identical partials)."""
    rk = batch.column(row_key_col).to_numpy(zero_copy_only=False)
    if not np.issubdtype(rk.dtype, np.integer):
        from ..functions.hashing import fnv1a_str_array

        rk = fnv1a_str_array(batch.column(row_key_col).to_pylist()).astype(np.int64)
    s = (knuth_hash(np.abs(rk)) % salt).astype(np.int64)
    return batch.append_column(out_col, pa.array(s))


def salted_group_reduce(ds, key_cols: list[str], partial_fn, merge_fn,
                        salt: int | None, row_key_col: str):
    """Two-level reduce: groupby(key+salt) -> partial_fn(pandas) ->
    groupby(key) -> merge_fn(pandas).  Both fns must be written so that
    merge(partials) == reduce(all rows) (associativity contract).
    ``salt=None`` auto-sizes from the exact hottest-key count
    (:func:`choose_salt` on the first key column)."""
    import pandas as pd

    if salt is None:
        salt = choose_salt(ds, key_cols[0])

    salted = ds.map_batches(
        lambda b: add_salt(b, salt=salt, row_key_col=row_key_col),
        batch_format="pyarrow",
    )

    def run_partial(g: pd.DataFrame) -> pa.Table:
        out = partial_fn(g.drop(columns=["_salt"]))
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    partials = salted.groupby(key_cols + ["_salt"]).map_groups(
        run_partial, batch_format="pandas"
    )

    def run_merge(g: pd.DataFrame) -> pa.Table:
        return pa.Table.from_pandas(merge_fn(g), preserve_index=False).replace_schema_metadata(None)

    return partials.groupby(key_cols).map_groups(run_merge, batch_format="pandas")


def add_morton(batch: pa.Table, *, res: int = 16, lon_col="lon", lat_col="lat",
               out_col: str = "morton") -> pa.Table:
    m = cells.morton_of(
        batch.column(lon_col).to_numpy(zero_copy_only=False),
        batch.column(lat_col).to_numpy(zero_copy_only=False),
        res,
    )
    return batch.append_column(out_col, pa.array(m.astype(np.int64)))


def uniform_value_sample(ds, col: str, n_sample: int) -> np.ndarray:
    """One-pass UNIFORM sample of a numeric column, unbiased under ANY
    row order: every row gets a deterministic hash rank (value bits
    mixed with its within-block index so duplicated values still sample
    proportionally), each block keeps its n smallest ranks, one final
    top-n merges them.  ``limit(n)`` would take the first blocks only —
    on key- or time-clustered input that prefix is unrepresentative and
    quantile boundaries collapse onto one hot partition (round-3
    verdict; same fix as the ANN tuner's ``_sample_matrix``)."""
    from ..functions.hashing import splitmix64

    def local_top(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        bits = np.ascontiguousarray(v).view(np.uint64) if v.dtype.itemsize == 8 \
            else v.astype(np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            h = splitmix64(bits + splitmix64(
                np.arange(len(v), dtype=np.uint64)))
        keep = np.sort(np.argsort(h, kind="stable")[:n_sample])
        return pa.table({col: pa.array(v[keep]),
                         "__rank": pa.array(h[keep].view(np.int64))})

    pruned = ds.map_batches(local_top, batch_format="pyarrow")

    def final_top(batch: pa.Table) -> pa.Table:
        r = batch.column("__rank").to_numpy(zero_copy_only=False)
        keep = np.sort(np.argsort(r, kind="stable")[:n_sample])
        return batch.take(pa.array(keep)).select([col])

    out = pruned.repartition(1).map_batches(
        final_top, batch_format="pyarrow").to_pandas()
    return out[col].to_numpy()


def range_partition_by_morton(ds, num_partitions: int, res: int = 16,
                              lon_col="lon", lat_col="lat"):
    """Assign a contiguous space-filling-curve range partition id.

    Boundaries from a hash-ranked UNIFORM sample of the Morton keys
    (``uniform_value_sample`` — order-unbiased, so clustered input still
    yields balanced cuts); each partition then covers a compact spatial
    region — the layout for resumable writes and downstream range
    scans.  Adds columns ``morton`` and ``partition``.
    """
    with_m = ds.map_batches(
        lambda b: add_morton(b, res=res, lon_col=lon_col, lat_col=lat_col),
        batch_format="pyarrow",
    ).materialize()  # consumed twice: boundary sample + assignment
    sample = uniform_value_sample(with_m, "morton", 200_000)
    qs = np.quantile(sample, np.linspace(0, 1, num_partitions + 1)[1:-1])
    bounds = np.unique(qs.astype(np.int64))

    def assign(batch: pa.Table) -> pa.Table:
        m = batch.column("morton").to_numpy(zero_copy_only=False)
        p = np.searchsorted(bounds, m, side="right")
        return batch.append_column("partition", pa.array(p.astype(np.int64)))

    return with_m.map_batches(assign, batch_format="pyarrow")


def add_hilbert(batch: pa.Table, *, res: int = 15, lon_col="lon",
                lat_col="lat", out_col: str = "hkey") -> pa.Table:
    """Hilbert locality key column (geom/cells.py:hilbert_of) — the
    better-tail-locality sibling of ``add_morton``: consecutive keys
    are always edge-adjacent cells, so range cuts have compact borders
    (no Z seam jumps).  res <= 15 (16-bit kernel)."""
    h = cells.hilbert_of(
        batch.column(lon_col).to_numpy(zero_copy_only=False),
        batch.column(lat_col).to_numpy(zero_copy_only=False),
        res,
    )
    return batch.append_column(out_col, pa.array(h))


def range_partition_by_hilbert(ds, num_partitions: int, res: int = 15,
                               lon_col="lon", lat_col="lat"):
    """Contiguous Hilbert-range partition ids; boundaries from the same
    order-unbiased ``uniform_value_sample`` as the Morton variant.
    Adds columns ``hkey`` and ``partition``."""
    with_h = ds.map_batches(
        lambda b: add_hilbert(b, res=res, lon_col=lon_col, lat_col=lat_col),
        batch_format="pyarrow",
    ).materialize()  # consumed twice: boundary sample + assignment
    sample = uniform_value_sample(with_h, "hkey", 200_000)
    qs = np.quantile(sample, np.linspace(0, 1, num_partitions + 1)[1:-1])
    bounds = np.unique(qs.astype(np.int64))

    def assign(batch: pa.Table) -> pa.Table:
        h = batch.column("hkey").to_numpy(zero_copy_only=False)
        p = np.searchsorted(bounds, h, side="right")
        return batch.append_column("partition", pa.array(p.astype(np.int64)))

    return with_h.map_batches(assign, batch_format="pyarrow")


def stratified_sample(ds, key_cols: list[str], n_per_key: int, id_col: str,
                      mult: int | None = None, n_buckets: int = 64):
    """Exactly ``min(n_per_key, |stratum|)`` rows per key, chosen
    DETERMINISTICALLY: rows rank within their stratum by
    ``(knuth_hash(id), id)`` and the first n win — a uniform without-
    replacement sample reproducible across runs and partitionings, and
    restatable in SQL (ROW_NUMBER over the same hash expression).

    Scale shape: each batch pre-prunes to its LOCAL top-n per key (the
    rank is associative), so the shuffle moves at most n rows per
    (key, batch) — never the stratum; one coarse-bucket reduce takes the
    global top-n.  Output columns = input columns (the rank key is
    internal).
    """
    import pandas as pd

    from ..functions.hashing import KNUTH_A, knuth_hash
    from .bucketed import bucketed_groupby

    mult = mult or KNUTH_A

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["__h", id_col], kind="mergesort")
        return df.groupby(key_cols, sort=False).head(n_per_key)

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        b = batch.append_column("__h", pa.array(knuth_hash(ids, mult)))
        return pa.Table.from_pandas(prune(b.to_pandas()),
                                    preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow")
    out = bucketed_groupby(parts, key_cols, prune, n_buckets=n_buckets)
    return out.map_batches(lambda b: b.drop_columns(["__h"]),
                           batch_format="pyarrow")


# --- deterministic global shuffle -> training shards -----------------------

# 63-bit odd multiplier / 63-bit addend: multiply-add mod 2^64 is a
# BIJECTION of Z_2^64 (odd a), so distinct ids always get distinct hash
# order keys, and the SQL mirror stays inside DuckDB's INT128.
SHARD_A = (0x9E3779B97F4A7C15 >> 1) | 1
SHARD_B = 0xBF58476D1CE4E5B9 >> 1


def shuffle_to_shards(ds, id_col: str = "doc_id", n_shards: int = 8,
                      shard_col: str = "shard", pos_col: str = "pos"):
    """Deterministic pseudo-random shuffle into training shards.

    Every row gets ``h = (id*A + B) mod 2^64``; ``shard = h % n_shards``
    and ``pos`` = the row's rank inside its shard ordered by ``h`` — a
    reproducible global permutation (a pure function of the id set: same
    corpus -> same shard files byte-for-byte, so a failed writer restarts
    idempotently).  The rank comes from :func:`~.scan.keyed_prefix_scan`
    (one range sort + O(#blocks) driver rows); nothing materializes.

    Mirrors ``ROW_NUMBER() OVER (PARTITION BY h % n ORDER BY h) - 1``.
    """
    from .scan import keyed_prefix_scan

    _H = "__shard_h"

    def add_keys(batch: pa.Table) -> pa.Table:
        batch = batch.replace_schema_metadata(None)  # enable schema dedup
        ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        with np.errstate(over="ignore"):
            h = ids * np.uint64(SHARD_A) + np.uint64(SHARD_B)
        shard = (h % np.uint64(n_shards)).astype(np.int64)
        out = batch.append_column(shard_col, pa.array(shard, pa.int64()))
        return out.append_column(_H, pa.array(h, pa.uint64()))

    keyed = ds.map_batches(add_keys, batch_format="pyarrow")
    scanned = keyed_prefix_scan(keyed, shard_col, _H, value_col=None,
                                out_col=pos_col, inclusive=False)
    return scanned.drop_columns([_H])


def quota_per_key(ds, key_col: str, id_col: str, quota: int,
                  rank_col: str | None = None):
    """Deterministic per-key cap (the per-domain quota of web-corpus
    curation): keep each key's first ``quota`` rows under the bijective
    multiply-add hash order of ``id_col`` — a reproducible pseudo-random
    subsample with NO randomness state (same corpus -> same survivors,
    so retries/incremental runs agree).

    rank = ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY h) - 1`` via
    :func:`~.scan.keyed_prefix_scan` (string or int key; one range sort,
    O(#blocks) driver rows); rows with rank >= quota drop.  Pass
    ``rank_col`` to keep the rank in the output.
    """
    from .scan import keyed_prefix_scan

    _H = "__quota_h"
    _R = rank_col or "__quota_r"

    def add_h(batch: pa.Table) -> pa.Table:
        batch = batch.replace_schema_metadata(None)
        raw = batch.column(id_col).to_numpy(zero_copy_only=False)
        if np.issubdtype(raw.dtype, np.integer):
            ids = raw.astype(np.uint64)
        else:
            # string ids (urls): fingerprint first, then the bijective
            # mix — same determinism contract, collision odds 2^-64
            from ..functions.hashing import fnv1a_str_array

            ids = fnv1a_str_array(batch.column(id_col).to_pylist())
        with np.errstate(over="ignore"):
            h = ids * np.uint64(SHARD_A) + np.uint64(SHARD_B)
        return batch.append_column(_H, pa.array(h, pa.uint64()))

    ranked = keyed_prefix_scan(ds.map_batches(add_h, batch_format="pyarrow"),
                               key_col, _H, value_col=None, out_col=_R,
                               inclusive=False)

    def prune(batch: pa.Table) -> pa.Table:
        r = batch.column(_R).to_numpy(zero_copy_only=False)
        batch = batch.filter(pa.array(r < quota))
        drop = [_H] + ([] if rank_col else [_R])
        return batch.drop_columns(drop)

    return ranked.map_batches(prune, batch_format="pyarrow")


# --- data-mixing samplers ---------------------------------------------------

def temperature_sample(ds, key_col: str, id_col: str, alpha: float = 0.5,
                       n_buckets: int = 64):
    """Temperature-based mixture sampling (the multi-source data-mixing
    step of LLM corpus assembly): source ``s`` with ``n_s`` rows keeps
    ``m_s = max(1, floor(n_s ** alpha))`` rows, flattening the source
    distribution toward uniform as ``alpha → 0``.

    Survivors are the stratum's first ``m_s`` rows under the
    ``(knuth_hash(id), id)`` order — deterministic, partitioning-
    independent, and restatable as ``ROW_NUMBER() OVER (PARTITION BY key
    ORDER BY hash, id) <= m_s``.  With ``alpha = 0.5`` the target is
    ``floor(sqrt(n))``; IEEE sqrt is correctly rounded, so the SQL
    mirror is bit-exact (other alphas go through ``pow``, whose last-ulp
    behaviour is libm-specific — documented, not oracle-checked).

    Scale shape: one tiny per-key count aggregate (bounded by the key
    domain — sources number in the hundreds) broadcast via ``ray.put``;
    then the stratified-sample pattern: each batch pre-prunes to its
    LOCAL top-m per key, so the single bucketed shuffle moves at most
    ``m`` rows per (key, batch), never the stratum.
    """
    import pandas as pd
    import ray

    from ..functions.hashing import knuth_hash
    from .bucketed import bucketed_groupby
    from .zonal import zonal_aggregate

    counts = zonal_aggregate(ds, [key_col], {}).to_pandas()
    if alpha == 0.5:
        m = np.maximum(1, np.floor(np.sqrt(
            counts["n"].to_numpy().astype(np.float64)))).astype(np.int64)
    else:
        m = np.maximum(1, np.floor(np.power(
            counts["n"].to_numpy().astype(np.float64), alpha))).astype(np.int64)
    quota_ref = ray.put(dict(zip(counts[key_col], m)))

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["__h", id_col], kind="mergesort")
        q = df[key_col].map(ray.get(quota_ref)).to_numpy()
        rank = df.groupby(key_col, sort=False).cumcount().to_numpy()
        return df[rank < q]

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        b = batch.append_column("__h", pa.array(knuth_hash(ids)))
        return pa.Table.from_pandas(prune(b.to_pandas()),
                                    preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow")
    out = bucketed_groupby(parts, [key_col], prune, n_buckets=n_buckets)
    return out.map_batches(lambda b: b.drop_columns(["__h"]),
                           batch_format="pyarrow")


def weighted_bernoulli(ds, id_col: str, weight_col: str,
                       denom_log2: int = 10):
    """Probability-proportional-to-size row sampling with NO randomness
    state: row ``i`` survives iff ``knuth_hash(id_i) < p_i * 2^32`` with
    ``p_i = min(weight_i, D) / D``, ``D = 2^denom_log2`` — evaluated as
    the EXACT integer predicate ``hash32 * D < weight * 2^32`` (products
    < 2^63, no float anywhere), so the same rows survive in any engine,
    on any partitioning, and in the SQL mirror.

    Pure ``map_batches`` filter — no shuffle, no driver state; the
    deterministic hash makes retries and incremental re-runs agree.
    """
    from ..functions.hashing import knuth_hash

    D = np.int64(1 << denom_log2)
    M32 = np.int64(1 << 32)

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        w = np.minimum(
            batch.column(weight_col).to_numpy(zero_copy_only=False)
            .astype(np.int64), D)
        h = knuth_hash(ids).astype(np.int64)
        return batch.filter(pa.array(h * D < w * M32))

    return ds.map_batches(fn, batch_format="pyarrow")


# exact integer split thresholds: 80 / 10 / 10 % of the 2^32 hash space
SPLIT_TRAIN_T = ((1 << 32) * 4) // 5
SPLIT_VAL_T = ((1 << 32) * 9) // 10


def assign_split(ds, id_col: str, split_col: str = "split",
                 train_t: int = SPLIT_TRAIN_T, val_t: int = SPLIT_VAL_T):
    """Deterministic train/val/test assignment by hash range: row goes to
    'train' if ``hash32(id) < train_t``, 'val' if ``< val_t``, else
    'test' — exact integer thresholds (defaults 80/10/10), no RNG state,
    stable under repartitioning and incremental re-runs.  Pure
    ``map_batches``; no shuffle."""
    from ..functions.hashing import knuth_hash

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        h = knuth_hash(ids)
        split = np.where(h < train_t, "train",
                         np.where(h < val_t, "val", "test"))
        return batch.append_column(split_col, pa.array(split, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def quadtree_leaves(ds, *, res_max: int, res_min: int, cap: int,
                    cell_col: str = "cell", n_buckets: int = 8):
    """ADAPTIVE QUADTREE leaf directory (the spatial-indexing /
    load-balancing primitive): the hierarchical grid (geom/cells.py —
    each res-r cell splits into exactly 4 res-(r+1) children) is cut
    at the FIRST depth in [res_min, res_max] whose cell holds <= ``cap``
    points (counts are monotone down the hierarchy, so this is the
    classic split-while-overfull tree); cells still overfull at
    ``res_max`` stay res_max leaves.  Returns one row per leaf
    (depth, cell, n).

    100-TB shape: ONE combiner-first shuffle builds the res_max
    histogram (``cell_counts``); every coarser level is a local
    roll-up of that GRID-bounded table — points never move again, and
    the leaf directory is what a downstream repartition consumes."""
    import ray.data as rd

    from .spatial_stats import _histogram

    cells_max, n = _histogram(ds, cell_col, n_buckets)
    if len(cells_max) == 0:
        return rd.from_arrow(pa.table({
            "depth": pa.array([], pa.int64()),
            "cell": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64())}))
    ncols_max = 2 << res_max
    x = cells_max % ncols_max
    y = cells_max // ncols_max
    leaf_depth = np.full(len(cells_max), res_max, dtype=np.int64)
    leaf_cell = cells_max.copy()
    assigned = np.zeros(len(cells_max), dtype=bool)
    for r in range(res_min, res_max):
        s = res_max - r
        pc = ((y >> s) * (2 << r)) + (x >> s)
        up, inv = np.unique(pc, return_inverse=True)
        cnt = np.zeros(len(up), dtype=np.int64)
        np.add.at(cnt, inv, n)
        ok = (cnt[inv] <= cap) & ~assigned
        leaf_depth[ok] = r
        leaf_cell[ok] = pc[ok]
        assigned |= ok
    import pandas as pd

    agg = pd.DataFrame({"depth": leaf_depth, "cell": leaf_cell,
                        "n": n}).groupby(["depth", "cell"],
                                         as_index=False)["n"].sum()
    return rd.from_arrow(pa.table({
        "depth": pa.array(agg["depth"].to_numpy().astype(np.int64)),
        "cell": pa.array(agg["cell"].to_numpy().astype(np.int64)),
        "n": pa.array(agg["n"].to_numpy().astype(np.int64))}))
