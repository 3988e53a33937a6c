"""Numpy Bloom filter — broadcast semi/anti joins with big key sets.

When the key set of a semi/anti join no longer fits as an exact
broadcast (billions of urls), ship a Bloom filter instead: ~10 bits/key
for ~1% false positives.  Semi joins then pass a superset (callers that
need exactness follow with an exact check on the survivors — a much
smaller set); anti joins must treat filter hits as "maybe" and verify.

Deterministic double-hashing (splitmix64 streams), vectorized add/query.
"""

from __future__ import annotations

import numpy as np

from .hashing import splitmix64


class BloomFilter:
    def __init__(self, n_keys: int, bits_per_key: int = 10, n_hashes: int = 7):
        self.m = int(max(64, n_keys * bits_per_key))
        self.k = n_hashes
        self.bits = np.zeros((self.m + 63) // 64, dtype=np.uint64)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """(n, k) bit positions via double hashing h1 + i*h2."""
        keys = np.asarray(keys, dtype=np.uint64)
        h1 = splitmix64(keys)
        h2 = splitmix64(keys ^ np.uint64(0xDEADBEEFCAFEF00D)) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)
        with np.errstate(over="ignore"):
            pos = (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(self.m)
        return pos

    def add(self, keys) -> None:
        pos = self._positions(keys).ravel()
        word = (pos >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (pos & np.uint64(63))
        np.bitwise_or.at(self.bits, word, bit)

    def contains(self, keys) -> np.ndarray:
        pos = self._positions(keys)
        word = (pos >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (pos & np.uint64(63))
        return ((self.bits[word] & bit) != 0).all(axis=1)

    @classmethod
    def build(cls, keys, bits_per_key: int = 10, n_hashes: int = 7):
        keys = np.asarray(keys)
        bf = cls(len(keys), bits_per_key, n_hashes)
        bf.add(keys)
        return bf


# observability for the streaming merge (tests assert the driver never
# folds more blobs than the tree level leaves it)
_LAST_BUILD_STATS: dict = {}


def _or_fold_blobs(blobs, out_bits: np.ndarray) -> int:
    """Fold an ITERATOR of bit blobs into ``out_bits`` in place.

    Consumes lazily — exactly ONE blob is alive on top of the
    accumulator at any moment, so driver memory is O(filter), never
    O(filter x blocks).  Returns the number of blobs folded.
    """
    n = 0
    for blob in blobs:
        np.bitwise_or(out_bits, np.frombuffer(blob, dtype=np.uint64),
                      out=out_bits)
        n += 1
    return n


def build_bloom_distributed(keys_ds, key_col: str, n_keys_hint: int,
                            bits_per_key: int = 10, n_hashes: int = 7,
                            merge_groups: int = 32):
    """Build a BloomFilter over a Dataset key column WITHOUT collecting
    the keys to the driver.

    Each map_batches task folds its block's keys into a partial bit
    array (all partials share the sizing derived from ``n_keys_hint``, an
    upper bound — e.g. the table's parquet row count).  The partials are
    then OR-merged CLUSTER-side: each blob hashes (crc of its bytes —
    pure load balancing) into one of ``merge_groups`` reduce groups and a
    map_groups task folds its group's blobs sequentially into one.  The
    driver then STREAMS the ≤ ``merge_groups`` survivors via
    ``iter_batches`` and ORs them one at a time — driver memory is
    O(filter) and driver ingress is merge_groups x filter bytes,
    regardless of block count (never one blob per block held
    simultaneously, the round-2 scale hazard).

    Per-reduce-group memory is ceil(blocks / merge_groups) blobs per
    group BLOCK; with giant filters and very high block counts size
    ``merge_groups`` ~ blocks/8 (the level composes — re-group the
    output for another round — but one level covers realistic shapes).
    """
    import zlib

    import pyarrow as pa

    proto = BloomFilter(n_keys_hint, bits_per_key, n_hashes)
    m, k = proto.m, proto.k

    def partial(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(n_keys_hint, bits_per_key, n_hashes)
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        if len(keys):
            bf.add(keys.astype(np.uint64))
        blob = bf.bits.tobytes()
        g = zlib.crc32(blob) % merge_groups
        return pa.table({"__g": pa.array([g], pa.int64()),
                         "bits": pa.array([blob], pa.binary())})

    def or_merge(group: pa.Table) -> pa.Table:
        acc = None
        for blob in group.column("bits"):
            arr = np.frombuffer(blob.as_py(), dtype=np.uint64)
            if acc is None:
                acc = arr.copy()
            else:
                np.bitwise_or(acc, arr, out=acc)
        return pa.table({"bits": pa.array([acc.tobytes()], pa.binary())})

    parts = keys_ds.map_batches(partial, batch_format="pyarrow")
    merged = parts.groupby("__g").map_groups(or_merge, batch_format="pyarrow")
    out = BloomFilter(n_keys_hint, bits_per_key, n_hashes)
    assert out.m == m and out.k == k

    def blob_stream():
        for b in merged.iter_batches(batch_size=1, batch_format="pyarrow"):
            for blob in b.column("bits"):
                yield blob.as_py()

    n_folded = _or_fold_blobs(blob_stream(), out.bits)
    _LAST_BUILD_STATS.clear()
    _LAST_BUILD_STATS.update(
        {"driver_blobs_folded": n_folded, "merge_groups": merge_groups}
    )
    return out


def bloom_anti_join(left, right_keys_ds, key_col: str, *,
                    n_keys_hint: int, n_buckets: int = 32,
                    bits_per_key: int = 10):
    """EXACT distributed anti join with a Bloom prefilter.

    Rows whose key misses the Bloom are DEFINITE non-members — they pass
    straight through with NO shuffle.  Only Bloom hits (true members +
    ~1% false positives) go through the exact bucketed anti join, so the
    all-to-all moves a small fraction of the left side: the 100-TB shape
    for NOT IN against a large key set.  Result = definite-miss rows ∪
    exactly-verified rows (row order differs from a plain anti join;
    content is identical).
    """
    import ray

    from ..stages.hashjoin import bucketed_join

    bloom = build_bloom_distributed(right_keys_ds, key_col, n_keys_hint,
                                    bits_per_key)
    ref = ray.put(bloom) if ray.is_initialized() else bloom
    definite = bloom_semi_join(left, ref, key_col, anti=True)
    maybe = bloom_semi_join(left, ref, key_col, anti=False)
    verified = bucketed_join(maybe, right_keys_ds, [key_col], how="anti",
                             n_buckets=n_buckets)
    return definite.union(verified)


def bloom_exact_semi_join(left, right_keys_ds, key_col: str, *,
                          n_keys_hint: int, n_buckets: int = 32,
                          bits_per_key: int = 10):
    """EXACT distributed semi join with a Bloom prefilter — the IN /
    EXISTS sibling of ``bloom_anti_join``.

    Rows whose key misses the Bloom are DEFINITE non-members and drop
    immediately with NO shuffle; only the hits (true members + ~1%
    false positives) go through the exact bucketed semi join.  When the
    semi join is selective (the common case: "keep docs whose domain is
    on the allowlist" over 100 TB), the all-to-all moves a small
    fraction of the left side.  Content identical to a plain semi join;
    row order differs."""
    import ray

    from ..stages.hashjoin import bucketed_join

    bloom = build_bloom_distributed(right_keys_ds, key_col, n_keys_hint,
                                    bits_per_key)
    ref = ray.put(bloom) if ray.is_initialized() else bloom
    maybe = bloom_semi_join(left, ref, key_col, anti=False)
    return bucketed_join(maybe, right_keys_ds, [key_col], how="semi",
                         n_buckets=n_buckets)


def bloom_semi_join(ds, bloom_ref, key_col: str, anti: bool = False):
    """map_batches semi(/anti-candidate) filter against a broadcast Bloom.

    semi: keeps a superset (false-positive rate per the filter sizing);
    anti=True keeps definite non-members PLUS false positives — follow
    with an exact verification stage for exact anti semantics.
    """
    import pyarrow as pa

    def flt(batch: pa.Table) -> pa.Table:
        bf = bloom_ref
        try:
            import ray

            if isinstance(bf, ray.ObjectRef):
                bf = ray.get(bf)
        except (ImportError, TypeError):
            pass
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        hit = bf.contains(keys.astype(np.uint64))
        return batch.filter(pa.array(~hit if anti else hit))

    return ds.map_batches(flt, batch_format="pyarrow")
