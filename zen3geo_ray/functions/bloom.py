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


def build_bloom_distributed(keys_ds, key_col: str, n_keys_hint: int,
                            bits_per_key: int = 10, n_hashes: int = 7):
    """Build a BloomFilter over a Dataset key column WITHOUT collecting
    the keys to the driver.

    Each map_batches task folds its block's keys into a partial bit
    array (all partials share the sizing derived from ``n_keys_hint``, an
    upper bound — e.g. the table's parquet row count); the driver then
    ORs one small fixed-size array per BLOCK, so driver memory is
    O(filter_size x blocks), never O(keys).  At cluster scale the OR is a
    tree-reduce; single-node the block count is capped anyway.
    """
    import pyarrow as pa

    proto = BloomFilter(n_keys_hint, bits_per_key, n_hashes)
    m, k = proto.m, proto.k

    def partial(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(n_keys_hint, bits_per_key, n_hashes)
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        if len(keys):
            bf.add(keys.astype(np.uint64))
        return pa.table({"bits": pa.array([bf.bits.tobytes()], pa.binary())})

    parts = keys_ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = BloomFilter(n_keys_hint, bits_per_key, n_hashes)
    assert out.m == m and out.k == k
    for blob in parts["bits"]:
        out.bits |= np.frombuffer(blob, dtype=np.uint64)
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
