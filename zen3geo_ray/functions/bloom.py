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
