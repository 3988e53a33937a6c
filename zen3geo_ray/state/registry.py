"""Sharded mutable key registry — the one shape Dataset ops can't express.

Everything else in this engine is a pure batch transform or a keyed
shuffle; an UNBOUNDED stream that must drop duplicates ACROSS batches as
they arrive (no end-of-stream groupby possible) genuinely needs shared
mutable state.  Per the brief's escalation ladder this is the "(c) raw
Ray actors as a last resort" case: a pool of ``@ray.remote`` shard
actors, each owning ``hash(key) % n_shards``'s seen-set; a map_batches
fn routes each batch's keys to its shards with ONE test-and-set call per
(batch, shard).

Semantics: exactly one row per distinct key survives — WHICH row is
arrival-order dependent (that is inherent to online dedup; use
stages/dedup.exact_dedup when the input is bounded and a deterministic
winner matters).  Shards are independent actors, so the registry scales
horizontally and adds no all-to-all; per-batch cost is ``n_shards``
small RPCs.  Shards store the ACTUAL keys (dedup is exact — the 64-bit
hash is used only for shard ROUTING, where a collision is harmless).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import fnv1a_str_array


def _key_hashes(batch: pa.Table, key_col: str) -> np.ndarray:
    col = batch.column(key_col)
    if pa.types.is_integer(col.type):
        return col.to_numpy(zero_copy_only=False).astype(np.uint64)
    return fnv1a_str_array(col.to_pylist())


def make_registry(n_shards: int = 8):
    """Create the shard actor pool (call once per stream, driver-side)."""
    import ray

    @ray.remote(num_cpus=0)
    class KeySetShard:
        """Owns one shard of the seen-key set; test-and-set per call.
        Stores the real key values, so dedup is exact (no hash-collision
        key loss)."""

        def __init__(self):
            self.seen: set = set()

        def test_and_set(self, keys: list) -> np.ndarray:
            out = np.empty(len(keys), dtype=bool)
            seen = self.seen
            for i, k in enumerate(keys):
                if k in seen:
                    out[i] = False
                else:
                    seen.add(k)
                    out[i] = True
            return out

        def size(self) -> int:
            return len(self.seen)

    return [KeySetShard.remote() for _ in range(n_shards)]


def streaming_exact_dedup(ds, registry: list, key_col: str):
    """Online exact dedup against a live registry: each batch keeps only
    rows whose key is seen for the FIRST time across the whole stream.

    The returned Dataset is lazy; consuming it streams batches through
    the registry (consume ONCE — a re-execution would see a pre-warmed
    registry and drop everything)."""
    import ray

    n_shards = len(registry)

    def dedup_batch(batch: pa.Table) -> pa.Table:
        h = _key_hashes(batch, key_col)  # routing only — values are sent
        shard = (h % np.uint64(n_shards)).astype(np.int64)
        keys = batch.column(key_col).to_pylist()
        keep = np.zeros(len(batch), dtype=bool)
        futures, idxs = [], []
        for s in range(n_shards):
            sel = np.flatnonzero(shard == s)
            if len(sel):
                futures.append(
                    registry[s].test_and_set.remote([keys[i] for i in sel])
                )
                idxs.append(sel)
        for fut, sel in zip(ray.get(futures), idxs):
            keep[sel] = fut
        return batch.filter(pa.array(keep))

    return ds.map_batches(dedup_batch, batch_format="pyarrow")
