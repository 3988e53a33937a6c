"""Deduplication suite: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Training-data operators the north star grades as first-class (no
reference analog — zen3geo has no dedup; SURVEY §2.3 "Set ops / dedup").

Scale shapes:
* exact   — content-hash in map_batches → groupby(hash) → first per
            group (hash-partitioned; only the 8-byte key + kept columns
            shuffle);
* minhash — shingle→minhash per batch (vectorized) → explode to
            (band_id, band_hash) rows → groupby bands → candidate pairs
            → verified Jaccard — the standard LSH plan where only
            signature rows (fixed width) shuffle, never documents;
* simhash — 64-bit fingerprint per doc; near-dups = equal fingerprints
            or Hamming distance ≤ t via 4-way band buckets;
* ngram_jaccard — verification kernel for candidate pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import fnv1a_str_array, splitmix64

# --- shingles + minhash ---------------------------------------------------


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Hashes of the k-character shingles of a text (uint64)."""
    data = text.encode("utf-8")
    if len(data) < k:
        return fnv1a_str_array([text])
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    n = len(arr) - k + 1
    with np.errstate(over="ignore"):
        h = np.zeros(n, dtype=np.uint64)
        for j in range(k):
            h = h * np.uint64(1099511628211) + arr[j : j + n]
    return np.unique(h)


def minhash_signatures(texts, num_perm: int = 64, k: int = 5) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signatures, one xor-permutation
    per hash function (vectorized over shingles)."""
    seeds = splitmix64(np.arange(1, num_perm + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))
    out = np.full((len(texts), num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    for i, t in enumerate(texts):
        sh = _shingle_hashes(t or "", k)
        with np.errstate(over="ignore"):
            # xor-permute then min — (S, P) broadcast
            out[i] = splitmix64(sh[:, None] ^ seeds[None, :]).min(axis=0)
    return out


def minhash_bands(batch: pa.Table, *, id_col: str, text_col: str = "text",
                  num_perm: int = 64, bands: int = 16, k: int = 5) -> pa.Table:
    """map_batches fn: docs -> (doc id, band_id, band_hash) rows."""
    if num_perm % bands:
        raise ValueError("num_perm must be divisible by bands")
    r = num_perm // bands
    sig = minhash_signatures(batch.column(text_col).to_pylist(), num_perm, k)
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    n = len(ids)
    band_hash = np.empty((n, bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for b in range(bands):
            h = np.full(n, np.uint64(14695981039346656037), dtype=np.uint64)
            for j in range(b * r, (b + 1) * r):
                h = (h ^ sig[:, j]) * np.uint64(1099511628211)
            band_hash[:, b] = h
    return pa.table(
        {
            id_col: pa.array(np.repeat(ids, bands)),
            "band_id": pa.array(np.tile(np.arange(bands), n), pa.int32()),
            "band_hash": pa.array(band_hash.reshape(-1).astype(np.int64), pa.int64()),
        }
    )


def lsh_group_labels(bands_ds, *, id_col: str, rounds: int = 2):
    """(id, band_id, band_hash) rows -> (id, dup_group) with transitive
    closure via pointer jumping.

    Round 0: label = min id per LSH bucket, then min per doc.  Each
    extra round replaces label[x] with min(label[x], label[label[x]])
    through a distributed self-join (bucketed hash join) — pointer
    jumping, so chain diameter halves per round; ``rounds=2`` closes
    chains up to length ~4, which covers practical near-dup clusters.
    """
    from ray.data.aggregate import Min

    from .bucketed import bucketed_groupby
    from .hashjoin import bucketed_join

    def bucket_min(g: pd.DataFrame) -> pd.DataFrame:
        gm = g.groupby(["band_id", "band_hash"], sort=False)[id_col].transform("min")
        return pd.DataFrame({id_col: g[id_col], "dup_group": gm})

    grouped = bucketed_groupby(bands_ds, ["band_id", "band_hash"], bucket_min)
    labels = grouped.groupby(id_col).aggregate(Min("dup_group", alias_name="dup_group"))
    # one row per doc — materialize so each jump round consumes the
    # previous result instead of re-executing the whole lazy chain
    # (the self-join reads `labels` twice per round)
    labels = labels.materialize()

    for _ in range(rounds):
        # parent table: the label of each label
        parents = labels.map_batches(
            lambda b: pa.table({"dup_group": b.column(id_col),
                                "parent": b.column("dup_group")}),
            batch_format="pyarrow",
        )
        joined = bucketed_join(labels, parents, ["dup_group"], how="left")
        labels = joined.map_batches(
            lambda b: pa.table(
                {
                    id_col: b.column(id_col),
                    "dup_group": pa.array(
                        np.minimum(
                            b.column("dup_group").to_numpy(zero_copy_only=False),
                            np.nan_to_num(
                                b.column("parent")
                                .to_numpy(zero_copy_only=False)
                                .astype(np.float64),
                                nan=np.inf,
                            ),
                        ).astype(np.int64),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
    return labels


def minhash_lsh_groups(docs_ds, *, id_col: str, text_col: str = "text",
                       num_perm: int = 64, bands: int = 16, k: int = 5,
                       rounds: int = 2):
    """Docs -> (doc_id, dup_group) rows for docs sharing any LSH band,
    with transitive closure (pointer jumping, see lsh_group_labels)."""
    bands_ds = docs_ds.map_batches(
        lambda b: minhash_bands(b, id_col=id_col, text_col=text_col,
                                num_perm=num_perm, bands=bands, k=k),
        batch_format="pyarrow",
    )
    return lsh_group_labels(bands_ds, id_col=id_col, rounds=rounds)


# --- simhash --------------------------------------------------------------


def simhash64(texts, k: int = 4) -> np.ndarray:
    """64-bit SimHash over k-char shingles (vectorized bit-vote)."""
    out = np.empty(len(texts), dtype=np.uint64)
    bits = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts):
        sh = _shingle_hashes(t or "", k)
        votes = (
            ((sh[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int64) * 2 - 1
        ).sum(axis=0)
        out[i] = np.packbits((votes >= 0)[::-1]).view(">u8")[0]
    return out


def simhash_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    h = simhash64(batch.column(text_col).to_pylist())
    return batch.append_column("simhash", pa.array(h.astype(np.int64), pa.int64()))


def simhash_near_dup_groups(docs_ds, *, id_col: str, text_col: str = "text",
                            n_bands: int = 4):
    """SimHash near-dup grouping: split the 64-bit fingerprint into
    ``n_bands`` bands; docs sharing ANY band are grouped (catches pairs
    with Hamming distance < n_bands by pigeonhole).  Same LSH-banding
    shuffle shape as MinHash — only (id, band, band_bits) rows move."""
    from ray.data.aggregate import Min

    from .bucketed import bucketed_groupby

    width = 64 // n_bands
    mask = np.uint64((1 << width) - 1)

    def bands(batch: pa.Table) -> pa.Table:
        h = simhash64(batch.column(text_col).to_pylist())
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        n = len(ids)
        cols_id, cols_band, cols_bits = [], [], []
        with np.errstate(over="ignore"):
            for b in range(n_bands):
                bits = (h >> np.uint64(b * width)) & mask
                cols_id.append(ids)
                cols_band.append(np.full(n, b, dtype=np.int32))
                cols_bits.append(bits.astype(np.int64))
        return pa.table(
            {
                id_col: np.concatenate(cols_id),
                "band_id": pa.array(np.concatenate(cols_band), pa.int32()),
                "band_bits": pa.array(np.concatenate(cols_bits), pa.int64()),
            }
        )

    bands_ds = docs_ds.map_batches(bands, batch_format="pyarrow")

    def bucket_min(g: pd.DataFrame) -> pd.DataFrame:
        gm = g.groupby(["band_id", "band_bits"], sort=False)[id_col].transform("min")
        return pd.DataFrame({id_col: g[id_col], "dup_group": gm})

    grouped = bucketed_groupby(bands_ds, ["band_id", "band_bits"], bucket_min)
    return grouped.groupby(id_col).aggregate(Min("dup_group", alias_name="dup_group"))


# --- n-gram jaccard -------------------------------------------------------


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact k-shingle Jaccard similarity of two texts."""
    sa = _shingle_hashes(a or "", k)
    sb = _shingle_hashes(b or "", k)
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    return inter / (len(sa) + len(sb) - inter)


def verify_pairs(batch: pa.Table, *, texts_lookup: dict, a_col: str, b_col: str,
                 k: int = 5, threshold: float = 0.8) -> pa.Table:
    """map_batches fn over candidate-pair rows: exact Jaccard filter
    (texts_lookup broadcast via ray.put for the small verified set)."""
    a = batch.column(a_col).to_pylist()
    b = batch.column(b_col).to_pylist()
    sim = np.array([ngram_jaccard(texts_lookup[x], texts_lookup[y], k) for x, y in zip(a, b)])
    out = batch.append_column("jaccard", pa.array(sim, pa.float64()))
    return out.filter(pa.array(sim >= threshold))


def near_dup_pipeline(docs_ds, *, id_col: str, text_col: str = "text",
                      num_perm: int = 64, bands: int = 16, k: int = 5,
                      threshold: float = 0.8, max_verify: int = 200_000):
    """End-to-end near-dup: LSH candidate pairs → exact Jaccard verify →
    verified dup groups.

    Candidate pairs come from LSH buckets (one (min_id, other_id) pair per
    bucket member); verification needs both texts — the verified set is
    gathered via a broadcast text lookup of only the CANDIDATE ids
    (bounded by ``max_verify``; at larger candidate volumes partition the
    pair list by min_id range and join texts per partition instead).
    Returns a Dataset of (id, dup_group, jaccard) for verified pairs.
    """
    import ray

    from .bucketed import bucketed_groupby

    bands_ds = docs_ds.map_batches(
        lambda b: minhash_bands(b, id_col=id_col, text_col=text_col,
                                num_perm=num_perm, bands=bands, k=k),
        batch_format="pyarrow",
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        gm = g.groupby(["band_id", "band_hash"], sort=False)[id_col].transform("min")
        out = pd.DataFrame({"a": gm, "b": g[id_col]})
        out = out[out.a != out.b].drop_duplicates()
        return out

    pairs = bucketed_groupby(bands_ds, ["band_id", "band_hash"], bucket_pairs)
    pairs_tbl = pairs.limit(max_verify).to_pandas().drop_duplicates()
    if len(pairs_tbl) == 0:
        import ray.data as rd

        return rd.from_items([])
    cand_ids = set(pairs_tbl["a"]) | set(pairs_tbl["b"])

    def collect_texts(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        mask = np.isin(ids, np.fromiter(cand_ids, dtype=ids.dtype))
        return b.filter(pa.array(mask)).select([id_col, text_col])

    texts = docs_ds.map_batches(collect_texts, batch_format="pyarrow").to_pandas()
    lookup = dict(zip(texts[id_col], texts[text_col]))
    lookup_ref = ray.put(lookup) if ray.is_initialized() else lookup

    import ray.data as rd

    pair_ds = rd.from_pandas(pairs_tbl)

    def verify(b: pa.Table) -> pa.Table:
        lk = lookup_ref
        try:
            if isinstance(lk, ray.ObjectRef):
                lk = ray.get(lk)
        except TypeError:
            pass
        return verify_pairs(b, texts_lookup=lk, a_col="a", b_col="b",
                            k=k, threshold=threshold)

    return pair_ds.map_batches(verify, batch_format="pyarrow")


# --- exact dedup ----------------------------------------------------------


def add_content_hash(batch: pa.Table, *, text_col: str = "text",
                     out_col: str = "content_hash") -> pa.Table:
    h = fnv1a_str_array(batch.column(text_col).to_pylist())
    return batch.append_column(out_col, pa.array(h.astype(np.int64), pa.int64()))


def exact_dedup(ds, *, text_col: str = "text", order_cols: list[str] | None = None):
    """Hash-partitioned exact dedup: first row per content hash (ties
    broken deterministically by order_cols)."""
    from .stack import dedup_first

    hashed = ds.map_batches(
        lambda b: add_content_hash(b, text_col=text_col), batch_format="pyarrow"
    )
    return dedup_first(hashed, ["content_hash"], order_cols or [text_col])
