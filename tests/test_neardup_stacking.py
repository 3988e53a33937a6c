"""End-to-end near-dup verification pipeline + stacking walkthrough tests."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from zen3geo_ray.pipelines.walkthroughs import stacking_pipeline
from zen3geo_ray.sources.corpus import pages_table
from zen3geo_ray.stages.dedup import near_dup_pipeline


def test_near_dup_pipeline_finds_planted_dups(ray_session):
    base = (
        "the quick brown fox jumps over the lazy dog and keeps running "
        "through fields of golden wheat toward the river crossing "
    )
    docs = pa.table(
        {
            "doc_id": list(range(6)),
            "text": [
                base * 3,
                base * 3 + "extra tail",
                "a completely different document about database systems " * 4,
                "yet another unrelated text concerning mountain weather " * 4,
                base * 3 + "tiny",
                "short",
            ],
        }
    )
    out = near_dup_pipeline(
        rd.from_arrow(docs), id_col="doc_id", threshold=0.7
    ).to_pandas()
    pairs = set(zip(out["a"], out["b"]))
    # 0/1/4 are near-identical -> verified pairs anchored at min id 0
    assert (0, 1) in pairs and (0, 4) in pairs
    # unrelated docs never verified against each other
    assert all(a == 0 for a, b in pairs)
    assert (out["jaccard"] >= 0.7).all()


def test_near_dup_pipeline_no_candidates(ray_session):
    docs = pa.table(
        {
            "doc_id": [1, 2],
            "text": [
                "first totally distinct content about oceans " * 3,
                "second document on an entirely different topic " * 3,
            ],
        }
    )
    out = near_dup_pipeline(rd.from_arrow(docs), id_col="doc_id")
    assert out.count() == 0


def test_stacking_pipeline(ray_session):
    pages = pages_table(400)
    stacked, mosaic = stacking_pipeline(rd.from_arrow(pages), res=4)
    st = stacked.to_pandas()
    mo = mosaic.to_pandas()
    assert st["n_layers"].sum() == 400
    assert set(st["cell"]) == set(mo["cell"])
    # mosaic keeps the first (warc_ts, url) row per cell
    pdf = pages.to_pandas()
    from zen3geo_ray.functions.geocode import geocode_url
    from zen3geo_ray.geom import cells as cellmod

    lon, lat = geocode_url(pdf["url"].tolist(), pdf["lang"].tolist())
    pdf["cell"] = cellmod.cell_of(lon, lat, 4)
    exp = (
        pdf.sort_values(["warc_ts", "url"], kind="mergesort")
        .groupby("cell")
        .first()
        .reset_index()
    )
    merged = mo.merge(exp[["cell", "url"]], on="cell", suffixes=("", "_exp"))
    assert (merged["url"] == merged["url_exp"]).all()
    # stacks are time-ordered
    row = st.iloc[int(np.argmax(st["n_layers"].to_numpy()))]
    stack_urls = list(row["url_stack"])
    cell_rows = pdf[pdf.cell == row["cell"]].sort_values(
        ["warc_ts", "url"], kind="mergesort"
    )
    assert stack_urls == cell_rows["url"].tolist()


def test_simhash_near_dup_groups(ray_session):
    from zen3geo_ray.stages.dedup import simhash_near_dup_groups

    base = (
        "the quick brown fox jumps over the lazy dog near the river bank "
        "while birds are singing in the morning light of early spring "
    )
    docs = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": [base * 4, base * 4 + "!", "totally different topic words " * 8],
        }
    )
    out = simhash_near_dup_groups(
        rd.from_arrow(docs), id_col="doc_id"
    ).to_pandas()
    g = dict(zip(out["doc_id"], out["dup_group"]))
    assert g[1] == g[2] == 1
    assert g[3] == 3


def test_lsh_group_labels_transitive_chain(ray_session):
    from zen3geo_ray.stages.dedup import lsh_group_labels

    # chain: 1~2 share bucket (0, 100); 2~3 share bucket (1, 200);
    # 1 and 3 share nothing directly
    bands = pa.table(
        {
            "doc_id": [1, 2, 2, 3, 9],
            "band_id": [0, 0, 1, 1, 5],
            "band_hash": [100, 100, 200, 200, 999],
        }
    )
    out = lsh_group_labels(
        rd.from_arrow(bands), id_col="doc_id"
    ).to_pandas()
    g = dict(zip(out["doc_id"], out["dup_group"]))
    assert g[1] == g[2] == g[3] == 1  # transitive closure
    assert g[9] == 9  # singleton untouched


def test_embedding_near_dup_groups(ray_session):
    from zen3geo_ray.stages.dedup import embedding_near_dup_groups

    rng = np.random.default_rng(5)
    base = rng.standard_normal(16).astype(np.float32)
    far = -base  # opposite signs -> different bucket, cos = -1
    other = rng.standard_normal(16).astype(np.float32)
    vecs = [
        base,
        base + 0.01 * rng.standard_normal(16).astype(np.float32),  # near-dup of 0
        far,
        other,
        base + 0.02 * rng.standard_normal(16).astype(np.float32),  # near-dup of 0
    ]
    tbl = pa.table(
        {"vec_id": pa.array(np.arange(5), pa.int64()),
         "embedding": pa.array([list(map(float, v)) for v in vecs],
                               pa.list_(pa.float32()))}
    )
    out = embedding_near_dup_groups(
        rd.from_arrow(tbl), sign_dims=8, threshold=0.9
    ).to_pandas()
    g = dict(zip(out["vec_id"], out["dup_group"]))
    assert g[0] == g[1] == g[4] == 0
    assert g[2] == 2 and g[3] == 3


def test_lsh_group_labels_pointer_jump_long_chain(ray_session):
    """A chain whose diameter EXCEEDS max_rounds must still reach the
    full transitive closure via the pointer-jumping fallback (diameter
    halves per jump), never return partial groups."""
    from zen3geo_ray.stages.dedup import lsh_group_labels

    n = 24  # chain 0-1-...-23; diameter 23 >> max_rounds=3
    ids, bands_, hashes = [], [], []
    for k in range(n - 1):  # bucket k links docs k and k+1
        ids += [k, k + 1]
        bands_ += [0, 0]
        hashes += [1000 + k, 1000 + k]
    bands = pa.table({"doc_id": ids, "band_id": bands_, "band_hash": hashes})
    out = lsh_group_labels(
        rd.from_arrow(bands), id_col="doc_id", max_rounds=3
    ).to_pandas()
    g = dict(zip(out["doc_id"], out["dup_group"]))
    assert all(g[i] == 0 for i in range(n)), g


def test_containment_catches_excerpts_jaccard_misses():
    from zen3geo_ray.stages.dedup import ngram_containment, ngram_jaccard

    # non-periodic long doc (distinct shingles everywhere), short excerpt
    long = " ".join(f"word{i} token{i * 7 % 113}" for i in range(200))
    excerpt = long[:60]  # fully contained in the long doc
    j = ngram_jaccard(excerpt, long)
    c = ngram_containment(excerpt, long)
    assert c > 0.95          # excerpt detected
    assert j < 0.2           # ...which jaccard would have missed
    assert ngram_containment("", "") == 1.0
    assert ngram_containment("abcdefgh", "zzzzzzzz") == 0.0


def test_near_dup_pipeline_containment_metric(ray_session):
    from zen3geo_ray.stages.dedup import near_dup_pipeline

    base = "alpha beta gamma delta epsilon zeta eta theta " * 12
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": [base, base[:120], "completely different content here"],
    })
    out = near_dup_pipeline(
        rd.from_arrow(docs), id_col="doc_id", threshold=0.9,
        metric="containment", n_buckets=4,
    ).to_pandas()
    pairs = set(zip(out["a"], out["b"]))
    assert (1, 2) in pairs
    assert "containment" in out.columns
    assert all(out["containment"] >= 0.9)


def test_weighted_jaccard_sees_multiplicity():
    from zen3geo_ray.stages.dedup import ngram_jaccard, token_weighted_jaccard

    a = "spam ham eggs"
    b = "spam spam spam spam ham eggs"  # same distinct tokens, heavy repeat
    assert token_weighted_jaccard(a, a) == 1.0
    wj = token_weighted_jaccard(a, b)
    assert wj == 3 / 6  # min-sum 3 over max-sum 6
    assert token_weighted_jaccard("", "") == 1.0
    assert token_weighted_jaccard("x", "") == 0.0


def test_incremental_exact_dedup_across_runs(ray_session, tmp_path):
    """Three runs against one persistent store: novel texts survive,
    previously-seen texts (any earlier run) are dropped, the store is
    append-only."""
    import os

    from zen3geo_ray.stages.dedup import incremental_exact_dedup

    store = str(tmp_path / "store")

    def run(ids, texts):
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(ids, pa.int64()), "text": texts,
        }))
        out = incremental_exact_dedup(ds, store, order_cols=["doc_id"])
        df = out.to_pandas()
        return sorted(df["doc_id"].tolist()) if len(df) else []

    assert run([1, 2, 3], ["aa", "bb", "aa"]) == [1, 2]   # in-run dup dropped
    assert run([4, 5, 6], ["bb", "cc", "cc"]) == [5]      # bb seen in run 1
    assert run([7], ["aa"]) == []                          # still remembered
    runs = [d for d in os.listdir(store) if d.startswith("run-")]
    # append-only: one file set per run WITH survivors (run 3 had none)
    assert len(runs) == 2


def test_incremental_exact_dedup_bloom_path(ray_session, tmp_path):
    """With bloom_threshold=0 every store lookup goes through the Bloom
    prefilter + exact verify path (the billion-hash store shape) and the
    result stays identical to the plain anti-join path."""
    from zen3geo_ray.functions import bloom as bloom_mod
    from zen3geo_ray.stages.dedup import incremental_exact_dedup

    store = str(tmp_path / "store")

    def run(ids, texts):
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(ids, pa.int64()), "text": texts,
        }))
        out = incremental_exact_dedup(ds, store, order_cols=["doc_id"],
                                      bloom_threshold=0)
        df = out.to_pandas()
        return sorted(df["doc_id"].tolist()) if len(df) else []

    assert run([1, 2, 3], ["aa", "bb", "aa"]) == [1, 2]
    bloom_mod._LAST_BUILD_STATS.clear()
    assert run([4, 5, 6, 7], ["bb", "cc", "cc", "aa"]) == [5]
    # the prefilter really ran: the distributed build recorded its merge
    assert bloom_mod._LAST_BUILD_STATS.get("driver_blobs_folded", 0) >= 1
    assert run([8], ["cc"]) == []


def test_incremental_minhash_dedup_across_runs(ray_session, tmp_path):
    from zen3geo_ray.stages.dedup import incremental_minhash_dedup

    store = str(tmp_path / "mhstore")
    base = ("the quick brown fox jumps over the lazy dog and then "
            "continues running through the wide open field all day ")

    def run(ids, texts):
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(ids, pa.int64()), "text": texts}))
        out = incremental_minhash_dedup(ds, store, agree_min=32)
        df = out.to_pandas()
        assert "__sig" not in df.columns  # internal column stripped
        return sorted(df["doc_id"].tolist()) if len(df) else []

    # run 1: store empty -> everything survives (even near-dups of each
    # other: new-vs-new is documented out of scope)
    assert run([1, 2], [base * 3, "totally unrelated content here " * 5]) == [1, 2]
    # run 2: 10 is a near-dup of stored 1 (one word changed), 11 is new
    changed = (base * 3).replace("lazy", "sleepy", 1)
    assert run([10, 11], [changed, "fresh new never-seen text " * 6]) == [11]
    # run 3: near-dup of run-2 SURVIVOR 11 -> dropped (store accumulated)
    assert run([20], ["fresh new never-seen text " * 6 + "tail"]) == []


def test_incremental_minhash_signature_store_is_binary(ray_session, tmp_path):
    # pins the fixed-size-binary signature representation: an int-list
    # column that picks up nulls in a padded bucketed-join union round-
    # trips through pandas as FLOAT arrays, corrupting values > 2^53
    import pyarrow.parquet as pq

    from zen3geo_ray.stages.dedup import incremental_minhash_dedup

    store = str(tmp_path / "mhstore2")
    ds = rd.from_arrow(pa.table({"doc_id": pa.array([1], pa.int64()),
                                 "text": ["hello world " * 10]}))
    incremental_minhash_dedup(ds, store).to_pandas()
    import os
    files = [os.path.join(r, f) for r, _, fs in os.walk(store)
             for f in fs if f.endswith(".parquet")]
    schema = pq.read_schema(files[0])
    assert pa.types.is_fixed_size_binary(schema.field("__sig").type)
    assert schema.field("__sig").type.byte_width == 64 * 8
