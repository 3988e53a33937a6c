"""Tests for partition/salting helpers, the functional API, and readers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from zen3geo_ray import api
from zen3geo_ray.sources import readers
from zen3geo_ray.sources.corpus import pages_table
from zen3geo_ray.sources.fixtures import admin_grid, scenes_table
from zen3geo_ray.stages import partition as pt


def test_salted_group_reduce_matches_direct(ray_session):
    rng = np.random.default_rng(1)
    n = 20_000
    # skewed: 80% of rows on one key
    key = np.where(rng.uniform(size=n) < 0.8, 7, rng.integers(0, 50, n))
    tbl = pa.table({"k": key, "rid": np.arange(n), "v": rng.uniform(0, 10, n)})

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k", as_index=False).agg(s=("v", "sum"), c=("v", "size"))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k", as_index=False).agg(s=("s", "sum"), c=("c", "sum"))

    out = pt.salted_group_reduce(
        rd.from_arrow(tbl).repartition(8), ["k"], partial, merge,
        salt=8, row_key_col="rid",
    ).to_pandas().sort_values("k").reset_index(drop=True)
    exp = (
        pd.DataFrame({"k": key, "v": tbl.column("v").to_numpy()})
        .groupby("k", as_index=False)
        .agg(s=("v", "sum"), c=("v", "size"))
    )
    assert np.array_equal(out["k"], exp["k"])
    assert np.array_equal(out["c"], exp["c"])
    assert np.allclose(out["s"], exp["s"])


def test_range_partition_by_morton(ray_session):
    pages = pages_table(1000)
    pts = api.from_arrow(pages).extract_text().geocode(res=10).ds
    parted = pt.range_partition_by_morton(pts, num_partitions=8)
    df = parted.to_pandas()
    assert df["partition"].nunique() <= 8
    # partitions are contiguous morton ranges: max(morton) of partition i
    # <= min(morton) of partition i+1
    g = df.groupby("partition")["morton"].agg(["min", "max"]).sort_index()
    assert (g["max"].to_numpy()[:-1] <= g["min"].to_numpy()[1:]).all()
    # roughly balanced (quantile cuts): no partition > 3x the mean
    counts = df["partition"].value_counts()
    assert counts.max() < 3 * counts.mean()


def test_api_chain_segmentation(ray_session):
    pages = pages_table(300)
    out = (
        api.from_arrow(pages)
        .extract_text(check=True)
        .geocode(res=10)
        .join_polygons(admin_grid(), how="inner")
        .assign_tiles(nx=12, ny=6)
        .to_pandas()
    )
    assert len(out) == 300
    assert {"poly_id", "tile_id", "cell"} <= set(out.columns)


def test_api_chips_and_canvas(ray_session):
    scenes = scenes_table([(0, 128, 192, 1, 1.0)])
    chips = api.from_arrow(scenes).slice_with_chips({"y": 64, "x": 64})
    assert chips.count() == 6
    # canvas projection from chip bbox rows
    from zen3geo_ray.stages.chips import chip_bboxes

    boxed = chips.map_batches(
        lambda b: chip_bboxes(b, scene_transforms={0: (0.0, 10.0, 0.1)})
    )
    canvases = boxed.canvas_from_raster().to_pandas()
    assert {"tile_id", "width", "height", "xmin", "crs"} <= set(canvases.columns)
    assert (canvases["width"] == 64).all()


def test_api_then_hook(ray_session):
    p = api.from_arrow(pa.table({"x": [1, 2, 3]}))
    out = p.then(lambda ds: ds.map_batches(
        lambda b: b.append_column("y", pa.array([v * 2 for v in b.column("x").to_pylist()])),
        batch_format="pyarrow",
    )).to_pandas()
    assert out["y"].tolist() == [2, 4, 6]


def test_manifest_search_and_list(ray_session):
    items = [
        {"uri": f"s3://bucket/item{i}", "bbox": [i * 10.0, 0.0, i * 10.0 + 5, 5.0],
         "ts": np.datetime64("2024-01-01") + np.timedelta64(i, "D")}
        for i in range(10)
    ]
    man = readers.manifest_from_items(items)
    hits = readers.search_manifest(man, bbox=(12.0, 0.0, 33.0, 4.0)).to_pandas()
    assert sorted(hits["uri"]) == [
        "s3://bucket/item1", "s3://bucket/item2", "s3://bucket/item3"
    ]
    listed = readers.list_manifest_items(
        [{"bbox": (0.0, 0.0, 11.0, 5.0)}, {"bbox": (80.0, 0.0, 95.0, 5.0)}],
        man,
    ).to_pandas()
    # search 0 -> items 0,1 (bbox overlap); search 1 -> items 8,9
    assert len(listed) == 4
    assert set(listed["search_id"]) == {0, 1}


def test_scene_tensor_batch():
    scenes = scenes_table([(0, 4, 5, 2, 3.0)])
    out = readers.scene_tensor_batch(scenes)
    data = out.column("data").to_pylist()[0]
    assert len(data) == 2 * 4 * 5
    assert all(v == 3.0 for v in data)


def test_api_rasterize_tiles_golden(ray_session):
    # end-to-end through the api: points -> tiles -> per-tile count raster
    import pyarrow as pa

    from zen3geo_ray.stages.rasterize import tile_grid_table

    pts = pa.table(
        {
            "lon": [-170.0, -170.0, 100.0],
            "lat": [-80.0, -80.0, 80.0],
        }
    )
    specs = tile_grid_table(-180, -90, 180, 90, 4, 2, 8, 8)
    out = (
        api.from_arrow(pts)
        .assign_tiles(nx=4, ny=2)
        .rasterize_tiles(specs)
        .to_pandas()
    )
    assert sorted(out["tile_id"]) == [0, 7]
    assert sum(np.sum(d) for d in out["data"]) == 3


def test_api_burn_geometries(ray_session):
    import numpy as np
    import pyarrow as pa

    from zen3geo_ray import api
    from zen3geo_ray.geom import wkb
    from zen3geo_ray.stages.rasterize import tile_grid_table

    specs = tile_grid_table(-180, -90, 180, 90, 4, 2, 8, 8)
    poly = wkb.dumps(wkb.box(-180.0, -90.0, -135.0, -45.0))  # fills tile 0
    out = api.Pipe(rd.from_arrow(specs)).burn_geometries([poly]).to_pandas()
    sums = {int(t): float(np.sum(d)) for t, d in zip(out["tile_id"], out["data"])}
    assert sums[0] > 0            # covered tile has burned pixels
    assert sums[7] == 0           # opposite corner untouched
    # polygon default agg is 'any' (reference parity); empty tiles count
    assert set(out["agg"]) <= {"any", "count"}


def test_api_multimodal_and_scoring_surface(ray_session):
    """Pipe convenience methods wrap the multimodal + scoring stages."""
    import numpy as np
    import pyarrow as pa
    import ray

    from zen3geo_ray import api
    from zen3geo_ray.sources.jpeg import write_jpeg
    from zen3geo_ray.sources.wav import write_wav
    from zen3geo_ray.stages.scoring import make_linear_model

    img = np.full((8, 8, 3), 90, np.uint8)
    out = api.from_arrow(
        pa.table({"payload": pa.array([write_jpeg(img, 95)], pa.binary())})
    ).decode_images().to_pandas()
    assert len(out) == 1 and len(out["image"].iloc[0]) == 8 * 8 * 3

    wav = write_wav(np.zeros(800, dtype=np.int16))
    a = api.from_arrow(
        pa.table({"payload": pa.array([wav], pa.binary())})
    ).decode_audio().to_pandas()
    assert a["n_samples"].iloc[0] == 800

    emb = pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([[0.1] * 64, [-0.1] * 64], pa.list_(pa.float32())),
    })
    model = make_linear_model(4, 64)
    s = api.from_arrow(emb).score(ray.put(model)).to_pandas()
    assert set(s.columns) == {"vec_id", "cls", "logit"}


def test_api_rasterize_tiles_mean(ray_session):
    import numpy as np
    import pyarrow as pa

    from zen3geo_ray import api
    from zen3geo_ray.stages.rasterize import tile_grid_table

    rng = np.random.default_rng(8)
    n = 2000
    pts = pa.table({
        "lon": pa.array(rng.uniform(-179, 179, n), pa.float64()),
        "lat": pa.array(rng.uniform(-89, 89, n), pa.float64()),
        "w": pa.array(rng.integers(1, 100, n), pa.int64()),
    })
    specs = tile_grid_table(-180, -90, 180, 90, 4, 2, 8, 8)
    out = (
        api.from_arrow(pts).assign_tiles(nx=4, ny=2)
        .rasterize_tiles(specs, agg="mean", value_col="w")
        .to_pandas()
    )
    grids = np.concatenate([np.asarray(d) for d in out["data"]])
    vals = grids[~np.isnan(grids)]
    assert len(vals) and 1 <= vals.mean() <= 100


def test_api_corpus_prep_chain(ray_session):
    import numpy as np
    from zen3geo_ray import api

    docs = pa.table({
        "doc_id": pa.array(np.arange(200, dtype=np.int64)),
        "source": pa.array(["a" if i % 3 else "b" for i in range(200)]),
        "text": pa.array([f"tok{i} alpha beta gamma delta" for i in range(200)]),
    })
    chunks = api.from_arrow(docs).chunk(size=3, overlap=1).to_pandas()
    assert {"chunk_idx", "tok_start", "n_toks", "chunk_text"} <= set(chunks)
    assert (chunks.groupby("doc_id")["chunk_idx"].max() == 1).all()

    idx = api.from_arrow(docs).invert_index().to_pandas()
    assert idx.set_index("w").loc["alpha", "df"] == 200

    mixed = api.from_arrow(docs).sample_temperature("source", "doc_id")
    sizes = mixed.to_pandas().groupby("source").size()
    import math
    assert sizes["a"] == math.floor(math.sqrt(133))
    assert sizes["b"] == math.floor(math.sqrt(67))

    sp = api.from_arrow(docs).split().to_pandas()
    assert set(sp["split"]) <= {"train", "val", "test"}
    kept = api.from_arrow(docs.append_column(
        "w", pa.array([1024] * 200, pa.int64()))).sample_weighted(
        "doc_id", "w").count()
    assert kept == 200  # weight >= denom -> p = 1


def test_jsonl_and_csv_sources_match_parquet(ray_session, tmp_path):
    """Format parity: the same rows through JSONL / CSV / parquet sources
    produce identical downstream results (read_pages_* prune after the
    read since neither format has column pushdown)."""
    import json

    import pyarrow.parquet as pq

    from zen3geo_ray.sources.readers import (
        read_pages, read_pages_csv, read_pages_jsonl)

    rows = [{"url": f"https://ex{i}.org/p", "n": i * 3, "lang": "en"}
            for i in range(50)]
    t = pa.Table.from_pylist(rows)
    pq.write_table(t, tmp_path / "pages.parquet")
    with open(tmp_path / "pages.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    with open(tmp_path / "pages.csv", "w") as f:
        f.write("url,n,lang\n")
        for r in rows:
            f.write(f"{r['url']},{r['n']},{r['lang']}\n")

    def total(ds):
        return ds.map_batches(
            lambda b: pa.table({"s": pa.array(
                [int(b.column("n").to_numpy(zero_copy_only=False).sum())],
                pa.int64())}),
            batch_format="pyarrow",
        ).sum("s")

    want = total(read_pages(str(tmp_path / "pages.parquet"),
                            columns=["url", "n"]))
    assert total(read_pages_jsonl(str(tmp_path / "pages.jsonl"),
                                  columns=["url", "n"])) == want
    assert total(read_pages_csv(str(tmp_path / "pages.csv"),
                                columns=["url", "n"])) == want


def test_api_graph_and_split_methods(ray_session):
    from zen3geo_ray import api

    e = api.from_arrow(pa.table({"src": np.array([0, 0, 1, 2], np.int64),
                                 "dst": np.array([1, 2, 2, 3], np.int64)}))
    assert e.triangle_count(n_buckets=8).to_pandas()["n_tri"][0] == 1
    core = e.kcore(k=2, rounds=3, n_buckets=8).to_pandas()
    assert sorted(core["node"]) == [0, 1, 2]
    cn = e.common_neighbors(max_degree=8, min_common=1,
                            n_buckets=8).to_pandas()
    assert len(cn) > 0
    docs = api.from_arrow(pa.table({"doc_id": pa.array([1], pa.int64()),
                                    "text": ["A b. C d! E"]}))
    parts = docs.split_sentences().to_pandas()
    assert parts["part"].tolist() == ["A b", "C d", "E"]


def test_api_round4_fluent_ops(ray_session):
    """The round-4 fluent additions compose end to end: block dedup,
    LM scoring, BM25, keep-best over LPA communities."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b c d", "a b c d", "x y z w"], pa.string()),
    })
    d = api.from_arrow(docs)
    dd = d.dedup_blocks(size=2, n_buckets=4).to_pandas()
    assert set(dd.columns) == {"doc_id", "clean_text", "n_blocks", "n_kept"}
    lm = d.lm_score(top_v=3, n_buckets=4).to_pandas()
    assert len(lm) == 3
    bm = d.bm25(["a", "x"], k=2).to_pandas()
    assert len(bm) == 2
    labels = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "dup_group": pa.array([1, 1, 3], pa.int64())}))
    meta = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "n_chars": pa.array([7, 9, 5], pa.int64())}))
    kb = api.Pipe(labels).keep_best(meta, n_buckets=4).to_pandas()
    assert kb.set_index("dup_group").loc[1, "kept_doc"] == 2
    edges = pa.table({"src": pa.array([1, 2], pa.int64()),
                      "dst": pa.array([2, 3], pa.int64())})
    lp = api.from_arrow(edges).label_propagation(rounds=1,
                                                 n_buckets=4).to_pandas()
    assert len(lp) == 3


def test_api_spatial_stats_surface(ray_session):
    """The new fluent spatial-stats/graph/stats methods are wired."""
    cells = pa.table({"cell": pa.array([0, 1, 8, 9, 9, 3] * 5,
                                       pa.int64()),
                      "lang": pa.array(["en", "en", "de", "de", "de",
                                        "fr"] * 5)})
    p = api.from_arrow(cells)
    m = p.morans_i(res=2, n_buckets=2).to_pandas()
    assert {"n_cells", "w_pairs", "moran_i", "geary_c"} <= set(m.columns)
    g = p.hotspots(res=2, n_buckets=2).to_pandas()
    assert len(g) == 5 and "gi" in g.columns
    v = p.semivariogram(res=2, max_lag=2, n_buckets=2).to_pandas()
    assert list(v.h) == [1, 2]
    d = p.dissolve(res=2, group_col="lang", n_buckets=2).to_pandas()
    assert set(d.g) == {"en", "de", "fr"}
    f = p.idw_fill(res=2, radius=1, n_buckets=2).to_pandas()
    assert (f.den > 0).all()

    edges = pa.table({"src": pa.array([0, 0, 1], pa.int64()),
                      "dst": pa.array([1, 2, 2], pa.int64())})
    cc = api.from_arrow(edges).local_clustering(n_buckets=2).to_pandas()
    assert (cc.tri == 1).all() and (cc.cc == 1.0).all()

    grp = pa.table({"g": pa.array(["a"] * 5 + ["b"] * 5),
                    "v": pa.array([1, 2, 3, 4, 5, 9, 8, 7, 6, 5],
                                  pa.int64())})
    a = api.from_arrow(grp).anova("g", "v").to_pandas()
    assert int(a.k.iloc[0]) == 2 and a.f_stat.iloc[0] > 0

    emb = pa.table({"embedding": pa.array(
        [[0.5, 0.25], [0.125, 1.0]], pa.list_(pa.float32()))})
    gm = api.from_arrow(emb).gram(dim=2, scale=1 << 8,
                                  n_buckets=2).to_pandas()
    assert len(gm) == 3


def test_api_session4_surface(ray_session, tmp_path):
    """Fluent wiring of the late session-4 terminals."""
    cells = pa.table({"cell": pa.array([0, 1, 8, 9, 9, 3] * 5,
                                       pa.int64())})
    p = api.from_arrow(cells)
    assert "lisa" in p.lisa(res=2, n_buckets=2).to_pandas().columns
    assert len(p.voronoi_assign(res=2, max_dist=1,
                                n_buckets=2).to_pandas()) > 0
    e = p.emerging_hotspots(str(tmp_path / "st"), res=2,
                            n_buckets=2).to_pandas()
    assert set(e.columns) >= {"cell", "gi_new", "status"}

    ts = pa.table({"ts": pa.array(
        np.arange(20, dtype=np.int64) * 3_600_000_000,
        pa.timestamp("us"))})
    t = api.from_arrow(ts).temporal_hotspots(n_buckets=2).to_pandas()
    assert len(t) == 20

    emb = pa.table({"embedding": pa.array(
        [[1.0, 0.1], [0.9, -0.1], [1.1, 0.0]], pa.list_(pa.float32()))})
    pc1 = api.from_arrow(emb).pca_top(dim=2, scale=1 << 8,
                                      rounds=4, n_buckets=2).to_pandas()
    assert abs(int(pc1.v.iloc[0])) == (1 << 20)  # axis-0 dominant

    edges = pa.table({"src": pa.array([0, 1, 2], pa.int64()),
                      "dst": pa.array([1, 2, 3], pa.int64())})
    ep = api.from_arrow(edges)
    assert int(ep.diameter_lb(max_hops=8).to_pandas()
               .diameter_lb.iloc[0]) == 3
    rc = ep.rich_club(ks=[1], n_buckets=2).to_pandas()
    assert int(rc.n_k.iloc[0]) == 2  # two deg-2 nodes

    docs = pa.table({"doc_id": pa.array([1], pa.int64()),
                     "text": pa.array(["a a a b b c"])})
    z = api.from_arrow(docs).zipf(top_v=3, n_buckets=2).to_pandas()
    assert int(z.v.iloc[0]) == 3

    wds = api.from_arrow(pa.table({
        "key": pa.array(["k0", "k1"]),
        "img": pa.array([b"x", b"y"], pa.binary()),
    })).write_tar_shards(str(tmp_path / "wds"), key_col="key")
    assert len(wds) >= 1


def test_api_session5_surface(ray_session):
    """Fluent wiring of the session-5 terminals."""
    cells = pa.table({"cell": pa.array([0, 0, 0, 1, 8, 9] * 5,
                                       pa.int64()),
                      "v": pa.array([2] * 30, pa.int64())})
    p = api.from_arrow(cells)
    jc = p.join_counts(res=2, n_buckets=2).to_pandas()
    assert int(jc.bb.iloc[0]) + int(jc.ww.iloc[0]) + int(jc.bw.iloc[0]) \
        == int(jc.w_pairs.iloc[0]) // 2
    eb = p.eb_rates(res=2, value_col="v", m=2, n_buckets=2).to_pandas()
    assert (eb.raw == 2.0).all()

    st = pa.table({"cell": pa.array([0, 0, 0, 0, 0, 0], pa.int64()),
                   "bin": pa.array([0, 1, 1, 2, 2, 2], pa.int64())})
    mk = api.from_arrow(st).mann_kendall(n_buckets=2).to_pandas()
    assert int(mk.s_stat.iloc[0]) == 3

    evt = pa.table({"cell": pa.array([0, 0, 9], pa.int64()),
                    "tu": pa.array([0, 10, 20], pa.int64()),
                    "eid": pa.array([1, 2, 3], pa.int64())})
    kx = api.from_arrow(evt).knox(res=2, tau_us=15, n_buckets=2) \
        .to_pandas()
    assert int(kx.x.iloc[0]) == 2  # (1,2) same-cell, (2,3) diagonal

    od = api.from_arrow(pa.table({
        "u": pa.array([1, 1], pa.int64()),
        "ts": pa.array([1, 2], pa.int64()),
        "id": pa.array([10, 11], pa.int64()),
        "cell": pa.array([4, 7], pa.int64()),
    })).od_matrix(key_col="u", ts_col="ts", id_col="id",
                  n_buckets=2).to_pandas()
    assert list(zip(od.cell_from, od.cell_to)) == [(4, 7)]

    pts = pa.table({"lon": pa.array([0.1, 5.3], pa.float64()),
                    "lat": pa.array([0.1, 4.4], pa.float64())})
    hx = api.from_arrow(pts).hexbin(size_q=3 << 20).to_pandas()
    assert {"hq", "hr"} <= set(hx.columns)

    ev2 = pa.table({"g": pa.array(["a"] * 10),
                    "v": pa.array(list(range(10)), pa.int64())})
    kv = api.from_arrow(ev2).kmv_distinct(["g"], "v", k=64).to_pandas()
    assert kv.est.iloc[0] == 10.0

    bf = api.from_arrow(pa.table({
        "v": pa.array([100, 20, 3], pa.int64())})).benford("v")
    assert bf.to_pandas().obs.sum() == 3

    edges = pa.table({"src": pa.array([0, 1, 2], pa.int64()),
                      "dst": pa.array([1, 2, 3], pa.int64())})
    ep = api.from_arrow(edges)
    hc = ep.harmonic_centrality(n_seeds=2, max_hops=3).to_pandas()
    assert (hc.h_q > 0).all()
    mis = api.from_arrow(pa.table({
        "src": pa.array([0, 1], pa.int64()),
        "dst": pa.array([1, 0], pa.int64()),
    })).maximal_independent_set(rounds=4).to_pandas()
    assert len(mis) == 1  # one endpoint of the single edge

    bip = pa.table({"src": pa.array([0, 0, 2, 2], pa.int64()),
                    "dst": pa.array([1, 3, 1, 3], pa.int64())})
    bfc = api.from_arrow(bip).butterfly_count().to_pandas()
    assert int(bfc.butterflies.iloc[0]) == 1

    we = pa.table({"src": pa.array([0, 1], pa.int64()),
                   "dst": pa.array([1, 2], pa.int64()),
                   "w": pa.array([3, 4], pa.int64())})
    msf = api.from_arrow(we).minimum_spanning_forest(rounds=4).to_pandas()
    assert sorted(msf.w.tolist()) == [3, 4]


def test_api_session6_surface(ray_session):
    """Fluent wiring of the session-6 terminals."""
    edges = pa.table({"src": pa.array([0, 1, 2], pa.int64()),
                      "dst": pa.array([1, 2, 3], pa.int64())})
    cc = api.from_arrow(edges).closeness_centrality(
        n_seeds=2, max_hops=3).to_pandas()
    assert (cc.d_sum > 0).all()

    od = pa.table({"cell_from": pa.array([1, 2], pa.int64()),
                   "cell_to": pa.array([2, 1], pa.int64()),
                   "n": pa.array([3, 3], pa.int64())})
    fr = api.from_arrow(od).flow_reciprocity(n_buckets=2).to_pandas()
    assert fr.recip_w.iloc[0] == 1.0

    st = pa.table({"cell": pa.array([0, 0, 0, 0, 0, 0], pa.int64()),
                   "bin": pa.array([0, 1, 1, 2, 2, 2], pa.int64())})
    ts = api.from_arrow(st).theil_sen(n_buckets=2).to_pandas()
    assert ts.slope.iloc[0] == 1.0

    ev = pa.table({"k": pa.array(["a", "a", "b"]),
                   "tu": pa.array([0, 3, 9], pa.int64())})
    km = api.from_arrow(ev).kaplan_meier(key_col="k", ts_col="tu",
                                         day_us=1, censor_days=1,
                                         n_buckets=2)
    assert km.num_rows == 1 and km.column("t_day")[0].as_py() == 3

    ws = api.from_arrow(pa.table({
        "cell": pa.array([8] * 2 + [9], pa.int64())})).watershed(
        res=2, n_buckets=2).to_pandas().set_index("cell")
    assert ws.loc[8, "sink"] == 9

    docs = pa.table({"source": pa.array(["s1", "s2"]),
                     "text": pa.array(["a b", "a b"])})
    js = api.from_arrow(docs).jsd_pairs(n_buckets=2).to_pandas()
    assert js.jsd.iloc[0] == 0.0

    parts = pa.table({"pid": pa.array([1, 2, 3], pa.int64()),
                      "nm": pa.array(["ring", "rink", "zzzzz"]),
                      "blk": pa.array([0, 0, 0], pa.int64())})
    ej = api.from_arrow(parts).edit_join(
        id_col="pid", text_col="nm", block_col="blk",
        max_dist=1, n_buckets=2).to_pandas()
    assert list(zip(ej.id_a, ej.id_b, ej.dist)) == [(1, 2, 1)]


def test_api_session6b_surface(ray_session, tmp_path):
    """Fluent wiring of the second session-6 batch."""
    st = pa.table({"cell": pa.array([0] * 7, pa.int64()),
                   "cat": pa.array(list(range(7)), pa.int64())})
    uc = api.from_arrow(st).uniformity_chi2(n_buckets=2).to_pandas()
    assert uc.chi2.iloc[0] == 0.0

    hb = pa.table({"cell": pa.array([0], pa.int64()),
                   "bin": pa.array([5], pa.int64())})
    he = api.from_arrow(hb).haar_energy(levels=2,
                                        n_buckets=2).to_pandas()
    assert he.energy.tolist() == [1, 1]

    ce = api.from_arrow(pa.table({
        "cell": pa.array([0, 1], pa.int64())})).clark_evans(res=2)
    assert ce.column("sum_d")[0].as_py() == 2

    tr = api.from_arrow(pa.table({
        "cell": pa.array([0, 0, 1], pa.int64())})).ruggedness(
        res=2).to_pandas().set_index("cell")
    assert int(tr.loc[0, "tri2"]) == 1

    kt = pa.table({"g": pa.array(["x", "x", "y", "y"]),
                   "v": pa.array([1, 2, 3, 4], pa.int64())})
    kw = api.from_arrow(kt).kruskal_wallis("g", "v", ["x", "y"])
    assert kw.column("n")[0].as_py() == 4

    qt = pa.table({"uid": pa.array([0, 1], pa.int64()),
                   "g": pa.array(["a", "a"]),
                   "v": pa.array([3, 9], pa.int64())})
    qn = api.from_arrow(qt).quantile_normalize(
        key_col="g", value_col="v", uid_col="uid",
        n_buckets=2).to_pandas()
    assert sorted(qn.q_value.tolist()) == [3, 9]

    nb = pa.table({"doc_id": pa.array([0, 2, 1], pa.int64()),
                   "text": pa.array(["x x", "y y", "x x"]),
                   "source": pa.array(["a", "b", "a"])})
    cf = api.from_arrow(nb).naive_bayes_confusion(
        top_v=8, n_buckets=2).to_pandas()
    assert [(r.true_source, r.pred_source) for r in cf.itertuples()] \
        == [("a", "a")]

    emb = pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array([[0.9, 0.9], [0.9, 0.8],
                               [-0.9, -0.9], [-0.8, -0.9]],
                              pa.list_(pa.float32()))})
    sil = api.from_arrow(emb).silhouette(k=2, iters=1,
                                         n_buckets=2).to_pandas()
    assert (sil.sil > 0.5).all()

    fd = pa.table({"u": pa.array([1, 1], pa.int64()),
                   "tu": pa.array([1, 2], pa.int64()),
                   "eid": pa.array([10, 11], pa.int64()),
                   "typ": pa.array(["view", "click"])})
    f = api.from_arrow(fd).funnel_depth(
        key_col="u", ts_col="tu", id_col="eid", type_col="typ",
        steps=["view", "click"], n_buckets=2).to_pandas()
    assert [(int(r.depth), int(r.n_users)) for r in f.itertuples()] \
        == [(2, 1)]

    vd = pa.table({"text": pa.array(["a b a"])})
    row = api.from_arrow(vd).vocab_drift(str(tmp_path / "vs"))
    assert row.column("v_new")[0].as_py() == 2


def test_api_session7_surface(ray_session):
    """Fluent wiring of the session-7 terminals."""
    scored = pa.table({"g": pa.array(["p", "p", "n", "n"]),
                       "v": pa.array([9, 8, 2, 1], pa.int64())})
    ap = api.from_arrow(scored).average_precision("g", "v", "p", "n",
                                                  n_buckets=2)
    assert ap.column("ap")[0].as_py() == 1.0
    gains = api.from_arrow(scored).decile_gains("g", "v", "p", "n",
                                                n_bins=2, n_buckets=2)
    assert gains.column("rate")[0].as_py() == 1.0

    ev = pa.table({"u": pa.array([1, 1], pa.int64()),
                   "tu": pa.array([1, 2], pa.int64()),
                   "eid": pa.array([10, 11], pa.int64()),
                   "typ": pa.array(["click", "purchase"]),
                   "cents": pa.array([0, 500], pa.int64())})
    at = api.from_arrow(ev).attribution(
        key_col="u", ts_col="tu", id_col="eid", type_col="typ",
        value_col="cents", conv_type="purchase", window=10,
        n_buckets=2).to_pandas()
    assert at.touch_type.tolist() == ["click"]

    ew = api.from_arrow(ev).ewma(key_col="u", ts_col="tu",
                                 id_col="eid", value_col="cents",
                                 k=2, n_buckets=2).to_pandas()
    assert ew.ewma_num.tolist() == [500 * 2 + 0]

    fd = api.from_arrow(pa.table({
        "k": pa.array([1, 1], pa.int64()),
        "d": pa.array(["a", "b"])})).fd_check("k", "d", n_buckets=2)
    assert fd.column("n_violated")[0].as_py() == 1

    pts = pa.table({"g": pa.array(["A", "B"]),
                    "cell": pa.array([0, 2], pa.int64())})
    hd = api.from_arrow(pts).hausdorff(res=6, max_dist=4, group_a="A",
                                       group_b="B", n_buckets=2)
    assert hd.column("hausdorff")[0].as_py() == 2

    edges = pa.table({"src": pa.array([1, 2, 3], pa.int64()),
                      "dst": pa.array([2, 1, 1], pa.int64())})
    sc = api.from_arrow(edges).scc(n_buckets=2).to_pandas()
    got = dict(zip(sc.node.astype(int), sc.comp.astype(int)))
    assert got == {1: 1, 2: 1, 3: 3}


def test_api_session7b_surface(ray_session):
    edges = pa.table({"src": pa.array([1, 2, 3], pa.int64()),
                      "dst": pa.array([2, 1, 1], pa.int64())})
    bt = api.from_arrow(edges).bowtie(n_buckets=2)
    assert bt.column("n_scc")[0].as_py() == 2
    assert bt.column("n_in")[0].as_py() == 1

    t = pa.table({"a": pa.array([1, 1, 2], pa.int64()),
                  "b": pa.array(["x", "x", "y"])})
    ka = api.from_arrow(t).k_anonymity(["a", "b"], 2, n_buckets=2)
    assert ka.column("n_classes_exposed")[0].as_py() == 1


def test_api_session7c_surface(ray_session):
    ev = pa.table({"y": pa.array([5, 7, 9], pa.int64()),
                   "x1": pa.array([0, 1, 2], pa.int64()),
                   "x2": pa.array([0, 1, 0], pa.int64())})
    o = api.from_arrow(ev).ols2("y", "x1", "x2")
    assert o.column("b1")[0].as_py() == 2.0

    sc = pa.table({"g": pa.array(["p"] * 10 + ["n"] * 10),
                   "v": pa.array(list(range(10)) * 2, pa.int64())})
    ps = api.from_arrow(sc).psi("g", "v", "p", "n", bin_width=5)
    assert abs(ps.column("psi")[0].as_py()) < 1e-4

    pts = pa.table({"pid": pa.array([1], pa.int64()),
                    "x": pa.array([3], pa.int64()),
                    "y": pa.array([4], pa.int64())})
    segs = pa.table({"sid": pa.array([1], pa.int64()),
                     "x0": pa.array([0], pa.int64()),
                     "y0": pa.array([0], pa.int64()),
                     "x1": pa.array([10], pa.int64()),
                     "y1": pa.array([0], pa.int64())})
    sn = api.from_arrow(pts).snap_to_segments(
        api.from_arrow(segs), radius=10, cell=8,
        n_buckets=2).to_pandas()
    assert sn.sid.tolist() == [1]


def test_api_session7d_surface(ray_session):
    edges = pa.table({"src": pa.array([1, 2, 3], pa.int64()),
                      "dst": pa.array([2, 3, 1], pa.int64())})
    ns = api.from_arrow(edges).neg_sample(1, slack=8,
                                          n_buckets=2).to_pandas()
    assert len(ns) > 0 and (ns.groupby("src").size() <= 1).all()

    cells_t = pa.table({"cell": pa.array([0], pa.int64())})
    cov = api.from_arrow(cells_t).coverage(res=6, max_dist=1)
    assert cov.column("cum_cells")[1].as_py() == 4

    ev = pa.table({"u": pa.array([1, 1, 2], pa.int64()),
                   "tu": pa.array([0, 1, 0], pa.int64()),
                   "c": pa.array([5, 6, 5], pa.int64())})
    dt = api.from_arrow(ev).dtw_pairs(key_col="u", ts_col="tu",
                                      value_col="c", length=2,
                                      day_us=1, n_buckets=2).to_pandas()
    assert dt.dtw.tolist() == [6]   # u2 lacks day1: |6-0| on the path
