"""HTTP(S) range-read transport (sources/remote.py) — the /vsicurl/
analog: remote GeoTIFF / FlatGeobuf-bbox / zarr reads against a local
http.server, with pushdown assertions on the bytes actually served."""

import http.server
import os
import threading
import urllib.parse

import numpy as np
import pyarrow as pa
import pytest


class _RangeHandler(http.server.BaseHTTPRequestHandler):
    """Static file server with bytes= Range support and a served-bytes
    log (the object-store stand-in)."""

    root = None
    served = None      # list of (path, n_bytes)
    honor_range = True

    def _file(self):
        rel = urllib.parse.unquote(self.path.lstrip("/"))
        p = os.path.normpath(os.path.join(self.root, rel))
        return p if p.startswith(os.path.normpath(self.root)) else None

    def do_HEAD(self):
        p = self._file()
        if p is None or not os.path.isfile(p):
            self.send_error(404)
            return
        self.send_response(200)
        self.send_header("Content-Length", str(os.path.getsize(p)))
        self.end_headers()

    def do_GET(self):
        p = self._file()
        if p is None or not os.path.isfile(p):
            self.send_error(404)
            return
        with open(p, "rb") as f:
            data = f.read()
        rng = self.headers.get("Range")
        if rng and rng.startswith("bytes=") and self.honor_range:
            a_s, b_s = rng[6:].split("-")
            a = int(a_s)
            b = int(b_s) if b_s else len(data) - 1
            b = min(b, len(data) - 1)
            body = data[a:b + 1]
            self.send_response(206)
            self.send_header("Content-Range",
                             f"bytes {a}-{b}/{len(data)}")
        else:
            body = data
            self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)
        type(self).served.append((self.path, len(body)))

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def http_root(tmp_path):
    """(url, root_dir, served_log) — threaded server over tmp files."""
    served = []
    handler = type("H", (_RangeHandler,),
                   {"root": str(tmp_path), "served": served})
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    yield url, str(tmp_path), served
    srv.shutdown()
    srv.server_close()


def test_range_bytes_semantics(http_root):
    from zen3geo_ray.sources.remote import (HttpRangeSource, RangeBytes,
                                            open_range)

    url, root, served = http_root
    payload = bytes(range(256)) * 1000  # 256 000 bytes
    with open(os.path.join(root, "blob.bin"), "wb") as f:
        f.write(payload)
    rb = RangeBytes(open_range(url + "/blob.bin"), block=4096)
    assert len(rb) == len(payload)
    assert rb[:16] == payload[:16]
    assert rb[100:200] == payload[100:200]          # same cache block
    assert rb[250_000:255_000] == payload[250_000:255_000]
    assert rb[123] == payload[123]
    # big read bypasses the cache, exact
    assert rb[1000:200_000] == payload[1000:200_000]
    # far less than N-requests-per-access: block cache coalesces
    assert rb.requests <= 6

    # a server that ignores Range must still read correctly
    handler = type("H2", (_RangeHandler,),
                   {"root": root, "served": [], "honor_range": False})
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        u2 = f"http://127.0.0.1:{srv.server_address[1]}/blob.bin"
        rb2 = RangeBytes(HttpRangeSource(u2))
        assert rb2[5:25] == payload[5:25]
        assert rb2[200_000:200_100] == payload[200_000:200_100]
    finally:
        srv.shutdown()
        srv.server_close()


def test_remote_geotiff_overview_pushdown(http_root):
    """A remote COG overview read range-fetches a FRACTION of the
    file: header + IFD chain + the overview's tiles, never the
    full-resolution bytes (rioxarray.py:54-60 doctest surface)."""
    from zen3geo_ray.sources.geotiff import (read_geotiff,
                                             read_geotiff_uri,
                                             write_geotiff)

    url, root, served = http_root
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 60_000, size=(1024, 1024)).astype(np.uint16)
    tif = write_geotiff(arr, minx=10.0, maxy=20.0, res=0.25,
                        tiled=True, tile=128, overviews=[4, 16])
    with open(os.path.join(root, "scene.tif"), "wb") as f:
        f.write(tif)

    stats: dict = {}
    got = read_geotiff_uri(url + "/scene.tif", overview_level=0,
                           stats=stats)
    ref = read_geotiff(tif, overview_level=0)
    np.testing.assert_array_equal(got["data"], ref["data"])
    assert (got["minx"], got["maxy"], got["res"]) \
        == (ref["minx"], ref["maxy"], ref["res"])
    # level-0 overview is 1/16 of the pixels; whole file ~2.2 MB
    assert stats["size"] == len(tif)
    assert stats["bytes_fetched"] < len(tif) // 4
    # full-res remote read still exact
    full = read_geotiff_uri(url + "/scene.tif")
    np.testing.assert_array_equal(full["data"], arr[None])


def test_remote_flatgeobuf_bbox_pushdown(http_root):
    """Remote FlatGeobuf + bbox + Hilbert R-tree: identical rows to
    the local bbox read, and the server ships only header + index +
    hit-feature windows."""
    from zen3geo_ray.geom import wkb
    from zen3geo_ray.sources.flatgeobuf import (read_flatgeobuf,
                                                write_flatgeobuf)

    url, root, served = http_root
    # 40 x 50 grid of unit squares = 2000 features
    ids, names, blobs = [], [], []
    minx, miny, maxx, maxy = [], [], [], []
    k = 0
    for gy in range(50):
        for gx in range(40):
            x0, y0 = gx * 2.0, gy * 2.0
            ring = [(x0, y0), (x0 + 1, y0), (x0 + 1, y0 + 1),
                    (x0, y0 + 1), (x0, y0)]
            ids.append(k)
            names.append(f"cell-{k}")
            blobs.append(wkb.dumps({"type": "Polygon",
                                    "coords": [ring]}))
            minx.append(x0), miny.append(y0)
            maxx.append(x0 + 1), maxy.append(y0 + 1)
            k += 1
    t = pa.table({
        "poly_id": pa.array(ids, pa.int64()),
        "name": pa.array(names, pa.string()),
        "geometry_wkb": pa.array(blobs, pa.binary()),
        "minx": pa.array(minx, pa.float64()),
        "miny": pa.array(miny, pa.float64()),
        "maxx": pa.array(maxx, pa.float64()),
        "maxy": pa.array(maxy, pa.float64())})
    path = os.path.join(root, "grid.fgb")
    write_flatgeobuf(t, path, index=True)
    fsize = os.path.getsize(path)

    bbox = (10.2, 30.2, 14.8, 34.8)
    local = read_flatgeobuf(path, bbox=bbox).to_pandas()
    served.clear()
    remote = read_flatgeobuf(url + "/grid.fgb", bbox=bbox).to_pandas()
    assert len(local) > 0
    assert local.sort_values("poly_id").reset_index(drop=True) \
        .equals(remote.sort_values("poly_id").reset_index(drop=True))
    shipped = sum(n for _, n in served)
    assert shipped < fsize // 2  # pushdown: a fraction of the file


def test_remote_zarr_chunks(ray_session, http_root):
    """zarr over HTTP: per-chunk GETs, byte-identical cube, missing
    chunk -> fill_value; group stores need array= (no HTTP listing)."""
    import ray.data as rd  # noqa: F401

    from zen3geo_ray.sources.zarrlite import (read_zarr_meta, write_zarr,
                                              zarr_chunk_dataset)

    url, root, served = http_root
    arr = np.arange(7 * 10, dtype=np.int32).reshape(7, 10)
    store = os.path.join(root, "cube.zarr")
    write_zarr(store, arr, chunks=[4, 4], attrs={"units": "K"})

    m_local = read_zarr_meta(store)
    m_http = read_zarr_meta(url + "/cube.zarr")
    assert m_http["shape"] == m_local["shape"]
    assert m_http["attrs"] == m_local["attrs"]

    def cube(ds, shape):
        out = np.full(shape, -999, dtype=np.float64)
        for r in ds.iter_rows():
            o0, o1, n0, n1 = r["o0"], r["o1"], r["n0"], r["n1"]
            out[o0:o0 + n0, o1:o1 + n1] = \
                np.asarray(r["data"]).reshape(n0, n1)
        return out

    got = cube(zarr_chunk_dataset(url + "/cube.zarr"), arr.shape)
    np.testing.assert_array_equal(got, arr.astype(np.float64))

    # drop one chunk object -> fill_value, same as the local contract
    os.remove(os.path.join(store, "1.1"))
    got2 = cube(zarr_chunk_dataset(url + "/cube.zarr"), arr.shape)
    ref = arr.astype(np.float64).copy()
    ref[4:7, 4:8] = 0.0  # fill_value
    np.testing.assert_array_equal(got2, ref)

    with pytest.raises(ValueError, match="remote group store"):
        read_zarr_meta(url + "/nogroup.zarr")


def test_read_vector_remote_formats(http_root):
    """read_vector over http: .fgb rides the ranged path; GeoJSON and
    zipped shapefile fall back to a one-GET temp-file dispatch —
    identical POLYGONS rows either way."""
    import json

    from zen3geo_ray.sources.readers import read_vector

    url, root, served = http_root
    gj = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {"name": "tri"},
         "geometry": {"type": "Polygon",
                      "coordinates": [[[0, 0], [2, 0], [1, 2], [0, 0]]]}},
        {"type": "Feature", "properties": {"name": "sq"},
         "geometry": {"type": "Polygon",
                      "coordinates": [[[5, 5], [6, 5], [6, 6], [5, 6],
                                       [5, 5]]]}}]}
    with open(os.path.join(root, "layer.geojson"), "w") as f:
        json.dump(gj, f)
    local = read_vector(os.path.join(root, "layer.geojson")).to_pandas()
    remote = read_vector(url + "/layer.geojson").to_pandas()
    assert local.equals(remote)
    bb = read_vector(url + "/layer.geojson", bbox=(4, 4, 7, 7)) \
        .to_pandas()
    assert list(bb["name"]) == ["sq"]


# --- live STAC API client (sources/stac.py) -------------------------------


class _StacHandler(http.server.BaseHTTPRequestHandler):
    """Canned STAC API: 7 items in collection c1, page size clamped to
    3, POST /search pages via a next link with body+merge (token),
    GET /search and /collections/c1/items page via href links."""

    items = [
        {"type": "Feature", "id": f"item-{i}",
         "bbox": [float(i), 0.0, float(i) + 1.0, 1.0],
         "properties": {"datetime": f"2020-01-0{i + 1}T00:00:00Z"},
         "assets": {"data": {"href": f"s3://bucket/scene-{i}.tif"}}}
        for i in range(7)
    ]
    PAGE = 3
    post_bodies = None  # log

    def _send(self, payload):
        body = json.dumps(payload).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _page(self, items, tok, mk_next):
        sel = items[tok:tok + self.PAGE]
        page = {"type": "FeatureCollection", "features": sel,
                "links": []}
        nxt = tok + self.PAGE
        if nxt < len(items):
            page["links"].append(mk_next(nxt))
        return page

    def _filtered(self, bbox):
        if bbox is None:
            return self.items
        return [it for it in self.items
                if it["bbox"][0] <= bbox[2] and it["bbox"][2] >= bbox[0]]

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        body = json.loads(self.rfile.read(n)) if n else {}
        type(self).post_bodies.append(body)
        tok = int(body.get("token", 0))
        items = self._filtered(body.get("bbox"))
        base = f"http://{self.headers['Host']}/search"
        self._send(self._page(
            items, tok,
            lambda nxt: {"rel": "next", "href": base,
                         "body": {"token": nxt}, "merge": True}))

    def do_GET(self):
        u = urllib.parse.urlparse(self.path)
        q = urllib.parse.parse_qs(u.query)
        tok = int(q.get("token", ["0"])[0])
        bbox = None
        if "bbox" in q:
            bbox = [float(v) for v in q["bbox"][0].split(",")]
        if u.path == "/search":
            items = self._filtered(bbox)
        elif u.path == "/collections/c1/items":
            items = self.items
        else:
            self.send_error(404)
            return
        base = f"http://{self.headers['Host']}{u.path}"
        qs = dict(q, token=None)

        def mk_next(nxt):
            params = {k: v[0] for k, v in q.items() if k != "token"}
            params["token"] = str(nxt)
            return {"rel": "next",
                    "href": base + "?" + urllib.parse.urlencode(params)}

        self._send(self._page(items, tok, mk_next))

    def log_message(self, *a):
        pass


import json  # noqa: E402


@pytest.fixture()
def stac_api():
    logs = []
    handler = type("S", (_StacHandler,), {"post_bodies": logs})
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", logs
    srv.shutdown()
    srv.server_close()


def test_stac_search_post_pagination(stac_api):
    from zen3geo_ray.sources.stac import stac_search

    url, logs = stac_api
    items = stac_search(url, collections=["c1"], limit=3)
    assert [i["id"] for i in items] == [f"item-{i}" for i in range(7)]
    # three pages -> three POSTs, token merged into the original body
    assert len(logs) == 3
    assert logs[1]["token"] == 3 and logs[1]["collections"] == ["c1"]
    # max_items truncates mid-page and stops paging
    logs.clear()
    few = stac_search(url, limit=3, max_items=4)
    assert [i["id"] for i in few] == ["item-0", "item-1", "item-2",
                                     "item-3"]
    assert len(logs) == 2  # stopped after the second page


def test_stac_search_get_bbox_and_lister(stac_api):
    from zen3geo_ray.sources.stac import (stac_collection_items,
                                          stac_search)

    url, _ = stac_api
    hits = stac_search(url, bbox=(2.5, 0.0, 4.5, 1.0), method="GET",
                       limit=3)
    assert [i["id"] for i in hits] == ["item-2", "item-3", "item-4"]
    listed = stac_collection_items(url, "c1", limit=3)
    assert [i["id"] for i in listed] == [f"item-{i}" for i in range(7)]


def test_stac_manifest_end_to_end(ray_session, stac_api):
    from zen3geo_ray.sources.readers import search_manifest
    from zen3geo_ray.sources.stac import search_items_manifest

    url, _ = stac_api
    man = search_items_manifest(url, limit=3)
    df = man.to_pandas().sort_values("uri").reset_index(drop=True)
    assert len(df) == 7
    assert df["uri"][0] == "s3://bucket/scene-0.tif"
    assert str(df["ts"][0]).startswith("2020-01-01")
    # the deferred manifest search composes on top (bbox prune)
    sel = search_manifest(man, bbox=(2.5, 0.0, 4.5, 1.0)).to_pandas()
    assert sorted(sel["uri"]) == [f"s3://bucket/scene-{i}.tif"
                                  for i in (2, 3, 4)]


def test_remote_parquet_column_pushdown(ray_session, http_root):
    """Remote parquet via ranged reads: row-group descriptors ship to
    tasks, columns= prunes at the TRANSPORT level (untouched column
    chunks never leave the server), rows identical to a local read."""
    import pyarrow.parquet as pq

    from zen3geo_ray.sources.remote import read_parquet_uris

    import pyarrow as pa

    url, root, served = http_root
    # a realistically-sized object (the 64 KiB speculative footer read
    # is noise only when the file dwarfs it): 20x the sf0.01 documents
    src = "/root/testdata/sf0.01/documents.parquet"
    base = pq.read_table(src)
    reps = []
    for r in range(20):
        ids = pa.array(
            base.column("doc_id").to_numpy(zero_copy_only=False)
            + r * 1_000_000, pa.int64())
        reps.append(base.set_column(0, "doc_id", ids))
    t = pa.concat_tables(reps)
    path = os.path.join(root, "documents.parquet")
    pq.write_table(t, path, row_group_size=1000)
    fsize = os.path.getsize(path)

    served.clear()
    slim = read_parquet_uris(url + "/documents.parquet",
                             columns=["doc_id", "lang"],
                             rows_per_task=2000).to_pandas()
    slim_bytes = sum(n for _, n in served)
    local = t.select(["doc_id", "lang"]).to_pandas()
    assert slim.sort_values("doc_id").reset_index(drop=True) \
        .equals(local.sort_values("doc_id").reset_index(drop=True))
    # the text column dominates the file; pruning must skip it
    assert slim_bytes < fsize // 2

    served.clear()
    full = read_parquet_uris(url + "/documents.parquet",
                             rows_per_task=2000).to_pandas()
    full_bytes = sum(n for _, n in served)
    assert len(full) == len(t)
    assert sorted(full.columns) == sorted(t.column_names)
    assert slim_bytes < full_bytes // 2

    # multi-object read: two halves, one Dataset
    h1 = os.path.join(root, "part-0.parquet")
    h2 = os.path.join(root, "part-1.parquet")
    n2 = len(t) // 2
    pq.write_table(t.slice(0, n2), h1, row_group_size=1000)
    pq.write_table(t.slice(n2), h2, row_group_size=1000)
    both = read_parquet_uris(
        [url + "/part-0.parquet", url + "/part-1.parquet"],
        columns=["doc_id"], rows_per_task=2000).to_pandas()
    assert sorted(both["doc_id"]) == sorted(
        t.column("doc_id").to_pylist())


def test_remote_tar_shards(ray_session, http_root):
    """WebDataset shards over HTTP: field probe from one shard, each
    task GETs its own shard, rows identical to the local read."""
    import ray.data as rd

    from zen3geo_ray.sources.tarshards import (read_tar_shards,
                                               write_tar_shards)

    url, root, served = http_root
    t = pa.table({
        "key": pa.array([f"s{i:04d}" for i in range(40)], pa.string()),
        "txt": pa.array([f"doc {i}".encode() for i in range(40)],
                        pa.binary()),
        "cls": pa.array([str(i % 3).encode() for i in range(40)],
                        pa.binary())})
    out = os.path.join(root, "shards")
    write_tar_shards(rd.from_arrow(t).repartition(4), out,
                     key_col="key")
    shard_urls = [url + "/shards/" + f for f in sorted(os.listdir(out))
                  if f.endswith(".tar")]
    assert len(shard_urls) >= 4
    local = read_tar_shards(out).to_pandas().sort_values("key") \
        .reset_index(drop=True)
    remote = read_tar_shards(shard_urls).to_pandas() \
        .sort_values("key").reset_index(drop=True)
    assert local.equals(remote)
    assert len(remote) == 40


def test_remote_corpus_end_to_end(ray_session, http_root):
    """The object-store deployment shape end to end: the pages corpus
    served over HTTP (ranged parquet, column-pruned to url/html/lang),
    piped through extract -> geocode -> broadcast PIP join -> zonal
    aggregate — identical per-cell results to the local-disk run."""
    import pyarrow.parquet as pq

    from zen3geo_ray.sources.corpus import pages_table
    from zen3geo_ray.sources.fixtures import admin_grid
    from zen3geo_ray.sources.remote import read_parquet_uris
    from zen3geo_ray.stages import zonal
    from zen3geo_ray.stages.extract import pages_to_points
    from zen3geo_ray.stages.join import make_pip_join_fn, polygons_to_blob
    import ray

    url, root, served = http_root
    t = pages_table(800)
    path = os.path.join(root, "pages.parquet")
    pq.write_table(t, path, row_group_size=200)

    blob = ray.put(polygons_to_blob(admin_grid(nx=8, ny=4)))

    def run(pages_ds):
        pts = pages_to_points(pages_ds, res=6, batch_size=256)
        joined = pts.map_batches(make_pip_join_fn(blob),
                                 batch_format="pyarrow")
        return zonal.zonal_aggregate(joined, ["poly_id"], {}) \
            .to_pandas().sort_values("poly_id").reset_index(drop=True)

    import ray.data as rd

    local = run(rd.from_arrow(t.select(["url", "html", "lang"])))
    remote = run(read_parquet_uris(url + "/pages.parquet",
                                   columns=["url", "html", "lang"],
                                   rows_per_task=200))
    assert local.equals(remote)
    assert len(local) > 0
