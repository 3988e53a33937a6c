"""Hilbert-curve kernel + range partitioner tests.

The kernel (geom/cells.py:hilbert_d, the flatbush / public-domain
rawrunprotected port) is pinned by TRUE Hilbert-curve invariants, not
golden numbers: d(0,0)=0; the first 2^16 curve steps fill exactly the
origin-aligned 256x256 block; consecutive distances are edge-adjacent
cells (|dx|+|dy| == 1).  Any transcription error in the ~40 bitwise ops
breaks one of these.
"""

import numpy as np
import pyarrow as pa
import ray.data as rd

from zen3geo_ray.geom import cells


def _grid(n):
    xs, ys = np.meshgrid(np.arange(n, dtype=np.uint32),
                         np.arange(n, dtype=np.uint32))
    return xs.ravel(), ys.ravel()


def test_hilbert_origin_block_is_a_perfect_subcurve():
    xs, ys = _grid(256)
    d = cells.hilbert_d(xs, ys).astype(np.int64)
    assert d[0] == 0  # d(0,0) = 0
    # the 2^16 cells of the origin-aligned 256x256 block are exactly
    # curve steps 0..2^16-1 (Hilbert visits aligned blocks contiguously)
    assert np.array_equal(np.sort(d), np.arange(256 * 256))
    # consecutive steps are edge-adjacent (the defining property)
    order = np.argsort(d)
    dx = np.abs(np.diff(xs[order].astype(np.int64)))
    dy = np.abs(np.diff(ys[order].astype(np.int64)))
    assert int(np.max(dx + dy)) == 1 and int(np.min(dx + dy)) == 1


def test_hilbert_matches_sql_mirror_on_random_cells(ray_session):
    import duckdb

    rng = np.random.default_rng(3)
    nx = rng.integers(0, 1 << 16, 500).astype(np.int64)
    ny = rng.integers(0, 1 << 15, 500).astype(np.int64)
    want = cells.hilbert_d(nx.astype(np.uint32),
                           ny.astype(np.uint32)).astype(np.int64)
    con = duckdb.connect()
    con.register("xy_src", __import__("pandas").DataFrame(
        {"i": np.arange(500), "nx": nx, "ny": ny}))
    sql = ("WITH xy AS (SELECT i, nx, ny FROM xy_src), "
           + cells.sql_hilbert_ctes("xy", "i")
           + " SELECT hkey FROM hfin ORDER BY i")
    got = con.sql(sql).fetchdf()["hkey"].to_numpy()
    assert np.array_equal(got, want)


def test_hilbert_of_res_guard_and_range():
    lon = np.array([-180.0, 0.0, 179.9, 180.0])
    lat = np.array([-90.0, 0.0, 89.9, 90.0])
    h = cells.hilbert_of(lon, lat, 15)
    assert h.dtype == np.int64 and (h >= 0).all() and (h < 1 << 32).all()
    try:
        cells.hilbert_of(lon, lat, 16)
    except ValueError:
        pass
    else:
        raise AssertionError("res=16 must raise (16-bit kernel)")


def test_range_partition_by_hilbert_balances(ray_session):
    from zen3geo_ray.stages.partition import range_partition_by_hilbert

    rng = np.random.default_rng(11)
    n = 20_000
    tbl = pa.table({
        "lon": rng.uniform(-180, 180, n),
        "lat": rng.uniform(-90, 90, n),
    })
    out = range_partition_by_hilbert(
        rd.from_arrow(tbl).repartition(8), 8).to_pandas()
    counts = out.groupby("partition").size()
    assert len(counts) == 8
    assert counts.min() > n / 8 * 0.7 and counts.max() < n / 8 * 1.4
    # partitions are monotone in hkey (contiguous curve ranges)
    s = out.sort_values("hkey")
    assert (np.diff(s["partition"].to_numpy()) >= 0).all()


def test_geohash_published_vectors():
    """Pin the kernel to the PUBLISHED geohash test vectors, not to our
    own SQL mirror (both sides could share a bug otherwise)."""
    import numpy as np

    from zen3geo_ray.geom.cells import geohash_of

    lon = np.array([10.40744, -5.6, 0.0, -180.0, 179.999, -74.006])
    lat = np.array([57.64911, 42.6, 0.0, -90.0, 89.999, 40.7128])
    got = geohash_of(lon, lat, 8).tolist()
    assert got[0] == "u4pruydq"          # wikipedia's canonical vector
    assert got[1].startswith("ezs42")    # Niemeyer's original example
    assert got[2] == "s0000000"          # origin
    assert got[3] == "00000000"          # SW corner = all-zero code
    assert got[5].startswith("dr5reg")   # NYC (verified reference hash)


def test_geohash_prefix_nesting():
    """Curve invariant: a point's p=8 hash is prefixed by its p=4 hash
    (geohash cells nest), and nearby points share long prefixes."""
    import numpy as np

    from zen3geo_ray.geom.cells import geohash_of

    rng = np.random.default_rng(3)
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-90, 90, 200)
    g8 = geohash_of(lon, lat, 8)
    g4 = geohash_of(lon, lat, 4)
    assert all(a.startswith(b) for a, b in zip(g8, g4))
    base = geohash_of(np.array([2.3522]), np.array([48.8566]), 8)[0]
    near = geohash_of(np.array([2.35220001]), np.array([48.85660001]), 8)[0]
    assert near[:6] == base[:6]
