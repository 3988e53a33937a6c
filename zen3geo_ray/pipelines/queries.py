"""Driver-verified query suite: one entry per operator (SURVEY.md §2).

Each ``q_*`` takes ``sf_dir`` (a directory of testdata parquet tables) and
returns a lazy ``ray.data.Dataset``; ``ORACLES`` holds the matching
ANSI-SQL (DuckDB) statement computing the identical result over the same
tables.  Column names AND value arithmetic are mirrored exactly — float
expressions are written with the same operation order on both sides so
IEEE doubles match bit-for-bit; aggregates restricted to exact cases
(integer sums, whole-number doubles, passthrough values).

NO ray.init here — the driver owns the session.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions import hashing
from ..functions import text as textfn
from ..functions.geocode import geocode_id, sql_geocode_exprs
from ..geom import cells
from ..stages import ann, dedup, knn, rasterize as rz, scan, stack, zonal
from ..stages.join import PointInPolygonJoin, polygons_to_blob
from ..sources.fixtures import admin_grid

RES_ZONAL = 6
RES_KNN = 5
KNN_RING = 2
KNN_K = 5
ADMIN_NX, ADMIN_NY = 24, 12
TILE_NX, TILE_NY, TILE_PX = 8, 4, 16

KNN_QUERIES = [(0, -98.0, 39.0), (1, 10.0, 51.0), (2, -3.0, 40.0)]


def _read(sf_dir: str, table: str, columns=None, rows_per_block: int = 20_000):
    """Column-pruned read with a bounded block count.

    Ray's default read splitting can shatter small files into hundreds of
    blocks; on high-task-overhead hosts the per-task cost then dominates
    every downstream shuffle (measured 23.5s -> 3.4s for a 600k-row join
    just from capping blocks).  Cap at ~1 block per CPU.

    ``rows_per_block`` sizes blocks to the downstream work: ~20k rows for
    cheap columnar transforms (the default), smaller (~1k) when the map
    stage runs a heavy per-text kernel that should parallelize even on a
    small table.
    """
    import ray
    import ray.data as rd

    path = f"{sf_dir}/{table}.parquet"
    try:
        cpus = max(2, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        cpus = 8
    try:
        n_rows = pq.read_metadata(path).num_rows
    except Exception:
        n_rows = 1 << 30
    nblocks = int(min(cpus, max(1, n_rows // rows_per_block)))
    return rd.read_parquet(path, columns=columns, override_num_blocks=nblocks)


# --- geocode (SURVEY §2.3 per-record maps: lang/url -> lon/lat -> cell) ---


def geocode_docs_batch(batch: pa.Table, res: int = RES_ZONAL) -> pa.Table:
    key = batch.column("doc_id").to_numpy(zero_copy_only=False)
    langs = batch.column("lang").to_pylist()
    lon, lat = geocode_id(key, langs)
    cell = cells.cell_of(lon, lat, res)
    return pa.table(
        {
            "doc_id": pa.array(key),
            "lon": pa.array(lon, pa.float64()),
            "lat": pa.array(lat, pa.float64()),
            "cell": pa.array(cell, pa.int64()),
        }
    )


def q_geocode(sf_dir: str):
    return _read(sf_dir, "documents", ["doc_id", "lang"]).map_batches(
        geocode_docs_batch, batch_format="pyarrow"
    )


def _geocoded(sf_dir: str, res: int = RES_ZONAL, keep_extra: list[str] | None = None):
    cols = ["doc_id", "lang"] + [c for c in (keep_extra or [])
                                 if c not in ("doc_id", "lang")]

    def fn(batch: pa.Table) -> pa.Table:
        key = batch.column("doc_id").to_numpy(zero_copy_only=False)
        langs = batch.column("lang").to_pylist()
        lon, lat = geocode_id(key, langs)
        cell = cells.cell_of(lon, lat, res)
        out = batch.drop_columns(["lang"] if not (keep_extra and "lang" in keep_extra) else [])
        return (
            out.append_column("lon", pa.array(lon, pa.float64()))
            .append_column("lat", pa.array(lat, pa.float64()))
            .append_column("cell", pa.array(cell, pa.int64()))
        )

    return _read(sf_dir, "documents", cols).map_batches(fn, batch_format="pyarrow")


def _sql_geo_cte(res: int = RES_ZONAL, extra: str = "") -> str:
    lon_e, lat_e = sql_geocode_exprs("doc_id", "lang")
    cell_e = cells.sql_cell_expr("lon", "lat", res)
    return (
        f"WITH geo0 AS (SELECT doc_id{extra}, {lon_e} AS lon, {lat_e} AS lat "
        f"FROM documents), "
        f"geo AS (SELECT *, {cell_e} AS cell FROM geo0)"
    )


# --- zonal stats (SURVEY op #10b groupby-aggregate on cell keys) ----------


def q_zonal(sf_dir: str):
    pts = _geocoded(sf_dir, RES_ZONAL, keep_extra=["n_chars"])
    return zonal.zonal_aggregate(pts, ["cell"], {"n_chars": ["sum"]})


# --- spatial statistics (ESDA trio over the occupancy histogram) ----------


def _sql_counts_cte() -> str:
    """geo + per-cell occupancy histogram, the shared spatial-stats base."""
    return (f"{_sql_geo_cte()}, counts AS (SELECT cell, "
            f"CAST(COUNT(*) AS BIGINT) AS x FROM geo GROUP BY cell)")


def q_moran(sf_dir: str):
    """Global Moran's I + Geary's C of per-cell doc counts under rook
    adjacency — corpus reduces to the GRID-bounded occupancy histogram
    (one bucketed shuffle), pair/moment statistics are exact Python
    ints (z' = n*x - S so the 1/n factors cancel), each float is ONE
    shared division of exactly-cast integers
    (stages/spatial_stats.py:morans_i)."""
    from ..stages.spatial_stats import morans_i

    return morans_i(_geocoded(sf_dir, RES_ZONAL), res=RES_ZONAL)


def _sql_moran() -> str:
    nc, nr = cells._grid_dims(RES_ZONAL)
    return f"""
{_sql_counts_cte()},
sc AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
              CAST(SUM(x) AS HUGEINT) AS s,
              CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q2
       FROM counts),
pairs AS (
  SELECT a.x AS xa, b.x AS xb FROM counts a
    JOIN counts b ON b.cell = a.cell + 1
    WHERE a.cell % {nc} < {nc - 1}
  UNION ALL
  SELECT a.x, b.x FROM counts a
    JOIN counts b ON b.cell = a.cell + {nc}
    WHERE a.cell // {nc} < {nr - 1}),
ps AS (SELECT CAST(COUNT(*) AS HUGEINT) AS wd,
              COALESCE(SUM(CAST(xa AS HUGEINT) * xb), 0) AS p1,
              COALESCE(SUM(CAST(xa AS HUGEINT) + xb), 0) AS p2,
              COALESCE(SUM((CAST(xa AS HUGEINT) - xb)
                           * (CAST(xa AS HUGEINT) - xb)), 0) AS d
       FROM pairs)
SELECT CAST(n AS BIGINT) AS n_cells, CAST(2 * wd AS BIGINT) AS w_pairs,
       CASE WHEN wd > 0 AND n * n * q2 - n * s * s <> 0 THEN
         CAST(n * (2 * (n * n * p1 - n * s * p2 + wd * s * s))
              AS DOUBLE)
         / CAST((2 * wd) * (n * n * q2 - n * s * s) AS DOUBLE)
       ELSE NULL END AS moran_i,
       CASE WHEN wd > 0 AND n * n * q2 - n * s * s <> 0 THEN
         CAST((n - 1) * n * n * d AS DOUBLE)
         / CAST(2 * wd * (n * n * q2 - n * s * s) AS DOUBLE)
       ELSE NULL END AS geary_c
FROM sc, ps"""


def q_moran_w(sf_dir: str):
    """Value-weighted Moran's I: per-cell SUMS of n_chars instead of
    record counts (the field-statistics variant — same exact-int
    machinery, x = Σ n_chars per cell)."""
    from ..stages.spatial_stats import morans_i

    pts = _geocoded(sf_dir, RES_ZONAL, keep_extra=["n_chars"])
    return morans_i(pts, res=RES_ZONAL, value_col="n_chars")


def _sql_moran_w() -> str:
    base = _sql_moran()
    return base.replace(
        "counts AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS x "
        "FROM geo GROUP BY cell)",
        "counts AS (SELECT cell, CAST(SUM(n_chars) AS BIGINT) AS x "
        "FROM geo GROUP BY cell)").replace(
        _sql_geo_cte(), _sql_geo_cte(extra=", n_chars"))


def q_gi_star(sf_dir: str):
    """Per-cell Getis-Ord Gi* hotspot z-scores (self-inclusive rook
    neighborhood) — integer numerator n*L_i - S*W_i, one shared
    sqrt-of-exact-ints shape, VALUE-checked
    (stages/spatial_stats.py:getis_ord_g)."""
    from ..stages.spatial_stats import getis_ord_g

    return getis_ord_g(_geocoded(sf_dir, RES_ZONAL), res=RES_ZONAL)


def _sql_gi_ctes(extra: str = "") -> str:
    """Shared Gi* CTE chain (geo -> counts -> neighborhood sums ->
    ``gsel`` per-cell z-scores); ``extra`` threads additional geo
    columns (e.g. ", lang") for composed consumers."""
    nc, nr = cells._grid_dims(RES_ZONAL)
    return f"""
{_sql_geo_cte(extra=extra)},
counts AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS x
           FROM geo GROUP BY cell),
sc AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
              CAST(SUM(x) AS HUGEINT) AS s,
              CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q2
       FROM counts),
nb AS (
  SELECT a.cell, b.x FROM counts a JOIN counts b ON b.cell = a.cell + 1
    WHERE a.cell % {nc} < {nc - 1}
  UNION ALL
  SELECT a.cell, b.x FROM counts a JOIN counts b ON b.cell = a.cell - 1
    WHERE a.cell % {nc} > 0
  UNION ALL
  SELECT a.cell, b.x FROM counts a JOIN counts b ON b.cell = a.cell + {nc}
    WHERE a.cell // {nc} < {nr - 1}
  UNION ALL
  SELECT a.cell, b.x FROM counts a JOIN counts b ON b.cell = a.cell - {nc}
    WHERE a.cell // {nc} > 0),
agg AS (SELECT cell, SUM(CAST(x AS HUGEINT)) AS nsum,
               CAST(COUNT(*) AS HUGEINT) AS ncnt
        FROM nb GROUP BY cell),
g AS (SELECT c.cell, c.x,
             1 + COALESCE(a.ncnt, 0) AS wi,
             c.x + COALESCE(a.nsum, 0) AS li
      FROM counts c LEFT JOIN agg a ON a.cell = c.cell),
gsel AS (SELECT g.cell, g.x,
       CAST(wi AS BIGINT) AS wi, CAST(li AS BIGINT) AS li,
       CASE WHEN n > 1 AND n > wi AND n * q2 - s * s > 0 THEN
         CAST(n * li - s * wi AS DOUBLE)
         / sqrt(CAST((n * q2 - s * s) * (n * wi - wi * wi) AS DOUBLE)
                / (CAST(n AS BIGINT) - 1.0))
       ELSE NULL END AS gi
FROM g, sc)"""


def _sql_gi_star() -> str:
    return f"""
{_sql_gi_ctes()}
SELECT cell, x, wi, li, gi FROM gsel"""


def q_dissolve(sf_dir: str):
    """Per-language DISSOLVED cell-region shape stats (the ST_Union /
    dissolve analog on the grid tessellation): area = #cells,
    perimeter = 4*area - 2*rook-adjacent same-lang pairs, squareness =
    16*area/perim^2 — distinct (lang, cell) pairs are the only shuffle,
    all-integer measures (stages/spatial_stats.py:dissolve_stats)."""
    from ..stages.spatial_stats import dissolve_stats

    pts = _geocoded(sf_dir, RES_ZONAL, keep_extra=["lang"])
    return dissolve_stats(pts, res=RES_ZONAL, group_col="lang")


def _sql_dissolve() -> str:
    nc, nr = cells._grid_dims(RES_ZONAL)
    return f"""
{_sql_geo_cte(extra=", lang")},
lc AS (SELECT DISTINCT lang AS g, cell FROM geo),
adj AS (
  SELECT a.g FROM lc a JOIN lc b ON b.g = a.g AND b.cell = a.cell + 1
    WHERE a.cell % {nc} < {nc - 1}
  UNION ALL
  SELECT a.g FROM lc a JOIN lc b ON b.g = a.g AND b.cell = a.cell + {nc}
    WHERE a.cell // {nc} < {nr - 1}),
ar AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS area FROM lc GROUP BY g),
ad AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS adj FROM adj GROUP BY g)
SELECT ar.g, ar.area, COALESCE(ad.adj, 0) AS adj_pairs,
       4 * ar.area - 2 * COALESCE(ad.adj, 0) AS perimeter,
       CASE WHEN 4 * ar.area - 2 * COALESCE(ad.adj, 0) > 0 THEN
         CAST(16 * ar.area AS DOUBLE)
         / CAST((4 * ar.area - 2 * COALESCE(ad.adj, 0))
                * (4 * ar.area - 2 * COALESCE(ad.adj, 0)) AS DOUBLE)
       ELSE NULL END AS squareness
FROM ar LEFT JOIN ad ON ad.g = ar.g"""


RIPLEY_MAX_LAG = 3


def q_ripley(sf_dir: str):
    """Cell-binned Ripley's K (point-pattern clustering curve): ordered
    point-pair counts within Chebyshev cell distance <= h as exact
    integers, one float normalization M*pairs/n^2
    (stages/spatial_stats.py:ripley_k)."""
    from ..stages.spatial_stats import ripley_k

    return ripley_k(_geocoded(sf_dir, RES_ZONAL), res=RES_ZONAL,
                    max_lag=RIPLEY_MAX_LAG)


def _sql_ripley() -> str:
    nc, nr = cells._grid_dims(RES_ZONAL)
    k, m = RIPLEY_MAX_LAG, None
    m = nc * nr
    return f"""
{_sql_counts_cte()},
offs AS (SELECT dxr.i - {k} AS dx, dyr.i AS dy
         FROM (SELECT unnest(range({2 * k + 1})) AS i) dxr,
              (SELECT unnest(range({k + 1})) AS i) dyr
         WHERE GREATEST(abs(dxr.i - {k}), dyr.i) BETWEEN 1 AND {k}
           AND (dyr.i > 0 OR dxr.i - {k} > 0)),
pr AS (SELECT GREATEST(abs(o.dx), o.dy) AS h,
              CAST(a.x AS HUGEINT) * b.x AS xx
       FROM counts a
       CROSS JOIN offs o
       JOIN counts b ON b.cell = a.cell + o.dy * {nc} + o.dx
       WHERE a.cell % {nc} + o.dx >= 0
         AND a.cell % {nc} + o.dx <= {nc - 1}
         AND a.cell // {nc} + o.dy <= {nr - 1}),
ring AS (SELECT h, CAST(2 * SUM(xx) AS BIGINT) AS rp FROM pr GROUP BY h),
win AS (SELECT CAST(SUM(CAST(x AS HUGEINT) * (x - 1)) AS BIGINT) AS w0,
               CAST(SUM(x) AS BIGINT) AS n FROM counts)
SELECT s.h,
       CAST(w0 + SUM(COALESCE(r.rp, 0)) OVER (ORDER BY s.h)
            AS BIGINT) AS pairs,
       CASE WHEN n > 0 THEN
         CAST({m} * (w0 + SUM(COALESCE(r.rp, 0)) OVER (ORDER BY s.h))
              AS DOUBLE) / CAST(n * n AS DOUBLE)
       ELSE NULL END AS k
FROM (SELECT unnest(range(1, {k + 1})) AS h) s
LEFT JOIN ring r ON r.h = s.h, win"""


def q_dispersion(sf_dir: str):
    """Quadrat-count index of dispersion (VMR) + the chi-square CSR
    statistic over the FULL grid (empty cells are real zero quadrats)
    — all-integer numerator/denominator, two shared float shapes
    (stages/spatial_stats.py:dispersion_index)."""
    from ..stages.spatial_stats import dispersion_index

    return dispersion_index(_geocoded(sf_dir, RES_ZONAL), res=RES_ZONAL)


def _sql_dispersion() -> str:
    nc, nr = cells._grid_dims(RES_ZONAL)
    m = nc * nr
    return f"""
{_sql_counts_cte()},
agg AS (SELECT CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q2,
               CAST(SUM(x) AS HUGEINT) AS n FROM counts)
SELECT CAST({m} AS BIGINT) AS m_cells, CAST(n AS BIGINT) AS n_points,
       CASE WHEN n > 0 THEN
         CAST({m} * ({m} * q2 - n * n) AS DOUBLE)
         / CAST(n * {m} * ({m} - 1) AS DOUBLE)
       ELSE NULL END AS vmr,
       CASE WHEN n > 0 THEN
         CAST(({m} - 1) * ({m} * ({m} * q2 - n * n)) AS DOUBLE)
         / CAST(n * {m} * ({m} - 1) AS DOUBLE)
       ELSE NULL END AS chi2
FROM agg"""


CE_MAX_DIST = 3


def q_clark_evans(sf_dir: str):
    """Clark-Evans nearest-neighbor index of the occupied-cell pattern
    (the NN-distance companion of dispersion's quadrat VMR): per-cell
    Chebyshev ring distance to the nearest other occupied cell
    (bounded search), R = mean_nn / (0.5·sqrt(M/n)) the one float
    shape (stages/spatial_stats.py:clark_evans)."""
    from ..stages.spatial_stats import clark_evans

    return clark_evans(_geocoded(sf_dir, RES_ZONAL), res=RES_ZONAL,
                       max_dist=CE_MAX_DIST)


def _sql_clark_evans() -> str:
    nc, nr = cells._grid_dims(RES_ZONAL)
    m = nc * nr
    d = CE_MAX_DIST
    offs = ", ".join(f"({dx}, {dy})"
                     for dy in range(-d, d + 1)
                     for dx in range(-d, d + 1)
                     if (dx, dy) != (0, 0))
    return f"""
{_sql_counts_cte()},
occ AS MATERIALIZED (SELECT cell, cell % {nc} AS xx, cell // {nc} AS yy
                     FROM counts),
offs(dx, dy) AS (VALUES {offs}),
nn AS (SELECT a.cell,
              CAST(MIN(GREATEST(ABS(d.dx), ABS(d.dy))) AS BIGINT)
                AS dist
       FROM occ a CROSS JOIN offs d
       JOIN occ b ON b.cell = a.cell + d.dy * {nc} + d.dx
       WHERE a.xx + d.dx BETWEEN 0 AND {nc - 1}
         AND a.yy + d.dy BETWEEN 0 AND {nr - 1}
       GROUP BY 1),
agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_found,
               CAST(COALESCE(SUM(dist), 0) AS BIGINT) AS sum_d FROM nn),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM occ)
SELECT tot.n AS n_occ, agg.n_found, tot.n - agg.n_found AS n_far,
       agg.sum_d, CAST({m} AS BIGINT) AS m_cells,
       CASE WHEN agg.n_found > 0 AND tot.n > 0 THEN
         (CAST(agg.sum_d AS DOUBLE) / CAST(agg.n_found AS DOUBLE))
         / (0.5 * sqrt({m}.0 / CAST(tot.n AS DOUBLE)))
       ELSE NULL END AS r_ce
FROM tot CROSS JOIN agg"""


def q_join_counts(sf_dir: str):
    """Binary join-count statistics (Cliff-Ord BB/WW/BW) over the
    occupancy histogram: marker = count strictly above the
    occupied-cell mean (integer predicate n*x > S), rook adjacency,
    directed-once pair counts + the free-sampling E[BB] (one float
    division of exact ints)
    (stages/spatial_stats.py:join_count_stats)."""
    from ..stages.spatial_stats import join_count_stats

    return join_count_stats(_geocoded(sf_dir, RES_ZONAL), res=RES_ZONAL)


def _sql_join_counts() -> str:
    nc, nr = cells._grid_dims(RES_ZONAL)
    return f"""
{_sql_counts_cte()},
sc AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
              CAST(SUM(x) AS HUGEINT) AS s FROM counts),
pairs AS (
  SELECT a.x AS xa, b.x AS xb FROM counts a
    JOIN counts b ON b.cell = a.cell + 1
    WHERE a.cell % {nc} < {nc - 1}
  UNION ALL
  SELECT a.x, b.x FROM counts a
    JOIN counts b ON b.cell = a.cell + {nc}
    WHERE a.cell // {nc} < {nr - 1}),
js AS (SELECT CAST(COUNT(*) AS HUGEINT) AS wd,
  COALESCE(SUM(CASE WHEN n * xa > s AND n * xb > s
                    THEN 1 ELSE 0 END), 0) AS bb,
  COALESCE(SUM(CASE WHEN n * xa <= s AND n * xb <= s
                    THEN 1 ELSE 0 END), 0) AS ww,
  COALESCE(SUM(CASE WHEN (n * xa > s) <> (n * xb > s)
                    THEN 1 ELSE 0 END), 0) AS bw
  FROM pairs, sc),
blk AS (SELECT CAST(COUNT(*) AS HUGEINT) AS nbk
        FROM counts, sc WHERE n * x > s)
SELECT CAST(n AS BIGINT) AS n_cells, CAST(nbk AS BIGINT) AS n_black,
       CAST(2 * wd AS BIGINT) AS w_pairs, CAST(bb AS BIGINT) AS bb,
       CAST(ww AS BIGINT) AS ww, CAST(bw AS BIGINT) AS bw,
       CASE WHEN n > 1 THEN
         CAST(wd * nbk * (nbk - 1) AS DOUBLE)
         / CAST(n * (n - 1) AS DOUBLE)
       ELSE NULL END AS e_bb
FROM sc, js, blk"""


MK_RES = 4                        # 32 x 16 grid: ~80 events per cell
MK_BIN_US = 86_400_000_000        # daily bins over the 30-day window


def q_mk_trend(sf_dir: str):
    """Per-cell MANN-KENDALL trend test over daily event counts (the
    emerging-hotspot trend primitive): events geocode by user_id
    (neutral anchor), S = pair sign sums and the tie-corrected
    variance numerator are exact integers, z is one shared float
    (stages/spatial_stats.py:mann_kendall)."""
    from ..stages.spatial_stats import mann_kendall

    def prep(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        lon, lat = geocode_id(uid, ["xx"] * len(b))
        cell = cells.cell_of(lon, lat, MK_RES)
        t = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"cell": pa.array(cell, pa.int64()),
                         "bin": pa.array(t // MK_BIN_US)})

    ev = _read(sf_dir, "events", ["user_id", "ts"]).map_batches(
        prep, batch_format="pyarrow")
    return mann_kendall(ev)


def _sql_mk_trend() -> str:
    lon_e, lat_e = sql_geocode_exprs("user_id", "'xx'")
    cell_e = cells.sql_cell_expr("lon", "lat", MK_RES)
    return f"""
WITH g0 AS (SELECT {lon_e} AS lon, {lat_e} AS lat,
                   epoch_us(ts) // {MK_BIN_US} AS bin FROM events),
cb AS (SELECT {cell_e} AS cell, bin, CAST(COUNT(*) AS BIGINT) AS x
       FROM g0 GROUP BY 1, 2),
pr AS (SELECT a.cell,
              CAST(SUM(CASE WHEN b.x > a.x THEN 1
                            WHEN b.x < a.x THEN -1 ELSE 0 END)
                   AS BIGINT) AS s
       FROM cb a JOIN cb b ON b.cell = a.cell AND b.bin > a.bin
       GROUP BY 1),
tt AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS t FROM cb GROUP BY 1),
ties AS (SELECT cell,
                CAST(SUM(tc * (tc - 1) * (2 * tc + 5)) AS BIGINT)
                AS tie18
         FROM (SELECT cell, x, CAST(COUNT(*) AS BIGINT) AS tc
               FROM cb GROUP BY 1, 2) GROUP BY 1)
SELECT tt.cell, tt.t AS t_bins,
       COALESCE(pr.s, 0) AS s_stat,
       tt.t * (tt.t - 1) * (2 * tt.t + 5) - ties.tie18 AS var18,
       CASE WHEN tt.t * (tt.t - 1) * (2 * tt.t + 5) - ties.tie18 > 0
            THEN CAST(CASE WHEN COALESCE(pr.s, 0) > 0
                           THEN COALESCE(pr.s, 0) - 1
                           WHEN COALESCE(pr.s, 0) < 0
                           THEN COALESCE(pr.s, 0) + 1
                           ELSE 0 END AS DOUBLE)
                 / sqrt(CAST(tt.t * (tt.t - 1) * (2 * tt.t + 5)
                             - ties.tie18 AS DOUBLE) / 18.0)
            ELSE NULL END AS z
FROM tt JOIN ties ON ties.cell = tt.cell
LEFT JOIN pr ON pr.cell = tt.cell"""


def q_dow_chi2(sf_dir: str):
    """Per-cell DAY-OF-WEEK chi-square uniformity test (the
    seasonality screen beside mk_trend): 7-category counts with real
    zeros, i_num = Σ(7o−n)² exact integer, chi2 = i_num/(7n) the one
    float (stages/spatial_stats.py:uniformity_chi2)."""
    from ..stages.sequence import KM_DAY_US
    from ..stages.spatial_stats import uniformity_chi2

    def prep(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        lon, lat = geocode_id(uid, ["xx"] * len(b))
        cell = cells.cell_of(lon, lat, MK_RES)
        t = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"cell": pa.array(cell, pa.int64()),
                         "cat": pa.array((t // KM_DAY_US) % 7)})

    ev = _read(sf_dir, "events", ["user_id", "ts"]).map_batches(
        prep, batch_format="pyarrow")
    return uniformity_chi2(ev, k=7)


def _sql_dow_chi2() -> str:
    from ..stages.sequence import KM_DAY_US

    lon_e, lat_e = sql_geocode_exprs("user_id", "'xx'")
    cell_e = cells.sql_cell_expr("lon", "lat", MK_RES)
    return f"""
WITH g0 AS (SELECT {lon_e} AS lon, {lat_e} AS lat,
                   (epoch_us(ts) // {KM_DAY_US}) % 7 AS cat FROM events),
cb AS (SELECT {cell_e} AS cell, cat, CAST(COUNT(*) AS BIGINT) AS x
       FROM g0 GROUP BY 1, 2),
tt AS (SELECT cell, CAST(SUM(x) AS BIGINT) AS n,
              CAST(COUNT(*) AS BIGINT) AS c_obs FROM cb GROUP BY 1),
i1 AS (SELECT cb.cell,
              CAST(SUM((7 * cb.x - tt.n) * (7 * cb.x - tt.n))
                   AS BIGINT) AS s
       FROM cb JOIN tt USING (cell) GROUP BY 1)
SELECT tt.cell, tt.n,
       i1.s + (7 - tt.c_obs) * tt.n * tt.n AS i_num,
       CAST(i1.s + (7 - tt.c_obs) * tt.n * tt.n AS DOUBLE)
       / CAST(7 * tt.n AS DOUBLE) AS chi2
FROM tt JOIN i1 USING (cell)"""


WAVELET_LEVELS = 5


def q_wavelet(sf_dir: str):
    """Unnormalized HAAR wavelet energy spectrum per cell over daily
    event counts (multi-scale burstiness beside mk_trend/dow_chi2):
    dense 32-day window from the global min day, integer pair
    sums/differences per level, per-level Σd² exact int64
    (stages/spatial_stats.py:haar_energy)."""
    from ..stages.spatial_stats import haar_energy

    def prep(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        lon, lat = geocode_id(uid, ["xx"] * len(b))
        cell = cells.cell_of(lon, lat, MK_RES)
        t = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"cell": pa.array(cell, pa.int64()),
                         "bin": pa.array(t // MK_BIN_US)})

    ev = _read(sf_dir, "events", ["user_id", "ts"]).map_batches(
        prep, batch_format="pyarrow")
    return haar_energy(ev, levels=WAVELET_LEVELS)


def _sql_wavelet() -> str:
    lon_e, lat_e = sql_geocode_exprs("user_id", "'xx'")
    cell_e = cells.sql_cell_expr("lon", "lat", MK_RES)
    W = 1 << WAVELET_LEVELS
    ctes = [f"""g0 AS (SELECT {lon_e} AS lon, {lat_e} AS lat,
            epoch_us(ts) // {MK_BIN_US} AS bin FROM events)""",
            f"""cb AS (SELECT {cell_e} AS cell, bin,
       CAST(COUNT(*) AS BIGINT) AS x FROM g0 GROUP BY 1, 2)""",
            "org AS (SELECT MIN(bin) AS m FROM cb)",
            f"""cw AS MATERIALIZED (SELECT cell, bin - org.m AS t, x
     FROM cb CROSS JOIN org
     WHERE bin - org.m BETWEEN 0 AND {W - 1})""",
            f"""l0 AS MATERIALIZED (
  SELECT c.cell, r.t, COALESCE(cw.x, 0) AS v
  FROM (SELECT DISTINCT cell FROM cw) c
  CROSS JOIN (SELECT CAST(unnest(range({W})) AS BIGINT) AS t) r
  LEFT JOIN cw ON cw.cell = c.cell AND cw.t = r.t)"""]
    for i in range(1, WAVELET_LEVELS + 1):
        ctes.append(f"""l{i} AS MATERIALIZED (
  SELECT cell, t2 AS t,
         CAST(SUM(CASE WHEN par = 0 THEN v ELSE -v END) AS BIGINT) AS d,
         CAST(SUM(v) AS BIGINT) AS v
  FROM (SELECT cell, t // 2 AS t2, t % 2 AS par, v FROM l{i - 1})
  GROUP BY 1, 2)""")
    unions = "\nUNION ALL\n".join(
        f"SELECT cell, CAST({i} AS BIGINT) AS level,"
        f" CAST(SUM(d * d) AS BIGINT) AS energy FROM l{i} GROUP BY 1"
        for i in range(1, WAVELET_LEVELS + 1))
    return "WITH " + ",\n".join(ctes) + "\n" + unions


def q_theil_sen(sf_dir: str):
    """Per-cell THEIL-SEN robust trend slope over the same daily event
    bins as mk_trend: median of pairwise slopes, quantized as
    floor(dy*2^20/dx) so the lower-median pick is exact-integer; the
    one float is slope_q / 2^20
    (stages/spatial_stats.py:theil_sen)."""
    from ..stages.spatial_stats import theil_sen

    def prep(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        lon, lat = geocode_id(uid, ["xx"] * len(b))
        cell = cells.cell_of(lon, lat, MK_RES)
        t = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"cell": pa.array(cell, pa.int64()),
                         "bin": pa.array(t // MK_BIN_US)})

    ev = _read(sf_dir, "events", ["user_id", "ts"]).map_batches(
        prep, batch_format="pyarrow")
    return theil_sen(ev)


def _sql_theil_sen() -> str:
    from ..stages.spatial_stats import THEIL_SCALE

    lon_e, lat_e = sql_geocode_exprs("user_id", "'xx'")
    cell_e = cells.sql_cell_expr("lon", "lat", MK_RES)
    sc = THEIL_SCALE
    num = f"((b.x - a.x) * {sc})"
    dx = "(b.bin - a.bin)"
    # floor division via the nonneg-remainder identity (DuckDB // truncates)
    sexp = f"({num} - ((({num} % {dx}) + {dx}) % {dx})) // {dx}"
    return f"""
WITH g0 AS (SELECT {lon_e} AS lon, {lat_e} AS lat,
                   epoch_us(ts) // {MK_BIN_US} AS bin FROM events),
cb AS (SELECT {cell_e} AS cell, bin, CAST(COUNT(*) AS BIGINT) AS x
       FROM g0 GROUP BY 1, 2),
tt AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS t FROM cb GROUP BY 1),
sl AS (SELECT a.cell, CAST({sexp} AS BIGINT) AS s
       FROM cb a JOIN cb b ON b.cell = a.cell AND b.bin > a.bin),
rk AS (SELECT cell, s,
              ROW_NUMBER() OVER (PARTITION BY cell ORDER BY s) AS rn,
              CAST(COUNT(*) OVER (PARTITION BY cell) AS BIGINT) AS np
       FROM sl)
SELECT rk.cell, tt.t AS t_bins, rk.np AS n_pairs, rk.s AS slope_q,
       CAST(rk.s AS DOUBLE) / {float(sc)!r} AS slope
FROM rk JOIN tt ON tt.cell = rk.cell
WHERE rk.rn = (rk.np + 1) // 2"""


def q_od_matrix(sf_dir: str):
    """ORIGIN-DESTINATION flow matrix: per user consecutive event pairs
    (ordered by the exact total order ts, event_id) become cell->cell
    trips; one user-bucketed shuffle + one grid-bounded pair reduce
    (stages/sequence.py:od_counts)."""
    from ..stages.sequence import od_counts

    def prep(b: pa.Table) -> pa.Table:
        eid = b.column("event_id").to_numpy(zero_copy_only=False)
        lon, lat = geocode_id(eid, ["xx"] * len(b))
        cell = cells.cell_of(lon, lat, MK_RES)
        t = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"user_id": b.column("user_id"),
                         "event_id": b.column("event_id"),
                         "tu": pa.array(t),
                         "cell": pa.array(cell, pa.int64())})

    ev = _read(sf_dir, "events",
               ["user_id", "event_id", "ts"]).map_batches(
        prep, batch_format="pyarrow")
    return od_counts(ev, key_col="user_id", ts_col="tu",
                     id_col="event_id")


def _sql_od_matrix() -> str:
    lon_e, lat_e = sql_geocode_exprs("event_id", "'xx'")
    cell_e = cells.sql_cell_expr("lon", "lat", MK_RES)
    return f"""
WITH g0 AS (SELECT user_id, event_id, epoch_us(ts) AS tu,
                   {lon_e} AS lon, {lat_e} AS lat FROM events),
gc AS (SELECT user_id, event_id, tu, {cell_e} AS cell FROM g0),
nx AS (SELECT cell AS cell_from,
              LEAD(cell) OVER (PARTITION BY user_id
                               ORDER BY tu, event_id) AS cell_to
       FROM gc)
SELECT cell_from, cell_to, CAST(COUNT(*) AS BIGINT) AS n
FROM nx WHERE cell_to IS NOT NULL GROUP BY 1, 2"""


SCC_MIN_FLOW = 4


def q_scc(sf_dir: str):
    """STRONGLY-connected components of the thresholded OD flow graph
    (mutually-reachable mobility regions): od_matrix edges with
    n >= 4 flows feed min-pivot forward-backward label refinement —
    every inner propagation is relax + pointer jump to ITS fixpoint,
    restricted to same-block edges, so blocks only refine and the
    fixpoint blocks are exactly the SCCs
    (stages/graph.py:strongly_connected_components)."""
    from ..stages.graph import strongly_connected_components

    return strongly_connected_components(_od_edges(sf_dir))


def _sql_scc() -> str:
    return (f"WITH RECURSIVE {_sql_scc_ctes()} "
            f"SELECT node, comp FROM scc")


def _od_edges(sf_dir: str):
    """Thresholded directed OD flow edges (src, dst) — the shared base
    of the scc / bowtie queries."""
    od = q_od_matrix(sf_dir)

    def prep(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(b.column("n"),
                             pa.scalar(SCC_MIN_FLOW, pa.int64())),
            pc.not_equal(b.column("cell_from"), b.column("cell_to")))
        f = b.filter(keep)
        return pa.table({"src": f.column("cell_from"),
                         "dst": f.column("cell_to")})

    return od.map_batches(prep, batch_format="pyarrow")


def _sql_scc_ctes() -> str:
    """od -> thresholded directed edges -> reach closure -> scc, the
    shared CTE chain of the scc / bowtie oracles."""
    od = _sql_od_matrix()
    return f"""od AS MATERIALIZED ({od}),
e AS MATERIALIZED (SELECT cell_from AS a, cell_to AS b FROM od
                   WHERE n >= {SCC_MIN_FLOW} AND cell_from <> cell_to),
nd AS MATERIALIZED (
  SELECT DISTINCT v FROM (SELECT a AS v FROM e
                          UNION ALL SELECT b AS v FROM e)),
reach(a, b) AS (SELECT v, v FROM nd
                UNION
                SELECT r.a, e.b FROM reach r JOIN e ON e.a = r.b),
scc AS MATERIALIZED (
  SELECT r1.a AS node, CAST(MIN(r1.b) AS BIGINT) AS comp
  FROM reach r1 JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a
  GROUP BY r1.a)"""


def q_bowtie(sf_dir: str):
    """Bow-tie macro-structure (Broder 2000) of the OD flow graph:
    giant SCC + IN/OUT reachability counts — composes scc with two
    frontier-delta BFS sweeps seeded by the giant component
    (stages/graph.py:bowtie_decomposition)."""
    from ..stages.graph import bowtie_decomposition

    return bowtie_decomposition(_od_edges(sf_dir))


def _sql_bowtie() -> str:
    return f"""WITH RECURSIVE {_sql_scc_ctes()},
sz AS (SELECT comp, CAST(COUNT(*) AS BIGINT) AS c FROM scc
       GROUP BY comp),
giant AS (SELECT comp FROM sz ORDER BY c DESC, comp LIMIT 1),
s AS MATERIALIZED (SELECT node FROM scc
                   WHERE comp = (SELECT comp FROM giant)),
outr AS (SELECT DISTINCT r.b AS node FROM reach r
         JOIN s ON s.node = r.a
         WHERE r.b NOT IN (SELECT node FROM s)),
inr AS (SELECT DISTINCT r.a AS node FROM reach r
        JOIN s ON s.node = r.b
        WHERE r.a NOT IN (SELECT node FROM s)),
c AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM nd) AS n_nodes,
             (SELECT CAST(comp AS BIGINT) FROM giant) AS giant_comp,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM s) AS n_scc,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM inr) AS n_in,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM outr) AS n_out)
SELECT n_nodes, giant_comp, n_scc, n_in, n_out,
       n_nodes - n_scc - n_in - n_out AS n_other
FROM c"""


def q_headings(sf_dir: str):
    """Trajectory HEADING histogram: consecutive same-user moves on
    the od grid classified into 8 compass octants + 'stay' by pure
    integer sign/magnitude predicates (axis wins when strictly
    dominant, exact diagonal on |dx| == |dy|) — a constant-size map
    over the od_matrix plan, nothing new shuffles."""
    nc, _nr = cells._grid_dims(MK_RES)
    od = q_od_matrix(sf_dir)

    def head(b: pa.Table) -> pa.Table:
        cf = b.column("cell_from").to_numpy(zero_copy_only=False)
        ct = b.column("cell_to").to_numpy(zero_copy_only=False)
        n = b.column("n").to_numpy(zero_copy_only=False)
        dx = ct % nc - cf % nc
        dy = ct // nc - cf // nc
        lab = np.full(len(cf), "stay", dtype=object)
        ax, ay = np.abs(dx), np.abs(dy)
        east = (ax > ay) & (dx > 0)
        west = (ax > ay) & (dx < 0)
        north = (ay > ax) & (dy > 0)
        south = (ay > ax) & (dy < 0)
        diag = (ax == ay) & (ax > 0)
        lab[east] = "E"
        lab[west] = "W"
        lab[north] = "N"
        lab[south] = "S"
        lab[diag & (dx > 0) & (dy > 0)] = "NE"
        lab[diag & (dx > 0) & (dy < 0)] = "SE"
        lab[diag & (dx < 0) & (dy > 0)] = "NW"
        lab[diag & (dx < 0) & (dy < 0)] = "SW"
        import pandas as pd

        df = pd.DataFrame({"heading": lab, "n": n}).groupby(
            "heading", sort=False, as_index=False)["n"].sum()
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    parts = od.map_batches(head, batch_format="pyarrow")

    def finalize(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = b.to_pandas().groupby("heading", as_index=False)["n"].sum()
        df["n"] = df["n"].astype(np.int64)
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    return parts.repartition(1).map_batches(finalize,
                                            batch_format="pyarrow")


def _sql_headings() -> str:
    nc, _nr = cells._grid_dims(MK_RES)
    od = _sql_od_matrix()
    return f"""
WITH od AS MATERIALIZED ({od}),
d AS (SELECT n,
             cell_to % {nc} - cell_from % {nc} AS dx,
             cell_to // {nc} - cell_from // {nc} AS dy
      FROM od),
h AS (SELECT n, CASE
  WHEN ABS(dx) > ABS(dy) AND dx > 0 THEN 'E'
  WHEN ABS(dx) > ABS(dy) AND dx < 0 THEN 'W'
  WHEN ABS(dy) > ABS(dx) AND dy > 0 THEN 'N'
  WHEN ABS(dy) > ABS(dx) AND dy < 0 THEN 'S'
  WHEN ABS(dx) = ABS(dy) AND dx > 0 AND dy > 0 THEN 'NE'
  WHEN ABS(dx) = ABS(dy) AND dx > 0 AND dy < 0 THEN 'SE'
  WHEN ABS(dx) = ABS(dy) AND dx < 0 AND dy > 0 THEN 'NW'
  WHEN ABS(dx) = ABS(dy) AND dx < 0 AND dy < 0 THEN 'SW'
  ELSE 'stay' END AS heading FROM d)
SELECT heading, CAST(SUM(n) AS BIGINT) AS n FROM h GROUP BY 1"""


KANON_K = 5
KANON_QI = ("c_nationkey", "c_mktsegment")


def q_kanon(sf_dir: str):
    """k-anonymity audit of customer quasi-identifiers (nation x
    segment): class sizes fold combiner-first, every class whole
    inside one bucket so the driver reduce sees n_buckets summary
    rows (stages/profile.py:k_anonymity)."""
    from ..stages.profile import k_anonymity

    cust = _read(sf_dir, "customer", list(KANON_QI))
    return k_anonymity(cust, list(KANON_QI), KANON_K)


def _sql_kanon() -> str:
    qi = ", ".join(KANON_QI)
    return f"""
WITH cls AS (SELECT {qi}, CAST(COUNT(*) AS BIGINT) AS c
             FROM customer GROUP BY {qi})
SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(MIN(c) AS BIGINT) AS min_class,
       CAST(COALESCE(SUM(CASE WHEN c < {KANON_K} THEN c END), 0)
            AS BIGINT) AS n_rows_exposed,
       CAST(SUM(CASE WHEN c < {KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_classes_exposed
FROM cls"""


PATHS_K = 5


def q_paths(sf_dir: str):
    """User-journey PATH mining (the product-analytics 'top paths'
    report): per user the first 5 event types in the exact (ts, id)
    total order joined with '>' into a path string, counted globally —
    one bucketed user shuffle, vectorized per-key head via
    position-from-start, tiny path-domain reduce."""
    import pandas as pd

    from ..stages.bucketed import bucketed_groupby

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                  "event_type"]).map_batches(
        lambda b: pa.table({
            "user_id": b.column("user_id"),
            "tu": b.column("ts").cast(pa.int64()),
            "event_id": b.column("event_id"),
            "event_type": b.column("event_type")}),
        batch_format="pyarrow")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "tu", "event_id"],
                          kind="mergesort")
        pos = g.groupby("user_id", sort=False).cumcount()
        head = g[pos < PATHS_K]
        paths = head.groupby("user_id", sort=False)["event_type"] \
            .agg(">".join)
        out = paths.to_frame("path").groupby("path", sort=False) \
            .size().reset_index(name="n_users")
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    parts = bucketed_groupby(ev, ["user_id"], fold, n_buckets=16)

    def finalize(b: pa.Table) -> pa.Table:
        import pandas as pd

        df = b.to_pandas().groupby("path", as_index=False)["n_users"] \
            .sum()
        df["n_users"] = df["n_users"].astype(np.int64)
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    return parts.repartition(1).map_batches(finalize,
                                            batch_format="pyarrow")


def _sql_paths() -> str:
    return f"""
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tu, event_id
           FROM events),
r AS (SELECT user_id, event_type,
    ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY tu, event_id) AS rn
  FROM e),
p AS (SELECT user_id,
    STRING_AGG(event_type, '>' ORDER BY rn) AS path
  FROM r WHERE rn <= {PATHS_K} GROUP BY user_id)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
FROM p GROUP BY path"""


Q7_NATION_A, Q7_NATION_B = "NATION_1", "NATION_2"


def q_q7_volume(sf_dir: str):
    """TPC-H Q7-shaped shipping-volume chain: lineitem revenue between
    two nations in BOTH directions, grouped by (supp_nation,
    cust_nation, ship year) — broadcast supplier->nation lookup, two
    bucketed hash joins (orders x customer-of-the-two-nations,
    lineitem x enriched orders), year via searchsorted over calendar
    year starts, exact int64 cents."""
    import datetime

    import ray

    from ..stages.hashjoin import bucketed_join
    from ..stages.join import make_broadcast_lookup_join

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    names = dict(zip(nat.column("n_nationkey").to_pylist(),
                     nat.column("n_name").to_pylist()))
    pair_keys = {k for k, v in names.items()
                 if v in (Q7_NATION_A, Q7_NATION_B)}

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    blob = {
        "l_suppkey": sup.column("s_suppkey").to_numpy(
            zero_copy_only=False),
        "s_nationkey": sup.column("s_nationkey").to_numpy(
            zero_copy_only=False),
    }
    ref = ray.put(blob) if ray.is_initialized() else blob
    j_sup = make_broadcast_lookup_join(
        ref, key_col="l_suppkey", value_cols={"s_nationkey": pa.int64()})

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    pk = sorted(pair_keys)

    def ckeys(b: pa.Table) -> pa.Table:
        nk = b.column("c_nationkey").to_numpy(zero_copy_only=False)
        f = b.filter(pa.array(np.isin(nk, pk)))
        return pa.table({"o_custkey": f.column("c_custkey"),
                         "c_nationkey": f.column("c_nationkey")})

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    o_enriched = bucketed_join(
        orders, cust.map_batches(ckeys, batch_format="pyarrow"),
        ["o_custkey"], n_buckets=32,
    ).map_batches(lambda b: b.select(["o_orderkey", "c_nationkey"]),
                  batch_format="pyarrow")

    # calendar-year starts spanning the whole epoch-representable
    # range a shipdate column can plausibly hold; a timestamp OUTSIDE
    # [1970, 2100) fails loudly instead of silently clamping to the
    # table edges (round-4 advice item 1)
    years = list(range(1970, 2101))
    starts = np.array([int(datetime.datetime(
        y, 1, 1, tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
        for y in years], dtype=np.int64)

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice",
                "l_discount", "l_shipdate"])

    def lprep(b: pa.Table) -> pa.Table:
        t = _li_rev_cols(b, ["l_orderkey", "l_suppkey"])
        ts = b.column("l_shipdate").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        idx = np.searchsorted(starts, ts, side="right")
        if len(idx) and (idx.min() < 1 or idx.max() >= len(years)):
            raise ValueError(
                "l_shipdate outside the supported [1970, 2100) "
                "calendar-year range")
        yr = np.array(years, dtype=np.int64)[idx - 1]
        t = t.append_column("l_year", pa.array(yr, pa.int64()))
        t = j_sup(t)
        f = t.filter(pa.array(np.isin(
            t.column("s_nationkey").to_numpy(zero_copy_only=False), pk)))
        return pa.table({"o_orderkey": f.column("l_orderkey"),
                         "s_nationkey": f.column("s_nationkey"),
                         "l_year": f.column("l_year"),
                         "rev": f.column("rev")})

    joined = bucketed_join(li.map_batches(lprep, batch_format="pyarrow"),
                           o_enriched, ["o_orderkey"], n_buckets=32)
    names_ref = ray.put(names) if ray.is_initialized() else names

    def tag(b: pa.Table) -> pa.Table:
        sn = b.column("s_nationkey").to_numpy(zero_copy_only=False)
        cn = b.column("c_nationkey").to_numpy(zero_copy_only=False)
        f = b.filter(pa.array(sn != cn))   # the two nations differ
        nm = ray.get(names_ref) if ray.is_initialized() else names_ref
        sns = f.column("s_nationkey").to_numpy(zero_copy_only=False)
        cns = f.column("c_nationkey").to_numpy(zero_copy_only=False)
        return pa.table({
            "supp_nation": pa.array([nm[int(k)] for k in sns],
                                    pa.string()),
            "cust_nation": pa.array([nm[int(k)] for k in cns],
                                    pa.string()),
            "l_year": f.column("l_year"),
            "rev": f.column("rev")})

    tagged = joined.map_batches(tag, batch_format="pyarrow")
    return zonal.zonal_aggregate(
        tagged, ["supp_nation", "cust_nation", "l_year"],
        {"rev": ["sum"]})


def _sql_q7_volume() -> str:
    a, b = Q7_NATION_A, Q7_NATION_B
    return f"""
WITH j AS (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
    CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
    CAST(ROUND(l.l_extendedprice * 100.0) AS BIGINT) *
    (100 - CAST(ROUND(l.l_discount * 100.0) AS BIGINT)) AS rev
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = '{a}' AND n2.n_name = '{b}')
      OR (n1.n_name = '{b}' AND n2.n_name = '{a}')))
SELECT supp_nation, cust_nation, l_year,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(rev) AS BIGINT) AS rev_sum
FROM j GROUP BY 1, 2, 3"""


def q_delta_upsert(sf_dir: str):
    """CROSS-RUN SCD-1 upsert store: run 1 upserts the even-orderkey
    half of orders keyed by customer, run 2 the odd half; the returned
    view is the LATEST order (by date, orderkey ties) per customer
    across both runs — MERGE INTO semantics over append-only parquet
    parts (state/lineage.py:upsert_store)."""
    import shutil
    import tempfile

    from ..state.lineage import upsert_store

    ords = _read(sf_dir, "orders",
                 ["o_custkey", "o_orderkey", "o_orderdate",
                  "o_orderstatus"]).map_batches(
        lambda b: pa.table({
            "o_custkey": b.column("o_custkey"),
            "o_orderkey": b.column("o_orderkey"),
            "ver": b.column("o_orderdate").cast(pa.int64()),
            "o_orderstatus": b.column("o_orderstatus")}),
        batch_format="pyarrow")

    def half(parity):
        def fn(b: pa.Table) -> pa.Table:
            ids = b.column("o_orderkey").to_numpy(zero_copy_only=False)
            return b.filter(pa.array(ids % 2 == parity))

        return fn

    store = tempfile.mkdtemp(prefix="zen3geo_upsert_")
    try:
        upsert_store(
            ords.map_batches(half(0), batch_format="pyarrow"), store,
            key_cols=["o_custkey"], order_cols=["ver", "o_orderkey"])
        view = upsert_store(
            ords.map_batches(half(1), batch_format="pyarrow"), store,
            key_cols=["o_custkey"], order_cols=["ver", "o_orderkey"])
        out = view.materialize()
    finally:
        shutil.rmtree(store, ignore_errors=True)
    return out


def _sql_delta_upsert() -> str:
    return """
WITH r AS (SELECT o_custkey, o_orderkey, epoch_us(o_orderdate) AS ver,
    o_orderstatus,
    ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY epoch_us(o_orderdate) DESC,
                                o_orderkey DESC) AS rn
  FROM orders)
SELECT o_custkey, o_orderkey, ver, o_orderstatus
FROM r WHERE rn = 1"""


SNAP_R = 64


def q_snap(sf_dir: str):
    """Map-matching snap: customer-derived points to their nearest
    supplier-derived segment within radius 64 (ties -> smaller seg
    id) — PBSM dilated-bbox candidacy + exact quantized rational
    point-segment distances, one cell join + one keyed min reduce
    (stages/join.py:snap_points_to_segments)."""
    from ..stages.join import snap_points_to_segments

    def mkp(b: pa.Table) -> pa.Table:
        k = b.column("c_custkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            "pid": pa.array(k),
            "x": pa.array((k * 191) % BBOX_DOM),
            "y": pa.array((k * 193) % BBOX_DOM)})

    def mks(b: pa.Table) -> pa.Table:
        k = b.column("s_suppkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        x0 = (k * 173) % BBOX_DOM
        y0 = (k * 179) % BBOX_DOM
        return pa.table({
            "sid": pa.array(k), "x0": pa.array(x0), "y0": pa.array(y0),
            "x1": pa.array(x0 + (k * 7) % 240 - 120),
            "y1": pa.array(y0 + (k * 11) % 192 - 96)})

    pts = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        mkp, batch_format="pyarrow")
    segs = _read(sf_dir, "supplier", ["s_suppkey"]).map_batches(
        mks, batch_format="pyarrow")
    return snap_points_to_segments(pts, segs, radius=SNAP_R,
                                   cell=BBOX_CELL)


def _sql_snap() -> str:
    from ..stages.join import SNAP_Q

    sx0, sy0, sdx, sdy = _segs_exprs("s_suppkey", 173, 179)
    r, q = SNAP_R, SNAP_Q
    return f"""
WITH p AS (SELECT c_custkey AS pid,
    CAST((c_custkey * 191) % {BBOX_DOM} AS BIGINT) AS x,
    CAST((c_custkey * 193) % {BBOX_DOM} AS BIGINT) AS y
  FROM customer),
s AS (SELECT s_suppkey AS sid,
    CAST({sx0} AS BIGINT) AS x0, CAST({sy0} AS BIGINT) AS y0,
    CAST({sx0} + ({sdx}) AS BIGINT) AS x1,
    CAST({sy0} + ({sdy}) AS BIGINT) AS y1
  FROM supplier),
cand AS (SELECT p.pid, s.sid, p.x, p.y, s.x0, s.y0, s.x1, s.y1
  FROM p JOIN s
  ON p.x >= LEAST(s.x0, s.x1) - {r} AND p.x <= GREATEST(s.x0, s.x1) + {r}
 AND p.y >= LEAST(s.y0, s.y1) - {r} AND p.y <= GREATEST(s.y0, s.y1) + {r}),
d AS (SELECT pid, sid,
    CASE WHEN (x - x0) * (x1 - x0) + (y - y0) * (y1 - y0) <= 0
         THEN ((x - x0) * (x - x0) + (y - y0) * (y - y0)) * {q}
         WHEN (x - x0) * (x1 - x0) + (y - y0) * (y1 - y0)
              >= (x1 - x0) * (x1 - x0) + (y1 - y0) * (y1 - y0)
         THEN ((x - x1) * (x - x1) + (y - y1) * (y - y1)) * {q}
         ELSE ((x - x0) * (y1 - y0) - (y - y0) * (x1 - x0))
            * ((x - x0) * (y1 - y0) - (y - y0) * (x1 - x0)) * {q}
            // ((x1 - x0) * (x1 - x0) + (y1 - y0) * (y1 - y0))
    END AS d2q
  FROM cand),
f AS (SELECT pid, sid, d2q,
    ROW_NUMBER() OVER (PARTITION BY pid ORDER BY d2q, sid) AS rn
  FROM d WHERE d2q <= {r * r * q})
SELECT pid, sid, CAST(d2q AS BIGINT) AS d2q FROM f WHERE rn = 1"""


def q_seasonality(sf_dir: str):
    """Hour-of-day seasonality index per event type: idx = observed /
    expected share = (n_th·N)/(n_t·n_h) over the (type, hour)
    histogram — pure-integer epoch hour, combiner-first histogram,
    the index is the one mirrored float shape per row."""
    import pandas as pd

    from ..stages.bucketed import bucketed_groupby

    ev = _read(sf_dir, "events", ["ts", "event_type"]).map_batches(
        lambda b: pa.table({
            "event_type": b.column("event_type"),
            "hour": pa.array(
                (b.column("ts").cast(pa.int64()).to_numpy(
                    zero_copy_only=False) // 3_600_000_000) % 24)}),
        batch_format="pyarrow")

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": b.column("event_type").to_pylist(),
            "hour": b.column("hour").to_numpy(zero_copy_only=False)})
        g = df.groupby(["event_type", "hour"], sort=False,
                       as_index=False).size()
        return pa.table({
            "event_type": pa.array(g["event_type"], pa.string()),
            "hour": pa.array(g["hour"].to_numpy().astype(np.int64)),
            "n": pa.array(g["size"].to_numpy().astype(np.int64))})

    hist = bucketed_groupby(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "hour"],
        lambda g: g.groupby(["event_type", "hour"], sort=False,
                            as_index=False)["n"].sum(),
        n_buckets=8).to_pandas()      # bounded: types x 24 rows
    n_t = hist.groupby("event_type")["n"].transform("sum") \
        .to_numpy().astype(np.int64)
    n_h = hist.groupby("hour")["n"].transform("sum") \
        .to_numpy().astype(np.int64)
    big_n = int(hist["n"].sum())
    n_th = hist["n"].to_numpy().astype(np.int64)
    idx = (n_th.astype(np.float64) * float(big_n)) \
        / (n_t.astype(np.float64) * n_h.astype(np.float64))
    return pa.table({
        "event_type": pa.array(hist["event_type"], pa.string()),
        "hour": pa.array(hist["hour"].to_numpy().astype(np.int64)),
        "n": pa.array(n_th),
        "idx": pa.array(idx, pa.float64())})


def _sql_seasonality() -> str:
    return """
WITH e AS (SELECT event_type,
                  (epoch_us(ts) // 3600000000) % 24 AS hour
           FROM events),
h AS (SELECT event_type, hour, CAST(COUNT(*) AS BIGINT) AS n
      FROM e GROUP BY 1, 2),
w AS (SELECT event_type, hour, n,
    CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS nt,
    CAST(SUM(n) OVER (PARTITION BY hour) AS BIGINT) AS nh,
    CAST(SUM(n) OVER () AS BIGINT) AS nn
  FROM h)
SELECT event_type, CAST(hour AS BIGINT) AS hour, n,
  CAST(n AS DOUBLE) * CAST(nn AS DOUBLE)
  / (CAST(nt AS DOUBLE) * CAST(nh AS DOUBLE)) AS idx
FROM w"""


ACF_LAGS = (1, 2, 3)


def q_acf(sf_dir: str):
    """Autocorrelation of the DAILY event-count series at lags 1..3
    (zero-filled dense day domain): exact integer moments over the
    lagged pairs, the Pearson finale in grouped_corr's mirrored float
    shape — the day histogram is bounded, so the lag loop is a free
    driver finale."""
    import pandas as pd

    from ..stages.bucketed import bucketed_groupby

    ev = _read(sf_dir, "events", ["ts"]).map_batches(
        lambda b: pa.table({
            "d": pa.array(b.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False) // 86_400_000_000)}),
        batch_format="pyarrow")

    def partial(b: pa.Table) -> pa.Table:
        u, c = np.unique(b.column("d").to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"d": pa.array(u.astype(np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    hist = bucketed_groupby(
        ev.map_batches(partial, batch_format="pyarrow"), ["d"],
        lambda g: g.groupby("d", sort=False, as_index=False)["c"].sum(),
        n_buckets=8).to_pandas().sort_values("d")
    days = hist["d"].to_numpy().astype(np.int64)
    lo, hi = int(days.min()), int(days.max())
    dense = np.zeros(hi - lo + 1, dtype=np.int64)
    dense[days - lo] = hist["c"].to_numpy().astype(np.int64)

    lags, ns, rs = [], [], []
    for lag in ACF_LAGS:
        x = dense[:-lag]
        y = dense[lag:]
        n = len(x)
        sx, sy = int(x.sum()), int(y.sum())
        sxy = int(np.dot(x, y))
        sxx, sxs = int(np.dot(x, x)), int(np.dot(y, y))
        cov = float(n) * float(sxy) - float(sx) * float(sy)
        vx = float(n) * float(sxx) - float(sx) * float(sx)
        vy = float(n) * float(sxs) - float(sy) * float(sy)
        r = (cov / (np.sqrt(vx) * np.sqrt(vy))
             if vx > 0 and vy > 0 else None)
        lags.append(lag)
        ns.append(n)
        rs.append(r)
    return pa.table({"lag": pa.array(lags, pa.int64()),
                     "n": pa.array(ns, pa.int64()),
                     "corr": pa.array(rs, pa.float64())})


def _sql_acf() -> str:
    lag_vals = ", ".join(f"({v})" for v in ACF_LAGS)
    return f"""
WITH e AS (SELECT epoch_us(ts) // 86400000000 AS d FROM events),
c AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY d),
lim AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM c),
dense AS (SELECT s.d, COALESCE(c.c, 0) AS c
  FROM (SELECT unnest(range((SELECT lo FROM lim),
                            (SELECT hi FROM lim) + 1)) AS d) s
  LEFT JOIN c ON c.d = s.d),
lags(l) AS (VALUES {lag_vals}),
p AS (SELECT l, a.c AS x, b.c AS y
      FROM lags CROSS JOIN dense a JOIN dense b ON b.d = a.d + l),
m AS (SELECT l, CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
    CAST(SUM(x * y) AS BIGINT) AS sxy,
    CAST(SUM(x * x) AS BIGINT) AS sxx,
    CAST(SUM(y * y) AS BIGINT) AS syy
  FROM p GROUP BY l),
d2 AS (SELECT l, n,
    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov,
    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy
  FROM m)
SELECT CAST(l AS BIGINT) AS lag, n,
  CASE WHEN vx > 0 AND vy > 0 THEN cov / (SQRT(vx) * SQRT(vy))
       ELSE NULL END AS corr
FROM d2"""


LORENZ_BINS = 10


def q_lorenz(sf_dir: str):
    """LORENZ concentration curve of user revenue (gini's reporting
    companion): users ranked by total cents ASCENDING are cut into 10
    rank bins straight off the user-total histogram (ties share a
    bin, the gains discipline), each bin reporting its user count,
    cents total, and cumulative share of all cents (the one float
    per row)."""
    import pandas as pd

    from ..stages.bucketed import bucketed_groupby

    ev = _read(sf_dir, "events", ["user_id", "value"]).map_batches(
        lambda b: pa.table({
            "user_id": b.column("user_id"),
            "cents": pa.array(np.floor(
                b.column("value").to_numpy(zero_copy_only=False)
                * 100.0).astype(np.int64))}),
        batch_format="pyarrow")

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "u": b.column("user_id").to_numpy(zero_copy_only=False),
            "c": b.column("cents").to_numpy(zero_copy_only=False)})
        g = df.groupby("u", sort=False, as_index=False)["c"].sum()
        return pa.Table.from_pandas(
            g, preserve_index=False).replace_schema_metadata(None)

    totals = bucketed_groupby(
        ev.map_batches(partial, batch_format="pyarrow"), ["u"],
        lambda g: g.groupby("u", sort=False, as_index=False)["c"].sum(),
        n_buckets=8).to_pandas()          # user-bounded
    # distinct-total histogram, ascending sweep (poorest bin first)
    v, cnt = np.unique(totals["c"].to_numpy().astype(np.int64),
                       return_counts=True)
    cnt = cnt.astype(np.int64)
    n = int(cnt.sum())
    total_c = int(np.dot(v, cnt))
    cumb = np.concatenate([[0], np.cumsum(cnt)[:-1]]).astype(np.int64)
    bins = (cumb * LORENZ_BINS) // n
    df = pd.DataFrame({"bin": bins, "n": cnt, "cents": v * cnt})
    agg = df.groupby("bin", as_index=False).sum().sort_values("bin")
    cum = np.cumsum(agg["cents"].to_numpy()).astype(np.int64)
    return pa.table({
        "bin": pa.array(agg["bin"].to_numpy(), pa.int64()),
        "n": pa.array(agg["n"].to_numpy(), pa.int64()),
        "cents": pa.array(agg["cents"].to_numpy(), pa.int64()),
        "cum_share": pa.array(
            cum.astype(np.float64) / float(total_c), pa.float64())})


def _sql_lorenz() -> str:
    return f"""
WITH t AS (SELECT user_id,
    CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY user_id),
h AS (SELECT c AS v, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM t GROUP BY c),
rk AS (SELECT v, cnt,
    CAST(SUM(cnt) OVER (ORDER BY v
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt
         AS BIGINT) AS cumb
  FROM h),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
               CAST(SUM(v * cnt) AS BIGINT) AS tc FROM h),
b AS (SELECT (cumb * {LORENZ_BINS}) // tot.n AS bin, cnt,
             v * cnt AS cents
      FROM rk CROSS JOIN tot),
g AS (SELECT CAST(bin AS BIGINT) AS bin,
             CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS cents
      FROM b GROUP BY bin)
SELECT bin, n, cents,
  CAST(SUM(cents) OVER (ORDER BY bin
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
  / (SELECT CAST(tc AS DOUBLE) FROM tot) AS cum_share
FROM g"""


COV_MAX_DIST = 3


def q_coverage(sf_dir: str):
    """Accessibility coverage curve: cells within h rings of an
    occupied cell, cumulative and as a grid fraction, for h =
    0..3 — pure integers off the occupancy histogram + outward
    scatter (stages/spatial_stats.py:coverage_by_ring)."""
    from ..stages.spatial_stats import coverage_by_ring

    return coverage_by_ring(_geocoded(sf_dir, RES_ZONAL),
                            res=RES_ZONAL, max_dist=COV_MAX_DIST)


def _sql_coverage() -> str:
    nc, nr = cells._grid_dims(RES_ZONAL)
    m = nc * nr
    k = COV_MAX_DIST
    return f"""
{_sql_counts_cte()},
offs AS (SELECT dxr.i - {k} AS dx, dyr.i - {k} AS dy,
                GREATEST(abs(dxr.i - {k}), abs(dyr.i - {k})) AS h
         FROM (SELECT unnest(range({2 * k + 1})) AS i) dxr,
              (SELECT unnest(range({2 * k + 1})) AS i) dyr
         WHERE GREATEST(abs(dxr.i - {k}), abs(dyr.i - {k}))
               BETWEEN 1 AND {k}),
cand AS (SELECT a.cell + o.dy * {nc} + o.dx AS cell, o.h
         FROM counts a CROSS JOIN offs o
         WHERE a.cell % {nc} + o.dx >= 0
           AND a.cell % {nc} + o.dx <= {nc - 1}
           AND a.cell // {nc} + o.dy >= 0
           AND a.cell // {nc} + o.dy <= {nr - 1}),
prox AS (SELECT cand.cell, CAST(MIN(cand.h) AS BIGINT) AS dist
         FROM cand LEFT JOIN counts c ON c.cell = cand.cell
         WHERE c.cell IS NULL GROUP BY cand.cell),
per AS (SELECT 0 AS dist, CAST(COUNT(*) AS BIGINT) AS n_cells
        FROM counts
        UNION ALL
        SELECT CAST(dist AS INTEGER), CAST(COUNT(*) AS BIGINT)
        FROM prox GROUP BY dist),
dom AS (SELECT unnest(range({k + 1})) AS dist),
fx AS (SELECT dom.dist, CAST(COALESCE(per.n_cells, 0) AS BIGINT)
              AS n_cells
       FROM dom LEFT JOIN per ON per.dist = dom.dist)
SELECT CAST(dist AS BIGINT) AS dist, n_cells,
  CAST(SUM(n_cells) OVER (ORDER BY dist
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       AS BIGINT) AS cum_cells,
  CAST(SUM(n_cells) OVER (ORDER BY dist
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       AS DOUBLE) / {float(m)} AS frac
FROM fx"""


NEG_K, NEG_SLACK = 3, 2


def q_neg_sample(sf_dir: str):
    """Deterministic negative-edge sampling over the OD flow graph
    (link-prediction training prep): mulrot63-hash candidates mapped
    onto the sorted node array, exact anti-join exclusion of real
    edges, first k survivors in lane order — no RNG state anywhere
    (stages/graph.py:negative_edge_sample)."""
    from ..stages.graph import negative_edge_sample

    return negative_edge_sample(_od_edges(sf_dir), k=NEG_K,
                                slack=NEG_SLACK)


def _sql_neg_sample() -> str:
    od = _sql_od_matrix()
    nj = NEG_K * NEG_SLACK
    mr = hashing.sql_mulrot63_ctes(
        "jx", "u, j", "CAST(u * 64 + j AS HUGEINT)")
    return f"""
WITH od AS MATERIALIZED ({od}),
e AS MATERIALIZED (SELECT cell_from AS a, cell_to AS b FROM od
                   WHERE n >= {SCC_MIN_FLOW} AND cell_from <> cell_to),
nd AS MATERIALIZED (
  SELECT DISTINCT v FROM (SELECT a AS v FROM e
                          UNION ALL SELECT b AS v FROM e)),
cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nd),
ix AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) - 1 AS i FROM nd),
jx AS (SELECT nd.v AS u, jr.j FROM nd
       CROSS JOIN (SELECT unnest(range({nj})) AS j) jr),
{mr},
cand AS (SELECT mh63.u, mh63.j, ix.v AS neg
         FROM mh63 JOIN ix ON ix.i = mh63.h % (SELECT n FROM cnt)),
f AS (SELECT u, j, neg FROM cand
      WHERE neg <> u AND NOT EXISTS (
        SELECT 1 FROM e WHERE e.a = cand.u AND e.b = cand.neg)),
d AS (SELECT u, neg, j,
             ROW_NUMBER() OVER (PARTITION BY u, neg ORDER BY j) AS dn
      FROM f),
r AS (SELECT u, neg, j,
             ROW_NUMBER() OVER (PARTITION BY u ORDER BY j) AS rn
      FROM d WHERE dn = 1)
SELECT u AS src, neg, CAST(j AS BIGINT) AS j FROM r WHERE rn <= {NEG_K}"""


DTW_L = 8


def q_dtw(sf_dir: str):
    """Pairwise DTW distance between every two users' daily-cents
    series (first 8 days from the global min day, zero-filled) —
    key-bounded histogram + one broadcast matrix, the DP is 64 scalar
    steps of pair-length vector ops
    (stages/sequence.py:dtw_pairs)."""
    from ..stages.sequence import dtw_pairs

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"]) \
        .map_batches(
        lambda b: pa.table({
            "user_id": b.column("user_id"),
            "tu": b.column("ts").cast(pa.int64()),
            "cents": pa.array(np.floor(
                b.column("value").to_numpy(zero_copy_only=False)
                * 100.0).astype(np.int64))}),
        batch_format="pyarrow")
    return dtw_pairs(ev, key_col="user_id", ts_col="tu",
                     value_col="cents", length=DTW_L)


def _sql_dtw() -> str:
    L = DTW_L
    xcols = ", ".join(
        f"CAST(COALESCE(SUM(CASE WHEN k = {i} THEN c END), 0) "
        f"AS BIGINT) AS x{i}" for i in range(L))
    # DTW DP as lateral column aliases in dependency (row-major) order
    cells = []
    for i in range(L):
        for j in range(L):
            cost = f"ABS(a.x{i} - b.x{j})"
            if i == 0 and j == 0:
                expr = cost
            elif i == 0:
                expr = f"c0_{j - 1} + {cost}"
            elif j == 0:
                expr = f"c{i - 1}_0 + {cost}"
            else:
                expr = (f"{cost} + LEAST(c{i - 1}_{j}, c{i}_{j - 1}, "
                        f"c{i - 1}_{j - 1})")
            cells.append(f"{expr} AS c{i}_{j}")
    cell_sql = ", ".join(cells)
    return f"""
WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d,
                  CAST(FLOOR(value * 100.0) AS BIGINT) AS c
           FROM events),
lim AS (SELECT MIN(d) AS lo FROM e),
s AS (SELECT user_id, d - (SELECT lo FROM lim) AS k, c FROM e),
ser AS (SELECT user_id, {xcols} FROM s GROUP BY user_id),
dp AS (SELECT a.user_id AS key_a, b.user_id AS key_b, {cell_sql}
       FROM ser a JOIN ser b ON a.user_id < b.user_id)
SELECT key_a, key_b, CAST(c{L - 1}_{L - 1} AS BIGINT) AS dtw FROM dp"""


PSI_BIN_W = 100


def q_psi(sf_dir: str):
    """Population stability index between src0 and src1 doc-length
    distributions over fixed 100-char bins — add-one smoothing makes
    every ln argument an exact integer product, per-bin quantized-ln
    terms sum order-free, ONE float division
    (stages/zonal.py:psi_two_groups)."""
    docs = _read(sf_dir, "documents", ["source", "n_chars"])
    return zonal.psi_two_groups(docs, "source", "n_chars", AB_A, AB_B,
                                bin_width=PSI_BIN_W)


def _sql_psi() -> str:
    return f"""
WITH h AS (SELECT source AS g, CAST(n_chars AS BIGINT) // {PSI_BIN_W}
                  AS v
           FROM documents WHERE source IN ('{AB_A}', '{AB_B}')),
pooled AS (SELECT v,
    CAST(SUM(CASE WHEN g = '{AB_A}' THEN 1 ELSE 0 END) AS BIGINT) AS a,
    CAST(SUM(CASE WHEN g = '{AB_B}' THEN 1 ELSE 0 END) AS BIGINT) AS b
  FROM h GROUP BY v),
tot AS (SELECT CAST(COALESCE(SUM(a), 0) AS BIGINT) AS na,
               CAST(COALESCE(SUM(b), 0) AS BIGINT) AS nbv,
               CAST(COUNT(*) AS BIGINT) AS m FROM pooled),
terms AS (SELECT CAST(FLOOR(
    CAST((a + 1) * (nbv + m) - (b + 1) * (na + m) AS DOUBLE)
    * (ln(CAST((a + 1) * (nbv + m) AS DOUBLE))
       - ln(CAST((b + 1) * (na + m) AS DOUBLE))) * {65536}.0)
    AS BIGINT) AS t
  FROM pooled CROSS JOIN tot)
SELECT na AS n_a, nbv AS n_b, m AS n_bins,
  CAST(COALESCE(SUM(t), 0) AS BIGINT) AS s,
  CASE WHEN m > 0 THEN
    CAST(COALESCE(SUM(t), 0) AS DOUBLE)
    / (CAST(na + m AS DOUBLE) * CAST(nbv + m AS DOUBLE) * {65536}.0)
  ELSE NULL END AS psi
FROM terms CROSS JOIN tot GROUP BY na, nbv, m"""


def q_ols2(sf_dir: str):
    """Two-regressor OLS of event cents on (hour-of-day, day-of-week)
    — pure-integer epoch arithmetic both sides, nine exact int64
    moment partials per block, Cramer coefficients as ratios of exact
    integer 3x3 determinants, one float division each
    (stages/zonal.py:ols2)."""
    ev = _read(sf_dir, "events", ["ts", "value"]).map_batches(
        lambda b: pa.table({
            "y": pa.array(np.floor(
                b.column("value").to_numpy(zero_copy_only=False)
                * 100.0).astype(np.int64)),
            "x1": pa.array(
                (b.column("ts").cast(pa.int64()).to_numpy(
                    zero_copy_only=False) // 3_600_000_000) % 24),
            "x2": pa.array(
                ((b.column("ts").cast(pa.int64()).to_numpy(
                    zero_copy_only=False) // 86_400_000_000) + 4) % 7),
        }),
        batch_format="pyarrow")
    return zonal.ols2(ev, "y", "x1", "x2")


def _sql_ols2() -> str:
    def det(a, b, c, d, e, f, g, h, i):
        hug = [f"CAST({x} AS HUGEINT)"
               for x in (a, b, c, d, e, f, g, h, i)]
        a, b, c, d, e, f, g, h, i = hug
        return (f"({a} * ({e} * {i} - {f} * {h}) "
                f"- {b} * ({d} * {i} - {f} * {g}) "
                f"+ {c} * ({d} * {h} - {e} * {g}))")

    dd = det("n", "s1", "s2", "s1", "s11", "s12", "s2", "s12", "s22")
    d0 = det("sy", "s1", "s2", "s1y", "s11", "s12", "s2y", "s12", "s22")
    d1 = det("n", "sy", "s2", "s1", "s1y", "s12", "s2", "s2y", "s22")
    d2 = det("n", "s1", "sy", "s1", "s11", "s1y", "s2", "s12", "s2y")
    return f"""
WITH e AS (SELECT CAST(FLOOR(value * 100.0) AS BIGINT) AS y,
    (epoch_us(ts) // 3600000000) % 24 AS x1,
    ((epoch_us(ts) // 86400000000) + 4) % 7 AS x2
  FROM events),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
    CAST(SUM(x1 * x1) AS BIGINT) AS s11,
    CAST(SUM(x1 * x2) AS BIGINT) AS s12,
    CAST(SUM(x2 * x2) AS BIGINT) AS s22,
    CAST(SUM(y) AS BIGINT) AS sy,
    CAST(SUM(x1 * y) AS BIGINT) AS s1y,
    CAST(SUM(x2 * y) AS BIGINT) AS s2y
  FROM e),
d AS (SELECT n, {dd} AS det, {d0} AS d0, {d1} AS d1, {d2} AS d2 FROM m)
SELECT n, CAST(det AS DOUBLE) AS det,
  CASE WHEN det <> 0 THEN CAST(d0 AS DOUBLE) / CAST(det AS DOUBLE)
       ELSE NULL END AS b0,
  CASE WHEN det <> 0 THEN CAST(d1 AS DOUBLE) / CAST(det AS DOUBLE)
       ELSE NULL END AS b1,
  CASE WHEN det <> 0 THEN CAST(d2 AS DOUBLE) / CAST(det AS DOUBLE)
       ELSE NULL END AS b2
FROM d"""


FUNNEL_STEPS = ("view", "click", "purchase")


def q_funnel_depth(sf_dir: str):
    """Multi-step ordered funnel view -> click -> purchase: per user,
    greedy earliest matching over the exact (ts, event_id) total
    order (first-touch, no horizon); output the depth histogram
    (stages/sequence.py:funnel_depth)."""
    from ..stages.sequence import funnel_depth

    ev = _read(sf_dir, "events",
               ["user_id", "ts", "event_id", "event_type"]).map_batches(
        lambda b: pa.table({
            "user_id": b.column("user_id"),
            "tu": b.column("ts").cast(pa.int64()),
            "event_id": b.column("event_id"),
            "event_type": b.column("event_type")}),
        batch_format="pyarrow")
    return funnel_depth(ev, key_col="user_id", ts_col="tu",
                        id_col="event_id", type_col="event_type",
                        steps=list(FUNNEL_STEPS))


def _sql_funnel_depth() -> str:
    s1, s2, s3 = FUNNEL_STEPS
    return f"""
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tu, event_id
           FROM events),
f1 AS (SELECT user_id, tu, event_id FROM (
  SELECT user_id, tu, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY tu, event_id) AS rn
  FROM e WHERE event_type = '{s1}') WHERE rn = 1),
f2 AS (SELECT user_id, tu, event_id FROM (
  SELECT e.user_id, e.tu, e.event_id,
         ROW_NUMBER() OVER (PARTITION BY e.user_id
                            ORDER BY e.tu, e.event_id) AS rn
  FROM e JOIN f1 ON f1.user_id = e.user_id
  WHERE e.event_type = '{s2}'
    AND (e.tu > f1.tu OR (e.tu = f1.tu AND e.event_id > f1.event_id)))
  WHERE rn = 1),
f3 AS (SELECT user_id FROM (
  SELECT e.user_id,
         ROW_NUMBER() OVER (PARTITION BY e.user_id
                            ORDER BY e.tu, e.event_id) AS rn
  FROM e JOIN f2 ON f2.user_id = e.user_id
  WHERE e.event_type = '{s3}'
    AND (e.tu > f2.tu OR (e.tu = f2.tu AND e.event_id > f2.event_id)))
  WHERE rn = 1),
d AS (SELECT f1.user_id,
             CASE WHEN f3.user_id IS NOT NULL THEN 3
                  WHEN f2.user_id IS NOT NULL THEN 2
                  ELSE 1 END AS depth
      FROM f1 LEFT JOIN f2 ON f2.user_id = f1.user_id
              LEFT JOIN f3 ON f3.user_id = f1.user_id)
SELECT CAST(depth AS BIGINT) AS depth,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM d GROUP BY 1"""


def q_reciprocity(sf_dir: str):
    """Weighted + binary dyad RECIPROCITY of the origin-destination
    flow graph (Squartini 2013): w_recip = Σ min(w_ij, w_ji) over
    ordered cell pairs, dyad census on the binary flows — composes
    the od_matrix plan with one grid-bounded dyad reduce; integer
    sums, the two ratios are the only floats
    (stages/sequence.py:flow_reciprocity)."""
    from ..stages.sequence import flow_reciprocity

    return flow_reciprocity(q_od_matrix(sf_dir))


def _sql_reciprocity() -> str:
    od = _sql_od_matrix()
    return f"""
WITH od AS MATERIALIZED ({od}),
p AS (SELECT LEAST(cell_from, cell_to) AS lo,
             GREATEST(cell_from, cell_to) AS hi,
             CAST(SUM(CASE WHEN cell_from < cell_to THEN n ELSE 0 END)
                  AS BIGINT) AS nf,
             CAST(SUM(CASE WHEN cell_from > cell_to THEN n ELSE 0 END)
                  AS BIGINT) AS nr
      FROM od WHERE cell_from <> cell_to GROUP BY 1, 2),
a AS (SELECT CAST(COALESCE(SUM(nf + nr), 0) AS BIGINT) AS w_total,
             CAST(COALESCE(2 * SUM(LEAST(nf, nr)), 0) AS BIGINT)
               AS w_recip,
             CAST(COUNT(CASE WHEN nf > 0 AND nr > 0 THEN 1 END)
                  AS BIGINT) AS m_dyads,
             CAST(COUNT(CASE WHEN nf = 0 OR nr = 0 THEN 1 END)
                  AS BIGINT) AS a_dyads
      FROM p)
SELECT w_total, w_recip, m_dyads, a_dyads,
       CASE WHEN w_total > 0
            THEN CAST(w_recip AS DOUBLE) / CAST(w_total AS DOUBLE)
            ELSE 0.0 END AS recip_w,
       CASE WHEN m_dyads + a_dyads > 0
            THEN CAST(2 * m_dyads AS DOUBLE)
                 / CAST(2 * m_dyads + a_dyads AS DOUBLE)
            ELSE 0.0 END AS recip_b
FROM a"""


def q_survival(sf_dir: str):
    """KAPLAN-MEIER survival curve of user lifetimes (first -> last
    event day; users active on or after the day before the corpus-end
    day are censored): n_risk/n_death/n_censor are exact day-histogram
    integers, the cumulative log-survival is a sum of quantized-ln
    terms, log_surv = ls_q / 2^20 the one shared float
    (stages/sequence.py:kaplan_meier)."""
    from ..stages.sequence import kaplan_meier

    ev = _read(sf_dir, "events", ["user_id", "ts"]).map_batches(
        lambda b: pa.table({
            "user_id": b.column("user_id"),
            "tu": b.column("ts").cast(pa.int64())}),
        batch_format="pyarrow")
    return kaplan_meier(ev, key_col="user_id", ts_col="tu",
                        censor_days=1)


def _sql_survival() -> str:
    from ..stages.sequence import KM_DAY_US, KM_SCALE, KM_ZERO_Q

    day, sc, w = KM_DAY_US, KM_SCALE, 1
    return f"""
WITH ub AS (SELECT user_id, MIN(epoch_us(ts)) AS fu,
                   MAX(epoch_us(ts)) AS lu FROM events GROUP BY 1),
du AS (SELECT (lu - fu) // {day} AS dur, lu // {day} AS lday FROM ub),
mx AS (SELECT MAX(lday) AS m FROM du),
lab AS (SELECT dur, CASE WHEN lday <= m - {w} THEN 1 ELSE 0 END AS death
        FROM du CROSS JOIN mx),
hist AS (SELECT dur, CAST(SUM(death) AS BIGINT) AS n_death,
                CAST(COUNT(*) - SUM(death) AS BIGINT) AS n_censor,
                CAST(COUNT(*) AS BIGINT) AS n
         FROM lab GROUP BY 1),
r AS (SELECT dur, n_death, n_censor,
             CAST(SUM(n) OVER (ORDER BY dur DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS n_risk
      FROM hist),
t AS (SELECT dur, n_death, n_censor, n_risk,
             CASE WHEN n_death = 0 THEN 0
                  WHEN n_risk > n_death
                  THEN CAST(FLOOR((ln(n_risk - n_death) - ln(n_risk))
                                  * {sc}.0) AS BIGINT)
                  ELSE {KM_ZERO_Q} END AS tq
      FROM r),
km AS (SELECT dur, n_risk, n_death, n_censor,
              CAST(SUM(tq) OVER (ORDER BY dur
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS ls_q
       FROM t)
SELECT dur AS t_day, n_risk, n_death, n_censor, ls_q,
       CAST(ls_q AS DOUBLE) / {float(sc)!r} AS log_surv
FROM km WHERE n_death > 0"""


HEX_SIZE_Q = 3 * (1 << 20)   # 3-degree hexes


def q_hexbin(sf_dir: str):
    """HEXAGONAL binning (the H3/hexbin analog) of the geocoded corpus:
    pointy-top axial hex ids from fixed-point cube rounding (sqrt(3)
    pinned at 1732051/1000000, round-half-up on integer numerators over
    one shared denominator, largest-residual fix — bit-exact in SQL),
    combiner-first per-hex counts (geom/cells.py:hex_axial_of)."""
    import pandas as pd

    from ..stages.bucketed import bucketed_groupby

    def prep(b: pa.Table) -> pa.Table:
        key = b.column("doc_id").to_numpy(zero_copy_only=False)
        langs = b.column("lang").to_pylist()
        lon, lat = geocode_id(key, langs)
        hq, hr = cells.hex_axial_of(lon, lat, HEX_SIZE_Q)
        df = pd.DataFrame({"hq": hq, "hr": hr})
        df["n"] = np.int64(1)
        agg = df.groupby(["hq", "hr"], sort=False, as_index=False)[
            "n"].sum()
        return pa.Table.from_pandas(
            agg, preserve_index=False).replace_schema_metadata(None)

    parts = _read(sf_dir, "documents", ["doc_id", "lang"]).map_batches(
        prep, batch_format="pyarrow")
    return bucketed_groupby(
        parts, ["hq", "hr"],
        lambda g: g.groupby(["hq", "hr"], sort=False,
                            as_index=False)["n"].sum(),
        n_buckets=8)


def _sql_hexbin() -> str:
    lon_e, lat_e = sql_geocode_exprs("doc_id", "lang")
    return f"""
WITH geo AS (SELECT doc_id, {lon_e} AS lon, {lat_e} AS lat
             FROM documents),
{cells.sql_hex_ctes('geo', 'doc_id', 'lon', 'lat', HEX_SIZE_Q)}
SELECT hq, hr, CAST(COUNT(*) AS BIGINT) AS n
FROM hexed GROUP BY 1, 2"""


def q_regions(sf_dir: str):
    """RASTER REGION LABELING (the rasterio.features label / sieve
    analog): 4-connected components of the OCCUPIED cell mask, labeled
    by min cell id via the public connected_components operator (self
    edges keep singleton regions), per-region cell and doc totals.
    The corpus reduces to the grid-bounded histogram (one shuffle);
    adjacency edges come from the broadcast histogram probe
    (stages/spatial_stats machinery + stages/graph.py:
    connected_components)."""
    import ray.data as rd

    from ..stages.graph import connected_components
    from ..stages.spatial_stats import _histogram, _probe

    cells_, x = _histogram(_geocoded(sf_dir, RES_ZONAL), "cell", 8)
    nc, nr = cells._grid_dims(RES_ZONAL)
    nx = cells_ % nc
    ny = cells_ // nc
    srcs, dsts = [cells_], [cells_]   # self edges: singleton regions
    for off, ok in ((1, nx < nc - 1), (nc, ny < nr - 1)):
        si = np.flatnonzero(ok)
        found, pos = _probe(cells_, cells_[si] + off)
        srcs.append(cells_[si[found]])
        dsts.append(cells_[pos[found]])
    edges = rd.from_arrow(pa.table({
        "src": pa.array(np.concatenate(srcs)),
        "dst": pa.array(np.concatenate(dsts))}))
    lab = connected_components(edges).to_pandas()
    lab = lab.sort_values("node", kind="mergesort")
    comp = lab["comp"].to_numpy().astype(np.int64)
    # histogram and label frames share the sorted cell order
    import pandas as pd

    agg = pd.DataFrame({"comp": comp, "n_cells": np.ones(len(comp),
                                                         np.int64),
                        "n_docs": x}).groupby(
        "comp", as_index=False).sum()
    return rd.from_arrow(pa.Table.from_pandas(
        agg, preserve_index=False).replace_schema_metadata(None))


def _sql_regions() -> str:
    nc, nr = cells._grid_dims(RES_ZONAL)
    return f"""
WITH RECURSIVE geo0 AS (SELECT doc_id,
  {sql_geocode_exprs('doc_id', 'lang')[0]} AS lon,
  {sql_geocode_exprs('doc_id', 'lang')[1]} AS lat FROM documents),
geo AS (SELECT *, {cells.sql_cell_expr('lon', 'lat', RES_ZONAL)} AS cell
        FROM geo0),
counts AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS x
           FROM geo GROUP BY cell),
e0 AS (
  SELECT a.cell AS a, b.cell AS b FROM counts a
    JOIN counts b ON b.cell = a.cell + 1 WHERE a.cell % {nc} < {nc - 1}
  UNION ALL
  SELECT a.cell, b.cell FROM counts a
    JOIN counts b ON b.cell = a.cell + {nc}
    WHERE a.cell // {nc} < {nr - 1}
  UNION ALL SELECT cell, cell FROM counts),
edge AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
walk(id, r) AS (
  SELECT DISTINCT a, a FROM edge
  UNION
  SELECT w.id, e.b FROM walk w JOIN edge e ON e.a = w.r
),
lab AS (SELECT id AS cell, MIN(r) AS comp FROM walk GROUP BY id)
SELECT l.comp, CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(c.x) AS BIGINT) AS n_docs
FROM lab l JOIN counts c ON c.cell = l.cell
GROUP BY 1"""


STAY_MIN = 2


def q_staypoints(sf_dir: str):
    """STAY-POINT detection: maximal consecutive same-cell runs per
    user over the exact (ts, event_id) order, >= 2 events — the
    trajectory-mining sibling of od_matrix
    (stages/sequence.py:staypoints)."""
    from ..stages.sequence import staypoints

    def prep(b: pa.Table) -> pa.Table:
        eid = b.column("event_id").to_numpy(zero_copy_only=False)
        lon, lat = geocode_id(eid, ["xx"] * len(b))
        cell = cells.cell_of(lon, lat, MK_RES)
        t = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"user_id": b.column("user_id"),
                         "event_id": b.column("event_id"),
                         "tu": pa.array(t),
                         "cell": pa.array(cell, pa.int64())})

    ev = _read(sf_dir, "events",
               ["user_id", "event_id", "ts"]).map_batches(
        prep, batch_format="pyarrow")
    return staypoints(ev, key_col="user_id", ts_col="tu",
                      id_col="event_id", min_events=STAY_MIN)


def _sql_staypoints() -> str:
    lon_e, lat_e = sql_geocode_exprs("event_id", "'xx'")
    cell_e = cells.sql_cell_expr("lon", "lat", MK_RES)
    return f"""
WITH g0 AS (SELECT user_id, event_id, epoch_us(ts) AS tu,
                   {lon_e} AS lon, {lat_e} AS lat FROM events),
gc AS (SELECT user_id, event_id, tu, {cell_e} AS cell FROM g0),
isl AS (SELECT user_id, cell, tu,
  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY tu, event_id)
  - ROW_NUMBER() OVER (PARTITION BY user_id, cell
                       ORDER BY tu, event_id) AS run
  FROM gc)
SELECT user_id, cell, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MIN(tu) AS BIGINT) AS start_tu,
       CAST(MAX(tu) AS BIGINT) AS end_tu
FROM isl GROUP BY user_id, cell, run
HAVING COUNT(*) >= {STAY_MIN}"""


KNOX_TAU_US = 3_600_000_000   # 1-hour time window


def q_knox(sf_dir: str):
    """KNOX space-time interaction test over the event points
    (event_id-geocoded, res-4 cells, 1-hour window): X / Ns / Nt pair
    counts exact, E[X] = Ns*Nt/C(n,2) the one float — the outbreak /
    burst-cluster screen (stages/spatial_stats.py:knox_test)."""
    from ..stages.spatial_stats import knox_test

    def prep(b: pa.Table) -> pa.Table:
        eid = b.column("event_id").to_numpy(zero_copy_only=False)
        lon, lat = geocode_id(eid, ["xx"] * len(b))
        cell = cells.cell_of(lon, lat, MK_RES)
        t = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"cell": pa.array(cell, pa.int64()),
                         "tu": pa.array(t),
                         "eid": b.column("event_id")})

    ev = _read(sf_dir, "events", ["event_id", "ts"]).map_batches(
        prep, batch_format="pyarrow")
    return knox_test(ev, res=MK_RES, tau_us=KNOX_TAU_US)


def _sql_knox() -> str:
    lon_e, lat_e = sql_geocode_exprs("event_id", "'xx'")
    cell_e = cells.sql_cell_expr("lon", "lat", MK_RES)
    nc, _nr = cells._grid_dims(MK_RES)
    tau = KNOX_TAU_US
    return f"""
WITH g0 AS (SELECT event_id AS eid, epoch_us(ts) AS tu,
                   {lon_e} AS lon, {lat_e} AS lat FROM events),
ev AS MATERIALIZED (SELECT eid, tu, ({cell_e}) % {nc} AS cx,
                           ({cell_e}) // {nc} AS cy FROM g0),
xs AS (SELECT CAST(COUNT(*) AS HUGEINT) AS x FROM ev a JOIN ev b
       ON a.eid < b.eid
      AND abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
      AND abs(a.tu - b.tu) <= {tau}),
nss AS (SELECT CAST(COUNT(*) AS HUGEINT) AS ns FROM ev a JOIN ev b
        ON a.eid < b.eid
       AND abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1),
nts AS (SELECT CAST(COUNT(*) AS HUGEINT) AS nt FROM ev a JOIN ev b
        ON a.eid < b.eid AND abs(a.tu - b.tu) <= {tau}),
tot AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM ev)
SELECT CAST(n AS BIGINT) AS n, CAST(ns AS BIGINT) AS ns,
       CAST(nt AS BIGINT) AS nt, CAST(x AS BIGINT) AS x,
       CASE WHEN n > 1 THEN
         CAST(ns * nt AS DOUBLE)
         / CAST(n * (n - 1) // 2 AS DOUBLE)
       ELSE NULL END AS ex
FROM tot, xs, nss, nts"""


EB_M = 20


def q_eb_rates(sf_dir: str):
    """Empirical-Bayes rate smoothing per cell (the choropleth
    rate-stabilizer): raw chars-per-doc rate v/x shrunk toward the
    global rate with pseudo-count strength {EB_M}; integer sums, each
    float ONE shared shape (stages/spatial_stats.py:eb_rates)."""
    from ..stages.spatial_stats import eb_rates

    pts = _geocoded(sf_dir, RES_ZONAL, keep_extra=["n_chars"])
    return eb_rates(pts, res=RES_ZONAL, value_col="n_chars", m=EB_M)


def _sql_eb_rates() -> str:
    return f"""
{_sql_geo_cte(extra=", n_chars")},
cv AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS x,
              CAST(SUM(n_chars) AS BIGINT) AS v FROM geo GROUP BY cell),
sc AS (SELECT CAST(SUM(x) AS BIGINT) AS sx,
              CAST(SUM(v) AS BIGINT) AS sv FROM cv)
SELECT cell, x, v,
       CAST(v AS DOUBLE) / CAST(x AS DOUBLE) AS raw,
       (CAST(v AS DOUBLE) + {EB_M} * (CAST(sv AS DOUBLE)
                                      / CAST(sx AS DOUBLE)))
       / CAST(x + {EB_M} AS DOUBLE) AS smoothed
FROM cv, sc"""


PROX_MAX_DIST = 3


def q_proximity(sf_dir: str):
    """Distance transform of the occupancy mask (gdal_proximity
    analog): Chebyshev ring distance to the nearest occupied cell for
    empty cells within 3 rings, pure integers
    (stages/spatial_stats.py:proximity)."""
    from ..stages.spatial_stats import proximity

    return proximity(_geocoded(sf_dir, RES_ZONAL), res=RES_ZONAL,
                     max_dist=PROX_MAX_DIST)


def _sql_proximity() -> str:
    nc, nr = cells._grid_dims(RES_ZONAL)
    k = PROX_MAX_DIST
    return f"""
{_sql_counts_cte()},
offs AS (SELECT dxr.i - {k} AS dx, dyr.i - {k} AS dy,
                GREATEST(abs(dxr.i - {k}), abs(dyr.i - {k})) AS h
         FROM (SELECT unnest(range({2 * k + 1})) AS i) dxr,
              (SELECT unnest(range({2 * k + 1})) AS i) dyr
         WHERE GREATEST(abs(dxr.i - {k}), abs(dyr.i - {k}))
               BETWEEN 1 AND {k}),
cand AS (SELECT a.cell + o.dy * {nc} + o.dx AS cell, o.h
         FROM counts a CROSS JOIN offs o
         WHERE a.cell % {nc} + o.dx >= 0
           AND a.cell % {nc} + o.dx <= {nc - 1}
           AND a.cell // {nc} + o.dy >= 0
           AND a.cell // {nc} + o.dy <= {nr - 1})
SELECT cand.cell, CAST(MIN(cand.h) AS BIGINT) AS dist
FROM cand LEFT JOIN counts c ON c.cell = cand.cell
WHERE c.cell IS NULL
GROUP BY cand.cell"""


def q_voronoi(sf_dir: str):
    """Nearest-facility assignment (discrete Voronoi / gdal_proximity
    -values): ring distance + nearest occupied cell id for empty cells
    within 3 rings, smallest-source tie rule
    (stages/spatial_stats.py:proximity_label)."""
    from ..stages.spatial_stats import proximity_label

    return proximity_label(_geocoded(sf_dir, RES_ZONAL), res=RES_ZONAL,
                           max_dist=PROX_MAX_DIST)


def _sql_voronoi() -> str:
    nc, nr = cells._grid_dims(RES_ZONAL)
    k = PROX_MAX_DIST
    return f"""
{_sql_counts_cte()},
offs AS (SELECT dxr.i - {k} AS dx, dyr.i - {k} AS dy,
                GREATEST(abs(dxr.i - {k}), abs(dyr.i - {k})) AS h
         FROM (SELECT unnest(range({2 * k + 1})) AS i) dxr,
              (SELECT unnest(range({2 * k + 1})) AS i) dyr
         WHERE GREATEST(abs(dxr.i - {k}), abs(dyr.i - {k}))
               BETWEEN 1 AND {k}),
cand AS (SELECT a.cell AS s, a.cell + o.dy * {nc} + o.dx AS cell, o.h
         FROM counts a CROSS JOIN offs o
         WHERE a.cell % {nc} + o.dx >= 0
           AND a.cell % {nc} + o.dx <= {nc - 1}
           AND a.cell // {nc} + o.dy >= 0
           AND a.cell // {nc} + o.dy <= {nr - 1}),
t AS (SELECT cell, CAST(MIN(h) AS BIGINT) AS dist
      FROM cand GROUP BY cell),
lab AS (SELECT t.cell, t.dist, CAST(MIN(cand.s) AS BIGINT) AS nearest
        FROM t JOIN cand ON cand.cell = t.cell AND cand.h = t.dist
        GROUP BY t.cell, t.dist)
SELECT lab.cell, lab.dist, lab.nearest
FROM lab LEFT JOIN counts oc ON oc.cell = lab.cell
WHERE oc.cell IS NULL"""


def q_colocation(sf_dir: str):
    """Join-count statistics (categorical Moran analog): per-cell
    majority language (count desc, lang asc ties), rook-adjacent cell
    pairs counted per unordered mark pair — BB/BW joins off the
    diagonal, all integers
    (stages/spatial_stats.py:colocation_counts)."""
    from ..stages.spatial_stats import colocation_counts

    pts = _geocoded(sf_dir, RES_ZONAL, keep_extra=["lang"])
    return colocation_counts(pts, res=RES_ZONAL, mark_col="lang")


def _sql_colocation() -> str:
    nc, nr = cells._grid_dims(RES_ZONAL)
    return f"""
{_sql_geo_cte(extra=", lang")},
cm AS (SELECT cell, lang AS m, CAST(COUNT(*) AS BIGINT) AS n
       FROM geo GROUP BY cell, lang),
top AS (SELECT cell, m FROM (
          SELECT cell, m,
                 ROW_NUMBER() OVER (PARTITION BY cell
                                    ORDER BY n DESC, m ASC) AS rn
          FROM cm) WHERE rn = 1),
adj AS (
  SELECT a.m AS x, b.m AS y FROM top a
    JOIN top b ON b.cell = a.cell + 1
    WHERE a.cell % {nc} < {nc - 1}
  UNION ALL
  SELECT a.m, b.m FROM top a
    JOIN top b ON b.cell = a.cell + {nc}
    WHERE a.cell // {nc} < {nr - 1})
SELECT LEAST(x, y) AS ma, GREATEST(x, y) AS mb,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM adj GROUP BY 1, 2"""


GI_HOT = 1.645  # one-sided 95% z threshold


PCA_ROUNDS, PCA_VSCALE = 6, 1 << 20


def q_pca1(sf_dir: str):
    """Top principal direction of the embeddings — integer power
    iteration on the distributed exact Gram matrix (pagerank's
    fixed-point discipline applied to PCA): the only corpus pass is
    the constant-size gram combiner; 6 exact-int matvec rounds with
    max-normalization run on the bounded d x d finale; Rayleigh
    quotient eigenvalue value-checked
    (stages/cluster.py:gram_power_iteration)."""
    from ..stages.cluster import gram_power_iteration

    emb = _read(sf_dir, "embeddings", ["embedding"])
    return gram_power_iteration(emb, dim=SCORE_DIM, scale=GRAM_SCALE,
                                rounds=PCA_ROUNDS, vscale=PCA_VSCALE)


def _sql_pca1() -> str:
    vs = PCA_VSCALE
    ctes = [f"""el AS (SELECT vec_id, d.d AS d,
                   CAST(FLOOR(CAST(embedding[d.d + 1] AS DOUBLE)
                              * {GRAM_SCALE}.0) AS BIGINT) AS q
            FROM embeddings,
                 LATERAL (SELECT unnest(range({SCORE_DIM})) AS d) d)""",
            f"""agg AS MATERIALIZED (
  SELECT a.d AS i, b.d AS j, CAST(SUM(a.q * b.q) AS BIGINT) AS s
  FROM el a JOIN el b ON b.vec_id = a.vec_id AND b.d >= a.d
  GROUP BY 1, 2)""",
            """gf AS MATERIALIZED (
  SELECT i, j, s FROM agg
  UNION ALL
  SELECT j, i, s FROM agg WHERE j <> i)""",
            f"""v0 AS MATERIALIZED (
  SELECT unnest(range({SCORE_DIM})) AS d,
         CAST({vs} AS HUGEINT) AS v)"""]
    for k in range(1, PCA_ROUNDS + 1):
        ctes.append(f"""w{k} AS MATERIALIZED (
  SELECT g.i AS d, SUM(CAST(g.s AS HUGEINT) * v.v) AS w
  FROM gf g JOIN v{k - 1} v ON v.d = g.j GROUP BY 1)""")
        ctes.append(f"""m{k} AS MATERIALIZED (
  SELECT MAX(ABS(w)) AS m FROM w{k})""")
        ctes.append(f"""v{k} AS MATERIALIZED (
  SELECT d, (w * {vs} - (((w * {vs}) % m) + m) % m) // m AS v
  FROM w{k}, m{k})""")
    last = f"v{PCA_ROUNDS}"
    ctes.append(f"""nm AS (
  SELECT SUM(CAST(a.v AS HUGEINT) * g.s * b.v) AS num
  FROM gf g JOIN {last} a ON a.d = g.i JOIN {last} b ON b.d = g.j)""")
    ctes.append(f"""dn AS (
  SELECT SUM(CAST(v AS HUGEINT) * v) AS den FROM {last})""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT t.d, CAST(t.v AS BIGINT) AS v,
       CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
       / {GRAM_SCALE * GRAM_SCALE}.0 AS eig
FROM {last} t, nm, dn""")


def q_hotspot_docs(sf_dir: str):
    """Composed geo-curation: per-language doc counts restricted to
    STATISTICALLY HOT cells (Gi* > 1.645) — the 'sample from activity
    hotspots' shape.  Gi* floats are bit-exact (the gi_star oracle),
    so the threshold comparison is deterministic; the hot-cell set is
    grid-bounded and broadcast into one filtering map over the
    geocoded stream, then a bucketed per-lang count."""
    import ray

    from ..stages.bucketed import bucketed_groupby
    from ..stages.spatial_stats import getis_ord_g

    pts = _geocoded(sf_dir, RES_ZONAL, keep_extra=["lang"])
    g = getis_ord_g(pts, res=RES_ZONAL)
    gi = g.column("gi").to_numpy(zero_copy_only=False)
    hot = np.sort(g.column("cell").to_numpy(zero_copy_only=False)
                  [~np.isnan(gi) & (gi > GI_HOT)]).astype(np.int64)
    ref = ray.put(hot) if ray.is_initialized() else hot

    def keep_hot(b: pa.Table, _ref=ref) -> pa.Table:
        hs = ray.get(_ref) if not isinstance(_ref, np.ndarray) else _ref
        c = b.column("cell").to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(hs, c)
        pos = np.minimum(pos, max(len(hs) - 1, 0))
        m = (hs[pos] == c) if len(hs) else np.zeros(len(c), bool)
        u, cnt = np.unique(
            np.asarray(b.column("lang").to_pylist())[m], return_counts=True)
        return pa.table({"lang": pa.array(u.tolist(), pa.string()),
                         "n": pa.array(cnt.astype(np.int64))})

    parts = pts.map_batches(keep_hot, batch_format="pyarrow")

    def fold(f):
        return f.groupby("lang", as_index=False)["n"].sum()

    return bucketed_groupby(parts, ["lang"], fold, n_buckets=4)


def _sql_hotspot_docs() -> str:
    return f"""
{_sql_gi_ctes(extra=", lang")}
SELECT geo.lang, CAST(COUNT(*) AS BIGINT) AS n
FROM geo JOIN gsel ON gsel.cell = geo.cell
WHERE gsel.gi IS NOT NULL AND gsel.gi > {GI_HOT}
GROUP BY geo.lang"""


IDW_RADIUS, IDW_WSCALE = 2, 1 << 20


def q_idw(sf_dir: str):
    """IDW gap interpolation of empty cells from the occupancy
    histogram (the gdal_grid analog): quantized-reciprocal integer
    weights 2^20 // d^2 keep the accumulation exact int64, estimate is
    one float division (stages/spatial_stats.py:idw_fill)."""
    from ..stages.spatial_stats import idw_fill

    return idw_fill(_geocoded(sf_dir, RES_ZONAL), res=RES_ZONAL,
                    radius=IDW_RADIUS, w_scale=IDW_WSCALE)


def _sql_idw() -> str:
    nc, nr = cells._grid_dims(RES_ZONAL)
    k = IDW_RADIUS
    return f"""
{_sql_counts_cte()},
offs AS (SELECT dxr.i - {k} AS dx, dyr.i - {k} AS dy,
                CAST({IDW_WSCALE} // ((dxr.i - {k}) * (dxr.i - {k})
                     + (dyr.i - {k}) * (dyr.i - {k})) AS BIGINT) AS wq
         FROM (SELECT unnest(range({2 * k + 1})) AS i) dxr,
              (SELECT unnest(range({2 * k + 1})) AS i) dyr
         WHERE NOT (dxr.i = {k} AND dyr.i = {k})),
cand AS (SELECT a.cell + o.dy * {nc} + o.dx AS cell,
                o.wq * a.x AS wx, o.wq AS wq
         FROM counts a CROSS JOIN offs o
         WHERE a.cell % {nc} + o.dx >= 0
           AND a.cell % {nc} + o.dx <= {nc - 1}
           AND a.cell // {nc} + o.dy >= 0
           AND a.cell // {nc} + o.dy <= {nr - 1}),
agg AS (SELECT cell, CAST(SUM(wx) AS BIGINT) AS num,
               CAST(SUM(wq) AS BIGINT) AS den
        FROM cand GROUP BY cell)
SELECT a.cell, a.num, a.den,
       CAST(a.num AS DOUBLE) / CAST(a.den AS DOUBLE) AS est
FROM agg a LEFT JOIN counts c ON c.cell = a.cell
WHERE c.cell IS NULL"""


def _sql_gi_chain(p: str, where: str = "") -> str:
    """Prefixed Gi* CTE chain over ``documents``; ends at ``{p}gsel``
    (cell, x, wi, li, gi)."""
    nc, nr = cells._grid_dims(RES_ZONAL)
    lon_e, lat_e = sql_geocode_exprs("doc_id", "lang")
    cell_e = cells.sql_cell_expr("lon", "lat", RES_ZONAL)
    return f"""{p}geo0 AS (SELECT doc_id, {lon_e} AS lon, {lat_e} AS lat
          FROM documents{where}),
{p}geo AS (SELECT *, {cell_e} AS cell FROM {p}geo0),
{p}counts AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS x
              FROM {p}geo GROUP BY cell),
{p}sc AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                 CAST(SUM(x) AS HUGEINT) AS s,
                 CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q2
          FROM {p}counts),
{p}nb AS (
  SELECT a.cell, b.x FROM {p}counts a
    JOIN {p}counts b ON b.cell = a.cell + 1
    WHERE a.cell % {nc} < {nc - 1}
  UNION ALL
  SELECT a.cell, b.x FROM {p}counts a
    JOIN {p}counts b ON b.cell = a.cell - 1
    WHERE a.cell % {nc} > 0
  UNION ALL
  SELECT a.cell, b.x FROM {p}counts a
    JOIN {p}counts b ON b.cell = a.cell + {nc}
    WHERE a.cell // {nc} < {nr - 1}
  UNION ALL
  SELECT a.cell, b.x FROM {p}counts a
    JOIN {p}counts b ON b.cell = a.cell - {nc}
    WHERE a.cell // {nc} > 0),
{p}agg AS (SELECT cell, SUM(CAST(x AS HUGEINT)) AS nsum,
                  CAST(COUNT(*) AS HUGEINT) AS ncnt
           FROM {p}nb GROUP BY cell),
{p}g AS (SELECT c.cell, c.x,
                1 + COALESCE(a.ncnt, 0) AS wi,
                c.x + COALESCE(a.nsum, 0) AS li
         FROM {p}counts c LEFT JOIN {p}agg a ON a.cell = c.cell),
{p}gsel AS (SELECT g2.cell, g2.x,
       CAST(wi AS BIGINT) AS wi, CAST(li AS BIGINT) AS li,
       CASE WHEN n > 1 AND n > wi AND n * q2 - s * s > 0 THEN
         CAST(n * li - s * wi AS DOUBLE)
         / sqrt(CAST((n * q2 - s * s) * (n * wi - wi * wi) AS DOUBLE)
                / (CAST(n AS BIGINT) - 1.0))
       ELSE NULL END AS gi
FROM {p}g g2, {p}sc)"""


def q_emerging(sf_dir: str):
    """CROSS-RUN emerging hotspot analysis: run 1 seeds a persistent
    per-cell count store with the even-doc half, run 2 merges the odd
    half and classifies each hot cell 'new' / 'persistent' / 'faded'
    against the pre-merge Gi* — bit-exact floats make the threshold
    status deterministic (stages/spatial_stats.py:emerging_hotspots).
    A fresh temp store per call keeps the query idempotent."""
    import shutil
    import tempfile

    from ..stages.spatial_stats import emerging_hotspots

    def half(parity):
        def fn(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            return b.filter(pa.array(ids % 2 == parity))
        return fn

    even = _geocoded(sf_dir, RES_ZONAL).map_batches(
        half(0), batch_format="pyarrow")
    odd = _geocoded(sf_dir, RES_ZONAL).map_batches(
        half(1), batch_format="pyarrow")
    store = tempfile.mkdtemp(prefix="emerging-")
    try:
        emerging_hotspots(even, store, res=RES_ZONAL)  # seed run
        return emerging_hotspots(odd, store, res=RES_ZONAL)
    finally:
        shutil.rmtree(store, ignore_errors=True)


def _sql_emerging() -> str:
    thr = GI_HOT
    return f"""
WITH {_sql_gi_chain("o_", " WHERE doc_id % 2 = 0")},
{_sql_gi_chain("m_")},
j AS (SELECT m.cell, COALESCE(o.x, 0) AS x_old, m.x AS x_new,
             o.gi AS gi_old, m.gi AS gi_new
      FROM m_gsel m LEFT JOIN o_gsel o ON o.cell = m.cell)
SELECT cell, x_old, x_new, gi_old, gi_new,
       CASE WHEN gi_old > {thr} AND gi_new > {thr} THEN 'persistent'
            WHEN gi_new > {thr} THEN 'new'
            ELSE 'faded' END AS status
FROM j
WHERE (gi_old IS NOT NULL AND gi_old > {thr})
   OR (gi_new IS NOT NULL AND gi_new > {thr})"""


TGI_BIN_US = 3_600_000_000  # hourly bins


def q_temporal_gi(sf_dir: str):
    """Temporal burst detection: 1-D Getis-Ord Gi* over hourly event
    bins — adjacent occupied bins are the neighborhood, same
    exact-int z-score shape as gi_star
    (stages/spatial_stats.py:temporal_gi)."""
    from ..stages.spatial_stats import temporal_gi

    ev = _read(sf_dir, "events", ["ts"])
    return temporal_gi(ev, ts_col="ts", bin_us=TGI_BIN_US)


def _sql_temporal_gi() -> str:
    return f"""
WITH counts AS (SELECT CAST(epoch_us(ts) // {TGI_BIN_US} AS BIGINT)
                       AS bin, CAST(COUNT(*) AS BIGINT) AS x
                FROM events GROUP BY 1),
sc AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
              CAST(SUM(x) AS HUGEINT) AS s,
              CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q2
       FROM counts),
nb AS (
  SELECT a.bin, b.x FROM counts a JOIN counts b ON b.bin = a.bin + 1
  UNION ALL
  SELECT a.bin, b.x FROM counts a JOIN counts b ON b.bin = a.bin - 1),
agg AS (SELECT bin, SUM(CAST(x AS HUGEINT)) AS nsum,
               CAST(COUNT(*) AS HUGEINT) AS ncnt
        FROM nb GROUP BY bin),
g AS (SELECT c.bin, c.x,
             1 + COALESCE(a.ncnt, 0) AS wi,
             c.x + COALESCE(a.nsum, 0) AS li
      FROM counts c LEFT JOIN agg a ON a.bin = c.bin)
SELECT g.bin, g.x, CAST(wi AS BIGINT) AS wi, CAST(li AS BIGINT) AS li,
       CASE WHEN n > 1 AND n > wi AND n * q2 - s * s > 0 THEN
         CAST(n * li - s * wi AS DOUBLE)
         / sqrt(CAST((n * q2 - s * s) * (n * wi - wi * wi) AS DOUBLE)
                / (CAST(n AS BIGINT) - 1.0))
       ELSE NULL END AS gi
FROM g, sc"""


def q_lisa(sf_dir: str):
    """LISA (Anselin local Moran's I) per cell: pure integer ratio
    (n*x_i - S)(n*L'_i - S*k_i)/(n*Q2 - S^2), one float division —
    positive = like-valued cluster, negative = spatial outlier
    (stages/spatial_stats.py:local_moran)."""
    from ..stages.spatial_stats import local_moran

    return local_moran(_geocoded(sf_dir, RES_ZONAL), res=RES_ZONAL)


def _sql_lisa() -> str:
    nc, nr = cells._grid_dims(RES_ZONAL)
    return f"""
{_sql_counts_cte()},
sc AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
              CAST(SUM(x) AS HUGEINT) AS s,
              CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q2
       FROM counts),
nb AS (
  SELECT a.cell, b.x FROM counts a JOIN counts b ON b.cell = a.cell + 1
    WHERE a.cell % {nc} < {nc - 1}
  UNION ALL
  SELECT a.cell, b.x FROM counts a JOIN counts b ON b.cell = a.cell - 1
    WHERE a.cell % {nc} > 0
  UNION ALL
  SELECT a.cell, b.x FROM counts a JOIN counts b ON b.cell = a.cell + {nc}
    WHERE a.cell // {nc} < {nr - 1}
  UNION ALL
  SELECT a.cell, b.x FROM counts a JOIN counts b ON b.cell = a.cell - {nc}
    WHERE a.cell // {nc} > 0),
agg AS (SELECT cell, SUM(CAST(x AS HUGEINT)) AS nsum,
               CAST(COUNT(*) AS HUGEINT) AS ncnt
        FROM nb GROUP BY cell),
g AS (SELECT c.cell, c.x,
             COALESCE(a.ncnt, 0) AS k, COALESCE(a.nsum, 0) AS lsum
      FROM counts c LEFT JOIN agg a ON a.cell = c.cell)
SELECT g.cell, g.x, CAST(k AS BIGINT) AS k,
       CAST((n * g.x - s) * (n * lsum - s * k) AS BIGINT) AS num,
       CASE WHEN n * q2 - s * s <> 0 THEN
         CAST((n * g.x - s) * (n * lsum - s * k) AS DOUBLE)
         / CAST(n * q2 - s * s AS DOUBLE)
       ELSE NULL END AS lisa
FROM g, sc"""


VGRAM_MAX_LAG = 3


def q_variogram(sf_dir: str):
    """Empirical semivariogram over Chebyshev cell-ring lags 1..3:
    gamma(h) = SSD_h / (2 N_h) over occupied unordered pairs, all-int
    SSD, one shared float division
    (stages/spatial_stats.py:semivariogram)."""
    from ..stages.spatial_stats import semivariogram

    return semivariogram(_geocoded(sf_dir, RES_ZONAL), res=RES_ZONAL,
                         max_lag=VGRAM_MAX_LAG)


def _sql_variogram() -> str:
    nc, nr = cells._grid_dims(RES_ZONAL)
    k = VGRAM_MAX_LAG
    return f"""
{_sql_counts_cte()},
offs AS (SELECT dxr.i - {k} AS dx, dyr.i AS dy
         FROM (SELECT unnest(range({2 * k + 1})) AS i) dxr,
              (SELECT unnest(range({k + 1})) AS i) dyr
         WHERE GREATEST(abs(dxr.i - {k}), dyr.i) BETWEEN 1 AND {k}
           AND (dyr.i > 0 OR dxr.i - {k} > 0)),
pr AS (SELECT GREATEST(abs(o.dx), o.dy) AS h, a.x AS xa, b.x AS xb
       FROM counts a
       CROSS JOIN offs o
       JOIN counts b ON b.cell = a.cell + o.dy * {nc} + o.dx
       WHERE a.cell % {nc} + o.dx >= 0
         AND a.cell % {nc} + o.dx <= {nc - 1}
         AND a.cell // {nc} + o.dy <= {nr - 1}),
agg AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM((CAST(xa AS HUGEINT) - xb)
                        * (CAST(xa AS HUGEINT) - xb)) AS BIGINT) AS ssd
        FROM pr GROUP BY h)
SELECT s.h, COALESCE(a.n_pairs, 0) AS n_pairs, COALESCE(a.ssd, 0) AS ssd,
       CASE WHEN COALESCE(a.n_pairs, 0) > 0 THEN
         CAST(a.ssd AS DOUBLE) / CAST(2 * a.n_pairs AS DOUBLE)
       ELSE NULL END AS gamma
FROM (SELECT unnest(range(1, {k + 1})) AS h) s
LEFT JOIN agg a ON a.h = s.h"""


# --- point-in-polygon broadcast join (SURVEY op #11) ----------------------


def q_pip_admin(sf_dir: str):
    import ray

    blob = polygons_to_blob(admin_grid(nx=ADMIN_NX, ny=ADMIN_NY))
    ref = ray.put(blob) if ray.is_initialized() else blob
    pts = _geocoded(sf_dir, RES_ZONAL)
    joined = pts.map_batches(
        PointInPolygonJoin,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        concurrency=2,
    )
    return joined.map_batches(
        lambda b: b.select(["doc_id", "poly_id", "poly_name"]),
        batch_format="pyarrow",
    )


# --- k-ring kNN (SURVEY §2.3 joins: expand ring -> equi-join -> rank) -----


def q_knn(sf_dir: str):
    pts = _geocoded(sf_dir, RES_KNN)
    qids, qlons, qlats = zip(*KNN_QUERIES)
    blob = {
        "query_id": np.asarray(qids, dtype=np.int64),
        "lon": np.asarray(qlons),
        "lat": np.asarray(qlats),
    }
    j = knn.KRingKNN(blob, res=RES_KNN, ring_k=KNN_RING, k=KNN_K,
                     keep_cols=["doc_id"])
    partial = pts.map_batches(j, batch_format="pyarrow")
    final = knn.finalize_topk(partial, KNN_K)
    return final.map_batches(
        lambda b: b.select(["query_id", "doc_id", "rank"]).set_column(
            2, "rank", pc.cast(b.column("rank"), pa.int64())
        ),
        batch_format="pyarrow",
    )


BBOX_CELL, BBOX_DOM = 128, 1200  # grid cell / coordinate domain


def _rects_exprs(key: str, salt1: int, salt2: int):
    """Deterministic integer half-open boxes from a key column — the
    shared arithmetic both the Ray path and the SQL oracle evaluate:
    x0 = (k·salt1) % DOM, w = 16 + (k·7) % 120 (y analogous)."""
    return (
        f"({key} * {salt1}) % {BBOX_DOM}",
        f"({key} * {salt2}) % {BBOX_DOM}",
        f"16 + ({key} * 7) % 120",
        f"16 + ({key} * 11) % 96",
    )


def q_bbox_join(sf_dir: str):
    """Large×large RECTANGLE-INTERSECTION spatial join (the R-tree /
    PBSM join beside point-in-polygon): part-derived boxes × supplier-
    derived boxes, grid-partitioned with the REPORT-ONCE rule (a pair
    emits only from the cell holding the overlap's lower-left corner —
    no distinct pass), exact integer overlap areas
    (stages/join.py:grid_bbox_join)."""
    from ..stages.join import grid_bbox_join

    def mk(key_col, id_out, s1, s2):
        def fn(b: pa.Table) -> pa.Table:
            k = b.column(key_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            x0 = (k * s1) % BBOX_DOM
            y0 = (k * s2) % BBOX_DOM
            w = 16 + (k * 7) % 120
            h = 16 + (k * 11) % 96
            return pa.table({
                id_out: pa.array(k), "x0": pa.array(x0),
                "y0": pa.array(y0), "x1": pa.array(x0 + w),
                "y1": pa.array(y0 + h),
            })
        return fn

    a = _read(sf_dir, "part", ["p_partkey"]).map_batches(
        mk("p_partkey", "a_id", 131, 137), batch_format="pyarrow")
    b = _read(sf_dir, "supplier", ["s_suppkey"]).map_batches(
        mk("s_suppkey", "b_id", 139, 149), batch_format="pyarrow")
    return grid_bbox_join(a, b, cell=BBOX_CELL)


def _sql_bbox_join() -> str:
    ax0, ay0, aw, ah = _rects_exprs("p_partkey", 131, 137)
    bx0, by0, bw, bh = _rects_exprs("s_suppkey", 139, 149)
    return f"""
WITH a AS (SELECT p_partkey AS a_id,
                  CAST({ax0} AS BIGINT) AS x0,
                  CAST({ay0} AS BIGINT) AS y0,
                  CAST({ax0} + {aw} AS BIGINT) AS x1,
                  CAST({ay0} + {ah} AS BIGINT) AS y1 FROM part),
b AS (SELECT s_suppkey AS b_id,
             CAST({bx0} AS BIGINT) AS x0,
             CAST({by0} AS BIGINT) AS y0,
             CAST({bx0} + {bw} AS BIGINT) AS x1,
             CAST({by0} + {bh} AS BIGINT) AS y1 FROM supplier)
SELECT a.a_id, b.b_id,
       (LEAST(a.x1, b.x1) - GREATEST(a.x0, b.x0))
       * (LEAST(a.y1, b.y1) - GREATEST(a.y0, b.y0)) AS area
FROM a JOIN b
  ON a.x0 < b.x1 AND b.x0 < a.x1 AND a.y0 < b.y1 AND b.y0 < a.y1"""


def _segs_exprs(key: str, s1: int, s2: int):
    """Deterministic bounded-length integer segments from a key column —
    the shared arithmetic both sides evaluate: endpoint (x0, y0) hashed
    into the domain, offset (dx, dy) in [-120, 120) × [-96, 96)."""
    return (
        f"({key} * {s1}) % {BBOX_DOM}",
        f"({key} * {s2}) % {BBOX_DOM}",
        f"({key} * 7) % 240 - 120",
        f"({key} * 11) % 192 - 96",
    )


def q_seg_join(sf_dir: str):
    """Large×large SEGMENT-INTERSECTION join (the line-overlay
    st_intersects beside bbox_join): part-derived segments × supplier-
    derived segments, PBSM grid partitioning with the report-once rule,
    exact int64 orientation tests — one row per properly crossing pair
    with the direction determinant (stages/join.py:grid_seg_join)."""
    from ..stages.join import grid_seg_join

    def mk(key_col, id_out, s1, s2):
        def fn(b: pa.Table) -> pa.Table:
            k = b.column(key_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            x0 = (k * s1) % BBOX_DOM
            y0 = (k * s2) % BBOX_DOM
            dx = (k * 7) % 240 - 120
            dy = (k * 11) % 192 - 96
            return pa.table({
                id_out: pa.array(k), "x0": pa.array(x0),
                "y0": pa.array(y0), "x1": pa.array(x0 + dx),
                "y1": pa.array(y0 + dy),
            })
        return fn

    a = _read(sf_dir, "part", ["p_partkey"]).map_batches(
        mk("p_partkey", "a_id", 163, 167), batch_format="pyarrow")
    b = _read(sf_dir, "supplier", ["s_suppkey"]).map_batches(
        mk("s_suppkey", "b_id", 173, 179), batch_format="pyarrow")
    return grid_seg_join(a, b, cell=BBOX_CELL)


def _sql_seg_join() -> str:
    ax0, ay0, adx, ady = _segs_exprs("p_partkey", 163, 167)
    bx0, by0, bdx, bdy = _segs_exprs("s_suppkey", 173, 179)
    return f"""
WITH a AS (SELECT p_partkey AS a_id,
                  CAST({ax0} AS BIGINT) AS x0,
                  CAST({ay0} AS BIGINT) AS y0,
                  CAST({ax0} + ({adx}) AS BIGINT) AS x1,
                  CAST({ay0} + ({ady}) AS BIGINT) AS y1 FROM part),
b AS (SELECT s_suppkey AS b_id,
             CAST({bx0} AS BIGINT) AS x0,
             CAST({by0} AS BIGINT) AS y0,
             CAST({bx0} + ({bdx}) AS BIGINT) AS x1,
             CAST({by0} + ({bdy}) AS BIGINT) AS y1 FROM supplier)
SELECT a_id, b_id,
       (a.x1 - a.x0) * (b.y1 - b.y0)
       - (a.y1 - a.y0) * (b.x1 - b.x0) AS det
FROM a JOIN b ON
      ((a.x1 - a.x0) * (b.y0 - a.y0) - (a.y1 - a.y0) * (b.x0 - a.x0))
    * ((a.x1 - a.x0) * (b.y1 - a.y0) - (a.y1 - a.y0) * (b.x1 - a.x0)) < 0
  AND ((b.x1 - b.x0) * (a.y0 - b.y0) - (b.y1 - b.y0) * (a.x0 - b.x0))
    * ((b.x1 - b.x0) * (a.y1 - b.y0) - (b.y1 - b.y0) * (a.x1 - b.x0)) < 0"""


HULL_PTS = ("CAST((c_custkey * 29 + c_nationkey * 13) % 97 AS BIGINT)",
            "CAST((c_custkey * 31 + c_nationkey * 17) % 89 AS BIGINT)")


def _hull_points(sf_dir: str):
    """Shared point derivation for hull/diameter: customers hashed into
    a small 97×89 integer domain (small on purpose — duplicate points
    and collinear runs actually occur, stressing the boundary rule)."""
    def mk(b: pa.Table) -> pa.Table:
        ck = b.column("c_custkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        nk = b.column("c_nationkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            "g": pa.array(nk),
            "x": pa.array((ck * 29 + nk * 13) % 97),
            "y": pa.array((ck * 31 + nk * 17) % 89),
        })
    return _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey"]).map_batches(
        mk, batch_format="pyarrow")


def q_hull(sf_dir: str):
    """Per-nation convex-hull boundary points (vertices + collinear
    edge points, exact int64 cross products): block-local hulls prune
    each block before the one bucketed shuffle — hull(union of block
    hulls) == hull(all points), so full points never shuffle
    (stages/hull.py:hull_boundary)."""
    from ..stages.hull import hull_boundary

    return hull_boundary(_hull_points(sf_dir),
                         group_col="g", x_col="x", y_col="y")


def _sql_hull() -> str:
    hx, hy = HULL_PTS
    return f"""
WITH pts AS (SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS g,
                    {hx} AS x, {hy} AS y FROM customer),
cand AS (
  SELECT p.g, p.x, p.y,
         MIN((q.x - p.x) * (r.y - p.y)
             - (q.y - p.y) * (r.x - p.x)) AS mn
  FROM pts p
  JOIN pts q ON q.g = p.g AND (q.x <> p.x OR q.y <> p.y)
  JOIN pts r ON r.g = p.g
  GROUP BY p.g, p.x, p.y, q.x, q.y)
SELECT DISTINCT g, x, y FROM cand WHERE mn >= 0"""


def q_diameter(sf_dir: str):
    """Exact per-nation squared diameter (max pairwise squared
    distance): same block-local hull pruning — the farthest pair's
    endpoints are hull vertices, so the O(k²) finale sees only pruned
    survivors (stages/hull.py:group_diameter)."""
    from ..stages.hull import group_diameter

    return group_diameter(_hull_points(sf_dir),
                          group_col="g", x_col="x", y_col="y")


def _sql_diameter() -> str:
    hx, hy = HULL_PTS
    return f"""
WITH pts AS (SELECT CAST(c_nationkey AS BIGINT) AS g,
                    {hx} AS x, {hy} AS y FROM customer)
SELECT p.g AS g,
       MAX((p.x - q.x) * (p.x - q.x)
           + (p.y - q.y) * (p.y - q.y)) AS d2
FROM pts p JOIN pts q ON q.g = p.g
GROUP BY p.g"""


def q_kendall(sf_dir: str):
    """Per-priority Kendall concordant/discordant pair counts between
    order DAY (mod 48) and whole-dollar price (mod 40) — exact integers
    from the bounded joint histogram, no pair join, no global sort
    (stages/zonal.py:kendall_counts)."""
    from ..stages.zonal import kendall_counts

    def mk(b: pa.Table) -> pa.Table:
        ts = b.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        price = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.table({
            "g": b.column("o_orderpriority"),
            "x": pa.array((ts // 86_400_000_000) % 48),
            "y": pa.array(np.floor(price).astype(np.int64) % 40),
        })

    pts = _read(sf_dir, "orders",
                ["o_orderpriority", "o_orderdate", "o_totalprice"]) \
        .map_batches(mk, batch_format="pyarrow")
    return kendall_counts(pts, "g", "x", "y")


def _sql_kendall() -> str:
    return """
WITH pts AS (SELECT o_orderpriority AS g,
                    CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)
                      % 48 AS x,
                    CAST(FLOOR(o_totalprice) AS BIGINT) % 40 AS y
             FROM orders),
nn AS (SELECT g, COUNT(*) AS n FROM pts GROUP BY g),
cd AS (SELECT p.g AS g,
              CAST(SUM(CASE WHEN p.x < q.x AND p.y < q.y
                            THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
              CAST(SUM(CASE WHEN p.x < q.x AND p.y > q.y
                            THEN 1 ELSE 0 END) AS BIGINT) AS discordant
       FROM pts p JOIN pts q ON q.g = p.g GROUP BY p.g)
SELECT nn.g AS g, nn.n AS n, cd.concordant, cd.discordant
FROM nn JOIN cd ON cd.g = nn.g"""


ENTROPY_SCALE = 65536


def q_entropy(sf_dir: str):
    """Per-language Shannon entropy of the token distribution (nats,
    VALUE-CHECKED): each vocab term contributes the exact integer
    floor(c·ln(c)·2^16) — ln is bit-identical between math.log and
    DuckDB on this libm — so sums are order-free and the one float
    finale shares its parenthesization with the oracle
    (stages/tfidf.py:token_entropy)."""
    from ..stages.tfidf import token_entropy

    docs = _read(sf_dir, "documents", ["text", "lang"])
    return token_entropy(docs, group_col="lang", scale=ENTROPY_SCALE)


def _sql_entropy() -> str:
    return rf"""
WITH tok AS (SELECT lang, unnest(regexp_extract_all(text, '\S+')) AS w
             FROM documents),
cnt AS (SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c
        FROM tok GROUP BY lang, w),
agg AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(c * ln(c) * {ENTROPY_SCALE}.0)
                             AS BIGINT)) AS BIGINT) AS s
        FROM cnt GROUP BY lang)
SELECT lang, n, s,
       ln(n) - CAST(s AS DOUBLE)
               / (CAST(n AS DOUBLE) * {ENTROPY_SCALE}.0) AS h
FROM agg"""


SIMJOIN_K, SIMJOIN_NUM, SIMJOIN_DEN = 3, 4, 5


def q_sim_join(sf_dir: str):
    """EXACT Jaccard similarity self-join (PPJoin prefix filter): all
    doc pairs whose 3-token shingle sets overlap at J >= 4/5 — complete
    where the LSH pipelines are probabilistic; integer cross-multiplied
    threshold, shingle-string-exact verify
    (stages/dedup.py:jaccard_sim_join).  Memoized per (session,
    sf_dir) — q_sim_clusters composes on the same pair set."""
    from ..stages.dedup import jaccard_sim_join

    def build():
        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        return jaccard_sim_join(docs, k=SIMJOIN_K, tau_num=SIMJOIN_NUM,
                                tau_den=SIMJOIN_DEN)

    return _edge_memo("sim_join", sf_dir, build)


def _sql_sim_join() -> str:
    k, num, den = SIMJOIN_K, SIMJOIN_NUM, SIMJOIN_DEN
    joined = " || ' ' || ".join(f"ts[i+{d}]" if d else "ts[i]"
                                for d in range(k))
    return rf"""
WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS ts
              FROM documents),
sh AS (SELECT DISTINCT doc_id,
              unnest(list_transform(range(1, len(ts) - {k - 2}),
                     i -> {joined})) AS w
       FROM toks WHERE len(ts) >= {k}),
sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz
       FROM sh GROUP BY doc_id),
pair AS (SELECT a.doc_id AS i, b.doc_id AS j,
                CAST(COUNT(*) AS BIGINT) AS inter
         FROM sh a JOIN sh b ON b.w = a.w AND b.doc_id > a.doc_id
         GROUP BY 1, 2)
SELECT p.i, p.j, p.inter, sa.sz AS si, sb.sz AS sj
FROM pair p JOIN sz sa ON sa.doc_id = p.i
            JOIN sz sb ON sb.doc_id = p.j
WHERE p.inter * {den} >= {num} * (sa.sz + sb.sz - p.inter)"""


def q_twap(sf_dir: str):
    """Per-user TIME-WEIGHTED average value (each value holds until
    the user's next event): integer-quantized floor(value·Δt) terms so
    sums are order-free, one shared float finale s/span, NULL for
    single-event users (stages/sequence.py:twap_per_key)."""
    from ..stages.sequence import twap_per_key

    events = _read(sf_dir, "events",
                   ["event_id", "ts", "user_id", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            "t": b.column("ts").cast(pa.int64()),
            "value": b.column("value"),
            "event_id": b.column("event_id"),
        })

    return twap_per_key(events.map_batches(prep, batch_format="pyarrow"),
                        "user_id", "t", "value", "event_id")


def _sql_twap() -> str:
    return """
WITH e AS (SELECT user_id, epoch_us(ts) AS t, value, event_id
           FROM events),
d AS (SELECT user_id, t, value,
             LEAD(t) OVER (PARTITION BY user_id
                           ORDER BY t, event_id) AS nt
      FROM e),
agg AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN nt IS NULL THEN 0
                             ELSE CAST(FLOOR(value * (nt - t))
                                       AS BIGINT) END) AS BIGINT) AS s,
               CAST(MAX(t) - MIN(t) AS BIGINT) AS span
        FROM d GROUP BY user_id)
SELECT user_id, n, s, span,
       CASE WHEN span = 0 THEN NULL
            ELSE CAST(s AS DOUBLE) / CAST(span AS DOUBLE) END AS twap
FROM agg"""


def q_ohlc(sf_dir: str):
    """OHLC candle bars per (user, hour): open/close by exact
    (ts, event_id) order, high/low comparisons only — no float
    arithmetic anywhere (stages/sequence.py:ohlc_bars)."""
    from ..stages.sequence import ohlc_bars

    events = _read(sf_dir, "events",
                   ["event_id", "ts", "user_id", "value"])

    def prep(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64())
        return pa.table({
            "user_id": b.column("user_id"),
            "hour": pc.divide(ts, 3_600_000_000),
            "t": ts,
            "value": b.column("value"),
            "event_id": b.column("event_id"),
        })

    return ohlc_bars(events.map_batches(prep, batch_format="pyarrow"),
                     "user_id", "hour", "t", "value", "event_id")


def _sql_ohlc() -> str:
    return """
WITH e AS (SELECT user_id,
                  CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour,
                  epoch_us(ts) AS t, value, event_id FROM events),
r AS (SELECT user_id, hour, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, hour
                                ORDER BY t, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id, hour) AS cnt
      FROM e)
SELECT user_id, hour, CAST(MAX(cnt) AS BIGINT) AS n,
       MAX(CASE WHEN rn = 1 THEN value END) AS open,
       MAX(value) AS high, MIN(value) AS low,
       MAX(CASE WHEN rn = cnt THEN value END) AS close
FROM r GROUP BY user_id, hour"""


def q_rle(sf_dir: str):
    """Run-length encoding of each user's event-type sequence (the
    gaps-and-islands compaction): consecutive equal types in
    (ts, event_id) order collapse to (user, run_id, type, run_len)
    (stages/sequence.py:rle_runs)."""
    from ..stages.sequence import rle_runs

    events = _read(sf_dir, "events",
                   ["event_id", "ts", "user_id", "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            "event_type": b.column("event_type"),
            "t": b.column("ts").cast(pa.int64()),
            "event_id": b.column("event_id"),
        })

    return rle_runs(events.map_batches(prep, batch_format="pyarrow"),
                    "user_id", "event_type", "t", "event_id")


def _sql_rle() -> str:
    return """
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t, event_id
           FROM events),
r AS (SELECT user_id, event_type, t, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY t, event_id) AS rn,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY t, event_id) AS rt
      FROM e),
g AS (SELECT user_id, event_type, rn - rt AS grp, MIN(rn) AS srn,
             CAST(COUNT(*) AS BIGINT) AS run_len
      FROM r GROUP BY user_id, event_type, rn - rt)
SELECT user_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY srn)
            AS BIGINT) AS run_id,
       event_type, run_len
FROM g"""


def q_sim_clusters(sf_dir: str):
    """Exact near-duplicate CLUSTERS: the complete jaccard_sim_join
    pair set closed under connectivity (min-doc-id labels) — the
    entity-resolution composition sim-join -> connected components;
    only docs with at least one partner appear (clusters of size >= 2)
    (stages/dedup.py:jaccard_sim_join + stages/graph.py:
    connected_components)."""
    from ..stages.graph import connected_components

    pairs = q_sim_join(sf_dir)
    edges = pairs.map_batches(
        lambda b: pa.table({"src": b.column("i"), "dst": b.column("j")}),
        batch_format="pyarrow")
    cc = connected_components(edges)
    return cc.map_batches(
        lambda b: b.rename_columns(["doc_id", "cluster"]),
        batch_format="pyarrow")


def _sql_sim_clusters() -> str:
    sim = _sql_sim_join()
    return f"""
WITH RECURSIVE
simp AS ({sim}),
edge AS (SELECT DISTINCT a, b FROM
         (SELECT i AS a, j AS b FROM simp
          UNION ALL SELECT j AS a, i AS b FROM simp)),
walk(id, r) AS (
  SELECT DISTINCT a, a FROM edge
  UNION
  SELECT w.id, e.b FROM walk w JOIN edge e ON e.a = w.r
)
SELECT id AS doc_id, MIN(r) AS cluster FROM walk GROUP BY id"""


SSSP_SEED_MOD, SSSP_ROUNDS = 50, 3


def q_sssp(sf_dir: str):
    """Multi-source bounded-round WEIGHTED shortest paths over the
    lineitem-count trade graph (Bellman-Ford layering, changed-delta
    broadcast / full-state bucketed) — the weighted sibling of
    bfs_hops (stages/graph.py:sssp_bounded)."""
    from ..stages.graph import distinct_tuples, sssp_bounded

    edges = _trade_edges_weighted(sf_dir).materialize()

    def seed_partial(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(
            np.unique(s[s % SSSP_SEED_MOD == 0]))})

    seeds = distinct_tuples(
        edges.map_batches(seed_partial, batch_format="pyarrow"),
        ["node"])
    return sssp_bounded(edges, seeds, max_rounds=SSSP_ROUNDS)


def _sql_sssp() -> str:
    ctes = [
        _SQL_GRAPH_EDGES_W,
        (f"d0 AS (SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS dist"
         f" FROM edges WHERE src % {SSSP_SEED_MOD} = 0)"),
    ]
    for i in range(1, SSSP_ROUNDS + 1):
        ctes.append(f"""d{i} AS (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM d{i - 1}
    UNION ALL
    SELECT e.dst AS node, r.dist + e.w AS dist
    FROM edges e JOIN d{i - 1} r ON r.node = e.src
  ) GROUP BY 1)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, CAST(dist AS BIGINT) AS dist"
              f" FROM d{SSSP_ROUNDS}")


def q_norm_dedup(sf_dir: str):
    """Exact dedup on CANONICALIZED text (lowercase, non-alnum runs ->
    one space, trim — byte-identical RE2 on both sides): smallest
    doc_id survives with the collapsed-group size; combiner-first so
    duplicate-heavy blocks shrink before the one shuffle
    (stages/dedup.py:normalized_dedup)."""
    from ..stages.dedup import normalized_dedup

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return normalized_dedup(docs)


def _sql_norm_dedup() -> str:
    return """
WITH n AS (SELECT doc_id,
                  trim(regexp_replace(regexp_replace(lower(text),
                       '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g')) AS norm
           FROM documents)
SELECT MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_dups
FROM n GROUP BY norm"""


T5_BLOCK, T5_LEN, T5_A, T5_C, T5_P = 20, 3, 2654435761, 40503, 2147483647


def q_t5_spans(sf_dir: str):
    """T5-style span-corruption masking index: one hash-placed
    3-token span per full 20-token block, deterministic and RNG-free —
    a pure stateless map, nothing shuffles
    (stages/corpus.py:span_corruption_index)."""
    from ..stages.corpus import span_corruption_index

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return span_corruption_index(docs, block=T5_BLOCK, span_len=T5_LEN,
                                 hash_a=T5_A, hash_c=T5_C, hash_p=T5_P)


def _sql_t5_spans() -> str:
    b, ln, a, c, p = T5_BLOCK, T5_LEN, T5_A, T5_C, T5_P
    win = b - ln + 1
    return rf"""
WITH tok AS (SELECT doc_id,
                    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
                      AS nt
             FROM documents),
blks AS (SELECT doc_id, CAST(unnest(range(nt // {b})) AS BIGINT) AS blk
         FROM tok WHERE nt >= {b})
SELECT doc_id, blk AS block,
       blk * {b} + ((doc_id * {a} + blk * {c}) % {p}) % {win} AS start,
       CAST({ln} AS BIGINT) AS mlen
FROM blks"""


def q_kl_sources(sf_dir: str):
    """Per-source KL divergence of the token distribution from the
    corpus distribution (nats, VALUE-CHECKED) — the data-mixing
    diagnostic; same quantized-ln discipline as entropy
    (stages/tfidf.py:kl_divergence_by_group)."""
    from ..stages.tfidf import kl_divergence_by_group

    docs = _read(sf_dir, "documents", ["text", "source"])
    return kl_divergence_by_group(docs, group_col="source",
                                  scale=ENTROPY_SCALE)


def _sql_kl_sources() -> str:
    return rf"""
WITH tok AS (SELECT source, unnest(regexp_extract_all(text, '\S+')) AS w
             FROM documents),
cst AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
        FROM tok GROUP BY 1, 2),
ct AS (SELECT w, CAST(SUM(c) AS BIGINT) AS ct FROM cst GROUP BY w),
ns AS (SELECT source, CAST(SUM(c) AS BIGINT) AS ns
       FROM cst GROUP BY source),
nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cst),
terms AS (SELECT cst.source,
                 CAST(FLOOR(cst.c * (ln(cst.c) - ln(ns.ns) - ln(ct.ct)
                                     + ln(nn.n)) * {ENTROPY_SCALE}.0)
                      AS BIGINT) AS t
          FROM cst JOIN ct USING (w) JOIN ns USING (source)
               CROSS JOIN nn),
agg AS (SELECT source, CAST(SUM(t) AS BIGINT) AS s
        FROM terms GROUP BY source)
SELECT agg.source AS source, ns.ns AS n, agg.s AS s,
       CAST(agg.s AS DOUBLE)
       / (CAST(ns.ns AS DOUBLE) * {ENTROPY_SCALE}.0) AS kl
FROM agg JOIN ns USING (source)"""


def q_jsd(sf_dir: str):
    """Pairwise JENSEN-SHANNON divergence between source token
    distributions (the source-similarity matrix, VALUE-CHECKED):
    every ln argument is an exact integer product so the
    kl_sources quantized-ln discipline extends — per-(pair, token)
    integer terms, one shared (s_a/n_a + s_b/n_b)/(2·scale) float
    finale (stages/tfidf.py:jsd_source_pairs)."""
    from ..stages.tfidf import jsd_source_pairs

    docs = _read(sf_dir, "documents", ["text", "source"])
    return jsd_source_pairs(docs, group_col="source",
                            scale=ENTROPY_SCALE)


def _sql_jsd() -> str:
    sc = ENTROPY_SCALE
    return rf"""
WITH tok AS (SELECT source, unnest(regexp_extract_all(text, '\S+')) AS w
             FROM documents),
cst AS MATERIALIZED (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
                     FROM tok GROUP BY 1, 2),
ns AS MATERIALIZED (SELECT source, CAST(SUM(c) AS BIGINT) AS n
                    FROM cst GROUP BY source),
terms AS (SELECT a.source AS sa, n2.source AS sb,
                 CAST(FLOOR(a.c * (ln(2 * a.c * n2.n)
                            - ln(a.c * n2.n + COALESCE(b.c, 0) * n1.n))
                            * {sc}.0) AS BIGINT) AS t
          FROM cst a
          JOIN ns n1 ON n1.source = a.source
          CROSS JOIN ns n2
          LEFT JOIN cst b ON b.w = a.w AND b.source = n2.source
          WHERE n2.source <> a.source),
sagg AS MATERIALIZED (SELECT sa, sb, CAST(SUM(t) AS BIGINT) AS s
                      FROM terms GROUP BY 1, 2)
SELECT l.sa AS src_a, l.sb AS src_b, n1.n AS n_a, n2.n AS n_b,
       l.s AS s_a, r.s AS s_b,
       (CAST(l.s AS DOUBLE) / CAST(n1.n AS DOUBLE)
        + CAST(r.s AS DOUBLE) / CAST(n2.n AS DOUBLE))
       / (2.0 * {sc}.0) AS jsd
FROM sagg l JOIN sagg r ON r.sa = l.sb AND r.sb = l.sa
JOIN ns n1 ON n1.source = l.sa
JOIN ns n2 ON n2.source = l.sb
WHERE l.sa < l.sb"""


def q_er_canonical(sf_dir: str):
    """Entity-resolution flagship composition: EXACT sim-join pairs →
    connectivity closure (sim_clusters) → keep the HIGHEST-quality
    member per cluster (n_chars argmax, id ties) — the canonical-record
    table an ER pipeline publishes
    (q_sim_clusters + stages/dedup.py:select_canonical)."""
    from ..stages.dedup import select_canonical

    labels = q_sim_clusters(sf_dir).map_batches(
        lambda b: b.rename_columns(["doc_id", "dup_group"]),
        batch_format="pyarrow")
    meta = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    return select_canonical(labels, meta)


def _sql_er_canonical() -> str:
    cl = _sql_sim_clusters()
    return f"""
WITH cl AS ({cl}),
q AS (SELECT cl.cluster AS dup_group, cl.doc_id, d.n_chars,
             ROW_NUMBER() OVER (PARTITION BY cl.cluster
                                ORDER BY d.n_chars DESC, cl.doc_id)
               AS rn,
             CAST(COUNT(*) OVER (PARTITION BY cl.cluster) AS BIGINT)
               AS n_members
      FROM cl JOIN documents d USING (doc_id))
SELECT dup_group, doc_id AS kept_doc, n_chars AS kept_quality,
       n_members
FROM q WHERE rn = 1"""


CENTROID_SCALE = 1 << 20


def q_centroids(sf_dir: str):
    """Per-label embedding centroids (class prototypes) — quantized
    floor(v·2^20) integer element sums commute across blocks, one
    shared float mean finale; vectors never shuffle
    (stages/cluster.py:label_centroids)."""
    from ..stages.cluster import label_centroids

    emb = _read(sf_dir, "embeddings", ["embedding", "label"])
    return label_centroids(emb, dim=SCORE_DIM, scale=CENTROID_SCALE)


def _sql_centroids() -> str:
    return f"""
WITH el AS (SELECT CAST(label AS BIGINT) AS label, d.d AS d,
                   CAST(FLOOR(CAST(embedding[d.d + 1] AS DOUBLE)
                              * {CENTROID_SCALE}.0) AS BIGINT) AS q
            FROM embeddings,
                 LATERAL (SELECT unnest(range({SCORE_DIM})) AS d) d),
agg AS (SELECT label, d, CAST(SUM(q) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM el GROUP BY label, d)
SELECT label, d, n, s,
       CAST(s AS DOUBLE)
       / (CAST(n AS DOUBLE) * {CENTROID_SCALE}.0) AS mean
FROM agg"""


def q_proto_sim(sf_dir: str):
    """Class-confusability matrix: pairwise cosine between label
    centroids over the quantized integer sums — exact-Python-int dots
    (they overflow int64), IEEE-exact sqrt finale
    (stages/cluster.py:centroid_cosine_pairs)."""
    from ..stages.cluster import centroid_cosine_pairs

    emb = _read(sf_dir, "embeddings", ["embedding", "label"])
    return centroid_cosine_pairs(emb, dim=SCORE_DIM,
                                 scale=CENTROID_SCALE)


def _sql_proto_sim() -> str:
    return f"""
WITH el AS (SELECT CAST(label AS BIGINT) AS label, d.d AS d,
                   CAST(FLOOR(CAST(embedding[d.d + 1] AS DOUBLE)
                              * {CENTROID_SCALE}.0) AS BIGINT) AS q
            FROM embeddings,
                 LATERAL (SELECT unnest(range({SCORE_DIM})) AS d) d),
agg AS (SELECT label, d, CAST(SUM(q) AS BIGINT) AS s
        FROM el GROUP BY label, d),
pair AS (SELECT a.label AS la, b.label AS lb,
                SUM(CAST(a.s AS HUGEINT) * b.s) AS num,
                SUM(CAST(a.s AS HUGEINT) * a.s) AS da,
                SUM(CAST(b.s AS HUGEINT) * b.s) AS db
         FROM agg a JOIN agg b ON b.d = a.d AND b.label > a.label
         GROUP BY 1, 2)
SELECT la, lb,
       CASE WHEN num IS NULL OR da = 0 OR db = 0 THEN NULL
            ELSE CAST(num AS DOUBLE)
                 / (sqrt(CAST(da AS DOUBLE)) * sqrt(CAST(db AS DOUBLE)))
       END AS cos
FROM pair"""


GRAM_SCALE = 1 << 16


def q_gram(sf_dir: str):
    """Exact integer Gram matrix of the embedding column (the PCA /
    covariance precursor): every block reduces to the SAME d(d+1)/2
    upper-triangle rows via one d x d int64 matmul, so the shuffle
    moves a constant ~2k rows per block and vectors never move
    (stages/cluster.py:gram_matrix)."""
    from ..stages.cluster import gram_matrix

    emb = _read(sf_dir, "embeddings", ["embedding"])
    return gram_matrix(emb, dim=SCORE_DIM, scale=GRAM_SCALE)


def _sql_gram() -> str:
    return f"""
WITH el AS (SELECT vec_id, d.d AS d,
                   CAST(FLOOR(CAST(embedding[d.d + 1] AS DOUBLE)
                              * {GRAM_SCALE}.0) AS BIGINT) AS q
            FROM embeddings,
                 LATERAL (SELECT unnest(range({SCORE_DIM})) AS d) d)
SELECT a.d AS i, b.d AS j, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(a.q * b.q) AS BIGINT) AS s,
       CAST(SUM(a.q * b.q) AS DOUBLE)
       / (CAST(COUNT(*) AS DOUBLE) * {GRAM_SCALE}.0 * {GRAM_SCALE}.0)
           AS gram
FROM el a JOIN el b ON b.vec_id = a.vec_id AND b.d >= a.d
GROUP BY a.d, b.d"""


UNION_RECT_EXPRS = (
    "(c_custkey * 37 + c_nationkey * 5) % 1200",
    "(c_custkey * 41 + c_nationkey * 3) % 1200",
    "16 + (c_custkey * 13) % 120",
    "16 + (c_custkey * 17) % 96",
)


def q_union_area(sf_dir: str):
    """Exact per-nation UNION AREA of customer-derived rectangles
    (Klee's measure problem / ST_Union area): rects clip to grid cells
    (union area is additive over disjoint cells), one bucketed shuffle,
    per-cell x-compression + cummax y-sweep — no global sweep anywhere
    (stages/zonal.py:rect_union_area)."""
    from ..stages.zonal import rect_union_area

    def mk(b: pa.Table) -> pa.Table:
        ck = b.column("c_custkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        nk = b.column("c_nationkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        x0 = (ck * 37 + nk * 5) % 1200
        y0 = (ck * 41 + nk * 3) % 1200
        w = 16 + (ck * 13) % 120
        h = 16 + (ck * 17) % 96
        return pa.table({
            "g": pa.array(nk), "x0": pa.array(x0), "y0": pa.array(y0),
            "x1": pa.array(x0 + w), "y1": pa.array(y0 + h),
        })

    rects = _read(sf_dir, "customer",
                  ["c_custkey", "c_nationkey"]).map_batches(
        mk, batch_format="pyarrow")
    return rect_union_area(rects, cell=BBOX_CELL)


def _sql_union_area() -> str:
    x0e, y0e, we, he = UNION_RECT_EXPRS
    return f"""
WITH r AS (SELECT CAST(c_nationkey AS BIGINT) AS g,
                  CAST({x0e} AS BIGINT) AS x0,
                  CAST({y0e} AS BIGINT) AS y0,
                  CAST({x0e} + ({we}) AS BIGINT) AS x1,
                  CAST({y0e} + ({he}) AS BIGINT) AS y1 FROM customer),
xs AS (SELECT DISTINCT g, x FROM
       (SELECT g, x0 AS x FROM r UNION ALL SELECT g, x1 FROM r)),
sl AS (SELECT g, x AS sx,
              LEAD(x) OVER (PARTITION BY g ORDER BY x) AS ex FROM xs),
sv AS (SELECT s.g, s.sx, s.ex, r.y0, r.y1
       FROM sl s JOIN r ON r.g = s.g AND r.x0 <= s.sx AND s.sx < r.x1
       WHERE s.ex IS NOT NULL),
w2 AS (SELECT g, sx, ex, y0, y1,
              MAX(y1) OVER (PARTITION BY g, sx ORDER BY y0, y1
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS pmax
       FROM sv),
c2 AS (SELECT g, sx, ex,
              GREATEST(y1 - GREATEST(y0, COALESCE(pmax, 0)), 0) AS add_
       FROM w2)
SELECT g, CAST(SUM((ex - sx) * add_) AS BIGINT) AS area
FROM c2 GROUP BY g"""


TREACH_START, TREACH_ROUNDS, TREACH_SEED_MOD = 9500, 3, 50


def q_temporal_reach(sf_dir: str):
    """Time-respecting earliest-arrival reachability over the
    timestamped trade graph (edge = a customer-supplier order on an
    epoch-day; a path's days must be non-decreasing): 3 rounds from
    every node % 50 == 0 starting at day 9500
    (stages/graph.py:temporal_reachability)."""
    import pandas as pd

    from ..stages.bucketed import bucketed_groupby
    from ..stages.graph import distinct_tuples, temporal_reachability
    from ..stages.hashjoin import bucketed_join

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey"]).map_batches(
        lambda b: b.rename_columns(["o_orderkey", "l_suppkey"]),
        batch_format="pyarrow")
    pairs = bucketed_join(li, orders, ["o_orderkey"])

    def to_edges(b: pa.Table) -> pa.Table:
        c = b.column("o_custkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        s = b.column("l_suppkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        day = (b.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False) // 86_400_000_000)
        df = pd.DataFrame({"cnode": c * 2, "snode": s * 2 + 1,
                           "ts": day}).drop_duplicates()
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    tri = distinct_tuples(
        pairs.map_batches(to_edges, batch_format="pyarrow"),
        ["cnode", "snode", "ts"])

    def symm(b: pa.Table) -> pa.Table:
        c = b.column("cnode").combine_chunks()
        s = b.column("snode").combine_chunks()
        t = b.column("ts").combine_chunks()
        return pa.table({"src": pa.concat_arrays([c, s]),
                         "dst": pa.concat_arrays([s, c]),
                         "ts": pa.concat_arrays([t, t])})

    edges = tri.map_batches(symm, batch_format="pyarrow").materialize()

    def seed_partial(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(
            np.unique(s[s % TREACH_SEED_MOD == 0]))})

    seeds = distinct_tuples(
        edges.map_batches(seed_partial, batch_format="pyarrow"),
        ["node"])
    return temporal_reachability(edges, seeds, start=TREACH_START,
                                 max_rounds=TREACH_ROUNDS)


def _sql_temporal_reach() -> str:
    ctes = [
        ("pairs AS (SELECT DISTINCT o.o_custkey * 2 AS cnode,"
         " l.l_suppkey * 2 + 1 AS snode,"
         " CAST(epoch_us(o.o_orderdate) // 86400000000 AS BIGINT) AS ts"
         " FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey)"),
        ("edges AS (SELECT cnode AS src, snode AS dst, ts FROM pairs"
         " UNION ALL SELECT snode AS src, cnode AS dst, ts FROM pairs)"),
        (f"d0 AS (SELECT DISTINCT src AS node,"
         f" CAST({TREACH_START} AS BIGINT) AS t FROM edges"
         f" WHERE src % {TREACH_SEED_MOD} = 0)"),
    ]
    for i in range(1, TREACH_ROUNDS + 1):
        ctes.append(f"""d{i} AS (
  SELECT node, MIN(t) AS t FROM (
    SELECT node, t FROM d{i - 1}
    UNION ALL
    SELECT e.dst AS node, e.ts AS t
    FROM edges e JOIN d{i - 1} r ON r.node = e.src AND e.ts >= r.t
  ) GROUP BY 1)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, CAST(t AS BIGINT) AS t"
              f" FROM d{TREACH_ROUNDS}")


def q_wmedian(sf_dir: str):
    """Per-returnflag WEIGHTED median whole-dollar price, weighted by
    integer quantity — exact lower weighted median from the bounded
    (key, value) histogram, cost O(distinct values)
    (stages/zonal.py:grouped_weighted_median)."""
    from ..stages.zonal import grouped_weighted_median

    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_extendedprice", "l_quantity"])

    def prep(b: pa.Table) -> pa.Table:
        price = b.column("l_extendedprice").to_numpy(
            zero_copy_only=False)
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False)
        return pa.table({
            "flag": b.column("l_returnflag"),
            "v": pa.array(np.floor(price).astype(np.int64) % 1000),
            "w": pa.array(qty.astype(np.int64)),
        })

    return grouped_weighted_median(
        li.map_batches(prep, batch_format="pyarrow"),
        ["flag"], "v", "w")


def _sql_wmedian() -> str:
    return """
WITH src AS (SELECT l_returnflag AS flag,
                    CAST(FLOOR(l_extendedprice) AS BIGINT) % 1000 AS v,
                    CAST(l_quantity AS BIGINT) AS w FROM lineitem),
h AS (SELECT flag, v, CAST(SUM(w) AS BIGINT) AS w
      FROM src GROUP BY flag, v),
c AS (SELECT flag, v, w,
             SUM(w) OVER (PARTITION BY flag ORDER BY v) AS cw,
             SUM(w) OVER (PARTITION BY flag) AS tw FROM h)
SELECT flag, CAST(MIN(CASE WHEN 2 * cw >= tw THEN v END) AS BIGINT)
         AS wmedian,
       CAST(MAX(tw) AS BIGINT) AS total_w
FROM c GROUP BY flag"""


def q_delta_simjoin(sf_dir: str):
    """CROSS-RUN incremental EXACT sim join: run 1 seeds a persistent
    shingle-set store with the even-doc_id half; run 2 matches the odd
    half against stored + new — output is run 2's pairs, i.e. every
    J >= 4/5 pair with at least one ODD side
    (stages/dedup.py:incremental_sim_join)."""
    import shutil
    import tempfile

    from ..stages.dedup import incremental_sim_join

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def half(parity):
        def fn(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            return b.filter(pa.array(ids % 2 == parity))
        return fn

    store = tempfile.mkdtemp(prefix="zen3geo_deltasim_")
    try:
        # run 1 seeds the store EAGERLY inside the call (new_sets
        # write_parquet); its pair output is never consumed, so the
        # run-1 candidate/verify pipeline never executes
        incremental_sim_join(
            docs.map_batches(half(0), batch_format="pyarrow"), store,
            k=SIMJOIN_K, tau_num=SIMJOIN_NUM, tau_den=SIMJOIN_DEN)
        fresh = incremental_sim_join(
            docs.map_batches(half(1), batch_format="pyarrow"), store,
            k=SIMJOIN_K, tau_num=SIMJOIN_NUM, tau_den=SIMJOIN_DEN)
        return fresh.materialize()
    finally:
        shutil.rmtree(store, ignore_errors=True)


def _sql_delta_simjoin() -> str:
    sim = _sql_sim_join()
    return f"""
WITH simp AS ({sim})
SELECT i, j, inter, si, sj FROM simp
WHERE i % 2 = 1 OR j % 2 = 1"""


def q_drawdown(sf_dir: str):
    """Per-user maximum drawdown of the event value series (cents,
    running-peak minus value) in (ts, event_id) order — all integers
    (stages/sequence.py:max_drawdown)."""
    from ..stages.sequence import max_drawdown

    ev = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "value"])

    def prep(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": b.column("user_id"),
            "t": b.column("ts").cast(pa.int64()),
            "c": pa.array(np.rint(v * 100.0).astype(np.int64)),
            "event_id": b.column("event_id"),
        })

    return max_drawdown(ev.map_batches(prep, batch_format="pyarrow"),
                        "user_id", "t", "c", "event_id")


def _sql_drawdown() -> str:
    return """
WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id,
                  CAST(ROUND(value * 100.0) AS BIGINT) AS c
           FROM events),
w AS (SELECT user_id, c,
             MAX(c) OVER (PARTITION BY user_id ORDER BY t, event_id
                          ROWS UNBOUNDED PRECEDING) AS pk
      FROM e)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MAX(pk - c) AS BIGINT) AS max_drawdown,
       CAST(MAX(pk) AS BIGINT) AS peak
FROM w GROUP BY user_id"""


def q_extent(sf_dir: str):
    """Per-language bounding box of the geocoded corpus (the
    geopandas total_bounds / ST_Extent surface): grouped float min/max
    — comparisons only, no arithmetic, so doubles mirror exactly."""
    pts = _geocoded(sf_dir, RES_ZONAL, keep_extra=["lang"])

    def prep(b: pa.Table) -> pa.Table:
        return b.select(["lang", "lon", "lat"])

    from ..stages.bucketed import bucketed_groupby

    def fold(df):
        out = df.groupby("lang", sort=False).agg(
            n=("lon", "size"), minx=("lon", "min"), miny=("lat", "min"),
            maxx=("lon", "max"), maxy=("lat", "max")).reset_index()
        out["n"] = out["n"].astype(np.int64)
        return out

    return bucketed_groupby(
        pts.map_batches(prep, batch_format="pyarrow"), ["lang"], fold,
        n_buckets=4)


def _sql_extent() -> str:
    lon, lat = sql_geocode_exprs("doc_id", "lang")
    return f"""
WITH g AS (SELECT lang, {lon} AS lon, {lat} AS lat FROM documents)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
       MIN(lon) AS minx, MIN(lat) AS miny,
       MAX(lon) AS maxx, MAX(lat) AS maxy
FROM g GROUP BY lang"""


INTERP_H0, INTERP_H1 = 473500, 473571  # 72-hour grid inside the corpus


def q_interp(sf_dir: str):
    """Per-user linear interpolation of the event value series onto a
    fixed 72-hour grid (the resample/align step): prev/next bracketing
    events, inner as-of semantics, one shared float expression
    (stages/sequence.py:linear_interp_grid)."""
    from ..stages.sequence import linear_interp_grid

    ev = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "value"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            "t": b.column("ts").cast(pa.int64()),
            "value": b.column("value"),
            "event_id": b.column("event_id"),
        })

    return linear_interp_grid(
        ev.map_batches(prep, batch_format="pyarrow"),
        "user_id", "t", "value", "event_id",
        hour_lo=INTERP_H0, hour_hi=INTERP_H1)


def _sql_interp() -> str:
    return f"""
WITH e0 AS (SELECT user_id, epoch_us(ts) AS t, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id, epoch_us(ts)
                                      ORDER BY event_id DESC) AS rn
            FROM events),
e AS (SELECT user_id, t, value FROM e0 WHERE rn = 1),
u AS (SELECT DISTINCT user_id FROM e),
g2 AS (SELECT user_id,
              CAST(unnest(range({INTERP_H0}, {INTERP_H1} + 1))
                   AS BIGINT) AS h FROM u),
g3 AS (SELECT user_id, h, h * 3600000000 AS tg FROM g2),
pv AS (SELECT g3.user_id, g3.h, g3.tg, e.t AS t0, e.value AS v0
       FROM g3 ASOF JOIN e
            ON e.user_id = g3.user_id AND e.t <= g3.tg),
nv AS (SELECT g3.user_id, g3.h, e.t AS t1, e.value AS v1
       FROM g3 ASOF JOIN e
            ON e.user_id = g3.user_id AND e.t >= g3.tg)
SELECT pv.user_id, pv.h,
       CASE WHEN nv.t1 = pv.t0 THEN pv.v0
            ELSE pv.v0 + (nv.v1 - pv.v0)
                 * (CAST(pv.tg - pv.t0 AS DOUBLE)
                    / CAST(nv.t1 - pv.t0 AS DOUBLE))
       END AS val
FROM pv JOIN nv ON nv.user_id = pv.user_id AND nv.h = pv.h"""


def q_chi2_cat(sf_dir: str):
    """Chi-square independence cells for the (lang × source)
    contingency table — per OBSERVED cell the exact integer sufficient
    stats and the one-division term (o·T − rt·ct)²/(T·rt·ct), computed
    in exact Python ints (the numerator overflows int64 at web scale);
    counts are combiner-first partials, the finale is a
    categories-bounded driver table."""
    import pandas as pd

    docs = _read(sf_dir, "documents", ["lang", "source"])

    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas().groupby(["lang", "source"], sort=False,
                                   as_index=False).size()
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    parts = docs.map_batches(partial,
                             batch_format="pyarrow").to_pandas()
    c = parts.groupby(["lang", "source"],
                      as_index=False)["size"].sum()
    rt = dict(c.groupby("lang")["size"].sum())
    ct = dict(c.groupby("source")["size"].sum())
    t = int(c["size"].sum())
    rows = {"lang": [], "source": [], "o": [], "rt": [], "ct": [],
            "term": []}
    for r in c.itertuples():
        o, rtv, ctv = int(r.size), int(rt[r.lang]), int(ct[r.source])
        num = (o * t - rtv * ctv) ** 2
        rows["lang"].append(r.lang)
        rows["source"].append(r.source)
        rows["o"].append(o)
        rows["rt"].append(rtv)
        rows["ct"].append(ctv)
        rows["term"].append(float(num) / float(t * rtv * ctv))
    return pa.table({
        "lang": pa.array(rows["lang"], pa.string()),
        "source": pa.array(rows["source"], pa.string()),
        "o": pa.array(rows["o"], pa.int64()),
        "rt": pa.array(rows["rt"], pa.int64()),
        "ct": pa.array(rows["ct"], pa.int64()),
        "term": pa.array(rows["term"], pa.float64()),
    })


def _sql_chi2_cat() -> str:
    return """
WITH c AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
           FROM documents GROUP BY 1, 2),
rt AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS rt FROM c GROUP BY lang),
ct AS (SELECT source, CAST(SUM(o) AS BIGINT) AS ct
       FROM c GROUP BY source),
tt AS (SELECT CAST(SUM(o) AS BIGINT) AS t FROM c)
SELECT c.lang, c.source, c.o, rt.rt, ct.ct,
       CAST((CAST(c.o AS HUGEINT) * tt.t - CAST(rt.rt AS HUGEINT)
             * ct.ct)
            * (CAST(c.o AS HUGEINT) * tt.t - CAST(rt.rt AS HUGEINT)
               * ct.ct) AS DOUBLE)
       / CAST(CAST(tt.t AS HUGEINT) * rt.rt * ct.ct AS DOUBLE) AS term
FROM c JOIN rt USING (lang) JOIN ct USING (source) CROSS JOIN tt"""


NEAREST_MOD = 7  # sparse admin layer: keep every 7th rect


def q_nearest_admin(sf_dir: str):
    """Nearest-rectangle join (the st_nearest / nearest-facility
    surface beside PIP): every geocoded doc to the closest rect of a
    SPARSE admin layer (every 7th grid cell), clamped squared degree
    distance, ties -> smallest id.  Rects broadcast once via ray.put;
    each batch argmins a vectorized distance panel — points never
    shuffle (stages/knn.py:nearest_rect_join)."""
    from ..stages.knn import nearest_rect_join

    layer = admin_grid(nx=ADMIN_NX, ny=ADMIN_NY)
    keep = np.flatnonzero(
        layer.column("poly_id").to_numpy() % NEAREST_MOD == 0)
    sub = layer.take(keep)
    rects = {c: sub.column(c).to_numpy(zero_copy_only=False)
             for c in ("poly_id", "minx", "miny", "maxx", "maxy")}
    pts = _geocoded(sf_dir, RES_ZONAL)
    out = nearest_rect_join(pts, rects)
    return out.map_batches(
        lambda b: b.select(["doc_id", "poly_id", "d2"]),
        batch_format="pyarrow")


def _sql_nearest_admin() -> str:
    w = 360.0 / ADMIN_NX
    h = 180.0 / ADMIN_NY
    return f"""{_sql_geo_cte(RES_ZONAL)},
rid AS (SELECT pid, pid % {ADMIN_NX} AS i, pid // {ADMIN_NX} AS j
        FROM (SELECT unnest(range({ADMIN_NX * ADMIN_NY})) AS pid)
        WHERE pid % {NEAREST_MOD} = 0),
rb AS (SELECT pid, -180.0 + i * {w!r} AS minx,
              -90.0 + j * {h!r} AS miny,
              -180.0 + (i + 1) * {w!r} AS maxx,
              -90.0 + (j + 1) * {h!r} AS maxy FROM rid),
dd AS (SELECT g.doc_id, r.pid,
  GREATEST(r.minx - g.lon, g.lon - r.maxx, 0.0) AS dx,
  GREATEST(r.miny - g.lat, g.lat - r.maxy, 0.0) AS dy
  FROM geo g CROSS JOIN rb r),
ee AS (SELECT doc_id, pid, dx * dx + dy * dy AS d2 FROM dd)
SELECT doc_id, pid AS poly_id, d2 FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY d2, pid) AS rn FROM ee)
WHERE rn = 1"""


# --- chip enumeration (SURVEY op #12 xbatcher arithmetic) ------------------


def scenes_from_part(batch: pa.Table) -> pa.Table:
    pk = batch.column("p_partkey").to_numpy(zero_copy_only=False)
    ps = batch.column("p_size").to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "scene_id": pa.array(pk),
            "height": pa.array((128 * (1 + pk % 3)).astype(np.int32), pa.int32()),
            "width": pa.array((128 * (1 + ps % 4)).astype(np.int32), pa.int32()),
        }
    )


def q_chips(sf_dir: str):
    from ..stages.chips import enumerate_chips

    scenes = _read(sf_dir, "part", ["p_partkey", "p_size"]).map_batches(
        scenes_from_part, batch_format="pyarrow"
    )
    chips = scenes.map_batches(
        lambda b: enumerate_chips(b, chip_h=64, chip_w=64), batch_format="pyarrow"
    )
    return chips.map_batches(
        lambda b: pa.table(
            {
                "scene_id": b.column("scene_id"),
                "chip_id": b.column("chip_id"),
                "chip_y": pc.cast(b.column("chip_y"), pa.int64()),
                "chip_x": pc.cast(b.column("chip_x"), pa.int64()),
                "y0": pc.cast(b.column("y0"), pa.int64()),
                "x0": pc.cast(b.column("x0"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


# --- rasterize: sparse per-tile histogram (SURVEY op #10a) ----------------


def _tile_specs() -> dict:
    tw = 360.0 / TILE_NX
    th = 180.0 / TILE_NY
    return {
        j * TILE_NX + i: dict(
            width=TILE_PX,
            height=TILE_PX,
            xmin=-180.0 + i * tw,
            ymin=-90.0 + j * th,
            xmax=-180.0 + (i + 1) * tw,
            ymax=-90.0 + (j + 1) * th,
        )
        for j in range(TILE_NY)
        for i in range(TILE_NX)
    }


def q_rasterize(sf_dir: str):
    from ray.data.aggregate import Sum

    pts = _geocoded(sf_dir, RES_ZONAL)
    specs = _tile_specs()
    tiled = pts.map_batches(
        lambda b: rz.assign_tiles(
            b, lon0=-180.0, lat0=-90.0, lon1=180.0, lat1=90.0,
            nx=TILE_NX, ny=TILE_NY,
        ),
        batch_format="pyarrow",
    )
    sparse = tiled.map_batches(
        lambda b: rz.partial_histogram(b, tile_specs=specs), batch_format="pyarrow"
    )
    return sparse.groupby(["tile_id", "py", "px"]).aggregate(Sum("n", alias_name="n"))


def q_raster_stats(sf_dir: str):
    """Rasterize with the mean/var/std reductions (the datashader ``agg=``
    surface beyond count/any/sum/min/max — reference passthrough
    ``/root/reference/zen3geo/datapipes/datashader.py:49-55``): moment
    partials (n, s, ss) inside map_batches → ONE groupby-sum over touched
    pixels → vectorized finalize.  Integer n_chars weights keep the sums
    exact, so the derived float mean/var/std match the SQL oracle
    bit-for-bit."""
    pts = _geocoded(sf_dir, RES_ZONAL, keep_extra=["n_chars"])
    specs = _tile_specs()
    tiled = pts.map_batches(
        lambda b: rz.assign_tiles(
            b, lon0=-180.0, lat0=-90.0, lon1=180.0, lat1=90.0,
            nx=TILE_NX, ny=TILE_NY,
        ),
        batch_format="pyarrow",
    )
    return rz.moment_rasters(tiled, specs, value_col="n_chars")


def q_raster_first(sf_dir: str):
    """datashader ``first`` reduction with an explicit order key: per
    touched pixel, the doc_id-first document's n_chars — per-batch
    winners then one bucketed pixel reduce (winner rows shuffle, not
    points)."""
    pts = _geocoded(sf_dir, RES_ZONAL, keep_extra=["n_chars"])
    specs = _tile_specs()
    tiled = pts.map_batches(
        lambda b: rz.assign_tiles(
            b, lon0=-180.0, lat0=-90.0, lon1=180.0, lat1=90.0,
            nx=TILE_NX, ny=TILE_NY,
        ),
        batch_format="pyarrow",
    )
    out = rz.first_last_rasters(
        tiled, specs, order_cols=["doc_id"], keep_cols=["n_chars"],
        agg="first",
    )
    return out.map_batches(
        lambda b: b.select(["tile_id", "py", "px", "doc_id", "n_chars"]),
        batch_format="pyarrow",
    )


def _sql_raster_first() -> str:
    tw = 360.0 / TILE_NX
    th = 180.0 / TILE_NY
    ix = f"LEAST(GREATEST(CAST(FLOOR((lon - -180.0) / 360.0 * {TILE_NX}) AS BIGINT), 0), {TILE_NX - 1})"
    iy = f"LEAST(GREATEST(CAST(FLOOR((lat - -90.0) / 180.0 * {TILE_NY}) AS BIGINT), 0), {TILE_NY - 1})"
    px = f"CAST(FLOOR((lon - (-180.0 + ix * {tw!r})) / {tw!r} * {TILE_PX}) AS BIGINT)"
    gy = f"CAST(FLOOR((lat - (-90.0 + iy * {th!r})) / {th!r} * {TILE_PX}) AS BIGINT)"
    return f"""
{_sql_geo_cte(RES_ZONAL, ', n_chars')},
tiled AS (SELECT doc_id, n_chars, lon, lat, {ix} AS ix, {iy} AS iy FROM geo),
binned AS (
  SELECT doc_id, n_chars,
         iy * {TILE_NX} + ix AS tile_id,
         {TILE_PX} - 1 - {gy} AS py,
         {px} AS px
  FROM tiled
)
SELECT tile_id, py, px, doc_id, n_chars FROM binned
QUALIFY ROW_NUMBER() OVER (PARTITION BY tile_id, py, px ORDER BY doc_id) = 1
"""


def q_raster_mode(sf_dir: str):
    """datashader ``mode`` reduction analog: per touched pixel, the most
    frequent lang (ties → smallest) — the shared pixel binning step then
    the holistic grouped_mode (per-batch (pixel, value, n) partials; the
    shuffle is bounded by distinct (pixel, value) pairs, never points)
    (stages/rasterize.py:pixel_bin_batch, stages/zonal.py:grouped_mode)."""
    from ..stages.zonal import grouped_mode

    pts = _geocoded(sf_dir, RES_ZONAL, keep_extra=["lang"])
    specs = _tile_specs()
    tiled = pts.map_batches(
        lambda b: rz.assign_tiles(
            b, lon0=-180.0, lat0=-90.0, lon1=180.0, lat1=90.0,
            nx=TILE_NX, ny=TILE_NY,
        ),
        batch_format="pyarrow",
    )
    binned = tiled.map_batches(
        lambda b: rz.pixel_bin_batch(b, tile_specs=specs),
        batch_format="pyarrow",
    ).map_batches(lambda b: b.select(["tile_id", "py", "px", "lang"]),
                  batch_format="pyarrow")
    return grouped_mode(binned, ["tile_id", "py", "px"], "lang")


def _sql_raster_mode() -> str:
    tw = 360.0 / TILE_NX
    th = 180.0 / TILE_NY
    ix = f"LEAST(GREATEST(CAST(FLOOR((lon - -180.0) / 360.0 * {TILE_NX}) AS BIGINT), 0), {TILE_NX - 1})"
    iy = f"LEAST(GREATEST(CAST(FLOOR((lat - -90.0) / 180.0 * {TILE_NY}) AS BIGINT), 0), {TILE_NY - 1})"
    px = f"CAST(FLOOR((lon - (-180.0 + ix * {tw!r})) / {tw!r} * {TILE_PX}) AS BIGINT)"
    gy = f"CAST(FLOOR((lat - (-90.0 + iy * {th!r})) / {th!r} * {TILE_PX}) AS BIGINT)"
    return f"""
{_sql_geo_cte(RES_ZONAL, ', lang')},
tiled AS (SELECT lang, lon, lat, {ix} AS ix, {iy} AS iy FROM geo),
binned AS (
  SELECT lang,
         iy * {TILE_NX} + ix AS tile_id,
         {TILE_PX} - 1 - {gy} AS py,
         {px} AS px
  FROM tiled
),
cnt AS (SELECT tile_id, py, px, lang, CAST(COUNT(*) AS BIGINT) AS n
        FROM binned GROUP BY 1, 2, 3, 4)
SELECT tile_id, py, px, lang AS mode_v, n AS mode_n FROM cnt
QUALIFY ROW_NUMBER() OVER (PARTITION BY tile_id, py, px
                           ORDER BY n DESC, lang) = 1
"""


# --- multi-resolution rollup (docs/multi-resolution.md analog) ------------

RES_COARSE = 2


def q_multires(sf_dir: str):
    """Hierarchical rollup: zonal at RES_ZONAL, then parent-cell (RES_COARSE)
    re-aggregation — the DataTree lowres/highres analog as two keyed
    aggregations sharing the cell hierarchy (integer parent arithmetic,
    no re-geocode)."""
    from ray.data.aggregate import Sum

    fine = zonal.zonal_aggregate(
        _geocoded(sf_dir, RES_ZONAL), ["cell"], {}
    )

    def add_parent(b: pa.Table) -> pa.Table:
        c = b.column("cell").to_numpy(zero_copy_only=False)
        p = cells.parent(c, RES_ZONAL, RES_COARSE)
        return pa.table({"parent_cell": pa.array(p, pa.int64()),
                         "n": b.column("n")})

    return (
        fine.map_batches(add_parent, batch_format="pyarrow")
        .groupby("parent_cell")
        .aggregate(Sum("n", alias_name="n"))
    )


WARP_DST = {"x0": -120.0, "y0": -60.0, "x1": 60.0, "y1": 30.0,
            "w": 48, "h": 32}


def q_warp(sf_dir: str):
    """Nearest-neighbor warp/regrid (the rioxarray ``rio.reproject``
    analog): resample the sparse count raster onto a cropped
    finer-resolution target grid — source rows map to global integer
    pixel keys shuffle-free, target pixels stream from range(w*h), ONE
    bucketed hash join samples them; no dense raster is ever assembled
    (stages/rasterize.py:regrid_nearest)."""
    sparse = q_rasterize(sf_dir)
    src = {"x0": -180.0, "y0": -90.0, "x1": 180.0, "y1": 90.0,
           "nx": TILE_NX, "ny": TILE_NY, "px": TILE_PX}
    return rz.regrid_nearest(sparse, src=src, dst=WARP_DST)


def _sql_warp() -> str:
    d = WARP_DST
    w, h = d["w"], d["h"]
    nx, ny, pxn = TILE_NX, TILE_NY, TILE_PX
    pw = (180.0 - -180.0) / (nx * pxn)
    ph = (90.0 - -90.0) / (ny * pxn)
    tw = (d["x1"] - d["x0"]) / w
    th = (d["y1"] - d["y0"]) / h
    return f"""{_sql_rasterize_cte()},
srcg AS (
  SELECT (tile_id % {nx}) * {pxn} + px AS gx,
         ({ny} - 1 - tile_id // {nx}) * {pxn} + py AS gyt,
         n
  FROM hist
),
tgt AS (SELECT i // {w} AS ty, i % {w} AS tx FROM range(0, {w * h}) t(i)),
tk AS (
  SELECT ty, tx,
    CAST(FLOOR((({d["x0"]!r} + (tx + 0.5) * {tw!r}) - {-180.0!r})
               / {pw!r}) AS BIGINT) AS gx,
    CAST(FLOOR(({90.0!r} - ({d["y1"]!r} - (ty + 0.5) * {th!r}))
               / {ph!r}) AS BIGINT) AS gyt
  FROM tgt
),
tkf AS (SELECT * FROM tk
        WHERE gx >= 0 AND gx < {nx * pxn} AND gyt >= 0 AND gyt < {ny * pxn})
SELECT ty, tx, n FROM tkf JOIN srcg USING (gx, gyt)"""


def q_warp_bilinear(sf_dir: str):
    """Bilinear warp/regrid (the smooth ``Resampling.bilinear`` mode):
    target centers interpolate the 4 surrounding source pixel centers,
    absent sparse neighbors contribute 0; bm25-style float discipline —
    per-neighbor term = v * ((xw) * (yw)), quadrant-masked exact sums,
    ONE shared parenthesization — so the DOUBLE output value-checks
    bit-exactly (stages/rasterize.py:regrid_bilinear)."""
    sparse = q_rasterize(sf_dir)
    src = {"x0": -180.0, "y0": -90.0, "x1": 180.0, "y1": 90.0,
           "nx": TILE_NX, "ny": TILE_NY, "px": TILE_PX}
    return rz.regrid_bilinear(sparse, src=src, dst=WARP_DST)


def _sql_warp_bilinear() -> str:
    d = WARP_DST
    w, h = d["w"], d["h"]
    nx, ny, pxn = TILE_NX, TILE_NY, TILE_PX
    gw, gh = nx * pxn, ny * pxn
    pw = (180.0 - -180.0) / gw
    ph = (90.0 - -90.0) / gh
    tw = (d["x1"] - d["x0"]) / w
    th = (d["y1"] - d["y0"]) / h
    return f"""{_sql_rasterize_cte()},
srcg AS (
  SELECT (tile_id % {nx}) * {pxn} + px AS gx,
         ({ny} - 1 - tile_id // {nx}) * {pxn} + py AS gyt,
         n
  FROM hist
),
tgt AS (SELECT i // {w} AS ty, i % {w} AS tx FROM range(0, {w * h}) t(i)),
f AS (
  SELECT ty, tx,
    ((({d["x0"]!r} + (tx + 0.5) * {tw!r}) - {-180.0!r}) / {pw!r} - 0.5)
      AS fx,
    (({90.0!r} - ({d["y1"]!r} - (ty + 0.5) * {th!r})) / {ph!r} - 0.5)
      AS fy
  FROM tgt
),
g AS (SELECT ty, tx, fx, fy, FLOOR(fx) AS i0, FLOOR(fy) AS j0 FROM f),
quad AS (
  SELECT ty, tx, q,
    CAST(i0 + (q % 2) AS BIGINT) AS gx,
    CAST(j0 + (q // 2) AS BIGINT) AS gyt,
    ((CASE WHEN q % 2 = 0 THEN 1.0 - (fx - i0) ELSE (fx - i0) END)
     * (CASE WHEN q // 2 = 0 THEN 1.0 - (fy - j0) ELSE (fy - j0) END))
      AS w
  FROM g, (VALUES (0), (1), (2), (3)) qs(q)
  WHERE i0 + (q % 2) >= 0 AND i0 + (q % 2) < {gw}
    AND j0 + (q // 2) >= 0 AND j0 + (q // 2) < {gh}
),
j AS (SELECT ty, tx, q, CAST(n AS DOUBLE) * w AS term
      FROM quad JOIN srcg USING (gx, gyt))
SELECT ty, tx,
  ((SUM(CASE WHEN q = 0 THEN term ELSE 0.0 END)
    + SUM(CASE WHEN q = 1 THEN term ELSE 0.0 END))
   + (SUM(CASE WHEN q = 2 THEN term ELSE 0.0 END)
      + SUM(CASE WHEN q = 3 THEN term ELSE 0.0 END))) AS val
FROM j GROUP BY ty, tx"""


#: coarse target grid for the area-average downsample (4x+ reduction,
#: cropped so out-of-range source pixels exercise the bounds filter)
WARP_AVG_DST = {"x0": -150.0, "y0": -70.0, "x1": 90.0, "y1": 50.0,
                "w": 30, "h": 15}


def q_warp_avg(sf_dir: str):
    """Area-average (anti-aliased) downsample — the ``Resampling.average``
    regrid mode: every populated source pixel center bins into one coarse
    target cell, the cell value is the mean over PRESENT pixels (weights
    renormalize over what exists).  The FAST regrid path: no join — one
    combiner-first reduce, only touched-cell partials shuffle; exact
    int64 sum + count with ONE IEEE division so the DOUBLE value-checks
    (stages/rasterize.py:regrid_average)."""
    sparse = q_rasterize(sf_dir)
    src = {"x0": -180.0, "y0": -90.0, "x1": 180.0, "y1": 90.0,
           "nx": TILE_NX, "ny": TILE_NY, "px": TILE_PX}
    return rz.regrid_average(sparse, src=src, dst=WARP_AVG_DST)


def _sql_warp_avg() -> str:
    d = WARP_AVG_DST
    w, h = d["w"], d["h"]
    nx, ny, pxn = TILE_NX, TILE_NY, TILE_PX
    pw = (180.0 - -180.0) / (nx * pxn)
    ph = (90.0 - -90.0) / (ny * pxn)
    tw = (d["x1"] - d["x0"]) / w
    th = (d["y1"] - d["y0"]) / h
    return f"""{_sql_rasterize_cte()},
srcg AS (
  SELECT (tile_id % {nx}) * {pxn} + px AS gx,
         ({ny} - 1 - tile_id // {nx}) * {pxn} + py AS gyt,
         n
  FROM hist
),
tk AS (
  SELECT
    CAST(FLOOR((({-180.0!r} + (gx + 0.5) * {pw!r}) - {d["x0"]!r})
               / {tw!r}) AS BIGINT) AS tx,
    CAST(FLOOR(({d["y1"]!r} - ({90.0!r} - (gyt + 0.5) * {ph!r}))
               / {th!r}) AS BIGINT) AS ty,
    n
  FROM srcg
),
tkf AS (SELECT * FROM tk
        WHERE tx >= 0 AND tx < {w} AND ty >= 0 AND ty < {h})
SELECT ty, tx, CAST(COUNT(*) AS BIGINT) AS npix,
       CAST(SUM(n) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS val
FROM tkf GROUP BY 1, 2"""


def q_r2v(sf_dir: str):
    """Raster→vector round trip: sparse histogram → dense tile rasters →
    pixel-center point rows (tile_id, lon, lat, value) — the full
    rasterize→assemble→vectorize chain with float arithmetic mirrored in
    SQL (pixel center = xmin + (px+0.5)*pw)."""
    from ..stages.vectorize import raster_to_points

    sparse = q_rasterize(sf_dir)
    specs_tbl = rz.tile_grid_table(
        -180, -90, 180, 90, TILE_NX, TILE_NY, TILE_PX, TILE_PX
    )
    dense = rz.assemble_rasters(sparse, specs_tbl)
    # dense per-tile bound arrays indexed by tile_id — np.take per batch,
    # no per-row Python (shape survives large tile grids)
    spec_ids = specs_tbl.column("tile_id").to_numpy(zero_copy_only=False)
    nspec = int(spec_ids.max()) + 1 if len(spec_ids) else 0
    bound_arrs = {}
    for name in ("xmin", "ymin", "xmax", "ymax"):
        arr = np.zeros(nspec, dtype=np.float64)
        arr[spec_ids] = specs_tbl.column(name).to_numpy(zero_copy_only=False)
        bound_arrs[name] = arr

    def add_bounds(b: pa.Table) -> pa.Table:
        tids = b.column("tile_id").to_numpy(zero_copy_only=False)
        for name in ("xmin", "ymin", "xmax", "ymax"):
            b = b.append_column(
                name, pa.array(np.take(bound_arrs[name], tids), pa.float64())
            )
        return b

    return dense.map_batches(add_bounds, batch_format="pyarrow").map_batches(
        lambda b: raster_to_points(b), batch_format="pyarrow"
    )


# --- dedup / first-per-key / stack (SURVEY ops #7+#8 + dedup suite) -------


def q_dedup_docs(sf_dir: str):
    docs = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    out = dedup.exact_dedup(docs, order_cols=["doc_id"])
    return out.map_batches(
        lambda b: b.select(["doc_id", "n_chars"]), batch_format="pyarrow"
    )


def q_delta_dedup(sf_dir: str):
    """CROSS-RUN incremental dedup: run 1 seeds a persistent content-hash
    store with the even-doc_id half of the corpus; run 2 processes the
    odd half and keeps only docs whose text was never seen — the
    corpus-version delta-dedup shape (only 8-byte hashes persist and
    shuffle).  A fresh temp store per call keeps the query idempotent."""
    import shutil
    import tempfile

    from ..stages.dedup import incremental_exact_dedup

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def half(parity):
        def fn(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            return b.filter(pa.array(ids % 2 == parity))

        return fn

    store = tempfile.mkdtemp(prefix="zen3geo_delta_")
    try:
        seed = incremental_exact_dedup(
            docs.map_batches(half(0), batch_format="pyarrow"), store,
            order_cols=["doc_id"],
        )
        seed.count()  # drive run 1 so the store is seeded
        fresh = incremental_exact_dedup(
            docs.map_batches(half(1), batch_format="pyarrow"), store,
            order_cols=["doc_id"],
        )
        out = fresh.map_batches(
            lambda b: b.select(["doc_id"]), batch_format="pyarrow"
        ).materialize()
    finally:
        shutil.rmtree(store, ignore_errors=True)
    return out


def q_delta_vocab(sf_dir: str):
    """CROSS-RUN vocabulary drift: run 1 seeds the (token, count)
    store with the even-doc_id half, run 2 measures the odd half's
    add-one-smoothed KL drift against it (quantized-ln integers, one
    float finale) and appends — the training-data drift alarm beside
    the incremental dedup stores (stages/tfidf.py:vocab_drift)."""
    import shutil
    import tempfile

    from ..stages.tfidf import vocab_drift

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def half(parity):
        def fn(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            return b.filter(pa.array(ids % 2 == parity))

        return fn

    store = tempfile.mkdtemp(prefix="zen3geo_vocab_")
    try:
        vocab_drift(docs.map_batches(half(0), batch_format="pyarrow"),
                    store, scale=ENTROPY_SCALE)   # seed run
        out = vocab_drift(
            docs.map_batches(half(1), batch_format="pyarrow"),
            store, scale=ENTROPY_SCALE)
    finally:
        shutil.rmtree(store, ignore_errors=True)
    return out


def _sql_delta_vocab() -> str:
    sc = ENTROPY_SCALE
    return rf"""
WITH st AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS s
            FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS w
                  FROM documents WHERE doc_id % 2 = 0) GROUP BY 1),
rn AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS r
       FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS w
             FROM documents WHERE doc_id % 2 = 1) GROUP BY 1),
u AS MATERIALIZED (
  SELECT COALESCE(rn.r, 0) AS r, COALESCE(st.s, 0) AS s
  FROM rn FULL OUTER JOIN st ON st.w = rn.w),
tt AS MATERIALIZED (
  SELECT CAST(SUM(r) AS BIGINT) AS big_r,
         CAST(SUM(s) AS BIGINT) AS big_s,
         CAST(COUNT(*) AS BIGINT) AS big_v,
         CAST(COUNT(CASE WHEN r > 0 THEN 1 END) AS BIGINT) AS v_run,
         CAST(COUNT(CASE WHEN s > 0 THEN 1 END) AS BIGINT) AS v_store,
         CAST(COUNT(CASE WHEN r > 0 AND s = 0 THEN 1 END) AS BIGINT)
           AS v_new,
         CAST(SUM(CASE WHEN s = 0 THEN r ELSE 0 END) AS BIGINT)
           AS c_new
  FROM u),
tm AS (SELECT CAST(SUM(CAST(FLOOR(u.r * (ln(u.r) - ln(tt.big_r)
                   - ln(u.s + 1) + ln(tt.big_s + tt.big_v))
                   * {sc}.0) AS BIGINT)) AS BIGINT) AS t_sum
       FROM u CROSS JOIN tt WHERE u.r > 0)
SELECT tt.big_s AS n_store, tt.big_r AS n_run, tt.v_store, tt.v_run,
       tt.v_new, tt.c_new, tm.t_sum,
       CAST(tm.t_sum AS DOUBLE)
       / (CAST(tt.big_r AS DOUBLE) * {sc}.0) AS drift
FROM tt CROSS JOIN tm"""


def q_first_event(sf_dir: str):
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"])
    out = stack.dedup_first(ev, ["user_id"], ["ts", "event_id"])
    return out.map_batches(
        lambda b: b.select(["user_id", "event_id", "event_type", "value"]),
        batch_format="pyarrow",
    )


def q_user_series(sf_dir: str):
    """Per-user ordered series summary via the coarse-bucket pattern: one
    vectorized pandas aggregation per bucket, not one call per user."""
    import pandas as pd

    from ..stages.bucketed import bucketed_groupby

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        out = g.groupby("user_id", sort=False).agg(
            n_layers=("value", "size"),
            first_v=("value", "first"),
            last_v=("value", "last"),
        )
        out["n_layers"] = out["n_layers"].astype(np.int64)
        return out.reset_index()

    return bucketed_groupby(ev, ["user_id"], agg)


def q_topk_cells(sf_dir: str):
    pts = _geocoded(sf_dir, RES_ZONAL)
    counted = zonal.zonal_aggregate(pts, ["cell"], {})
    return counted.sort(["n", "cell"], descending=[True, False]).limit(20)


# --- text analysis --------------------------------------------------------


def q_token_count(sf_dir: str):
    def fn(b: pa.Table) -> pa.Table:
        toks = textfn.token_count(b.column("text").to_pylist())
        return pa.table(
            {"doc_id": b.column("doc_id"), "n_tokens": pa.array(toks, pa.int64())}
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def q_token_bpe(sf_dir: str):
    def fn(b: pa.Table) -> pa.Table:
        toks = textfn.token_count_bpe(b.column("text"))
        return pa.table(
            {"doc_id": b.column("doc_id"), "n_bpe": pa.array(toks, pa.int64())}
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def q_readability(sf_dir: str):
    """Flesch-reading-ease panel per document: RE2-counted words /
    sentence runs / vowel-group syllable proxy (pyarrow and DuckDB
    share RE2, counts mirror exactly), flesch = 206.835 - 1.015*(W/S)
    - 84.6*(Y/W) left-assoc on both sides
    (functions/text.py:readability_metrics)."""

    def fn(b: pa.Table) -> pa.Table:
        w, s, y, fl = textfn.readability_metrics(b.column("text"))
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_words": pa.array(w), "n_sents": pa.array(s),
            "n_syl": pa.array(y),
            "flesch": pa.array(fl, pa.float64())})

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow")


def _sql_readability() -> str:
    return r"""
WITH c AS (SELECT doc_id,
  CAST(LEN(regexp_extract_all(text, '\S+')) AS BIGINT) AS w,
  GREATEST(CAST(LEN(regexp_extract_all(text, '[.!?]+')) AS BIGINT), 1)
    AS s,
  CAST(LEN(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS BIGINT) AS y
  FROM documents)
SELECT doc_id, w AS n_words, s AS n_sents, y AS n_syl,
       CASE WHEN w > 0 THEN
         206.835 - 1.015 * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))
         - 84.6 * (CAST(y AS DOUBLE) / CAST(w AS DOUBLE))
       ELSE NULL END AS flesch
FROM c"""


def q_quality(sf_dir: str):
    def fn(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        m = textfn.quality_metrics(texts)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_chars": pa.array(m["n_chars"], pa.int64()),
                "n_tokens": pa.array(m["n_tokens"], pa.int64()),
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


def q_lang_detect(sf_dir: str):
    def fn(b: pa.Table) -> pa.Table:
        pred = textfn.detect_lang(b.column("text").to_pylist())
        return pa.table(
            {"doc_id": b.column("doc_id"), "lang_pred": pa.array(pred, pa.string())}
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow"
    )


MH_NUM_PERM, MH_BANDS, MH_K = 64, 16, 3
CURATE_MIN_TOKENS = 20


def q_curate(sf_dir: str):
    """Flagship curation chain: minhash-CC representatives -> token
    floor -> lang id -> per-lang stats (pipelines/curate.py)."""
    from .curate import curate_corpus

    docs = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=1_000)
    docs2 = _read(sf_dir, "documents", ["doc_id", "text"])
    _, stats = curate_corpus(
        docs, docs2, min_tokens=CURATE_MIN_TOKENS,
        num_perm=MH_NUM_PERM, bands=MH_BANDS, shingle_k=MH_K,
    )
    return stats


def q_minhash_groups(sf_dir: str):
    docs = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=1_000)
    return dedup.minhash_lsh_groups(
        docs, id_col="doc_id", num_perm=MH_NUM_PERM, bands=MH_BANDS, k=MH_K
    )


def q_keep_best(sf_dir: str):
    """Canonical-doc selection per MinHash near-dup cluster: the
    highest-n_chars member of every dup_group survives (ties lowest
    doc_id) — "keep best", the curation policy above grouping dedup
    (stages/dedup.py:select_canonical — two 16-byte-row shuffles; text
    never moves)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"],
                 rows_per_block=1_000)
    labels = dedup.minhash_lsh_groups(
        docs, id_col="doc_id", num_perm=MH_NUM_PERM, bands=MH_BANDS,
        k=MH_K)
    meta = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    return dedup.select_canonical(labels, meta)


def q_src_sim(sf_dir: str):
    """Corpus-level SOURCE similarity (the data-mixing diagnostic run
    before choosing mixture weights): one MinHash signature per source
    over the union of its docs' shingles (min over union = min of
    per-doc minima, so the per-doc kernel folds exactly), then pairwise
    signature agreement — sim = agree/64 is one IEEE division of exact
    ints, value-checked (stages/dedup.py:source_minhash_sim)."""
    docs = _read(sf_dir, "documents", ["text", "source"])
    return dedup.source_minhash_sim(
        docs, group_col="source", text_col="text",
        num_perm=MH_NUM_PERM, k=MH_K)


def _sql_src_sim() -> str:
    a, b = dedup.perm_params(MH_NUM_PERM)
    permvals = ", ".join(
        f"({p}, {int(a[p])}::HUGEINT, {int(b[p])}::HUGEINT)"
        for p in range(MH_NUM_PERM)
    )
    return f"""WITH {_sql_shingle_ctes(MH_K)},
perm(p, a, b) AS (VALUES {permvals}),
gsig AS (
  SELECT d.source AS g, perm.p AS p,
         MIN((shr.s * perm.a + perm.b) % {_SQL_M}) AS v
  FROM shr JOIN documents d ON d.doc_id = shr.doc_id CROSS JOIN perm
  GROUP BY d.source, perm.p
),
pairs AS (
  SELECT x.g AS src_a, y.g AS src_b, CAST(COUNT(*) AS BIGINT) AS agree
  FROM gsig x JOIN gsig y ON x.p = y.p AND x.v = y.v AND x.g < y.g
  GROUP BY x.g, y.g
)
SELECT src_a, src_b, agree,
       CAST(agree AS DOUBLE) / CAST({MH_NUM_PERM} AS DOUBLE) AS sim
FROM pairs WHERE agree >= 1"""


def _sql_keep_best() -> str:
    return (
        "WITH RECURSIVE " + _sql_minhash_cc_ctes()
        + """,
mq AS (SELECT l.doc_id, l.dup_group, d.n_chars
       FROM labels l JOIN documents d ON d.doc_id = l.doc_id),
rk AS (SELECT dup_group, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY dup_group
                            ORDER BY n_chars DESC, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY dup_group) AS nm
       FROM mq)
SELECT dup_group, doc_id AS kept_doc, n_chars AS kept_quality,
       CAST(nm AS BIGINT) AS n_members
FROM rk WHERE rn = 1""")


def q_simhash(sf_dir: str):
    docs = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=1_000)
    out = docs.map_batches(
        lambda b: dedup.simhash_batch(b, text_col="text"), batch_format="pyarrow"
    )
    return out.map_batches(
        lambda b: b.select(["doc_id", "simhash"]), batch_format="pyarrow"
    )


# --- ANN ------------------------------------------------------------------


def q_ann(sf_dir: str):
    # query vectors: predicate pushed into the read — only row groups
    # containing vec_id 0-2 are decoded, not the whole embeddings table
    qsel = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", [0, 1, 2])],
    )
    qm = np.stack(
        [np.asarray(v, dtype=np.float64) for v in qsel.column("embedding").to_pylist()]
    )
    blob = {
        "query_id": qsel.column("vec_id").to_numpy(zero_copy_only=False),
        "matrix": qm,
    }
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = ann.brute_force_knn(ds, blob, k=10, dtype=np.float64)
    return out.map_batches(
        lambda b: pa.table(
            {
                "query_id": b.column("query_id"),
                "vec_id": b.column("vec_id"),
                "rank": pc.cast(b.column("rank"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


SCORE_CLASSES, SCORE_DIM, SCORE_QUANT = 4, 64, 1000


def q_score_docs(sf_dir: str):
    """Batched model-inference stage shape: an actor-pool scorer holding
    the model (loaded once per actor), one int64 matmul per batch —
    integer quantization makes the whole inference run oracle-exact."""
    import ray

    from ..stages.scoring import make_linear_model, make_scorer_fn

    model = make_linear_model(SCORE_CLASSES, SCORE_DIM)
    ref = ray.put(model) if ray.is_initialized() else model
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    # task form with per-worker memoized model: no actor-pool spin-up on
    # a small CPU model (score_embeddings is the GPU/actor-pool shape)
    return emb.map_batches(make_scorer_fn(ref), batch_format="pyarrow",
                           batch_size=1024)


def _sql_score_docs() -> str:
    return f"""
WITH q AS (
  SELECT vec_id, d.d AS d,
         CAST(ROUND(embedding[d.d + 1] * {SCORE_QUANT}.0) AS BIGINT) AS qx
  FROM embeddings, LATERAL (SELECT unnest(range({SCORE_DIM})) AS d) d
),
logits AS (
  SELECT vec_id, c.c AS cls,
         CAST(SUM(qx * (((c.c * 131 + d * 17) % 19) - 9)) AS BIGINT) AS logit
  FROM q, LATERAL (SELECT unnest(range({SCORE_CLASSES})) AS c) c
  GROUP BY vec_id, c.c
)
SELECT vec_id, CAST(cls AS BIGINT) AS cls, logit
FROM logits
QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY logit DESC, cls) = 1
"""


ND_CHAR_K, ND_TAU = 5, 0.8


def q_near_dup(sf_dir: str):
    """LSH candidates -> exact char-shingle Jaccard verification, fully
    distributed (two bucketed text joins) — returns verified (a, b,
    jaccard) pairs.  The jaccard is a single int/int division, so the
    SQL oracle's DOUBLE division reproduces it bit-for-bit."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=1_000)
    return dedup.near_dup_pipeline(
        docs, id_col="doc_id", num_perm=MH_NUM_PERM, bands=MH_BANDS,
        shingle_k=MH_K, k=ND_CHAR_K, threshold=ND_TAU, n_buckets=16,
    )


TFIDF_V = 20


def q_tfidf(sf_dir: str):
    """Bag-of-words featurization: top-20-document-frequency vocabulary
    (local top-V per block → tiny final top-V; the term universe never
    collects) + per-doc term counts for vocabulary terms — all integer,
    oracle-exact (idf floats stay client-side)."""
    from ..stages.tfidf import tfidf_features

    docs = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=1_000)
    return tfidf_features(docs, top_v=TFIDF_V)


def _sql_tfidf() -> str:
    return f"""
WITH {_sql_tokhash_cte().lstrip()},
dt AS (SELECT doc_id, unnest(ths) AS h FROM th),
dtc AS (SELECT doc_id, h, COUNT(*) AS tf FROM dt GROUP BY doc_id, h),
dfv AS (SELECT h, COUNT(*) AS df FROM dtc GROUP BY h),
vocab AS (SELECT h, df FROM dfv ORDER BY df DESC, h LIMIT {TFIDF_V})
SELECT d.doc_id,
  CAST(d.h - CASE WHEN d.h >= {_SQL_I64} THEN {_SQL_M} ELSE 0::HUGEINT END
       AS BIGINT) AS term,
  CAST(d.tf AS BIGINT) AS tf, CAST(v.df AS BIGINT) AS df
FROM dtc d JOIN vocab v USING (h)
"""


CD_TAU = 0.95


def q_contain_dup(sf_dir: str):
    """Containment near-dup: |A∩B| / min(|A|,|B|) over char shingles —
    catches excerpt/substring duplication that Jaccard misses (a short
    doc fully contained in a long one has low Jaccard but containment
    1.0).  Same distributed LSH-candidates → bucketed-text-joins →
    vectorized-verify plan as near_dup."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=1_000)
    return dedup.near_dup_pipeline(
        docs, id_col="doc_id", num_perm=MH_NUM_PERM, bands=MH_BANDS,
        shingle_k=MH_K, k=ND_CHAR_K, threshold=CD_TAU, n_buckets=16,
        metric="containment",
    )


def _sql_verify_ctes() -> str:
    """Shared candidate-pair + char-shingle CTEs for the near-dup verify
    oracles (pairs from minhash band buckets, distinct codepoint
    shingles per doc)."""
    return f""",
minb AS (
  SELECT band_id, bh, MIN(doc_id) AS a FROM bands GROUP BY band_id, bh
),
cpairs AS (
  SELECT DISTINCT m.a, b2.doc_id AS b
  FROM bands b2 JOIN minb m ON b2.band_id = m.band_id AND b2.bh = m.bh
  WHERE b2.doc_id <> m.a
),
cps AS (
  SELECT doc_id,
         list_transform(range(1, length(text)+1),
                        i -> unicode(text[i])::HUGEINT) AS cp
  FROM documents
),
csh AS (
  SELECT doc_id, list_distinct(
    list_transform(range(greatest(len(cp)-{ND_CHAR_K}+1, 1)), i ->
      list_reduce(list_prepend({_SQL_H0},
                               cp[i+1 : least(i+{ND_CHAR_K}, len(cp))]),
        (h, c) -> (h * {_SQL_P} + c) % {_SQL_M}))) AS shs
  FROM cps
)
"""


def _sql_contain_dup() -> str:
    return (
        "WITH RECURSIVE " + _sql_minhash_cc_ctes() + _sql_verify_ctes()
        + f""",
ver AS (
  SELECT p.a, p.b,
    CAST(len(list_intersect(x.shs, y.shs)) AS DOUBLE) /
    CAST(LEAST(len(x.shs), len(y.shs)) AS DOUBLE) AS containment
  FROM cpairs p
  JOIN csh x ON x.doc_id = p.a
  JOIN csh y ON y.doc_id = p.b
)
SELECT a, b, containment FROM ver WHERE containment >= {CD_TAU}
""")


WJ_TAU = 0.8


def q_wjac_dup(sf_dir: str):
    """Weighted-Jaccard near-dup: Σmin(tf)/Σmax(tf) over token
    histograms — repetition-aware verification (distinct-shingle Jaccard
    is blind to multiplicity changes).  Same distributed plan as
    near_dup."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"], rows_per_block=1_000)
    return dedup.near_dup_pipeline(
        docs, id_col="doc_id", num_perm=MH_NUM_PERM, bands=MH_BANDS,
        shingle_k=MH_K, threshold=WJ_TAU, n_buckets=16, metric="wjaccard",
    )


def _sql_wjac_dup() -> str:
    # _sql_verify_ctes supplies minb/cpairs (+ the char-shingle CTEs,
    # unreferenced here — DuckDB never evaluates unused CTEs)
    return (
        "WITH RECURSIVE " + _sql_minhash_cc_ctes() + _sql_verify_ctes()
        + f""",
tc AS (
  SELECT doc_id, h, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(ths) AS h FROM th) GROUP BY doc_id, h
),
tot AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS t FROM tc GROUP BY doc_id),
inter AS (
  SELECT p.a, p.b, CAST(SUM(LEAST(x.c, y.c)) AS BIGINT) AS i
  FROM cpairs p
  JOIN tc x ON x.doc_id = p.a
  JOIN tc y ON y.doc_id = p.b AND y.h = x.h
  GROUP BY p.a, p.b
),
ver AS (
  SELECT p.a, p.b,
    CASE WHEN COALESCE(ta.t, 0) + COALESCE(tb.t, 0) = 0 THEN 1.0
         ELSE CAST(COALESCE(i.i, 0) AS DOUBLE) /
              CAST(COALESCE(ta.t, 0) + COALESCE(tb.t, 0)
                   - COALESCE(i.i, 0) AS DOUBLE)
    END AS wjaccard
  FROM cpairs p
  LEFT JOIN inter i ON i.a = p.a AND i.b = p.b
  LEFT JOIN tot ta ON ta.doc_id = p.a
  LEFT JOIN tot tb ON tb.doc_id = p.b
)
SELECT a, b, wjaccard FROM ver WHERE wjaccard >= {WJ_TAU}
""")


def _sql_near_dup() -> str:
    """Candidate pairs from the minhash band buckets (min-doc anchor per
    bucket) + exact distinct-codepoint-shingle Jaccard — mirrors
    near_dup_pipeline operation for operation (shared CTEs in
    _sql_verify_ctes)."""
    return (
        "WITH RECURSIVE " + _sql_minhash_cc_ctes() + _sql_verify_ctes()
        + f""",
ver AS (
  SELECT p.a, p.b,
    CAST(len(list_intersect(x.shs, y.shs)) AS DOUBLE) /
    CAST(len(x.shs) + len(y.shs) - len(list_intersect(x.shs, y.shs))
         AS DOUBLE) AS jaccard
  FROM cpairs p
  JOIN csh x ON x.doc_id = p.a
  JOIN csh y ON y.doc_id = p.b
)
SELECT a, b, jaccard FROM ver WHERE jaccard >= {ND_TAU}
""")


EMB_SIGN_DIMS, EMB_TAU = 8, 0.3


def q_emb_dups(sf_dir: str):
    """Embedding-cosine near-dup groups (coordinate-sign LSH + cosine
    threshold + connected components)."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return dedup.embedding_near_dup_groups(
        emb, id_col="vec_id", sign_dims=EMB_SIGN_DIMS, threshold=EMB_TAU
    )


def q_delta_embdup(sf_dir: str):
    """CROSS-RUN incremental EMBEDDING near-dup dedup: run 1 seeds a
    persistent vector store with the even-vec_id half; run 2 processes
    the odd half and drops vectors that share a coordinate-sign LSH
    bucket with a stored vector AND have cosine >= 0.3 — the semantic
    member of the incremental-store trio
    (stages/dedup.py:incremental_embedding_dedup)."""
    import shutil
    import tempfile

    from ..stages.dedup import incremental_embedding_dedup

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def half(parity):
        def fn(b: pa.Table) -> pa.Table:
            ids = b.column("vec_id").to_numpy(zero_copy_only=False)
            return b.filter(pa.array(ids % 2 == parity))

        return fn

    store = tempfile.mkdtemp(prefix="zen3geo_deltaemb_")
    try:
        seed = incremental_embedding_dedup(
            emb.map_batches(half(0), batch_format="pyarrow"), store,
            sign_dims=EMB_SIGN_DIMS, threshold=EMB_TAU)
        seed.count()  # drive run 1 so the store is seeded
        fresh = incremental_embedding_dedup(
            emb.map_batches(half(1), batch_format="pyarrow"), store,
            sign_dims=EMB_SIGN_DIMS, threshold=EMB_TAU)
        out = fresh.map_batches(
            lambda b: b.select(["vec_id"]), batch_format="pyarrow"
        ).materialize()
    finally:
        shutil.rmtree(store, ignore_errors=True)
    return out


def _sql_delta_embdup() -> str:
    bucket_expr = " + ".join(
        f"(CASE WHEN embedding[{j + 1}] > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(EMB_SIGN_DIMS)
    )
    return f"""
WITH b AS (SELECT vec_id, embedding, {bucket_expr} AS bucket
           FROM embeddings),
old AS (SELECT * FROM b WHERE vec_id % 2 = 0),
new AS (SELECT * FROM b WHERE vec_id % 2 = 1),
dropped AS (
  SELECT DISTINCT n.vec_id FROM new n JOIN old o ON o.bucket = n.bucket
  WHERE list_cosine_similarity(n.embedding, o.embedding) >= {EMB_TAU})
SELECT vec_id FROM new
WHERE vec_id NOT IN (SELECT vec_id FROM dropped)"""


def _sql_emb_dups() -> str:
    """Sign-bucket + cosine-threshold pairs + recursive CC — mirrors
    embedding_near_dup_groups (bucket assignment is pure sign tests, so
    no float-summation-order hazard; the cosine threshold sits >= 1e-3
    from every pair in the testdata)."""
    bucket_expr = " + ".join(
        f"(CASE WHEN embedding[{j + 1}] > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(EMB_SIGN_DIMS)
    )
    return f"""
WITH RECURSIVE b AS (
  SELECT vec_id, embedding, {bucket_expr} AS bucket FROM embeddings
),
p AS (
  SELECT x.vec_id AS a, y.vec_id AS b
  FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
  WHERE list_cosine_similarity(x.embedding, y.embedding) >= {EMB_TAU}
),
edge AS (
  SELECT a, b FROM p UNION SELECT b, a FROM p
  UNION SELECT vec_id, vec_id FROM embeddings
),
walk(id, r) AS (
  SELECT DISTINCT a, a FROM edge
  UNION
  SELECT w.id, e.b FROM walk w JOIN edge e ON e.a = w.r
)
SELECT id AS vec_id, MIN(r) AS dup_group FROM walk GROUP BY id
"""


KM_K, KM_ITERS, SEM_TAU = 8, 2, 0.3


def q_kmeans(sf_dir: str):
    """Distributed EXACT k-means over the embedding table (integer-
    quantized Lloyd, stages/cluster.py): per iteration ONE shuffle-free
    streaming pass emitting k x (dim+1) int64 partials per block —
    clustering 100 TB of embeddings costs iters+2 scans and no
    all-to-all at all."""
    from ..stages.cluster import kmeans_assign

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    _, asg = kmeans_assign(emb, k=KM_K, iters=KM_ITERS)
    return asg


def q_semdedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023): k-means the embedding space, then
    drop any vector with a smaller-id neighbor inside the same cluster at
    quantized distance <= eps(cos 0.3) — the clustering bounds the
    quadratic near-dup scan to within-cluster work; the only shuffle
    moves (id, cluster, qvec) rows once."""
    from ..stages.cluster import semdedup

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return semdedup(emb, k=KM_K, iters=KM_ITERS, cos_tau=SEM_TAU)


def _sql_kmeans_header(k: int) -> str:
    """Shared quantize + seed CTEs: q = floor(x * 2^20) + 2^20 (float64
    multiply by a power of two is exact; the offset keeps values
    non-negative so DuckDB's truncating `//` equals Python's floor
    `//`); seeds are the k smallest ids."""
    off = 1 << 20
    return f"""
q AS (
  SELECT vec_id, i AS dim,
         CAST(FLOOR(CAST(e AS DOUBLE) * {float(off)}) AS BIGINT) + {off} AS qv
  FROM (SELECT vec_id, UNNEST(embedding) AS e,
               UNNEST(range(1, len(embedding) + 1)) AS i FROM embeddings)
),
seed_ids AS (
  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})
)"""


def _sql_kmeans_chain(iters: int, prefix: str = "",
                      dim_lo: int | None = None,
                      dim_hi: int | None = None) -> str:
    """Lloyd CTE chain over ``q``/``seed_ids``: assign =
    min-cluster-of-min-int-dist, update = component-wise SUM // COUNT
    with COALESCE keep-previous for empty clusters.  ``prefix`` renames
    every CTE; ``dim_lo``/``dim_hi`` (1-based inclusive) restrict to a
    SUBSPACE — c0 carries only those dims, and every later join keys on
    c's dims, so the whole chain stays inside the slice (the PQ
    per-subspace mirror).  Final CTE ``{prefix}a{iters+1}`` holds
    (vec_id, cluster)."""
    p = prefix
    dimf = (f" AND q.dim BETWEEN {dim_lo} AND {dim_hi}"
            if dim_lo is not None else "")
    parts = [f"""
{p}c0 AS (SELECT s.cluster, q.dim, q.qv AS cv
       FROM seed_ids s JOIN q ON q.vec_id = s.vec_id{dimf})"""]
    for i in range(iters + 1):
        parts.append(f""",
{p}d{i + 1} AS (SELECT q.vec_id, c.cluster,
              SUM((q.qv - c.cv) * (q.qv - c.cv)) AS dist
       FROM q JOIN {p}c{i} c ON c.dim = q.dim GROUP BY q.vec_id, c.cluster),
{p}a{i + 1} AS (SELECT d.vec_id, MIN(d.cluster) AS cluster
       FROM {p}d{i + 1} d
       JOIN (SELECT vec_id, MIN(dist) AS md FROM {p}d{i + 1}
             GROUP BY vec_id) m
         ON m.vec_id = d.vec_id AND d.dist = m.md
       GROUP BY d.vec_id)""")
        if i < iters:
            parts.append(f""",
{p}s{i + 1} AS (SELECT a.cluster, q.dim,
              CAST(SUM(q.qv) // COUNT(*) AS BIGINT) AS cv
       FROM {p}a{i + 1} a JOIN q ON q.vec_id = a.vec_id
       GROUP BY a.cluster, q.dim),
{p}c{i + 1} AS (SELECT {p}c{i}.cluster, {p}c{i}.dim,
              COALESCE({p}s{i + 1}.cv, {p}c{i}.cv) AS cv
       FROM {p}c{i} LEFT JOIN {p}s{i + 1}
         ON {p}s{i + 1}.cluster = {p}c{i}.cluster
        AND {p}s{i + 1}.dim = {p}c{i}.dim)""")
    return "".join(parts)


def _sql_kmeans_ctes(k: int, iters: int) -> str:
    """Full-vector Lloyd mirror (header + unprefixed chain); final CTE
    ``a{iters+1}`` holds (vec_id, cluster)."""
    return "WITH " + _sql_kmeans_header(k) + "," \
        + _sql_kmeans_chain(iters)


def _sql_kmeans() -> str:
    last = KM_ITERS + 1
    return (_sql_kmeans_ctes(KM_K, KM_ITERS)
            + f"\nSELECT vec_id, cluster FROM a{last}")


def q_purity(sf_dir: str):
    """Clustering-quality PURITY evaluation: k-means the embedding
    table, then per cluster the size and majority ground-truth label
    (ties -> smallest label) — global purity = Σ top_n / Σ n.  One
    combiner-first pass past the Lloyd scans; only (cluster, truth,
    count) partials ever shuffle (stages/cluster.py:cluster_purity)."""
    from ..stages.cluster import cluster_purity

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    return cluster_purity(emb, k=KM_K, iters=KM_ITERS)


def q_silhouette(sf_dir: str):
    """Simplified (centroid-based) SILHOUETTE of the k-means
    clustering — per-cluster quantized (b2-a2)*4096//max(a2,b2,1)
    integer scores, sil = s_sum/(n*4096) the one float; one extra
    streaming pass past the Lloyd scans
    (stages/cluster.py:silhouette_score)."""
    from ..stages.cluster import silhouette_score

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return silhouette_score(emb, k=KM_K, iters=KM_ITERS)


def _sql_silhouette() -> str:
    from ..stages.cluster import SIL_SCALE

    last = KM_ITERS + 1
    num = "((sb.b2 - sa.a2) * {s})".format(s=SIL_SCALE)
    den = "GREATEST(sa.a2, sb.b2, 1)"
    sq = f"({num} - ((({num} % {den}) + {den}) % {den})) // {den}"
    return _sql_kmeans_ctes(KM_K, KM_ITERS) + f""",
sa AS (SELECT a.vec_id, a.cluster, d.dist AS a2
       FROM a{last} a JOIN d{last} d
         ON d.vec_id = a.vec_id AND d.cluster = a.cluster),
sb AS (SELECT a.vec_id, MIN(d.dist) AS b2
       FROM a{last} a JOIN d{last} d
         ON d.vec_id = a.vec_id AND d.cluster <> a.cluster
       GROUP BY 1),
sv AS (SELECT sa.cluster, CAST({sq} AS BIGINT) AS sq
       FROM sa JOIN sb USING (vec_id)),
agg AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(sq) AS BIGINT) AS s_sum
        FROM sv GROUP BY 1)
SELECT cluster, n, s_sum,
       CAST(s_sum AS DOUBLE) / (CAST(n AS DOUBLE) * {SIL_SCALE}.0)
         AS sil
FROM agg"""


NOISE_K = 5


def q_label_noise(sf_dir: str):
    """kNN label-AGREEMENT data-quality audit (the Confident-Learning
    shape): per vector, how many of its 5 exact nearest neighbors
    (integer quantized L2, ties -> smaller id, self excluded) share
    its label; minority agreement flags probable mislabels.  Reference
    side broadcast once as a quantized int64 matrix — the bounded
    eval-set contract (stages/cluster.py:knn_label_agreement)."""
    from ..stages.cluster import knn_label_agreement

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"],
                rows_per_block=1000)
    return knn_label_agreement(emb, k=NOISE_K)


def q_knn_confusion(sf_dir: str):
    """kNN classifier evaluation (the nonparametric sibling of
    naive_bayes): even vec_ids broadcast as the train set, odd ids
    classified by majority label among their 5 nearest (integer L2,
    dist ties -> smaller id, vote ties -> smaller label); confusion
    matrix out (stages/cluster.py:knn_confusion)."""
    from ..stages.cluster import knn_confusion

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"],
                rows_per_block=1000)
    return knn_confusion(emb, k=NOISE_K)


def _sql_knn_confusion() -> str:
    off = 1 << 20
    return f"""
WITH q AS (
  SELECT vec_id, i AS dim,
         CAST(FLOOR(CAST(e AS DOUBLE) * {float(off)}) AS BIGINT)
           + {off} AS qv
  FROM (SELECT vec_id, UNNEST(embedding) AS e,
               UNNEST(range(1, len(embedding) + 1)) AS i
        FROM embeddings)),
d AS (SELECT a.vec_id AS u, b.vec_id AS v,
             CAST(SUM((a.qv - b.qv) * (a.qv - b.qv)) AS BIGINT) AS dist
      FROM q a JOIN q b ON b.dim = a.dim
      WHERE a.vec_id % 2 = 1 AND b.vec_id % 2 = 0
      GROUP BY 1, 2),
r AS (SELECT u, v,
             ROW_NUMBER() OVER (PARTITION BY u ORDER BY dist, v) AS rn
      FROM d),
kk AS (SELECT u, v FROM r WHERE rn <= {NOISE_K}),
votes AS (SELECT kk.u, CAST(eb.label AS BIGINT) AS label,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM kk JOIN embeddings eb ON eb.vec_id = kk.v
          GROUP BY 1, 2),
pred AS (SELECT u, label AS pred_label FROM (
  SELECT u, label, ROW_NUMBER() OVER (PARTITION BY u
                                      ORDER BY c DESC, label) AS rn
  FROM votes) WHERE rn = 1)
SELECT CAST(ea.label AS BIGINT) AS true_label, p.pred_label,
       CAST(COUNT(*) AS BIGINT) AS n
FROM pred p JOIN embeddings ea ON ea.vec_id = p.u
GROUP BY 1, 2"""


def _sql_label_noise() -> str:
    off = 1 << 20
    return f"""
WITH q AS (
  SELECT vec_id, i AS dim,
         CAST(FLOOR(CAST(e AS DOUBLE) * {float(off)}) AS BIGINT)
           + {off} AS qv
  FROM (SELECT vec_id, UNNEST(embedding) AS e,
               UNNEST(range(1, len(embedding) + 1)) AS i
        FROM embeddings)),
d AS (SELECT a.vec_id AS u, b.vec_id AS v,
             CAST(SUM((a.qv - b.qv) * (a.qv - b.qv)) AS BIGINT) AS dist
      FROM q a JOIN q b ON b.dim = a.dim AND b.vec_id <> a.vec_id
      GROUP BY 1, 2),
r AS (SELECT u, v,
             ROW_NUMBER() OVER (PARTITION BY u ORDER BY dist, v) AS rn
      FROM d),
kk AS (SELECT u, v FROM r WHERE rn <= {NOISE_K}),
ag AS (SELECT kk.u AS vec_id,
              CAST(COUNT(*) AS BIGINT) AS k_used,
              CAST(SUM(CASE WHEN eb.label = ea.label
                            THEN 1 ELSE 0 END) AS BIGINT) AS agree
       FROM kk JOIN embeddings ea ON ea.vec_id = kk.u
               JOIN embeddings eb ON eb.vec_id = kk.v
       GROUP BY kk.u)
SELECT ag.vec_id, CAST(e.label AS BIGINT) AS label, ag.k_used,
       ag.agree, ag.agree * 2 < ag.k_used AS noisy
FROM ag JOIN embeddings e ON e.vec_id = ag.vec_id"""


def _sql_purity() -> str:
    last = KM_ITERS + 1
    return _sql_kmeans_ctes(KM_K, KM_ITERS) + f""",
pt AS (SELECT a.cluster, CAST(e.label AS BIGINT) AS t,
              CAST(COUNT(*) AS BIGINT) AS c
       FROM a{last} a JOIN embeddings e ON e.vec_id = a.vec_id
       GROUP BY 1, 2),
tot AS (SELECT cluster, CAST(SUM(c) AS BIGINT) AS n FROM pt GROUP BY 1),
top AS (SELECT cluster, t AS top_truth, c AS top_n FROM (
    SELECT cluster, t, c,
           ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY c DESC, t)
             AS rn
    FROM pt) WHERE rn = 1)
SELECT tot.cluster, tot.n, top.top_truth, top.top_n
FROM tot JOIN top ON top.cluster = tot.cluster"""


def _sql_semdedup() -> str:
    last = KM_ITERS + 1
    eps2 = int(np.floor((2.0 - 2.0 * SEM_TAU) * float(1 << 40)))
    return _sql_kmeans_ctes(KM_K, KM_ITERS) + f""",
pdist AS (SELECT x.vec_id AS a, SUM((qx.qv - qy.qv) * (qx.qv - qy.qv)) AS dd
       FROM a{last} x JOIN a{last} y
         ON y.cluster = x.cluster AND y.vec_id < x.vec_id
       JOIN q qx ON qx.vec_id = x.vec_id
       JOIN q qy ON qy.vec_id = y.vec_id AND qy.dim = qx.dim
       GROUP BY x.vec_id, y.vec_id),
dropped AS (SELECT DISTINCT a AS vec_id FROM pdist WHERE dd <= {eps2})
SELECT t.vec_id, t.cluster,
       t.vec_id NOT IN (SELECT vec_id FROM dropped) AS kept
FROM a{last} t"""


PQ_SUB, PQ_K, PQ_ITERS, PQ_TOP = 4, 8, 2, 10


def q_pq_codes(sf_dir: str):
    """Product-quantization codes (Jégou et al. 2011) — the
    memory-bounded ANN representation: 4 contiguous 16-dim subspaces,
    integer k-means each (FUSED Lloyd: one streaming pass per
    iteration trains all subspaces), long-form (vec_id, sub, code)
    output (stages/cluster.py:pq_train / pq_codes)."""
    from ..stages.cluster import pq_codes

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    _, codes = pq_codes(emb, n_sub=PQ_SUB, k=PQ_K, iters=PQ_ITERS)
    return codes


def q_pq_ann(sf_dir: str):
    """PQ asymmetric-distance top-k: the query quantizes once, each
    subspace folds to a k-entry int64 lookup table, and scanning a
    vector costs n_sub table adds instead of dim multiplies; per-block
    local top + single-block finale, ties to the smallest id
    (stages/cluster.py:pq_adc_topk)."""
    from ..stages.cluster import pq_adc_topk

    qsel = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filters=[("vec_id", "=", 0)])
    qvec = np.asarray(qsel.column("embedding")[0].as_py(), dtype=np.float32)
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return pq_adc_topk(emb, qvec, n_sub=PQ_SUB, k=PQ_K,
                       iters=PQ_ITERS, top=PQ_TOP)


def _pq_dim_bounds(s: int) -> tuple[int, int]:
    sd = SCORE_DIM // PQ_SUB
    return s * sd + 1, (s + 1) * sd  # 1-based inclusive


def _sql_pq_chains() -> str:
    chains = []
    for s in range(PQ_SUB):
        lo, hi = _pq_dim_bounds(s)
        chains.append(_sql_kmeans_chain(PQ_ITERS, prefix=f"p{s}",
                                        dim_lo=lo, dim_hi=hi))
    return "WITH " + _sql_kmeans_header(PQ_K) + "," + ",".join(chains)


def _sql_pq_codes() -> str:
    last = PQ_ITERS + 1
    union = "\nUNION ALL\n".join(
        f"SELECT vec_id, CAST({s} AS BIGINT) AS sub, cluster AS code "
        f"FROM p{s}a{last}" for s in range(PQ_SUB))
    return _sql_pq_chains() + f"\n{union}"


def _sql_pq_ann() -> str:
    last = PQ_ITERS + 1
    adcs = ",".join(f"""
adc{s} AS (SELECT a.vec_id,
           CAST(SUM((qq.qv - c.cv) * (qq.qv - c.cv)) AS BIGINT) AS dd
       FROM p{s}a{last} a JOIN p{s}c{PQ_ITERS} c ON c.cluster = a.cluster
       JOIN q qq ON qq.vec_id = 0 AND qq.dim = c.dim
       GROUP BY a.vec_id)""" for s in range(PQ_SUB))
    dsum = " + ".join(f"adc{s}.dd" for s in range(PQ_SUB))
    joins = " ".join(f"JOIN adc{s} ON adc{s}.vec_id = adc0.vec_id"
                     for s in range(1, PQ_SUB))
    return _sql_pq_chains() + f""",{adcs},
fin AS (SELECT adc0.vec_id, {dsum} AS dist FROM adc0 {joins})
SELECT CAST(ROW_NUMBER() OVER (ORDER BY dist, vec_id) AS BIGINT) AS rank,
       vec_id, dist
FROM fin ORDER BY dist, vec_id LIMIT {PQ_TOP}"""


IVFPQ_PROBE = 2


def q_ivfpq_ann(sf_dir: str):
    """IVF-PQ top-k (coarse k-means lists + PQ asymmetric distances,
    probe the 2 nearest of 8 lists) — the billion-scale ANN
    composition; per-query scan work drops by ~n_lists/n_probe
    (stages/cluster.py:ivfpq_topk)."""
    from ..stages.cluster import ivfpq_topk

    qsel = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filters=[("vec_id", "=", 0)])
    qvec = np.asarray(qsel.column("embedding")[0].as_py(), dtype=np.float32)
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ivfpq_topk(emb, qvec, n_lists=PQ_K, n_probe=IVFPQ_PROBE,
                      n_sub=PQ_SUB, k=PQ_K, iters=PQ_ITERS, top=PQ_TOP)


def _sql_ivfpq_ann() -> str:
    last = PQ_ITERS + 1
    coarse = _sql_kmeans_chain(PQ_ITERS, prefix="g")
    pq_chains = ",".join(
        _sql_kmeans_chain(PQ_ITERS, prefix=f"p{s}",
                          dim_lo=_pq_dim_bounds(s)[0],
                          dim_hi=_pq_dim_bounds(s)[1])
        for s in range(PQ_SUB))
    adcs = ",".join(f"""
adc{s} AS (SELECT a.vec_id,
           CAST(SUM((qq.qv - c.cv) * (qq.qv - c.cv)) AS BIGINT) AS dd
       FROM p{s}a{last} a JOIN p{s}c{PQ_ITERS} c ON c.cluster = a.cluster
       JOIN q qq ON qq.vec_id = 0 AND qq.dim = c.dim
       GROUP BY a.vec_id)""" for s in range(PQ_SUB))
    dsum = " + ".join(f"adc{s}.dd" for s in range(PQ_SUB))
    joins = " ".join(f"JOIN adc{s} ON adc{s}.vec_id = adc0.vec_id"
                     for s in range(1, PQ_SUB))
    return ("WITH " + _sql_kmeans_header(PQ_K) + ","
            + coarse + "," + pq_chains + f""",
qdist AS (SELECT c.cluster,
          CAST(SUM((qq.qv - c.cv) * (qq.qv - c.cv)) AS BIGINT) AS dd
       FROM gc{PQ_ITERS} c JOIN q qq ON qq.vec_id = 0 AND qq.dim = c.dim
       GROUP BY 1),
pr AS (SELECT cluster FROM qdist ORDER BY dd, cluster LIMIT {IVFPQ_PROBE}),
members AS (SELECT vec_id FROM ga{last}
            WHERE cluster IN (SELECT cluster FROM pr)),{adcs},
fin AS (SELECT adc0.vec_id, {dsum} AS dist
        FROM adc0 {joins}
        JOIN members mb ON mb.vec_id = adc0.vec_id)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY dist, vec_id) AS BIGINT) AS rank,
       vec_id, dist
FROM fin ORDER BY dist, vec_id LIMIT {PQ_TOP}""")


# --- relational: aggregate / joins / sort / window ------------------------


def q_lineitem_agg(sf_dir: str):
    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity",
                                    "l_shipdate"])
    cutoff = np.datetime64("1998-09-02T00:00:00")

    def flt(b: pa.Table) -> pa.Table:
        return b.filter(pc.less_equal(b.column("l_shipdate"), pa.scalar(cutoff)))

    filtered = li.map_batches(flt, batch_format="pyarrow")
    return zonal.zonal_aggregate(
        filtered, ["l_returnflag", "l_linestatus"], {"l_quantity": ["sum"]}
    )


def q_mktsegment(sf_dir: str):
    """Orders per market segment — aggregate-then-join: orders are first
    reduced to one count row per custkey (combiner-first, distributed),
    then the per-custkey counts join customer on the key and the small
    per-segment re-aggregation sums them.  No driver-side table read —
    both shuffles move one row per custkey, not per order."""
    import pandas as pd

    from ..stages.bucketed import bucketed_groupby
    from ..stages.hashjoin import bucketed_join

    orders = _read(sf_dir, "orders", ["o_custkey"])

    def count_per_cust(g: pd.DataFrame) -> pd.DataFrame:
        vc = g["o_custkey"].value_counts(sort=False)
        return pd.DataFrame(
            {"o_custkey": vc.index.to_numpy(), "n_ord": vc.to_numpy()}
        )

    # combiner-first count per custkey via the coarse-bucket reduce (the
    # native groupby aggregate measured ~5x slower at this key count)
    per_cust = bucketed_groupby(orders, ["o_custkey"], count_per_cust,
                                n_buckets=32)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda b: pa.table({"o_custkey": b.column("c_custkey"),
                            "c_mktsegment": b.column("c_mktsegment")}),
        batch_format="pyarrow",
    )
    joined = bucketed_join(per_cust, cust, ["o_custkey"], n_buckets=32)
    agg = zonal.zonal_aggregate(
        joined.map_batches(
            lambda b: b.select(["c_mktsegment", "n_ord"]), batch_format="pyarrow"
        ),
        ["c_mktsegment"],
        {"n_ord": ["sum"]},
    )
    return agg.map_batches(
        lambda b: pa.table({"c_mktsegment": b.column("c_mktsegment"),
                            "n": b.column("n_ord_sum")}),
        batch_format="pyarrow",
    )


def q_cust_no_orders(sf_dir: str):
    """Distributed anti join: customers with no order above 300k total
    price (threshold keeps the result non-empty at every sf).

    Bloom-prefiltered: the filtered order keys (pre-deduped per batch —
    combiner) build a distributed Bloom; customers missing the Bloom pass
    through with NO shuffle, only the hits go through the exact bucketed
    anti join.  No driver-side key set at any point."""
    from ..functions.bloom import bloom_anti_join

    def big_keys(b: pa.Table) -> pa.Table:
        f = b.filter(pc.greater(b.column("o_totalprice"), pa.scalar(300000.0)))
        keys = np.unique(f.column("o_custkey").to_numpy(zero_copy_only=False))
        return pa.table({"c_custkey": pa.array(keys, pa.int64())})

    okeys = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        big_keys, batch_format="pyarrow"
    )
    cust = _read(sf_dir, "customer", ["c_custkey"])
    n_hint = pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    return bloom_anti_join(cust, okeys, "c_custkey", n_keys_hint=n_hint,
                           n_buckets=32)


def q_bloom_semi(sf_dir: str):
    """Distributed EXACT semi join with a Bloom prefilter (the IN /
    allowlist shape): customers holding at least one 300k+ order.
    Definite Bloom misses drop with no shuffle; only hits go through
    the exact bucketed semi join (functions/bloom.py:
    bloom_exact_semi_join)."""
    from ..functions.bloom import bloom_exact_semi_join

    def big_keys(b: pa.Table) -> pa.Table:
        f = b.filter(pc.greater(b.column("o_totalprice"),
                                pa.scalar(300000.0)))
        keys = np.unique(f.column("o_custkey").to_numpy(
            zero_copy_only=False))
        return pa.table({"c_custkey": pa.array(keys, pa.int64())})

    okeys = _read(sf_dir, "orders",
                  ["o_custkey", "o_totalprice"]).map_batches(
        big_keys, batch_format="pyarrow")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    n_hint = pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    return bloom_exact_semi_join(cust, okeys, "c_custkey",
                                 n_keys_hint=n_hint, n_buckets=32)


_SQL_BLOOM_SEMI = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders
                    WHERE o_totalprice > 300000.0)"""


def q_top_orders(sf_dir: str):
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return orders.sort(
        ["o_totalprice", "o_orderkey"], descending=[True, False]
    ).limit(10)


def q_region_balance(sf_dir: str):
    """Supplier balances per region: two broadcast dimension joins
    (nation, region — ray.put once, per-worker memoized searchsorted
    index) then a keyed aggregate.  Balance summed in integer cents so
    the double arithmetic is order-independent and oracle-exact."""
    import ray

    from ..stages.join import make_broadcast_lookup_join

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet",
                        columns=["r_regionkey", "r_name"])
    nat_blob = {
        "s_nationkey": nat.column("n_nationkey").to_numpy(zero_copy_only=False),
        "n_regionkey": nat.column("n_regionkey").to_numpy(zero_copy_only=False),
    }
    reg_blob = {
        "n_regionkey": reg.column("r_regionkey").to_numpy(zero_copy_only=False),
        "r_name": np.asarray(reg.column("r_name").to_pylist(), dtype=object),
    }
    nat_ref = ray.put(nat_blob) if ray.is_initialized() else nat_blob
    reg_ref = ray.put(reg_blob) if ray.is_initialized() else reg_blob
    j_nat = make_broadcast_lookup_join(
        nat_ref, key_col="s_nationkey",
        value_cols={"n_regionkey": pa.int64()},
    )
    j_reg = make_broadcast_lookup_join(
        reg_ref, key_col="n_regionkey", value_cols={"r_name": pa.string()},
    )

    def to_cents(b: pa.Table) -> pa.Table:
        bal = b.column("s_acctbal").to_numpy(zero_copy_only=False)
        cents = np.rint(bal * 100.0).astype(np.int64)
        return pa.table({"r_name": b.column("r_name"),
                         "bal_cents": pa.array(cents, pa.int64())})

    sup = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
    tagged = (
        sup.map_batches(j_nat, batch_format="pyarrow")
        .map_batches(j_reg, batch_format="pyarrow")
        .map_batches(to_cents, batch_format="pyarrow")
    )
    return zonal.zonal_aggregate(tagged, ["r_name"], {"bal_cents": ["sum"]})


def q_priority_segment(sf_dir: str):
    """Order counts per (mktsegment, orderpriority) through the
    sort-merge join variant (per-bucket key-ordered merge) — result
    equal to the hash join, exercised as a distinct code path."""
    from ..stages.hashjoin import sort_merge_join

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda b: pa.table({"o_custkey": b.column("c_custkey"),
                            "c_mktsegment": b.column("c_mktsegment")}),
        batch_format="pyarrow",
    )
    joined = sort_merge_join(orders, cust, ["o_custkey"], n_buckets=32)
    return zonal.zonal_aggregate(
        joined.map_batches(
            lambda b: b.select(["c_mktsegment", "o_orderpriority"]),
            batch_format="pyarrow",
        ),
        ["c_mktsegment", "o_orderpriority"],
        {},
    )


def q_semi_customers(sf_dir: str):
    """Distributed semi join: customers with at least one 'F'-status
    order — key-existence filter, each left row at most once."""
    from ..stages.hashjoin import bucketed_join

    def fkeys(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b.column("o_orderstatus"), pa.scalar("F")))
        keys = np.unique(f.column("o_custkey").to_numpy(zero_copy_only=False))
        return pa.table({"c_custkey": pa.array(keys, pa.int64())})

    okeys = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"]).map_batches(
        fkeys, batch_format="pyarrow"
    )
    cust = _read(sf_dir, "customer", ["c_custkey"])
    return bucketed_join(cust, okeys, ["c_custkey"], how="semi", n_buckets=32)


def q_top_per_group(sf_dir: str):
    """Per-group top-k (top-2 orders by totalprice per orderpriority) —
    the grouped-rank operator via the coarse-bucket pattern; values pass
    through untouched so float parity is exact."""
    import pandas as pd

    from ..stages.bucketed import bucketed_groupby

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def top2(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_totalprice", "o_orderkey"],
                          ascending=[False, True], kind="mergesort")
        out = g.groupby("o_orderpriority", sort=False).head(2).copy()
        out["rank"] = out.groupby("o_orderpriority", sort=False).cumcount() + 1
        return out

    return bucketed_groupby(orders, ["o_orderpriority"], top2, n_buckets=8)


def q_median_price(sf_dir: str):
    """Exact distributed median (holistic aggregate): order price cents
    per priority via the bounded value-histogram plan — the shuffle
    moves one row per distinct (priority, cents), never per order."""
    orders = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def cents(b: pa.Table) -> pa.Table:
        c = np.rint(
            b.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({"o_orderpriority": b.column("o_orderpriority"),
                         "p_cents": pa.array(c, pa.int64())})

    return zonal.grouped_median(
        orders.map_batches(cents, batch_format="pyarrow"),
        ["o_orderpriority"], "p_cents", n_buckets=8,
    )


def q_quantiles(sf_dir: str):
    """Exact distributed discrete quantiles (p25/p50/p75/p90) per
    priority — grouped_median generalized to any quantile list; the
    shuffle still moves one row per distinct (priority, cents)."""
    orders = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def cents(b: pa.Table) -> pa.Table:
        c = np.rint(
            b.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({"o_orderpriority": b.column("o_orderpriority"),
                         "p_cents": pa.array(c, pa.int64())})

    return zonal.grouped_quantiles(
        orders.map_batches(cents, batch_format="pyarrow"),
        ["o_orderpriority"], "p_cents", qs=[0.25, 0.5, 0.75, 0.9],
        n_buckets=8,
    )


def q_corr(sf_dir: str):
    """Per-language Pearson correlation of doc length (chars) vs
    whitespace token count — combiner-first moment sums (exact int64
    partials), one tiny shuffle, DOUBLE finale with SQL-mirrored op
    order (stages/zonal.py:grouped_corr)."""
    docs = _read(sf_dir, "documents", ["lang", "text", "n_chars"],
                 rows_per_block=1000)

    def feats(b: pa.Table) -> pa.Table:
        nt = textfn.token_count(b.column("text"))
        return pa.table({
            "lang": b.column("lang"),
            "n_chars": b.column("n_chars"),
            "n_tok": pa.array(nt, pa.int64()),
        })

    return zonal.grouped_corr(
        docs.map_batches(feats, batch_format="pyarrow"),
        ["lang"], "n_chars", "n_tok", n_buckets=8)


AB_A, AB_B = "src0", "src1"


def q_ab_test(sf_dir: str):
    """Welch two-sample t-test (the A/B-experiment primitive): doc
    lengths of source src0 vs src1 — one combiner-first pass reduces
    every batch to ≤2 exact int64 moment rows, the bounded driver
    finale evaluates t and the Welch–Satterthwaite df in a fixed
    mirrored float op order (stages/zonal.py:welch_ttest)."""
    docs = _read(sf_dir, "documents", ["source", "n_chars"])
    return zonal.welch_ttest(docs, "source", "n_chars", AB_A, AB_B)


def q_auc(sf_dir: str):
    """ROC AUC of doc length as a src0-vs-src1 classifier — the rank
    identity AUC = U/(n_pos·n_neg) over the pooled value histogram
    (average-rank tie handling = trapezoidal AUC), exact-int u2 and
    ONE float division (stages/zonal.py:roc_auc)."""
    docs = _read(sf_dir, "documents", ["source", "n_chars"])
    return zonal.roc_auc(docs, "source", "n_chars", AB_A, AB_B)


def _sql_auc() -> str:
    return f"""
WITH h AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v
           FROM documents WHERE source IN ('{AB_A}', '{AB_B}')),
pooled AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c,
                  CAST(SUM(CASE WHEN g = '{AB_A}' THEN 1 ELSE 0 END)
                       AS BIGINT) AS ca
           FROM h GROUP BY v),
rk AS (SELECT v, ca, c,
              CAST(2 * SUM(c) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - c + 1 AS BIGINT) AS r2
       FROM pooled),
agg AS (SELECT CAST(SUM(ca) AS BIGINT) AS n1,
               CAST(SUM(c - ca) AS BIGINT) AS n2,
               CAST(SUM(ca * r2) AS BIGINT) AS rsum
        FROM rk)
SELECT n1 AS n_pos, n2 AS n_neg,
       rsum - n1 * (n1 + 1) AS u2,
       CASE WHEN n1 > 0 AND n2 > 0 THEN
         CAST(rsum - n1 * (n1 + 1) AS DOUBLE)
         / CAST(2 * n1 * n2 AS DOUBLE)
       ELSE NULL END AS auc
FROM agg"""


_SQL_AB_TEST = f"""
WITH p AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(n_chars) AS BIGINT) AS sv,
                  CAST(SUM(n_chars * n_chars) AS BIGINT) AS svv
           FROM documents WHERE source IN ('{AB_A}', '{AB_B}')
           GROUP BY source),
a AS (SELECT n, sv, svv FROM p WHERE source = '{AB_A}'),
b AS (SELECT n, sv, svv FROM p WHERE source = '{AB_B}'),
d AS (SELECT a.n AS n1, b.n AS n2,
  CAST(a.sv AS DOUBLE) / CAST(a.n AS DOUBLE) AS m1,
  CAST(b.sv AS DOUBLE) / CAST(b.n AS DOUBLE) AS m2,
  (CAST(a.n AS DOUBLE) * CAST(a.svv AS DOUBLE)
   - CAST(a.sv AS DOUBLE) * CAST(a.sv AS DOUBLE))
    / (CAST(a.n AS DOUBLE) * CAST(a.n - 1 AS DOUBLE)) AS va1,
  (CAST(b.n AS DOUBLE) * CAST(b.svv AS DOUBLE)
   - CAST(b.sv AS DOUBLE) * CAST(b.sv AS DOUBLE))
    / (CAST(b.n AS DOUBLE) * CAST(b.n - 1 AS DOUBLE)) AS va2
  FROM a, b),
e AS (SELECT n1, n2, m1, m2,
             va1 / CAST(n1 AS DOUBLE) AS aa,
             va2 / CAST(n2 AS DOUBLE) AS bb FROM d)
SELECT n1, n2, m1, m2,
  CASE WHEN aa + bb > 0 THEN (m1 - m2) / SQRT(aa + bb)
       ELSE NULL END AS t,
  CASE WHEN aa + bb > 0 THEN ((aa + bb) * (aa + bb))
    / ((aa * aa) / CAST(n1 - 1 AS DOUBLE)
       + (bb * bb) / CAST(n2 - 1 AS DOUBLE))
       ELSE NULL END AS df
FROM e"""


def q_anova(sf_dir: str):
    """One-way ANOVA F of order value (FLOOR dollars — half-dollar
    ties make ROUND unmirrorable) across the five order priorities:
    one combiner-first pass to <= k exact int64 moment rows per block,
    driver finale in a fixed left-assoc float order the unrolled SQL
    mirrors term for term (stages/zonal.py:oneway_anova)."""
    def prep(b: pa.Table) -> pa.Table:
        v = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.table({
            "g": b.column("o_orderpriority"),
            "v": pa.array(np.floor(v).astype(np.int64)),
        })

    ords = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    return zonal.oneway_anova(
        ords.map_batches(prep, batch_format="pyarrow"), "g", "v")


ANOVA_GROUPS = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                "5-LOW")


def _sql_anova() -> str:
    terms = " + ".join(
        f"(SELECT CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)"
        f" / CAST(n AS DOUBLE) FROM a WHERE g = '{g}')"
        for g in ANOVA_GROUPS)
    return f"""
WITH src AS (SELECT o_orderpriority AS g,
                    CAST(FLOOR(o_totalprice) AS BIGINT) AS v
             FROM orders),
a AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS sv,
             CAST(SUM(v * v) AS BIGINT) AS svv
      FROM src GROUP BY g),
tot AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS k,
               CAST(SUM(n) AS BIGINT) AS n,
               CAST(SUM(sv) AS BIGINT) AS s,
               CAST(SUM(svv) AS BIGINT) AS q2 FROM a),
fx AS (SELECT k, n,
  ({terms})
    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS ssb,
  CAST(q2 AS DOUBLE)
    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS sst
  FROM tot)
SELECT k, n, ssb, sst - ssb AS ssw,
  CASE WHEN k >= 2 AND n > k AND sst - ssb > 0.0 THEN
    (ssb / CAST(k - 1 AS DOUBLE)) / ((sst - ssb) / CAST(n - k AS DOUBLE))
  ELSE NULL END AS f_stat,
  CASE WHEN k >= 2 AND n > k AND sst > 0.0 THEN ssb / sst
  ELSE NULL END AS eta_sq
FROM fx"""


def q_qnorm(sf_dir: str):
    """QUANTILE NORMALIZATION of per-source doc lengths onto the
    global length distribution (the cross-source score calibration):
    within-source ROW_NUMBER r of n_s maps to the pooled value at
    global rank (r*N)//n_s — exact integer rank arithmetic, one
    bucketed join on the computed rank
    (stages/scan.py:quantile_normalize)."""
    from ..stages.scan import quantile_normalize

    docs = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    return quantile_normalize(docs, key_col="source",
                              value_col="n_chars", uid_col="doc_id")


def _sql_qnorm() -> str:
    return """
WITH s AS (SELECT doc_id, source, n_chars,
                  ROW_NUMBER() OVER (PARTITION BY source
                                     ORDER BY n_chars, doc_id) AS r
           FROM documents),
ns AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS ns
       FROM documents GROUP BY 1),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
g AS (SELECT n_chars AS gv,
             ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS gr
      FROM documents)
SELECT s.doc_id, s.source, s.n_chars,
       CAST((s.r * nn.n) // ns.ns AS BIGINT) AS g_rank,
       g.gv AS q_value
FROM s JOIN ns USING (source) CROSS JOIN nn
JOIN g ON g.gr = (s.r * nn.n) // ns.ns"""


def q_kruskal(sf_dir: str):
    """Kruskal-Wallis H across the five order priorities on FLOOR
    dollars — the k-group nonparametric companion of anova/mwu: ×2
    pooled-histogram ranks, exact-int group rank sums, fixed
    left-assoc unrolled float finale with the standard tie correction
    (stages/zonal.py:kruskal_wallis)."""
    def prep(b: pa.Table) -> pa.Table:
        v = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.table({
            "g": b.column("o_orderpriority"),
            "v": pa.array(np.floor(v).astype(np.int64)),
        })

    ords = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    return zonal.kruskal_wallis(
        ords.map_batches(prep, batch_format="pyarrow"), "g", "v",
        list(ANOVA_GROUPS))


def _sql_kruskal() -> str:
    term = ("COALESCE((SELECT CAST(g2.rr2 - g2.ni * (t.n + 1) AS DOUBLE)"
            " * CAST(g2.rr2 - g2.ni * (t.n + 1) AS DOUBLE)"
            " / CAST(g2.ni AS DOUBLE) FROM grp g2 WHERE g2.g = '{g}'),"
            " 0.0)")
    terms = " + ".join(term.format(g=g) for g in ANOVA_GROUPS)
    h = (f"3.0 * ({terms})"
         f" / (CAST(t.n AS DOUBLE) * CAST(t.n + 1 AS DOUBLE))")
    den = ("1.0 - CAST(tie.t3t AS DOUBLE) / (CAST(t.n AS DOUBLE)"
           " * CAST(t.n AS DOUBLE) * CAST(t.n AS DOUBLE)"
           " - CAST(t.n AS DOUBLE))")
    return f"""
WITH src AS (SELECT o_orderpriority AS g,
                    CAST(FLOOR(o_totalprice) AS BIGINT) AS v
             FROM orders),
hist AS MATERIALIZED (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c
                      FROM src GROUP BY 1, 2),
pooled AS MATERIALIZED (SELECT v, CAST(SUM(c) AS BIGINT) AS c
                        FROM hist GROUP BY v),
rk AS (SELECT v, CAST(2 * SUM(c) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            - c + 1 AS BIGINT) AS r2 FROM pooled),
grp AS MATERIALIZED (
  SELECT h.g, CAST(SUM(h.c) AS BIGINT) AS ni,
         CAST(SUM(h.c * rk.r2) AS BIGINT) AS rr2
  FROM hist h JOIN rk ON rk.v = h.v GROUP BY h.g),
tot AS (SELECT CAST(SUM(ni) AS BIGINT) AS n FROM grp),
tie AS (SELECT CAST(SUM(c * c * c - c) AS BIGINT) AS t3t FROM pooled)
SELECT CAST({len(ANOVA_GROUPS)} AS BIGINT) AS k, t.n, tie.t3t,
       {h} AS h,
       CASE WHEN {den} > 0.0 THEN ({h}) / ({den}) ELSE NULL END
         AS h_adj
FROM tot t CROSS JOIN tie"""


def q_mwu(sf_dir: str):
    """Mann–Whitney U (Wilcoxon rank-sum) — the nonparametric sibling
    of ab_test over the same src0/src1 doc lengths: ×2 average ranks
    from the pooled value histogram's cumulative counts (NO per-row
    ranks), exact-int u2, tie-corrected normal z in a fixed mirrored
    float order (stages/zonal.py:mann_whitney_u)."""
    docs = _read(sf_dir, "documents", ["source", "n_chars"])
    return zonal.mann_whitney_u(docs, "source", "n_chars", AB_A, AB_B)


_SQL_MWU = f"""
WITH f AS (SELECT CASE WHEN source = '{AB_A}' THEN 'a' ELSE 'b' END AS g,
                  n_chars AS v
           FROM documents WHERE source IN ('{AB_A}', '{AB_B}')),
h AS (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c FROM f GROUP BY 1, 2),
t AS (SELECT v, CAST(SUM(c) AS BIGINT) AS ct,
             CAST(SUM(CASE WHEN g = 'a' THEN c ELSE 0 END) AS BIGINT)
               AS ca
      FROM h GROUP BY v),
r AS (SELECT v, ca, ct,
             CAST(2 * (SUM(ct) OVER (ORDER BY v) - ct) + ct + 1
                  AS BIGINT) AS r2 FROM t),
s AS (SELECT
  (SELECT CAST(SUM(c) AS BIGINT) FROM h WHERE g = 'a') AS n1,
  (SELECT CAST(SUM(c) AS BIGINT) FROM h WHERE g = 'b') AS n2,
  (SELECT CAST(SUM(ca * r2) AS BIGINT) FROM r) AS sar,
  (SELECT CAST(SUM(ct * (ct * ct - 1)) AS BIGINT) FROM r) AS ties),
d AS (SELECT n1, n2, sar - n1 * (n1 + 1) AS u2, n1 + n2 AS n, ties
      FROM s),
e AS (SELECT n1, n2, u2,
  (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
   * (CAST(n + 1 AS DOUBLE)
      - CAST(ties AS DOUBLE)
        / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))) / 3.0 AS var4
  FROM d)
SELECT n1, n2, u2,
  CASE WHEN var4 > 0
       THEN (CAST(u2 AS DOUBLE) - CAST(n1 * n2 AS DOUBLE)) / SQRT(var4)
       ELSE NULL END AS z
FROM e"""


def q_ks_test(sf_dir: str):
    """Two-sample Kolmogorov–Smirnov distance, ALL-INTEGER: the max
    cross-multiplied ECDF gap |cumA·n2 − cumB·n1| over the bounded
    value histogram, exact rational d_num/d_den + the argmax value,
    one mirrored division (stages/zonal.py:ks_distance)."""
    docs = _read(sf_dir, "documents", ["source", "n_chars"])
    return zonal.ks_distance(docs, "source", "n_chars", AB_A, AB_B)


_SQL_KS = f"""
WITH f AS (SELECT CASE WHEN source = '{AB_A}' THEN 'a' ELSE 'b' END AS g,
                  n_chars AS v
           FROM documents WHERE source IN ('{AB_A}', '{AB_B}')),
h AS (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c FROM f GROUP BY 1, 2),
t AS (SELECT v,
  CAST(SUM(CASE WHEN g = 'a' THEN c ELSE 0 END) AS BIGINT) AS ca,
  CAST(SUM(CASE WHEN g = 'b' THEN c ELSE 0 END) AS BIGINT) AS cb
      FROM h GROUP BY v),
nn AS (SELECT
  (SELECT CAST(SUM(c) AS BIGINT) FROM h WHERE g = 'a') AS n1,
  (SELECT CAST(SUM(c) AS BIGINT) FROM h WHERE g = 'b') AS n2),
cumt AS (SELECT v,
  CAST(SUM(ca) OVER (ORDER BY v) AS BIGINT) AS cuma,
  CAST(SUM(cb) OVER (ORDER BY v) AS BIGINT) AS cumb FROM t),
dd AS (SELECT v, ABS(cuma * nn.n2 - cumb * nn.n1) AS diff
       FROM cumt, nn),
best AS (SELECT diff AS d_num, v AS at_v FROM dd
         ORDER BY diff DESC, v LIMIT 1)
SELECT nn.n1, nn.n2, b.d_num, nn.n1 * nn.n2 AS d_den, b.at_v,
  CAST(b.d_num AS DOUBLE) / CAST(nn.n1 * nn.n2 AS DOUBLE) AS d
FROM nn, best b"""


def q_spearman(sf_dir: str):
    """SPEARMAN rank correlation of doc chars vs token count — NO
    global sort: average ranks (×2, integer) derive from the bounded
    value-pair histogram's marginal cumulative counts, the finale runs
    in exact Python ints (n·Σxy overflows int64 beyond ~50M rows),
    and one float conversion per sum mirrors grouped_corr's op order
    (stages/zonal.py:spearman_corr)."""
    docs = _read(sf_dir, "documents", ["text", "n_chars"],
                 rows_per_block=1000)

    def feats(b: pa.Table) -> pa.Table:
        nt = textfn.token_count(b.column("text"))
        return pa.table({
            "n_chars": b.column("n_chars"),
            "n_tok": pa.array(nt, pa.int64()),
        })

    return zonal.spearman_corr(
        docs.map_batches(feats, batch_format="pyarrow"),
        "n_chars", "n_tok", n_buckets=8)


_SQL_SPEARMAN = (
    r"WITH f AS (SELECT n_chars AS x, "
    r"CAST(LEN(regexp_extract_all(text, '\S+')) AS BIGINT) AS y "
    "FROM documents), "
    "ph AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c FROM f "
    "GROUP BY 1, 2), "
    "mx AS (SELECT x, CAST(SUM(c) AS BIGINT) AS cx FROM ph GROUP BY x), "
    "rx AS (SELECT x, CAST(2 * (SUM(cx) OVER (ORDER BY x) - cx) "
    "+ cx + 1 AS BIGINT) AS xr FROM mx), "
    "my AS (SELECT y, CAST(SUM(c) AS BIGINT) AS cy FROM ph GROUP BY y), "
    "ry AS (SELECT y, CAST(2 * (SUM(cy) OVER (ORDER BY y) - cy) "
    "+ cy + 1 AS BIGINT) AS yr FROM my), "
    "j AS (SELECT ph.c, rx.xr, ry.yr FROM ph "
    "JOIN rx USING (x) JOIN ry USING (y)), "
    "s AS (SELECT CAST(SUM(c) AS BIGINT) AS n, "
    "CAST(SUM(c * xr) AS BIGINT) AS sx, "
    "CAST(SUM(c * yr) AS BIGINT) AS sy, "
    "CAST(SUM(c * xr * yr) AS BIGINT) AS sxy, "
    "CAST(SUM(c * xr * xr) AS BIGINT) AS sxx, "
    "CAST(SUM(c * yr * yr) AS BIGINT) AS syy FROM j), "
    "d AS (SELECT n, "
    "CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) "
    "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov, "
    "CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) "
    "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx, "
    "CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) "
    "- CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy FROM s) "
    "SELECT n, CASE WHEN vx > 0 AND vy > 0 "
    "THEN cov / (SQRT(vx) * SQRT(vy)) ELSE NULL END AS rho FROM d"
)


def q_gini(sf_dir: str):
    """Per-language GINI coefficient of doc lengths (the corpus
    length-inequality / diversity metric): per-group value histogram
    (cost O(distinct lengths), no per-row sort), sorted-rank identity
    folded over ties, exact-Python-int numerator, ONE mirrored float
    division (stages/zonal.py:grouped_gini)."""
    docs = _read(sf_dir, "documents", ["lang", "n_chars"])
    return zonal.grouped_gini(docs, ["lang"], "n_chars", n_buckets=8)


_SQL_GINI = (
    "WITH h AS (SELECT lang, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c "
    "FROM documents GROUP BY 1, 2), "
    "t AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n, "
    "CAST(SUM(v * c) AS BIGINT) AS sv FROM h GROUP BY 1), "
    "cbs AS (SELECT lang, v, c, "
    "CAST(SUM(c) OVER (PARTITION BY lang ORDER BY v) - c AS BIGINT) AS cb "
    "FROM h), "
    "g AS (SELECT cbs.lang, "
    "CAST(SUM(cbs.v * cbs.c * (2 * cbs.cb + cbs.c - t.n)) AS BIGINT) "
    "AS num FROM cbs JOIN t ON t.lang = cbs.lang GROUP BY cbs.lang) "
    "SELECT t.lang, t.n, CASE WHEN t.n * t.sv > 0 "
    "THEN CAST(g.num AS DOUBLE) / CAST(t.n * t.sv AS DOUBLE) "
    "ELSE NULL END AS gini FROM t JOIN g ON g.lang = t.lang"
)


def q_regress(sf_dir: str):
    """Per-language OLS fit of whitespace-token count against doc chars
    — shares grouped_corr's exact-int64 moment combiner; DOUBLE finale
    mirrored op-for-op (stages/zonal.py:grouped_regression)."""
    docs = _read(sf_dir, "documents", ["lang", "text", "n_chars"],
                 rows_per_block=1000)

    def feats(b: pa.Table) -> pa.Table:
        nt = textfn.token_count(b.column("text"))
        return pa.table({
            "lang": b.column("lang"),
            "n_chars": b.column("n_chars"),
            "n_tok": pa.array(nt, pa.int64()),
        })

    return zonal.grouped_regression(
        docs.map_batches(feats, batch_format="pyarrow"),
        ["lang"], "n_chars", "n_tok", n_buckets=8)


RANK_BAND = 1_000_000  # $10k price bands -> guaranteed rank ties


def q_skyline(sf_dir: str):
    """2-D SKYLINE / Pareto frontier (maximize part size AND price):
    the multi-objective shortlist primitive.  Exact and combiner-first
    — the global frontier is a subset of the union of per-block
    frontiers, so only value-domain-bounded local-frontier pairs ever
    shuffle (stages/analytic.py:skyline2d)."""
    from ..stages.analytic import skyline2d

    part = _read(sf_dir, "part", ["p_size", "p_retailprice"])

    def prep(b: pa.Table) -> pa.Table:
        cents = np.rint(
            b.column("p_retailprice").to_numpy(zero_copy_only=False)
            * 100.0).astype(np.int64)
        return pa.table({
            "p_size": pc.cast(b.column("p_size"), pa.int64()),
            "cents": pa.array(cents),
        })

    return skyline2d(part.map_batches(prep, batch_format="pyarrow"),
                     "p_size", "cents")


_SQL_SKYLINE = (
    "WITH t AS (SELECT CAST(p_size AS BIGINT) AS p_size, "
    "CAST(ROUND(p_retailprice * 100.0) AS BIGINT) AS cents FROM part), "
    "p AS (SELECT p_size, cents, CAST(COUNT(*) AS BIGINT) AS n_rows "
    "FROM t GROUP BY 1, 2) "
    "SELECT p_size, cents, n_rows FROM p a "
    "WHERE NOT EXISTS (SELECT 1 FROM p b "
    "WHERE b.p_size >= a.p_size AND b.cents >= a.cents "
    "AND (b.p_size > a.p_size OR b.cents > a.cents))"
)


def q_order_ranks(sf_dir: str):
    """RANK + DENSE_RANK per customer over coarse price bands (ties are
    first-class — tie runs spanning block boundaries chain through the
    driver's O(#blocks) carry walk; stages/scan.py:keyed_rank)."""
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])

    def band(b: pa.Table) -> pa.Table:
        c = np.rint(
            b.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({
            "o_orderkey": b.column("o_orderkey"),
            "o_custkey": b.column("o_custkey"),
            "band": pa.array(c // RANK_BAND, pa.int64()),
        })

    return scan.keyed_rank(orders.map_batches(band, batch_format="pyarrow"),
                           "o_custkey", "band", "o_orderkey")


def q_band_mode(sf_dir: str):
    """Per-customer MODE of the order price band (most frequent value,
    ties to the smallest) — holistic aggregate as a (key, value, n)
    count combiner + bucketed argmax (stages/zonal.py:grouped_mode)."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def band(b: pa.Table) -> pa.Table:
        c = np.rint(
            b.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({
            "o_custkey": b.column("o_custkey"),
            "band": pa.array(c // RANK_BAND, pa.int64()),
        })

    return zonal.grouped_mode(orders.map_batches(band,
                                                 batch_format="pyarrow"),
                              ["o_custkey"], "band")


ROLL_N = 10


def q_rolling(sf_dir: str):
    """Per-customer moving 10-order frame (SUM/COUNT/MIN/MAX ... ROWS
    BETWEEN 9 PRECEDING AND CURRENT ROW) — two-pass scan whose ONLY
    cross-block state is each block's last-key value tail
    (stages/scan.py:keyed_rolling)."""
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])

    def cents(b: pa.Table) -> pa.Table:
        c = np.rint(
            b.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({
            "o_orderkey": b.column("o_orderkey"),
            "o_custkey": b.column("o_custkey"),
            "cents": pa.array(c, pa.int64()),
        })

    return scan.keyed_rolling(
        orders.map_batches(cents, batch_format="pyarrow"),
        "o_custkey", "o_orderkey", "cents", n=ROLL_N)


FUZZY_TERMS = ["query", "quary", "hash", "batch", "stream"]
FUZZY_MAXLEN = 24


def q_fuzzy_contam(sf_dir: str):
    """Typo-tolerant decontamination: docs containing a token within
    edit distance 1 of a blocklist term — deletion-neighborhood
    (SymSpell) candidates over each batch's UNIQUE vocabulary, exact DP
    verify, distinct (doc, term) pairs shuffle (stages/fuzzy.py)."""
    from ..stages.fuzzy import fuzzy_term_matches

    docs = _read(sf_dir, "documents", ["doc_id", "text"],
                 rows_per_block=1000)
    return fuzzy_term_matches(docs, FUZZY_TERMS, max_len=FUZZY_MAXLEN)


SETOP_DISC = 0.06


def q_set_intersect(sf_dir: str):
    """(orderkey, suppkey) pairs that are BOTH high-discount and
    high-tax somewhere in lineitem — distinct INTERSECT via one tagged
    union + bucketed presence reduce (stages/setops.py): each side
    pre-distincts per block before the single shuffle."""
    from ..stages.setops import intersect_distinct

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_discount", "l_tax"])

    def side(col):
        def fn(b: pa.Table) -> pa.Table:
            keep = pc.greater_equal(b.column(col), SETOP_DISC)
            return b.filter(keep).select(["l_orderkey", "l_suppkey"])
        return fn

    a = li.map_batches(side("l_discount"), batch_format="pyarrow")
    b = li.map_batches(side("l_tax"), batch_format="pyarrow")
    return intersect_distinct(a, b, ["l_orderkey", "l_suppkey"])


def q_set_except(sf_dir: str):
    """Open orders with no returned line item — distinct EXCEPT via the
    same tagged-union bucketed reduce (stages/setops.py)."""
    from ..stages.setops import except_distinct

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"])

    def open_orders(b: pa.Table) -> pa.Table:
        keep = pc.equal(b.column("o_orderstatus"), "O")
        return b.filter(keep).select(["o_orderkey"])

    def returned(b: pa.Table) -> pa.Table:
        keep = pc.equal(b.column("l_returnflag"), "R")
        return pa.table({"o_orderkey": b.filter(keep).column("l_orderkey")})

    return except_distinct(
        orders.map_batches(open_orders, batch_format="pyarrow"),
        li.map_batches(returned, batch_format="pyarrow"),
        ["o_orderkey"])


WINFN_NTILE = 4


def q_winfns(sf_dir: str):
    """The complete ranking-window family — ROW_NUMBER / RANK /
    DENSE_RANK / PERCENT_RANK / CUME_DIST / NTILE per customer over
    coarse price bands, in ONE two-pass scan (stages/scan.py:
    keyed_window): pass 1 = one summary row per block; the driver's
    O(#blocks) walk closes totals for exactly the keys/tie-runs that
    touch a block boundary; pass 2 is segmented vectorized math."""
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])

    def band(b: pa.Table) -> pa.Table:
        c = np.rint(
            b.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({
            "o_orderkey": b.column("o_orderkey"),
            "o_custkey": b.column("o_custkey"),
            "band": pa.array(c // RANK_BAND, pa.int64()),
        })

    return scan.keyed_window(
        orders.map_batches(band, batch_format="pyarrow"),
        "o_custkey", "band", "o_orderkey", ntile=WINFN_NTILE)


def q_user_next_gap(sf_dir: str):
    """Per-user gap to the NEXT event — LEAD navigation window
    (stages/scan.py:keyed_lead), the forward mirror of q_user_gaps:
    null for each user's last event."""
    events = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b.column("event_id"),
            "user_id": b.column("user_id"),
            "ts_us": b.column("ts").cast(pa.int64()),
        })

    led = scan.keyed_lead(events.map_batches(prep, batch_format="pyarrow"),
                          "user_id", "event_id", "ts_us",
                          out_col="next_us")

    def gap(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b.column("event_id"),
            "user_id": b.column("user_id"),
            "gap_us": pc.subtract(b.column("next_us"), b.column("ts_us")),
        })

    return led.map_batches(gap, batch_format="pyarrow")


HIST_W, HIST_BINS = 2_500_000, 24


def q_histogram(sf_dir: str):
    """Fixed-bin histogram of order totals (cents): per-batch bincount
    combiner — exactly HIST_BINS partial rows per block — then a tiny
    final sum; empty bins emit 0 (stages/profile.py:histogram)."""
    from ..stages.profile import histogram

    orders = _read(sf_dir, "orders", ["o_totalprice"])

    def cents(b: pa.Table) -> pa.Table:
        c = np.rint(
            b.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({"cents": pa.array(c, pa.int64())})

    return histogram(orders.map_batches(cents, batch_format="pyarrow"),
                     "cents", lo=0, width=HIST_W, n_bins=HIST_BINS)


MELT_MEASURES = ["qty_c", "price_c", "tax_c"]


def q_melt(sf_dir: str):
    """Unpivot (wide -> long): each lineitem row melts into one row per
    measure column — pure map_batches stacking, no shuffle
    (stages/pivot.py:melt; SQL UNION ALL contract)."""
    from ..stages.pivot import melt

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_quantity",
                "l_extendedprice", "l_tax"])

    def cents(b: pa.Table) -> pa.Table:
        def c100(col):
            v = np.rint(b.column(col).to_numpy(zero_copy_only=False)
                        * 100.0).astype(np.int64)
            return pa.array(v, pa.int64())

        return pa.table({
            "l_orderkey": b.column("l_orderkey"),
            "l_linenumber": b.column("l_linenumber"),
            "qty_c": c100("l_quantity"),
            "price_c": c100("l_extendedprice"),
            "tax_c": c100("l_tax"),
        })

    return melt(li.map_batches(cents, batch_format="pyarrow"),
                ["l_orderkey", "l_linenumber"], MELT_MEASURES,
                var_col="measure", value_out="v")


ZORDER_RES = 8
ZORDER_PBITS = 4  # partition = z-key's top 4 bits -> 16 locality ranges


def q_zorder(sf_dir: str):
    """Z-order (Morton) locality key + FIXED-WIDTH range partition ids:
    partition = the interleaved key's top bits — the deterministic
    sibling of range_partition_by_morton's sampled cut points (equal
    key-space widths instead of equal row counts), so the layout is a
    pure function of the data and resumable (geom/cells.py:morton_of /
    sql_morton_expr)."""
    docs = _read(sf_dir, "documents", ["doc_id", "lang"])
    shift = 2 * ZORDER_RES + 1 - ZORDER_PBITS

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        langs = batch.column("lang").to_pylist()
        lon, lat = geocode_id(ids, langs)
        z = cells.morton_of(lon, lat, ZORDER_RES)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "zkey": pa.array(z, pa.int64()),
            "part": pa.array(z >> shift, pa.int64()),
        })

    return docs.map_batches(fn, batch_format="pyarrow")


HILBERT_RES, HILBERT_PBITS = 15, 6


def q_hilbert(sf_dir: str):
    """Hilbert-curve locality key + fixed-width range partition ids —
    the Morton sibling whose consecutive keys are always edge-adjacent
    cells, so each partition's border is compact (no Z seam jumps).
    geom/cells.py:hilbert_of is the vectorized public-domain flatbush
    kernel; sql_hilbert_ctes mirrors it bit for bit in BIGINT
    arithmetic (same ordering FlatGeobuf's spatial index uses)."""
    docs = _read(sf_dir, "documents", ["doc_id", "lang"])

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        langs = batch.column("lang").to_pylist()
        lon, lat = geocode_id(ids, langs)
        h = cells.hilbert_of(lon, lat, HILBERT_RES)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "hkey": pa.array(h, pa.int64()),
            "part": pa.array(h >> (32 - HILBERT_PBITS), pa.int64()),
        })

    return docs.map_batches(fn, batch_format="pyarrow")


GEOHASH_P = 8


def q_geohash(sf_dir: str):
    """Standard GEOHASH base32 cell ids for every geocoded doc (the
    ubiquitous spatial-bucketing key beside the integer grid/Morton/
    Hilbert family): closed-form Morton interleave + alphabet lookup,
    bit-mirrored by sql_geohash_ctes; pinned to the published
    'u4pruydq' test vector in tests (geom/cells.py:geohash_of)."""
    docs = _read(sf_dir, "documents", ["doc_id", "lang"])

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        langs = batch.column("lang").to_pylist()
        lon, lat = geocode_id(ids, langs)
        gh = cells.geohash_of(lon, lat, GEOHASH_P)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "gh": pa.array(gh, pa.string()),
        })

    return docs.map_batches(fn, batch_format="pyarrow")


def _sql_geohash() -> str:
    lon, lat = sql_geocode_exprs("doc_id", "lang")
    return f"""
WITH {cells.sql_geohash_ctes("documents", "doc_id", lon, lat,
                             GEOHASH_P)}
SELECT doc_id, gh FROM ghf"""


PCONT_QS = [0.25, 0.9]


def q_pcont(sf_dir: str):
    """Exact distributed CONTINUOUS (interpolated) quantiles per
    priority — percentile_cont semantics: lo + (hi - lo) * frac between
    the two order stats at p = q*(n-1), same IEEE op order as the SQL
    mirror (stages/zonal.py:grouped_quantiles_cont)."""
    orders = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def cents(b: pa.Table) -> pa.Table:
        c = np.rint(
            b.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({"o_orderpriority": b.column("o_orderpriority"),
                         "p_cents": pa.array(c, pa.int64())})

    return zonal.grouped_quantiles_cont(
        orders.map_batches(cents, batch_format="pyarrow"),
        ["o_orderpriority"], "p_cents", qs=PCONT_QS, n_buckets=8,
    )


APPROX_P = 6  # 64 registers for the oracle query; production default 2^12


def q_benford(sf_dir: str):
    """Benford's-law first-digit audit of order totals (the fraud /
    data-quality screen): per digit the observed count, expected count
    n*log10(1+1/d) from PRECOMPUTED constants inlined identically in
    the SQL (the ndcg no-libm discipline) and the chi-square
    contribution — one shared float shape
    (stages/profile.py:benford_profile)."""
    from ..stages.profile import benford_profile

    def to_cents(b: pa.Table) -> pa.Table:
        v = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.table({"cents": pa.array(
            np.rint(v * 100.0).astype(np.int64))})

    o = _read(sf_dir, "orders", ["o_totalprice"]).map_batches(
        to_cents, batch_format="pyarrow")
    return benford_profile(o, "cents")


def _sql_benford() -> str:
    from ..stages.profile import BENFORD_P

    p_case = " ".join(f"WHEN {d} THEN {BENFORD_P[d - 1]!r}"
                      for d in range(1, 10))
    return f"""
WITH c AS (SELECT CAST(ROUND(o_totalprice * 100.0) AS BIGINT) AS cents
           FROM orders),
dg AS (SELECT CAST(SUBSTR(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
              AS digit FROM c WHERE cents > 0),
hist AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS obs
         FROM dg GROUP BY digit),
tot AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM hist)
SELECT digit, obs,
       CAST(n AS DOUBLE) * (CASE digit {p_case} END) AS exp,
       (CAST(obs AS DOUBLE) - CAST(n AS DOUBLE)
          * (CASE digit {p_case} END))
       * (CAST(obs AS DOUBLE) - CAST(n AS DOUBLE)
          * (CASE digit {p_case} END))
       / (CAST(n AS DOUBLE) * (CASE digit {p_case} END)) AS chi2_term
FROM hist, tot"""


KMV_K = 64


def q_kmv(sf_dir: str):
    """KMV (k-minimum-values) distinct-user sketch per event type —
    the order-statistics sibling of approx_users: keep the 64 smallest
    distinct mulrot64 hashes per key (mergeable min-k blobs, <=512
    bytes per (key, block) shuffle), estimate (k-1)*2^64/h_(k) as ONE
    float division of exactly-cast integers; below k hashes the count
    is exact (stages/sketch.py:kmv_distinct)."""
    from ..functions.hashing import mulrot64
    from ..stages.sketch import kmv_distinct

    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    return kmv_distinct(ev, ["event_type"], "user_id",
                        k=KMV_K, hasher=mulrot64)


def _sql_kmv() -> str:
    from ..functions.hashing import sql_mulrot_ctes

    k = KMV_K
    num = (k - 1) << 64
    return f"""
WITH src AS (SELECT DISTINCT event_type, user_id FROM events),
{sql_mulrot_ctes('src', 'event_type',
                 'CAST(user_id AS HUGEINT) + 40503')},
dh AS (SELECT DISTINCT event_type, h FROM mh),
rk AS (SELECT event_type, h,
       ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
       FROM dh),
agg AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_kept,
               MAX(h) AS kth FROM rk WHERE rn <= {k} GROUP BY 1)
SELECT event_type, n_kept, CAST(kth AS DOUBLE) AS kth,
       CASE WHEN n_kept = {k} AND kth > 0 THEN
         CAST(CAST({num} AS HUGEINT) AS DOUBLE) / CAST(kth AS DOUBLE)
       ELSE CAST(n_kept AS DOUBLE) END AS est
FROM agg"""


def q_approx_users(sf_dir: str):
    """APPROXIMATE distinct users per event type via HyperLogLog —
    VALUE-CHECKED floats: every register is integer-exact (mulrot64
    avalanche + the unrolled leading-zero rounds, both SQL-mirrored),
    the harmonic denominator sums as exact integers scaled by 2^R, and
    the estimate is ONE shared float shape over two exact integers (the
    bm25 discipline; math.log == DuckDB ln bit-for-bit on glibc, so the
    linear-counting branch value-checks too).  stages/sketch.py:
    approx_distinct — partial registers per (key, block), 2^p-byte
    blobs shuffle, never the keys."""
    from ..functions.hashing import mulrot64
    from ..stages.sketch import approx_distinct

    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    return approx_distinct(ev, ["event_type"], "user_id",
                           p=APPROX_P, hasher=mulrot64)


def _sql_hll_regs_ctes() -> str:
    """Shared HLL register chain — CTEs down to ``regs`` (event_type,
    idx, reg), consumed by the approx_users and hll_overlap finales."""
    from ..functions.hashing import sql_mulrot_ctes

    p = APPROX_P
    w64 = 1 << 64
    rounds = []
    prev = "z0"
    for k, s in enumerate([32, 16, 8, 4, 2, 1], start=1):
        rounds.append(
            f"z{k} AS (SELECT event_type, idx, "
            f"CASE WHEN v // {1 << (64 - s)} = 0 "
            f"THEN (v * {1 << s}) % {w64} ELSE v END AS v, "
            f"lz + CASE WHEN v // {1 << (64 - s)} = 0 THEN {s} ELSE 0 END "
            f"AS lz FROM {prev})")
        prev = f"z{k}"
    return f"""src AS (SELECT DISTINCT event_type, user_id FROM events),
{sql_mulrot_ctes('src', 'event_type',
                 'CAST(user_id AS HUGEINT) + 40503')},
z0 AS (SELECT event_type, h // {1 << (64 - p)} AS idx,
       (h * {1 << p}) % {w64} AS v, 0 AS lz FROM mh),
{', '.join(rounds)},
regs AS MATERIALIZED (SELECT event_type, idx,
         MAX(LEAST(lz, {64 - p}) + 1) AS reg FROM z6 GROUP BY 1, 2)"""


def _sql_hll_estimate(num_col: str = "num", zeros_col: str = "zeros") -> str:
    """The shared estimate expression (alpha_m bias constant + linear-
    counting branch) over exact-integer ``num``/``zeros`` columns."""
    m, rr = 1 << APPROX_P, 64 - APPROX_P + 1
    est = (f"(0.7213 / (1.0 + 1.079 / {m}.0)) * {m}.0 * {m}.0 "
           f"* {1 << rr}.0 / CAST({num_col} AS DOUBLE)")
    return (f"CASE WHEN {est} <= 2.5 * {m}.0 AND {zeros_col} > 0 "
            f"THEN {m}.0 * ln({m}.0 / CAST({zeros_col} AS DOUBLE)) "
            f"ELSE {est} END")


def _sql_approx_users() -> str:
    m, rr = 1 << APPROX_P, 64 - APPROX_P + 1
    return f"""
WITH {_sql_hll_regs_ctes()},
agg AS (SELECT event_type,
        SUM(CAST(1 AS BIGINT) << ({rr} - reg)) AS s,
        COUNT(*) AS nh FROM regs GROUP BY 1),
fin AS (SELECT event_type,
        CAST(s AS HUGEINT)
          + ({m} - nh) * CAST({1 << rr} AS HUGEINT) AS num,
        {m} - nh AS zeros FROM agg)
SELECT event_type, {_sql_hll_estimate()} AS approx_distinct
FROM fin"""


def q_hll_overlap(sf_dir: str):
    """HLL set-operation estimates between event-type pairs — the
    audience-overlap panel: approximate |A|, |B|, |A ∪ B| (register-
    wise MAX merge, the defining HLL property) and inclusion-exclusion
    |A ∩ B|, all VALUE-CHECKED floats (the approx_users register/
    estimate discipline shared CTE-for-kernel;
    stages/sketch.py:hll_overlap)."""
    from ..functions.hashing import mulrot64
    from ..stages.sketch import hll_overlap

    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    return hll_overlap(ev, "event_type", "user_id",
                       p=APPROX_P, hasher=mulrot64)


def _sql_hll_overlap() -> str:
    m, rr = 1 << APPROX_P, 64 - APPROX_P + 1
    return f"""
WITH {_sql_hll_regs_ctes()},
agg AS (SELECT event_type,
        SUM(CAST(1 AS BIGINT) << ({rr} - reg)) AS s,
        COUNT(*) AS nh FROM regs GROUP BY 1),
fin AS (SELECT event_type,
        CAST(s AS HUGEINT)
          + ({m} - nh) * CAST({1 << rr} AS HUGEINT) AS num,
        {m} - nh AS zeros FROM agg),
singles AS MATERIALIZED (
    SELECT event_type, {_sql_hll_estimate()} AS approx_distinct FROM fin),
keys AS (SELECT DISTINCT event_type FROM regs),
prs AS (SELECT a.event_type AS ka, b.event_type AS kb
        FROM keys a JOIN keys b ON a.event_type < b.event_type),
uregs AS (SELECT p2.ka, p2.kb, r.idx, MAX(r.reg) AS reg
          FROM prs p2 JOIN regs r
            ON r.event_type = p2.ka OR r.event_type = p2.kb
          GROUP BY 1, 2, 3),
uagg AS (SELECT ka, kb,
         SUM(CAST(1 AS BIGINT) << ({rr} - reg)) AS s,
         COUNT(*) AS nh FROM uregs GROUP BY 1, 2),
ufin AS (SELECT ka, kb,
         CAST(s AS HUGEINT)
           + ({m} - nh) * CAST({1 << rr} AS HUGEINT) AS num,
         {m} - nh AS zeros FROM uagg),
uest AS (SELECT ka, kb, {_sql_hll_estimate()} AS union_distinct FROM ufin)
SELECT u.ka AS key_a, u.kb AS key_b,
       sa.approx_distinct AS a_distinct,
       sb.approx_distinct AS b_distinct,
       u.union_distinct,
       sa.approx_distinct + sb.approx_distinct - u.union_distinct
         AS intersect_distinct
FROM uest u
JOIN singles sa ON sa.event_type = u.ka
JOIN singles sb ON sb.event_type = u.kb"""


CMS_D, CMS_WBITS = 4, 10


def q_cms_users(sf_dir: str):
    """Count-min sketch per-user event-frequency estimates — the
    mergeable point-frequency sketch beside heavy_hitters' top-k:
    blocks fold into 32 KiB counter blobs (one elementwise-sum finale;
    volume independent of row count), probes stream with the sketch in
    the map closure.  ALL-INTEGER (mulrot64 lanes + bincount + min), so
    every estimate value-checks against the SQL mirror
    (stages/sketch.py:count_min / cms_estimate)."""
    from ..stages.graph import distinct_tuples
    from ..stages.sketch import cms_estimate, count_min

    ev = _read(sf_dir, "events", ["user_id"])
    cms = count_min(ev, "user_id", d=CMS_D, w_bits=CMS_WBITS)

    def probe(b: pa.Table) -> pa.Table:
        u = np.unique(b.column("user_id").to_numpy(zero_copy_only=False))
        return pa.table({
            "user_id": pa.array(u.astype(np.int64)),
            "est": pa.array(cms_estimate(cms, u, CMS_WBITS)),
        })

    return distinct_tuples(ev.map_batches(probe, batch_format="pyarrow"),
                           ["user_id", "est"], n_buckets=8)


def _sql_cms_users() -> str:
    from ..functions.hashing import sql_mulrot_ctes
    from ..stages.sketch import CMS_SEEDS

    shift = 1 << (64 - CMS_WBITS)
    seeds = ", ".join(f"({r}, {CMS_SEEDS[r]})" for r in range(CMS_D))
    return f"""
WITH rs AS (SELECT * FROM (VALUES {seeds}) AS v(r, seed)),
src AS (SELECT r, seed, user_id FROM events CROSS JOIN rs),
{sql_mulrot_ctes('src', 'r, user_id',
                 'CAST(user_id AS HUGEINT) + seed')},
hx AS (SELECT r, user_id, h // {shift} AS idx FROM mh),
cnt AS (SELECT r, idx, CAST(COUNT(*) AS BIGINT) AS c
        FROM hx GROUP BY 1, 2),
probe AS (SELECT DISTINCT r, user_id, idx FROM hx)
SELECT p.user_id, CAST(MIN(c.c) AS BIGINT) AS est
FROM probe p JOIN cnt c ON c.r = p.r AND c.idx = p.idx
GROUP BY 1"""


def q_qsketch(sf_dir: str):
    """APPROXIMATE grouped quantiles via the deterministic mergeable
    compactor sketch (stages/sketch.py QuantileSketch) — the plan that
    replaces ``quantiles``'s distinct-value shuffle when values are
    continuous/high-cardinality at 100 TB: per-(key,batch) sketch rows
    (a few KiB each) are the ONLY thing shuffled.

    The accuracy contract is certified inside the query, so the oracle
    is a REAL check, not a rows-only hole: the sketch carries an exact
    self-reported worst-case rank-error bound ``err`` (each compaction
    of a level-h buffer adds exactly 2^h); a second pass computes, per
    key and per estimate, the exact rank window [#(v<est)+1, #(v<=est)]
    and emits ok_p = 1 iff the window is within ``err`` of the target
    rank ceil(p*n).  By the compaction theorem the flags are always 1
    when the implementation is correct, so the oracle (COUNT(*) per key
    + literal 1s) verifies BOTH the exact count path and that the
    sketch's guaranteed bound actually held on this data."""
    import pandas as pd

    from ..stages import sketch as sk
    from ..stages.bucketed import bucketed_groupby

    QS = [0.25, 0.5, 0.9]

    def cents(b: pa.Table) -> pa.Table:
        c = np.rint(
            b.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({"o_orderpriority": b.column("o_orderpriority"),
                         "p_cents": pa.array(c, pa.int64())})

    def cents_ds():
        return _read(
            sf_dir, "orders", ["o_orderpriority", "o_totalprice"]
        ).map_batches(cents, batch_format="pyarrow")

    approx = sk.grouped_approx_quantiles(
        cents_ds(), ["o_orderpriority"], "p_cents", qs=QS,
        capacity=256, n_buckets=8,
    )
    # one row per priority (5) — bounded driver materialization
    est = approx.to_pandas().set_index("o_orderpriority")
    targets = {
        key: (np.array([row["p25"], row["p50"], row["p90"]]),
              int(row["err"]), int(row["n"]))
        for key, row in est.iterrows()
    }

    def rank_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "o_orderpriority": b.column("o_orderpriority").to_pylist(),
            "v": b.column("p_cents").to_numpy(zero_copy_only=False),
        })
        rows = []
        for key, grp in df.groupby("o_orderpriority", sort=False):
            ests = targets[key][0]
            v = grp["v"].to_numpy()[:, None]
            row = {"o_orderpriority": key, "n_part": len(grp)}
            for q, e in zip(QS, ests):
                lab = f"{int(round(q * 100))}"
                row[f"lt{lab}"] = int(np.count_nonzero(v < e))
                row[f"le{lab}"] = int(np.count_nonzero(v <= e))
            rows.append(row)
        return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)

    parts = cents_ds().map_batches(rank_partial, batch_format="pyarrow")

    def finalize(g: "pd.DataFrame") -> "pd.DataFrame":
        agg = g.groupby("o_orderpriority", sort=False).sum().reset_index()
        out = []
        for _, r in agg.iterrows():
            key = r["o_orderpriority"]
            _, err, n_sk = targets[key]
            n = int(r["n_part"])
            row = {"o_orderpriority": key, "n": n}
            for q in QS:
                lab = f"{int(round(q * 100))}"
                k = max(int(np.ceil(q * n)), 1)
                ok = (int(r[f"lt{lab}"]) < k + err) and (
                    int(r[f"le{lab}"]) >= k - err) and n == n_sk
                row[f"ok{lab}"] = int(ok)
            out.append(row)
        return pd.DataFrame(out)

    return bucketed_groupby(parts, ["o_orderpriority"], finalize, n_buckets=4)


def q_profile(sf_dir: str):
    """Distributed column profiler (stages/profile.py): per-column row/
    null counts, min/max, and EXACT distinct counts in two combiner-first
    passes — stats move one row per (block, column); NDV moves one row
    per within-block distinct (column, value), the exact-dedup shape.
    The stats that drive partition pruning and planner decisions at
    100 TB, mirrored by per-column UNION ALL aggregates in SQL."""
    from ..stages.profile import profile_columns

    li = _read(sf_dir, "lineitem",
               ["l_quantity", "l_discount", "l_returnflag", "l_linestatus"])
    return profile_columns(li, ["l_quantity", "l_discount"],
                           ["l_returnflag", "l_linestatus"])


SCRUB_RULES = [
    (r"\b(?:key|hash|scan)\b", "[K]"),   # term blocklist (word-bounded)
    (r"qu[a-z]+", "[Q]"),                # pattern family
]


def q_scrub(sf_dir: str):
    """Regex redaction (the PII-scrub mechanism): ordered RE2 rules
    applied globally over the text column with per-rule hit counts —
    one vectorized pyarrow kernel per rule, zero per-row Python
    (functions/text.py:redact).  Real deployments swap in email/phone
    patterns; DuckDB mirrors each step with regexp_replace(...,'g') +
    len(regexp_extract_all) on the progressively-redacted text."""

    def fn(b: pa.Table) -> pa.Table:
        clean, counts = textfn.redact(b.column("text"), SCRUB_RULES)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "clean": clean,
            "hits_k": pa.array(counts[0], pa.int64()),
            "hits_q": pa.array(counts[1], pa.int64()),
        })

    return _read(sf_dir, "documents", ["doc_id", "text"],
                 rows_per_block=1000).map_batches(fn, batch_format="pyarrow")


PACK_BUDGET = 25_000


def q_pack(sf_dir: str):
    """Sequence packing for training shards: assign every document to a
    token-budget shard in global doc_id order via the two-pass
    distributed prefix scan (stages/scan.py) — only one summary row per
    block reaches the driver, data rows never shuffle.  shard =
    exclusive running char total // budget (straddling docs belong to
    the shard where they start), mirrored by SUM() OVER (ORDER BY)."""
    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"],
                 rows_per_block=100)
    return scan.pack_sequences(docs, "doc_id", "n_chars",
                               budget=PACK_BUDGET)


DUPG_K = 3          # repetition-signal shingle width
DECON_K = 8         # decontamination shingle width (13-gram analog)
DECON_MOD, DECON_REM = 13, 7   # deterministic benchmark membership
NGRAM_TOPK = 25
N_SHARDS = 8


def q_dup_ngram(sf_dir: str):
    """Gopher-style repetition signal: per-doc k-token-shingle counts,
    distinct count, the most-repeated shingle's occurrences and the
    duplicate-shingle fraction — pure map_batches arithmetic over the
    same poly64 shingles as MinHash (stages/ngrams.py:repetition_stats),
    NO shuffle."""
    from ..stages.ngrams import repetition_stats

    docs = _read(sf_dir, "documents", ["doc_id", "text"],
                 rows_per_block=1000)
    return repetition_stats(docs, k=DUPG_K)


def _bench_filter(is_bench: bool):
    def fn(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        m = (ids % DECON_MOD) == DECON_REM
        return b.filter(pa.array(m if is_bench else ~m))

    return fn


def q_decontam(sf_dir: str):
    """Test-set decontamination: flag training docs sharing any k-token
    shingle with the benchmark subset (doc_id % 13 == 7).  The SMALL
    benchmark side reduces to a distinct shingle-hash set (streamed
    union, bounded) and broadcasts via ``ray.put``; the big side does a
    per-batch sorted-membership test — a broadcast semi join, the
    training corpus never shuffles (stages/ngrams.py:contamination)."""
    import ray

    from ..stages.ngrams import benchmark_shingle_set, contamination

    docs = _read(sf_dir, "documents", ["doc_id", "text"],
                 rows_per_block=1000)
    bench = benchmark_shingle_set(
        docs.map_batches(_bench_filter(True), batch_format="pyarrow"),
        k=DECON_K,
    )
    ref = ray.put(bench)
    return contamination(
        docs.map_batches(_bench_filter(False), batch_format="pyarrow"),
        ref, k=DECON_K,
    )


def q_ngram_topk(sf_dir: str):
    """EXACT corpus-wide top-k token bigrams (count DESC, gram ASC) —
    word-count at scale: per-batch value_counts combiner, bucketed global
    sum, per-bucket top-k (exact: buckets partition grams), tiny final
    sort (stages/ngrams.py:top_ngrams)."""
    from ..stages.ngrams import top_ngrams

    docs = _read(sf_dir, "documents", ["doc_id", "text"],
                 rows_per_block=1000)
    return top_ngrams(docs, n=2, k_top=NGRAM_TOPK)


ZIPF_V, ZIPF_LNSCALE = 64, 1 << 16


def q_zipf(sf_dir: str):
    """Zipf rank-frequency slope over the exact corpus top-64 unigrams
    (the corpus-health diagnostic): quantized-ln LSQ, integer moments,
    one float division (stages/ngrams.py:zipf_fit)."""
    from ..stages.ngrams import zipf_fit

    docs = _read(sf_dir, "documents", ["doc_id", "text"],
                 rows_per_block=1000)
    return zipf_fit(docs, top_v=ZIPF_V, ln_scale=ZIPF_LNSCALE)


def _sql_zipf() -> str:
    s = ZIPF_LNSCALE
    return f"""
WITH tok AS (SELECT unnest(regexp_extract_all(text, '\\S+')) AS w
             FROM documents),
cnt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY w),
top AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, w ASC) AS r
        FROM cnt ORDER BY n DESC, w ASC LIMIT {ZIPF_V}),
q AS (SELECT CAST(FLOOR(ln(CAST(r AS DOUBLE)) * {s}.0) AS BIGINT) AS x,
             CAST(FLOOR(ln(CAST(n AS DOUBLE)) * {s}.0) AS BIGINT) AS y
      FROM top),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS v,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx FROM q)
SELECT v, v * sxy - sx * sy AS num, v * sxx - sx * sx AS den,
       CASE WHEN v * sxx - sx * sx <> 0 THEN
         CAST(v * sxy - sx * sy AS DOUBLE)
         / CAST(v * sxx - sx * sx AS DOUBLE)
       ELSE NULL END AS slope,
       CASE WHEN v * sxx - sx * sx <> 0 THEN
         -(CAST(v * sxy - sx * sy AS DOUBLE)
           / CAST(v * sxx - sx * sx AS DOUBLE))
       ELSE NULL END AS alpha
FROM m"""


CHI2_K, CHI2_MIN_DF = 40, 5


def q_chi2_tokens(sf_dir: str):
    """Chi-square token feature selection (fastText-filter features):
    rank tokens by the 2x2 presence-vs-(lang='en') chi-square — exact
    int64 contingency cells, one shared float expression shape so the
    DOUBLE value-checks; label margin is two driver scalars, no
    label-side shuffle (stages/tfidf.py:chi2_feature_select)."""
    from ..stages.tfidf import chi2_feature_select

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"],
                 rows_per_block=1000)
    return chi2_feature_select(docs, label_col="lang", label_val="en",
                               top_k=CHI2_K, min_df=CHI2_MIN_DF)


def _sql_chi2_tokens() -> str:
    return f"""
WITH lab AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         list_distinct(regexp_extract_all(text, '\\S+')) AS toks
  FROM documents
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t,
               CAST(SUM(y) AS BIGINT) AS p FROM lab),
tok AS (SELECT y, unnest(toks) AS w FROM lab),
cnt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df,
               CAST(SUM(y) AS BIGINT) AS a
        FROM tok GROUP BY w HAVING COUNT(*) >= {CHI2_MIN_DF}),
g AS (SELECT w, a, df,
             df - a AS b, p - a AS c, t - p - (df - a) AS d, t
      FROM cnt CROSS JOIN tot),
h AS (SELECT w, a AS n_pos, df,
             (CAST(t AS DOUBLE)
              * (CAST(a * d - b * c AS DOUBLE)
                 * CAST(a * d - b * c AS DOUBLE)))
             / ((CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE))
                * (CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE)))
               AS chi2
      FROM g
      WHERE a + b > 0 AND c + d > 0 AND a + c > 0 AND b + d > 0)
SELECT w, n_pos, df, chi2 FROM h ORDER BY chi2 DESC, w LIMIT {CHI2_K}"""


COLLOC_K, COLLOC_MIN = 40, 4


def q_colloc(sf_dir: str):
    """PMI collocation mining (Church & Hanks): top-k adjacent bigrams by
    the log-free PMI exponential (c_xy*N*N)/((M*c_x)*c_y) — exact int64
    counts entering one shared float expression shape so the DOUBLE
    value-checks; combiner-first counts, broadcast unigram lookup, local
    top-k before a one-block finale (stages/ngrams.py:collocations)."""
    from ..stages.ngrams import collocations

    docs = _read(sf_dir, "documents", ["doc_id", "text"],
                 rows_per_block=1000)
    return collocations(docs, top_k=COLLOC_K, min_count=COLLOC_MIN)


def _sql_colloc() -> str:
    return f"""
WITH tok AS (
  SELECT regexp_extract_all(text, '\\S+') AS toks FROM documents
),
uni AS (SELECT unnest(toks) AS w FROM tok),
ucnt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cu FROM uni GROUP BY w),
nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM uni),
bg AS (
  SELECT unnest(list_transform(range(1, len(toks)),
      i -> toks[CAST(i AS INTEGER)] || ' ' || toks[CAST(i + 1 AS INTEGER)]))
    AS g
  FROM tok
),
mt AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM bg),
bcnt AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY g
         HAVING COUNT(*) >= {COLLOC_MIN}),
sp AS (SELECT split_part(g, ' ', 1) AS w1, split_part(g, ' ', 2) AS w2, c
       FROM bcnt)
SELECT s.w1, s.w2, s.c AS c_xy, u1.cu AS c_x, u2.cu AS c_y,
       (CAST(s.c AS DOUBLE)
        * (CAST(nt.n AS DOUBLE) * CAST(nt.n AS DOUBLE)))
       / ((CAST(mt.m AS DOUBLE) * CAST(u1.cu AS DOUBLE))
          * CAST(u2.cu AS DOUBLE)) AS pmi
FROM sp s JOIN ucnt u1 ON u1.w = s.w1 JOIN ucnt u2 ON u2.w = s.w2
CROSS JOIN nt CROSS JOIN mt
ORDER BY pmi DESC, s.w1, s.w2 LIMIT {COLLOC_K}"""


def q_shards(sf_dir: str):
    """Deterministic global shuffle into training shards: bijective
    multiply-add hash -> shard = h % N, pos = rank within shard by h —
    a reproducible global permutation computed with ONE range sort plus
    the keyed two-pass scan (O(#blocks) driver rows;
    stages/partition.py:shuffle_to_shards)."""
    from ..stages.partition import shuffle_to_shards

    docs = _read(sf_dir, "documents", ["doc_id"])
    return shuffle_to_shards(docs, "doc_id", n_shards=N_SHARDS)


def q_running_total(sf_dir: str):
    """Keyed running totals (SUM OVER PARTITION BY ... ORDER BY ...):
    per-customer cumulative order cents in orderkey order via
    keyed_prefix_scan — range sort + two light passes; the driver sees
    one summary row per BLOCK (first/last key runs only), never per key
    (stages/scan.py:keyed_prefix_scan)."""
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])

    def cents(b: pa.Table) -> pa.Table:
        c = np.rint(
            b.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({
            "o_orderkey": b.column("o_orderkey"),
            "o_custkey": b.column("o_custkey"),
            "cents": pa.array(c, pa.int64()),
        })

    return scan.keyed_prefix_scan(
        orders.map_batches(cents, batch_format="pyarrow"),
        "o_custkey", "o_orderkey", "cents", out_col="cum_cents",
    )


QUOTA_N = 15


def q_quota(sf_dir: str):
    """Per-domain quota (web-corpus curation cap): keep each source's
    first QUOTA_N docs under the bijective hash order — deterministic
    pseudo-random subsample via the keyed rank scan
    (stages/partition.py:quota_per_key)."""
    from ..stages.partition import quota_per_key

    docs = _read(sf_dir, "documents", ["doc_id", "source"])
    return quota_per_key(docs, "source", "doc_id", QUOTA_N)


def q_user_gaps(sf_dir: str):
    """Per-user inter-event microsecond gaps — LAG navigation window
    (stages/scan.py:keyed_lag): one range sort, O(#blocks) driver rows,
    in-block shift + boundary patch; null for each user's first event."""
    events = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b.column("event_id"),
            "user_id": b.column("user_id"),
            "ts_us": b.column("ts").cast(pa.int64()),
        })

    lagged = scan.keyed_lag(events.map_batches(prep, batch_format="pyarrow"),
                            "user_id", "event_id", "ts_us",
                            out_col="prev_us")

    def gap(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b.column("event_id"),
            "user_id": b.column("user_id"),
            "gap_us": pc.subtract(b.column("ts_us"), b.column("prev_us")),
        })

    return lagged.map_batches(gap, batch_format="pyarrow")


def _orders_cents(sf_dir: str):
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderstatus",
                    "o_totalprice"])

    def cents(b: pa.Table) -> pa.Table:
        c = np.rint(
            b.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({
            "o_orderkey": b.column("o_orderkey"),
            "o_custkey": b.column("o_custkey"),
            "o_orderstatus": b.column("o_orderstatus"),
            "cents": pa.array(c, pa.int64()),
        })

    return orders.map_batches(cents, batch_format="pyarrow")


def q_pivot_status(sf_dir: str):
    """Long->wide pivot: per customer a count and cents-sum column per
    order status — per-batch (index, pivot) combiner bounds the shuffle,
    coarse-bucket reduce emits wide rows; index keys never reach the
    driver (stages/pivot.py:pivot_table)."""
    from ..stages.pivot import pivot_table

    return pivot_table(_orders_cents(sf_dir), ["o_custkey"],
                       "o_orderstatus", "cents",
                       pivot_values=["F", "O", "P"])


def q_status_seq(sf_dir: str):
    """Ordered per-key string concatenation (string_agg ... ORDER BY):
    each customer's order-status sequence in orderkey order
    (stages/pivot.py:group_concat)."""
    from ..stages.pivot import group_concat

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderstatus"])
    return group_concat(orders, ["o_custkey"], "o_orderstatus",
                        ["o_orderkey"])


def q_rollup(sf_dir: str):
    """GROUPING SETS rollup ((flag, status), (flag), ()) — ONE
    distributed fine aggregate; the subtotal levels derive from the
    handful of fine rows in a single tiny final task (re-summing exact
    whole-number sums — no extra shuffles or branch stages; the earlier
    three-branch plan was pure stage-latency overhead on ~6 rows)."""
    import pandas as pd

    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus",
                                    "l_quantity"])
    fine = zonal.zonal_aggregate(
        li, ["l_returnflag", "l_linestatus"], {"l_quantity": ["sum"]}
    )

    def all_levels(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        mid = df.groupby("l_returnflag", as_index=False)[
            ["n", "l_quantity_sum"]
        ].sum()
        mid.insert(1, "l_linestatus", None)
        total = pd.DataFrame({
            "l_returnflag": [None], "l_linestatus": [None],
            "n": [df["n"].sum()],
            "l_quantity_sum": [df["l_quantity_sum"].sum()],
        })
        cols = ["l_returnflag", "l_linestatus", "n", "l_quantity_sum"]
        out = pd.concat([df[cols], mid[cols], total[cols]],
                        ignore_index=True)
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    return fine.repartition(1).map_batches(all_levels, batch_format="pyarrow")


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min
SLIDE_SIZE_UNITS = 3  # 3-hour windows stepping 1 hour


def q_sessions(sf_dir: str):
    """Gap-based sessionization (streaming-shaped op; gaps-and-islands
    oracle)."""
    from ..stages.windows import sessionize

    ev = _read(sf_dir, "events", ["user_id", "ts"])
    return sessionize(ev, key_col="user_id", ts_col="ts", gap_us=SESSION_GAP_US)


RETENTION_UNIT_US = 7 * 86_400 * 10 ** 6  # calendar weeks from the epoch


def q_retention(sf_dir: str):
    """Cohort retention matrix (cohort = user's first epoch-week; count
    users active k weeks later) — one key-partitioned shuffle of
    distinct (user, week) partials, cohorts derived in-bucket with a
    segmented min, tiny weeks^2 final reduce, NO join
    (stages/sequence.py:cohort_retention)."""
    from ..stages.sequence import cohort_retention

    ev = _read(sf_dir, "events", ["user_id", "ts"])
    return cohort_retention(ev, unit_us=RETENTION_UNIT_US)


def _sql_retention() -> str:
    return f"""
WITH uw AS (
  SELECT DISTINCT user_id AS k,
         CAST(epoch_us(ts) // {RETENTION_UNIT_US} AS BIGINT) AS u
  FROM events
),
c AS (SELECT k, MIN(u) AS cohort FROM uw GROUP BY k)
SELECT c.cohort, uw.u - c.cohort AS "offset",
       CAST(COUNT(*) AS BIGINT) AS n_keys
FROM uw JOIN c USING (k) GROUP BY 1, 2"""


def q_sliding(sf_dir: str):
    """Sliding 3h/1h window counts per event_type — dense path (per-unit
    partials + prefix sums), no per-event fan-out."""
    from ..stages.windows import sliding_count_dense

    ev = _read(sf_dir, "events", ["event_type", "ts"])
    return sliding_count_dense(
        ev, ts_col="ts", key_col="event_type",
        size_units=SLIDE_SIZE_UNITS, unit_us=3_600_000_000,
    )


def _events_cents(sf_dir: str):
    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def cents(b: pa.Table) -> pa.Table:
        c = np.rint(
            b.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({"event_type": b.column("event_type"),
                         "ts": b.column("ts"),
                         "v_cents": pa.array(c, pa.int64())})

    return ev.map_batches(cents, batch_format="pyarrow")


def q_sliding_value(sf_dir: str):
    """Sliding 3h/1h windowed VALUE aggregate per event_type (cents sum +
    max) — via the DENSE path (per-unit partials + prefix sums + sparse-
    table range-max): no per-event fan-out, same oracle as the fan-out
    implementation."""
    from ..stages.windows import sliding_agg_dense

    return sliding_agg_dense(
        _events_cents(sf_dir),
        ts_col="ts", key_col="event_type", value_col="v_cents",
        size_units=SLIDE_SIZE_UNITS, unit_us=3_600_000_000,
        aggs=["sum", "max"],
    )


SLIDE_BIG_UNITS = 24


def q_sliding_big(sf_dir: str):
    """24h/1h sliding windowed aggregate (sum + min + max) — the big-
    window case where the fan-out implementation would 24x every event;
    the dense path's shuffle volume is UNCHANGED from the 3h window
    (per-(key, unit) partials only)."""
    from ..stages.windows import sliding_agg_dense

    return sliding_agg_dense(
        _events_cents(sf_dir),
        ts_col="ts", key_col="event_type", value_col="v_cents",
        size_units=SLIDE_BIG_UNITS, unit_us=3_600_000_000,
        aggs=["sum", "min", "max"],
    )


def q_parse_props(sf_dir: str):
    """Parser op: extract the integer payload from the events ``props``
    JSON-ish string column ('{"k": 69}') and aggregate it — the
    per-record parser category (SURVEY §2.3), regex mirrored in SQL."""
    import re

    pat = re.compile(r"[0-9]+")

    def parse(b: pa.Table) -> pa.Table:
        props = b.column("props").to_pylist()
        k = np.fromiter(
            (int(m.group()) if (m := pat.search(p or "")) else 0 for p in props),
            dtype=np.int64,
            count=len(props),
        )
        return pa.table({"event_type": b.column("event_type"),
                         "k": pa.array(k, pa.int64())})

    ev = _read(sf_dir, "events", ["event_type", "props"])
    return zonal.zonal_aggregate(
        ev.map_batches(parse, batch_format="pyarrow"),
        ["event_type"],
        {"k": ["sum", "max"]},
    )


def q_distinct_users(sf_dir: str):
    """COUNT(DISTINCT) as ONE exact keyed reduction: per-batch pair
    dedup (combiner), one coarse-bucket shuffle on the pair key (global
    dedup + per-bucket partial counts — one row per distinct pair moves,
    never per event), and a tiny final sum over n_buckets x |keys|
    partial rows."""
    import pandas as pd

    from ..stages.bucketed import bucketed_groupby

    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    pairs = ev.map_batches(
        lambda b: b.group_by(["event_type", "user_id"]).aggregate([]),
        batch_format="pyarrow",
    )

    def bucket_count(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["event_type", "user_id"])
        out = d.groupby("event_type", sort=False).size().rename("partial")
        return out.reset_index()

    partials = bucketed_groupby(pairs, ["event_type", "user_id"], bucket_count)

    def final(b: pa.Table) -> pa.Table:
        df = b.to_pandas().groupby("event_type", sort=False)["partial"].sum()
        return pa.table({
            "event_type": pa.array(df.index.to_numpy()),
            "n_users": pa.array(df.to_numpy().astype(np.int64), pa.int64()),
        })

    return partials.repartition(1).map_batches(final, batch_format="pyarrow")


STRAT_N = 20


def q_strat_sample(sf_dir: str):
    """Stratified sampling: exactly min(20, |stratum|) events per
    event_type, deterministic hash ranking — per-batch local top-n
    pre-prune, one bucketed reduce; at most n rows per (key, batch)
    ever shuffle."""
    from ..stages.partition import stratified_sample

    ev = _read(sf_dir, "events", ["event_type", "event_id"])
    return stratified_sample(ev, ["event_type"], STRAT_N, "event_id")


def q_heavy_hitters(sf_dir: str):
    """Approximate top-k by count via bounded per-block summaries (the
    space-saving shape: distinct keys never materialize).  At this
    capacity nothing truncates, so n_lo == n_hi == the exact count and
    the SQL oracle matches bit-for-bit; the bounded-capacity error
    guarantee is unit-tested separately."""
    from ..stages.sketch import approx_top_k

    ev = _read(sf_dir, "events", ["user_id"])
    return approx_top_k(ev, "user_id", k=10, capacity=8192)


def q_prepost(sf_dir: str):
    """Pre/post-event split (docs/stacking.md:468-487 analog): tag each
    event against a cutoff, count per (event_type, phase)."""
    ev = _read(sf_dir, "events", ["ts", "event_type"])
    cutoff = np.datetime64("2024-02-15T00:00:00", "us")
    tagged = stack.split_by_time(ev, "ts", cutoff)
    only = tagged.map_batches(
        lambda b: b.select(["event_type", "phase"]), batch_format="pyarrow"
    )
    return zonal.zonal_aggregate(only, ["event_type", "phase"], {})


RANGE_N_WIN = 14
RANGE_STEP_US = 2 * 86_400 * 10**6   # windows start every 2 days
RANGE_LEN_US = 4 * 86_400 * 10**6    # ...and span 4 days (50% overlap)
RANGE_BASE_US = int(np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64))


def q_range_windows(sf_dir: str):
    """Range (interval) join: events matched to overlapping fixed time
    windows via the broadcast range join (searchsorted sweep per batch,
    NO shuffle), then a per-window aggregate in integer cents."""
    import ray

    from ..stages.rangejoin import make_broadcast_range_join

    wid = np.arange(RANGE_N_WIN, dtype=np.int64)
    lo = RANGE_BASE_US + wid * RANGE_STEP_US
    blob = {
        "lo": lo,
        "hi": lo + RANGE_LEN_US,
        "keep": {"window_id": wid},
        "keep_types": {"window_id": pa.int64()},
    }
    ref = ray.put(blob) if ray.is_initialized() else blob

    def prep(b: pa.Table) -> pa.Table:
        t = b.column("ts").to_numpy(zero_copy_only=False)
        t_us = t.astype("datetime64[us]").astype(np.int64)
        cents = np.rint(
            b.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({"t": pa.array(t_us, pa.int64()),
                         "v_cents": pa.array(cents, pa.int64())})

    ev = _read(sf_dir, "events", ["ts", "value"]).map_batches(
        prep, batch_format="pyarrow"
    )
    joined = ev.map_batches(
        make_broadcast_range_join(ref, value_col="t"), batch_format="pyarrow"
    )
    return zonal.zonal_aggregate(
        joined.map_batches(
            lambda b: b.select(["window_id", "v_cents"]), batch_format="pyarrow"
        ),
        ["window_id"],
        {"v_cents": ["sum"]},
    )


KR_N_WIN = 3                      # per-key validity intervals per user
KR_DAY_US = 86_400 * 10**6
KR_LEN_US = 3 * KR_DAY_US


def q_keyed_range(sf_dir: str):
    """Keyed (by= + interval) range join: each user's events matched to
    that user's own validity windows (deterministic per-user arithmetic
    intervals), then a per-(user, window) cents aggregate.  The shuffle
    key is hash(user) x time-slab — only co-matchable rows co-locate."""
    from ..stages.bucketed import first_per_key
    from ..stages.rangejoin import keyed_range_join

    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.column("ts").to_numpy(zero_copy_only=False)
        t_us = t.astype("datetime64[us]").astype(np.int64)
        cents = np.rint(
            b.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({"user_id": b.column("user_id"),
                         "t": pa.array(t_us, pa.int64()),
                         "v_cents": pa.array(cents, pa.int64())})

    left = ev.map_batches(prep, batch_format="pyarrow")
    users = first_per_key(
        left.map_batches(lambda b: b.select(["user_id"]),
                         batch_format="pyarrow"),
        ["user_id"], ["user_id"],
    )

    def mk_windows(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        reps = np.repeat(u, KR_N_WIN)
        j = np.tile(np.arange(KR_N_WIN, dtype=np.int64), len(u))
        lo = RANGE_BASE_US + ((reps * 7 + j * 13) % 40) * KR_DAY_US
        return pa.table({"r_user": pa.array(reps, pa.int64()),
                         "win": pa.array(j, pa.int64()),
                         "lo": pa.array(lo, pa.int64()),
                         "hi": pa.array(lo + KR_LEN_US, pa.int64())})

    wins = users.map_batches(mk_windows, batch_format="pyarrow")
    joined = keyed_range_join(
        left, wins, left_key="user_id", right_key="r_user",
        value_col="t", lo_col="lo", hi_col="hi",
        bucket_width=4 * KR_DAY_US, n_buckets=32,
    )
    return zonal.zonal_aggregate(
        joined.map_batches(
            lambda b: b.select(["user_id", "win", "v_cents"]),
            batch_format="pyarrow",
        ),
        ["user_id", "win"],
        {"v_cents": ["sum"]},
    )


def q_asof(sf_dir: str):
    """AS-OF join: each purchase event picks the user's most recent view
    event's value (cents) — the partitioned merge_asof operator with a
    DuckDB ASOF LEFT JOIN oracle."""
    from ..stages.hashjoin import asof_join

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type",
                                  "value"])

    def purchases(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b.column("event_type"), pa.scalar("purchase")))
        return f.select(["event_id", "user_id", "ts"])

    def views(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b.column("event_type"), pa.scalar("view")))
        cents = np.rint(
            f.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "user_id": f.column("user_id"),
                "ts": f.column("ts"),
                "prev_view_cents": pa.array(cents, pa.int64()),
            }
        )

    p = ev.map_batches(purchases, batch_format="pyarrow")
    v = ev.map_batches(views, batch_format="pyarrow")
    out = asof_join(p, v, by=["user_id"], on="ts", n_buckets=32)
    return out.map_batches(
        lambda b: b.select(["event_id", "user_id", "prev_view_cents"]),
        batch_format="pyarrow",
    )


def q_autocorr(sf_dir: str):
    """Per-user LAG-1 SERIAL correlation of event amounts (the ACF(1)
    burstiness/momentum statistic): keyed_lag ships each row its
    predecessor's cents, then grouped_corr's exact-int64 moment
    combiner + mirrored DOUBLE finale — a pure composition of two
    existing verified stages (stages/scan.py:keyed_lag +
    stages/zonal.py:grouped_corr)."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def prep(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": b.column("user_id"),
            "event_id": b.column("event_id"),
            "v_cents": pa.array(np.rint(v * 100.0).astype(np.int64)),
        })

    lagged = scan.keyed_lag(
        ev.map_batches(prep, batch_format="pyarrow"),
        "user_id", "event_id", "v_cents", out_col="prev")
    pairs = lagged.map_batches(
        lambda b: b.filter(pc.is_valid(b.column("prev")))
        .select(["user_id", "v_cents", "prev"]),
        batch_format="pyarrow")
    return zonal.grouped_corr(pairs, ["user_id"], "v_cents", "prev",
                              out_col="acf1", n_buckets=8)


_SQL_AUTOCORR = """
WITH e AS (SELECT user_id, event_id,
                  CAST(ROUND(value * 100.0) AS BIGINT) AS v FROM events),
l AS (SELECT user_id, v,
             LAG(v) OVER (PARTITION BY user_id ORDER BY event_id) AS pv
      FROM e),
f AS (SELECT user_id, v AS x, pv AS y FROM l WHERE pv IS NOT NULL),
s AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx,
             SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx,
             SUM(y * y) AS syy
      FROM f GROUP BY user_id),
d AS (SELECT user_id, n,
  CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov,
  CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
  CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy FROM s)
SELECT user_id, n, CASE WHEN vx > 0 AND vy > 0
  THEN cov / (SQRT(vx) * SQRT(vy)) ELSE NULL END AS acf1
FROM d"""


def q_covered_time(sf_dir: str):
    """Per-user TOTAL COVERED TIME with overlaps merged (session
    coverage / uptime accounting): each event spans [ts, ts +
    cents·1ms); one bucketed shuffle + the vectorized gaps-and-islands
    sweep — every row adds max(0, end − max(start, running-max-end))
    (stages/windows.py:interval_union_length)."""
    from ..stages.windows import interval_union_length

    ev = _read(sf_dir, "events", ["ts", "user_id", "value"])

    def to_iv(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        v = b.column("value").to_numpy(zero_copy_only=False)
        dur = np.rint(v * 100.0).astype(np.int64) * 1000
        return pa.table({
            "user_id": b.column("user_id"),
            "s": pa.array(ts),
            "e": pa.array(ts + dur),
        })

    return interval_union_length(
        ev.map_batches(to_iv, batch_format="pyarrow"),
        "user_id", "s", "e")


_SQL_COVERED_TIME = """
WITH e AS (SELECT user_id, epoch_us(ts) AS s,
                  epoch_us(ts)
                  + CAST(ROUND(value * 100.0) AS BIGINT) * 1000 AS en
           FROM events),
w AS (SELECT user_id, s, en,
  MAX(en) OVER (PARTITION BY user_id ORDER BY s, en
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    AS pmax
  FROM e),
c AS (SELECT user_id,
             GREATEST(en - GREATEST(s, COALESCE(pmax, 0)), 0) AS add_
      FROM w)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_iv,
       CAST(SUM(add_) AS BIGINT) AS covered
FROM c GROUP BY user_id"""


def q_cusum(sf_dir: str):
    """Per-user CUSUM changepoint — the max-deviation scan statistic
    in exact integers: G_i = |n·S_i − i·S_n| over the ts-ordered cents
    prefix sums; argmax position (smallest i on ties) + its event id.
    ONE bucketed shuffle, segmented-vectorized scan inside
    (stages/windows.py:cusum_changepoint)."""
    from ..stages.windows import cusum_changepoint

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": b.column("user_id"),
            "ts": b.column("ts"),
            "event_id": b.column("event_id"),
            "v_cents": pa.array(np.rint(v * 100.0).astype(np.int64)),
        })

    out = cusum_changepoint(
        ev.map_batches(to_cents, batch_format="pyarrow"),
        "user_id", ["ts", "event_id"], "v_cents", id_col="event_id")
    return out.map_batches(
        lambda b: pa.table({
            "user_id": pc.cast(b.column("user_id"), pa.int64()),
            "n": pc.cast(b.column("n"), pa.int64()),
            "cp_i": pc.cast(b.column("cp_i"), pa.int64()),
            "cp_event": pc.cast(b.column("cp_id"), pa.int64()),
            "g_max": pc.cast(b.column("g_max"), pa.int64()),
        }),
        batch_format="pyarrow")


_SQL_CUSUM = """
WITH e AS (SELECT user_id, event_id, ts,
                  CAST(ROUND(value * 100.0) AS BIGINT) AS v FROM events),
w AS (SELECT user_id, event_id, v,
  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
       AS BIGINT) AS i,
  CAST(SUM(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s,
  CAST(SUM(v) OVER (PARTITION BY user_id) AS BIGINT) AS stot,
  CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
  FROM e),
g AS (SELECT user_id, event_id, i, n, ABS(n * s - i * stot) AS gv
      FROM w),
best AS (SELECT user_id, n, i AS cp_i, event_id AS cp_event,
                gv AS g_max FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY gv DESC, i) AS rn FROM g)
  WHERE rn = 1)
SELECT user_id, n, cp_i, cp_event, g_max FROM best"""


def q_peak_value(sf_dir: str):
    """Per-user running-sum peak — the keyed-ordered-fold (actor-state
    streaming window) surface, integer-exact via cents."""
    from ..stages.windows import running_peak

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def to_cents(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy(zero_copy_only=False)
        cents = np.rint(v * 100.0).astype(np.int64)
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "ts": b.column("ts"),
                "event_id": b.column("event_id"),
                "v_cents": pa.array(cents, pa.int64()),
            }
        )

    folded = running_peak(
        ev.map_batches(to_cents, batch_format="pyarrow"),
        key_col="user_id", order_cols=["ts", "event_id"], value_col="v_cents",
    )
    return folded.map_batches(
        lambda b: pa.table({"user_id": b.column("user_id"),
                            "peak_cents": b.column("peak"),
                            "total_cents": b.column("total")}),
        batch_format="pyarrow",
    )


def q_sample(sf_dir: str):
    """Deterministic ~10% sample via a hash predicate — reproducible
    under any partitioning/retry (unlike RNG sampling) and replicable in
    SQL (SURVEY §2.3 sampling)."""
    from ..functions.hashing import knuth_unit

    def flt(b: pa.Table) -> pa.Table:
        key = b.column("doc_id").to_numpy(zero_copy_only=False)
        keep = knuth_unit(key * 7 + 1) < 0.1
        return b.filter(pa.array(keep)).select(["doc_id", "lang"])

    return _read(sf_dir, "documents", ["doc_id", "lang"]).map_batches(
        flt, batch_format="pyarrow"
    )


def q_join_agg(sf_dir: str):
    """Large x large hash join (orders x lineitem on orderkey) followed by
    a partial-final aggregate — the non-broadcast join path
    (stages/hashjoin.py).  Uses the portable bucketed join: on this Ray
    version the built-in Dataset.join's aggregator actors cost 10x more
    wall at these scales (measured 42s vs 4s)."""
    from ..stages.hashjoin import bucketed_join as equi_join_impl

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]).map_batches(
        lambda b: pa.table(
            {"o_orderkey": b.column("l_orderkey"),
             "l_quantity": b.column("l_quantity")}
        ),
        batch_format="pyarrow",
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = equi_join_impl(li, orders, ["o_orderkey"], n_buckets=32)
    return zonal.zonal_aggregate(
        joined.map_batches(
            lambda b: b.select(["o_orderpriority", "l_quantity"]),
            batch_format="pyarrow",
        ),
        ["o_orderpriority"],
        {"l_quantity": ["sum"]},
    )


def q_events_hourly(sf_dir: str):
    ev = _read(sf_dir, "events", ["ts", "event_type"])

    def hour(b: pa.Table) -> pa.Table:
        ts = b.column("ts").to_numpy(zero_copy_only=False)
        h = ts.astype("datetime64[us]").astype(np.int64) // 3_600_000_000
        return pa.table(
            {"event_type": b.column("event_type"), "hour": pa.array(h, pa.int64())}
        )

    return zonal.zonal_aggregate(
        ev.map_batches(hour, batch_format="pyarrow"), ["event_type", "hour"], {}
    )


# --- the SQL oracles ------------------------------------------------------

# DuckDB HUGEINT mirrors of the poly64 hashing in stages/dedup.py: every
# step is multiply-add mod 2^64 (no xor), products bounded < 2^127 so the
# INT128 arithmetic never overflows.
_SQL_M = "18446744073709551616::HUGEINT"     # 2^64
_SQL_P = "1099511628211::HUGEINT"            # POLY_P
_SQL_H0 = "14695981039346656037::HUGEINT"    # POLY_H0
_SQL_I64 = "9223372036854775808::HUGEINT"    # 2^63 (signed conversion)


def _sql_tokhash_cte() -> str:
    """tok/th CTEs: per-doc token list and poly64 token-hash list."""
    return f"""
tok AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks FROM documents
),
th AS (
  SELECT doc_id, list_transform(toks, t ->
    list_reduce(list_prepend({_SQL_H0},
      list_transform(range(1, length(t)+1), i -> unicode(t[i])::HUGEINT)),
      (h, cp) -> (h * {_SQL_P} + cp) % {_SQL_M})) AS ths
  FROM tok
)"""


def _sql_shingle_ctes(k: int) -> str:
    """tok/th/sh/shr CTEs: k-token shingle hashes per doc, unnested —
    the dedup convention (max(n_tokens-k+1, 1) shingles; short docs fold
    whatever tokens exist)."""
    return f"""{_sql_tokhash_cte()},
sh AS (
  SELECT doc_id, list_transform(range(greatest(len(ths)-{k}+1, 1)), i ->
    list_reduce(list_prepend({_SQL_H0}, ths[i+1 : least(i+{k}, len(ths))]),
      (h, v) -> (h * {_SQL_P} + v) % {_SQL_M})) AS shs
  FROM th
),
shr AS (SELECT doc_id, unnest(shs) AS s FROM sh)"""


def _sql_minhash_sig_ctes() -> str:
    """The CTE chain from documents to ``sig(doc_id, p, v)`` and
    ``bands(doc_id, band_id, bh)`` — MinHash token-shingle signatures +
    band buckets in HUGEINT arithmetic (shared by the CC closure and the
    cross-run near-dup delta oracle)."""
    a, b = dedup.perm_params(MH_NUM_PERM)
    permvals = ", ".join(
        f"({p}, {int(a[p])}::HUGEINT, {int(b[p])}::HUGEINT)"
        for p in range(MH_NUM_PERM)
    )
    r = MH_NUM_PERM // MH_BANDS
    return f"""{_sql_tokhash_cte()},
sh AS (
  SELECT doc_id, list_transform(range(greatest(len(ths)-{MH_K}+1, 1)), i ->
    list_reduce(list_prepend({_SQL_H0}, ths[i+1 : least(i+{MH_K}, len(ths))]),
      (h, v) -> (h * {_SQL_P} + v) % {_SQL_M})) AS shs
  FROM th
),
shr AS (SELECT doc_id, unnest(shs) AS s FROM sh),
perm(p, a, b) AS (VALUES {permvals}),
sig AS (
  SELECT doc_id, p, MIN((s * a + b) % {_SQL_M}) AS v
  FROM shr CROSS JOIN perm GROUP BY doc_id, p
),
bandlist AS (
  SELECT doc_id, p // {r} AS band_id, list(v ORDER BY p) AS vs
  FROM sig GROUP BY doc_id, p // {r}
),
bands AS (
  SELECT doc_id, band_id,
    list_reduce(list_prepend({_SQL_H0}, vs),
      (h, v) -> (h * {_SQL_P} + v) % {_SQL_M}) AS bh
  FROM bandlist
)"""


def _sql_minhash_cc_ctes() -> str:
    """sig/bands CTEs + connected components via the recursive ``walk``
    CTE, ending at ``labels(doc_id, dup_group)``.  Compose inside a
    ``WITH RECURSIVE`` block."""
    return _sql_minhash_sig_ctes() + """,
edge AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y ON x.band_id = y.band_id AND x.bh = y.bh
),
walk(id, r) AS (
  SELECT DISTINCT a, a FROM edge
  UNION
  SELECT w.id, e.b FROM walk w JOIN edge e ON e.a = w.r
),
labels AS (SELECT id AS doc_id, MIN(r) AS dup_group FROM walk GROUP BY id)"""


SPLIT_DELIM = " table "  # record delimiter present throughout the corpus


def q_split_explode(sf_dir: str):
    """Regex record splitting + ordinal explode (the sentence-split
    mechanism): one row per delimiter-separated part with its 1-based
    index — pure flat map, zero-copy list explode, NO shuffle
    (stages/corpus.py:split_records; RE2 on both sides)."""
    from ..stages.corpus import split_records

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return split_records(docs, SPLIT_DELIM)


_SQL_SPLIT_EXPLODE = f"""
WITH s AS (SELECT doc_id, regexp_split_to_array(text, '{SPLIT_DELIM}') AS parts
           FROM documents),
e AS (SELECT doc_id,
             unnest(range(1, len(parts) + 1)) AS part_idx,
             unnest(parts) AS part
      FROM s)
SELECT doc_id, CAST(part_idx AS BIGINT) AS part_idx, part
FROM e WHERE length(part) > 0
"""


MH_AGREE_MIN = 32  # delta near-dup verify: >= 32/64 agreeing positions


def q_delta_neardup(sf_dir: str):
    """CROSS-RUN incremental NEAR-dup dedup: run 1 seeds a persistent
    MinHash-signature store with the even-doc_id half; run 2 processes
    the odd half and drops docs that share an LSH band bucket with a
    stored doc AND agree on >= 32/64 signature positions — the
    dedup-new-crawl-against-all-prior-crawls shape (only signatures
    persist and shuffle, never documents)
    (stages/dedup.py:incremental_minhash_dedup)."""
    import shutil
    import tempfile

    from ..stages.dedup import incremental_minhash_dedup

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def half(parity):
        def fn(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            return b.filter(pa.array(ids % 2 == parity))

        return fn

    store = tempfile.mkdtemp(prefix="zen3geo_deltand_")
    try:
        seed = incremental_minhash_dedup(
            docs.map_batches(half(0), batch_format="pyarrow"), store,
            num_perm=MH_NUM_PERM, bands=MH_BANDS, k=MH_K,
            agree_min=MH_AGREE_MIN,
        )
        seed.count()  # drive run 1 so the store is seeded
        fresh = incremental_minhash_dedup(
            docs.map_batches(half(1), batch_format="pyarrow"), store,
            num_perm=MH_NUM_PERM, bands=MH_BANDS, k=MH_K,
            agree_min=MH_AGREE_MIN,
        )
        out = fresh.map_batches(
            lambda b: b.select(["doc_id"]), batch_format="pyarrow"
        ).materialize()
    finally:
        shutil.rmtree(store, ignore_errors=True)
    return out


def _sql_delta_neardup() -> str:
    return f"""WITH {_sql_minhash_sig_ctes()},
ba AS (SELECT doc_id, band_id, bh FROM bands WHERE doc_id % 2 = 0),
bb AS (SELECT doc_id, band_id, bh FROM bands WHERE doc_id % 2 = 1),
cand AS (SELECT DISTINCT bb.doc_id AS b, ba.doc_id AS a
         FROM bb JOIN ba ON ba.band_id = bb.band_id AND ba.bh = bb.bh),
agree AS (
  SELECT c.b, c.a, CAST(COUNT(*) AS BIGINT) AS n
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.a
  JOIN sig sb ON sb.doc_id = c.b AND sb.p = sa.p AND sb.v = sa.v
  GROUP BY 1, 2),
dups AS (SELECT DISTINCT b FROM agree WHERE n >= {MH_AGREE_MIN})
SELECT doc_id FROM documents
WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT b FROM dups)"""


def _sql_minhash_groups() -> str:
    """MinHash LSH dup groups — mirrors stages/dedup.py
    minhash_lsh_groups at its fixpoint exactly (same perms, same folds,
    same component mins)."""
    return (
        "WITH RECURSIVE " + _sql_minhash_cc_ctes()
        + " SELECT doc_id, dup_group FROM labels"
    )


def _sql_simhash() -> str:
    """Token-vote SimHash in HUGEINT arithmetic (bit b of a token hash is
    (h // 2^b) % 2); zero-token docs COALESCE to -1 like the engine's
    all-bits-set vote."""
    bitvals = ", ".join(f"({b}, {1 << b}::HUGEINT)" for b in range(64))
    return f"""
WITH {_sql_tokhash_cte()},
thr AS (SELECT doc_id, unnest(ths) AS h FROM th),
bitt(bit, w) AS (VALUES {bitvals}),
votes AS (
  SELECT doc_id, bit, ANY_VALUE(w) AS w,
         SUM(CASE WHEN (h // w) % 2 = 1 THEN 1 ELSE -1 END) AS v
  FROM thr CROSS JOIN bitt GROUP BY doc_id, bit
),
fp AS (
  SELECT doc_id, SUM(CASE WHEN v >= 0 THEN w ELSE 0::HUGEINT END) AS f
  FROM votes GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(COALESCE(
    f.f - CASE WHEN f.f >= {_SQL_I64} THEN {_SQL_M} ELSE 0::HUGEINT END,
    -1) AS BIGINT) AS simhash
FROM documents d LEFT JOIN fp f USING (doc_id)
"""


def _sql_lang_ctes(src: str = "documents") -> str:
    """CTE chain from ``src(doc_id, text)`` to ``langpred(doc_id,
    lang_pred)`` — distinct lowered tokens intersected with each profile;
    best score > 0 wins, ties to the smallest lang code, CJK
    unicode-range overrides first — exactly functions/text.py
    detect_lang."""
    from ..functions.text import _LANG_PROFILES

    langvals = ", ".join(
        "('%s', [%s])" % (lang, ",".join(f"'{w}'" for w in sorted(_LANG_PROFILES[lang])))
        for lang in sorted(_LANG_PROFILES)
    )
    return f"""w AS (
  SELECT doc_id, lower(text) AS lt,
         list_distinct(regexp_extract_all(lower(text), '\\S+')) AS words
  FROM {src}
),
langs(lang, sw) AS (VALUES {langvals}),
scored AS (
  SELECT doc_id, lang, len(list_intersect(words, sw)) AS sc
  FROM w CROSS JOIN langs
),
best AS (
  SELECT doc_id, lang, sc,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sc DESC, lang) AS rn
  FROM scored
),
langpred AS (
  SELECT w.doc_id,
    CASE WHEN regexp_matches(w.lt, '[぀-ヿ]') THEN 'ja'
         WHEN regexp_matches(w.lt, '[一-鿿]') THEN 'zh'
         WHEN b.sc > 0 THEN b.lang ELSE 'und' END AS lang_pred
  FROM w JOIN best b ON w.doc_id = b.doc_id AND b.rn = 1
)"""


def _sql_lang_detect() -> str:
    return (
        "WITH " + _sql_lang_ctes()
        + " SELECT doc_id, lang_pred FROM langpred"
    )


def _sql_curate() -> str:
    """Full curation oracle: MinHash-CC representatives (doc_id ==
    component min) -> whitespace token filter -> lang id -> per-lang
    (n docs, total tokens).  One WITH RECURSIVE block composing the
    minhash and lang CTE chains over the kept subset."""
    return (
        "WITH RECURSIVE " + _sql_minhash_cc_ctes() + f""",
reps AS (SELECT doc_id FROM labels WHERE doc_id = dup_group),
kept AS (
  SELECT d.doc_id, d.text,
         CAST(LEN(regexp_extract_all(d.text, '\\S+')) AS BIGINT) AS n_tok
  FROM documents d JOIN reps USING (doc_id)
  WHERE LEN(regexp_extract_all(d.text, '\\S+')) >= {CURATE_MIN_TOKENS}
),
{_sql_lang_ctes('kept')}
SELECT l.lang_pred, COUNT(*) AS n,
       CAST(SUM(k.n_tok) AS BIGINT) AS n_tok_sum
FROM kept k JOIN langpred l USING (doc_id)
GROUP BY l.lang_pred
""")


def _sql_knn() -> str:
    ncols, nrows = 2 << RES_KNN, 1 << RES_KNN
    qvals = ", ".join(f"({q}, {lon!r}, {lat!r})" for q, lon, lat in KNN_QUERIES)
    lon_e, lat_e = sql_geocode_exprs("doc_id", "lang")
    nx = (
        f"LEAST(GREATEST(CAST(FLOOR(((lon) + 180.0) / 360.0 * {ncols}) AS BIGINT), 0), {ncols - 1})"
    )
    ny = (
        f"LEAST(GREATEST(CAST(FLOOR(((lat) + 90.0) / 180.0 * {nrows}) AS BIGINT), 0), {nrows - 1})"
    )
    qnx = nx.replace("(lon)", "(qlon)")
    qny = ny.replace("(lat)", "(qlat)")
    hav = (
        "2 * 6371.0088 * ASIN(SQRT("
        "POW(SIN((RADIANS(lat) - RADIANS(qlat)) / 2), 2) + "
        "COS(RADIANS(qlat)) * COS(RADIANS(lat)) * "
        "POW(SIN((RADIANS(lon) - RADIANS(qlon)) / 2), 2)))"
    )
    return f"""
WITH geo AS (
  SELECT doc_id, {lon_e} AS lon, {lat_e} AS lat FROM documents
),
pts AS (SELECT doc_id, lon, lat, {nx} AS nx, {ny} AS ny FROM geo),
q(query_id, qlon, qlat) AS (VALUES {qvals}),
qc AS (SELECT query_id, qlon, qlat, {qnx} AS qnx, {qny} AS qny FROM q),
cand AS (
  SELECT qc.query_id, pts.doc_id, {hav} AS d
  FROM qc JOIN pts ON
    LEAST(ABS(pts.nx - qc.qnx), {ncols} - ABS(pts.nx - qc.qnx)) <= {KNN_RING}
    AND ABS(pts.ny - qc.qny) <= {KNN_RING}
)
SELECT query_id, doc_id,
       ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d, doc_id) AS rank
FROM cand QUALIFY rank <= {KNN_K}
"""


def _sql_rasterize_cte() -> str:
    tw = 360.0 / TILE_NX
    th = 180.0 / TILE_NY
    # mirror assign_tiles: clip(floor((lon-lon0)/(lon1-lon0)*nx))
    ix = f"LEAST(GREATEST(CAST(FLOOR((lon - -180.0) / 360.0 * {TILE_NX}) AS BIGINT), 0), {TILE_NX - 1})"
    iy = f"LEAST(GREATEST(CAST(FLOOR((lat - -90.0) / 180.0 * {TILE_NY}) AS BIGINT), 0), {TILE_NY - 1})"
    # mirror _bin: floor((v - lo) / (hi - lo) * n)  (lo = -180 + ix*tw)
    px = f"CAST(FLOOR((lon - (-180.0 + ix * {tw!r})) / {tw!r} * {TILE_PX}) AS BIGINT)"
    gy = f"CAST(FLOOR((lat - (-90.0 + iy * {th!r})) / {th!r} * {TILE_PX}) AS BIGINT)"
    return f"""
{_sql_geo_cte(RES_ZONAL)},
tiled AS (SELECT lon, lat, {ix} AS ix, {iy} AS iy FROM geo),
binned AS (
  SELECT iy * {TILE_NX} + ix AS tile_id,
         {TILE_PX} - 1 - {gy} AS py,
         {px} AS px
  FROM tiled
),
hist AS (SELECT tile_id, py, px, COUNT(*) AS n FROM binned GROUP BY 1, 2, 3)
"""


def _sql_rasterize() -> str:
    return _sql_rasterize_cte() + "SELECT tile_id, py, px, n FROM hist"


def _staircase_ring(k: int) -> np.ndarray:
    """Deterministic integer STAIRCASE polygon for nation key k: V =
    3 + k%3 steps right/up with hash-free integer step sizes, closed
    left and down — a simple CCW rectilinear polygon whose shoelace
    terms are all exact small integers (both sides mirror the same
    vertex formulas)."""
    v = 3 + k % 3
    i = np.arange(1, v + 1, dtype=np.int64)
    dx = 1 + (k * 7 + i * 3) % 5
    dy = 1 + (k * 11 + i * 5) % 4
    xs = np.cumsum(dx)
    ys = np.cumsum(dy)
    yprev = np.concatenate([[0], ys[:-1]])
    ring = np.empty((2 * v + 3, 2), dtype=np.float64)
    ring[0] = (0.0, 0.0)
    ring[1:2 * v + 1:2, 0] = xs
    ring[1:2 * v + 1:2, 1] = yprev
    ring[2:2 * v + 1:2, 0] = xs
    ring[2:2 * v + 1:2, 1] = ys
    ring[2 * v + 1] = (0.0, ys[-1])
    ring[2 * v + 2] = (0.0, 0.0)
    return ring


def q_geom_stats(sf_dir: str):
    """Vector-geometry SUMMARY measures (the geopandas .area/.centroid
    surface, reference geopandas.py delegation): integer staircase
    polygons derived from nation keys -> WKB -> vectorized shoelace
    area2 / centroid numerators / exact derived centroid per polygon
    (geom/measure.py:geom_summary — stateless map, nothing shuffles)."""
    from ..geom import wkb as _wkb
    from ..geom.measure import geom_summary

    def mk(b: pa.Table) -> pa.Table:
        keys = b.column("n_nationkey").to_numpy(zero_copy_only=False)
        blobs = [_wkb.dumps({"type": "Polygon",
                             "coords": [_staircase_ring(int(k))]})
                 for k in keys]
        return pa.table({
            "poly_id": pa.array(keys.astype(np.int64)),
            "geometry_wkb": pa.array(blobs, pa.binary()),
        })

    polys = _read(sf_dir, "nation", ["n_nationkey"]).map_batches(
        mk, batch_format="pyarrow")
    out = geom_summary(polys, keep_cols=["poly_id"], as_int=True)
    return out.map_batches(
        lambda b: b.select(["poly_id", "nverts", "area2", "cx6", "cy6",
                            "cx", "cy"]),
        batch_format="pyarrow")


def _sql_geom_stats() -> str:
    return """WITH keys AS (SELECT n_nationkey AS k FROM nation),
vv AS (SELECT k, 3 + k % 3 AS V FROM keys),
steps AS (SELECT k, i,
                 1 + (k * 7 + i * 3) % 5 AS dx,
                 1 + (k * 11 + i * 5) % 4 AS dy
          FROM (SELECT k, unnest(range(1, V + 1)) AS i FROM vv)),
cum AS (SELECT k, i,
               SUM(dx) OVER (PARTITION BY k ORDER BY i) AS x,
               SUM(dy) OVER (PARTITION BY k ORDER BY i) AS y,
               COALESCE(SUM(dy) OVER (PARTITION BY k ORDER BY i
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS yprev
        FROM steps),
verts AS (
  SELECT k, 0 AS ord, 0 AS x, 0 AS y FROM keys
  UNION ALL SELECT k, 2 * i - 1, x, yprev FROM cum
  UNION ALL SELECT k, 2 * i, x, y FROM cum
  UNION ALL SELECT c.k, 2 * m.V + 1, 0, c.y
            FROM cum c JOIN vv m ON m.k = c.k AND c.i = m.V),
seq AS (SELECT k, ord, x, y,
               LEAD(x) OVER (PARTITION BY k ORDER BY ord) AS xn,
               LEAD(y) OVER (PARTITION BY k ORDER BY ord) AS yn
        FROM verts),
terms AS (SELECT k, x * yn - xn * y AS cr,
                 (x + xn) * (x * yn - xn * y) AS ax,
                 (y + yn) * (x * yn - xn * y) AS ay
          FROM seq WHERE xn IS NOT NULL),
agg AS (SELECT k AS poly_id,
               CAST(SUM(cr) AS BIGINT) AS area2,
               CAST(SUM(ax) AS BIGINT) AS cx6,
               CAST(SUM(ay) AS BIGINT) AS cy6
        FROM terms GROUP BY k),
nv AS (SELECT k AS poly_id, CAST(2 * V + 2 AS BIGINT) AS nverts FROM vv)
SELECT a.poly_id, nv.nverts, a.area2, a.cx6, a.cy6,
       CAST(a.cx6 AS DOUBLE) / CAST(3 * a.area2 AS DOUBLE) AS cx,
       CAST(a.cy6 AS DOUBLE) / CAST(3 * a.area2 AS DOUBLE) AS cy
FROM agg a JOIN nv ON nv.poly_id = a.poly_id"""


SIMPLIFY_T2 = 8   # keep corners with twice-triangle-area >= 8


def q_simplify(sf_dir: str):
    """ONE-PASS polygon simplification summary (the non-iterative
    Visvalingam screen, the .simplify() analog): over the staircase
    polygons keep vertices whose cyclic twice-triangle-area >= 8
    (first vertex anchors), report original vs simplified shoelace —
    all exact integers (geom/measure.py:simplify_summary)."""
    from ..geom import wkb as _wkb
    from ..geom.measure import simplify_summary

    def mk(b: pa.Table) -> pa.Table:
        keys = b.column("n_nationkey").to_numpy(zero_copy_only=False)
        blobs = [_wkb.dumps({"type": "Polygon",
                             "coords": [_staircase_ring(int(k))]})
                 for k in keys]
        return pa.table({
            "poly_id": pa.array(keys.astype(np.int64)),
            "geometry_wkb": pa.array(blobs, pa.binary()),
        })

    polys = _read(sf_dir, "nation", ["n_nationkey"]).map_batches(
        mk, batch_format="pyarrow")
    return simplify_summary(polys, threshold2=SIMPLIFY_T2,
                            keep_cols=["poly_id"])


def _sql_simplify() -> str:
    return f"""WITH keys AS (SELECT n_nationkey AS k FROM nation),
vv AS (SELECT k, 3 + k % 3 AS V FROM keys),
steps AS (SELECT k, i,
                 1 + (k * 7 + i * 3) % 5 AS dx,
                 1 + (k * 11 + i * 5) % 4 AS dy
          FROM (SELECT k, unnest(range(1, V + 1)) AS i FROM vv)),
cum AS (SELECT k, i,
               SUM(dx) OVER (PARTITION BY k ORDER BY i) AS x,
               SUM(dy) OVER (PARTITION BY k ORDER BY i) AS y,
               COALESCE(SUM(dy) OVER (PARTITION BY k ORDER BY i
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS yprev
        FROM steps),
verts AS MATERIALIZED (
  SELECT k, 0 AS ord, 0 AS x, 0 AS y FROM keys
  UNION ALL SELECT k, 2 * i - 1, x, yprev FROM cum
  UNION ALL SELECT k, 2 * i, x, y FROM cum
  UNION ALL SELECT c.k, 2 * m.V + 1, 0, c.y
            FROM cum c JOIN vv m ON m.k = c.k AND c.i = m.V),
mm AS (SELECT k, 2 * V + 2 AS m FROM vv),
orig AS (SELECT a.k,
  CAST(SUM(a.x * b.y - b.x * a.y) AS BIGINT) AS area2,
  CAST(COUNT(*) AS BIGINT) AS nverts
  FROM verts a JOIN mm ON mm.k = a.k
  JOIN verts b ON b.k = a.k AND b.ord = (a.ord + 1) % mm.m
  GROUP BY 1),
tri AS (SELECT v.k, v.ord, v.x, v.y,
        p.x AS xp, p.y AS yp, n.x AS xn, n.y AS yn
        FROM verts v JOIN mm ON mm.k = v.k
        JOIN verts p ON p.k = v.k AND p.ord = (v.ord + mm.m - 1) % mm.m
        JOIN verts n ON n.k = v.k AND n.ord = (v.ord + 1) % mm.m),
kept AS MATERIALIZED (SELECT k, ord, x, y,
        ROW_NUMBER() OVER (PARTITION BY k ORDER BY ord) AS rn,
        COUNT(*) OVER (PARTITION BY k) AS mk
        FROM tri WHERE ord = 0 OR
          ABS((x - xp) * (yn - yp) - (xn - xp) * (y - yp))
            >= {SIMPLIFY_T2}),
simp AS (SELECT a.k,
  CAST(SUM(a.x * b.y - b.x * a.y) AS BIGINT) AS area2_s,
  CAST(COUNT(*) AS BIGINT) AS nkept
  FROM kept a JOIN kept b ON b.k = a.k AND b.rn = a.rn % a.mk + 1
  GROUP BY 1)
SELECT o.k AS poly_id, o.nverts, s.nkept, o.area2, s.area2_s
FROM orig o JOIN simp s ON s.k = o.k"""


def q_focal(sf_dir: str):
    """FOCAL (3x3 moving-window) statistics over the rasterized count
    grid — the rioxarray/scipy focal-convolution analog on the sparse
    per-tile histogram: per touched pixel the window sum / touched
    count / max / mean, edges clipped, windows never cross tiles.
    Scatter-into-neighbors partials + ONE bucketed reduce; no join
    (stages/rasterize.py:focal_stats)."""
    from ..stages.rasterize import focal_stats

    sparse = q_rasterize(sf_dir)
    return focal_stats(sparse, px_size=TILE_PX, radius=1)


def _sql_focal() -> str:
    return _sql_rasterize_cte() + f""",
offs AS (SELECT a.dy, b.dx
         FROM (SELECT unnest(range(-1, 2)) AS dy) a,
              (SELECT unnest(range(-1, 2)) AS dx) b),
scat AS (SELECT h.tile_id, h.py + o.dy AS py, h.px + o.dx AS px,
                h.n AS v,
                CASE WHEN o.dy = 0 AND o.dx = 0 THEN 1 ELSE 0 END AS here
         FROM hist h CROSS JOIN offs o
         WHERE h.py + o.dy BETWEEN 0 AND {TILE_PX - 1}
           AND h.px + o.dx BETWEEN 0 AND {TILE_PX - 1}),
f AS (SELECT tile_id, py, px,
             CAST(SUM(v) AS BIGINT) AS focal_n,
             CAST(COUNT(*) AS BIGINT) AS focal_cnt,
             CAST(MAX(v) AS BIGINT) AS focal_max,
             CAST(SUM(here) AS BIGINT) AS hn,
             CAST(SUM(v * here) AS BIGINT) AS n
      FROM scat GROUP BY 1, 2, 3)
SELECT tile_id, py, px, n, focal_n, focal_cnt, focal_max,
       CAST(focal_n AS DOUBLE) / CAST(focal_cnt AS DOUBLE) AS focal_mean
FROM f WHERE hn > 0"""


SOBEL_GX = {(-1, -1): -1, (0, -1): -2, (1, -1): -1,
            (-1, 1): 1, (0, 1): 2, (1, 1): 1}
SOBEL_GY = {(-1, -1): -1, (-1, 0): -2, (-1, 1): -1,
            (1, -1): 1, (1, 0): 2, (1, 1): 1}


def q_sobel(sf_dir: str):
    """Sobel GRADIENT over the rasterized count grid — the
    hillshade/slope-style focal-kernel convolution: both 3x3 kernels
    evaluate in ONE scatter pass + one bucketed reduce (k kernels cost
    one shuffle), all-int64 with the squared gradient magnitude
    gx²+gy² (stages/rasterize.py:focal_conv)."""
    from ..stages.rasterize import focal_conv

    sparse = q_rasterize(sf_dir)
    out = focal_conv(sparse, px_size=TILE_PX,
                     kernels={"gx": SOBEL_GX, "gy": SOBEL_GY})

    def g2(b: pa.Table) -> pa.Table:
        gx = b.column("gx").to_numpy(zero_copy_only=False)
        gy = b.column("gy").to_numpy(zero_copy_only=False)
        return b.append_column("g2", pa.array(gx * gx + gy * gy,
                                              pa.int64()))

    return out.map_batches(g2, batch_format="pyarrow")


def _sql_sobel() -> str:
    all_offs = sorted(set(SOBEL_GX) | set(SOBEL_GY) | {(0, 0)})
    rows = ", ".join(
        f"({dy}, {dx}, {SOBEL_GX.get((dy, dx), 0)}, "
        f"{SOBEL_GY.get((dy, dx), 0)})"
        for dy, dx in all_offs)
    return _sql_rasterize_cte() + f""",
offs(dy, dx, wx, wy) AS (VALUES {rows}),
scat AS (SELECT h.tile_id, h.py - o.dy AS py, h.px - o.dx AS px,
                h.n * o.wx AS cx, h.n * o.wy AS cy,
                CASE WHEN o.dy = 0 AND o.dx = 0 THEN 1 ELSE 0 END AS here,
                h.n * CASE WHEN o.dy = 0 AND o.dx = 0 THEN 1 ELSE 0 END
                  AS cn
         FROM hist h CROSS JOIN offs o
         WHERE h.py - o.dy BETWEEN 0 AND {TILE_PX - 1}
           AND h.px - o.dx BETWEEN 0 AND {TILE_PX - 1}),
f AS (SELECT tile_id, py, px,
             CAST(SUM(cn) AS BIGINT) AS n,
             CAST(SUM(cx) AS BIGINT) AS gx,
             CAST(SUM(cy) AS BIGINT) AS gy,
             CAST(SUM(here) AS BIGINT) AS hn
      FROM scat GROUP BY 1, 2, 3)
SELECT tile_id, py, px, n, gx, gy, gx * gx + gy * gy AS g2
FROM f WHERE hn > 0"""


def q_phash_dedup(sf_dir: str):
    """Perceptual-hash (aHash) visual near-dup grouping of the
    rasterized tiles: 16x16 count rasters pool to 8x8 integer cell
    sums, bit = cell mean > tile mean CROSS-MULTIPLIED (no division),
    64-bit hash as two int64 halves, tiles grouped by identical hash
    (stages/multimodal.py:ahash_groups — two tile-bounded bucketed
    shuffles; the imagehash/visual-dedup analog)."""
    from ray.data.aggregate import Sum

    from ..stages.multimodal import ahash_groups

    pts = _geocoded(sf_dir, RES_ZONAL)
    specs = _tile_specs()
    tiled = pts.map_batches(
        lambda b: rz.assign_tiles(
            b, lon0=-180.0, lat0=-90.0, lon1=180.0, lat1=90.0,
            nx=TILE_NX, ny=TILE_NY,
        ),
        batch_format="pyarrow",
    )
    sparse = tiled.map_batches(
        lambda b: rz.partial_histogram(b, tile_specs=specs),
        batch_format="pyarrow",
    )
    hist = sparse.groupby(["tile_id", "py", "px"]).aggregate(
        Sum("n", alias_name="n"))
    return ahash_groups(hist, px_size=TILE_PX, grid=8, n_buckets=8)


def _sql_phash_dedup() -> str:
    return _sql_rasterize_cte() + """,
cellsum AS (SELECT tile_id, (py // 2) * 8 + (px // 2) AS cell,
              CAST(SUM(n) AS BIGINT) AS s
            FROM hist GROUP BY 1, 2),
tot AS (SELECT tile_id, CAST(SUM(n) AS BIGINT) AS t
        FROM hist GROUP BY 1),
bits AS (SELECT c.tile_id, c.cell,
           CASE WHEN c.s * 64 > t.t THEN 1 ELSE 0 END AS b
         FROM cellsum c JOIN tot t USING (tile_id)),
h AS (SELECT tile_id,
        CAST(SUM(CASE WHEN cell >= 32
                 THEN b * (CAST(1 AS BIGINT) << (cell - 32))
                 ELSE 0 END) AS BIGINT) AS hash_hi,
        CAST(SUM(CASE WHEN cell < 32
                 THEN b * (CAST(1 AS BIGINT) << cell)
                 ELSE 0 END) AS BIGINT) AS hash_lo
      FROM bits GROUP BY 1),
g AS (SELECT hash_hi, hash_lo, MIN(tile_id) AS rep_tile,
        CAST(COUNT(*) AS BIGINT) AS n_same
      FROM h GROUP BY 1, 2)
SELECT h.tile_id, h.hash_hi, h.hash_lo, g.rep_tile, g.n_same
FROM h JOIN g USING (hash_hi, hash_lo)"""


def q_hist_eq(sf_dir: str):
    """Global histogram equalization of the count raster (the classic
    contrast remap): integer OpenCV formula
    (cdf - cdf_min)*255 // (N - cdf_min) over the DISTINCT-value
    histogram, remap broadcast — pixels never shuffle
    (stages/rasterize.py:histogram_equalize)."""
    from ..stages.rasterize import histogram_equalize

    return histogram_equalize(q_rasterize(sf_dir), value_col="n")


def _sql_hist_eq() -> str:
    return _sql_rasterize_cte() + f""",
vh AS (SELECT n AS v, CAST(COUNT(*) AS BIGINT) AS c
       FROM hist GROUP BY n),
cd AS (SELECT v, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS cdf
       FROM vh),
st AS (SELECT CAST(MIN(cdf) AS BIGINT) AS cmin,
              CAST(MAX(cdf) AS BIGINT) AS total FROM cd)
SELECT h.tile_id, h.py, h.px, h.n,
       CASE WHEN st.total - st.cmin > 0 THEN
         (cd.cdf - st.cmin) * 255 // (st.total - st.cmin)
       ELSE 0 END AS eq
FROM hist h JOIN cd ON cd.v = h.n CROSS JOIN st"""


def q_ndi(sf_dir: str):
    """Band math (the xarray (b1-b2)/(b1+b2) map-algebra staple):
    normalized difference between the en and de occupancy bands
    rasterized in ONE pass — integer conditional counts per pixel,
    one float division (stages/rasterize.py:band_normalized_diff)."""
    from ..stages.rasterize import band_normalized_diff

    pts = _geocoded(sf_dir, RES_ZONAL, keep_extra=["lang"])
    tiled = pts.map_batches(
        lambda b: rz.assign_tiles(
            b, lon0=-180.0, lat0=-90.0, lon1=180.0, lat1=90.0,
            nx=TILE_NX, ny=TILE_NY,
        ),
        batch_format="pyarrow",
    )
    return band_normalized_diff(tiled, _tile_specs(), band_col="lang",
                                band_a="en", band_b="de")


def _sql_ndi() -> str:
    tw = 360.0 / TILE_NX
    th = 180.0 / TILE_NY
    ix = (f"LEAST(GREATEST(CAST(FLOOR((lon - -180.0) / 360.0 "
          f"* {TILE_NX}) AS BIGINT), 0), {TILE_NX - 1})")
    iy = (f"LEAST(GREATEST(CAST(FLOOR((lat - -90.0) / 180.0 "
          f"* {TILE_NY}) AS BIGINT), 0), {TILE_NY - 1})")
    px = (f"CAST(FLOOR((lon - (-180.0 + ix * {tw!r})) / {tw!r} "
          f"* {TILE_PX}) AS BIGINT)")
    gy = (f"CAST(FLOOR((lat - (-90.0 + iy * {th!r})) / {th!r} "
          f"* {TILE_PX}) AS BIGINT)")
    return f"""
{_sql_geo_cte(RES_ZONAL, ', lang')},
tiled AS (SELECT lon, lat, lang, {ix} AS ix, {iy} AS iy FROM geo
          WHERE lang IN ('en', 'de')),
binned AS (
  SELECT iy * {TILE_NX} + ix AS tile_id,
         {TILE_PX} - 1 - {gy} AS py,
         {px} AS px,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS ia,
         CASE WHEN lang = 'de' THEN 1 ELSE 0 END AS ib
  FROM tiled
),
agg AS (SELECT tile_id, py, px, CAST(SUM(ia) AS BIGINT) AS a,
               CAST(SUM(ib) AS BIGINT) AS b
        FROM binned GROUP BY 1, 2, 3)
SELECT tile_id, py, px, a, b,
       CAST(a - b AS DOUBLE) / CAST(a + b AS DOUBLE) AS ndi
FROM agg"""


def _sql_raster_stats() -> str:
    """Mirror of moment_rasters: same tile/bin arithmetic as the
    rasterize oracle, weight = n_chars; mean/ex2 are single DOUBLE
    divisions of exact BIGINT sums, var/std derive from them with the
    identical operation order the engine's finalize_moments uses."""
    tw = 360.0 / TILE_NX
    th = 180.0 / TILE_NY
    ix = f"LEAST(GREATEST(CAST(FLOOR((lon - -180.0) / 360.0 * {TILE_NX}) AS BIGINT), 0), {TILE_NX - 1})"
    iy = f"LEAST(GREATEST(CAST(FLOOR((lat - -90.0) / 180.0 * {TILE_NY}) AS BIGINT), 0), {TILE_NY - 1})"
    px = f"CAST(FLOOR((lon - (-180.0 + ix * {tw!r})) / {tw!r} * {TILE_PX}) AS BIGINT)"
    gy = f"CAST(FLOOR((lat - (-90.0 + iy * {th!r})) / {th!r} * {TILE_PX}) AS BIGINT)"
    return f"""
{_sql_geo_cte(RES_ZONAL, ', n_chars')},
tiled AS (SELECT lon, lat, n_chars, {ix} AS ix, {iy} AS iy FROM geo),
binned AS (
  SELECT iy * {TILE_NX} + ix AS tile_id,
         {TILE_PX} - 1 - {gy} AS py,
         {px} AS px,
         n_chars AS w
  FROM tiled
),
mom AS (
  SELECT tile_id, py, px, COUNT(*) AS n,
         CAST(SUM(w) AS BIGINT) AS s, CAST(SUM(w * w) AS BIGINT) AS ss
  FROM binned GROUP BY 1, 2, 3
),
m2 AS (
  SELECT tile_id, py, px, n,
         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
         CAST(ss AS DOUBLE) / CAST(n AS DOUBLE) AS ex2
  FROM mom
)
SELECT tile_id, py, px, n, mean,
       ex2 - mean * mean AS var,
       SQRT(ex2 - mean * mean) AS std
FROM m2
"""


def _sql_r2v() -> str:
    tw = 360.0 / TILE_NX
    th = 180.0 / TILE_NY
    # mirror raster_to_points: center = xmin + (px+0.5)*pw, lat from ymax
    return _sql_rasterize_cte() + f"""
SELECT tile_id,
       (-180.0 + (tile_id % {TILE_NX}) * {tw!r}) + (px + 0.5) * ({tw!r} / {TILE_PX}) AS lon,
       (-90.0 + ((tile_id // {TILE_NX}) + 1) * {th!r}) - (py + 0.5) * ({th!r} / {TILE_PX}) AS lat,
       CAST(n AS DOUBLE) AS value
FROM hist
"""


def _sql_shards() -> str:
    """Deterministic shard/pos permutation — same bijective multiply-add
    hash as stages/partition.py shuffle_to_shards, in HUGEINT."""
    from ..stages.partition import SHARD_A, SHARD_B

    return (
        f"WITH h AS (SELECT doc_id, (doc_id::HUGEINT * {SHARD_A} + "
        f"{SHARD_B}) % {_SQL_M} AS h FROM documents) "
        f"SELECT doc_id, CAST(h % {N_SHARDS} AS BIGINT) AS shard, "
        f"CAST(ROW_NUMBER() OVER (PARTITION BY h % {N_SHARDS} ORDER BY h) "
        "- 1 AS BIGINT) AS pos FROM h"
    )


def _sql_pcont() -> str:
    """Explicit order-stat interpolation (NOT quantile_cont — the
    builtin's internal arithmetic is opaque; this mirrors the engine's
    ``lo + (hi - lo) * (p - floor(p))`` operation-for-operation)."""
    stat_frags, out_frags = [], []
    for q in PCONT_QS:
        lab = f"p{int(round(q * 100))}"
        # ::DOUBLE — a bare 0.9 literal is DECIMAL in DuckDB and the
        # decimal arithmetic would diverge from the engine's float64
        p = f"{q!r}::DOUBLE*(n-1)"
        stat_frags.append(
            f"MAX(CASE WHEN rk = CAST(FLOOR({p}) AS BIGINT) THEN v END) "
            f"AS lo_{lab}, "
            f"MAX(CASE WHEN rk = least(CAST(FLOOR({p}) AS BIGINT) + 1, "
            f"n - 1) THEN v END) AS hi_{lab}"
        )
        out_frags.append(
            f"CAST(lo_{lab} AS DOUBLE) + (CAST(hi_{lab} AS DOUBLE) - "
            f"CAST(lo_{lab} AS DOUBLE)) * ({p} - FLOOR({p})) AS {lab}"
        )
    return (
        "WITH c AS (SELECT o_orderpriority AS k, "
        "CAST(ROUND(o_totalprice * 100.0) AS BIGINT) AS v FROM orders), "
        "r AS (SELECT k, v, ROW_NUMBER() OVER (PARTITION BY k ORDER BY v)"
        " - 1 AS rk, COUNT(*) OVER (PARTITION BY k) AS n FROM c), "
        "s AS (SELECT k, MAX(n) AS n, " + ", ".join(stat_frags)
        + " FROM r GROUP BY k) SELECT k AS o_orderpriority, "
        + ", ".join(out_frags) + " FROM s"
    )


def _sql_quota() -> str:
    """Per-source ROW_NUMBER cap under the same bijective hash order as
    stages/partition.py quota_per_key, in HUGEINT."""
    from ..stages.partition import SHARD_A, SHARD_B

    return (
        f"WITH h AS (SELECT doc_id, source, (doc_id::HUGEINT * {SHARD_A} "
        f"+ {SHARD_B}) % {_SQL_M} AS h FROM documents), "
        "r AS (SELECT doc_id, source, ROW_NUMBER() OVER ("
        "PARTITION BY source ORDER BY h) AS rn FROM h) "
        f"SELECT doc_id, source FROM r WHERE rn <= {QUOTA_N}"
    )


# --- event-sequence analytics + keyed analytic windows -------------------

FUNNEL_WITHIN_US = 3_600_000_000   # view -> purchase within 1 hour
GAPFILL_UNIT_US = 3_600_000_000    # hourly densified buckets
MAD_K = 1   # synthetic prices are uniform: MAD ~ quarter-range, so k=1
            # flags the distribution tails (k=3 would flag nothing)
NTH_N = 3


def q_transitions(sf_dir: str):
    """Markov transition matrix of event types: successor per user in
    unique event_id order, global (type, next_type) counts — partial
    counts per coarse bucket (bounded by #types^2), one micro-task
    final reduce (stages/sequence.py:transition_counts)."""
    from ..stages.sequence import transition_counts

    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type"])
    return transition_counts(ev, key_col="user_id", order_col="event_id",
                             type_col="event_type")


def q_funnel(sf_dir: str):
    """Funnel conversion: per user, how many 'view' events are followed
    by a 'purchase' strictly after and within 1 h (EXISTS semantics) —
    one lexsort + reverse running-min across each bucket, no per-key
    slicing, no pair join (stages/sequence.py:funnel_conversion)."""
    from ..stages.sequence import funnel_conversion

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            "ts_us": b.column("ts").cast(pa.int64()),
            "event_type": b.column("event_type"),
        })

    return funnel_conversion(
        ev.map_batches(prep, batch_format="pyarrow"),
        key_col="user_id", ts_col="ts_us", type_col="event_type",
        from_type="view", to_type="purchase", within_us=FUNNEL_WITHIN_US)


def q_run_distinct(sf_dir: str):
    """Running COUNT(DISTINCT event_type) per user in event order —
    vectorized first-occurrence flags + per-key cumsum, one bucket
    shuffle (stages/sequence.py:cumulative_distinct)."""
    from ..stages.sequence import cumulative_distinct

    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type"])
    return cumulative_distinct(ev, key_col="user_id", order_col="event_id",
                               type_col="event_type")


def q_gapfill(sf_dir: str):
    """Densified hourly per-user event counts: every hour between each
    user's first and last event appears, zero filled — per-key spans
    from one groupby min/max, the dense axis is a single arange +
    scatter (stages/sequence.py:gapfill_counts)."""
    from ..stages.sequence import gapfill_counts

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            "ts_us": b.column("ts").cast(pa.int64()),
        })

    return gapfill_counts(ev.map_batches(prep, batch_format="pyarrow"),
                          key_col="user_id", ts_col="ts_us",
                          unit_us=GAPFILL_UNIT_US)


def _orders_cents_cols(sf_dir: str, extra: str):
    orders = _read(sf_dir, "orders", ["o_orderkey", extra, "o_totalprice"])

    def cents(b: pa.Table) -> pa.Table:
        c = np.rint(
            b.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({
            "o_orderkey": b.column("o_orderkey"),
            extra: b.column(extra),
            "cents": pa.array(c, pa.int64()),
        })

    return orders.map_batches(cents, batch_format="pyarrow")


def q_share(sf_dir: str):
    """Ratio-to-report: each order's share of its customer's total —
    cents / SUM(cents) OVER (PARTITION BY custkey); one IEEE division
    of two exact int64s per row (stages/analytic.py:share_of_key)."""
    from ..stages.analytic import share_of_key

    return share_of_key(_orders_cents_cols(sf_dir, "o_custkey"),
                        key_col="o_custkey", value_col="cents")


def q_firstlast(sf_dir: str):
    """FIRST_VALUE / LAST_VALUE / NTH_VALUE(3) per customer in orderkey
    order, one row per key — segmented boundary reads off one sorted
    pass (stages/analytic.py:first_last_nth)."""
    from ..stages.analytic import first_last_nth

    return first_last_nth(_orders_cents_cols(sf_dir, "o_custkey"),
                          key_col="o_custkey", order_col="o_orderkey",
                          value_col="cents", nth=NTH_N)


def q_mad_outliers(sf_dir: str):
    """Robust per-priority price outliers: |x - median| > k * MAD with
    both medians EXACT (combiner-first grouped_median; deviations in
    doubled units so they stay integers)
    (stages/analytic.py:mad_outliers)."""
    from ..stages.analytic import mad_outliers

    return mad_outliers(_orders_cents_cols(sf_dir, "o_orderpriority"),
                        key_cols=["o_orderpriority"], value_col="cents",
                        uid_col="o_orderkey", k=MAD_K)


def q_cube(sf_dir: str):
    """GROUP BY CUBE(returnflag, linestatus): one distributed fine
    aggregate; all four grouping sets derive in a single micro-task
    (stages/analytic.py:cube2)."""
    from ..stages.analytic import cube2

    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity"])
    return cube2(li, dim1="l_returnflag", dim2="l_linestatus",
                 value_col="l_quantity")


# --- corpus prep: chunking, inverted index, skip-grams; full outer join ---

CHUNK_SIZE = 8        # tokens per training chunk
CHUNK_OVERLAP = 4     # stride = size - overlap
SKIP_WINDOW = 2       # skip-gram context distance
OUTER_VALUE_MIN = 90.0  # rare-event threshold -> genuinely disjoint users


def q_chunks(sf_dir: str):
    """Overlapping token-window chunking (size 8, overlap 4): the
    doc→training-sample splitter; pure map_batches, chunk texts built by
    one vectorized ListArray binary_join
    (stages/corpus.py:chunk_documents)."""
    from ..stages.corpus import chunk_documents

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return chunk_documents(docs, size=CHUNK_SIZE, overlap=CHUNK_OVERLAP)


UNIGRAM_V = 24  # LM vocabulary cap (corpus has 31 distinct tokens)


def q_unigram_lm(sf_dir: str):
    """CCNet-style perplexity-filter analog: train a unigram LM (corpus
    token counts capped to the top-24 vocabulary, ties count desc then
    token asc), broadcast it once, score every doc in one map pass —
    freq_sum / n_oov integer-exact, avg_freq one IEEE division
    (stages/scoring.py:unigram_lm_scores)."""
    from ..stages.scoring import unigram_lm_scores

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return unigram_lm_scores(docs, top_v=UNIGRAM_V)


def _sql_unigram_ctes() -> str:
    """Shared unigram-LM chain; the final CTE ``d`` holds one scored
    row per doc (doc_id, n_tokens, freq_sum, n_oov)."""
    v = UNIGRAM_V
    return f"""tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS w
  FROM documents
),
cnt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY w),
vocab AS (SELECT w, c FROM (
            SELECT w, c, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rn
            FROM cnt)
          WHERE rn <= {v}),
d AS (SELECT t.doc_id,
        CAST(COUNT(*) AS BIGINT) AS n_tokens,
        CAST(SUM(COALESCE(vo.c, 0)) AS BIGINT) AS freq_sum,
        CAST(SUM(CASE WHEN vo.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_oov
      FROM tok t LEFT JOIN vocab vo ON vo.w = t.w
      GROUP BY t.doc_id)"""


def _sql_unigram_lm() -> str:
    return f"""
WITH {_sql_unigram_ctes()}
SELECT doc_id, n_tokens, freq_sum, n_oov,
       CAST(freq_sum AS DOUBLE) / n_tokens AS avg_freq
FROM d"""


NB_V, NB_SCALE = 512, 65536


def q_naive_bayes(sf_dir: str):
    """Multinomial Naive Bayes source classifier as dataflow (the
    fastText-style domain-classifier leg): train on even doc_ids over
    the top-512 train vocabulary, classify odd docs with exact
    quantized-ln integer scores (smallest-label argmax ties), return
    the confusion matrix
    (stages/scoring.py:naive_bayes_confusion)."""
    from ..stages.scoring import naive_bayes_confusion

    docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    return naive_bayes_confusion(docs, top_v=NB_V, scale=NB_SCALE)


def _sql_naive_bayes() -> str:
    v, sc = NB_V, NB_SCALE
    return rf"""
WITH tok_tr AS (SELECT doc_id, source,
                       unnest(regexp_extract_all(text, '\S+')) AS w
                FROM documents WHERE doc_id % 2 = 0),
cnt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok_tr GROUP BY w),
vocab AS MATERIALIZED (SELECT w FROM (
          SELECT w, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rn
          FROM cnt) WHERE rn <= {v}),
vv AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
cwc AS MATERIALIZED (
  SELECT t.source AS c, t.w, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM tok_tr t JOIN vocab USING (w) GROUP BY 1, 2),
tokc AS (SELECT c, CAST(SUM(cnt) AS BIGINT) AS tok FROM cwc GROUP BY 1),
classes AS (SELECT DISTINCT source AS c FROM documents
            WHERE doc_id % 2 = 0),
nd AS (SELECT source AS c, CAST(COUNT(*) AS BIGINT) AS ndocs
       FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
ndt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents
        WHERE doc_id % 2 = 0),
prior AS (SELECT nd.c,
                 CAST(FLOOR((ln(nd.ndocs) - ln(ndt.n)) * {sc}.0)
                      AS BIGINT) AS q
          FROM nd CROSS JOIN ndt),
dt AS MATERIALIZED (
  SELECT t.doc_id, t.w, CAST(COUNT(*) AS BIGINT) AS m
  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w
        FROM documents WHERE doc_id % 2 = 1) t
  JOIN vocab USING (w) GROUP BY 1, 2),
lk AS (SELECT dt.doc_id, cl.c,
              CAST(SUM(dt.m * CAST(FLOOR((ln(COALESCE(cwc.cnt, 0) + 1)
                   - ln(tokc.tok + vv.v)) * {sc}.0) AS BIGINT))
                   AS BIGINT) AS s
       FROM dt CROSS JOIN classes cl
       LEFT JOIN cwc ON cwc.c = cl.c AND cwc.w = dt.w
       JOIN tokc ON tokc.c = cl.c
       CROSS JOIN vv
       GROUP BY 1, 2),
scv AS (SELECT l.doc_id, l.c, l.s + p.q AS score
        FROM lk l JOIN prior p ON p.c = l.c),
pred AS (SELECT doc_id, c AS pred_source FROM (
  SELECT doc_id, c, ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, c) AS rn
  FROM scv) WHERE rn = 1)
SELECT d.source AS true_source, pr.pred_source,
       CAST(COUNT(*) AS BIGINT) AS n
FROM pred pr JOIN documents d USING (doc_id)
GROUP BY 1, 2"""


PPL_SCALE = 1024


def q_ppl_buckets(sf_dir: str):
    """CCNet head/middle/tail gate (Wenzek et al. 2020): unigram-LM
    scores quantized to the exact integer s = (freq_sum * 1024) //
    n_tokens, then per-LANGUAGE thirds by exact rank (RANK ties share
    a bucket; 0 = tail, 2 = head) — the oracle-checkable form of the
    sampled-threshold perplexity gate
    (stages/scoring.py:ccnet_buckets)."""
    from ..stages.scoring import ccnet_buckets

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    return ccnet_buckets(docs, top_v=UNIGRAM_V, scale=PPL_SCALE)


def _sql_ppl_buckets() -> str:
    return f"""
WITH {_sql_unigram_ctes()},
s AS (SELECT d.doc_id, doc.lang,
             (d.freq_sum * {PPL_SCALE}) // d.n_tokens AS s
      FROM d JOIN documents doc ON doc.doc_id = d.doc_id),
r AS (SELECT doc_id, lang, s,
             RANK() OVER (PARTITION BY lang ORDER BY s) AS rnk,
             CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS nl
      FROM s)
SELECT doc_id, lang, s,
       CAST((3 * (rnk - 1)) // nl AS BIGINT) AS bucket
FROM r"""


TILE_K = 8


def q_tiling(sf_dir: str):
    """TextTiling-style topic-boundary detection (Hearst 1997, exact
    integers): fixed 8-token blocks, adjacent-block DISTINCT-shared-
    token overlap, boundaries = strict interior local minima — pure
    stateless map, nothing shuffles
    (stages/corpus.py:text_tiling_boundaries)."""
    from ..stages.corpus import text_tiling_boundaries

    docs = _read(sf_dir, "documents", ["doc_id", "text"],
                 rows_per_block=1000)
    return text_tiling_boundaries(docs, block_tokens=TILE_K)


def _sql_tiling() -> str:
    k = TILE_K
    return rf"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w,
         unnest(range(1, len(regexp_extract_all(text, '\S+')) + 1))
           AS pos
  FROM documents),
bt AS (SELECT DISTINCT doc_id, (pos - 1) // {k} AS b, w FROM tok),
ov AS (SELECT a.doc_id, a.b AS g, CAST(COUNT(*) AS BIGINT) AS ov
       FROM bt a JOIN bt x ON x.doc_id = a.doc_id AND x.b = a.b + 1
                          AND x.w = a.w
       GROUP BY 1, 2),
nb AS (SELECT doc_id, CAST((COUNT(*) + {k - 1}) // {k} AS BIGINT)
              AS nblk
       FROM tok GROUP BY doc_id),
gaps AS (SELECT nb.doc_id, CAST(g.g AS BIGINT) AS g
         FROM nb, LATERAL (SELECT unnest(range(nb.nblk - 1)) AS g) g),
j AS (SELECT gaps.doc_id, gaps.g, COALESCE(ov.ov, 0) AS ov
      FROM gaps LEFT JOIN ov ON ov.doc_id = gaps.doc_id
                            AND ov.g = gaps.g),
w2 AS (SELECT doc_id, g, ov,
  LAG(ov) OVER (PARTITION BY doc_id ORDER BY g) AS po,
  LEAD(ov) OVER (PARTITION BY doc_id ORDER BY g) AS no
  FROM j)
SELECT doc_id, g AS gap, ov AS overlap FROM w2
WHERE po IS NOT NULL AND no IS NOT NULL AND ov < po AND ov < no"""


BPE_ROUNDS = 3


def q_bpe_train(sf_dir: str):
    """BPE tokenizer TRAINING (3 learned merges): distributed word
    counting, then merge rounds over the bounded vocabulary — top pair
    by (count desc, pair asc), left-to-right non-overlapping merge via
    double-space-joined sequences so DuckDB replace() mirrors it
    exactly (stages/corpus.py:bpe_learn)."""
    from ..stages.corpus import bpe_learn

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return bpe_learn(docs, rounds=BPE_ROUNDS)


def _sql_bpe_train() -> str:
    ctes = ["""tok AS (
  SELECT unnest(regexp_extract_all(text, '\\S+')) AS w FROM documents
),
w0 AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c,
         array_to_string(list_transform(range(1, length(w) + 1),
             i -> substr(w, CAST(i AS INTEGER), 1)), '  ') AS seq
       FROM tok GROUP BY w)"""]
    for r in range(1, BPE_ROUNDS + 1):
        ctes.append(f"""p{r} AS (
  SELECT pr AS pair, CAST(SUM(c) AS BIGINT) AS n FROM (
    SELECT c, unnest(list_transform(range(1, len(syms)),
        i -> syms[CAST(i AS INTEGER)] || ' '
             || syms[CAST(i + 1 AS INTEGER)])) AS pr
    FROM (SELECT c, string_split(seq, '  ') AS syms FROM w{r - 1}))
  GROUP BY pr),
t{r} AS (SELECT pair, n FROM p{r} ORDER BY n DESC, pair LIMIT 1),
w{r} AS (SELECT w, c,
    trim(replace(' ' || seq || ' ',
         ' ' || replace((SELECT pair FROM t{r}), ' ', '  ') || ' ',
         ' ' || replace((SELECT pair FROM t{r}), ' ', '') || ' '))
      AS seq
  FROM w{r - 1})""")
    finals = "\nUNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS step, "
        f"split_part(pair, ' ', 1) AS lhs, "
        f"split_part(pair, ' ', 2) AS rhs, n FROM t{r}"
        for r in range(1, BPE_ROUNDS + 1))
    return "WITH " + ",\n".join(ctes) + "\n" + finals


def q_bpe_encode(sf_dir: str):
    """Tokenizer APPLICATION: per-doc token counts under the 3-merge
    trained BPE — the sizing pass before sharding; the word→symbol-count
    model broadcasts once, scoring is one stateless map
    (stages/corpus.py:bpe_token_counts)."""
    from ..stages.corpus import bpe_token_counts

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return bpe_token_counts(docs, rounds=BPE_ROUNDS)


def _sql_bpe_encode() -> str:
    ctes = _sql_bpe_train().split("\nSELECT CAST(1", 1)[0]
    return (ctes + f""",
nt AS (SELECT w, CAST(len(string_split(seq, '  ')) AS BIGINT) AS ns
       FROM w{BPE_ROUNDS}),
tok2 AS (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS w
         FROM documents)
SELECT t.doc_id, CAST(SUM(n.ns) AS BIGINT) AS n_bpe_tokens
FROM tok2 t JOIN nt n ON n.w = t.w GROUP BY t.doc_id""")


BM25_TERMS = ["join", "window", "fast"]
BM25_K = 20


def q_bm25(sf_dir: str):
    """BM25 top-20 lexical retrieval for a fixed query (k1=1.25,
    b=0.75 — exactly-representable doubles; log-free idf ratio so no
    libm divergence): combiner-first corpus stats, broadcast constants,
    one scoring map with local top-k pruning and a single-block finale
    (stages/tfidf.py:bm25_topk).  Score floats are value-checked by the
    oracle — the whole scorer is bit-parity-disciplined."""
    from ..stages.tfidf import bm25_topk

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return bm25_topk(docs, BM25_TERMS, k=BM25_K)


def _sql_bm25_ctes(prefix: str, terms: list[str], k: int) -> str:
    """The bm25 chained CTEs with a name prefix so two rankings can
    coexist in one statement (RRF oracle); the final CTE is
    ``{prefix}top (doc_id, score)`` — top-k by (score DESC, doc_id)."""
    in_list = ", ".join(f"'{t}'" for t in terms)
    avgdl = "(CAST(s.sdl AS DOUBLE) / CAST(s.n AS DOUBLE))"
    contrib = (
        "(((s.n - f.df) + 0.5) / (f.df + 0.5)) * "
        "((CAST(t.tf AS DOUBLE) * (1.25 + 1.0)) / "
        "(CAST(t.tf AS DOUBLE) + 1.25 * ((1.0 - 0.75) + "
        f"0.75 * (CAST(d.dl AS DOUBLE) / {avgdl}))))"
    )
    pivots = ",\n        ".join(
        f"COALESCE(MAX(CASE WHEN w = '{t}' THEN contrib END), 0.0) AS c{j}"
        for j, t in enumerate(terms))
    add = "c0"
    for j in range(1, len(terms)):
        add = f"({add} + c{j})"
    q = prefix
    return f"""{q}tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS w
  FROM documents
),
{q}dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM {q}tok
       GROUP BY doc_id),
{q}stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(dl) AS BIGINT) AS sdl FROM {q}dl),
{q}tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf FROM {q}tok
       WHERE w IN ({in_list}) GROUP BY doc_id, w),
{q}df AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM {q}tf GROUP BY w),
{q}c AS (SELECT t.doc_id, t.w, {contrib} AS contrib
      FROM {q}tf t JOIN {q}df f ON f.w = t.w
      JOIN {q}dl d ON d.doc_id = t.doc_id CROSS JOIN {q}stats s),
{q}p AS (SELECT doc_id,
        {pivots}
      FROM {q}c GROUP BY doc_id),
{q}top AS (SELECT doc_id, {add} AS score FROM {q}p
           ORDER BY score DESC, doc_id LIMIT {k})"""


def _sql_bm25() -> str:
    return (f"WITH {_sql_bm25_ctes('', BM25_TERMS, BM25_K)}\n"
            "SELECT doc_id, score FROM top")


BM25_TERMS_B = ["sort", "hash", "merge"]
RRF_C, RRF_TOP = 60, 25


def q_rrf(sf_dir: str):
    """Reciprocal-rank fusion of two BM25 rankings (the hybrid-retrieval
    combiner): rank r by (score DESC, doc_id) within each top-k list,
    fused = 1/(60+r_a) + 1/(60+r_b) with missing entries 0.0 — fixed
    addition order, so the DOUBLE value-checks
    (stages/tfidf.py:rrf_fuse)."""
    from ..stages.tfidf import bm25_topk, rrf_fuse

    docs = _read(sf_dir, "documents", ["doc_id", "text"],
                 rows_per_block=1000)
    a = bm25_topk(docs, BM25_TERMS, k=BM25_K)
    b = bm25_topk(docs, BM25_TERMS_B, k=BM25_K)
    return rrf_fuse([a, b], rrf_k=RRF_C, top_k=RRF_TOP)


def _sql_rrf() -> str:
    return f"""
WITH {_sql_bm25_ctes('a_', BM25_TERMS, BM25_K)},
{_sql_bm25_ctes('b_', BM25_TERMS_B, BM25_K)},
ra AS (SELECT doc_id,
              ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
       FROM a_top),
rb AS (SELECT doc_id,
              ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
       FROM b_top),
u AS (SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id,
             COALESCE(1.0 / ({RRF_C} + ra.r), 0.0)
             + COALESCE(1.0 / ({RRF_C} + rb.r), 0.0) AS rrf
      FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id)
SELECT doc_id, rrf FROM u ORDER BY rrf DESC, doc_id LIMIT {RRF_TOP}"""


def q_ir_eval(sf_dir: str):
    """Offline retrieval-quality metrics for the two BM25 rankings:
    precision@k / recall@k / reciprocal rank per query, with relevance
    = the boolean-AND rule (doc contains EVERY query term).  One
    corpus pass evaluates all queries; metric doubles come from single
    int/int divisions so they value-check (stages/tfidf.py:ir_eval)."""
    from ..stages.tfidf import ir_eval

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return ir_eval(docs, [BM25_TERMS, BM25_TERMS_B], k=BM25_K)


def _sql_ir_eval() -> str:
    ctes, selects = [], []
    for qi, terms in enumerate([BM25_TERMS, BM25_TERMS_B]):
        q = f"e{qi}_"
        in_list = ", ".join(f"'{t}'" for t in terms)
        ctes.append(_sql_bm25_ctes(q, terms, BM25_K))
        ctes.append(f"""{q}rel AS (
  SELECT doc_id FROM {q}tok WHERE w IN ({in_list})
  GROUP BY doc_id HAVING COUNT(DISTINCT w) = {len(terms)}),
{q}rank AS (SELECT doc_id,
              ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
            FROM {q}top),
{q}h AS (SELECT r FROM {q}rank JOIN {q}rel USING (doc_id)),
{q}m AS (SELECT
   (SELECT CAST(COUNT(*) AS BIGINT) FROM {q}rel) AS n_rel,
   (SELECT CAST(COUNT(*) AS BIGINT) FROM {q}rank) AS n_ret,
   (SELECT CAST(COUNT(*) AS BIGINT) FROM {q}h) AS hits,
   (SELECT MIN(r) FROM {q}h) AS fr)""")
        selects.append(f"""SELECT {qi} AS query_id, n_rel, n_ret, hits,
  CASE WHEN n_ret = 0 THEN 0.0
       ELSE CAST(hits AS DOUBLE) / CAST(n_ret AS DOUBLE) END
    AS "precision",
  CASE WHEN n_rel = 0 THEN 0.0
       ELSE CAST(hits AS DOUBLE) / CAST(n_rel AS DOUBLE) END
    AS "recall",
  CASE WHEN fr IS NULL THEN 0.0
       ELSE 1.0 / CAST(fr AS DOUBLE) END AS rr
FROM {q}m""")
    return ("WITH " + ",\n".join(ctes) + "\n"
            + "\nUNION ALL\n".join(selects))


NDCG_K = 10


def q_ndcg(sf_dir: str):
    """nDCG@10 with GRADED relevance (distinct-query-terms-contained,
    0..3) for both BM25 rankings — the order-sensitive ranking metric:
    discount constants 1/log2(r+1) precomputed and inlined on BOTH
    sides (libm-free), DCG/IDCG summed in fixed rank order, IDCG from
    one combiner-first per-grade-count corpus pass
    (stages/tfidf.py:ndcg_eval)."""
    from ..stages.tfidf import ndcg_eval

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return ndcg_eval(docs, [BM25_TERMS, BM25_TERMS_B], k=NDCG_K)


def _sql_ndcg() -> str:
    import math

    disc = [1.0 / math.log2(r + 1) for r in range(1, NDCG_K + 1)]
    ctes, selects = [], []
    for qi, terms in enumerate([BM25_TERMS, BM25_TERMS_B]):
        q = f"n{qi}_"
        t_max = len(terms)
        in_list = ", ".join(f"'{t}'" for t in terms)
        ctes.append(_sql_bm25_ctes(q, terms, NDCG_K))
        gc_cols = ", ".join(
            f"(SELECT CAST(COUNT(*) AS BIGINT) FROM {q}g WHERE g = {g})"
            f" AS n{g}" for g in range(t_max, 0, -1))
        ctes.append(f"""{q}g AS (
  SELECT doc_id, CAST(COUNT(DISTINCT w) AS BIGINT) AS g
  FROM {q}tok WHERE w IN ({in_list}) GROUP BY doc_id),
{q}gc AS (SELECT {gc_cols}),
{q}rank AS (SELECT doc_id,
              ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
            FROM {q}top),
{q}rg AS (SELECT r.r, g.g FROM {q}rank r JOIN {q}g g USING (doc_id))""")
        dcg_terms, idcg_terms = [], []
        for r in range(1, NDCG_K + 1):
            dcg_terms.append(
                f"COALESCE((SELECT CAST(g AS DOUBLE) FROM {q}rg "
                f"WHERE r = {r}), 0.0) * {disc[r - 1]!r}")
            cum = " + ".join(f"n{g}" for g in range(t_max, 0, -1))
            cases = []
            acc = []
            for g in range(t_max, 0, -1):
                acc.append(f"n{g}")
                cases.append(
                    f"WHEN {r} <= (SELECT {' + '.join(acc)} FROM {q}gc)"
                    f" THEN {float(g)!r}")
            idcg_terms.append(
                f"(CASE {' '.join(cases)} ELSE 0.0 END) * {disc[r - 1]!r}")
        selects.append(f"""SELECT query_id, n_ret, dcg, idcg,
  CASE WHEN idcg > 0.0 THEN dcg / idcg ELSE 0.0 END AS ndcg
FROM (SELECT {qi} AS query_id,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM {q}top) AS n_ret,
  {' + '.join(dcg_terms)} AS dcg,
  {' + '.join(idcg_terms)} AS idcg)""")
    return ("WITH " + ",\n".join(ctes) + "\n"
            + "\nUNION ALL\n".join(selects))


MMR_K, MMR_POOL, MMR_A, MMR_B = 8, 40, 7, 3


def q_mmr(sf_dir: str):
    """Maximal-marginal-relevance diverse top-k (the RAG/retrieval
    re-ranker): one streaming pass keeps a per-block relevance pool,
    a single-block finale reduces to the global top-40 candidates, and
    the greedy 7*rel - 3*max_sim walk runs on that bounded pool.  All
    arithmetic is int64 (2^20 floor-quantized vectors) so the unrolled
    SQL greedy mirrors it bit-for-bit (stages/ann.py:mmr_topk)."""
    from ..stages.ann import mmr_topk

    qsel = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filters=[("vec_id", "=", 0)])
    qvec = np.asarray(qsel.column("embedding")[0].as_py(), dtype=np.float32)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return mmr_topk(ds, qvec, k=MMR_K, pool=MMR_POOL,
                    a_num=MMR_A, b_num=MMR_B)


def _sql_mmr() -> str:
    off = 1 << 20
    steps = []
    for r in range(2, MMR_K + 1):
        steps.append(f""",
s{r} AS MATERIALIZED (SELECT p.vec_id, p.rel,
           {MMR_A} * p.rel - {MMR_B} * (SELECT MAX(s.s) FROM sim s
               WHERE s.ai = p.vec_id
                 AND s.bi IN (SELECT vec_id FROM sel{r - 1})) AS score
         FROM pool p
         WHERE p.vec_id NOT IN (SELECT vec_id FROM sel{r - 1})
         ORDER BY score DESC, p.vec_id LIMIT 1),
sel{r} AS MATERIALIZED (SELECT vec_id FROM sel{r - 1}
           UNION ALL SELECT vec_id FROM s{r})""")
    union = "\nUNION ALL\n".join(
        f"SELECT {r} AS rank, vec_id, rel, score FROM s{r}"
        for r in range(1, MMR_K + 1))
    return f"""
WITH x AS MATERIALIZED (
  SELECT vec_id, d.d AS d,
         CAST(FLOOR(embedding[d.d + 1] * {off}.0) AS BIGINT) + {off} AS xv
  FROM embeddings, LATERAL (SELECT unnest(range({SCORE_DIM})) AS d) d),
q AS MATERIALIZED (SELECT d, xv AS qv FROM x WHERE vec_id = 0),
rel AS MATERIALIZED (SELECT x.vec_id, CAST(SUM(x.xv * q.qv) AS BIGINT) AS rel
        FROM x JOIN q ON q.d = x.d GROUP BY x.vec_id),
pool AS MATERIALIZED (SELECT vec_id, rel FROM rel
         ORDER BY rel DESC, vec_id LIMIT {MMR_POOL}),
xp AS MATERIALIZED (SELECT x.vec_id, x.d, x.xv
       FROM x JOIN pool p ON p.vec_id = x.vec_id),
sim AS MATERIALIZED (SELECT xa.vec_id AS ai, xb.vec_id AS bi,
               CAST(SUM(xa.xv * xb.xv) AS BIGINT) AS s
        FROM xp xa JOIN xp xb ON xb.d = xa.d AND xb.vec_id <> xa.vec_id
        GROUP BY xa.vec_id, xb.vec_id),
s1 AS MATERIALIZED (SELECT vec_id, rel, {MMR_A} * rel AS score FROM pool
       ORDER BY score DESC, vec_id LIMIT 1),
sel1 AS MATERIALIZED (SELECT vec_id FROM s1){''.join(steps)}
SELECT CAST(rank AS BIGINT) AS rank, vec_id, rel, score
FROM ({union}) ORDER BY rank"""


PARA_SIZE = 4  # dedup-unit block length in tokens (corpus has no \n)


def q_para_dedup(sf_dir: str):
    """Paragraph-level exact dedup (the Dolma-style cleaning step): the
    unit is the 4-token block since the synthetic corpus is single-line;
    corpus-wide each block text keeps its first (doc, idx) occurrence
    and docs rebuild from surviving blocks
    (stages/corpus.py:block_dedup — one text-keyed shuffle, one rebuild
    shuffle, one left join for fully-deduped docs)."""
    from ..stages.corpus import block_dedup

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return block_dedup(docs, size=PARA_SIZE)


def _sql_para_dedup() -> str:
    k = PARA_SIZE
    return f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks FROM documents
),
nn AS (SELECT doc_id, toks, len(toks) AS nt FROM tok),
c AS (SELECT doc_id, toks, nt,
        unnest(range(0, (nt + {k - 1}) // {k})) AS ci
      FROM nn WHERE nt > 0),
b AS (SELECT doc_id, ci,
        array_to_string(toks[ci*{k}+1 : least((ci+1)*{k}, nt)], ' ')
          AS para
      FROM c),
keep AS (SELECT doc_id, ci, para,
           ROW_NUMBER() OVER (PARTITION BY para ORDER BY doc_id, ci)
             AS rn
         FROM b),
r AS (SELECT doc_id, string_agg(para, ' ' ORDER BY ci) AS ct,
             CAST(COUNT(*) AS BIGINT) AS n_kept
      FROM keep WHERE rn = 1 GROUP BY doc_id),
m AS (SELECT doc_id, CAST((nt + {k - 1}) // {k} AS BIGINT) AS n_blocks
      FROM nn)
SELECT m.doc_id, COALESCE(r.ct, '') AS clean_text, m.n_blocks,
       COALESCE(r.n_kept, 0) AS n_kept
FROM m LEFT JOIN r ON r.doc_id = m.doc_id"""


BOIL_MIN_DOCS = 2
BOIL_NUM, BOIL_DEN = 1, 20  # df >= 5% of the source's docs


def q_boilerplate(sf_dir: str):
    """CCNet/Dolma-style per-SOURCE boilerplate removal: 4-token blocks
    occurring in >= 2 docs AND >= 5% of a source's docs (integer
    cross-multiplied threshold) are dropped from EVERY doc of that
    source — the nav-bar/footer/cookie-banner cleaning step that runs
    before corpus-wide dedup (stages/corpus.py:strip_boilerplate — one
    partial-count shuffle, broadcast boilerplate set, corpus never
    shuffles)."""
    from ..stages.corpus import strip_boilerplate

    docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    return strip_boilerplate(docs, size=PARA_SIZE, min_docs=BOIL_MIN_DOCS,
                             frac_num=BOIL_NUM, frac_den=BOIL_DEN)


def _sql_boilerplate() -> str:
    k = PARA_SIZE
    return f"""
WITH tok AS (
  SELECT doc_id, source, regexp_extract_all(text, '\\S+') AS toks
  FROM documents
),
nn AS (SELECT doc_id, source, toks, len(toks) AS nt FROM tok),
c AS (SELECT doc_id, source, toks, nt,
        unnest(range(0, (nt + {k - 1}) // {k})) AS ci
      FROM nn WHERE nt > 0),
b AS (SELECT doc_id, source, ci,
        array_to_string(toks[ci*{k}+1 : least((ci+1)*{k}, nt)], ' ')
          AS para
      FROM c),
tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nd
        FROM documents GROUP BY source),
dfq AS (SELECT source, para,
          CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM b GROUP BY source, para),
boil AS (SELECT dfq.source, dfq.para
         FROM dfq JOIN tot ON tot.source = dfq.source
         WHERE dfq.df >= {BOIL_MIN_DOCS}
           AND dfq.df * {BOIL_DEN} >= {BOIL_NUM} * tot.nd),
keep AS (SELECT b.doc_id, b.ci, b.para FROM b
         WHERE NOT EXISTS (SELECT 1 FROM boil
                           WHERE boil.source = b.source
                             AND boil.para = b.para)),
r AS (SELECT doc_id, string_agg(para, ' ' ORDER BY ci) AS ct,
             CAST(COUNT(*) AS BIGINT) AS n_kept
      FROM keep GROUP BY doc_id),
m AS (SELECT doc_id, CAST((nt + {k - 1}) // {k} AS BIGINT) AS n_blocks
      FROM nn)
SELECT m.doc_id, COALESCE(r.ct, '') AS clean_text, m.n_blocks,
       COALESCE(r.n_kept, 0) AS n_kept
FROM m LEFT JOIN r ON r.doc_id = m.doc_id"""


PHRASES = ("slow hash batch", "part filter scan", "big data merge")


def q_phrase(sf_dir: str):
    """Positional phrase search — the order-sensitive exact-match leg of
    the retrieval family (postings/bm25 are bag-of-words): per (phrase,
    doc) hit counts + 1-based first position, pure map pass with K
    shifted vectorized equality scans per phrase, no shuffle
    (stages/corpus.py:phrase_search)."""
    from ..stages.corpus import phrase_search

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return phrase_search(docs, PHRASES)


def _sql_phrase() -> str:
    parts = []
    for pid, ph in enumerate(PHRASES):
        toks = ph.split()
        k = len(toks)
        lit = "[" + ", ".join(f"'{t}'" for t in toks) + "]"
        parts.append(f"""
SELECT {pid} AS pid, doc_id, i FROM (
  SELECT doc_id, toks, unnest(range(1, nt - {k} + 2)) AS i
  FROM nn WHERE nt >= {k})
WHERE toks[CAST(i AS INT) : CAST(i AS INT) + {k - 1}] = {lit}""")
    u = "\nUNION ALL\n".join(parts)
    return f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks FROM documents
),
nn AS (SELECT doc_id, toks, len(toks) AS nt FROM tok),
hit AS ({u})
SELECT pid, doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
       CAST(MIN(i) AS BIGINT) AS first_pos
FROM hit GROUP BY pid, doc_id"""


BIGRAM_V = 24


def q_bigram_lm(sf_dir: str):
    """Bigram-LM quality scoring — the order-sensitive upgrade of
    unigram_lm (frequent words in garbage order score low here): train
    corpus bigram counts capped to the top-24 bigrams (ties count desc
    then bigram asc), broadcast once, score every doc in one map pass —
    freq_sum / n_oov integer-exact, avg_freq one IEEE division
    (stages/scoring.py:bigram_lm_scores)."""
    from ..stages.scoring import bigram_lm_scores

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return bigram_lm_scores(docs, top_v=BIGRAM_V)


def _sql_bigram_lm() -> str:
    v = BIGRAM_V
    return f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks FROM documents
),
bg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
      i -> toks[CAST(i AS INTEGER)] || ' ' || toks[CAST(i + 1 AS INTEGER)]))
    AS w
  FROM tok
),
cnt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY w),
vocab AS (SELECT w, c FROM (
            SELECT w, c, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rn
            FROM cnt)
          WHERE rn <= {v}),
d AS (SELECT b.doc_id,
        CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        CAST(SUM(COALESCE(vo.c, 0)) AS BIGINT) AS freq_sum,
        CAST(SUM(CASE WHEN vo.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_oov
      FROM bg b LEFT JOIN vocab vo ON vo.w = b.w
      GROUP BY b.doc_id)
SELECT doc_id, n_bigrams, freq_sum, n_oov,
       CAST(freq_sum AS DOUBLE) / n_bigrams AS avg_freq
FROM d"""


DSIR_BUCKETS = 64


def q_dsir(sf_dir: str):
    """DSIR-style importance weights for data selection (Xie et al.
    2023): hashed-unigram features (poly64 token hash mod 64), target
    distribution from the decontam-convention in-domain subset
    (doc_id % 13 == 7), raw from the rest; per raw doc the smoothed
    target/raw feature-count sums and their ratio — integer-exact sums,
    ONE IEEE division (stages/scoring.py:dsir_weights)."""
    from ..stages.scoring import dsir_weights

    docs = _read(sf_dir, "documents", ["doc_id", "text"],
                 rows_per_block=1000)
    return dsir_weights(docs, n_buckets=DSIR_BUCKETS,
                        target_mod=DECON_MOD, target_rem=DECON_REM)


def _sql_dsir() -> str:
    nb, mod, rem = DSIR_BUCKETS, DECON_MOD, DECON_REM
    return f"""WITH {_sql_tokhash_cte()},
tb AS (
  SELECT doc_id, CAST(unnest(ths) % {nb} AS BIGINT) AS bkt FROM th
),
tcnt AS (SELECT bkt, CAST(COUNT(*) AS BIGINT) AS c FROM tb
         WHERE doc_id % {mod} = {rem} GROUP BY bkt),
rcnt AS (SELECT bkt, CAST(COUNT(*) AS BIGINT) AS c FROM tb
         WHERE doc_id % {mod} <> {rem} GROUP BY bkt),
d AS (SELECT t.doc_id,
        CAST(COUNT(*) AS BIGINT) AS n_tokens,
        CAST(SUM(COALESCE(tc.c, 0) + 1) AS BIGINT) AS tf_sum,
        CAST(SUM(COALESCE(rc.c, 0) + 1) AS BIGINT) AS rf_sum
      FROM tb t
      LEFT JOIN tcnt tc ON tc.bkt = t.bkt
      LEFT JOIN rcnt rc ON rc.bkt = t.bkt
      WHERE t.doc_id % {mod} <> {rem}
      GROUP BY t.doc_id)
SELECT doc_id, n_tokens, tf_sum, rf_sum,
       CAST(tf_sum AS DOUBLE) / rf_sum AS ratio
FROM d"""


PACKSPAN_BUDGET = 25_000


def q_pack_spans(sf_dir: str):
    """GPT-style concatenate-and-split packing INDEX: conceptually
    concatenate every doc's tokens in doc_id order and cut chunks of
    exactly 25k tokens; one row per (doc, chunk) incidence with the
    doc-slice and chunk offsets a loader needs to assemble any chunk
    independently.  Two-pass prefix scan (one summary row per block to
    the driver, data rows never shuffle) + vectorized incidence
    expansion (stages/scan.py:pack_span_index)."""
    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"],
                 rows_per_block=100)
    return scan.pack_span_index(docs, "doc_id", "n_chars",
                                budget=PACKSPAN_BUDGET)


def _sql_pack_spans() -> str:
    b = PACKSPAN_BUDGET
    return f"""
WITH c AS (
  SELECT doc_id, n_chars AS n,
         CAST(SUM(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN
           UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - n_chars AS s
  FROM documents
),
x AS (
  SELECT doc_id, n, s,
         unnest(range(s // {b}, (s + n - 1) // {b} + 1)) AS ci
  FROM c WHERE n > 0
)
SELECT doc_id,
       CAST(ci AS BIGINT) AS chunk_id,
       CAST(GREATEST(s, ci * {b}) - s AS BIGINT) AS doc_off,
       CAST(GREATEST(s, ci * {b}) - ci * {b} AS BIGINT) AS chunk_off,
       CAST(LEAST(s + n, (ci + 1) * {b}) - GREATEST(s, ci * {b})
            AS BIGINT) AS n_tok
FROM x"""


CURATE2_BUDGET = 2000


def q_curate2(sf_dir: str):
    """End-to-end curation v2 — the round-4 ops composed into one
    training-data pipeline: exact dedup (first doc_id per text) →
    unigram-LM quality gate (OOV fraction <= 1/4, integer predicate) →
    DSIR selection (tf_sum * 12 >= rf_sum, integer predicate) → global
    doc_id sort → GPT-style pack-span index at a 2000-token budget.
    Survivor texts re-execute lazily per scoring pass (at production
    scale the dedup output checkpoints to parquet via state/lineage —
    here the chain stays streaming); the only driver traffic is the
    bounded LM/DSIR models and the pack scan's per-block summaries."""
    from ..stages import hashjoin
    from ..stages.scoring import dsir_weights, unigram_lm_scores

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    surv = dedup.exact_dedup(docs, order_cols=["doc_id"])
    lm = unigram_lm_scores(surv, top_v=UNIGRAM_V)
    dw = dsir_weights(surv, n_buckets=DSIR_BUCKETS,
                      target_mod=DECON_MOD, target_rem=DECON_REM)

    def q_gate(b: pa.Table) -> pa.Table:
        oov = b.column("n_oov").to_numpy(zero_copy_only=False)
        n = b.column("n_tokens").to_numpy(zero_copy_only=False)
        return b.select(["doc_id", "n_tokens"]).filter(
            pa.array(oov * 4 <= n))

    def d_gate(b: pa.Table) -> pa.Table:
        tf = b.column("tf_sum").to_numpy(zero_copy_only=False)
        rf = b.column("rf_sum").to_numpy(zero_copy_only=False)
        return b.select(["doc_id"]).filter(pa.array(tf * 12 >= rf))

    sel = hashjoin.bucketed_join(
        lm.map_batches(q_gate, batch_format="pyarrow"),
        dw.map_batches(d_gate, batch_format="pyarrow"),
        on=["doc_id"], how="semi", n_buckets=32,
    )
    # sort -> materialize: block-contiguous doc_id ranges with stable
    # boundaries for the two-pass pack scan (bounded: 2 int cols)
    packed_in = sel.sort("doc_id").materialize()
    return scan.pack_span_index(packed_in, "doc_id", "n_tokens",
                                budget=CURATE2_BUDGET)


def _sql_curate2() -> str:
    v, nb = UNIGRAM_V, DSIR_BUCKETS
    mod, rem, b = DECON_MOD, DECON_REM, CURATE2_BUDGET
    tokhash = _sql_tokhash_cte().replace(
        "FROM documents", "FROM d").lstrip().lstrip(",").strip()
    return f"""
WITH surv AS (SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id
              FROM documents GROUP BY text),
d AS (SELECT doc.doc_id, doc.text
      FROM documents doc JOIN surv USING (doc_id)),
tok0 AS (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS w
         FROM d),
cnt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok0 GROUP BY w),
vocab AS (SELECT w, c FROM (
            SELECT w, c, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rn
            FROM cnt)
          WHERE rn <= {v}),
lm AS (SELECT t.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN vo.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_oov
       FROM tok0 t LEFT JOIN vocab vo ON vo.w = t.w
       GROUP BY t.doc_id),
{tokhash},
tb AS (SELECT doc_id, CAST(unnest(ths) % {nb} AS BIGINT) AS bkt FROM th),
tcnt AS (SELECT bkt, CAST(COUNT(*) AS BIGINT) AS c FROM tb
         WHERE doc_id % {mod} = {rem} GROUP BY bkt),
rcnt AS (SELECT bkt, CAST(COUNT(*) AS BIGINT) AS c FROM tb
         WHERE doc_id % {mod} <> {rem} GROUP BY bkt),
dw AS (SELECT t.doc_id,
         CAST(SUM(COALESCE(tc.c, 0) + 1) AS BIGINT) AS tf_sum,
         CAST(SUM(COALESCE(rc.c, 0) + 1) AS BIGINT) AS rf_sum
       FROM tb t
       LEFT JOIN tcnt tc ON tc.bkt = t.bkt
       LEFT JOIN rcnt rc ON rc.bkt = t.bkt
       WHERE t.doc_id % {mod} <> {rem}
       GROUP BY t.doc_id),
sel AS (SELECT l.doc_id, l.n_tokens
        FROM lm l JOIN dw USING (doc_id)
        WHERE l.n_oov * 4 <= l.n_tokens AND dw.tf_sum * 12 >= dw.rf_sum),
c AS (SELECT doc_id, n_tokens AS n,
        CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN
          UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - n_tokens AS s
      FROM sel),
x AS (SELECT doc_id, n, s,
        unnest(range(s // {b}, (s + n - 1) // {b} + 1)) AS ci
      FROM c WHERE n > 0)
SELECT doc_id,
       CAST(ci AS BIGINT) AS chunk_id,
       CAST(GREATEST(s, ci * {b}) - s AS BIGINT) AS doc_off,
       CAST(GREATEST(s, ci * {b}) - ci * {b} AS BIGINT) AS chunk_off,
       CAST(LEAST(s + n, (ci + 1) * {b}) - GREATEST(s, ci * {b})
            AS BIGINT) AS n_tok
FROM x"""


def q_postings(sf_dir: str):
    """Inverted index: per token df / tf / sorted comma-joined doc-id
    postings — per-batch (token, doc, tf) partials then ONE bucketed
    shuffle keyed by token (stages/corpus.py:postings)."""
    from ..stages.corpus import postings

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return postings(docs)


def q_skipgrams(sf_dir: str):
    """Skip-gram co-occurrence counts within distance 2 (word2vec-style
    context matrix): shifted-view pair extraction per batch, combiner
    value_counts, one bucketed sum
    (stages/ngrams.py:skipgram_counts)."""
    from ..stages.ngrams import skipgram_counts

    docs = _read(sf_dir, "documents", ["text"])
    return skipgram_counts(docs, window=SKIP_WINDOW)


def q_outer_join(sf_dir: str):
    """FULL OUTER join of two per-user rare-event counts (high-value
    signups vs high-value errors — genuinely disjoint user sets on both
    sides): combiner-first per-batch counts, bucketed outer hash join,
    COALESCE to 0 (stages/hashjoin.py:bucketed_join how='outer')."""
    import pandas as pd

    from ..stages.bucketed import bucketed_groupby
    from ..stages.hashjoin import bucketed_join

    ev = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def counts(typ: str, out: str):
        def part(b: pa.Table) -> pa.Table:
            m = pc.and_(pc.equal(b.column("event_type"), typ),
                        pc.greater(b.column("value"), OUTER_VALUE_MIN))
            ids = b.column("user_id").filter(m)
            vc = pd.Series(
                ids.to_numpy(zero_copy_only=False)).value_counts(sort=False)
            return pa.table({
                "user_id": pa.array(vc.index.to_numpy(),
                                    b.column("user_id").type),
                out: pa.array(vc.to_numpy().astype(np.int64), pa.int64()),
            })

        def total(g: pd.DataFrame) -> pd.DataFrame:
            agg = g.groupby("user_id", sort=False, as_index=False)[out].sum()
            agg[out] = agg[out].astype(np.int64)
            return agg

        return bucketed_groupby(ev.map_batches(part, batch_format="pyarrow"),
                                ["user_id"], total)

    joined = bucketed_join(counts("signup", "n_signup"),
                           counts("error", "n_error"),
                           ["user_id"], how="outer")

    def fin(b: pa.Table) -> pa.Table:
        def z(name):
            col = b.column(name)
            return pc.cast(pc.coalesce(col, pa.scalar(0.0)), pa.int64())
        return pa.table({"user_id": b.column("user_id"),
                         "n_signup": z("n_signup"), "n_error": z("n_error")})

    return joined.map_batches(fin, batch_format="pyarrow")


TEMP_ALPHA = 0.5          # sqrt flattening — IEEE sqrt is exact both sides
WBERN_DENOM_LOG2 = 10     # p = min(n_chars, 1024) / 1024


def q_temp_sample(sf_dir: str):
    """Temperature-based mixture sampling (alpha=0.5): source s keeps
    max(1, floor(sqrt(n_s))) docs, chosen by the deterministic
    (knuth_hash, id) rank — tiny count aggregate broadcast, local
    pre-prune, one bucketed shuffle of at most m rows per (key, batch)
    (stages/partition.py:temperature_sample)."""
    from ..stages.partition import temperature_sample

    docs = _read(sf_dir, "documents", ["doc_id", "source"])
    return temperature_sample(docs, "source", "doc_id", alpha=TEMP_ALPHA)


def q_wsample(sf_dir: str):
    """Size-weighted Bernoulli sampling: doc survives iff
    hash32(doc_id) * 1024 < min(n_chars, 1024) * 2^32 — an EXACT integer
    predicate (no float, no RNG state), pure map_batches filter
    (stages/partition.py:weighted_bernoulli)."""
    from ..stages.partition import weighted_bernoulli

    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    return weighted_bernoulli(docs, "doc_id", "n_chars",
                              denom_log2=WBERN_DENOM_LOG2)


def q_minmax(sf_dir: str):
    """Per-priority min-max feature scaling of order prices:
    (x - min) / (max - min) on exact int cents — combiner-first min/max
    broadcast, rows never shuffle (stages/analytic.py:minmax_scale)."""
    from ..stages.analytic import minmax_scale

    return minmax_scale(_orders_cents_cols(sf_dir, "o_orderpriority"),
                        key_cols=["o_orderpriority"], value_col="cents")


LENBUCKET_TOKENS = 16     # inference-batching bucket width

from ..stages.partition import SPLIT_TRAIN_T, SPLIT_VAL_T  # noqa: E402


def q_zscore(sf_dir: str):
    """Per-type z-score standardization of event values (exact int64
    sum/sumsq partials -> broadcast mean/std; rows never shuffle)
    (stages/analytic.py:zscore)."""
    from ..stages.analytic import zscore

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def cents(b: pa.Table) -> pa.Table:
        c = np.rint(
            b.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({
            "event_id": b.column("event_id"),
            "event_type": b.column("event_type"),
            "cents": pa.array(c, pa.int64()),
        })

    return zscore(ev.map_batches(cents, batch_format="pyarrow"),
                  key_cols=["event_type"], value_col="cents")


def q_split(sf_dir: str):
    """Deterministic 80/10/10 train/val/test assignment by exact integer
    hash thresholds, then per-(lang, split) counts — no RNG state, stable
    under repartitioning (stages/partition.py:assign_split)."""
    from ..stages.partition import assign_split
    from ..stages.zonal import zonal_aggregate

    docs = _read(sf_dir, "documents", ["doc_id", "lang"])
    return zonal_aggregate(assign_split(docs, "doc_id"), ["lang", "split"],
                           {})


def q_len_buckets(sf_dir: str):
    """Inference length-bucketing plan: per 16-token bucket, doc count,
    padded length (max) and total padding waste — combiner-first integer
    aggregates (stages/corpus.py:length_buckets)."""
    from ..stages.corpus import length_buckets

    docs = _read(sf_dir, "documents", ["text"])
    return length_buckets(docs, bucket_tokens=LENBUCKET_TOKENS)


def q_bpe_pairs(sf_dir: str):
    """BPE merge-candidate counting (tokenizer training step 1):
    corpus-wide adjacent-char-pair counts within whitespace-pretokenized
    tokens — contiguous codepoint buffer per batch, packed-key np.unique
    combiner, alphabet²-bounded shuffle
    (stages/corpus.py:char_pair_counts)."""
    from ..stages.corpus import char_pair_counts

    docs = _read(sf_dir, "documents", ["text"])
    return char_pair_counts(docs)


WINSOR_LO, WINSOR_HI = 0.1, 0.9


def q_basket(sf_dir: str):
    """Market-basket pair support: unordered event-type pairs counted by
    the number of users exhibiting both — distinct (user, type)
    self-merge inside coarse buckets, item-domain²-bounded partials,
    micro-task finale (stages/sequence.py:cooccurrence_pairs)."""
    from ..stages.sequence import cooccurrence_pairs

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    return cooccurrence_pairs(ev, key_col="user_id", item_col="event_type")


def q_winsorize(sf_dir: str):
    """Per-priority winsorization of order prices: clip to the group's
    exact interpolated [p10, p90] quantiles (combiner-first quantile
    table broadcast; rows never shuffle)
    (stages/analytic.py:winsorize)."""
    from ..stages.analytic import winsorize

    return winsorize(_orders_cents_cols(sf_dir, "o_orderpriority"),
                     key_cols=["o_orderpriority"], value_col="cents",
                     q_lo=WINSOR_LO, q_hi=WINSOR_HI)


def _sql_winsor() -> str:
    """The _sql_pcont interpolation chain for p10/p90 plus the join-back
    clamp LEAST(GREATEST(x, lo), hi) — mirrors winsorize op-for-op."""
    stat_frags, out_frags = [], []
    for q in (WINSOR_LO, WINSOR_HI):
        lab = f"p{int(round(q * 100))}"
        p = f"{q!r}::DOUBLE*(n-1)"
        stat_frags.append(
            f"MAX(CASE WHEN rk = CAST(FLOOR({p}) AS BIGINT) THEN v END) "
            f"AS lo_{lab}, "
            f"MAX(CASE WHEN rk = least(CAST(FLOOR({p}) AS BIGINT) + 1, "
            f"n - 1) THEN v END) AS hi_{lab}"
        )
        out_frags.append(
            f"CAST(lo_{lab} AS DOUBLE) + (CAST(hi_{lab} AS DOUBLE) - "
            f"CAST(lo_{lab} AS DOUBLE)) * ({p} - FLOOR({p})) AS {lab}"
        )
    return (
        "WITH c AS (SELECT o_orderkey, o_orderpriority AS k, "
        "CAST(ROUND(o_totalprice * 100.0) AS BIGINT) AS v FROM orders), "
        "r AS (SELECT k, v, ROW_NUMBER() OVER (PARTITION BY k ORDER BY v)"
        " - 1 AS rk, COUNT(*) OVER (PARTITION BY k) AS n FROM c), "
        "s AS (SELECT k, MAX(n) AS n, " + ", ".join(stat_frags)
        + " FROM r GROUP BY k), b AS (SELECT k, " + ", ".join(out_frags)
        + " FROM s) "
        "SELECT c.o_orderkey, c.k AS o_orderpriority, c.v AS cents, "
        "LEAST(GREATEST(CAST(c.v AS DOUBLE), b.p10), b.p90) AS w "
        "FROM c JOIN b USING (k)"
    )


import datetime as _dt

Q3_SEGMENT = "BUILDING"
Q3_CUT_US = int(_dt.datetime(1998, 6, 1).timestamp() * 0) + \
    (_dt.date(1998, 6, 1) - _dt.date(1970, 1, 1)).days * 86_400_000_000
Q3_TOPK = 10


def q_q3_top(sf_dir: str):
    """TPC-H Q3-shaped flagship chain: segment-filtered customers
    ⋉ date-filtered orders ⋉ ship-after lineitems → exact-integer
    revenue per order → global top-10.  Both semis run on the
    BROADCAST path below the key-count threshold (key sets ship once
    via ray.put, the big side never shuffles; bucketed fallback above
    it — stages/hashjoin.py:broadcast_semi); the top-10 is exact via
    per-bucket top-k (buckets partition orderkeys).
    Revenue = extprice_cents * (100 - disc_pct) — pure int64, so SUM is
    order-independent and the oracle matches bit-exactly."""
    import pandas as pd

    from ..stages.bucketed import bucketed_groupby

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def ckeys(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b.column("c_mktsegment"),
                              pa.scalar(Q3_SEGMENT)))
        return pa.table({"o_custkey": f.column("c_custkey")})

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])

    def odate(b: pa.Table) -> pa.Table:
        ts = b.column("o_orderdate").cast(pa.int64())
        keep = pc.less(ts, pa.scalar(Q3_CUT_US, pa.int64()))
        f = b.filter(keep)
        return pa.table({"o_orderkey": f.column("o_orderkey"),
                         "o_custkey": f.column("o_custkey")})

    from ..stages.hashjoin import broadcast_semi

    # both semis take the BROADCAST path at bench scale (key sides are
    # 30k/18k int64 rows — shipped once, the big side never shuffles;
    # two Sort barriers disappear); above the threshold broadcast_semi
    # falls back to the bucketed semi join (the cluster-scale path)
    qual_orders = broadcast_semi(
        orders.map_batches(odate, batch_format="pyarrow"),
        cust.map_batches(ckeys, batch_format="pyarrow"),
        "o_custkey", n_buckets=32,
    ).map_batches(lambda b: b.select(["o_orderkey"]),
                  batch_format="pyarrow")

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def lrev(b: pa.Table) -> pa.Table:
        ts = b.column("l_shipdate").cast(pa.int64())
        f = b.filter(pc.greater(ts, pa.scalar(Q3_CUT_US, pa.int64())))
        ep = np.rint(f.column("l_extendedprice")
                     .to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        dp = np.rint(f.column("l_discount")
                     .to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table({
            "o_orderkey": f.column("l_orderkey"),
            "rev": pa.array(ep * (100 - dp), pa.int64()),
        })

    li_q = broadcast_semi(li.map_batches(lrev, batch_format="pyarrow"),
                          qual_orders, "o_orderkey", n_buckets=32)

    def bucket_top(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("o_orderkey", sort=False, as_index=False)["rev"] \
            .sum().rename(columns={"rev": "revenue_c"})
        agg["revenue_c"] = agg["revenue_c"].astype(np.int64)
        agg = agg.sort_values(["revenue_c", "o_orderkey"],
                              ascending=[False, True], kind="mergesort")
        return agg.head(Q3_TOPK)

    top = bucketed_groupby(li_q, ["o_orderkey"], bucket_top, n_buckets=32)
    return top.sort(["revenue_c", "o_orderkey"],
                    descending=[True, False]).limit(Q3_TOPK)


Q5_REGION = "ASIA"
Q14_TYPE = "ECONOMY"
Q14_LO_US = (_dt.date(1998, 1, 1) - _dt.date(1970, 1, 1)).days \
    * 86_400_000_000
Q14_HI_US = (_dt.date(1999, 1, 1) - _dt.date(1970, 1, 1)).days \
    * 86_400_000_000


def _li_rev_cols(b: pa.Table, extra: list[str]) -> pa.Table:
    """lineitem → (extra cols, rev) with rev = extprice_cents *
    (100 - disc_pct) — pure int64, order-independent SUM."""
    ep = np.rint(b.column("l_extendedprice")
                 .to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
    dp = np.rint(b.column("l_discount")
                 .to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
    cols = {c: b.column(c) for c in extra}
    cols["rev"] = pa.array(ep * (100 - dp), pa.int64())
    return pa.table(cols)


def q_q5_nation_rev(sf_dir: str):
    """TPC-H Q5-shaped chain: revenue per nation for one region where
    supplier and customer share the nation — two broadcast dim lookups
    (supplier→nation, nation→region/name: ray.put once, per-worker
    memoized searchsorted) + two bucketed hash joins (orders⋈customer,
    lineitem⋈orders); the co-nation filter runs vectorized post-join;
    revenue in exact int64 cents (stages/join.py:make_broadcast_lookup_join,
    stages/hashjoin.py:bucketed_join)."""
    import ray

    from ..stages.hashjoin import bucketed_join
    from ..stages.join import make_broadcast_lookup_join

    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    rk = {k: n for k, n in zip(reg.column("r_regionkey").to_pylist(),
                               reg.column("r_name").to_pylist())}
    nkeys = nat.column("n_nationkey").to_numpy(zero_copy_only=False)
    nregion = nat.column("n_regionkey").to_numpy(zero_copy_only=False)
    in_region = np.array([rk[int(r)] == Q5_REGION for r in nregion])
    region_nations = set(nkeys[in_region].tolist())
    names = dict(zip(nkeys.tolist(), nat.column("n_name").to_pylist()))

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    sup_blob = {
        "l_suppkey": sup.column("s_suppkey").to_numpy(zero_copy_only=False),
        "s_nationkey": sup.column("s_nationkey")
        .to_numpy(zero_copy_only=False),
    }
    sup_ref = ray.put(sup_blob) if ray.is_initialized() else sup_blob
    j_sup = make_broadcast_lookup_join(
        sup_ref, key_col="l_suppkey", value_cols={"s_nationkey": pa.int64()})

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    rn = sorted(region_nations)

    def ckeys(b: pa.Table) -> pa.Table:
        nk = b.column("c_nationkey").to_numpy(zero_copy_only=False)
        keep = np.isin(nk, rn)
        f = b.filter(pa.array(keep))
        return pa.table({"o_custkey": f.column("c_custkey"),
                         "c_nationkey": f.column("c_nationkey")})

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    o_enriched = bucketed_join(
        orders, cust.map_batches(ckeys, batch_format="pyarrow"),
        ["o_custkey"], n_buckets=32,
    ).map_batches(lambda b: b.select(["o_orderkey", "c_nationkey"]),
                  batch_format="pyarrow")

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def lprep(b: pa.Table) -> pa.Table:
        t = _li_rev_cols(b, ["l_orderkey", "l_suppkey"])
        t = j_sup(t)
        return pa.table({"o_orderkey": t.column("l_orderkey"),
                         "s_nationkey": t.column("s_nationkey"),
                         "rev": t.column("rev")})

    joined = bucketed_join(li.map_batches(lprep, batch_format="pyarrow"),
                           o_enriched, ["o_orderkey"], n_buckets=32)

    names_ref = ray.put(names) if ray.is_initialized() else names

    def co_nation(b: pa.Table) -> pa.Table:
        sn = b.column("s_nationkey").to_numpy(zero_copy_only=False)
        cn = b.column("c_nationkey").to_numpy(zero_copy_only=False)
        f = b.filter(pa.array(sn == cn))
        nm = ray.get(names_ref) if ray.is_initialized() else names_ref
        cns = f.column("c_nationkey").to_numpy(zero_copy_only=False)
        return pa.table({
            "n_name": pa.array([nm[int(k)] for k in cns], pa.string()),
            "rev": f.column("rev"),
        })

    tagged = joined.map_batches(co_nation, batch_format="pyarrow")
    return zonal.zonal_aggregate(tagged, ["n_name"], {"rev": ["sum"]})


def q_promo_rev(sf_dir: str):
    """TPC-H Q14-shaped promo-revenue ratio: 1998 lineitems joined to
    part by a broadcast partkey→type lookup, per-batch exact int64
    (promo, total) partials, one-row finale with the double ratio
    mirrored op-for-op."""
    import ray

    from ..stages.join import make_broadcast_lookup_join

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    blob = {
        "l_partkey": part.column("p_partkey").to_numpy(zero_copy_only=False),
        "p_type": np.asarray(part.column("p_type").to_pylist(), dtype=object),
    }
    ref = ray.put(blob) if ray.is_initialized() else blob
    j_part = make_broadcast_lookup_join(ref, key_col="l_partkey",
                                        value_cols={"p_type": pa.string()})

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column("l_shipdate").cast(pa.int64())
        keep = pc.and_(pc.greater_equal(ts, pa.scalar(Q14_LO_US, pa.int64())),
                       pc.less(ts, pa.scalar(Q14_HI_US, pa.int64())))
        f = b.filter(keep)
        t = j_part(_li_rev_cols(f, ["l_partkey"]))
        rev = t.column("rev").to_numpy(zero_copy_only=False)
        promo = t.column("p_type").to_numpy(zero_copy_only=False) == Q14_TYPE
        return pa.table({
            "promo_c": pa.array([int(rev[promo].sum())], pa.int64()),
            "total_c": pa.array([int(rev.sum())], pa.int64()),
        })

    partials = li.map_batches(partial, batch_format="pyarrow")

    def finalize(b: pa.Table) -> pa.Table:
        p = int(pc.sum(b.column("promo_c")).as_py() or 0)
        t = int(pc.sum(b.column("total_c")).as_py() or 0)
        pct = 100.0 * np.float64(p) / np.float64(t) if t else np.nan
        return pa.table({"promo_c": pa.array([p], pa.int64()),
                         "total_c": pa.array([t], pa.int64()),
                         "promo_pct": pa.array([pct], pa.float64())})

    return partials.repartition(1).map_batches(finalize,
                                               batch_format="pyarrow")


# --- iterative graph ops: PageRank / bounded-hop BFS ----------------------
#
# The link graph stand-in: the customer↔supplier bipartite trade graph
# (distinct (custkey, suppkey) pairs from orders ⋈ lineitem), symmetric
# so every node has outdeg >= 1.  Node ids disambiguate the partitions:
# customer c -> 2c, supplier s -> 2s+1.

GRAPH_ITERS = 4
GRAPH_SCALE = 10 ** 12
GRAPH_DNUM, GRAPH_DDEN = 85, 100   # damping 0.85 as an exact rational
BFS_MAX_HOPS = 3
BFS_SEED_MOD = 100                 # seeds: customer nodes, custkey % 50 == 0


#: session-scoped memo for the derived trade-edge tables: SEVEN suite
#: queries consume the same ~20 MB materialized edge Dataset — the
#: shared-scan optimization (rebuilding cost ~3-5s per query in a warm
#: session).  Keyed by (variant, sf_dir); refs pin the blocks alive for
#: the session, which is exactly the lifetime the driver/bench use.
_EDGE_CACHE: dict = {}


def _edge_memo(variant: str, sf_dir: str, build):
    import ray

    # key on the Ray job id too: a cached Dataset's object refs die
    # with the session, so a shutdown/init cycle in one process must
    # rebuild rather than return dead refs
    job = (ray.get_runtime_context().get_job_id()
           if ray.is_initialized() else None)
    key = (variant, sf_dir)
    hit = _EDGE_CACHE.get(key)
    if hit is not None and hit[0] == job:
        return hit[1]
    ds = build().materialize()
    _EDGE_CACHE[key] = (job, ds)
    return ds


def _trade_edges(sf_dir: str):
    return _edge_memo("plain", sf_dir, lambda: _build_trade_edges(sf_dir))


def _build_trade_edges(sf_dir: str):
    from ..stages.graph import distinct_tuples
    from ..stages.hashjoin import bucketed_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"]).map_batches(
        lambda b: b.rename_columns(["o_orderkey", "l_suppkey"]),
        batch_format="pyarrow",
    )
    pairs = bucketed_join(li, orders, ["o_orderkey"])

    def to_nodes(b: pa.Table) -> pa.Table:
        c = b.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        s = b.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"cnode": pa.array(c * 2), "snode": pa.array(s * 2 + 1)})

    dpairs = distinct_tuples(
        pairs.map_batches(to_nodes, batch_format="pyarrow"),
        ["cnode", "snode"],
    )

    def symm(b: pa.Table) -> pa.Table:
        c = b.column("cnode").combine_chunks()
        s = b.column("snode").combine_chunks()
        return pa.table({"src": pa.concat_arrays([c, s]),
                         "dst": pa.concat_arrays([s, c])})

    return dpairs.map_batches(symm, batch_format="pyarrow")


_SQL_GRAPH_EDGES_W = """pairs AS (
  SELECT o.o_custkey * 2 AS cnode, l.l_suppkey * 2 + 1 AS snode,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
edges AS (
  SELECT cnode AS src, snode AS dst, w FROM pairs
  UNION ALL
  SELECT snode AS src, cnode AS dst, w FROM pairs
)"""


_SQL_GRAPH_EDGES = """pairs AS (
  SELECT DISTINCT o.o_custkey * 2 AS cnode, l.l_suppkey * 2 + 1 AS snode
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
edges AS (
  SELECT cnode AS src, snode AS dst FROM pairs
  UNION ALL
  SELECT snode AS src, cnode AS dst FROM pairs
)"""


def q_pagerank(sf_dir: str):
    """Exact fixed-point PageRank (4 rounds, damping 85/100, ranks scaled
    by 1e12) over the customer↔supplier graph — the iterative BSP plan:
    per round ONE bucketed join ships (node, outdeg, pr) onto the edges
    and ONE combiner-first bucketed reduce sums floor-div contributions
    per dst; all arithmetic int64 so the chained-CTE oracle matches
    bit-exactly (stages/graph.py:pagerank)."""
    from ..stages.graph import pagerank

    pr = pagerank(_trade_edges(sf_dir), iters=GRAPH_ITERS, scale=GRAPH_SCALE,
                  d_num=GRAPH_DNUM, d_den=GRAPH_DDEN)
    return pr.map_batches(lambda b: b.select(["node", "pr"]),
                          batch_format="pyarrow")


def q_assort(sf_dir: str):
    """Degree assortativity of the trade graph (Newman's do-hubs-link-
    to-hubs mixing diagnostic): Pearson correlation of endpoint degrees
    over the symmetric edge list — exact int64 moment sums, one
    shared-parenthesization float expression so the DOUBLE
    value-checks (stages/graph.py:degree_assortativity)."""
    from ..stages.graph import degree_assortativity

    return degree_assortativity(_trade_edges(sf_dir))


def _sql_assort() -> str:
    return f"""
WITH {_SQL_GRAPH_EDGES},
deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM edges GROUP BY 1),
nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM edges
                                     UNION ALL SELECT dst FROM edges)),
nd AS (SELECT n.node, COALESCE(d.deg, 0) AS deg
       FROM nodes n LEFT JOIN deg d USING (node)),
j AS (SELECT dx.deg AS x, dy.deg AS y
      FROM edges e JOIN nd dx ON dx.node = e.src
                   JOIN nd dy ON dy.node = e.dst),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x*x) AS BIGINT) AS sxx,
             CAST(SUM(y*y) AS BIGINT) AS syy,
             CAST(SUM(x*y) AS BIGINT) AS sxy
      FROM j)
SELECT m, sx, sy, sxx, syy, sxy,
       CAST(m*sxy - sx*sy AS DOUBLE)
       / (sqrt(CAST(m*sxx - sx*sx AS DOUBLE))
          * sqrt(CAST(m*syy - sy*sy AS DOUBLE))) AS assort
FROM s"""


HITS_ITERS = 3
HITS_SCALE = 10 ** 6


def _directed_trade_edges(sf_dir: str):
    return _edge_memo("directed", sf_dir,
                      lambda: _build_directed_trade_edges(sf_dir))


def _build_directed_trade_edges(sf_dir: str):
    """DIRECTED bipartite trade edges customer -> supplier (customers
    are the hubs, suppliers the authorities) — the HITS-shaped graph;
    the symmetric _trade_edges would make hub == auth degenerate."""
    from ..stages.graph import distinct_tuples
    from ..stages.hashjoin import bucketed_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"]).map_batches(
        lambda b: b.rename_columns(["o_orderkey", "l_suppkey"]),
        batch_format="pyarrow",
    )
    pairs = bucketed_join(li, orders, ["o_orderkey"])

    def to_edge(b: pa.Table) -> pa.Table:
        c = b.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        s = b.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"src": pa.array(c * 2), "dst": pa.array(s * 2 + 1)})

    return distinct_tuples(
        pairs.map_batches(to_edge, batch_format="pyarrow"), ["src", "dst"])


def q_hits(sf_dir: str):
    """HITS hubs & authorities (3 rounds, max-normalized int64 scores
    scaled by 1e6) over the DIRECTED customer->supplier graph — the
    link-analysis classic next to pagerank; integer max-normalization
    replaces the L2 norm so the chained-CTE oracle matches bit-exactly
    (stages/graph.py:hits)."""
    from ..stages.graph import hits

    return hits(_directed_trade_edges(sf_dir), iters=HITS_ITERS,
                scale=HITS_SCALE)


def _sql_hits() -> str:
    sc = HITS_SCALE
    ctes = ["""edges AS (
  SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
)""",
            ("nodes AS (SELECT DISTINCT node FROM ("
             "SELECT src AS node FROM edges "
             "UNION ALL SELECT dst AS node FROM edges))"),
            (f"r0 AS (SELECT node, CAST({sc} AS BIGINT) AS h, "
             f"CAST({sc} AS BIGINT) AS a FROM nodes)")]
    for i in range(1, HITS_ITERS + 1):
        ctes += [
            f"""ar{i} AS (SELECT n.node, COALESCE(s.s, 0) AS raw
  FROM nodes n LEFT JOIN
    (SELECT e.dst AS node, CAST(SUM(r.h) AS BIGINT) AS s
     FROM edges e JOIN r{i - 1} r ON r.node = e.src GROUP BY 1) s
  USING (node))""",
            f"am{i} AS (SELECT MAX(raw) AS m FROM ar{i})",
            (f"a{i} AS (SELECT node, COALESCE((raw * {sc}) "
             f"// NULLIF(m, 0), 0) AS a FROM ar{i} CROSS JOIN am{i})"),
            f"""hr{i} AS (SELECT n.node, COALESCE(s.s, 0) AS raw
  FROM nodes n LEFT JOIN
    (SELECT e.src AS node, CAST(SUM(a.a) AS BIGINT) AS s
     FROM edges e JOIN a{i} a ON a.node = e.dst GROUP BY 1) s
  USING (node))""",
            f"hm{i} AS (SELECT MAX(raw) AS m FROM hr{i})",
            (f"r{i} AS (SELECT h.node, COALESCE((h.raw * {sc}) "
             f"// NULLIF(hm{i}.m, 0), 0) AS h, a.a "
             f"FROM hr{i} h JOIN a{i} a USING (node) CROSS JOIN hm{i})")]
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, h AS hub, a AS auth FROM r{HITS_ITERS}")


DELTA_PR_ITERS = 2  # warm-started rounds in the incremental run


def q_delta_pagerank(sf_dir: str):
    """CROSS-RUN incremental PageRank: run 1 bootstraps a persistent
    edge-log + rank store with the even-(custkey+suppkey) half of the
    trade graph (4 cold rounds); run 2 streams in the odd half and runs
    only 2 rounds WARM-STARTED from the stored ranks — the edge-stream
    delta-PageRank shape (stages/graph.py:incremental_pagerank).  A
    fresh temp store per call keeps the query idempotent."""
    import shutil
    import tempfile

    from ..stages.graph import incremental_pagerank

    edges = _trade_edges(sf_dir).materialize()

    def half(parity):
        def fn(b: pa.Table) -> pa.Table:
            s = b.column("src").to_numpy(zero_copy_only=False)
            d = b.column("dst").to_numpy(zero_copy_only=False)
            return b.filter(pa.array((s // 2 + d // 2) % 2 == parity))

        return fn

    store = tempfile.mkdtemp(prefix="zen3geo_dpr_")
    try:
        incremental_pagerank(
            edges.map_batches(half(0), batch_format="pyarrow"), store,
            boot_iters=GRAPH_ITERS, delta_iters=DELTA_PR_ITERS,
            scale=GRAPH_SCALE, d_num=GRAPH_DNUM, d_den=GRAPH_DDEN,
        )
        out = incremental_pagerank(
            edges.map_batches(half(1), batch_format="pyarrow"), store,
            boot_iters=GRAPH_ITERS, delta_iters=DELTA_PR_ITERS,
            scale=GRAPH_SCALE, d_num=GRAPH_DNUM, d_den=GRAPH_DDEN,
        )
        out = out.map_batches(
            lambda b: b.select(["node", "pr"]), batch_format="pyarrow"
        ).materialize()
    finally:
        shutil.rmtree(store, ignore_errors=True)
    return out


def _sql_delta_pagerank() -> str:
    """Chained-CTE mirror of q_delta_pagerank: 4 cold rounds over the
    even-pair half, then COALESCE-warm-started rounds over the full
    graph — identical int64 recurrence on both sides."""
    sc, dn, dd = GRAPH_SCALE, GRAPH_DNUM, GRAPH_DDEN

    def rounds(tag: str, prev0: str, edges: str, nd: str, p: str,
               n_rounds: int) -> list[str]:
        out = []
        prev = prev0
        for i in range(1, n_rounds + 1):
            out.append(f"""{tag}{i} AS (
  SELECT {nd}.node, {nd}.outdeg,
         (({dd - dn} * {sc}) // ({dd} * {p}.n))
         + ({dn} * COALESCE(s.s, 0)) // {dd} AS pr
  FROM {nd} CROSS JOIN {p}
  LEFT JOIN (SELECT e.dst AS node,
                    CAST(SUM(r.pr // r.outdeg) AS BIGINT) AS s
             FROM {edges} e JOIN {tag}{i - 1} r ON r.node = e.src
             GROUP BY 1) s
  USING (node))""")
            prev = f"{tag}{i}"
        return out

    ctes = [
        _SQL_GRAPH_EDGES,
        ("e1 AS (SELECT src, dst FROM edges "
         "WHERE (src // 2 + dst // 2) % 2 = 0)"),
        ("deg1 AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS outdeg "
         "FROM e1 GROUP BY 1)"),
        ("nodes1 AS (SELECT DISTINCT node FROM (SELECT src AS node FROM e1 "
         "UNION ALL SELECT dst AS node FROM e1))"),
        ("nd1 AS (SELECT n.node, COALESCE(d.outdeg, 0) AS outdeg "
         "FROM nodes1 n LEFT JOIN deg1 d USING (node))"),
        "p1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nd1)",
        (f"a0 AS (SELECT node, outdeg, ({sc} // p1.n) AS pr "
         "FROM nd1 CROSS JOIN p1)"),
    ]
    ctes += rounds("a", "a0", "e1", "nd1", "p1", GRAPH_ITERS)
    ctes += [
        ("deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS outdeg "
         "FROM edges GROUP BY 1)"),
        ("nodes AS (SELECT DISTINCT node FROM (SELECT src AS node "
         "FROM edges UNION ALL SELECT dst AS node FROM edges))"),
        ("nd AS (SELECT n.node, COALESCE(d.outdeg, 0) AS outdeg "
         "FROM nodes n LEFT JOIN deg d USING (node))"),
        "p AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nd)",
        (f"b0 AS (SELECT nd.node, nd.outdeg, "
         f"COALESCE(w.pr, {sc} // p.n) AS pr "
         f"FROM nd CROSS JOIN p LEFT JOIN a{GRAPH_ITERS} w USING (node))"),
    ]
    ctes += rounds("b", "b0", "edges", "nd", "p", DELTA_PR_ITERS)
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, pr FROM b{DELTA_PR_ITERS}")


def _sql_pagerank(seed_expr: str = "1", weighted: bool = False) -> str:
    """Chained-CTE fixed-point PageRank; ``seed_expr`` personalizes the
    teleport vector (1 = classic, a node predicate = PPR); ``weighted``
    switches to integer edge weights (w = pair multiplicity, outdeg =
    out-weight, contribution = (pr * w) // outdeg)."""
    sc, dn, dd = GRAPH_SCALE, GRAPH_DNUM, GRAPH_DDEN
    ctes = [
        _SQL_GRAPH_EDGES_W if weighted else _SQL_GRAPH_EDGES,
        (("deg AS (SELECT src AS node, CAST(SUM(w) AS BIGINT) AS outdeg "
          "FROM edges GROUP BY 1)") if weighted else
         ("deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS outdeg "
          "FROM edges GROUP BY 1)")),
        ("nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM edges "
         "UNION ALL SELECT dst AS node FROM edges))"),
        (f"nd AS (SELECT n.node, COALESCE(d.outdeg, 0) AS outdeg, "
         f"CAST({seed_expr} AS BIGINT) AS seed "
         "FROM nodes n LEFT JOIN deg d USING (node))"),
        "p AS (SELECT CAST(SUM(seed) AS BIGINT) AS n FROM nd)",
        (f"r0 AS (SELECT node, outdeg, seed, seed * ({sc} // p.n) AS pr "
         "FROM nd CROSS JOIN p)"),
    ]
    for i in range(1, GRAPH_ITERS + 1):
        ctes.append(f"""r{i} AS (
  SELECT nd.node, nd.outdeg, nd.seed,
         nd.seed * (({dd - dn} * {sc}) // ({dd} * p.n))
         + ({dn} * COALESCE(s.s, 0)) // {dd} AS pr
  FROM nd CROSS JOIN p
  LEFT JOIN (SELECT e.dst AS node, CAST(SUM({{contrib}}) AS BIGINT) AS s
             FROM edges e JOIN r{i - 1} r ON r.node = e.src GROUP BY 1) s
  USING (node))""".replace("{contrib}",
                           "(r.pr * e.w) // r.outdeg" if weighted
                           else "r.pr // r.outdeg"))
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, pr FROM r{GRAPH_ITERS}")


def _trade_edges_weighted(sf_dir: str):
    return _edge_memo("weighted", sf_dir,
                      lambda: _build_trade_edges_weighted(sf_dir))


def _build_trade_edges_weighted(sf_dir: str):
    """Weighted symmetric trade edges: w = number of lineitems linking
    (customer, supplier) — the multiplicity-weighted variant of
    _trade_edges (count per pair via one combiner-first bucketed sum)."""
    import pandas as pd

    from ..stages.bucketed import bucketed_groupby
    from ..stages.hashjoin import bucketed_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"]).map_batches(
        lambda b: b.rename_columns(["o_orderkey", "l_suppkey"]),
        batch_format="pyarrow",
    )
    pairs = bucketed_join(li, orders, ["o_orderkey"])

    def to_nodes(b: pa.Table) -> pa.Table:
        c = b.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        s = b.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"cnode": c * 2, "snode": s * 2 + 1})
        df["w"] = np.int64(1)
        agg = df.groupby(["cnode", "snode"], sort=False, as_index=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False) \
            .replace_schema_metadata(None)

    counted = bucketed_groupby(
        pairs.map_batches(to_nodes, batch_format="pyarrow"),
        ["cnode", "snode"],
        lambda g: g.groupby(["cnode", "snode"], sort=False,
                            as_index=False)["w"].sum(),
    )

    def symm(b: pa.Table) -> pa.Table:
        c = b.column("cnode").combine_chunks()
        s = b.column("snode").combine_chunks()
        w = b.column("w").combine_chunks()
        return pa.table({"src": pa.concat_arrays([c, s]),
                         "dst": pa.concat_arrays([s, c]),
                         "w": pa.concat_arrays([w, w])})

    return counted.map_batches(symm, batch_format="pyarrow")


def q_wpagerank(sf_dir: str):
    """WEIGHTED PageRank: edge weight = lineitem multiplicity per
    (customer, supplier) pair; contribution = (pr * w) // out_weight —
    exact integers end to end (stages/graph.py:pagerank(weight_col=))."""
    from ..stages.graph import pagerank

    pr = pagerank(_trade_edges_weighted(sf_dir), iters=GRAPH_ITERS,
                  scale=GRAPH_SCALE, d_num=GRAPH_DNUM, d_den=GRAPH_DDEN,
                  weight_col="w")
    return pr.map_batches(lambda b: b.select(["node", "pr"]),
                          batch_format="pyarrow")


def q_ppr(sf_dir: str):
    """PERSONALIZED PageRank: teleport mass restricted to the customer
    seed nodes (custkey % 50 == 0) — the seed-set-expansion / trust-rank
    primitive; same exact-integer recurrence with a seed-masked base
    vector (stages/graph.py:pagerank(seeds=...))."""
    from ..stages.graph import distinct_tuples, pagerank

    edges = _trade_edges(sf_dir).materialize()

    def seed_partial(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.unique(s[s % BFS_SEED_MOD == 0]))})

    seeds = distinct_tuples(
        edges.map_batches(seed_partial, batch_format="pyarrow"), ["node"]
    )
    pr = pagerank(edges, iters=GRAPH_ITERS, scale=GRAPH_SCALE,
                  d_num=GRAPH_DNUM, d_den=GRAPH_DDEN, seeds=seeds)
    return pr.map_batches(lambda b: b.select(["node", "pr"]),
                          batch_format="pyarrow")


WALK_STEPS = 3


def q_walks(sf_dir: str):
    """DeepWalk-style DETERMINISTIC hash-driven random walks over the
    trade graph (the embedding-corpus generator): next hop = the
    knuth(cur + t·C) mod deg -th neighbor in sorted order — RNG-free
    and mirrored hop for hop by the chained-CTE oracle; broadcast CSR
    advances all hops in one map below the edge threshold, two
    bucketed joins per step above (stages/graph.py:hash_walks)."""
    from ..stages.graph import distinct_tuples, hash_walks

    edges = _trade_edges(sf_dir).materialize()

    def seed_partial(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(
            np.unique(s[s % BFS_SEED_MOD == 0]))})

    seeds = distinct_tuples(
        edges.map_batches(seed_partial, batch_format="pyarrow"), ["node"]
    )
    return hash_walks(edges, seeds, steps=WALK_STEPS)


def _sql_walks() -> str:
    from ..functions.hashing import sql_knuth_expr
    from ..stages.graph import WALK_C

    ctes = [f"""{_SQL_GRAPH_EDGES},
ia AS (SELECT src AS u, dst AS v,
              CAST(ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst)
                   AS BIGINT) AS rn,
              CAST(COUNT(*) OVER (PARTITION BY src) AS BIGINT) AS deg
       FROM edges),
s0 AS (SELECT DISTINCT src AS walk_id, src AS cur FROM edges
       WHERE src % {BFS_SEED_MOD} = 0)"""]
    for t in range(1, WALK_STEPS + 1):
        h = sql_knuth_expr(f"s.cur + {t * WALK_C}")
        ctes.append(f"""s{t} AS (
  SELECT s.walk_id, a.v AS cur FROM s{t - 1} s
  JOIN ia a ON a.u = s.cur AND a.rn = 1 + {h} % a.deg)""")
    selects = ["SELECT walk_id, CAST(0 AS BIGINT) AS step, "
               "cur AS node FROM s0"]
    selects += [f"SELECT walk_id, CAST({t} AS BIGINT) AS step, "
                f"cur AS node FROM s{t}"
                for t in range(1, WALK_STEPS + 1)]
    return ("WITH " + ",\n".join(ctes) + "\n"
            + "\nUNION ALL\n".join(selects))


NEIGHBOR_K = 3  # GNN-minibatch-style per-node neighbor cap


def q_neighbor_sample(sf_dir: str):
    """Deterministic per-node NEIGHBOR SAMPLING (GraphSAGE-style
    minibatch prep): keep each source's first K=3 neighbors under the
    bijective hash order of dst — reproducible pseudo-random sampling
    with no RNG state, via the keyed rank scan
    (stages/partition.py:quota_per_key over the edge table)."""
    from ..stages.partition import quota_per_key

    return quota_per_key(_trade_edges(sf_dir), "src", "dst", NEIGHBOR_K)


def _sql_neighbor_sample() -> str:
    from ..stages.partition import SHARD_A, SHARD_B

    return f"""WITH {_SQL_GRAPH_EDGES},
h AS (SELECT src, dst, (dst::HUGEINT * {SHARD_A} + {SHARD_B}) % {_SQL_M} AS h
      FROM edges),
r AS (SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY h) AS rn
      FROM h)
SELECT src, dst FROM r WHERE rn <= {NEIGHBOR_K}"""


def q_bfs_hops(sf_dir: str):
    """Multi-source bounded-hop BFS (Bellman-Ford layering, 3 rounds)
    from every customer node with custkey % 50 == 0 — per round one
    bucketed edge join + one keyed min reduce, mirroring the chained-CTE
    oracle term for term (stages/graph.py:bfs_hops)."""
    from ..stages.graph import bfs_hops, distinct_tuples

    edges = _trade_edges(sf_dir).materialize()

    def seed_partial(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.unique(s[s % BFS_SEED_MOD == 0]))})

    seeds = distinct_tuples(
        edges.map_batches(seed_partial, batch_format="pyarrow"), ["node"]
    )
    return bfs_hops(edges, seeds, max_hops=BFS_MAX_HOPS)


DIAM_HOPS = 12


def q_diameter_lb(sf_dir: str):
    """Double-sweep diameter lower bound of the undirected trade
    graph: BFS from the min node, BFS again from the farthest node
    (ties min id), max eccentricity observed — exact on trees,
    near-exact on real-world graphs; distances cap at 12 hops mirrored
    by the oracle (stages/graph.py:diameter_double_sweep)."""
    from ..stages.graph import diameter_double_sweep

    return diameter_double_sweep(_trade_edges(sf_dir),
                                 max_hops=DIAM_HOPS)


def _sql_diameter_lb() -> str:
    def chain(tag: str, seed_expr: str) -> str:
        ctes = [
            f"{tag}0 AS (SELECT {seed_expr} AS node, "
            f"CAST(0 AS BIGINT) AS dist)"]
        for i in range(1, DIAM_HOPS + 1):
            ctes.append(f"""{tag}{i} AS MATERIALIZED (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM {tag}{i - 1}
    UNION ALL
    SELECT e.dst AS node, r.dist + 1 AS dist
    FROM sym e JOIN {tag}{i - 1} r ON r.node = e.src
  ) GROUP BY 1)""")
        return ",\n".join(ctes)

    last = f"d{DIAM_HOPS}"
    last2 = f"e{DIAM_HOPS}"
    return f"""WITH {_SQL_GRAPH_EDGES},
sym AS MATERIALIZED (SELECT src, dst FROM edges
       UNION SELECT dst, src FROM edges),
st AS (SELECT CAST(MIN(src) AS BIGINT) AS s FROM sym),
{chain('d', '(SELECT s FROM st)')},
m1 AS (SELECT CAST(MAX(dist) AS BIGINT) AS ecc1 FROM {last}),
f1 AS (SELECT CAST(MIN(node) AS BIGINT) AS far FROM {last}, m1
       WHERE dist = ecc1),
{chain('e', '(SELECT far FROM f1)')},
m2 AS (SELECT CAST(MAX(dist) AS BIGINT) AS ecc2 FROM {last2})
SELECT st.s AS start, m1.ecc1, f1.far AS far_node, m2.ecc2,
       GREATEST(m1.ecc1, m2.ecc2) AS diameter_lb
FROM st, m1, f1, m2"""


CC_QTY_MIN = 48  # co-occurrence edge filter: rare high-quantity lines


def q_components(sf_dir: str):
    """Weakly-connected components of the part co-occurrence graph
    (parts sharing an order among qty >= 48 lineitems).  Per-order STAR
    expansion (hub = min part; linear edge count, never the quadratic
    within-group pair blowup) feeds the public connected_components
    operator: min-label propagation to a one-scalar-aggregate fixpoint
    with the pointer-jump fallback (stages/graph.py:connected_components).
    Hub self-edges give lone parts singleton components."""
    import pandas as pd

    from ..stages.bucketed import bucketed_groupby
    from ..stages.graph import connected_components

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_quantity"])
    lines = li.map_batches(
        lambda b: b.filter(
            pc.greater_equal(b.column("l_quantity"),
                             pa.scalar(float(CC_QTY_MIN)))
        ).select(["l_orderkey", "l_partkey"]),
        batch_format="pyarrow",
    )

    def star(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["l_orderkey", "l_partkey"])
        hub = g.groupby("l_orderkey", sort=False)["l_partkey"].transform("min")
        return pd.DataFrame({"src": hub.to_numpy(),
                             "dst": g["l_partkey"].to_numpy()})

    # the qty filter keeps ~6% of lines; 16 buckets beats the 64 default
    # (per-task overhead dominates tiny groups — CLAUDE.md block lesson)
    edges = bucketed_groupby(lines, ["l_orderkey"], star, n_buckets=16)
    return connected_components(edges)


def _sql_components() -> str:
    return f"""WITH RECURSIVE
lines AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
          FROM lineitem WHERE l_quantity >= {CC_QTY_MIN}),
hub AS (SELECT ok, MIN(pk) AS h FROM lines GROUP BY ok),
e0 AS (SELECT h.h AS a, l.pk AS b FROM lines l JOIN hub h ON h.ok = l.ok),
edge AS (SELECT DISTINCT a, b FROM
         (SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0)),
walk(id, r) AS (
  SELECT DISTINCT a, a FROM edge
  UNION
  SELECT w.id, e.b FROM walk w JOIN edge e ON e.a = w.r
)
SELECT id AS node, MIN(r) AS comp FROM walk GROUP BY id"""


DBSCAN_DEG = 5.0
DBSCAN_MINPTS = 8
DBSCAN_MUL = 1024


def q_dbscan(sf_dir: str):
    """Grid-based spatial DBSCAN over the geocoded documents: 5-degree
    cells, core = >= 8 points, clusters = 8-neighbor components of core
    cells labeled by min cell key, border cells take the min adjacent
    core label, noise drops (stages/cluster.py:grid_dbscan — counts
    combiner-first, all adjacency work CELL-bounded, points labeled by
    one broadcast lookup)."""
    from ..stages.cluster import grid_dbscan

    pts = _geocoded(sf_dir, RES_ZONAL)
    return grid_dbscan(pts, cell_deg=DBSCAN_DEG, min_pts=DBSCAN_MINPTS,
                       key_mul=DBSCAN_MUL, n_buckets=8)


def _sql_dbscan() -> str:
    d, p, m = DBSCAN_DEG, DBSCAN_MINPTS, DBSCAN_MUL
    lon_e, lat_e = sql_geocode_exprs("doc_id", "lang")
    return f"""WITH RECURSIVE
geo0 AS (SELECT doc_id, {lon_e} AS lon, {lat_e} AS lat FROM documents),
pc AS (SELECT doc_id,
         CAST(FLOOR((lon - -180.0) / {d!r}) AS BIGINT) AS ix,
         CAST(FLOOR((lat - -90.0) / {d!r}) AS BIGINT) AS iy
       FROM geo0),
cnt AS (SELECT ix, iy, CAST(COUNT(*) AS BIGINT) AS c
        FROM pc GROUP BY 1, 2),
core AS (SELECT ix, iy FROM cnt WHERE c >= {p}),
off(dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                       (1,-1),(1,0),(1,1)),
edge AS (SELECT a.ix * {m} + a.iy AS u, b.ix * {m} + b.iy AS v
         FROM core a JOIN off o ON TRUE
         JOIN core b ON b.ix = a.ix + o.dx AND b.iy = a.iy + o.dy),
walk(id, r) AS (
  SELECT DISTINCT u, u FROM edge
  UNION
  SELECT w.id, e.v FROM walk w JOIN edge e ON e.u = w.r
),
comp AS (SELECT id, MIN(r) AS comp FROM walk GROUP BY id),
cl AS (SELECT c.ix, c.iy, MIN(p2.comp) AS cluster
       FROM cnt c JOIN off o ON TRUE
       JOIN comp p2 ON p2.id = (c.ix + o.dx) * {m} + (c.iy + o.dy)
       GROUP BY 1, 2)
SELECT pc.doc_id, cl.cluster
FROM pc JOIN cl ON cl.ix = pc.ix AND cl.iy = pc.iy"""


def q_source_hhi(sf_dir: str):
    """Per-language SOURCE CONCENTRATION (Herfindahl index) over the
    documents table — the corpus-diversity signal a mixture curator
    watches.  Σc and Σc² are exact int64 moments (combiner-first, shuffle
    bounded by distinct (lang, source) pairs); the single trailing IEEE
    division is mirrored op-for-op (stages/zonal.py:grouped_hhi)."""
    docs = _read(sf_dir, "documents", ["lang", "source"])
    return zonal.grouped_hhi(docs, ["lang"], "source")


_SQL_SOURCE_HHI = """
WITH c AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS cn
           FROM documents GROUP BY 1, 2)
SELECT lang, CAST(SUM(cn) AS BIGINT) AS n,
       CAST(COUNT(*) AS BIGINT) AS n_vals,
       CAST(CAST(SUM(cn * cn) AS BIGINT) AS DOUBLE)
         / (CAST(CAST(SUM(cn) AS BIGINT) AS DOUBLE)
            * CAST(CAST(SUM(cn) AS BIGINT) AS DOUBLE)) AS hhi
FROM c GROUP BY lang
"""


TRI_QTY_MIN = 40  # co-purchase pair filter (~10% of lines; cliques <= 7)


def q_triangles(sf_dir: str):
    """Exact triangle count of the part co-purchase graph (parts sharing
    an order among qty >= 40 lineitems; within-order pair expansion is
    bounded by the tiny order size).  Degree-oriented wedge join — hot
    parts can't blow up wedge volume because wedges enumerate only at
    each edge's (degree, id)-smaller endpoint; wedges stream through the
    closing semi join, never materialized (stages/graph.py:triangle_count)."""
    import pandas as pd

    from ..stages.bucketed import bucketed_groupby
    from ..stages.graph import triangle_count

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_quantity"])
    lines = li.map_batches(
        lambda b: b.filter(
            pc.greater_equal(b.column("l_quantity"),
                             pa.scalar(float(TRI_QTY_MIN)))
        ).select(["l_orderkey", "l_partkey"]),
        batch_format="pyarrow",
    )

    def pair_expand(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["l_orderkey", "l_partkey"])
        m = g.merge(g, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"src": m["l_partkey_x"].to_numpy(),
                             "dst": m["l_partkey_y"].to_numpy()})

    prs = bucketed_groupby(lines, ["l_orderkey"], pair_expand, n_buckets=16)
    return triangle_count(prs)


def _sql_triangles() -> str:
    return f"""WITH
lines AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
          FROM lineitem WHERE l_quantity >= {TRI_QTY_MIN}),
pairs AS (SELECT DISTINCT a.pk AS u, b.pk AS v
          FROM lines a JOIN lines b ON a.ok = b.ok AND a.pk < b.pk),
deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM
        (SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs)
        GROUP BY 1),
o AS (SELECT CASE WHEN (du.d, u) < (dv.d, v) THEN u ELSE v END AS lo,
             CASE WHEN (du.d, u) < (dv.d, v) THEN v ELSE u END AS hi,
             CASE WHEN (du.d, u) < (dv.d, v) THEN dv.d ELSE du.d END AS dhi
      FROM pairs JOIN deg du ON du.node = u JOIN deg dv ON dv.node = v),
w AS (SELECT e1.hi AS b, e1.dhi AS db, e2.hi AS c
      FROM o e1 JOIN o e2 ON e1.lo = e2.lo
      AND ((e1.dhi, e1.hi) < (e2.dhi, e2.hi)))
SELECT CAST(COUNT(*) AS BIGINT) AS n_tri
FROM w JOIN o e ON e.lo = w.b AND e.hi = w.c"""


def q_clustering(sf_dir: str):
    """Per-node triangle counts + local clustering coefficient (the
    Watts–Strogatz statistic) of the part co-purchase graph — the same
    skew-safe degree-oriented wedge plan as q_triangles, except each
    closed triangle credits all three vertices and a padded left join
    lands zero-triangle nodes at cc = 0
    (stages/graph.py:local_clustering)."""
    import pandas as pd

    from ..stages.bucketed import bucketed_groupby
    from ..stages.graph import local_clustering

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_quantity"])
    lines = li.map_batches(
        lambda b: b.filter(
            pc.greater_equal(b.column("l_quantity"),
                             pa.scalar(float(TRI_QTY_MIN)))
        ).select(["l_orderkey", "l_partkey"]),
        batch_format="pyarrow",
    )

    def pair_expand(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["l_orderkey", "l_partkey"])
        m = g.merge(g, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"src": m["l_partkey_x"].to_numpy(),
                             "dst": m["l_partkey_y"].to_numpy()})

    prs = bucketed_groupby(lines, ["l_orderkey"], pair_expand, n_buckets=16)
    return local_clustering(prs)


def _sql_clustering() -> str:
    return f"""WITH
lines AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
          FROM lineitem WHERE l_quantity >= {TRI_QTY_MIN}),
pairs AS (SELECT DISTINCT a.pk AS u, b.pk AS v
          FROM lines a JOIN lines b ON a.ok = b.ok AND a.pk < b.pk),
deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM
        (SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs)
        GROUP BY 1),
o AS (SELECT CASE WHEN (du.d, u) < (dv.d, v) THEN u ELSE v END AS lo,
             CASE WHEN (du.d, u) < (dv.d, v) THEN v ELSE u END AS hi,
             CASE WHEN (du.d, u) < (dv.d, v) THEN dv.d ELSE du.d END AS dhi
      FROM pairs JOIN deg du ON du.node = u JOIN deg dv ON dv.node = v),
w AS (SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
      FROM o e1 JOIN o e2 ON e1.lo = e2.lo
      AND ((e1.dhi, e1.hi) < (e2.dhi, e2.hi))),
closed AS (SELECT w.a, w.b, w.c FROM w
           JOIN o e ON e.lo = w.b AND e.hi = w.c),
tri AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS t FROM
        (SELECT a AS node FROM closed UNION ALL SELECT b FROM closed
         UNION ALL SELECT c FROM closed) GROUP BY 1)
SELECT d.node, d.d AS deg, COALESCE(tri.t, 0) AS tri,
       CASE WHEN d.d >= 2 THEN
         CAST(2 * COALESCE(tri.t, 0) AS DOUBLE)
         / CAST(d.d * (d.d - 1) AS DOUBLE)
       ELSE NULL END AS cc
FROM deg d LEFT JOIN tri ON tri.node = d.node"""


RICH_KS = (2, 4, 8, 16)
PLAW_DMIN, PLAW_LNSCALE = 2, 1 << 16


def _copurchase_edges(sf_dir: str):
    """Shared qty >= 40 co-purchase (src, dst) edge stream (the
    q_triangles graph)."""
    import pandas as pd

    from ..stages.bucketed import bucketed_groupby

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_quantity"])
    lines = li.map_batches(
        lambda b: b.filter(
            pc.greater_equal(b.column("l_quantity"),
                             pa.scalar(float(TRI_QTY_MIN)))
        ).select(["l_orderkey", "l_partkey"]),
        batch_format="pyarrow",
    )

    def pair_expand(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["l_orderkey", "l_partkey"])
        m = g.merge(g, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"src": m["l_partkey_x"].to_numpy(),
                             "dst": m["l_partkey_y"].to_numpy()})

    return bucketed_groupby(lines, ["l_orderkey"], pair_expand,
                            n_buckets=16)


def _sql_copurchase_deg() -> str:
    return f"""lines AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
          FROM lineitem WHERE l_quantity >= {TRI_QTY_MIN}),
pairs AS (SELECT DISTINCT a.pk AS u, b.pk AS v
          FROM lines a JOIN lines b ON a.ok = b.ok AND a.pk < b.pk),
deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM
        (SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs)
        GROUP BY 1)"""


def q_richclub(sf_dir: str):
    """Rich-club coefficient phi(k) of the co-purchase graph: density
    of the deg>k induced subgraph at k in {2,4,8,16} — node-bounded
    degree table broadcast, one counting map over the distinct edge
    stream, integers end to end (stages/graph.py:rich_club)."""
    from ..stages.graph import rich_club

    return rich_club(_copurchase_edges(sf_dir), ks=list(RICH_KS))


def _sql_richclub() -> str:
    ks = ", ".join(str(k) for k in RICH_KS)
    return f"""WITH
{_sql_copurchase_deg()},
ks AS (SELECT unnest([{ks}]) AS k),
f AS (SELECT ks.k,
        CAST((SELECT COUNT(*) FROM deg WHERE d > ks.k) AS BIGINT) AS n_k,
        CAST((SELECT COUNT(*) FROM pairs p
              JOIN deg a ON a.node = p.u JOIN deg b ON b.node = p.v
              WHERE LEAST(a.d, b.d) > ks.k) AS BIGINT) AS e_k
      FROM ks)
SELECT CAST(k AS BIGINT) AS k, n_k, e_k,
       CASE WHEN n_k >= 2 THEN
         CAST(2 * e_k AS DOUBLE) / CAST(n_k * (n_k - 1) AS DOUBLE)
       ELSE NULL END AS phi
FROM f"""


def q_plaw(sf_dir: str):
    """Quantized-ln MLE power-law exponent of the co-purchase degree
    distribution (deterministic CSN variant): integer per-degree terms
    floor(ln(d)*2^16), one float finale — math.log == DuckDB ln on
    this glibc (stages/graph.py:powerlaw_alpha)."""
    from ..stages.graph import powerlaw_alpha

    return powerlaw_alpha(_copurchase_edges(sf_dir), dmin=PLAW_DMIN,
                          ln_scale=PLAW_LNSCALE)


def _sql_plaw() -> str:
    import math

    lqmin = math.floor(math.log(float(PLAW_DMIN)) * float(PLAW_LNSCALE))
    return f"""WITH
{_sql_copurchase_deg()},
q AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(CAST(FLOOR(ln(CAST(d AS DOUBLE))
                                 * {PLAW_LNSCALE}.0) AS BIGINT)
                      - {lqmin}) AS BIGINT) AS denom
      FROM deg WHERE d >= {PLAW_DMIN})
SELECT CAST({PLAW_DMIN} AS BIGINT) AS dmin, m, denom,
       CASE WHEN denom > 0 THEN
         1.0 + (CAST(m AS DOUBLE) * {PLAW_LNSCALE}.0)
               / CAST(denom AS DOUBLE)
       ELSE NULL END AS alpha
FROM q"""


CN_MAX_DEG = 16
CN_MIN_COMMON = 2


def q_common_neighbors(sf_dir: str):
    """Link-prediction feature: common-neighbor counts for part pairs in
    the qty >= 40 co-purchase graph — wedges enumerated only at centers
    with degree <= 16 (hub guard, identical on both sides), one bucketed
    self-join + combiner-first pair sum
    (stages/graph.py:common_neighbors)."""
    import pandas as pd

    from ..stages.bucketed import bucketed_groupby
    from ..stages.graph import common_neighbors

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_quantity"])
    lines = li.map_batches(
        lambda b: b.filter(
            pc.greater_equal(b.column("l_quantity"),
                             pa.scalar(float(TRI_QTY_MIN)))
        ).select(["l_orderkey", "l_partkey"]),
        batch_format="pyarrow",
    )

    def pair_expand(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["l_orderkey", "l_partkey"])
        m = g.merge(g, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"src": m["l_partkey_x"].to_numpy(),
                             "dst": m["l_partkey_y"].to_numpy()})

    prs = bucketed_groupby(lines, ["l_orderkey"], pair_expand, n_buckets=16)
    return common_neighbors(prs, max_degree=CN_MAX_DEG,
                            min_common=CN_MIN_COMMON)


def q_link_pred(sf_dir: str):
    """Link-prediction SCORES on top of the common-neighbor counts:
    Jaccard coefficient n_common / (deg_u + deg_v - n_common) — one
    int64 division, correctly-rounded double on both sides — and
    preferential attachment deg_u * deg_v, joined onto the surviving
    pairs via the broadcast degree table (node-bounded via ray.put;
    bucketed double-join above the threshold)
    (stages/graph.py:common_neighbors(scores=True))."""
    import pandas as pd

    from ..stages.bucketed import bucketed_groupby
    from ..stages.graph import common_neighbors

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_quantity"])
    lines = li.map_batches(
        lambda b: b.filter(
            pc.greater_equal(b.column("l_quantity"),
                             pa.scalar(float(TRI_QTY_MIN)))
        ).select(["l_orderkey", "l_partkey"]),
        batch_format="pyarrow",
    )

    def pair_expand(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["l_orderkey", "l_partkey"])
        m = g.merge(g, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"src": m["l_partkey_x"].to_numpy(),
                             "dst": m["l_partkey_y"].to_numpy()})

    prs = bucketed_groupby(lines, ["l_orderkey"], pair_expand, n_buckets=16)
    return common_neighbors(prs, max_degree=CN_MAX_DEG,
                            min_common=CN_MIN_COMMON, scores=True)


def _sql_link_pred() -> str:
    return f"""WITH
lines AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
          FROM lineitem WHERE l_quantity >= {TRI_QTY_MIN}),
pairs AS (SELECT DISTINCT a.pk AS u, b.pk AS v
          FROM lines a JOIN lines b ON a.ok = b.ok AND a.pk < b.pk),
adj AS (SELECT u AS z, v AS nb FROM pairs
        UNION ALL SELECT v AS z, u AS nb FROM pairs),
deg AS (SELECT z, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY 1),
ok_z AS (SELECT z FROM deg WHERE d <= {CN_MAX_DEG}),
w AS (SELECT a.nb AS u, b2.nb AS v
      FROM adj a JOIN adj b2 ON a.z = b2.z AND a.nb < b2.nb
      WHERE a.z IN (SELECT z FROM ok_z)),
cn AS (SELECT u, v, CAST(COUNT(*) AS BIGINT) AS n_common
       FROM w GROUP BY 1, 2)
SELECT cn.u, cn.v, cn.n_common,
       CAST(cn.n_common AS DOUBLE)
         / CAST(du.d + dv.d - cn.n_common AS DOUBLE) AS jaccard,
       du.d * dv.d AS pa_score
FROM cn JOIN deg du ON du.z = cn.u JOIN deg dv ON dv.z = cn.v
WHERE cn.n_common >= {CN_MIN_COMMON}"""


def _sql_common_neighbors() -> str:
    return f"""WITH
lines AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
          FROM lineitem WHERE l_quantity >= {TRI_QTY_MIN}),
pairs AS (SELECT DISTINCT a.pk AS u, b.pk AS v
          FROM lines a JOIN lines b ON a.ok = b.ok AND a.pk < b.pk),
adj AS (SELECT u AS z, v AS nb FROM pairs
        UNION ALL SELECT v AS z, u AS nb FROM pairs),
deg AS (SELECT z, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY 1),
ok_z AS (SELECT z FROM deg WHERE d <= {CN_MAX_DEG}),
w AS (SELECT a.nb AS u, b2.nb AS v
      FROM adj a JOIN adj b2 ON a.z = b2.z AND a.nb < b2.nb
      WHERE a.z IN (SELECT z FROM ok_z)),
cn AS (SELECT u, v, CAST(COUNT(*) AS BIGINT) AS n_common
       FROM w GROUP BY 1, 2)
SELECT u, v, n_common FROM cn WHERE n_common >= {CN_MIN_COMMON}"""


def q_adamic(sf_dir: str):
    """Adamic–Adar + resource-allocation link-prediction scores over
    the same part co-purchase graph as link_pred: per surviving pair
    Σ 1/ln(deg z) and Σ 1/deg z over the shared-neighbor centers z,
    VALUE-CHECKED floats — per-center weights are the QUANTIZED ints
    floor(2^16/ln d) (constants precomputed with math.log == DuckDB ln
    and inlined in the SQL CASE, the ndcg discipline) and 2^16//d, so
    the per-pair sums are order-free int64 and the float scores are one
    exact /65536.0 rescale (stages/graph.py:common_neighbors(aa=True))."""
    import pandas as pd

    from ..stages.bucketed import bucketed_groupby
    from ..stages.graph import common_neighbors

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_quantity"])
    lines = li.map_batches(
        lambda b: b.filter(
            pc.greater_equal(b.column("l_quantity"),
                             pa.scalar(float(TRI_QTY_MIN)))
        ).select(["l_orderkey", "l_partkey"]),
        batch_format="pyarrow",
    )

    def pair_expand(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["l_orderkey", "l_partkey"])
        m = g.merge(g, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"src": m["l_partkey_x"].to_numpy(),
                             "dst": m["l_partkey_y"].to_numpy()})

    prs = bucketed_groupby(lines, ["l_orderkey"], pair_expand, n_buckets=16)
    return common_neighbors(prs, max_degree=CN_MAX_DEG,
                            min_common=CN_MIN_COMMON, aa=True)


def _sql_adamic() -> str:
    import math

    waa_case = " ".join(
        f"WHEN {d} THEN {int((1 << 16) / math.log(d))}"
        for d in range(2, CN_MAX_DEG + 1))
    return f"""WITH
lines AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
          FROM lineitem WHERE l_quantity >= {TRI_QTY_MIN}),
pairs AS (SELECT DISTINCT a.pk AS u, b.pk AS v
          FROM lines a JOIN lines b ON a.ok = b.ok AND a.pk < b.pk),
adj AS (SELECT u AS z, v AS nb FROM pairs
        UNION ALL SELECT v AS z, u AS nb FROM pairs),
deg AS (SELECT z, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY 1),
wt AS (SELECT z, CAST(CASE d {waa_case} ELSE 0 END AS BIGINT) AS waa,
              CAST(65536 // d AS BIGINT) AS wra
       FROM deg WHERE d <= {CN_MAX_DEG}),
w AS (SELECT a.nb AS u, b2.nb AS v, wt.waa AS waa, wt.wra AS wra
      FROM adj a JOIN adj b2 ON a.z = b2.z AND a.nb < b2.nb
      JOIN wt ON wt.z = a.z),
cn AS (SELECT u, v, CAST(COUNT(*) AS BIGINT) AS n_common,
              CAST(SUM(waa) AS BIGINT) AS aa_q,
              CAST(SUM(wra) AS BIGINT) AS ra_q
       FROM w GROUP BY 1, 2)
SELECT u, v, n_common, aa_q, ra_q,
       CAST(aa_q AS DOUBLE) / 65536.0 AS aa,
       CAST(ra_q AS DOUBLE) / 65536.0 AS ra
FROM cn WHERE n_common >= {CN_MIN_COMMON}"""


STRESS_QTY_MIN = 35   # the kcore-density co-purchase graph
STRESS_K = 6          # sampled-pivot seed count (top-K-degree hubs)
STRESS_HOPS = 3


def q_stress(sf_dir: str):
    """STRESS centrality (Shimbel 1953 — the all-integer betweenness
    sibling): number of shortest paths THROUGH each node, over the
    top-6-degree hub seed pairs of the part co-purchase graph, paths
    <= 3 hops.  Layered BFS path counts sigma_sv are exact integer
    sums over predecessors (order-free), the combine is
    sigma_sv * sigma_tv where d_sv + d_tv = d_st — every quantity
    int64, so the chained-CTE oracle matches bit for bit
    (stages/graph.py:stress_centrality; Brandes' rational dependency
    accumulation is deliberately avoided)."""
    import pandas as pd

    from ..stages.bucketed import bucketed_groupby
    from ..stages.graph import stress_centrality

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_quantity"])
    lines = li.map_batches(
        lambda b: b.filter(
            pc.greater_equal(b.column("l_quantity"),
                             pa.scalar(float(STRESS_QTY_MIN)))
        ).select(["l_orderkey", "l_partkey"]),
        batch_format="pyarrow",
    )

    def pair_expand(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["l_orderkey", "l_partkey"])
        m = g.merge(g, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"src": m["l_partkey_x"].to_numpy(),
                             "dst": m["l_partkey_y"].to_numpy()})

    prs = bucketed_groupby(lines, ["l_orderkey"], pair_expand, n_buckets=16)
    return stress_centrality(prs, n_seeds=STRESS_K, max_hops=STRESS_HOPS)


def _sql_sigma_bfs_ctes() -> str:
    """Shared sigma-BFS CTE chain (co-purchase graph, top-K hub seeds,
    layered path counting up to r{STRESS_HOPS}) — consumed by both the
    stress and seed_reach finales."""
    K, D = STRESS_K, STRESS_HOPS
    ctes = [f"""lines AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
          FROM lineitem WHERE l_quantity >= {STRESS_QTY_MIN}),
pairs AS (SELECT DISTINCT a.pk AS u, b.pk AS v
          FROM lines a JOIN lines b ON a.ok = b.ok AND a.pk < b.pk),
adj AS MATERIALIZED (SELECT u AS z, v AS nb FROM pairs
     UNION ALL SELECT v AS z, u AS nb FROM pairs),
degs AS (SELECT z, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY 1),
seeds AS MATERIALIZED (SELECT z AS s FROM degs
     ORDER BY d DESC, z LIMIT {K}),
f0 AS MATERIALIZED (SELECT s, s AS v, CAST(1 AS BIGINT) AS sig
     FROM seeds),
r0 AS MATERIALIZED (SELECT s, v, CAST(0 AS BIGINT) AS d, sig FROM f0)"""]
    for i in range(1, D + 1):
        ctes.append(f"""f{i} AS MATERIALIZED (
  SELECT f.s, a.nb AS v, CAST(SUM(f.sig) AS BIGINT) AS sig
  FROM f{i - 1} f JOIN adj a ON a.z = f.v
  LEFT JOIN r{i - 1} r ON r.s = f.s AND r.v = a.nb
  WHERE r.v IS NULL GROUP BY 1, 2),
r{i} AS MATERIALIZED (SELECT * FROM r{i - 1}
  UNION ALL SELECT s, v, CAST({i} AS BIGINT) AS d, sig FROM f{i})""")
    return "WITH " + ",\n".join(ctes)


def _sql_stress() -> str:
    D = STRESS_HOPS
    return (_sql_sigma_bfs_ctes() + f""",
pdist AS MATERIALIZED (SELECT r.s AS s, r.v AS t, r.d AS d_st
    FROM r{D} r JOIN seeds t2 ON t2.s = r.v WHERE r.s < r.v)
SELECT a.v AS node, CAST(SUM(a.sig * b.sig) AS BIGINT) AS stress
FROM r{D} a JOIN r{D} b ON b.v = a.v AND a.s < b.s
JOIN pdist p ON p.s = a.s AND p.t = b.s AND p.d_st = a.d + b.d
WHERE a.v <> a.s AND a.v <> b.s
GROUP BY 1""")


def q_seed_reach(sf_dir: str):
    """Per-hub bounded-hop reach panel over the SAME sigma BFS as
    ``stress``: eccentricity within 3 hops, reached-node count and
    total shortest-path count per top-6-degree seed — the crawl-
    frontier / influence health check (stages/graph.py:seed_reach).
    All int64, value-checked against the shared CTE chain."""
    import pandas as pd

    from ..stages.bucketed import bucketed_groupby
    from ..stages.graph import seed_reach

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_quantity"])
    lines = li.map_batches(
        lambda b: b.filter(
            pc.greater_equal(b.column("l_quantity"),
                             pa.scalar(float(STRESS_QTY_MIN)))
        ).select(["l_orderkey", "l_partkey"]),
        batch_format="pyarrow",
    )

    def pair_expand(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["l_orderkey", "l_partkey"])
        m = g.merge(g, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"src": m["l_partkey_x"].to_numpy(),
                             "dst": m["l_partkey_y"].to_numpy()})

    prs = bucketed_groupby(lines, ["l_orderkey"], pair_expand, n_buckets=16)
    return seed_reach(prs, n_seeds=STRESS_K, max_hops=STRESS_HOPS)


def _sql_seed_reach() -> str:
    return (_sql_sigma_bfs_ctes() + f"""
SELECT s AS seed, CAST(MAX(d) AS BIGINT) AS ecc,
       CAST(COUNT(*) AS BIGINT) AS n_reached,
       CAST(SUM(sig) AS BIGINT) AS n_paths
FROM r{STRESS_HOPS} GROUP BY 1""")


HARM_QUANT = 1 << 16


def q_harmonic(sf_dir: str):
    """Bounded-hop HARMONIC centrality of the top-degree hubs over the
    same co-purchase sigma BFS as stress/seed_reach: Σ 1/d over nodes
    within 3 hops with 1/d QUANTIZED as 65536 // d (integer sums are
    order-free; the float is one shared /65536.0)
    (stages/graph.py:harmonic_centrality)."""
    import pandas as pd

    from ..stages.bucketed import bucketed_groupby
    from ..stages.graph import harmonic_centrality

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_quantity"])
    lines = li.map_batches(
        lambda b: b.filter(
            pc.greater_equal(b.column("l_quantity"),
                             pa.scalar(float(STRESS_QTY_MIN)))
        ).select(["l_orderkey", "l_partkey"]),
        batch_format="pyarrow",
    )

    def pair_expand(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["l_orderkey", "l_partkey"])
        m = g.merge(g, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"src": m["l_partkey_x"].to_numpy(),
                             "dst": m["l_partkey_y"].to_numpy()})

    prs = bucketed_groupby(lines, ["l_orderkey"], pair_expand, n_buckets=16)
    return harmonic_centrality(prs, n_seeds=STRESS_K,
                               max_hops=STRESS_HOPS, quant=HARM_QUANT)


def _sql_harmonic() -> str:
    q = HARM_QUANT
    return (_sql_sigma_bfs_ctes() + f"""
SELECT s AS seed,
       CAST(COUNT(CASE WHEN d >= 1 THEN 1 END) AS BIGINT) AS n_reached,
       CAST(COALESCE(SUM(CASE WHEN d >= 1 THEN {q} // d END), 0)
            AS BIGINT) AS h_q,
       CAST(COALESCE(SUM(CASE WHEN d >= 1 THEN {q} // d END), 0)
            AS BIGINT) / {float(q)!r} AS harmonic
FROM r{STRESS_HOPS} GROUP BY 1""")


EDIT_JOIN_K = 2


def q_edit_join(sf_dir: str):
    """Blocked EDIT-DISTANCE similarity self-join over part names
    (the classic ER step): all within-brand pairs within 2 unit-cost
    Levenshtein edits, DP fully vectorized over the pair arrays —
    VALUE-checked against DuckDB's levenshtein()
    (stages/fuzzy.py:edit_distance_join)."""
    from ..stages.fuzzy import edit_distance_join

    parts = _read(sf_dir, "part", ["p_partkey", "p_name", "p_brand"])
    return edit_distance_join(parts, id_col="p_partkey",
                              text_col="p_name", block_col="p_brand",
                              max_dist=EDIT_JOIN_K)


def _sql_edit_join() -> str:
    return f"""
SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
FROM part a JOIN part b
ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= {EDIT_JOIN_K}"""


def q_closeness(sf_dir: str):
    """Bounded-hop CLOSENESS centrality of the top-degree hubs over the
    same co-purchase sigma BFS as stress/harmonic: n_reached and
    d_sum = Σ d are exact integers (order-free sums); closeness =
    n_reached / d_sum is the one shared float division
    (stages/graph.py:closeness_centrality)."""
    import pandas as pd

    from ..stages.bucketed import bucketed_groupby
    from ..stages.graph import closeness_centrality

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_quantity"])
    lines = li.map_batches(
        lambda b: b.filter(
            pc.greater_equal(b.column("l_quantity"),
                             pa.scalar(float(STRESS_QTY_MIN)))
        ).select(["l_orderkey", "l_partkey"]),
        batch_format="pyarrow",
    )

    def pair_expand(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["l_orderkey", "l_partkey"])
        m = g.merge(g, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"src": m["l_partkey_x"].to_numpy(),
                             "dst": m["l_partkey_y"].to_numpy()})

    prs = bucketed_groupby(lines, ["l_orderkey"], pair_expand, n_buckets=16)
    return closeness_centrality(prs, n_seeds=STRESS_K,
                                max_hops=STRESS_HOPS)


def _sql_closeness() -> str:
    return (_sql_sigma_bfs_ctes() + f"""
SELECT s AS seed,
       CAST(COUNT(CASE WHEN d >= 1 THEN 1 END) AS BIGINT) AS n_reached,
       CAST(COALESCE(SUM(CASE WHEN d >= 1 THEN d END), 0)
            AS BIGINT) AS d_sum,
       CASE WHEN COALESCE(SUM(CASE WHEN d >= 1 THEN d END), 0) > 0
            THEN CAST(COUNT(CASE WHEN d >= 1 THEN 1 END) AS DOUBLE)
                 / CAST(SUM(CASE WHEN d >= 1 THEN d END) AS DOUBLE)
            ELSE 0.0 END AS closeness
FROM r{STRESS_HOPS} GROUP BY 1""")


def q_butterfly(sf_dir: str):
    """Exact BUTTERFLY (4-cycle) census of the bipartite
    customer-supplier trade graph: butterflies Σ C(codeg,2),
    caterpillars Σ (da-1)(db-1) per edge, bipartite clustering 4B/C —
    wedge centers on the cheaper side (identical counts either side),
    combiner-first pair reduce (stages/graph.py:butterfly_count)."""
    from ..stages.graph import butterfly_count, distinct_tuples
    from ..stages.hashjoin import bucketed_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"]).map_batches(
        lambda b: b.rename_columns(["o_orderkey", "l_suppkey"]),
        batch_format="pyarrow",
    )
    pairs = bucketed_join(li, orders, ["o_orderkey"])

    def to_nodes(b: pa.Table) -> pa.Table:
        c = b.column("o_custkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        s = b.column("l_suppkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({"src": pa.array(c * 2), "dst": pa.array(s * 2 + 1)})

    bip = distinct_tuples(
        pairs.map_batches(to_nodes, batch_format="pyarrow"),
        ["src", "dst"])
    return butterfly_count(bip)


def _sql_butterfly() -> str:
    return """
WITH pairs AS (SELECT DISTINCT o.o_custkey * 2 AS a,
                      l.l_suppkey * 2 + 1 AS b
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
da AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS d FROM pairs GROUP BY 1),
db AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS d FROM pairs GROUP BY 1),
codeg AS MATERIALIZED (SELECT p.b AS u, q.b AS v,
                              CAST(COUNT(*) AS HUGEINT) AS c
  FROM pairs p JOIN pairs q ON q.a = p.a AND p.b < q.b GROUP BY 1, 2),
bf AS (SELECT COALESCE(SUM(c * (c - 1) // 2), 0) AS bfv FROM codeg),
cat AS (SELECT COALESCE(SUM(CAST(x.d - 1 AS HUGEINT) * (y.d - 1)), 0)
               AS cv
  FROM pairs p JOIN da x ON x.a = p.a JOIN db y ON y.b = p.b)
SELECT CAST(bfv AS BIGINT) AS butterflies,
       CAST(cv AS BIGINT) AS caterpillars,
       CASE WHEN cv > 0 THEN
         CAST(4 * bfv AS DOUBLE) / CAST(cv AS DOUBLE)
       ELSE NULL END AS bf_cc
FROM bf, cat"""


MST_ROUNDS = 16


def q_mst(sf_dir: str):
    """Borůvka MINIMUM SPANNING FOREST of the weighted trade graph
    (w = lineitem count per customer-supplier pair): per round each
    component's champion edge under the TOTAL order (w, u, v) joins
    the forest, components contract (hook + 2-cycle break + pointer
    jumping); the total order makes the forest unique, so the
    chained-CTE oracle (with a recursive root-resolution walk per
    round) matches exactly (stages/graph.py:minimum_spanning_forest)."""
    from ..stages.graph import minimum_spanning_forest

    return minimum_spanning_forest(_trade_edges_weighted(sf_dir),
                                   rounds=MST_ROUNDS)


def _sql_mst() -> str:
    ctes = [
        _SQL_GRAPH_EDGES_W,
        ("uedges AS MATERIALIZED (SELECT LEAST(cnode, snode) AS u, "
         "GREATEST(cnode, snode) AS v, w FROM pairs)"),
        ("cc0 AS MATERIALIZED (SELECT node, node AS comp FROM ("
         "SELECT u AS node FROM uedges UNION SELECT v FROM uedges))"),
    ]
    for r in range(1, MST_ROUNDS + 1):
        ctes.append(f"""x{r} AS MATERIALIZED (
  SELECT a.comp AS cu, b.comp AS cv, e.w, e.u, e.v
  FROM uedges e JOIN cc{r - 1} a ON a.node = e.u
  JOIN cc{r - 1} b ON b.node = e.v
  WHERE a.comp <> b.comp),
s{r} AS MATERIALIZED (
  SELECT comp, w, u, v, tgt FROM (
    SELECT cu AS comp, w, u, v, cv AS tgt FROM x{r}
    UNION ALL SELECT cv, w, u, v, cu FROM x{r})
  QUALIFY ROW_NUMBER() OVER (PARTITION BY comp ORDER BY w, u, v) = 1),
f{r} AS MATERIALIZED (SELECT DISTINCT u, v, w FROM s{r}),
p{r} AS MATERIALIZED (
  SELECT c.comp,
    CASE WHEN s.tgt IS NULL THEN c.comp
         WHEN t.tgt = c.comp AND c.comp < s.tgt THEN c.comp
         ELSE s.tgt END AS par
  FROM (SELECT DISTINCT comp FROM cc{r - 1}) c
  LEFT JOIN s{r} s ON s.comp = c.comp
  LEFT JOIN s{r} t ON t.comp = s.tgt),
walk{r}(comp, cur) AS (
  SELECT comp, par FROM p{r}
  UNION ALL
  SELECT k.comp, p.par FROM walk{r} k JOIN p{r} p ON p.comp = k.cur
  WHERE p.par <> k.cur),
root{r} AS MATERIALIZED (
  SELECT k.comp, k.cur AS root FROM walk{r} k
  JOIN p{r} p ON p.comp = k.cur WHERE p.par = k.cur),
cc{r} AS MATERIALIZED (
  SELECT c.node, t.root AS comp FROM cc{r - 1} c
  JOIN root{r} t ON t.comp = c.comp)""")
    finals = " UNION ALL ".join(
        f"SELECT u, v, w FROM f{r}" for r in range(1, MST_ROUNDS + 1))
    return "WITH RECURSIVE " + ",\n".join(ctes) + "\n" + finals


MIS_ROUNDS = 6


def q_mis(sf_dir: str):
    """Deterministic Luby MAXIMAL INDEPENDENT SET over the symmetric
    trade graph: tie-free 63-bit BIJECTIVE priorities (mulrot63), 6
    fixed rounds (winner = strictly smallest priority in its alive
    neighborhood; winners + neighbors leave), broadcast/bucketed dual
    paths (stages/graph.py:maximal_independent_set)."""
    from ..stages.graph import maximal_independent_set

    return maximal_independent_set(_trade_edges(sf_dir),
                                   rounds=MIS_ROUNDS)


def _sql_mis() -> str:
    from ..functions.hashing import sql_mulrot63_ctes

    ctes = [
        _SQL_GRAPH_EDGES,
        "nodes AS (SELECT DISTINCT src AS v FROM edges)",
        sql_mulrot63_ctes("nodes", "v", "CAST(v AS HUGEINT)"),
        "a0 AS MATERIALIZED (SELECT v, h FROM mh63)",
    ]
    for r in range(1, MIS_ROUNDS + 1):
        ctes.append(f"""n{r} AS MATERIALIZED (
  SELECT e.dst AS v, MIN(x.h) AS m FROM edges e
  JOIN a{r - 1} x ON x.v = e.src
  JOIN a{r - 1} y ON y.v = e.dst
  WHERE e.src <> e.dst GROUP BY 1),
w{r} AS MATERIALIZED (
  SELECT a.v FROM a{r - 1} a LEFT JOIN n{r} n ON n.v = a.v
  WHERE n.m IS NULL OR a.h < n.m),
d{r} AS MATERIALIZED (
  SELECT DISTINCT e.dst AS v FROM edges e JOIN w{r} w ON w.v = e.src),
a{r} AS MATERIALIZED (
  SELECT a.v, a.h FROM a{r - 1} a
  WHERE a.v NOT IN (SELECT v FROM w{r})
    AND a.v NOT IN (SELECT v FROM d{r}))""")
    finals = " UNION ALL ".join(
        f"SELECT v AS node, CAST({r} AS BIGINT) AS round FROM w{r}"
        for r in range(1, MIS_ROUNDS + 1))
    return "WITH " + ",\n".join(ctes) + "\n" + finals


KCORE_K = 3
KCORE_ROUNDS = 5
KCORE_QTY_MIN = 35  # denser co-purchase graph than the triangle query


def q_kcore(sf_dir: str):
    """Synchronous 3-core peeling (5 fixed rounds) of the part
    co-purchase graph: per round two bucketed SEMI joins keep edges with
    both endpoints alive, one combiner-first degree reduce, drop deg < 3
    (stages/graph.py:kcore).  Survivors + within-core degree, mirrored
    round-for-round by chained CTEs."""
    import pandas as pd

    from ..stages.bucketed import bucketed_groupby
    from ..stages.graph import kcore

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_quantity"])
    lines = li.map_batches(
        lambda b: b.filter(
            pc.greater_equal(b.column("l_quantity"),
                             pa.scalar(float(KCORE_QTY_MIN)))
        ).select(["l_orderkey", "l_partkey"]),
        batch_format="pyarrow",
    )

    def pair_expand(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["l_orderkey", "l_partkey"])
        m = g.merge(g, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"src": m["l_partkey_x"].to_numpy(),
                             "dst": m["l_partkey_y"].to_numpy()})

    prs = bucketed_groupby(lines, ["l_orderkey"], pair_expand, n_buckets=16)
    return kcore(prs, k=KCORE_K, rounds=KCORE_ROUNDS)


def _sql_kcore() -> str:
    k = KCORE_K
    ctes = [f"""lines AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
          FROM lineitem WHERE l_quantity >= {KCORE_QTY_MIN}),
pairs AS (SELECT DISTINCT a.pk AS u, b.pk AS v
          FROM lines a JOIN lines b ON a.ok = b.ok AND a.pk < b.pk),
edges AS (SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs),
d1 AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS deg
       FROM edges GROUP BY 1),
s1 AS (SELECT node, deg FROM d1 WHERE deg >= {k})"""]
    for i in range(2, KCORE_ROUNDS + 1):
        ctes.append(f"""d{i} AS (
  SELECT e.u AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM edges e
  JOIN s{i - 1} a ON a.node = e.u JOIN s{i - 1} b ON b.node = e.v
  GROUP BY 1),
s{i} AS (SELECT node, deg FROM d{i} WHERE deg >= {k})""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, deg FROM s{KCORE_ROUNDS}")


SPAN_L = 30  # duplicated-substring window length (chars)


def q_dup_spans(sf_dir: str):
    """EXACT duplicated-substring spans (the suffix-array dedup family,
    Lee et al. 2022): every 30-char window occurring at >= 2 (doc, pos)
    locations corpus-wide is duplicated; per doc the duplicated windows
    merge into maximal [start, end) spans (stages/substring.py:
    dup_spans — grouping on the window TEXT itself, so no hash
    collisions; the winnowed fingerprint path is the 100-TB variant,
    guarantee-tested in tests/test_substring.py)."""
    from ..stages.substring import dup_spans

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return dup_spans(docs, L=SPAN_L)


def _sql_dup_span_ctes() -> str:
    L = SPAN_L
    return f"""d AS (SELECT doc_id, text, length(text) AS n
           FROM documents),
w AS (SELECT doc_id, CAST(gs - 1 AS BIGINT) AS pos,
             substr(text, CAST(gs AS INTEGER), {L}) AS gram
      FROM d, LATERAL unnest(range(1, greatest(n - {L - 1}, 0) + 1)) t(gs)),
dup AS (SELECT doc_id, pos FROM (
          SELECT doc_id, pos,
                 COUNT(*) OVER (PARTITION BY gram) AS cnt FROM w)
        WHERE cnt >= 2),
brk AS (SELECT doc_id, pos,
          CASE WHEN pos > COALESCE(MAX(pos + {L}) OVER (
                 PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
               THEN 1 ELSE 0 END AS b
        FROM dup),
isl AS (SELECT doc_id, pos,
          SUM(b) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        FROM brk)"""


def _sql_dup_spans() -> str:
    L = SPAN_L
    return (f"WITH {_sql_dup_span_ctes()}\n"
            f"SELECT doc_id, MIN(pos) AS span_start, "
            f"MAX(pos) + {L} AS span_end\n"
            f"FROM isl GROUP BY doc_id, island")


CDC_K = 8    # CDC rolling-window length (chars)
CDC_D = 64   # CDC cut divisor (expected chunk length)


def q_cdc_chunks(sf_dir: str):
    """Content-defined chunking (Rabin/FastCDC cut rule): a cut falls
    after char p+k-1 when poly64(text[p:p+k]) % 64 == 0 — boundaries
    are local content, so edits re-chunk O(1) chunks
    (stages/substring.py:cdc_chunks — pure map_batches, no shuffle)."""
    from ..stages.substring import cdc_chunks

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return cdc_chunks(docs, k=CDC_K, divisor=CDC_D)


def q_cdc_dedup(sf_dir: str):
    """Storage-dedup accounting over the CDC chunks: one row
    (total_chunks, distinct_chunks, total_chars, distinct_chars) —
    chunk rows shuffle once bucketed on a chunk-text hash, per-bucket
    exact distinct partials, single-block finale
    (stages/substring.py:cdc_dedup_stats)."""
    from ..stages.substring import cdc_dedup_stats

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return cdc_dedup_stats(docs, k=CDC_K, divisor=CDC_D)


def _sql_cdc_ctes() -> str:
    k, d = CDC_K, CDC_D
    m = 1 << 64
    # poly64 of the k chars ending at 1-based position pe, HUGEINT mod
    # 2^64 after each multiply-add (exact uint64 wraparound mirror)
    h = f"CAST(ord(substr(text, CAST(pe - {k - 1} AS INTEGER), 1)) AS HUGEINT)"
    for i in range(k - 2, -1, -1):
        h = (f"((({h}) * 1000003 + "
             f"ord(substr(text, CAST(pe - {i} AS INTEGER), 1))) % {m})")
    return f"""d AS (SELECT doc_id, text, length(text) AS n
           FROM documents WHERE length(text) > 0),
p AS (SELECT doc_id, text, n, unnest(range({k}, n + 1)) AS pe FROM d),
cuts AS (SELECT doc_id, pe FROM p WHERE ({h}) % {d} = 0),
b AS (SELECT doc_id, pe FROM cuts
      UNION ALL SELECT doc_id, 0 AS pe FROM d),
seg AS (SELECT doc_id, pe AS s,
          LEAD(pe) OVER (PARTITION BY doc_id ORDER BY pe) AS e
        FROM b),
chunks AS (SELECT s.doc_id,
    ROW_NUMBER() OVER (PARTITION BY s.doc_id ORDER BY s.s) - 1
      AS chunk_idx,
    CAST(s.s AS BIGINT) AS chunk_start,
    substr(dd.text, CAST(s.s + 1 AS INTEGER),
           CAST(COALESCE(s.e, dd.n) - s.s AS INTEGER)) AS chunk_text
  FROM seg s JOIN d dd ON dd.doc_id = s.doc_id
  WHERE COALESCE(s.e, dd.n) > s.s)"""


def _sql_cdc_chunks() -> str:
    return (f"WITH {_sql_cdc_ctes()}\n"
            "SELECT doc_id, chunk_idx, chunk_start, chunk_text FROM chunks")


def _sql_cdc_dedup() -> str:
    return (f"WITH {_sql_cdc_ctes()}\n"
            "SELECT CAST(COUNT(*) AS BIGINT) AS total_chunks,\n"
            "  CAST(COUNT(DISTINCT chunk_text) AS BIGINT) AS distinct_chunks,\n"
            "  CAST(SUM(length(chunk_text)) AS BIGINT) AS total_chars,\n"
            "  (SELECT CAST(SUM(length(t)) AS BIGINT) FROM\n"
            "     (SELECT DISTINCT chunk_text AS t FROM chunks))\n"
            "    AS distinct_chars\n"
            "FROM chunks")


SPAN_W = 8  # winnowing window for the restricted exact pass


def q_winnow_spans(sf_dir: str):
    """dup_spans' VERIFIED SCALE PATH: a winnowed fingerprint pass
    (grams of L-w+1 chars, window w — SWA-2003 guarantee covers every
    match >= L) selects CANDIDATE docs; the exact window pass runs only
    over those docs (stages/substring.py:winnow_restrict_dup_spans).
    Bit-identical to dup_spans by the coverage guarantee, so it shares
    its oracle — the point of the entry is that the driver verifies the
    restriction is lossless, not just the exact operator."""
    from ..stages.substring import winnow_restrict_dup_spans

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return winnow_restrict_dup_spans(docs, L=SPAN_L, w=SPAN_W)


def q_strip_spans(sf_dir: str):
    """Duplicated-substring REMOVAL (the cleaning step over dup_spans —
    the Lee et al. 'drop duplicated substrings' variant, all copies
    removed): per doc the clean text is the concatenation of the gaps
    between its maximal duplicated spans
    (stages/substring.py:strip_dup_spans)."""
    from ..stages.substring import strip_dup_spans

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return strip_dup_spans(docs, L=SPAN_L)


def _sql_strip_spans() -> str:
    L = SPAN_L
    return f"""WITH {_sql_dup_span_ctes()},
spans AS (SELECT doc_id, MIN(pos) AS s, MAX(pos) + {L} AS e
          FROM isl GROUP BY doc_id, island),
gap1 AS (SELECT doc_id,
           COALESCE(LAG(e) OVER (PARTITION BY doc_id ORDER BY s), 0) AS gs,
           s AS ge
         FROM spans),
gap2 AS (SELECT sp.doc_id, MAX(sp.e) AS gs, CAST(MAX(dd.n) AS BIGINT) AS ge
         FROM spans sp JOIN d dd ON dd.doc_id = sp.doc_id
         GROUP BY sp.doc_id),
gaps AS (SELECT * FROM gap1 UNION ALL SELECT * FROM gap2),
cleaned AS (SELECT g.doc_id,
    string_agg(substr(dd.text, CAST(g.gs + 1 AS INTEGER),
                      CAST(g.ge - g.gs AS INTEGER)), '' ORDER BY g.gs) AS ct
  FROM gaps g JOIN d dd ON dd.doc_id = g.doc_id GROUP BY g.doc_id)
SELECT dd.doc_id, COALESCE(c.ct, dd.text) AS clean_text,
       CAST(dd.n - length(COALESCE(c.ct, dd.text)) AS BIGINT)
         AS removed_chars
FROM d dd LEFT JOIN cleaned c ON c.doc_id = dd.doc_id"""


LPA_ROUNDS = 2


def q_lpa(sf_dir: str):
    """Synchronous label-propagation community detection (2 fixed
    rounds) over the part co-purchase graph: every node adopts its
    neighbors' most frequent previous label, ties -> smallest label
    (stages/graph.py:label_propagation — broadcast labels via ray.put,
    edges never re-shuffle; bucketed BSP path above the threshold)."""
    from ..stages.graph import label_propagation

    return label_propagation(_lpa_edges(sf_dir), rounds=LPA_ROUNDS)


def _sql_lpa_ctes() -> str:
    """Shared co-purchase-graph LPA chain; final CTE ``lab{LPA_ROUNDS}``
    holds (node, lab), ``pairs`` the canonical u<v edge set."""
    ctes = [f"""lines AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
          FROM lineitem WHERE l_quantity >= {KCORE_QTY_MIN}),
pairs AS (SELECT DISTINCT a.pk AS u, b.pk AS v
          FROM lines a JOIN lines b ON a.ok = b.ok AND a.pk < b.pk),
edges AS (SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs),
lab0 AS (SELECT DISTINCT u AS node, u AS lab FROM edges)"""]
    for i in range(1, LPA_ROUNDS + 1):
        ctes.append(f"""v{i} AS (
  SELECT e.u AS node, l.lab AS lab, CAST(COUNT(*) AS BIGINT) AS c
  FROM edges e JOIN lab{i - 1} l ON l.node = e.v GROUP BY 1, 2),
lab{i} AS (SELECT node, lab FROM (
  SELECT node, lab,
         ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, lab)
           AS rn
  FROM v{i}) WHERE rn = 1)""")
    return ",\n".join(ctes)


def _sql_lpa() -> str:
    return ("WITH " + _sql_lpa_ctes()
            + f"\nSELECT node, lab FROM lab{LPA_ROUNDS}")


def _lpa_edges(sf_dir: str):
    """The LPA co-purchase pair table (shared by q_lpa / q_modularity)."""
    import pandas as pd

    from ..stages.bucketed import bucketed_groupby

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey",
                                    "l_quantity"])
    lines = li.map_batches(
        lambda b: b.filter(
            pc.greater_equal(b.column("l_quantity"),
                             pa.scalar(float(KCORE_QTY_MIN)))
        ).select(["l_orderkey", "l_partkey"]),
        batch_format="pyarrow",
    )

    def pair_expand(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["l_orderkey", "l_partkey"])
        m = g.merge(g, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"src": m["l_partkey_x"].to_numpy(),
                             "dst": m["l_partkey_y"].to_numpy()})

    return bucketed_groupby(lines, ["l_orderkey"], pair_expand,
                            n_buckets=16)


def q_modularity(sf_dir: str):
    """Community-quality evaluation: per-community Newman-modularity /
    conductance sufficient statistics (n_nodes, within-edges, degree
    sum, cut, exact-integer q_num over the shared 4m² denominator) for
    the label-propagation partition of the part co-purchase graph —
    the metric loop every community-detection pipeline runs after
    clustering (stages/graph.py:community_stats; broadcast labels via
    ray.put below the node threshold, bucketed endpoint-tag joins
    above; integer arithmetic end to end)."""
    from ..stages.graph import community_stats, label_propagation

    edges = _lpa_edges(sf_dir).materialize()
    labs = label_propagation(edges, rounds=LPA_ROUNDS)
    return community_stats(edges, labs)


def _sql_modularity() -> str:
    R = LPA_ROUNDS
    return f"""WITH {_sql_lpa_ctes()},
mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM pairs),
tag AS (SELECT la.lab AS lu, lb.lab AS lv FROM pairs p
        JOIN lab{R} la ON la.node = p.u
        JOIN lab{R} lb ON lb.node = p.v),
ein AS (SELECT lu AS lab, CAST(COUNT(*) AS BIGINT) AS e_in
        FROM tag WHERE lu = lv GROUP BY 1),
deg AS (SELECT lab, CAST(COUNT(*) AS BIGINT) AS deg_sum FROM
        (SELECT lu AS lab FROM tag UNION ALL SELECT lv AS lab FROM tag)
        GROUP BY 1),
nn AS (SELECT lab, CAST(COUNT(*) AS BIGINT) AS n_nodes
       FROM lab{R} GROUP BY 1)
SELECT nn.lab, nn.n_nodes,
       COALESCE(e.e_in, 0) AS e_in,
       COALESCE(d.deg_sum, 0) AS deg_sum,
       COALESCE(d.deg_sum, 0) - 2 * COALESCE(e.e_in, 0) AS cut,
       4 * m.m * COALESCE(e.e_in, 0)
         - COALESCE(d.deg_sum, 0) * COALESCE(d.deg_sum, 0) AS q_num
FROM nn LEFT JOIN ein e ON e.lab = nn.lab
LEFT JOIN deg d ON d.lab = nn.lab CROSS JOIN mm m"""


KTRUSS_K = 4
KTRUSS_ROUNDS = 2
KTRUSS_QTY_MIN = 40  # same co-purchase graph as the triangle query


def q_ktruss(sf_dir: str):
    """Synchronous 4-truss peeling (2 fixed rounds) of the part
    co-purchase graph: per round a degree-oriented wedge enumeration
    (hub guard) closes triangles with the wedge center carried through,
    each triangle explodes to its three canonical edges, a combiner-
    first bucketed sum yields per-edge support, edges with support <
    k-2 drop (stages/graph.py:ktruss).  Chained-CTE oracle mirrors it
    round for round."""
    import pandas as pd

    from ..stages.bucketed import bucketed_groupby
    from ..stages.graph import ktruss

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_quantity"])
    lines = li.map_batches(
        lambda b: b.filter(
            pc.greater_equal(b.column("l_quantity"),
                             pa.scalar(float(KTRUSS_QTY_MIN)))
        ).select(["l_orderkey", "l_partkey"]),
        batch_format="pyarrow",
    )

    def pair_expand(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["l_orderkey", "l_partkey"])
        m = g.merge(g, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"src": m["l_partkey_x"].to_numpy(),
                             "dst": m["l_partkey_y"].to_numpy()})

    prs = bucketed_groupby(lines, ["l_orderkey"], pair_expand, n_buckets=16)
    return ktruss(prs, k=KTRUSS_K, rounds=KTRUSS_ROUNDS)


def _sql_ktruss() -> str:
    thr = KTRUSS_K - 2
    ctes = [f"""lines AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
          FROM lineitem WHERE l_quantity >= {KTRUSS_QTY_MIN}),
e0 AS (SELECT DISTINCT a.pk AS u, b.pk AS v
       FROM lines a JOIN lines b ON a.ok = b.ok AND a.pk < b.pk)"""]
    for i in range(KTRUSS_ROUNDS):
        # id-ordered triangle enumeration (x < y < z) counts the same
        # triangles as the engine's degree-oriented wedges
        ctes.append(f"""t{i} AS (
  SELECT a.u AS x, a.v AS y, b.v AS z
  FROM e{i} a JOIN e{i} b ON b.u = a.u AND a.v < b.v
  JOIN e{i} c ON c.u = a.v AND c.v = b.v),
e{i + 1} AS (
  SELECT u, v, CAST(COUNT(*) AS BIGINT) AS support FROM (
    SELECT x AS u, y AS v FROM t{i}
    UNION ALL SELECT x AS u, z AS v FROM t{i}
    UNION ALL SELECT y AS u, z AS v FROM t{i})
  GROUP BY 1, 2 HAVING COUNT(*) >= {thr})""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT u, v, support FROM e{KTRUSS_ROUNDS}")


def _sql_bfs_hops() -> str:
    ctes = [
        _SQL_GRAPH_EDGES,
        (f"d0 AS (SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS dist "
         f"FROM edges WHERE src % {BFS_SEED_MOD} = 0)"),
    ]
    for i in range(1, BFS_MAX_HOPS + 1):
        ctes.append(f"""d{i} AS (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM d{i - 1}
    UNION ALL
    SELECT e.dst AS node, r.dist + 1 AS dist
    FROM edges e JOIN d{i - 1} r ON r.node = e.src
  ) GROUP BY 1)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, CAST(dist AS BIGINT) AS dist FROM d{BFS_MAX_HOPS}")


def _sql_corpus_chunks() -> str:
    s, st = CHUNK_SIZE, CHUNK_SIZE - CHUNK_OVERLAP
    return f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks FROM documents
),
nn AS (SELECT doc_id, toks, len(toks) AS nt FROM tok WHERE len(toks) > 0),
c AS (SELECT doc_id, toks, nt,
        unnest(range(0, 1 + (greatest(nt - {s}, 0) + {st - 1}) // {st})) AS ci
      FROM nn)
SELECT doc_id, ci AS chunk_idx, ci*{st} AS tok_start,
  least({s}, nt - ci*{st}) AS n_toks,
  array_to_string(toks[ci*{st}+1 : least(ci*{st}+{s}, nt)], ' ')
    AS chunk_text
FROM c"""


def _sql_skipgrams() -> str:
    branches = " UNION ALL ".join(
        "SELECT unnest(list_transform(range(1, len(toks)-%d+1), "
        "i -> toks[i])) AS w1, "
        "unnest(list_transform(range(1, len(toks)-%d+1), "
        "i -> toks[i+%d])) AS w2 FROM tok WHERE len(toks) > %d"
        % (d, d, d, d)
        for d in range(1, SKIP_WINDOW + 1)
    )
    return (
        "WITH tok AS (SELECT regexp_extract_all(text, '\\S+') AS toks "
        f"FROM documents), pairs AS ({branches}) "
        "SELECT w1, w2, COUNT(*) AS n FROM pairs GROUP BY w1, w2"
    )


def q_traj(sf_dir: str):
    """Per-user TRAJECTORY statistics (the scikit-mobility panel):
    events ordered by the exact (ts, event_id) total order over res-4
    grid coordinates give exact-int64 L1 path length, L1 net
    displacement, and the radius-of-gyration numerator
    n*SUM(x^2+y^2) - SUM(x)^2 - SUM(y)^2 — one bucketed shuffle,
    vectorized diffs inside (stages/sequence.py:trajectory_stats)."""
    from ..stages.sequence import trajectory_stats

    def prep(b: pa.Table) -> pa.Table:
        eid = b.column("event_id").to_numpy(zero_copy_only=False)
        lon, lat = geocode_id(eid, ["xx"] * len(b))
        nx, ny = cells.nxny_of(lon, lat, MK_RES)
        t = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"user_id": b.column("user_id"),
                         "event_id": b.column("event_id"),
                         "tu": pa.array(t),
                         "nx": pa.array(nx, pa.int64()),
                         "ny": pa.array(ny, pa.int64())})

    ev = _read(sf_dir, "events",
               ["user_id", "event_id", "ts"]).map_batches(
        prep, batch_format="pyarrow")
    return trajectory_stats(ev, key_col="user_id", ts_col="tu",
                            id_col="event_id")


def _sql_traj() -> str:
    lon_e, lat_e = sql_geocode_exprs("event_id", "'xx'")
    nx_e, ny_e = cells.sql_nxny_exprs("lon", "lat", MK_RES)
    return f"""
WITH g0 AS (SELECT user_id, event_id, epoch_us(ts) AS tu,
                   {lon_e} AS lon, {lat_e} AS lat FROM events),
gc AS (SELECT user_id, event_id, tu, {nx_e} AS nx, {ny_e} AS ny FROM g0),
l AS (SELECT user_id, nx, ny,
  LAG(nx) OVER (PARTITION BY user_id ORDER BY tu, event_id) AS px,
  LAG(ny) OVER (PARTITION BY user_id ORDER BY tu, event_id) AS py,
  FIRST_VALUE(nx) OVER (PARTITION BY user_id ORDER BY tu, event_id) AS fx,
  FIRST_VALUE(ny) OVER (PARTITION BY user_id ORDER BY tu, event_id) AS fy,
  LAST_VALUE(nx) OVER (PARTITION BY user_id ORDER BY tu, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lx,
  LAST_VALUE(ny) OVER (PARTITION BY user_id ORDER BY tu, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS ly
  FROM gc)
SELECT user_id,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CASE WHEN px IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS steps,
  CAST(SUM(CASE WHEN px IS NULL THEN 0
           ELSE ABS(nx - px) + ABS(ny - py) END) AS BIGINT) AS manhattan,
  CAST(MAX(ABS(lx - fx) + ABS(ly - fy)) AS BIGINT) AS net,
  CAST(CAST(COUNT(*) AS BIGINT) * CAST(SUM(nx * nx + ny * ny) AS BIGINT)
       - CAST(SUM(nx) AS BIGINT) * CAST(SUM(nx) AS BIGINT)
       - CAST(SUM(ny) AS BIGINT) * CAST(SUM(ny) AS BIGINT)
       AS BIGINT) AS rog_num
FROM l GROUP BY user_id"""


def q_rfm(sf_dir: str):
    """RFM customer scoring (the CRM segmentation staple): per customer
    recency (last order epoch), frequency (order count) and monetary
    (exact cents) reduce once; three global RANK() passes (constant
    partition key, custkey tiebreak — stages/scan.py:keyed_rank) turn
    each metric into a 1-5 quintile via the tie-stable integer formula
    (rank-1)*5 // n + 1.  The reduce output is one bounded row per
    customer, so the rank sorts never touch the raw orders again."""
    from ..stages.bucketed import bucketed_groupby
    import pandas as pd

    ords = _read(sf_dir, "orders",
                 ["o_custkey", "o_orderdate", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate").cast(pa.int64())
        v = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.table({"o_custkey": b.column("o_custkey"), "du": d,
                         "cents": pa.array(
                             np.rint(v * 100.0).astype(np.int64))})

    def fold(g: "pd.DataFrame") -> "pd.DataFrame":
        agg = g.groupby("o_custkey", sort=False).agg(
            last_us=("du", "max"), freq=("du", "size"),
            mon=("cents", "sum")).reset_index()
        for c in ("last_us", "freq", "mon"):
            agg[c] = agg[c].astype(np.int64)
        return agg

    cust = bucketed_groupby(ords.map_batches(prep, batch_format="pyarrow"),
                            ["o_custkey"], fold, 32).materialize()
    n = cust.count()  # bounded aggregate: one row per customer

    def add_k(b: pa.Table) -> pa.Table:
        return b.append_column("k", pa.array(np.zeros(len(b), np.int64)))

    ranked = cust.map_batches(add_k, batch_format="pyarrow")
    for value, rank_col in (("last_us", "rr"), ("freq", "fr"),
                            ("mon", "mr")):
        ranked = scan.keyed_rank(ranked, "k", value, "o_custkey",
                                 rank_col=rank_col,
                                 dense_col=f"_d_{rank_col}")

    def score(b: pa.Table) -> pa.Table:
        out = {c: b.column(c) for c in ("o_custkey", "last_us", "freq",
                                        "mon")}
        for rank_col, sc in (("rr", "r_score"), ("fr", "f_score"),
                             ("mr", "m_score")):
            r = b.column(rank_col).to_numpy(zero_copy_only=False)
            out[sc] = pa.array((r - 1) * 5 // n + 1, pa.int64())
        return pa.table(out)

    return ranked.map_batches(score, batch_format="pyarrow")


def _sql_rfm() -> str:
    return """
WITH c AS (SELECT o_custkey,
    CAST(MAX(epoch_us(o_orderdate)) AS BIGINT) AS last_us,
    CAST(COUNT(*) AS BIGINT) AS freq,
    CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS mon
  FROM orders GROUP BY o_custkey),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c),
r AS (SELECT o_custkey, last_us, freq, mon,
    RANK() OVER (ORDER BY last_us) AS rr,
    RANK() OVER (ORDER BY freq) AS fr,
    RANK() OVER (ORDER BY mon) AS mr
  FROM c)
SELECT o_custkey, last_us, freq, mon,
  (rr - 1) * 5 // n + 1 AS r_score,
  (fr - 1) * 5 // n + 1 AS f_score,
  (mr - 1) * 5 // n + 1 AS m_score
FROM r CROSS JOIN t"""


QT_MIN, QT_CAP = 3, 30


def q_quadtree(sf_dir: str):
    """ADAPTIVE QUADTREE leaf directory over the geocoded corpus: the
    hierarchical grid is cut at the first depth in [3, RES_ZONAL]
    whose cell holds <= 30 docs (split-while-overfull) — one
    combiner-first res-max histogram shuffle, local roll-ups above it
    (stages/partition.py:quadtree_leaves)."""
    from ..stages.partition import quadtree_leaves

    return quadtree_leaves(_geocoded(sf_dir, RES_ZONAL), res_max=RES_ZONAL,
                           res_min=QT_MIN, cap=QT_CAP)


def _sql_quadtree() -> str:
    nc, _ = cells._grid_dims(RES_ZONAL)
    pexprs, joins, whens_d, whens_c = [], [], [], []
    for r in range(QT_MIN, RES_ZONAL):
        s = 1 << (RES_ZONAL - r)
        pexprs.append(f"((cell // {nc}) // {s}) * {2 << r}"
                      f" + ((cell % {nc}) // {s}) AS c{r}")
        joins.append(f"JOIN (SELECT c{r}, CAST(SUM(n) AS BIGINT) AS t{r} "
                     f"FROM p GROUP BY 1) n{r} USING (c{r})")
        whens_d.append(f"WHEN t{r} <= {QT_CAP} THEN {r}")
        whens_c.append(f"WHEN t{r} <= {QT_CAP} THEN c{r}")
    return f"""
{_sql_counts_cte()},
p AS MATERIALIZED (SELECT cell, x AS n, {', '.join(pexprs)} FROM counts),
j AS (SELECT p.* , {', '.join(f'n{r}.t{r}' for r in range(QT_MIN, RES_ZONAL))}
      FROM p {' '.join(joins)}),
l AS (SELECT CASE {' '.join(whens_d)} ELSE {RES_ZONAL} END AS depth,
             CASE {' '.join(whens_c)} ELSE cell END AS cell, n FROM j)
SELECT depth, cell, CAST(SUM(n) AS BIGINT) AS n FROM l GROUP BY 1, 2"""


FLOW_ROUNDS = 6


def q_flowacc(sf_dir: str):
    """D8 FLOW ACCUMULATION over the occupancy-histogram DEM: each
    occupied cell drains to its lowest strictly-lower occupied
    8-neighbor (ties by the fixed D8 direction order), then 6 Jacobi
    rounds of acc = 1 + upstream sum count the drainage area — the
    hydrology / terrain-routing primitive, all int64
    (stages/spatial_stats.py:flow_accumulation)."""
    from ..stages.spatial_stats import flow_accumulation

    return flow_accumulation(_geocoded(sf_dir, RES_ZONAL), res=RES_ZONAL,
                             rounds=FLOW_ROUNDS)


def _sql_d8_ctes() -> list:
    """Shared D8 drainage CTE block (occupancy DEM, steepest-lower
    receiver with the fixed dir-order tie rule) — consumed by both the
    flowacc and watershed oracles."""
    from ..stages.spatial_stats import D8_DIRS

    nc, nr = cells._grid_dims(RES_ZONAL)
    dirs = ", ".join(f"({d}, {dx}, {dy})" for d, dx, dy in D8_DIRS)
    return [f"""nn AS MATERIALIZED (SELECT cell, x AS h, cell % {nc} AS xx,
    cell // {nc} AS yy FROM counts)""",
            f"dirs(dir, dx, dy) AS (VALUES {dirs})",
            f"""cand AS MATERIALIZED (
  SELECT a.cell, d.dir, b.cell AS ncell, b.h AS nh
  FROM nn a CROSS JOIN dirs d
  JOIN nn b ON b.cell = a.cell + d.dy * {nc} + d.dx
  WHERE a.xx + d.dx BETWEEN 0 AND {nc - 1}
    AND a.yy + d.dy BETWEEN 0 AND {nr - 1}
    AND b.h < a.h)""",
            """flow AS MATERIALIZED (SELECT cell, ncell FROM (
  SELECT cell, ncell,
         ROW_NUMBER() OVER (PARTITION BY cell ORDER BY nh ASC, dir ASC)
           AS rn FROM cand) WHERE rn = 1)"""]


def _sql_flowacc() -> str:
    ctes = _sql_d8_ctes() + [
        "a0 AS MATERIALIZED (SELECT cell, CAST(1 AS BIGINT) AS acc "
        "FROM nn)"]
    for i in range(1, FLOW_ROUNDS + 1):
        ctes.append(f"""a{i} AS MATERIALIZED (
  SELECT n.cell, 1 + COALESCE(s.s, 0) AS acc
  FROM nn n LEFT JOIN (
    SELECT f.ncell AS cell, CAST(SUM(p.acc) AS BIGINT) AS s
    FROM flow f JOIN a{i - 1} p ON p.cell = f.cell GROUP BY 1) s
  USING (cell))""")
    body = ",\n".join(ctes)
    return f"""
{_sql_counts_cte()},
{body}
SELECT n.cell, n.h, COALESCE(f.ncell, -1) AS flow_to, a.acc
FROM nn n LEFT JOIN flow f USING (cell)
JOIN a{FLOW_ROUNDS} a USING (cell)"""


def q_tri(sf_dir: str):
    """Terrain ruggedness index over the occupancy DEM (Riley 1999):
    per-cell Σ(h−h_nbr)² over occupied 8-neighbors exact int64, tri =
    sqrt the one float (stages/spatial_stats.py:ruggedness_index)."""
    from ..stages.spatial_stats import ruggedness_index

    return ruggedness_index(_geocoded(sf_dir, RES_ZONAL), res=RES_ZONAL)


def _sql_tri() -> str:
    from ..stages.spatial_stats import D8_DIRS

    nc, nr = cells._grid_dims(RES_ZONAL)
    dirs = ", ".join(f"({d}, {dx}, {dy})" for d, dx, dy in D8_DIRS)
    return f"""
{_sql_counts_cte()},
nn AS MATERIALIZED (SELECT cell, x AS h, cell % {nc} AS xx,
    cell // {nc} AS yy FROM counts),
dirs(dir, dx, dy) AS (VALUES {dirs}),
agg AS (SELECT a.cell,
               CAST(COUNT(b.cell) AS BIGINT) AS n_nbrs,
               CAST(COALESCE(SUM((a.h - b.h) * (a.h - b.h)), 0)
                    AS BIGINT) AS tri2
        FROM nn a CROSS JOIN dirs d
        LEFT JOIN nn b ON b.cell = a.cell + d.dy * {nc} + d.dx
          AND a.xx + d.dx BETWEEN 0 AND {nc - 1}
          AND a.yy + d.dy BETWEEN 0 AND {nr - 1}
        GROUP BY 1)
SELECT nn.cell, nn.h, agg.n_nbrs, agg.tri2,
       sqrt(CAST(agg.tri2 AS DOUBLE)) AS tri
FROM nn JOIN agg USING (cell)"""


WSHED_ROUNDS = 6


def q_watershed(sf_dir: str):
    """WATERSHED basin labeling over the occupancy-histogram DEM:
    every occupied cell gets the SINK its D8 drainage path reaches
    (same receiver rule as flowacc) via 6 pointer-jumping rounds
    (paths up to 64 steps — heights strictly decrease so real paths
    are short), plus the basin size — all int64
    (stages/spatial_stats.py:watershed_label)."""
    from ..stages.spatial_stats import watershed_label

    return watershed_label(_geocoded(sf_dir, RES_ZONAL), res=RES_ZONAL,
                           jump_rounds=WSHED_ROUNDS)


def _sql_watershed() -> str:
    ctes = _sql_d8_ctes() + [
        """p0 AS MATERIALIZED (SELECT n.cell, COALESCE(f.ncell, n.cell)
     AS p FROM nn n LEFT JOIN flow f USING (cell))"""]
    for i in range(1, WSHED_ROUNDS + 1):
        ctes.append(f"""p{i} AS MATERIALIZED (
  SELECT a.cell, b.p FROM p{i - 1} a JOIN p{i - 1} b ON b.cell = a.p)""")
    r = WSHED_ROUNDS
    ctes.append(f"""bsn AS (SELECT p AS sink,
  CAST(COUNT(*) AS BIGINT) AS basin_n FROM p{r} GROUP BY 1)""")
    body = ",\n".join(ctes)
    return f"""
{_sql_counts_cte()},
{body}
SELECT n.cell, n.h, pr.p AS sink, bsn.basin_n
FROM nn n JOIN p{r} pr USING (cell) JOIN bsn ON bsn.sink = pr.p"""


BW_QUANT = 1 << 20


def q_betweenness(sf_dir: str):
    """Seeded BETWEENNESS centrality (Brandes pair-dependency with the
    rational term QUANTIZED: (sig_sv*sig_tv*2^20) // sig_st per seed
    pair, order-free integer sums) over the same co-purchase sigma BFS
    as stress/harmonic — the true-betweenness member of the centrality
    family (stages/graph.py:betweenness_centrality)."""
    import pandas as pd

    from ..stages.bucketed import bucketed_groupby
    from ..stages.graph import betweenness_centrality

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_quantity"])
    lines = li.map_batches(
        lambda b: b.filter(
            pc.greater_equal(b.column("l_quantity"),
                             pa.scalar(float(STRESS_QTY_MIN)))
        ).select(["l_orderkey", "l_partkey"]),
        batch_format="pyarrow",
    )

    def pair_expand(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["l_orderkey", "l_partkey"])
        m = g.merge(g, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return pd.DataFrame({"src": m["l_partkey_x"].to_numpy(),
                             "dst": m["l_partkey_y"].to_numpy()})

    prs = bucketed_groupby(lines, ["l_orderkey"], pair_expand, n_buckets=16)
    return betweenness_centrality(prs, n_seeds=STRESS_K,
                                  max_hops=STRESS_HOPS, quant=BW_QUANT)


def _sql_betweenness() -> str:
    D = STRESS_HOPS
    return (_sql_sigma_bfs_ctes() + f""",
pdist AS MATERIALIZED (SELECT r.s AS s, r.v AS t, r.d AS d_st,
                              r.sig AS sig_st
    FROM r{D} r JOIN seeds t2 ON t2.s = r.v WHERE r.s < r.v)
SELECT a.v AS node,
  CAST(SUM((a.sig * b.sig * {BW_QUANT}) // p.sig_st) AS BIGINT) AS bw_q
FROM r{D} a JOIN r{D} b ON b.v = a.v AND a.s < b.s
JOIN pdist p ON p.s = a.s AND p.t = b.s AND p.d_st = a.d + b.d
WHERE a.v <> a.s AND a.v <> b.s
GROUP BY 1""")


AMS_LANES, AMS_GROUPS = 32, 4


def q_ams_f2(sf_dir: str):
    """AMS F2 sketch (self-join-size / skew estimator) of the user
    frequency vector beside the exact SUM(f^2): sign bits from one
    mulrot63 hash per user, integer median-of-means finale — constant
    256 B of mergeable state per bucket (stages/sketch.py:ams_f2)."""
    from ..stages.sketch import ams_f2

    ev = _read(sf_dir, "events", ["user_id"])
    return ams_f2(ev, "user_id", lanes=AMS_LANES, groups=AMS_GROUPS)


def _sql_ams_f2() -> str:
    per = AMS_LANES // AMS_GROUPS
    mr = hashing.sql_mulrot63_ctes("f", "user_id, c",
                                   "CAST(user_id AS HUGEINT)")
    lane_sums = ", ".join(
        f"CAST(SUM((((h // {1 << lane}) % 2) * 2 - 1) * c) AS BIGINT)"
        f" AS s{lane}" for lane in range(AMS_LANES))
    gmeans = ", ".join(
        "(" + " + ".join(f"s{g * per + j} * s{g * per + j}"
                         for j in range(per)) + f") // {per} AS g{g}"
        for g in range(AMS_GROUPS))
    glist = ", ".join(f"g{g}" for g in range(AMS_GROUPS))
    return f"""
WITH f AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
           FROM events GROUP BY user_id),
{mr},
s AS (SELECT {lane_sums} FROM mh63),
g AS (SELECT {gmeans} FROM s),
e AS (SELECT CAST(SUM(c * c) AS BIGINT) AS f2_exact FROM f)
SELECT f2_exact,
  ((g0 + g1 + g2 + g3) - GREATEST({glist}) - LEAST({glist})) // 2
    AS f2_est
FROM e CROSS JOIN g"""


def q_pr_auc(sf_dir: str):
    """Quantized average precision (step-wise PR-AUC) of doc length as
    a src0-vs-src1 classifier — descending distinct-value threshold
    sweep, per-threshold precision floored onto the 2^-30 lattice so
    the term sum is an order-free exact integer, ONE float division
    (stages/zonal.py:average_precision)."""
    docs = _read(sf_dir, "documents", ["source", "n_chars"])
    return zonal.average_precision(docs, "source", "n_chars", AB_A, AB_B)


def _sql_pr_auc() -> str:
    q = zonal.AP_Q
    return f"""
WITH h AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v
           FROM documents WHERE source IN ('{AB_A}', '{AB_B}')),
pooled AS (SELECT v,
    CAST(SUM(CASE WHEN g = '{AB_A}' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
    CAST(SUM(CASE WHEN g = '{AB_B}' THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM h GROUP BY v),
rk AS (SELECT ca,
    CAST(SUM(ca) OVER (ORDER BY v DESC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS tp,
    CAST(SUM(ca + cb) OVER (ORDER BY v DESC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS tot
  FROM pooled),
agg AS (SELECT CAST(COALESCE(SUM(ca * (({q} * tp) // tot)), 0)
               AS BIGINT) AS ap_num FROM rk),
cnt AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_pos,
               CAST(SUM(cb) AS BIGINT) AS n_neg FROM pooled)
SELECT n_pos, n_neg, ap_num,
  CASE WHEN n_pos > 0 THEN
    CAST(ap_num AS DOUBLE) / ({float(q)} * CAST(n_pos AS DOUBLE))
  ELSE NULL END AS ap
FROM cnt CROSS JOIN agg"""


ATTR_CONV = "purchase"
ATTR_WINDOW_US = 48 * 3600 * 1_000_000


def _events_cents_total(sf_dir: str):
    """events -> (user_id, tu, event_id, event_type, cents) with the
    FLOOR-cents quantization (floor(value*100), one float multiply
    both sides — the anova FLOOR-dollar discipline)."""
    def prep(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": b.column("user_id"),
            "tu": b.column("ts").cast(pa.int64()),
            "event_id": b.column("event_id"),
            "event_type": b.column("event_type"),
            "cents": pa.array(np.floor(v * 100.0).astype(np.int64)),
        })

    return _read(sf_dir, "events",
                 ["user_id", "ts", "event_id", "event_type",
                  "value"]).map_batches(prep, batch_format="pyarrow")


def q_attribution(sf_dir: str):
    """Last-touch attribution: each purchase credits the latest
    same-user non-purchase event strictly before it in the (ts, id)
    total order within 48 h (unmatched -> 'direct'); per-channel
    conversions + credited cents, all integers
    (stages/sequence.py:last_touch_attribution)."""
    from ..stages.sequence import last_touch_attribution

    return last_touch_attribution(
        _events_cents_total(sf_dir), key_col="user_id", ts_col="tu",
        id_col="event_id", type_col="event_type", value_col="cents",
        conv_type=ATTR_CONV, window=ATTR_WINDOW_US)


def _sql_attribution() -> str:
    return f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS tu, event_id, event_type,
                  CAST(FLOOR(value * 100.0) AS BIGINT) AS cents
           FROM events),
conv AS (SELECT * FROM e WHERE event_type = '{ATTR_CONV}'),
tch AS (SELECT * FROM e WHERE event_type <> '{ATTR_CONV}'),
pick AS (SELECT c.event_id AS cid, c.cents, t.event_type AS ttype,
    ROW_NUMBER() OVER (PARTITION BY c.event_id
                       ORDER BY t.tu DESC, t.event_id DESC) AS rn
  FROM conv c JOIN tch t ON t.user_id = c.user_id
   AND (t.tu < c.tu OR (t.tu = c.tu AND t.event_id < c.event_id))
   AND c.tu - t.tu <= {ATTR_WINDOW_US}),
lt AS (SELECT cid, ttype FROM pick WHERE rn = 1),
cr AS (SELECT COALESCE(lt.ttype, 'direct') AS touch_type, c.cents
       FROM conv c LEFT JOIN lt ON lt.cid = c.event_id)
SELECT touch_type, CAST(COUNT(*) AS BIGINT) AS conversions,
       CAST(SUM(cents) AS BIGINT) AS credited
FROM cr GROUP BY 1"""


EWMA_K = 8


def q_ewma(sf_dir: str):
    """Per-user dyadic EWMA of the last 8 event values (decay 1/2,
    truncated-renormalized): power-of-two weights make the numerator
    an exact int64, ewma = num / (2^k - 2^(k-m)) the one float
    division (stages/sequence.py:ewma_last_k)."""
    from ..stages.sequence import ewma_last_k

    return ewma_last_k(_events_cents_total(sf_dir), key_col="user_id",
                       ts_col="tu", id_col="event_id",
                       value_col="cents", k=EWMA_K)


def _sql_ewma() -> str:
    k = EWMA_K
    return f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS tu, event_id,
                  CAST(FLOOR(value * 100.0) AS BIGINT) AS cents
           FROM events),
r AS (SELECT user_id, cents,
    ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY tu DESC, event_id DESC) AS rn
  FROM e),
a AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_used,
    CAST(SUM(cents * (1 << ({k} - rn))) AS BIGINT) AS ewma_num
  FROM r WHERE rn <= {k} GROUP BY user_id)
SELECT user_id, n_used, ewma_num,
  CAST(ewma_num AS DOUBLE)
    / CAST((1 << {k}) - (1 << ({k} - n_used)) AS DOUBLE) AS ewma
FROM a"""


FD_PAIRS = (("o_custkey", "o_orderpriority"),
            ("o_custkey", "o_orderstatus"))


def q_fd_check(sf_dir: str):
    """Functional-dependency profiler over orders: for each candidate
    FD det->dep, the determinant-key count, violated-key count and
    worst dependent multiplicity — only DISTINCT (det, dep) pairs ever
    shuffle (stages/profile.py:fd_check)."""
    from ..stages.profile import fd_check

    rows = []
    for det, dep in FD_PAIRS:
        rows.append(fd_check(_read(sf_dir, "orders", [det, dep]),
                             det, dep))
    return pa.concat_tables(rows)


def _sql_fd_check() -> str:
    parts = []
    for det, dep in FD_PAIRS:
        parts.append(f"""
SELECT '{det}->{dep}' AS fd, CAST(COUNT(*) AS BIGINT) AS n_keys,
  CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violated,
  CAST(MAX(c) AS BIGINT) AS max_card
FROM (SELECT {det}, CAST(COUNT(DISTINCT {dep}) AS BIGINT) AS c
      FROM orders GROUP BY {det})""")
    return " UNION ALL ".join(parts)


GAINS_BINS = 10


def q_gains(sf_dir: str):
    """Decile gains/lift table of doc length as a src0-vs-src1
    classifier: descending-RANK bins cut EXACTLY from the pooled value
    histogram (no global sort — bin(v) = (cum_before·10)//N, ties
    share a bin), per-bin positive rate the one float
    (stages/zonal.py:decile_gains)."""
    docs = _read(sf_dir, "documents", ["source", "n_chars"])
    return zonal.decile_gains(docs, "source", "n_chars", AB_A, AB_B,
                              n_bins=GAINS_BINS)


def _sql_gains() -> str:
    return f"""
WITH h AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v
           FROM documents WHERE source IN ('{AB_A}', '{AB_B}')),
pooled AS (SELECT v,
    CAST(SUM(CASE WHEN g = '{AB_A}' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
    CAST(COUNT(*) AS BIGINT) AS ct
  FROM h GROUP BY v),
rk AS (SELECT ca, ct,
    CAST(SUM(ct) OVER (ORDER BY v DESC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ct
         AS BIGINT) AS cumb
  FROM pooled),
tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS n FROM pooled),
b AS (SELECT (cumb * {GAINS_BINS}) // tot.n AS bin, ca, ct
      FROM rk CROSS JOIN tot)
SELECT CAST(bin AS BIGINT) AS bin, CAST(SUM(ct) AS BIGINT) AS n,
  CAST(SUM(ca) AS BIGINT) AS n_pos,
  CAST(SUM(ca) AS DOUBLE) / CAST(SUM(ct) AS DOUBLE) AS rate
FROM b GROUP BY 1"""


HAUS_MAX_DIST = 8


def q_hausdorff(sf_dir: str):
    """Grid Hausdorff distance between the src0 and src1 occupancy
    patterns: both sides reduce to distinct occupied cells (one
    bucketed shuffle), directed max-min Chebyshev distances via the
    bounded ring search, all integers
    (stages/spatial_stats.py:hausdorff_cells)."""
    from ..stages.spatial_stats import hausdorff_cells

    pts = _geocoded(sf_dir, RES_ZONAL, keep_extra=["source"])
    return hausdorff_cells(pts, res=RES_ZONAL, max_dist=HAUS_MAX_DIST,
                           group_a=AB_A, group_b=AB_B,
                           group_col="source")


def _sql_hausdorff() -> str:
    nc, nr = cells._grid_dims(RES_ZONAL)
    d = HAUS_MAX_DIST
    offs = ", ".join(f"({dx}, {dy})"
                     for dy in range(-d, d + 1)
                     for dx in range(-d, d + 1))
    dir_cte = """
nn_{t} AS (SELECT a.cell,
       CAST(MIN(GREATEST(ABS(d.dx), ABS(d.dy))) AS BIGINT) AS dist
  FROM o{s} a CROSS JOIN offs d
  JOIN o{d2} b ON b.cell = a.cell + d.dy * {nc} + d.dx
  WHERE a.xx + d.dx BETWEEN 0 AND {ncm}
    AND a.yy + d.dy BETWEEN 0 AND {nrm}
  GROUP BY 1),
agg_{t} AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_found,
                   CAST(COALESCE(MAX(dist), 0) AS BIGINT) AS h
            FROM nn_{t})"""
    return f"""
{_sql_geo_cte(RES_ZONAL, ", source")},
occ AS MATERIALIZED (SELECT DISTINCT source AS g, cell FROM geo
                     WHERE source IN ('{AB_A}', '{AB_B}')),
oa AS MATERIALIZED (SELECT cell, cell % {nc} AS xx, cell // {nc} AS yy
                    FROM occ WHERE g = '{AB_A}'),
ob AS MATERIALIZED (SELECT cell, cell % {nc} AS xx, cell // {nc} AS yy
                    FROM occ WHERE g = '{AB_B}'),
offs(dx, dy) AS (VALUES {offs}),
{dir_cte.format(t="ab", s="a", d2="b", nc=nc, ncm=nc - 1, nrm=nr - 1)},
{dir_cte.format(t="ba", s="b", d2="a", nc=nc, ncm=nc - 1, nrm=nr - 1)},
na AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_a FROM oa),
nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_b FROM ob)
SELECT n_a, n_b, agg_ab.h AS h_ab, agg_ba.h AS h_ba,
       GREATEST(agg_ab.h, agg_ba.h) AS hausdorff,
       n_a - agg_ab.n_found AS n_far_ab,
       n_b - agg_ba.n_found AS n_far_ba
FROM na CROSS JOIN nb CROSS JOIN agg_ab CROSS JOIN agg_ba"""




PYR_DELTAS = [0, 2, 4]


def q_pyramid(sf_dir: str):
    """Multi-resolution density pyramid of the geocoded corpus — tile
    overviews (gdaladdo / tippecanoe zoom rollup) built in ONE pass:
    per-block combiner emits counts at res 6/4/2 via integer parent
    shifts, one bucketed reduce keyed (level, cell)
    (stages/spatial_stats.py:pyramid_counts)."""
    from ..stages.spatial_stats import pyramid_counts

    pts = _geocoded(sf_dir, RES_ZONAL)
    return pyramid_counts(pts, res=RES_ZONAL, deltas=PYR_DELTAS)


def _sql_pyramid() -> str:
    from ..geom.cells import _grid_dims

    ncols, _ = _grid_dims(RES_ZONAL)
    parts = []
    for d in sorted({0, *PYR_DELTAS}):
        pncols, _ = _grid_dims(RES_ZONAL - d)
        pc = (f"((cell // {ncols}) // {1 << d}) * {pncols} "
              f"+ ((cell % {ncols}) // {1 << d})")
        parts.append(
            f"SELECT CAST({RES_ZONAL - d} AS BIGINT) AS level, "
            f"CAST({pc} AS BIGINT) AS cell, "
            f"CAST(COUNT(*) AS BIGINT) AS n FROM geo GROUP BY 2")
    body = " UNION ALL ".join(parts)
    return f"{_sql_geo_cte()} {body}"


def q_lsh_eval(sf_dir: str):
    """LSH candidate-generation RECALL audit — the engine measuring its
    own approximation: banded-MinHash candidate pairs (16 bands x 4
    rows) vs the EXACT J >= 4/5 PPJoin pair set on the same corpus.
    Output one row (n_true, n_cand, n_hit, recall) — recall is the one
    mirrored division (stages/dedup.py:minhash_bands +
    jaccard_sim_join)."""
    import pandas as pd

    from ..stages.bucketed import bucketed_groupby
    from ..stages.dedup import jaccard_sim_join, minhash_bands
    from ..stages.graph import distinct_tuples
    from ..stages.hashjoin import bucketed_join

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    bands = docs.map_batches(
        lambda b: minhash_bands(b, id_col="doc_id",
                                num_perm=MH_NUM_PERM, bands=MH_BANDS,
                                k=MH_K),
        batch_format="pyarrow")

    def pair_up(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on=["band_id", "band_hash"], suffixes=("_a", "_b"))
        m = m[m["doc_id_a"].to_numpy() < m["doc_id_b"].to_numpy()]
        return pd.DataFrame({
            "i": m["doc_id_a"].to_numpy(dtype=np.int64),
            "j": m["doc_id_b"].to_numpy(dtype=np.int64),
        }).drop_duplicates()

    cand = distinct_tuples(
        bucketed_groupby(bands, ["band_id", "band_hash"], pair_up,
                         n_buckets=32),
        ["i", "j"], n_buckets=32).materialize()
    truth = jaccard_sim_join(docs, k=SIMJOIN_K, tau_num=SIMJOIN_NUM,
                             tau_den=SIMJOIN_DEN).map_batches(
        lambda b: b.select(["i", "j"]),
        batch_format="pyarrow").materialize()
    hits = bucketed_join(truth, cand, ["i", "j"], how="semi",
                         n_buckets=32)
    n_true = truth.count()
    n_cand = cand.count()
    n_hit = hits.count()
    recall = (float(n_hit) / float(n_true)) if n_true else None
    return pa.table({
        "n_true": pa.array([n_true], pa.int64()),
        "n_cand": pa.array([n_cand], pa.int64()),
        "n_hit": pa.array([n_hit], pa.int64()),
        "recall": pa.array([recall], pa.float64())})


def _sql_lsh_eval() -> str:
    sim = _sql_sim_join()
    return f"""
WITH {_sql_minhash_sig_ctes()},
cpairs AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
           FROM bands a
           JOIN bands b ON a.band_id = b.band_id AND a.bh = b.bh
           WHERE a.doc_id < b.doc_id),
simp AS ({sim}),
tp AS (SELECT i, j FROM simp),
hit AS (SELECT tp.i, tp.j FROM tp
        JOIN cpairs c ON c.i = tp.i AND c.j = tp.j),
m AS (SELECT (SELECT COUNT(*) FROM tp) AS n_true,
             (SELECT COUNT(*) FROM cpairs) AS n_cand,
             (SELECT COUNT(*) FROM hit) AS n_hit)
SELECT CAST(n_true AS BIGINT) AS n_true,
       CAST(n_cand AS BIGINT) AS n_cand,
       CAST(n_hit AS BIGINT) AS n_hit,
       CASE WHEN n_true > 0
            THEN CAST(n_hit AS DOUBLE) / CAST(n_true AS DOUBLE) END
         AS recall
FROM m"""


def q_dedup_rate(sf_dir: str):
    """Per-source dedup survivorship — the cleaning-report table every
    corpus pipeline publishes: docs per source, exact-dedup survivors
    attributed to the KEPT doc's source (first doc_id per distinct
    text), and the survival rate (one mirrored division)
    (stages/dedup.py:exact_dedup)."""
    import pandas as pd

    from ..stages.bucketed import bucketed_groupby
    from ..stages.dedup import exact_dedup
    from ..stages.hashjoin import bucketed_join

    docs = _read(sf_dir, "documents",
                 ["doc_id", "text", "source"]).materialize()

    def per_source(cnt_col):
        def partial(b: pa.Table) -> pa.Table:
            df = pd.DataFrame({
                "source": b.column("source").to_numpy(
                    zero_copy_only=False)})
            g = df.groupby("source", sort=False, as_index=False).size()
            g = g.rename(columns={"size": cnt_col})
            g[cnt_col] = g[cnt_col].astype(np.int64)
            return pa.Table.from_pandas(
                g, preserve_index=False).replace_schema_metadata(None)
        return partial

    def fold(cnt_col):
        def fn(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby("source", sort=False,
                            as_index=False)[cnt_col].sum()
            out[cnt_col] = out[cnt_col].astype(np.int64)
            return out
        return fn

    totals = bucketed_groupby(
        docs.map_batches(per_source("n_docs"), batch_format="pyarrow"),
        ["source"], fold("n_docs"), n_buckets=4)
    kept = exact_dedup(docs, order_cols=["doc_id"])
    kept_counts = bucketed_groupby(
        kept.map_batches(per_source("n_kept"), batch_format="pyarrow"),
        ["source"], fold("n_kept"), n_buckets=4)
    out = bucketed_join(totals, kept_counts, ["source"], how="left",
                        n_buckets=4)

    def finish(b: pa.Table) -> pa.Table:
        nd = b.column("n_docs").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        nk = pc.fill_null(b.column("n_kept"), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "source": b.column("source"),
            "n_docs": b.column("n_docs"),
            "n_kept": pa.array(nk),
            "rate": pa.array(nk.astype(np.float64) / nd)})

    return out.map_batches(finish, batch_format="pyarrow")


def _sql_dedup_rate() -> str:
    return """
WITH kept AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
k AS (SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_kept
      FROM kept JOIN documents d USING (doc_id) GROUP BY d.source),
t AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source)
SELECT t.source, t.n_docs, CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(COALESCE(k.n_kept, 0) AS DOUBLE) / CAST(t.n_docs AS DOUBLE)
         AS rate
FROM t LEFT JOIN k USING (source)"""


DENSIFY_K = 8


def q_densify(sf_dir: str):
    """Segment densification: 9 evenly-spaced points along every
    supplier-derived segment on the exact x8 integer lattice — the
    shapely segmentize / ST_LineInterpolatePoint surface, pure flat
    map (stages/join.py:densify_segments)."""
    from ..stages.join import densify_segments

    def mks(b: pa.Table) -> pa.Table:
        k = b.column("s_suppkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        x0 = (k * 173) % BBOX_DOM
        y0 = (k * 179) % BBOX_DOM
        return pa.table({
            "sid": pa.array(k), "x0": pa.array(x0), "y0": pa.array(y0),
            "x1": pa.array(x0 + (k * 7) % 240 - 120),
            "y1": pa.array(y0 + (k * 11) % 192 - 96)})

    segs = _read(sf_dir, "supplier", ["s_suppkey"]).map_batches(
        mks, batch_format="pyarrow")
    return densify_segments(segs, k=DENSIFY_K)


def _sql_densify() -> str:
    K = DENSIFY_K
    return f"""
WITH s0 AS (SELECT s_suppkey AS sid,
                   (s_suppkey * 173) % {BBOX_DOM} AS x0,
                   (s_suppkey * 179) % {BBOX_DOM} AS y0 FROM supplier),
s AS (SELECT sid, x0, y0,
             x0 + (sid * 7) % 240 - 120 AS x1,
             y0 + (sid * 11) % 192 - 96 AS y1 FROM s0),
j AS (SELECT unnest(range({K + 1})) AS j)
SELECT s.sid, CAST(j.j AS BIGINT) AS j,
       CAST(s.x0 * {K} + j.j * (s.x1 - s.x0) AS BIGINT) AS xk,
       CAST(s.y0 * {K} + j.j * (s.y1 - s.y0) AS BIGINT) AS yk
FROM s CROSS JOIN j"""




def q_curate3(sf_dir: str):
    """End-to-end curation v3 — curate2 with a NEAR-dup stage wired in
    (the full web-pipeline shape): exact dedup (first doc_id per text)
    → MinHash-LSH near-dup collapse (keep each connected component's
    canonical = minimum doc_id) → unigram-LM OOV gate → DSIR selection
    → global sort → pack-span index.  All stages stream; the LSH
    closure shuffles only fixed-width band rows
    (stages/dedup.py:minhash_lsh_groups + pipelines curate2 chain)."""
    from ..stages import hashjoin
    from ..stages.dedup import minhash_lsh_groups
    from ..stages.scoring import dsir_weights, unigram_lm_scores

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    surv = dedup.exact_dedup(docs, order_cols=["doc_id"])
    groups = minhash_lsh_groups(surv, id_col="doc_id",
                                num_perm=MH_NUM_PERM, bands=MH_BANDS,
                                k=MH_K)

    def canonical(b: pa.Table) -> pa.Table:
        i = b.column("doc_id").to_numpy(zero_copy_only=False)
        g = b.column("dup_group").to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": pa.array(i[i == g])})

    keep = groups.map_batches(canonical,
                              batch_format="pyarrow").materialize()
    surv2 = hashjoin.bucketed_join(surv, keep, on=["doc_id"],
                                   how="semi", n_buckets=32)
    lm = unigram_lm_scores(surv2, top_v=UNIGRAM_V)
    dw = dsir_weights(surv2, n_buckets=DSIR_BUCKETS,
                      target_mod=DECON_MOD, target_rem=DECON_REM)

    def q_gate(b: pa.Table) -> pa.Table:
        oov = b.column("n_oov").to_numpy(zero_copy_only=False)
        n = b.column("n_tokens").to_numpy(zero_copy_only=False)
        return b.select(["doc_id", "n_tokens"]).filter(
            pa.array(oov * 4 <= n))

    def d_gate(b: pa.Table) -> pa.Table:
        tf = b.column("tf_sum").to_numpy(zero_copy_only=False)
        rf = b.column("rf_sum").to_numpy(zero_copy_only=False)
        return b.select(["doc_id"]).filter(pa.array(tf * 12 >= rf))

    sel = hashjoin.bucketed_join(
        lm.map_batches(q_gate, batch_format="pyarrow"),
        dw.map_batches(d_gate, batch_format="pyarrow"),
        on=["doc_id"], how="semi", n_buckets=32,
    )
    packed_in = sel.sort("doc_id").materialize()
    return scan.pack_span_index(packed_in, "doc_id", "n_tokens",
                                budget=CURATE2_BUDGET)


def _sql_curate3() -> str:
    v, nb = UNIGRAM_V, DSIR_BUCKETS
    mod, rem, b = DECON_MOD, DECON_REM, CURATE2_BUDGET
    # tok/th on the exact-dedup survivors (d); minhash sig/band/closure
    # ctes consume th, so stripping its own tokhash prefix reuses d's
    sig = _sql_minhash_cc_ctes()
    sig = sig[sig.index("sh AS ("):]  # drop the embedded tokhash ctes
    tokhash = _sql_tokhash_cte().replace(
        "FROM documents", "FROM d").lstrip().lstrip(",").strip()
    return f"""
WITH RECURSIVE
surv AS MATERIALIZED (SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id
                      FROM documents GROUP BY text),
d AS MATERIALIZED (SELECT doc.doc_id, doc.text
                   FROM documents doc JOIN surv USING (doc_id)),
{tokhash},
{sig},
d2 AS MATERIALIZED (SELECT d.doc_id, d.text
                    FROM d JOIN labels l ON l.doc_id = d.doc_id
                    WHERE l.dup_group = d.doc_id),
tok0 AS MATERIALIZED (SELECT doc_id,
                             unnest(regexp_extract_all(text, '\\S+')) AS w
                      FROM d2),
cnt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok0 GROUP BY w),
vocab AS (SELECT w, c FROM (
            SELECT w, c, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rn
            FROM cnt)
          WHERE rn <= {v}),
lm AS (SELECT t.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN vo.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_oov
       FROM tok0 t LEFT JOIN vocab vo ON vo.w = t.w
       GROUP BY t.doc_id),
tb AS MATERIALIZED (SELECT th.doc_id,
                           CAST(unnest(ths) % {nb} AS BIGINT) AS bkt
                    FROM th JOIN d2 USING (doc_id)),
tcnt AS (SELECT bkt, CAST(COUNT(*) AS BIGINT) AS c FROM tb
         WHERE doc_id % {mod} = {rem} GROUP BY bkt),
rcnt AS (SELECT bkt, CAST(COUNT(*) AS BIGINT) AS c FROM tb
         WHERE doc_id % {mod} <> {rem} GROUP BY bkt),
dw AS (SELECT t.doc_id,
         CAST(SUM(COALESCE(tc.c, 0) + 1) AS BIGINT) AS tf_sum,
         CAST(SUM(COALESCE(rc.c, 0) + 1) AS BIGINT) AS rf_sum
       FROM tb t
       LEFT JOIN tcnt tc ON tc.bkt = t.bkt
       LEFT JOIN rcnt rc ON rc.bkt = t.bkt
       WHERE t.doc_id % {mod} <> {rem}
       GROUP BY t.doc_id),
sel AS (SELECT l.doc_id, l.n_tokens
        FROM lm l JOIN dw USING (doc_id)
        WHERE l.n_oov * 4 <= l.n_tokens AND dw.tf_sum * 12 >= dw.rf_sum),
c AS (SELECT doc_id, n_tokens AS n,
        CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN
          UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - n_tokens AS s
      FROM sel),
x AS (SELECT doc_id, n, s,
        unnest(range(s // {b}, (s + n - 1) // {b} + 1)) AS ci
      FROM c WHERE n > 0)
SELECT doc_id,
       CAST(ci AS BIGINT) AS chunk_id,
       CAST(GREATEST(s, ci * {b}) - s AS BIGINT) AS doc_off,
       CAST(GREATEST(s, ci * {b}) - ci * {b} AS BIGINT) AS chunk_off,
       CAST(LEAST(s + n, (ci + 1) * {b}) - GREATEST(s, ci * {b})
            AS BIGINT) AS n_tok
FROM x"""




def _confusion_ds(sf_dir: str):
    """(lang, lang_pred, n) confusion counts of the n-gram lang-id
    heuristic vs the stored label — combiner partial + one bucketed
    reduce on the bounded class-pair grid."""
    import pandas as pd

    from ..stages.bucketed import bucketed_groupby

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        pred = textfn.detect_lang(b.column("text").to_pylist())
        df = pd.DataFrame({
            "lang": b.column("lang").to_numpy(zero_copy_only=False),
            "lang_pred": pred,
        }).groupby(["lang", "lang_pred"], as_index=False).size() \
            .rename(columns={"size": "n"})
        df["n"] = df["n"].astype(np.int64)
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["lang", "lang_pred"], sort=False,
                        as_index=False)["n"].sum()
        out["n"] = out["n"].astype(np.int64)
        return out

    return bucketed_groupby(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["lang", "lang_pred"], fold, n_buckets=4)


def q_confusion(sf_dir: str):
    """Lang-id CONFUSION MATRIX — the classifier-eval table: stored
    label x predicted label counts (functions/text.py:detect_lang,
    already oracle-mirrored)."""
    return _confusion_ds(sf_dir)


def _sql_confusion() -> str:
    return ("WITH " + _sql_lang_ctes()
            + """ SELECT d.lang, l.lang_pred,
       CAST(COUNT(*) AS BIGINT) AS n
FROM documents d JOIN langpred l USING (doc_id)
GROUP BY d.lang, l.lang_pred""")


def q_kappa(sf_dir: str):
    """Cohen's KAPPA of lang-id vs the stored label — inter-annotator
    agreement as exact integers until ONE mirrored division:
    kappa = (po_num*N - pe_num) / (N^2 - pe_num) with po_num = trace,
    pe_num = sum_c rowtotal(c)*coltotal(c)."""
    conf = _confusion_ds(sf_dir).to_pandas()
    n = int(conf["n"].sum())
    po_num = int(conf[conf["lang"] == conf["lang_pred"]]["n"].sum())
    rows = conf.groupby("lang")["n"].sum()
    cols = conf.groupby("lang_pred")["n"].sum()
    classes = sorted(set(rows.index) | set(cols.index))
    pe_num = sum(int(rows.get(c, 0)) * int(cols.get(c, 0))
                 for c in classes)
    denom = n * n - pe_num
    kappa = (float(po_num * n - pe_num) / float(denom)) if denom \
        else None
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "po_num": pa.array([po_num], pa.int64()),
        "pe_num": pa.array([pe_num], pa.int64()),
        "kappa": pa.array([kappa], pa.float64())})


def _sql_kappa() -> str:
    return ("WITH " + _sql_lang_ctes()
            + """, conf AS (
  SELECT d.lang, l.lang_pred, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents d JOIN langpred l USING (doc_id)
  GROUP BY d.lang, l.lang_pred),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n FROM conf),
po AS (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS po_num
       FROM conf WHERE lang = lang_pred),
r AS (SELECT lang AS c, CAST(SUM(n) AS BIGINT) AS rn FROM conf
      GROUP BY lang),
cl AS (SELECT lang_pred AS c, CAST(SUM(n) AS BIGINT) AS cn FROM conf
       GROUP BY lang_pred),
pe AS (SELECT CAST(COALESCE(SUM(r.rn * cl.cn), 0) AS BIGINT) AS pe_num
       FROM r JOIN cl USING (c))
SELECT tot.n, po.po_num, pe.pe_num,
       CASE WHEN tot.n * tot.n - pe.pe_num <> 0 THEN
         CAST(po.po_num * tot.n - pe.pe_num AS DOUBLE)
           / CAST(tot.n * tot.n - pe.pe_num AS DOUBLE) END AS kappa
FROM tot, po, pe""")




def q_trimmed_mean(sf_dir: str):
    """Per-language 10%%-trimmed mean of doc lengths — the robust-mean
    report metric, exact from the value histogram (no per-row sort),
    one mirrored division (stages/zonal.py:grouped_trimmed_mean)."""
    docs = _read(sf_dir, "documents", ["lang", "n_chars"])
    return zonal.grouped_trimmed_mean(docs, ["lang"], "n_chars",
                                      trim_num=1, trim_den=10,
                                      n_buckets=8)


_SQL_TRIMMED_MEAN = """
WITH h AS (SELECT lang, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
           FROM documents GROUP BY 1, 2),
t AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n FROM h GROUP BY 1),
cbs AS (SELECT lang, v, c,
        CAST(SUM(c) OVER (PARTITION BY lang ORDER BY v) - c AS BIGINT)
          AS cb FROM h),
m AS (SELECT cbs.lang, t.n, (t.n * 1) // 10 AS k,
             cbs.v, cbs.c, cbs.cb FROM cbs JOIN t USING (lang)),
kept AS (SELECT lang, n, k, v,
         c - LEAST(c, GREATEST(0, k - cb))
           - LEAST(c, GREATEST(0, (cb + c) - (n - k))) AS kc
         FROM m),
f AS (SELECT lang, CAST(MAX(n) AS BIGINT) AS n,
             CAST(MAX(n) - 2 * MAX(k) AS BIGINT) AS n_kept,
             CAST(SUM(v * kc) AS BIGINT) AS mid_sum
      FROM kept GROUP BY lang)
SELECT lang, n, n_kept, mid_sum,
       CASE WHEN n_kept > 0 THEN
         CAST(mid_sum AS DOUBLE) / CAST(n_kept AS DOUBLE) END AS tmean
FROM f"""


def q_theil(sf_dir: str):
    """Per-source Theil T inequality of doc lengths — gini's
    information-theoretic sibling under the quantized-ln discipline
    (stages/zonal.py:grouped_theil)."""
    docs = _read(sf_dir, "documents", ["source", "n_chars"])
    return zonal.grouped_theil(docs, ["source"], "n_chars",
                               n_buckets=8)


_SQL_THEIL = f"""
WITH h AS (SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
           FROM documents GROUP BY 1, 2),
f AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(v * c) AS BIGINT) AS sv,
             CAST(COALESCE(SUM(CASE WHEN v > 0 THEN
               c * CAST(FLOOR(CAST(v AS DOUBLE) * ln(CAST(v AS DOUBLE))
                              * {zonal.THEIL_Q}.0) AS BIGINT) END), 0)
               AS BIGINT) AS qs
      FROM h GROUP BY source)
SELECT source, n, sv, qs,
       CASE WHEN sv > 0 THEN
         CAST(qs AS DOUBLE) / (CAST(sv AS DOUBLE) * {zonal.THEIL_Q}.0)
         - (ln(CAST(sv AS DOUBLE)) - ln(CAST(n AS DOUBLE))) END
         AS theil
FROM f"""




def q_heldout_ppl(sf_dir: str):
    """Held-out cross-entropy of the add-one unigram LM (train on even
    doc_ids, evaluate on odd) — the LM-eval loop under the
    quantized-ln discipline
    (stages/scoring.py:heldout_cross_entropy)."""
    from ..stages.scoring import heldout_cross_entropy

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return heldout_cross_entropy(docs)


_SQL_HELDOUT_PPL = """
WITH tok0 AS (SELECT doc_id,
                     unnest(regexp_extract_all(text, '\\S+')) AS w
              FROM documents),
g AS (SELECT w,
             CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS ct,
             CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS ch
      FROM tok0 GROUP BY w),
f AS (SELECT CAST(COUNT(*) AS BIGINT) AS nv,
             CAST(COALESCE(SUM(ct), 0) AS BIGINT) AS s_train,
             CAST(COALESCE(SUM(ch), 0) AS BIGINT) AS n_held,
             CAST(COALESCE(SUM(CASE WHEN ch > 0 THEN
               ch * CAST(FLOOR(ln(CAST(ct + 1 AS DOUBLE)) * 65536.0)
                         AS BIGINT) END), 0) AS BIGINT) AS qs
      FROM g)
SELECT n_held, CAST(s_train + nv AS BIGINT) AS d, qs,
       CASE WHEN n_held > 0 AND s_train + nv > 0 THEN
         ln(CAST(s_train + nv AS DOUBLE))
         - CAST(qs AS DOUBLE) / (CAST(n_held AS DOUBLE) * 65536.0) END
         AS h
FROM f"""




HARM_SEEDS = 4


def q_seed_harmonic(sf_dir: str):
    """Bounded-hop HARMONIC centrality from the 4 smallest seed-class
    customer nodes of the trade graph: h(v) = Σ_s 1/d(s,v) over
    0 < d <= 3, exact on the lcm(1..3)=6 rational lattice, one
    mirrored division (stages/graph.py:harmonic_centrality)."""
    import ray.data as rd

    from ..stages.graph import seed_harmonic_centrality

    edges = _trade_edges(sf_dir).materialize()
    sdf = edges.map_batches(
        lambda b: pa.table({"node": pa.array(np.unique(
            b.column("src").to_numpy(zero_copy_only=False)
            [b.column("src").to_numpy(zero_copy_only=False)
             % BFS_SEED_MOD == 0]))}),
        batch_format="pyarrow").to_pandas()
    sids = np.sort(np.unique(sdf["node"].to_numpy()))[:HARM_SEEDS]
    seeds = rd.from_arrow(pa.table({"node": pa.array(sids, pa.int64())}))
    return seed_harmonic_centrality(edges, seeds,
                                    max_hops=BFS_MAX_HOPS)


def _sql_seed_harmonic() -> str:
    ctes = [
        _SQL_GRAPH_EDGES,
        (f"seeds AS (SELECT node FROM ("
         f"SELECT DISTINCT src AS node FROM edges "
         f"WHERE src % {BFS_SEED_MOD} = 0 ORDER BY node "
         f"LIMIT {HARM_SEEDS}))"),
        ("p0 AS (SELECT node AS seed, node, CAST(0 AS BIGINT) AS dist "
         "FROM seeds)"),
    ]
    for i in range(1, BFS_MAX_HOPS + 1):
        ctes.append(f"""p{i} AS MATERIALIZED (
  SELECT seed, node, MIN(dist) AS dist FROM (
    SELECT seed, node, dist FROM p{i - 1}
    UNION ALL
    SELECT r.seed, e.dst AS node, r.dist + 1 AS dist
    FROM edges e JOIN p{i - 1} r ON r.node = e.src
  ) GROUP BY 1, 2)""")
    L = 6  # lcm(1..3)
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT node, CAST(COUNT(*) AS BIGINT) AS n_from,
       CAST(SUM({L} // dist) AS BIGINT) AS hnum,
       CAST(SUM({L} // dist) AS DOUBLE) / {L}.0 AS h
FROM p{BFS_MAX_HOPS} WHERE dist > 0 GROUP BY node""")




IAT_BUCKET_US = 3_600_000_000  # 1 h
IAT_MAX_BUCKET = 48


def q_iat(sf_dir: str):
    """Inter-arrival-time histogram of per-user event streams (hourly
    buckets, 48 h tail clamp) — the burstiness/traffic-model
    diagnostic (stages/sequence.py:interarrival_hist)."""
    from ..stages.sequence import interarrival_hist

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"]) \
        .map_batches(lambda b: pa.table({
            "user_id": b.column("user_id"),
            "tu": b.column("ts").cast(pa.int64()),
            "event_id": b.column("event_id")}),
            batch_format="pyarrow")
    return interarrival_hist(ev, key_col="user_id", ts_col="tu",
                             id_col="event_id",
                             bucket_us=IAT_BUCKET_US,
                             max_bucket=IAT_MAX_BUCKET)


_SQL_IAT = f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS tu, event_id FROM events),
d AS (SELECT user_id,
             tu - LAG(tu) OVER (PARTITION BY user_id
                                ORDER BY tu, event_id) AS dt
      FROM e),
b AS (SELECT LEAST(dt // {IAT_BUCKET_US}, {IAT_MAX_BUCKET}) AS bucket
      FROM d WHERE dt IS NOT NULL)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n
FROM b GROUP BY bucket"""


LATE_WIN_US = 3_600_000_000       # 1 h event-time windows
LATE_WATERMARK_US = 120_000_000   # 2 min allowed lateness
LATE_DELAY_MOD_US = 600_000_000   # synthetic transport delay < 10 min


def q_late_events(sf_dir: str):
    """Watermark-lateness accounting per event-time hour: arrival =
    event time + deterministic per-id delay, late = arrives after
    window close + 2 min watermark
    (stages/sequence.py:late_event_counts)."""
    from ..stages.sequence import late_event_counts

    ev = _read(sf_dir, "events", ["event_id", "ts"])
    return late_event_counts(ev, ts_col="ts", id_col="event_id",
                             window_us=LATE_WIN_US,
                             watermark_us=LATE_WATERMARK_US,
                             delay_mod_us=LATE_DELAY_MOD_US)


_SQL_LATE_EVENTS = f"""
WITH e AS (SELECT epoch_us(ts) AS t,
                  epoch_us(ts) + (event_id * 7919) % {LATE_DELAY_MOD_US}
                    AS arr
           FROM events),
w AS (SELECT t // {LATE_WIN_US} AS win,
             CASE WHEN arr > (t // {LATE_WIN_US} + 1) * {LATE_WIN_US}
                             + {LATE_WATERMARK_US}
                  THEN 1 ELSE 0 END AS late
      FROM e)
SELECT CAST(win AS BIGINT) AS win,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(late) AS BIGINT) AS n_late
FROM w GROUP BY win"""




def q_lpm(sf_dir: str):
    """Longest-prefix-match lookup — the CIDR / IP-geolocation join:
    nation-derived /12-style parent blocks with supplier-derived /24
    children (a laminar family), probed by customer-hashed addresses;
    unmatched points keep the left-join (-1, -1) contract
    (stages/rangejoin.py:lpm_lookup)."""
    from ..stages.rangejoin import lpm_lookup

    nat = _read(sf_dir, "nation", ["n_nationkey"]).to_pandas()
    sup = _read(sf_dir, "supplier", ["s_suppkey"]).to_pandas()
    nk = nat["n_nationkey"].to_numpy().astype(np.int64)
    sk = sup["s_suppkey"].to_numpy().astype(np.int64)
    lo_p = nk * 1_048_576
    lo_c = (sk % 25) * 1_048_576 + ((sk // 25) % 4096) * 256
    table = pa.table({
        "lo": pa.array(np.concatenate([lo_p, lo_c])),
        "hi": pa.array(np.concatenate([lo_p + 1_048_575,
                                       lo_c + 255])),
        "len": pa.array(np.concatenate([
            np.full(len(nk), 12, dtype=np.int64),
            np.full(len(sk), 24, dtype=np.int64)])),
        "rid": pa.array(np.concatenate([nk, 100_000 + sk]))})

    cust = _read(sf_dir, "customer", ["c_custkey"])

    def prep(b: pa.Table) -> pa.Table:
        c = b.column("c_custkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({"pid": pa.array(c),
                         "x": pa.array((c * 2654435761) % 33_554_432)})

    return lpm_lookup(cust.map_batches(prep, batch_format="pyarrow"),
                      table, x_col="x")


_SQL_LPM = """
WITH par AS (SELECT CAST(n_nationkey AS BIGINT) AS rid,
                    CAST(n_nationkey * 1048576 AS BIGINT) AS lo,
                    CAST(n_nationkey * 1048576 + 1048575 AS BIGINT) AS hi,
                    CAST(12 AS BIGINT) AS len FROM nation),
ch AS (SELECT CAST(100000 + s_suppkey AS BIGINT) AS rid,
              CAST((s_suppkey % 25) * 1048576
                   + ((s_suppkey // 25) % 4096) * 256 AS BIGINT) AS lo,
              CAST((s_suppkey % 25) * 1048576
                   + ((s_suppkey // 25) % 4096) * 256 + 255 AS BIGINT)
                AS hi,
              CAST(24 AS BIGINT) AS len FROM supplier),
cidr AS (SELECT * FROM par UNION ALL SELECT * FROM ch),
p AS (SELECT CAST(c_custkey AS BIGINT) AS pid,
             CAST((c_custkey * 2654435761) % 33554432 AS BIGINT) AS x
      FROM customer),
m AS (SELECT p.pid, p.x, c.len, c.rid,
             ROW_NUMBER() OVER (PARTITION BY p.pid
                                ORDER BY c.len DESC, c.rid) AS rn
      FROM p LEFT JOIN cidr c ON p.x BETWEEN c.lo AND c.hi)
SELECT pid, x, CAST(COALESCE(len, -1) AS BIGINT) AS len,
       CAST(COALESCE(rid, -1) AS BIGINT) AS rid
FROM m WHERE rn = 1"""




def q_cdc_diff(sf_dir: str):
    """Change-data-capture DIFF of two corpus versions — the data-
    versioning audit table: v1 drops doc_id % 3 == 0, v2 drops
    doc_id % 5 == 0 and rewrites doc_id % 7 == 0 (first character
    stripped); one bucketed FULL OUTER join on doc_id classifies every
    id as added / removed / changed / same
    (stages/hashjoin.py:bucketed_join how='outer')."""
    from ..stages.hashjoin import bucketed_join

    docs = _read(sf_dir, "documents", ["doc_id", "text"]).materialize()

    def v1(b: pa.Table) -> pa.Table:
        i = b.column("doc_id").to_numpy(zero_copy_only=False)
        f = b.filter(pa.array(i % 3 != 0))
        return pa.table({"doc_id": f.column("doc_id"),
                         "ta": f.column("text")})

    def v2(b: pa.Table) -> pa.Table:
        i = b.column("doc_id").to_numpy(zero_copy_only=False)
        f = b.filter(pa.array(i % 5 != 0))
        i2 = f.column("doc_id").to_numpy(zero_copy_only=False)
        t = f.column("text")
        changed = pa.array(i2 % 7 == 0)
        t = pc.if_else(changed, pc.utf8_slice_codeunits(t, 1), t)
        return pa.table({"doc_id": f.column("doc_id"), "tb": t})

    j = bucketed_join(docs.map_batches(v1, batch_format="pyarrow"),
                      docs.map_batches(v2, batch_format="pyarrow"),
                      ["doc_id"], how="outer", n_buckets=16)

    def classify(b: pa.Table) -> pa.Table:
        ta = b.column("ta")
        tb = b.column("tb")
        a_null = pc.is_null(ta).to_numpy(zero_copy_only=False)
        b_null = pc.is_null(tb).to_numpy(zero_copy_only=False)
        eq = pc.fill_null(pc.equal(ta, tb), False) \
            .to_numpy(zero_copy_only=False)
        status = np.where(a_null, "added",
                          np.where(b_null, "removed",
                                   np.where(eq, "same", "changed")))
        return pa.table({"doc_id": b.column("doc_id"),
                         "status": pa.array(status, pa.string())})

    return j.map_batches(classify, batch_format="pyarrow")


_SQL_CDC_DIFF = """
WITH v1 AS (SELECT doc_id, text AS ta FROM documents
            WHERE doc_id % 3 <> 0),
v2 AS (SELECT doc_id,
              CASE WHEN doc_id % 7 = 0 THEN substr(text, 2)
                   ELSE text END AS tb
       FROM documents WHERE doc_id % 5 <> 0),
j AS (SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id, ta, tb
      FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
SELECT doc_id,
       CASE WHEN ta IS NULL THEN 'added'
            WHEN tb IS NULL THEN 'removed'
            WHEN ta = tb THEN 'same' ELSE 'changed' END AS status
FROM j"""




QUADKEY_Z = 6


def q_quadkey(sf_dir: str):
    """Per-QUADKEY density of the geocoded corpus at zoom 6 — the
    Bing-maps tile-key scheme (one base-4 digit per level; kernel
    pinned to the published 'example tile (3,5,3) -> 213' vector)
    (geom/cells.py:quadkey_of)."""
    from ..stages.bucketed import bucketed_groupby

    pts = _geocoded(sf_dir, RES_ZONAL)

    def part(b: pa.Table) -> pa.Table:
        import pandas as pd

        qk = cells.quadkey_of(
            b.column("lon").to_numpy(zero_copy_only=False),
            b.column("lat").to_numpy(zero_copy_only=False), QUADKEY_Z)
        vc = pd.Series(qk).value_counts(sort=False)
        return pa.table({"quadkey": pa.array(vc.index, pa.string()),
                         "n": pa.array(vc.to_numpy().astype(np.int64))})

    def fold(g):
        out = g.groupby("quadkey", sort=False, as_index=False)["n"].sum()
        out["n"] = out["n"].astype(np.int64)
        return out

    return bucketed_groupby(
        pts.map_batches(part, batch_format="pyarrow"),
        ["quadkey"], fold, n_buckets=8)


def _sql_quadkey() -> str:
    lon_e, lat_e = sql_geocode_exprs("doc_id", "lang")
    qx, qy, concat = cells.sql_quadkey_parts("lon", "lat", QUADKEY_Z)
    return f"""
WITH g AS (SELECT {lon_e} AS lon, {lat_e} AS lat FROM documents),
q AS (SELECT {qx} AS qx, {qy} AS qy FROM g),
k AS (SELECT {concat} AS quadkey FROM q)
SELECT quadkey, CAST(COUNT(*) AS BIGINT) AS n
FROM k GROUP BY quadkey"""




VOCAB_STEPS = [1000, 2000, 5000, 10000, 20000]


def q_vocab_coverage(sf_dir: str):
    """Tokenizer VOCAB COVERAGE curve — the choose-your-vocab-size
    table: fraction of all corpus tokens covered by the top-V
    unigrams at each candidate V.  Coverage at a rank cutoff is
    TIE-ORDER-FREE (any V tokens of equal count cover the same mass),
    so the driver never sees the vocabulary: the token histogram
    reduces to its COUNT-OF-COUNTS (distinct count value -> #tokens),
    bounded by distinct count VALUES (~sqrt-of-corpus under Zipf, not
    vocab size), and the curve reads off its descending cumsums with
    one partial block at each cutoff.  One token shuffle + one tiny
    reduce; one mirrored division per row."""
    import pandas as pd

    from ..stages.bucketed import bucketed_groupby
    from ..stages.ngrams import tokens_flat

    docs = _read(sf_dir, "documents", ["text"])

    def partial(b: pa.Table) -> pa.Table:
        flat, _, _ = tokens_flat(b, "text")
        df = pd.DataFrame({"w": flat.to_numpy(zero_copy_only=False)})
        g = df.groupby("w", sort=False, as_index=False).size()
        return pa.table({
            "w": pa.array(g["w"].to_numpy(), pa.string()),
            "c": pa.array(g["size"].to_numpy().astype(np.int64))})

    def fold_cc(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g.groupby("w", sort=False, as_index=False)["c"].sum()
        u, k = np.unique(cnt["c"].to_numpy().astype(np.int64),
                         return_counts=True)
        return pd.DataFrame({"c": u, "k": k.astype(np.int64)})

    cc = bucketed_groupby(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["w"], fold_cc, n_buckets=16).to_pandas()
    cc = cc.groupby("c", as_index=False)["k"].sum() \
        .sort_values("c", ascending=False).reset_index(drop=True)
    c = cc["c"].to_numpy().astype(np.int64)
    k = cc["k"].to_numpy().astype(np.int64)
    cum_tok = np.cumsum(k)          # tokens consumed by rank
    cum_mass = np.cumsum(c * k)     # corpus mass covered
    total = int(cum_mass[-1]) if len(c) else 0
    rows = []
    for v in VOCAB_STEPS:
        if len(c) == 0:
            rows.append((v, 0, 0, None))
            continue
        i = int(np.searchsorted(cum_tok, v))
        if i >= len(c):
            cov = int(cum_mass[-1])
        else:
            before_tok = int(cum_tok[i - 1]) if i else 0
            before_mass = int(cum_mass[i - 1]) if i else 0
            cov = before_mass + (v - before_tok) * int(c[i])
        rows.append((v, cov, total,
                     float(cov) / float(total) if total else None))
    return pa.table({
        "v": pa.array([r[0] for r in rows], pa.int64()),
        "covered": pa.array([r[1] for r in rows], pa.int64()),
        "total": pa.array([r[2] for r in rows], pa.int64()),
        "coverage": pa.array([r[3] for r in rows], pa.float64())})


def _sql_vocab_coverage() -> str:
    vs = ", ".join(f"({v})" for v in VOCAB_STEPS)
    return f"""
WITH tok0 AS (SELECT unnest(regexp_extract_all(text, '\\S+')) AS w
              FROM documents),
cnt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok0 GROUP BY w),
r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rn FROM cnt),
cc AS (SELECT rn, CAST(SUM(c) OVER (ORDER BY rn ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS BIGINT) AS cum FROM r),
t AS (SELECT CAST(SUM(c) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS nv FROM cnt),
vsteps(v) AS (VALUES {vs})
SELECT CAST(v AS BIGINT) AS v,
       CAST(COALESCE((SELECT cum FROM cc
                      WHERE rn = LEAST(v, t.nv)), 0) AS BIGINT)
         AS covered,
       t.total,
       CASE WHEN t.total > 0 THEN
         CAST(COALESCE((SELECT cum FROM cc
                        WHERE rn = LEAST(v, t.nv)), 0) AS DOUBLE)
         / CAST(t.total AS DOUBLE) END AS coverage
FROM vsteps, t"""


def q_dup_cluster_sizes(sf_dir: str):
    """Near-dup CLUSTER-SIZE distribution — the dedup health
    histogram: MinHash-LSH components grouped by size, (size,
    n_clusters) (stages/dedup.py:minhash_lsh_groups)."""
    import pandas as pd

    from ..stages.bucketed import bucketed_groupby
    from ..stages.dedup import minhash_lsh_groups

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    groups = minhash_lsh_groups(docs, id_col="doc_id",
                                num_perm=MH_NUM_PERM, bands=MH_BANDS,
                                k=MH_K)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        sz = g.groupby("dup_group", sort=False, as_index=False).size() \
            .rename(columns={"size": "sz"})
        vc = sz["sz"].value_counts(sort=False)
        out = pd.DataFrame({
            "sz": vc.index.to_numpy().astype(np.int64),
            "n_clusters": vc.to_numpy().astype(np.int64)})
        return out

    sizes = bucketed_groupby(groups, ["dup_group"], per_group,
                             n_buckets=16)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("sz", sort=False,
                        as_index=False)["n_clusters"].sum()
        out["n_clusters"] = out["n_clusters"].astype(np.int64)
        return out

    return bucketed_groupby(sizes, ["sz"], fold, n_buckets=4)


def _sql_dup_cluster_sizes() -> str:
    return ("WITH RECURSIVE " + _sql_minhash_cc_ctes() + """,
gs AS (SELECT dup_group, CAST(COUNT(*) AS BIGINT) AS sz
       FROM labels GROUP BY dup_group)
SELECT sz, CAST(COUNT(*) AS BIGINT) AS n_clusters
FROM gs GROUP BY sz""")


OVERLAP_PRE_TOKENS = 8


def q_source_overlap(sf_dir: str):
    """Cross-source BOILERPLATE overlap matrix — which feeds share
    opening phrases: for every unordered source pair, the number of
    distinct 8-token document OPENINGS appearing in both (per-opening
    distinct-source sets are tiny, so pairs expand combinatorially
    inside the per-key group) (the dedup provenance report)."""
    import pandas as pd

    from ..stages.bucketed import bucketed_groupby
    from ..stages.ngrams import tokens_flat

    docs = _read(sf_dir, "documents", ["text", "source"])

    def prefix(b: pa.Table) -> pa.Table:
        flat, doc_of, ndocs = tokens_flat(b, "text")
        toks = flat.to_numpy(zero_copy_only=False)
        starts = np.searchsorted(doc_of, np.arange(ndocs + 1))
        pres = [" ".join(
            toks[starts[d]:min(starts[d] + OVERLAP_PRE_TOKENS,
                               starts[d + 1])])
            for d in range(ndocs)]
        return pa.table({
            "pre": pa.array(pres, pa.string()),
            "source": b.column("source")})

    keyed = docs.map_batches(prefix, batch_format="pyarrow")

    def per_hash(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized within-segment pair expansion (no per-group
        # Python loop — the driver-loop tail-killer pattern): distinct
        # (pre, source) rows sorted, then each pre-segment's ordered
        # pairs come from one repeat/arange pass
        d = g.drop_duplicates(["pre", "source"]) \
            .sort_values(["pre", "source"], kind="mergesort")
        pre = d["pre"].to_numpy()
        src = d["source"].to_numpy()
        seg_start = np.concatenate([[True], pre[1:] != pre[:-1]])
        seg_ids = np.cumsum(seg_start) - 1
        starts = np.flatnonzero(seg_start)
        lens = np.diff(np.concatenate([starts, [len(pre)]]))
        m = lens[seg_ids]                       # segment size per row
        pos = np.arange(len(pre)) - starts[seg_ids]
        # row i pairs with the (m - pos - 1) LATER rows of its segment
        reps = (m - pos - 1)
        ia = np.repeat(np.arange(len(pre)), reps)
        off = np.arange(int(reps.sum()), dtype=np.int64) \
            - np.repeat(np.cumsum(reps) - reps, reps)
        ib = ia + 1 + off
        if len(ia) == 0:
            return pd.DataFrame({"src_a": pd.Series([], dtype=object),
                                 "src_b": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        df = pd.DataFrame({"src_a": src[ia], "src_b": src[ib]})
        out = df.groupby(["src_a", "src_b"], as_index=False).size() \
            .rename(columns={"size": "n"})
        out["n"] = out["n"].astype(np.int64)
        return out

    pairs = bucketed_groupby(keyed, ["pre"], per_hash,
                             n_buckets=16)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["src_a", "src_b"], sort=False,
                        as_index=False)["n"].sum()
        out["n"] = out["n"].astype(np.int64)
        return out

    return bucketed_groupby(pairs, ["src_a", "src_b"], fold,
                            n_buckets=4)


_SQL_SOURCE_OVERLAP = f"""
WITH d AS (SELECT DISTINCT array_to_string(
             (regexp_extract_all(text, '\\S+'))[1:{OVERLAP_PRE_TOKENS}],
             ' ') AS pre, source FROM documents),
p AS (SELECT a.pre, a.source AS src_a, b.source AS src_b
      FROM d a JOIN d b ON a.pre = b.pre AND a.source < b.source)
SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS n
FROM p GROUP BY src_a, src_b"""




def q_spatial_gini(sf_dir: str):
    """SPATIAL CONCENTRATION of the geocoded corpus: the Gini
    coefficient of per-cell document counts (how unevenly the crawl
    covers the grid) — the cell-occupancy histogram feeds the same
    sorted-rank identity as grouped_gini under one constant key."""
    from ..stages.zonal import grouped_gini

    pts = _geocoded(sf_dir, RES_ZONAL)

    def counts(b: pa.Table) -> pa.Table:
        import pandas as pd

        vc = pd.Series(b.column("cell").to_numpy(
            zero_copy_only=False)).value_counts(sort=False)
        return pa.table({"cell": pa.array(vc.index.to_numpy(),
                                          pa.int64()),
                         "x": pa.array(vc.to_numpy().astype(np.int64))})

    from ..stages.bucketed import bucketed_groupby

    def fold(g):
        out = g.groupby("cell", sort=False, as_index=False)["x"].sum()
        out["x"] = out["x"].astype(np.int64)
        return out

    occ = bucketed_groupby(
        pts.map_batches(counts, batch_format="pyarrow"),
        ["cell"], fold, n_buckets=8)

    def tag(b: pa.Table) -> pa.Table:
        return pa.table({
            "k": pa.array(np.zeros(b.num_rows, np.int64)),
            "x": b.column("x")})

    return grouped_gini(occ.map_batches(tag, batch_format="pyarrow"),
                        ["k"], "x", n_buckets=4)


def _sql_spatial_gini() -> str:
    return f"""
{_sql_counts_cte()},
h AS (SELECT 0 AS k, x AS v, CAST(COUNT(*) AS BIGINT) AS c
      FROM counts GROUP BY 2),
t AS (SELECT k, CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(v * c) AS BIGINT) AS sv FROM h GROUP BY 1),
cbs AS (SELECT k, v, c,
        CAST(SUM(c) OVER (PARTITION BY k ORDER BY v) - c AS BIGINT)
          AS cb FROM h),
g AS (SELECT cbs.k,
        CAST(SUM(cbs.v * cbs.c * (2 * cbs.cb + cbs.c - t.n)) AS BIGINT)
          AS num FROM cbs JOIN t ON t.k = cbs.k GROUP BY cbs.k)
SELECT CAST(t.k AS BIGINT) AS k, t.n,
       CASE WHEN t.n * t.sv > 0 THEN
         CAST(g.num AS DOUBLE) / CAST(t.n * t.sv AS DOUBLE) END AS gini
FROM t JOIN g ON g.k = t.k"""




LDIV_L = 3


def q_ldiv(sf_dir: str):
    """l-diversity audit — k-anonymity's attribute-disclosure sibling:
    per (nation x segment) class, the number of DISTINCT order
    priorities among the class's customers' orders; classes below
    l=3 are exposed (stages/profile.py:l_diversity)."""
    from ..stages.hashjoin import bucketed_join
    from ..stages.profile import l_diversity

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderpriority"]).map_batches(
        lambda b: b.rename_columns(["c_custkey", "o_orderpriority"]),
        batch_format="pyarrow")
    j = bucketed_join(orders, cust, ["c_custkey"], n_buckets=16)
    return l_diversity(j, ["c_nationkey", "c_mktsegment"],
                       "o_orderpriority", LDIV_L)


def _sql_ldiv() -> str:
    return f"""
WITH j AS (SELECT c.c_nationkey, c.c_mktsegment, o.o_orderpriority
           FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
per AS (SELECT c_nationkey, c_mktsegment,
               CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS div,
               CAST(COUNT(*) AS BIGINT) AS rows_
        FROM j GROUP BY 1, 2)
SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(COALESCE(MIN(div), 0) AS BIGINT) AS min_diversity,
       CAST(SUM(CASE WHEN div < {LDIV_L} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_classes_exposed,
       CAST(COALESCE(SUM(CASE WHEN div < {LDIV_L} THEN rows_ END), 0)
            AS BIGINT) AS n_rows_exposed
FROM per"""


def build_oracles() -> dict[str, str]:
    lon_e, lat_e = sql_geocode_exprs("doc_id", "lang")
    cell_e = cells.sql_cell_expr("lon", "lat", RES_ZONAL)
    admin_ix = f"LEAST(GREATEST(CAST(FLOOR((lon + 180.0) / 15.0) AS BIGINT), 0), {ADMIN_NX - 1})"
    admin_iy = f"LEAST(GREATEST(CAST(FLOOR((lat + 90.0) / 15.0) AS BIGINT), 0), {ADMIN_NY - 1})"
    return {
        "geocode": (
            f"WITH g AS (SELECT doc_id, {lon_e} AS lon, {lat_e} AS lat FROM documents) "
            f"SELECT doc_id, lon, lat, {cell_e} AS cell FROM g"
        ),
        "zonal": (
            f"{_sql_geo_cte(RES_ZONAL, ', n_chars')} "
            f"SELECT cell, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS n_chars_sum "
            f"FROM geo GROUP BY cell"
        ),
        "nearest_admin": _sql_nearest_admin(),
        "pyramid": _sql_pyramid(),
        "lsh_eval": _sql_lsh_eval(),
        "dedup_rate": _sql_dedup_rate(),
        "curate3": _sql_curate3(),
        "confusion": _sql_confusion(),
        "kappa": _sql_kappa(),
        "trimmed_mean": _SQL_TRIMMED_MEAN,
        "theil": _SQL_THEIL,
        "heldout_ppl": _SQL_HELDOUT_PPL,
        "seed_harmonic": _sql_seed_harmonic(),
        "iat": _SQL_IAT,
        "late_events": _SQL_LATE_EVENTS,
        "lpm": _SQL_LPM,
        "cdc_diff": _SQL_CDC_DIFF,
        "quadkey": _sql_quadkey(),
        "vocab_coverage": _sql_vocab_coverage(),
        "dup_cluster_sizes": _sql_dup_cluster_sizes(),
        "source_overlap": _SQL_SOURCE_OVERLAP,
        "spatial_gini": _sql_spatial_gini(),
        "ldiv": _sql_ldiv(),
        "densify": _sql_densify(),
        "bbox_join": _sql_bbox_join(),
        "seg_join": _sql_seg_join(),
        "hull": _sql_hull(),
        "diameter": _sql_diameter(),
        "kendall": _sql_kendall(),
        "entropy": _sql_entropy(),
        "sim_join": _sql_sim_join(),
        "twap": _sql_twap(),
        "ohlc": _sql_ohlc(),
        "geohash": _sql_geohash(),
        "rle": _sql_rle(),
        "sim_clusters": _sql_sim_clusters(),
        "sssp": _sql_sssp(),
        "norm_dedup": _sql_norm_dedup(),
        "t5_spans": _sql_t5_spans(),
        "kl_sources": _sql_kl_sources(),
        "jsd": _sql_jsd(),
        "er_canonical": _sql_er_canonical(),
        "centroids": _sql_centroids(),
        "proto_sim": _sql_proto_sim(),
        "gram": _sql_gram(),
        "moran": _sql_moran(),
        "moran_w": _sql_moran_w(),
        "diameter_lb": _sql_diameter_lb(),
        "pca1": _sql_pca1(),
        "gi_star": _sql_gi_star(),
        "variogram": _sql_variogram(),
        "dissolve": _sql_dissolve(),
        "idw": _sql_idw(),
        "hotspot_docs": _sql_hotspot_docs(),
        "ripley": _sql_ripley(),
        "dispersion": _sql_dispersion(),
        "clark_evans": _sql_clark_evans(),
        "tri": _sql_tri(),
        "join_counts": _sql_join_counts(),
        "eb_rates": _sql_eb_rates(),
        "mk_trend": _sql_mk_trend(),
        "theil_sen": _sql_theil_sen(),
        "dow_chi2": _sql_dow_chi2(),
        "wavelet": _sql_wavelet(),
        "od_matrix": _sql_od_matrix(),
        "reciprocity": _sql_reciprocity(),
        "funnel_depth": _sql_funnel_depth(),
        "survival": _sql_survival(),
        "hexbin": _sql_hexbin(),
        "knox": _sql_knox(),
        "regions": _sql_regions(),
        "simplify": _sql_simplify(),
        "readability": _sql_readability(),
        "staypoints": _sql_staypoints(),
        "traj": _sql_traj(),
        "rfm": _sql_rfm(),
        "ams_f2": _sql_ams_f2(),
        "betweenness": _sql_betweenness(),
        "flowacc": _sql_flowacc(),
        "watershed": _sql_watershed(),
        "quadtree": _sql_quadtree(),
        "proximity": _sql_proximity(),
        "voronoi": _sql_voronoi(),
        "colocation": _sql_colocation(),
        "union_area": _sql_union_area(),
        "temporal_reach": _sql_temporal_reach(),
        "wmedian": _sql_wmedian(),
        "delta_simjoin": _sql_delta_simjoin(),
        "drawdown": _sql_drawdown(),
        "extent": _sql_extent(),
        "interp": _sql_interp(),
        "chi2_cat": _sql_chi2_cat(),
        "pip_admin": (
            f"{_sql_geo_cte(RES_ZONAL)}, "
            f"j AS (SELECT doc_id, {admin_iy} AS iy, {admin_ix} AS ix FROM geo) "
            f"SELECT doc_id, iy * {ADMIN_NX} + ix AS poly_id, "
            f"'admin_' || iy || '_' || ix AS poly_name FROM j"
        ),
        "knn": _sql_knn(),
        "dup_ngram": (
            f"WITH {_sql_shingle_ctes(DUPG_K)}, "
            "cnt AS (SELECT doc_id, s, COUNT(*) AS c FROM shr GROUP BY 1, 2), "
            "st AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_shingles, "
            "COUNT(*) AS n_distinct, CAST(MAX(c) AS BIGINT) AS max_rep "
            "FROM cnt GROUP BY 1) "
            "SELECT doc_id, n_shingles, n_distinct, max_rep, "
            "(n_shingles - n_distinct)::DOUBLE / n_shingles::DOUBLE AS dup_frac "
            "FROM st"
        ),
        "decontam": (
            f"WITH {_sql_shingle_ctes(DECON_K)}, "
            f"bench AS (SELECT DISTINCT s FROM shr "
            f"WHERE doc_id % {DECON_MOD} = {DECON_REM}) "
            "SELECT r.doc_id, COUNT(DISTINCT r.s) AS n_hits "
            "FROM shr r JOIN bench b ON r.s = b.s "
            f"WHERE r.doc_id % {DECON_MOD} <> {DECON_REM} GROUP BY 1"
        ),
        "ngram_topk": (
            "WITH tok AS (SELECT regexp_extract_all(text, '\\S+') AS toks "
            "FROM documents), "
            "g AS (SELECT unnest(list_transform(range(1, len(toks)), "
            "i -> toks[i] || ' ' || toks[i+1])) AS gram FROM tok) "
            "SELECT gram, COUNT(*) AS n FROM g GROUP BY 1 "
            f"ORDER BY n DESC, gram LIMIT {NGRAM_TOPK}"
        ),
        "colloc": _sql_colloc(),
        "chi2_tokens": _sql_chi2_tokens(),
        "zipf": _sql_zipf(),
        "lisa": _sql_lisa(),
        "emerging": _sql_emerging(),
        "temporal_gi": _sql_temporal_gi(),
        "rrf": _sql_rrf(),
        "mmr": _sql_mmr(),
        "ir_eval": _sql_ir_eval(),
        "ndcg": _sql_ndcg(),
        "src_sim": _sql_src_sim(),
        "shards": _sql_shards(),
        "quota": _sql_quota(),
        "pcont": _sql_pcont(),
        "skyline": _SQL_SKYLINE,
        "ab_test": _SQL_AB_TEST,
        "anova": _sql_anova(),
        "mwu": _SQL_MWU,
        "auc": _sql_auc(),
        "kruskal": _sql_kruskal(),
        "qnorm": _sql_qnorm(),
        "cusum": _SQL_CUSUM,
        "covered_time": _SQL_COVERED_TIME,
        "autocorr": _SQL_AUTOCORR,
        "ks_test": _SQL_KS,
        "spearman": _SQL_SPEARMAN,
        "gini": _SQL_GINI,
        "corr": (
            r"WITH f AS (SELECT lang, n_chars, "
            r"CAST(LEN(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok "
            "FROM documents), s AS (SELECT lang, "
            "CAST(COUNT(*) AS BIGINT) AS n, SUM(n_chars) AS sx, "
            "SUM(n_tok) AS sy, SUM(n_chars * n_tok) AS sxy, "
            "SUM(n_chars * n_chars) AS sxx, SUM(n_tok * n_tok) AS syy "
            "FROM f GROUP BY lang), d AS (SELECT lang, n, "
            "CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) "
            "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov, "
            "CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) "
            "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx, "
            "CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) "
            "- CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy FROM s) "
            "SELECT lang, n, CASE WHEN vx > 0 AND vy > 0 "
            "THEN cov / (SQRT(vx) * SQRT(vy)) ELSE NULL END AS corr "
            "FROM d"
        ),
        "rolling": (
            "WITH c AS (SELECT o_orderkey, o_custkey, "
            "CAST(ROUND(o_totalprice * 100.0) AS BIGINT) AS cents "
            "FROM orders) "
            "SELECT o_orderkey, o_custkey, cents, "
            "CAST(SUM(cents) OVER w AS BIGINT) AS roll_sum, "
            "CAST(COUNT(cents) OVER w AS BIGINT) AS roll_cnt, "
            "MIN(cents) OVER w AS roll_min, "
            "MAX(cents) OVER w AS roll_max "
            "FROM c WINDOW w AS (PARTITION BY o_custkey ORDER BY "
            f"o_orderkey ROWS BETWEEN {ROLL_N - 1} PRECEDING "
            "AND CURRENT ROW)"
        ),
        "fuzzy_contam": (
            "WITH terms(term) AS (VALUES "
            + ", ".join(f"('{t}')" for t in FUZZY_TERMS) + "), "
            r"tok AS (SELECT doc_id, "
            r"unnest(regexp_extract_all(text, '\S+')) AS w "
            "FROM documents), tu AS (SELECT DISTINCT doc_id, w FROM tok "
            f"WHERE w ~ '^[!-~]{{1,{FUZZY_MAXLEN}}}$') "
            "SELECT DISTINCT doc_id, term FROM tu JOIN terms "
            "ON levenshtein(w, term) <= 1"
        ),
        "set_intersect": (
            "SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem "
            f"WHERE l_discount >= {SETOP_DISC} "
            "INTERSECT "
            "SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem "
            f"WHERE l_tax >= {SETOP_DISC}"
        ),
        "set_except": (
            "SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O' "
            "EXCEPT "
            "SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'"
        ),
        "regress": (
            r"WITH f AS (SELECT lang, n_chars, "
            r"CAST(LEN(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok "
            "FROM documents), s AS (SELECT lang, "
            "CAST(COUNT(*) AS BIGINT) AS n, SUM(n_chars) AS sx, "
            "SUM(n_tok) AS sy, SUM(n_chars * n_tok) AS sxy, "
            "SUM(n_chars * n_chars) AS sxx FROM f GROUP BY lang), "
            "d AS (SELECT lang, n, CAST(n AS DOUBLE) AS nd, "
            "CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd, "
            "CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) "
            "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov, "
            "CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) "
            "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx FROM s) "
            "SELECT lang, n, "
            "CASE WHEN vx > 0 THEN cov / vx ELSE NULL END AS slope, "
            "CASE WHEN vx > 0 THEN (syd - (cov / vx) * sxd) / nd "
            "ELSE NULL END AS intercept FROM d"
        ),
        "band_mode": (
            "WITH c AS (SELECT o_custkey, "
            "CAST(ROUND(o_totalprice * 100.0) AS BIGINT) "
            f"// {RANK_BAND} AS band FROM orders), "
            "n AS (SELECT o_custkey, band, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM c GROUP BY 1, 2) "
            "SELECT o_custkey, band AS mode_v, n AS mode_n FROM n "
            "QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey "
            "ORDER BY n DESC, band) = 1"
        ),
        "order_ranks": (
            "WITH c AS (SELECT o_orderkey, o_custkey, "
            "CAST(ROUND(o_totalprice * 100.0) AS BIGINT) "
            f"// {RANK_BAND} AS band FROM orders) "
            "SELECT o_orderkey, o_custkey, band, "
            "CAST(RANK() OVER (PARTITION BY o_custkey ORDER BY band) "
            "AS BIGINT) AS rnk, "
            "CAST(DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY band)"
            " AS BIGINT) AS dnk FROM c"
        ),
        "histogram": (
            "WITH c AS (SELECT CAST(ROUND(o_totalprice * 100.0) AS BIGINT)"
            " AS v FROM orders), b AS (SELECT LEAST(GREATEST(v, 0) "
            f"// {HIST_W}, {HIST_BINS - 1}) AS bin FROM c), "
            "cnt AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n FROM b "
            "GROUP BY 1) "
            f"SELECT r.range AS bin, CAST(COALESCE(cnt.n, 0) AS BIGINT) "
            f"AS n FROM range({HIST_BINS}) r LEFT JOIN cnt "
            "ON r.range = cnt.bin"
        ),
        "melt": (
            "WITH c AS (SELECT l_orderkey, l_linenumber, "
            "CAST(ROUND(l_quantity * 100.0) AS BIGINT) AS qty_c, "
            "CAST(ROUND(l_extendedprice * 100.0) AS BIGINT) AS price_c, "
            "CAST(ROUND(l_tax * 100.0) AS BIGINT) AS tax_c FROM lineitem) "
            + " UNION ALL ".join(
                f"SELECT l_orderkey, l_linenumber, '{mcol}' AS measure, "
                f"{mcol} AS v FROM c" for mcol in MELT_MEASURES)
        ),
        "zorder": (
            f"WITH g AS (SELECT doc_id, {lon_e} AS lon, {lat_e} AS lat "
            "FROM documents), xy AS (SELECT doc_id, "
            f"{cells.sql_nxny_exprs('lon', 'lat', ZORDER_RES)[0]} AS nx, "
            f"{cells.sql_nxny_exprs('lon', 'lat', ZORDER_RES)[1]} AS ny "
            "FROM g), z AS (SELECT doc_id, "
            f"{cells.sql_morton_expr('nx', 'ny', ZORDER_RES)} AS zkey "
            "FROM xy) SELECT doc_id, zkey, "
            f"zkey >> {2 * ZORDER_RES + 1 - ZORDER_PBITS} AS part FROM z"
        ),
        "hilbert": (
            f"WITH g AS (SELECT doc_id, {lon_e} AS lon, {lat_e} AS lat "
            "FROM documents), xy AS (SELECT doc_id, "
            f"{cells.sql_nxny_exprs('lon', 'lat', HILBERT_RES)[0]} AS nx, "
            f"{cells.sql_nxny_exprs('lon', 'lat', HILBERT_RES)[1]} AS ny "
            "FROM g), "
            + cells.sql_hilbert_ctes("xy", "doc_id")
            + " SELECT doc_id, hkey, "
            f"hkey >> {32 - HILBERT_PBITS} AS part FROM hfin"
        ),
        "pivot_status": (
            "WITH o AS (SELECT o_custkey, o_orderstatus, "
            "CAST(ROUND(o_totalprice * 100.0) AS BIGINT) AS cents "
            "FROM orders) SELECT o_custkey, "
            + ", ".join(
                f"CAST(SUM(CASE WHEN o_orderstatus = '{s}' THEN 1 ELSE 0 "
                f"END) AS BIGINT) AS n_{s.lower()}, "
                f"CAST(SUM(CASE WHEN o_orderstatus = '{s}' THEN cents "
                f"ELSE 0 END) AS BIGINT) AS sum_{s.lower()}"
                for s in ("F", "O", "P"))
            + " FROM o GROUP BY 1"
        ),
        "status_seq": (
            "SELECT o_custkey, string_agg(o_orderstatus, ',' "
            "ORDER BY o_orderkey) AS o_orderstatus_seq "
            "FROM orders GROUP BY 1"
        ),
        "user_gaps": (
            "SELECT event_id, user_id, "
            "epoch_us(ts) - LAG(epoch_us(ts)) OVER ("
            "PARTITION BY user_id ORDER BY event_id) AS gap_us FROM events"
        ),
        "user_next_gap": (
            "SELECT event_id, user_id, "
            "LEAD(epoch_us(ts)) OVER ("
            "PARTITION BY user_id ORDER BY event_id) - epoch_us(ts) "
            "AS gap_us FROM events"
        ),
        "winfns": (
            "WITH c AS (SELECT o_orderkey, o_custkey, "
            "CAST(ROUND(o_totalprice * 100.0) AS BIGINT) "
            f"// {RANK_BAND} AS band FROM orders) "
            "SELECT o_orderkey, o_custkey, band, "
            "CAST(ROW_NUMBER() OVER w2 AS BIGINT) AS rn, "
            "CAST(RANK() OVER w AS BIGINT) AS rnk, "
            "CAST(DENSE_RANK() OVER w AS BIGINT) AS dnk, "
            "PERCENT_RANK() OVER w AS prnk, "
            "CUME_DIST() OVER w AS cume, "
            f"CAST(NTILE({WINFN_NTILE}) OVER w2 AS BIGINT) AS nt "
            "FROM c WINDOW w AS (PARTITION BY o_custkey ORDER BY band), "
            "w2 AS (PARTITION BY o_custkey ORDER BY band, o_orderkey)"
        ),
        "running_total": (
            "SELECT o_orderkey, o_custkey, "
            "CAST(ROUND(o_totalprice * 100.0) AS BIGINT) AS cents, "
            "CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) OVER ("
            "PARTITION BY o_custkey ORDER BY o_orderkey) AS BIGINT) "
            "AS cum_cents FROM orders"
        ),
        "multires": (
            # mirror cells.parent integer arithmetic on the res-6 cell id
            f"{_sql_geo_cte(RES_ZONAL)}, "
            f"f AS (SELECT cell, COUNT(*) AS n FROM geo GROUP BY cell), "
            f"p AS (SELECT ((cell // {2 << RES_ZONAL}) // {1 << (RES_ZONAL - RES_COARSE)})"
            f" * {2 << RES_COARSE} + ((cell % {2 << RES_ZONAL}) // "
            f"{1 << (RES_ZONAL - RES_COARSE)}) AS parent_cell, n FROM f) "
            f"SELECT parent_cell, CAST(SUM(n) AS BIGINT) AS n FROM p "
            f"GROUP BY parent_cell"
        ),
        "chips": """
WITH s AS (
  SELECT p_partkey AS scene_id,
         128 * (1 + p_partkey % 3) AS h,
         128 * (1 + p_size % 4) AS w
  FROM part
),
g AS (SELECT scene_id, h // 64 AS ny, w // 64 AS nx FROM s)
SELECT g.scene_id,
       cy.cy * g.nx + cx.cx AS chip_id,
       cy.cy AS chip_y, cx.cx AS chip_x,
       cy.cy * 64 AS y0, cx.cx * 64 AS x0
FROM g,
     LATERAL (SELECT unnest(range(g.ny)) AS cy) cy,
     LATERAL (SELECT unnest(range(g.nx)) AS cx) cx
""",
        "rasterize": _sql_rasterize(),
        "focal": _sql_focal(),
        "sobel": _sql_sobel(),
        "phash_dedup": _sql_phash_dedup(),
        "raster_stats": _sql_raster_stats(),
        "ndi": _sql_ndi(),
        "hist_eq": _sql_hist_eq(),
        "raster_first": _sql_raster_first(),
        "r2v": _sql_r2v(),
        "warp": _sql_warp(),
        "geom_stats": _sql_geom_stats(),
        "warp_bilinear": _sql_warp_bilinear(),
        "warp_avg": _sql_warp_avg(),
        "curate2": _sql_curate2(),
        "dedup_docs": (
            "SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id, "
            "CAST(MIN(n_chars) AS BIGINT) AS n_chars FROM documents GROUP BY text"
        ),
        "delta_dedup": (
            "SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id FROM documents "
            "WHERE doc_id % 2 = 1 AND text NOT IN "
            "(SELECT text FROM documents WHERE doc_id % 2 = 0) "
            "GROUP BY text"
        ),
        "delta_vocab": _sql_delta_vocab(),
        "first_event": (
            "SELECT user_id, event_id, event_type, value FROM events "
            "QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1"
        ),
        "user_series": (
            # tie-break mirrored: the engine orders by (ts, event_id), so
            # first/last are taken from the same ROW_NUMBER frame — not
            # ARG_MIN/ARG_MAX(value, ts), which are nondeterministic when
            # (user_id, ts) repeats
            "WITH o AS (SELECT user_id, value, "
            "ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn, "
            "COUNT(*) OVER (PARTITION BY user_id) AS cnt FROM events) "
            "SELECT user_id, CAST(MAX(cnt) AS BIGINT) AS n_layers, "
            "MAX(CASE WHEN rn = 1 THEN value END) AS first_v, "
            "MAX(CASE WHEN rn = cnt THEN value END) AS last_v "
            "FROM o GROUP BY user_id"
        ),
        "topk_cells": (
            f"{_sql_geo_cte(RES_ZONAL)} "
            f"SELECT cell, COUNT(*) AS n FROM geo GROUP BY cell "
            f"ORDER BY n DESC, cell LIMIT 20"
        ),
        "token_count": (
            r"SELECT doc_id, CAST(LEN(regexp_extract_all(text, '\S+')) AS BIGINT) "
            "AS n_tokens FROM documents"
        ),
        "token_bpe": (
            "SELECT doc_id, CAST(LEN(regexp_extract_all(text, "
            f"'{textfn.BPE_PATTERN.replace(chr(39), chr(39) * 2)}')) "
            "AS BIGINT) AS n_bpe FROM documents"
        ),
        "quality": (
            r"SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_chars, "
            r"CAST(LEN(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens "
            "FROM documents"
        ),
        "ann": """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id IN (0, 1, 2)
),
cand AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qe, e.embedding) AS cos
  FROM q CROSS JOIN embeddings e
)
SELECT query_id, vec_id,
       ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
FROM cand QUALIFY rank <= 10
""",
        "lineitem_agg": (
            "SELECT l_returnflag, l_linestatus, COUNT(*) AS n, "
            "SUM(l_quantity) AS l_quantity_sum FROM lineitem "
            "WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
            "GROUP BY l_returnflag, l_linestatus"
        ),
        "mktsegment": (
            "SELECT c.c_mktsegment, COUNT(*) AS n FROM orders o "
            "JOIN customer c ON o.o_custkey = c.c_custkey GROUP BY c.c_mktsegment"
        ),
        "cust_no_orders": (
            "SELECT c_custkey FROM customer WHERE c_custkey NOT IN "
            "(SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)"
        ),
        "bloom_semi": _SQL_BLOOM_SEMI,
        "region_balance": (
            "SELECT r.r_name, COUNT(*) AS n, "
            "CAST(SUM(CAST(ROUND(s.s_acctbal * 100.0) AS BIGINT)) AS BIGINT) "
            "AS bal_cents_sum "
            "FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey "
            "JOIN region r ON n.n_regionkey = r.r_regionkey "
            "GROUP BY r.r_name"
        ),
        "priority_segment": (
            "SELECT c.c_mktsegment, o.o_orderpriority, COUNT(*) AS n "
            "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
            "GROUP BY c.c_mktsegment, o.o_orderpriority"
        ),
        "semi_customers": (
            "SELECT c_custkey FROM customer WHERE c_custkey IN "
            "(SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')"
        ),
        "score_docs": _sql_score_docs(),
        "minhash_groups": _sql_minhash_groups(),
        "simhash": _sql_simhash(),
        "lang_detect": _sql_lang_detect(),
        "emb_dups": _sql_emb_dups(),
        "delta_embdup": _sql_delta_embdup(),
        "kmeans": _sql_kmeans(),
        "semdedup": _sql_semdedup(),
        "purity": _sql_purity(),
        "silhouette": _sql_silhouette(),
        "label_noise": _sql_label_noise(),
        "knn_confusion": _sql_knn_confusion(),
        "pr_auc": _sql_pr_auc(),
        "attribution": _sql_attribution(),
        "ewma": _sql_ewma(),
        "fd_check": _sql_fd_check(),
        "gains": _sql_gains(),
        "hausdorff": _sql_hausdorff(),
        "scc": _sql_scc(),
        "bowtie": _sql_bowtie(),
        "headings": _sql_headings(),
        "kanon": _sql_kanon(),
        "paths": _sql_paths(),
        "psi": _sql_psi(),
        "snap": _sql_snap(),
        "seasonality": _sql_seasonality(),
        "dtw": _sql_dtw(),
        "coverage": _sql_coverage(),
        "lorenz": _sql_lorenz(),
        "neg_sample": _sql_neg_sample(),
        "acf": _sql_acf(),
        "ols2": _sql_ols2(),
        "q7_volume": _sql_q7_volume(),
        "delta_upsert": _sql_delta_upsert(),
        "pq_codes": _sql_pq_codes(),
        "pq_ann": _sql_pq_ann(),
        "ivfpq_ann": _sql_ivfpq_ann(),
        "curate": _sql_curate(),
        "near_dup": _sql_near_dup(),
        "contain_dup": _sql_contain_dup(),
        "tfidf": _sql_tfidf(),
        "wjac_dup": _sql_wjac_dup(),
        "top_orders": (
            "SELECT o_orderkey, o_totalprice FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
        ),
        "top_per_group": (
            "SELECT o_orderkey, o_orderpriority, o_totalprice, rank FROM ("
            "SELECT o_orderkey, o_orderpriority, o_totalprice, "
            "ROW_NUMBER() OVER (PARTITION BY o_orderpriority "
            "ORDER BY o_totalprice DESC, o_orderkey) AS rank FROM orders) "
            "WHERE rank <= 2"
        ),
        "median_price": (
            "SELECT o_orderpriority, "
            "MEDIAN(CAST(ROUND(o_totalprice * 100.0) AS BIGINT))::DOUBLE "
            "AS median FROM orders GROUP BY o_orderpriority"
        ),
        "quantiles": (
            "WITH c AS (SELECT o_orderpriority, "
            "CAST(ROUND(o_totalprice * 100.0) AS BIGINT) AS v FROM orders) "
            "SELECT o_orderpriority, "
            "quantile_disc(v, 0.25) AS p25, quantile_disc(v, 0.5) AS p50, "
            "quantile_disc(v, 0.75) AS p75, quantile_disc(v, 0.9) AS p90 "
            "FROM c GROUP BY o_orderpriority"
        ),
        # qsketch: the engine certifies the sketch's guaranteed rank-error
        # bound against exact second-pass rank windows and emits 1-flags;
        # the oracle checks the exact n per key plus the certification
        # (a flag of 0 — bound violated — hash-mismatches immediately).
        "qsketch": (
            "SELECT o_orderpriority, COUNT(*) AS n, "
            "1 AS ok25, 1 AS ok50, 1 AS ok90 "
            "FROM orders GROUP BY o_orderpriority"
        ),
        "profile": (
            " UNION ALL ".join(
                f"SELECT '{c}' AS col_name, COUNT(*) AS n, "
                f"COUNT(*) - COUNT({c}) AS nulls, "
                + (f"MIN({c}) AS min_num, MAX({c}) AS max_num, "
                   "CAST(NULL AS VARCHAR) AS min_str, "
                   "CAST(NULL AS VARCHAR) AS max_str, "
                   if kind == "num" else
                   "CAST(NULL AS DOUBLE) AS min_num, "
                   "CAST(NULL AS DOUBLE) AS max_num, "
                   f"MIN({c}) AS min_str, MAX({c}) AS max_str, ")
                + f"COUNT(DISTINCT {c}) AS ndv FROM lineitem"
                for c, kind in [("l_quantity", "num"), ("l_discount", "num"),
                                ("l_returnflag", "str"), ("l_linestatus", "str")]
            )
        ),
        "scrub": (
            r"WITH s1 AS (SELECT doc_id, "
            r"len(regexp_extract_all(text, '\b(?:key|hash|scan)\b')) AS hits_k, "
            r"regexp_replace(text, '\b(?:key|hash|scan)\b', '[K]', 'g') AS t1 "
            r"FROM documents), "
            r"s2 AS (SELECT doc_id, hits_k, "
            r"len(regexp_extract_all(t1, 'qu[a-z]+')) AS hits_q, "
            r"regexp_replace(t1, 'qu[a-z]+', '[Q]', 'g') AS clean FROM s1) "
            r"SELECT doc_id, clean, hits_k, hits_q FROM s2"
        ),
        "pack": (
            "WITH c AS (SELECT doc_id, n_chars, "
            "CAST(SUM(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN "
            "UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum "
            "FROM documents) "
            f"SELECT doc_id, n_chars, cum, (cum - n_chars) // {PACK_BUDGET} "
            "AS shard FROM c"
        ),
        "rollup": (
            "SELECT l_returnflag, l_linestatus, COUNT(*) AS n, "
            "SUM(l_quantity) AS l_quantity_sum FROM lineitem "
            "GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), "
            "(l_returnflag), ())"
        ),
        "events_hourly": (
            "SELECT event_type, CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour, "
            "COUNT(*) AS n FROM events GROUP BY event_type, hour"
        ),
        "sample": (
            f"SELECT doc_id, lang FROM documents WHERE "
            f"{hashing.sql_knuth_unit_expr('doc_id * 7 + 1')} < 0.1"
        ),
        "sliding_value": f"""
WITH e AS (SELECT event_type,
                  CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS u,
                  CAST(ROUND(value * 100.0) AS BIGINT) AS v FROM events)
SELECT event_type, u - o.off AS window, COUNT(*) AS n,
       CAST(SUM(v) AS BIGINT) AS v_cents_sum,
       CAST(MAX(v) AS BIGINT) AS v_cents_max
FROM e, LATERAL (SELECT unnest(range({SLIDE_SIZE_UNITS})) AS off) o
GROUP BY event_type, u - o.off
""",
        "sliding_big": f"""
WITH e AS (SELECT event_type,
                  CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS u,
                  CAST(ROUND(value * 100.0) AS BIGINT) AS v FROM events)
SELECT event_type, u - o.off AS window, COUNT(*) AS n,
       CAST(SUM(v) AS BIGINT) AS v_cents_sum,
       CAST(MIN(v) AS BIGINT) AS v_cents_min,
       CAST(MAX(v) AS BIGINT) AS v_cents_max
FROM e, LATERAL (SELECT unnest(range({SLIDE_BIG_UNITS})) AS off) o
GROUP BY event_type, u - o.off
""",
        "range_windows": (
            "WITH w(window_id, lo, hi) AS (VALUES "
            + ", ".join(
                f"({w}, {RANGE_BASE_US + w * RANGE_STEP_US}, "
                f"{RANGE_BASE_US + w * RANGE_STEP_US + RANGE_LEN_US})"
                for w in range(RANGE_N_WIN)
            )
            + "), e AS (SELECT epoch_us(ts) AS t, "
            "CAST(ROUND(value * 100.0) AS BIGINT) AS v FROM events) "
            "SELECT w.window_id, COUNT(*) AS n, "
            "CAST(SUM(e.v) AS BIGINT) AS v_cents_sum "
            "FROM e JOIN w ON e.t >= w.lo AND e.t < w.hi "
            "GROUP BY w.window_id"
        ),
        "keyed_range": f"""
WITH u AS (SELECT DISTINCT user_id FROM events),
w AS (
  SELECT user_id AS r_user, CAST(o.j AS BIGINT) AS win,
         {RANGE_BASE_US} + ((user_id * 7 + o.j * 13) % 40) * {KR_DAY_US} AS lo
  FROM u, LATERAL (SELECT unnest(range({KR_N_WIN})) AS j) o
),
e AS (SELECT user_id, epoch_us(ts) AS t,
             CAST(ROUND(value * 100.0) AS BIGINT) AS v FROM events)
SELECT e.user_id, w.win, COUNT(*) AS n, CAST(SUM(e.v) AS BIGINT) AS v_cents_sum
FROM e JOIN w ON e.user_id = w.r_user AND e.t >= w.lo AND e.t < w.lo + {KR_LEN_US}
GROUP BY e.user_id, w.win
""",
        "asof": (
            "WITH p AS (SELECT event_id, user_id, ts FROM events "
            "WHERE event_type = 'purchase'), "
            "v AS (SELECT user_id, ts, CAST(ROUND(value * 100.0) AS BIGINT) "
            "AS prev_view_cents FROM events WHERE event_type = 'view') "
            "SELECT p.event_id, p.user_id, v.prev_view_cents "
            "FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts"
        ),
        "peak_value": (
            "WITH c AS (SELECT user_id, "
            "CAST(ROUND(value * 100.0) AS BIGINT) AS v, "
            "SUM(CAST(ROUND(value * 100.0) AS BIGINT)) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS run FROM events) "
            "SELECT user_id, CAST(MAX(run) AS BIGINT) AS peak_cents, "
            "CAST(SUM(v) AS BIGINT) AS total_cents FROM c GROUP BY user_id"
        ),
        "join_agg": (
            "SELECT o.o_orderpriority, COUNT(*) AS n, "
            "SUM(l.l_quantity) AS l_quantity_sum "
            "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "GROUP BY o.o_orderpriority"
        ),
        "distinct_users": (
            "SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) "
            "AS n_users FROM events GROUP BY event_type"
        ),
        "strat_sample": (
            f"SELECT event_type, event_id FROM ("
            f"SELECT event_type, event_id, ROW_NUMBER() OVER ("
            f"PARTITION BY event_type ORDER BY "
            f"{hashing.sql_knuth_expr('event_id')}, event_id) AS rn "
            f"FROM events) WHERE rn <= {STRAT_N}"
        ),
        "approx_users": _sql_approx_users(),
        "kmv": _sql_kmv(),
        "benford": _sql_benford(),
        "hll_overlap": _sql_hll_overlap(),
        "cms_users": _sql_cms_users(),
        "heavy_hitters": (
            "SELECT user_id, COUNT(*) AS n_lo, COUNT(*) AS n_hi "
            "FROM events GROUP BY user_id "
            "ORDER BY n_hi DESC, user_id LIMIT 10"
        ),
        "parse_props": (
            "SELECT event_type, COUNT(*) AS n, "
            "CAST(SUM(CAST(regexp_extract(props, '[0-9]+') AS BIGINT)) AS BIGINT) "
            "AS k_sum, "
            "CAST(MAX(CAST(regexp_extract(props, '[0-9]+') AS BIGINT)) AS BIGINT) "
            "AS k_max "
            "FROM events GROUP BY event_type"
        ),
        "sessions": f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
flags AS (
  SELECT user_id, t,
         CASE WHEN LAG(t) OVER w IS NULL
                   OR t - LAG(t) OVER w > {SESSION_GAP_US} THEN 1
              ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)
),
sess AS (
  SELECT user_id, t,
         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY t
                               ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT)
           AS session_idx
  FROM flags
)
SELECT user_id, session_idx, COUNT(*) AS n_events,
       MIN(t) AS start_us, MAX(t) AS end_us
FROM sess GROUP BY user_id, session_idx
""",
        "sliding": f"""
WITH e AS (SELECT event_type,
                  CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS u FROM events)
SELECT event_type, u - o.off AS window, COUNT(*) AS n
FROM e, LATERAL (SELECT unnest(range({SLIDE_SIZE_UNITS})) AS off) o
GROUP BY event_type, u - o.off
""",
        "prepost": (
            "SELECT event_type, CASE WHEN ts < TIMESTAMP '2024-02-15' "
            "THEN 'pre' ELSE 'post' END AS phase, COUNT(*) AS n "
            "FROM events GROUP BY event_type, phase"
        ),
        "transitions": (
            "WITH l AS (SELECT user_id, event_type, LEAD(event_type) "
            "OVER (PARTITION BY user_id ORDER BY event_id) "
            "AS next_event_type FROM events) "
            "SELECT event_type, next_event_type, COUNT(*) AS n FROM l "
            "WHERE next_event_type IS NOT NULL GROUP BY 1, 2"
        ),
        "funnel": (
            "WITH f AS (SELECT user_id, epoch_us(ts) AS t FROM events "
            "WHERE event_type = 'view'), "
            "p AS (SELECT user_id, epoch_us(ts) AS t FROM events "
            "WHERE event_type = 'purchase') "
            "SELECT f.user_id, COUNT(*) AS n_from, "
            "CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM p WHERE "
            "p.user_id = f.user_id AND p.t > f.t AND "
            f"p.t - f.t <= {FUNNEL_WITHIN_US}) THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_conv FROM f GROUP BY f.user_id"
        ),
        "run_distinct": (
            "WITH r AS (SELECT event_id, user_id, ROW_NUMBER() OVER ("
            "PARTITION BY user_id, event_type ORDER BY event_id) AS rn "
            "FROM events) SELECT event_id, user_id, "
            "CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) OVER ("
            "PARTITION BY user_id ORDER BY event_id) AS BIGINT) "
            "AS n_types FROM r"
        ),
        "gapfill": (
            f"WITH e AS (SELECT user_id, epoch_us(ts) // {GAPFILL_UNIT_US} "
            "AS hb FROM events), "
            "b AS (SELECT user_id, hb, COUNT(*) AS n FROM e GROUP BY 1, 2), "
            "r AS (SELECT user_id, MIN(hb) AS lo, MAX(hb) AS hi FROM b "
            "GROUP BY 1), "
            "g AS (SELECT user_id, UNNEST(generate_series(lo, hi)) AS hb "
            "FROM r) "
            f"SELECT g.user_id, g.hb * {GAPFILL_UNIT_US} AS unit_us, "
            "CAST(COALESCE(b.n, 0) AS BIGINT) AS n "
            "FROM g LEFT JOIN b ON g.user_id = b.user_id AND g.hb = b.hb"
        ),
        "share": (
            "WITH c AS (SELECT o_orderkey, o_custkey, "
            "CAST(ROUND(o_totalprice * 100.0) AS BIGINT) AS cents "
            "FROM orders) "
            "SELECT o_orderkey, o_custkey, cents, "
            "CAST(cents AS DOUBLE) / CAST(SUM(cents) OVER ("
            "PARTITION BY o_custkey) AS DOUBLE) AS share FROM c"
        ),
        "firstlast": (
            "WITH c AS (SELECT o_orderkey, o_custkey, "
            "CAST(ROUND(o_totalprice * 100.0) AS BIGINT) AS cents "
            "FROM orders), "
            "r AS (SELECT o_custkey, cents, ROW_NUMBER() OVER ("
            "PARTITION BY o_custkey ORDER BY o_orderkey) AS rn FROM c) "
            "SELECT o_custkey, arg_min(cents, rn) AS first_v, "
            "arg_max(cents, rn) AS last_v, "
            f"CAST(MAX(CASE WHEN rn = {NTH_N} THEN cents END) AS DOUBLE) "
            "AS nth_v, COUNT(*) AS n FROM r GROUP BY o_custkey"
        ),
        "mad_outliers": (
            "WITH c AS (SELECT o_orderkey, o_orderpriority, "
            "CAST(ROUND(o_totalprice * 100.0) AS BIGINT) AS cents "
            "FROM orders), "
            "m AS (SELECT o_orderpriority, CAST(MEDIAN(cents) AS DOUBLE) "
            "AS med FROM c GROUP BY 1), "
            "d AS (SELECT c.o_orderkey, c.o_orderpriority, c.cents, m.med, "
            "ABS(2 * c.cents - CAST(ROUND(2 * m.med) AS BIGINT)) AS dev2 "
            "FROM c JOIN m USING (o_orderpriority)), "
            "md AS (SELECT o_orderpriority, CAST(MEDIAN(dev2) AS DOUBLE) "
            "AS mad2 FROM d GROUP BY 1) "
            "SELECT d.o_orderkey, d.o_orderpriority, d.cents, d.med, "
            "md.mad2, d.dev2 FROM d JOIN md USING (o_orderpriority) "
            f"WHERE d.dev2 > {MAD_K} * md.mad2"
        ),
        "cube": (
            "SELECT l_returnflag, l_linestatus, COUNT(*) AS n, "
            "SUM(l_quantity) AS l_quantity_sum FROM lineitem "
            "GROUP BY CUBE (l_returnflag, l_linestatus)"
        ),
        "chunks": _sql_corpus_chunks(),
        "para_dedup": _sql_para_dedup(),
        "boilerplate": _sql_boilerplate(),
        "phrase": _sql_phrase(),
        "unigram_lm": _sql_unigram_lm(),
        "naive_bayes": _sql_naive_bayes(),
        "ppl_buckets": _sql_ppl_buckets(),
        "tiling": _sql_tiling(),
        "bm25": _sql_bm25(),
        "bpe_train": _sql_bpe_train(),
        "bpe_encode": _sql_bpe_encode(),
        "keep_best": _sql_keep_best(),
        "postings": (
            r"WITH tok AS (SELECT doc_id, regexp_extract_all(text, '\S+') "
            "AS toks FROM documents), "
            "p AS (SELECT doc_id, unnest(toks) AS w FROM tok), "
            "wc AS (SELECT w, doc_id, COUNT(*) AS c FROM p GROUP BY 1, 2) "
            "SELECT w, COUNT(*) AS df, CAST(SUM(c) AS BIGINT) AS tf, "
            "string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) "
            "AS postings FROM wc GROUP BY w"
        ),
        "skipgrams": _sql_skipgrams(),
        "outer_join": (
            "WITH v AS (SELECT user_id, COUNT(*) AS n_signup FROM events "
            f"WHERE event_type = 'signup' AND value > {OUTER_VALUE_MIN} "
            "GROUP BY 1), "
            "p AS (SELECT user_id, COUNT(*) AS n_error FROM events "
            f"WHERE event_type = 'error' AND value > {OUTER_VALUE_MIN} "
            "GROUP BY 1) "
            "SELECT COALESCE(v.user_id, p.user_id) AS user_id, "
            "COALESCE(v.n_signup, 0) AS n_signup, "
            "COALESCE(p.n_error, 0) AS n_error "
            "FROM v FULL OUTER JOIN p ON v.user_id = p.user_id"
        ),
        "temp_sample": (
            "WITH nn AS (SELECT source, COUNT(*) AS ns FROM documents "
            "GROUP BY 1), "
            "r AS (SELECT doc_id, source, ROW_NUMBER() OVER ("
            "PARTITION BY source ORDER BY "
            f"{hashing.sql_knuth_expr('doc_id')}, doc_id) AS rn "
            "FROM documents) "
            "SELECT r.doc_id, r.source FROM r JOIN nn USING (source) "
            "WHERE rn <= GREATEST(1, CAST(FLOOR(SQRT("
            "CAST(ns AS DOUBLE))) AS BIGINT))"
        ),
        "wsample": (
            "SELECT doc_id, n_chars FROM documents "
            f"WHERE {hashing.sql_knuth_expr('doc_id')} "
            f"* {1 << WBERN_DENOM_LOG2} < "
            f"LEAST(CAST(n_chars AS BIGINT), {1 << WBERN_DENOM_LOG2}) "
            "* 4294967296"
        ),
        "minmax": (
            "WITH c AS (SELECT o_orderkey, o_orderpriority, "
            "CAST(ROUND(o_totalprice * 100.0) AS BIGINT) AS cents "
            "FROM orders), "
            "s AS (SELECT o_orderpriority, MIN(cents) AS lo, "
            "MAX(cents) AS hi FROM c GROUP BY 1) "
            "SELECT c.o_orderkey, c.o_orderpriority, c.cents, "
            "CASE WHEN s.hi > s.lo THEN CAST(c.cents - s.lo AS DOUBLE) "
            "/ CAST(s.hi - s.lo AS DOUBLE) ELSE NULL END AS scaled "
            "FROM c JOIN s USING (o_orderpriority)"
        ),
        "zscore": (
            "WITH c AS (SELECT event_id, event_type, "
            "CAST(ROUND(value * 100.0) AS BIGINT) AS cents FROM events), "
            "s AS (SELECT event_type, COUNT(*) AS n, SUM(cents) AS s1, "
            "SUM(cents * cents) AS s2 FROM c GROUP BY 1), "
            "t AS (SELECT event_type, "
            "CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu, "
            "CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS m2 FROM s) "
            "SELECT c.event_id, c.event_type, c.cents, "
            "CASE WHEN SQRT(t.m2 - t.mu * t.mu) > 0 THEN "
            "(CAST(c.cents AS DOUBLE) - t.mu) / SQRT(t.m2 - t.mu * t.mu) "
            "ELSE NULL END AS z FROM c JOIN t USING (event_type)"
        ),
        "split": (
            "SELECT lang, CASE "
            f"WHEN {hashing.sql_knuth_expr('doc_id')} < {SPLIT_TRAIN_T} "
            "THEN 'train' "
            f"WHEN {hashing.sql_knuth_expr('doc_id')} < {SPLIT_VAL_T} "
            "THEN 'val' ELSE 'test' END AS split, COUNT(*) AS n "
            "FROM documents GROUP BY 1, 2"
        ),
        "len_buckets": (
            r"WITH t AS (SELECT CAST(LEN(regexp_extract_all(text, '\S+')) "
            "AS BIGINT) AS n_tok FROM documents) "
            f"SELECT n_tok // {LENBUCKET_TOKENS} AS bucket, "
            "COUNT(*) AS n, MAX(n_tok) AS max_tok, "
            "CAST(COUNT(*) * MAX(n_tok) - SUM(n_tok) AS BIGINT) "
            "AS pad_waste "
            f"FROM t GROUP BY n_tok // {LENBUCKET_TOKENS}"
        ),
        "bpe_pairs": (
            r"WITH tok AS (SELECT regexp_extract_all(text, '\S+') AS toks "
            "FROM documents), "
            "w AS (SELECT unnest(toks) AS t FROM tok), "
            "p AS (SELECT unnest(list_transform(range(1, length(t)), "
            "i -> substr(t, i, 2))) AS pair FROM w WHERE length(t) > 1) "
            "SELECT pair, COUNT(*) AS n FROM p GROUP BY pair"
        ),
        "basket": (
            "WITH d AS (SELECT DISTINCT user_id, event_type FROM events) "
            "SELECT a.event_type AS t1, b.event_type AS t2, COUNT(*) AS n "
            "FROM d a JOIN d b ON a.user_id = b.user_id "
            "AND a.event_type < b.event_type GROUP BY 1, 2"
        ),
        "winsorize": _sql_winsor(),
        "raster_mode": _sql_raster_mode(),
        "pagerank": _sql_pagerank(),
        "hits": _sql_hits(),
        "assort": _sql_assort(),
        "retention": _sql_retention(),
        "delta_pagerank": _sql_delta_pagerank(),
        "wpagerank": _sql_pagerank(weighted=True),
        "ppr": _sql_pagerank(
            f"CASE WHEN n.node % {BFS_SEED_MOD} = 0 THEN 1 ELSE 0 END"),
        "bfs_hops": _sql_bfs_hops(),
        "neighbor_sample": _sql_neighbor_sample(),
        "common_neighbors": _sql_common_neighbors(),
        "link_pred": _sql_link_pred(),
        "adamic": _sql_adamic(),
        "stress": _sql_stress(),
        "seed_reach": _sql_seed_reach(),
        "harmonic": _sql_harmonic(),
        "closeness": _sql_closeness(),
        "edit_join": _sql_edit_join(),
        "butterfly": _sql_butterfly(),
        "mis": _sql_mis(),
        "mst": _sql_mst(),
        "components": _sql_components(),
        "triangles": _sql_triangles(),
        "clustering": _sql_clustering(),
        "richclub": _sql_richclub(),
        "plaw": _sql_plaw(),
        "source_hhi": _SQL_SOURCE_HHI,
        "dbscan": _sql_dbscan(),
        "kcore": _sql_kcore(),
        "lpa": _sql_lpa(),
        "modularity": _sql_modularity(),
        "walks": _sql_walks(),
        "ktruss": _sql_ktruss(),
        "dup_spans": _sql_dup_spans(),
        "winnow_spans": _sql_dup_spans(),
        "cdc_chunks": _sql_cdc_chunks(),
        "cdc_dedup": _sql_cdc_dedup(),
        "strip_spans": _sql_strip_spans(),
        "delta_neardup": _sql_delta_neardup(),
        "split_explode": _SQL_SPLIT_EXPLODE,
        "bigram_lm": _sql_bigram_lm(),
        "dsir": _sql_dsir(),
        "pack_spans": _sql_pack_spans(),
        "q5_nation_rev": (
            "WITH j AS (SELECT n.n_name, "
            "CAST(ROUND(l.l_extendedprice * 100.0) AS BIGINT) * "
            "(100 - CAST(ROUND(l.l_discount * 100.0) AS BIGINT)) AS rev "
            "FROM lineitem l "
            "JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "JOIN customer c ON o.o_custkey = c.c_custkey "
            "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "JOIN region r ON n.n_regionkey = r.r_regionkey "
            f"WHERE r.r_name = '{Q5_REGION}' "
            "AND s.s_nationkey = c.c_nationkey) "
            "SELECT n_name, COUNT(*) AS n, CAST(SUM(rev) AS BIGINT) "
            "AS rev_sum FROM j GROUP BY n_name"
        ),
        "promo_rev": (
            "WITH l AS (SELECT l_partkey, "
            "CAST(ROUND(l_extendedprice * 100.0) AS BIGINT) * "
            "(100 - CAST(ROUND(l_discount * 100.0) AS BIGINT)) AS rev "
            f"FROM lineitem WHERE epoch_us(l_shipdate) >= {Q14_LO_US} "
            f"AND epoch_us(l_shipdate) < {Q14_HI_US}), "
            "j AS (SELECT p.p_type, l.rev FROM l "
            "JOIN part p ON l.l_partkey = p.p_partkey) "
            "SELECT CAST(SUM(CASE WHEN p_type = "
            f"'{Q14_TYPE}' THEN rev ELSE 0 END) AS BIGINT) AS promo_c, "
            "CAST(SUM(rev) AS BIGINT) AS total_c, "
            "100.0 * CAST(SUM(CASE WHEN p_type = "
            f"'{Q14_TYPE}' THEN rev ELSE 0 END) AS DOUBLE) "
            "/ CAST(SUM(rev) AS DOUBLE) AS promo_pct FROM j"
        ),
        "q3_top": (
            "WITH c AS (SELECT c_custkey FROM customer "
            f"WHERE c_mktsegment = '{Q3_SEGMENT}'), "
            "o AS (SELECT o_orderkey FROM orders "
            f"WHERE epoch_us(o_orderdate) < {Q3_CUT_US} "
            "AND o_custkey IN (SELECT c_custkey FROM c)), "
            "l AS (SELECT l_orderkey AS o_orderkey, "
            "CAST(ROUND(l_extendedprice * 100.0) AS BIGINT) * "
            "(100 - CAST(ROUND(l_discount * 100.0) AS BIGINT)) AS rev "
            f"FROM lineitem WHERE epoch_us(l_shipdate) > {Q3_CUT_US}) "
            "SELECT o_orderkey, CAST(SUM(rev) AS BIGINT) AS revenue_c "
            "FROM l WHERE o_orderkey IN (SELECT o_orderkey FROM o) "
            "GROUP BY o_orderkey "
            f"ORDER BY revenue_c DESC, o_orderkey LIMIT {Q3_TOPK}"
        ),
    }


def build_queries() -> dict:
    return {
        "geocode": q_geocode,
        "zonal": q_zonal,
        "pip_admin": q_pip_admin,
        "nearest_admin": q_nearest_admin,
        "bbox_join": q_bbox_join,
        "seg_join": q_seg_join,
        "hull": q_hull,
        "diameter": q_diameter,
        "kendall": q_kendall,
        "entropy": q_entropy,
        "sim_join": q_sim_join,
        "twap": q_twap,
        "ohlc": q_ohlc,
        "geohash": q_geohash,
        "rle": q_rle,
        "sim_clusters": q_sim_clusters,
        "sssp": q_sssp,
        "norm_dedup": q_norm_dedup,
        "t5_spans": q_t5_spans,
        "kl_sources": q_kl_sources,
        "jsd": q_jsd,
        "er_canonical": q_er_canonical,
        "centroids": q_centroids,
        "proto_sim": q_proto_sim,
        "gram": q_gram,
        "moran": q_moran,
        "moran_w": q_moran_w,
        "diameter_lb": q_diameter_lb,
        "pca1": q_pca1,
        "gi_star": q_gi_star,
        "variogram": q_variogram,
        "dissolve": q_dissolve,
        "idw": q_idw,
        "hotspot_docs": q_hotspot_docs,
        "ripley": q_ripley,
        "dispersion": q_dispersion,
        "clark_evans": q_clark_evans,
        "tri": q_tri,
        "join_counts": q_join_counts,
        "eb_rates": q_eb_rates,
        "mk_trend": q_mk_trend,
        "theil_sen": q_theil_sen,
        "dow_chi2": q_dow_chi2,
        "wavelet": q_wavelet,
        "od_matrix": q_od_matrix,
        "reciprocity": q_reciprocity,
        "funnel_depth": q_funnel_depth,
        "survival": q_survival,
        "hexbin": q_hexbin,
        "knox": q_knox,
        "regions": q_regions,
        "simplify": q_simplify,
        "readability": q_readability,
        "staypoints": q_staypoints,
        "traj": q_traj,
        "rfm": q_rfm,
        "ams_f2": q_ams_f2,
        "betweenness": q_betweenness,
        "flowacc": q_flowacc,
        "watershed": q_watershed,
        "quadtree": q_quadtree,
        "proximity": q_proximity,
        "voronoi": q_voronoi,
        "colocation": q_colocation,
        "union_area": q_union_area,
        "temporal_reach": q_temporal_reach,
        "wmedian": q_wmedian,
        "delta_simjoin": q_delta_simjoin,
        "drawdown": q_drawdown,
        "extent": q_extent,
        "interp": q_interp,
        "chi2_cat": q_chi2_cat,
        "knn": q_knn,
        "multires": q_multires,
        "chips": q_chips,
        "rasterize": q_rasterize,
        "focal": q_focal,
        "sobel": q_sobel,
        "phash_dedup": q_phash_dedup,
        "raster_stats": q_raster_stats,
        "ndi": q_ndi,
        "hist_eq": q_hist_eq,
        "raster_first": q_raster_first,
        "r2v": q_r2v,
        "warp": q_warp,
        "geom_stats": q_geom_stats,
        "warp_bilinear": q_warp_bilinear,
        "warp_avg": q_warp_avg,
        "curate2": q_curate2,
        "dedup_docs": q_dedup_docs,
        "delta_dedup": q_delta_dedup,
        "delta_vocab": q_delta_vocab,
        "first_event": q_first_event,
        "user_series": q_user_series,
        "topk_cells": q_topk_cells,
        "token_count": q_token_count,
        "token_bpe": q_token_bpe,
        "quality": q_quality,
        "lang_detect": q_lang_detect,
        "minhash_groups": q_minhash_groups,
        "simhash": q_simhash,
        "ann": q_ann,
        "score_docs": q_score_docs,
        "emb_dups": q_emb_dups,
        "delta_embdup": q_delta_embdup,
        "kmeans": q_kmeans,
        "semdedup": q_semdedup,
        "purity": q_purity,
        "silhouette": q_silhouette,
        "label_noise": q_label_noise,
        "knn_confusion": q_knn_confusion,
        "pr_auc": q_pr_auc,
        "attribution": q_attribution,
        "ewma": q_ewma,
        "fd_check": q_fd_check,
        "gains": q_gains,
        "hausdorff": q_hausdorff,
        "scc": q_scc,
        "bowtie": q_bowtie,
        "headings": q_headings,
        "kanon": q_kanon,
        "paths": q_paths,
        "psi": q_psi,
        "snap": q_snap,
        "seasonality": q_seasonality,
        "dtw": q_dtw,
        "coverage": q_coverage,
        "lorenz": q_lorenz,
        "neg_sample": q_neg_sample,
        "acf": q_acf,
        "ols2": q_ols2,
        "q7_volume": q_q7_volume,
        "delta_upsert": q_delta_upsert,
        "pq_codes": q_pq_codes,
        "pq_ann": q_pq_ann,
        "ivfpq_ann": q_ivfpq_ann,
        "lineitem_agg": q_lineitem_agg,
        "mktsegment": q_mktsegment,
        "cust_no_orders": q_cust_no_orders,
        "bloom_semi": q_bloom_semi,
        "top_orders": q_top_orders,
        "top_per_group": q_top_per_group,
        "rollup": q_rollup,
        "pyramid": q_pyramid,
        "lsh_eval": q_lsh_eval,
        "dedup_rate": q_dedup_rate,
        "curate3": q_curate3,
        "confusion": q_confusion,
        "kappa": q_kappa,
        "trimmed_mean": q_trimmed_mean,
        "theil": q_theil,
        "heldout_ppl": q_heldout_ppl,
        "seed_harmonic": q_seed_harmonic,
        "iat": q_iat,
        "late_events": q_late_events,
        "lpm": q_lpm,
        "cdc_diff": q_cdc_diff,
        "quadkey": q_quadkey,
        "vocab_coverage": q_vocab_coverage,
        "dup_cluster_sizes": q_dup_cluster_sizes,
        "source_overlap": q_source_overlap,
        "spatial_gini": q_spatial_gini,
        "ldiv": q_ldiv,
        "densify": q_densify,
        "median_price": q_median_price,
        "quantiles": q_quantiles,
        "pcont": q_pcont,
        "zorder": q_zorder,
        "hilbert": q_hilbert,
        "histogram": q_histogram,
        "melt": q_melt,
        "order_ranks": q_order_ranks,
        "corr": q_corr,
        "skyline": q_skyline,
        "ab_test": q_ab_test,
        "anova": q_anova,
        "mwu": q_mwu,
        "auc": q_auc,
        "kruskal": q_kruskal,
        "qnorm": q_qnorm,
        "cusum": q_cusum,
        "covered_time": q_covered_time,
        "autocorr": q_autocorr,
        "ks_test": q_ks_test,
        "spearman": q_spearman,
        "gini": q_gini,
        "winfns": q_winfns,
        "user_next_gap": q_user_next_gap,
        "regress": q_regress,
        "band_mode": q_band_mode,
        "set_intersect": q_set_intersect,
        "set_except": q_set_except,
        "fuzzy_contam": q_fuzzy_contam,
        "rolling": q_rolling,
        "qsketch": q_qsketch,
        "pack": q_pack,
        "scrub": q_scrub,
        "profile": q_profile,
        "dup_ngram": q_dup_ngram,
        "decontam": q_decontam,
        "ngram_topk": q_ngram_topk,
        "colloc": q_colloc,
        "chi2_tokens": q_chi2_tokens,
        "zipf": q_zipf,
        "lisa": q_lisa,
        "emerging": q_emerging,
        "temporal_gi": q_temporal_gi,
        "rrf": q_rrf,
        "mmr": q_mmr,
        "ir_eval": q_ir_eval,
        "ndcg": q_ndcg,
        "src_sim": q_src_sim,
        "shards": q_shards,
        "quota": q_quota,
        "user_gaps": q_user_gaps,
        "pivot_status": q_pivot_status,
        "status_seq": q_status_seq,
        "running_total": q_running_total,
        "region_balance": q_region_balance,
        "priority_segment": q_priority_segment,
        "semi_customers": q_semi_customers,
        "events_hourly": q_events_hourly,
        "sample": q_sample,
        "join_agg": q_join_agg,
        "distinct_users": q_distinct_users,
        "heavy_hitters": q_heavy_hitters,
        "approx_users": q_approx_users,
        "kmv": q_kmv,
        "benford": q_benford,
        "hll_overlap": q_hll_overlap,
        "cms_users": q_cms_users,
        "strat_sample": q_strat_sample,
        "prepost": q_prepost,
        "parse_props": q_parse_props,
        "sessions": q_sessions,
        "sliding": q_sliding,
        "peak_value": q_peak_value,
        "asof": q_asof,
        "range_windows": q_range_windows,
        "keyed_range": q_keyed_range,
        "sliding_value": q_sliding_value,
        "sliding_big": q_sliding_big,
        "curate": q_curate,
        "near_dup": q_near_dup,
        "contain_dup": q_contain_dup,
        "tfidf": q_tfidf,
        "wjac_dup": q_wjac_dup,
        "transitions": q_transitions,
        "funnel": q_funnel,
        "run_distinct": q_run_distinct,
        "gapfill": q_gapfill,
        "share": q_share,
        "firstlast": q_firstlast,
        "mad_outliers": q_mad_outliers,
        "cube": q_cube,
        "chunks": q_chunks,
        "para_dedup": q_para_dedup,
        "boilerplate": q_boilerplate,
        "phrase": q_phrase,
        "unigram_lm": q_unigram_lm,
        "naive_bayes": q_naive_bayes,
        "ppl_buckets": q_ppl_buckets,
        "tiling": q_tiling,
        "bm25": q_bm25,
        "bpe_train": q_bpe_train,
        "bpe_encode": q_bpe_encode,
        "keep_best": q_keep_best,
        "postings": q_postings,
        "skipgrams": q_skipgrams,
        "outer_join": q_outer_join,
        "temp_sample": q_temp_sample,
        "wsample": q_wsample,
        "minmax": q_minmax,
        "zscore": q_zscore,
        "split": q_split,
        "len_buckets": q_len_buckets,
        "bpe_pairs": q_bpe_pairs,
        "basket": q_basket,
        "winsorize": q_winsorize,
        "q3_top": q_q3_top,
        "raster_mode": q_raster_mode,
        "pagerank": q_pagerank,
        "hits": q_hits,
        "assort": q_assort,
        "retention": q_retention,
        "delta_pagerank": q_delta_pagerank,
        "wpagerank": q_wpagerank,
        "ppr": q_ppr,
        "bfs_hops": q_bfs_hops,
        "neighbor_sample": q_neighbor_sample,
        "common_neighbors": q_common_neighbors,
        "link_pred": q_link_pred,
        "adamic": q_adamic,
        "stress": q_stress,
        "seed_reach": q_seed_reach,
        "harmonic": q_harmonic,
        "closeness": q_closeness,
        "edit_join": q_edit_join,
        "butterfly": q_butterfly,
        "mis": q_mis,
        "mst": q_mst,
        "components": q_components,
        "triangles": q_triangles,
        "clustering": q_clustering,
        "richclub": q_richclub,
        "plaw": q_plaw,
        "source_hhi": q_source_hhi,
        "dbscan": q_dbscan,
        "kcore": q_kcore,
        "lpa": q_lpa,
        "modularity": q_modularity,
        "walks": q_walks,
        "ktruss": q_ktruss,
        "dup_spans": q_dup_spans,
        "winnow_spans": q_winnow_spans,
        "cdc_chunks": q_cdc_chunks,
        "cdc_dedup": q_cdc_dedup,
        "strip_spans": q_strip_spans,
        "delta_neardup": q_delta_neardup,
        "split_explode": q_split_explode,
        "bigram_lm": q_bigram_lm,
        "dsir": q_dsir,
        "pack_spans": q_pack_spans,
        "q5_nation_rev": q_q5_nation_rev,
        "promo_rev": q_promo_rev,
    }
