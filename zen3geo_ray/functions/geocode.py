"""Deterministic geocoding: lang/url-derived lon/lat (north-star contract).

Two geocoders:

* ``geocode_id`` — pure arithmetic on an int64 key + lang, exactly
  reproducible in DuckDB SQL (``sql_geocode_exprs``).  Used by the
  driver-verified queries over the testdata ``documents``/``events``
  tables.
* ``geocode_url`` — FNV-1a over the url *host* (so all pages of one host
  land at one location, which under a Zipf host distribution produces the
  hot-cell power law the north star calls for) + lang anchor.  Used by the
  pages-corpus pipelines; verified by pytest, not SQL.

Each language is anchored at a fixed centroid and the hash spreads points
inside a +-spread-degree box around it — "lang/url-derived coordinates"
per BASELINE.json north_star.
"""

from __future__ import annotations

import numpy as np

from .hashing import (
    KNUTH_A,
    KNUTH_B,
    fnv1a_str_array,
    knuth_unit,
    sql_knuth_unit_expr,
)

# lang -> (center_lon, center_lat, spread_degrees)
LANG_ANCHORS: dict[str, tuple[float, float, float]] = {
    "en": (-98.0, 39.0, 25.0),
    "de": (10.0, 51.0, 6.0),
    "ja": (138.0, 36.0, 5.0),
    "ms": (102.0, 4.0, 4.0),
    "id": (113.0, -2.0, 8.0),
    "zh": (104.0, 35.0, 12.0),
    "pt": (-51.0, -14.0, 12.0),
    "fr": (2.0, 46.0, 6.0),
    "es": (-3.0, 40.0, 8.0),
    "ru": (60.0, 55.0, 20.0),
}
DEFAULT_ANCHOR = (0.0, 0.0, 60.0)


def _anchor_arrays(langs) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    langs = np.asarray(langs, dtype=object)
    lon0 = np.empty(len(langs), dtype=np.float64)
    lat0 = np.empty(len(langs), dtype=np.float64)
    spread = np.empty(len(langs), dtype=np.float64)
    # few distinct langs -> mask per lang, vectorized assignment
    uniq = {}
    for i, l in enumerate(langs):
        uniq.setdefault(l, []).append(i)
    for l, idxs in uniq.items():
        clon, clat, s = LANG_ANCHORS.get(l, DEFAULT_ANCHOR)
        idx = np.asarray(idxs)
        lon0[idx], lat0[idx], spread[idx] = clon, clat, s
    return lon0, lat0, spread


def geocode_id(key, langs) -> tuple[np.ndarray, np.ndarray]:
    """int64 key + lang array -> (lon, lat) degrees, SQL-replicable."""
    lon0, lat0, spread = _anchor_arrays(langs)
    u1 = knuth_unit(key, KNUTH_A)
    u2 = knuth_unit(key, KNUTH_B)
    lon = lon0 + (u1 * 2.0 - 1.0) * spread
    lat = lat0 + (u2 * 2.0 - 1.0) * spread * 0.5
    return lon, lat


def sql_geocode_exprs(key_expr: str, lang_expr: str) -> tuple[str, str]:
    """DuckDB SQL (lon_expr, lat_expr) matching ``geocode_id`` exactly."""
    def case(sel: int) -> str:
        whens = "".join(
            f"WHEN '{l}' THEN {v[sel]!r} " for l, v in LANG_ANCHORS.items()
        )
        return f"(CASE ({lang_expr}) {whens}ELSE {DEFAULT_ANCHOR[sel]!r} END)"

    u1 = sql_knuth_unit_expr(key_expr, KNUTH_A)
    u2 = sql_knuth_unit_expr(key_expr, KNUTH_B)
    lon = f"({case(0)} + ({u1} * 2.0 - 1.0) * {case(2)})"
    lat = f"({case(1)} + ({u2} * 2.0 - 1.0) * {case(2)} * 0.5)"
    return lon, lat


def url_host(urls) -> np.ndarray:
    """Vectorized host extraction from url strings (scheme://host/...)."""
    import pandas as pd

    s = pd.Series(urls, dtype="object").astype(str)
    return s.str.extract(r"^[a-z+]+://([^/]+)", expand=False).fillna("").to_numpy()


def geocode_url(urls, langs) -> tuple[np.ndarray, np.ndarray]:
    """url + lang -> (lon, lat); host-hash based so hosts form hot cells.

    Hashing runs over the batch's UNIQUE hosts only (a Zipf host
    distribution makes uniques ~sqrt(rows)), then scatters — the same
    values as per-row hashing at a fraction of the work.
    """
    hosts = url_host(urls)
    uniq, inv = np.unique(hosts, return_inverse=True)
    hu = fnv1a_str_array(uniq)
    h = hu[inv]
    lon0, lat0, spread = _anchor_arrays(langs)
    u1 = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    with np.errstate(over="ignore"):
        h2 = h * np.uint64(0x9E3779B97F4A7C15)
    u2 = (h2 >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    lon = lon0 + (u1 * 2.0 - 1.0) * spread
    lat = lat0 + (u2 * 2.0 - 1.0) * spread * 0.5
    return lon, lat
