"""CRS transforms in plain numpy: Web-Mercator (EPSG:3857) and UTM.

The reference delegates reprojection to rioxarray/pyproj
(``/root/reference/zen3geo/datapipes/datashader.py:202-212``,
``geopandas.py:166-170``); this engine implements the two CRSs its
fixtures exercise directly:

* EPSG:3857 spherical web-mercator (exact closed form), and
* UTM zones (EPSG:326xx/327xx) via Karney's 6th-order Krüger series on
  the WGS84 ellipsoid — accurate to nanometers, matching the reference's
  pyproj-derived golden bounds
  (``zen3geo/tests/test_datapipes_geopandas.py:125-156``) to double
  precision.

All functions are vectorized over coordinate arrays.
"""

from __future__ import annotations

import numpy as np

R_MERC = 6378137.0  # WGS84 semi-major axis (sphere radius for 3857)
WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
UTM_K0 = 0.9996
UTM_FE = 500_000.0  # false easting
UTM_FN_S = 10_000_000.0  # false northing, southern hemisphere


def lonlat_to_mercator(lon, lat) -> tuple[np.ndarray, np.ndarray]:
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = R_MERC * np.radians(lon)
    y = R_MERC * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def mercator_to_lonlat(x, y) -> tuple[np.ndarray, np.ndarray]:
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / R_MERC)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / R_MERC)) - np.pi / 2.0)
    return lon, lat


# --- Krüger series coefficients (Karney 2011, "Transverse Mercator with an
# accuracy of a few nanometers"), 6th order in n = f / (2 - f). -------------

_N = WGS84_F / (2.0 - WGS84_F)
_N2, _N3, _N4, _N5, _N6 = _N**2, _N**3, _N**4, _N**5, _N**6

# rectifying-radius factor A / a
_A_FACT = (1.0 + _N2 / 4.0 + _N4 / 64.0 + _N6 / 256.0) / (1.0 + _N)

_ALPHA = np.array(
    [
        _N / 2 - 2 * _N2 / 3 + 5 * _N3 / 16 + 41 * _N4 / 180 - 127 * _N5 / 288
        + 7891 * _N6 / 37800,
        13 * _N2 / 48 - 3 * _N3 / 5 + 557 * _N4 / 1440 + 281 * _N5 / 630
        - 1983433 * _N6 / 1935360,
        61 * _N3 / 240 - 103 * _N4 / 140 + 15061 * _N5 / 26880
        + 167603 * _N6 / 181440,
        49561 * _N4 / 161280 - 179 * _N5 / 168 + 6601661 * _N6 / 7257600,
        34729 * _N5 / 80640 - 3418889 * _N6 / 1995840,
        212378941 * _N6 / 319334400,
    ]
)

_E2 = WGS84_F * (2.0 - WGS84_F)
_E = np.sqrt(_E2)


def _conformal_lat(phi: np.ndarray) -> np.ndarray:
    s = np.sin(phi)
    return np.arctan(np.sinh(np.arcsinh(np.tan(phi)) - _E * np.arctanh(_E * s)))


def lonlat_to_utm(lon, lat, zone: int, north: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """Forward transverse-mercator (UTM zone), vectorized, ~nm accuracy."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    lon0 = (zone - 1) * 6.0 - 180.0 + 3.0
    lam = np.radians(lon - lon0)
    phi = np.radians(lat)
    tau1 = np.tan(_conformal_lat(phi))
    xi1 = np.arctan2(tau1, np.cos(lam))
    eta1 = np.arcsinh(np.sin(lam) / np.hypot(tau1, np.cos(lam)))
    xi = xi1.copy()
    eta = eta1.copy()
    for j in range(1, 7):
        xi += _ALPHA[j - 1] * np.sin(2 * j * xi1) * np.cosh(2 * j * eta1)
        eta += _ALPHA[j - 1] * np.cos(2 * j * xi1) * np.sinh(2 * j * eta1)
    A = _A_FACT * WGS84_A
    x = UTM_K0 * A * eta + UTM_FE
    y = UTM_K0 * A * xi + (0.0 if north else UTM_FN_S)
    return x, y


def transform(lon, lat, crs: str) -> tuple[np.ndarray, np.ndarray]:
    """lon/lat (OGC:CRS84 degrees) -> coordinates of ``crs``.

    Supported: 'OGC:CRS84' / 'EPSG:4326' (identity), 'EPSG:3857',
    'EPSG:326xx' (UTM north), 'EPSG:327xx' (UTM south).
    """
    crs = crs.upper()
    if crs in ("OGC:CRS84", "EPSG:4326", "CRS84"):
        return np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64)
    if crs == "EPSG:3857":
        return lonlat_to_mercator(lon, lat)
    # UTM codes are exactly 5 digits: 326zz north / 327zz south, zone 1-60
    if (crs.startswith("EPSG:326") or crs.startswith("EPSG:327")) and len(crs) == 10:
        zone = int(crs[8:])
        if 1 <= zone <= 60:
            return lonlat_to_utm(lon, lat, zone, north=crs[7] == "6")
    raise NotImplementedError(f"Unsupported CRS: {crs}")


def transform_geom(geom: dict, crs: str) -> dict:
    """Reproject a geometry dict vertex-wise (matches GeoSeries.to_crs)."""
    gtype = geom["type"]
    c = geom["coords"]

    def tx(arr):
        arr = np.asarray(arr, dtype=np.float64)
        x, y = transform(arr[:, 0], arr[:, 1], crs)
        return np.stack([x, y], axis=1)

    if gtype in ("Point", "MultiPoint", "LineString"):
        return {"type": gtype, "coords": tx(c)}
    if gtype in ("Polygon", "MultiLineString"):
        return {"type": gtype, "coords": [tx(r) for r in c]}
    if gtype == "MultiPolygon":
        return {"type": gtype, "coords": [[tx(r) for r in rings] for rings in c]}
    raise NotImplementedError(gtype)
