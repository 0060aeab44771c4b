"""CRS kernel goldens (functions/crs.py, SURVEY O10): public constants,
projection invariants, round-trips, and the Spark UDF surface."""

import numpy as np
import pytest

from adcirctime2cogs_spark.functions import crs

# WGS84 quarter meridian (equator -> pole arc), public geodesy constant
QUARTER_MERIDIAN_M = 10_001_965.7293


def test_rectifying_radius_reproduces_quarter_meridian():
    """A * pi/2 must equal the published WGS84 quarter meridian to
    sub-mm — a one-number checksum of the whole n-series setup."""
    assert abs(crs.RECTIFYING_A * np.pi / 2.0 - QUARTER_MERIDIAN_M) < 1e-3


def test_utm_central_meridian_and_equator_invariants():
    """Exact anchor points of the projection definition: the central
    meridian maps to the 500 km false easting, the equator to northing
    0 (north) / 10,000 km (south)."""
    e, n, _ = crs.utm_forward(np.array([3.0]), np.array([0.0]), zone=31)
    assert abs(e[0] - 500_000.0) < 1e-6 and abs(n[0]) < 1e-6
    e, n, _ = crs.utm_forward(np.array([3.0]), np.array([-0.001]), zone=31)
    assert n[0] > 9_999_800.0  # southern false northing applied
    # scale at the central meridian is k0: northing(small lat) ~
    # k0 * meridian_arc(lat)
    e, n, _ = crs.utm_forward(np.array([3.0]), np.array([90.0]), zone=31)
    assert abs(n[0] - crs.K0 * QUARTER_MERIDIAN_M) < 1e-2


def test_utm_zone_numbering():
    assert crs.utm_zone(np.array([-180.0]))[0] == 1
    assert crs.utm_zone(np.array([-75.5]))[0] == 18   # US east coast
    assert crs.utm_zone(np.array([3.0]))[0] == 31
    assert crs.utm_zone(np.array([179.9]))[0] == 60
    assert crs.utm_central_meridian(31) == 3.0


def test_utm_roundtrip_sub_micro_degree():
    rng = np.random.default_rng(42)
    lon = rng.uniform(-179.0, 179.0, 1000)
    lat = rng.uniform(-80.0, 80.0, 1000)
    e, n, z = crs.utm_forward(lon, lat)
    # strip the southern false northing the way a consumer would
    n_plain = np.where(lat < 0.0, n - crs.FALSE_NORTHING_SOUTH, n)
    lon2, lat2 = crs.utm_inverse(e, n_plain, z)
    assert np.abs(lon2 - lon).max() < 1e-8
    assert np.abs(lat2 - lat).max() < 1e-8


def test_webmercator_known_values_and_roundtrip():
    # exact by definition: x at lon=180 is pi*R
    x, y = crs.webmercator_forward(np.array([180.0]), np.array([0.0]))
    assert abs(x[0] - np.pi * crs.WGS84_A) < 1e-6
    assert abs(y[0]) < 1e-9
    # the square-world property: y(+-85.05112878) == +-x(180)
    _, y = crs.webmercator_forward(np.array([0.0]), np.array([85.05112878]))
    assert abs(y[0] - np.pi * crs.WGS84_A) < 0.5
    lon = np.linspace(-179.0, 179.0, 101)
    lat = np.linspace(-84.0, 84.0, 101)
    x, y = crs.webmercator_forward(lon, lat)
    lon2, lat2 = crs.webmercator_inverse(x, y)
    assert np.abs(lon2 - lon).max() < 1e-12
    assert np.abs(lat2 - lat).max() < 1e-10


def test_utm_udf_matches_kernel(spark, sf_dir):
    """The Arrow-batched UDF is the same math as the numpy kernel."""
    from pyspark.sql import functions as F

    from adcirctime2cogs_spark.operators.udfs import utm_project_udf
    from adcirctime2cogs_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    pts = emb.select(
        "vec_id",
        (F.col("vec_id") % 360 - 180).cast("double").alias("lon"),
        (F.col("vec_id") % 140 - 70).cast("double").alias("lat"),
    )
    rows = (
        pts.withColumn("u", utm_project_udf("lon", "lat"))
        .select("lon", "lat", "u.easting", "u.northing", "u.zone")
        .collect()
    )
    assert rows
    lon = np.array([r.lon for r in rows])
    lat = np.array([r.lat for r in rows])
    e, n, z = crs.utm_forward(lon, lat)
    assert np.allclose([r.easting for r in rows], e, atol=1e-9)
    assert np.allclose([r.northing for r in rows], n, atol=1e-9)
    assert [r.zone for r in rows] == list(z)


# ------------------------------------------------ conic / polar CRS
def test_lcc_matches_epsg_worked_example():
    """EPSG Guidance Note 7-2 method 9802 worked example (NAD27 Texas
    South Central, Clarke 1866, US survey feet): 28d30'N 96dW ->
    E 2963503.91 ftUS, N 254759.80 ftUS."""
    from adcirctime2cogs_spark.functions.crs import lcc_forward, lcc_inverse

    a, f = 6378206.400, 1.0 / 294.97870
    ft_us = 1200.0 / 3937.0
    kw = dict(lat1_deg=28 + 23 / 60, lat2_deg=30 + 17 / 60,
              lat0_deg=27 + 50 / 60, lon0_deg=-99.0,
              fe=2_000_000.0 * ft_us, fn=0.0, a=a, f=f)
    E, N = lcc_forward(-96.0, 28.5, **kw)
    assert E / ft_us == pytest.approx(2963503.91, abs=0.01)
    assert N / ft_us == pytest.approx(254759.80, abs=0.01)
    lon, lat = lcc_inverse(E, N, **kw)
    assert lon == pytest.approx(-96.0, abs=1e-9)
    assert lat == pytest.approx(28.5, abs=1e-9)


def test_polar_stereo_matches_epsg_worked_example():
    """EPSG Guidance Note 7-2 method 9829 worked example (Australian
    Antarctic, WGS84, lat_ts -71, lon0 70E, FE=FN=6e6): 75S 120E ->
    E 7255380.79, N 7053389.56."""
    from adcirctime2cogs_spark.functions.crs import (
        polar_stereo_forward,
        polar_stereo_inverse,
    )

    E, N = polar_stereo_forward(120.0, -75.0, -71.0, 70.0, 6e6, 6e6)
    assert E == pytest.approx(7255380.79, abs=0.01)
    assert N == pytest.approx(7053389.56, abs=0.01)
    lon, lat = polar_stereo_inverse(E, N, -71.0, 70.0, 6e6, 6e6)
    assert lon == pytest.approx(120.0, abs=1e-9)
    assert lat == pytest.approx(-75.0, abs=1e-9)


def test_lcc_scale_is_unity_on_standard_parallels():
    """The defining conformal-conic property: projection scale k == 1
    exactly on BOTH standard parallels (finite-difference arc ratio
    against the ellipsoidal parallel radius nu*cos(phi))."""
    from adcirctime2cogs_spark.functions import crs

    e = np.sqrt(2 * crs.WGS84_F - crs.WGS84_F**2)
    for phi in (49.0, 77.0):
        d = 1e-6
        E1, N1 = crs.lcc_forward(-95.0, phi, 49.0, 77.0, 49.0, -95.0)
        E2, N2 = crs.lcc_forward(-95.0 + d, phi, 49.0, 77.0, 49.0, -95.0)
        nu = crs.WGS84_A / np.sqrt(1 - (e * np.sin(np.radians(phi))) ** 2)
        arc = nu * np.cos(np.radians(phi)) * np.radians(d)
        assert np.hypot(E2 - E1, N2 - N1) / arc == pytest.approx(1.0, abs=1e-8)


def test_polar_stereo_invariants_and_roundtrip():
    """Pole maps to the false origin in both hemispheres; scale at the
    standard parallel is 1; dense round-trips close to 1e-12 deg."""
    from adcirctime2cogs_spark.functions import crs

    E, N = crs.polar_stereo_forward(33.0, -90.0, -71.0, 70.0, 6e6, 6e6)
    assert (E, N) == (pytest.approx(6e6, abs=1e-6), pytest.approx(6e6, abs=1e-6))
    E, N = crs.polar_stereo_forward(0.0, 90.0, 70.0, -45.0)
    assert (E, N) == (pytest.approx(0.0, abs=1e-6), pytest.approx(0.0, abs=1e-6))
    # scale at lat_ts == 1 (finite difference along the parallel)
    e = np.sqrt(2 * crs.WGS84_F - crs.WGS84_F**2)
    for ts, phi in ((-71.0, -71.0), (70.0, 70.0)):
        d = 1e-6
        E1, N1 = crs.polar_stereo_forward(10.0, phi, ts, 0.0)
        E2, N2 = crs.polar_stereo_forward(10.0 + d, phi, ts, 0.0)
        nu = crs.WGS84_A / np.sqrt(1 - (e * np.sin(np.radians(phi))) ** 2)
        arc = nu * np.cos(np.radians(phi)) * np.radians(d)
        assert np.hypot(E2 - E1, N2 - N1) / arc == pytest.approx(1.0, abs=1e-8)
    rng = np.random.default_rng(11)
    lon = rng.uniform(-180.0, 180.0, 500)
    for ts, lat in ((-71.0, rng.uniform(-88.0, -60.0, 500)),
                    (70.0, rng.uniform(60.0, 88.0, 500))):
        E, N = crs.polar_stereo_forward(lon, lat, ts, -45.0)
        lon2, lat2 = crs.polar_stereo_inverse(E, N, ts, -45.0)
        dlon = (lon2 - lon + 180.0) % 360.0 - 180.0
        assert np.abs(dlon).max() < 1e-11
        assert np.abs(lat2 - lat).max() < 1e-11


def test_lcc_roundtrip_dense():
    from adcirctime2cogs_spark.functions import crs

    rng = np.random.default_rng(12)
    lon = rng.uniform(-140.0, -50.0, 1000)
    lat = rng.uniform(40.0, 84.0, 1000)
    E, N = crs.lcc_forward(lon, lat, 49.0, 77.0, 49.0, -95.0)
    lon2, lat2 = crs.lcc_inverse(E, N, 49.0, 77.0, 49.0, -95.0)
    assert np.abs(lon2 - lon).max() < 1e-11
    assert np.abs(lat2 - lat).max() < 1e-11


def test_albers_equal_area_property():
    """The defining property of EPSG 9822: the Jacobian determinant of
    (E, N) wrt (lon, lat) in radians equals the ellipsoidal area
    element a^2(1-e^2)cos(phi)/(1-e^2 sin^2 phi)^2 — checked by finite
    differences across the CONUS domain, plus k == 1 exactly on both
    standard parallels."""
    from adcirctime2cogs_spark.functions import crs

    e2 = 2 * crs.WGS84_F - crs.WGS84_F**2
    kw = dict(lat1_deg=29.5, lat2_deg=45.5, lat0_deg=23.0, lon0_deg=-96.0)
    rng = np.random.default_rng(21)
    lon = rng.uniform(-125.0, -66.0, 50)
    lat = rng.uniform(24.0, 50.0, 50)
    d = 1e-6
    E0, N0 = crs.albers_forward(lon, lat, **kw)
    E1, N1 = crs.albers_forward(lon + d, lat, **kw)
    E2, N2 = crs.albers_forward(lon, lat + d, **kw)
    dr = np.radians(d)
    det = ((E1 - E0) * (N2 - N0) - (E2 - E0) * (N1 - N0)) / (dr * dr)
    s2 = np.sin(np.radians(lat)) ** 2
    want = crs.WGS84_A**2 * (1 - e2) * np.cos(np.radians(lat)) / (
        1 - e2 * s2
    ) ** 2
    assert np.abs(det / want - 1.0).max() < 1e-6
    for phi in (29.5, 45.5):
        Ea, Na = crs.albers_forward(-96.0, phi, **kw)
        Eb, Nb = crs.albers_forward(-96.0 + d, phi, **kw)
        e = np.sqrt(e2)
        nu = crs.WGS84_A / np.sqrt(1 - (e * np.sin(np.radians(phi))) ** 2)
        arc = nu * np.cos(np.radians(phi)) * np.radians(d)
        assert np.hypot(Eb - Ea, Nb - Na) / arc == pytest.approx(
            1.0, abs=1e-8
        )


def test_epsg_dispatch_roundtrips_every_registered_code():
    from adcirctime2cogs_spark.functions import crs

    domains = {
        3857: ((-170, 170), (-80, 80)),
        3978: ((-140, -50), (40, 84)),
        2154: ((-5, 9), (41, 51)),
        3031: ((-180, 180), (-88, -60)),
        3413: ((-180, 180), (60, 88)),
        5070: ((-125, -66), (24, 50)),
        32617: ((-84, -78), (0, 80)),
        32722: ((-54, -48), (-80, 0)),
        3035: ((-10, 40), (34, 70)),
        3572: ((-180, 180), (55, 88)),
        25832: ((6, 12), (36, 84)),
        26912: ((-114, -108), (20, 84)),
        32118: ((-75, -71.8), (40, 41.5)),
        26985: ((-79.5, -75), (37.8, 39.8)),
        26929: ((-87, -84.8), (30.5, 35)),
    }
    rng = np.random.default_rng(22)
    for code, (lo_r, la_r) in domains.items():
        lon = rng.uniform(*lo_r, 300)
        lat = rng.uniform(*la_r, 300)
        E, N = crs.epsg_forward(code, lon, lat)
        lon2, lat2 = crs.epsg_inverse(code, E, N)
        dlon = (np.asarray(lon2) - lon + 180.0) % 360.0 - 180.0
        # TM-family codes carry the Krueger n^3-series truncation
        tm_series = (
            32000 < code < 33000
            or 25828 <= code <= 25838
            or 26901 <= code <= 26929  # GRS80 UTM + Alabama East TM
        )
        tol = 1e-8 if tm_series else 1e-11
        assert np.abs(dlon).max() < tol, code
        assert np.abs(lat2 - lat).max() < tol, code
    with pytest.raises(ValueError, match="EPSG:9999"):
        crs.epsg_forward(9999, 0.0, 0.0)


def test_reproject_points_operator(spark):
    """The to_crs-parity DataFrame operator: kernel values through the
    Arrow UDF, plan-time validation of unknown codes."""
    from adcirctime2cogs_spark.operators.udfs import reproject_points

    pts = spark.createDataFrame(
        [(0, -96.0, 35.0), (1, -80.0, 40.0)], "id long, lon double, lat double"
    )
    got = {
        r.id: (r.easting, r.northing)
        for r in reproject_points(pts, "lon", "lat", 5070).collect()
    }
    E, N = crs.epsg_forward(5070, np.array([-96.0, -80.0]),
                            np.array([35.0, 40.0]))
    assert got[0] == (pytest.approx(E[0]), pytest.approx(N[0]))
    assert got[1] == (pytest.approx(E[1]), pytest.approx(N[1]))
    with pytest.raises(ValueError, match="EPSG:1234"):
        reproject_points(pts, "lon", "lat", 1234)


def test_polar_stereo_k0_pole_limit():
    """lat_ts at exactly +-90 is the variant-A limit k0 = 1 (the raw
    mF/tF ratio is 0/0 there), and it approaches 1 continuously."""
    assert crs.polar_stereo_k0(90.0) == 1.0
    assert crs.polar_stereo_k0(-90.0) == 1.0
    assert crs.polar_stereo_k0(89.9999) == pytest.approx(1.0, abs=1e-8)
    E, N = crs.polar_stereo_forward(12.0, 88.0, 90.0, 0.0)
    assert np.isfinite(E) and np.isfinite(N)
    lon, lat = crs.polar_stereo_inverse(E, N, 90.0, 0.0)
    assert (lon, lat) == (pytest.approx(12.0), pytest.approx(88.0))


def test_utm_false_northing_follows_epsg_code_not_latitude():
    """A 327xx (southern) CRS applies the 10 000 km false northing to
    EVERY point — including north of the equator — and a 326xx CRS to
    none; only the zone-autodetect path keys on latitude sign. Pins
    the cross-equator fix (ADVICE r07: epsg_forward(32733, 15, 0.5)
    must give N ~ 10 055 265, not 55 265, and round-trip)."""
    lon = np.array([15.0, 15.0])
    lat = np.array([0.5, -0.5])
    # southern code: FN on both sides of the equator
    e_s, n_s = crs.epsg_forward(32733, lon, lat)
    assert n_s[0] == pytest.approx(10_055_265.0, abs=1.0)
    assert n_s[1] == pytest.approx(9_944_734.0, abs=2.0)
    lon_b, lat_b = crs.epsg_inverse(32733, e_s, n_s)
    assert lon_b == pytest.approx(lon)
    assert lat_b == pytest.approx(lat)
    # northern code: no FN even south of the equator (negative N)
    e_n, n_n = crs.epsg_forward(32633, lon, lat)
    assert n_n[0] == pytest.approx(55_265.0, abs=1.0)
    assert n_n[1] == pytest.approx(-55_265.0, abs=1.0)
    lon_b, lat_b = crs.epsg_inverse(32633, e_n, n_n)
    assert lon_b == pytest.approx(lon)
    assert lat_b == pytest.approx(lat)
    # the two codes describe the same zone: constant 1e7 offset
    assert np.allclose(n_s - n_n, 10_000_000.0)
    # autodetect path unchanged: FN per point latitude sign
    _, n_auto, _ = crs.utm_forward(lon, lat)
    assert n_auto[0] == pytest.approx(55_265.0, abs=1.0)
    assert n_auto[1] == pytest.approx(9_944_734.0, abs=2.0)


def test_ups_matches_epsg_variant_a_worked_example():
    """EPSG GN7-2, Polar Stereographic variant A (UPS North, WGS84,
    k0 = 0.994, FE = FN = 2 000 000): 73N 44E -> E 3320416.75,
    N 632668.43 — the published worked example, and the roundtrip."""
    E, N = crs.epsg_forward(32661, np.array([44.0]), np.array([73.0]))
    assert E[0] == pytest.approx(3_320_416.75, abs=0.01)
    assert N[0] == pytest.approx(632_668.43, abs=0.01)
    lon, lat = crs.epsg_inverse(32661, E, N)
    assert (lon[0], lat[0]) == (pytest.approx(44.0), pytest.approx(73.0))
    # south: mirrored latitude, mirrored N about the false northing
    E2, N2 = crs.epsg_forward(32761, np.array([44.0]), np.array([-73.0]))
    assert E2[0] == pytest.approx(E[0])
    assert N2[0] == pytest.approx(2 * 2_000_000.0 - N[0])
    lon2, lat2 = crs.epsg_inverse(32761, E2, N2)
    assert (lon2[0], lat2[0]) == (pytest.approx(44.0), pytest.approx(-73.0))


def test_reproject_points_proj_arbitrary_parameters(spark):
    """The parameterized operator accepts ANY kernel-family parameter
    set — here an LCC with made-up parallels no EPSG code uses — and
    matches the numpy kernel exactly; unknown kinds and bad params
    raise at plan time."""
    from adcirctime2cogs_spark.operators.udfs import reproject_points_proj

    pts = spark.createDataFrame(
        [(0, -96.0, 35.0), (1, -80.0, 40.0)],
        "id long, lon double, lat double",
    )
    params = dict(lat1_deg=33.0, lat2_deg=41.5, lat0_deg=30.0,
                  lon0_deg=-88.0, fe=1234.0, fn=5678.0)
    got = {
        r.id: (r.easting, r.northing)
        for r in reproject_points_proj(
            pts, "lon", "lat", "lcc", params
        ).collect()
    }
    E, N = crs.lcc_forward(np.array([-96.0, -80.0]),
                           np.array([35.0, 40.0]), **params)
    assert got[0] == (pytest.approx(E[0]), pytest.approx(N[0]))
    assert got[1] == (pytest.approx(E[1]), pytest.approx(N[1]))
    with pytest.raises(ValueError, match="unknown projection kind"):
        reproject_points_proj(pts, "lon", "lat", "mercator1sp", {})
    with pytest.raises(TypeError):
        reproject_points_proj(pts, "lon", "lat", "lcc",
                              dict(params, bogus=1))


def test_bng_datum_pipeline_matches_os_worked_example():
    """The TM-on-Airy leg against the OS 'A guide to coordinate
    systems in Great Britain' worked example (OSGB36 geodetic
    52d39m27.2531sN 1d43m4.5177sE -> E 651409.903 N 313177.270, to
    the millimetre), then the full WGS84 datum pipeline: roundtrip to
    1e-7 deg, a known central-London grid reference to the ~1 m the
    published Helmert's own accuracy allows, and the Helmert inverse
    consistency."""
    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    E, N = crs.tm_forward(np.array([lon]), np.array([lat]), **crs._BNG)
    assert E[0] == pytest.approx(651_409.903, abs=0.001)
    assert N[0] == pytest.approx(313_177.270, abs=0.001)
    lo, la = crs.tm_inverse(E, N, **crs._BNG)
    assert lo[0] == pytest.approx(lon, abs=1e-9)
    assert la[0] == pytest.approx(lat, abs=1e-9)

    # full pipeline via EPSG dispatch: Charing Cross, London
    E2, N2 = crs.epsg_forward(27700, np.array([-0.1276]),
                              np.array([51.5072]))
    assert E2[0] == pytest.approx(530_043.0, abs=5.0)
    assert N2[0] == pytest.approx(180_358.0, abs=5.0)
    lo2, la2 = crs.epsg_inverse(27700, E2, N2)
    assert lo2[0] == pytest.approx(-0.1276, abs=1e-6)
    assert la2[0] == pytest.approx(51.5072, abs=1e-6)

    # Helmert: negated parameters invert to second order only — the
    # residual is ~ s*t (20.5 ppm x ~450 m ~ 1 cm), the convention's
    # own documented property, far inside the transform's ~3.5 m
    # published accuracy
    X, Y, Z = crs.geodetic_to_geocentric(
        np.array([-0.1276]), np.array([51.5072]), crs.WGS84_A, crs.WGS84_F
    )
    X2, Y2, Z2 = crs.helmert_transform(X, Y, Z, **crs._WGS84_TO_OSGB36)
    neg = {k: -v for k, v in crs._WGS84_TO_OSGB36.items()}
    X3, Y3, Z3 = crs.helmert_transform(X2, Y2, Z2, **neg)
    assert abs(X3[0] - X[0]) < 0.02
    assert abs(Y3[0] - Y[0]) < 0.02
    assert abs(Z3[0] - Z[0]) < 0.02
    # and the shift is the right ORDER (hundreds of metres, not km)
    d = ((X2 - X) ** 2 + (Y2 - Y) ** 2 + (Z2 - Z) ** 2) ** 0.5
    assert 100.0 < d[0] < 1000.0


def test_parameterless_kinds_reject_stray_params():
    """'webmercator' and 'bng' take no parameters; a stray one must
    raise (plan-time contract), never be silently swallowed."""
    with pytest.raises(TypeError, match="webmercator takes no"):
        crs.proj_forward("webmercator", 0.0, 45.0, lat_ts_deg=70.0)
    with pytest.raises(TypeError, match="bng takes no"):
        crs.proj_forward("bng", 0.0, 52.0, k0=1.0)


def test_laea_matches_epsg_worked_example():
    """EPSG GN7-2 Lambert Azimuthal Equal Area (method 9820) worked
    example — ETRS89-LAEA (EPSG:3035 parameters): latitude 50 N,
    longitude 5 E -> E 3962799.45, N 2999718.85. Pinned to 0.01 m."""
    E, N = crs.epsg_forward(3035, 5.0, 50.0)
    assert abs(float(E) - 3962799.45) < 0.01
    assert abs(float(N) - 2999718.85) < 0.01
    lon, lat = crs.epsg_inverse(3035, float(E), float(N))
    assert abs(float(lon) - 5.0) < 1e-9
    assert abs(float(lat) - 50.0) < 1e-9


def test_laea_is_equal_area():
    """The defining invariant: the forward map's Jacobian determinant
    must equal the ellipsoidal area element everywhere (scale factor
    product = 1), for BOTH the oblique (3035) and polar (3572)
    aspects — checked by finite differences against the ellipsoid's
    M*N*cos(phi) element."""
    e2 = 2.0 * crs.GRS80_F - crs.GRS80_F**2
    rng = np.random.default_rng(9)
    for code, lat_range, a_ax, ee2 in (
        (3035, (35.0, 68.0), crs.GRS80_A, e2),
        (3572, (56.0, 84.0), crs.WGS84_A,
         2.0 * crs.WGS84_F - crs.WGS84_F**2),
    ):
        lon = rng.uniform(-25.0, 35.0, 50)
        lat = rng.uniform(*lat_range, 50)
        h = 1e-5
        E0, N0 = crs.epsg_forward(code, lon, lat)
        E1, N1 = crs.epsg_forward(code, lon + h, lat)
        E2, N2 = crs.epsg_forward(code, lon, lat + h)
        hr = np.radians(h)
        jac = np.abs(
            (E1 - E0) * (N2 - N0) - (E2 - E0) * (N1 - N0)
        ) / (hr * hr)
        s = np.sin(np.radians(lat))
        m_rad = a_ax * (1.0 - ee2) / (1.0 - ee2 * s * s) ** 1.5
        n_rad = a_ax / np.sqrt(1.0 - ee2 * s * s)
        element = m_rad * n_rad * np.cos(np.radians(lat))
        assert np.abs(jac / element - 1.0).max() < 1e-4, code


def test_grs80_utm_series_matches_wgs84_to_sub_mm():
    """ETRS89 (258xx) and NAD83 (269xx) UTM are the SAME projection on
    a GRS80 ellipsoid whose flattening differs from WGS84's in the
    10th decimal: eastings/northings must agree with the WGS84 326xx
    kernel to < 1 mm, while NOT being bit-identical (proving the
    GRS80 constants actually flow through)."""
    lon = np.linspace(6.5, 11.5, 40)
    lat = np.linspace(-70.0, 70.0, 40)
    e1, n1 = crs.epsg_forward(25832, lon, lat)
    e2, n2 = crs.epsg_forward(32632, lon, lat)
    assert np.abs(e1 - e2).max() < 1e-3
    assert np.abs(n1 - n2).max() < 1e-3
    assert not np.array_equal(n1, n2)
    # NAD83 zone 12 likewise
    lon = np.linspace(-113.0, -109.0, 40)
    e3, n3 = crs.epsg_forward(26912, lon, lat)
    e4, n4 = crs.epsg_forward(32612, lon, lat)
    assert np.abs(e3 - e4).max() < 1e-3
    assert np.abs(n3 - n4).max() < 1e-3


def test_state_plane_natural_origins_and_tm_scale():
    """SPCS83 parameter rows: each zone's grid origin must land at
    (FE, FN) exactly, and the Alabama East TM central meridian must
    carry its defining k0 = 0.99996 (measured by finite-difference
    scale along the meridian at the latitude of origin)."""
    for code, lon0, lat0, fe, fn in (
        (32118, -74.0, 40.0 + 10.0 / 60.0, 300_000.0, 0.0),
        (26985, -77.0, 37.0 + 40.0 / 60.0, 400_000.0, 0.0),
        (26929, -(85.0 + 50.0 / 60.0), 30.5, 200_000.0, 0.0),
    ):
        E, N = crs.epsg_forward(code, lon0, lat0)
        assert abs(float(E) - fe) < 1e-6, code
        assert abs(float(N) - fn) < 1e-6, code
    # TM scale on the central meridian == k0
    h = 1e-6
    lat = 30.5
    _, n0 = crs.epsg_forward(26929, -(85.0 + 50.0 / 60.0), lat)
    _, n1 = crs.epsg_forward(26929, -(85.0 + 50.0 / 60.0), lat + h)
    s = np.sin(np.radians(lat))
    e2 = 2.0 * crs.GRS80_F - crs.GRS80_F**2
    m_rad = crs.GRS80_A * (1.0 - e2) / (1.0 - e2 * s * s) ** 1.5
    k = (float(n1) - float(n0)) / (np.radians(h) * m_rad)
    assert abs(k - 0.99996) < 1e-7


def test_epsg_unsupported_code_error_names_families():
    """The unsupported-code error must tell the user what IS there:
    code ranges and the kernel family list."""
    with pytest.raises(ValueError) as ei:
        crs.epsg_forward(31370, 4.0, 51.0)  # Belgian Lambert 72
    msg = str(ei.value)
    for frag in ("EPSG:31370", "258xx/269xx", "laea", "albers", "lcc"):
        assert frag in msg
    with pytest.raises(ValueError, match="EPSG:31370"):
        crs.epsg_inverse(31370, 0.0, 0.0)


def test_pacific_rim_rows_origins_roundtrip_and_invariants():
    """The r09-added rows over existing kernels: Alaska Albers
    (3338), Australian Albers (3577), NZTM 2000 (2193), and Arctic
    Polar Stereographic (3995). Each natural origin must land at
    (FE, FN) exactly; forward/inverse must round-trip across the
    zone of use; the Albers rows must preserve area (equal-area
    property measured on a small geodesic quad); NZTM's central
    meridian must carry k0 = 0.9996; and 3995 must agree with the
    generic PS kernel at its defining parallel."""
    # exact natural origins
    for code, lon0, lat0, fe, fn in (
        (3338, -154.0, 50.0, 0.0, 0.0),
        (3577, 132.0, 0.0, 0.0, 0.0),
        (2193, 173.0, 0.0, 1_600_000.0, 10_000_000.0),
    ):
        E, N = crs.epsg_forward(code, lon0, lat0)
        assert abs(float(E) - fe) < 1e-6, code
        assert abs(float(N) - fn) < 1e-6, code
    # round-trips across each zone of use
    cases = {
        3338: (np.array([-170.0, -150.0, -141.0]),
               np.array([54.0, 61.5, 70.0])),
        3577: (np.array([115.0, 133.0, 153.0]),
               np.array([-40.0, -25.0, -11.0])),
        2193: (np.array([167.0, 173.0, 178.5]),
               np.array([-46.5, -41.0, -34.5])),
        3995: (np.array([-120.0, 0.0, 45.0, 179.0]),
               np.array([62.0, 71.0, 80.0, 88.0])),
    }
    for code, (lons, lats) in cases.items():
        E, N = crs.epsg_forward(code, lons, lats)
        lon2, lat2 = crs.epsg_inverse(code, E, N)
        assert np.allclose(lon2, lons, atol=1e-9), code
        assert np.allclose(lat2, lats, atol=1e-9), code
    # Albers rows preserve area: a 0.1-degree quad's projected area
    # must match the ellipsoidal authalic area to relative 1e-6
    for code, lon_c, lat_c in ((3338, -150.0, 60.0),
                               (3577, 140.0, -28.0)):
        d = 0.05
        lons = np.array([lon_c - d, lon_c + d, lon_c + d, lon_c - d])
        lats = np.array([lat_c - d, lat_c - d, lat_c + d, lat_c + d])
        E, N = crs.epsg_forward(code, lons, lats)
        area = 0.5 * abs(
            sum(E[i] * N[(i + 1) % 4] - E[(i + 1) % 4] * N[i]
                for i in range(4))
        )
        # authalic-sphere reference area of the same quad
        e2 = 2.0 * crs.GRS80_F - crs.GRS80_F**2
        e1 = np.sqrt(e2)
        qp = (1.0 - e2) * (
            1.0 / (1.0 - e2) + np.log((1.0 + e1) / (1.0 - e1))
            / (2.0 * e1)
        )

        def q_of(lat):
            s = np.sin(np.radians(lat))
            return (1.0 - e2) * (
                s / (1.0 - e2 * s * s)
                + np.log((1.0 + e1 * s) / (1.0 - e1 * s)) / (2.0 * e1)
            )

        ref = (
            crs.GRS80_A**2 / 2.0
            * (q_of(lat_c + d) - q_of(lat_c - d))
            * np.radians(2.0 * d)
        )
        assert abs(area - ref) / ref < 1e-6, code
    # NZTM central-meridian scale == k0
    h = 1e-6
    _, n0 = crs.epsg_forward(2193, 173.0, -41.0)
    _, n1 = crs.epsg_forward(2193, 173.0, -41.0 + h)
    s = np.sin(np.radians(-41.0))
    e2 = 2.0 * crs.GRS80_F - crs.GRS80_F**2
    m_rad = crs.GRS80_A * (1.0 - e2) / (1.0 - e2 * s * s) ** 1.5
    k = (float(n1) - float(n0)) / (np.radians(h) * m_rad)
    assert abs(k - 0.9996) < 1e-7
    # 3995 == the generic PS kernel with lat_ts 71 N, lon0 0
    E, N = crs.epsg_forward(3995, 30.0, 75.0)
    E2, N2 = crs.polar_stereo_forward(30.0, 75.0, lat_ts_deg=71.0,
                                      lon0_deg=0.0)
    assert abs(float(E) - float(E2)) < 1e-9
    assert abs(float(N) - float(N2)) < 1e-9


def test_north_pole_laea_family():
    """The 3573-3576 North Pole LAEA rows (Canada/Atlantic/Europe/
    Russia): each is the polar LAEA aspect rotated to its central
    meridian — the pole maps to the origin, a point ON the central
    meridian maps to due grid-south of it (E == 0, N < 0), all four
    agree with the generic kernel, are mutually consistent under
    meridian rotation, and round-trip across the zone of use."""
    for code, lon0 in ((3573, -100.0), (3574, -40.0),
                       (3575, 10.0), (3576, 90.0)):
        E, N = crs.epsg_forward(code, lon0, 90.0)
        assert abs(float(E)) < 1e-6 and abs(float(N)) < 1e-6, code
        E, N = crs.epsg_forward(code, lon0, 60.0)
        assert abs(float(E)) < 1e-6 and float(N) < -3_000_000, code
        # generic-kernel agreement
        E2, N2 = crs.laea_forward(lon0 + 30.0, 70.0, lat0_deg=90.0,
                                  lon0_deg=lon0)
        E3, N3 = crs.epsg_forward(code, lon0 + 30.0, 70.0)
        assert abs(float(E2) - float(E3)) < 1e-9
        assert abs(float(N2) - float(N3)) < 1e-9
        # round-trip
        lons = np.array([lon0 - 120.0, lon0, lon0 + 89.0])
        lats = np.array([55.0, 72.0, 89.0])
        E, N = crs.epsg_forward(code, lons, lats)
        lon_b, lat_b = crs.epsg_inverse(code, E, N)
        # longitudes compare modulo 360 (the +-180 seam)
        assert np.allclose((lon_b - lons + 180.0) % 360.0 - 180.0,
                           0.0, atol=1e-9), code
        assert np.allclose(lat_b, lats, atol=1e-9), code
    # meridian rotation consistency: the same geodetic point in 3574
    # vs 3575 differs by a pure rotation of (10 - -40) = 50 degrees
    # about the pole — radii must match exactly
    E4, N4 = crs.epsg_forward(3574, 5.0, 65.0)
    E5, N5 = crs.epsg_forward(3575, 5.0, 65.0)
    r4_ = float(E4) ** 2 + float(N4) ** 2
    r5_ = float(E5) ** 2 + float(N5) ** 2
    assert abs(r4_ - r5_) / r4_ < 1e-12
