"""CRS kernel goldens (functions/crs.py, SURVEY O10): public constants,
projection invariants, round-trips, and the Spark UDF surface."""

import numpy as np

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
