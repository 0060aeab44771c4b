"""UDF / UDAF / UDTF surface (SURVEY §2B): Arrow-vectorized pandas
UDFs in all three shapes, plus the CRS-reprojection map (reference O10,
run/adcircTime2cogs.py:44-46) as a vectorized kernel.

Deterministic arithmetic only (add/mul/sqrt are correctly-rounded IEEE
ops identical across numpy / JVM / DuckDB), so even the Python-kernel
queries carry exact DuckDB oracles — the oracle checks the UDF
machinery end to end, not just the formula.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from adcirctime2cogs_spark.functions.numeric import r4
from adcirctime2cogs_spark.tables import load_table

QUERIES = {}
ORACLES = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


@F.pandas_udf(T.DoubleType())
def _score_udf(price: pd.Series, disc: pd.Series) -> pd.Series:
    """Scalar pandas UDF (Arrow-batched): sqrt/mul/add only. np.sqrt,
    NOT .pow(0.5): IEEE 754 requires sqrt to be correctly rounded but
    makes no such promise for libm pow(x, 0.5), which can be 1 ULP off
    on some platforms and flip r4()'s last digit vs the oracle's
    sqrt() (review r11)."""
    import numpy as np

    return pd.Series(np.sqrt(price.to_numpy())) * 3.0 + disc * 100.0


@_register(
    "udf_pandas_scalar",
    """
    SELECT l_orderkey, l_linenumber,
           round(sqrt(l_extendedprice) * 3.0 + l_discount * 100.0, 4) AS score
    FROM lineitem WHERE l_orderkey < 200
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar UDF over the fact table. np.sqrt and SQL
    sqrt() are both correctly-rounded IEEE — bit-identical on every
    platform (unlike pow(x, 0.5); see _score_udf)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        r4(_score_udf("l_extendedprice", "l_discount")).alias("score"),
    )


@F.pandas_udf(T.DoubleType())
def _infer_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Iterator-of-series pandas UDF: the ML-inference shape — the
    'model' loads ONCE per executor task, then every Arrow batch reuses
    it. Swap the closure for a real model handle (tokenizer, ONNX
    session) and nothing else changes."""
    model = {"w": 0.001, "b": -2.0}  # stands in for an expensive load
    for s in batches:
        yield s * model["w"] + model["b"]


@_register(
    "udf_pandas_iter",
    """
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * 0.001 - 2.0, 4) AS pred
    FROM lineitem WHERE l_orderkey < 200
    """,
)
def udf_pandas_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-inference UDF over the fact table: per-task amortized
    init + per-batch Arrow transfer (the 100TB embedding/scoring
    pipeline shape; contrast with udf_pandas_scalar's per-call form)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        r4(_infer_udf("l_extendedprice")).alias("pred"),
    )


@_register(
    "udaf_grouped_pandas",
    """
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
             AS weighted_avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udaf_grouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (UDAF shape): quantity-weighted
    mean price per flag via applyInPandas, one output row per group."""
    li = load_table(spark, sf_dir, "lineitem")

    def wavg(pdf: pd.DataFrame) -> pd.DataFrame:
        # sort first: applyInPandas delivers group rows in
        # shuffle-dependent order, so an arrival-order fold is
        # nondeterministic run to run. A keyed sequential fold is at
        # least DETERMINISTIC; the oracle's thread-parallel sum may
        # still fold differently, which the shared 4dp rounding
        # absorbs (boundary cases are ~1e-9 vs 1e-4 granularity).
        pdf = pdf.sort_values(["l_orderkey", "l_linenumber"])
        num = 0.0
        den = 0.0
        for p, q in zip(pdf["l_extendedprice"], pdf["l_quantity"]):
            num += p * q
            den += q
        v = num / den
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "weighted_avg_price": [math.floor(v * 10000.0 + 0.5) / 10000.0],
            }
        )

    return li.select(
        "l_returnflag", "l_extendedprice", "l_quantity",
        "l_orderkey", "l_linenumber",
    ).groupBy("l_returnflag").applyInPandas(
        wavg, schema="l_returnflag string, weighted_avg_price double"
    )


@_register(
    "udtf_expand_rows",
    """
    SELECT o_orderkey, g.i AS copy_idx, o_orderstatus
    FROM orders, generate_series(0, 2) g(i)
    WHERE o_orderkey < 100 AND g.i <= o_orderkey % 3
    """,
)
def udtf_expand_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF shape (one row -> N rows) via mapInPandas: each order emits
    (o_orderkey % 3) + 1 copies."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, idxs, stats = [], [], []
            for k, s in zip(pdf["o_orderkey"], pdf["o_orderstatus"]):
                n = int(k % 3) + 1
                keys.extend([k] * n)
                idxs.extend(range(n))
                stats.extend([s] * n)
            yield pd.DataFrame(
                {"o_orderkey": keys, "copy_idx": idxs, "o_orderstatus": stats}
            )

    return orders.select("o_orderkey", "o_orderstatus").mapInPandas(
        expand, schema="o_orderkey long, copy_idx int, o_orderstatus string"
    )


@F.pandas_udf(T.StructType(
    [T.StructField("x_m", T.DoubleType()), T.StructField("y_m", T.DoubleType())]
))
def _webmercator_udf(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
    """Vectorized CRS transform kernel: EPSG:4326 -> EPSG:3857 web
    Mercator via the real projection math in functions/crs.py (the
    reference's to_crs call, run/adcircTime2cogs.py:44-46, is
    4326->4326 — a structural no-op; this is the genuine transform a
    tiling pipeline runs, with no pyproj required)."""
    from adcirctime2cogs_spark.functions.crs import webmercator_forward

    x, y = webmercator_forward(lon.to_numpy(), lat.to_numpy())
    return pd.DataFrame({"x_m": x, "y_m": y})


@F.pandas_udf(T.StructType([
    T.StructField("easting", T.DoubleType()),
    T.StructField("northing", T.DoubleType()),
    T.StructField("zone", T.LongType()),
]))
def utm_project_udf(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
    """EPSG:4326 -> UTM (WGS84, Krueger n-series) as an Arrow-batched
    kernel — the ellipsoidal companion to the spherical web-Mercator
    UDF. No SQL oracle (the series is not reasonably expressible in
    SQL); pinned instead by the kernel-level golden tests in
    tests/test_crs.py (quarter-meridian constant, invariants,
    round-trips)."""
    from adcirctime2cogs_spark.functions.crs import utm_forward

    e, n, z = utm_forward(lon.to_numpy(), lat.to_numpy())
    return pd.DataFrame({"easting": e, "northing": n, "zone": z})


def reproject_points(
    df: DataFrame,
    lon_col: str,
    lat_col: str,
    epsg: int,
    out_cols: tuple[str, str] = ("easting", "northing"),
) -> DataFrame:
    """User-facing to_crs parity (the reference's geopandas to_crs,
    run/adcircTime2cogs.py:44-46, generalized to the CRS a raster
    pipeline actually targets): project lon/lat columns into any
    EPSG code the kernel set covers — 3857, every UTM zone, Canada
    Atlas / Lambert-93 LCC, Antarctic & NSIDC polar stereographic,
    CONUS Albers. One Arrow-batched pandas UDF; unknown codes raise
    at plan time, not per-row."""
    from adcirctime2cogs_spark.functions.crs import epsg_forward

    epsg_forward(int(epsg), 0.0, 0.0)  # validate the code plan-side

    def kernel(lon, lat):
        from adcirctime2cogs_spark.functions.crs import epsg_forward

        return epsg_forward(int(epsg), lon, lat)

    return _project_with(df, lon_col, lat_col, out_cols, kernel)


def reproject_points_proj(
    df: DataFrame,
    lon_col: str,
    lat_col: str,
    kind: str,
    params: dict,
    out_cols: tuple[str, str] = ("easting", "northing"),
) -> DataFrame:
    """to_crs parity for CRS BEYOND the EPSG registry codes: project
    lon/lat through any of the five kernel families with a
    user-supplied parameter set (standard parallels, origin, false
    offsets, variant-A k0, UTM zone/hemisphere) — covering every
    parameterization those families express, the way the reference's
    pyproj to_crs accepts arbitrary CRS definitions (datum shifts
    excepted, documented in functions/crs.py). Bad kinds/params raise
    at plan time via a probe call, not per-row in executors."""
    from adcirctime2cogs_spark.functions.crs import proj_forward

    proj_forward(kind, 0.0, 45.0, **params)  # plan-time validation

    def kernel(lon, lat):
        from adcirctime2cogs_spark.functions.crs import proj_forward

        return proj_forward(kind, lon, lat, **params)

    return _project_with(df, lon_col, lat_col, out_cols, kernel)


def _project_with(df: DataFrame, lon_col: str, lat_col: str,
                  out_cols: tuple[str, str], kernel) -> DataFrame:
    """Shared Arrow-UDF plumbing for the two reproject wrappers
    (review r11: the struct UDF + temp-column fan-out was pasted
    twice): kernel(lon_np, lat_np) -> (easting_np, northing_np)."""

    @F.pandas_udf(T.StructType([
        T.StructField("e", T.DoubleType()),
        T.StructField("n", T.DoubleType()),
    ]))
    def proj(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
        e, n = kernel(lon.to_numpy(), lat.to_numpy())
        return pd.DataFrame({"e": e, "n": n})

    tmp = "_p"
    while tmp in df.columns:  # never clobber a user column
        tmp += "_"
    out = df.withColumn(tmp, proj(F.col(lon_col), F.col(lat_col)))
    return out.withColumn(out_cols[0], F.col(f"{tmp}.e")).withColumn(
        out_cols[1], F.col(f"{tmp}.n")
    ).drop(tmp)


_UPS_ORACLE_SQL = """
    WITH pt AS (
      SELECT vec_id,
             radians(CAST(vec_id % 360 - 180 AS DOUBLE)) AS dlam,
             radians(CAST(60 + vec_id % 25 AS DOUBLE)) AS phi
      FROM embeddings WHERE vec_id < 100
    ), k AS (
      SELECT sqrt(2.0 / 298.257223563
                  - 1.0 / (298.257223563 * 298.257223563)) AS e,
             6378137.0 AS a, 0.994 AS k0, 2000000.0 AS fe, 2000000.0 AS fn
      FROM (SELECT 1)
    ), kc AS (
      SELECT *, sqrt(pow(1.0 + e, 1.0 + e) * pow(1.0 - e, 1.0 - e)) AS ec
      FROM k
    ), rho AS (
      SELECT vec_id, dlam, fe, fn,
        2.0 * a * k0 * (tan(pi() / 4.0 - phi / 2.0)
          * pow((1.0 + e * sin(phi)) / (1.0 - e * sin(phi)), e / 2.0))
          / ec AS rho_n,
        2.0 * a * k0 * (tan(pi() / 4.0 - phi / 2.0)
          / pow((1.0 + e * sin(-phi)) / (1.0 - e * sin(-phi)), e / 2.0))
          / ec AS rho_s
      FROM pt CROSS JOIN kc
    )
    SELECT vec_id,
           round(fe + rho_n * sin(dlam), 4) AS ups_n_e,
           round(fn - rho_n * cos(dlam), 4) AS ups_n_n,
           round(fe + rho_s * sin(dlam), 4) AS ups_s_e,
           round(fn + rho_s * cos(dlam), 4) AS ups_s_n
    FROM rho
"""


@_register("crs_reproject_ups", _UPS_ORACLE_SQL)
def crs_reproject_ups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Universal Polar Stereographic, BOTH hemispheres, routed through
    the PARAMETERIZED reprojection operator (reproject_points_proj
    with kind='ps' and an explicit variant-A k0 = 0.994 — EPSG 9810,
    the UPS 32661/32761 definition, validated against the EPSG GN7-2
    variant-A worked example in tests/test_crs.py). The same
    synthetic points project north as (lon, lat) and south as
    (lon, -lat); the oracle restates the full ellipsoidal t/rho
    formulas in SQL. South's t uses the mirrored-latitude identity
    tan(pi/4 - phi/2) / ((1+e*sin(-phi))/(1-e*sin(-phi)))^(e/2) —
    algebraically the kernel's south branch at latitude -phi."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    pts = emb.select(
        "vec_id",
        (F.col("vec_id") % 360 - 180).cast("double").alias("lon"),
        (F.col("vec_id") % 25 + 60).cast("double").alias("lat"),
    ).withColumn("slat", -F.col("lat"))
    ups = dict(lon0_deg=0.0, fe=2_000_000.0, fn=2_000_000.0, k0=0.994)
    north = reproject_points_proj(
        pts, "lon", "lat", "ps", dict(ups, lat_ts_deg=90.0),
        out_cols=("ne", "nn"),
    )
    both = reproject_points_proj(
        north, "lon", "slat", "ps", dict(ups, lat_ts_deg=-90.0),
        out_cols=("se", "sn"),
    )
    return both.select(
        "vec_id",
        r4(F.col("ne")).alias("ups_n_e"),
        r4(F.col("nn")).alias("ups_n_n"),
        r4(F.col("se")).alias("ups_s_e"),
        r4(F.col("sn")).alias("ups_s_n"),
    )


_LAEA_ORACLE_SQL = """
    WITH pt AS (
      SELECT vec_id,
             CAST(vec_id % 50 - 10 AS DOUBLE) AS lon,
             CAST(35 + vec_id % 31 AS DOUBLE) AS lat
      FROM embeddings WHERE vec_id < 100
    ), k AS (
      SELECT 6378137.0 AS a,
             sqrt(2.0 / 298.257222101
                  - 1.0 / (298.257222101 * 298.257222101)) AS e,
             radians(52.0) AS p0, radians(10.0) AS lam0,
             4321000.0 AS fe, 3210000.0 AS fn
      FROM (SELECT 1)
    ), k2 AS (
      SELECT *,
        (1.0 - e * e) * (1.0 / (1.0 - e * e)
          - (1.0 / (2.0 * e)) * ln((1.0 - e) / (1.0 + e))) AS qp,
        (1.0 - e * e) * (sin(p0) / (1.0 - e * e * sin(p0) * sin(p0))
          - (1.0 / (2.0 * e))
            * ln((1.0 - e * sin(p0)) / (1.0 + e * sin(p0)))) AS q0,
        cos(p0) / sqrt(1.0 - e * e * sin(p0) * sin(p0)) AS m0
      FROM k
    ), k3 AS (
      SELECT *, asin(q0 / qp) AS b0, a * sqrt(qp / 2.0) AS rq FROM k2
    ), k4 AS (
      SELECT *, a * m0 / (rq * cos(b0)) AS dd FROM k3
    ), s AS (
      SELECT vec_id, fe, fn, b0, rq, dd,
        asin(((1.0 - e * e)
          * (sin(radians(lat))
               / (1.0 - e * e * sin(radians(lat)) * sin(radians(lat)))
             - (1.0 / (2.0 * e))
               * ln((1.0 - e * sin(radians(lat)))
                    / (1.0 + e * sin(radians(lat)))))) / qp) AS b,
        radians(lon) - lam0 AS dlam
      FROM pt CROSS JOIN k4
    ), g AS (
      SELECT *, rq * sqrt(2.0 / (1.0 + sin(b0) * sin(b)
                                 + cos(b0) * cos(b) * cos(dlam))) AS bb
      FROM s
    )
    SELECT vec_id,
           round(fe + bb * dd * cos(b) * sin(dlam), 4) AS laea_e,
           round(fn + (bb / dd) * (cos(b0) * sin(b)
                 - sin(b0) * cos(b) * cos(dlam)), 4) AS laea_n
    FROM g
"""


@_register("crs_reproject_laea", _LAEA_ORACLE_SQL)
def crs_reproject_laea(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ETRS89-extended LAEA Europe (EPSG:3035, method 9820 oblique on
    GRS80) through the registered EPSG dispatcher — the INSPIRE grid
    CRS, and the round-9 externally-verified representative of the
    registry's GRS80-datum parameter rows (258xx/269xx UTM, SPCS83
    LCC/TM state planes share the same kernels + table, pinned by
    worked examples in tests/test_crs.py). The oracle restates the
    full authalic-latitude forward (q, qp, beta, Rq, D, B) in SQL;
    the kernel matches the EPSG GN7-2 worked example to 0.1 mm."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    pts = emb.select(
        "vec_id",
        (F.col("vec_id") % 50 - 10).cast("double").alias("lon"),
        (F.col("vec_id") % 31 + 35).cast("double").alias("lat"),
    )
    out = reproject_points(pts, "lon", "lat", 3035, out_cols=("le", "ln_"))
    return out.select(
        "vec_id",
        r4(F.col("le")).alias("laea_e"),
        r4(F.col("ln_")).alias("laea_n"),
    )


def _bng_oracle_sql() -> str:
    """Full-formula EPSG:27700 oracle: WGS84 geodetic -> geocentric ->
    position-vector Helmert -> OSGB36 geodetic on Airy 1830 (the
    fixed-point latitude iteration UNROLLED, one CTE per step, exactly
    the kernel's 10) -> Krueger-series transverse Mercator. DuckDB has
    no hyperbolic builtins, so sinh/cosh/atanh appear as their
    exp/ln compositions (ULP-level difference vs numpy, orders of
    magnitude under the 4dp rounding bar)."""
    sinh = "((exp({u}) - exp(-({u}))) / 2.0)"
    cosh = "((exp({u}) + exp(-({u}))) / 2.0)"
    atanh = "(0.5 * ln((1.0 + ({x})) / (1.0 - ({x}))))"
    # the 10 unrolled geodetic-latitude iterations on Airy
    iters = ""
    prev = "i0"
    for k in range(1, 11):
        iters += f""", i{k} AS (
      SELECT * REPLACE (atan2(
          Z2 + e2a * (aa / sqrt(1.0 - e2a * sin(phi) * sin(phi)))
             * sin(phi), p) AS phi)
      FROM {prev}
    )"""
        prev = f"i{k}"
    t_expr = sinh.format(
        u="(" + atanh.format(x="sin(phir)") + " - es * "
        + atanh.format(x="es * sin(phir)") + ")"
    )
    t0_expr = sinh.format(
        u="(" + atanh.format(x="sin(radians(49.0))") + " - es * "
        + atanh.format(x="es * sin(radians(49.0))") + ")"
    )
    series = " + ".join(
        f"a{j} * sin({2 * j}.0 * xip) * "
        + cosh.format(u=f"{2 * j}.0 * etap")
        for j in (1, 2, 3)
    )
    eseries = " + ".join(
        f"a{j} * cos({2 * j}.0 * xip) * "
        + sinh.format(u=f"{2 * j}.0 * etap")
        for j in (1, 2, 3)
    )
    xi0_series = " + ".join(
        f"a{j} * sin({2 * j}.0 * atan2(t0, 1.0))" for j in (1, 2, 3)
    )
    return f"""
    WITH pt AS (
      SELECT vec_id,
             CAST(vec_id % 9 - 7 AS DOUBLE) AS lon,
             CAST(50 + vec_id % 10 AS DOUBLE) AS lat
      FROM embeddings WHERE vec_id < 100
    ), k AS (
      SELECT 6378137.0 AS aw, 1.0 / 298.257223563 AS fw,
             6377563.396 AS aa, 1.0 / 299.3249646 AS fa,
             pi() / (180.0 * 3600.0) AS sec
    ), k2 AS (
      SELECT *, 2.0 * fw - fw * fw AS e2w, 2.0 * fa - fa * fa AS e2a,
             fa / (2.0 - fa) AS nn,
             1.0 + 20.4894 * 0.000001 AS m,
             -0.1502 * sec AS rx, -0.2470 * sec AS ry,
             -0.8421 * sec AS rz
      FROM k
    ), k3 AS (
      SELECT *, aa / (1.0 + nn)
                 * (1.0 + nn * nn / 4.0
                    + nn * nn * nn * nn / 64.0) AS ar,
             nn / 2.0 - 2.0 * nn * nn / 3.0
                 + 5.0 * nn * nn * nn / 16.0 AS a1,
             13.0 * nn * nn / 48.0 - 3.0 * nn * nn * nn / 5.0 AS a2,
             61.0 * nn * nn * nn / 240.0 AS a3,
             2.0 * sqrt(nn) / (1.0 + nn) AS es
      FROM k2
    ), g AS (
      SELECT vec_id, k3.*,
             (aw / sqrt(1.0 - e2w * sin(radians(lat)) * sin(radians(lat))))
               * cos(radians(lat)) * cos(radians(lon)) AS X,
             (aw / sqrt(1.0 - e2w * sin(radians(lat)) * sin(radians(lat))))
               * cos(radians(lat)) * sin(radians(lon)) AS Y,
             ((1.0 - e2w)
              * (aw / sqrt(1.0 - e2w * sin(radians(lat))
                           * sin(radians(lat)))))
               * sin(radians(lat)) AS Z
      FROM pt CROSS JOIN k3
    ), h AS (
      SELECT *, -446.448 + m * (X - rz * Y + ry * Z) AS X2,
             125.157 + m * (rz * X + Y - rx * Z) AS Y2,
             -542.060 + m * (-ry * X + rx * Y + Z) AS Z2
      FROM g
    ), i0 AS (
      SELECT *, sqrt(X2 * X2 + Y2 * Y2) AS p,
             atan2(Z2, sqrt(X2 * X2 + Y2 * Y2) * (1.0 - e2a)) AS phi
      FROM h
    ){iters}, tm AS (
      SELECT *, radians(degrees(phi)) AS phir,
             radians(degrees(atan2(Y2, X2)) - (-2.0)) AS lam
      FROM {prev}
    ), tt AS (
      SELECT *, {t_expr} AS t, {t0_expr} AS t0 FROM tm
    ), xe AS (
      SELECT *, atan2(t, cos(lam)) AS xip,
             {atanh.format(x="sin(lam) / sqrt(1.0 + t * t)")} AS etap
      FROM tt
    ), se AS (
      SELECT *, xip + {series} AS xi,
             etap + {eseries} AS eta,
             atan2(t0, 1.0) + {xi0_series} AS xi0
      FROM xe
    )
    SELECT vec_id,
           round(400000.0 + 0.9996012717 * ar * eta, 4) AS bng_e,
           round(-100000.0 + 0.9996012717 * ar * (xi - xi0), 4) AS bng_n
    FROM se
    """


@F.pandas_udf(T.StructType([
    T.StructField("e", T.DoubleType()),
    T.StructField("n", T.DoubleType()),
]))
def _bng_udf(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
    from adcirctime2cogs_spark.functions.crs import bng_forward

    e, n = bng_forward(lon.to_numpy(), lat.to_numpy())
    return pd.DataFrame({"e": e, "n": n})


@_register("crs_reproject_bng", _bng_oracle_sql())
def crs_reproject_bng(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATUM-SHIFTED reprojection, the to_crs capability the
    parameter dispatch alone can't express: EPSG:4326 -> EPSG:27700
    (British National Grid) via WGS84 geocentric conversion, the
    published 7-parameter position-vector Helmert to OSGB36, and the
    Krueger-series transverse Mercator on Airy 1830. The TM leg is
    pinned to the OS worked example to the millimetre
    (tests/test_crs.py); the oracle restates the ENTIRE pipeline in
    SQL — geocentric conversion, Helmert, ten unrolled
    latitude-iteration steps, and the n-series with its constants
    derived from the ellipsoid literals, hyperbolics composed from
    exp/ln."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    pts = emb.select(
        "vec_id",
        (F.col("vec_id") % 9 - 7).cast("double").alias("lon"),
        (F.col("vec_id") % 10 + 50).cast("double").alias("lat"),
    )
    out = pts.withColumn("p", _bng_udf("lon", "lat"))
    return out.select(
        "vec_id",
        r4(F.col("p.e")).alias("bng_e"),
        r4(F.col("p.n")).alias("bng_n"),
    )


@_register(
    "crs_reproject",
    """
    SELECT vec_id,
           round(6378137.0 * radians(CAST(vec_id % 360 - 180 AS DOUBLE)), 4)
             AS x_m,
           round(6378137.0 * ln(tan(pi() / 4.0
                 + radians(CAST(vec_id % 140 - 70 AS DOUBLE)) / 2.0)), 4)
             AS y_m
    FROM embeddings WHERE vec_id < 100
    """,
)
def crs_reproject(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENUINE CRS reprojection as a vectorized pandas UDF (SURVEY
    O10): synthetic lon/lat derived from vec_id, projected to
    EPSG:3857 meters. The oracle states the same spherical-Mercator
    formula in SQL; numpy and DuckDB agree within ~2e-9 m on these
    inputs while every value sits >= 2e-7 from a 4dp rounding boundary
    (measured), so the r4 hash is stable. Latitudes are kept in
    [-70, 69] — inside web-Mercator's +-85.0511 validity band."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    pts = emb.select(
        "vec_id",
        (F.col("vec_id") % 360 - 180).cast("double").alias("lon"),
        (F.col("vec_id") % 140 - 70).cast("double").alias("lat"),
    )
    out = pts.withColumn("p", _webmercator_udf("lon", "lat"))
    return out.select(
        "vec_id", r4(F.col("p.x_m")).alias("x_m"), r4(F.col("p.y_m")).alias("y_m")
    )


@F.pandas_udf(T.StructType([
    T.StructField("lcc_e", T.DoubleType()),
    T.StructField("lcc_n", T.DoubleType()),
    T.StructField("ps_e", T.DoubleType()),
    T.StructField("ps_n", T.DoubleType()),
    T.StructField("aea_e", T.DoubleType()),
    T.StructField("aea_n", T.DoubleType()),
]))
def _conic_udf(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
    """Conic/polar CRS kernels (EPSG methods 9802 / 9829 / 9822) as
    one Arrow-batched UDF: Lambert Conformal Conic 2SP on the Canada
    Atlas parallels (49/77, origin 49N 95W), south Polar Stereographic
    on the Australian-Antarctic parameters (lat_ts -71, lon0 70E)
    applied to the mirrored latitude, and Albers Equal Area on the
    CONUS parameters (29.5/45.5, origin 23N 96W)."""
    from adcirctime2cogs_spark.functions.crs import (
        albers_forward,
        lcc_forward,
        polar_stereo_forward,
    )

    lo, la = lon.to_numpy(), lat.to_numpy()
    le, ln = lcc_forward(lo, la, 49.0, 77.0, 49.0, -95.0)
    pe, pn = polar_stereo_forward(lo, -la, -71.0, 70.0)
    ae, an = albers_forward(lo, la, 29.5, 45.5, 23.0, -96.0)
    return pd.DataFrame({"lcc_e": le, "lcc_n": ln, "ps_e": pe,
                         "ps_n": pn, "aea_e": ae, "aea_n": an})


_CONIC_ORACLE_SQL = """
    WITH pt AS (
      SELECT vec_id,
             radians(CAST(-140 + vec_id % 90 AS DOUBLE)
                     - (-95.0)) AS dlam,
             radians(CAST(40 + vec_id % 44 AS DOUBLE)) AS phi,
             radians(CAST(-140 + vec_id % 90 AS DOUBLE) - 70.0) AS pdlam,
             radians(CAST(-(40 + vec_id % 44) AS DOUBLE)) AS sphi,
             radians(CAST(-140 + vec_id % 90 AS DOUBLE)
                     - (-96.0)) AS adlam
      FROM embeddings WHERE vec_id < 100
    ), k AS (
      SELECT sqrt(2.0 / 298.257223563
                  - 1.0 / (298.257223563 * 298.257223563)) AS e,
             6378137.0 AS a,
             radians(49.0) AS p1, radians(77.0) AS p2,
             radians(49.0) AS p0, radians(-71.0) AS pf,
             radians(29.5) AS pa1, radians(45.5) AS pa2,
             radians(23.0) AS pa0
    ), c1 AS (
      SELECT *,
        cos(p1) / sqrt(1.0 - (e * sin(p1)) * (e * sin(p1))) AS m1,
        cos(p2) / sqrt(1.0 - (e * sin(p2)) * (e * sin(p2))) AS m2,
        tan(pi() / 4.0 - p1 / 2.0)
          / pow((1.0 - e * sin(p1)) / (1.0 + e * sin(p1)), e / 2.0) AS t1,
        tan(pi() / 4.0 - p2 / 2.0)
          / pow((1.0 - e * sin(p2)) / (1.0 + e * sin(p2)), e / 2.0) AS t2,
        tan(pi() / 4.0 - p0 / 2.0)
          / pow((1.0 - e * sin(p0)) / (1.0 + e * sin(p0)), e / 2.0) AS t0,
        cos(pf) / sqrt(1.0 - (e * sin(pf)) * (e * sin(pf))) AS mf,
        tan(pi() / 4.0 + pf / 2.0)
          * pow((1.0 - e * sin(pf)) / (1.0 + e * sin(pf)), e / 2.0) AS tf,
        sqrt(pow(1.0 + e, 1.0 + e) * pow(1.0 - e, 1.0 - e)) AS ec,
        cos(pa1) / sqrt(1.0 - (e * sin(pa1)) * (e * sin(pa1))) AS ma1,
        cos(pa2) / sqrt(1.0 - (e * sin(pa2)) * (e * sin(pa2))) AS ma2,
        (1.0 - e * e) * (sin(pa1) / (1.0 - (e * sin(pa1)) * (e * sin(pa1)))
          - (1.0 / (2.0 * e))
            * ln((1.0 - e * sin(pa1)) / (1.0 + e * sin(pa1)))) AS qa1,
        (1.0 - e * e) * (sin(pa2) / (1.0 - (e * sin(pa2)) * (e * sin(pa2)))
          - (1.0 / (2.0 * e))
            * ln((1.0 - e * sin(pa2)) / (1.0 + e * sin(pa2)))) AS qa2,
        (1.0 - e * e) * (sin(pa0) / (1.0 - (e * sin(pa0)) * (e * sin(pa0)))
          - (1.0 / (2.0 * e))
            * ln((1.0 - e * sin(pa0)) / (1.0 + e * sin(pa0)))) AS qa0
      FROM k
    ), c2 AS (
      SELECT *, (ln(m1) - ln(m2)) / (ln(t1) - ln(t2)) AS n,
             (ma1 * ma1 - ma2 * ma2) / (qa2 - qa1) AS na
      FROM c1
    ), c3 AS (
      SELECT *, a * m1 / (n * pow(t1, n)) AS af,
             mf * ec / (2.0 * tf) AS k0,
             ma1 * ma1 + na * qa1 AS ca
      FROM c2
    ), c4 AS (
      SELECT *, af * pow(t0, n) AS r0,
             a * sqrt(ca - na * qa0) / na AS rho0
      FROM c3
    )
    SELECT vec_id,
       round(af * pow(tan(pi() / 4.0 - phi / 2.0)
               / pow((1.0 - e * sin(phi)) / (1.0 + e * sin(phi)), e / 2.0),
             n) * sin(n * dlam), 4) AS lcc_e,
       round(r0 - af * pow(tan(pi() / 4.0 - phi / 2.0)
               / pow((1.0 - e * sin(phi)) / (1.0 + e * sin(phi)), e / 2.0),
             n) * cos(n * dlam), 4) AS lcc_n,
       round(2.0 * a * k0 * (tan(pi() / 4.0 + sphi / 2.0)
               / pow((1.0 + e * sin(sphi)) / (1.0 - e * sin(sphi)), e / 2.0))
             / ec * sin(pdlam), 4) AS ps_e,
       round(2.0 * a * k0 * (tan(pi() / 4.0 + sphi / 2.0)
               / pow((1.0 + e * sin(sphi)) / (1.0 - e * sin(sphi)), e / 2.0))
             / ec * cos(pdlam), 4) AS ps_n,
       round(a * sqrt(ca - na * ((1.0 - e * e)
               * (sin(phi) / (1.0 - (e * sin(phi)) * (e * sin(phi)))
                  - (1.0 / (2.0 * e))
                    * ln((1.0 - e * sin(phi)) / (1.0 + e * sin(phi))))))
             / na * sin(na * adlam), 4) AS aea_e,
       round(rho0 - a * sqrt(ca - na * ((1.0 - e * e)
               * (sin(phi) / (1.0 - (e * sin(phi)) * (e * sin(phi)))
                  - (1.0 / (2.0 * e))
                    * ln((1.0 - e * sin(phi)) / (1.0 + e * sin(phi))))))
             / na * cos(na * adlam), 4) AS aea_n
    FROM pt CROSS JOIN c4
"""


@_register("crs_reproject_conic", _CONIC_ORACLE_SQL)
def crs_reproject_conic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENUINE conic + polar reprojection through the pandas-UDF
    kernels: Lambert Conformal Conic 2SP (EPSG 9802, Canada Atlas
    parallels — validated against the EPSG GN7-2 worked example in
    tests/test_crs.py), south Polar Stereographic variant B (EPSG
    9829, Australian Antarctic parameters), and Albers Equal Area
    (EPSG 9822, CONUS parameters). The oracle restates the FULL
    ellipsoidal formulas in SQL — standard-parallel constants
    included — so DuckDB derives n, F, r0, k0, C, rho0 itself rather
    than trusting embedded literals. Inputs keep |values| in the
    1e5-1e7 m range where double-precision agreement (~1e-8 m) clears
    the 4dp rounding boundary."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    pts = emb.select(
        "vec_id",
        (F.col("vec_id") % 90 - 140).cast("double").alias("lon"),
        (F.col("vec_id") % 44 + 40).cast("double").alias("lat"),
    )
    out = pts.withColumn("p", _conic_udf("lon", "lat"))
    return out.select(
        "vec_id",
        r4(F.col("p.lcc_e")).alias("lcc_e"),
        r4(F.col("p.lcc_n")).alias("lcc_n"),
        r4(F.col("p.ps_e")).alias("ps_e"),
        r4(F.col("p.ps_n")).alias("ps_n"),
        r4(F.col("p.aea_e")).alias("aea_e"),
        r4(F.col("p.aea_n")).alias("aea_n"),
    )
