"""Coordinate-reference transforms as vectorized numpy kernels
(SURVEY O10) — real math, no pyproj.

The reference's reprojection is geopandas to_crs with source == target
EPSG:4326 (run/adcircTime2cogs.py:44-46), a structural no-op; these
kernels implement the genuine transforms a COG/tiling pipeline needs,
from the public formulas:

- EPSG:4326 <-> EPSG:3857 spherical web-Mercator (the web-tile CRS):
  x = R*lambda, y = R*ln(tan(pi/4 + phi/2)) on the WGS84 semi-major
  sphere, valid for |lat| < ~85.0511 (the square-world cutoff);
- EPSG:4326 <-> UTM (WGS84 ellipsoid): transverse Mercator via the
  Krueger third-flattening series (the Karney-popularized n-series,
  coefficients to n^3 — sub-mm over a UTM zone), k0 = 0.9996,
  false easting 500 km, false northing 10 000 km south.

Everything is element-wise numpy on float64 arrays, so the same
functions back the Arrow-vectorized pandas UDFs in operators/udfs.py
and driver-side golden tests.
"""

from __future__ import annotations

import numpy as np

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
K0 = 0.9996
FALSE_EASTING = 500_000.0
FALSE_NORTHING_SOUTH = 10_000_000.0

_N = WGS84_F / (2.0 - WGS84_F)  # third flattening
# rectifying radius: A = a/(1+n) (1 + n^2/4 + n^4/64 + ...)
RECTIFYING_A = WGS84_A / (1.0 + _N) * (1.0 + _N**2 / 4.0 + _N**4 / 64.0)
# Krueger forward (alpha) and inverse (beta) coefficients to n^3
_ALPHA = (
    _N / 2.0 - 2.0 * _N**2 / 3.0 + 5.0 * _N**3 / 16.0,
    13.0 * _N**2 / 48.0 - 3.0 * _N**3 / 5.0,
    61.0 * _N**3 / 240.0,
)
_BETA = (
    _N / 2.0 - 2.0 * _N**2 / 3.0 + 37.0 * _N**3 / 96.0,
    _N**2 / 48.0 + _N**3 / 15.0,
    17.0 * _N**3 / 480.0,
)


# ------------------------------------------------------- web mercator
def webmercator_forward(lon_deg, lat_deg):
    """EPSG:4326 -> EPSG:3857 (x_m, y_m)."""
    lon = np.asarray(lon_deg, dtype="float64")
    lat = np.asarray(lat_deg, dtype="float64")
    x = WGS84_A * np.radians(lon)
    y = WGS84_A * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def webmercator_inverse(x_m, y_m):
    """EPSG:3857 -> EPSG:4326 (lon_deg, lat_deg)."""
    x = np.asarray(x_m, dtype="float64")
    y = np.asarray(y_m, dtype="float64")
    lon = np.degrees(x / WGS84_A)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / WGS84_A)) - np.pi / 2.0)
    return lon, lat


# ---------------------------------------------------------------- UTM
def utm_zone(lon_deg) -> np.ndarray:
    """Standard 6-degree zone number (1..60) for a longitude."""
    lon = np.asarray(lon_deg, dtype="float64")
    return np.clip(((lon + 180.0) // 6.0).astype("int64") + 1, 1, 60)


def utm_central_meridian(zone) -> np.ndarray:
    return np.asarray(zone, dtype="float64") * 6.0 - 183.0


def utm_forward(lon_deg, lat_deg, zone=None, southern=None):
    """EPSG:4326 -> UTM (easting_m, northing_m, zone).

    `southern` picks the 10 000 km false-northing convention: True
    applies it to every point (327xx CRS), False to none (326xx CRS),
    and None (the zone-autodetect path) falls back to per-point
    latitude sign. A 327xx CRS is defined for cross-equator data —
    the false northing belongs to the CRS, not the point — so EPSG
    dispatch must pass the code's hemisphere explicitly."""
    lon = np.asarray(lon_deg, dtype="float64")
    lat = np.asarray(lat_deg, dtype="float64")
    zone = utm_zone(lon) if zone is None else np.broadcast_to(
        np.asarray(zone, dtype="int64"), lon.shape
    )
    lam = np.radians(lon - utm_central_meridian(zone))
    phi = np.radians(lat)

    # conformal latitude via the exact ellipsoidal relation (at the
    # poles arctanh(±1) = ±inf and the chain converges to xi = ±pi/2 —
    # the right answer — so the divide warning is noise, not an error)
    e2sqrt = 2.0 * np.sqrt(_N) / (1.0 + _N)
    with np.errstate(divide="ignore"):
        t = np.sinh(
            np.arctanh(np.sin(phi)) - e2sqrt * np.arctanh(e2sqrt * np.sin(phi))
        )
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arctanh(np.sin(lam) / np.sqrt(1.0 + t * t))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, a in enumerate(_ALPHA, start=1):
        xi += a * np.sin(2.0 * j * xi_p) * np.cosh(2.0 * j * eta_p)
        eta += a * np.cos(2.0 * j * xi_p) * np.sinh(2.0 * j * eta_p)
    easting = FALSE_EASTING + K0 * RECTIFYING_A * eta
    northing = K0 * RECTIFYING_A * xi
    if southern is None:
        northing = np.where(
            lat < 0.0, northing + FALSE_NORTHING_SOUTH, northing
        )
    elif southern:
        northing = northing + FALSE_NORTHING_SOUTH
    return easting, northing, zone


def utm_inverse(easting_m, northing_m, zone, southern=False):
    """UTM -> EPSG:4326 (lon_deg, lat_deg)."""
    E = np.asarray(easting_m, dtype="float64")
    N = np.asarray(northing_m, dtype="float64")
    if southern:
        N = N - FALSE_NORTHING_SOUTH
    xi = N / (K0 * RECTIFYING_A)
    eta = (E - FALSE_EASTING) / (K0 * RECTIFYING_A)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(_BETA, start=1):
        xi_p -= b * np.sin(2.0 * j * xi) * np.cosh(2.0 * j * eta)
        eta_p -= b * np.cos(2.0 * j * xi) * np.sinh(2.0 * j * eta)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))  # conformal latitude
    # invert conformal -> geodetic latitude by fixed point (quadratic
    # convergence is overkill; this converges to 1e-12 rad in <6 iters)
    e2sqrt = 2.0 * np.sqrt(_N) / (1.0 + _N)
    phi = chi.copy()
    for _ in range(8):
        s = np.sin(phi)
        t_target = np.sinh(
            np.arcsinh(np.tan(chi))
            + e2sqrt * np.arctanh(e2sqrt * s)
        )
        phi = np.arctan(t_target)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    lon = np.degrees(lam) + utm_central_meridian(np.asarray(zone))
    return lon, np.degrees(phi)


# ------------------------------------------------- conic / polar CRS
# Lambert Conformal Conic (2SP) and Polar Stereographic — the two
# projection families met/ocean mosaics commonly target beyond
# Mercator/UTM. Formulas are the public EPSG Guidance Note 7-2
# methods 9802 and 9810/9829, element-wise numpy like everything
# above so the same kernels back pandas UDFs and driver-side tests.

def _ecc(f: float) -> float:
    return np.sqrt(2.0 * f - f * f)


def _lcc_m(phi, e):
    return np.cos(phi) / np.sqrt(1.0 - (e * np.sin(phi)) ** 2)


def _lcc_t(phi, e):
    s = np.sin(phi)
    return np.tan(np.pi / 4.0 - phi / 2.0) / (
        (1.0 - e * s) / (1.0 + e * s)
    ) ** (e / 2.0)


def lcc_constants(lat1_deg: float, lat2_deg: float, lat0_deg: float,
                  a: float = WGS84_A, f: float = WGS84_F):
    """(n, a*F, r0) for an LCC 2SP with standard parallels lat1/lat2
    and false-origin latitude lat0 (EPSG 9802)."""
    e = _ecc(f)
    p1, p2, p0 = (np.radians(v) for v in (lat1_deg, lat2_deg, lat0_deg))
    m1, m2 = _lcc_m(p1, e), _lcc_m(p2, e)
    t1, t2, t0 = _lcc_t(p1, e), _lcc_t(p2, e), _lcc_t(p0, e)
    if lat1_deg == lat2_deg:
        n = np.sin(p1)
    else:
        n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
    aF = a * m1 / (n * t1 ** n)
    r0 = aF * t0 ** n
    return float(n), float(aF), float(r0)


def lcc_forward(lon_deg, lat_deg, lat1_deg, lat2_deg, lat0_deg,
                lon0_deg, fe: float = 0.0, fn: float = 0.0,
                a: float = WGS84_A, f: float = WGS84_F):
    """EPSG:4326 -> Lambert Conformal Conic 2SP (E_m, N_m)."""
    lon = np.asarray(lon_deg, dtype="float64")
    lat = np.asarray(lat_deg, dtype="float64")
    e = _ecc(f)
    n, aF, r0 = lcc_constants(lat1_deg, lat2_deg, lat0_deg, a, f)
    r = aF * _lcc_t(np.radians(lat), e) ** n
    theta = n * np.radians(lon - lon0_deg)
    return fe + r * np.sin(theta), fn + r0 - r * np.cos(theta)


def lcc_inverse(e_m, n_m, lat1_deg, lat2_deg, lat0_deg, lon0_deg,
                fe: float = 0.0, fn: float = 0.0,
                a: float = WGS84_A, f: float = WGS84_F):
    """Lambert Conformal Conic 2SP -> EPSG:4326 (lon_deg, lat_deg)."""
    E = np.asarray(e_m, dtype="float64") - fe
    N = np.asarray(n_m, dtype="float64") - fn
    ecc = _ecc(f)
    n, aF, r0 = lcc_constants(lat1_deg, lat2_deg, lat0_deg, a, f)
    rp = np.sign(n) * np.sqrt(E * E + (r0 - N) ** 2)
    tp = (rp / aF) ** (1.0 / n)
    theta = np.arctan2(np.sign(n) * E, np.sign(n) * (r0 - N))
    # invert t(phi) by fixed point (converges < 1e-12 rad in ~6 iters)
    phi = np.pi / 2.0 - 2.0 * np.arctan(tp)
    for _ in range(8):
        s = ecc * np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            tp * ((1.0 - s) / (1.0 + s)) ** (ecc / 2.0)
        )
    return np.degrees(theta / n) + lon0_deg, np.degrees(phi)


def _ps_t(phi, e, north: bool):
    s = np.sin(phi)
    ratio = ((1.0 + e * s) / (1.0 - e * s)) ** (e / 2.0)
    if north:
        return np.tan(np.pi / 4.0 - phi / 2.0) * ratio
    return np.tan(np.pi / 4.0 + phi / 2.0) / ratio


def polar_stereo_k0(lat_ts_deg: float, a: float = WGS84_A,
                    f: float = WGS84_F) -> float:
    """Scale at the pole implied by a standard parallel (variant B ->
    variant A conversion, EPSG 9829): k0 = mF*sqrt((1+e)^(1+e)
    (1-e)^(1-e)) / (2 tF). lat_ts at exactly +-90 is the variant-A
    limit k0 = 1 — the mF/tF ratio is 0/0 there (mF and tF both
    vanish), so the limit is taken explicitly rather than computed."""
    if abs(lat_ts_deg) == 90.0:
        return 1.0
    e = _ecc(f)
    north = lat_ts_deg >= 0.0
    pF = np.radians(lat_ts_deg)
    mF = _lcc_m(pF, e)
    tF = _ps_t(pF, e, north)
    return float(
        mF * np.sqrt((1.0 + e) ** (1.0 + e) * (1.0 - e) ** (1.0 - e))
        / (2.0 * tF)
    )


def polar_stereo_forward(lon_deg, lat_deg, lat_ts_deg, lon0_deg,
                         fe: float = 0.0, fn: float = 0.0,
                         a: float = WGS84_A, f: float = WGS84_F,
                         k0: float | None = None):
    """EPSG:4326 -> Polar Stereographic with standard parallel
    lat_ts (variant B; hemisphere follows lat_ts's sign). lat_ts at
    +-90 degenerates to variant A with k0 = 1; an explicit k0 selects
    variant A outright (EPSG 9810 — UPS is lat_ts=+-90, k0=0.994)."""
    lon = np.asarray(lon_deg, dtype="float64")
    lat = np.asarray(lat_deg, dtype="float64")
    e = _ecc(f)
    north = lat_ts_deg >= 0.0
    if k0 is None:
        k0 = polar_stereo_k0(lat_ts_deg, a, f)
    t = _ps_t(np.radians(lat), e, north)
    rho = (
        2.0 * a * k0 * t
        / np.sqrt((1.0 + e) ** (1.0 + e) * (1.0 - e) ** (1.0 - e))
    )
    theta = np.radians(lon - lon0_deg)
    E = fe + rho * np.sin(theta)
    N = fn - rho * np.cos(theta) if north else fn + rho * np.cos(theta)
    return E, N


def polar_stereo_inverse(e_m, n_m, lat_ts_deg, lon0_deg,
                         fe: float = 0.0, fn: float = 0.0,
                         a: float = WGS84_A, f: float = WGS84_F,
                         k0: float | None = None):
    """Polar Stereographic (variant B; explicit k0 = variant A) ->
    EPSG:4326."""
    E = np.asarray(e_m, dtype="float64") - fe
    N = np.asarray(n_m, dtype="float64") - fn
    e = _ecc(f)
    north = lat_ts_deg >= 0.0
    if k0 is None:
        k0 = polar_stereo_k0(lat_ts_deg, a, f)
    rho = np.sqrt(E * E + N * N)
    tp = rho * np.sqrt(
        (1.0 + e) ** (1.0 + e) * (1.0 - e) ** (1.0 - e)
    ) / (2.0 * a * k0)
    if north:
        phi = np.pi / 2.0 - 2.0 * np.arctan(tp)
    else:
        phi = 2.0 * np.arctan(tp) - np.pi / 2.0
    for _ in range(8):
        s = e * np.sin(phi)
        # invert t(phi): north tan(pi/4-phi/2) = t*((1-s)/(1+s))^(e/2),
        # south tan(pi/4+phi/2) = t*((1+s)/(1-s))^(e/2)
        if north:
            phi = np.pi / 2.0 - 2.0 * np.arctan(
                tp * ((1.0 - s) / (1.0 + s)) ** (e / 2.0)
            )
        else:
            phi = 2.0 * np.arctan(
                tp * ((1.0 + s) / (1.0 - s)) ** (e / 2.0)
            ) - np.pi / 2.0
    lam = np.arctan2(E, -N) if north else np.arctan2(E, N)
    return np.degrees(lam) + lon0_deg, np.degrees(phi)


# ---------------------------------------------- Albers equal-area
def _aea_q(phi, e):
    s = np.sin(phi)
    return (1.0 - e * e) * (
        s / (1.0 - (e * s) ** 2)
        - (1.0 / (2.0 * e)) * np.log((1.0 - e * s) / (1.0 + e * s))
    )


def albers_constants(lat1_deg: float, lat2_deg: float, lat0_deg: float,
                     a: float = WGS84_A, f: float = WGS84_F):
    """(n, C, rho0) for an Albers Equal Area conic (EPSG 9822)."""
    e = _ecc(f)
    p1, p2, p0 = (np.radians(v) for v in (lat1_deg, lat2_deg, lat0_deg))
    m1, m2 = _lcc_m(p1, e), _lcc_m(p2, e)
    q1, q2, q0 = _aea_q(p1, e), _aea_q(p2, e), _aea_q(p0, e)
    if lat1_deg == lat2_deg:
        n = np.sin(p1)
    else:
        n = (m1 * m1 - m2 * m2) / (q2 - q1)
    C = m1 * m1 + n * q1
    rho0 = a * np.sqrt(C - n * q0) / n
    return float(n), float(C), float(rho0)


def albers_forward(lon_deg, lat_deg, lat1_deg, lat2_deg, lat0_deg,
                   lon0_deg, fe: float = 0.0, fn: float = 0.0,
                   a: float = WGS84_A, f: float = WGS84_F):
    """EPSG:4326 -> Albers Equal Area (E_m, N_m), EPSG method 9822."""
    lon = np.asarray(lon_deg, dtype="float64")
    lat = np.asarray(lat_deg, dtype="float64")
    e = _ecc(f)
    n, C, rho0 = albers_constants(lat1_deg, lat2_deg, lat0_deg, a, f)
    q = _aea_q(np.radians(lat), e)
    rho = a * np.sqrt(C - n * q) / n
    theta = n * np.radians(lon - lon0_deg)
    return fe + rho * np.sin(theta), fn + rho0 - rho * np.cos(theta)


def albers_inverse(e_m, n_m, lat1_deg, lat2_deg, lat0_deg, lon0_deg,
                   fe: float = 0.0, fn: float = 0.0,
                   a: float = WGS84_A, f: float = WGS84_F):
    """Albers Equal Area -> EPSG:4326 (lon_deg, lat_deg)."""
    E = np.asarray(e_m, dtype="float64") - fe
    N = np.asarray(n_m, dtype="float64") - fn
    e = _ecc(f)
    n, C, rho0 = albers_constants(lat1_deg, lat2_deg, lat0_deg, a, f)
    rho = np.sqrt(E * E + (rho0 - N) ** 2)
    qp = (C - (rho * n / a) ** 2) / n
    theta = np.arctan2(np.sign(n) * E, np.sign(n) * (rho0 - N))
    # authalic -> geodetic latitude by fixed point (EPSG 9822 iteration)
    phi = np.arcsin(np.clip(qp / 2.0, -1.0, 1.0))
    for _ in range(8):
        s = np.sin(phi)
        denom = (1.0 - (e * s) ** 2) ** 2 / (2.0 * np.cos(phi))
        corr = (
            qp / (1.0 - e * e)
            - s / (1.0 - (e * s) ** 2)
            + (1.0 / (2.0 * e)) * np.log((1.0 - e * s) / (1.0 + e * s))
        )
        phi = phi + denom * corr
    return np.degrees(theta / n) + lon0_deg, np.degrees(phi)


# ------------------------------------ Lambert Azimuthal Equal Area
# EPSG method 9820 (oblique aspect) — the ETRS89-LAEA 3035 method the
# EU's INSPIRE gridded datasets use. Shares the authalic-latitude
# machinery (_aea_q) with Albers.


def _authalic_phi(qprime, e: float):
    """Authalic q -> geodetic latitude by the EPSG fixed-point
    iteration (the block albers_inverse also runs; albers keeps its
    pre-existing inline copy until that kernel's next externally
    re-verified round — window-rotation rule 1)."""
    phi = np.arcsin(np.clip(qprime / 2.0, -1.0, 1.0))
    for _ in range(8):
        s = np.sin(phi)
        denom = (1.0 - (e * s) ** 2) ** 2 / (2.0 * np.cos(phi))
        corr = (
            qprime / (1.0 - e * e)
            - s / (1.0 - (e * s) ** 2)
            + (1.0 / (2.0 * e)) * np.log((1.0 - e * s) / (1.0 + e * s))
        )
        phi = phi + denom * corr
    return phi

GRS80_A = 6378137.0
GRS80_F = 1.0 / 298.257222101  # NAD83 / ETRS89 ellipsoid


def laea_constants(lat0_deg: float, a: float = WGS84_A,
                   f: float = WGS84_F):
    """(qp, beta0, Rq, D) for an oblique LAEA with natural-origin
    latitude lat0 (EPSG 9820)."""
    e = _ecc(f)
    p0 = np.radians(lat0_deg)
    qp = _aea_q(np.pi / 2.0, e)
    q0 = _aea_q(p0, e)
    beta0 = np.arcsin(np.clip(q0 / qp, -1.0, 1.0))
    rq = a * np.sqrt(qp / 2.0)
    d = a * _lcc_m(p0, e) / (rq * np.cos(beta0))
    return float(qp), float(beta0), float(rq), float(d)


def laea_forward(lon_deg, lat_deg, lat0_deg, lon0_deg,
                 fe: float = 0.0, fn: float = 0.0,
                 a: float = WGS84_A, f: float = WGS84_F):
    """EPSG:4326 -> Lambert Azimuthal Equal Area (E_m, N_m), EPSG
    method 9820 — oblique aspect, or the polar aspect when lat0 is
    exactly +-90 (where the oblique constants' D degenerates 0/0)."""
    lon = np.asarray(lon_deg, dtype="float64")
    lat = np.asarray(lat_deg, dtype="float64")
    e = _ecc(f)
    if abs(lat0_deg) == 90.0:
        qp = _aea_q(np.pi / 2.0, e)
        q = _aea_q(np.radians(lat), e)
        north = lat0_deg > 0.0
        rho = a * np.sqrt(np.maximum(qp - q if north else qp + q, 0.0))
        dlam = np.radians(lon - lon0_deg)
        E = fe + rho * np.sin(dlam)
        N = fn - rho * np.cos(dlam) if north else fn + rho * np.cos(dlam)
        return E, N
    qp, beta0, rq, d = laea_constants(lat0_deg, a, f)
    beta = np.arcsin(np.clip(_aea_q(np.radians(lat), e) / qp, -1.0, 1.0))
    dlam = np.radians(lon - lon0_deg)
    b = rq * np.sqrt(
        2.0 / (1.0 + np.sin(beta0) * np.sin(beta)
               + np.cos(beta0) * np.cos(beta) * np.cos(dlam))
    )
    E = fe + b * d * np.cos(beta) * np.sin(dlam)
    N = fn + (b / d) * (np.cos(beta0) * np.sin(beta)
                        - np.sin(beta0) * np.cos(beta) * np.cos(dlam))
    return E, N


def laea_inverse(e_m, n_m, lat0_deg, lon0_deg,
                 fe: float = 0.0, fn: float = 0.0,
                 a: float = WGS84_A, f: float = WGS84_F):
    """Lambert Azimuthal Equal Area -> EPSG:4326 (lon_deg, lat_deg),
    EPSG method 9820 inverse (oblique, or polar at lat0 = +-90): the
    authalic latitude comes back through the same fixed-point
    iteration Albers uses."""
    E = np.asarray(e_m, dtype="float64") - fe
    N = np.asarray(n_m, dtype="float64") - fn
    e = _ecc(f)
    if abs(lat0_deg) == 90.0:
        qp = _aea_q(np.pi / 2.0, e)
        north = lat0_deg > 0.0
        rho = np.sqrt(E * E + N * N)
        qprime = qp - (rho / a) ** 2 if north else (rho / a) ** 2 - qp
        lam = np.arctan2(E, -N) if north else np.arctan2(E, N)
        lam = np.where(rho == 0.0, 0.0, lam)
    else:
        qp, beta0, rq, d = laea_constants(lat0_deg, a, f)
        rho = np.sqrt((E / d) ** 2 + (d * N) ** 2)
        c = 2.0 * np.arcsin(np.clip(rho / (2.0 * rq), -1.0, 1.0))
        with np.errstate(invalid="ignore"):
            sin_bp = np.cos(c) * np.sin(beta0) + (
                d * N * np.sin(c) * np.cos(beta0) / rho
            )
        # rho = 0 is the natural origin itself
        sin_bp = np.where(rho == 0.0, np.sin(beta0), sin_bp)
        lam = np.arctan2(
            E * np.sin(c),
            d * rho * np.cos(beta0) * np.cos(c)
            - d * d * N * np.sin(beta0) * np.sin(c),
        )
        lam = np.where(rho == 0.0, 0.0, lam)
        qprime = qp * np.clip(sin_bp, -1.0, 1.0)
    phi = _authalic_phi(qprime, e)
    return np.degrees(lam) + lon0_deg, np.degrees(phi)


# --------------------------------------------------- EPSG dispatch
# Parameter sets for the projected CRS a met/ocean raster pipeline
# actually targets (all public EPSG registry definitions). UTM zones
# (326xx north / 327xx south WGS84, 258xx ETRS89, 269xx NAD83 — the
# GRS80-datum series run the generalized TM kernel) are synthesized
# on demand.
_EPSG_PARAMS = {
    3857: ("webmercator", {}),
    3978: ("lcc", dict(lat1_deg=49.0, lat2_deg=77.0, lat0_deg=49.0,
                       lon0_deg=-95.0)),  # NAD83 Canada Atlas Lambert
    2154: ("lcc", dict(lat1_deg=49.0, lat2_deg=44.0, lat0_deg=46.5,
                       lon0_deg=3.0, fe=700_000.0, fn=6_600_000.0)),
    # RGF93 Lambert-93 (France)
    3031: ("ps", dict(lat_ts_deg=-71.0, lon0_deg=0.0)),
    # WGS84 Antarctic Polar Stereographic
    3413: ("ps", dict(lat_ts_deg=70.0, lon0_deg=-45.0)),
    # WGS84 NSIDC Sea Ice Polar Stereographic North
    32661: ("ps", dict(lat_ts_deg=90.0, lon0_deg=0.0,
                       fe=2_000_000.0, fn=2_000_000.0, k0=0.994)),
    # WGS84 UPS North (Polar Stereographic variant A, EPSG 9810)
    32761: ("ps", dict(lat_ts_deg=-90.0, lon0_deg=0.0,
                       fe=2_000_000.0, fn=2_000_000.0, k0=0.994)),
    # WGS84 UPS South
    27700: ("bng", {}),
    # OSGB36 British National Grid (datum shift + TM on Airy 1830;
    # kernels defined below — the dict hook keeps the dispatch table
    # single-sourced)
    5070: ("albers", dict(lat1_deg=29.5, lat2_deg=45.5, lat0_deg=23.0,
                          lon0_deg=-96.0)),  # NAD83 CONUS Albers
    3035: ("laea", dict(lat0_deg=52.0, lon0_deg=10.0,
                        fe=4_321_000.0, fn=3_210_000.0,
                        a=GRS80_A, f=GRS80_F)),
    # ETRS89-extended / LAEA Europe (EPSG 9820 oblique, GRS80)
    3572: ("laea", dict(lat0_deg=90.0, lon0_deg=-150.0,
                        a=WGS84_A, f=WGS84_F)),
    # WGS84 / North Pole LAEA Alaska (polar aspect of the same kernel)
    3573: ("laea", dict(lat0_deg=90.0, lon0_deg=-100.0,
                        a=WGS84_A, f=WGS84_F)),
    # WGS84 / North Pole LAEA Canada
    3574: ("laea", dict(lat0_deg=90.0, lon0_deg=-40.0,
                        a=WGS84_A, f=WGS84_F)),
    # WGS84 / North Pole LAEA Atlantic
    3575: ("laea", dict(lat0_deg=90.0, lon0_deg=10.0,
                        a=WGS84_A, f=WGS84_F)),
    # WGS84 / North Pole LAEA Europe
    3576: ("laea", dict(lat0_deg=90.0, lon0_deg=90.0,
                        a=WGS84_A, f=WGS84_F)),
    # WGS84 / North Pole LAEA Russia
    # NAD83 state-plane SPCS83 meter-based samples (GRS80): the LCC 2SP
    # and TM state families the registry's 26xxx/32xxx blocks repeat
    # with per-state parameters
    32118: ("lcc", dict(lat1_deg=41.0 + 2.0 / 60.0,
                        lat2_deg=40.0 + 40.0 / 60.0,
                        lat0_deg=40.0 + 10.0 / 60.0, lon0_deg=-74.0,
                        fe=300_000.0, fn=0.0, a=GRS80_A, f=GRS80_F)),
    # NAD83 / New York Long Island
    26985: ("lcc", dict(lat1_deg=39.45, lat2_deg=38.3,
                        lat0_deg=37.0 + 40.0 / 60.0, lon0_deg=-77.0,
                        fe=400_000.0, fn=0.0, a=GRS80_A, f=GRS80_F)),
    # NAD83 / Maryland
    26929: ("tm", dict(lat0_deg=30.5, lon0_deg=-(85.0 + 50.0 / 60.0),
                       k0=0.99996, fe=200_000.0, fn=0.0,
                       a=GRS80_A, f=GRS80_F)),
    # NAD83 / Alabama East (SPCS83 TM)
    3338: ("albers", dict(lat1_deg=55.0, lat2_deg=65.0, lat0_deg=50.0,
                          lon0_deg=-154.0, a=GRS80_A, f=GRS80_F)),
    # NAD83 / Alaska Albers
    3577: ("albers", dict(lat1_deg=-18.0, lat2_deg=-36.0, lat0_deg=0.0,
                          lon0_deg=132.0, a=GRS80_A, f=GRS80_F)),
    # GDA94 / Australian Albers
    2193: ("tm", dict(lat0_deg=0.0, lon0_deg=173.0, k0=0.9996,
                      fe=1_600_000.0, fn=10_000_000.0,
                      a=GRS80_A, f=GRS80_F)),
    # NZGD2000 / New Zealand Transverse Mercator 2000
    3995: ("ps", dict(lat_ts_deg=71.0, lon0_deg=0.0)),
    # WGS84 / Arctic Polar Stereographic
}

# GRS80-datum UTM series: (first code, zone offset, hemisphere-south).
# ETRS89 (25828-25838, Europe zones 28-38) and NAD83 (26901-26923,
# zones 1-23) — parameter-table data over the generalized TM kernel,
# identical shape to the WGS84 326xx/327xx ranges.
_UTM_GRS80_SERIES = (
    (25828, 25838, 25800),
    (26901, 26923, 26900),
)


def _utm_grs80_params(epsg: int) -> dict | None:
    for lo, hi, base in _UTM_GRS80_SERIES:
        if lo <= epsg <= hi:
            zone = epsg - base
            return dict(
                lat0_deg=0.0, lon0_deg=float(zone * 6 - 183),
                k0=0.9996, fe=500_000.0, fn=0.0,
                a=GRS80_A, f=GRS80_F,
            )
    return None


def epsg_forward(epsg: int, lon_deg, lat_deg):
    """EPSG:4326 -> the projected CRS `epsg` (E, N). Supports 3857,
    UTM 32601-32660 / 32701-32760, and the registered conic/polar
    codes; raises ValueError for anything else (parity with the
    reference's pyproj-backed to_crs, scoped to real kernels)."""
    if epsg == 4326:
        return (np.asarray(lon_deg, dtype="float64"),
                np.asarray(lat_deg, dtype="float64"))
    if 32601 <= epsg <= 32660:
        e, n, _ = utm_forward(
            lon_deg, lat_deg, zone=epsg - 32600, southern=False
        )
        return e, n
    if 32701 <= epsg <= 32760:
        e, n, _ = utm_forward(
            lon_deg, lat_deg, zone=epsg - 32700, southern=True
        )
        return e, n
    grs80 = _utm_grs80_params(epsg)
    if grs80 is not None:
        return tm_forward(lon_deg, lat_deg, **grs80)
    kind, kw = _EPSG_PARAMS.get(epsg, (None, None))
    if kind == "webmercator":
        return webmercator_forward(lon_deg, lat_deg)
    if kind == "lcc":
        return lcc_forward(lon_deg, lat_deg, **kw)
    if kind == "ps":
        return polar_stereo_forward(lon_deg, lat_deg, **kw)
    if kind == "albers":
        return albers_forward(lon_deg, lat_deg, **kw)
    if kind == "laea":
        return laea_forward(lon_deg, lat_deg, **kw)
    if kind == "tm":
        return tm_forward(lon_deg, lat_deg, **kw)
    if kind == "bng":
        return bng_forward(lon_deg, lat_deg)
    raise ValueError(
        f"EPSG:{epsg} not in the built-in kernel set "
        f"(have 4326, 3857, UTM 326xx/327xx WGS84 + 258xx/269xx GRS80, "
        f"{sorted(_EPSG_PARAMS)}; kernel families: webmercator, utm/tm, "
        f"lcc, ps, albers, laea, bng)"
    )


def epsg_inverse(epsg: int, e_m, n_m):
    """Projected CRS `epsg` -> EPSG:4326 (lon_deg, lat_deg)."""
    if epsg == 4326:
        return (np.asarray(e_m, dtype="float64"),
                np.asarray(n_m, dtype="float64"))
    if 32601 <= epsg <= 32660:
        return utm_inverse(e_m, n_m, epsg - 32600)
    if 32701 <= epsg <= 32760:
        return utm_inverse(e_m, n_m, epsg - 32700, southern=True)
    grs80 = _utm_grs80_params(epsg)
    if grs80 is not None:
        return tm_inverse(e_m, n_m, **grs80)
    kind, kw = _EPSG_PARAMS.get(epsg, (None, None))
    if kind == "webmercator":
        return webmercator_inverse(e_m, n_m)
    if kind == "lcc":
        return lcc_inverse(e_m, n_m, **kw)
    if kind == "ps":
        return polar_stereo_inverse(e_m, n_m, **kw)
    if kind == "albers":
        return albers_inverse(e_m, n_m, **kw)
    if kind == "laea":
        return laea_inverse(e_m, n_m, **kw)
    if kind == "tm":
        return tm_inverse(e_m, n_m, **kw)
    if kind == "bng":
        return bng_inverse(e_m, n_m)
    raise ValueError(
        f"EPSG:{epsg} not in the built-in kernel set "
        f"(have 4326, 3857, UTM 326xx/327xx WGS84 + 258xx/269xx GRS80, "
        f"{sorted(_EPSG_PARAMS)}; kernel families: webmercator, utm/tm, "
        f"lcc, ps, albers, laea, bng)"
    )


# --------------------------------------------- parameterized dispatch
# The reference's to_crs accepts ANY pyproj CRS
# (run/adcircTime2cogs.py:44-46); beyond the EPSG registry codes
# above, these dispatchers open each kernel FAMILY to user-supplied
# parameter sets (any standard parallels, origins, false offsets,
# variant-A k0, UTM zone/hemisphere) — everything the five families
# express except datum shifts, which stay out of scope.
def _no_params(fn, label: str):
    """Wrap a parameterless kernel so stray params RAISE instead of
    being silently swallowed — the plan-time-raise contract."""

    def wrapped(x, y, **kw):
        if kw:
            raise TypeError(
                f"{label} takes no parameters, got {sorted(kw)}"
            )
        return fn(x, y)

    return wrapped


_PROJ_FWD = {
    "webmercator": _no_params(webmercator_forward, "webmercator"),
    "utm": lambda lon, lat, **kw: utm_forward(lon, lat, **kw)[:2],
    "lcc": lcc_forward,
    "ps": polar_stereo_forward,
    "albers": albers_forward,
    "laea": laea_forward,
    # tm_forward is defined later in the module (generalized-TM
    # section); bind late so import order stays one-pass
    "tm": lambda lon, lat, **kw: tm_forward(lon, lat, **kw),
}
_PROJ_INV = {
    "webmercator": _no_params(webmercator_inverse, "webmercator"),
    "utm": utm_inverse,
    "lcc": lcc_inverse,
    "ps": polar_stereo_inverse,
    "albers": albers_inverse,
    "laea": laea_inverse,
    "tm": lambda e, n, **kw: tm_inverse(e, n, **kw),
}


def proj_forward(kind: str, lon_deg, lat_deg, **params):
    """EPSG:4326 -> a parameterized projection: kind picks the kernel
    family ('webmercator' | 'utm' | 'lcc' | 'ps' | 'albers' |
    'laea' | 'tm'), params
    pass through to it. Unknown kinds/params raise immediately (plan
    time when called through reproject_points_proj)."""
    fwd = _PROJ_FWD.get(kind)
    if fwd is None:
        raise ValueError(
            f"unknown projection kind {kind!r} (have {sorted(_PROJ_FWD)})"
        )
    return fwd(lon_deg, lat_deg, **params)


def proj_inverse(kind: str, e_m, n_m, **params):
    """Parameterized projection -> EPSG:4326."""
    inv = _PROJ_INV.get(kind)
    if inv is None:
        raise ValueError(
            f"unknown projection kind {kind!r} (have {sorted(_PROJ_INV)})"
        )
    return inv(e_m, n_m, **params)


# --------------------------------------- generalized TM + datum shift
# The one to_crs capability the parameter dispatch above still lacked
# is a DATUM CHANGE: a projected CRS on a non-WGS84 ellipsoid reached
# through a Helmert transform (EPSG 9606 position vector). The
# representative real-world case is EPSG:27700 (British National
# Grid): WGS84 geodetic -> geocentric -> 7-parameter Helmert ->
# OSGB36 geodetic on Airy 1830 -> transverse Mercator. All formulas
# are the public EPSG / OS "A guide to coordinate systems in Great
# Britain" methods.

def tm_constants(a: float, f: float):
    """Krueger third-flattening series constants for ANY ellipsoid:
    (n, rectifying radius A, alpha[3], beta[3]) — the same n^3 series
    the WGS84 module constants hold, as functions of the ellipsoid."""
    n = f / (2.0 - f)
    A = a / (1.0 + n) * (1.0 + n**2 / 4.0 + n**4 / 64.0)
    alpha = (
        n / 2.0 - 2.0 * n**2 / 3.0 + 5.0 * n**3 / 16.0,
        13.0 * n**2 / 48.0 - 3.0 * n**3 / 5.0,
        61.0 * n**3 / 240.0,
    )
    beta = (
        n / 2.0 - 2.0 * n**2 / 3.0 + 37.0 * n**3 / 96.0,
        n**2 / 48.0 + n**3 / 15.0,
        17.0 * n**3 / 480.0,
    )
    return n, A, alpha, beta


def _tm_xi_eta(lon_deg, lat_deg, lon0_deg: float, n: float, alpha):
    """Gauss-Krueger (xi, eta) on the unit rectifying circle."""
    lam = np.radians(np.asarray(lon_deg, dtype="float64") - lon0_deg)
    phi = np.radians(np.asarray(lat_deg, dtype="float64"))
    e2sqrt = 2.0 * np.sqrt(n) / (1.0 + n)
    with np.errstate(divide="ignore"):
        t = np.sinh(
            np.arctanh(np.sin(phi))
            - e2sqrt * np.arctanh(e2sqrt * np.sin(phi))
        )
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arctanh(np.sin(lam) / np.sqrt(1.0 + t * t))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, c in enumerate(alpha, start=1):
        xi += c * np.sin(2.0 * j * xi_p) * np.cosh(2.0 * j * eta_p)
        eta += c * np.cos(2.0 * j * xi_p) * np.sinh(2.0 * j * eta_p)
    return xi, eta


def tm_forward(lon_deg, lat_deg, lat0_deg: float, lon0_deg: float,
               k0: float, fe: float, fn: float,
               a: float, f: float):
    """Transverse Mercator on an arbitrary ellipsoid with a natural
    origin (lat0, lon0): E = FE + k0*A*eta, N = FN + k0*A*(xi - xi0)
    where xi0 is the rectifying latitude of the origin (the meridian
    arc from the equator, in A units)."""
    n, A, alpha, _ = tm_constants(a, f)
    xi, eta = _tm_xi_eta(lon_deg, lat_deg, lon0_deg, n, alpha)
    xi0, _ = _tm_xi_eta(np.array([lon0_deg]), np.array([lat0_deg]),
                        lon0_deg, n, alpha)
    return fe + k0 * A * eta, fn + k0 * A * (xi - xi0[0])


def tm_inverse(e_m, n_m, lat0_deg: float, lon0_deg: float,
               k0: float, fe: float, fn: float,
               a: float, f: float):
    """Transverse Mercator (arbitrary ellipsoid) -> geodetic."""
    nn, A, alpha, beta = tm_constants(a, f)
    xi0, _ = _tm_xi_eta(np.array([lon0_deg]), np.array([lat0_deg]),
                        lon0_deg, nn, alpha)
    xi = (np.asarray(n_m, dtype="float64") - fn) / (k0 * A) + xi0[0]
    eta = (np.asarray(e_m, dtype="float64") - fe) / (k0 * A)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, c in enumerate(beta, start=1):
        xi_p -= c * np.sin(2.0 * j * xi) * np.cosh(2.0 * j * eta)
        eta_p -= c * np.cos(2.0 * j * xi) * np.sinh(2.0 * j * eta)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    e2sqrt = 2.0 * np.sqrt(nn) / (1.0 + nn)
    phi = chi.copy()
    for _ in range(8):
        s = np.sin(phi)
        t_target = np.sinh(
            np.arcsinh(np.tan(chi)) + e2sqrt * np.arctanh(e2sqrt * s)
        )
        phi = np.arctan(t_target)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return np.degrees(lam) + lon0_deg, np.degrees(phi)


def geodetic_to_geocentric(lon_deg, lat_deg, a: float, f: float,
                           h_m=0.0):
    """Geodetic (h on the ellipsoid) -> ECEF cartesian (X, Y, Z)."""
    lon = np.radians(np.asarray(lon_deg, dtype="float64"))
    lat = np.radians(np.asarray(lat_deg, dtype="float64"))
    e2 = 2.0 * f - f * f
    nu = a / np.sqrt(1.0 - e2 * np.sin(lat) ** 2)
    X = (nu + h_m) * np.cos(lat) * np.cos(lon)
    Y = (nu + h_m) * np.cos(lat) * np.sin(lon)
    Z = ((1.0 - e2) * nu + h_m) * np.sin(lat)
    return X, Y, Z


def geocentric_to_geodetic(X, Y, Z, a: float, f: float):
    """ECEF cartesian -> geodetic (lon_deg, lat_deg), h discarded
    (fixed-point latitude iteration, <1e-12 rad at crustal heights)."""
    X = np.asarray(X, dtype="float64")
    Y = np.asarray(Y, dtype="float64")
    Z = np.asarray(Z, dtype="float64")
    e2 = 2.0 * f - f * f
    p = np.sqrt(X * X + Y * Y)
    phi = np.arctan2(Z, p * (1.0 - e2))
    for _ in range(10):
        nu = a / np.sqrt(1.0 - e2 * np.sin(phi) ** 2)
        phi = np.arctan2(Z + e2 * nu * np.sin(phi), p)
    return np.degrees(np.arctan2(Y, X)), np.degrees(phi)


def helmert_transform(X, Y, Z, tx: float, ty: float, tz: float,
                      rx_sec: float, ry_sec: float, rz_sec: float,
                      s_ppm: float):
    """7-parameter Helmert, POSITION VECTOR convention (EPSG 9606):
    rotations in arc-seconds, scale in ppm.
        X' = tx + (1+s)(   X - rz*Y + ry*Z)
        Y' = ty + (1+s)( rz*X +   Y - rx*Z)
        Z' = tz + (1+s)(-ry*X + rx*Y +   Z)
    """
    sec = np.pi / (180.0 * 3600.0)
    rx, ry, rz = rx_sec * sec, ry_sec * sec, rz_sec * sec
    m = 1.0 + s_ppm * 1e-6
    X = np.asarray(X, dtype="float64")
    Y = np.asarray(Y, dtype="float64")
    Z = np.asarray(Z, dtype="float64")
    return (
        tx + m * (X - rz * Y + ry * Z),
        ty + m * (rz * X + Y - rx * Z),
        tz + m * (-ry * X + rx * Y + Z),
    )


# Airy 1830 (the OSGB36 ellipsoid) and the published WGS84 -> OSGB36
# small-Helmert (OS "A guide to coordinate systems in Great Britain",
# position vector; ~3.5 m national accuracy by construction — the
# transform's own published uncertainty, not an implementation limit)
AIRY_A = 6377563.396
AIRY_F = 1.0 / 299.3249646
_WGS84_TO_OSGB36 = dict(
    tx=-446.448, ty=125.157, tz=-542.060,
    rx_sec=-0.1502, ry_sec=-0.2470, rz_sec=-0.8421, s_ppm=20.4894,
)
# EPSG 27700 projection constants (TM, natural origin 49N 2W)
_BNG = dict(lat0_deg=49.0, lon0_deg=-2.0, k0=0.9996012717,
            fe=400_000.0, fn=-100_000.0, a=AIRY_A, f=AIRY_F)


def bng_forward(lon_deg, lat_deg):
    """EPSG:4326 -> EPSG:27700 (British National Grid): WGS84
    geodetic -> geocentric -> Helmert -> OSGB36 geodetic (Airy) ->
    transverse Mercator. The TM-on-Airy leg matches the OS worked
    example to the millimetre (tests/test_crs.py); end-to-end
    accuracy is bounded by the published Helmert's own ~3.5 m."""
    X, Y, Z = geodetic_to_geocentric(lon_deg, lat_deg, WGS84_A, WGS84_F)
    X, Y, Z = helmert_transform(X, Y, Z, **_WGS84_TO_OSGB36)
    lon, lat = geocentric_to_geodetic(X, Y, Z, AIRY_A, AIRY_F)
    return tm_forward(lon, lat, **_BNG)


def bng_inverse(e_m, n_m):
    """EPSG:27700 -> EPSG:4326. The inverse Helmert uses negated
    parameters — exact only to second order (residual ~ s*t ~ 1 cm),
    the standard convention and far inside the transform's own
    ~3.5 m published accuracy."""
    lon, lat = tm_inverse(e_m, n_m, **_BNG)
    X, Y, Z = geodetic_to_geocentric(lon, lat, AIRY_A, AIRY_F)
    neg = {k: -v for k, v in _WGS84_TO_OSGB36.items()}
    X, Y, Z = helmert_transform(X, Y, Z, **neg)
    return geocentric_to_geodetic(X, Y, Z, WGS84_A, WGS84_F)


# register the late-defined kernels with the parameter dispatchers
_PROJ_FWD["tm"] = tm_forward
_PROJ_INV["tm"] = tm_inverse
_PROJ_FWD["bng"] = _no_params(bng_forward, "bng")
_PROJ_INV["bng"] = _no_params(bng_inverse, "bng")
