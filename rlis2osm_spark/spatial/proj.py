"""EPSG:2913 (NAD83(HARN) / Oregon North, international feet) <-> WGS84.

The reference produces its final artifact through ``ogr2osm ... -e 2913``
(reference main.py:253), i.e. the RLIS projected coordinates are
reprojected to geographic lat/lon before the .osm is written.  This module
implements that transform from the published EPSG parameters and the
standard Lambert Conformal Conic (2SP) equations (Snyder, "Map
Projections — A Working Manual", USGS PP 1395, eqs. 15-1..15-11) so the
sink can emit valid OSM XML without a GDAL dependency.

NAD83(HARN) -> WGS84 datum shift is sub-metre and treated as identity,
same as common GIS practice for this CRS pair.

Everything is vectorized numpy — the sink calls it once per Arrow batch.
"""

from __future__ import annotations

import numpy as np

# GRS80 ellipsoid
_A = 6378137.0
_F = 1.0 / 298.257222101
_E2 = _F * (2.0 - _F)
_E = np.sqrt(_E2)

# EPSG:2913 projection parameters (EPSG registry)
_LAT1 = np.radians(46.0)                  # standard parallel 1
_LAT2 = np.radians(44.0 + 20.0 / 60.0)    # standard parallel 2
_LAT0 = np.radians(43.0 + 40.0 / 60.0)    # latitude of false origin
_LON0 = np.radians(-120.5)                # central meridian
_FE_M = 2500000.0                         # false easting (metres)
_FN_M = 0.0
_FT = 0.3048                              # international foot, exact


def _m(phi: np.ndarray) -> np.ndarray:
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1.0 - _E2 * s * s)


def _t(phi: np.ndarray) -> np.ndarray:
    s = _E * np.sin(phi)
    return np.tan(np.pi / 4.0 - phi / 2.0) / ((1.0 - s) / (1.0 + s)) ** (_E / 2.0)


_N = (np.log(_m(_LAT1)) - np.log(_m(_LAT2))) / (np.log(_t(_LAT1)) - np.log(_t(_LAT2)))
_BIG_F = _m(_LAT1) / (_N * _t(_LAT1) ** _N)
_RHO0 = _A * _BIG_F * _t(_LAT0) ** _N


def feet_to_lonlat(x_ft, y_ft):
    """EPSG:2913 easting/northing (international feet) -> (lon, lat) degrees."""
    x = np.asarray(x_ft, dtype=np.float64) * _FT - _FE_M
    y = np.asarray(y_ft, dtype=np.float64) * _FT - _FN_M
    rho = np.sign(_N) * np.hypot(x, _RHO0 - y)
    t = (rho / (_A * _BIG_F)) ** (1.0 / _N)
    theta = np.arctan2(x, _RHO0 - y)
    lon = theta / _N + _LON0
    # iterate the isometric-latitude inversion (converges in ~4 rounds)
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(8):
        s = _E * np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - s) / (1.0 + s)) ** (_E / 2.0))
    return np.degrees(lon), np.degrees(phi)


def lonlat_to_feet(lon_deg, lat_deg):
    """(lon, lat) degrees -> EPSG:2913 easting/northing in feet (for tests)."""
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    rho = _A * _BIG_F * _t(lat) ** _N
    theta = _N * (lon - _LON0)
    x = rho * np.sin(theta) + _FE_M
    y = _RHO0 - rho * np.cos(theta) + _FN_M
    return x / _FT, y / _FT
