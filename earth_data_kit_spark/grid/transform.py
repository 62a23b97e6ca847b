"""Coordinate transforms (no pyproj in sandbox — public formulas only).

Implements the projections the reference fixtures use:
* MODIS sinusoidal on the custom sphere R=6371007.181 (golden VRT SRS,
  /root/reference/tests/fixtures/goldens/s3-grid-file.tar);
* EPSG:3857 Web Mercator (gee-no-time-dim test warps to 3857 at 5 m,
  /root/reference/tests/stitching/earth_engine/test_no_time_dim.py);
* EPSG:4326 identity.

Reference analog: utilities/transform.py:8-87 transforms points one
by one through pyproj with pinned axis order (x=lon, y=lat); here the
same operation is a vectorized numpy batch (SURVEY.md F4).
"""

from __future__ import annotations

import numpy as np

MODIS_SPHERE_R = 6371007.181
WEB_MERCATOR_A = 6378137.0

SINUSOIDAL = "sinusoidal"
WEB_MERCATOR = "EPSG:3857"
LONLAT = "EPSG:4326"


def sinusoidal_forward(lon, lat, radius: float = MODIS_SPHERE_R):
    """lon/lat degrees → sinusoidal x/y meters (vectorized)."""
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    return radius * lon * np.cos(lat), radius * lat


def sinusoidal_inverse(x, y, radius: float = MODIS_SPHERE_R):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lat = y / radius
    with np.errstate(divide="ignore", invalid="ignore"):
        lon = np.where(np.abs(np.cos(lat)) > 1e-12, x / (radius * np.cos(lat)), 0.0)
    return np.degrees(lon), np.degrees(lat)


def mercator_forward(lon, lat, a: float = WEB_MERCATOR_A):
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    return a * lon, a * np.log(np.tan(np.pi / 4.0 + lat / 2.0))


def mercator_inverse(x, y, a: float = WEB_MERCATOR_A):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    return np.degrees(x / a), np.degrees(2.0 * np.arctan(np.exp(y / a)) - np.pi / 2.0)


_FORWARD = {
    SINUSOIDAL: sinusoidal_forward,
    WEB_MERCATOR: mercator_forward,
    LONLAT: lambda lon, lat: (np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64)),
}
_INVERSE = {
    SINUSOIDAL: sinusoidal_inverse,
    WEB_MERCATOR: mercator_inverse,
    LONLAT: lambda x, y: (np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)),
}


def forward(crs: str, lon, lat):
    try:
        return _FORWARD[crs](lon, lat)
    except KeyError:
        raise ValueError(f"unsupported CRS {crs!r} (have {sorted(_FORWARD)})") from None


def inverse(crs: str, x, y):
    try:
        return _INVERSE[crs](x, y)
    except KeyError:
        raise ValueError(f"unsupported CRS {crs!r} (have {sorted(_INVERSE)})") from None


def transform_bbox_to_lonlat(crs: str, xmin, ymin, xmax, ymax):
    """4-corner transform → lon/lat bbox (reference P1 semantics:
    classes/tile.py:119-180 transforms the 4 corners and takes the
    envelope — exact only for projections monotone over the tile,
    which holds for the fixture tiles; the reference's warp fallback
    for inf corners is out of scope)."""
    cx = np.array([xmin, xmax, xmin, xmax], dtype=np.float64)
    cy = np.array([ymin, ymin, ymax, ymax], dtype=np.float64)
    lon, lat = inverse(crs, cx, cy)
    return float(lon.min()), float(lat.min()), float(lon.max()), float(lat.max())


def transform_bbox_from_lonlat(crs: str, xmin, ymin, xmax, ymax):
    """lon/lat bbox → 4-corner envelope in target CRS."""
    lon = np.array([xmin, xmax, xmin, xmax], dtype=np.float64)
    lat = np.array([ymin, ymin, ymax, ymax], dtype=np.float64)
    x, y = forward(crs, lon, lat)
    return float(x.min()), float(y.min()), float(x.max()), float(y.max())
