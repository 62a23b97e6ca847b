"""Geocoding web pages → (lat, lon): ccTLD centroid, URL and content
coordinates (north_star: "URL/ccTLD/content-derived coordinates").

Priority order (first hit wins), mirrored exactly by the SQL
expression in functions/columns.py so the DuckDB oracle agrees:
  1. explicit ``lat,lon`` pair in the URL path (``/@41.33,19.82`` or
     ``/geo/41.33,19.82``)
  2. ``geo: <lat>, <lon>`` marker in the page text
  3. ccTLD centroid of the url host's public suffix

Centroids are round numbers near each country's center (synthetic —
the pages table is synthetic too; what matters is determinism and a
realistic skew profile, not gazetteer accuracy).
"""

from __future__ import annotations

import re

# tld -> (lat, lon, lang) — small deterministic gazetteer
CCTLD_CENTROIDS: dict[str, tuple[float, float, str]] = {
    "al": (41.0, 20.0, "sq"),
    "in": (21.0, 78.5, "hi"),
    "de": (51.0, 10.5, "de"),
    "fr": (47.0, 2.5, "fr"),
    "it": (42.5, 12.5, "it"),
    "gr": (39.0, 22.0, "el"),
    "es": (40.0, -3.5, "es"),
    "uk": (54.0, -2.0, "en"),
    "us": (39.5, -98.5, "en"),
    "br": (-10.0, -52.0, "pt"),
    "au": (-25.0, 134.0, "en"),
    "jp": (36.0, 138.0, "ja"),
    "cn": (35.0, 103.0, "zh"),
    "za": (-29.0, 24.0, "en"),
    "ar": (-34.0, -64.0, "es"),
    "eg": (26.5, 29.5, "ar"),
    "ru": (60.0, 90.0, "ru"),
    "ca": (56.0, -106.0, "en"),
    "mx": (23.5, -102.0, "es"),
    "id": (-2.5, 118.0, "id"),
}

_URL_COORD = re.compile(r"/@(-?\d+(?:\.\d+)?),(-?\d+(?:\.\d+)?)")
_TEXT_COORD = re.compile(r"geo:\s*(-?\d+(?:\.\d+)?),\s*(-?\d+(?:\.\d+)?)")
_TLD = re.compile(r"^[a-z]+://[^/]*\.([a-z]{2,3})(?:[:/]|$)")


def geocode(url: str, text: str) -> tuple[float | None, float | None, str]:
    """Returns (lat, lon, method) with method in
    {'url', 'content', 'cctld', 'none'}."""
    m = _URL_COORD.search(url)
    if m:
        lat, lon = float(m.group(1)), float(m.group(2))
        if -90.0 <= lat <= 90.0 and -180.0 <= lon <= 180.0:
            return lat, lon, "url"
    m = _TEXT_COORD.search(text or "")
    if m:
        lat, lon = float(m.group(1)), float(m.group(2))
        if -90.0 <= lat <= 90.0 and -180.0 <= lon <= 180.0:
            return lat, lon, "content"
    m = _TLD.match(url)
    if m and m.group(1) in CCTLD_CENTROIDS:
        lat, lon, _ = CCTLD_CENTROIDS[m.group(1)]
        return lat, lon, "cctld"
    return None, None, "none"
