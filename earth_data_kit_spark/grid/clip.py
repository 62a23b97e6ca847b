"""Exact polygon-polygon intersection area, pure numpy/stdlib.

The geometric core of ``operators.overlay.overlay_join`` (the
polygon×polygon twin of the flagship point-in-polygon join; the
reference has no overlay at all — its only join is J1's
points×polygons, /root/reference/earth_data_kit/stitching/classes/
dataset.py:252-274 — so this surface is beyond-reference).

Algorithm (public textbook material):

* convex clip ring  → one Sutherland–Hodgman pass, shoelace area.
* general clip ring → horizontal band decomposition: slice the ring
  at every vertex latitude; inside each band the even-odd interior
  is a set of TRAPEZOIDS (edges cannot cross inside a band because
  band boundaries sit on vertex ys), each trapezoid is convex, so
  ``area(A ∩ B) = Σ_t area(A ∩ t)`` with one S–H pass per trapezoid.
  Exact for any simple ring, O(bands × (V_A + V_B)).
* holes → inclusion–exclusion over ring pairs: for valid polygons
  (holes inside shell, pairwise disjoint)
  ``area(P ∩ Q) = Σ_i Σ_j s_i s_j · area(ring_i ∩ ring_j)`` where
  shells carry sign +1 and holes −1.

Areas are planar (degrees² in lon/lat space) — the same convention
as ``rasterize``/``zonal`` pixel math; reproject first for metric
areas.
"""

from __future__ import annotations

import numpy as np

from earth_data_kit_spark.grid.geom import parse_wkt_polygon

__all__ = [
    "ring_signed_area",
    "normalize_ring",
    "is_convex_ring",
    "clip_convex",
    "trapezoid_bands",
    "ring_intersection_area",
    "polygon_intersection_area",
    "wkt_intersection_area",
    "rect_ring",
]


def ring_signed_area(ring: np.ndarray) -> float:
    """Shoelace signed area; positive for counter-clockwise rings."""
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def normalize_ring(ring: np.ndarray) -> np.ndarray:
    """Open (drop duplicated closing vertex), counter-clockwise."""
    ring = np.asarray(ring, dtype=np.float64)
    if len(ring) >= 2 and np.array_equal(ring[0], ring[-1]):
        ring = ring[:-1]
    if ring_signed_area(ring) < 0:
        ring = ring[::-1]
    return ring


def is_convex_ring(ring: np.ndarray) -> bool:
    """True iff the (normalized CCW) ring turns one way at every
    vertex (collinear vertices allowed)."""
    a = ring
    b = np.roll(a, -1, axis=0)
    c = np.roll(a, -2, axis=0)
    cross = (b[:, 0] - a[:, 0]) * (c[:, 1] - b[:, 1]) - (
        b[:, 1] - a[:, 1]
    ) * (c[:, 0] - b[:, 0])
    return bool(np.all(cross >= -1e-12))


def clip_convex(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman: clip ``subject`` (any simple ring) by a
    CONVEX CCW ``clip`` ring.  Returns the clipped vertex ring
    ((0,2) when empty).  Both inputs open rings."""
    out = subject
    n = len(clip)
    for i in range(n):
        if len(out) == 0:
            break
        ax, ay = clip[i]
        bx, by = clip[(i + 1) % n]
        # inside = left of directed edge a→b (CCW ⇒ interior side)
        ex, ey = bx - ax, by - ay
        px, py = out[:, 0], out[:, 1]
        side = ex * (py - ay) - ey * (px - ax)
        inside = side >= 0.0
        nxt_in = np.roll(inside, -1)
        qx, qy = np.roll(px, -1), np.roll(py, -1)
        # parametric intersection of each edge with the clip line
        denom = side - np.roll(side, -1)
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(denom != 0.0, side / denom, 0.0)
        ix = px + t * (qx - px)
        iy = py + t * (qy - py)
        verts = []
        for j in range(len(out)):
            if inside[j]:
                verts.append((px[j], py[j]))
                if not nxt_in[j]:
                    verts.append((ix[j], iy[j]))
            elif nxt_in[j]:
                verts.append((ix[j], iy[j]))
        out = (
            np.array(verts, dtype=np.float64)
            if verts
            else np.empty((0, 2), dtype=np.float64)
        )
    return out


def trapezoid_bands(ring: np.ndarray):
    """Decompose a simple CCW ring's even-odd interior into convex
    trapezoids by slicing at every vertex latitude.  Yields (4, 2)
    CCW quads; degenerate zero-height/width pieces are skipped."""
    ys = np.unique(ring[:, 1])
    a = ring
    b = np.roll(a, -1, axis=0)
    for y0, y1 in zip(ys[:-1], ys[1:]):
        if y1 <= y0:
            continue
        lo = np.minimum(a[:, 1], b[:, 1])
        hi = np.maximum(a[:, 1], b[:, 1])
        span = (lo <= y0) & (hi >= y1)  # band bounds sit on vertex ys
        if not span.any():
            continue
        ea, eb = a[span], b[span]
        dy = eb[:, 1] - ea[:, 1]
        x0 = ea[:, 0] + (eb[:, 0] - ea[:, 0]) * (y0 - ea[:, 1]) / dy
        x1 = ea[:, 0] + (eb[:, 0] - ea[:, 0]) * (y1 - ea[:, 1]) / dy
        order = np.argsort((x0 + x1) * 0.5, kind="stable")
        x0, x1 = x0[order], x1[order]
        for j in range(0, len(x0) - 1, 2):  # even-odd pairing
            # per-level min/max: at a pinch vertex the two segments'
            # interpolated xs can land ~1ulp apart in REVERSED order,
            # turning the quad into a micro-bowtie that silently
            # breaks Sutherland–Hodgman (found by the seed-2
            # Monte-Carlo property test)
            xl0, xr0 = min(x0[j], x0[j + 1]), max(x0[j], x0[j + 1])
            xl1, xr1 = min(x1[j], x1[j + 1]), max(x1[j], x1[j + 1])
            if xr0 - xl0 <= 0.0 and xr1 - xl1 <= 0.0:
                continue
            yield np.array(
                [(xl0, y0), (xr0, y0), (xr1, y1), (xl1, y1)],
                dtype=np.float64,
            )


def ring_intersection_area(ring_a: np.ndarray, ring_b: np.ndarray) -> float:
    """Exact area of the even-odd intersection of two simple rings
    (raw vertex arrays; normalized internally)."""
    ring_a = normalize_ring(ring_a)
    ring_b = normalize_ring(ring_b)
    if len(ring_a) < 3 or len(ring_b) < 3:
        return 0.0
    # cheap bbox reject
    if (
        ring_a[:, 0].max() <= ring_b[:, 0].min()
        or ring_b[:, 0].max() <= ring_a[:, 0].min()
        or ring_a[:, 1].max() <= ring_b[:, 1].min()
        or ring_b[:, 1].max() <= ring_a[:, 1].min()
    ):
        return 0.0
    # use the convex ring as the S–H clipper when there is one
    if is_convex_ring(ring_b):
        return abs(ring_signed_area_or_zero(clip_convex(ring_a, ring_b)))
    if is_convex_ring(ring_a):
        return abs(ring_signed_area_or_zero(clip_convex(ring_b, ring_a)))
    total = 0.0
    for trap in trapezoid_bands(ring_b):
        total += abs(ring_signed_area_or_zero(clip_convex(ring_a, trap)))
    return total


def ring_signed_area_or_zero(ring: np.ndarray) -> float:
    return ring_signed_area(ring) if len(ring) >= 3 else 0.0


def polygon_intersection_area(
    shell_a: np.ndarray,
    holes_a: list[np.ndarray],
    shell_b: np.ndarray,
    holes_b: list[np.ndarray],
) -> float:
    """Inclusion–exclusion over (shell|hole) ring pairs — exact for
    valid polygons (holes inside shell, holes pairwise disjoint)."""
    rings_a = [(shell_a, 1.0)] + [(h, -1.0) for h in holes_a]
    rings_b = [(shell_b, 1.0)] + [(h, -1.0) for h in holes_b]
    total = 0.0
    for ra, sa in rings_a:
        for rb, sb in rings_b:
            area = ring_intersection_area(ra, rb)
            if area:
                total += sa * sb * area
    return max(total, 0.0)


def rect_ring(xmin: float, ymin: float, xmax: float, ymax: float) -> np.ndarray:
    return np.array(
        [(xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax)],
        dtype=np.float64,
    )


def wkt_intersection_area(wkt_a: str, wkt_b: str) -> float:
    """Parse two WKT POLYGONs and intersect (test/oracle helper; the
    Spark path batches parses in ``functions.udfs.overlay_area_udf``)."""
    sa, ha = parse_wkt_polygon(wkt_a)
    sb, hb = parse_wkt_polygon(wkt_b)
    return polygon_intersection_area(sa, ha, sb, hb)
