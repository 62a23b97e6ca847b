"""grid.clip numpy core: exact polygon∩polygon areas.

Closed-form rectangle/decomposition oracles plus a Monte-Carlo
cross-check on random star-shaped (generally concave) rings.
"""

import numpy as np
import pytest

from earth_data_kit_spark.grid import clip as C
from earth_data_kit_spark.grid.geom import point_in_polygon


def mc_area(ra, ha, rb, hb, n=200_000, seed=11):
    rng = np.random.RandomState(seed)
    xs = np.concatenate([ra[:, 0], rb[:, 0]])
    ys = np.concatenate([ra[:, 1], rb[:, 1]])
    x0, x1, y0, y1 = xs.min(), xs.max(), ys.min(), ys.max()
    px = rng.uniform(x0, x1, n)
    py = rng.uniform(y0, y1, n)
    m = point_in_polygon(px, py, ra, ha) & point_in_polygon(px, py, rb, hb)
    return m.mean() * (x1 - x0) * (y1 - y0)


def star(rng, cx, cy, n=11, lo=2.0, hi=9.0):
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = rng.uniform(lo, hi, n)
    return np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])


def test_rect_rect():
    assert C.ring_intersection_area(
        C.rect_ring(0, 0, 10, 10), C.rect_ring(5, 5, 20, 20)
    ) == 25.0


def test_disjoint_and_touching():
    a = C.rect_ring(0, 0, 1, 1)
    assert C.ring_intersection_area(a, C.rect_ring(2, 2, 3, 3)) == 0.0
    assert C.ring_intersection_area(a, C.rect_ring(1, 0, 2, 1)) == 0.0


def test_containment():
    outer = C.rect_ring(0, 0, 10, 10)
    inner = C.rect_ring(2, 2, 4, 5)
    assert C.ring_intersection_area(outer, inner) == pytest.approx(6.0)
    assert C.ring_intersection_area(inner, outer) == pytest.approx(6.0)


def test_concave_disconnected_intersection():
    # U-shape ∩ horizontal bar → TWO disjoint squares; S–H bridge
    # edges must cancel in the shoelace sum
    u = np.array(
        [(0, 0), (2, 0), (2, 8), (4, 8), (4, 0), (6, 0), (6, 10), (0, 10)],
        dtype=np.float64,
    )
    bar = C.rect_ring(-1, 2, 7, 4)
    assert C.ring_intersection_area(u, bar) == pytest.approx(8.0)
    assert C.ring_intersection_area(bar, u) == pytest.approx(8.0)


def test_orientation_and_closure_insensitive():
    a = C.rect_ring(0, 0, 10, 10)
    b = C.rect_ring(5, 5, 20, 20)[::-1]  # clockwise
    b_closed = np.vstack([b, b[:1]])  # explicitly closed
    assert C.ring_intersection_area(a, b_closed) == 25.0


def test_holes_inclusion_exclusion():
    shell_a = C.rect_ring(0, 0, 10, 10)
    holes_a = [C.rect_ring(2, 2, 4, 4)]
    shell_b = C.rect_ring(1, 1, 8, 8)
    holes_b = [C.rect_ring(5, 5, 7, 7)]
    got = C.polygon_intersection_area(shell_a, holes_a, shell_b, holes_b)
    # (7×7) − hole_a∩B (2×2) − hole_b∩A (2×2)
    assert got == pytest.approx(49.0 - 4.0 - 4.0)


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
def test_random_concave_pairs_vs_monte_carlo(seed):
    rng = np.random.RandomState(seed)
    a = star(rng, 0.0, 0.0)
    b = star(rng, rng.uniform(-4, 4), rng.uniform(-4, 4))
    exact = C.ring_intersection_area(a, b)
    approx = mc_area(a, [], b, [])
    assert exact == pytest.approx(approx, abs=0.35)
    # symmetric: decomposing the other ring must agree tightly
    assert C.ring_intersection_area(b, a) == pytest.approx(exact, rel=1e-9)


def test_trapezoid_bands_tile_exactly():
    rng = np.random.RandomState(9)
    ring = C.normalize_ring(star(rng, 0, 0, n=15))
    total = sum(abs(C.ring_signed_area(t)) for t in C.trapezoid_bands(ring))
    assert total == pytest.approx(abs(C.ring_signed_area(ring)), rel=1e-12)
