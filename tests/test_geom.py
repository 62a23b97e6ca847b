import numpy as np

from earth_data_kit_spark.grid import geom


def test_haversine_known_values():
    # London -> Paris ≈ 343.5 km (public fact, mean-sphere)
    d = geom.haversine_m(51.5074, -0.1278, 48.8566, 2.3522)
    assert 340_000 < float(d) < 348_000
    assert float(geom.haversine_m(0, 0, 0, 0)) == 0.0
    # one degree of longitude at the equator ≈ 111.19 km on R=6371km
    d1 = float(geom.haversine_m(0, 0, 0, 1))
    assert abs(d1 - 6371000.0 * np.pi / 180.0) < 1.0


def test_pip_square():
    square = np.array([(0, 0), (10, 0), (10, 10), (0, 10)], dtype=float)
    lons = np.array([5.0, 15.0, -1.0, 9.999, 5.0])
    lats = np.array([5.0, 5.0, 5.0, 9.999, 15.0])
    assert geom.point_in_ring(lons, lats, square).tolist() == [True, False, False, True, False]


def test_pip_concave():
    # concave "C" shape: points in the notch are outside
    c = np.array(
        [(0, 0), (10, 0), (10, 3), (3, 3), (3, 7), (10, 7), (10, 10), (0, 10)],
        dtype=float,
    )
    lons = np.array([1.0, 5.0, 5.0])
    lats = np.array([5.0, 5.0, 1.0])
    assert geom.point_in_ring(lons, lats, c).tolist() == [True, False, True]


def test_pip_with_hole():
    shell = np.array([(0, 0), (10, 0), (10, 10), (0, 10)], dtype=float)
    hole = np.array([(4, 4), (6, 4), (6, 6), (4, 6)], dtype=float)
    lons = np.array([5.0, 2.0])
    lats = np.array([5.0, 2.0])
    assert geom.point_in_polygon(lons, lats, shell, [hole]).tolist() == [False, True]


def test_wkt_parse():
    shell, holes = geom.parse_wkt_polygon(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
    )
    assert shell.shape == (5, 2)
    assert len(holes) == 1
    assert geom.polygon_bbox(shell) == (0.0, 0.0, 10.0, 10.0)


def test_bbox_intersects():
    assert bool(geom.bbox_intersects(0, 0, 10, 10, 5, 5, 15, 15))
    assert not bool(geom.bbox_intersects(0, 0, 10, 10, 11, 11, 15, 15))
    # touching edges count as intersecting (reference shapely semantics)
    assert bool(geom.bbox_intersects(0, 0, 10, 10, 10, 10, 15, 15))
