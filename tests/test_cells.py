import numpy as np
import pytest

from earth_data_kit_spark.grid import cells


def test_cell_roundtrip():
    lons = np.array([-180.0, -90.5, 0.0, 19.82, 179.999, 180.0])
    lats = np.array([-90.0, -45.2, 0.0, 41.33, 89.999, 90.0])
    for res in (0, 3, 7, 15, 28):
        cid = cells.cell_id(lons, lats, res)
        r, x, y = cells.decode(cid)
        assert (r == res).all()
        nx, ny = cells.nx_ny(res)
        assert (x >= 0).all() and (x < nx).all()
        assert (y >= 0).all() and (y < ny).all()
        # centroid maps back to the same cell
        clon, clat = cells.cell_centroid(cid)
        assert (cells.cell_id(clon, clat, res) == cid).all()


def test_point_in_own_cell_bounds():
    cid = cells.cell_id_single(19.82, 41.33, 9)
    w, s, e, n = cells.cell_bounds(cid)
    assert w <= 19.82 < e
    assert s < 41.33 <= n


def test_parent_child():
    cid = cells.cell_id_single(19.82, 41.33, 9)
    p = int(cells.parent(np.array([cid]))[0])
    assert cid in cells.children(p)
    # parent at res 5 contains the point too
    p5 = int(cells.parent(np.array([cid]), 5)[0])
    assert p5 == cells.cell_id_single(19.82, 41.33, 5)


def test_k_ring_size_and_wrap():
    cid = cells.cell_id_single(0.0, 0.0, 5)
    ring1 = cells.k_ring(cid, 1)
    assert len(ring1) == 9 and cid in ring1
    # antimeridian wrap: ring around lon=180 edge cell
    edge = cells.cell_id_single(179.99, 0.0, 5)
    ring = cells.k_ring(edge, 1)
    assert len(ring) == 9
    wrapped = cells.cell_id_single(-179.99, 0.0, 5)
    assert wrapped in ring
    # pole clamp: top row has no row above
    top = cells.cell_id_single(0.0, 89.99, 5)
    assert len(cells.k_ring(top, 1)) == 6


def test_covering_bbox():
    cov = cells.covering_bbox(19.3, 39.6, 21.1, 42.7, 7)
    # every covering cell's bounds intersect the bbox
    for c in cov:
        w, s, e, n = cells.cell_bounds(c)
        assert w <= 21.1 and e >= 19.3 and s <= 42.7 and n >= 39.6
    # the centroid cell of the box is inside the covering
    assert cells.cell_id_single(20.0, 41.0, 7) in cov
    # antimeridian-crossing box
    cov2 = cells.covering_bbox(179.0, -1.0, -179.0, 1.0, 7)
    assert cells.cell_id_single(179.9, 0.0, 7) in cov2
    assert cells.cell_id_single(-179.9, 0.0, 7) in cov2


def test_zorder_locality_and_parent():
    lons = np.array([10.0, 10.001, 50.0])
    lats = np.array([20.0, 20.001, -30.0])
    z = cells.zorder_id(lons, lats, 20)
    # near points are near in z-order; far point is far
    assert abs(z[0] - z[1]) < abs(z[0] - z[2])
    r, x, y = cells.zorder_decode(z)
    qx, qy = cells.cell_xy(lons, lats, 20)
    assert (x == qx).all() and (y == qy).all()
    zp = cells.zorder_parent(z)
    rp, xp, yp = cells.zorder_decode(zp)
    assert (rp == 19).all()
    assert (xp == qx >> 1).all() and (yp == qy >> 1).all()


def test_res_bounds():
    with pytest.raises(ValueError):
        cells.nx_ny(29)
    with pytest.raises(ValueError):
        cells.nx_ny(-1)
