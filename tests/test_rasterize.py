"""Rasterize (operators/rasterize.py): burned arrays vs independent
numpy oracles, overwrite order, nodata fill, and composition with
zonal_stats and the COG sink/source roundtrip."""

import numpy as np
import pytest

from earth_data_kit_spark.operators.rasterize import rasterize
from earth_data_kit_spark.operators.spatial_join import Polygon

GT = (10.0, 0.1, 0.0, 50.0, 0.0, -0.1)
W, H = 300, 260


def _grids(w=W, h=H):
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    lon = GT[0] + (x + 0.5) * GT[1]
    lat = GT[3] + (y + 0.5) * GT[5]
    return lon, lat


def _assemble(rows, w=W, h=H, dtype=np.int16):
    out = np.full((h, w), -99, dtype=dtype)
    for r in rows:
        a = np.frombuffer(r["payload"], dtype=dtype).reshape(r["ysize"], r["xsize"])
        out[r["yoff"]: r["yoff"] + r["ysize"], r["xoff"]: r["xoff"] + r["xsize"]] = a
    return out


def test_rect_burn_and_nodata_fill(spark):
    polys = [Polygon("A", "a", bbox=(12.03, 41.02, 20.57, 45.49))]
    rows = [r.asDict() for r in rasterize(spark, polys, GT, W, H, block=128).collect()]
    # full grid coverage: ceil(300/128) * ceil(260/128) blocks
    assert len(rows) == 3 * 3
    arr = _assemble(rows)
    lon, lat = _grids()
    exp = np.zeros((H, W), dtype=np.int16)
    exp[(lon >= 12.03) & (lon <= 20.57) & (lat >= 41.02) & (lat <= 45.49)] = 1
    np.testing.assert_array_equal(arr, exp)


def test_overwrite_order_and_values(spark):
    polys = [
        Polygon("A", "a", bbox=(11.0, 42.0, 18.0, 48.0)),
        Polygon("B", "b", bbox=(14.0, 44.0, 16.0, 46.0)),  # inside A, wins
    ]
    rows = [
        r.asDict()
        for r in rasterize(
            spark, polys, GT, W, H, block=128, values={"A": 7.0, "B": 9.0}
        ).collect()
    ]
    arr = _assemble(rows)
    lon, lat = _grids()
    in_a = (lon >= 11.0) & (lon <= 18.0) & (lat >= 42.0) & (lat <= 48.0)
    in_b = (lon >= 14.0) & (lon <= 16.0) & (lat >= 44.0) & (lat <= 46.0)
    exp = np.zeros((H, W), dtype=np.int16)
    exp[in_a] = 7
    exp[in_b] = 9
    np.testing.assert_array_equal(arr, exp)


def test_triangle_wkt_burn(spark):
    tri = [(11.03, 44.97), (14.57, 49.13), (16.01, 41.02)]
    wkt = "POLYGON ((" + ", ".join(f"{a} {b}" for a, b in tri + [tri[0]]) + "))"
    rows = [
        r.asDict()
        for r in rasterize(spark, [Polygon("T", "t", wkt=wkt)], GT, W, H).collect()
    ]
    arr = _assemble(rows)
    lon, lat = _grids()

    def halfplane(px, py):
        signs = []
        for i in range(3):
            (x1, y1), (x2, y2) = tri[i], tri[(i + 1) % 3]
            signs.append((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1) > 0)
        return (signs[0] == signs[1]) & (signs[1] == signs[2])

    exp = halfplane(lon, lat).astype(np.int16)
    np.testing.assert_array_equal(arr, exp)


def test_composes_with_zonal_and_cog_roundtrip(spark, tmp_path):
    """rasterize → zonal_stats recovers the burn; rasterize →
    export_cog → cog_scan is pixel-identical."""
    from earth_data_kit_spark.operators.gtiff import export_cog
    from earth_data_kit_spark.operators.zonal import zonal_stats
    from earth_data_kit_spark.sources.cog import cog_scan

    bbox = (12.03, 41.02, 20.57, 45.49)
    polys = [Polygon("A", "a", bbox=bbox)]
    blocks = rasterize(spark, polys, GT, W, H, block=128, nodata=0.0)
    # zonal mean of the burn over its own polygon is exactly 1
    z = {r["code"]: r.asDict() for r in zonal_stats(blocks, polys, GT).collect()}
    lon, lat = _grids()
    n_in = int(
        ((lon >= bbox[0]) & (lon <= bbox[2]) & (lat >= bbox[1]) & (lat <= bbox[3])).sum()
    )
    # nodata == 0 burns are excluded by the nodata mask; every
    # surviving pixel inside the polygon carries the burn value
    assert z["A"]["n_px"] == n_in
    assert z["A"]["mean_v"] == pytest.approx(1.0)
    assert z["A"]["std_v"] == pytest.approx(0.0)

    p = str(tmp_path / "burn.tif")
    export_cog(blocks, p, W, H, tile=128, gt=GT, compression="deflate")
    back = [r.asDict() for r in cog_scan(spark, p).collect()]
    np.testing.assert_array_equal(_assemble(back), _assemble([r.asDict() for r in blocks.collect()]))
