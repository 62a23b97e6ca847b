"""Golden-pinned affine math (values from the reference's golden VRT
archive /root/reference/tests/fixtures/goldens/s3-grid-file.tar —
quoted in FIXTURES.md §B/§E)."""

import numpy as np

from earth_data_kit_spark.grid import affine, transform

# MODIS h19v04 / h19v05 golden geotransforms
GT_H19V04 = (1111950.5196670, 463.3127165274999, 0.0, 5559752.5983330, 0.0, -463.3127165277084)
TILE = 2400
GT_H19V05 = (
    GT_H19V04[0],
    GT_H19V04[1],
    0.0,
    GT_H19V04[3] + GT_H19V04[5] * TILE,
    0.0,
    GT_H19V04[5],
)
ALBANIA = (19.3044861183, 39.624997667, 21.0200403175, 42.6882473822)


def test_extent_from_geotransform():
    xmin, ymin, xmax, ymax = affine.extent_from_geotransform(GT_H19V04, TILE, TILE)
    assert xmin == GT_H19V04[0]
    assert ymax == GT_H19V04[3]
    assert np.isclose(xmax - xmin, 463.3127165274999 * 2400)


def test_mosaic_assignment_matches_golden_vrt():
    e1 = affine.extent_from_geotransform(GT_H19V04, TILE, TILE)
    e2 = affine.extent_from_geotransform(GT_H19V05, TILE, TILE)
    union = affine.mosaic_extent([e1, e2])
    # golden mosaic raster: 2400 x 4800
    assert affine.mosaic_size(union, GT_H19V04[1], GT_H19V04[5]) == (2400, 4800)
    p1 = affine.tile_placement(e1, union, GT_H19V04[1], GT_H19V04[5], TILE, TILE)
    p2 = affine.tile_placement(e2, union, GT_H19V04[1], GT_H19V04[5], TILE, TILE)
    # golden DstRects: h19v04 at (0,0), h19v05 at (0,2400)
    assert p1 == (0, 0, 0, 0, 2400, 2400)
    assert p2 == (0, 0, 0, 2400, 2400, 2400)


def test_clip_window_matches_golden_vrt():
    xmin, ymin, xmax, ymax = ALBANIA
    (ulx,), (uly,) = transform.forward(transform.SINUSOIDAL, [xmin], [ymax])
    (lrx,), (lry,) = transform.forward(transform.SINUSOIDAL, [xmax], [ymin])
    win = affine.clip_window(GT_H19V04, ulx, uly, lrx, lry)
    # golden 2017-01-01-00:00:00.vrt: SrcRect 1005,1754 480x735
    assert win[:4] == (1005, 1754, 480, 735)
    assert np.isclose(win[4], 1577579.7997771376, rtol=0, atol=1e-6)
    assert np.isclose(win[5], 4747102.0935434, rtol=0, atol=1e-6)


def test_rounded_res_quirk():
    # round(6) then float32 (dataset.py:338-339, tile.py:182-185)
    rx, ry = affine.rounded_res(GT_H19V04)
    assert rx == float(np.float32(463.312717))
    assert ry == float(np.float32(-463.312717))


def test_pixel_window_clamped():
    assert affine.pixel_window_clamped(-5, 10, 20, 20, 16, 16) == (0, 10, 15, 6)
    assert affine.pixel_window_clamped(0, 0, 32, 32, 16, 16) == (0, 0, 16, 16)


def test_time_bucket():
    start = 0
    res = 3600
    ts = np.array([0, 1, 3599, 3600, 7201])
    assert affine.time_bucket_epoch_s(ts, start, res).tolist() == [0, 0, 0, 3600, 7200]


def test_block_chunk_size():
    assert affine.block_chunk_size(128) == 512
    assert affine.block_chunk_size(600) == 1024


def test_warp_and_clip_match_s3_multiple_files_golden():
    """Third reference scenario (s3-multiple-files golden): source at
    1/240° warped to 0.0042° (gdal.Warp keeps the origin, sizes
    floor(span/res+0.5) → 42857×21429), then clipped to the India
    bbox — SrcRect (16232, 12977, 6959, 6554) and snapped origin
    (68.17440000000013, 35.4966) from the golden VRT."""
    origin_x = 1.4210854715202004e-13
    src_extent = (origin_x, 0.0, origin_x + 180.0, 90.0)
    gt, xs, ys = affine.warp_output_grid(src_extent, 0.0042, 0.0042)
    assert (xs, ys) == (42857, 21429)
    assert gt[0] == origin_x and gt[3] == 90.0 and gt[5] == -0.0042

    india = (68.1766451354, 7.96553477623, 97.4025614766, 35.4940095078)
    w = affine.clip_window(gt, india[0], india[3], india[2], india[1])
    assert w[:4] == (16232, 12977, 6959, 6554)
    assert abs(w[4] - 68.17440000000013) < 1e-9
    assert abs(w[5] - 35.4966) < 1e-9


def test_utm_warp_output_grid_integration():
    """R7 warp into the new UTM CRS family: Albania's lon/lat bbox →
    EPSG:32634 (zone 34N) envelope → 30 m output grid.  Sanity: the
    grid spans ~170×340 km at 30 m, the geotransform preserves the
    envelope origin, and the round-trip of the grid center stays
    inside the original bbox."""
    from earth_data_kit_spark.grid import transform

    bbox = (19.3044861183, 39.624997667, 21.0200403175, 42.6882473822)
    e0, n0, e1, n1 = transform.transform_bbox_from_lonlat("EPSG:32634", *bbox)
    gt, xsize, ysize = affine.warp_output_grid((e0, n0, e1, n1), 30.0, 30.0)
    assert gt[0] == e0 and gt[3] == n1 and gt[5] == -30.0
    # ~1.7 deg lon ≈ 140-150 km at these latitudes; ~3.06 deg lat ≈ 340 km
    assert 4000 < xsize < 6500 and 10500 < ysize < 12000
    cx = gt[0] + (xsize / 2) * gt[1]
    cy = gt[3] + (ysize / 2) * gt[5]
    lon, lat = transform.inverse("EPSG:32634", cx, cy)
    assert bbox[0] <= float(lon) <= bbox[2] and bbox[1] <= float(lat) <= bbox[3]
