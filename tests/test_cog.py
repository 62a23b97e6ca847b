"""COG export template math (S14) — reference edk_accessor.py
semantics pinned: ×128 block rounding, center-derived geotransform,
chunk-stepped edge-clamped write layout."""

import numpy as np

from earth_data_kit_spark.operators import cog

MODIS_X0 = 1111950.5196670
MODIS_RES = 463.3127165274999
MODIS_RES_Y = -463.3127165277084


def test_block_size_rounding():
    # edk_accessor.py:52-58: ceil to ×128, floor 128
    assert cog.cog_block_size(1) == 128
    assert cog.cog_block_size(127) == 128
    assert cog.cog_block_size(128) == 128
    assert cog.cog_block_size(129) == 256
    assert cog.cog_block_size(2400) == 2432  # the MODIS tile chunk
    assert cog.cog_block_size(2432) == 2432


def test_geotransform_from_centers_recovers_gdal_gt():
    # centers built from a known GDAL geotransform must round-trip
    w, h = 2400, 2400
    xc = MODIS_X0 + (np.arange(w) + 0.5) * MODIS_RES
    yc = 5559752.5983330 + (np.arange(h) + 0.5) * MODIS_RES_Y
    gt = cog.cog_geotransform(xc[0], xc[-1], w, yc[0], yc[-1], h)
    assert abs(gt[0] - MODIS_X0) < 1e-6
    assert abs(gt[1] - MODIS_RES) < 1e-9
    assert abs(gt[5] - MODIS_RES_Y) < 1e-9
    assert gt[3] - 5559752.5983330 < 1e-6
    # single-column degenerate: res falls back to 1.0
    assert cog.cog_geotransform(5.0, 5.0, 1, 7.0, 7.0, 1)[1] == 1.0


def test_template_numbers():
    t = cog.cog_template(2400, 4800, 2, 2400, 2400, 0.0, 2399.0, 0.0, -4799.0)
    assert (t["block_x"], t["block_y"]) == (2432, 2432)
    assert t["width"] == 2400 and t["height"] == 4800 and t["n_bands"] == 2


def test_block_layout_steps_by_chunk_and_clamps(spark):
    # writes step by the CHUNK size (read granularity), not the
    # rounded block size — edk_accessor.py:140-160
    rows = cog.cog_block_layout(spark, 2400, 4800, 2, 2400, 2400).collect()
    got = {(r.band_idx, r.xoff, r.yoff, r.xsize, r.ysize) for r in rows}
    assert got == {
        (b, 0, y, 2400, 2400) for b in (0, 1) for y in (0, 2400)
    }
    # non-divisible extent → edge-clamped final blocks
    rows = cog.cog_block_layout(spark, 1000, 700, 1, 512, 512).collect()
    got = {(r.xoff, r.yoff, r.xsize, r.ysize) for r in rows}
    assert got == {
        (0, 0, 512, 512), (512, 0, 488, 512),
        (0, 512, 512, 188), (512, 512, 488, 188),
    }
