"""End-to-end tile-assignment pipeline vs the reference's golden VRT
rects (s3-grid-file scenario, FIXTURES.md §B/§E): catalog DataFrame →
explode bands → assignment rows → clip windows, compared row-for-row.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from earth_data_kit_spark.grid import transform
from earth_data_kit_spark.operators import assign

GT1 = 463.3127165274999
GT5 = -463.3127165277084
X0 = 1111950.5196670
Y0_V04 = 5559752.5983330
Y0_V05 = Y0_V04 + GT5 * 2400
ALBANIA = (19.3044861183, 39.624997667, 21.0200403175, 42.6882473822)

TILE_SCHEMA = (
    "engine_path string, gdal_path string, tile_name string, date timestamp, "
    "geo_transform array<double>, projection string, x_size int, y_size int, "
    "crs string, length_unit string, "
    "bands array<struct<source_idx:int, description:string, dtype:string, nodataval:double>>"
)


@pytest.fixture(scope="module")
def catalog(spark):
    d = dt.datetime(2017, 1, 1)
    rows = []
    for tile, y0 in (("h19v04", Y0_V04), ("h19v05", Y0_V05)):
        for band in ("Nadir_Reflectance_Band3", "Nadir_Reflectance_Band7"):
            rows.append(
                (
                    f"s3://modis-pds/{tile}_{band}.TIF",
                    f"/vsis3/modis-pds/{tile}_{band}.TIF",
                    f"{tile}-{band}",
                    d,
                    [X0, GT1, 0.0, y0, 0.0, GT5],
                    "SINUSOIDAL-WKT",
                    2400,
                    2400,
                    "sinusoidal",
                    "metre",
                    [(1, band, "Int16", 32767.0)],
                )
            )
    return spark.createDataFrame(rows, TILE_SCHEMA)


def test_assignments_match_golden(spark, catalog):
    tiles = assign.explode_bands(catalog)
    tiles = assign.filter_bands(tiles, ["Nadir_Reflectance_Band3", "Nadir_Reflectance_Band7"])
    assign.validate_band_properties(tiles)  # must not raise
    a = assign.tile_assignments(tiles)
    rows = {
        (r.band, r.tile_name): r
        for r in a.collect()
    }
    assert len(rows) == 4
    for band in ("Nadir_Reflectance_Band3", "Nadir_Reflectance_Band7"):
        r04 = rows[(band, f"h19v04-{band}")]
        r05 = rows[(band, f"h19v05-{band}")]
        # golden DstRects from the s3-grid-file VRT
        assert (r04.dst_xoff, r04.dst_yoff, r04.xsize, r04.ysize) == (0, 0, 2400, 2400)
        assert (r05.dst_xoff, r05.dst_yoff, r05.xsize, r05.ysize) == (0, 2400, 2400, 2400)
        assert (r04.mosaic_xsize, r04.mosaic_ysize) == (2400, 4800)


def test_clip_windows_match_golden(spark, catalog):
    tiles = assign.explode_bands(catalog)
    tiles = assign.filter_bands(tiles, ["Nadir_Reflectance_Band3"])
    a = assign.tile_assignments(tiles)
    c = assign.clip_windows(a, ALBANIA, transform.SINUSOIDAL).collect()
    assert len(c) == 1
    w = c[0]
    # golden clipped VRT: SrcRect 1005,1754 480x735, snapped origin
    assert (w.xoff, w.yoff, w.xsize, w.ysize) == (1005, 1754, 480, 735)
    assert abs(w.out_origin_x - 1577579.7997771376) < 1e-6
    assert abs(w.out_origin_y - 4747102.0935434) < 1e-6


def test_band_configs_grouping(spark, catalog):
    tiles = assign.explode_bands(catalog)
    cfg = assign.band_configs(tiles).collect()
    # 2 bands × identical (dtype, res, crs) → 2 config rows of 2 tiles
    assert len(cfg) == 2
    for r in cfg:
        assert r.n_tiles == 2
        assert len(r.tiles) == 2


def test_band_stack_order_skips_missing(spark, catalog):
    tiles = assign.explode_bands(catalog)
    tiles = assign.filter_bands(tiles, ["Nadir_Reflectance_Band7"])
    a = assign.tile_assignments(tiles)
    # request order includes a missing band: found bands renumber 1..n
    stacked = assign.band_stack_order(a, ["MissingBand", "Nadir_Reflectance_Band7"])
    nums = {r.band_number for r in stacked.collect()}
    assert nums == {1}


def test_validate_catches_mixed_dtype(spark, catalog):
    tiles = assign.explode_bands(catalog)
    bad = tiles.withColumn(
        "dtype",
        F.when(F.col("tile_name").startswith("h19v05"), F.lit("Float32")).otherwise(F.col("dtype")),
    )
    with pytest.raises(ValueError):
        assign.validate_band_properties(bad)


def test_gee_no_time_dim_scenario(spark):
    """Second reference scenario (gee-no-time-dim golden): non-temporal
    source (epoch sentinel date), warped to EPSG:3857 at 5 m, clipped
    to the NZ bbox — SrcRect (134315, 43692, 15165, 23481) and the
    snapped origin from the golden VRT
    (/root/reference/tests/fixtures/goldens/gee-no-time-dim.tar)."""
    import datetime as dt

    from earth_data_kit_spark.grid import transform

    nz_bbox = (141.667156, -25.115290, 142.348309, -24.156622)
    rows = [
        (
            "EEDAI:AU/GA/AUSTRALIA_5M_DEM",
            "EEDAI:AU/GA/AUSTRALIA_5M_DEM:elevation",
            "nsw-dem",
            None,  # non-temporal → epoch sentinel (dataset.py:782-784)
            [15098740.198894121, 5.0, 0.0, -2554040.6340728723, 0.0, -5.0],
            "EPSG:3857-WKT",
            639758,
            643655,
            "EPSG:3857",
            "metre",
            [(1, "elevation", "Float32", None)],
        )
    ]
    catalog = spark.createDataFrame(rows, TILE_SCHEMA)
    tiles = assign.filter_bands(assign.explode_bands(catalog), ["elevation"])
    dates = [r.date for r in tiles.select("date").collect()]
    assert dates == [dt.datetime(1970, 1, 1)]  # epoch sentinel

    a = assign.tile_assignments(tiles)
    c = assign.clip_windows(a, nz_bbox, transform.WEB_MERCATOR).collect()
    assert len(c) == 1
    w = c[0]
    assert (w.xoff, w.yoff, w.xsize, w.ysize) == (134315, 43692, 15165, 23481)
    assert abs(w.out_origin_x - 15770315.198894121) < 1e-6
    assert abs(w.out_origin_y - -2772500.6340728723) < 1e-6
