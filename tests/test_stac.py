"""STAC-analog pushdown scan (S6/S7): filters prune items in the
catalog walk, the DataFrame mirror applies identical predicates, and
on a parquet catalog mirror those predicates reach PushedFilters."""

import json

import pytest

from earth_data_kit_spark.sources import stac

BBOX_AL = (19.3044861183, 39.624997667, 21.0200403175, 42.6882473822)
RANGE = ("2017-01-01T00:00:00Z", "2017-01-02T00:00:00Z")


def test_parse_stac_url():
    assert stac.parse_stac_url("https://c.com/collections/modis/") == ("https://c.com", "modis")
    assert stac.parse_stac_url("https://c.com/collections/modis/items") == ("https://c.com", "modis")
    assert stac.parse_stac_url("https://c.com") == ("https://c.com", None)


def test_stac_transform_to_gdal_reorders_and_truncates():
    # STAC [a, b, x, d, e, y] → GDAL (x, a, b, y, d, e); 9-value
    # homogeneous transforms truncate to 6 (stac_asset.py:68-86)
    t = [10.0, 0.0, 500.0, 0.0, -10.0, 700.0]
    assert stac.stac_transform_to_gdal(t) == (500.0, 10.0, 0.0, 700.0, 0.0, -10.0)
    assert stac.stac_transform_to_gdal(t + [0.0, 0.0, 1.0]) == (
        500.0, 10.0, 0.0, 700.0, 0.0, -10.0
    )


def test_asset_admission_and_vsi():
    assert stac.is_asset_allowed(["data"], "image/tiff; application=geotiff")
    assert stac.is_asset_allowed(["data"], "image/jp2")
    assert not stac.is_asset_allowed(None, "image/tiff")
    assert not stac.is_asset_allowed(["data"], "application/json")
    assert not stac.is_asset_allowed(["data"], None)
    assert stac.to_vsi("s3://bucket/k.tif") == "/vsis3/bucket/k.tif"
    assert stac.to_vsi("https://h/k.tif") == "/vsicurl/https://h/k.tif"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        stac.to_vsi("ftp://h/k.tif")
    assert stac.subdataset_varname('NETCDF:"/p/f.nc":t2m') == "t2m"


def test_scan_requires_collection(spark):
    with pytest.raises(ValueError, match="Collection name is required"):
        stac.scan(spark, "https://c.com", stac.synth_catalog())


def test_pushdown_prunes_before_listing():
    kept, total = stac.search_items(
        stac.synth_catalog(), "modis-grid", start=RANGE[0], end=RANGE[1], bbox=BBOX_AL
    )
    assert total == 15
    assert len(kept) == 4  # 2 intersecting grid cells × 2 days
    assert {i["id"] for i in kept} == {
        "h19v04_2017-01-01", "h19v05_2017-01-01",
        "h19v04_2017-01-02", "h19v05_2017-01-02",
    }


def test_scan_matches_unfiltered_then_filtered(spark):
    """Row parity: the pushdown path == scan-everything-then-filter
    (the correctness contract for any pushdown)."""
    cat = stac.synth_catalog()
    pushed = {
        (r.tile_name, r.date, r.engine_path, r.gdal_path)
        for r in stac.scan(
            spark, "x/collections/modis-grid", cat,
            start=RANGE[0], end=RANGE[1], bbox=BBOX_AL,
        ).collect()
    }
    items = stac.items_df(spark, cat, "modis-grid")
    late = {
        (r.tile_name, r.date, r.href, "/vsicurl/" + r.href)
        for r in stac.filter_items_df(items, RANGE[0], RANGE[1], BBOX_AL).collect()
    }
    assert pushed == late and len(pushed) == 4


def test_catalog_file_roundtrip(spark, tmp_path):
    p = tmp_path / "catalog.json"
    p.write_text(json.dumps(stac.synth_catalog()))
    out = stac.scan(
        spark, "x/collections/modis-grid", str(p), start=RANGE[0], end=RANGE[1], bbox=BBOX_AL
    )
    assert out.count() == 4


def test_parquet_catalog_mirror_pushes_filters(spark, tmp_path):
    """At scale the catalog is data: the same predicates must reach
    the parquet scan (PushedFilters), so Spark prunes row groups
    instead of reading the whole catalog."""
    items = stac.items_df(spark, stac.synth_catalog(), "modis-grid")
    path = str(tmp_path / "catalog_items")
    items.write.parquet(path)
    mirrored = stac.filter_items_df(
        spark.read.parquet(path), RANGE[0], RANGE[1], BBOX_AL
    )
    old = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.maxMetadataStringLength", "4096")  # untruncate PushedFilters
    try:
        plan = mirrored._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", old)
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(date" in plan
    assert "LessThanOrEqual(xmin" in plan
    assert mirrored.count() == 4


def test_non_z_offset_datetime_converts_to_utc(spark):
    """A STAC item datetime with a non-Z offset (valid per spec) must
    materialize as the UTC instant, not the local wall-clock — and
    must filter identically to search_items' tz-aware path."""
    cat = {
        "collections": [{
            "id": "c",
            "items": [{
                "id": "offset-item",
                # 2017-01-02T02:00+05:00 == 2017-01-01T21:00Z
                "datetime": "2017-01-02T02:00:00+05:00",
                "bbox": [0.0, 0.0, 1.0, 1.0],
                "assets": {"data": {"href": "s3://b/offset.tif"}},
            }],
        }]
    }
    out = stac.scan(spark, "cat/collections/c", cat)
    [row] = out.collect()
    assert row.date.strftime("%Y-%m-%d %H:%M") == "2017-01-01 21:00"
    # a Z-range covering only the UTC instant keeps it; one ending
    # before it drops it (the wall-clock 02:00 would be wrongly kept)
    kept, _ = stac.search_items(cat, "c", start="2017-01-01T20:00:00Z", end="2017-01-01T22:00:00Z")
    assert len(kept) == 1
    kept2, _ = stac.search_items(cat, "c", end="2017-01-01T20:00:00Z")
    assert len(kept2) == 0
    idf = stac.items_df(spark, cat, "c")
    assert idf.collect()[0].date.strftime("%H:%M") == "21:00"


# --- Earth-Engine-style walker (S6) ---

from earth_data_kit_spark.sources import earth_engine as ee


def test_ee_pushdown_prunes_with_end_exclusive_interval():
    """Reference earth_engine.py:36-38 attribute-filter semantics:
    startTime >= start AND endTime <= end - 1s (end EXCLUSIVE), so an
    asset whose interval ends exactly at ``end`` is KEPT and one
    ending a day later is dropped — plus bbox pruning, all during the
    catalog walk."""
    cat = ee.synth_catalog()
    kept, total = ee.search_assets(
        cat, "modis-ee",
        start="2017-01-01T00:00:00Z", end="2017-01-03T00:00:00Z", bbox=BBOX_AL,
    )
    assert total == 15
    # only day-1 assets (endTime 01-02 <= 01-03 - 1s); day-2 assets
    # end at 01-03 > 01-03 - 1s → excluded by the end-exclusivity
    assert {a["id"] for a in kept} == {
        "projects/ee/assets/modis/h19v04_2017-01-01",
        "projects/ee/assets/modis/h19v05_2017-01-01",
    }
    # without the bbox, pruning is time-only: 5 cells × 1 day
    kept_t, _ = ee.search_assets(
        cat, "modis-ee", start="2017-01-01T00:00:00Z", end="2017-01-03T00:00:00Z"
    )
    assert len(kept_t) == 5


def test_ee_scan_rows(spark):
    """gdal_path/engine_path/date/tile_name columns; date = startTime
    as naive UTC; tile_name = basename(gdal_path) (reference
    earth_engine.py:44-47)."""
    out = ee.scan(
        spark, "modis-ee", ee.synth_catalog(),
        start="2017-01-01T00:00:00Z", end="2017-01-03T00:00:00Z", bbox=BBOX_AL,
    )
    rows = out.collect()
    assert out.columns == ["gdal_path", "engine_path", "date", "tile_name"]
    assert len(rows) == 2
    for r in rows:
        assert r.tile_name == r.gdal_path.rsplit("/", 1)[-1]
        assert r.date.strftime("%Y-%m-%d") == "2017-01-01"


def test_ee_unknown_layer_raises():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not in catalog"):
        ee.search_assets(ee.synth_catalog(), "nope")


def test_netcdf_recursive_subdataset_expansion(spark):
    """Reference netcdf.py:66-91 parity on a recursive fixture: two
    container files × three subdatasets each → one row per
    subdataset, band description stamped with the varname, container
    metadata carried through, and the result composes with
    assign.explode_bands unchanged."""
    from earth_data_kit_spark.sources.stac import expand_netcdf_subdatasets

    def sub(path, var, xs):
        return {
            "gdal_path": f'NETCDF:{path}:{var}',
            "geo_transform": [10.0, 0.1, 0.0, 50.0, 0.0, -0.1],
            "projection": "WGS84",
            "x_size": xs,
            "y_size": xs,
            "crs": "EPSG:4326",
            "length_unit": "degree",
            # a NetCDF subdataset has exactly ONE band whose original
            # description ("Band 1") the walker must overwrite
            "bands": [
                {"source_idx": 1, "description": "Band 1", "dtype": "float32",
                 "nodataval": -9999.0}
            ],
        }

    containers = [
        {
            "date": "2020-01-01", "tile_name": "t1", "engine_path": "s3://b/t1.nc",
            "subdatasets": [sub("t1.nc", v, 100) for v in ("precip", "temp", "rh")],
        },
        {
            "date": "2020-01-02", "tile_name": "t2", "engine_path": "s3://b/t2.nc",
            "subdatasets": [sub("t2.nc", v, 200) for v in ("precip", "temp", "rh")],
        },
    ]
    schema = (
        "date string, tile_name string, engine_path string, subdatasets "
        "array<struct<gdal_path string, geo_transform array<double>, "
        "projection string, x_size int, y_size int, crs string, "
        "length_unit string, bands array<struct<source_idx int, "
        "description string, dtype string, nodataval double>>>>"
    )
    df = spark.createDataFrame(containers, schema)
    out = expand_netcdf_subdatasets(df)

    # reference column order (netcdf.py:43-58)
    assert out.columns == [
        "date", "tile_name", "engine_path", "gdal_path", "geo_transform",
        "projection", "x_size", "y_size", "crs", "length_unit", "bands",
    ]
    rows = out.orderBy("tile_name", "gdal_path").collect()
    assert len(rows) == 6  # 2 containers × 3 subdatasets
    # python oracle of process_row: varname = split(":")[2] stamped
    # into the single band's description
    for r in rows:
        var = r.gdal_path.split(":")[2]
        assert len(r.bands) == 1
        assert r.bands[0].description == var
        assert r.bands[0].source_idx == 1  # other band fields intact
        assert r.tile_name in ("t1", "t2")
        assert r.x_size == (100 if r.tile_name == "t1" else 200)
    assert {r.gdal_path for r in rows} == {
        f"NETCDF:{t}.nc:{v}" for t in ("t1", "t2") for v in ("precip", "temp", "rh")
    }

    # composes with the standard band explode (R10) — description now
    # selects by varname
    from pyspark.sql import functions as F
    from earth_data_kit_spark.operators.assign import explode_bands

    ex = explode_bands(out)
    assert ex.where(F.col("description") == "precip").count() == 2
