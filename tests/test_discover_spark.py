"""Template expansion / date re-extraction / temporal bucketing vs the
reference's s3-grid-file scenario shapes (SURVEY.md §5.1)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from earth_data_kit_spark.operators import discover

MODIS_TEMPLATE = "s3://modis-pds/MCD43A4.006/{h}/{v}/%Y%j/MCD43A4.A%Y%j.h{h}v{v}.006.*_B0?.TIF"


def test_template_granularity():
    assert discover.template_granularity("x/%Y/%m/%d/") == 3
    assert discover.template_granularity("x/%Y%j/") == 3
    assert discover.template_granularity("x/%Y/%H") == 4
    assert discover.template_granularity("no tokens") is None


def test_expand_time_day_granularity(spark):
    out = discover.expand_time(spark, "s3://b/%Y%j/f_%Y-%m-%d.tif", "2017-01-01", "2017-01-03")
    rows = sorted(r.search_path for r in out.collect())
    assert rows == [
        "s3://b/2017001/f_2017-01-01.tif",
        "s3://b/2017002/f_2017-01-02.tif",
        "s3://b/2017003/f_2017-01-03.tif",
    ]


def test_expand_time_no_tokens_passthrough(spark):
    out = discover.expand_time(spark, "s3://b/static.tif", "2017-01-01", "2017-01-03")
    assert [r.search_path for r in out.collect()] == ["s3://b/static.tif"]


def test_expand_space_modis_grid(spark):
    # MODIS-like grid around Albania: h=19, v in {4, 5} intersect
    grid = spark.createDataFrame(
        [
            ("19", "04", 11.54, 39.99, 26.08, 50.0),
            ("19", "05", 10.0, 29.99, 22.5, 40.0),
            ("20", "04", 26.0, 39.99, 43.0, 50.0),
            ("10", "10", -100.0, -20.0, -90.0, -10.0),
        ],
        "h string, v string, minx double, miny double, maxx double, maxy double",
    )
    patterns = discover.expand_time(spark, MODIS_TEMPLATE, "2017-01-01", "2017-01-01")
    out = discover.expand_space(
        patterns, grid, (19.3044861183, 39.624997667, 21.0200403175, 42.6882473822), ["h", "v"]
    )
    paths = sorted(r.search_path for r in out.collect())
    assert len(paths) == 2  # h19v04 + h19v05 (reference scenario: 2 tiles)
    assert paths[0] == "s3://modis-pds/MCD43A4.006/19/04/2017001/MCD43A4.A2017001.h19v04.006.*_B0?.TIF"
    assert paths[1].startswith("s3://modis-pds/MCD43A4.006/19/05/2017001/")


def test_extract_dates_with_doy(spark):
    listing = spark.createDataFrame(
        [
            ("s3://modis-pds/MCD43A4.006/19/04/2017001/MCD43A4.A2017001.h19v04.006.2017014054538_B03.TIF",),
            ("s3://modis-pds/MCD43A4.006/19/05/2017032/MCD43A4.A2017032.h19v05.006.2017014045957_B07.TIF",),
        ],
        "path string",
    )
    out = discover.extract_dates(listing, MODIS_TEMPLATE)
    dates = sorted(r.date for r in out.collect())
    assert dates == [dt.datetime(2017, 1, 1), dt.datetime(2017, 2, 1)]


def test_extract_dates_epoch_default(spark):
    listing = spark.createDataFrame([("s3://b/static/file.tif",)], "path string")
    out = discover.extract_dates(listing, "s3://b/static/*.tif")
    assert [r.date for r in out.collect()] == [dt.datetime(1970, 1, 1)]


def test_bucket_temporally_matches_oracle(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = discover.bucket_temporally(events, "ts", "2017-01-01 00:00:00", "1 day")
    pdf = out.select("ts", "bucket").toPandas()
    import numpy as np

    from earth_data_kit_spark.grid.affine import time_bucket_epoch_s

    ts_s = pdf["ts"].astype("datetime64[s]").astype("int64").values
    start = int(dt.datetime(2017, 1, 1).timestamp())
    exp = time_bucket_epoch_s(ts_s, start, 86400)
    got = pdf["bucket"].astype("datetime64[s]").astype("int64").values
    assert np.array_equal(got, exp)
    # half-open: bucket start <= ts < start + res
    assert ((ts_s >= got) & (ts_s < got + 86400)).all()
