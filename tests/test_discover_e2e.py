"""End-to-end discover → catalog → mosaic pipeline (SURVEY.md §3.1 +
§3.2 as one DataFrame story), against the golden MODIS scenario:

  template → time×space expansion → (simulated) listing → date
  re-extraction → metadata harvest → catalog snapshot → reload →
  explode bands → assignments → golden rects, plus catalog snapshot
  semantics (time travel / rollback)."""

import pytest
from pyspark.sql import functions as F

from earth_data_kit_spark.operators import assign, discover
from earth_data_kit_spark.sources.catalog import Catalog

TEMPLATE = "s3://modis-pds/MCD43A4.006/{h}/{v}/%Y%j/MCD43A4.A%Y%j.h{h}v{v}.006.*_B0?.TIF"
ALBANIA = (19.3044861183, 39.624997667, 21.0200403175, 42.6882473822)
GT1, GT5 = 463.3127165274999, -463.3127165277084
X0, Y0 = 1111950.5196670, 5559752.5983330


@pytest.fixture(scope="module")
def grid(spark):
    return spark.createDataFrame(
        [
            ("19", "04", 11.54, 39.99, 26.08, 50.0),
            ("19", "05", 10.0, 29.99, 22.5, 40.0),
            ("20", "04", 26.0, 39.99, 43.0, 50.0),
            ("10", "10", -100.0, -20.0, -90.0, -10.0),
        ],
        "h string, v string, minx double, miny double, maxx double, maxy double",
    )


def test_discover_to_mosaic_end_to_end(spark, grid, tmp_path):
    # 1. discover: template expansion limited by time range + bbox
    patterns = discover.expand_time(spark, TEMPLATE, "2017-01-01", "2017-01-01")
    expanded = discover.expand_space(patterns, grid, ALBANIA, ["h", "v"])
    assert expanded.count() == 2  # h19v04 + h19v05, one date

    # 2. simulated listing: one object per pattern per band suffix
    listing = expanded.select(
        F.explode(
            F.array(
                F.regexp_replace("search_path", r"\*_B0\?", "2017014054538_B03"),
                F.regexp_replace("search_path", r"\*_B0\?", "2017014045957_B07"),
            )
        ).alias("path"),
        "h", "v",
    )
    assert listing.count() == 4

    # 3. date re-extraction from the listed keys (S5)
    dated = discover.extract_dates(listing, TEMPLATE)
    assert {str(r.date) for r in dated.collect()} == {"2017-01-01 00:00:00"}

    # 4. metadata harvest (R11 analog — geotransform per grid cell)
    band_of = F.when(F.col("path").contains("_B03"), "Nadir_Reflectance_Band3").otherwise(
        "Nadir_Reflectance_Band7"
    )
    tiles = dated.select(
        F.col("path").alias("engine_path"),
        F.regexp_replace("path", "s3://", "/vsis3/").alias("gdal_path"),
        F.concat(F.lit("h"), "h", F.lit("v"), "v").alias("tile_name"),
        "date",
        F.array(
            F.lit(X0), F.lit(GT1), F.lit(0.0),
            F.when(F.col("v") == "04", Y0).otherwise(Y0 + GT5 * 2400),
            F.lit(0.0), F.lit(GT5),
        ).alias("geo_transform"),
        F.lit("SINUSOIDAL-WKT").alias("projection"),
        F.lit(2400).alias("x_size"), F.lit(2400).alias("y_size"),
        F.lit("sinusoidal").alias("crs"), F.lit("metre").alias("length_unit"),
        F.array(
            F.struct(
                F.lit(1).alias("source_idx"), band_of.alias("description"),
                F.lit("Int16").alias("dtype"), F.lit(32767.0).alias("nodataval"),
            )
        ).alias("bands"),
    )

    # 5. catalog snapshot (S12) + reload — the discover/mosaic seam
    cat = Catalog(str(tmp_path / "cat"))
    snap1 = cat.write(tiles, "catalog")
    reloaded = cat.read(spark, "catalog")
    assert reloaded.count() == 4

    # 6. mosaic assignment from the reloaded catalog → golden rects
    exploded = assign.explode_bands(reloaded)
    a = assign.tile_assignments(exploded)
    rows = {(r.band, r.tile_name): r for r in a.collect()}
    assert len(rows) == 4
    for band in ("Nadir_Reflectance_Band3", "Nadir_Reflectance_Band7"):
        assert rows[(band, "h19v04")].dst_yoff == 0
        assert rows[(band, "h19v05")].dst_yoff == 2400
        assert rows[(band, "h19v04")].mosaic_ysize == 4800

    # 7. snapshot semantics: a second (filtered) snapshot, time travel,
    #    rollback (the resume/debug story)
    snap2 = cat.write(tiles.where(F.col("tile_name") == "h19v04"), "catalog")
    assert cat.read(spark, "catalog").count() == 2
    assert cat.read(spark, "catalog", snapshot=snap1).count() == 4  # time travel
    cat.rollback("catalog", snap1)
    assert cat.read(spark, "catalog").count() == 4
    assert [h["id"] for h in cat.history("catalog")] == [snap1, snap2]


def test_catalog_append_and_errors(spark, tmp_path):
    cat = Catalog(str(tmp_path / "cat2"))
    df = spark.range(3).select(F.col("id").alias("x"))
    with pytest.raises(FileNotFoundError):
        cat.read(spark, "t")
    s1 = cat.write(df, "t")
    s2 = cat.write(df, "t", mode="append")
    assert cat.read(spark, "t").count() == 6
    assert cat.read(spark, "t", snapshot=s1).count() == 3
    with pytest.raises(KeyError):
        cat.read(spark, "t", snapshot=12345)


def test_catalog_concurrent_writers_lose_no_snapshots(spark, tmp_path):
    """Two 'sessions' (independent Catalog instances over the same
    base_dir) committing interleaved must both land in history, the
    current pointer must be the LAST committer, and a reader pinned to
    an earlier snapshot must keep seeing exactly its rows (snapshot
    isolation).  The unlocked manifest read-modify-write lost the
    slower writer's history entry (VERDICT r2 task 7)."""
    import threading

    base = str(tmp_path / "ccat")
    c1, c2 = Catalog(base), Catalog(base)
    df_a = spark.range(10).withColumnRenamed("id", "v")
    df_b = spark.range(20, 25).withColumnRenamed("id", "v")

    s1 = c1.write(df_a, "t")
    s2 = c2.write(df_b, "t")
    hist = [h["id"] for h in c1.history("t")]
    assert hist == [s1, s2]
    assert c1.read(spark, "t", snapshot=s1).count() == 10  # isolation
    assert c2.read(spark, "t").count() == 5  # current = last committer

    # hammer: 6 threads × independent instances, all snapshots survive
    ids, errs = [], []

    def commit(i):
        try:
            ids.append(Catalog(base).write(spark.range(i, i + 1), "hammer"))
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    threads = [threading.Thread(target=commit, args=(i,)) for i in range(6)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert not errs
    got = [h["id"] for h in c1.history("hammer")]
    assert sorted(ids) == sorted(got) and len(set(got)) == 6
    # every snapshot readable and distinct
    vals = {Catalog(base).read(spark, "hammer", snapshot=s).collect()[0][0] for s in got}
    assert vals == set(range(6))


def test_catalog_concurrent_appends_lose_no_rows(spark, tmp_path):
    """Append is a read-modify-write: it must hold the commit lock
    across read-current + union + write, or two concurrent appends
    each union the same base and the later commit drops the earlier
    one's rows from current (code-review r3 finding)."""
    import threading

    base = str(tmp_path / "acat")
    Catalog(base).write(spark.range(0, 5).withColumnRenamed("id", "v"), "t")
    errs = []

    def append(lo):
        try:
            Catalog(base).write(
                spark.range(lo, lo + 5).withColumnRenamed("id", "v"), "t", mode="append"
            )
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    threads = [threading.Thread(target=append, args=(lo,)) for lo in (100, 200, 300)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert not errs
    got = {r.v for r in Catalog(base).read(spark, "t").collect()}
    expected = set(range(0, 5)) | set(range(100, 105)) | set(range(200, 205)) | set(range(300, 305))
    assert got == expected  # every append's rows visible in current


def test_catalog_failed_write_leaves_no_inflight(spark, tmp_path):
    import glob

    base = str(tmp_path / "fcat")
    cat = Catalog(base)
    cat.write(spark.range(3).withColumnRenamed("id", "v"), "t")
    bad = spark.range(3).selectExpr("assert_true(id < 1) as v")
    try:
        cat.write(bad, "t")
    except Exception:
        pass
    assert glob.glob(f"{base}/t/.snap-inflight-*") == []
    assert len(cat.history("t")) == 1  # failed commit left no trace
