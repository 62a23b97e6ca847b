"""Tile catalog → mosaic assignment → clip windows, as DataFrame ops.

This reproduces the numeric core of the reference's mosaic pipeline
(SURVEY.md §3.2): where earth-data-kit shells out to gdal.BuildVRT /
gdal.Translate and persists VRT XML (/root/reference/earth_data_kit/
stitching/classes/dataset.py:471-593), we compute the identical
placement/clip numbers as columns, so the "physical plan artifact"
is a *tile-assignment table* — queryable, checkpointable, and checked
row-for-row against the golden VRT rects
(tests/fixtures/goldens/s3-grid-file.tar).

All arithmetic is pure Column expressions over window partitions
(date, band) — whole-stage codegen, no UDFs, no driver loops; at
100 TB the only shuffle is the (date, band) window, whose cardinality
is bounded by dates × bands, and AQE coalesces the tiny partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from earth_data_kit_spark.grid import transform as tf

EPOCH_SENTINEL = "1970-01-01 00:00:00"  # non-temporal data (dataset.py:782-784)


def explode_bands(tiles: DataFrame) -> DataFrame:
    """catalog → one row per (tile, band), the __get_tile_bands__
    analog (dataset.py:349-368) via explode instead of a driver loop.
    Adds tile extent + rounded-resolution columns (tile.py:70-76,
    182-185 — round(6) then float32 kept for fixture parity)."""
    gt = F.col("geo_transform")
    return (
        tiles.select(
            "*",
            F.explode("bands").alias("band"),
        )
        .select(
            "*",
            F.col("band.source_idx").alias("source_idx"),
            F.col("band.description").alias("description"),
            F.col("band.dtype").alias("dtype"),
            F.col("band.nodataval").alias("nodataval"),
        )
        .drop("band", "bands")
        .withColumn("x_res", F.round(gt[1], 6).cast("float"))
        .withColumn("y_res", F.round(gt[5], 6).cast("float"))
        .withColumn("tile_xmin", gt[0])
        .withColumn("tile_ymax", gt[3])
        .withColumn("tile_xmax", gt[0] + gt[1] * F.col("x_size"))
        .withColumn("tile_ymin", gt[3] + gt[5] * F.col("y_size"))
    )


def filter_bands(tiles_exploded: DataFrame, bands: list[str]) -> DataFrame:
    """Band selection (P3, dataset.py:778-780) + epoch sentinel for
    null dates (dataset.py:782-784)."""
    return tiles_exploded.where(F.col("description").isin(bands)).withColumn(
        "date", F.coalesce(F.col("date"), F.lit(EPOCH_SENTINEL).cast("timestamp"))
    )


def band_configs(tiles_exploded: DataFrame) -> DataFrame:
    """get_bands() grouping (A2, dataset.py:331-347): distinct
    (source_idx, description, dtype, x_res, y_res, crs) with member
    tiles collected (sorted for determinism)."""
    return tiles_exploded.groupBy(
        "source_idx", "description", "dtype", "x_res", "y_res", "crs"
    ).agg(
        F.sort_array(F.collect_list("tile_name")).alias("tiles"),
        F.count("*").alias("n_tiles"),
    )


def validate_band_properties(tiles_exploded: DataFrame) -> None:
    """P7 (dataset.py:434-469): within each (date, band) the dtype /
    crs / resolution must be unique unless an override is supplied.
    One aggregation, then raise with the same message intent."""
    bad = (
        tiles_exploded.groupBy("date", "description")
        .agg(
            F.countDistinct("dtype").alias("n_dtype"),
            F.countDistinct("crs").alias("n_crs"),
            F.countDistinct("x_res", "y_res").alias("n_res"),
        )
        .where((F.col("n_dtype") > 1) | (F.col("n_crs") > 1) | (F.col("n_res") > 1))
    )
    rows = bad.limit(5).collect()
    if rows:
        raise ValueError(
            "Band tiles have inconsistent properties (dtype/crs/resolution); "
            f"pass overrides to mosaic(). First offenders: {rows}"
        )


def tile_assignments(tiles_exploded: DataFrame) -> DataFrame:
    """Per-(date, band) mosaic placement — the BuildVRT numbers (R5).

    Window min/max gives the union extent; placement offsets are
    round((tile - union)/res).  Output schema matches FIXTURES.md §E1.
    """
    w = Window.partitionBy("date", "description")
    uxmin = F.min("tile_xmin").over(w)
    uymax = F.max("tile_ymax").over(w)
    uxmax = F.max("tile_xmax").over(w)
    uymin = F.min("tile_ymin").over(w)
    gt = F.col("geo_transform")
    return tiles_exploded.select(
        "date",
        F.col("description").alias("band"),
        "tile_name",
        F.lit(0).alias("src_xoff"),
        F.lit(0).alias("src_yoff"),
        F.round((F.col("tile_xmin") - uxmin) / gt[1]).cast("int").alias("dst_xoff"),
        F.round((uymax - F.col("tile_ymax")) / -gt[5]).cast("int").alias("dst_yoff"),
        F.col("x_size").cast("int").alias("xsize"),
        F.col("y_size").cast("int").alias("ysize"),
        F.round((uxmax - uxmin) / gt[1]).cast("int").alias("mosaic_xsize"),
        F.round((uymax - uymin) / -gt[5]).cast("int").alias("mosaic_ysize"),
        uxmin.alias("mosaic_xmin"),
        uymax.alias("mosaic_ymax"),
        gt[1].alias("res_x"),  # full precision for clip math
        gt[5].alias("res_y"),
    )


def band_stack_order(assignments: DataFrame, bands: list[str]) -> DataFrame:
    """Band order in the stacked VRT = input list order (R6,
    dataset.py:562-584); missing bands are skipped with the reference
    semantics (dataset.py:495-511): band numbers are assigned over
    *found* bands only, per date."""
    order = F.array(*[F.lit(b) for b in bands])
    w = Window.partitionBy("date").orderBy("band_pos")
    found = (
        assignments.select("date", "band")
        .distinct()
        .withColumn("band_pos", F.array_position(order, F.col("band")))
        .where(F.col("band_pos") > 0)
        .withColumn("band_number", F.row_number().over(w))
    )
    return assignments.join(found, ["date", "band"])


def clip_windows(
    assignments: DataFrame,
    bbox4326: tuple[float, float, float, float],
    crs: str,
) -> DataFrame:
    """bbox clip of each (date, band) mosaic (P9, dataset.py:586-593).

    The EPSG:4326 bbox is corner-transformed to the mosaic CRS on the
    driver (it is one constant), then the pixel window uses GDAL
    gdal_translate rounding — floor(+0.001) offsets, +0.5 sizes —
    validated against the golden clip VRT (1005, 1754, 480, 735).
    """
    xmin, ymin, xmax, ymax = bbox4326
    (ulx,), (uly,) = tf.forward(crs, [xmin], [ymax])
    (lrx,), (lry,) = tf.forward(crs, [xmax], [ymin])
    gt1 = F.col("res_x")
    gt5 = F.col("res_y")
    xoff = F.floor((F.lit(float(ulx)) - F.col("mosaic_xmin")) / gt1 + 0.001).cast("int")
    yoff = F.floor((F.lit(float(uly)) - F.col("mosaic_ymax")) / gt5 + 0.001).cast("int")
    xsize = ((F.lit(float(lrx)) - F.lit(float(ulx))) / gt1 + 0.5).cast("int")
    ysize = ((F.lit(float(lry)) - F.lit(float(uly))) / gt5 + 0.5).cast("int")
    return (
        assignments.select("date", "band", "mosaic_xmin", "mosaic_ymax", "res_x", "res_y")
        .distinct()
        .select(
            "date",
            "band",
            xoff.alias("xoff"),
            yoff.alias("yoff"),
            xsize.alias("xsize"),
            ysize.alias("ysize"),
            (F.col("mosaic_xmin") + xoff.cast("double") * gt1).alias("out_origin_x"),
            (F.col("mosaic_ymax") + yoff.cast("double") * gt5).alias("out_origin_y"),
        )
    )
