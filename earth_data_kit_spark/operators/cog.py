"""COG export template math + block-write layout (S14).

Reference behavior (/root/reference/earth_data_kit/xarray_boosted/
edk_accessor.py:35-111 template, :131-183 parallel block writes):

* block sizes are the dask chunk sizes CEILED to a multiple of 128
  with a floor of 128 (GTiff tiling wants ×16; the reference pins
  ×128 "for optimal performance with COGs");
* the template geotransform derives from coordinate CENTERS:
  ``res = (last − first)/(n−1)``, ``origin = first − res/2`` (y_res
  negative for north-up arrays);
* writes proceed per (band, xoff, yoff) block stepping by the CHUNK
  size with edge-clamped block extents, fanned out over a process
  pool.

Spark restatement: the template is a plain dict of numbers, and the
write fan-out becomes a BLOCK-LAYOUT TABLE built from pure Columns
(sequence × explode — no driver loops), which joins against a blocks
table to drive distributed writes; the final template assembly is the
single-writer step (like assemble_window).  The numbers are pinned by
tests/test_cog.py and the oracle-paired ``geo_cog_layout`` driver
query.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def cog_block_size(chunk: int) -> int:
    """Chunk → COG block size: ceil to ×128, floor 128
    (edk_accessor.py:52-58)."""
    return max(128, int(math.ceil(chunk / 128) * 128))


def cog_geotransform(
    x_first: float, x_last: float, nx: int, y_first: float, y_last: float, ny: int
) -> tuple[float, float, float, float, float, float]:
    """GDAL geotransform from pixel-CENTER coordinate arrays' ends
    (edk_accessor.py:79-103): res from the center span over n−1,
    origin at first center minus half a pixel."""
    x_res = (x_last - x_first) / (nx - 1) if nx > 1 else 1.0
    y_res = (y_last - y_first) / (ny - 1) if ny > 1 else 1.0
    return (x_first - x_res / 2, x_res, 0.0, y_first - y_res / 2, 0.0, y_res)


def cog_template(
    width: int,
    height: int,
    n_bands: int,
    chunk_x: int,
    chunk_y: int,
    x_first: float,
    x_last: float,
    y_first: float,
    y_last: float,
) -> dict:
    """The numbers a GTiff driver Create call needs (template COG):
    size, band count, ×128 block sizes, geotransform."""
    return {
        "width": int(width),
        "height": int(height),
        "n_bands": int(n_bands),
        "block_x": cog_block_size(chunk_x),
        "block_y": cog_block_size(chunk_y),
        "geotransform": cog_geotransform(x_first, x_last, width, y_first, y_last, height),
    }


def cog_block_layout(
    spark: SparkSession,
    width: int,
    height: int,
    n_bands: int,
    chunk_x: int,
    chunk_y: int,
) -> DataFrame:
    """One row per (band, block) write: offsets step by the CHUNK
    size (the read granularity, edk_accessor.py:140-160), extents
    clamp at the raster edge.  Pure Columns (range × sequence ×
    explode) so the layout of a 10⁶-block mosaic never materializes
    on the driver — it joins directly against the blocks table that
    feeds the writes."""
    return (
        spark.range(n_bands).withColumnRenamed("id", "band_idx")
        .withColumn(
            "xoff", F.explode(F.sequence(F.lit(0), F.lit(width - 1), F.lit(chunk_x)))
        )
        .withColumn(
            "yoff", F.explode(F.sequence(F.lit(0), F.lit(height - 1), F.lit(chunk_y)))
        )
        .select(
            "band_idx",
            "xoff",
            "yoff",
            F.least(F.lit(chunk_x), F.lit(width) - F.col("xoff")).alias("xsize"),
            F.least(F.lit(chunk_y), F.lit(height) - F.col("yoff")).alias("ysize"),
        )
    )
