"""Rasterize: vector→raster burn (the inverse of zonal_stats).

Polygons burned into a blocks-schema raster on a supplied
geotransform grid — GDAL's ``RasterizeLayer`` semantics (pixel-center
membership, later layers overwrite) restated as a three-stage Spark
plan.  Together with ``zonal.zonal_stats`` (raster→per-polygon) and
``spatial_join.pip_join`` (points→polygons) this closes the
raster↔vector triangle the north rule names; the output composes
directly with every block operator and sink (``gtiff.export_cog``,
``blocks.block_mean``, ``sources/cog.cog_scan`` roundtrip).

Stages:

1. Block grid NATIVELY: ``spark.range(n_bx * n_by)`` → (bx, by,
   pixel window) as pure Columns — the grid is distributed from
   birth, never a driver list (a 10^6-block mosaic is a range, not
   a collect).
2. Broadcast-join the tiny polygon table on bbox∩block interval
   overlap (LEFT join: blocks no polygon touches stay, burn to
   nodata fill — a raster has every pixel).
3. One grouped Arrow stage per block: paint nodata, then burn each
   intersecting polygon in list order (later polygons overwrite,
   GDAL layer semantics) by pixel-center rectangle closed-form or
   ray-cast mask.  The shuffle that groups (block × polygon) pairs
   carries polygon METADATA rows only — pixels are born inside the
   Arrow stage and leave as encoded payloads.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from earth_data_kit_spark.grid import geom
from earth_data_kit_spark.operators.spatial_join import Polygon


def _pairs_left_df(
    g: DataFrame, polygons: DataFrame, gt: tuple, tile_px: int
) -> DataFrame:
    """LEFT (block × polygon) pairs with a DATAFRAME polygon side:
    both sides exploded onto a ``tile_px`` pixel grid in-plan and
    equi-joined on (ptx, pty) — LEFT so untouched blocks survive to
    burn nodata.  Requires ``burn_v``/``burn_ord`` columns on the
    polygon table (a distributed table has no list order).  Pairs
    sharing several tiles are deduped on (block, burn_ord); strays
    whose exact bbox misses the block simply burn an empty mask."""
    from earth_data_kit_spark.operators import polygons as P

    norm = P.polygons_pixel_bbox(P.normalize_polygons_df(polygons), gt)
    missing = {"burn_v", "burn_ord"} - set(norm.columns)
    if missing:
        raise ValueError(
            f"DataFrame rasterize needs explicit {sorted(missing)} columns"
        )
    pside = P.pixel_tiles(
        norm,
        F.col("p_lo_x"), F.col("p_hi_x"), F.col("p_lo_y"), F.col("p_hi_y"),
        tile_px,
    ).select(
        "ptx", "pty", "burn_ord", "burn_v", "wkt",
        F.col("xmin").alias("pxmin"), F.col("ymin").alias("pymin"),
        F.col("xmax").alias("pxmax"), F.col("ymax").alias("pymax"),
    )
    bside = P.pixel_tiles(
        g,
        F.col("xoff").cast("double"),
        (F.col("xoff") + F.col("xsize") - 1).cast("double"),
        F.col("yoff").cast("double"),
        (F.col("yoff") + F.col("ysize") - 1).cast("double"),
        tile_px,
    )
    return (
        bside.join(pside, ["ptx", "pty"], "left")
        .drop("ptx", "pty")
        .dropDuplicates(["block_x", "block_y", "burn_ord"])
    )


def rasterize(
    spark: SparkSession,
    polygons: "list[Polygon] | DataFrame",
    gt: tuple,
    width: int,
    height: int,
    values: dict[str, float] | None = None,
    block: int = 256,
    dtype: str = "int16",
    nodata: float = 0.0,
    band: str = "B1",
    tile_px: int = 1024,
) -> DataFrame:
    """Burn ``polygons`` into a (height, width) raster on ``gt``,
    returned as the standard blocks schema.  ``values`` maps polygon
    code → burn value (default: 1-based position in ``polygons``).
    Later list entries overwrite earlier ones where they overlap.

    ``polygons`` may instead be a **DataFrame** (VERDICT r5 task 3)
    with `code` + `wkt`/bbox columns plus ``burn_v`` (value) and
    ``burn_ord`` (explicit overwrite order — a distributed table has
    no list order, so determinism must be declared): the polygon side
    is exploded onto a ``tile_px`` pixel grid in-plan and LEFT
    equi-joined to the block grid on the tile key (blocks no polygon
    touches still emit nodata — a raster has every pixel), with no
    driver materialization at any polygon count."""
    if gt[2] != 0 or gt[4] != 0:
        raise ValueError("rasterize requires an axis-aligned geotransform")
    x0, xres, _, y0, _, yres = (float(g) for g in gt)

    if isinstance(polygons, DataFrame):
        polys = None  # df path joins below
    else:
        vals = values or {p.code: float(i + 1) for i, p in enumerate(polygons)}
        poly_rows = []
        for i, p in enumerate(polygons):
            if p.bbox is not None:
                xmin, ymin, xmax, ymax = (float(v) for v in p.bbox)
                wkt = None
            else:
                shell, _holes = geom.parse_wkt_polygon(p.wkt)
                xmin, ymin, xmax, ymax = geom.polygon_bbox(shell)
                wkt = p.wkt
            poly_rows.append((i, float(vals[p.code]), xmin, ymin, xmax, ymax, wkt))
        polys = spark.createDataFrame(
            pd.DataFrame(
                poly_rows,
                columns=["burn_ord", "burn_v", "pxmin", "pymin", "pxmax", "pymax", "wkt"],
            ),
            "burn_ord int, burn_v double, pxmin double, pymin double, "
            "pxmax double, pymax double, wkt string",
        )

    n_bx, n_by = -(-width // block), -(-height // block)
    grid = (
        spark.range(n_bx * n_by)
        .select(
            (F.col("id") % n_bx).cast("int").alias("block_x"),
            (F.col("id") / n_bx).cast("int").alias("block_y"),
        )
        .withColumn("xoff", F.col("block_x") * block)
        .withColumn("yoff", F.col("block_y") * block)
        .withColumn("xsize", F.least(F.lit(block), F.lit(width) - F.col("xoff")))
        .withColumn("ysize", F.least(F.lit(block), F.lit(height) - F.col("yoff")))
    )
    bx0 = F.lit(x0) + F.col("xoff") * F.lit(xres)
    bx1 = F.lit(x0) + (F.col("xoff") + F.col("xsize")) * F.lit(xres)
    by0 = F.lit(y0) + F.col("yoff") * F.lit(yres)
    by1 = F.lit(y0) + (F.col("yoff") + F.col("ysize")) * F.lit(yres)
    g = grid.withColumn("bxmin", F.least(bx0, bx1)).withColumn(
        "bxmax", F.greatest(bx0, bx1)
    ).withColumn("bymin", F.least(by0, by1)).withColumn("bymax", F.greatest(by0, by1))

    if polys is not None:
        pairs = g.join(
            F.broadcast(polys),
            (F.col("bxmin") <= F.col("pxmax"))
            & (F.col("bxmax") >= F.col("pxmin"))
            & (F.col("bymin") <= F.col("pymax"))
            & (F.col("bymax") >= F.col("pymin")),
            "left",
        )
    else:
        pairs = _pairs_left_df(g, polygons, gt, tile_px)

    npdt = np.dtype(dtype)

    def burn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        r0 = pdf.iloc[0]
        xs_n, ys_n = int(r0["xsize"]), int(r0["ysize"])
        arr = np.full((ys_n, xs_n), nodata, dtype=npdt)
        xs = x0 + (np.arange(r0["xoff"], r0["xoff"] + xs_n) + 0.5) * xres
        ys = y0 + (np.arange(r0["yoff"], r0["yoff"] + ys_n) + 0.5) * yres
        lon, lat = np.meshgrid(xs, ys)
        hit = pdf[pdf["burn_ord"].notna()].sort_values("burn_ord")
        for _, r in hit.iterrows():
            if r["wkt"] is None or (isinstance(r["wkt"], float) and pd.isna(r["wkt"])):
                mask = (
                    (lon >= r["pxmin"]) & (lon <= r["pxmax"])
                    & (lat >= r["pymin"]) & (lat <= r["pymax"])
                )
            else:
                shell, holes = geom.parse_wkt_polygon(r["wkt"])
                mask = geom.point_in_polygon(
                    lon.ravel(), lat.ravel(), shell, holes
                ).reshape(arr.shape)
            arr[mask] = npdt.type(r["burn_v"])
        return pd.DataFrame(
            [{
                "tile_name": "rasterize", "band": band,
                "block_x": int(key[0]), "block_y": int(key[1]),
                "xoff": int(r0["xoff"]), "yoff": int(r0["yoff"]),
                "xsize": xs_n, "ysize": ys_n, "dtype": dtype,
                "nodataval": float(nodata), "scale": 1.0, "offset": 0.0,
                "payload": arr.tobytes(),
            }]
        )

    from earth_data_kit_spark.operators.blocks import BLOCK_SCHEMA

    return pairs.groupBy("block_x", "block_y").applyInPandas(burn, schema=BLOCK_SCHEMA)
