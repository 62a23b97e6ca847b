"""Polygon side of the flagship join family AS A DATAFRAME.

``pip_join`` / ``zonal_stats`` / ``rasterize`` historically took a
driver-side ``list[Polygon]`` and broadcast its covering — the right
call for country tables (10²–10³ rows), a dead end for a
million-polygon parcels layer (reference analog: the flagship J1
nested loop, /root/reference/earth_data_kit/stitching/classes/
dataset.py:252-274, whose polygon side is equally driver-bound).
This module is the distributed twin (VERDICT r5 task 3): the polygon
side stays a DataFrame end-to-end, its covering is generated
IN-PLAN, and the probe join is broadcast under a row threshold /
shuffle-on-cell above it.

Three building blocks, all pure Column plans (the ``knn.query_cells``
pattern — two ``explode(sequence(...))`` nodes, zero Python in the
covering):

* ``normalize_polygons_df`` — canonicalize any (code, wkt?, bbox?)
  polygon table to ``code, wkt, xmin, ymin, xmax, ymax``; the bbox of
  WKT rows is computed by one Arrow-batched UDF over the POLYGON
  table (O(polygons) work, runs wherever the polygon rows live).
* ``covering_cells_df`` — quadgrid covering of each polygon bbox at
  ``res``, cell-for-cell identical to ``grid.cells.covering_bbox``
  including antimeridian wrap (xmin > xmax ⇒ the x-range wraps
  through nx), as ``explode(sequence)`` columns.
* ``pixel_tiles`` — the gt-space analog for raster operators: explode
  each bbox to the (tile_x, tile_y) squares of a ``tile``-pixel grid,
  so blocks×polygons becomes an equi-join on (ptx, pty) instead of a
  broadcast nested-loop bbox theta join.

Scale posture: covering and bbox prep are map-side over the polygon
table; the probe side never collects anything; geometry (wkt) rides
the candidate rows — for very vertex-heavy polygons prefer a slim
(code, cell) covering + join-back by code, the same auto-grow
join-back shape knn.py uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from earth_data_kit_spark.functions.columns import RES_SHIFT_MULT, X_SHIFT_MULT
from earth_data_kit_spark.grid.cells import nx_ny

#: below this many polygon rows the covering is broadcast (matches
#: the list-path pip_join threshold); above it the join shuffles both
#: sides on ``cell`` — co-located if the probe table is stored
#: cell-partitioned (SCALE.md).
BROADCAST_MAX_POLYGONS = 10_000


def normalize_polygons_df(polys: DataFrame) -> DataFrame:
    """Canonicalize a polygon DataFrame to
    ``code, wkt, xmin, ymin, xmax, ymax``.

    Accepted inputs: a ``code`` column plus EITHER ``wkt`` (POLYGON
    text; bbox derived in-plan via an Arrow UDF) OR bbox columns
    ``xmin/ymin/xmax/ymax`` (rectangles; ``wkt`` null), or both mixed
    (per-row: wkt non-null wins for the refine, bbox non-null rows
    may keep their explicit box — e.g. pre-wrapped antimeridian
    rectangles)."""
    cols = set(polys.columns)
    if "code" not in cols:
        raise ValueError("polygons DataFrame needs a 'code' column")
    has_wkt = "wkt" in cols
    has_bbox = {"xmin", "ymin", "xmax", "ymax"} <= cols
    if not has_wkt and not has_bbox:
        raise ValueError(
            "polygons DataFrame needs 'wkt' or xmin/ymin/xmax/ymax columns"
        )
    out = polys
    if has_bbox:
        # A polygon table built from pandas in a session without Arrow
        # delivers missing doubles as NaN, not NULL — which silently
        # fails every isNull gate below (missing bboxes never derived,
        # coverings collapse).  Correctness must not depend on
        # spark.sql.execution.arrow.pyspark.enabled: normalize first.
        for c in ("xmin", "ymin", "xmax", "ymax"):
            out = out.withColumn(
                c, F.when(F.isnan(F.col(c)), F.lit(None)).otherwise(F.col(c))
            )
    if not has_wkt:
        out = out.withColumn("wkt", F.lit(None).cast("string"))
    if not has_bbox:
        from earth_data_kit_spark.functions.udfs import wkt_bbox_udf

        out = out.withColumn("_bb", wkt_bbox_udf(F.col("wkt"))).select(
            "*",
            F.col("_bb.xmin").alias("xmin"),
            F.col("_bb.ymin").alias("ymin"),
            F.col("_bb.xmax").alias("xmax"),
            F.col("_bb.ymax").alias("ymax"),
        ).drop("_bb")
    elif has_wkt:
        # mixed table: fill missing boxes of wkt rows in-plan
        from earth_data_kit_spark.functions.udfs import wkt_bbox_udf

        need = F.col("wkt").isNotNull() & F.col("xmin").isNull()
        bb = wkt_bbox_udf(F.col("wkt"))
        out = (
            out.withColumn("_bb", F.when(need, bb))
            .withColumn("xmin", F.coalesce("xmin", "_bb.xmin"))
            .withColumn("ymin", F.coalesce("ymin", "_bb.ymin"))
            .withColumn("xmax", F.coalesce("xmax", "_bb.xmax"))
            .withColumn("ymax", F.coalesce("ymax", "_bb.ymax"))
            .drop("_bb")
        )
    canon = ["code", "wkt", "xmin", "ymin", "xmax", "ymax"]
    extra = [c for c in out.columns if c not in canon]
    return out.select(*canon, *extra)


def covering_cells_df(norm: DataFrame, res: int) -> DataFrame:
    """Quadgrid covering of each polygon's bbox at ``res``, IN-PLAN.

    Input: the ``normalize_polygons_df`` schema.  Output: one row per
    (polygon, covering cell) — columns ``cell`` + the input columns —
    produced by two ``explode(sequence(...))`` nodes, bit-identical
    to ``grid.cells.covering_bbox`` (same clipped float→int cell
    arithmetic as ``functions.columns.cell_id_col``, same wrapped
    x-range for antimeridian boxes where xmin > xmax)."""
    nx, ny = nx_ny(res)

    def _cx(lon):
        return F.least(
            F.greatest(
                F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(nx)).cast(
                    "bigint"
                ),
                F.lit(0).cast("bigint"),
            ),
            F.lit(nx - 1).cast("bigint"),
        )

    def _cy(lat):
        return F.least(
            F.greatest(
                F.floor((F.lit(90.0) - lat) / F.lit(180.0) * F.lit(ny)).cast(
                    "bigint"
                ),
                F.lit(0).cast("bigint"),
            ),
            F.lit(ny - 1).cast("bigint"),
        )

    x0, x1 = _cx(F.col("xmin")), _cx(F.col("xmax"))
    y0, y1 = _cy(F.col("ymax")), _cy(F.col("ymin"))  # y grows southward
    # covering_bbox parity: straight span when xmin<=xmax, wrapped
    # span (x0..nx-1 then 0..x1 — x0 may repeat in the degenerate
    # wrap, exactly as the list helper) when the box crosses ±180
    span_x = F.when(
        F.col("xmin") <= F.col("xmax"), x1 - x0 + F.lit(1).cast("bigint")
    ).otherwise(F.lit(nx).cast("bigint") - x0 + x1 + F.lit(1).cast("bigint"))
    base = norm.select(
        "*", x0.alias("_x0"), span_x.alias("_spanx"), y0.alias("_y0"), y1.alias("_y1")
    )
    ex = base.withColumn(
        "_dx", F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("_spanx") - 1))
    ).withColumn("_yy", F.explode(F.sequence(F.col("_y0"), F.col("_y1"))))
    xx = F.pmod(F.col("_x0") + F.col("_dx"), F.lit(nx).cast("bigint"))
    cell = (
        F.lit(res).cast("bigint") * F.lit(RES_SHIFT_MULT)
        + xx * F.lit(X_SHIFT_MULT)
        + F.col("_yy")
    )
    keep = [c for c in norm.columns]
    return ex.select(cell.alias("cell"), *keep)


def refine_predicate_cols(lon_col: str, lat_col: str) -> "F.Column":
    """Exact PIP refine against CARRIED geometry columns (the
    DataFrame-side twin of ``spatial_join.refine_predicate``):
    wkt-null rows are rectangles — pure codegen comparisons,
    antimeridian-aware (xmin > xmax ⇒ longitude disjunction) —
    wkt rows go through the vectorized per-batch-cached ray-cast."""
    from earth_data_kit_spark.functions.udfs import pip_refine_wkt_udf

    lon, lat = F.col(lon_col), F.col(lat_col)
    lon_in = F.when(
        F.col("xmin") <= F.col("xmax"),
        (lon >= F.col("xmin")) & (lon <= F.col("xmax")),
    ).otherwise((lon >= F.col("xmin")) | (lon <= F.col("xmax")))
    rect_ok = (
        F.col("wkt").isNull()
        & lon_in
        & (lat >= F.col("ymin"))
        & (lat <= F.col("ymax"))
    )
    poly_ok = F.col("wkt").isNotNull() & pip_refine_wkt_udf(lon, lat, F.col("wkt"))
    return rect_ok | poly_ok


# ------------------------------------------------------- raster side


def pixel_tiles(
    df: DataFrame, lo_x, hi_x, lo_y, hi_y, tile: int
) -> DataFrame:
    """Explode rows to the (ptx, pty) squares of a ``tile``-pixel grid
    covering the inclusive pixel range [lo_x, hi_x] × [lo_y, hi_y]
    (Column expressions in PIXEL coordinates).  The gt-space analog of
    ``covering_cells_df``: turns blocks × polygons bbox intersection
    into an equi-join on (ptx, pty) — shuffleable, broadcastable,
    AQE-planable — instead of a broadcast nested-loop theta join."""
    t = F.lit(float(tile))
    ex = df.withColumn(
        "ptx",
        F.explode(
            F.sequence(
                F.floor(lo_x / t).cast("bigint"), F.floor(hi_x / t).cast("bigint")
            )
        ),
    ).withColumn(
        "pty",
        F.explode(
            F.sequence(
                F.floor(lo_y / t).cast("bigint"), F.floor(hi_y / t).cast("bigint")
            )
        ),
    )
    return ex


def polygons_pixel_bbox(norm: DataFrame, gt: tuple) -> DataFrame:
    """Map each polygon's geo bbox to inclusive PIXEL bounds
    ``p_lo_x, p_hi_x, p_lo_y, p_hi_y`` on the raster grid ``gt``
    (axis-aligned; yres < 0 flips are handled by the min/max)."""
    x0, xres, _, y0, _, yres = (float(g) for g in gt)
    px_a = (F.col("xmin") - F.lit(x0)) / F.lit(xres)
    px_b = (F.col("xmax") - F.lit(x0)) / F.lit(xres)
    py_a = (F.col("ymin") - F.lit(y0)) / F.lit(yres)
    py_b = (F.col("ymax") - F.lit(y0)) / F.lit(yres)
    return norm.select(
        "*",
        F.least(px_a, px_b).alias("p_lo_x"),
        F.greatest(px_a, px_b).alias("p_hi_x"),
        F.least(py_a, py_b).alias("p_lo_y"),
        F.greatest(py_a, py_b).alias("p_hi_y"),
    )
