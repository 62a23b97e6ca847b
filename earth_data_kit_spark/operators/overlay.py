"""Polygon × polygon overlay join with exact intersection areas.

The missing third member of the spatial-join family: ``pip_join``
joins points to polygons, ``knn``/``radius_join`` join points to
points — this joins POLYGON TABLES to POLYGON TABLES (parcels ×
admin zones, tiles × AOIs), returning every interior-intersecting
pair with its exact intersection area.  Beyond-reference surface:
the reference's only join is points×polygons (J1,
/root/reference/earth_data_kit/stitching/classes/dataset.py:252-274).

Plan shape (Spark-first, zero driver geometry):

1. ``polygons.normalize_polygons_df`` both sides (bbox of WKT rows
   via one Arrow UDF over the polygon table).
2. ``polygons.covering_cells_df`` both sides — quadgrid covering as
   two ``explode(sequence)`` Column nodes, IN-PLAN.
3. Hash EQUI-join on ``cell`` (broadcast under
   ``polygons.BROADCAST_MAX_POLYGONS``, shuffle-on-cell above —
   co-located when both tables are stored cell-partitioned).
4. Report-once dedup WITHOUT a shuffle: a pair seen in k shared
   cells is kept only in the CANONICAL cell — the cell containing
   the intersection bbox's north-west corner
   ``(greatest(xmin), least(ymax))`` — a pure-Column filter (the
   classic PBSM trick).  Pairs touching an antimeridian-wrapped
   rectangle fall back to ``dropDuplicates`` (rare; documented).
5. Refine: rect×rect pairs get a pure-Column exact area
   (codegen, no Python); any pair with a WKT side goes through the
   Arrow-batched ``overlay_area_udf`` (``grid.clip``: Sutherland–
   Hodgman for convex partners, band-trapezoid decomposition for
   concave×concave, inclusion–exclusion for holes).  Exact, planar
   degrees².

Scale posture: candidates are O(Σ per-cell |A|·|B|) — bounded by the
covering resolution exactly like pip_join; skewed mega-cells respond
to the same ``res`` knob.  Geometry (wkt) rides the candidate rows;
for vertex-heavy layers store a slim (code, cell) covering and
join geometry back by code (the ``knn`` join-back shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from earth_data_kit_spark.functions.columns import cell_id_col
from earth_data_kit_spark.operators import polygons as P

_CANON = ["code", "wkt", "xmin", "ymin", "xmax", "ymax"]


def _suffix(df: DataFrame, suffix: str) -> DataFrame:
    return df.select(
        [F.col(c).alias(c + suffix) for c in df.columns]
    )


def overlay_join(
    a: DataFrame,
    b: DataFrame,
    res: int = 7,
    suffixes: tuple[str, str] = ("_a", "_b"),
    area_col: str = "area",
    broadcast_covering: bool | None = None,
    keep_nonoverlapping: bool = False,
) -> DataFrame:
    """All interior-intersecting polygon pairs of ``a`` × ``b`` with
    exact intersection area.

    Inputs follow the ``normalize_polygons_df`` contract (``code`` +
    ``wkt`` and/or ``xmin/ymin/xmax/ymax``; extra columns carried
    through).  Output: every column of both sides suffixed with
    ``suffixes`` plus ``area_col`` (planar degrees²), one row per
    pair with ``area > 0`` (boundary-touching pairs are dropped; pass
    ``keep_nonoverlapping=True`` to keep every bbox-candidate pair
    with its area, 0.0 included — the "intersects-candidates" mode).

    ``broadcast_covering``: None → count side ``b``'s polygons (one
    scalar aggregate job) and broadcast its covering under
    ``polygons.BROADCAST_MAX_POLYGONS``; True/False force it.
    Antimeridian: wrapped rectangles (xmin > xmax) participate in
    the join and the pair predicate, but their AREA is null (planar
    areas across the wrap are ill-defined without a reprojection).
    """
    sa, sb = suffixes
    na = P.normalize_polygons_df(a)
    nb = P.normalize_polygons_df(b)
    if broadcast_covering is None:
        broadcast_covering = nb.count() < P.BROADCAST_MAX_POLYGONS
    cov_a = _suffix(P.covering_cells_df(na, res), sa).withColumnRenamed(
        "cell" + sa, "cell"
    )
    cov_b = _suffix(P.covering_cells_df(nb, res), sb).withColumnRenamed(
        "cell" + sb, "cell"
    )
    cand = cov_a.join(
        F.broadcast(cov_b) if broadcast_covering else cov_b, "cell"
    )

    c = {k: F.col(k + sa) for k in _CANON}
    d = {k: F.col(k + sb) for k in _CANON}
    wrap_a = c["xmin"] > c["xmax"]
    wrap_b = d["xmin"] > d["xmax"]
    any_wrap = wrap_a | wrap_b

    # bbox overlap (interior): straight interval test for unwrapped
    # pairs, disjunction when one side wraps, always-true when both
    # wrap (both lon ranges contain the antimeridian)
    lon_ab = (c["xmin"] < d["xmax"]) & (d["xmin"] < c["xmax"])
    lon_aw = (d["xmin"] < c["xmax"]) | (d["xmax"] > c["xmin"])
    lon_bw = (c["xmin"] < d["xmax"]) | (c["xmax"] > d["xmin"])
    lon_ok = (
        F.when(wrap_a & wrap_b, F.lit(True))
        .when(wrap_a, lon_aw)
        .when(wrap_b, lon_bw)
        .otherwise(lon_ab)
    )
    lat_ok = (c["ymin"] < d["ymax"]) & (d["ymin"] < c["ymax"])
    cand = cand.where(lon_ok & lat_ok)

    # report-once: keep the pair only in the canonical shared cell —
    # the one containing the intersection bbox's NW corner (inside
    # both bboxes, hence inside both coverings)
    canon = cell_id_col(
        F.greatest(c["xmin"], d["xmin"]), F.least(c["ymax"], d["ymax"]), res
    )
    no_wrap = cand.where(~any_wrap).where(F.col("cell") == canon)
    wrapped = cand.where(any_wrap).dropDuplicates(
        ["code" + sa, "code" + sb]
    )
    pairs = no_wrap.unionByName(wrapped)

    rect_rect = c["wkt"].isNull() & d["wkt"].isNull()
    rect_area = F.greatest(
        F.lit(0.0), F.least(c["xmax"], d["xmax"]) - F.greatest(c["xmin"], d["xmin"])
    ) * F.greatest(
        F.lit(0.0), F.least(c["ymax"], d["ymax"]) - F.greatest(c["ymin"], d["ymin"])
    )
    from earth_data_kit_spark.functions.udfs import overlay_area_udf

    wkt_area = overlay_area_udf(
        c["wkt"], c["xmin"], c["ymin"], c["xmax"], c["ymax"],
        d["wkt"], d["xmin"], d["ymin"], d["xmax"], d["ymax"],
    )
    area = (
        F.when(any_wrap, F.lit(None).cast("double"))
        .when(rect_rect, rect_area)
        .otherwise(wkt_area)
    )
    out = pairs.withColumn(area_col, area)
    if not keep_nonoverlapping:
        out = out.where(F.col(area_col).isNull() | (F.col(area_col) > 0.0))
    drop = [
        k + s for s in (sa, sb) for k in ("wkt", "xmin", "ymin", "xmax", "ymax")
    ]
    return out.drop("cell", *drop)
