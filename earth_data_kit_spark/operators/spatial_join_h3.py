"""kNN / radius joins over the REAL H3-class hex index (grid/h3.py).

The north rule names "kNN queries (H3 k-ring expansion with distance
re-rank)" — this is that sentence running on the genuine aperture-7
icosahedral hex grid, with the same engine shapes as the quadgrid
(operators/knn.py) and S2 (operators/spatial_join_s2.py) twins:

* points side: ONE vectorized Arrow pass → ``_h3c`` cell id (or a
  stored ``cell_col`` — zero Python at query time);
* query side: per-row ``cover_cap`` inside an Arrow UDF + explode —
  rings materialize wherever the QUERY rows live, so a million-row
  query table distributes like any join side (table-to-table);
* candidate join: broadcast under a bounded query batch,
  shuffle-on-cell above it;
* refine: codegen'd haversine; top-k via the shared bucketed
  two-level ``knn._topk`` (skew-safe).

Exactness contract: ``cover_cap`` is a guaranteed SUPERSET of the
cells of all points within the cover radius (grid/h3.py — Lipschitz-
bounded gnomonic enumeration, property-tested across icosahedron
vertices/edges in tests/test_h3.py), so results are exact within the
cover radius; ``auto_grow`` doubles the radius until each query's
k-th distance is covered, reading ONE scalar per iteration (the
knn.py join-back pattern — no per-query collect).

Unlike the quadgrid/S2 twins (square cells, ring = integer levels)
the H3 growth variable is the cover RADIUS itself — continuous, so
auto-grow converges to the k-th distance directly instead of to the
next power-of-two ring that covers it.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from earth_data_kit_spark.functions.columns import haversine_m_col
from earth_data_kit_spark.grid import h3


def h3_cell_udf(res: int):
    """Arrow-vectorized (lon, lat) → H3-class cell id."""

    @pandas_udf("long")
    def _udf(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(h3.latlng_to_cell(lat.to_numpy(), lon.to_numpy(), res))

    return _udf


def res_for_radius(radius_m: float, target_cells: int = 200) -> int:
    """Finest res whose cover of ``radius_m`` stays ≈ ``target_cells``
    per query (cover cell count grows ~(radius/pitch)²)."""
    for res in range(h3.MAX_RES, -1, -1):
        approx = 3.5 * (radius_m / h3.min_cell_pitch_m(res)) ** 2 + 10
        if approx <= target_cells:
            return res
    return 0


def h3_query_cells(queries: DataFrame, res: int, radius_m) -> DataFrame:
    """Explode each query row to its cover-cap cells — an Arrow UDF
    over the QUERY table (no driver materialization).  ``radius_m``
    is a float (all queries) or a Column (per-query radii)."""
    rad = F.lit(float(radius_m)) if not isinstance(radius_m, F.Column) else radius_m

    @pandas_udf("array<long>")
    def _cover(qlat: pd.Series, qlon: pd.Series, r: pd.Series) -> pd.Series:
        lats, lons, rads = qlat.to_numpy(), qlon.to_numpy(), r.to_numpy()
        return pd.Series(
            [
                h3.cover_cap(float(la), float(lo), float(rm), res).tolist()
                for la, lo, rm in zip(lats, lons, rads)
            ]
        )

    return queries.select(
        "query_id",
        "qlat",
        "qlon",
        F.explode(_cover(F.col("qlat"), F.col("qlon"), rad)).alias("_h3c"),
    )


def _h3_indexed_points(
    points: DataFrame,
    id_col: str,
    lon_col: str,
    lat_col: str,
    cell_col: str | None,
    res: int,
) -> DataFrame:
    """Narrow (id, lon, lat, _h3c) projection BEFORE the join so the
    candidate stream and top-k shuffle carry 3 columns, not the full
    page row.  ``cell_col`` names a stored res-matched H3 column
    (computed once at ingest — zero Python on the points side)."""
    cols = [id_col, lon_col, lat_col] + ([cell_col] if cell_col else [])
    pts = points.select(*cols)
    if cell_col is None:
        return pts.withColumn("_h3c", h3_cell_udf(res)(F.col(lon_col), F.col(lat_col)))
    return pts.withColumnRenamed(cell_col, "_h3c")


def knn_join_h3(
    points: DataFrame,
    queries,
    k: int,
    res: int | None = None,
    radius_m: float = 100_000.0,
    id_col: str = "page_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    cell_col: str | None = None,
    auto_grow: bool = False,
    max_radius_m: float = 21_000_000.0,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Top-K nearest points per query over the H3-class hex index.

    ``queries`` is a DataFrame ``(query_id, qlat, qlon)`` or a python
    list of ``(id, lat, lon)``.  Results are exact within
    ``radius_m`` of each query; with ``auto_grow=True`` the radius
    doubles (one probe aggregate + ONE driver scalar per iteration)
    until every query's k-th candidate distance is inside the cover —
    then exactness is unconditional.  Output: (query_id, rank,
    <id_col>, dist_m)."""
    from earth_data_kit_spark.operators.knn import _topk, queries_df

    if res is None:
        res = res_for_radius(radius_m)
    spark = points.sparkSession
    qdf = queries_df(spark, queries)
    pts = _h3_indexed_points(points, id_col, lon_col, lat_col, cell_col, res)
    if auto_grow:
        pts = pts.persist()
    dist = haversine_m_col(F.col("qlat"), F.col("qlon"), F.col(lat_col), F.col(lon_col))

    def _cand(r_m: float) -> DataFrame:
        cov = h3_query_cells(qdf, res, r_m)
        return pts.join(F.broadcast(cov) if broadcast_queries else cov, "_h3c")

    try:
        while auto_grow and radius_m < max_radius_m:
            scored0 = _cand(radius_m).withColumn("dist_m", dist)
            n_df = scored0.groupBy("query_id").agg(F.count("*").alias("n"))
            # skew-safe probe (knn.py pattern): hash-agg count + the
            # bucketed two-level top-k for the k-th distance — never a
            # bare per-query window over every candidate
            dk_df = (
                _topk(scored0.select("query_id", id_col, "dist_m"), k, id_col)
                .where(F.col("rank") == k)
                .select("query_id", F.col("dist_m").alias("dk"))
            )
            full = qdf.join(n_df, "query_id", "left").join(dk_df, "query_id", "left")
            # k candidates whose k-th distance fits the cover → that
            # query is done (its needed radius is dk); starved (dk
            # null — fewer than k candidates, incl. zero) → double.
            need = F.when(
                F.col("dk").isNotNull() & (F.col("dk") <= F.lit(radius_m)),
                F.col("dk"),
            ).otherwise(F.lit(radius_m * 2.0))
            mx = full.agg(F.max(need).alias("need")).first()["need"]
            if mx is None or mx <= radius_m:
                break
            radius_m = min(max_radius_m, float(mx))
        cand = _cand(radius_m)
    finally:
        if auto_grow:
            # cache lifetime = the growth loop (knn.py contract): the
            # final lazy pass re-scans the source once
            pts.unpersist()

    scored = cand.withColumn("dist_m", dist).select("query_id", id_col, "dist_m")
    return _topk(scored, k, id_col)


def radius_join_h3(
    points: DataFrame,
    queries,
    radius_m: float,
    res: int | None = None,
    id_col: str = "page_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    cell_col: str | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """All points within ``radius_m`` of each query — exact by the
    cover_cap superset contract + haversine refine.  Output
    (query_id, <id_col>, dist_m)."""
    from earth_data_kit_spark.operators.knn import queries_df

    if res is None:
        res = res_for_radius(radius_m)
    spark = points.sparkSession
    cov = h3_query_cells(queries_df(spark, queries), res, radius_m)
    pts = _h3_indexed_points(points, id_col, lon_col, lat_col, cell_col, res)
    dist = haversine_m_col(F.col("qlat"), F.col("qlon"), F.col(lat_col), F.col(lon_col))
    return (
        pts.join(F.broadcast(cov) if broadcast_queries else cov, "_h3c")
        .withColumn("dist_m", dist)
        .where(F.col("dist_m") <= radius_m)
        .select("query_id", id_col, "dist_m")
    )
