"""kNN: k-ring candidate expansion + haversine re-rank (north_rule).

Absent in the reference (SURVEY.md §2.3 last row); the Spark-native
design:

  1. each query point expands to its quadgrid k-ring cells
     (driver-side — the query set is small) → (query_id, cell) rows,
     **broadcast**;
  2. equi-join points on cell → candidates (no shuffle of the big
     side);
  3. exact haversine distance as a codegen'd Column expression;
  4. ``row_number() over (partition by query_id order by dist, id)``
     ≤ K — the only shuffle, keyed by query_id (bounded cardinality =
     |queries|; candidates per query are ring-bounded, so no skew).

Ring sizing: ``ring_for_radius`` converts a search radius to the
Chebyshev ring count at the given resolution; ``knn_join`` can also
auto-grow the ring (multiplying by 2) until every query has ≥ K
candidates — each growth step is one cheap count job on the
candidate set only.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from earth_data_kit_spark.functions.columns import cell_id_col, haversine_m_col
from earth_data_kit_spark.grid import cells


def ring_for_radius(radius_m: float, res: int, at_lat: float = 0.0) -> int:
    """Smallest ring count whose cells cover a radius at a latitude."""
    cell_deg = 180.0 / (1 << res)
    deg = radius_m / 111320.0 / max(0.2, math.cos(math.radians(at_lat)))
    return max(1, math.ceil(deg / cell_deg))


def query_rings_df(
    spark: SparkSession,
    queries: list[tuple[int, float, float]],  # (query_id, lat, lon)
    res: int,
    ring: int,
) -> DataFrame:
    rows = []
    for qid, qlat, qlon in queries:
        c = cells.cell_id_single(qlon, qlat, res)
        for cell in cells.k_ring(c, ring):
            rows.append((qid, qlat, qlon, int(cell)))
    return spark.createDataFrame(rows, "query_id bigint, qlat double, qlon double, cell bigint")


def knn_join(
    points: DataFrame,
    queries: list[tuple[int, float, float]],
    k: int,
    res: int = 7,
    ring: int = 2,
    id_col: str = "page_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    auto_grow: bool = False,
    max_ring: int = 64,
) -> DataFrame:
    """Top-K nearest points per query → columns (query_id, rank,
    <id_col>, dist_m).  Exact within the ring radius; auto_grow
    verifies sufficiency and widens if any query is starved.
    """
    spark = points.sparkSession
    pts = points.withColumn("cell", cell_id_col(F.col(lon_col), F.col(lat_col), res))

    # Exactness guarantee for auto_grow: after finding ≥k candidates
    # at ring r, the k-th distance must not exceed the minimum
    # distance to any cell OUTSIDE the ring, lower-bounded by
    # (r-1) · cell_deg · 111194.9 · cos(highest |lat| the ring can
    # reach) — otherwise a closer point could hide outside, so grow.
    cell_deg = 180.0 / (1 << res)
    m_per_deg = math.pi / 180.0 * 6371000.0  # meridional meters/degree

    def _safe_radius(qlat: float, r: int) -> float:
        if r < 1:
            return 0.0
        edge_lat = min(89.0, abs(qlat) + r * cell_deg)
        return (r - 1) * cell_deg * m_per_deg * min(1.0, math.cos(math.radians(edge_lat)))

    while True:
        rings = query_rings_df(spark, queries, res, ring)
        cand = pts.join(F.broadcast(rings), "cell")
        if not auto_grow or ring >= max_ring:
            break
        dist0 = haversine_m_col(F.col("qlat"), F.col("qlon"), F.col(lat_col), F.col(lon_col))
        wk = Window.partitionBy("query_id").orderBy(F.col("dist_m").asc())
        kth = (
            cand.withColumn("dist_m", dist0)
            .withColumn("rn", F.row_number().over(wk))
            .where(F.col("rn") == k)
            .select("query_id", F.col("dist_m").alias("dk"))
            .collect()
        )
        dk = {r["query_id"]: r["dk"] for r in kth}
        qlat_by_id = {qid: qlat for qid, qlat, _ in queries}
        done = all(
            dk.get(qid) is not None and dk[qid] <= _safe_radius(qlat_by_id[qid], ring)
            for qid, _, _ in queries
        )
        if done:
            break
        ring = min(max_ring, ring * 2)

    dist = haversine_m_col(F.col("qlat"), F.col("qlon"), F.col(lat_col), F.col(lon_col))
    scored = cand.withColumn("dist_m", dist).select("query_id", id_col, "dist_m")
    return _topk(scored, k, id_col)


def _topk(scored: DataFrame, k: int, id_col: str) -> DataFrame:
    """Top-k per query with map-side pruning.

    A bare `row_number() over (partition by query_id)` shuffles EVERY
    candidate into ≤|queries| partitions — a parallelism ceiling and
    a skew trap (dense-cell queries).  Prune first: each input
    partition keeps its local k smallest per query (Arrow batch
    nsmallest), so the window shuffle carries ≤ k·partitions rows per
    query — the partial/final pattern applied to ranking.
    """
    import pandas as pd

    def local_prune(batches):
        for pdf in batches:
            if len(pdf):
                pdf = (
                    pdf.sort_values(["query_id", "dist_m", id_col])
                    .groupby("query_id", sort=False)
                    .head(k)
                )
            yield pdf

    pruned = scored.mapInPandas(
        local_prune, schema=f"query_id bigint, {id_col} bigint, dist_m double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dist_m").asc(), F.col(id_col).asc())
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "dist_m")
    )


def radius_join(
    points: DataFrame,
    queries: list[tuple[int, float, float]],
    radius_m: float,
    res: int = 7,
    id_col: str = "page_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Range join: all points within ``radius_m`` of each query —
    exact, because each query's ring is sized to cover the radius at
    its latitude (ring_for_radius) and the haversine filter refines.
    Same broadcast shape as kNN: the points side never shuffles.
    Output: (query_id, <id_col>, dist_m)."""
    spark = points.sparkSession
    rows = []
    for qid, qlat, qlon in queries:
        ring = ring_for_radius(radius_m, res, at_lat=qlat)
        c = cells.cell_id_single(qlon, qlat, res)
        for cell in cells.k_ring(c, ring):
            rows.append((qid, qlat, qlon, int(cell)))
    rings = spark.createDataFrame(
        rows, "query_id bigint, qlat double, qlon double, cell bigint"
    )
    pts = points.withColumn("cell", cell_id_col(F.col(lon_col), F.col(lat_col), res))
    dist = haversine_m_col(F.col("qlat"), F.col("qlon"), F.col(lat_col), F.col(lon_col))
    return (
        pts.join(F.broadcast(rings), "cell")
        .withColumn("dist_m", dist)
        .where(F.col("dist_m") <= radius_m)
        .select("query_id", id_col, "dist_m")
    )


def knn_brute_force(
    points: DataFrame,
    queries: list[tuple[int, float, float]],
    k: int,
    id_col: str = "page_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """O(points × queries) oracle: broadcast the queries, window topk.
    Also the correct plan when queries are few and no cell index
    exists yet (one scan, no index build)."""
    spark = points.sparkSession
    qdf = spark.createDataFrame(queries, "query_id bigint, qlat double, qlon double")
    dist = haversine_m_col(F.col("qlat"), F.col("qlon"), F.col(lat_col), F.col(lon_col))
    scored = (
        points.crossJoin(F.broadcast(qdf))
        .withColumn("dist_m", dist)
        .select("query_id", id_col, "dist_m")
    )
    return _topk(scored, k, id_col)
