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
    """Smallest ring count whose cells cover a radius at a latitude.

    Sized at the WORST-case latitude reachable within the radius
    (``|lat| + radius/111320``), where the longitudinal meter-width of
    a cell is smallest — sizing at the query's own latitude under-
    covers poleward radii.  When the radius reaches the pole the ring
    spans the full longitude circle (k_ring handles the wrap), so the
    join stays exact at any latitude."""
    cell_deg = 180.0 / (1 << res)
    nx = 2 << res
    full_lon = (nx + 1) // 2  # 2k+1 >= nx → k_ring covers every column
    radius_deg = radius_m / 111320.0
    lat_reach = abs(at_lat) + radius_deg
    y_ring = max(1, math.ceil(radius_deg / cell_deg))
    if lat_reach >= 89.9:
        return max(y_ring, full_lon)
    deg = radius_deg / math.cos(math.radians(lat_reach))
    return max(1, min(max(full_lon, y_ring), math.ceil(deg / cell_deg)))


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
    pts = points.select(id_col, lon_col, lat_col).withColumn(
        "cell", cell_id_col(F.col(lon_col), F.col(lat_col), res)
    )
    if auto_grow:
        # the growth loop re-joins the cell-indexed points once per
        # iteration — persist the (projected) index so every probe
        # reads the in-memory columns instead of rescanning the source
        # (this was the measured scaling bottleneck; at 100 TB this is
        # the persisted/checkpointed cell index that radius/kNN
        # queries share, with the lifetime the caller owns)
        pts = pts.persist()

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

    def _ring_for_dk(qlat: float, dk_m: float, start: int) -> int:
        r = start
        while r < max_ring and _safe_radius(qlat, r) < dk_m:
            r += 1
        return r

    try:
        cand = _grow_candidates(
            spark, pts, queries, res, ring, k, max_ring, auto_grow,
            lon_col, lat_col, _ring_for_dk,
        )
    finally:
        if auto_grow:
            # cache lifetime ends with the growth loop: every probe
            # pass read the in-memory index; the FINAL pass (the
            # returned lazy DataFrame) re-scans the source once —
            # same cost as the non-auto-grow path — instead of
            # pinning executor cache forever (ADVICE r2: repeated
            # calls in a long session accumulated cache)
            pts.unpersist()

    dist = haversine_m_col(F.col("qlat"), F.col("qlon"), F.col(lat_col), F.col(lon_col))
    scored = cand.withColumn("dist_m", dist).select("query_id", id_col, "dist_m")
    return _topk(scored, k, id_col)


def _grow_candidates(
    spark, pts, queries, res, ring, k, max_ring, auto_grow,
    lon_col, lat_col, _ring_for_dk,
):
    while True:
        rings = query_rings_df(spark, queries, res, ring)
        cand = pts.join(F.broadcast(rings), "cell")
        if not auto_grow or ring >= max_ring:
            break
        # ONE probe pass per iteration: per-query candidate count and
        # k-th distance together; |queries| rows collected (bounded).
        dist0 = haversine_m_col(F.col("qlat"), F.col("qlon"), F.col(lat_col), F.col(lon_col))
        wk = Window.partitionBy("query_id").orderBy(F.col("dist_m").asc())
        stats = (
            cand.withColumn("dist_m", dist0)
            .withColumn("rn", F.row_number().over(wk))
            .groupBy("query_id")
            .agg(
                F.count("*").alias("n"),
                F.min(F.when(F.col("rn") == k, F.col("dist_m"))).alias("dk"),
            )
            .collect()
        )
        by_q = {r["query_id"]: (r["n"], r["dk"]) for r in stats}
        # jump straight to the ring each query needs (instead of
        # blind doubling — one extra pass typically suffices):
        # * ≥k candidates → smallest ring whose safe radius covers dk
        # * starved → scale by sqrt(k/n) (candidates grow ~ring²)
        need = ring
        for qid, qlat, _ in queries:
            n, dk = by_q.get(qid, (0, None))
            if dk is not None:
                need = max(need, _ring_for_dk(qlat, dk, ring))
            else:
                grow = max(2.0, math.sqrt((k + 1) / max(n, 1)))
                need = max(need, math.ceil(ring * grow))
        if need <= ring:
            break
        ring = min(max_ring, need)
    return cand


def _topk(scored: DataFrame, k: int, id_col: str, prune_buckets: int = 64) -> DataFrame:
    """Top-k per query as a two-level window — entirely JVM-side.

    A bare ``row_number() over (partition by query_id)`` shuffles
    EVERY candidate into ≤|queries| partitions — a parallelism
    ceiling and a skew trap (dense-cell queries).  Level 1 windows
    over (query_id, pmod(xxhash64(id), B)): the shuffle spreads each
    query's candidates across B uniform buckets (no skew, B·|queries|
    parallelism) and keeps k per bucket; level 2 ranks the ≤ k·B
    survivors per query — the partial/final pattern applied to
    ranking.  Both stages are codegen'd window sorts; the earlier
    Arrow ``mapInPandas`` prune did the same reduction at Python
    speed and was ~15× slower on dense candidates (BENCH r2).
    """
    order = [F.col("dist_m").asc(), F.col(id_col).asc()]
    w1 = Window.partitionBy("query_id", "pbkt").orderBy(*order)
    pruned = (
        scored.withColumn("pbkt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(prune_buckets)))
        .withColumn("prn", F.row_number().over(w1))
        .where(F.col("prn") <= k)
        .drop("pbkt", "prn")
    )
    w2 = Window.partitionBy("query_id").orderBy(*order)
    return (
        pruned.withColumn("rank", F.row_number().over(w2))
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
