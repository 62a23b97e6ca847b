"""kNN (k-ring expansion + re-rank) vs brute-force oracle."""

import pytest

from earth_data_kit_spark.operators import knn
from earth_data_kit_spark.sources.pages import pages_meta_df

SF = "/root/testdata/sf0.001"

QUERIES = [
    (1, 41.33, 19.82),   # Tirana — dense cell
    (2, 51.0, 10.5),     # Germany centroid
    (3, -33.9, 151.2),   # Sydney — sparse
]


@pytest.fixture(scope="module")
def pages(spark):
    return pages_meta_df(spark, SF).cache()


def test_knn_matches_bruteforce(spark, pages):
    got = knn.knn_join(
        pages, QUERIES, k=5, res=6, ring=2, auto_grow=True, max_ring=128
    ).collect()
    exp = knn.knn_brute_force(pages, QUERIES, k=5).collect()
    key = lambda r: (r.query_id, r.rank, r.page_id)
    assert sorted(map(key, got)) == sorted(map(key, exp))
    # distances agree
    gd = {(r.query_id, r.rank): r.dist_m for r in got}
    for r in exp:
        assert abs(gd[(r.query_id, r.rank)] - r.dist_m) < 1e-6


def test_knn_k_rows_per_query(spark, pages):
    out = knn.knn_join(pages, QUERIES, k=3, res=6, ring=4, auto_grow=True, max_ring=128)
    counts = {r.query_id: r["count"] for r in out.groupBy("query_id").count().collect()}
    assert counts == {1: 3, 2: 3, 3: 3}


def test_ring_for_radius():
    assert knn.ring_for_radius(100_000, 7, at_lat=0.0) >= 1
    # higher latitude → wider ring for the same radius
    assert knn.ring_for_radius(500_000, 7, at_lat=70.0) >= knn.ring_for_radius(
        500_000, 7, at_lat=0.0
    )


def test_radius_join_exact_near_pole(spark):
    """ring_for_radius must size by the worst-case latitude the radius
    reaches — at 86-89° the longitudinal cell width collapses and the
    old center-latitude sizing (cos floored at 0.2) missed in-radius
    points.  Oracle: brute-force haversine."""
    import math

    import numpy as np

    rows = [
        (i, 86.0 + (i % 40) * 0.1, -180.0 + i * 4.7 % 360.0) for i in range(300)
    ]
    pts = spark.createDataFrame(rows, "page_id bigint, lat double, lon double")
    queries = [(1, 88.5, 10.0), (2, 87.0, -170.0)]
    radius = 250_000.0
    got = {
        (r.query_id, r.page_id)
        for r in knn.radius_join(pts, queries, radius_m=radius, res=6).collect()
    }

    def hav(lat1, lon1, lat2, lon2):
        a = (
            math.sin(math.radians(lat2 - lat1) / 2) ** 2
            + math.cos(math.radians(lat1))
            * math.cos(math.radians(lat2))
            * math.sin(math.radians(lon2 - lon1) / 2) ** 2
        )
        return 2 * 6371000.0 * math.asin(math.sqrt(min(1.0, a)))

    exp = {
        (qid, pid)
        for qid, qlat, qlon in queries
        for pid, plat, plon in rows
        if hav(qlat, qlon, plat, plon) <= radius
    }
    assert exp, "fixture must have in-radius points"
    assert got == exp


def test_topk_non_bigint_id(spark):
    """id_col is a public parameter — string ids must survive the
    map-side top-k prune (the Arrow schema splices the real dtype)."""
    rows = [(f"p{i:03d}", -10.0 + i * 0.1, 5.0 + i * 0.05) for i in range(100)]
    pts = spark.createDataFrame(rows, "name string, lat double, lon double")
    out = knn.knn_brute_force(pts, [(1, -9.0, 5.5)], k=3, id_col="name").collect()
    assert len(out) == 3
    assert all(isinstance(r.name, str) for r in out)
