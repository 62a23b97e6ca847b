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
