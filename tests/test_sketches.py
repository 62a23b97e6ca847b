"""Sketch rollups (operators/sketches.py): measured error bounds vs
exact answers, and plan shape (single scan for the rollup)."""

import pytest
from pyspark.sql import functions as F

from earth_data_kit_spark.functions.columns import cell_id_col
from earth_data_kit_spark.operators.sketches import (
    cell_distinct_sketch,
    cell_quantile_sketch,
    rollup_distinct_up,
)
from earth_data_kit_spark.sources.pages import pages_meta_df

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def pages(spark):
    return pages_meta_df(spark, SF)


def test_distinct_sketch_error_bound(spark, pages):
    approx = {r.cell: r.approx_distinct for r in cell_distinct_sketch(pages, "url", res=3).collect()}
    exact = {
        r.cell: r.d
        for r in pages.withColumn("cell", cell_id_col(F.col("lon"), F.col("lat"), 3))
        .groupBy("cell")
        .agg(F.countDistinct("url").alias("d"))
        .collect()
    }
    assert set(approx) == set(exact)
    # HLL++ rsd=0.05 → allow 3 standard deviations (15%) + small-count slack
    for cell, d in exact.items():
        assert abs(approx[cell] - d) <= max(3, 0.15 * d), (cell, approx[cell], d)


def test_quantile_sketch_error_bound(spark, pages):
    """percentile_approx promises RANK accuracy (±1/accuracy), not
    value proximity — on gapped distributions the value can jump —
    so the bound is checked on the achieved rank of the returned
    value within each cell."""
    got = {r.cell: (r.p50, r.p90) for r in cell_quantile_sketch(pages, "lat", res=2).collect()}
    vals = {}
    for r in (
        pages.withColumn("cell", cell_id_col(F.col("lon"), F.col("lat"), 2))
        .select("cell", "lat")
        .collect()
    ):
        vals.setdefault(r.cell, []).append(r.lat)
    for cell, (p50, p90) in got.items():
        xs = sorted(vals[cell])
        n = len(xs)
        rank50 = sum(1 for x in xs if x <= p50) / n
        rank90 = sum(1 for x in xs if x <= p90) / n
        slack = max(0.02, 2.0 / n)  # rank error + tiny-cell slack
        assert 0.5 - slack <= rank50 <= 0.5 + slack, (cell, rank50, n)
        assert 0.9 - slack <= rank90 <= 0.9 + slack, (cell, rank90, n)


def test_rollup_single_scan_and_consistency(spark, pages):
    fine, coarse = rollup_distinct_up(pages, "url", fine_res=4, coarse_res=2)
    f = fine.collect()
    c = {r.cell_coarse: r.approx_distinct for r in coarse.collect()}
    # every fine cell's coarse parent is present, and the coarse
    # approx is >= any single child's approx (distincts only merge up)
    # within sketch error
    for r in f:
        assert r.cell_coarse in c
        assert c[r.cell_coarse] >= 0.8 * r.approx_distinct
    # single-pass plan: the grouping-sets rollup adds ZERO scans over
    # the base pages plan (Expand duplicates rows in-stage instead of
    # re-reading), and the two levels share one aggregate pipeline
    plan = fine._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]  # AQE repeats the tree
    base_plan = pages._jdf.queryExecution().executedPlan().toString()
    base_plan = base_plan.split("== Initial Plan ==")[0]
    assert "Expand" in plan
    assert plan.count("Scan parquet") <= max(1, base_plan.count("Scan parquet"))


def test_distinct_sketch_is_jvm_only(spark, pages):
    plan = cell_distinct_sketch(pages, "url", res=3)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
