"""Plan-shape assertions: the optimizations SURVEY.md §4 claims are
"built-in" must actually appear in the physical plans — predicate
pushdown to the parquet scan, column pruning, broadcast selection,
whole-stage codegen, partial aggregation, and no Python eval nodes in
pure-Column operators."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    df = li.where(F.col("l_shipdate") >= "1996-01-01").select("l_orderkey")
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in plan


def test_column_pruning_reaches_scan(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    df = li.select("l_orderkey", "l_quantity")
    plan = plan_of(df)
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_partition_pruning_analog_window_filter(spark):
    # blocks window filter prunes before any payload decode (R2):
    # the range predicates appear as data filters on metadata columns
    from earth_data_kit_spark.operators import blocks as B

    bl = B.synth_blocks_df(spark, 256, 256, 64)
    plan = plan_of(B.window_filter(bl, 0, 0, 10, 10).select("xoff", "yoff"))
    assert "Filter" in plan and "payload" not in plan.split("Filter")[0]


def test_broadcast_chosen_for_small_dims(spark):
    c = spark.read.parquet(f"{SF}/customer.parquet")
    n = spark.read.parquet(f"{SF}/nation.parquet")
    plan = plan_of(c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q1_partial_final_agg_and_codegen(spark):
    import __spark_entry__ as em

    plan = plan_of(em._q_rel_q1_pricing_summary(spark, SF))
    assert plan.count("HashAggregate") >= 2  # partial + final
    # (WholeStageCodegen markers only materialize in the AQE final
    # plan post-execution; partial/final + pushdown cover the intent)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_knn_candidate_join_is_broadcast(spark):
    from earth_data_kit_spark.operators.knn import knn_join
    from earth_data_kit_spark.sources.pages import pages_meta_df

    pages = pages_meta_df(spark, SF)
    df = knn_join(pages, [(1, 41.33, 19.82)], k=3, res=6, ring=2)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the whole kNN pipeline — cell index, ring join, haversine,
    # top-k — is JVM-only (the old Arrow prune was the bench
    # bottleneck on dense candidates)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # r7 top-k shape: ONE window whose row_number<=k filter plans a
    # map-side WindowGroupLimit (SPARK-37099) — each scan partition
    # keeps only its own top-k per query BEFORE the exchange (the
    # r2-era two-level bucketed prune re-implemented this reduction
    # and measured slower; see OPTIMIZATION_r07.md)
    assert "WindowGroupLimit" in plan, plan
    assert "Window" in plan


def test_bucketed_join_is_colocated_no_exchange(spark, tmp_path):
    """The SCALE.md co-location claim, executed: two tables bucketed
    by cell with the same bucket count join WITHOUT shuffling either
    side (no Exchange above the scans) — the stored-table layout the
    100 TB pages table would use for repeated cell joins."""
    from earth_data_kit_spark.functions.columns import cell_id_col
    from earth_data_kit_spark.sources.pages import pages_meta_df

    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdb LOCATION '{tmp_path}/wh'")
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        pages = pages_meta_df(spark, SF).withColumn(
            "cell", cell_id_col(F.col("lon"), F.col("lat"), 5)
        )
        (
            pages.write.bucketBy(8, "cell").sortBy("cell")
            .mode("overwrite").saveAsTable("bdb.pages_b")
        )
        (
            pages.groupBy("cell").count().write.bucketBy(8, "cell").sortBy("cell")
            .mode("overwrite").saveAsTable("bdb.cells_b")
        )
        # force the sort-merge path (broadcast would hide the
        # co-location property this layout exists for)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bdb.pages_b").join(
            spark.table("bdb.cells_b").withColumnRenamed("count", "n"), "cell"
        )
        assert joined.count() == pages.count()
        plan = plan_of(joined)  # AQE final plan, post-execution
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.sql("DROP DATABASE IF EXISTS bdb CASCADE")


def test_dynamic_partition_pruning_on_part_key(spark, tmp_path):
    """DPP: a fact table partitioned by the coarse cell prefix joined
    against a FILTERED dim produces a dynamicpruning subquery on the
    partition column — only matching partitions are scanned (the
    free partition pruning the storage layout section claims)."""
    from earth_data_kit_spark.functions.columns import cell_id_col
    from earth_data_kit_spark.sources.pages import pages_meta_df

    pages = pages_meta_df(spark, SF).withColumn(
        "part", cell_id_col(F.col("lon"), F.col("lat"), 2)
    )
    fact = str(tmp_path / "fact")
    pages.write.partitionBy("part").mode("overwrite").parquet(fact)
    dim = str(tmp_path / "dim")
    (
        pages.select("part").distinct()
        .withColumn("keep", (F.col("part") % 3 == 0).cast("int"))
        .write.mode("overwrite").parquet(dim)
    )
    joined = spark.read.parquet(fact).join(
        spark.read.parquet(dim).where("keep = 1"), "part"
    )
    joined.count()  # DPP subqueries materialize in the AQE final plan
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan.lower(), plan


def test_cell_expr_is_codegen_only(spark):
    from earth_data_kit_spark.functions.columns import cell_id_col
    from earth_data_kit_spark.sources.pages import pages_meta_df

    df = pages_meta_df(spark, SF).withColumn(
        "cell", cell_id_col(F.col("lon"), F.col("lat"), 7)
    ).groupBy("cell").count()
    plan = plan_of(df)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_runtime_bloom_filter_prunes_shuffle_join(spark, tmp_path):
    """The 100 TB fallback path for pip_join (covering side too big to
    broadcast → shuffle join on cell, SCALE.md J1 row) benefits from
    Spark's runtime Bloom-filter injection: the big side is pre-
    filtered by a bloom built from the selective small side, cutting
    the shuffled volume before the exchange.  Assert the optimizer
    actually injects it under the documented knobs."""
    old = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        ),
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "10GB"
        ),
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
    }
    try:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        fact_dir, dim_dir = str(tmp_path / "f"), str(tmp_path / "d")
        spark.range(0, 200_000).withColumn("cell", F.col("id") % 50_000).write.parquet(fact_dir)
        spark.range(0, 64).withColumn("cell", F.col("id") * 7).write.parquet(dim_dir)
        fact = spark.read.parquet(fact_dir)
        dim = spark.read.parquet(dim_dir).where(F.col("id") < 8)
        j = fact.join(dim, "cell")
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in opt.lower(), opt
        # and the join result is still exact
        assert j.count() == fact.join(F.broadcast(dim), "cell").count()
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
