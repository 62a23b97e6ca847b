"""Sketch rollups: approximate distincts and quantiles per cell.

At 100 TB, "how many distinct hosts/users per cell" is the query
that kills exact plans: COUNT(DISTINCT x) GROUP BY cell shuffles
every (cell, x) pair.  The sketch versions shuffle fixed-size state
per group instead:

* HyperLogLog++ (`approx_count_distinct`, Spark-native): ~1.5 KB per
  group at rsd=0.05, mergeable map-side — shuffle volume is
  |cells| × sketch size, independent of row count;
* t-digest-style quantiles (`approx_percentile` / `percentile_approx`):
  same partial/final mergeability for percentiles.

Both are JVM ImperativeAggregates inside whole-stage codegen — no
Python.  The same sketches double as the pyramid path: since HLL
state is mergeable, per-cell sketches at a fine level roll up to
ANY coarser level without rescanning rows (`rollup_distinct_up` —
exactly the hypertable-rollup shape the build brief names, done with
sketch merges instead of recounts).

Error contracts are pinned by tests against exact counts
(tests/test_sketches.py) — approximate operators without a measured
error bound are wishes, not operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from earth_data_kit_spark.functions.columns import cell_id_col


def cell_distinct_sketch(
    pages: DataFrame,
    distinct_col: str,
    res: int = 5,
    rsd: float = 0.05,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """(cell, n_pages, approx_distinct) per quadgrid cell — the
    HLL++ replacement for COUNT(DISTINCT) GROUP BY cell."""
    return (
        pages.withColumn("cell", cell_id_col(F.col(lon_col), F.col(lat_col), res))
        .groupBy("cell")
        .agg(
            F.count("*").alias("n_pages"),
            F.approx_count_distinct(distinct_col, rsd).alias("approx_distinct"),
        )
    )


def cell_quantile_sketch(
    pages: DataFrame,
    value_col: str,
    res: int = 5,
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    accuracy: int = 10_000,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """(cell, n, p50, p90, ... ) per cell via the mergeable
    approx_percentile aggregate; accuracy trades state size for
    error (1/accuracy relative rank error)."""
    pct = F.percentile_approx(
        F.col(value_col), F.array(*[F.lit(p) for p in percentiles]), F.lit(accuracy)
    )
    out = (
        pages.withColumn("cell", cell_id_col(F.col(lon_col), F.col(lat_col), res))
        .groupBy("cell")
        .agg(F.count("*").alias("n"), pct.alias("_q"))
    )
    for i, p in enumerate(percentiles):
        out = out.withColumn(f"p{int(p * 100)}", F.col("_q")[i])
    return out.drop("_q")


def rollup_distinct_up(
    pages: DataFrame,
    distinct_col: str,
    fine_res: int,
    coarse_res: int,
    rsd: float = 0.05,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Distinct-count pyramid over two levels in ONE scan.

    The DataFrame API doesn't expose HLL state as a re-aggregatable
    column, so sketch-merge across levels can't be written as
    agg-of-agg; the equivalent single-pass plan is grouping sets:
    ``rollup(coarse, fine)`` expands each row to both grouping keys
    inside the stage (Expand — no second scan) and one shared
    partial/final aggregation produces both levels' sketches.  The
    plan shape is asserted in tests (zero added scans vs the base).

    Returns (fine_df, coarse_df): approx distincts per fine cell
    (with its coarse parent) and per coarse cell."""
    cell_f = cell_id_col(F.col(lon_col), F.col(lat_col), fine_res)
    cell_c = cell_id_col(F.col(lon_col), F.col(lat_col), coarse_res)
    base = pages.withColumn("cell_fine", cell_f).withColumn("cell_coarse", cell_c)
    # one scan, both levels: grouping sets share the scan and the
    # partial-aggregation pass (Expand + single shuffle)
    both = base.rollup("cell_coarse", "cell_fine").agg(
        F.approx_count_distinct(distinct_col, rsd).alias("approx_distinct"),
        F.count("*").alias("n"),
    )
    fine = both.where(F.col("cell_fine").isNotNull()).select(
        "cell_fine", "cell_coarse", "approx_distinct", "n"
    )
    coarse = both.where(
        F.col("cell_fine").isNull() & F.col("cell_coarse").isNotNull()
    ).select("cell_coarse", "approx_distinct", "n")
    return fine, coarse
