"""Tile-pyramid rollup: hierarchical cell aggregates across zoom
levels (north_star: "raster-to-vector tile pyramid assignment").

The scalable shape: aggregate the data ONCE at the finest resolution,
then roll the *aggregates* up level by level (each level is built
from the previous level's output, which is |cells|-sized, not
|rows|-sized — the map-pyramid build every tile server uses).
Parent derivation is pure integer arithmetic on the quadgrid id
(grid/cells.py): for id = r·2⁵⁸ + x·2²⁹ + y,

    parent = (r−1)·2⁵⁸ + ⌊x/2⌋·2²⁹ + ⌊y/2⌋

so the whole pyramid stays in whole-stage codegen — no UDFs, and the
same formula runs in DuckDB for the oracle cross-check.
"""

from __future__ import annotations

from functools import reduce

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_RES_MULT = 1 << 58
_X_MULT = 1 << 29


def parent_cell_col(cell: Column) -> Column:
    """Parent quadgrid cell id, one resolution up (pure arithmetic)."""
    r = F.floor(cell / _RES_MULT)
    x = F.floor(cell / _X_MULT) % _X_MULT
    y = cell % _X_MULT
    return ((r - 1) * _RES_MULT + F.floor(x / 2) * _X_MULT + F.floor(y / 2)).cast("bigint")


def parent_cell_sql(cell: str) -> str:
    """DuckDB/Spark-SQL twin of parent_cell_col."""
    r = f"CAST(floor(({cell}) / {_RES_MULT}.0) AS BIGINT)"
    x = f"(CAST(floor(({cell}) / {_X_MULT}.0) AS BIGINT) % {_X_MULT})"
    y = f"(({cell}) % {_X_MULT})"
    return (
        f"(({r} - 1) * {_RES_MULT} + CAST(floor({x} / 2.0) AS BIGINT) * {_X_MULT}"
        f" + CAST(floor({y} / 2.0) AS BIGINT))"
    )


def pyramid_rollup(
    df: DataFrame,
    cell_col: str,
    res: int,
    min_res: int,
    agg_cols: dict[str, Column] | None = None,
) -> DataFrame:
    """Aggregate per cell at ``res``, then roll up to ``min_res``.

    Output: (res, cell, n [, extra aggregates]) for every level in
    [min_res, res].  Extra aggregates must be reaggregatable sums —
    supply them as {name: sum_expression_over_base_rows}; levels
    above the base re-sum the sums.
    """
    aggs = {"n": F.count("*").cast("bigint"), **(agg_cols or {})}
    base = (
        df.groupBy(F.col(cell_col).alias("cell"))
        .agg(*[v.alias(k) for k, v in aggs.items()])
        .withColumn("res", F.lit(res).cast("bigint"))
    )
    levels = [base]
    cur = base
    for r in range(res - 1, min_res - 1, -1):
        cur = (
            cur.groupBy(parent_cell_col(F.col("cell")).alias("cell"))
            .agg(*[
                (F.sum(k).cast("bigint") if k == "n" else F.sum(k)).alias(k)
                for k in aggs
            ])
            .withColumn("res", F.lit(r).cast("bigint"))
        )
        levels.append(cur)
    out = reduce(lambda a, b: a.unionByName(b), levels)
    return out.select("res", "cell", *aggs.keys())


def h3_parent_udf():
    """Arrow-vectorized H3-class parent (grid/h3.py center-containment
    parenting — geometric, so a UDF rather than bit math; see the
    quadgrid ``parent_cell_col`` for the arithmetic-index contrast)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _udf(cell: pd.Series) -> pd.Series:
        from earth_data_kit_spark.grid import h3

        return pd.Series(h3.parent(cell.to_numpy()))

    return _udf


def pyramid_rollup_h3(
    df: DataFrame,
    cell_col: str,
    res: int,
    min_res: int,
    agg_cols: dict[str, Column] | None = None,
) -> DataFrame:
    """``pyramid_rollup`` over the aperture-7 H3-class hierarchy: the
    hex analog rolls ~7 children into each parent per level.  Same
    scale shape — the base aggregate is the only |rows|-sized job;
    every level above re-aggregates |cells|-sized output, so the
    parent UDF (Arrow, one pass per level) runs over cell counts,
    never row counts.  Output: (res, cell, n [, extras])."""
    aggs = {"n": F.count("*").cast("bigint"), **(agg_cols or {})}
    parent = h3_parent_udf()
    base = (
        df.groupBy(F.col(cell_col).alias("cell"))
        .agg(*[v.alias(k) for k, v in aggs.items()])
        .withColumn("res", F.lit(res).cast("bigint"))
    )
    levels = [base]
    cur = base
    for r in range(res - 1, min_res - 1, -1):
        cur = (
            cur.groupBy(parent(F.col("cell")).alias("cell"))
            .agg(*[
                (F.sum(k).cast("bigint") if k == "n" else F.sum(k)).alias(k)
                for k in aggs
            ])
            .withColumn("res", F.lit(r).cast("bigint"))
        )
        levels.append(cur)
    out = reduce(lambda a, b: a.unionByName(b), levels)
    return out.select("res", "cell", *aggs.keys())
