"""Driver rows retired in r6 stay oracle-pinned HERE (the
retirement contract in __spark_entry__.queries()'s docstring):
geo_pip_polygon (convex pentagon ray-cast refine), rel_q6_forecast
(TPC-H Q6 selective filter + agg arithmetic), geo_pip_concave
(concave+holed ray-cast, now a strict subset of geo_pip_table),
rel_q14_promo_share (conditional-aggregate ratio) and
rel_q18_large_orders (HAVING-sum join-back ordered limit) run Spark
vs DuckDB at sf0.01 exactly as the driver gate would."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from earth_data_kit_spark.sources.pages import pages_cte_sql

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in ("documents", "lineitem", "part", "orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


def _compare(sdf: pd.DataFrame, ddf: pd.DataFrame) -> None:
    sdf, ddf = _normalize(sdf), _normalize(ddf)
    assert list(sdf.columns) == list(ddf.columns)
    assert len(sdf) == len(ddf)
    for c in sdf.columns:
        a, b = sdf[c].values, ddf[c].values
        if np.issubdtype(sdf[c].dtype, np.floating):
            assert np.allclose(a.astype(float), b.astype(float), rtol=0, atol=1e-9)
        else:
            assert (a == b).all()


def test_retired_geo_pip_polygon(spark, ddb):
    pentagon = entrymod.PENTAGON
    sql = f"""
WITH pages AS ({pages_cte_sql()}),
hp AS (
  SELECT page_id,
    {" AND ".join(
        f"(({x2!r} - {x1!r}) * (lat - {y1!r}) - ({y2!r} - {y1!r}) * (lon - {x1!r})) > 0"
        for (x1, y1), (x2, y2) in zip(pentagon, pentagon[1:] + pentagon[:1])
    )} AS inside
  FROM pages
)
SELECT page_id, 'P5' AS code FROM hp WHERE inside
"""
    sdf = entrymod._q_geo_pip_polygon(spark, SF).toPandas()
    ddf = ddb.execute(sql).fetchdf()
    assert len(sdf) > 0
    _compare(sdf, ddf)


def test_retired_rel_q6_forecast(spark, ddb):
    sql = """
SELECT
  round(CAST(sum(l_extendedprice * l_discount) AS DOUBLE), 2) AS revenue,
  count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""
    sdf = entrymod._q_rel_q6_forecast(spark, SF).toPandas()
    ddf = ddb.execute(sql).fetchdf()
    assert sdf["n_rows"].iloc[0] > 0
    _compare(sdf, ddf)


def test_retired_geo_pip_concave(spark, ddb):
    sql = f"""
WITH pages AS ({pages_cte_sql()})
SELECT page_id, 'CC' AS code
FROM pages
WHERE (
     (lon > 10 AND lon < 18 AND lat > 35 AND lat < 55)
  OR (lon >= 18 AND lon < 30 AND lat > 35 AND lat < 44)
  OR (lon >= 18 AND lon < 30 AND lat > 52 AND lat < 55)
)
AND NOT (lon > 20 AND lon < 24 AND lat > 36 AND lat < 39)
"""
    sdf = entrymod._q_geo_pip_concave(spark, SF).toPandas()
    ddf = ddb.execute(sql).fetchdf()
    assert len(sdf) > 0
    _compare(sdf, ddf)


def test_retired_rel_q14_promo_share(spark, ddb):
    sql = """
SELECT
  round(CAST(sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) AS DOUBLE)
        / CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE) * 1e2, 6) AS promo_share_pct,
  count(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-02-01 00:00:00'
"""
    sdf = entrymod._q_rel_q14_promo_share(spark, SF).toPandas()
    ddf = ddb.execute(sql).fetchdf()
    assert sdf["n_rows"].iloc[0] > 0
    _compare(sdf, ddf)


def test_retired_rel_q18_large_orders(spark, ddb):
    sql = """
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 190
)
SELECT c_custkey, c_name, l_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS order_day,
  round(o_totalprice, 2) AS o_totalprice,
  round(CAST(total_qty AS DOUBLE), 2) AS total_qty
FROM big JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, l_orderkey ASC
LIMIT 50
"""
    sdf = entrymod._q_rel_q18_large_orders(spark, SF).toPandas()
    ddf = ddb.execute(sql).fetchdf()
    assert len(sdf) > 0
    _compare(sdf, ddf)
