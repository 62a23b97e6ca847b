"""The oracle-parity linchpin: the shared pages CTE must produce
bit-identical rows in Spark SQL, DuckDB, and the numpy twins."""

import duckdb
import numpy as np
import pytest

from earth_data_kit_spark.functions.columns import cell_id_sql, haversine_m_sql
from earth_data_kit_spark.grid import cells, geom
from earth_data_kit_spark.sources.pages import pages_cte_sql, synth_pages_df

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def frames(spark):
    q = (
        f"WITH pages AS ({pages_cte_sql(reps=2)}) "
        f"SELECT page_id, url, tld, lang, lat, lon, ts_s, "
        f"{cell_id_sql('lon', 'lat', 7)} AS cell, "
        f"{haversine_m_sql('lat', 'lon', '41.33', '19.82')} AS d "
        f"FROM pages ORDER BY page_id"
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    ddf = con.execute(q).fetchdf()
    spark.read.parquet(f"{SF}/documents.parquet").createOrReplaceTempView("documents")
    sdf = spark.sql(q).toPandas()
    return ddf, sdf


def test_spark_duckdb_bit_identical(frames):
    ddf, sdf = frames
    assert len(ddf) == len(sdf) > 0
    for col in ["page_id", "url", "tld", "lang", "lat", "lon", "ts_s", "cell"]:
        assert np.array_equal(ddf[col].values, sdf[col].values), col
    # trig differs by ulps across libms — must stay within rounding slack
    assert np.abs(ddf["d"].values - sdf["d"].values).max() < 1e-6


def test_numpy_twins_match(frames):
    ddf, _ = frames
    np_cell = cells.cell_id(ddf["lon"].values, ddf["lat"].values, 7)
    assert np.array_equal(np_cell, ddf["cell"].values)
    np_d = geom.haversine_m(ddf["lat"].values, ddf["lon"].values, 41.33, 19.82)
    assert np.abs(np_d - ddf["d"].values).max() < 1e-6


def test_extractor_invariant_through_udf(spark):
    """Per-row invariant (input_hint): text extracted inside the
    pandas UDF is byte-identical to the single-node oracle."""
    from pyspark.sql import functions as F

    from earth_data_kit_spark.functions.udfs import extract_text_udf
    from earth_data_kit_spark.sources.pages import expected_text
    from earth_data_kit_spark.text.extract import text_sha256

    pages = synth_pages_df(spark, SF)
    rows = (
        pages.select("page_id", "text", extract_text_udf(F.col("html")).alias("extracted"))
        .orderBy("page_id")
        .limit(200)
        .collect()
    )
    assert len(rows) == 200
    for r in rows:
        exp = expected_text(r.text, r.page_id)
        assert r.extracted == exp, r.page_id
        assert text_sha256(r.extracted) == text_sha256(exp)
