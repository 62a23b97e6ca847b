"""functions.hexbin: pointy-top axial hex binning.

Three gates: (1) geometric — cube rounding must assign every point
to its NEAREST hex center; (2) cross-engine — Spark and DuckDB
evaluate the one shared SQL fragment bit-identically; (3) plan —
pure codegen, no Python eval nodes.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from earth_data_kit_spark.functions.hexbin import (
    SQRT3,
    hex_bin,
    hex_center_sql,
    hex_qr_sql,
)

S3 = float(SQRT3)


def centers(q, r, size):
    return size * S3 * (q + r / 2.0), size * 1.5 * r


def test_nearest_center_property():
    rng = np.random.RandomState(5)
    size = 2.5
    pts = pd.DataFrame(
        {"x": rng.uniform(-50, 50, 4000), "y": rng.uniform(-40, 40, 4000)}
    )
    qs, rs = hex_qr_sql("x", "y", size)
    got = duckdb.connect().execute(
        f"SELECT {qs} AS q, {rs} AS r FROM pts"
    ).df()
    cx, cy = centers(got["q"].values, got["r"].values, size)
    d0 = np.hypot(pts["x"] - cx, pts["y"] - cy)
    # no neighboring hex center may be strictly closer
    for dq, dr in [(1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)]:
        nx, ny = centers(got["q"].values + dq, got["r"].values + dr, size)
        dn = np.hypot(pts["x"] - nx, pts["y"] - ny)
        assert (d0 <= dn + 1e-9).all()


def test_spark_duckdb_bit_identical(spark):
    rng = np.random.RandomState(6)
    pdf = pd.DataFrame(
        {"lon": rng.uniform(-180, 180, 3000), "lat": rng.uniform(-85, 85, 3000)}
    )
    out = (
        hex_bin(spark.createDataFrame(pdf), size=3.0)
        .select("lon", "lat", "hq", "hr")
        .toPandas()
        .sort_values(["lon"])
        .reset_index(drop=True)
    )
    qs, rs = hex_qr_sql("lon", "lat", 3.0)
    want = (
        duckdb.connect()
        .execute(f"SELECT lon, lat, {qs} AS hq, {rs} AS hr FROM pdf")
        .df()
        .sort_values(["lon"])
        .reset_index(drop=True)
    )
    assert (out["hq"].values == want["hq"].values).all()
    assert (out["hr"].values == want["hr"].values).all()


def test_center_inverse():
    # hex centers round-trip to themselves
    q0 = np.arange(-5, 6)
    grid = pd.DataFrame(
        [(q, r) for q in q0 for r in q0], columns=["q", "r"]
    )
    cxs, cys = hex_center_sql("q", "r", 2.0)
    qs, rs = hex_qr_sql(cxs, cys, 2.0)
    got = duckdb.connect().execute(
        f"SELECT q, r, {qs} AS q2, {rs} AS r2 FROM grid"
    ).df()
    assert (got["q"] == got["q2"]).all() and (got["r"] == got["r2"]).all()


def test_plan_pure_codegen(spark):
    df = hex_bin(
        spark.range(10).select(
            (F.col("id") * 1.5 - 5).alias("lon"), (F.col("id") * 0.7).alias("lat")
        ),
        size=2.0,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
