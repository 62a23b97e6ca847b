"""overlay_join: polygon×polygon pairs with exact intersection area.

Oracles: closed-form rectangle algebra (exact in float for integer
coordinates), the grid.clip numpy core (itself Monte-Carlo-validated
in test_clip_geometry), and symmetry (A⋈B == B⋈A areas).
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from earth_data_kit_spark.grid import clip as C
from earth_data_kit_spark.operators.overlay import overlay_join

CONCAVE_WKT = (
    "POLYGON ((10 35, 30 35, 30 44, 18 44, 18 52, 30 52, 30 55, 10 55, 10 35),"
    " (20 36, 24 36, 24 39, 20 39))"
)
# disjoint rectangle decomposition of the shell minus the hole
CC_RECTS = [(10, 35, 18, 55), (18, 35, 30, 44), (18, 52, 30, 55)]
CC_HOLE = (20, 36, 24, 39)


def rect_overlap(a, b):
    w = min(a[2], b[2]) - max(a[0], b[0])
    h = min(a[3], b[3]) - max(a[1], b[1])
    return max(w, 0.0) * max(h, 0.0)


def rects_df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["code", "xmin", "ymin", "xmax", "ymax"]),
        "code string, xmin double, ymin double, xmax double, ymax double",
    )


@pytest.fixture(scope="module")
def parcels(spark):
    rows = [
        (f"p{i}_{j}", float(i * 7 - 35), float(j * 6 - 24),
         float(i * 7 - 25), float(j * 6 - 14))
        for i in range(8)
        for j in range(8)
    ]
    return rows, rects_df(spark, rows)


def test_rect_rect_exact(spark, parcels):
    rows, adf = parcels
    zones = [("Z1", -20.0, -10.0, 15.0, 20.0), ("Z2", 0.0, 0.0, 40.0, 30.0)]
    out = overlay_join(adf, rects_df(spark, zones), res=5).collect()
    got = {(r.code_a, r.code_b): r.area for r in out}
    want = {}
    for code, *ra in rows:
        for zc, *rz in zones:
            a = rect_overlap(ra, rz)
            if a > 0:
                want[(code, zc)] = a
    assert got == want  # exact: integer-coordinate rectangles


def test_report_once_across_cells(spark):
    # one huge pair covering many res-6 cells must appear exactly once
    a = rects_df(spark, [("big", -90.0, -45.0, 90.0, 45.0)])
    b = rects_df(spark, [("alsobig", -60.0, -30.0, 120.0, 60.0)])
    rows = overlay_join(a, b, res=6).collect()
    assert len(rows) == 1
    assert rows[0].area == pytest.approx(150.0 * 75.0)


def test_wkt_concave_hole_vs_rect_decomposition(spark, parcels):
    rows, adf = parcels
    cc = spark.createDataFrame(
        pd.DataFrame({"code": ["CC"], "wkt": [CONCAVE_WKT]}),
        "code string, wkt string",
    )
    got = {
        r.code_a: r.area
        for r in overlay_join(adf, cc, res=5).collect()
    }
    want = {}
    for code, *ra in rows:
        area = sum(rect_overlap(ra, rz) for rz in CC_RECTS) - rect_overlap(
            ra, CC_HOLE
        )
        if area > 0:
            want[code] = area
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k


def test_symmetry_wkt_wkt(spark):
    rng = np.random.RandomState(3)

    def blob(code, cx, cy):
        ang = np.sort(rng.uniform(0, 2 * np.pi, 9))
        rad = rng.uniform(2.0, 8.0, 9)
        pts = ", ".join(
            f"{cx + r * np.cos(t):.4f} {cy + r * np.sin(t):.4f}"
            for t, r in zip(ang, rad)
        )
        first = pts.split(",")[0].strip()
        return code, f"POLYGON (({pts}, {first}))"

    aa = [blob(f"a{i}", rng.uniform(-20, 20), rng.uniform(-15, 15)) for i in range(12)]
    bb = [blob(f"b{i}", rng.uniform(-20, 20), rng.uniform(-15, 15)) for i in range(12)]
    adf = spark.createDataFrame(pd.DataFrame(aa, columns=["code", "wkt"]))
    bdf = spark.createDataFrame(pd.DataFrame(bb, columns=["code", "wkt"]))
    ab = {
        (r.code_a, r.code_b): r.area
        for r in overlay_join(adf, bdf, res=5).collect()
    }
    ba = {
        (r.code_b, r.code_a): r.area
        for r in overlay_join(bdf, adf, res=5).collect()
    }
    assert set(ab) == set(ba) and len(ab) > 0
    for k, v in ab.items():
        assert v == pytest.approx(ba[k], rel=1e-9)
    # pin a few against the numpy core directly
    wa = dict(aa)
    wb = dict(bb)
    for (ca, cb), v in list(ab.items())[:5]:
        assert v == pytest.approx(
            C.wkt_intersection_area(wa[ca], wb[cb]), rel=1e-12
        )


def test_antimeridian_rect_pair_area_null(spark):
    a = rects_df(spark, [("AM", 170.0, -10.0, -170.0, 10.0)])  # wraps
    b = rects_df(spark, [("E", 175.0, -5.0, 179.0, 5.0), ("W", -179.0, -5.0, -175.0, 5.0), ("FAR", 0.0, -5.0, 10.0, 5.0)])
    rows = overlay_join(a, b, res=5).collect()
    got = {r.code_b for r in rows}
    assert got == {"E", "W"}
    assert all(r.area is None for r in rows)


def test_plan_is_hash_equi_join(spark):
    a = rects_df(spark, [("x", 0.0, 0.0, 1.0, 1.0)])
    b = rects_df(spark, [("y", 0.5, 0.5, 2.0, 2.0)])
    plan = (
        overlay_join(a, b, res=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan or "SortMergeJoin" in plan


def test_extra_columns_carried(spark):
    a = rects_df(spark, [("x", 0.0, 0.0, 10.0, 10.0)]).withColumn(
        "pop", F.lit(7)
    )
    b = rects_df(spark, [("y", 5.0, 5.0, 20.0, 20.0)])
    row = overlay_join(a, b, res=5).collect()[0]
    assert row.pop_a == 7 and row.area == pytest.approx(25.0)
