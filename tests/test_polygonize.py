"""Polygonize (operators/polygonize.py) vs a BFS/shapely-free numpy
oracle: regions recomputed by independent flood fill, every output
WKT rasterized BACK through the engine's own even-odd point-in-
polygon at pixel centers and required to reproduce its region's mask
exactly — shell, holes, cross-block stitching and all.  Plus
blocking invariance (the test_raster_properties.py pattern) and an
explicit donut/hole case."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from earth_data_kit_spark.grid import geom
from earth_data_kit_spark.operators.blocks import BLOCK_SCHEMA
from earth_data_kit_spark.operators.polygonize import polygonize


def _blocks_df(spark, arr: np.ndarray, block: int, nodata: float = float("nan")):
    h, w = arr.shape
    rows = []
    for by in range(0, h, block):
        for bx in range(0, w, block):
            v = arr[by : by + block, bx : bx + block].astype(np.float32)
            rows.append(
                ("t", "B1", bx // block, by // block, bx, by,
                 v.shape[1], v.shape[0], "float32", nodata, 1.0, 0.0,
                 v.tobytes())
            )
    return spark.createDataFrame(rows, BLOCK_SCHEMA).repartition(4)


def _flood_labels(arr: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Independent 4-connected labeling: plain BFS flood fill."""
    h, w = arr.shape
    lab = np.full((h, w), -1, dtype=np.int64)
    nxt = 0
    for sy in range(h):
        for sx in range(w):
            if not valid[sy, sx] or lab[sy, sx] >= 0:
                continue
            v = arr[sy, sx]
            stack = [(sy, sx)]
            lab[sy, sx] = nxt
            while stack:
                y, x = stack.pop()
                for ny, nx_ in ((y - 1, x), (y + 1, x), (y, x - 1), (y, x + 1)):
                    if (
                        0 <= ny < h and 0 <= nx_ < w
                        and valid[ny, nx_] and lab[ny, nx_] < 0
                        and arr[ny, nx_] == v
                    ):
                        lab[ny, nx_] = nxt
                        stack.append((ny, nx_))
            nxt += 1
    return lab


def _wkt_mask(wkt: str, w: int, h: int) -> np.ndarray:
    """Rasterize a pixel-lattice WKT back: PIP (shell minus holes) at
    pixel CENTERS — centers are never on lattice edges, so membership
    is unambiguous."""
    shell, holes = geom.parse_wkt_polygon(wkt)
    xs, ys = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
    return geom.point_in_polygon(
        xs.ravel(), ys.ravel(), shell, holes
    ).reshape(h, w)


def _roundtrip_check(spark, arr: np.ndarray, block: int, nodata=float("nan")):
    h, w = arr.shape
    valid = (
        np.ones(arr.shape, bool) if np.isnan(nodata) else arr != nodata
    )
    got = polygonize(
        _blocks_df(spark, arr, block, nodata), (w, h), block
    ).collect()
    oracle = _flood_labels(arr, valid)
    n_regions = int(oracle.max()) + 1
    assert len(got) == n_regions
    covered = np.zeros(arr.shape, bool)
    for r in got:
        mask = _wkt_mask(r["wkt"], w, h)
        assert not (mask & covered).any(), "overlapping polygons"
        covered |= mask
        # the mask must be exactly one oracle region
        ids = np.unique(oracle[mask])
        assert len(ids) == 1 and ids[0] >= 0, "polygon spans regions"
        exp = oracle == ids[0]
        assert np.array_equal(mask, exp), (
            f"region {r['region']} mask mismatch: {mask.sum()} vs {exp.sum()}"
        )
        assert r["n_px"] == int(exp.sum())
        assert r["value"] == pytest.approx(float(arr[exp][0]))
    assert np.array_equal(covered, valid)
    return got


def test_polygonize_random_blocky_roundtrip(spark):
    rng = np.random.default_rng(3)
    x, y = np.meshgrid(np.arange(96), np.arange(96))
    arr = (((x // 13) * 7 + (y // 11) * 3) % 4).astype(np.float64)
    # sprinkle random rectangles to create concavities and islands
    for _ in range(12):
        x0, y0 = rng.integers(0, 80, 2)
        arr[y0 : y0 + rng.integers(3, 14), x0 : x0 + rng.integers(3, 14)] = 9.0
    _roundtrip_check(spark, arr, 32)


def test_polygonize_blocking_invariance(spark):
    x, y = np.meshgrid(np.arange(96), np.arange(96))
    arr = (((x // 17) * 5 + (y // 7) * 2) % 3).astype(np.float64)
    a = polygonize(_blocks_df(spark, arr, 16), (96, 96), 16)
    b = polygonize(_blocks_df(spark, arr, 48), (96, 96), 48)
    wa = sorted((r["wkt"], r["n_px"]) for r in a.collect())
    wb = sorted((r["wkt"], r["n_px"]) for r in b.collect())
    assert wa == wb


def test_polygonize_donut_hole(spark):
    arr = np.zeros((48, 48))
    arr[8:40, 8:40] = 1.0   # ring region
    arr[16:32, 16:32] = 2.0  # center → the ring has a hole
    got = {r["value"]: r for r in _roundtrip_check(spark, arr, 16)}
    assert got[1.0]["n_rings"] == 2   # shell + hole
    assert got[2.0]["n_rings"] == 1
    assert got[0.0]["n_rings"] == 2   # background ring around 1.0


def test_polygonize_nodata_background(spark):
    arr = np.full((32, 32), 7.0)
    arr[:, :16] = 5.0
    arr[10:20, 10:20] = -1.0  # nodata hole crossing the split
    got = _roundtrip_check(spark, arr, 16, nodata=-1.0)
    assert len(got) == 2


def test_polygonize_diagonal_pinch(spark):
    """Two same-value pixels touching only diagonally are SEPARATE
    4-connected regions (each its own square); a region self-touching
    diagonally (U closed by a diagonal) splits shell/hole through the
    shared vertex without a bowtie."""
    arr = np.zeros((8, 8))
    arr[2, 2] = arr[3, 3] = 1.0  # diagonal pair → two regions
    got = _roundtrip_check(spark, arr, 4)
    ones = [r for r in got if r["value"] == 1.0]
    assert len(ones) == 2
    # self-touching: a 3x3 ring of 1s with its corner pixel removed →
    # still one region, its interior hole touches outside diagonally
    arr2 = np.zeros((8, 8))
    arr2[2:5, 2:5] = 1.0
    arr2[3, 3] = 0.0  # hole
    arr2[2, 2] = 0.0  # cut corner → hole touches exterior at (3,3)
    _roundtrip_check(spark, arr2, 4)


def test_polygonize_geo_transform(spark):
    arr = np.zeros((16, 16))
    arr[4:8, 4:12] = 3.0
    gt = (100.0, 0.5, 0.0, 40.0, 0.0, -0.25)
    got = polygonize(_blocks_df(spark, arr, 8), (16, 16), 8, gt=gt).collect()
    r3 = next(r for r in got if r["value"] == 3.0)
    shell, _ = geom.parse_wkt_polygon(r3["wkt"])
    assert shell[:, 0].min() == pytest.approx(100.0 + 4 * 0.5)
    assert shell[:, 0].max() == pytest.approx(100.0 + 12 * 0.5)
    assert shell[:, 1].max() == pytest.approx(40.0 - 4 * 0.25)
    assert shell[:, 1].min() == pytest.approx(40.0 - 8 * 0.25)


def test_polygonize_matches_region_label_stats(spark):
    from earth_data_kit_spark.operators.regions import region_label

    x, y = np.meshgrid(np.arange(64), np.arange(64))
    arr = (((x // 9) + (y // 9)) % 3).astype(np.float64)
    blocks = _blocks_df(spark, arr, 16)
    pol = polygonize(blocks, (64, 64), 16)
    reg = region_label(blocks, (64, 64), 16)
    a = sorted((r["region"], r["value"], r["n_px"]) for r in pol.collect())
    b = sorted((r["region"], r["value"], r["n_px"]) for r in reg.collect())
    assert a == b
