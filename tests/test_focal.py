"""Focal/terrain operators (operators/focal.py) vs full-array numpy
oracles computed WITHOUT blocking — cross-block halo correctness is
exactly what the comparison pins."""

import math

import numpy as np
import pytest

from earth_data_kit_spark.operators.blocks import BLOCK_SCHEMA
from earth_data_kit_spark.operators.focal import focal_map

W, H, B = 300, 260, 128
GT = (10.0, 0.1, 0.0, 50.0, 0.0, -0.1)


def _dem():
    x, y = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    return (100.0 * np.sin(x / 23.0) + 80.0 * np.cos(y / 17.0) + 0.05 * ((x * 7 + y * 3) % 11)).astype(
        np.float32
    )


def _blocks_df(spark, arr, nodataval=float("nan")):
    rows = []
    h, w = arr.shape
    for by in range(0, h, B):
        for bx in range(0, w, B):
            sub = arr[by: by + B, bx: bx + B]
            rows.append(
                ("t", "B1", bx // B, by // B, bx, by, sub.shape[1], sub.shape[0],
                 "float32", nodataval, 1.0, 0.0, np.ascontiguousarray(sub).tobytes())
            )
    return spark.createDataFrame(rows, BLOCK_SCHEMA)


def _assemble(rows):
    out = np.full((H, W), np.nan, dtype=np.float32)
    for r in rows:
        a = np.frombuffer(r["payload"], dtype=np.float32).reshape(r["ysize"], r["xsize"])
        out[r["yoff"]: r["yoff"] + r["ysize"], r["xoff"]: r["xoff"] + r["xsize"]] = a
    return out


def _windows(padded, r):
    return np.lib.stride_tricks.sliding_window_view(padded, (2 * r + 1, 2 * r + 1))


@pytest.mark.parametrize("fn,r", [("mean", 1), ("mean", 3), ("max", 2), ("range", 1)])
def test_focal_stats_match_unblocked_oracle(spark, fn, r):
    dem = _dem()
    got = _assemble(
        [x.asDict() for x in focal_map(_blocks_df(spark, dem), (W, H), B, fn, radius=r).collect()]
    )
    win = _windows(np.pad(dem.astype(np.float64), r, mode="edge"), r)
    exp = {
        "mean": win.mean(axis=(2, 3)),
        "max": win.max(axis=(2, 3)),
        "range": win.max(axis=(2, 3)) - win.min(axis=(2, 3)),
    }[fn if fn != "range" else "range"]
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-4)


def test_slope_hillshade_vs_independent_horn_oracle(spark):
    dem = _dem()
    blocks = _blocks_df(spark, dem)
    # independent Horn oracle, written from the gdaldem spec on the
    # UNBLOCKED array
    z = np.pad(dem.astype(np.float64), 1, mode="edge")
    dzdx = ((z[:-2, 2:] + 2 * z[1:-1, 2:] + z[2:, 2:])
            - (z[:-2, :-2] + 2 * z[1:-1, :-2] + z[2:, :-2])) / (8 * 0.1)
    dzdy = ((z[2:, :-2] + 2 * z[2:, 1:-1] + z[2:, 2:])
            - (z[:-2, :-2] + 2 * z[:-2, 1:-1] + z[:-2, 2:])) / (8 * 0.1)
    slope_exp = np.degrees(np.arctan(np.hypot(dzdx, dzdy)))
    got = _assemble(
        [x.asDict() for x in focal_map(blocks, (W, H), B, "slope", gt=GT).collect()]
    )
    np.testing.assert_allclose(got, slope_exp, rtol=1e-5, atol=1e-4)

    az, alt = math.radians(315.0), math.radians(45.0)
    sl = np.arctan(np.hypot(dzdx, dzdy))
    asp = np.arctan2(dzdy, -dzdx)
    hs_exp = np.clip(
        255.0 * (math.sin(alt) * np.cos(sl) + math.cos(alt) * np.sin(sl) * np.cos(az - math.pi / 2 - asp)),
        0.0, 255.0,
    )
    got_hs = _assemble(
        [x.asDict() for x in focal_map(blocks, (W, H), B, "hillshade", gt=GT).collect()]
    )
    np.testing.assert_allclose(got_hs, hs_exp, rtol=1e-5, atol=1e-3)


def test_aspect_flat_sentinel(spark):
    flat = np.full((H, W), 42.0, dtype=np.float32)
    got = _assemble(
        [x.asDict() for x in focal_map(_blocks_df(spark, flat), (W, H), B, "aspect", gt=GT).collect()]
    )
    assert np.all(got == -9999.0)


def test_nodata_propagates_as_nan(spark):
    dem = _dem()
    dem[130, 140] = -32768.0
    got = _assemble(
        [x.asDict()
         for x in focal_map(_blocks_df(spark, dem, nodataval=-32768.0), (W, H), B, "mean").collect()]
    )
    # the 3×3 around the nodata pixel is NaN, elsewhere finite
    assert np.isnan(got[129:132, 139:142]).all()
    assert np.isfinite(got[125, 139]) and np.isfinite(got[133, 143])


def test_bad_fn_and_radius_raise(spark):
    dem = _dem()
    b = _blocks_df(spark, dem)
    with pytest.raises(ValueError):
        focal_map(b, (W, H), B, "median")
    with pytest.raises(ValueError):
        focal_map(b, (W, H), B, "mean", radius=0)
