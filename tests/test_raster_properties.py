"""Property tests for the round-5 raster operators: random small
rasters / windows vs independent oracles.  Sizes stay tiny so each
example is one fast Spark job; the value is the RANDOM block
alignments and degenerate shapes the fixed tests can't enumerate."""

from collections import Counter

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from earth_data_kit_spark.operators.blocks import BLOCK_SCHEMA
from earth_data_kit_spark.operators.focal import focal_map
from earth_data_kit_spark.operators.regions import region_label


def _blocks_df(spark, arr, block):
    rows = []
    h, w = arr.shape
    for by in range(0, h, block):
        for bx in range(0, w, block):
            sub = np.ascontiguousarray(arr[by: by + block, bx: bx + block])
            rows.append(
                ("t", "B1", bx // block, by // block, bx, by,
                 sub.shape[1], sub.shape[0], "float32", float("nan"),
                 1.0, 0.0, sub.tobytes())
            )
    return spark.createDataFrame(rows, BLOCK_SCHEMA)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    w=st.integers(3, 40), h=st.integers(3, 40),
    block=st.sampled_from([4, 7, 16]),
    nvals=st.integers(1, 3), seed=st.integers(0, 2**31 - 1),
)
def test_regions_match_bfs_on_random_rasters(spark, w, h, block, nvals, seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, nvals, (h, w)).astype(np.float32)
    got = Counter(
        (r["value"], r["n_px"], r["xmin"], r["ymin"], r["xmax"], r["ymax"])
        for r in region_label(_blocks_df(spark, arr, block), (w, h), block).collect()
    )
    # BFS oracle
    seen = np.zeros((h, w), dtype=bool)
    exp = Counter()
    for sy in range(h):
        for sx in range(w):
            if seen[sy, sx]:
                continue
            v = arr[sy, sx]
            stack = [(sy, sx)]
            seen[sy, sx] = True
            n = 0
            x0 = x1 = sx
            y0 = y1 = sy
            while stack:
                y, x = stack.pop()
                n += 1
                x0, x1 = min(x0, x), max(x1, x)
                y0, y1 = min(y0, y), max(y1, y)
                for yy, xx in ((y - 1, x), (y + 1, x), (y, x - 1), (y, x + 1)):
                    if 0 <= yy < h and 0 <= xx < w and not seen[yy, xx] and arr[yy, xx] == v:
                        seen[yy, xx] = True
                        stack.append((yy, xx))
            exp[(float(v), n, x0, y0, x1, y1)] += 1
    assert got == exp


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    w=st.integers(4, 40), h=st.integers(4, 40),
    block=st.sampled_from([5, 16]),
    r=st.integers(1, 3), seed=st.integers(0, 2**31 - 1),
)
def test_focal_mean_matches_unblocked_on_random_rasters(spark, w, h, block, r, seed):
    if r > block:
        r = block
    rng = np.random.default_rng(seed)
    arr = rng.normal(0, 100, (h, w)).astype(np.float32)
    rows = focal_map(
        _blocks_df(spark, arr, block), (w, h), block, "mean", radius=r
    ).collect()
    got = np.full((h, w), np.nan, dtype=np.float32)
    for x in rows:
        a = np.frombuffer(x["payload"], dtype=np.float32).reshape(x["ysize"], x["xsize"])
        got[x["yoff"]: x["yoff"] + x["ysize"], x["xoff"]: x["xoff"] + x["xsize"]] = a
    win = np.lib.stride_tricks.sliding_window_view(
        np.pad(arr.astype(np.float64), r, mode="edge"), (2 * r + 1, 2 * r + 1)
    )
    np.testing.assert_allclose(got, win.mean(axis=(2, 3)), rtol=1e-4, atol=1e-3)
