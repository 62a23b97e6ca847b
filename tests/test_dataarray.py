"""R2 indexing dispatch: the lazy 4D (time, band, x, y) facade —
int-vs-slice squeeze semantics (reference xarray_boosted/
entrypoint.py:33-186) over the blocks compute path."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from earth_data_kit_spark.operators.blocks import synth_blocks_df
from earth_data_kit_spark.operators.dataarray import EDKDataArray

X, Y, BLOCK = 96, 64, 32
BANDS = ["B1", "B2"]
N_TIMES = 2


def _expected(t, b, x, y):
    # synth value × per-(t, band) scale stamped below
    return float((x * 31 + y * 17) % 30000) * (t * 10 + b + 1)


@pytest.fixture(scope="module")
def arr(spark):
    parts = []
    for t in range(N_TIMES):
        for b, band in enumerate(BANDS):
            parts.append(
                synth_blocks_df(
                    spark, X, Y, BLOCK, band=band,
                    scale=float(t * 10 + b + 1), nodata_stripe=False,
                ).withColumn("t", F.lit(t))
            )
    blocks = parts[0]
    for p in parts[1:]:
        blocks = blocks.unionByName(p)
    return EDKDataArray(blocks, N_TIMES, BANDS, X, Y)


def test_slice_slice_keeps_all_axes_and_values(arr):
    out = arr[0:2, 0:1, 4:10, 3:7]
    assert out.shape == (2, 1, 6, 4)
    for t in range(2):
        for xi, x in enumerate(range(4, 10)):
            for yi, y in enumerate(range(3, 7)):
                assert out[t, 0, xi, yi] == pytest.approx(_expected(t, 0, x, y))


def test_int_time_and_band_squeeze(arr):
    out = arr[1, 0, :8, :8]
    assert out.shape == (8, 8)
    assert out[5, 2] == pytest.approx(_expected(1, 0, 5, 2))
    # band-only int: time axis survives
    out2 = arr[0:2, 1, :4, :4]
    assert out2.shape == (2, 4, 4)
    assert out2[1, 3, 3] == pytest.approx(_expected(1, 1, 3, 3))


def test_int_x_y_keep_their_axes(arr):
    """The reference widens int x/y to slice(k, k+1) WITHOUT
    squeezing (entrypoint.py:62-73) — the asymmetry this facade must
    reproduce exactly."""
    out = arr[0:2, 0:1, 3, 5]
    assert out.shape == (2, 1, 1, 1)
    assert out[0, 0, 0, 0] == pytest.approx(_expected(0, 0, 3, 5))
    # all-int key: time/band squeezed, x/y kept
    out2 = arr[1, 1, 3, 5]
    assert out2.shape == (1, 1)
    assert out2[0, 0] == pytest.approx(_expected(1, 1, 3, 5))


def test_edge_clamp_and_block_crossing(arr):
    """A window crossing block boundaries and the raster edge: slices
    clamp (standard .indices semantics), values stay exact."""
    out = arr[0, 0, 90:200, 60:200]
    assert out.shape == (6, 4)  # clamped to 96×64
    assert out[0, 0] == pytest.approx(_expected(0, 0, 90, 60))
    assert out[5, 3] == pytest.approx(_expected(0, 0, 95, 63))


def test_missing_axes_default_to_full_slices(arr):
    out = arr[0]
    assert out.shape == (len(BANDS), X, Y)


def test_prune_reaches_scan_before_decode(arr, spark):
    """The (t, band, window) prune is pure Columns BEFORE the Arrow
    decode — only intersecting blocks of the selected (t, band) are
    decoded (the R2 'filter before read' contract)."""
    from earth_data_kit_spark.operators.blocks import window_filter

    pruned = window_filter(
        arr.blocks.where((F.col("t") == 0) & (F.col("band") == "B1")),
        0, 0, 33, 33,
    )
    assert pruned.count() == 4  # 2×2 blocks of ONE (t, band), not 4×(3×2)


def test_bad_indices_raise(arr):
    with pytest.raises(IndexError):
        arr[99, 0, :, :]
    with pytest.raises(IndexError):
        arr[0, 0, ::2, :]
    with pytest.raises(IndexError):
        arr[0, 0, 0, 0, 0]
