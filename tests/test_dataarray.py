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


# ---------------------------------------------------------------------------
# labeled selection (reference tests/ndarray/test_indexing.py:24-111
# drives xarray .sel/.isel over the registered engine; here the same
# assertions run against EDKLabeledArray's native implementation —
# xarray is absent in this environment, xr_adapter.py registers the
# real BackendEntrypoint where it exists)
# ---------------------------------------------------------------------------

from earth_data_kit_spark.operators.dataarray import EDKLabeledArray  # noqa: E402

TIMES = np.array(["2020-01-01", "2020-02-01"], dtype="datetime64[ns]")
GT = (19.0, 0.05, 0.0, 43.0, 0.0, -0.05)  # north-up: descending y


@pytest.fixture(scope="module")
def larr(spark, arr):
    return EDKLabeledArray.from_geotransform(
        arr.blocks, times=TIMES, bands=BANDS, gt=GT, x_size=X, y_size=Y
    )


def test_labeled_coords_from_geotransform(larr):
    assert larr.x_coords[0] == pytest.approx(19.0)
    assert larr.x_coords[3] == pytest.approx(19.15)
    assert larr.y_coords[0] == pytest.approx(43.0)
    assert larr.y_coords[2] == pytest.approx(42.90)
    assert larr.shape == (2, 2, X, Y)


def test_sel_exact_time_label_squeezes_time(larr):
    out = larr.sel(time=TIMES[1])
    assert out.shape == (2, X, Y)
    assert out[0, 5, 2] == pytest.approx(_expected(1, 0, 5, 2))


def test_sel_nearest_xy_point(larr):
    # reference: point selection at a bbox center with method="nearest"
    x_val, y_val = 19.151, 42.899  # nearest → x index 3, y index 2
    out = larr.sel(x=x_val, y=y_val, method="nearest")
    assert out.shape == (2, 2)
    assert out[1, 0] == pytest.approx(_expected(1, 0, 3, 2))
    # offset coords snap to the same pixel (the test_indexing.py
    # "approximate coordinates" case)
    out2 = larr.sel(x=x_val + 0.02, y=y_val - 0.02, method="nearest")
    assert np.array_equal(out, out2, equal_nan=True)


def test_sel_band_nearest_non_numeric_is_exact(larr):
    out = larr.sel(band="B1", method="nearest")
    assert out.shape == (2, X, Y)
    with pytest.raises(KeyError):
        larr.sel(band="nope", method="nearest")


def test_sel_multi_dim_with_nearest(larr):
    out = larr.sel(time=TIMES[0], band="B2", x=19.001, y=42.999, method="nearest")
    assert np.ndim(out) == 0
    assert float(out) == pytest.approx(_expected(0, 1, 0, 0))


def test_sel_exact_miss_raises(larr):
    with pytest.raises(KeyError):
        larr.sel(x=19.0123)  # not a coordinate; no method


def test_sel_label_slice_inclusive_and_descending_y(larr):
    out = larr.sel(x=slice(19.10, 19.20), y=slice(42.95, 42.85))
    # x: indices 2..4 (inclusive bounds); y descending: 1..3
    assert out.shape == (2, 2, 3, 3)
    assert out[0, 0, 0, 0] == pytest.approx(_expected(0, 0, 2, 1))


def test_isel_matches_reference_positional_cases(larr):
    # reference position_based_indexing: int squeezes, slice keeps
    assert larr.isel(time=0).shape == (2, X, Y)
    assert larr.isel(x=0, y=0).shape == (2, 2)
    assert larr.isel(x=slice(0, 2), y=slice(0, 2)).shape == (2, 2, 2, 2)
    assert larr.isel(time=0, band=0).shape == (X, Y)
    # negative indexing: last y row
    last_y = larr.isel(y=-1)
    assert last_y.shape == (2, 2, X)
    assert last_y[0, 0, 5] == pytest.approx(_expected(0, 0, 5, Y - 1))


def test_xr_adapter_dormant_without_xarray():
    from earth_data_kit_spark import xr_adapter

    if not xr_adapter.HAS_XARRAY:
        with pytest.raises(ImportError):
            xr_adapter.open_edk_spark_dataset("x")
    else:  # environment with xarray: the entrypoint class must exist
        assert hasattr(xr_adapter, "EDKSparkBackend")


def test_blocks_extent_uses_standard_block_schema(spark):
    """xr_adapter.blocks_extent must read xoff/yoff (the standard
    block schema, operators/blocks.py) — the r4 adapter read x0/y0
    which no real blocks table has (ADVICE r4)."""
    from earth_data_kit_spark.operators.blocks import synth_blocks_df
    from earth_data_kit_spark.xr_adapter import blocks_extent

    blocks = synth_blocks_df(spark, 96, 64, 32, band="B1", scale=1.0)
    assert blocks_extent(blocks) == (96, 64)


def test_xr_backend_entrypoint_contract_with_stubbed_xarray(spark, tmp_path):
    """VERDICT r4 task 8: execute EDKSparkBackend.open_dataset and the
    BackendArray indexing path for real, with xarray stubbed at its
    plugin API boundary (BackendArray/BackendEntrypoint base classes,
    core.indexing.explicit_indexing_adapter contract, DataArray
    container).  The adapter output must match the native
    EDKLabeledArray facade on the same blocks table."""
    import importlib
    import sys
    import types

    import numpy as np
    from pyspark.sql import functions as F

    from earth_data_kit_spark.operators.blocks import synth_blocks_df
    from earth_data_kit_spark.operators.dataarray import EDKLabeledArray

    blocks = (
        synth_blocks_df(spark, 64, 48, 32, band="B1", scale=1.0)
        .withColumn("t", F.lit(0))
    )
    path = str(tmp_path / "blocks")
    blocks.write.parquet(path)

    # ---- minimal xarray stub: exactly the plugin API the adapter uses
    xr_mod = types.ModuleType("xarray")
    backends_mod = types.ModuleType("xarray.backends")
    core_mod = types.ModuleType("xarray.core")
    indexing_mod = types.ModuleType("xarray.core.indexing")

    class BackendArray:
        pass

    class BackendEntrypoint:
        pass

    class LazilyIndexedArray:
        def __init__(self, array):
            self.array = array

    class IndexingSupport:
        BASIC = "basic"

    def explicit_indexing_adapter(key, shape, support, raw_method):
        # xarray's contract: with BASIC support, the raw method gets a
        # tuple of ints/slices covering every axis
        assert support == IndexingSupport.BASIC
        return raw_method(key)

    class DataArray:
        def __init__(self, data, dims, coords):
            self.data = data
            self.dims = dims
            self.coords = coords

        def to_dataset(self, name):
            return {name: self}

    backends_mod.BackendArray = BackendArray
    backends_mod.BackendEntrypoint = BackendEntrypoint
    indexing_mod.LazilyIndexedArray = LazilyIndexedArray
    indexing_mod.IndexingSupport = IndexingSupport
    indexing_mod.explicit_indexing_adapter = explicit_indexing_adapter
    xr_mod.DataArray = DataArray
    xr_mod.backends = backends_mod
    xr_mod.core = core_mod
    core_mod.indexing = indexing_mod

    saved = {k: sys.modules.get(k) for k in
             ("xarray", "xarray.backends", "xarray.core", "xarray.core.indexing")}
    sys.modules.update({
        "xarray": xr_mod,
        "xarray.backends": backends_mod,
        "xarray.core": core_mod,
        "xarray.core.indexing": indexing_mod,
    })
    import earth_data_kit_spark.xr_adapter as xr_adapter

    try:
        xr_adapter = importlib.reload(xr_adapter)
        assert xr_adapter.HAS_XARRAY
        be = xr_adapter.EDKSparkBackend()
        assert be.guess_can_open(path) is False
        gt = (10.0, 0.5, 0.0, 40.0, 0.0, -0.5)
        ds = be.open_dataset(
            path, spark=spark, times=["2020-01-01"], bands=["B1"], gt=gt
        )
        da = ds["edk"]
        assert da.dims == ("time", "band", "x", "y")
        assert len(da.coords["x"]) == 64 and len(da.coords["y"]) == 48
        np.testing.assert_allclose(da.coords["x"][:3], [10.0, 10.5, 11.0])

        # the native facade is the oracle for the adapter's reads
        oracle = EDKLabeledArray.from_geotransform(
            blocks, times=["2020-01-01"], bands=["B1"], gt=gt,
            x_size=64, y_size=48,
        )
        ba = da.data.array  # LazilyIndexedArray wraps the BackendArray
        full = ba[(0, 0, slice(None), slice(None))]
        assert full.shape == (64, 48)
        np.testing.assert_array_equal(full, oracle.isel(time=0, band=0))

        # int x/y key: the adapter squeezes what the facade keeps
        col = ba[(0, 0, slice(0, 5), 3)]
        assert col.shape == (5,)
        np.testing.assert_array_equal(
            col, oracle.isel(time=0, band=0)[0:5, 3]
        )
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
        xr_adapter = importlib.reload(xr_adapter)
        assert not xr_adapter.HAS_XARRAY
