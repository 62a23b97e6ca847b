"""xarray BackendEntrypoint over the Spark-backed block store.

Reference parity: earth_data_kit registers a real xarray engine
(xarray_boosted/entrypoint.py:315-337 ``EDKDatasetBackend``,
registered via pyproject ``xarray.backends`` entry point) so users
run ``xr.open_dataset(path, engine="edk_dataset")`` and get labeled
coords with ``.sel(method="nearest")`` for free
(tests/ndarray/test_indexing.py:24-111).

This module is the Spark-first analog: ``EDKSparkBackendArray`` wraps
``operators.dataarray.EDKDataArray`` (every ``__getitem__`` is one
Spark job — window-pruned scan, Arrow decode, driver assembly) and
``EDKSparkBackend.open_dataset`` builds the labeled Dataset from a
blocks table.  xarray is an OPTIONAL dependency (absent in this
sandbox): everything here is defined only when the import succeeds,
and ``operators.dataarray.EDKLabeledArray`` provides the same
``.sel``/``.isel`` semantics natively so nothing else in the engine
needs xarray.  When xarray is installed, register with:

    [project.entry-points."xarray.backends"]
    edk_spark = "earth_data_kit_spark.xr_adapter:EDKSparkBackend"
"""

from __future__ import annotations

import numpy as np

try:  # pragma: no cover - exercised only where xarray is installed
    import xarray as xr
    from xarray.backends import BackendArray, BackendEntrypoint
    from xarray.core import indexing

    HAS_XARRAY = True
except ImportError:  # sandbox path: adapter dormant, facade still works
    xr = None
    HAS_XARRAY = False

from earth_data_kit_spark.operators.dataarray import EDKDataArray, EDKLabeledArray

__all__ = ["HAS_XARRAY", "blocks_extent", "open_edk_spark_dataset"]


def blocks_extent(blocks):
    """(x_size, y_size) of a blocks table in pixels — the max covered
    extent per axis.  Uses the STANDARD block schema columns
    ``xoff/yoff/xsize/ysize`` (operators/blocks.py:40); the r4 adapter
    read ``x0``/``y0``, which no real blocks table has (ADVICE r4) —
    this function is module-level precisely so the selection
    expressions are unit-testable without xarray installed."""
    import pyspark.sql.functions as F

    xs, ys = blocks.select(
        F.max(F.col("xoff") + F.col("xsize")), F.max(F.col("yoff") + F.col("ysize"))
    ).first()
    return int(xs), int(ys)


if HAS_XARRAY:  # pragma: no cover - see above

    class EDKSparkBackendArray(BackendArray):
        """Lazy xarray array over the Spark facade.  BASIC indexing
        only (ints + slices), matching the reference's
        EDKDatasetBackendArray; xarray's LazilyIndexedArray composes
        fancier selections on top."""

        def __init__(self, arr: EDKDataArray, dtype=np.float32):
            self.arr = arr
            self.shape = arr.shape
            self.dtype = np.dtype(dtype)

        def __getitem__(self, key):
            return indexing.explicit_indexing_adapter(
                key,
                self.shape,
                indexing.IndexingSupport.BASIC,
                self._raw_indexing_method,
            )

        def _raw_indexing_method(self, key):
            out = self.arr[key]
            # EDKDataArray keeps int-keyed x/y axes (the reference
            # BackendArray asymmetry); xarray's adapter expects the
            # squeezed numpy shape for int keys, so squeeze here.
            sq = [
                ax
                for ax, k in enumerate(key)
                if ax >= 2 and not isinstance(k, slice)
            ]
            # time/band int squeeze already happened inside the facade;
            # remaining x/y kept-axes map to positions (len(key)-dependent)
            if sq:
                kept = [ax for ax in range(4) if isinstance(key[ax], slice) or ax >= 2]
                pos = {ax: i for i, ax in enumerate(kept)}
                out = np.squeeze(out, axis=tuple(pos[ax] for ax in sq))
            return out

    class EDKSparkBackend(BackendEntrypoint):
        """xr.open_dataset(blocks_parquet_path, engine=EDKSparkBackend,
        spark=session, times=[...], bands=[...], gt=(x0,dx,0,y0,0,dy))."""

        description = "Spark block store as a lazy xarray Dataset"
        open_dataset_parameters = [
            "filename_or_obj", "drop_variables", "spark", "times", "bands", "gt",
        ]

        def open_dataset(
            self,
            filename_or_obj,
            *,
            drop_variables=None,
            spark=None,
            times=None,
            bands=None,
            gt=(0.0, 1.0, 0.0, 0.0, 0.0, 1.0),
        ):
            blocks = spark.read.parquet(filename_or_obj)
            xs, ys = blocks_extent(blocks)
            la = EDKLabeledArray.from_geotransform(
                blocks, times=times, bands=bands, gt=gt, x_size=xs, y_size=ys
            )
            da = xr.DataArray(
                data=indexing.LazilyIndexedArray(EDKSparkBackendArray(la)),
                dims=("time", "band", "x", "y"),
                coords={
                    "time": la.time_coords,
                    "band": la.band_coords,
                    "x": la.x_coords,
                    "y": la.y_coords,
                },
            )
            return da.to_dataset(name="edk")

        def guess_can_open(self, filename_or_obj):
            return False  # explicit engine= only


def open_edk_spark_dataset(*args, **kwargs):
    """Convenience wrapper; raises ImportError when xarray is absent
    (use operators.dataarray.EDKLabeledArray natively instead)."""
    if not HAS_XARRAY:
        raise ImportError(
            "xarray is not installed; use EDKLabeledArray.sel/.isel for "
            "labeled selection without xarray"
        )
    return EDKSparkBackend().open_dataset(*args, **kwargs)
