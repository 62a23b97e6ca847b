"""Lazy 4D (time, band, x, y) DataArray facade — R2 indexing dispatch.

Reference behavior (/root/reference/earth_data_kit/xarray_boosted/
entrypoint.py:33-186, BASIC xarray indexing): ``__getitem__`` takes a
4-tuple of ints/slices where

* an INT time or band key selects one coordinate and SQUEEZES that
  axis out of the result (entrypoint.py:180-185 ``data = data[0]``),
* an INT x or y key is widened to ``slice(k, k+1)`` and the axis is
  KEPT (entrypoint.py:62-73 — the reference's deliberate asymmetry),
* reads are edge-clamped windows, nodata → NaN, scale/offset applied,
* the result axis order is (time, band, x, y) — the reference
  transposes GDAL's (y, x) to (x, y) (entrypoint.py:121-122).

Spark-first restatement: the "file" is a blocks DataFrame carrying
``t`` (time index) and ``band`` columns on top of the standard block
schema (operators/blocks.py).  One ``__getitem__`` is ONE Spark job:
a pure-Column prune on (t, band, window) that pushes to the parquet
scan, an Arrow ``mapInPandas`` decode of only the surviving blocks
(same hot path as blocks.windowed_read, with t/band carried through),
and a driver-side assembly of the requested window — the facade is
sugar over the tested compute path, sized by the WINDOW, never the
mosaic.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from earth_data_kit_spark.operators.blocks import windowed_read


class EDKDataArray:
    """Lazy (time, band, x, y) view; nothing is read until indexed.

    ``blocks`` must carry the standard block schema plus ``t`` (int
    time index 0..n_times-1) and ``band``; ``bands`` fixes the band
    axis order (storage band b = ``bands[b]``, the reference's 1-based
    ``band_nums`` made explicit)."""

    def __init__(
        self,
        blocks: DataFrame,
        n_times: int,
        bands: list[str],
        x_size: int,
        y_size: int,
    ):
        self.blocks = blocks
        self.n_times = int(n_times)
        self.bands = list(bands)
        self.x_size = int(x_size)
        self.y_size = int(y_size)

    @property
    def shape(self) -> tuple[int, int, int, int]:
        return (self.n_times, len(self.bands), self.x_size, self.y_size)

    def _axis_coords(self, key, size: int) -> list[int]:
        if isinstance(key, slice):
            return list(range(*key.indices(size)))
        k = int(key)
        if not -size <= k < size:
            raise IndexError(f"index {k} out of bounds for axis of size {size}")
        return [k % size]

    def _xy_window(self, key, size: int) -> tuple[int, int]:
        if isinstance(key, slice):
            start, stop, step = key.indices(size)
            if step != 1:
                raise IndexError("x/y steps are not supported (BASIC indexing)")
            return start, max(0, stop - start)
        k = int(key)
        if not -size <= k < size:
            raise IndexError(f"index {k} out of bounds for axis of size {size}")
        return k % size, 1  # int → slice(k, k+1): the axis is KEPT

    def __getitem__(self, key) -> np.ndarray:
        if not isinstance(key, tuple):
            key = (key,)
        if len(key) > 4:
            raise IndexError("too many indices for a 4D array")
        key = key + (slice(None),) * (4 - len(key))
        t_key, b_key, x_key, y_key = key

        times = self._axis_coords(t_key, self.n_times)
        band_idx = self._axis_coords(b_key, len(self.bands))
        band_names = [self.bands[b] for b in band_idx]
        xoff, xsize = self._xy_window(x_key, self.x_size)
        yoff, ysize = self._xy_window(y_key, self.y_size)

        out = np.full(
            (len(times), len(band_names), xsize, ysize), np.nan, dtype=np.float32
        )
        if xsize and ysize and times and band_names:
            selected = self.blocks.where(
                F.col("t").isin(times) & F.col("band").isin(band_names)
            )
            t_pos = {t: i for i, t in enumerate(times)}
            b_pos = {b: i for i, b in enumerate(band_names)}
            read = windowed_read(  # prunes via window_filter internally
                selected, xoff, yoff, xsize, ysize,
                carry_cols=("t", "band"), carry_schema="t int, band string",
            )
            for r in read.collect():
                a = np.array(r["values"], dtype=np.float32).reshape(
                    r["ysize"], r["xsize"]
                )
                # (y, x) → (x, y), the reference's transpose
                out[
                    t_pos[r["t"]], b_pos[r["band"]],
                    r["dst_x"] : r["dst_x"] + r["xsize"],
                    r["dst_y"] : r["dst_y"] + r["ysize"],
                ] = a.T
        # int time/band squeeze; int x/y axes stay (reference asymmetry)
        if not isinstance(b_key, slice):
            out = out[:, 0]
        if not isinstance(t_key, slice):
            out = out[0]
        return out


class EDKLabeledArray(EDKDataArray):
    """Labeled-coordinate layer over the positional facade — the
    reference's xarray surface (xarray_boosted/entrypoint.py:240-307
    builds coords {time: DatetimeIndex, band: 1..n, x/y: geotransform
    columns} and xarray supplies ``.sel``/``.isel``;
    tests/ndarray/test_indexing.py:24-111 drives them).  Here the
    label→position translation is native (no xarray dependency — the
    sandbox has none), and xr_adapter.py registers the true xarray
    BackendEntrypoint when xarray IS importable.

    Semantics follow xarray:

    * ``isel``: keyword positional indexing; an INT key squeezes its
      axis (ALL axes — this is the xarray level, not the BackendArray
      level whose x/y-widening asymmetry ``EDKDataArray.__getitem__``
      mirrors), slices keep axes.
    * ``sel``: label indexing.  Exact match requires the label to
      exist (KeyError otherwise); ``method="nearest"`` picks the
      minimum |coord - label| (first on ties, like np.argmin).
      Slices select the inclusive label range (xarray slice-sel is
      always "exact-bounds" and needs no method).
    """

    def __init__(
        self,
        blocks,
        times,
        bands,
        x_coords,
        y_coords,
    ):
        super().__init__(
            blocks,
            n_times=len(times),
            bands=[str(b) for b in bands],
            x_size=len(x_coords),
            y_size=len(y_coords),
        )
        self.time_coords = np.asarray(times)
        self.band_coords = np.asarray(bands)
        self.x_coords = np.asarray(x_coords, dtype=np.float64)
        self.y_coords = np.asarray(y_coords, dtype=np.float64)

    @classmethod
    def from_geotransform(cls, blocks, times, bands, gt, x_size, y_size):
        """Coords from a GDAL-style geotransform (x0, dx, 0, y0, 0,
        dy) — the reference's get_spatial_coords shape
        (entrypoint.py:221-238): x[i] = x0 + i*dx, y[j] = y0 + j*dy."""
        x0, dx, _, y0, _, dy = gt
        return cls(
            blocks,
            times=times,
            bands=bands,
            x_coords=x0 + dx * np.arange(x_size),
            y_coords=y0 + dy * np.arange(y_size),
        )

    # -- label → position ------------------------------------------------

    def _pos(self, coords: np.ndarray, label, method: str | None, dim: str):
        if isinstance(label, slice):
            if label.step is not None:
                raise KeyError(f"sel slices with step are not supported ({dim})")
            lo, hi = label.start, label.stop
            idx = np.arange(len(coords))
            mask = np.ones(len(coords), dtype=bool)
            # honor descending coords (y from a negative-dy transform)
            ascending = len(coords) < 2 or coords[1] >= coords[0]
            a, b = (lo, hi) if ascending else (hi, lo)
            if a is not None:
                mask &= coords >= a
            if b is not None:
                mask &= coords <= b
            sel = idx[mask]
            return slice(int(sel[0]), int(sel[-1]) + 1) if len(sel) else slice(0, 0)
        if method == "nearest":
            if np.issubdtype(coords.dtype, np.number):
                return int(np.argmin(np.abs(coords - label)))
            # non-numeric (band names, datetimes as object): exact only
            hits = np.nonzero(coords == label)[0]
            if len(hits) == 0:
                raise KeyError(f"{label!r} not found in {dim} (non-numeric nearest)")
            return int(hits[0])
        if method is not None:
            raise KeyError(f"unsupported sel method {method!r}")
        hits = np.nonzero(coords == label)[0]
        if len(hits) == 0:
            raise KeyError(f"{label!r} not found in coordinate {dim}")
        return int(hits[0])

    def sel(self, time=None, band=None, x=None, y=None, method: str | None = None):
        keys = {}
        for dim, label, coords in (
            ("time", time, self.time_coords),
            ("band", band, self.band_coords),
            ("x", x, self.x_coords),
            ("y", y, self.y_coords),
        ):
            if label is not None:
                keys[dim] = self._pos(coords, label, method, dim)
        return self.isel(**keys)

    def isel(self, time=None, band=None, x=None, y=None):
        key = []
        squeeze = []
        for ax, (k, size) in enumerate(
            (
                (time, self.n_times),
                (band, len(self.bands)),
                (x, self.x_size),
                (y, self.y_size),
            )
        ):
            if k is None:
                key.append(slice(None))
            elif isinstance(k, slice):
                key.append(k)
            else:
                k = int(k)
                if not -size <= k < size:
                    raise IndexError(f"index {k} out of bounds for axis {ax} of size {size}")
                key.append(slice(k % size, k % size + 1))
                squeeze.append(ax)
        out = self[tuple(key)]  # all-slice key → positional 4D read
        if squeeze:
            out = np.squeeze(out, axis=tuple(squeeze))
        return out
