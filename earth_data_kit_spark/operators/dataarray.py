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
