"""Affine/geotransform math: extents, mosaic assignment, clip windows.

This is the fixture-checked core (SURVEY.md §2.8 R5, §2.2 P9): the
reference builds VRT XML through GDAL; we reproduce the *numbers* GDAL
puts in those VRTs (Src/DstRect, union extent, clip window, snapped
origin) with plain arithmetic so they become DataFrame columns.

GDAL geotransform convention: ``gt = (origin_x, x_res, 0, origin_y,
0, y_res)`` with y_res negative for north-up rasters.

Reference analogs:
* extent from geotransform — classes/tile.py:70-76 (F5)
* resolution round(6) + float32 — classes/tile.py:182-185,
  classes/dataset.py:338-339 (F6/A2 quirk, kept for fixture parity)
* mosaic union + per-tile placement — dataset.py:546-553 via
  gdal.BuildVRT; numbers pinned by the golden VRT
  (tests/fixtures/goldens/s3-grid-file.tar: DstRect yOff=2400)
* bbox clip window — dataset.py:586-593 via gdal.Translate projWin;
  pixel-window rounding follows GDAL gdal_translate_lib semantics
  (floor(+0.001) for offsets, +0.5 for sizes), validated against the
  golden clip (1005, 1754, 480, 735)
* temporal bucketing — engines/commons.py:37-54 (A1): dates fall in
  half-open buckets [t, t+resolution) anchored at the range start.
"""

from __future__ import annotations

import numpy as np


def extent_from_geotransform(gt, x_size, y_size):
    """(xmin, ymin, xmax, ymax) of a north-up raster (tile.py:70-76)."""
    x0, xres, _, y0, _, yres = gt
    return (x0, y0 + yres * y_size, x0 + xres * x_size, y0)


def rounded_res(gt):
    """Resolution with the reference's round-6-then-float32 quirk
    (tile.py:182-185, dataset.py:338-339) so band-config grouping
    keys match the reference byte-for-byte."""
    return (
        float(np.float32(round(gt[1], 6))),
        float(np.float32(round(gt[5], 6))),
    )


def mosaic_extent(extents):
    """Union extent of tile extents (what BuildVRT computes)."""
    xs0, ys0, xs1, ys1 = zip(*extents)
    return (min(xs0), min(ys0), max(xs1), max(ys1))


def mosaic_size(union_extent, xres, yres):
    """Raster size of the union mosaic (pixels)."""
    xmin, ymin, xmax, ymax = union_extent
    return (
        int(round((xmax - xmin) / xres)),
        int(round((ymax - ymin) / abs(yres))),
    )


def tile_placement(tile_extent, union_extent, xres, yres, x_size, y_size):
    """Src/DstRect of one tile inside the union mosaic.

    Returns (src_xoff, src_yoff, dst_xoff, dst_yoff, xsize, ysize) —
    the row schema of the tile-assignment table that replaces VRT XML
    (SURVEY.md §1.1 "Mosaic (VRT)").
    """
    txmin, _, _, tymax = tile_extent
    uxmin, _, _, uymax = union_extent
    dst_xoff = int(round((txmin - uxmin) / xres))
    dst_yoff = int(round((uymax - tymax) / abs(yres)))
    return (0, 0, dst_xoff, dst_yoff, int(x_size), int(y_size))


def clip_window(gt, ulx, uly, lrx, lry):
    """Pixel window of a projected bbox, GDAL gdal_translate rounding.

    (ulx, uly, lrx, lry) are already in the raster CRS (the caller
    does the 4326→CRS corner transform, transform.py).  Returns
    (xoff, yoff, xsize, ysize, out_origin_x, out_origin_y) with the
    output origin snapped to the source pixel grid — matches the
    golden clip VRT exactly (validated in tests/test_affine.py).
    """
    x0, xres, _, y0, _, yres = gt
    xoff = int(np.floor((ulx - x0) / xres + 0.001))
    yoff = int(np.floor((uly - y0) / yres + 0.001))
    xsize = int((lrx - ulx) / xres + 0.5)
    ysize = int((lry - uly) / yres + 0.5)
    return (xoff, yoff, xsize, ysize, x0 + xoff * xres, y0 + yoff * yres)


def warp_output_grid(extent, xres, yres):
    """Output grid of a warp/resample to a new resolution (R7,
    dataset.py:516-541 via gdal.Warp): same origin, size =
    floor(span/res + 0.5) — matches the golden warped VRT of the
    s3-multiple-files scenario (42857×21429 at 0.0042°)."""
    xmin, ymin, xmax, ymax = extent
    xsize = int(np.floor((xmax - xmin) / xres + 0.5))
    ysize = int(np.floor((ymax - ymin) / abs(yres) + 0.5))
    return (xmin, xres, 0.0, ymax, 0.0, -abs(yres)), xsize, ysize


def pixel_window_clamped(xoff, yoff, xsize, ysize, raster_x, raster_y):
    """Clamp a read window to the raster edge (entrypoint.py:95-133
    R1 semantics: requested windows may overhang; reads clamp)."""
    x0 = max(0, xoff)
    y0 = max(0, yoff)
    x1 = min(raster_x, xoff + xsize)
    y1 = min(raster_y, yoff + ysize)
    return (x0, y0, max(0, x1 - x0), max(0, y1 - y0))


def time_bucket_epoch_s(ts_s, start_s, resolution_s):
    """Half-open bucket start for epoch-second timestamps, anchored at
    ``start_s`` (engines/commons.py:37-54 A1).  Vectorized; also
    expressible in SQL as ``start + floor((ts-start)/res)*res`` —
    see functions/columns.py.
    """
    ts_s = np.asarray(ts_s, dtype=np.int64)
    return start_s + (ts_s - start_s) // resolution_s * resolution_s


def block_chunk_size(block_size: int, minimum: int = 512) -> int:
    """The reference's chunk heuristic (dataset.py:898-912 F14):
    next power of two of the natural block size, floored at 512.
    Retained as the partition-sizing constant for block pipelines."""
    p = 1
    while p < block_size:
        p <<= 1
    return max(p, minimum)
