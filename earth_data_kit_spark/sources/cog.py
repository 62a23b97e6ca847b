"""COG as a DISTRIBUTED source: tile index → pruned decode → blocks.

The reverse of ``operators/gtiff.export_cog``: a tiled GeoTIFF comes
back into the engine as the standard blocks schema
(operators/blocks.py), so every block operator — windowed read,
block_mean, regrid, re-export — runs directly over a COG file.
Reference analog: the GDAL-backed block read pipeline
(xarray_boosted/entrypoint.py:95-133 reads block windows per task);
here the two stages are explicit and Spark-native:

1. ``cog_tile_index`` — ONE driver-side parse of the header-resident
   IFD chain (KBs; over object storage a single small GET) → a tiny
   DataFrame of tile descriptors (band, tile coords, pixel window,
   byte range).  Pure metadata: window predicates on
   ``xoff/yoff/xsize/ysize`` prune TILES in Catalyst before any tile
   byte is touched — the same prune-then-decode shape as
   ``blocks.window_filter``.
2. ``cog_decode_blocks`` — Arrow ``mapInPandas`` over the surviving
   descriptors: each task reads its tiles' byte ranges (ranged GETs
   at scale; local seeks here) and decodes with the gtiff codec path
   (DEFLATE/LZW/JPEG + predictor), emitting blocks-schema rows with
   payloads clipped to the true edge-tile size.

Scale posture: the index is O(tiles) rows of metadata (a 100 TB COG
mosaic set is many files — one index per file, unioned); decode
parallelism = surviving tiles; no shuffle anywhere — both stages are
map-only, and the expensive stage starts only after pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from earth_data_kit_spark.operators.gtiff import (
    TAG_BITS,
    TAG_COMPRESSION,
    TAG_LENGTH,
    TAG_NODATA,
    TAG_PLANAR,
    TAG_PREDICTOR,
    TAG_SAMPLES,
    TAG_SAMPLE_FORMAT,
    TAG_TILE_BYTES,
    TAG_TILE_H,
    TAG_TILE_OFFSETS,
    TAG_TILE_W,
    TAG_WIDTH,
    _parse_ifd,
)

_DTYPE_NAME = {
    (8, 1): "uint8", (8, 2): "int8",
    (16, 1): "uint16", (16, 2): "int16",
    (32, 1): "uint32", (32, 2): "int32", (32, 3): "float32",
    (64, 3): "float64",
}

INDEX_SCHEMA = (
    "path string, band int, tx int, ty int, xoff int, yoff int, "
    "xsize int, ysize int, tile_w int, tile_h int, "
    "byte_offset bigint, byte_count bigint, "
    "dtype string, nodataval double, compression int, predictor int, bits int"
)


def cog_tile_index(spark: SparkSession, path: str, level: int = 0) -> DataFrame:
    """Tile descriptors for one IFD of a COG — metadata only, no tile
    bytes touched.  Columns per INDEX_SCHEMA; filter on the pixel
    window columns, then feed the survivors to
    ``cog_decode_blocks``."""
    import struct

    raw = open(path, "rb").read()  # header parse; tile data unused here
    order, magic, ifd = struct.unpack_from("<2sHI", raw, 0)
    assert order == b"II" and magic == 42, "not a little-endian TIFF"
    for _ in range(level):
        _, ifd = _parse_ifd(raw, ifd)
        if not ifd:
            raise ValueError(f"overview level {level} beyond IFD chain")
    tags, _ = _parse_ifd(raw, ifd)
    width, height = tags[TAG_WIDTH][0], tags[TAG_LENGTH][0]
    tw, th = tags[TAG_TILE_W][0], tags[TAG_TILE_H][0]
    n_tx, n_ty = -(-width // tw), -(-height // th)
    n_bands = tags.get(TAG_SAMPLES, [1])[0]
    if n_bands > 1 and tags.get(TAG_PLANAR, [1])[0] != 2:
        raise ValueError("multi-band COG scan supports PlanarConfiguration=2 only")
    bits = tags[TAG_BITS][0]
    fmt = tags.get(TAG_SAMPLE_FORMAT, [1])[0]
    dtype = _DTYPE_NAME[(bits, fmt)]
    nod = tags.get(TAG_NODATA)
    nodata = float(nod.rstrip(b"\x00")) if nod else None
    comp = tags.get(TAG_COMPRESSION, [1])[0]
    pred = tags.get(TAG_PREDICTOR, [1])[0]
    rows = []
    per_band = n_tx * n_ty
    for idx, (off, cnt) in enumerate(
        zip(tags[TAG_TILE_OFFSETS], tags[TAG_TILE_BYTES])
    ):
        band, rem = divmod(idx, per_band)
        ty, tx = divmod(rem, n_tx)
        xo, yo = tx * tw, ty * th
        rows.append(
            (path, band, tx, ty, xo, yo,
             min(tw, width - xo), min(th, height - yo), tw, th,
             off, cnt, dtype, nodata, comp, pred, bits)
        )
    return spark.createDataFrame(rows, INDEX_SCHEMA)


def cog_decode_blocks(index: DataFrame) -> DataFrame:
    """Decode surviving tile descriptors into the standard blocks
    schema.  Map-only Arrow stage: each task reads ONLY its tiles'
    byte ranges and runs the gtiff codec path; edge tiles are clipped
    to their true pixel size before payload encode, so downstream
    block math sees exactly the raster extent."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from earth_data_kit_spark.operators.gtiff import _decode_tile

        handles: dict[str, bytes] = {}
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                raw = handles.setdefault(r["path"], open(r["path"], "rb").read())
                # _decode_tile reads [offset, offset+count) through the
                # tag dict — synthesize the minimal tag view it needs
                tags = {
                    TAG_TILE_H: [int(r["tile_h"])],
                    TAG_TILE_W: [int(r["tile_w"])],
                    TAG_TILE_OFFSETS: [int(r["byte_offset"])],
                    TAG_TILE_BYTES: [int(r["byte_count"])],
                }
                npdt = np.dtype(r["dtype"])
                tile = _decode_tile(
                    raw, tags, 0, npdt, int(r["compression"]),
                    int(r["predictor"]), int(r["bits"]),
                )
                clip = tile[: int(r["ysize"]), : int(r["xsize"])]
                out.append(
                    {
                        "tile_name": r["path"],
                        "band": f"B{int(r['band']) + 1}",
                        "block_x": int(r["tx"]),
                        "block_y": int(r["ty"]),
                        "xoff": int(r["xoff"]),
                        "yoff": int(r["yoff"]),
                        "xsize": int(r["xsize"]),
                        "ysize": int(r["ysize"]),
                        "dtype": r["dtype"],
                        "nodataval": r["nodataval"],
                        "scale": 1.0,
                        "offset": 0.0,
                        "payload": np.ascontiguousarray(clip).tobytes(),
                    }
                )
            yield pd.DataFrame(out)

    from earth_data_kit_spark.operators.blocks import BLOCK_SCHEMA

    return index.mapInPandas(decode, schema=BLOCK_SCHEMA)


def cog_scan(
    spark: SparkSession,
    path: str,
    level: int = 0,
    window: tuple[int, int, int, int] | None = None,
) -> DataFrame:
    """One-call form: index → (optional window prune on metadata) →
    decode.  ``window=(xoff, yoff, xsize, ysize)`` keeps only tiles
    intersecting the window — the prune runs in Catalyst on the tiny
    index before any tile byte is read."""
    idx = cog_tile_index(spark, path, level)
    if window is not None:
        xo, yo, xs, ys = window
        idx = idx.where(
            (F.col("xoff") < xo + xs)
            & (F.col("xoff") + F.col("xsize") > xo)
            & (F.col("yoff") < yo + ys)
            & (F.col("yoff") + F.col("ysize") > yo)
        )
    return cog_decode_blocks(idx)
