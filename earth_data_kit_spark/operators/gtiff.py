"""Physical COG (tiled GeoTIFF) byte sink — no GDAL.

Reference behavior: edk_accessor.py:131-183 writes real GTiff files
per block through GDAL.  This sandbox has no GDAL/rasterio/PIL, so
the byte layout is produced directly from the public TIFF 6.0 +
GeoTIFF 1.1 specifications: little-endian classic TIFF, ONE
full-resolution IFD placed immediately after the 8-byte header (the
cloud-optimized property: a reader learns the complete tile index
from the first few KB), tag arrays next, then the tile payload in
row-major tile order.  Single- or multi-band (PlanarConfiguration=2,
band-major tile planes — the reference's one-file-many-bands shape),
uncompressed or per-tile DEFLATE (Adobe compression 8, zlib streams —
stdlib) — the sink that proves the engine's block layout
(operators/cog.py) drives a byte-exact raster file; only JPEG/LZW
tiles stay behind the marked seam below.

``read_gtiff`` is the test oracle's independent half: it follows the
spec's tag semantics (not this writer's internals) to reconstruct
the array, so a writer bug that violates the spec breaks the
roundtrip rather than being mirrored.
"""

from __future__ import annotations

import struct

import numpy as np

# TIFF tag ids (TIFF 6.0 §8) and GeoTIFF 1.1 geo tags
TAG_WIDTH = 256
TAG_LENGTH = 257
TAG_BITS = 258
TAG_COMPRESSION = 259
TAG_PHOTOMETRIC = 262
TAG_SAMPLES = 277
TAG_PLANAR = 284
TAG_TILE_W = 322
TAG_TILE_H = 323
TAG_TILE_OFFSETS = 324
TAG_TILE_BYTES = 325
TAG_SAMPLE_FORMAT = 339
TAG_PIXEL_SCALE = 33550
TAG_TIEPOINT = 33922
TAG_GEO_KEYS = 34735
TAG_NODATA = 42113  # GDAL_NODATA (ASCII)

_T_SHORT, _T_LONG, _T_DOUBLE, _T_ASCII = 3, 4, 12, 2

_DTYPES = {
    "int16": (16, 2, np.int16),
    "uint16": (16, 1, np.uint16),
    "int32": (32, 2, np.int32),
    "uint32": (32, 1, np.uint32),
    "float32": (32, 3, np.float32),
    "float64": (64, 3, np.float64),
}


def write_gtiff(
    path: str,
    tiles: dict,
    width: int,
    height: int,
    tile_w: int,
    tile_h: int,
    dtype: str = "int16",
    gt: tuple = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
    epsg: int = 4326,
    nodata: float | None = None,
    compression: str | None = None,
    n_bands: int = 1,
) -> dict:
    """Write a tiled GeoTIFF.  Single band: ``tiles[(tx, ty)]`` is
    the (tile_h, tile_w) array for tile column tx / row ty.
    Multi-band (``n_bands`` > 1, the reference's one-file-many-bands
    shape, edk_accessor.py:114-120 WriteArray per band_idx):
    ``tiles[(band, tx, ty)]`` with PlanarConfiguration=2 — tile data
    ordered band-major per the TIFF 6.0 planar rule.  Edge tiles may
    be smaller and are padded to full tile size (TIFF tiles are
    always full-size; the width/length tags clip them on read).
    Missing tiles are filled with ``nodata`` (or 0).  Returns the
    layout summary {n_tiles, ifd_offset, data_offset, bytes}.

    ``gt`` is the GDAL geotransform; north-up only (rotation terms
    must be 0) since GeoTIFF's PixelScale+Tiepoint encoding cannot
    express rotation."""
    if compression not in (None, "deflate"):
        raise NotImplementedError(
            f"unsupported compression {compression!r}: DEFLATE (zlib) is "
            "implemented; JPEG/LZW need external codecs"
        )
    if gt[2] != 0.0 or gt[4] != 0.0:
        raise ValueError("rotated geotransforms cannot be encoded in GeoTIFF")
    bits, fmt, npdt = _DTYPES[dtype]
    n_tx = -(-width // tile_w)
    n_ty = -(-height // tile_h)
    n_tiles = n_tx * n_ty * n_bands
    fill = nodata if nodata is not None else 0

    # --- serialize tiles (band-major, then row-major tile order) ---
    import zlib

    payloads = []
    for band in range(n_bands):
        for ty in range(n_ty):
            for tx in range(n_tx):
                key = (tx, ty) if n_bands == 1 else (band, tx, ty)
                a = tiles.get(key)
                full = np.full((tile_h, tile_w), fill, dtype=npdt)
                if a is not None:
                    a = np.asarray(a, dtype=npdt)
                    full[: a.shape[0], : a.shape[1]] = a
                raw = full.tobytes()  # native little-endian
                payloads.append(zlib.compress(raw, 6) if compression else raw)
    tile_bytes = [len(p) for p in payloads]

    # --- IFD layout (offsets computed before writing) ---
    # entries sorted by tag id, as the spec requires
    nodata_ascii = (
        (repr(float(nodata)) if nodata is not None else "").encode() + b"\x00"
    )
    geo_keys = [
        1, 1, 0, 3,          # version, rev, minor, n_keys
        1024, 0, 1, 2,       # GTModelTypeGeoKey = geographic
        1025, 0, 1, 1,       # GTRasterTypeGeoKey = PixelIsArea
        2048, 0, 1, epsg,    # GeographicTypeGeoKey
    ]
    entries = [
        (TAG_WIDTH, _T_LONG, 1, [width]),
        (TAG_LENGTH, _T_LONG, 1, [height]),
        (TAG_BITS, _T_SHORT, n_bands, [bits] * n_bands),
        # 1 = none, 8 = Adobe DEFLATE (zlib streams per tile)
        (TAG_COMPRESSION, _T_SHORT, 1, [8 if compression else 1]),
        (TAG_PHOTOMETRIC, _T_SHORT, 1, [1]),
        (TAG_SAMPLES, _T_SHORT, 1, [n_bands]),
        # planar (separate band planes) for multi-band: tile data is
        # band-major, which is exactly how per-band block tables land
        (TAG_PLANAR, _T_SHORT, 1, [2 if n_bands > 1 else 1]),
        (TAG_TILE_W, _T_LONG, 1, [tile_w]),
        (TAG_TILE_H, _T_LONG, 1, [tile_h]),
        (TAG_TILE_OFFSETS, _T_LONG, n_tiles, None),   # patched below
        (TAG_TILE_BYTES, _T_LONG, n_tiles, tile_bytes),
        (TAG_SAMPLE_FORMAT, _T_SHORT, n_bands, [fmt] * n_bands),
        (TAG_PIXEL_SCALE, _T_DOUBLE, 3, [gt[1], -gt[5], 0.0]),
        (TAG_TIEPOINT, _T_DOUBLE, 6, [0.0, 0.0, 0.0, gt[0], gt[3], 0.0]),
        (TAG_GEO_KEYS, _T_SHORT, len(geo_keys), geo_keys),
    ]
    if nodata is not None:
        entries.append((TAG_NODATA, _T_ASCII, len(nodata_ascii), nodata_ascii))
    entries.sort(key=lambda e: e[0])

    _SZ = {_T_SHORT: 2, _T_LONG: 4, _T_DOUBLE: 8, _T_ASCII: 1}
    ifd_offset = 8
    ifd_size = 2 + 12 * len(entries) + 4
    # external value area: every entry whose payload exceeds 4 bytes
    ext_offset = ifd_offset + ifd_size
    ext_pos = {}
    pos = ext_offset
    for tag, typ, cnt, _ in entries:
        sz = _SZ[typ] * cnt
        if sz > 4:
            ext_pos[tag] = pos
            pos += sz + (sz & 1)  # word-align
    data_offset = pos
    offsets = []
    p = data_offset
    for b in tile_bytes:
        offsets.append(p)
        p += b

    def pack_values(typ, cnt, vals):
        if typ == _T_ASCII:
            return bytes(vals)
        code = {_T_SHORT: "H", _T_LONG: "I", _T_DOUBLE: "d"}[typ]
        return struct.pack("<" + code * cnt, *vals)

    out = bytearray()
    out += struct.pack("<2sHI", b"II", 42, ifd_offset)
    # IFD
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, vals in entries:
        if tag == TAG_TILE_OFFSETS:
            vals = offsets
        blob = pack_values(typ, cnt, vals)
        if len(blob) > 4:
            out += struct.pack("<HHI", tag, typ, cnt) + struct.pack("<I", ext_pos[tag])
        else:
            out += struct.pack("<HHI", tag, typ, cnt) + blob.ljust(4, b"\x00")
    out += struct.pack("<I", 0)  # next-IFD pointer: none
    # external arrays (same order as offsets were assigned)
    for tag, typ, cnt, vals in entries:
        if tag in ext_pos:
            if tag == TAG_TILE_OFFSETS:
                vals = offsets
            blob = pack_values(typ, cnt, vals)
            assert len(out) == ext_pos[tag], (tag, len(out), ext_pos[tag])
            out += blob + (b"\x00" if len(blob) & 1 else b"")
    assert len(out) == data_offset
    for pld in payloads:
        out += pld
    with open(path, "wb") as f:
        f.write(bytes(out))
    return {
        "n_tiles": n_tiles,
        "ifd_offset": ifd_offset,
        "data_offset": data_offset,
        "bytes": len(out),
    }


def read_gtiff(path: str):
    """Spec-following reader (the independent oracle): parse the IFD,
    reassemble tiles, clip to (height, width).  Returns (array, tags)
    where tags maps tag id → value list."""
    raw = open(path, "rb").read()
    order, magic, ifd = struct.unpack_from("<2sHI", raw, 0)
    assert order == b"II" and magic == 42, "not a little-endian TIFF"
    (n,) = struct.unpack_from("<H", raw, ifd)
    tags = {}
    _SZ = {_T_SHORT: ("H", 2), _T_LONG: ("I", 4), _T_DOUBLE: ("d", 8), _T_ASCII: ("c", 1)}
    for i in range(n):
        tag, typ, cnt, val_raw = struct.unpack_from("<HHI4s", raw, ifd + 2 + 12 * i)
        code, sz = _SZ[typ]
        total = sz * cnt
        src = val_raw[:total] if total <= 4 else raw[
            struct.unpack("<I", val_raw)[0] : struct.unpack("<I", val_raw)[0] + total
        ]
        if typ == _T_ASCII:
            tags[tag] = src
        else:
            tags[tag] = list(struct.unpack("<" + code * cnt, src))
    width, height = tags[TAG_WIDTH][0], tags[TAG_LENGTH][0]
    tw, th = tags[TAG_TILE_W][0], tags[TAG_TILE_H][0]
    bits = tags[TAG_BITS][0]
    fmt = tags.get(TAG_SAMPLE_FORMAT, [1])[0]
    npdt = {
        (16, 1): np.uint16, (16, 2): np.int16, (32, 1): np.uint32,
        (32, 2): np.int32, (32, 3): np.float32, (64, 3): np.float64,
    }[(bits, fmt)]
    n_tx = -(-width // tw)
    n_ty = -(-height // th)
    n_bands = tags.get(TAG_SAMPLES, [1])[0]
    planar = tags.get(TAG_PLANAR, [1])[0]
    if n_bands > 1 and planar != 2:
        raise ValueError("multi-band reads support PlanarConfiguration=2 only")
    comp = tags.get(TAG_COMPRESSION, [1])[0]
    if comp not in (1, 8):
        raise ValueError(f"unsupported TIFF compression {comp}")
    import zlib

    full = np.zeros((n_bands, n_ty * th, n_tx * tw), dtype=npdt)
    per_band = n_tx * n_ty
    for idx, (off, cnt_b) in enumerate(zip(tags[TAG_TILE_OFFSETS], tags[TAG_TILE_BYTES])):
        buf = raw[off : off + cnt_b]
        if comp == 8:
            buf = zlib.decompress(buf)
        tile = np.frombuffer(buf, dtype=npdt).reshape(th, tw)
        band, rem = divmod(idx, per_band)
        ty, tx = divmod(rem, n_tx)
        full[band, ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw] = tile
    clipped = full[:, :height, :width]
    # single band returns 2D for backward-compatible callers
    return (clipped[0] if n_bands == 1 else clipped), tags


def export_cog(blocks, path: str, width: int, height: int, tile: int = 256,
               gt: tuple = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
               nodata: float | None = None,
               compression: str | None = None) -> dict:
    """Blocks table (the standard block schema, operators/blocks.py)
    → physical COG file.  Stored payload values are written VERBATIM
    (a COG export preserves the on-disk dtype/nodata and stamps the
    nodata tag; scale/offset decoding is a read-time concern).  The
    distributed part is the engine's normal block pipeline; the byte
    assembly is the single-writer step (same posture as
    blocks.assemble_window — COG is one file, so one writer owns the
    fan-in; at scale each output granule/tile-group is one such
    writer task).  Block grid must align with the COG tile grid
    (operators/cog.py layout guarantees it: block sizes are
    ×128-ceiled)."""
    cols = ["xoff", "yoff", "xsize", "ysize", "dtype", "nodataval", "payload"]
    has_band = "band" in blocks.columns
    if has_band:
        cols.append("band")
    rows = blocks.select(*cols).collect()
    dtypes = {r["dtype"] for r in rows}
    if len(dtypes) > 1:
        raise ValueError(f"mixed block dtypes {dtypes} in one COG export")
    dtype = dtypes.pop() if dtypes else "int16"
    if nodata is None and rows and rows[0]["nodataval"] is not None:
        nodata = float(rows[0]["nodataval"])
    # band order: sorted distinct names → GTiff bands 1..N (the
    # reference writes band_idx+1 per block, edk_accessor.py:114-120)
    bands = sorted({r["band"] for r in rows}) if has_band else [None]
    b_idx = {b: i for i, b in enumerate(bands)}
    tiles = {}
    for r in rows:
        if r["xoff"] % tile or r["yoff"] % tile:
            raise ValueError(
                f"block ({r['xoff']},{r['yoff']}) not aligned to tile {tile}"
            )
        if r["xsize"] > tile or r["ysize"] > tile:
            # block sizes are ×128-ceiled and can exceed the COG tile;
            # without this a multi-tile block reaches write_gtiff and
            # dies in an opaque numpy broadcast error (ADVICE r4)
            raise ValueError(
                f"block ({r['xoff']},{r['yoff']}) size "
                f"{r['xsize']}x{r['ysize']} exceeds COG tile {tile}; "
                f"re-chunk blocks to <= tile or raise tile="
            )
        a = np.frombuffer(r["payload"], dtype=_DTYPES[dtype][2]).reshape(
            int(r["ysize"]), int(r["xsize"])
        )
        tx, ty = r["xoff"] // tile, r["yoff"] // tile
        key = (tx, ty) if len(bands) == 1 else (b_idx[r["band"]], tx, ty)
        tiles[key] = a
    info = write_gtiff(
        path, tiles, width, height, tile, tile, dtype=dtype, gt=gt, nodata=nodata,
        compression=compression, n_bands=len(bands),
    )
    info["bands"] = bands if has_band else []
    return info
