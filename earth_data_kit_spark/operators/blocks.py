"""Raster block pipeline: windowed reads, mask/scale, partial-agg
reduction, regrid — the reference's xarray backend as DataFrame ops.

The reference reads rasters in clamped pixel windows
(/root/reference/earth_data_kit/xarray_boosted/entrypoint.py:95-133,
R1), masks nodata → NaN (entrypoint.py:75-84, F8), applies
scale/offset (86-91, F9), assembles chunks (edk_accessor.py:344-393,
R3) and reduces with a manual weighted mean across threads
(benchmarks/read_gdal_parallel.py:44-50, A5).

Spark restatement: a **blocks table** — one row per raster block with
the payload as a binary column of raw little-endian samples —
processed by Arrow-batched ``mapInPandas``.  Block metadata (offsets,
sizes) are plain columns, so window pruning is a Catalyst range
filter that reaches the parquet scan; only surviving blocks are
decoded in Python.  The global mean is a two-level aggregation: the
pandas stage emits per-block (sum, count) partials, the final agg is
native — exactly Spark's partial/final model, replacing the
reference's hand-rolled thread pool.

At 100 TB: blocks parquet is partitioned/sorted by (band,
zorder(block)) so a window read prunes row groups; per-block payloads
are O(block_size²·dtype) ≈ 0.5-8 MB — sized by the reference's own
heuristic (grid/affine.py block_chunk_size, F14).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from earth_data_kit_spark.grid.affine import pixel_window_clamped

BLOCK_SCHEMA = (
    "tile_name string, band string, block_x int, block_y int, "
    "xoff int, yoff int, xsize int, ysize int, dtype string, "
    "nodataval double, scale double, offset double, payload binary"
)


def synth_blocks_df(
    spark: SparkSession,
    raster_x: int = 1024,
    raster_y: int = 1024,
    block: int = 256,
    band: str = "B1",
    nodata: float = 32767.0,
    scale: float = 1e-4,
    dtype: str = "int16",
    nodata_stripe: bool = True,
) -> DataFrame:
    """Deterministic synthetic raster, value(x, y) = (x*31 + y*17) %
    30000, with a nodata stripe at y % 97 == 0 (optional) — cut into
    blocks.  Built driver-side (small) then parallelized; a real
    ingest would mapInPandas over tile paths."""
    rows = []
    for by in range(0, raster_y, block):
        for bx in range(0, raster_x, block):
            xs = min(block, raster_x - bx)
            ys = min(block, raster_y - by)
            xg, yg = np.meshgrid(np.arange(bx, bx + xs), np.arange(by, by + ys))
            v = ((xg * 31 + yg * 17) % 30000).astype(np.int16)
            if nodata_stripe:
                v[yg % 97 == 0] = np.int16(int(nodata))
            rows.append(
                (
                    "synth", band, bx // block, by // block,
                    bx, by, xs, ys, dtype, nodata, scale, 0.0,
                    v.tobytes(),
                )
            )
    # partition count follows spark.sql.shuffle.partitions (session
    # cores) so downstream Arrow stages parallelize at every level —
    # a hardcoded 8 capped the 32-core bench at 8 decode tasks
    return spark.createDataFrame(rows, BLOCK_SCHEMA).repartition("block_x", "block_y")


def window_filter(blocks: DataFrame, xoff: int, yoff: int, xsize: int, ysize: int) -> DataFrame:
    """Prune blocks outside the read window — a pure Column range
    predicate (pushes to the parquet scan; no payload decode)."""
    return blocks.where(
        (F.col("xoff") < xoff + xsize)
        & (F.col("xoff") + F.col("xsize") > xoff)
        & (F.col("yoff") < yoff + ysize)
        & (F.col("yoff") + F.col("ysize") > yoff)
    )


_DT = {"int16": np.int16, "uint8": np.uint8, "int32": np.int32, "float32": np.float32, "float64": np.float64}


def _decode(row) -> np.ndarray:
    a = np.frombuffer(row["payload"], dtype=_DT[row["dtype"]])
    return a.reshape(int(row["ysize"]), int(row["xsize"]))


def decode_block_window(row, xoff: int, yoff: int, xsize: int, ysize: int):
    """One block's contribution to a read window: clamped
    intersection, decode, nodata → NaN, scale/offset (the reference's
    force-cast semantics, commons.py:6-7).  Returns (dst_x, dst_y,
    iw, ih, float32 array) or None when the block misses the window.
    Shared by windowed_read and the DataArray facade so the decode
    semantics can never fork."""
    ix0, iy0, iw, ih = pixel_window_clamped(
        xoff - int(row["xoff"]), yoff - int(row["yoff"]),
        xsize, ysize, int(row["xsize"]), int(row["ysize"]),
    )
    if iw == 0 or ih == 0:
        return None
    arr = _decode(row)[iy0 : iy0 + ih, ix0 : ix0 + iw].astype(np.float32)
    nod = row["nodataval"]
    if nod is not None and not np.isnan(nod):
        arr = np.where(arr == np.float32(nod), np.nan, arr)
    arr = (arr * np.float32(row["scale"]) + np.float32(row["offset"])).astype(np.float32)
    return (int(row["xoff"]) + ix0 - xoff, int(row["yoff"]) + iy0 - yoff, iw, ih, arr)


def windowed_read(
    blocks: DataFrame,
    xoff: int,
    yoff: int,
    xsize: int,
    ysize: int,
    carry_cols: tuple[str, ...] = (),
    carry_schema: str = "",
) -> DataFrame:
    """R1/R3: clamped window read returning per-block sub-arrays as
    rows (dst offsets relative to the window origin).  ``carry_cols``
    pass identity columns (e.g. t, band) through the Arrow stage so
    one job can serve many (time, band) slices of a request."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: [] for c in carry_cols}
            out.update({"dst_x": [], "dst_y": [], "xsize": [], "ysize": [], "values": []})
            for _, row in pdf.iterrows():
                hit = decode_block_window(row, xoff, yoff, xsize, ysize)
                if hit is None:
                    continue
                dst_x, dst_y, iw, ih, arr = hit
                for c in carry_cols:
                    out[c].append(row[c])
                out["dst_x"].append(dst_x)
                out["dst_y"].append(dst_y)
                out["xsize"].append(iw)
                out["ysize"].append(ih)
                out["values"].append(arr.ravel().tolist())
            yield pd.DataFrame(out)

    prefix = f"{carry_schema}, " if carry_schema else ""
    pruned = window_filter(blocks, xoff, yoff, xsize, ysize)
    return pruned.mapInPandas(
        run,
        schema=f"{prefix}dst_x int, dst_y int, xsize int, ysize int, values array<float>",
    )


def assemble_window(read_df: DataFrame, xsize: int, ysize: int) -> np.ndarray:
    """Driver-side assembly (test/export path only — R3's
    ``result[x0:, y0:] = chunk``)."""
    out = np.full((ysize, xsize), np.nan, dtype=np.float32)
    for r in read_df.collect():
        a = np.array(r["values"], dtype=np.float32).reshape(r["ysize"], r["xsize"])
        out[r["dst_y"] : r["dst_y"] + r["ysize"], r["dst_x"] : r["dst_x"] + r["xsize"]] = a
    return out


def block_mean(blocks: DataFrame) -> DataFrame:
    """A5: nan-aware mean via partial (per-block sum/count in the
    Arrow stage) + final (native agg) — the distributed restatement
    of benchmarks/read_gdal_parallel.py:44-50's weighted mean."""

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sums, cnts, bands = [], [], []
            for _, row in pdf.iterrows():
                arr = _decode(row).astype(np.float64)
                nod = row["nodataval"]
                if nod is not None and not np.isnan(nod):
                    arr = np.where(arr == nod, np.nan, arr)
                arr = arr * row["scale"] + row["offset"]
                sums.append(np.nansum(arr))
                cnts.append(int(np.sum(~np.isnan(arr))))
                bands.append(row["band"])
            yield pd.DataFrame({"band": bands, "s": sums, "n": cnts})

    p = blocks.mapInPandas(partials, schema="band string, s double, n bigint")
    return p.groupBy("band").agg(
        (F.sum("s") / F.sum("n")).alias("mean"), F.sum("n").alias("n_valid")
    )


def _interp_indices(n_dst: int, n_src: int, method: str):
    """Dst-pixel-center sample positions in src space and the src
    index window a method needs: (positions, base_idx, hi_extra).
    linear: floor clipped to n_src-2, samples base..base+1;
    nearest: rint clipped to n_src-1, samples base only."""
    pos = (np.arange(n_dst) + 0.5) * (n_src / n_dst) - 0.5
    if method == "nearest":
        return pos, np.clip(np.rint(pos).astype(int), 0, n_src - 1), 0
    return pos, np.clip(np.floor(pos).astype(int), 0, max(0, n_src - 2)), 1


def _check_method(method: str) -> None:
    if method not in ("linear", "nearest"):
        raise NotImplementedError(
            f"interpolation method {method!r} ('linear' and 'nearest' only)"
        )


def regrid_bilinear(
    blocks: DataFrame,
    src_size: tuple[int, int],
    dst_size: tuple[int, int],
    method: str = "linear",
) -> DataFrame:
    """J4/R9: grid-align a (small-per-group) raster onto a new grid —
    ``groupBy(tile, band).applyInPandas``: each group assembles its
    blocks, interpolates in numpy, re-blocks.  ``method`` is
    'linear' (bilinear, the reference default) or 'nearest' (nearest
    source pixel center — exact passthrough of categorical rasters).

    Scale note: per-group assembly bounds group size to one tile
    (2400² × 4 B ≈ 23 MB — executor-safe).  Cross-tile regrids at
    100 TB would use halo exchange (explode each src block to the dst
    blocks it contributes to, groupBy dst block) — same math, one
    more shuffle; this entry point covers the reference's per-tile
    warp semantics (dataset.py:516-541).
    """
    _check_method(method)
    sw, sh = src_size
    dw, dh = dst_size

    def per_group(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        full = np.full((sh, sw), np.nan, dtype=np.float64)
        scale = pdf.iloc[0]["scale"]
        offset = pdf.iloc[0]["offset"]
        nod = pdf.iloc[0]["nodataval"]
        for _, row in pdf.iterrows():
            arr = _decode(row).astype(np.float64)
            if nod is not None and not np.isnan(nod):
                arr = np.where(arr == nod, np.nan, arr)
            full[
                int(row["yoff"]) : int(row["yoff"]) + int(row["ysize"]),
                int(row["xoff"]) : int(row["xoff"]) + int(row["xsize"]),
            ] = arr * scale + offset
        # sample at dst pixel centers mapped into src space
        ys, y0, _ = _interp_indices(dh, sh, method)
        xs, x0, _ = _interp_indices(dw, sw, method)
        if method == "nearest":
            out = full[y0][:, x0]
        else:
            wy = (ys - y0)[:, None]
            wx = (xs - x0)[None, :]
            a = full[y0][:, x0]
            b = full[y0][:, x0 + 1]
            c = full[y0 + 1][:, x0]
            d = full[y0 + 1][:, x0 + 1]
            out = a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx + c * wy * (1 - wx) + d * wy * wx
        return pd.DataFrame(
            {
                "tile_name": [key[0]],
                "band": [key[1]],
                "dst_xsize": [dw],
                "dst_ysize": [dh],
                "values": [out.astype(np.float32).ravel().tolist()],
            }
        )

    return blocks.groupBy("tile_name", "band").applyInPandas(
        per_group,
        schema="tile_name string, band string, dst_xsize int, dst_ysize int, values array<float>",
    )


def combine_blocks(
    ref: DataFrame,
    others: list[DataFrame],
    ref_size: tuple[int, int],
    src_sizes: list[tuple[int, int]],
    method: str | list[str] | None = None,
    dst_block: int = 256,
    out_dtype: str = "float32",
) -> DataFrame:
    """``Dataset.combine`` (reference dataset.py:923-965): align every
    input raster onto the REFERENCE grid by interpolation and stack
    them as bands 1..N (reference first) — xr.concat(dim='band')
    restated as a union of regridded block tables with the band
    coordinate reassigned.

    ``method`` mirrors the reference's contract: a single string or a
    per-input list — 'linear' (bilinear, the reference's default) or
    'nearest'; a length mismatch raises, like the reference.  The
    reference passes through unresampled: the identity regrid (src
    grid == dst grid) is exact under either method — pixel centers
    map onto themselves — so one code path serves all bands."""
    if method is None:
        method = ["linear"] * len(others)
    elif isinstance(method, str):
        method = [method] * len(others)
    elif isinstance(method, (list, tuple)):
        if len(method) != len(others):
            raise ValueError("Length of method list must match number of inputs.")
    else:
        raise TypeError("method must be a string or a list/tuple of strings.")
    for m in method:
        _check_method(m)
    if len(others) != len(src_sizes):
        raise ValueError("src_sizes must match others")

    # the reference regrids only the non-reference inputs; the ref
    # band itself is the identity regrid (exact under either method)
    methods = ["linear"] + list(method)
    stacked = []
    for i, (bl, size) in enumerate([(ref, ref_size)] + list(zip(others, src_sizes))):
        rg = regrid_bilinear_blocks(bl, size, ref_size, dst_block, out_dtype,
                                    method=methods[i])
        stacked.append(rg.withColumn("band", F.lit(str(i + 1))))
    out = stacked[0]
    for s in stacked[1:]:
        out = out.unionByName(s)
    return out


def regrid_bilinear_blocks(
    blocks: DataFrame,
    src_size: tuple[int, int],
    dst_size: tuple[int, int],
    dst_block: int = 256,
    out_dtype: str = "float32",
    method: str = "linear",
) -> DataFrame:
    """J4 at mosaic scale: cross-tile bilinear regrid via HALO
    EXCHANGE (reference ``Dataset.combine``/grid-align semantics,
    dataset.py:922-965) — the plan ``regrid_bilinear``'s docstring
    promised:

      1. each src block computes (pure Columns) the conservative
         range of DST BLOCKS its pixels can contribute to under the
         bilinear footprint, and explodes to one row per dst block —
         the halo: border src blocks land in several dst groups;
      2. ``groupBy(band, dst_bx, dst_by).applyInPandas`` assembles
         only the needed src sub-window per group and interpolates
         that dst block in numpy.

    Group state is bounded by dst_block²·(scale factor) + halo —
    independent of mosaic size, so a 10⁶×10⁶ mosaic regrids with the
    same per-executor memory as one tile (unlike the per-tile
    ``regrid_bilinear``, whose group is a whole tile).  Output: one
    row per dst block with ``values`` (row-major).  The interpolation
    math (pixel-center mapping, edge clamp to sw-2, weights from the
    clipped index) matches regrid_bilinear exactly.

    ``out_dtype='float64'`` keeps full precision (used by the
    oracle-paired driver query); float32 is the raster-convention
    default at scale.  ``method='nearest'`` samples the nearest src
    pixel center instead (the halo Column math is unchanged — the
    nearest footprint is a subset of the bilinear one, and unneeded
    halo blocks drop in the group step)."""
    _check_method(method)
    sw, sh = src_size
    dw, dh = dst_size
    sxf, syf = sw / dw, sh / dh
    bpx = dst_block

    def dst_px_range(off: F.Column, size: F.Column, scale: float, dst_n: int):
        lo = F.greatest(F.lit(0), F.floor((off - 1.5) / scale - 0.5).cast("int"))
        hi = F.least(
            F.lit(dst_n - 1),
            F.ceil((off + size + 1.5) / scale - 0.5).cast("int"),
        )
        return lo, hi

    x_lo, x_hi = dst_px_range(F.col("xoff"), F.col("xsize"), sxf, dw)
    y_lo, y_hi = dst_px_range(F.col("yoff"), F.col("ysize"), syf, dh)
    exploded = (
        blocks.withColumn(
            "dst_bx",
            F.explode(F.sequence((x_lo / bpx).cast("int"), (x_hi / bpx).cast("int"))),
        )
        .withColumn(
            "dst_by",
            F.explode(F.sequence((y_lo / bpx).cast("int"), (y_hi / bpx).cast("int"))),
        )
    )

    np_dtype = np.float64 if out_dtype == "float64" else np.float32

    def per_dst_block(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        band, bx, by = key
        x0_px, x1_px = bx * bpx, min(dw, bx * bpx + bpx) - 1
        y0_px, y1_px = by * bpx, min(dh, by * bpx + bpx) - 1
        xs = (np.arange(x0_px, x1_px + 1) + 0.5) * sxf - 0.5
        ys = (np.arange(y0_px, y1_px + 1) + 0.5) * syf - 0.5
        if method == "nearest":
            xf = np.clip(np.rint(xs).astype(int), 0, sw - 1)
            yf = np.clip(np.rint(ys).astype(int), 0, sh - 1)
            extra = 0
        else:
            xf = np.clip(np.floor(xs).astype(int), 0, sw - 2)
            yf = np.clip(np.floor(ys).astype(int), 0, sh - 2)
            extra = 1
        sx_lo, sx_hi = int(xf.min()), int(xf.max()) + extra
        sy_lo, sy_hi = int(yf.min()), int(yf.max()) + extra
        local = np.full((sy_hi - sy_lo + 1, sx_hi - sx_lo + 1), np.nan, dtype=np.float64)
        scale = pdf.iloc[0]["scale"]
        offset = pdf.iloc[0]["offset"]
        nod = pdf.iloc[0]["nodataval"]
        for _, row in pdf.iterrows():
            bx0, by0 = int(row["xoff"]), int(row["yoff"])
            bw, bh = int(row["xsize"]), int(row["ysize"])
            ix0, ix1 = max(bx0, sx_lo), min(bx0 + bw, sx_hi + 1)
            iy0, iy1 = max(by0, sy_lo), min(by0 + bh, sy_hi + 1)
            if ix0 >= ix1 or iy0 >= iy1:
                continue  # halo slack — block not actually needed
            arr = _decode(row).astype(np.float64)
            if nod is not None and not np.isnan(nod):
                arr = np.where(arr == nod, np.nan, arr)
            local[iy0 - sy_lo : iy1 - sy_lo, ix0 - sx_lo : ix1 - sx_lo] = (
                arr[iy0 - by0 : iy1 - by0, ix0 - bx0 : ix1 - bx0] * scale + offset
            )
        y0 = yf - sy_lo
        x0 = xf - sx_lo
        if method == "nearest":
            out = local[y0][:, x0]
        else:
            wy = (ys - yf)[:, None]
            wx = (xs - xf)[None, :]
            a = local[y0][:, x0]
            b = local[y0][:, x0 + 1]
            c = local[y0 + 1][:, x0]
            d = local[y0 + 1][:, x0 + 1]
            out = a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx + c * wy * (1 - wx) + d * wy * wx
        return pd.DataFrame(
            {
                "band": [band],
                "dst_bx": [int(bx)],
                "dst_by": [int(by)],
                "xoff": [x0_px],
                "yoff": [y0_px],
                "xsize": [x1_px - x0_px + 1],
                "ysize": [y1_px - y0_px + 1],
                "values": [out.astype(np_dtype).ravel().tolist()],
            }
        )

    arr_type = "array<double>" if out_dtype == "float64" else "array<float>"
    return exploded.groupBy("band", "dst_bx", "dst_by").applyInPandas(
        per_dst_block,
        schema=(
            "band string, dst_bx int, dst_by int, xoff int, yoff int, "
            f"xsize int, ysize int, values {arr_type}"
        ),
    )
