"""Hexagonal binning (pointy-top axial grid, cube-rounded).

The hex analog of the quadgrid ``cell_id_col``: map (lon, lat) to
axial hex coordinates (q, r) of the pointy-top hexagon of size
``size`` (circumradius, degrees) containing the point — the standard
visualization/aggregation grid for point clouds (density maps, skew-
free heat tiles; hexagons have uniform neighbor distance, unlike
squares).  Public axial/cube-coordinate math (Red Blob Games'
hexagonal-grids reference); no reference-repo analog (the reference
grids only by its tile quadgrid).

Everything is ONE dialect-neutral SQL fragment (pure IEEE-754
arithmetic: *, /, floor, CASE — no transcendentals, sqrt(3) is a
literal), evaluated verbatim by Spark (``F.expr``) and by the DuckDB
oracle, so both engines run bit-identical expressions.  Nearest
integer is ``floor(x + 5e-1)`` in both (consistent tie-up semantics;
``round()`` differs across dialects for negative halves).

Scale: a pure map-side Column pair — binning a 100 TB point table is
a projection; the groupBy on (hq, hr) is the only shuffle and
partial-aggregates map-side like any hash agg.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SQRT3 = "1.7320508075688772e0"  # double literal in BOTH dialects (plain decimals parse as DECIMAL in Spark)


def _dlit(v: float) -> str:
    """Exact double literal valid in both dialects (e-notation keeps
    Spark from typing it DECIMAL)."""
    return f"{float(v):.17e}"


def hex_qr_sql(x: str, y: str, size: float) -> tuple[str, str]:
    """(q_sql, r_sql): axial coords of the pointy-top hex containing
    (x, y) — fractional axial transform then cube rounding."""
    qf = f"(({SQRT3} / 3.0e0 * ({x}) - 1.0e0 / 3.0e0 * ({y})) / {_dlit(size)})"
    rf = f"((2.0e0 / 3.0e0 * ({y})) / {_dlit(size)})"
    # cube coords: cx = qf, cz = rf, cy = -qf-rf; round each, then
    # push the largest rounding error back onto its axis
    rx = f"floor({qf} + 5e-1)"
    ry = f"floor((-({qf}) - ({rf})) + 5e-1)"
    rz = f"floor({rf} + 5e-1)"
    dx = f"abs({rx} - ({qf}))"
    dy = f"abs({ry} - (-({qf}) - ({rf})))"
    dz = f"abs({rz} - ({rf}))"
    fix_x = f"({dx} > {dy} AND {dx} > {dz})"
    fix_y = f"(NOT {fix_x} AND {dy} > {dz})"
    q = f"CAST(CASE WHEN {fix_x} THEN -({ry}) - ({rz}) ELSE {rx} END AS BIGINT)"
    r = (
        f"CAST(CASE WHEN NOT {fix_x} AND NOT {fix_y} "
        f"THEN -({rx}) - ({ry}) ELSE {rz} END AS BIGINT)"
    )
    return q, r


def hex_qr_cols(x: Column, y: Column, size: float) -> tuple[Column, Column]:
    """Spark Column twins — the same SQL text through ``F.expr`` so
    the plan stays in codegen and matches the oracle bit-for-bit."""
    xs, ys = x._jc.toString(), y._jc.toString()
    q, r = hex_qr_sql(xs, ys, size)
    return F.expr(q), F.expr(r)


def hex_center_sql(q: str, r: str, size: float) -> tuple[str, str]:
    """Inverse transform: center (x, y) of axial hex (q, r)."""
    cx = f"({_dlit(size)} * {SQRT3} * (({q}) + ({r}) / 2.0e0))"
    cy = f"({_dlit(size)} * 1.5e0 * ({r}))"
    return cx, cy


def hex_bin(
    df: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    size: float = 1.0,
    q_col: str = "hq",
    r_col: str = "hr",
) -> DataFrame:
    """Append axial hex-bin columns — a map-only projection."""
    q, r = hex_qr_cols(F.col(lon_col), F.col(lat_col), size)
    return df.withColumn(q_col, q).withColumn(r_col, r)
