"""Real S2 cell ids — the genuine algorithm, vectorized in numpy.

The north-star rule asks for "H3 and S2 hierarchical cell indexes".
``grid/cells.py`` provides the SQL-mirrorable quadgrid/zorder schemes
(those carry the driver's oracle gates); this module implements the
*actual* S2 cell-id scheme from the published algorithm (S2 geometry
library design docs / "S2 cells" public documentation — reimplemented
from the math, no library, no code copied):

1. lat/lng → unit XYZ vector.
2. Cube face 0..5 = the dominant axis (+x,+y,+z,-x,-y,-z); gnomonic
   projection onto that face gives (u,v) ∈ [-1,1]².
3. Quadratic ST transform ``s = sqrt(1+3u)/2 (u≥0)`` /
   ``1 - sqrt(1-3u)/2 (u<0)`` flattens the area distortion so cells
   have near-uniform size on the sphere.
4. (s,t) → 30-bit integer (i,j) leaf coordinates.
5. A Hilbert space-filling curve over (i,j) (2-bit state machine,
   orientation = swap|invert) gives the 60-bit curve position; the
   id is ``face<<61 | pos<<1 | 1``.

Why Hilbert matters at 100 TB: ids at any level are a *prefix range*
of the leaf ids below them (``range_min``/``range_max``), and curve
neighbors are spatial neighbors, so sorting a 10^12-row table by
``s2_leaf`` gives locality-preserving range partitioning, and a
covering of a query region turns point-in-region into a handful of
range predicates that Spark/parquet prune on min/max stats.

Ids are kept as uint64 internally (faces 4–5 set bit 63).  For Spark
(int64 only) ``to_spark_i64``/``from_spark_i64`` reinterpret the bits;
two's-complement reinterpretation is order-preserving *within* each
face and the face is recoverable, so groupBy/equi-join semantics are
unchanged (range-sort across faces 3↔4 would interleave — use
``xor_msb`` ordering for global range partitioning, provided below).

Reference analog: the reference's fixed h/v MODIS grid
(/root/reference/earth_data_kit/stitching/engines/s3.py:183-221) has
no hierarchical index; S2 is the scale-path index named by the north
rule.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_FACE_SHIFT = 61  # 60 pos bits + 1 sentinel bit

# Hilbert curve lookup tables (orientation bits: 1 = swap, 2 = invert).
# Row = orientation, column = position along the curve → ij code (2*i+j).
_POS_TO_IJ = np.array(
    [
        [0, 1, 3, 2],  # canonical "U" order: (0,0) (0,1) (1,1) (1,0)
        [0, 2, 3, 1],  # swap:               (0,0) (1,0) (1,1) (0,1)
        [3, 2, 0, 1],  # invert
        [3, 1, 0, 2],  # swap + invert
    ],
    dtype=np.uint64,
)
# Inverse: row = orientation, column = ij code → curve position.
_IJ_TO_POS = np.array(
    [[0, 1, 3, 2], [0, 3, 1, 2], [2, 3, 1, 0], [2, 1, 3, 0]],
    dtype=np.uint64,
)
# Orientation of child `pos` relative to its parent.
_POS_TO_ORIENT = np.array([1, 0, 0, 3], dtype=np.uint64)


# ------------------------------------------------------------ projections

def latlng_to_xyz(lat_deg, lng_deg):
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lng = np.radians(np.asarray(lng_deg, dtype=np.float64))
    cos_lat = np.cos(lat)
    return cos_lat * np.cos(lng), cos_lat * np.sin(lng), np.sin(lat)


def xyz_to_latlng(x, y, z):
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    lng = np.degrees(np.arctan2(y, x))
    return lat, lng


def xyz_to_face_uv(x, y, z):
    """Dominant-axis cube face and gnomonic (u,v) for unit vectors."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        (ax >= ay) & (ax >= az),
        np.where(x >= 0, 0, 3),
        np.where(ay >= az, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)),
    ).astype(np.uint64)
    u = np.empty_like(np.asarray(x, dtype=np.float64))
    v = np.empty_like(u)
    for f, (un, ud, vn, vd) in _FACE_UV.items():
        m = face == f
        if not np.any(m):
            continue
        comp = {"x": x, "y": y, "z": z}
        u[m] = un[0] * comp[un[1]][m] / (ud[0] * comp[ud[1]][m])
        v[m] = vn[0] * comp[vn[1]][m] / (vd[0] * comp[vd[1]][m])
    return face, u, v


# face → (u numerator, u denominator, v numerator, v denominator),
# each a (sign, axis) pair; the standard S2 face frames.
_FACE_UV = {
    0: ((1, "y"), (1, "x"), (1, "z"), (1, "x")),
    1: ((-1, "x"), (1, "y"), (1, "z"), (1, "y")),
    2: ((-1, "x"), (1, "z"), (-1, "y"), (1, "z")),
    3: ((1, "z"), (1, "x"), (1, "y"), (1, "x")),  # x < 0: both ratios flip sign
    4: ((1, "z"), (1, "y"), (-1, "x"), (1, "y")),
    5: ((-1, "y"), (1, "z"), (-1, "x"), (1, "z")),
}


def face_uv_to_xyz(face, u, v):
    """Un-normalized XYZ for (face, u, v); valid for any real u, v
    (the gnomonic extension — used by cross-face neighbor hops)."""
    face = np.asarray(face, dtype=np.uint64)
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    one = np.ones_like(u)
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    for f, (fx, fy, fz) in {
        0: (one, u, v),
        1: (-u, one, v),
        2: (-u, -v, one),
        3: (-one, -v, -u),
        4: (v, -one, -u),
        5: (v, u, -one),
    }.items():
        m = face == f
        x[m], y[m], z[m] = fx[m], fy[m], fz[m]
    return x, y, z


def uv_to_st(u):
    """Quadratic area-flattening transform, [-1,1] → [0,1]."""
    u = np.asarray(u, dtype=np.float64)
    r = 0.5 * np.sqrt(1.0 + 3.0 * np.abs(u))  # sqrt(1+3u) for u>=0 == sqrt(1+3|u|)
    return np.where(u >= 0.0, r, 1.0 - r)


def st_to_uv(s):
    """Inverse quadratic transform; monotone extension outside [0,1]
    (s<0 / s>1 map to |u|>1, which face_uv_to_xyz handles)."""
    s = np.asarray(s, dtype=np.float64)
    return np.where(s >= 0.5, (4.0 * s * s - 1.0) / 3.0, (1.0 - 4.0 * (1.0 - s) ** 2) / 3.0)


def st_to_ij(s, level: int = MAX_LEVEL):
    n = 1 << level
    ij = np.floor(np.asarray(s, dtype=np.float64) * n).astype(np.int64)
    return np.clip(ij, 0, n - 1).astype(np.uint64)


# ------------------------------------------------------------ Hilbert curve

def _encode_pos(face, i, j, level: int):
    """Hilbert curve position (2*level bits) of (i, j) at `level`."""
    orient = face & np.uint64(1)
    pos = np.zeros_like(face, dtype=np.uint64)
    for k in range(level - 1, -1, -1):
        ij = ((i >> np.uint64(k)) & np.uint64(1)) * np.uint64(2) | (
            (j >> np.uint64(k)) & np.uint64(1)
        )
        p = _IJ_TO_POS[orient, ij]
        pos = (pos << np.uint64(2)) | p
        orient = orient ^ _POS_TO_ORIENT[p]
    return pos


def _decode_pos(face, pos, level):
    """(i, j, final_orientation) at `level` from a curve position.

    `level` may be a scalar or per-element array (vectorized mask)."""
    level = np.broadcast_to(np.asarray(level, dtype=np.int64), face.shape)
    orient = face & np.uint64(1)
    i = np.zeros_like(face, dtype=np.uint64)
    j = np.zeros_like(face, dtype=np.uint64)
    for step in range(MAX_LEVEL):
        active = step < level
        shift = np.where(active, 2 * (level - 1 - step), 0).astype(np.uint64)
        p = (pos >> shift) & np.uint64(3)
        ij = _POS_TO_IJ[orient, p]
        i = np.where(active, (i << np.uint64(1)) | (ij >> np.uint64(1)), i)
        j = np.where(active, (j << np.uint64(1)) | (ij & np.uint64(1)), j)
        orient = np.where(active, orient ^ _POS_TO_ORIENT[p], orient)
    return i, j, orient


# ------------------------------------------------------------ cell ids

def cell_from_face_ij(face, i, j, level: int = MAX_LEVEL):
    """S2 cell id (uint64) from face + level-resolution (i, j)."""
    pos = _encode_pos(np.asarray(face, dtype=np.uint64), np.asarray(i, dtype=np.uint64), np.asarray(j, dtype=np.uint64), level)
    # pos occupies 2*level bits; shift to the top of the 60-bit field,
    # then the sentinel bit sits just below the last used bit-pair.
    pos_full = pos << np.uint64(2 * (MAX_LEVEL - level))
    sentinel = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return (
        (np.asarray(face, dtype=np.uint64) << np.uint64(_FACE_SHIFT))
        | (pos_full << np.uint64(1))
        | sentinel
    )


def cell_from_latlng(lat, lng, level: int = MAX_LEVEL):
    """Vectorized lat/lng (degrees) → S2 cell id at `level`."""
    x, y, z = latlng_to_xyz(lat, lng)
    return cell_from_xyz(x, y, z, level)


def cell_from_xyz(x, y, z, level: int = MAX_LEVEL):
    face, u, v = xyz_to_face_uv(x, y, z)
    i = st_to_ij(uv_to_st(u), level)
    j = st_to_ij(uv_to_st(v), level)
    return cell_from_face_ij(face, i, j, level)


def cell_level(cid):
    """Level of each id: 30 − (trailing-zero count)/2."""
    cid = np.asarray(cid, dtype=np.uint64)
    lsb = cid & (~cid + np.uint64(1))
    # log2 of an exact power of two is exact in float64 below 2^53;
    # lsb here is ≤ 2^60, so use the bit length via float is unsafe —
    # count with integer shifts instead.
    tz = np.zeros_like(cid, dtype=np.int64)
    v = lsb
    for b in (32, 16, 8, 4, 2, 1):
        big = (v & ((np.uint64(1) << np.uint64(b)) - np.uint64(1))) == 0
        tz = np.where(big & (v != 0), tz + b, tz)
        v = np.where(big, v >> np.uint64(b), v)
    return (MAX_LEVEL - (tz >> 1)).astype(np.int64)


def cell_face(cid):
    return (np.asarray(cid, dtype=np.uint64) >> np.uint64(_FACE_SHIFT)).astype(np.int64)


def cell_to_face_ij(cid):
    """(face, i, j, level) with i, j at the cell's own level."""
    cid = np.asarray(cid, dtype=np.uint64)
    level = cell_level(cid)
    face = cid >> np.uint64(_FACE_SHIFT)
    pos_full = (cid & ((np.uint64(1) << np.uint64(_FACE_SHIFT)) - np.uint64(1))) >> np.uint64(1)
    shift = (2 * (MAX_LEVEL - level)).astype(np.uint64)
    pos = pos_full >> shift
    i, j, _ = _decode_pos(face, pos, level)
    return face.astype(np.int64), i.astype(np.int64), j.astype(np.int64), level


def cell_to_center_latlng(cid):
    """Vectorized cell center (lat, lng) in degrees."""
    face, i, j, level = cell_to_face_ij(cid)
    n = (np.int64(1) << level).astype(np.float64)
    s = (i.astype(np.float64) + 0.5) / n
    t = (j.astype(np.float64) + 0.5) / n
    x, y, z = face_uv_to_xyz(face.astype(np.uint64), st_to_uv(s), st_to_uv(t))
    return xyz_to_latlng(x, y, z)


def parent(cid, level: int):
    """Ancestor cell at `level` (uint64, vectorized)."""
    cid = np.asarray(cid, dtype=np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return (cid & ~(lsb + lsb - np.uint64(1))) | lsb


def range_min(cid):
    """Smallest leaf id contained in the cell."""
    cid = np.asarray(cid, dtype=np.uint64)
    lsb = cid & (~cid + np.uint64(1))
    return cid - (lsb - np.uint64(1))


def range_max(cid):
    """Largest leaf id contained in the cell."""
    cid = np.asarray(cid, dtype=np.uint64)
    lsb = cid & (~cid + np.uint64(1))
    return cid + (lsb - np.uint64(1))


def contains(ancestor, cid):
    """ancestor ⊇ cid (vectorized): prefix-range containment."""
    return (range_min(ancestor) <= np.asarray(cid, dtype=np.uint64)) & (
        np.asarray(cid, dtype=np.uint64) <= range_max(ancestor)
    )


# ------------------------------------------------------------ tokens / spark

def token(cid) -> str:
    """Canonical S2 token: 16-hex-digit id with trailing zeros stripped."""
    c = int(np.asarray(cid, dtype=np.uint64).reshape(-1)[0])
    if c == 0:
        return "X"
    return f"{c:016x}".rstrip("0")


def from_token(tok: str) -> int:
    if tok == "X":
        return 0
    return int(tok.ljust(16, "0"), 16)


def to_spark_i64(cid):
    """Reinterpret uint64 ids as int64 for Spark columns."""
    return np.asarray(cid, dtype=np.uint64).view(np.int64)


def from_spark_i64(col):
    return np.asarray(col, dtype=np.int64).view(np.uint64)


def xor_msb(cid):
    """Order-preserving int64 image of the uint64 id (flip the sign
    bit) — use for global range partitioning / sorting in Spark."""
    return (np.asarray(cid, dtype=np.uint64) ^ np.uint64(1 << 63)).view(np.int64)


# ------------------------------------------------------------ neighbors

def edge_neighbors_batch(cids) -> np.ndarray:
    """(N, 4) edge-adjacent cells for N same-level ids (vectorized).

    In-face steps use exact (i,j) arithmetic; steps off the face edge
    re-project geometrically: the neighbor's center in (s,t) lies half
    a cell beyond the boundary, st_to_uv extends monotonically past
    [0,1], and face_uv_to_xyz is valid for any (u,v), so normalizing
    that point and re-encoding lands in the true adjacent cell on the
    adjacent face.
    """
    cids = np.asarray(cids, dtype=np.uint64)
    face, i, j, level = cell_to_face_ij(cids)
    if cids.size == 0:
        return np.empty((0, 4), dtype=np.uint64)
    lvl = int(level[0])
    if not (level == lvl).all():
        raise ValueError("edge_neighbors_batch requires uniform level")
    n = 1 << lvl
    out = np.empty((cids.size, 4), dtype=np.uint64)
    for k, (di, dj) in enumerate(((-1, 0), (1, 0), (0, -1), (0, 1))):
        ii, jj = i + di, j + dj
        inside = (ii >= 0) & (ii < n) & (jj >= 0) & (jj < n)
        res = np.empty(cids.size, dtype=np.uint64)
        if inside.any():
            res[inside] = cell_from_face_ij(
                face[inside].astype(np.uint64),
                ii[inside].astype(np.uint64),
                jj[inside].astype(np.uint64),
                lvl,
            )
        off = ~inside
        if off.any():
            s = (ii[off] + 0.5) / n
            t = (jj[off] + 0.5) / n
            x, y, z = face_uv_to_xyz(face[off].astype(np.uint64), st_to_uv(s), st_to_uv(t))
            norm = np.sqrt(x * x + y * y + z * z)
            res[off] = cell_from_xyz(x / norm, y / norm, z / norm, lvl)
        out[:, k] = res
    return out


def edge_neighbors(cid: int) -> list[int]:
    """The 4 edge-adjacent cells at the same level (single id)."""
    return [int(c) for c in edge_neighbors_batch(np.array([cid], dtype=np.uint64))[0]]


def k_ring(cid: int, k: int) -> list[int]:
    """All cells within k edge-hops (BFS, incl. self) — the H3
    ``grid_disk`` / S2 neighbor-expansion analog for kNN candidates."""
    seen = {int(cid)}
    frontier = [int(cid)]
    for _ in range(k):
        nxt = []
        for c in frontier:
            for nb in edge_neighbors(c):
                if nb not in seen:
                    seen.add(nb)
                    nxt.append(nb)
        frontier = nxt
    return sorted(seen)


# corner + edge-midpoint + center sample fractions for cell bounds
_BOUND_FI = np.array([0.0, 0.0, 0.0, 0.5, 0.5, 1.0, 1.0, 1.0, 0.5])
_BOUND_FJ = np.array([0.0, 0.5, 1.0, 0.0, 1.0, 0.0, 0.5, 1.0, 0.5])


# FP guard for the sampled cell boxes.  The 9 samples are EXACT for
# extrema location (see docstring below), so the only residual error
# is float rounding through face_uv_to_xyz/atan2 — nanodegrees.
_BOUNDS_EPS_DEG = 1e-9


def cell_latlng_bounds_batch(cids):
    """Per-cell conservative (lat_min, lat_max, lng_min, lng_max)
    arrays from the 4 corners + edge midpoints + center.

    Why 9 samples are EXACT (not just heuristic) for non-wrapping
    cells: every S2 cell edge is an axis-aligned segment in face
    (s,t) space, and along such a segment lat/lng are monotone except
    where the segment crosses the face center-lines s=0.5 / t=0.5 —
    but those are cell GRIDLINES at every level (0.5 = 2^(L-1)/2^L),
    so an interior extremum can only sit at a cell corner, which is
    sampled.  Verified against 1025-point dense edge sampling over
    random cells at levels 0-12: zero underestimate.  Two guards keep
    the box provably conservative (advisor r3, medium):

    * antimeridian/pole wrap — a cell straddling lng=±180 makes the
      naive min/max box span almost the whole globe EXCEPT the true
      range (measured up to 25° of missed longitude at level 4),
      silently breaking the covering-superset guarantee pip_join_s2's
      exact refine depends on.  Any cell whose sampled span exceeds
      180° is clamped to the full [-180, 180] range.
    * ``_BOUNDS_EPS_DEG`` pads all four edges against float rounding.
    """
    cids = np.asarray(cids, dtype=np.uint64)
    face, i, j, level = cell_to_face_ij(cids)
    n = (np.int64(1) << level).astype(np.float64)
    ss = (i[:, None] + _BOUND_FI[None, :]) / n[:, None]
    ts = (j[:, None] + _BOUND_FJ[None, :]) / n[:, None]
    m = _BOUND_FI.size
    facer = np.repeat(face.astype(np.uint64), m)
    x, y, z = face_uv_to_xyz(facer, st_to_uv(ss.ravel()), st_to_uv(ts.ravel()))
    lat, lng = xyz_to_latlng(x, y, z)
    lat = lat.reshape(-1, m)
    lng = lng.reshape(-1, m)
    a0 = lat.min(axis=1) - _BOUNDS_EPS_DEG
    a1 = lat.max(axis=1) + _BOUNDS_EPS_DEG
    o0 = lng.min(axis=1) - _BOUNDS_EPS_DEG
    o1 = lng.max(axis=1) + _BOUNDS_EPS_DEG
    wrap = (o1 - o0) > 180.0
    o0 = np.where(wrap, -180.0, o0)
    o1 = np.where(wrap, 180.0, o1)
    return a0, a1, o0, o1


def covering_bbox(lat_min: float, lat_max: float, lng_min: float, lng_max: float, level: int, max_cells: int = 4096) -> list[int]:
    """Conservative S2 covering of a lat/lng box at one level:
    wave-vectorized BFS from the box-center cell through edge
    neighbors, keeping cells whose (corner+midpoint) lat/lng box
    overlaps the query box.

    Superset covering — exactness is restored by the refine stage,
    exactly like the quadgrid covering (cells.py covering_bbox).  Not
    antimeridian-aware (callers split the box first) and assumes the
    box does not contain a pole; raises if the BFS exceeds max_cells.
    """
    seed = int(cell_from_latlng(np.array([(lat_min + lat_max) / 2.0]), np.array([(lng_min + lng_max) / 2.0]), level)[0])
    keep: set[int] = set()
    seen = {seed}
    frontier = np.array([seed], dtype=np.uint64)
    while frontier.size:
        a0, a1, o0, o1 = cell_latlng_bounds_batch(frontier)
        ok = (a0 <= lat_max) & (a1 >= lat_min) & (o0 <= lng_max) & (o1 >= lng_min)
        kept = frontier[ok]
        keep.update(int(c) for c in kept)
        if kept.size == 0:
            break
        if len(keep) > max_cells:  # budget counts KEPT cells, not the
            # rejected perimeter ring the BFS also visits
            raise ValueError(f"covering exceeded {max_cells} cells; use a coarser level")
        nbs = edge_neighbors_batch(kept).ravel()
        fresh = [int(c) for c in np.unique(nbs) if int(c) not in seen]
        seen.update(fresh)
        frontier = np.array(fresh, dtype=np.uint64)
    return sorted(keep)
