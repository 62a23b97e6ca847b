"""Real H3-class cells — aperture-7 hexagonal icosahedral DGGS, numpy.

The north-star rule asks for "H3 and S2 hierarchical cell indexes".
``grid/cells.py`` provides the SQL-mirrorable quadgrid (H3's *role*
in the driver's oracle gates) and ``grid/s2.py`` the genuine S2
algorithm; this module is the genuine H3-side twin: the actual
algorithm family behind Uber's H3 (public docs: h3geo.org "Cell
indexing" / the published DGGS literature on icosahedral aperture-7
hex grids), reimplemented from the math — no library, no code copied:

1. lat/lng → unit XYZ vector;
2. icosahedron face 0..19 = argmax dot(P, face_center) (spherical
   Voronoi of the 20 face centers — H3's face lookup);
3. gnomonic projection onto the tangent plane at that face center,
   expressed in the face's local (u, v) orthonormal frame;
4. pointy-top hexagonal lattice on that plane with pitch
   ``PITCH0 * 7^(-res/2)`` rotated by ``res * atan(sqrt(3)/5)``
   (the aperture-7 rotation: each finer resolution has 7× the cell
   count and is turned 19.1066° so child centers nest under parent
   hexes — H3's Class II/III alternation, here as a cumulative
   rotation which yields the identical lattice family);
5. fractional axial coords cube-round to the containing hex (same
   published axial/cube math as functions/hexbin.py, in numpy);
6. id = ``res<<59 | face<<54 | (i+OFF)<<27 | (j+OFF)`` (res ≤ 15,
   exactly H3's resolution range; fits non-negative int64).

Honesty note (stated in SCALE.md too): this is the H3 *algorithm
class*, not a bit-compatible reimplementation of Uber H3 — the
sandbox has no ``h3`` wheel to verify 122-base-cell table parity
against, so base-cell renumbering/icosahedron orientation follow the
canonical geometric construction instead of Uber's table constants.
Every property that matters to the engine is pinned by tests instead:
total deterministic point→cell function, center roundtrip, parent
containment, ~7 children per parent, and — the load-bearing one —
``cover_cap`` returning a SUPERSET of the cells of all points within
a radius (what makes kNN/radius exact, tests/test_h3.py).

Cross-face coverage: a query cap near a face edge is covered by
enumerating the lattice *of every face whose spherical Voronoi
region intersects the cap* (faces with angular distance ≤ VERTEX_ANG
+ cap radius), in that face's own frame — so candidates on the far
side of an icosahedron edge carry exactly the ids the point-side
indexer gave them.  The planar enumeration radius inflates the
angular radius by the gnomonic Lipschitz bound sec²(θ_cap) (the
projection's largest singular value on the disk of angular radius
θ_cap), making the superset property a theorem, not a tuning.

Scale posture mirrors s2.py: point→cell is a vectorized Arrow UDF
(O(rows), map-side); ``cover_cap`` runs per-QUERY-row inside the same
kind of UDF (operators/spatial_join_h3.py), so a million-query kNN
distributes like any join side.  Reference analog: the reference's
fixed MODIS h/v grid (/root/reference/earth_data_kit/stitching/
engines/s3.py:183-221) has no hierarchical index at all; H3 is the
hex-side scale-path index named by the north rule.
"""

from __future__ import annotations

import math

import numpy as np

MAX_RES = 15
_RES_SHIFT = 59
_FACE_SHIFT = 54
_I_SHIFT = 27
_OFF = 1 << 26  # signed-offset bias for i/j (27-bit fields)

# Aperture-7 rotation: atan(sqrt(3)/5) = 19.1066...° — rotating the
# pitch/sqrt(7) child lattice by this angle puts 7 child centers in
# each parent hex (1 center + 6 off-center), the defining aperture-7
# construction.
ROT7 = math.atan2(math.sqrt(3.0), 5.0)
SQRT7 = math.sqrt(7.0)
SQRT3 = math.sqrt(3.0)

# Base lattice pitch (planar center-to-center spacing at res 0) in
# gnomonic plane units.  tan(VERTEX_ANG) ≈ 0.7639 is the planar
# circumradius of a face, so 0.35 gives ~5-7 res-0 cells per face —
# the same granularity role as H3's 122 base cells over 20 faces.
PITCH0 = 0.35

# --- icosahedron geometry -------------------------------------------------
# Canonical vertex set: two poles + two staggered rings at lat
# ±atan(1/2).  (H3 uses a rotated instance of the same solid; the
# orientation constant is a table choice, not algorithm.)
_LAT_RING = math.atan(0.5)


def _build_faces():
    verts = [(0.0, 0.0, 1.0)]
    for k in range(5):
        lon = 2.0 * math.pi * k / 5.0
        verts.append(
            (
                math.cos(_LAT_RING) * math.cos(lon),
                math.cos(_LAT_RING) * math.sin(lon),
                math.sin(_LAT_RING),
            )
        )
    for k in range(5):
        lon = 2.0 * math.pi * (k + 0.5) / 5.0
        verts.append(
            (
                math.cos(_LAT_RING) * math.cos(lon),
                math.cos(_LAT_RING) * math.sin(lon),
                -math.sin(_LAT_RING),
            )
        )
    verts.append((0.0, 0.0, -1.0))
    V = np.array(verts)
    tris = []
    for k in range(5):
        tris.append((0, 1 + k, 1 + (k + 1) % 5))  # north cap
        tris.append((1 + k, 6 + k, 1 + (k + 1) % 5))  # upper band
        tris.append((1 + (k + 1) % 5, 6 + k, 6 + (k + 1) % 5))  # lower band
        tris.append((6 + k, 11, 6 + (k + 1) % 5))  # south cap
    centers = np.empty((20, 3))
    uax = np.empty((20, 3))
    vax = np.empty((20, 3))
    for f, (a, b, c) in enumerate(tris):
        ctr = V[a] + V[b] + V[c]
        ctr /= np.linalg.norm(ctr)
        centers[f] = ctr
        # local orthonormal frame in the tangent plane: u toward the
        # first vertex's projection, v = n × u
        u = V[a] - ctr * np.dot(V[a], ctr)
        u /= np.linalg.norm(u)
        uax[f] = u
        vax[f] = np.cross(ctr, u)
    return centers, uax, vax


FACE_CENTERS, FACE_U, FACE_V = _build_faces()

# Angular radius of a face: center-to-vertex angle (all equal).
VERTEX_ANG = math.acos(float(np.dot(FACE_CENTERS[0], [0.0, 0.0, 1.0])))
EARTH_R_M = 6371000.0


def _to_xyz(lat_deg, lon_deg):
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    cl = np.cos(lat)
    return np.stack([cl * np.cos(lon), cl * np.sin(lon), np.sin(lat)], axis=-1)


def _home_face(xyz):
    """argmax dot(P, center_f); deterministic (first max) tie-break."""
    return np.argmax(xyz @ FACE_CENTERS.T, axis=-1)


def _gnomonic_uv(xyz, face):
    """Project onto the tangent plane of ``face`` (per-row face ids)."""
    ctr = FACE_CENTERS[face]
    d = np.einsum("...k,...k->...", xyz, ctr)
    # points on the home face always have d >= cos(VERTEX_ANG) > 0;
    # cross-face enumeration guards d explicitly before calling
    p = xyz / d[..., None]
    rel = p - ctr
    u = np.einsum("...k,...k->...", rel, FACE_U[face])
    v = np.einsum("...k,...k->...", rel, FACE_V[face])
    return u, v


def _uv_to_latlng(face, u, v):
    ctr = FACE_CENTERS[face]
    p = ctr + u[..., None] * FACE_U[face] + v[..., None] * FACE_V[face]
    p = p / np.linalg.norm(p, axis=-1, keepdims=True)
    lat = np.degrees(np.arcsin(np.clip(p[..., 2], -1.0, 1.0)))
    lon = np.degrees(np.arctan2(p[..., 1], p[..., 0]))
    return lat, lon


def pitch(res: int) -> float:
    """Planar lattice pitch at a resolution (aperture 7: /sqrt(7))."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}], got {res}")
    return PITCH0 * SQRT7 ** (-res)


def _rot(res: int) -> tuple[float, float]:
    a = res * ROT7
    return math.cos(a), math.sin(a)


def _uv_to_axial_frac(u, v, res: int):
    """Fractional axial (q, r) of the res-lattice (rotated pointy-top)."""
    c, s = _rot(res)
    x = c * u + s * v
    y = -s * u + c * v
    sz = pitch(res) / SQRT3  # hex circumradius from center pitch
    qf = (SQRT3 / 3.0 * x - y / 3.0) / sz
    rf = (2.0 / 3.0 * y) / sz
    return qf, rf


def _axial_to_uv(q, r, res: int):
    sz = pitch(res) / SQRT3
    x = sz * SQRT3 * (q + r / 2.0)
    y = sz * 1.5 * r
    c, s = _rot(res)
    return c * x - s * y, s * x + c * y


def _cube_round(qf, rf):
    """Vectorized cube rounding (same math as functions/hexbin.py)."""
    x, z = qf, rf
    y = -x - z
    rx = np.floor(x + 0.5)
    ry = np.floor(y + 0.5)
    rz = np.floor(z + 0.5)
    dx = np.abs(rx - x)
    dy = np.abs(ry - y)
    dz = np.abs(rz - z)
    fx = (dx > dy) & (dx > dz)
    fy = ~fx & (dy > dz)
    q = np.where(fx, -ry - rz, rx)
    r = np.where(~fx & ~fy, -rx - ry, rz)
    return q.astype(np.int64), r.astype(np.int64)


def pack(res, face, i, j):
    res = np.asarray(res, dtype=np.int64)
    face = np.asarray(face, dtype=np.int64)
    i = np.asarray(i, dtype=np.int64) + _OFF
    j = np.asarray(j, dtype=np.int64) + _OFF
    if np.any((i < 0) | (i >= (1 << 27)) | (j < 0) | (j >= (1 << 27))):
        raise ValueError("axial coordinate out of 27-bit field")
    return (res << _RES_SHIFT) | (face << _FACE_SHIFT) | (i << _I_SHIFT) | j


def unpack(cid):
    cid = np.asarray(cid, dtype=np.int64)
    res = cid >> _RES_SHIFT
    face = (cid >> _FACE_SHIFT) & 0x1F
    i = ((cid >> _I_SHIFT) & ((1 << 27) - 1)) - _OFF
    j = (cid & ((1 << 27) - 1)) - _OFF
    return res, face, i, j


def latlng_to_cell(lat_deg, lon_deg, res: int):
    """Vectorized point → H3-class cell id (the indexer UDF kernel)."""
    xyz = _to_xyz(lat_deg, lon_deg)
    face = _home_face(xyz)
    u, v = _gnomonic_uv(xyz, face)
    qf, rf = _uv_to_axial_frac(u, v, res)
    q, r = _cube_round(qf, rf)
    return pack(np.full(face.shape, res, dtype=np.int64), face, q, r)


def cell_center(cid):
    """Vectorized cell id → (lat, lon) of the hex center (on-sphere)."""
    res, face, i, j = unpack(cid)
    # pitch per-row (res may vary)
    sz = PITCH0 * SQRT7 ** (-res.astype(np.float64)) / SQRT3
    ang = res.astype(np.float64) * ROT7
    c, s = np.cos(ang), np.sin(ang)
    x = sz * SQRT3 * (i + j / 2.0)
    y = sz * 1.5 * j
    u = c * x - s * y
    v = s * x + c * y
    return _uv_to_latlng(face, u, v)


def parent(cid):
    """Center-containment parent: the res-1 cell holding this cell's
    center.  (Geometric parenting; exactly-7 index-arithmetic
    parenting needs Uber's base-cell tables — see module docstring.)"""
    res, _, _, _ = unpack(cid)
    if np.any(res < 1):
        raise ValueError("res-0 cells have no parent")
    lat, lon = cell_center(cid)
    out = np.empty(np.shape(res), dtype=np.int64)
    flat_res = np.atleast_1d(res)
    flat_lat = np.atleast_1d(lat)
    flat_lon = np.atleast_1d(lon)
    flat_out = np.atleast_1d(out)
    for r in np.unique(flat_res):
        m = flat_res == r
        flat_out[m] = latlng_to_cell(flat_lat[m], flat_lon[m], int(r) - 1)
    return flat_out if np.ndim(cid) else int(flat_out[0])


def children(cid: int):
    """Res+1 cells whose (center-containment) parent is ``cid`` —
    enumerated as ring ≤ 2 of the center's child then filtered; ~7
    per parent (exactly 7 in the lattice interior)."""
    res, _, _, _ = unpack(np.array([cid]))
    r = int(res[0])
    lat, lon = cell_center(np.array([cid]))
    c0 = int(latlng_to_cell(lat, lon, r + 1)[0])
    _, f0, i0, j0 = unpack(np.array([c0]))
    cand = []
    for di in range(-2, 3):
        for dj in range(-2, 3):
            if abs(di + dj) <= 2:
                cand.append((int(i0[0]) + di, int(j0[0]) + dj))
    ii = np.array([c[0] for c in cand])
    jj = np.array([c[1] for c in cand])
    cids = pack(
        np.full(ii.shape, r + 1, dtype=np.int64),
        np.full(ii.shape, int(f0[0]), dtype=np.int64),
        ii,
        jj,
    )
    par = parent(cids)
    return [int(c) for c, p in zip(cids, np.atleast_1d(par)) if int(p) == cid]


def min_cell_pitch_m(res: int) -> float:
    """Lower bound on the ON-SPHERE center pitch of the res-lattice:
    a planar step of ``pitch`` at angular distance θ from the face
    center subtends at least ``pitch·cos²(θ)`` radians (inverse of
    the gnomonic sec² stretch), minimized at the face vertex."""
    return pitch(res) * math.cos(VERTEX_ANG) ** 2 * EARTH_R_M


def _cap_plan(lat_deg: float, lon_deg: float, radius_m: float, res: int):
    """Enumeration plan for ``cover_cap``: per intersecting face, the
    (face, q0, r0, nring) disk to enumerate.  Split out so callers can
    COUNT a cover (``cover_cap_count``) without materializing it —
    the adaptive-resolution covering in operators/spatial_join_h3.py
    sizes the resolution from these counts."""
    alpha = radius_m / EARTH_R_M  # angular radius
    xyz = _to_xyz(np.array([lat_deg]), np.array([lon_deg]))[0]
    cosd = FACE_CENTERS @ xyz
    # face Voronoi region ⊆ cap(center, VERTEX_ANG); intersects query
    # cap iff angular distance(q, center) ≤ VERTEX_ANG + alpha.  A cap
    # reaching past the gnomonic hemisphere of a face degenerates —
    # fall back to full-face enumeration (and all faces when the cap
    # covers most of the sphere).
    if VERTEX_ANG + alpha >= math.pi / 2 - 1e-3:
        faces = np.arange(20)
    else:
        faces = np.nonzero(cosd >= math.cos(VERTEX_ANG + alpha))[0]
    # all home-face points project within this planar radius of the
    # face center; enumerating q'-centered disks past it is waste
    full_face = math.tan(VERTEX_ANG)
    out = []
    p = pitch(res)
    for f in faces:
        d = float(cosd[f])
        if d <= 0.05:
            # query beyond/near this face's gnomonic horizon: its own
            # projection is useless — enumerate the whole face instead
            u0 = v0 = 0.0
            d_planar = full_face
        else:
            proj = xyz / d
            rel = proj - FACE_CENTERS[f]
            u0 = float(rel @ FACE_U[f])
            v0 = float(rel @ FACE_V[f])
            # Lipschitz bound of the gnomonic map on the relevant disk:
            # a cap point p whose HOME face is f lies within
            # min(VERTEX_ANG, θ_q + α) of the face center (Voronoi ⊆
            # vertex cap, and p is within α of q at θ_q); the geodesic
            # q→p stays within max(θ_q, that) of the center (balls of
            # radius < π/2 are convex), and its gnomonic image is a
            # straight segment of length ≤ sec²(θ_cap) · angular
            # length (the projection's largest singular value there).
            theta_q = math.acos(max(-1.0, min(1.0, d)))
            theta_cap = min(
                max(theta_q, min(VERTEX_ANG, theta_q + alpha)),
                math.pi / 2 - 1e-3,
            )
            lip = 1.0 / math.cos(theta_cap) ** 2
            # never useful to reach farther than the whole face from q'
            d_planar = min(lip * alpha, math.hypot(u0, v0) + full_face)
        qf, rf = _uv_to_axial_frac(np.array([u0]), np.array([v0]), res)
        q0, r0 = _cube_round(qf, rf)
        q0, r0 = int(q0[0]), int(r0[0])
        # hex-distance n moves ≥ n·pitch·(√3/2) planar; +2 covers the
        # fractional start cell and the target cell's own extent
        nring = int(math.ceil(d_planar / (p * SQRT3 / 2.0))) + 2
        out.append((int(f), q0, r0, nring))
    return out


def cover_cap_count(lat_deg: float, lon_deg: float, radius_m: float, res: int) -> int:
    """Upper bound on ``len(cover_cap(...))`` (pre-dedup disk sizes)
    WITHOUT materializing — O(faces), used to pick the covering
    resolution adaptively (a US-sized cap at a fine res would
    enumerate millions of cells; the caller walks res down until this
    bound fits its budget)."""
    return sum(
        3 * n * (n + 1) + 1 for _, _, _, n in _cap_plan(lat_deg, lon_deg, radius_m, res)
    )


def cover_cap(lat_deg: float, lon_deg: float, radius_m: float, res: int):
    """All res-cells that can contain a point within ``radius_m`` of
    (lat, lon) — a guaranteed SUPERSET (the kNN/radius-join
    prefilter contract).  For every face whose Voronoi region can
    intersect the cap, enumerate that face's lattice out to the
    gnomonic-inflated planar radius, then DROP enumerated positions
    that provably cannot be any cap point's cell:

    * face clip — a point's home face satisfies |uv| ≤ tan(VERTEX_ANG)
      (Voronoi ⊆ vertex cap), and cube-rounding moves it at most one
      planar hex circumradius (pitch/√3), so reachable cell centers
      lie within tan(VERTEX_ANG) + pitch/√3 of the face center;
    * cap clip — a cap point's cell center is within pitch/√3 PLANAR
      of it, and the gnomonic map only stretches (|d planar| ≥
      |d angular|), so the center is within α + pitch/√3 ANGULAR of
      the query.

    Both margins are one-sided (superset preserved); without them the
    Lipschitz-inflated disks carry phantom positions far outside the
    face/cap — ~50× the true covering for continent-sized caps.
    Returns int64 array (deduped)."""
    alpha = radius_m / EARTH_R_M
    xyz = _to_xyz(np.array([lat_deg]), np.array([lon_deg]))[0]
    full_face = math.tan(VERTEX_ANG)
    margin = pitch(res) / SQRT3 * 1.0001 + 1e-12
    cos_cap = math.cos(min(math.pi, alpha + margin))
    out = []
    for f, q0, r0, nring in _cap_plan(lat_deg, lon_deg, radius_m, res):
        if 3 * nring * (nring + 1) + 1 > 5_000_000:
            raise ValueError(
                f"cover_cap(res={res}, radius_m={radius_m:g}) would enumerate "
                f">{3 * nring * (nring + 1) + 1:,} cells on face {f} — use a "
                "coarser res for a radius this large"
            )
        dis, djs = _ring_offsets(nring)
        qq, rr = q0 + dis, r0 + djs
        uu, vv = _axial_to_uv(qq.astype(np.float64), rr.astype(np.float64), res)
        keep = np.hypot(uu, vv) <= full_face + margin
        p = (
            FACE_CENTERS[f]
            + uu[keep, None] * FACE_U[f]
            + vv[keep, None] * FACE_V[f]
        )
        p /= np.linalg.norm(p, axis=-1, keepdims=True)
        keep2 = (p @ xyz) >= cos_cap
        qq, rr = qq[keep][keep2], rr[keep][keep2]
        out.append(
            pack(
                np.full(qq.shape, res, dtype=np.int64),
                np.full(qq.shape, f, dtype=np.int64),
                qq,
                rr,
            )
        )
    return (
        np.unique(np.concatenate(out)) if out else np.empty(0, dtype=np.int64)
    )


_RING_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _ring_offsets(n: int):
    """All axial offsets with hex-distance ≤ n (cached)."""
    got = _RING_CACHE.get(n)
    if got is not None:
        return got
    dis, djs = [], []
    for di in range(-n, n + 1):
        for dj in range(max(-n, -di - n), min(n, -di + n) + 1):
            dis.append(di)
            djs.append(dj)
    out = (np.array(dis, dtype=np.int64), np.array(djs, dtype=np.int64))
    _RING_CACHE[n] = out
    return out


def uncompact(cids, res: int):
    """All res-cells that can contain a point of any input cell — the
    H3 ``uncompact`` verb (coarse covering → fine covering), fully
    vectorized.

    Superset argument (per input cell C at res r ≤ res, face f): a
    point p in hex C projects within pitch(r)/√3 planar of C's center
    on p's HOME face — which is f, because a point's home face is the
    same at every resolution — and p's res-cell center is within
    pitch(res)/√3 of p's projection.  So every reachable res-cell
    center lies in the planar disk of radius pitch(r)/√3 +
    pitch(res)/√3 (+ slack) around C's center, on face f; enumerating
    the res-lattice over that disk is a guaranteed superset.  ~7^Δres
    cells per input (+ rim).  Returns int64 array (deduped)."""
    cids = np.asarray(cids, dtype=np.int64)
    if cids.size == 0:
        return cids
    rr, face, _, _ = unpack(cids)
    if np.any(rr > res):
        raise ValueError("uncompact target res must be >= every input res")
    # planar centers of the input cells (per-row res)
    sz = PITCH0 * SQRT7 ** (-rr.astype(np.float64)) / SQRT3
    _, _, ii, jj = unpack(cids)
    ang = rr.astype(np.float64) * ROT7
    c, s = np.cos(ang), np.sin(ang)
    x = sz * SQRT3 * (ii + jj / 2.0)
    y = sz * 1.5 * jj
    u0 = c * x - s * y
    v0 = s * x + c * y
    out = []
    p_fine = pitch(res)
    for r in np.unique(rr):
        m = rr == r
        rad = pitch(int(r)) / SQRT3 * 1.0001 + p_fine / SQRT3 * 1.0001 + 1e-12
        nring = int(math.ceil(rad / (p_fine * SQRT3 / 2.0))) + 2
        dis, djs = _ring_offsets(nring)
        # fractional axial of each coarse center in the FINE lattice
        qf, rf = _uv_to_axial_frac(u0[m], v0[m], res)
        q0, r0 = _cube_round(qf, rf)
        qq = (q0[:, None] + dis[None, :]).ravel()
        rj = (r0[:, None] + djs[None, :]).ravel()
        ff = np.repeat(face[m], dis.size)
        # clip to the disk (the ring enumeration is square-ish in hex
        # distance; the planar check tightens the rim)
        uu, vv = _axial_to_uv(qq.astype(np.float64), rj.astype(np.float64), res)
        du = uu - np.repeat(u0[m], dis.size)
        dv = vv - np.repeat(v0[m], dis.size)
        keep = np.hypot(du, dv) <= rad + p_fine / SQRT3
        # face clip (same bound as cover_cap): reachable fine-cell
        # centers lie within tan(VERTEX_ANG) + pitch/√3 of the face
        # center — drops phantom rim positions that no point maps to
        keep &= np.hypot(uu, vv) <= math.tan(VERTEX_ANG) + p_fine / SQRT3 * 1.0001
        out.append(
            pack(
                np.full(keep.sum(), res, dtype=np.int64),
                ff[keep],
                qq[keep],
                rj[keep],
            )
        )
    return np.unique(np.concatenate(out))


def k_ring(cid: int, k: int):
    """Cells within ~k steps of ``cid`` — geometric ring: cover_cap
    around the center with radius k on-sphere pitches (cross-face
    correct by construction, unlike naive per-face ij rings)."""
    res, _, _, _ = unpack(np.array([cid]))
    r = int(res[0])
    lat, lon = cell_center(np.array([cid]))
    return cover_cap(
        float(lat[0]), float(lon[0]), (k + 0.5) * min_cell_pitch_m(r), r
    )


def cover_safe_radius_m(radius_m: float) -> float:
    """The exactness radius of ``cover_cap(… radius_m …)``: every
    point within this distance of the query is guaranteed to be in a
    returned cell.  cover_cap is built as a superset for exactly
    ``radius_m``, so this is the identity — kept as a named function
    so kNN auto-grow reads as the same contract shape as
    s2_ring_safe_radius_m."""
    return radius_m
