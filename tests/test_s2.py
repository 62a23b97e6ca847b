"""Real-S2 cell scheme (grid/s2.py) and the S2-covered PIP join.

No s2geometry library exists in the sandbox, so correctness is
established structurally:

* encode↔decode round trips (center of a cell re-encodes to itself);
* the parent/prefix-range algebra (direct encode at level L equals
  parent-of-leaf at L; leafs lie in the ancestor's [range_min,
  range_max]);
* Hilbert-curve properties (consecutive curve positions are
  4-adjacent — this pins the lookup tables: any table error breaks
  continuity immediately);
* geometric properties (faces of the 6 cardinal points, neighbor
  symmetry across cube edges, covering conservativeness);
* engine-vs-engine parity: pip_join_s2 (S2 covering) returns exactly
  the rows of the driver-gated quadgrid pip_join (independent cell
  schemes, shared refine) on the synthetic pages table.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from earth_data_kit_spark.grid import s2

RNG = np.random.default_rng(20260816)
LAT = RNG.uniform(-89.9, 89.9, 5000)
LNG = RNG.uniform(-180.0, 180.0, 5000)
LEAF = s2.cell_from_latlng(LAT, LNG, s2.MAX_LEVEL)


def _single(lat, lng, level):
    return int(s2.cell_from_latlng(np.array([lat]), np.array([lng]), level)[0])


class TestCellIds:
    def test_cardinal_faces(self):
        for (lat, lng), face in [
            ((0, 0), 0), ((0, 90), 1), ((90, 0), 2),
            ((0, 180), 3), ((0, -90), 4), ((-90, 0), 5),
        ]:
            cid = np.array([_single(lat, lng, 30)], dtype=np.uint64)
            assert s2.cell_face(cid)[0] == face

    def test_face_cell_tokens(self):
        # the six level-0 cells have the canonical one-digit tokens
        assert [
            s2.token(np.array([(f << 61) | (1 << 60)], dtype=np.uint64)) for f in range(6)
        ] == ["1", "3", "5", "7", "9", "b"]

    def test_token_round_trip(self):
        for cid in LEAF[:200]:
            assert s2.from_token(s2.token(np.array([cid]))) == int(cid)

    def test_leaf_center_round_trip(self):
        clat, clng = s2.cell_to_center_latlng(LEAF)
        again = s2.cell_from_latlng(clat, clng, s2.MAX_LEVEL)
        assert (again == LEAF).all()

    @pytest.mark.parametrize("level", [0, 1, 7, 15, 24, 29])
    def test_parent_equals_direct_encode(self, level):
        assert (s2.parent(LEAF, level) == s2.cell_from_latlng(LAT, LNG, level)).all()

    def test_level_of(self):
        for level in (0, 9, 18, 30):
            ids = s2.cell_from_latlng(LAT[:100], LNG[:100], level)
            assert (s2.cell_level(ids) == level).all()

    def test_prefix_range_contains_descendants(self):
        anc = s2.parent(LEAF, 8)
        assert ((s2.range_min(anc) <= LEAF) & (LEAF <= s2.range_max(anc))).all()
        assert s2.contains(anc, LEAF).all()
        # and ranges of sibling ancestors are disjoint
        uniq = np.unique(anc)
        mins, maxs = s2.range_min(uniq), s2.range_max(uniq)
        order = np.argsort(s2.xor_msb(uniq))
        assert (s2.xor_msb(maxs[order])[:-1] < s2.xor_msb(mins[order])[1:]).all()

    def test_center_inside_cell_bounds(self):
        cells = s2.parent(LEAF[:500], 12)
        clat, clng = s2.cell_to_center_latlng(cells)
        back = s2.cell_from_latlng(clat, clng, 12)
        assert (back == cells).all()


class TestHilbert:
    def test_curve_continuity(self):
        # consecutive positions along the curve are edge-adjacent in
        # (i, j) — the defining Hilbert property; pins both tables
        for level in (4, 10, 16):
            pos = RNG.integers(0, (1 << (2 * level)) - 1, 3000).astype(np.uint64)
            for face in (0, 3):
                fa = np.full(pos.shape, face, dtype=np.uint64)
                i1, j1, _ = s2._decode_pos(fa, pos, level)
                i2, j2, _ = s2._decode_pos(fa, pos + np.uint64(1), level)
                d = np.abs(i1.astype(np.int64) - i2.astype(np.int64)) + np.abs(
                    j1.astype(np.int64) - j2.astype(np.int64)
                )
                assert (d == 1).all()

    def test_encode_decode_pos_inverse(self):
        level = 12
        face = RNG.integers(0, 6, 2000).astype(np.uint64)
        i = RNG.integers(0, 1 << level, 2000).astype(np.uint64)
        j = RNG.integers(0, 1 << level, 2000).astype(np.uint64)
        pos = s2._encode_pos(face, i, j, level)
        i2, j2, _ = s2._decode_pos(face, pos, level)
        assert (i2 == i).all() and (j2 == j).all()

    def test_locality(self):
        # id-adjacent leaf cells are geographically close: the great-
        # circle gap between consecutive sorted leaves of a dense
        # sample is tiny compared to random-pair distance
        lat = RNG.uniform(10, 11, 2000)
        lng = RNG.uniform(20, 21, 2000)
        ids = s2.cell_from_latlng(lat, lng, 30)
        order = np.argsort(s2.xor_msb(ids))
        lat_s, lng_s = lat[order], lng[order]
        step = np.hypot(np.diff(lat_s), np.diff(lng_s))
        rand = np.hypot(lat[:-1] - lat[1:], lng[:-1] - lng[1:])
        assert np.median(step) < 0.2 * np.median(rand)


class TestNeighbors:
    @pytest.mark.parametrize("level", [2, 6, 12])
    def test_neighbor_symmetry_and_level(self, level):
        for lat, lng in zip(RNG.uniform(-85, 85, 25), RNG.uniform(-180, 180, 25)):
            c = _single(lat, lng, level)
            nbs = s2.edge_neighbors(c)
            assert len(set(nbs)) == 4 and c not in nbs
            for nb in nbs:
                assert int(s2.cell_level(np.array([nb], dtype=np.uint64))[0]) == level
                assert c in s2.edge_neighbors(nb)

    def test_cross_face_neighbors(self):
        # a cell hugging the face-0/face-1 edge (lng=45) must have a
        # neighbor on the other face
        c = _single(10.0, 44.999999, 8)
        faces = {int(s2.cell_face(np.array([n], dtype=np.uint64))[0]) for n in s2.edge_neighbors(c)}
        assert faces == {0, 1}

    def test_near_pole_neighbors(self):
        c = _single(89.9, 10.0, 6)
        assert len(set(s2.edge_neighbors(c))) == 4

    def test_k_ring_growth(self):
        c = _single(40.0, -74.0, 10)
        sizes = [len(s2.k_ring(c, k)) for k in (0, 1, 2, 3)]
        assert sizes[0] == 1
        # interior k-rings follow the quad-grid diamond/square counts
        assert sizes == [1, 5, 13, 25]


class TestCovering:
    def test_bbox_covering_is_conservative(self):
        lat = RNG.uniform(30.0, 34.0, 4000)
        lng = RNG.uniform(-80.0, -74.0, 4000)
        cov = set(s2.covering_bbox(30.0, 34.0, -80.0, -74.0, 8))
        cells = s2.parent(s2.cell_from_latlng(lat, lng, 30), 8)
        assert all(int(c) in cov for c in cells)

    def test_covering_tightness(self):
        # the covering shouldn't be a wild superset: its cell count is
        # within a small factor of the box/cell area ratio
        cov = s2.covering_bbox(30.0, 34.0, -80.0, -74.0, 8)
        assert len(cov) < 600  # box ≈ 4°×6° ≈ 182 level-8 cells (~0.3°)


@pytest.fixture(scope="module")
def pages_df(spark):
    from earth_data_kit_spark.sources.pages import pages_meta_df

    return pages_meta_df(spark, "/root/testdata/sf0.001")


class TestPipJoinS2:
    def test_parity_with_quadgrid_engine(self, spark, pages_df):
        """Independent-engine agreement: the S2-covered join must
        return exactly the quadgrid-covered join's rows (both refine
        with the same exact predicate; coverings differ entirely)."""
        from earth_data_kit_spark.operators.spatial_join import Polygon, pip_join
        from earth_data_kit_spark.operators.spatial_join_s2 import pip_join_s2

        polys = [
            Polygon(code="US-E", name="us east", bbox=(-85.0, 30.0, -70.0, 45.0)),
            Polygon(code="ALPS", name="alps-ish", wkt="POLYGON ((5 44, 12 44, 14 47, 9 48, 5 46, 5 44))"),
            Polygon(code="FJ", name="fiji wrap", bbox=(177.0, -20.0, -178.0, -15.0)),
        ]
        cols = ["url", "code"]
        a = pip_join(pages_df, polys, res=6).select(*cols)
        b = pip_join_s2(pages_df, polys, level=8).select(*cols)
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0
        assert a.count() > 0

    def test_precomputed_leaf_column_path(self, spark, pages_df, tmp_path):
        """The at-scale layout: leaf ids stored once at ingest, join
        level derived in codegen — same answer, zero UDF in the join
        plan over the stored table."""
        from earth_data_kit_spark.operators.spatial_join import Polygon
        from earth_data_kit_spark.operators.spatial_join_s2 import (
            pip_join_s2,
            s2_leaf_udf,
        )

        polys = [Polygon(code="US-E", name="us east", bbox=(-85.0, 30.0, -70.0, 45.0))]
        path = str(tmp_path / "pages_with_leaf")
        pages_df.withColumn(
            "s2_leaf", s2_leaf_udf()(F.col("lon"), F.col("lat"))
        ).write.parquet(path)
        stored = spark.read.parquet(path)
        a = pip_join_s2(stored, polys, level=8, leaf_col="s2_leaf").select("url", "code")
        b = pip_join_s2(pages_df, polys, level=8).select("url", "code")
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
        # plan of the precomputed path contains no Python evaluation
        plan = a._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    def test_storage_layout_prunes_by_cell(self, spark, tmp_path):
        """The 100 TB table layout the prefix-range property buys:
        directory-partitioned by a coarse S2 parent (JVM bit math),
        leaf-sorted within files.  A cell-range query must (a) prune
        partitions at planning time (scan reads fewer files than the
        table holds), (b) push the leaf range into the parquet scan,
        (c) return exactly the rows whose ancestor is the query cell."""
        import pandas as pd

        from earth_data_kit_spark.operators.spatial_join_s2 import s2_parent_col

        rng = np.random.default_rng(3)
        lat = rng.uniform(-60, 70, 50_000)
        lng = rng.uniform(-180, 180, 50_000)
        leaf = s2.to_spark_i64(s2.cell_from_latlng(lat, lng, 30))
        pdf = pd.DataFrame({"id": np.arange(lat.size), "s2_leaf": leaf})
        path = str(tmp_path / "pages_s2_layout")
        (
            spark.createDataFrame(pdf)
            .withColumn("s2_p2", s2_parent_col(F.col("s2_leaf"), 2))
            .repartition(F.col("s2_p2"))
            .sortWithinPartitions("s2_leaf")
            .write.partitionBy("s2_p2")
            .parquet(path)
        )
        t = spark.read.parquet(path)
        n_files_total = len(t.inputFiles())

        anc = s2.parent(s2.cell_from_latlng(np.array([48.0]), np.array([2.0]), 30), 6)
        lo = int(s2.to_spark_i64(s2.range_min(anc))[0])
        hi = int(s2.to_spark_i64(s2.range_max(anc))[0])
        p2 = int(s2.to_spark_i64(s2.parent(anc, 2))[0])
        q = t.where(
            (F.col("s2_p2") == p2) & (F.col("s2_leaf") >= lo) & (F.col("s2_leaf") <= hi)
        )
        rows = q.collect()

        # (c) exactness vs numpy
        want = int((s2.parent(s2.from_spark_i64(leaf), 6) == anc[0]).sum())
        assert len(rows) == want > 0

        # (b) leaf range reaches the parquet scan
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "GreaterThanOrEqual(s2_leaf" in plan and "LessThanOrEqual(s2_leaf" in plan

        # (a) partition pruning: the executed scan read fewer files
        def scan_num_files(node):
            if "Scan" in node.nodeName():
                it = node.metrics().iterator()
                while it.hasNext():
                    kv = it.next()
                    if kv._1() == "numFiles":
                        return kv._2().value()
            for i in range(node.children().size()):
                got = scan_num_files(node.children().apply(i))
                if got is not None:
                    return got
            return None

        n_read = scan_num_files(q._jdf.queryExecution().executedPlan())
        assert n_read is not None and n_read < n_files_total

    def test_knn_parity_with_quadgrid_and_bruteforce(self, spark, pages_df):
        """S2-ring kNN returns exactly the brute-force top-k (and
        hence the quadgrid knn_join's answer).  The ring is chosen
        from the brute-force k-th distance so the coverage guarantee
        holds by construction — no flaky geometry assumptions."""
        from earth_data_kit_spark.operators.knn import knn_brute_force
        from earth_data_kit_spark.operators.spatial_join_s2 import (
            knn_join_s2,
            s2_ring_safe_radius_m,
        )

        queries = [(1, 41.33, 19.82), (2, 51.0, 10.5), (3, 20.6, 78.9)]
        k, level = 5, 5
        exact = knn_brute_force(pages_df, queries, k).collect()
        dk_max = max(r.dist_m for r in exact)
        ring = 2
        while s2_ring_safe_radius_m(level, ring) <= dk_max:
            ring += 2
        got = knn_join_s2(pages_df, queries, k, level=level, ring=ring).collect()
        key = lambda r: (r.query_id, r.rank)
        assert {key(r): (r.page_id, round(r.dist_m, 6)) for r in got} == {
            key(r): (r.page_id, round(r.dist_m, 6)) for r in exact
        }

    def test_knn_auto_grow_reaches_sparse_neighbors(self, spark, pages_df):
        """A remote-ocean query whose k-th neighbor is far outside
        the default ring: auto_grow must widen until it matches brute
        force (the fixed default ring documented-ly cannot)."""
        from earth_data_kit_spark.operators.knn import knn_brute_force
        from earth_data_kit_spark.operators.spatial_join_s2 import knn_join_s2

        queries = [(7, -48.0, -120.0)]  # south pacific, sparse
        k = 3
        exact = {
            (r.query_id, r.rank): r.page_id
            for r in knn_brute_force(pages_df, queries, k).collect()
        }
        grown = {
            (r.query_id, r.rank): r.page_id
            for r in knn_join_s2(
                pages_df, queries, k, level=7, ring=2, auto_grow=True
            ).collect()
        }
        assert grown == exact

    def test_radius_join_parity_with_quadgrid(self, spark, pages_df):
        from earth_data_kit_spark.operators.knn import radius_join
        from earth_data_kit_spark.operators.spatial_join_s2 import radius_join_s2

        queries = [(1, 41.33, 19.82), (2, 51.0, 10.5)]
        a = radius_join(pages_df, queries, radius_m=150_000, res=7)
        b = radius_join_s2(pages_df, queries, radius_m=150_000, level=7)
        ka = {(r.query_id, r.page_id) for r in a.collect()}
        kb = {(r.query_id, r.page_id) for r in b.collect()}
        assert ka == kb and len(ka) > 0

    def test_ring_safe_radius_bound_holds(self):
        """Empirical pin of s2_ring_safe_radius_m: for sampled cells,
        every cell OUTSIDE k_ring(c, ring) keeps its closest sampled
        point at least the claimed radius from anywhere in c."""
        from earth_data_kit_spark.operators.spatial_join_s2 import (
            s2_ring_safe_radius_m,
        )

        def cell_pts(cid):
            f, i, j, lv = s2.cell_to_face_ij(np.array([cid], dtype=np.uint64))
            f, i, j, lv = int(f[0]), int(i[0]), int(j[0]), int(lv[0])
            n = 1 << lv
            fr = [0.0, 0.25, 0.5, 0.75, 1.0]
            ss = np.array([(i + a) / n for a in fr for _ in fr])
            ts = np.array([(j + b) / n for _ in fr for b in fr])
            x, y, z = s2.face_uv_to_xyz(
                np.full(ss.size, f, dtype=np.uint64), s2.st_to_uv(ss), s2.st_to_uv(ts)
            )
            nrm = np.sqrt(x * x + y * y + z * z)
            return np.stack([x / nrm, y / nrm, z / nrm], axis=1)

        rng = np.random.default_rng(11)
        for level, ring in ((6, 2), (9, 3), (9, 4)):
            lat = rng.uniform(-85, 85, 12)
            lng = rng.uniform(-180, 180, 12)
            for c in np.unique(s2.cell_from_latlng(lat, lng, level)):
                c = int(c)
                ring_set = set(s2.k_ring(c, ring))
                frontier = {
                    nb
                    for rc in ring_set
                    for nb in s2.edge_neighbors(rc)
                    if nb not in ring_set
                }
                pc = cell_pts(c)
                worst = min(
                    float(np.arccos(np.clip(pc @ cell_pts(fc).T, -1, 1)).min())
                    for fc in frontier
                )
                assert worst * 6371000.0 >= s2_ring_safe_radius_m(level, ring)

    def test_leaf_udf_nulls_stay_null(self, spark):
        import pandas as pd

        from earth_data_kit_spark.operators.spatial_join_s2 import s2_leaf_udf

        pdf = pd.DataFrame(
            {"lon": [10.0, None, 20.0, float("nan")], "lat": [45.0, 5.0, None, 1.0]}
        )
        sdf = spark.createDataFrame(pdf)
        rows = sdf.select(s2_leaf_udf()(F.col("lon"), F.col("lat")).alias("leaf")).collect()
        assert rows[0].leaf is not None
        assert rows[1].leaf is None and rows[2].leaf is None and rows[3].leaf is None

    def test_parent_col_matches_numpy(self, spark):
        import pandas as pd

        from earth_data_kit_spark.operators.spatial_join_s2 import s2_parent_col

        leaf_i64 = s2.to_spark_i64(LEAF[:1000])
        sdf = spark.createDataFrame(pd.DataFrame({"leaf": leaf_i64}))
        for level in (4, 11, 20):
            got = np.array(
                [r.p for r in sdf.select(s2_parent_col(F.col("leaf"), level).alias("p")).collect()],
                dtype=np.int64,
            )
            want = s2.to_spark_i64(s2.parent(LEAF[:1000], level))
            assert (np.sort(got) == np.sort(want)).all()


def test_wrap_cell_bounds_clamped_to_full_lng_range():
    """Advisor r3 (medium): a cell straddling the antimeridian used to
    report a naive min/max lng box missing up to 25 deg of longitude,
    breaking the covering-superset guarantee.  Wrap cells must clamp
    to the full [-180, 180] range; ordinary cells must not."""
    import numpy as np

    from earth_data_kit_spark.grid import s2 as S

    # The antimeridian is a cell GRIDLINE at every level (it bisects
    # the face centered on lng 180 through s=0.5), so ordinary cells
    # never cross it — the genuine wrap cases are polar-cap and
    # near-pole cells whose true lng span approaches 360 deg while 9
    # samples caught as little as 154 deg (25 deg of missed longitude
    # at level 4 pre-fix).  The property under regression is
    # CONSERVATIVENESS: the 9-sample box must contain the
    # densely-sampled boundary box for every cell, polar included.
    def dense_bounds(cids, m=257):
        cids = np.asarray(cids, dtype=np.uint64)
        face, i, j, level = S.cell_to_face_ij(cids)
        n = (np.int64(1) << level).astype(np.float64)
        t = np.linspace(0, 1, m)
        fi = np.concatenate([t, np.ones(m), t[::-1], np.zeros(m)])
        fj = np.concatenate([np.zeros(m), t, np.ones(m), t[::-1]])
        M = fi.size
        ss = (i[:, None] + fi[None, :]) / n[:, None]
        ts = (j[:, None] + fj[None, :]) / n[:, None]
        facer = np.repeat(face.astype(np.uint64), M)
        x, y, z = S.face_uv_to_xyz(facer, S.st_to_uv(ss.ravel()), S.st_to_uv(ts.ravel()))
        lat, lng = S.xyz_to_latlng(x, y, z)
        lat = lat.reshape(-1, M)
        lng = lng.reshape(-1, M)
        return lat.min(1), lat.max(1), lng.min(1), lng.max(1)

    rng = np.random.default_rng(7)
    for lvl in (3, 4, 6, 8):
        lats = np.concatenate([rng.uniform(-90, 90, 200), rng.uniform(85, 90, 50),
                               rng.uniform(-90, -85, 50)])
        lngs = rng.uniform(-180, 180, 300)
        cells = np.unique(S.cell_from_latlng(lats, lngs, lvl))
        a0, a1, o0, o1 = S.cell_latlng_bounds_batch(cells)
        d0, d1, e0, e1 = dense_bounds(cells)
        tol = 1e-6
        assert np.all(a0 <= d0 + tol) and np.all(a1 >= d1 - tol), lvl
        full = (o1 - o0) >= 359.9  # clamped cells are trivially conservative
        ok = full | ((o0 <= e0 + tol) & (o1 >= e1 - tol))
        assert np.all(ok), (lvl, cells[~ok][:5])
        # a benign mid-ocean cell keeps a tight box
        normal = S.cell_from_latlng(np.array([10.0]), np.array([30.0]), lvl)
        _, _, n0, n1 = S.cell_latlng_bounds_batch(normal)
        assert n1[0] - n0[0] < 180.0


def test_covering_bbox_near_antimeridian_keeps_straddling_cells():
    """A query box touching lng=180 must keep the cells that straddle
    the line (conservative superset; the exact refine restores
    precision)."""
    import numpy as np

    from earth_data_kit_spark.grid import s2 as S

    lvl = 7
    cover = S.covering_bbox(9.0, 11.0, 178.5, 180.0, lvl)
    straddler = int(S.cell_from_latlng(np.array([10.0]), np.array([179.9999]), lvl)[0])
    assert straddler in cover
