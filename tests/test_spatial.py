"""Spatial layer (operators/spatial.py): promotion round-trip, an
independent pure-Python ray-cast cross-check, and the scale-shape plan
properties (stored-table bbox pushdown; no codegen blowup)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from biodiversity_graph_db_spark.operators import spatial


def _pip_python(lon: float, lat: float) -> bool:
    """Textbook even-odd ray cast, written independently of the column
    expression (different formulation: slope comparison per edge)."""
    poly = spatial.QUERY_POLYGON
    inside = False
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        if (y1 > lat) != (y2 > lat):
            x_cross = (x2 - x1) * (lat - y1) / (y2 - y1) + x1
            if lon < x_cross:
                inside = not inside
    return inside


class TestPromotion:
    def test_dms_parse_golden(self, spark):
        """40°26'46"N,79°58'56"W → (40.446111..., -79.982222...)."""
        df = spark.createDataFrame(
            [("k", "SiteDMS", None, None, "40°26'46\"N,79°58'56\"W", None)],
            "key string, kind string, site_lat double, site_lon double,"
            " dms string, wkt string",
        ).withColumn("payload", F.lit("{}"))
        row = spatial.promote_context_cols(df).collect()[0]
        assert row.pt_lat == pytest.approx(40 + 26 / 60 + 46 / 3600)
        assert row.pt_lon == pytest.approx(-(79 + 58 / 60 + 56 / 3600))
        assert row.lat_min == row.lat_max == row.pt_lat

    def test_wkt_bbox(self, spark):
        df = spark.createDataFrame(
            [
                (
                    "k",
                    "Area",
                    None,
                    None,
                    None,
                    "POLYGON((10 -5,30 -5,30 5,10 5,10 -5))",
                )
            ],
            "key string, kind string, site_lat double, site_lon double,"
            " dms string, wkt string",
        ).withColumn("payload", F.lit("{}"))
        row = spatial.promote_context_cols(df).collect()[0]
        assert (row.lon_min, row.lon_max) == (10.0, 30.0)
        assert (row.lat_min, row.lat_max) == (-5.0, 5.0)
        assert row.pt_lat is None  # polygons have no point location

    def test_normalize_dms_entry_formats(self, spark):
        """Every entry format the reference's DMS regex accepts
        (Types.fs:416-418: ':' or '°' separators, prime marks, optional
        fractional seconds) must normalize to the canonical form the
        promote parser reads; invalid strings → NULL."""
        cases = [
            ("40:26:46\"N,79:58:56\"W", "40°26'46\"N,79°58'56\"W"),
            ("40°26′46.5″N,79°58′56″W", "40°26'46.5\"N,79°58'56\"W"),
            ("40°26'46\"N,79°58'56\"W", "40°26'46\"N,79°58'56\"W"),
            ("not a coordinate", None),
            ("40°26'46\"X,79°58'56\"W", None),  # bad hemisphere
        ]
        df = spark.createDataFrame(cases, "raw string, want string").select(
            "want", spatial.normalize_dms(F.col("raw")).alias("got")
        )
        for r in df.collect():
            assert r.got == r.want, (r.got, r.want)

    def test_normalized_entry_dms_promotes(self, spark):
        """Entry-format DMS → normalize → promote round-trips to the
        same decimal degrees as the canonical form, fraction included."""
        df = spark.createDataFrame(
            [("k", "SiteDMS", None, None, "40:26:46.5\"N,79:58:56\"W", None)],
            "key string, kind string, site_lat double, site_lon double,"
            " dms string, wkt string",
        ).withColumn("payload", F.lit("{}"))
        df = df.withColumn("dms", spatial.normalize_dms(F.col("dms")))
        row = spatial.promote_context_cols(df).collect()[0]
        assert row.pt_lat == pytest.approx(40 + 26 / 60 + 46.5 / 3600)
        assert row.pt_lon == pytest.approx(-(79 + 58 / 60 + 56 / 3600))

    def test_every_mint_row_promotes(self, spark, sf_dir):
        promoted = spatial.promote_context_cols(
            spatial.mint_context_nodes(spark, sf_dir)
        )
        bad = promoted.where(
            F.col("lat_min").isNull()
            | F.col("lat_max").isNull()
            | F.col("lon_min").isNull()
            | F.col("lon_max").isNull()
        ).count()
        assert bad == 0
        kinds = {r.kind for r in promoted.select("kind").distinct().collect()}
        assert kinds == {"Site", "SiteDMS", "Area"}


class TestRayCast:
    def test_matches_independent_python_raycast(self, spark, sf_dir):
        """Column-expression parity classification == an independently
        written Python ray cast, for every minted point location."""
        promoted = spatial.promote_context_cols(
            spatial.mint_context_nodes(spark, sf_dir)
        )
        pts = promoted.where(F.col("kind").isin("Site", "SiteDMS"))
        got = pts.select(
            "key",
            "pt_lat",
            "pt_lon",
            spatial.point_in_query_polygon(
                F.col("pt_lat"), F.col("pt_lon")
            ).alias("inside"),
        ).collect()
        assert len(got) > 0
        for r in got:
            assert r.inside == _pip_python(r.pt_lon, r.pt_lat), r

    def test_known_points(self, spark):
        """Centroid-ish point in, far point out."""
        df = spark.range(1).select(
            spatial.point_in_query_polygon(F.lit(0.0), F.lit(0.0)).alias("a"),
            spatial.point_in_query_polygon(F.lit(89.0), F.lit(170.0)).alias(
                "b"
            ),
        )
        row = df.collect()[0]
        assert row.a is True and row.b is False


class TestSpatialPlans:
    def test_stored_bbox_filter_pushes_down(self, spark, sf_dir, tmp_path):
        """The production path: promoted context parquet answers bbox
        queries with pushed range predicates on plain double columns —
        row-group min/max pruning at scale."""
        path = str(tmp_path / "ctx")
        spatial.promote_context_cols(
            spatial.mint_context_nodes(spark, sf_dir)
        ).write.parquet(path)
        df = (
            spark.read.parquet(path)
            .where(
                (F.col("lat_max") >= spatial.BBOX["lat_lo"])
                & (F.col("lat_min") <= spatial.BBOX["lat_hi"])
                & (F.col("lon_max") >= spatial.BBOX["lon_lo"])
                & (F.col("lon_min") <= spatial.BBOX["lon_hi"])
            )
            .select("key", "kind")
        )
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "GreaterThanOrEqual(lat_max,-30.0)" in plan
        assert "LessThanOrEqual(lat_min,30.0)" in plan
        assert "GreaterThanOrEqual(lon_max,-60.0)" in plan
        assert "LessThanOrEqual(lon_min,60.0)" in plan
        # column pruning: the payload JSON must not be read for a bbox hit
        read_schema = plan.split("ReadSchema")[1].splitlines()[0]
        assert "payload" not in read_schema

    def test_geo3_spatial_join_is_equi_join(self, spark, sf_dir):
        """The points-in-areas join must be grid-cell bucketed: a plain
        equi-join on (cx, cy), never a cartesian or nested-loop over
        points × polygons."""
        from biodiversity_graph_db_spark import registry

        registry.load_all()
        df = registry.QUERIES["GEO3_points_in_areas"](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert df.count() > 0

    def test_geo4_radius_join_is_equi_join(self, spark, sf_dir):
        """The radius join must stay a grid-cell equi-join with a
        codegen'd distance predicate — no cartesian/BNLJ, and the
        nearest-site pick is an aggregate (struct-min), not a window."""
        from biodiversity_graph_db_spark import registry

        registry.load_all()
        df = registry.QUERIES["GEO4_radius_sites"](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "Window" not in plan  # struct-min, map-side combinable
        assert df.count() > 0

    def test_pip_column_matches_constant_unroll(self, spark, sf_dir):
        """point_in_polygon_col (the F.aggregate general form) must agree
        with the unrolled constant-polygon ray cast on the same pentagon
        for every minted point."""
        promoted = spatial.promote_context_cols(
            spatial.mint_context_nodes(spark, sf_dir)
        )
        ring = list(spatial.QUERY_POLYGON) + [spatial.QUERY_POLYGON[0]]
        poly = F.array(
            *[
                F.struct(F.lit(x).alias("lon"), F.lit(y).alias("lat"))
                for x, y in ring
            ]
        )
        pts = promoted.where(F.col("kind").isin("Site", "SiteDMS"))
        diff = pts.select(
            spatial.point_in_query_polygon(
                F.col("pt_lat"), F.col("pt_lon")
            ).alias("a"),
            spatial.point_in_polygon_col(
                F.col("pt_lat"), F.col("pt_lon"), poly
            ).alias("b"),
        ).where(F.col("a") != F.col("b"))
        assert diff.count() == 0

    def test_stored_context_table_partition_prunes(self, spark, sf_dir, tmp_path):
        """The lon_band-partitioned store: a bbox read must (a) return
        exactly what the unpartitioned filter returns and (b) carry the
        band range as a PARTITION filter, so unmatched bands are pruned
        at the directory level before any file opens."""
        promoted = spatial.promote_context_cols(
            spatial.mint_context_nodes(spark, sf_dir)
        )
        path = str(tmp_path / "ctx_banded")
        spatial.write_context_table(promoted, path)
        box = dict(lat_lo=-30.0, lat_hi=30.0, lon_lo=-60.0, lon_hi=60.0)
        got = spatial.read_contexts_bbox(spark, path, **box)
        want = promoted.where(
            (F.col("lat_max") >= box["lat_lo"])
            & (F.col("lat_min") <= box["lat_hi"])
            & (F.col("lon_max") >= box["lon_lo"])
            & (F.col("lon_min") <= box["lon_hi"])
        )
        assert sorted(r.key for r in got.select("key").collect()) == sorted(
            r.key for r in want.select("key").collect()
        )
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        assert "lon_band" in plan.split("PartitionFilters")[1].split("]")[0]

    def test_geo2_compiles_within_codegen_limits(self, spark, sf_dir):
        """The fused mint+parse+ray-cast plan must stay inside
        whole-stage codegen: with fallback disabled, a Janino 64 KB
        blowup (the bug the projection barrier fixes) raises instead of
        silently degrading to interpreted eval."""
        from biodiversity_graph_db_spark import registry

        registry.load_all()
        old = spark.conf.get("spark.sql.codegen.fallback")
        spark.conf.set("spark.sql.codegen.fallback", "false")
        try:
            rows = registry.QUERIES["GEO2_polygon_contains"](
                spark, sf_dir
            ).collect()
            assert len(rows) > 0
        finally:
            spark.conf.set("spark.sql.codegen.fallback", old)


class TestAntimeridianWrap:
    def test_wrap_lon_cell_maps_seam_window_onto_far_side(self, spark):
        """Round-5 review: haversine is seam-safe but a linear cell
        range is not — an expansion window crossing ±180° must probe
        the far side's cells.  wrap_lon_cell(floor(-184.5/10)) must
        equal floor(179.9/10), and in-range ids must be unchanged."""
        from biodiversity_graph_db_spark.operators.spatial import (
            wrap_lon_cell,
        )

        df = spark.createDataFrame(
            [(-19,), (-18,), (0,), (17,), (18,), (19,), (53,)], "cx long"
        )
        got = {
            r.cx: r.w
            for r in df.select(
                "cx", wrap_lon_cell(F.col("cx")).alias("w")
            ).collect()
        }
        assert got[-19] == 17   # window past -180 lands on +17x cells
        assert got[18] == -18   # window past +180 lands on -18x cells
        assert got[19] == -17
        assert got[53] == 17    # arbitrary overshoot still wraps
        for in_range in (-18, 0, 17):
            assert got[in_range] == in_range


class TestAreaPointCountBoundary:
    """GEO7's covered-cell pre-aggregation: the minted areas are
    integer-cornered so the oracle never exercises the boundary-cell
    path — pin it here with fractional-corner areas against a Python
    brute force of the same half-open bbox predicate."""

    def test_fractional_corners_match_brute_force(self, spark):
        import itertools

        from biodiversity_graph_db_spark.operators.spatial import (
            FINE_DEG,
            area_point_count,
        )

        # points on a 0.25-degree lattice; areas with fractional corners
        # chosen so every covered cell straddles a boundary somewhere
        pts = [
            (i, 0.25 * (i % 40) - 3.7, 0.25 * (i // 40) - 2.3)
            for i in range(400)
        ]
        areas = [
            ("a1", -2.55, 1.45, -3.15, 2.85),   # nothing aligned
            ("a2", -0.5, 0.5, -0.5, 0.5),        # half-cell offsets
            ("a3", 0.0, 2.0, -1.0, 1.0),         # fully aligned control
            ("a4", -2.25, -2.20, 1.05, 1.10),    # sliver inside one cell
        ]
        rows = [
            {
                "key": f"p{i}",
                "kind": "Site",
                "pt_lat": lat,
                "pt_lon": lon,
                "lat_min": lat,
                "lat_max": lat,
                "lon_min": lon,
                "lon_max": lon,
            }
            for i, lat, lon in pts
        ] + [
            {
                "key": k,
                "kind": "Area",
                "pt_lat": None,
                "pt_lon": None,
                "lat_min": lat0,
                "lat_max": lat1,
                "lon_min": lon0,
                "lon_max": lon1,
            }
            for k, lat0, lat1, lon0, lon1 in areas
        ]
        promoted = spark.createDataFrame(
            rows,
            "key string, kind string, pt_lat double, pt_lon double,"
            " lat_min double, lat_max double, lon_min double,"
            " lon_max double",
        )
        got = {
            r.area_key: r.n_points
            for r in area_point_count(promoted).collect()
        }
        want: dict[str, int] = {}
        for k, lat0, lat1, lon0, lon1 in areas:
            n = sum(
                1
                for _, lat, lon in pts
                if lat0 <= lat < lat1 and lon0 <= lon < lon1
            )
            if n:
                want[k] = n
        assert got == want
        # the test is only meaningful if the boundary path actually ran:
        # at least one covered cell of a1/a2/a4 must be non-interior
        assert any(
            not (
                lat0 <= cy * FINE_DEG
                and (cy + 1) * FINE_DEG <= lat1
                and lon0 <= cx * FINE_DEG
                and (cx + 1) * FINE_DEG <= lon1
            )
            for k, lat0, lat1, lon0, lon1 in areas[:2]
            for cx, cy in itertools.product(
                range(int(lon0 // FINE_DEG), int(-(-lon1 // FINE_DEG))),
                range(int(lat0 // FINE_DEG), int(-(-lat1 // FINE_DEG))),
            )
        )

    def test_geo8_dense_cluster_matches_brute_force(self, spark):
        """GEO8's multi-resolution probe (VERDICT r11 item 3): when one
        FINE_DEG cell holds >> k points, the level-2 bound must shrink
        the candidate set WITHOUT cutting any true top-k row.  Minted
        clusters force both enumeration paths: area d1 sits on a 60-pt
        cluster packed inside one eighth-degree cell (q*2 = 0 ⇒
        r_bound <= 0.18 <= the 2° dense cutoff — the dense branch by
        construction), area s1 has only far-flung points (r_bound from
        level 1 > 2° — the sparse branch).  Brute force over the same
        rows is the oracle, including d2 tie-breaks by site key."""
        from biodiversity_graph_db_spark.operators.spatial import (
            NEAREST_K,
            RADIUS_DEG,
            nearest_topk,
        )

        pts = []
        # dense cluster: 60 points inside one 0.125-deg cell near (10.06, 20.06)
        for i in range(60):
            pts.append(
                (f"p{i:04d}", 10.0 + (i % 8) * 0.015, 20.0 + (i // 8) * 0.015)
            )
        # sparse neighbourhood: a handful of points 2.5-4.5 deg from (-30, -40)
        for j, (dlat, dlon) in enumerate(
            [(2.5, 0.0), (0.0, 3.0), (-3.5, 0.0), (0.0, -4.5), (3.0, 3.0)]
        ):
            pts.append((f"q{j}", -30.0 + dlat, -40.0 + dlon))
        # areas: centroid = box middle; d1 over the cluster, s1 over the voids
        areas = [
            ("d1", 10.06 - 5.0, 10.06 + 5.0, 20.06 - 10.0, 20.06 + 10.0),
            ("s1", -30.0 - 5.0, -30.0 + 5.0, -40.0 - 10.0, -40.0 + 10.0),
        ]
        rows = [
            {
                "key": k,
                "kind": "Site",
                "pt_lat": lat,
                "pt_lon": lon,
                "lat_min": lat,
                "lat_max": lat,
                "lon_min": lon,
                "lon_max": lon,
            }
            for k, lat, lon in pts
        ] + [
            {
                "key": k,
                "kind": "Area",
                "pt_lat": None,
                "pt_lon": None,
                "lat_min": lat0,
                "lat_max": lat1,
                "lon_min": lon0,
                "lon_max": lon1,
            }
            for k, lat0, lat1, lon0, lon1 in areas
        ]
        promoted = spark.createDataFrame(
            rows,
            "key string, kind string, pt_lat double, pt_lon double,"
            " lat_min double, lat_max double, lon_min double,"
            " lon_max double",
        )
        got = [
            (r.area_key, r.rk, r.site_key)
            for r in nearest_topk(promoted).collect()
        ]
        want = []
        for k, lat0, lat1, lon0, lon1 in areas:
            c_lat, c_lon = (lat0 + lat1) / 2.0, (lon0 + lon1) / 2.0
            cand = sorted(
                (
                    (plat - c_lat) ** 2 + (plon - c_lon) ** 2,
                    key,
                )
                for key, plat, plon in pts
                if (plat - c_lat) ** 2 + (plon - c_lon) ** 2
                <= RADIUS_DEG * RADIUS_DEG
            )
            for rk, (_, key) in enumerate(cand[:NEAREST_K], start=1):
                want.append((k, rk, key))
        assert sorted(got) == sorted(want)
        # the dense area's top-k must come from the cluster cell
        assert all(s.startswith("p") for a, _, s in got if a == "d1")

    def test_geo7b_mint_drives_both_branches(self, spark):
        """Non-hollowness of the GEO7b driver row (VERDICT r11 item 2):
        on the fractional-corner mint at the grading SF, BOTH branches
        of area_point_count contribute non-empty counts — the driver
        grade is load-bearing for the boundary filter-refine path, not
        only the interior synopsis."""
        from biodiversity_graph_db_spark.operators.spatial import (
            _shift_areas_fractional,
            area_point_count_parts,
            mint_context_nodes,
            promote_context_cols,
        )

        promoted = promote_context_cols(
            mint_context_nodes(spark, "/root/testdata/sf0.01")
        ).localCheckpoint()
        interior, boundary = area_point_count_parts(
            _shift_areas_fractional(promoted)
        )
        n_int, n_bnd = interior.count(), boundary.count()
        assert n_int > 0, "interior branch hollow on the GEO7b mint"
        assert n_bnd > 0, "boundary branch hollow on the GEO7b mint"
        # and the unshifted GEO7 mint stays interior-only by design
        _, bnd0 = area_point_count_parts(promoted)
        assert bnd0.count() == 0

    def test_geo7c_mint_drives_both_branches_and_matches_brute_force(
        self, spark
    ):
        """GEO7c: (a) non-hollowness — the pentagon mint keeps ALL
        THREE branches live at the grading SF (interior synopsis,
        rectangle-boundary box refine, chamfer ray-cast refine); (b)
        the filter-refine answer equals the brute-force all-pairs
        ray-cast (the classification is result-invisible)."""
        from pyspark.sql import functions as F

        from biodiversity_graph_db_spark.operators.spatial import (
            _pentagon_poly,
            mint_context_nodes,
            point_in_polygon_col,
            polygon_point_count,
            polygon_point_count_parts,
            promote_context_cols,
        )

        promoted = promote_context_cols(
            mint_context_nodes(spark, "/root/testdata/sf0.01")
        ).localCheckpoint()
        interior, box_bnd, ray_bnd = polygon_point_count_parts(promoted)
        assert interior.count() > 0, "interior branch hollow"
        assert box_bnd.count() > 0, "box-refine branch hollow"
        assert ray_bnd.count() > 0, "ray-cast branch hollow"

        got = {
            r["area_key"]: r["n_points"]
            for r in polygon_point_count(promoted).collect()
        }
        k = F.regexp_extract(F.col("key"), "([0-9]+)$", 1).cast("long")
        areas = promoted.where(F.col("kind") == "Area").select(
            F.col("key").alias("area_key"),
            _pentagon_poly(k).alias("poly"),
        )
        pts = promoted.where(
            F.col("kind").isin("Site", "SiteDMS")
        ).select("pt_lat", "pt_lon")
        brute = {
            r["area_key"]: r["n"]
            for r in areas.crossJoin(pts)
            .where(
                point_in_polygon_col(
                    F.col("pt_lat"), F.col("pt_lon"), F.col("poly")
                )
            )
            .groupBy("area_key")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .collect()
        }
        assert got == brute

    def test_geo8b_mint_drives_both_branches(self, spark):
        """Non-hollowness of the GEO8b driver row (the GEO7b discipline
        applied to GEO8's branch pair): on the even-key clustered mint
        at the grading SF, BOTH candidate-enumeration branches are
        non-empty — the clustered half selects the FINE2 dense path,
        the scattered half the FINE sparse path — while the STANDARD
        mint never selects the dense branch at all (which is why GEO8's
        own driver grade needs GEO8b beside it)."""
        from biodiversity_graph_db_spark.operators.spatial import (
            _cluster_even_keys,
            mint_context_nodes,
            nearest_topk_parts,
            promote_context_cols,
        )

        promoted = promote_context_cols(
            mint_context_nodes(spark, "/root/testdata/sf0.01")
        ).localCheckpoint()
        dense, sparse = nearest_topk_parts(_cluster_even_keys(promoted))
        assert dense.count() > 0, "dense branch hollow on the GEO8b mint"
        assert sparse.count() > 0, "sparse branch hollow on the GEO8b mint"
        # the standard mint never reaches FINE2 enumeration at this SF —
        # documented hollowness that GEO8b exists to cover
        dense0, _ = nearest_topk_parts(promoted)
        assert dense0.count() == 0
