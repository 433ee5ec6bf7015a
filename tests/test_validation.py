"""Smart-constructor validation + quarantine (SURVEY §1.4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from biodiversity_graph_db_spark.functions import validation as V


class TestValidators:
    def test_author_display_matches_reference_style(self, spark):
        df = spark.createDataFrame(
            [("Smith, J. A.",), ("Doe, J",), ("NoComma",)], "a string"
        )
        rows = df.select(
            V.author_valid(F.col("a")).alias("ok"),
            V.author_display(F.col("a")).alias("d"),
        ).collect()
        assert [r.ok for r in rows] == [True, True, False]
        # Types.fs:295-298: initials joined with '. ', no trailing dot
        assert rows[0].d == "Smith, J. A"
        assert rows[1].d == "Doe, J"
        assert rows[2].d is None

    def test_doi_and_range(self, spark):
        df = spark.createDataFrame(
            [("https://doi.org/10.1126/science.aar3646", "14 - 12")],
            "doi string, pages string",
        )
        r = df.select(
            V.doi_extract(F.col("doi")).alias("doi"),
            V.int_range_parse(F.col("pages")).alias("rng"),
        ).first()
        assert r.doi == "10.1126/science.aar3646"
        assert (r.rng.lo, r.rng.hi) == (12, 14)  # normalized lo<=hi

    def test_wkt_polygon(self, spark):
        df = spark.createDataFrame(
            [
                ("POLYGON((30 10, 40 40, 20 40, 10 20, 30 10))", True),
                ("POLYGON((30 10, 40 40))", False),  # <3 points
                ("POLYGON((300 10, 40 40, 20 40))", False),  # lon OOB
                ("not wkt", False),
            ],
            "wkt string, expect boolean",
        )
        rows = df.select(
            "expect", V.wkt_polygon_valid(F.col("wkt")).alias("ok")
        ).collect()
        for r in rows:
            assert bool(r.ok) == r.expect

    def test_quarantine_splits_and_names_rules(self, spark):
        df = spark.createDataFrame(
            [(1, 10.0, 64.0), (2, -5.0, 64.0), (3, -1.0, 99.0)],
            "id int, depth double, lat double",
        )
        good, bad = V.quarantine(
            df,
            {
                "depth_nonneg": V.depth_valid(F.col("depth")),
                "lat_in_bounds": V.lat_valid(F.col("lat")),
            },
        )
        assert [r.id for r in good.collect()] == [1]
        bad_rows = {r.id: r.failed_rules for r in bad.collect()}
        assert bad_rows[2] == ["depth_nonneg"]
        assert sorted(bad_rows[3]) == ["depth_nonneg", "lat_in_bounds"]

    def test_quarantine_null_rule_is_failure(self, spark):
        df = spark.createDataFrame([(1, None)], "id int, pct double")
        good, bad = V.quarantine(
            df, {"pct_unit": V.percent_create(F.col("pct")).isNotNull()}
        )
        assert good.count() == 0 and bad.count() == 1
