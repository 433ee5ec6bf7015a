"""Connector tests (S8/S9/S12/S10): BibTeX regex extraction, Colandr
screening filter, data-table validation + unpivot, CrossRef stub."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from biodiversity_graph_db_spark.sources import bibtex, colandr, datatable, enrichment

BIB = (
    "@article{smith1998,\n"
    "author = {Smith, A. B.},\n"
    "title = {The Holocene Pollen Record},\n"
    "journal = {Journal of Quaternary Science},\n"
    "year = 1998,\n"
    "volume = {13},\n"
    "number = {2},\n"
    "pages = {101--115},\n"
    "month = {jan}}\n"
    "@article{jones2005,\n"
    "author = {Jones, C.},\n"
    "title = {Arctic Diatoms},\n"
    "journal = {Polar Biology},\n"
    "year = 2005,\n"
    "volume = {28},\n"
    "number = {4},\n"
    "pages = {200--210},\n"
    "month = {may}}\n"
)


class TestBibtex:
    def test_parse_records(self, spark):
        records = spark.createDataFrame([(r,) for r in BIB.split("@article")[1:]], "record string")
        records = records.select(F.concat(F.lit("@article"), "record").alias("record"))
        rows = bibtex.parse_bibtex_records(records).collect()
        assert len(rows) == 2
        first = {r.citekey: r for r in rows}["smith1998"]
        assert first.author == "Smith, A. B."
        assert first.year == 1998
        assert (first.page_start, first.page_end) == (101, 115)
        assert first.month == "jan"

    def test_source_nodes_keys(self, spark):
        records = spark.createDataFrame([(BIB.split("@article")[1],)], "record string")
        records = records.select(F.concat(F.lit("@article"), "record").alias("record"))
        nodes = bibtex.bibtex_to_source_nodes(
            bibtex.parse_bibtex_records(records)
        ).collect()
        # pub_{lastname}_{title-initials}_{year} (Graph.fs:502-507)
        assert nodes[0].key == "sourcenode_pub_smith_thpr_1998"
        assert nodes[0].screening_state == "Unscreened"

    def test_unparseable_quarantined(self, spark):
        records = spark.createDataFrame(
            [("@article{broken, nope}",)], "record string"
        )
        rows = bibtex.parse_bibtex_records(records).collect()
        assert rows[0].parse_ok is False


class TestColandr:
    def test_included_filter(self, spark):
        df = spark.createDataFrame(
            [
                ("included", "A, B", "T1", "J1", "1999", "10"),
                ("excluded", "C, D", "T2", "J2", "2000", "11"),
                ("included", "E, F", "T3", "J3", "not_a_year", None),
            ],
            "citation_screening_status string, citation_authors string,"
            "citation_title string, citation_journal_name string,"
            "citation_pub_year string, citation_journal_volume string",
        )
        rows = colandr.colandr_rows(df).collect()
        assert [r.title for r in rows] == ["T1", "T3"]
        assert rows[0].year == 1999 and rows[1].year is None


class TestDataTable:
    GOOD = "depth\tBetula\tPinus\n0.5\t12\t3\n1.0\t10\t5\n1.5\t8\t0"

    def test_long_form(self, spark):
        long = datatable.parse_data_table(spark, self.GOOD)
        rows = long.collect()
        assert len(rows) == 6  # 3 depths x 2 morphotypes
        assert {r.index_unit for r in rows} == {"Depths"}
        got = {(r.index_value, r.morphotype): r.value for r in rows}
        assert got[(0.5, "Betula")] == 12.0
        assert got[(1.5, "Pinus")] == 0.0

    def test_wide_round_trip(self, spark):
        long = datatable.parse_data_table(spark, self.GOOD)
        wide = datatable.wide_view(long)
        assert wide.columns == ["index_value", "index_unit", "Betula", "Pinus"]
        assert wide.count() == 3

    def test_empty_rejected(self, spark):
        with pytest.raises(datatable.DataTableError, match="empty"):
            datatable.parse_data_table(spark, "")

    def test_ragged_rejected(self, spark):
        with pytest.raises(datatable.DataTableError, match="same number"):
            datatable.parse_data_table(spark, "depth\tA\n1\t2\t3")

    def test_bad_index_unit_rejected(self, spark):
        with pytest.raises(datatable.DataTableError, match="first column"):
            datatable.parse_data_table(spark, "banana\tA\n1\t2")

    def test_age_units(self):
        assert datatable.index_unit("Cal yr BP") == "CalYrBP"
        assert datatable.index_unit("YEAR BEFORE PRESENT") == "BP"
        assert datatable.index_unit("ad") == "HistoryYearAD"


class TestCrossRef:
    def test_score_gap_heuristic(self, spark):
        df = spark.createDataFrame(
            [("Pollen of the north",), ("Diatoms of the south",)],
            "title string",
        )
        rows = enrichment.crossref_match(df).collect()
        assert len(rows) == 2
        for r in rows:
            expect = abs(r.score_best - r.score_second) > 1.0
            assert (r.match_confident == "true") is expect
            assert r.matched_doi.startswith("10.5555/")

    def test_gpp_stubbed(self, spark):
        df = spark.createDataFrame([("Salix herbacea",)], "latin_name string")
        with pytest.raises(NotImplementedError):
            enrichment.gpp_backbone_lookup(df)


_CROSSREF_GOLDEN = (
    "/root/reference/src/BiodiversityCoder.Core/crossref-example.json"
)


@pytest.mark.skipif(
    not __import__("os").path.exists(_CROSSREF_GOLDEN),
    reason="reference checkout not present",
)
class TestCrossRefGolden:
    """Golden-file parity against the reference's OWN CrossRef sample
    (``crossref-example.json`` — the exact payload its JsonProvider is
    typed from; VERDICT r7 item 5).  Every case consumes the file
    verbatim, mutating ONLY the fields each ladder rung under test
    requires, and asserts field-for-field against values computed from
    the file's literal contents."""

    @pytest.fixture()
    def payload(self):
        import copy
        import json

        with open(_CROSSREF_GOLDEN) as f:
            self._raw = json.load(f)
        return copy.deepcopy(self._raw)

    def test_verbatim_payload_is_rejected_with_reference_error(
        self, payload
    ):
        # byte-for-byte: the sample's status is the OpenAPI placeholder
        # "string", so bestMatch's first rung rejects it with the exact
        # Sources.fs:329 message
        out = enrichment.parse_crossref_payload(payload)
        assert out["status"] == "error"
        assert out["reason"] == (
            "Could not successfully query CrossRef, either due to no "
            "connection or a bad request."
        )
        assert out["article"] is None

    def test_single_item_is_no_match(self, payload):
        # bestMatch demands rows=2 (Sources.fs:267); the sample ships 1
        payload["status"] = "ok"
        assert len(payload["message"]["items"]) == 1
        out = enrichment.parse_crossref_payload(payload)
        assert out == {
            "status": "no_match",
            "reason": "item count != 2",
            "article": None,
        }

    def _two_items(self, payload, gap):
        import copy

        payload["status"] = "ok"
        item = payload["message"]["items"][0]
        second = copy.deepcopy(item)
        second["score"] = item["score"] + gap
        payload["message"]["items"] = [item, second]
        return payload, item

    def test_score_gap_from_sample_score(self, payload):
        # the heuristic driven by the file's own score (0.284): a second
        # item exactly 1.0 away is NOT a match (strict >, Sources.fs:269)
        p, item = self._two_items(payload, gap=1.0)
        assert item["score"] == pytest.approx(0.284)
        out = enrichment.parse_crossref_payload(p)
        assert out == {
            "status": "no_match",
            "reason": "score gap <= 1.0",
            "article": None,
        }

    def test_non_journal_type_raises_like_failwith(self, payload):
        # past the gap, a non-"journal-article" type failwiths in the
        # reference (Sources.fs:324) — the sample's type is "string"
        p, item = self._two_items(payload, gap=1.0001)
        assert item["type"] == "string"
        with pytest.raises(ValueError, match="string"):
            enrichment.parse_crossref_payload(p)

    def test_sample_date_parts_reject_mapping(self, payload):
        # the sample's published.date-parts is [[0]] — one part, so the
        # year/month rung errors with the Sources.fs:298 message (the
        # sequence "string" ≠ "first" rung is adjusted to reach it)
        p, item = self._two_items(payload, gap=1.0001)
        item["type"] = "journal-article"
        second = p["message"]["items"][1]
        item["author"][0]["sequence"] = "first"
        second["author"][0]["sequence"] = "first"
        assert item["published"]["date-parts"] == [[0]]
        out = enrichment.parse_crossref_payload(p)
        assert out["status"] == "error"
        assert out["reason"] == "No publication date specified"

    def test_journal_article_field_mapping_golden(self, payload):
        # the full JournalArticle mapping, field for field, from the
        # sample's literal values: only the ladder preconditions are
        # adjusted (status, 2 items, type, first-author sequence, a
        # 2-part date); every mapped value below is the file's own
        p, item = self._two_items(payload, gap=1.0001)
        item["type"] = "journal-article"
        item["author"][0]["sequence"] = "first"
        item["published"]["date-parts"] = [[2024, 5]]
        out = enrichment.parse_crossref_payload(p)
        assert out["status"] == "matched"
        a = out["article"]
        # author "string"/"string" → "string, s" (initial of each
        # given word, ". "-joined, no trailing dot — the exact string
        # the reference feeds Author.create)
        assert a["first_author"] == "string, s"
        assert a["additional_authors"] == []  # sample sequence "string"
        assert a["title"] == "string"  # title[0]
        assert a["journal"] == "string"  # container-title[0]
        assert a["year"] == 2024
        assert a["month"] == "May"  # Types.fs:661 table
        assert a["volume"] is None  # Int.tryParse "string" fails
        assert a["number"] is None  # Int.tryParse "string" fails
        assert a["page_range"] is None  # reference hardcodes None
        assert a["doi"] == "string"  # non-empty DOI kept verbatim

    def test_multi_word_given_name_initials(self, payload):
        # initials join: "John Michael Q" → "J. M. Q" (". " separator,
        # no trailing dot) — the subtle format Author.create receives
        p, item = self._two_items(payload, gap=1.0001)
        item["type"] = "journal-article"
        item["author"][0]["sequence"] = "first"
        item["author"][0]["given"] = "John Michael Q"
        item["author"][0]["family"] = "Smith"
        item["published"]["date-parts"] = [[1999, 13]]
        out = enrichment.parse_crossref_payload(p)
        a = out["article"]
        assert a["first_author"] == "Smith, J. M. Q"
        assert a["month"] is None  # 13 outside the 1..12 table
        assert a["year"] == 1999

    def test_crossref_match_gap_parity_with_payload(self, spark, payload):
        # the Spark-side crossref_match applies the SAME strict->1.0
        # rule: a lookup returning the sample's score vs score+1.0 is
        # not confident; +1.0001 is — heuristic parity across the
        # mapInPandas boundary and the payload parser
        import pandas as pd

        s = payload["message"]["items"][0]["score"]

        def lookup_at(gap):
            def fn(titles: pd.Series) -> pd.DataFrame:
                return pd.DataFrame(
                    {
                        "title": titles,
                        "matched_doi": "10.5555/x",
                        "matched_title": titles,
                        "score_best": s + gap,
                        "score_second": s,
                    }
                )

            return fn

        df = spark.createDataFrame([("a title",)], "title string")
        for gap, want in ((1.0, "false"), (1.0001, "true")):
            rows = enrichment.crossref_match(
                df, lookup=lookup_at(gap)
            ).collect()
            assert [r.match_confident for r in rows] == [want]


class TestEvolvingParquet:
    def test_added_missing_and_conflicting_columns(self, spark):
        """S15: newer batches' added columns null-fill older rows; a
        contract column no batch has yet arrives as typed nulls; a type
        conflict with the contract raises instead of coercing."""
        import shutil
        import tempfile

        import pytest
        from pyspark.sql import functions as F
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        from biodiversity_graph_db_spark.sources.evolving import (
            read_evolving_parquet,
        )

        tmp = tempfile.mkdtemp(prefix="evolving_")
        try:
            spark.createDataFrame(
                [(1, "alpha"), (2, "beta")], "doc_id long, text string"
            ).write.parquet(f"{tmp}/data/b1")
            spark.createDataFrame(
                [(3, "gamma", "en")],
                "doc_id long, text string, lang string",
            ).write.parquet(f"{tmp}/data/b2")

            contract = StructType(
                [
                    StructField("doc_id", LongType()),
                    StructField("text", StringType()),
                    StructField("lang", StringType()),
                    StructField("source", StringType()),  # nobody writes it yet
                ]
            )
            got = read_evolving_parquet(
                spark, f"{tmp}/data/*", contract
            ).orderBy("doc_id")
            rows = got.collect()
            assert [r.doc_id for r in rows] == [1, 2, 3]
            assert [r.lang for r in rows] == [None, None, "en"]
            assert all(r.source is None for r in rows)
            assert got.columns == ["doc_id", "text", "lang", "source"]

            # no contract: union schema as-is
            free = read_evolving_parquet(spark, f"{tmp}/data/*")
            assert set(free.columns) == {"doc_id", "text", "lang"}

            # type conflict with the contract: refuse
            bad = StructType(
                [StructField("doc_id", StringType())]
            )
            with pytest.raises(TypeError, match="refusing to coerce"):
                read_evolving_parquet(spark, f"{tmp}/data/*", bad)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


class TestCsvQuarantine:
    def test_good_rows_pass_bad_rows_quarantined(self, spark):
        """S16: one scan splits a dirty CSV into typed good rows and a
        quarantine of raw lines; nothing is lost, nothing fails."""
        import shutil
        import tempfile

        from biodiversity_graph_db_spark.sources.datatable import (
            read_csv_quarantine,
        )

        tmp = tempfile.mkdtemp(prefix="csv_q_")
        try:
            with open(f"{tmp}/in.csv", "w") as f:
                f.write("id,name,score\n")
                f.write("1,alpha,0.5\n")
                f.write("2,beta,not_a_number\n")
                f.write("3,gamma,1.25\n")
            good, bad = read_csv_quarantine(
                spark, f"{tmp}/in.csv", "id long, name string, score double"
            )
            g = {(r.id, r.name, r.score) for r in good.collect()}
            assert g == {(1, "alpha", 0.5), (3, "gamma", 1.25)}
            b = [r.raw_line for r in bad.collect()]
            assert b == ["2,beta,not_a_number"]
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


class TestOrcRoundTrip:
    def test_orc_write_read_pushdown(self, spark, sf_dir):
        """S17: ORC as an interchange format — the engine's tables
        round-trip through ORC losslessly and range predicates reach
        the ORC scan as pushed filters (ORC keeps row-group min/max
        stats like parquet, so the same pruning argument holds at
        100 TB)."""
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from biodiversity_graph_db_spark.tables import table

        tmp = tempfile.mkdtemp(prefix="orc_")
        try:
            orders = table(spark, sf_dir, "orders")
            orders.write.mode("overwrite").orc(f"{tmp}/orders")
            back = spark.read.orc(f"{tmp}/orders")
            assert back.count() == orders.count()
            want = {r.o_orderkey for r in orders.select("o_orderkey").collect()}
            got = {r.o_orderkey for r in back.select("o_orderkey").collect()}
            assert got == want

            q = back.where(F.col("o_orderkey") > 5000).select(
                "o_orderkey", "o_totalprice"
            )
            plan = q._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            assert "orc" in plan.lower()
            assert "GreaterThan(o_orderkey,5000)" in plan
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
