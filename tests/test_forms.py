"""Typed view-model ingest tests, mirroring the reference's Forms tests
(tests/BiodiversityCoder.Core.Tests/Forms.fs:24-206): DU with no fields,
single field, multiple fields, nested DU, list fields, option fields —
plus the quarantine semantics the bulk path adds."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from biodiversity_graph_db_spark.sources import forms


def _vms(spark, rows):
    return spark.createDataFrame(
        rows, "vm_id long, node_type string, vm_json string"
    )


def _run(spark, rows):
    nodes, quar = forms.ingest_view_models(_vms(spark, rows))
    return (
        {r.vm_id: r for r in quar.collect()},
        nodes.collect(),
    )


class TestCreateFromViewModel:
    def test_du_with_no_fields(self, spark):
        # Forms.fs:26-35 ``works with a DU with no fields`` (Life)
        bad, nodes = _run(
            spark, [(1, "TaxonNode", json.dumps({"rank": "Life"}))]
        )
        assert bad == {}
        assert nodes[0].key == "taxonnode_life"
        assert nodes[0].pretty_name == "Life"

    def test_du_with_single_field(self, spark):
        # Forms.fs:37-43 (Family "Betula")
        bad, nodes = _run(
            spark,
            [(1, "TaxonNode", json.dumps({"rank": "Family", "name": "Betula"}))],
        )
        assert bad == {}
        assert nodes[0].key == "taxonnode_family_betula"
        assert nodes[0].pretty_name == "Betula [Family]"

    def test_du_with_multiple_fields(self, spark):
        # Forms.fs:45-60 (Subspecies Betula pendula mandshurica L.)
        vm = {
            "rank": "Subspecies",
            "generic": "Betula",
            "specific": "pendula",
            "subspecific": "mandshurica",
            "authorship": "L.",
        }
        bad, nodes = _run(spark, [(1, "TaxonNode", json.dumps(vm))])
        assert bad == {}
        assert (
            nodes[0].key == "taxonnode_subspecies_betula_pendula_mandshurica_l."
        )

    def test_nested_du(self, spark):
        # Forms.fs:62-75 (Morphotype <- Microfossil(Pollen, "Salix-type"))
        vm = {
            "case": "Morphotype",
            "morphotype": {
                "case": "Microfossil",
                "proxyGroup": "Pollen",
                "morphotypeName": "Salix-type",
            },
        }
        bad, nodes = _run(spark, [(1, "BioticProxyNode", json.dumps(vm))])
        assert bad == {}
        assert nodes[0].key == "bioticproxynode_morphotype_pollen_salix-type"
        assert nodes[0].pretty_name == "Pollen - Salix-type"

    def test_list_and_option_fields(self, spark):
        # Forms.fs:80-127 shape: a node whose payload holds a list of
        # records with an optional field (AgeDepthModel, SD option)
        vm = {
            "CalibrationCurve": "IntCal20",
            "SoftwareName": "OxCal",
            "SoftwareVersion": "4.4",
            "AgeDepthModel": [
                {"Depth": 0.0, "Date": 100.0, "SD": 10.0},
                {"Depth": 10.0, "Date": 200.0},  # SD = None (option)
            ],
        }
        bad, nodes = _run(
            spark, [(1, "DateCalibrationInstanceNode", json.dumps(vm))]
        )
        assert bad == {}
        (node,) = nodes
        assert node.key.startswith("datecalibrationinstancenode_")
        payload = json.loads(node.payload)
        assert len(payload["AgeDepthModel"]) == 2
        assert "SD" not in payload["AgeDepthModel"][1]

    def test_option_fields_bibliographic(self, spark):
        # author/title/year are options; author-less citations are fine
        vm = {"case": "Bibliographic", "title": "The Holocene Record"}
        bad, nodes = _run(spark, [(1, "SourceNode", json.dumps(vm))])
        assert bad == {}
        assert nodes[0].key == "sourcenode_pub_unknown_thr_noyear"

    # --- failure paths (Result.Error strings) ---------------------------

    def test_missing_record_field(self, spark):
        # Forms.fs:173 "No data has been entered for: %s"
        vm = {"Name": "Holocene"}  # DesignatingAuthority missing
        bad, nodes = _run(spark, [(1, "QualitativeLabelNode", json.dumps(vm))])
        assert nodes == []
        assert bad[1].errors == [
            "No data has been entered for: DesignatingAuthority"
        ]

    def test_unknown_du_case(self, spark):
        # Forms.fs:139 unknown DU case is an error
        vm = {"rank": "Megakingdom", "name": "X"}
        bad, _ = _run(spark, [(1, "TaxonNode", json.dumps(vm))])
        assert (
            "The DU case given for rank does not exist on this type."
            in bad[1].errors
        )

    def test_not_entered_yet(self, spark):
        # Forms.fs:140 "No data has been entered yet" (unparseable vm)
        bad, _ = _run(spark, [(1, "TaxonNode", "not json at all")])
        assert bad[1].errors == ["No data has been entered yet"]

    def test_unregistered_node_type(self, spark):
        bad, _ = _run(spark, [(1, "MadeUpNode", json.dumps({}))])
        assert bad[1].errors == [
            "The DU case MadeUpNode does not exist on this type."
        ]

    def test_invalid_smart_constructor_value(self, spark):
        # ShortText.TryCreate rejects >100 chars (Types.fs:204-209)
        vm = {"Name": "x" * 101, "DesignatingAuthority": "ICS"}
        bad, _ = _run(spark, [(1, "QualitativeLabelNode", json.dumps(vm))])
        assert bad[1].errors == ["No data has been entered for: Name"]

    def test_batch_mixes_good_and_bad(self, spark):
        rows = [
            (1, "TaxonNode", json.dumps({"rank": "Life"})),
            (2, "TaxonNode", json.dumps({"rank": "Nope"})),
            (3, "QualitativeLabelNode", json.dumps({"Name": "H"})),
            (4, "BioticProxyNode", json.dumps({
                "case": "Morphotype",
                "morphotype": {
                    "case": "Microfossil",
                    "proxyGroup": "Diatom",
                    "morphotypeName": "Navicula",
                },
            })),
        ]
        bad, nodes = _run(spark, rows)
        assert sorted(bad) == [2, 3]
        assert sorted(n.key for n in nodes) == [
            "bioticproxynode_morphotype_diatom_navicula",
            "taxonnode_life",
        ]
