"""Scenario automations (Scenarios.fs:133-311) through the validated
mutation path, against the real seed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from biodiversity_graph_db_spark.graph import scenarios as S
from biodiversity_graph_db_spark.graph.seed import seed_graph
from biodiversity_graph_db_spark.graph.store import GraphIntegrityError


@pytest.fixture(scope="module")
def base(spark):
    store = seed_graph(spark)
    src = spark.createDataFrame(
        [("sourcenode_pub_test_x_2001", "SourceNode", "Test 2001", None)],
        "key string, node_type string, pretty_name string, payload string",
    )
    store = store.add_nodes(src)
    store = store.cache()
    return store


def _edge_set(store, source_key=None, relation=None):
    e = store.edges
    if source_key is not None:
        e = e.where(F.col("source_key") == source_key)
    if relation is not None:
        e = e.where(F.col("relation") == relation)
    return [(r.source_key, r.sink_key, r.relation) for r in e.collect()]


def test_holocene_cal_year():
    assert S.holocene_cal_year("AD", 1950) == 0
    assert S.holocene_cal_year("AD", 2000) == -50
    assert S.holocene_cal_year("BC", 50) == 2000
    assert S.holocene_cal_year("BP", 9000) == 9000
    assert S.holocene_cal_year("CalYrBP", 11650) == 11650


def test_try_select_time_routing():
    assert S.try_select_time("BP", 9000) == ("calyearnode_9000ybp", False)
    assert S.try_select_time("BP", 11650) == ("calyearnode_11650ybp", False)
    assert S.try_select_time("BP", 12000) == (S.OUT_OF_SCOPE_KEY, True)


def test_simple_site_full_graph_shape(base):
    sc = S.SiteOnlyScenario(
        site_name="Kettlehole Lake",
        sampling_location="POLYGON((26.41 41.79,43.11 41.79,43.11 32.87))",
        sample_origin="LakeSediment",
        earliest_year=("BP", 9000.0),
        latest_year=("AD", 1950.0),
        proxy_categories=["Pollen", "Diatom"],
        earliest_uncertainty=(50.0, 50.0),
    )
    out, tl = S.automate_simple_site(base, "sourcenode_pub_test_x_2001", sc)

    assert _edge_set(out, "sourcenode_pub_test_x_2001", "HasTemporalExtent") == [
        ("sourcenode_pub_test_x_2001", tl, "HasTemporalExtent")
    ]
    from_tl = _edge_set(out, tl)
    sinks = {(r, s) for _, s, r in from_tl}
    assert ("ExtentEarliestSpecified", "calyearnode_9000ybp") in sinks
    assert ("ExtentEarliestUncertainty", "calyearnode_9050ybp") in sinks
    assert ("ExtentEarliestUncertainty", "calyearnode_8950ybp") in sinks
    assert ("ExtentLatestSpecified", "calyearnode_0ybp") in sinks
    assert ("HasProxyCategory", "bioticproxycategorynode_pollen") in sinks
    assert ("HasProxyCategory", "bioticproxycategorynode_diatom") in sinks
    ctx = [s for _, s, r in from_tl if r == "IsLocatedAt"]
    assert len(ctx) == 1 and ctx[0].startswith("contextnode_")
    # context node payload carries the scenario fields
    payload = (
        out.nodes.where(F.col("key") == ctx[0]).select("payload").first().payload
    )
    assert "Kettlehole Lake" in payload and "LakeSediment" in payload


def test_simple_site_requires_proxy_categories(base):
    sc = S.SiteOnlyScenario(
        site_name="X",
        sampling_location="Arctic",
        sample_origin="PeatCore",
        earliest_year=("BP", 5000.0),
        latest_year=("BP", 0.0),
        proxy_categories=[],
    )
    with pytest.raises(GraphIntegrityError, match="empty"):
        S.automate_simple_site(base, "sourcenode_pub_test_x_2001", sc)


def test_simple_site_out_of_scope_needs_label_node(base):
    sc = S.SiteOnlyScenario(
        site_name="Old Site",
        sampling_location="Arctic",
        sample_origin="Excavation",
        earliest_year=("BP", 13000.0),  # pre-Holocene
        latest_year=("BP", 100.0),
        proxy_categories=["Pollen"],
    )
    # like the reference, the out-of-scope label must exist in the graph
    with pytest.raises(GraphIntegrityError, match="endpoint missing"):
        S.automate_simple_site(base, "sourcenode_pub_test_x_2001", sc)

    label = base.spark.createDataFrame(
        [(S.OUT_OF_SCOPE_KEY, "QualitativeLabelOutOfScopeNode", "Pre-Holocene", None)],
        "key string, node_type string, pretty_name string, payload string",
    )
    out, tl = S.automate_simple_site(
        base.add_nodes(label), "sourcenode_pub_test_x_2001", sc
    )
    sinks = {(r, s) for _, s, r in _edge_set(out, tl)}
    assert ("ExtentEarliestOutOfScope", S.OUT_OF_SCOPE_KEY) in sinks
    # no uncertainty edges for an out-of-scope earliest bound
    assert not [x for x in sinks if x[0] == "ExtentEarliestUncertainty"]


def test_tree_ring_requires_existing_taxon(base):
    sc = S.WoodRingScenario(
        site_name="Treeline",
        location="68.5N 18.2E",
        earliest_year_ad=1800,
        latest_year_ad=2000,
        collection_date_ad=2001,
        taxon=("Genus", "Pinus"),
    )
    with pytest.raises(GraphIntegrityError, match="Cannot find taxon"):
        S.automate_tree_ring(base, "sourcenode_pub_test_x_2001", sc)


def test_tree_ring_full_graph_shape(base):
    taxon = base.spark.createDataFrame(
        [("taxonnode_genus_betula", "TaxonNode", "Betula", None)],
        "key string, node_type string, pretty_name string, payload string",
    )
    store = base.add_nodes(taxon)
    sc = S.WoodRingScenario(
        site_name="Birch stand",
        location="68.5N 18.2E",
        earliest_year_ad=1800,
        latest_year_ad=2000,
        collection_date_ad=2001,
        taxon=("Genus", "Betula"),
    )
    out, tl = S.automate_tree_ring(store, "sourcenode_pub_test_x_2001", sc)

    from_tl = _edge_set(out, tl)
    sinks = {(r, s) for _, s, r in from_tl}
    assert ("ExtentEarliestSpecified", "calyearnode_150ybp") in sinks
    assert ("ExtentLatestSpecified", "calyearnode_-50ybp") in sinks

    dates = [s for _, s, r in from_tl if r == "ConstructedWithDate"]
    assert len(dates) == 1
    assert _edge_set(out, dates[0], "TimeEstimate") == [
        (dates[0], "calyearnode_-51ybp", "TimeEstimate")
    ]

    hyper = [s for _, s, r in from_tl if r == "HasProxyInfo"]
    assert len(hyper) == 1
    spokes = {(r, s) for _, s, r in _edge_set(out, hyper[0])}
    assert ("InferredFrom", "bioticproxynode_betula_sp.") in spokes
    assert ("InferredUsing", S.IMPLICIT_METHOD_KEY) in spokes
    assert ("InferredAs", "taxonnode_genus_betula") in spokes
    assert ("MeasuredBy", S.PRESENCE_OUTCOME_KEY) in spokes


def test_tree_ring_species_key_and_label():
    key, label = S._wood_taxon(("Species", "Betula", "nana", "L."))
    assert key == "taxonnode_species_betula_nana_l."
    assert label == "Betula nana L."
