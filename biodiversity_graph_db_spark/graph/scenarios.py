"""Scenario automations — the reference's scripted multi-node/multi-edge
transactions (Scenarios.fs:133-311; routed from the form layer at
Library.fs:427-460).

Two scenarios exist in the reference, both "common work patterns of
nodes and relations" executed as one validated batch:

- ``automate_simple_site`` (automateSimpleSite, Scenarios.fs:133-228):
  one timeline + context for a source, temporal extent resolved against
  the seeded time index (in-scope year vs pre-Holocene out-of-scope
  label, NodeSelection.trySelectTime Scenarios.fs:37-40), optional ±
  uncertainty edges, and HasProxyCategory links.
- ``automate_tree_ring`` (automateTreeRing, Scenarios.fs:230-311): a
  wood-ring chronology — timeline + collection-date node + context, AD
  years mapped onto the cal-yr-BP index, plus a full proxied-taxon
  hyperedge (whole-organism proxy, Implicit inference, PresenceOnly
  outcome) against a pre-existing taxon.

Design: scenario inputs are driver-side scalars (they come from a form,
one scenario at a time in the reference); the writes go through the
GraphStore mutation path, so every batch gets the J4 FK check, the J5
signature check and U5 edge dedup.  Like the reference, a missing
referenced node (year out of index, taxon not yet created) fails the
whole scenario — here as ``GraphIntegrityError`` from the FK probe.
GUID keys are synthesized driver-side (uuid4) because the edges must
reference them within the same batch.
"""

from __future__ import annotations

import json
import uuid
from dataclasses import dataclass, field

from pyspark.sql import functions as F

from biodiversity_graph_db_spark.graph.store import (
    GraphIntegrityError,
    GraphStore,
)

OUT_OF_SCOPE_KEY = (
    "qualitativelabeloutofscopenode_pre-holocene_by_global stratotype"
    " section and point"
)
PRESENCE_OUTCOME_KEY = "biodiversitydimensionnode_presence"
IMPLICIT_METHOD_KEY = "inferencemethodnode_implicit"


def holocene_cal_year(calendar: str, value: float) -> int:
    """X5 (NodeSelection.holoceneCalYear, Scenarios.fs:12-19): normalize
    an OldDateSimple to rounded cal yr BP."""
    if calendar == "AD":
        v = 1950.0 - value
    elif calendar == "BC":
        v = value + 1950.0
    elif calendar in ("BP", "CalYrBP"):
        v = float(value)
    else:
        raise ValueError(f"unknown calendar: {calendar}")
    # .NET Math.Round is banker's rounding — Python round matches
    return int(round(v))


def year_node_key(year_bp: int) -> str:
    return f"calyearnode_{year_bp}ybp"


def try_select_time(calendar: str, value: float) -> tuple[str, bool]:
    """trySelectTime (Scenarios.fs:37-40): route to the year node if
    within the Holocene, else to the pre-Holocene out-of-scope label.
    Returns (sink_key, out_of_scope)."""
    y = holocene_cal_year(calendar, value)
    if y <= 11650:
        return year_node_key(y), False
    return OUT_OF_SCOPE_KEY, True


@dataclass
class SiteOnlyScenario:
    """SiteOnlyScenario (Scenarios.fs:81-124)."""

    site_name: str
    sampling_location: str  # WKT / DD / political unit, pre-validated text
    sample_origin: str
    earliest_year: tuple[str, float]  # (calendar, value)
    latest_year: tuple[str, float]
    proxy_categories: list[str] = field(default_factory=list)
    sample_location_description: str | None = None
    # (older_error, younger_error) in years; None = NoDatingErrorSpecified
    earliest_uncertainty: tuple[float, float] | None = None
    latest_uncertainty: tuple[float, float] | None = None
    timeline: str = "Continuous Regular"


@dataclass
class WoodRingScenario:
    """WoodRingScenario (Scenarios.fs:55-77)."""

    site_name: str
    location: str
    earliest_year_ad: float
    latest_year_ad: float
    collection_date_ad: float
    # ("Genus", g) | ("Species", g, s, auth) | ("Subspecies", g, s, ssp, auth)
    taxon: tuple[str, ...] = ("Genus", "Betula")


def _guid(node_type: str) -> str:
    return f"{node_type.lower()}_{uuid.uuid4()}"


def _node_rows(spark, rows):
    return spark.createDataFrame(
        rows, "key string, node_type string, pretty_name string, payload string"
    )


def _edge_rows(spark, rows):
    return spark.createDataFrame(
        rows, "source_key string, sink_key string, relation string, payload string"
    )


def _date_payload(calendar: str, value: float) -> str:
    return json.dumps({"calendar": calendar, "value": value})


def _uncertainty_edges(
    timeline_key: str,
    anchor_bp: int,
    uncertainty: tuple[float, float] | None,
    relation: str,
) -> list[tuple[str, str, str, str | None]]:
    """addDateUncertainties (Scenarios.fs:160-197): year ± error → two
    extra extent-uncertainty edges against the time index."""
    if uncertainty is None:
        return []
    older, younger = uncertainty
    return [
        (timeline_key, year_node_key(anchor_bp + int(older)), relation, None),
        (timeline_key, year_node_key(anchor_bp - int(younger)), relation, None),
    ]


def automate_simple_site(
    store: GraphStore, source_key: str, sc: SiteOnlyScenario
) -> tuple[GraphStore, str]:
    """automateSimpleSite (Scenarios.fs:133-228).  Returns the updated
    store and the new timeline key."""
    if not sc.proxy_categories:
        raise GraphIntegrityError("Required list is empty")  # notEmpty
    spark = store.spark
    timeline_key = _guid("IndividualTimelineNode")
    context_key = _guid("ContextNode")

    early_sink, out_of_scope = try_select_time(*sc.earliest_year)
    early_rel = (
        "ExtentEarliestOutOfScope" if out_of_scope else "ExtentEarliestSpecified"
    )
    late_bp = holocene_cal_year(*sc.latest_year)
    late_sink = year_node_key(late_bp)

    nodes = [
        (
            timeline_key,
            "IndividualTimelineNode",
            sc.timeline,
            json.dumps({"timeline": sc.timeline}),
        ),
        (
            context_key,
            "ContextNode",
            sc.site_name,
            json.dumps(
                {
                    "Name": sc.site_name,
                    "SamplingLocation": sc.sampling_location,
                    "SampleOrigin": sc.sample_origin,
                    "SampleLocationDescription": sc.sample_location_description,
                }
            ),
        ),
    ]
    cats = [
        (
            f"bioticproxycategorynode_{c.lower()}",
            "BioticProxyCategoryNode",
            c,
            None,
        )
        for c in sc.proxy_categories
    ]

    edges = [
        (source_key, timeline_key, "HasTemporalExtent", None),
        (timeline_key, early_sink, early_rel, _date_payload(*sc.earliest_year)),
        (timeline_key, late_sink, "ExtentLatestSpecified", _date_payload(*sc.latest_year)),
        (timeline_key, context_key, "IsLocatedAt", None),
    ]
    if not out_of_scope:
        edges += _uncertainty_edges(
            timeline_key,
            holocene_cal_year(*sc.earliest_year),
            sc.earliest_uncertainty,
            "ExtentEarliestUncertainty",
        )
    edges += _uncertainty_edges(
        timeline_key, late_bp, sc.latest_uncertainty, "ExtentLatestUncertainty"
    )
    edges += [(timeline_key, k, "HasProxyCategory", None) for k, *_ in cats]

    out = (
        store.add_nodes(_node_rows(spark, nodes), on_conflict="error")
        .add_nodes(_node_rows(spark, cats), on_conflict="skip")
        .add_relations(_edge_rows(spark, edges))
    )
    return out, timeline_key


def _wood_taxon(taxon: tuple[str, ...]) -> tuple[str, str]:
    """(taxon key, whole-organism proxy label) — Scenarios.fs:255-268.
    Key shapes follow makeUniqueKey (Graph.fs:409-422)."""
    rank = taxon[0]
    if rank == "Genus":
        (g,) = taxon[1:]
        return f"taxonnode_genus_{g.lower()}", f"{g} sp."
    if rank == "Species":
        g, s, auth = taxon[1:]
        return (
            f"taxonnode_species_{g.lower()}_{s.lower()}_{auth.lower()}",
            f"{g} {s} {auth}",
        )
    if rank == "Subspecies":
        g, s, ssp, auth = taxon[1:]
        return (
            f"taxonnode_subspecies_{g.lower()}_{s.lower()}_{ssp.lower()}_"
            f"{auth.lower()}",
            f"{g} {s} ssp. {ssp}",
        )
    raise ValueError(f"unsupported wood taxon rank: {rank}")


def automate_tree_ring(
    store: GraphStore, source_key: str, sc: WoodRingScenario
) -> tuple[GraphStore, str]:
    """automateTreeRing (Scenarios.fs:230-311).  Returns the updated
    store and the new timeline key.  The taxon must already exist
    (Scenarios.fs:269-274 errors with "Cannot find taxon" otherwise)."""
    spark = store.spark
    taxon_key, proxy_label = _wood_taxon(sc.taxon)
    if store.nodes.where(F.col("key") == taxon_key).isEmpty():
        raise GraphIntegrityError(
            f"Cannot find taxon. Create {sc.taxon} first."
        )

    timeline_key = _guid("IndividualTimelineNode")
    date_key = _guid("IndividualDateNode")
    context_key = _guid("ContextNode")
    proxy_key = f"bioticproxynode_{proxy_label.lower().replace(' ', '_')}"

    early_bp = 1950 - int(sc.earliest_year_ad)
    late_bp = 1950 - int(sc.latest_year_ad)
    coll_bp = 1950 - int(sc.collection_date_ad)

    nodes = [
        (
            timeline_key,
            "IndividualTimelineNode",
            "Continuous Regular (1 cal yr, wood anatomical features)",
            json.dumps(
                {
                    "timeline": "Continuous",
                    "resolution": {"Regular": 1.0, "feature": "WoodAnatomicalFeatures"},
                }
            ),
        ),
        (
            date_key,
            "IndividualDateNode",
            f"Collection date {int(sc.collection_date_ad)} AD",
            json.dumps(
                {
                    "Date": {"CollectionDate": sc.collection_date_ad},
                    "MaterialDated": "wood increment",
                    "Discarded": False,
                    "MeasurementError": "NoDatingErrorSpecified",
                }
            ),
        ),
        (
            context_key,
            "ContextNode",
            sc.site_name,
            json.dumps(
                {
                    "Name": sc.site_name,
                    "SamplingLocation": sc.location,
                    "SampleOrigin": "LivingOrganism",
                    "SampleLocationDescription": None,
                }
            ),
        ),
    ]
    aux = [
        (
            proxy_key,
            "BioticProxyNode",
            proxy_label,
            json.dumps({"ContemporaneousWholeOrganism": proxy_label}),
        ),
        (IMPLICIT_METHOD_KEY, "InferenceMethodNode", "Implicit", None),
    ]

    edges = [
        (source_key, timeline_key, "HasTemporalExtent", None),
        (
            timeline_key,
            year_node_key(early_bp),
            "ExtentEarliestSpecified",
            _date_payload("AD", sc.earliest_year_ad),
        ),
        (
            timeline_key,
            year_node_key(late_bp),
            "ExtentLatestSpecified",
            _date_payload("AD", sc.latest_year_ad),
        ),
        (
            date_key,
            year_node_key(coll_bp),
            "TimeEstimate",
            _date_payload("AD", sc.collection_date_ad),
        ),
        (timeline_key, date_key, "ConstructedWithDate", None),
        (timeline_key, context_key, "IsLocatedAt", None),
    ]

    out = (
        store.add_nodes(_node_rows(spark, nodes), on_conflict="error")
        .add_nodes(_node_rows(spark, aux), on_conflict="skip")
        .add_relations(_edge_rows(spark, edges))
        .add_proxied_taxon(
            _guid("ProxiedTaxonNode"),
            timeline_key,
            proxy_key,
            IMPLICIT_METHOD_KEY,
            [taxon_key],
            outcome_key=PRESENCE_OUTCOME_KEY,
        )
    )
    return out, timeline_key
