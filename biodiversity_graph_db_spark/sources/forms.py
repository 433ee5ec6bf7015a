"""Typed view-model ingest (Create.createFromViewModel, Forms.fs:78-188).

The reference builds node payloads from UI view models by reflecting over
the F# type: DU case selection, record fields, list fields, option fields,
each leaf routed through the type's smart constructor, any failure
returning an Error string.  The Spark analogue is schema-first instead of
reflection-first: every ingestible node type registers a ``Form`` — the
typed StructType of its view-model JSON, a list of validation checks
(pure Column expressions that mirror the smart constructors in
functions/validation.py), and key/pretty/payload builders from
functions/keys.py.

``ingest_view_models`` turns a DataFrame of raw view models into
validated node rows plus a quarantine of failures — the reference's
``Result<obj,string>`` per row, at bulk scale: one ``from_json`` per
type partition, all checks inside whole-stage codegen, bad rows carry
reference-style error strings ("No data has been entered for: X",
Forms.fs:173; "The DU case X does not exist on this type.",
Forms.fs:139) instead of aborting the batch.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from biodiversity_graph_db_spark.functions import keys as K
from biodiversity_graph_db_spark.functions import validation as V


@dataclass(frozen=True)
class Form:
    """One ingestible node type: view-model schema + checks + builders."""

    node_type: str
    vm_schema: str  # DDL string for from_json
    #: (error message, ok-predicate over the parsed struct column)
    checks: tuple[tuple[str, Callable[[Column], Column]], ...]
    key: Callable[[Column], Column]
    pretty: Callable[[Column], Column]


def _missing(field: str) -> str:
    # Forms.fs:173
    return f"No data has been entered for: {field}"


def _bad_case(case_field: str) -> str:
    # Forms.fs:139 (case name is data-dependent; we name the field)
    return f"The DU case given for {case_field} does not exist on this type."


_TAXON_RANKS_1 = (
    "Kingdom", "Phylum", "Class", "Clade", "Order", "Family", "Subfamily",
    "Tribe", "Subtribe", "Genus", "Subgenus",
)

_MICROFOSSIL_GROUPS = (
    "Diatom", "Ostracod", "PlantMacrofossil", "Pollen",
)


def _taxon_key(p: Column) -> Column:
    rank = p["rank"]
    return (
        F.when(rank == "Life", K.taxon_key(rank))
        .when(rank.isin("Subspecies", "Variety"),
              K.subspecies_key(rank, p["generic"], p["specific"],
                               p["subspecific"], p["authorship"]))
        .when(rank == "Species",
              K.taxon_key(rank, p["generic"], p["specific"], p["authorship"]))
        .otherwise(K.taxon_key(rank, p["name"]))
    )


def _taxon_pretty(p: Column) -> Column:
    rank = p["rank"]
    return (
        F.when(rank == "Life", F.lit("Life"))
        .when(rank.isin("Species", "Subspecies", "Variety"),
              F.concat_ws(" ", p["generic"], p["specific"], p["subspecific"]))
        .otherwise(F.concat_ws(" ", p["name"], F.concat(F.lit("["), rank, F.lit("]"))))
    )


def _taxon_checks() -> tuple[tuple[str, Callable[[Column], Column]], ...]:
    def rank_known(p: Column) -> Column:
        return p["rank"].isin(
            "Life", "Species", "Subspecies", "Variety", *_TAXON_RANKS_1
        )

    def name_ok(p: Column) -> Column:
        # single-name ranks need `name`; Life needs nothing
        return (
            F.when(p["rank"] == "Life", F.lit(True))
            .when(p["rank"].isin(*_TAXON_RANKS_1),
                  V.short_text_valid(p["name"]))
            .otherwise(F.lit(True))
        )

    def binomial_ok(p: Column) -> Column:
        need3 = V.short_text_valid(p["generic"]) & V.short_text_valid(
            p["specific"]
        ) & V.short_text_valid(p["authorship"])
        return (
            F.when(p["rank"] == "Species", need3)
            .when(p["rank"].isin("Subspecies", "Variety"),
                  need3 & V.short_text_valid(p["subspecific"]))
            .otherwise(F.lit(True))
        )

    return (
        (_bad_case("rank"), rank_known),
        (_missing("name"), name_ok),
        (_missing("generic/specific/authorship"), binomial_ok),
    )


def _microfossil_checks() -> tuple[tuple[str, Callable[[Column], Column]], ...]:
    def case_ok(p: Column) -> Column:
        return (p["case"] == "Morphotype") & (
            p["morphotype"]["case"] == "Microfossil"
        )

    def group_ok(p: Column) -> Column:
        return p["morphotype"]["proxyGroup"].isin(*_MICROFOSSIL_GROUPS) | (
            V.short_text_valid(p["morphotype"]["proxyGroup"])
        )

    def name_ok(p: Column) -> Column:
        return V.short_text_valid(p["morphotype"]["morphotypeName"])

    return (
        (_bad_case("case"), case_ok),
        (_bad_case("proxyGroup"), group_ok),
        (_missing("morphotypeName"), name_ok),
    )


def _calibration_checks() -> tuple[tuple[str, Callable[[Column], Column]], ...]:
    def curve_ok(p: Column) -> Column:
        return V.short_text_valid(p["CalibrationCurve"])

    def model_ok(p: Column) -> Column:
        # AgeDepthModel is OPTIONAL (Exposure.fs:95); when present each
        # point needs Depth+Date, SD stays optional
        pts = p["AgeDepthModel"]
        all_ok = F.aggregate(
            F.transform(
                pts,
                lambda x: x["Depth"].isNotNull() & x["Date"].isNotNull(),
            ),
            F.lit(True),
            lambda acc, x: acc & x,
        )
        return pts.isNull() | all_ok

    return (
        (_missing("CalibrationCurve"), curve_ok),
        (_missing("AgeDepthModel point Depth/Date"), model_ok),
    )


def _bibliographic_checks() -> tuple[tuple[str, Callable[[Column], Column]], ...]:
    def any_identity(p: Column) -> Column:
        # author/title/year are options (Sources.fs Bibliographic) — but a
        # completely empty citation is rejected
        return (
            p["author"].isNotNull()
            | p["title"].isNotNull()
            | p["year"].isNotNull()
        )

    def author_ok(p: Column) -> Column:
        return p["author"].isNull() | V.author_valid(p["author"])

    return (
        (_missing("author/title/year"), any_identity),
        ("Invalid value for field author", author_ok),
    )


FORMS: tuple[Form, ...] = (
    Form(
        node_type="TaxonNode",
        vm_schema=(
            "rank string, name string, generic string, specific string,"
            " subspecific string, authorship string"
        ),
        checks=_taxon_checks(),
        key=_taxon_key,
        pretty=_taxon_pretty,
    ),
    Form(
        node_type="BioticProxyNode",
        vm_schema=(
            "case string, morphotype struct<case string, proxyGroup string,"
            " morphotypeName string>"
        ),
        checks=_microfossil_checks(),
        key=lambda p: K.microfossil_key(
            p["morphotype"]["proxyGroup"], p["morphotype"]["morphotypeName"]
        ),
        pretty=lambda p: F.concat_ws(
            " - ",
            p["morphotype"]["proxyGroup"],
            p["morphotype"]["morphotypeName"],
        ),
    ),
    Form(
        node_type="QualitativeLabelNode",
        vm_schema="Name string, DesignatingAuthority string",
        checks=(
            (_missing("Name"), lambda p: V.short_text_valid(p["Name"])),
            (
                _missing("DesignatingAuthority"),
                lambda p: V.short_text_valid(p["DesignatingAuthority"]),
            ),
        ),
        key=lambda p: K.slice_label_key(p["Name"], p["DesignatingAuthority"]),
        pretty=lambda p: p["Name"],
    ),
    Form(
        node_type="DateCalibrationInstanceNode",
        vm_schema=(
            "CalibrationCurve string, SoftwareName string,"
            " SoftwareVersion string,"
            " AgeDepthModel array<struct<Depth double, Date double,"
            " SD double>>"
        ),
        checks=_calibration_checks(),
        key=lambda p: K.uuid_key("DateCalibrationInstanceNode"),
        pretty=lambda p: p["CalibrationCurve"],
    ),
    Form(
        node_type="SourceNode",
        vm_schema="case string, author string, title string, year int",
        checks=_bibliographic_checks(),
        key=lambda p: K.bibliographic_key(p["author"], p["title"], p["year"]),
        pretty=lambda p: F.coalesce(p["title"], p["author"]),
    ),
)

_FORM_TYPES = tuple(f.node_type for f in FORMS)


def ingest_view_models(vms: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(vm_id, node_type, vm_json) → (node rows, quarantine rows).

    Node rows: (key, node_type, pretty_name, payload).  Quarantine rows:
    (vm_id, node_type, errors array<string>) — every failed check listed,
    as the reference surfaces its first Error string per field
    (Forms.fs:118-143).  One from_json per type subset; the per-form loop
    is driver-side over a fixed registry (plan width, not data width).
    """
    nodes_out = None
    quar_out = None

    def _acc(acc: DataFrame | None, df: DataFrame) -> DataFrame:
        return df if acc is None else acc.unionByName(df)

    for form in FORMS:
        subset = vms.where(F.col("node_type") == form.node_type)
        parsed = subset.withColumn(
            "p", F.from_json(F.col("vm_json"), form.vm_schema)
        )
        # PERMISSIVE from_json renders an unparseable document as an
        # all-null struct, so "nothing entered" is an empty canonical JSON
        not_entered = F.col("p").isNull() | (F.to_json(F.col("p")) == "{}")
        err_cols = [
            F.when(
                not_entered,
                # unparseable / empty view model (Forms.fs:140)
                F.lit("No data has been entered yet"),
            ).when(
                # a NULL check verdict (null field inside a predicate) is
                # a failure, not a pass — mirror Result's strictness
                ~F.coalesce(ok(F.col("p")), F.lit(False)),
                F.lit(msg),
            )
            for msg, ok in form.checks
        ]
        errors = F.array_distinct(F.array_compact(F.array(*err_cols)))
        staged = parsed.withColumn("errors", errors)
        good = staged.where(F.size("errors") == 0)
        nodes_out = _acc(
            nodes_out,
            good.select(
                form.key(F.col("p")).alias("key"),
                F.lit(form.node_type).alias("node_type"),
                form.pretty(F.col("p")).alias("pretty_name"),
                F.to_json(F.col("p")).alias("payload"),
            ),
        )
        quar_out = _acc(
            quar_out,
            staged.where(F.size("errors") > 0).select(
                "vm_id", "node_type", "errors"
            ),
        )
    unknown = vms.where(~F.col("node_type").isin(*_FORM_TYPES)).select(
        "vm_id",
        "node_type",
        F.array(
            F.concat(
                F.lit("The DU case "),
                F.col("node_type"),
                F.lit(" does not exist on this type."),
            )
        ).alias("errors"),
    )
    return nodes_out, quar_out.unionByName(unknown)
