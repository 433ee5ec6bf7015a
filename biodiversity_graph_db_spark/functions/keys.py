"""Deterministic key synthesis (X3) as pure Column expressions.

Reproduces the reference's ``makeUniqueKey`` string pipeline
(/root/reference/src/BiodiversityCoder.Core/Graph.fs:367-543):

- ``safeString`` = HtmlEncode then strip ``[^aA-zZ_ \\-+0-9]`` (Graph.fs:367)
- ``toLower`` (Graph.fs:368)
- ``takeAlphaNumFirstChars`` = first alphanumeric char of each word
  (Graph.fs:369, 211-212 tryAlphanum)
- full key = ``{node_type.lower()}_{case-specific value}`` (Graph.fs:14,
  373-543); GUID-keyed types use ``uuid()`` instead.

Everything is a Column expression, so key synthesis runs JVM-side inside
whole-stage codegen — no Python UDFs on the ingest path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# .NET regex [^aA-zZ_ \-+0-9]: the A-z range spans A-Z [ \ ] ^ _ ` a-z, so
# the *allowed* set is letters, [ \ ] ^ _ `, space, -, +, digits.  Java
# accepts the same class verbatim.
_STRIP = r"[^aA-zZ_ \-+0-9]"


def html_encode(col: Column) -> Column:
    """System.Net.WebUtility.HtmlEncode for the five encoded chars
    (&, <, >, ", ') — & first so entities aren't double-encoded."""
    c = F.regexp_replace(col, "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    c = F.regexp_replace(c, ">", "&gt;")
    c = F.regexp_replace(c, '"', "&quot;")
    c = F.regexp_replace(c, "'", "&#39;")
    return c


def safe_string(col: Column) -> Column:
    """Graph.fs:367 — HtmlEncode then strip disallowed chars."""
    return F.regexp_replace(html_encode(col), _STRIP, "")


def take_alphanum_first_chars(col: Column) -> Column:
    """Graph.fs:369 — initials: first char of each space-separated word,
    kept only if alphanumeric, concatenated."""
    first = F.transform(F.split(col, " "), lambda w: F.substring(w, 1, 1))
    kept = F.filter(first, lambda ch: ch.rlike("^[\\p{L}\\p{N}]$"))
    return F.concat_ws("", kept)


def friendly_key(node_type: str | Column, value: Column) -> Column:
    """Graph.fs:14 AsString — ``{type}_{value}`` with lowercase type."""
    t = F.lit(node_type.lower()) if isinstance(node_type, str) else F.lower(node_type)
    return F.concat_ws("_", t, F.lower(value))


def uuid_key(node_type: str) -> Column:
    """GUID-keyed node types (ProxiedTaxon/Context/Timeline/Date/
    DateCalibration/Dataset — Graph.fs:439-440, 529-532)."""
    return F.concat_ws("_", F.lit(node_type.lower()), F.uuid())


# --- per-type friendly key builders (Graph.fs:373-543) -------------------


def year_key(year: Column) -> Column:
    """CalYearNode: ``{n}ybp`` (Graph.fs:527)."""
    return friendly_key("CalYearNode", F.concat(year.cast("string"), F.lit("ybp")))


def slice_label_key(name: Column, authority: Column) -> Column:
    """QualitativeLabelNode: ``{name}_by_{authority}`` (Graph.fs:528)."""
    return friendly_key(
        "QualitativeLabelNode",
        F.concat_ws("_", safe_string(name), F.lit("by"), safe_string(authority)),
    )


def taxon_key(rank: Column, *names: Column) -> Column:
    """TaxonNode: ``{rank}_{name...}`` / bare ``life`` (Graph.fs:409-422)."""
    parts = [F.lower(rank)] + [safe_string(n) for n in names]
    value = F.when(F.lower(rank) == "life", F.lit("life")).otherwise(
        F.concat_ws("_", *parts)
    )
    return friendly_key("TaxonNode", value)


def outcome_key(measure: Column) -> Column:
    """BiodiversityDimensionNode: fixed vocabulary (Graph.fs:534-543)."""
    value = (
        F.when(measure == "DiversityBeta", F.lit("beta_diversity"))
        .when(measure == "PresenceOnly", F.lit("presence"))
        .when(measure == "PresenceAbsence", F.lit("presence_absence"))
        .otherwise(F.lower(measure))
    )
    return friendly_key("BiodiversityDimensionNode", value)


def journal_article_key(last_name: Column, title: Column, year: Column) -> Column:
    """JournalArticle: ``pub_{lastname}_{title-initials}_{year}``
    (Graph.fs:502-507)."""
    value = F.concat_ws(
        "_",
        F.lit("pub"),
        last_name,
        take_alphanum_first_chars(title),
        year.cast("string"),
    )
    return friendly_key("SourceNode", value)


def inference_atlas_key(reference: Column) -> Column:
    """InferenceMethodNode atlas: ``atlas_{ref-initials}`` (Graph.fs:432)."""
    value = F.concat_ws(
        "_", F.lit("atlas"), safe_string(take_alphanum_first_chars(reference))
    )
    return friendly_key("InferenceMethodNode", value)


def morphotype_key(group: Column, name: Column) -> Column:
    """BioticProxyNode microfossil morphotype:
    ``morphotype_{group}_{name}`` (Graph.fs:386-391)."""
    value = F.concat_ws(
        "_", F.lit("morphotype"), F.lower(group), safe_string(name)
    )
    return friendly_key("BioticProxyNode", value)
