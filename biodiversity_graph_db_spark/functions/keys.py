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


# --- shared helpers for the source/person key family ---------------------


def initials_raw(col: Column) -> Column:
    """First char of every space-separated word, UNfiltered
    (``Seq.map (Seq.head >> string)`` — GreyLiterature keys, Graph.fs:457-461
    keep punctuation initials, unlike ``takeAlphaNumFirstChars``)."""
    return F.concat_ws(
        "", F.transform(F.split(col, " "), lambda w: F.substring(w, 1, 1))
    )


def initials_of_array(arr: Column) -> Column:
    """``takeAlphaNumFirstChars`` over a list of strings (e.g. additional
    authors' last names — Graph.fs:492, 499): first char of each element,
    kept only if alphanumeric, concatenated."""
    first = F.transform(arr, lambda s: F.substring(s, 1, 1))
    kept = F.filter(first, lambda ch: ch.rlike("^[\\p{L}\\p{N}]$"))
    return F.concat_ws("", kept)


def _opt(col: Column, fallback: str) -> Column:
    """F# option fallback: NULL (None) → literal placeholder."""
    return F.coalesce(col, F.lit(fallback))


# --- SourceNode keys (Graph.fs:447-523; node type "SourceNode") ----------


def bibliographic_key(author: Column, title: Column, year: Column) -> Column:
    """Bibliographic: ``pub_{author-before-comma|unknown}_{title-initials|
    notitle}_{year|noyear}`` (Graph.fs:449-455).  Author/title/year are
    options — pass NULL for None."""
    a = F.when(author.isNull(), F.lit("unknown")).otherwise(
        F.split(author, ",").getItem(0)
    )
    t = F.when(title.isNull(), F.lit("notitle")).otherwise(
        take_alphanum_first_chars(title)
    )
    y = _opt(year.cast("string"), "noyear")
    return friendly_key("SourceNode", F.concat_ws("_", F.lit("pub"), a, t, y))


def grey_literature_key(last: Column, first: Column, title: Column) -> Column:
    """GreyLiterature: ``grey_{lastname}_{firstname-initials}_{title-
    initials}`` — initials UNfiltered (Graph.fs:456-460)."""
    value = F.concat_ws(
        "_", F.lit("grey"), last, initials_raw(first), initials_raw(title)
    )
    return friendly_key("SourceNode", value)


def dark_data_key(last: Column, first: Column, details: Column) -> Column:
    """DarkData: ``darkdata_{safe last}_{safe first}_{details-initials,
    first 40}`` (Graph.fs:461)."""
    first_chars = F.transform(F.split(details, " "), lambda w: F.substring(w, 1, 1))
    kept = F.filter(first_chars, lambda ch: ch.rlike("^[\\p{L}\\p{N}]$"))
    det = F.concat_ws("", F.slice(kept, 1, 40))
    value = F.concat_ws(
        "_", F.lit("darkdata"), safe_string(last), safe_string(first), det
    )
    return friendly_key("SourceNode", value)


def database_key(abbreviation: Column) -> Column:
    """Database: ``database_{safe abbrev}`` (Graph.fs:462)."""
    return friendly_key(
        "SourceNode", F.concat_ws("_", F.lit("database"), safe_string(abbreviation))
    )


def database_entry_key(abbreviation: Column, entry_id: Column) -> Column:
    """DatabaseEntry: ``database_{safe abbrev}_entry_{safe id}``
    (Graph.fs:463)."""
    value = F.concat_ws(
        "_",
        F.lit("database"),
        safe_string(abbreviation),
        F.lit("entry"),
        safe_string(entry_id),
    )
    return friendly_key("SourceNode", value)


def book_key(
    first_author_last: Column,
    additional_lastnames: Column,
    title: Column,
    copyright_year: Column,
) -> Column:
    """PublishedSource.Book: ``book_{lastname}_{additional-author-initials}
    _{title-initials}_{year}`` (Graph.fs:466-472).  Empty additional-author
    list yields an empty segment (double underscore), as in the reference."""
    value = F.concat_ws(
        "_",
        F.lit("book"),
        first_author_last,
        initials_of_array(additional_lastnames),
        take_alphanum_first_chars(title),
        copyright_year.cast("string"),
    )
    return friendly_key("SourceNode", value)


def book_chapter_key(
    first_author_last: Column,
    additional_lastnames: Column,
    title: Column,
    first_page: Column,
) -> Column:
    """PublishedSource.BookChapter: ``book-chapter_{lastname}_{additional-
    initials}_{title-initials}_{first page}`` (Graph.fs:473-479)."""
    value = F.concat_ws(
        "_",
        F.lit("book-chapter"),
        first_author_last,
        initials_of_array(additional_lastnames),
        take_alphanum_first_chars(title),
        first_page.cast("string"),
    )
    return friendly_key("SourceNode", value)


def published_dataset_key(
    contributor_lastnames: Column,
    head_initials: Column,
    year_published: Column,
    title: Column,
) -> Column:
    """PublishedSource.IndividualDataset: ``published-dataset_{head-lastname
    |unk}_{head-initials|unk}_{tail-initials|single}_{year|unk}_{title-
    initials}`` (Graph.fs:480-487).  ``contributor_lastnames`` is an
    array<string>; ``head_initials`` the first contributor's initials string
    (NULL when no contributors)."""
    n = F.size(contributor_lastnames)
    head = F.when(n == 0, F.lit("unk")).otherwise(
        F.element_at(contributor_lastnames, 1)
    )
    inits = F.when(n == 0, F.lit("unk")).otherwise(_opt(head_initials, ""))
    tail = F.when(
        n > 1,
        initials_of_array(F.slice(contributor_lastnames, 2, F.greatest(n - 1, F.lit(0)))),
    ).otherwise(F.lit("single"))
    value = F.concat_ws(
        "_",
        F.lit("published-dataset"),
        head,
        inits,
        tail,
        _opt(year_published.cast("string"), "unk"),
        take_alphanum_first_chars(title),
    )
    return friendly_key("SourceNode", value)


def dissertation_key(
    last: Column, initials: Column, completion_year: Column, title: Column
) -> Column:
    """PublishedSource.Dissertation: ``dissertation_{lastname}_{initials}
    _{year}_{title-initials}`` (Graph.fs:488-494)."""
    value = F.concat_ws(
        "_",
        F.lit("dissertation"),
        last,
        initials,
        completion_year.cast("string"),
        take_alphanum_first_chars(title),
    )
    return friendly_key("SourceNode", value)


def grey_literature_source_key(
    fmt: Column,
    contributor_lastnames: Column,
    head_initials: Column,
    posted_year: Column,
    title: Column,
) -> Column:
    """GreyLiteratureSource: ``greylit_{safe lower format}_{head-lastname|
    unk}_{head-initials|unk}_{tail-initials|single}_{year|unk}_{title-
    initials}`` (Graph.fs:508-515)."""
    n = F.size(contributor_lastnames)
    head = F.when(n == 0, F.lit("unk")).otherwise(
        F.element_at(contributor_lastnames, 1)
    )
    inits = F.when(n == 0, F.lit("unk")).otherwise(_opt(head_initials, ""))
    tail = F.when(
        n > 1,
        initials_of_array(F.slice(contributor_lastnames, 2, F.greatest(n - 1, F.lit(0)))),
    ).otherwise(F.lit("single"))
    value = F.concat_ws(
        "_",
        F.lit("greylit"),
        safe_string(F.lower(fmt)),
        head,
        inits,
        tail,
        _opt(posted_year.cast("string"), "unk"),
        take_alphanum_first_chars(title),
    )
    return friendly_key("SourceNode", value)


def dark_data_source_key(
    investigator_last: Column,
    investigator_initials: Column,
    additional_lastnames: Column,
    compilation_year: Column,
    details: Column,
) -> Column:
    """DarkDataSource: ``darkdata_{lastname}_{initials}_{additional-
    initials}_{year|unk}_{details-initials}`` (Graph.fs:516-523)."""
    value = F.concat_ws(
        "_",
        F.lit("darkdata"),
        investigator_last,
        investigator_initials,
        initials_of_array(additional_lastnames),
        _opt(compilation_year.cast("string"), "unk"),
        take_alphanum_first_chars(details),
    )
    return friendly_key("SourceNode", value)


# --- BioticProxyNode keys (Graph.fs:379-391) -----------------------------


def adna_key(sequence: Column) -> Column:
    """BioticProxyNode.AncientDNA: ``adna_{safe}`` (Graph.fs:381)."""
    return friendly_key(
        "BioticProxyNode", F.concat_ws("_", F.lit("aDNA"), safe_string(sequence))
    )


def direct_key(taxon: Column) -> Column:
    """BioticProxyNode.ContemporaneousWholeOrganism: ``direct_{safe}``
    (Graph.fs:382)."""
    return friendly_key(
        "BioticProxyNode", F.concat_ws("_", F.lit("direct"), safe_string(taxon))
    )


def megafossil_key(part: Column, fossil: Column) -> Column:
    """Morphotype.Megafossil: ``morphotype_megafossil_{safe fossil}_{safe
    part}`` (Graph.fs:385)."""
    value = F.concat_ws(
        "_", F.lit("morphotype"), F.lit("megafossil"), safe_string(fossil), safe_string(part)
    )
    return friendly_key("BioticProxyNode", value)


def macrofossil_key(part: Column, fossil: Column) -> Column:
    """Morphotype.Macrofossil: ``morphotype_macrofossil_{safe fossil}_{safe
    part}`` (Graph.fs:386)."""
    value = F.concat_ws(
        "_", F.lit("morphotype"), F.lit("macrofossil"), safe_string(fossil), safe_string(part)
    )
    return friendly_key("BioticProxyNode", value)


_MICROFOSSIL_GROUPS = ("Diatom", "Ostracod", "PlantMacrofossil", "Pollen")


def microfossil_key(group: Column, name: Column) -> Column:
    """Morphotype.Microfossil: ``morphotype_{group}_{safe name}`` for the
    four named groups, ``morphotype_customgroup_{safe group}_{safe name}``
    otherwise (Graph.fs:387-391)."""
    std = F.concat_ws(
        "_", F.lit("morphotype"), F.lower(group), safe_string(name)
    )
    custom = F.concat_ws(
        "_", F.lit("morphotype"), F.lit("customgroup"), safe_string(group), safe_string(name)
    )
    value = F.when(group.isin(*_MICROFOSSIL_GROUPS), std).otherwise(custom)
    return friendly_key("BioticProxyNode", value)


# --- BioticProxyCategoryNode keys (Graph.fs:393-407) ---------------------


def adna_category_key(group: Column) -> Column:
    """Category.AncientDNA: ``adna_{safe group}`` (Graph.fs:395)."""
    return friendly_key(
        "BioticProxyCategoryNode", F.concat_ws("_", F.lit("aDNA"), safe_string(group))
    )


def contemporary_category_key(group: Column) -> Column:
    """Category.Contemporary: ``contemporary_{safe group}`` (Graph.fs:396)."""
    return friendly_key(
        "BioticProxyCategoryNode",
        F.concat_ws("_", F.lit("contemporary"), safe_string(group)),
    )


def fossil_category_key(group: Column) -> Column:
    """Category.Fossil / OtherProxy — both ``fossil_{safe}``
    (Graph.fs:397-398)."""
    return friendly_key(
        "BioticProxyCategoryNode",
        F.concat_ws("_", F.lit("fossil"), safe_string(group)),
    )


def microfossil_category_key(group: Column) -> Column:
    """Category.Microfossil: ``fossilmicro_{group}`` for the named groups,
    ``fossilmicro_other_{safe}`` otherwise (Graph.fs:399-405)."""
    value = F.when(
        group.isin(*_MICROFOSSIL_GROUPS),
        F.concat_ws("_", F.lit("fossilmicro"), F.lower(group)),
    ).otherwise(
        F.concat_ws("_", F.lit("fossilmicro"), F.lit("other"), safe_string(group))
    )
    return friendly_key("BioticProxyCategoryNode", value)


# --- Taxonomy extras (Graph.fs:409-425) ----------------------------------


def subspecies_key(rank: Column, g: Column, s: Column, ss: Column, auth: Column) -> Column:
    """Subspecies/Variety: ``{rank}_{safe g}_{safe s}_{safe ss}_{auth}`` —
    the 4th component is HtmlEncoded but NOT stripped (Graph.fs:424-425)."""
    value = F.concat_ws(
        "_",
        F.lower(rank),
        safe_string(g),
        safe_string(s),
        safe_string(ss),
        html_encode(auth),
    )
    return friendly_key("TaxonNode", value)


def names_index_key(name: Column) -> Column:
    """TaxonomicNamesIndexNode: ``nomenclature-index_{safe name}``
    (Graph.fs:426-427)."""
    return friendly_key(
        "TaxonomicNamesIndexNode",
        F.concat_ws("_", F.lit("nomenclature-index"), safe_string(name)),
    )


# --- InferenceMethodNode keys (Graph.fs:428-437) -------------------------


def inference_implicit_key() -> Column:
    """InferenceMethodNode.Implicit (Graph.fs:430)."""
    return friendly_key("InferenceMethodNode", F.lit("implicit"))


def inference_atlas_lookup_key(reference: Column) -> Column:
    """IdentificationKeyOrAtlasWithLookup: ``atlas_lookup_{safe initials}``
    (Graph.fs:433)."""
    value = F.concat_ws(
        "_", F.lit("atlas"), F.lit("lookup"),
        safe_string(take_alphanum_first_chars(reference)),
    )
    return friendly_key("InferenceMethodNode", value)


def inference_expert_key(last: Column, initials: Column) -> Column:
    """ImplicitByExpert: ``expert_{safe last}_{safe initials}``
    (Graph.fs:434)."""
    value = F.concat_ws(
        "_", F.lit("expert"), safe_string(last), safe_string(initials)
    )
    return friendly_key("InferenceMethodNode", value)


def inference_nomenclature_key(name: Column) -> Column:
    """TaxonomicNomenclature: ``nomenclature_{safe initials}``
    (Graph.fs:435)."""
    value = F.concat_ws(
        "_", F.lit("nomenclature"), safe_string(take_alphanum_first_chars(name))
    )
    return friendly_key("InferenceMethodNode", value)


def inference_terminology_key(term: Column) -> Column:
    """MorphotypeTerminology: ``morphotypeterminology_{safe initials}``
    (Graph.fs:436)."""
    value = F.concat_ws(
        "_",
        F.lit("morphotypeterminology"),
        safe_string(take_alphanum_first_chars(term)),
    )
    return friendly_key("InferenceMethodNode", value)


def inference_reference_collection_key(collection: Column, location: Column) -> Column:
    """ReferenceCollection: ``referencecollection_{safe initials}_{safe
    initials}`` (Graph.fs:437)."""
    value = F.concat_ws(
        "_",
        F.lit("referencecollection"),
        safe_string(take_alphanum_first_chars(collection)),
        safe_string(take_alphanum_first_chars(location)),
    )
    return friendly_key("InferenceMethodNode", value)


# --- remaining friendly-keyed node types ---------------------------------


def vernacular_key(language: Column, label: Column) -> Column:
    """VernacularTaxonLabelNode: ``{safe lang}_{safe label}``
    (Graph.fs:441)."""
    return friendly_key(
        "VernacularTaxonLabelNode",
        F.concat_ws("_", safe_string(language), safe_string(label)),
    )


def out_of_scope_key(name: Column, authority: Column) -> Column:
    """OutOfScopeNode: ``{safe name}_by_{safe authority}`` under node type
    QualitativeLabelOutOfScopeNode (Graph.fs:531)."""
    return friendly_key(
        "QualitativeLabelOutOfScopeNode",
        F.concat_ws("_", safe_string(name), F.lit("by"), safe_string(authority)),
    )


def outcome_custom_key(name: Column) -> Column:
    """OtherBiodiversityDimension: ``custom_{safe}`` (Graph.fs:543)."""
    return friendly_key(
        "BiodiversityDimensionNode",
        F.concat_ws("_", F.lit("custom"), safe_string(name)),
    )


#: GUID-keyed node types → their NodeType() string (Graph.fs:217-247;
#: makeUniqueKey GUID arms at Graph.fs:438-440, 444, 529-532).
GUID_KEYED_TYPES = (
    "ProxiedTaxonNode",
    "ContextNode",
    "IndividualTimelineNode",
    "IndividualDateNode",
    "DateCalibrationInstanceNode",
    "DigitisedDatasetNode",
)
