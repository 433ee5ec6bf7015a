"""Key-synthesis oracle queries (X3/X18 at scale, Graph.fs:373-543).

The reference mints every node's primary key from its payload with
``makeUniqueKey`` — a pure string pipeline (HtmlEncode → charset strip →
initials → lowercase).  ``functions/keys.py`` re-expresses each case as a
Column expression so bulk ingest mints keys JVM-side inside whole-stage
codegen.  These two queries run the full family over driver tables and are
hash-checked against a DuckDB replica of the same pipeline, proving the
string semantics byte-for-byte on real data (the per-case goldens live in
tests/test_keys.py).

At 100 TB key synthesis is a per-row map with no shuffle: it pipelines into
whatever scan or join feeds it, so the only scale concern is staying out of
Python — which these expressions do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biodiversity_graph_db_spark.functions import keys as K
from biodiversity_graph_db_spark.registry import query
from biodiversity_graph_db_spark.tables import table


# --- DuckDB SQL emitters mirroring functions/keys.py ---------------------


def _enc(x: str) -> str:
    """System.Net.WebUtility.HtmlEncode (&, <, >, ", ') — & first."""
    e = f"replace({x}, '&', '&amp;')"
    e = f"replace({e}, '<', '&lt;')"
    e = f"replace({e}, '>', '&gt;')"
    e = f"replace({e}, '\"', '&quot;')"
    e = f"replace({e}, '''', '&#39;')"
    return e


def _safe(x: str) -> str:
    """safeString: HtmlEncode then strip [^aA-zZ_ \\-+0-9] (Graph.fs:367)."""
    return f"regexp_replace({_enc(x)}, '[^aA-zZ_ \\-+0-9]', '', 'g')"


def _inits(x: str) -> str:
    """takeAlphaNumFirstChars over the words of a string (Graph.fs:369)."""
    return (
        "array_to_string(list_filter(list_transform(str_split("
        + x
        + ", ' '), w -> substr(w, 1, 1)), c -> regexp_matches(c, "
        "'^[\\p{L}\\p{N}]$')), '')"
    )


def _inits_raw(x: str) -> str:
    """Unfiltered first-char initials (GreyLiterature, Graph.fs:457-460)."""
    return (
        "array_to_string(list_transform(str_split("
        + x
        + ", ' '), w -> substr(w, 1, 1)), '')"
    )


def _inits_arr(lst: str) -> str:
    """takeAlphaNumFirstChars over a list of strings (Graph.fs:492)."""
    return (
        "array_to_string(list_filter(list_transform("
        + lst
        + ", s -> substr(s, 1, 1)), c -> regexp_matches(c, "
        "'^[\\p{L}\\p{N}]$')), '')"
    )


def _friendly(node_type: str, value: str) -> str:
    return f"'{node_type}_' || lower({value})"


_V_BIB = (
    "concat_ws('_', 'pub', coalesce(str_split(author, ',')[1], 'unknown'), "
    "CASE WHEN bib_title IS NULL THEN 'notitle' ELSE "
    + _inits("bib_title")
    + " END, coalesce(CAST(bib_year AS VARCHAR), 'noyear'))"
)
_V_BOOK = (
    "concat_ws('_', 'book', w1, "
    + _inits_arr("words[2:3]")
    + ", "
    + _inits("text")
    + ", CAST(1900 + doc_id % 100 AS VARCHAR))"
)
_V_CHAPTER = (
    "concat_ws('_', 'book-chapter', w2, "
    + _inits_arr("words[3:3]")
    + ", "
    + _inits("text")
    + ", CAST(doc_id AS VARCHAR))"
)
_V_DATASET = (
    "concat_ws('_', 'published-dataset', "
    "CASE WHEN len(contributors) = 0 THEN 'unk' ELSE contributors[1] END, "
    "CASE WHEN len(contributors) = 0 THEN 'unk' "
    "ELSE coalesce(upper(substr(w5, 1, 2)), '') END, "
    "CASE WHEN len(contributors) > 1 THEN "
    + _inits_arr("contributors[2:len(contributors)]")
    + " ELSE 'single' END, coalesce(CAST(posted_year AS VARCHAR), 'unk'), "
    + _inits("text")
    + ")"
)
_V_DISS = (
    "concat_ws('_', 'dissertation', w1, upper(substr(w2, 1, 2)), "
    "CAST(2000 + doc_id % 25 AS VARCHAR), " + _inits("text") + ")"
)
_V_GREY = (
    "concat_ws('_', 'grey', w1, "
    + _inits_raw("concat_ws(' ', w2, w3)")
    + ", "
    + _inits_raw("text")
    + ")"
)
_V_DARK = (
    "concat_ws('_', 'darkdata', " + _safe("w1") + ", " + _safe("w2") + ", "
    "array_to_string(list_filter(list_transform(str_split(text, ' '), "
    "w -> substr(w, 1, 1)), c -> regexp_matches(c, "
    "'^[\\p{L}\\p{N}]$'))[1:40], ''))"
)
_V_DB = "concat_ws('_', 'database', " + _safe("concat_ws('-', source, lang)") + ")"
_V_DBENTRY = (
    "concat_ws('_', 'database', " + _safe("source") + ", 'entry', "
    + _safe("concat_ws('/', lang, CAST(doc_id AS VARCHAR))") + ")"
)

_K1_SQL = f"""
WITH src AS (
  SELECT doc_id, text, lang, source,
         str_split(text, ' ') AS words
  FROM documents WHERE doc_id < 50
), d AS (
  SELECT doc_id, text, lang, source, words,
         words[1] AS w1, words[2] AS w2, words[3] AS w3, words[5] AS w5,
         CASE WHEN doc_id % 7 = 0 THEN NULL
              ELSE concat_ws(', ', words[1], words[2]) END AS author,
         CASE WHEN doc_id % 11 = 0 THEN NULL ELSE text END AS bib_title,
         CASE WHEN doc_id % 5 = 0 THEN NULL
              ELSE 1950 + doc_id % 70 END AS bib_year,
         words[1:(doc_id % 4)] AS contributors,
         CASE WHEN doc_id % 3 = 0 THEN NULL
              ELSE 1990 + doc_id % 30 END AS posted_year
  FROM src
)
SELECT doc_id,
  {_friendly("sourcenode", _V_BIB)} AS key_bib,
  {_friendly("sourcenode", _V_BOOK)} AS key_book,
  {_friendly("sourcenode", _V_CHAPTER)} AS key_chapter,
  {_friendly("sourcenode", _V_DATASET)} AS key_dataset,
  {_friendly("sourcenode", _V_DISS)} AS key_diss,
  {_friendly("sourcenode", _V_GREY)} AS key_grey,
  {_friendly("sourcenode", _V_DARK)} AS key_darkdata,
  {_friendly("sourcenode", _V_DB)} AS key_db,
  {_friendly("sourcenode", _V_DBENTRY)} AS key_dbentry
FROM d
"""


@query("K1_source_keys", oracle=_K1_SQL)
def k1_source_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mint every SourceNode key variant (Graph.fs:447-523) over the
    documents table: bibliographic (with option fallbacks), book,
    book-chapter, published-dataset (contributor-count branches),
    dissertation, grey literature (unfiltered initials), dark data,
    database and database-entry keys — all as JVM column expressions."""
    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    words = F.split(F.col("text"), " ")
    w1, w2, w3 = F.get(words, 0), F.get(words, 1), F.get(words, 2)
    w5 = F.get(words, 4)
    doc_id = F.col("doc_id")
    author = F.when(doc_id % 7 == 0, F.lit(None).cast("string")).otherwise(
        F.concat_ws(", ", w1, w2)
    )
    bib_title = F.when(doc_id % 11 == 0, F.lit(None).cast("string")).otherwise(
        F.col("text")
    )
    bib_year = F.when(doc_id % 5 == 0, F.lit(None).cast("long")).otherwise(
        F.lit(1950) + doc_id % 70
    )
    contributors = F.slice(words, 1, (doc_id % 4).cast("int"))
    posted_year = F.when(doc_id % 3 == 0, F.lit(None).cast("long")).otherwise(
        F.lit(1990) + doc_id % 30
    )
    return docs.select(
        "doc_id",
        K.bibliographic_key(author, bib_title, bib_year).alias("key_bib"),
        K.book_key(
            w1, F.slice(words, 2, 2), F.col("text"), F.lit(1900) + doc_id % 100
        ).alias("key_book"),
        K.book_chapter_key(
            w2, F.slice(words, 3, 1), F.col("text"), doc_id
        ).alias("key_chapter"),
        K.published_dataset_key(
            contributors, F.upper(F.substring(w5, 1, 2)), posted_year, F.col("text")
        ).alias("key_dataset"),
        K.dissertation_key(
            w1, F.upper(F.substring(w2, 1, 2)), F.lit(2000) + doc_id % 25,
            F.col("text"),
        ).alias("key_diss"),
        K.grey_literature_key(w1, F.concat_ws(" ", w2, w3), F.col("text")).alias(
            "key_grey"
        ),
        K.dark_data_key(w1, w2, F.col("text")).alias("key_darkdata"),
        K.database_key(F.concat_ws("-", F.col("source"), F.col("lang"))).alias(
            "key_db"
        ),
        K.database_entry_key(
            F.col("source"),
            F.concat_ws("/", F.col("lang"), doc_id.cast("string")),
        ).alias("key_dbentry"),
    )


_GROUPS_SQL = (
    "CASE p_partkey % 5 WHEN 0 THEN 'Diatom' WHEN 1 THEN 'Ostracod' "
    "WHEN 2 THEN 'PlantMacrofossil' WHEN 3 THEN 'Pollen' "
    "ELSE 'Chironomid' END"
)

_STD_GROUPS = "('Diatom', 'Ostracod', 'PlantMacrofossil', 'Pollen')"
_V_MICRO = (
    f"CASE WHEN grp IN {_STD_GROUPS} "
    "THEN concat_ws('_', 'morphotype', lower(grp), " + _safe("p_name") + ") "
    "ELSE concat_ws('_', 'morphotype', 'customgroup', " + _safe("grp")
    + ", " + _safe("p_name") + ") END"
)
_V_CAT = (
    f"CASE WHEN grp IN {_STD_GROUPS} "
    "THEN concat_ws('_', 'fossilmicro', lower(grp)) "
    "ELSE concat_ws('_', 'fossilmicro', 'other', " + _safe("grp") + ") END"
)
_V_ADNA = "concat_ws('_', 'aDNA', " + _safe("p_type") + ")"
_V_DIRECT = "concat_ws('_', 'direct', " + _safe("p_name") + ")"
_V_MEGA = (
    "concat_ws('_', 'morphotype', 'megafossil', " + _safe("p_type") + ", "
    + _safe("w1") + ")"
)
_V_MACRO = (
    "concat_ws('_', 'morphotype', 'macrofossil', " + _safe("p_name") + ", "
    + _safe("w2") + ")"
)
_V_NAMESIDX = "concat_ws('_', 'nomenclature-index', " + _safe("p_name") + ")"
_V_ATLAS_LOOKUP = (
    "concat_ws('_', 'atlas', 'lookup', "
    + _safe(_inits("concat_ws(' ', p_name, p_brand)")) + ")"
)
_V_EXPERT = (
    "concat_ws('_', 'expert', " + _safe("w1") + ", "
    + _safe("upper(substr(w2, 1, 2))") + ")"
)
_V_NOMEN = "concat_ws('_', 'nomenclature', " + _safe(_inits("p_name")) + ")"
_V_TERM = (
    "concat_ws('_', 'morphotypeterminology', "
    + _safe(_inits("concat_ws(' ', p_type, p_name)")) + ")"
)
_V_REFCOLL = (
    "concat_ws('_', 'referencecollection', " + _safe(_inits("p_name")) + ", "
    + _safe(_inits("p_type")) + ")"
)
_V_VERN = "concat_ws('_', " + _safe("p_brand") + ", " + _safe("p_name") + ")"
_V_OOS = "concat_ws('_', " + _safe("w1") + ", 'by', " + _safe("p_brand") + ")"
_V_OUTCOME = "concat_ws('_', 'custom', " + _safe("p_type") + ")"
_V_SUBSP = (
    "concat_ws('_', CASE WHEN p_partkey % 2 = 0 THEN 'subspecies' "
    "ELSE 'variety' END, " + _safe("w1") + ", " + _safe("w2") + ", "
    + _safe("p_type") + ", " + _enc("p_brand") + ")"
)

_K2_SQL = f"""
WITH src AS (
  SELECT p_partkey, p_name, p_brand, p_type,
         str_split(p_name, ' ') AS words,
         {_GROUPS_SQL} AS grp
  FROM part WHERE p_partkey < 60
), d AS (
  SELECT p_partkey, p_name, p_brand, p_type, grp,
         words[1] AS w1, words[2] AS w2
  FROM src
)
SELECT p_partkey,
  {_friendly("bioticproxynode", _V_MICRO)} AS key_micro,
  {_friendly("bioticproxycategorynode", _V_CAT)} AS key_cat,
  {_friendly("bioticproxynode", _V_ADNA)} AS key_adna,
  {_friendly("bioticproxynode", _V_DIRECT)} AS key_direct,
  {_friendly("bioticproxynode", _V_MEGA)} AS key_mega,
  {_friendly("bioticproxynode", _V_MACRO)} AS key_macro,
  {_friendly("taxonomicnamesindexnode", _V_NAMESIDX)} AS key_namesidx,
  {_friendly("inferencemethodnode", _V_ATLAS_LOOKUP)} AS key_atlas_lookup,
  {_friendly("inferencemethodnode", _V_EXPERT)} AS key_expert,
  {_friendly("inferencemethodnode", _V_NOMEN)} AS key_nomen,
  {_friendly("inferencemethodnode", _V_TERM)} AS key_term,
  {_friendly("inferencemethodnode", _V_REFCOLL)} AS key_refcoll,
  {_friendly("vernaculartaxonlabelnode", _V_VERN)} AS key_vern,
  {_friendly("qualitativelabeloutofscopenode", _V_OOS)} AS key_oos,
  {_friendly("biodiversitydimensionnode", _V_OUTCOME)} AS key_outcome,
  {_friendly("taxonnode", _V_SUBSP)} AS key_subsp
FROM d
"""


@query("K2_population_keys", oracle=_K2_SQL)
def k2_population_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mint the population-side key family (Graph.fs:379-441): biotic-proxy
    morphotypes (incl. custom microfossil groups), proxy categories,
    taxonomic-names-index, every inference-method variant, vernacular
    labels, out-of-scope labels, custom outcome dimensions and
    subspecies/variety taxa — over the part table."""
    parts = table(spark, sf_dir, "part").where(F.col("p_partkey") < 60)
    words = F.split(F.col("p_name"), " ")
    w1, w2 = F.get(words, 0), F.get(words, 1)
    pk = F.col("p_partkey")
    grp = (
        F.when(pk % 5 == 0, F.lit("Diatom"))
        .when(pk % 5 == 1, F.lit("Ostracod"))
        .when(pk % 5 == 2, F.lit("PlantMacrofossil"))
        .when(pk % 5 == 3, F.lit("Pollen"))
        .otherwise(F.lit("Chironomid"))
    )
    rank = F.when(pk % 2 == 0, F.lit("Subspecies")).otherwise(F.lit("Variety"))
    return parts.select(
        "p_partkey",
        K.microfossil_key(grp, F.col("p_name")).alias("key_micro"),
        K.microfossil_category_key(grp).alias("key_cat"),
        K.adna_key(F.col("p_type")).alias("key_adna"),
        K.direct_key(F.col("p_name")).alias("key_direct"),
        K.megafossil_key(w1, F.col("p_type")).alias("key_mega"),
        K.macrofossil_key(w2, F.col("p_name")).alias("key_macro"),
        K.names_index_key(F.col("p_name")).alias("key_namesidx"),
        K.inference_atlas_lookup_key(
            F.concat_ws(" ", F.col("p_name"), F.col("p_brand"))
        ).alias("key_atlas_lookup"),
        K.inference_expert_key(w1, F.upper(F.substring(w2, 1, 2))).alias(
            "key_expert"
        ),
        K.inference_nomenclature_key(F.col("p_name")).alias("key_nomen"),
        K.inference_terminology_key(
            F.concat_ws(" ", F.col("p_type"), F.col("p_name"))
        ).alias("key_term"),
        K.inference_reference_collection_key(
            F.col("p_name"), F.col("p_type")
        ).alias("key_refcoll"),
        K.vernacular_key(F.col("p_brand"), F.col("p_name")).alias("key_vern"),
        K.out_of_scope_key(w1, F.col("p_brand")).alias("key_oos"),
        K.outcome_custom_key(F.col("p_type")).alias("key_outcome"),
        K.subspecies_key(
            rank, w1, w2, F.col("p_type"), F.col("p_brand")
        ).alias("key_subsp"),
    )
