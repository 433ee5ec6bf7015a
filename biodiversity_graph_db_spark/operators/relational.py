"""Scans, filters, predicates, sorts, limits, set ops (SURVEY §2.2, §2.6, §2.7).

Each query mirrors a reference operator (citations into /root/reference) but
is expressed on the driver's star schema so the DuckDB oracle can verify it.
All filters/projections are plain Column expressions → Catalyst pushes them
into the parquet scan (verified via .explain: PushedFilters / ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biodiversity_graph_db_spark.registry import query
from biodiversity_graph_db_spark.tables import table


@query(
    "F1_point_lookup",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer WHERE c_custkey = 419
    """,
)
def f1_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-equality point read (Graph.fs:54-61 getAtom; Storage.fs:107-112
    loadAtom).  The reference scans an in-memory list O(N); here the key
    predicate is pushed to the parquet footer (file/row-group skipping)."""
    return (
        table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") == 419)
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@query(
    "S4_batch_key_lookup",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer WHERE c_custkey IN (1, 7, 42, 419, 1001, 1499)
    """,
)
def s4_batch_key_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch read by key list (Storage.fs:114-122 loadAtoms;
    Storage.fs:233-237 atomsByKey).  IN-list predicate, pushdown-friendly."""
    return (
        table(spark, sf_dir, "customer")
        .where(F.col("c_custkey").isin(1, 7, 42, 419, 1001, 1499))
        .select("c_custkey", "c_name")
    )


@query(
    "F3_typed_predicate_scan",
    oracle="""
    SELECT p_partkey, p_name, p_type, p_retailprice
    FROM part
    WHERE p_type LIKE '%BRASS%' AND p_size BETWEEN 10 AND 20
    """,
)
def f3_typed_predicate_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-guarded predicate search (Graph.fs:556-585 tryFindTaxon etc.):
    project to a subtype and test a condition on its payload."""
    return (
        table(spark, sf_dir, "part")
        .where(F.col("p_type").like("%BRASS%") & F.col("p_size").between(10, 20))
        .select("p_partkey", "p_name", "p_type", "p_retailprice")
    )


@query(
    "F6_derived_column_match",
    oracle="""
    SELECT p_partkey,
           lower(replace(p_name, ' ', '_')) AS derived_key
    FROM part
    WHERE lower(replace(p_name, ' ', '_')) LIKE 'alm%'
    """,
)
def f6_derived_column_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Match on a column derived from payload (Storage.fs:368-388
    tryFindTaxonByName computes a latin-name string, then compares)."""
    part = table(spark, sf_dir, "part")
    derived = F.lower(F.regexp_replace(F.col("p_name"), " ", "_"))
    return (
        part.select("p_partkey", derived.alias("derived_key"))
        .where(F.col("derived_key").like("alm%"))
    )


@query(
    "F8_substring_search",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE contains(lower(c_name), '00042') AND c_mktsegment <> 'MACHINERY'
    """,
)
def f8_substring_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UI search: substring over display names + hide-excluded toggle
    (Library.fs:77, 165, 262)."""
    return (
        table(spark, sf_dir, "customer")
        .where(
            F.lower(F.col("c_name")).contains("00042")
            & (F.col("c_mktsegment") != "MACHINERY")
        )
        .select("c_custkey", "c_name")
    )


@query(
    "F10_conditional_route",
    oracle="""
    SELECT event_id,
           CASE WHEN value <= 50.0 THEN 'in_scope_' || CAST(CAST(floor(value) AS BIGINT) AS VARCHAR)
                ELSE 'out_of_scope' END AS routed_key
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def f10_conditional_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scope routing (Scenarios.fs:37-40; Library.fs:931-942): a value in
    range maps to a keyed node, out-of-range to a sentinel label."""
    ev = table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    routed = F.when(
        F.col("value") <= 50.0,
        F.concat(F.lit("in_scope_"), F.floor("value").cast("bigint").cast("string")),
    ).otherwise(F.lit("out_of_scope"))
    return ev.select("event_id", routed.alias("routed_key"))


@query(
    "O1_index_sort",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority
    FROM orders
    ORDER BY o_orderstatus, o_orderkey
    LIMIT 100
    """,
)
def o1_index_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index sort by (NodeTypeName, NodeId) + truncation (Storage.fs:165,
    260).  Total order via unique key tiebreak keeps the limit stable.
    Spark executes this as TakeOrderedAndProject — no full sort at scale."""
    return (
        table(spark, sf_dir, "orders")
        .orderBy("o_orderstatus", "o_orderkey")
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
        .limit(100)
    )


@query(
    "O3_display_truncation",
    oracle="""
    SELECT c_custkey,
           substr(c_name, 1, 12) AS short_name,
           CASE WHEN length(c_name) > 12 THEN substr(c_name, 1, 12) || '...'
                ELSE c_name END AS display_name
    FROM customer
    WHERE c_custkey <= 50
    """,
)
def o3_display_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Display truncation: first-50-chars / et-al. style (Graph.fs:354,
    Types.fs:304-309, Library.fs:917)."""
    c = table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 50)
    short = F.substring("c_name", 1, 12)
    return c.select(
        "c_custkey",
        short.alias("short_name"),
        F.when(F.length("c_name") > 12, F.concat(short, F.lit("...")))
        .otherwise(F.col("c_name"))
        .alias("display_name"),
    )


@query(
    "U5_edge_dedup",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate IS NOT NULL AS has_date
    FROM lineitem
    """,
)
def u5_edge_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identical-tuple dedup (Graph.fs:146-149: an edge equal in all of
    source/sink/weight/data is not duplicated) → dropDuplicates."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_shipdate").isNotNull().alias("has_date"),
    ).dropDuplicates()


@query(
    "U6_set_difference",
    oracle="""
    SELECT DISTINCT o_orderpriority FROM orders
    EXCEPT
    SELECT DISTINCT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    """,
)
def u6_set_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (Graph.fs:88 List.except; Library.fs:721
    Set.difference): priorities never seen on finished orders."""
    o = table(spark, sf_dir, "orders")
    all_p = o.select("o_orderpriority").distinct()
    f_p = o.where(F.col("o_orderstatus") == "F").select("o_orderpriority").distinct()
    return all_p.exceptAll(f_p)


_AUTHOR_ROWS = [
    (1, "Smith, J.A.; Jones, B.; Brown, C.D.; Taylor, E.; White, F.;"
        " Green, G.; Black, H."),
    (2, "Doe, J."),
    (3, "Martin, Q.R.; Stone, S."),
    (4, "de Vries, A.B.; O-Neil, T."),
]
_AUTHOR_VALUES = ", ".join(
    "({}, '{}')".format(i, s.replace("'", "''")) for i, s in _AUTHOR_ROWS
)


@query(
    "X7_author_display",
    oracle=f"""
    WITH src(author_id, authors) AS (VALUES {_AUTHOR_VALUES}),
    parsed AS (
      SELECT author_id,
             list_transform(string_split(authors, ';'), a -> trim(a))
               AS alist
      FROM src
    )
    SELECT author_id,
           len(alist) AS n_authors,
           regexp_extract(alist[1], '^([^,]+)', 1) AS lead_surname,
           CASE WHEN len(alist) > 5
                THEN array_to_string(list_slice(alist, 1, 5), '; ')
                     || ' et al.'
                ELSE array_to_string(alist, '; ')
           END AS display
    FROM parsed
    ORDER BY author_id
    """,
)
def x7_author_display(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Author parsing + truncated display (X7, Types.fs:265-309 + O3
    first-5-authors 'et al.', Types.fs:304-309; X20 split-and-trim,
    Library.fs:651): regex surname extraction, array slice, et-al.
    rendering — all JVM Column expressions."""
    src = spark.createDataFrame(
        _AUTHOR_ROWS, "author_id int, authors string"
    )
    alist = F.transform(F.split(F.col("authors"), ";"), lambda a: F.trim(a))
    parsed = src.select("author_id", alist.alias("alist"))
    return parsed.select(
        "author_id",
        F.size("alist").alias("n_authors"),
        F.regexp_extract(F.element_at("alist", 1), "^([^,]+)", 1).alias(
            "lead_surname"
        ),
        F.when(
            F.size("alist") > 5,
            F.concat(
                F.concat_ws("; ", F.slice("alist", 1, 5)), F.lit(" et al.")
            ),
        )
        .otherwise(F.concat_ws("; ", F.col("alist")))
        .alias("display"),
    ).orderBy("author_id")


from biodiversity_graph_db_spark.functions import validation as V


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


_STAGING_ROWS = [
    (1, "Smith, J. A.", "https://doi.org/10.1126/science.aar3646",
     "12 - 14", 0.5, 64.2, -21.1, "40°26'46\"N,79°01'00\"W",
     "POLYGON((30 10, 40 40, 20 40, 10 20, 30 10))", 12.5, "cal yr bp", 3),
    (2, "NoComma", "not-a-doi", "12-14", 1.5, 95.0, 200.0, "40N79W",
     "POLYGON((30 10, 40 40))", -3.0, "fortnights", 13),
    (3, "de Vries, A.B.", "10.5194/cp-2020-1", "9 - 3", 0.0, -89.9, 180.0,
     "5:3'9\"S,100:59'59.5\"E", "POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))",
     0.0, "AD", 12),
]
_STAGING_SCHEMA = (
    "row_id int, author string, doi string, pages string, pct double,"
    " lat double, lon double, dms string, wkt string, depth double,"
    " header string, month_n int"
)
_STAGING_VALUES = ",\n      ".join(
    "({})".format(
        ", ".join(
            _sql_str(v) if isinstance(v, str) else repr(v) for v in row
        )
    )
    for row in _STAGING_ROWS
)
_AU = _sql_str(V.AUTHOR_REGEX)
_MONTH_CASES = " ".join(
    f"WHEN {i + 1} THEN '{m}'" for i, m in enumerate(V.MONTHS)
)


@query(
    "X13_validation_suite",
    oracle=f"""
    WITH staging(row_id, author, doi, pages, pct, lat, lon, dms, wkt,
                 depth, header, month_n) AS (VALUES
      {_STAGING_VALUES}
    ),
    wkt_parsed AS (
      SELECT row_id,
             regexp_extract(wkt, {_sql_str(V.WKT_POLYGON_REGEX)}, 1) AS inner,
             list_transform(
               string_split(
                 regexp_extract(wkt, {_sql_str(V.WKT_POLYGON_REGEX)}, 1), ','),
               p -> struct_pack(
                 lon := TRY_CAST(string_split(trim(p), ' ')[1] AS DOUBLE),
                 lat := TRY_CAST(string_split(trim(p), ' ')[2] AS DOUBLE)))
               AS pts
      FROM staging
    )
    SELECT s.row_id,
           regexp_matches(author, {_AU}) AS author_ok,
           CASE WHEN regexp_matches(author, {_AU}) THEN
             regexp_extract(author, {_AU}, 1) || ', ' ||
             array_to_string(list_filter(
               [regexp_extract(author, {_AU}, 3),
                regexp_extract(author, {_AU}, 4),
                regexp_extract(author, {_AU}, 5)], x -> x <> ''), '. ')
           END AS author_display,
           NULLIF(regexp_extract(doi, {_sql_str(V.DOI_REGEX)}, 1), '')
             AS doi_parsed,
           CASE WHEN regexp_matches(pages, {_sql_str(V.INT_RANGE_REGEX)})
                THEN LEAST(
                  CAST(regexp_extract(pages,
                       {_sql_str(V.INT_RANGE_REGEX)}, 1) AS INTEGER),
                  CAST(regexp_extract(pages,
                       {_sql_str(V.INT_RANGE_REGEX)}, 2) AS INTEGER))
           END AS range_lo,
           CASE WHEN regexp_matches(pages, {_sql_str(V.INT_RANGE_REGEX)})
                THEN GREATEST(
                  CAST(regexp_extract(pages,
                       {_sql_str(V.INT_RANGE_REGEX)}, 1) AS INTEGER),
                  CAST(regexp_extract(pages,
                       {_sql_str(V.INT_RANGE_REGEX)}, 2) AS INTEGER))
           END AS range_hi,
           CASE WHEN pct BETWEEN 0.0 AND 1.0
                THEN CAST(pct AS DOUBLE) * 100.0 END AS pct100,
           lat BETWEEN -89.9 AND 89.9 AS lat_ok,
           lon BETWEEN -180.0 AND 180.0 AS lon_ok,
           regexp_matches(dms, {_sql_str(V.DMS_REGEX)}) AS dms_ok,
           (w.inner <> '' AND len(w.pts) >= 3
            AND len(list_filter(w.pts, p ->
                  p.lon IS NOT NULL AND p.lat IS NOT NULL
                  AND p.lat BETWEEN -89.9 AND 89.9
                  AND p.lon BETWEEN -180.0 AND 180.0)) = len(w.pts))
             AS wkt_ok,
           depth >= 0.0 AS depth_ok,
           CASE lower(header)
             WHEN 'depth' THEN 'Depths'
             WHEN 'year before present' THEN 'BP'
             WHEN 'bp' THEN 'BP'
             WHEN 'calendar year before present' THEN 'CalYrBP'
             WHEN 'cal yr bp' THEN 'CalYrBP'
             WHEN 'ad' THEN 'AD'
             WHEN 'bc' THEN 'BC'
           END AS idx_type,
           CASE month_n {_MONTH_CASES} END AS month_name
    FROM staging s JOIN wkt_parsed w USING (row_id)
    ORDER BY s.row_id
    """,
)
def x13_validation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The §1.4 smart-constructor suite (X7-X17) applied to a staging
    frame: author/DOI/range/percent/coordinate/WKT/depth/header/month
    validation and parsing, all as scan-side Column expressions (the
    quarantine ingest path uses exactly these rules)."""
    src = spark.createDataFrame(_STAGING_ROWS, _STAGING_SCHEMA)
    return src.select(
        "row_id",
        V.author_valid(F.col("author")).alias("author_ok"),
        V.author_display(F.col("author")).alias("author_display"),
        F.nullif(V.doi_extract(F.col("doi")), F.lit("")).alias("doi_parsed"),
        V.int_range_parse(F.col("pages"))["lo"].alias("range_lo"),
        V.int_range_parse(F.col("pages"))["hi"].alias("range_hi"),
        V.percent_create(F.col("pct")).alias("pct100"),
        V.lat_valid(F.col("lat")).alias("lat_ok"),
        V.lon_valid(F.col("lon")).alias("lon_ok"),
        V.dms_valid(F.col("dms")).alias("dms_ok"),
        V.wkt_polygon_valid(F.col("wkt")).alias("wkt_ok"),
        V.depth_valid(F.col("depth")).alias("depth_ok"),
        V.index_column_type(F.col("header")).alias("idx_type"),
        V.month_name(F.col("month_n")).alias("month_name"),
    ).orderBy("row_id")


@query(
    "F12_json_extract",
    oracle="""
    SELECT event_type,
           CAST(props->>'k' AS BIGINT) // 10 AS k_decade,
           COUNT(*) AS n,
           CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(COUNT(DISTINCT CAST(props->>'k' AS BIGINT)) AS BIGINT)
             AS n_distinct_k
    FROM events
    WHERE json_valid(props)
    GROUP BY event_type, k_decade
    ORDER BY event_type, k_decade
    """,
)
def f12_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload extraction — the typed read into the
    events table's JSON ``props`` column (the reference's typed DU
    payloads arrive as JSON when sourced externally; Sources.fs
    round-trips node data through JSON the same way).  Extracts the
    ``k`` property, buckets it, and aggregates per (event_type,
    bucket).

    Scale shape: ``get_json_object`` is a JVM-side codegen'd expression
    (no Python, no UDF) evaluated once per row in the scan-side
    projection, which a localCheckpoint pins to a single evaluation
    (see the inline note); the rollup is an ordinary two-phase
    aggregate.  At 100 TB prefer `from_json` with a pinned schema when
    MANY properties are read (one parse, many fields); for one
    property the path expression is cheaper."""
    from biodiversity_graph_db_spark.operators._util import cut, spread

    # The parse is the dominant cost (~10 µs/row Jackson eval), and it
    # must run EXACTLY ONCE per row: expression substitution re-spells
    # the filter, the projection and the grouping key in terms of the
    # raw get_json_object call (2-3 evaluations/row — measured 4.3 s at
    # gen_sf1), so the parsed projection is cut behind an eager
    # localCheckpoint after the small-source spread guard.  Measured
    # gen_sf1: 4.3 s → ~1.4 s.
    ev = spread(table(spark, sf_dir, "events"))
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    parsed = cut(ev.select("event_type", k.alias("k")))
    return (
        parsed.where(F.col("k").isNotNull())
        .groupBy(
            "event_type", F.expr("k DIV 10").alias("k_decade")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.countDistinct("k").cast("long").alias("n_distinct_k"),
        )
        .orderBy("event_type", "k_decade")
    )


@query(
    "O5_keyset_page",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_cents
    FROM orders
    WHERE o_orderkey > 5000
    ORDER BY o_orderkey
    LIMIT 25
    """,
)
def o5_keyset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (cursor) pagination — page N+1 of an ordered listing
    fetched as ``key > last_seen ORDER BY key LIMIT page`` (the
    reference UI pages its node lists, Storage.fs:165 truncation; this
    is the scalable spelling).  OFFSET pagination re-scans and re-sorts
    every preceding page — O(pages²) total at 100 TB; the keyset
    predicate instead lands in the parquet scan as a pushed
    ``GreaterThan`` (plan-tested), min/max row-group stats skip
    everything before the cursor, and the limit plans as
    TakeOrderedAndProject (per-partition heaps, no global sort)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.where(F.col("o_orderkey") > 5000)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.floor(F.col("o_totalprice") * 100)
            .cast("bigint")
            .alias("price_cents"),
        )
        .orderBy("o_orderkey")
        .limit(25)
    )


@query(
    "F13_embedded_id_audit",
    oracle="""
    WITH x AS (
      SELECT c_custkey,
             CAST(regexp_extract(c_name, 'Customer#([0-9]+)', 1) AS BIGINT)
               AS name_id
      FROM customer
    )
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN name_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unparseable,
           CAST(SUM(CASE WHEN name_id IS NOT NULL
                          AND name_id <> c_custkey THEN 1 ELSE 0 END)
                AS BIGINT) AS n_mismatched,
           CAST(SUM(CASE WHEN name_id = c_custkey THEN 1 ELSE 0 END)
                AS BIGINT) AS n_consistent
    FROM x
    """,
)
def f13_embedded_id_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedded-identifier consistency audit — the denormalization check
    every warehouse runs where a display string EMBEDS a key
    (``Customer#000000042`` vs ``c_custkey``): regexp-extract the
    embedded id, compare it to the key column, and report unparseable /
    mismatched / consistent counts in one pass.  The F-family twin of
    J4's FK-violation check, one column inward: the reference's typed
    keys make this impossible by construction (makeUniqueKey derives
    the string FROM the key); arriving denormalized data has to be
    audited instead.

    Pure codegen'd regexp + comparison in the scan pipeline, one
    combinable rollup; output is one row at any scale."""
    c = table(spark, sf_dir, "customer")
    name_id = F.regexp_extract(F.col("c_name"), r"Customer#([0-9]+)", 1)
    name_id = F.when(name_id == "", None).otherwise(name_id).cast("bigint")
    x = c.select("c_custkey", name_id.alias("name_id"))
    return x.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("name_id").isNull().cast("long"))
        .cast("long")
        .alias("n_unparseable"),
        F.sum(
            (
                F.col("name_id").isNotNull()
                & (F.col("name_id") != F.col("c_custkey"))
            ).cast("long")
        )
        .cast("long")
        .alias("n_mismatched"),
        F.sum((F.col("name_id") == F.col("c_custkey")).cast("long"))
        .cast("long")
        .alias("n_consistent"),
    )


@query(
    "O6_stratified_sample",
    oracle="""
    WITH c AS (
      SELECT c_mktsegment, c_acctbal,
             CAST(('0x' || substr(md5('cust_' || c_custkey), 1, 8))
                  AS BIGINT) % 100 < 20 AS sampled
      FROM customer
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sampled,
           CAST(SUM(CASE WHEN sampled THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS share_ppm,
           CAST(SUM(CASE WHEN sampled
                    THEN CAST(FLOOR(CAST(c_acctbal AS DOUBLE) * 100)
                              AS BIGINT) ELSE 0 END) AS BIGINT)
             AS sampled_acctbal_cents
    FROM c
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def o6_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic STRATIFIED sampling — the training-data-pipeline
    primitive `df.sample` can't give you: a fixed 20% of every stratum,
    selected by a content hash so the SAME rows are chosen on every
    engine, every run, every cluster size (T11's md5-bucket idiom on
    the row key; the reference has no sampling surface at all —
    BiodiversityCoder.Core enumerates full node sets).

    Spark's own ``sampleBy`` draws per-row Bernoulli from a seeded RNG:
    resampling under retries/speculation isn't reproducible across
    partitionings, and the fraction is only approximate.  The hash
    spelling is exact-in-expectation, partitioning-independent, and
    pushes into the scan as a column predicate.  Output proves the
    selected ROW SET matches (acctbal checksum over the sample), not
    just the counts.  Scale: one map-side-combinable rollup on a
    |segments| key space; zero shuffles beyond it."""
    c = table(spark, sf_dir, "customer")
    hex8 = F.substring(
        F.md5(F.concat(F.lit("cust_"), F.col("c_custkey").cast("string"))),
        1,
        8,
    )
    sampled = F.conv(hex8, 16, 10).cast("long") % 100 < 20
    return (
        c.select(
            "c_mktsegment",
            sampled.cast("long").alias("s"),
            F.when(
                sampled, F.floor(F.col("c_acctbal") * 100).cast("long")
            )
            .otherwise(F.lit(0))
            .alias("bal_cents"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("s").cast("long").alias("n_sampled"),
            F.sum("bal_cents").cast("long").alias("sampled_acctbal_cents"),
        )
        .select(
            "c_mktsegment",
            "n_total",
            "n_sampled",
            F.expr("CAST((n_sampled * 1000000) DIV n_total AS BIGINT)").alias(
                "share_ppm"
            ),
            "sampled_acctbal_cents",
        )
        .orderBy("c_mktsegment")
    )


@query(
    "O7_hash_sample_topk",
    oracle="""
    SELECT o_orderkey, priority_hash
    FROM (
      SELECT o_orderkey,
             md5('ord_' || o_orderkey) AS priority_hash
      FROM orders
    )
    ORDER BY priority_hash, o_orderkey
    LIMIT 100
    """,
)
def o7_hash_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic GLOBAL k-row sample — the 100 smallest md5
    priorities over the key space: the reproducible eval-subset /
    spot-check selection a pipeline pins in a config (O6 stratifies by
    fraction; this fixes exact k).  Hash-rank sampling is the
    distributed form of a uniform draw without replacement: the md5
    order is uniform over keys, identical on every engine, run and
    partitioning, and adding rows only perturbs the selection where new
    hashes land inside the current top-k (bounded churn — the property
    reservoir sampling has and ORDER BY rand() does not).

    Scale shape: TakeOrderedAndProject (plan-tested) — each partition
    keeps a k-heap, the driver merges |partitions|·k candidates; never
    a global sort, never a shuffle of the corpus."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.md5(
                F.concat(F.lit("ord_"), F.col("o_orderkey").cast("string"))
            ).alias("priority_hash"),
        )
        .orderBy("priority_hash", "o_orderkey")
        .limit(100)
    )


@query(
    "O8_weighted_sample",
    oracle="""
    WITH k AS (
      SELECT doc_id, n_chars,
             CAST(('0x' || substr(md5('w8_' || doc_id), 1, 8)) AS BIGINT)
               % 1000000 AS u_int
      FROM documents WHERE n_chars > 0
    ),
    p AS (
      SELECT doc_id, n_chars,
             CAST(FLOOR(ln((u_int + 1) / 1000000.0) * 1000000) AS BIGINT)
               AS lnu_micro
      FROM k
    )
    SELECT doc_id, n_chars, lnu_micro
    FROM p
    ORDER BY CAST(lnu_micro AS DOUBLE) / n_chars DESC, doc_id
    LIMIT 100
    """,
)
def o8_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic WEIGHTED k-row sample without replacement —
    Efraimidis–Spirakis A-ES keys (priority u^(1/w), here weight =
    document length) ranked by the equivalent monotone form
    ln(u)/w: the mixture-sampling primitive behind "sample documents
    proportional to token count" that O6 (per-stratum fraction) and O7
    (uniform top-k) cannot express.  u is the T11/O7 md5 bucket, so
    the draw is identical on every engine, run and partitioning, and
    appends only perturb the selection where new keys land inside the
    current top-k (bounded churn).

    Exactness: ln(u) is floor-quantized to micro-nats on an exact
    1e-6-grid input (the house qln idiom); the rank key is ONE IEEE
    double division of that integer by the integer weight — identical
    in both engines — with doc_id tie-break, and only integer columns
    are emitted.  Scale shape: key computed in the scan,
    TakeOrderedAndProject k-heap per partition (plan-tested no
    range-partition global sort), driver merges |partitions|·k."""
    d = table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    hex8 = F.substring(
        F.md5(F.concat(F.lit("w8_"), F.col("doc_id").cast("string"))), 1, 8
    )
    u_int = F.conv(hex8, 16, 10).cast("long") % 1000000
    lnu = F.floor(
        F.log((u_int + 1) / F.lit(1000000.0)) * 1e6
    ).cast("long")
    return (
        d.select("doc_id", "n_chars", lnu.alias("lnu_micro"))
        .orderBy(
            (F.col("lnu_micro").cast("double") / F.col("n_chars")).desc(),
            "doc_id",
        )
        .limit(100)
        .select("doc_id", "n_chars", "lnu_micro")
    )
