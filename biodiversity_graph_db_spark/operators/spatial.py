"""Spatial predicates over sampling locations (SURVEY §2 — the r3
verdict's "What's missing #3", closed).

The reference stores a ``SamplingLocation`` discriminated union on every
ContextNode (Population.fs:154-171): point coordinates in decimal
degrees (``Site``), DMS strings (``SiteDMS``, Types.fs:416-418), or WKT
polygons (``Area``, Types.fs:453-481).  It validates and round-trips
them but ships no spatial *query*; "which timelines sit inside this
bounding box / polygon" is the first-class question a biodiversity user
asks of the graph.  This module supplies that layer Spark-first:

- **Promotion at ingest** (the ED1/ED2 house pattern): every location
  variant is normalized once, at write time, to typed columns — a point
  (``pt_lat``/``pt_lon``, DMS parsed to decimal degrees by pure regexp
  column expressions) and a bounding box (``lat_min``/``lat_max``/
  ``lon_min``/``lon_max``; for polygons, computed from the parsed WKT
  vertex array).  Stored context parquet then answers bbox queries with
  ordinary pushed-down range predicates — no geo library, no UDF, and
  the filter reaches the parquet scan (tests/test_plans.py asserts
  ``PushedFilters`` on the stored form).
- **Exact point-in-polygon** as an unrolled ray-cast: the query polygon
  is driver-side constant, so each edge's crossing test is emitted as a
  plain codegen'd comparison and the crossing parity is a chain of
  boolean XORs — whole-stage codegen end to end, the same expression
  shape at any row count.  (For polygon-valued *columns* the same test
  is expressible with ``F.aggregate`` over the vertex array; the
  constant-polygon unroll is the fast path because Spark's higher-order
  array lambdas are CodegenFallback.)

At 100 TB the bbox columns are min/max-indexed by parquet row-group
statistics, so a selective box prunes row groups before decode; the
ray-cast runs only on bbox survivors.  Production with heavy polygon
workloads would layer Sedona/H3 bucketing on the same promoted columns.

Correctness: sampling locations are minted deterministically from
``customer`` keys (all three DU variants), Spark *parses the minted
strings* (DMS regexp, WKT split) while the DuckDB oracle recomputes the
coordinates straight from the mint integers — a value match proves the
parse/promote path round-trips exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from biodiversity_graph_db_spark.functions.validation import (
    wkt_polygon_points,
)
from biodiversity_graph_db_spark.operators._util import (
    davg,
    dquant,
    dsum,
    sql_davg,
    sql_dquant,
    sql_dsum,
)
from biodiversity_graph_db_spark.registry import query
from biodiversity_graph_db_spark.tables import table

# Strict mint-format DMS parse (degrees°minutes'seconds"H). The broader
# entry-format regex (validation.DMS_REGEX, Types.fs:416-418) accepts
# ':' separators and fractional seconds; promotion normalizes to this
# canonical form first, so the parse groups are fixed.
DMS_PARSE_REGEX = (
    "^([0-9]+)°([0-9]+)'([0-9]+)\"([NS]),"
    "([0-9]+)°([0-9]+)'([0-9]+)\"([EW])$"
)

#: Shared mint ↔ oracle CTE: sampling locations derived from customer
#: keys.  kind cycles Site / SiteDMS / Area; coordinates are exact
#: integer arithmetic rendered to doubles, so the Spark parse path and
#: this direct recomputation agree bit-for-bit.
CTX_ORACLE_CTE = """
  mint AS (SELECT c_custkey AS k FROM customer),
  ctx AS (
    SELECT 'contextnode_' || k AS key,
           CASE k % 3 WHEN 0 THEN 'Site' WHEN 1 THEN 'SiteDMS'
                      ELSE 'Area' END AS kind,
           CASE k % 3
             WHEN 0 THEN ((k * 37) % 1200) / 10.0 - 60.0
             WHEN 1 THEN (CAST((k * 7) % 89 AS DOUBLE)
                          + ((k * 11) % 60) / 60.0
                          + ((k * 13) % 60) / 3600.0)
                         * (CASE WHEN k % 2 = 0 THEN 1.0 ELSE -1.0 END)
             ELSE NULL END AS pt_lat,
           CASE k % 3
             WHEN 0 THEN ((k * 91) % 3600) / 10.0 - 180.0
             WHEN 1 THEN (CAST((k * 17) % 179 AS DOUBLE)
                          + ((k * 19) % 60) / 60.0
                          + ((k * 23) % 60) / 3600.0)
                         * (CASE WHEN k % 5 < 3 THEN 1.0 ELSE -1.0 END)
             ELSE NULL END AS pt_lon,
           CAST((k * 5) % 80 - 40 AS DOUBLE) AS a_lat0,
           CAST((k * 3) % 300 - 150 AS DOUBLE) AS a_lon0
    FROM mint
  ),
  ctx_promoted AS (
    SELECT key, kind, pt_lat, pt_lon,
           CASE WHEN kind = 'Area' THEN a_lat0 ELSE pt_lat END AS lat_min,
           CASE WHEN kind = 'Area' THEN a_lat0 + 10.0
                ELSE pt_lat END AS lat_max,
           CASE WHEN kind = 'Area' THEN a_lon0 ELSE pt_lon END AS lon_min,
           CASE WHEN kind = 'Area' THEN a_lon0 + 20.0
                ELSE pt_lon END AS lon_max
    FROM ctx
  )
"""


def normalize_dms(dms: Column) -> Column:
    """Entry-format DMS → the canonical form ``promote_context_cols``
    parses, as pure column expressions.  The reference's entry regex
    (Types.fs:416-418, our validation.DMS_REGEX) accepts ``:`` or ``°``
    degree separators, ``:``/``'``/``′`` minute separators, optional
    fractional seconds, and ``"``/``″`` second marks; this rebuilds
    ``D°M'S"H,D°M'S"H`` (missing seconds → 0, fraction preserved) and
    returns NULL for strings the entry regex rejects.  Runs ONCE at the
    ingest boundary — stored context tables carry the canonical string,
    so the hot promote path never pays the 8-group regex."""
    from biodiversity_graph_db_spark.functions.validation import DMS_REGEX

    cleaned = F.translate(dms, "′″", "'\"")

    def axis(d: int, m: int, s: int, h: int) -> Column:
        sec = F.regexp_extract(cleaned, DMS_REGEX, s)
        return F.concat(
            F.regexp_extract(cleaned, DMS_REGEX, d),
            F.lit("°"),
            F.regexp_extract(cleaned, DMS_REGEX, m),
            F.lit("'"),
            F.when(sec == "", F.lit("0")).otherwise(sec),
            F.lit("\""),
            F.regexp_extract(cleaned, DMS_REGEX, h),
        )

    return F.when(
        cleaned.rlike(DMS_REGEX),
        F.concat(axis(1, 2, 3, 4), F.lit(","), axis(5, 6, 7, 8)),
    )


# Static SQL spellings of the mint/promote projections (r13, guide
# §7.3 planning cost).  The Column-algebra builders issued ~1,700 Py4J
# round-trips per mint+promote construction — measured ~0.5 s of DRIVER
# time per call, paid by each of the 15 GEO headline queries on every
# bench run.  These strings are built ONCE at import; each query
# construction is then a single selectExpr (one JVM parse), landing the
# identical Catalyst tree — verified by canonical plan diff against the
# Column spelling and by the full GEO parity suite.
_K = "c_custkey"
_MINT_KIND = (
    f"CASE WHEN ({_K} % 3) = 0 THEN 'Site' "
    f"WHEN ({_K} % 3) = 1 THEN 'SiteDMS' ELSE 'Area' END"
)
# fractional literals carry the D suffix: a bare 10.0 parses as
# DECIMAL(3,1) in SQL (decimal-28,6 arithmetic, a DIFFERENT result
# type), while the Column spelling's F.lit(10.0) is a DOUBLE
_MINT_SITE_LAT = (
    f"CASE WHEN ({_K} % 3) = 0"
    f" THEN ((({_K} * 37) % 1200) / 10.0D) - 60.0D END"
)
_MINT_SITE_LON = (
    f"CASE WHEN ({_K} % 3) = 0"
    f" THEN ((({_K} * 91) % 3600) / 10.0D) - 180.0D END"
)
# format string '%d°%d'%d"%s,…' — the embedded single quotes double up
_MINT_DMS = (
    f"CASE WHEN ({_K} % 3) = 1 THEN format_string("
    "'%d°%d''%d\"%s,%d°%d''%d\"%s', "
    f"({_K} * 7) % 89, ({_K} * 11) % 60, ({_K} * 13) % 60, "
    f"CASE WHEN ({_K} % 2) = 0 THEN 'N' ELSE 'S' END, "
    f"({_K} * 17) % 179, ({_K} * 19) % 60, ({_K} * 23) % 60, "
    f"CASE WHEN ({_K} % 5) < 3 THEN 'E' ELSE 'W' END) END"
)
_LAT0 = f"(({_K} * 5) % 80) - 40"
_LON0 = f"(({_K} * 3) % 300) - 150"
_MINT_WKT = (
    f"CASE WHEN ({_K} % 3) = 2 THEN format_string("
    "'POLYGON((%d %d,%d %d,%d %d,%d %d,%d %d))', "
    f"{_LON0}, {_LAT0}, ({_LON0}) + 20, {_LAT0}, "
    f"({_LON0}) + 20, ({_LAT0}) + 10, {_LON0}, ({_LAT0}) + 10, "
    f"{_LON0}, {_LAT0}) END"
)
_MINT_EXPRS = (
    f"concat('contextnode_', CAST({_K} AS STRING)) AS key",
    f"{_MINT_KIND} AS kind",
    f"{_MINT_SITE_LAT} AS site_lat",
    f"{_MINT_SITE_LON} AS site_lon",
    f"{_MINT_DMS} AS dms",
    f"{_MINT_WKT} AS wkt",
    f"to_json(named_struct('kind', {_MINT_KIND}, 'lat', {_MINT_SITE_LAT},"
    f" 'lon', {_MINT_SITE_LON}, 'dms', {_MINT_DMS}, 'wkt', {_MINT_WKT}))"
    " AS payload",
)


def mint_context_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ContextNodes carrying each SamplingLocation variant
    in its native stored form — DD doubles for Site, a DMS *string* for
    SiteDMS, a WKT *string* for Area (Population.fs:154-171) — plus the
    canonical JSON payload, mirroring how the reference serializes the
    DU.  Promotion (below) must recover coordinates from the strings.

    Spelled as one static selectExpr (see `_MINT_EXPRS`): identical
    plan to the Column-algebra form, ~1,700 fewer Py4J round-trips per
    construction."""
    return table(spark, sf_dir, "customer").selectExpr(*_MINT_EXPRS)


def _dms_component(dms: Column, d: int, m: int, s: int, hemi: int) -> Column:
    """One DMS axis → signed decimal degrees, pure split + arithmetic
    column expressions.  Splitting on the four separator characters
    tokenizes ``40°26'46"N,79°58'56"W`` into (deg, min, sec, hemi) ×2;
    indices are 1-based positions into that token array.  A compact
    expression tree matters here: downstream predicates (the ray-cast
    references each coordinate per polygon edge) inline the parse after
    projection collapse, and a regexp-per-group version blew Janino's
    64 KB method limit — this form stays inside whole-stage codegen.
    (DMS_PARSE_REGEX still guards validity via ``rlike`` at mint.)"""
    p = F.split(dms, "[°'\",]")
    deg = F.element_at(p, d).cast("double")
    minute = F.element_at(p, m).cast("double")
    sec = F.element_at(p, s).cast("double")
    sign = F.when(
        F.element_at(p, hemi).isin("N", "E"), F.lit(1.0)
    ).otherwise(F.lit(-1.0))
    return (deg + minute / F.lit(60.0) + sec / F.lit(3600.0)) * sign


def _dms_component_sql(d: int, m: int, s: int, hemi: int) -> str:
    """`_dms_component` as a static SQL fragment (see `_MINT_EXPRS` for
    why strings) — same split + arithmetic tree, one JVM parse."""
    p = "split(dms, '[°''\",]')"
    deg = f"CAST(element_at({p}, {d}) AS DOUBLE)"
    minute = f"CAST(element_at({p}, {m}) AS DOUBLE)"
    sec = f"CAST(element_at({p}, {s}) AS DOUBLE)"
    sign = (
        f"CASE WHEN element_at({p}, {hemi}) IN ('N', 'E')"
        " THEN 1.0D ELSE -1.0D END"
    )
    return f"(({deg} + ({minute} / 60.0D)) + ({sec} / 3600.0D)) * ({sign})"


# token positions: [latd, latm, lats, latH, lond, lonm, lons, lonH]
# (the ',' separator is consumed by the split char class)
_PT_LAT = (
    "CASE WHEN (kind = 'Site') THEN site_lat WHEN (kind = 'SiteDMS')"
    f" THEN {_dms_component_sql(1, 2, 3, 4)} END"
)
_PT_LON = (
    "CASE WHEN (kind = 'Site') THEN site_lon WHEN (kind = 'SiteDMS')"
    f" THEN {_dms_component_sql(5, 6, 7, 8)} END"
)
# wkt_polygon_points(wkt) as SQL: regex group 1 of the POLYGON((…))
# body, split on ',', each pair try_cast to (lon, lat) doubles
_WKT_INNER = "regexp_extract(wkt, '^POLYGON[ ]?\\\\(\\\\((.*)\\\\)\\\\)', 1)"
_WKT_PTS = (
    f"CASE WHEN ({_WKT_INNER} != '') THEN transform(split({_WKT_INNER}, ','),"
    " p -> named_struct("
    "'lon', try_cast(element_at(split(trim(p), ' '), 1) AS DOUBLE), "
    "'lat', try_cast(element_at(split(trim(p), ' '), 2) AS DOUBLE))) END"
)


def _bbox_sql(agg: str, axis: str, pt: str) -> str:
    return (
        f"CASE WHEN (kind = 'Area')"
        f" THEN {agg}(transform({_WKT_PTS}, p -> p.{axis}))"
        f" ELSE {pt} END"
    )


_PROMOTE_EXPRS = (
    "key",
    "kind",
    "payload",
    "wkt",  # kept for exact polygon tests downstream (GEO3)
    f"{_PT_LAT} AS pt_lat",
    f"{_PT_LON} AS pt_lon",
    f"{_bbox_sql('array_min', 'lat', _PT_LAT)} AS lat_min",
    f"{_bbox_sql('array_max', 'lat', _PT_LAT)} AS lat_max",
    f"{_bbox_sql('array_min', 'lon', _PT_LON)} AS lon_min",
    f"{_bbox_sql('array_max', 'lon', _PT_LON)} AS lon_max",
)


def promote_context_cols(nodes: DataFrame) -> DataFrame:
    """Normalize every SamplingLocation variant to typed point + bbox
    columns, once at write time: Site passes its DD doubles through,
    SiteDMS is parsed by regexp (no UDF), Area's bbox is the min/max of
    the parsed WKT vertex array.  Stored parquet then carries plain
    double columns with row-group min/max statistics — the bbox
    predicate pushes down to the scan like any numeric range filter.

    Spelled as one static selectExpr (see `_MINT_EXPRS` for why):
    identical plan to the Column-algebra form, one JVM parse per
    construction."""
    return nodes.selectExpr(*_PROMOTE_EXPRS)


# --- stored context table (promote-at-write, partition-pruned) ------------

#: Widest longitude span any stored location may have (the minted Areas
#: are 20° wide).  Bbox reads widen their partition predicate by this,
#: so an object is always found via the band its lon_min falls in —
#: the standard bounded-object-size assumption of spatial partitioning.
MAX_LON_SPAN_DEG = 20.0


def write_context_table(promoted: DataFrame, path: str) -> None:
    """Persist promoted contexts PARTITIONED BY the longitude grid band
    (floor(lon_min / GRID_DEG)) — the stored form of the spatial layer.
    A bbox query then reads only the bands its viewport (widened by
    MAX_LON_SPAN_DEG) overlaps: directory-level partition pruning before
    any file is opened, with parquet row-group min/max stats pruning
    inside each band.  The same two-level layout as the persisted IVF
    index (cent_id partitions), applied to space."""
    promoted.withColumn(
        "lon_band", F.floor(F.col("lon_min") / GRID_DEG).cast("long")
    ).write.mode("overwrite").partitionBy("lon_band").parquet(path)


def read_contexts_bbox(
    spark: SparkSession,
    path: str,
    lat_lo: float,
    lat_hi: float,
    lon_lo: float,
    lon_hi: float,
) -> DataFrame:
    """Bbox intersection over a stored context table: the lon_band range
    predicate is a PARTITION filter (unmatched bands never read — plan-
    tested), the four bbox predicates push to the parquet scan."""
    import math

    band_lo = math.floor((lon_lo - MAX_LON_SPAN_DEG) / GRID_DEG)
    band_hi = math.floor(lon_hi / GRID_DEG)
    return (
        spark.read.parquet(path)
        .where(F.col("lon_band").between(band_lo, band_hi))
        .where(
            (F.col("lat_max") >= lat_lo)
            & (F.col("lat_min") <= lat_hi)
            & (F.col("lon_max") >= lon_lo)
            & (F.col("lon_min") <= lon_hi)
        )
    )


# --- GEO1: bounding-box intersection --------------------------------------

#: Query box: mid-latitude band. Intersection (not containment) so Area
#: polygons straddling the edge still answer — the semantics a "show me
#: timelines in this map viewport" UI needs.
BBOX = {"lat_lo": -30.0, "lat_hi": 30.0, "lon_lo": -60.0, "lon_hi": 60.0}


@query(
    "GEO1_bbox_contexts",
    oracle=f"""
    WITH {CTX_ORACLE_CTE}
    SELECT key, kind,
           {sql_dquant('lat_min')} AS lat_min,
           {sql_dquant('lat_max')} AS lat_max,
           {sql_dquant('lon_min')} AS lon_min,
           {sql_dquant('lon_max')} AS lon_max
    FROM ctx_promoted
    WHERE lat_max >= {BBOX["lat_lo"]} AND lat_min <= {BBOX["lat_hi"]}
      AND lon_max >= {BBOX["lon_lo"]} AND lon_min <= {BBOX["lon_hi"]}
    ORDER BY key
    """,
)
def geo1_bbox_contexts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contexts whose sampling location intersects a bounding box — the
    viewport query, over ALL location variants (points and polygons) via
    the promoted bbox columns.  Four double range predicates: pushed to
    the parquet scan on stored context tables (plan-tested), row-group
    pruned by min/max stats at scale."""
    promoted = promote_context_cols(mint_context_nodes(spark, sf_dir))
    return geo1_bbox_stored(promoted)


def geo1_bbox_stored(promoted: DataFrame) -> DataFrame:
    """GEO1's recurring read path over an already-promoted (stored)
    context table — benched separately from the mint (bench.py
    ``geo_split``): at 100 TB the promote runs once at ingest while THIS
    is every viewport query; the four range predicates push to the
    parquet scan and row-group-prune on min/max stats."""
    return (
        promoted.where(
            (F.col("lat_max") >= BBOX["lat_lo"])
            & (F.col("lat_min") <= BBOX["lat_hi"])
            & (F.col("lon_max") >= BBOX["lon_lo"])
            & (F.col("lon_min") <= BBOX["lon_hi"])
        )
        .select(
            "key",
            "kind",
            dquant("lat_min").alias("lat_min"),
            dquant("lat_max").alias("lat_max"),
            dquant("lon_min").alias("lon_min"),
            dquant("lon_max").alias("lon_max"),
        )
        .orderBy("key")
    )


# --- GEO2: exact point-in-polygon -----------------------------------------

#: Query polygon (lon, lat) vertices, counter-clockwise, no horizontal
#: edges (so no crossing test ever divides by zero — the conjunct is not
#: short-circuit-guaranteed in either engine).
QUERY_POLYGON: tuple[tuple[float, float], ...] = (
    (-50.0, -20.0),
    (0.0, 45.0),
    (50.0, -18.0),
    (22.0, -45.0),
    (-20.0, -44.0),
)


def _pip_edges() -> list[tuple[float, float, float, float, float]]:
    """Per-edge constants (y1, y2, x1, dx, dy), precomputed driver-side
    so Spark and the SQL oracle consume IDENTICAL literals."""
    n = len(QUERY_POLYGON)
    out = []
    for i in range(n):
        x1, y1 = QUERY_POLYGON[i]
        x2, y2 = QUERY_POLYGON[(i + 1) % n]
        out.append((y1, y2, x1, x2 - x1, y2 - y1))
    return out


def point_in_query_polygon(lat: Column, lon: Column) -> Column:
    """Ray-cast crossing parity, unrolled: one codegen'd comparison pair
    per edge, XOR-chained.  No UDF, no higher-order function, no join —
    a pure map expression whatever the row count."""
    inside: Column | None = None
    for y1, y2, x1, dx, dy in _pip_edges():
        crosses = ((F.lit(y1) > lat) != (F.lit(y2) > lat)) & (
            lon < F.lit(dx) * (lat - F.lit(y1)) / F.lit(dy) + F.lit(x1)
        )
        inside = crosses if inside is None else (inside != crosses)
    assert inside is not None
    return inside


def _pip_sql(lat: str, lon: str) -> str:
    """The oracle's literal twin of ``point_in_query_polygon`` — same
    edge constants, same operation order, XOR spelled ``<>``."""
    expr = None
    for y1, y2, x1, dx, dy in _pip_edges():
        term = (
            f"(({y1} > {lat}) <> ({y2} > {lat}) AND "
            f"{lon} < {dx} * ({lat} - {y1}) / {dy} + {x1})"
        )
        expr = term if expr is None else f"({expr} <> {term})"
    assert expr is not None
    return expr


def point_in_polygon_col(lat: Column, lon: Column, pts: Column) -> Column:
    """Even-odd ray cast where the polygon is a COLUMN (array of
    lon/lat structs from ``wkt_polygon_points``), via ``F.aggregate``
    over the edge indices — the general form behind GEO3's spatial join
    (the constant-polygon unroll can't apply when every row carries its
    own polygon).  CodegenFallback (higher-order fn), so keep it AFTER
    a cheap bucketing/bbox candidate cut, never on the full corpus.

    Horizontal edges are safe: the crossing parity conjunct
    ``(y1>py) != (y2>py)`` is False there, and Spark's three-valued
    logic gives ``false AND <anything> = false``, so the dy division
    never poisons the fold."""
    n = F.size(pts)

    def crossing(i: Column) -> Column:
        p1 = F.element_at(pts, i + 1)
        p2 = F.element_at(pts, i + 2)
        y1, y2 = p1["lat"], p2["lat"]
        x1, x2 = p1["lon"], p2["lon"]
        return ((y1 > lat) != (y2 > lat)) & (
            lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1
        )

    return F.aggregate(
        F.sequence(F.lit(0), n - 2),
        F.lit(False),
        lambda acc, i: acc != crossing(i),
    )


#: Grid cell size (degrees) for the GEO3 spatial-join bucketing.
GRID_DEG = 10.0


@query(
    "GEO3_points_in_areas",
    oracle=f"""
    WITH {CTX_ORACLE_CTE},
    pts AS (
      SELECT key, pt_lat, pt_lon FROM ctx_promoted
      WHERE kind IN ('Site', 'SiteDMS')
    ),
    areas AS (
      SELECT key AS area_key, lat_min, lat_max, lon_min, lon_max
      FROM ctx_promoted WHERE kind = 'Area'
    )
    SELECT area_key,
           COUNT(*) AS n_points,
           MIN(p.key) AS first_point
    FROM areas a JOIN pts p
      ON  p.pt_lat >= a.lat_min AND p.pt_lat < a.lat_max
      AND p.pt_lon >= a.lon_min AND p.pt_lon < a.lon_max
    GROUP BY area_key
    ORDER BY area_key
    """,
)
def geo3_points_in_areas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial JOIN: for every Area context, the point contexts inside
    its polygon — "which sites fall within each study region".  The
    100 TB shape: both sides are bucketed onto a fixed lon/lat grid
    (points → their cell; polygons → every cell their bbox overlaps, a
    handful of rows each), the join is a plain EQUI-join on the cell id
    (never a cartesian / nested-loop — plan-tested), and the exact
    ray-cast (``point_in_polygon_col``) runs only on within-cell
    candidates.  The same layout stores as bucketed tables for a
    shuffle-free repeat join; production swaps the square grid for H3 /
    Sedona partitioning with no change to the query shape.

    The minted Areas are axis-aligned rectangles, so the DuckDB oracle
    can state exact containment as half-open bbox predicates — which is
    precisely the even-odd ray-cast semantics on a rectangle
    ([lon_min, lon_max) × [lat_min, lat_max), boundary rules included),
    making the general ray-cast path value-verified end-to-end.

    Cardinality note (round-10 decade-3 run, SCALE §36): the SYNTHETIC
    mint derives both sides from customer keys, so points AND
    fixed-size (20°×10°) areas grow linearly with the corpus and the
    contained-pair set is quadratic BY CONSTRUCTION — measured 19.8M
    pairs at gen_sf1, ~2.0B at gen_sf10.  That work is the output
    (every contained pair must be counted), not a join defect.  In a
    real deployment the areas side (study regions) is a bounded
    dimension; if both sides truly grow, the published upgrade is
    density-adaptive grid granularity plus covered-cell
    pre-aggregation (count interior cells from a per-cell rollup,
    exact-check only boundary cells — Sedona-style), which preserves
    these semantics for polygon families with testable cell
    coverage."""
    # materialize the promoted table once (localCheckpoint): both join
    # sides derive from it, and without a cut the mint+parse subtree
    # executes twice — this is also the production shape, where the
    # promoted context table is STORED and both sides scan it
    promoted = promote_context_cols(
        mint_context_nodes(spark, sf_dir)
    ).localCheckpoint()
    return points_in_areas(promoted)


def points_in_areas(promoted: DataFrame) -> DataFrame:
    """The GEO3 join path alone, over an already-promoted context
    table — benched separately on the STORED form (bench.py
    ``geo_split``): in production the mint/DMS-parse runs once at
    ingest, and THIS is the per-query cost."""
    pts = promoted.where(F.col("kind").isin("Site", "SiteDMS")).select(
        "key",
        "pt_lat",
        "pt_lon",
        F.floor(F.col("pt_lon") / GRID_DEG).alias("cx"),
        F.floor(F.col("pt_lat") / GRID_DEG).alias("cy"),
    )
    areas = (
        promoted.where(F.col("kind") == "Area")
        .select(
            F.col("key").alias("area_key"),
            wkt_polygon_points(F.col("wkt")).alias("poly"),
            F.explode(
                F.sequence(
                    F.floor(F.col("lon_min") / GRID_DEG),
                    F.floor(F.col("lon_max") / GRID_DEG),
                )
            ).alias("cx"),
            "lat_min",
            "lat_max",
            "lon_min",
            "lon_max",
        )
        .select(
            "area_key",
            "poly",
            "cx",
            F.explode(
                F.sequence(
                    F.floor(F.col("lat_min") / GRID_DEG),
                    F.floor(F.col("lat_max") / GRID_DEG),
                )
            ).alias("cy"),
            "lat_min",
            "lat_max",
            "lon_min",
            "lon_max",
        )
    )
    # filter-refine: cheap codegen'd bbox predicates discard most
    # within-cell candidates before the interpreted exact ray-cast runs
    # (measured 4.4 s → bbox-survivors only at sf0.1)
    # no dedup needed: a point carries exactly ONE (cx, cy) and an area
    # lists each covered cell once, so the equi-join yields each
    # (key, area_key) pair at most once — a dropDuplicates here would
    # re-shuffle the candidate set for nothing
    cand = pts.join(areas, ["cx", "cy"]).where(
        F.col("pt_lat").between(F.col("lat_min"), F.col("lat_max"))
        & F.col("pt_lon").between(F.col("lon_min"), F.col("lon_max"))
    )
    inside = cand.where(
        point_in_polygon_col(F.col("pt_lat"), F.col("pt_lon"), F.col("poly"))
    )
    return (
        inside.groupBy("area_key")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("key").alias("first_point"),
        )
        .orderBy("area_key")
    )


#: Radius (degrees) for the GEO4 proximity join.
RADIUS_DEG = 5.0


@query(
    "GEO4_radius_sites",
    oracle=f"""
    WITH {CTX_ORACLE_CTE},
    pts AS (
      SELECT key, pt_lat, pt_lon FROM ctx_promoted
      WHERE kind IN ('Site', 'SiteDMS')
    ),
    areas AS (
      SELECT key AS area_key,
             (lat_min + lat_max) / 2.0 AS c_lat,
             (lon_min + lon_max) / 2.0 AS c_lon
      FROM ctx_promoted WHERE kind = 'Area'
    ),
    cand AS (
      SELECT a.area_key, p.key,
             (p.pt_lat - a.c_lat) * (p.pt_lat - a.c_lat)
             + (p.pt_lon - a.c_lon) * (p.pt_lon - a.c_lon) AS d2
      FROM areas a JOIN pts p
        ON (p.pt_lat - a.c_lat) * (p.pt_lat - a.c_lat)
           + (p.pt_lon - a.c_lon) * (p.pt_lon - a.c_lon)
           <= {RADIUS_DEG * RADIUS_DEG}
    ),
    ranked AS (
      SELECT area_key, key, d2,
             ROW_NUMBER() OVER (PARTITION BY area_key
                                ORDER BY d2, key) AS rk
      FROM cand
    )
    SELECT c.area_key,
           COUNT(*) AS n_sites,
           {sql_dquant('MIN(c.d2)')} AS min_d2,
           MIN(r.key) AS nearest_site
    FROM cand c
    JOIN ranked r ON r.area_key = c.area_key AND r.rk = 1
    GROUP BY c.area_key
    ORDER BY c.area_key
    """,
)
def geo4_radius_sites(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity join: point contexts within RADIUS_DEG of each Area
    centroid, with the nearest site per area — "which sites lie near
    each study region", the radius/nearest-neighbour query shape.

    Same grid bucketing as GEO3, with the polygon's cell set expanded by
    the radius (centroid bbox ± R), so the join stays a cell-id
    EQUI-join and each candidate pays one codegen'd squared-distance
    comparison.  Distance is squared-euclidean in DEGREE space —
    deliberately transcendental-free so the DuckDB oracle hash-matches
    bit-for-bit (libm sin/cos differ across engines in the last ulp);
    production at geographic fidelity swaps in haversine or Sedona
    ST_DWithin on the same bucketed layout, changing only the distance
    expression.  Nearest-site selection is a single map-side-combinable
    struct-min (min over (d2, key) tuples), not a window."""
    # one materialization for both join sides (cf. GEO3)
    promoted = promote_context_cols(
        mint_context_nodes(spark, sf_dir)
    ).localCheckpoint()
    pts = promoted.where(F.col("kind").isin("Site", "SiteDMS")).select(
        "key",
        "pt_lat",
        "pt_lon",
        F.floor(F.col("pt_lon") / GRID_DEG).alias("cx"),
        F.floor(F.col("pt_lat") / GRID_DEG).alias("cy"),
    )
    c_lat = (F.col("lat_min") + F.col("lat_max")) / 2.0
    c_lon = (F.col("lon_min") + F.col("lon_max")) / 2.0
    areas = (
        promoted.where(F.col("kind") == "Area")
        .select(
            F.col("key").alias("area_key"),
            c_lat.alias("c_lat"),
            c_lon.alias("c_lon"),
            F.explode(
                F.sequence(
                    F.floor((c_lon - RADIUS_DEG) / GRID_DEG),
                    F.floor((c_lon + RADIUS_DEG) / GRID_DEG),
                )
            ).alias("cx"),
        )
        .select(
            "area_key",
            "c_lat",
            "c_lon",
            "cx",
            F.explode(
                F.sequence(
                    F.floor((F.col("c_lat") - RADIUS_DEG) / GRID_DEG),
                    F.floor((F.col("c_lat") + RADIUS_DEG) / GRID_DEG),
                )
            ).alias("cy"),
        )
    )
    d2 = (F.col("pt_lat") - F.col("c_lat")) * (
        F.col("pt_lat") - F.col("c_lat")
    ) + (F.col("pt_lon") - F.col("c_lon")) * (
        F.col("pt_lon") - F.col("c_lon")
    )
    # unique (key, area_key) pairs by construction (one cell per point,
    # each cell once per area) — see GEO3; no dedup shuffle
    cand = (
        pts.join(areas, ["cx", "cy"])
        .where(d2 <= RADIUS_DEG * RADIUS_DEG)
        .select("area_key", "key", d2.alias("d2"))
    )
    nearest = F.min(F.struct(F.col("d2"), F.col("key")))
    return (
        cand.groupBy("area_key")
        .agg(
            F.count(F.lit(1)).alias("n_sites"),
            dquant(F.min("d2")).alias("min_d2"),
            nearest.getField("key").alias("nearest_site"),
        )
        .orderBy("area_key")
    )


@query(
    "GEO2_polygon_contains",
    oracle=f"""
    WITH {CTX_ORACLE_CTE}
    SELECT key, kind,
           {sql_dquant('pt_lat')} AS lat,
           {sql_dquant('pt_lon')} AS lon
    FROM ctx_promoted
    WHERE kind IN ('Site', 'SiteDMS')
      AND {_pip_sql('pt_lat', 'pt_lon')}
    ORDER BY key
    """,
)
def geo2_polygon_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-location contexts falling inside an arbitrary query polygon
    (exact ray-cast) — "timelines located within this study area".  The
    bbox columns prefilter cheaply (pushed on stored tables); survivors
    pay one unrolled crossing-parity expression.  DMS-entered sites
    answer identically to DD sites because promotion normalized both."""
    promoted = promote_context_cols(mint_context_nodes(spark, sf_dir))
    # lossless bbox prefilter (any point strictly inside the polygon is
    # inside its bbox): simple range predicates that push down / prune
    # row groups on stored tables before the parity expression runs
    xs = [p[0] for p in QUERY_POLYGON]
    ys = [p[1] for p in QUERY_POLYGON]
    pts = promoted.where(F.col("kind").isin("Site", "SiteDMS")).where(
        F.col("pt_lat").between(min(ys), max(ys))
        & F.col("pt_lon").between(min(xs), max(xs))
    )
    # Projection barrier for the fused mint+parse+query plan: the ray-cast
    # references each coordinate once per polygon edge, and Catalyst's
    # predicate pushdown would substitute the full SiteDMS parse tree into
    # every reference — ~24 inlined copies blew Janino's 64 KB method
    # limit (codegen falls back to interpreted eval, the real perf bug).
    # A nondeterministic column blocks that substitution, so pt_lat/pt_lon
    # are computed ONCE in the projection and the filter sees plain
    # attributes — but ONLY while the column is live: it must be
    # referenced by the filter itself (the always-true `_barrier >= 0`
    # conjunct), or ColumnPruning removes it and pushdown resumes.  On
    # stored context tables the promoted columns already ARE plain
    # attributes, so production plans need no barrier and keep full
    # pushdown (tests/test_plans.py).
    pts = pts.withColumn("_barrier", F.monotonically_increasing_id())
    return (
        pts.where(
            point_in_query_polygon(F.col("pt_lat"), F.col("pt_lon"))
            & (F.col("_barrier") >= 0)
        )
        .select(
            "key",
            "kind",
            dquant("pt_lat").alias("lat"),
            dquant("pt_lon").alias("lon"),
        )
        .orderBy("key")
    )


@query(
    "GEO5_density_grid",
    oracle=f"""
    WITH {CTX_ORACLE_CTE}
    SELECT CAST(FLOOR(pt_lon / {GRID_DEG}) AS BIGINT) AS cx,
           CAST(FLOOR(pt_lat / {GRID_DEG}) AS BIGINT) AS cy,
           COUNT(*) AS n_sites,
           {sql_davg('pt_lat')} AS mean_lat,
           {sql_davg('pt_lon')} AS mean_lon,
           'contextnode_' || MIN(CAST(regexp_extract(key, '([0-9]+)$', 1)
                                      AS BIGINT)) AS sample_site
    FROM ctx_promoted
    WHERE kind IN ('Site', 'SiteDMS')
    GROUP BY cx, cy
    ORDER BY cx, cy
    """,
)
def geo5_density_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Site-density heatmap: point contexts rolled up onto the fixed
    lon/lat grid (the same ``GRID_DEG`` cells GEO3/GEO4 join on) with
    per-cell count, deterministic mean coordinates, and a sample site —
    the "where is the evidence concentrated" overview map a biodiversity
    user reads first (reference: context locations, Population.fs:154-171;
    no such rollup exists there — every map view rescans the node list).

    Scale shape: a single map-side-combinable groupBy on the derived
    cell id — partial aggregation happens before the one shuffle over
    ≤(360/G)·(180/G) groups, so at 100 TB this is one pass over the
    stored context table with a bounded-cardinality reduce.  On the
    partitioned store (``write_context_table``) the lon_band partition
    column IS ``floor(lon/G)``, so per-band cells never cross files."""
    promoted = promote_context_cols(mint_context_nodes(spark, sf_dir))
    pts = promoted.where(F.col("kind").isin("Site", "SiteDMS"))
    return (
        pts.groupBy(
            F.floor(F.col("pt_lon") / GRID_DEG).cast("long").alias("cx"),
            F.floor(F.col("pt_lat") / GRID_DEG).cast("long").alias("cy"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_sites"),
            davg("pt_lat").alias("mean_lat"),
            davg("pt_lon").alias("mean_lon"),
            # numeric min + rebuild, NOT min(key): a string agg buffer
            # would force SortAggregate; all-primitive buffers keep the
            # whole rollup in HashAggregate (plan-tested)
            F.concat(
                F.lit("contextnode_"),
                F.min(
                    F.regexp_extract(F.col("key"), "([0-9]+)$", 1).cast(
                        "long"
                    )
                ),
            ).alias("sample_site"),
        )
        .orderBy("cx", "cy")
    )


@query(
    "GEO6_area_overlap",
    oracle=f"""
    WITH {CTX_ORACLE_CTE},
    ar AS (
      SELECT key, lat_min, lat_max, lon_min, lon_max
      FROM ctx_promoted WHERE kind = 'Area'
    )
    SELECT a.key AS area_key,
           COUNT(*) AS n_overlaps,
           {sql_dsum('(LEAST(a.lat_max, b.lat_max)'
                     ' - GREATEST(a.lat_min, b.lat_min))'
                     ' * (LEAST(a.lon_max, b.lon_max)'
                     ' - GREATEST(a.lon_min, b.lon_min))')}
             AS total_overlap_deg2
    FROM ar a JOIN ar b
      ON a.key <> b.key
     AND LEAST(a.lat_max, b.lat_max) > GREATEST(a.lat_min, b.lat_min)
     AND LEAST(a.lon_max, b.lon_max) > GREATEST(a.lon_min, b.lon_min)
    GROUP BY a.key
    ORDER BY area_key
    """,
)
def geo6_area_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polygon-polygon (bbox) OVERLAP join: for every Area, how many
    other study regions it intersects and the total overlap area —
    "which study regions cover the same ground", the region-comparison
    question GEO3 answers for points.

    The scale mechanics extend GEO3 with the **PBSM reference-point
    rule** (Patel & DeWitt 1996): both areas list every grid cell their
    bbox covers, the join is the plain cell equi-join — but a pair of
    boxes can share MANY cells, and a dropDuplicates over the candidate
    set would be a whole extra shuffle (the exact waste the round-4
    GEO3/GEO4 review removed).  Instead each candidate pair is kept
    ONLY in the one cell containing the intersection box's (min lon,
    min lat) corner — that corner lies inside both boxes, so both list
    its cell, and it lies in exactly one cell, so the pair survives
    exactly once.  Dedup becomes a codegen'd comparison, not a shuffle.
    Strict (positive-area) overlap keeps the half-open semantics of the
    rest of the GEO family."""
    promoted = promote_context_cols(
        mint_context_nodes(spark, sf_dir)
    ).localCheckpoint()

    def side(prefix: str) -> DataFrame:
        ar = promoted.where(F.col("kind") == "Area").select(
            F.col("key").alias(f"{prefix}_key"),
            F.col("lat_min").alias(f"{prefix}_lat_min"),
            F.col("lat_max").alias(f"{prefix}_lat_max"),
            F.col("lon_min").alias(f"{prefix}_lon_min"),
            F.col("lon_max").alias(f"{prefix}_lon_max"),
        )
        return ar.select(
            "*",
            F.explode(
                F.sequence(
                    F.floor(F.col(f"{prefix}_lon_min") / GRID_DEG),
                    F.floor(F.col(f"{prefix}_lon_max") / GRID_DEG),
                )
            ).alias("cx"),
        ).select(
            "*",
            F.explode(
                F.sequence(
                    F.floor(F.col(f"{prefix}_lat_min") / GRID_DEG),
                    F.floor(F.col(f"{prefix}_lat_max") / GRID_DEG),
                )
            ).alias("cy"),
        )

    a, b = side("a"), side("b")
    inter_lat = F.least(F.col("a_lat_max"), F.col("b_lat_max")) - F.greatest(
        F.col("a_lat_min"), F.col("b_lat_min")
    )
    inter_lon = F.least(F.col("a_lon_max"), F.col("b_lon_max")) - F.greatest(
        F.col("a_lon_min"), F.col("b_lon_min")
    )
    owned = (
        a.join(b, ["cx", "cy"])
        .where(F.col("a_key") != F.col("b_key"))
        .where((inter_lat > 0) & (inter_lon > 0))
        # PBSM reference point: keep the pair only in the cell holding
        # the intersection's min corner — exactly-once without a shuffle
        .where(
            (
                F.col("cx")
                == F.floor(
                    F.greatest(F.col("a_lon_min"), F.col("b_lon_min"))
                    / GRID_DEG
                )
            )
            & (
                F.col("cy")
                == F.floor(
                    F.greatest(F.col("a_lat_min"), F.col("b_lat_min"))
                    / GRID_DEG
                )
            )
        )
    )
    return (
        owned.groupBy(F.col("a_key").alias("area_key"))
        .agg(
            F.count(F.lit(1)).alias("n_overlaps"),
            dsum(inter_lat * inter_lon).alias("total_overlap_deg2"),
        )
        .orderBy("area_key")
    )


# --- GEO4b: geodesic (haversine) radius join ------------------------------

#: Radius in kilometres for the geodesic variant.
RADIUS_KM = 400.0
#: Mean Earth radius (IUGG), km.
EARTH_R_KM = 6371.0088
#: Conservative km-per-degree floor for grid expansion (true meridian
#: value is pi*R/180 = 111.195 — using 110.0 over-expands ~1%, which
#: absorbs the small-angle curvature terms the linear bound drops).
KM_PER_DEG_FLOOR = 110.0


def wrap_lon_cell(cx: Column) -> Column:
    """Wrap a longitude grid-cell index across the antimeridian: the
    haversine distance is seam-safe (sin is periodic) but a LINEAR cell
    range is not — an expansion window crossing ±180° must land on the
    cells actually holding the far side's points.  Maps any integer
    cell into [-18, 17] for the 10° grid (identity for in-range ids).
    GEO4 (degree-space) deliberately does NOT wrap: its distance
    semantics and its oracle are both linear in degrees."""
    n = int(360.0 / GRID_DEG)
    return F.pmod(cx + F.lit(n // 2), F.lit(n)) - F.lit(n // 2)


def haversine_km(lat1, lon1, lat2, lon2) -> Column:
    """Great-circle distance in km — pure column expressions (radians/
    sin/cos/asin/sqrt exist identically in Spark and DuckDB; outputs
    cross the oracle boundary through the scaled-int ``dquant``
    rendering, the C1 convention, so last-ulp libm differences cannot
    flip the hash)."""
    dphi = F.radians(lat2 - lat1) / 2.0
    dlmb = F.radians(lon2 - lon1) / 2.0
    a = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlmb)
        * F.sin(dlmb)
    )
    return 2.0 * EARTH_R_KM * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


def _sql_haversine(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    return (
        f"2.0 * {EARTH_R_KM} * asin(sqrt(least("
        f"sin(radians(({lat2}) - ({lat1})) / 2)"
        f" * sin(radians(({lat2}) - ({lat1})) / 2)"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * sin(radians(({lon2}) - ({lon1})) / 2)"
        f" * sin(radians(({lon2}) - ({lon1})) / 2), 1.0)))"
    )


@query(
    "GEO4b_radius_sites_geodesic",
    oracle=f"""
    WITH {CTX_ORACLE_CTE},
    pts AS (
      SELECT key, pt_lat, pt_lon FROM ctx_promoted
      WHERE kind IN ('Site', 'SiteDMS')
    ),
    areas AS (
      SELECT key AS area_key,
             (lat_min + lat_max) / 2.0 AS c_lat,
             (lon_min + lon_max) / 2.0 AS c_lon
      FROM ctx_promoted WHERE kind = 'Area'
    ),
    cand AS (
      SELECT a.area_key, p.key,
             FLOOR({_sql_haversine('p.pt_lat', 'p.pt_lon',
                                   'a.c_lat', 'a.c_lon')} * 10000)
               / 10000.0 AS dist_q
      FROM areas a JOIN pts p
        ON {_sql_haversine('p.pt_lat', 'p.pt_lon',
                           'a.c_lat', 'a.c_lon')} <= {RADIUS_KM}
    )
    SELECT area_key,
           COUNT(*) AS n_sites,
           {sql_dquant('MIN(dist_q)')} AS min_km,
           FIRST(key ORDER BY dist_q, key) AS nearest_site
    FROM cand
    GROUP BY area_key
    ORDER BY area_key
    """,
)
def geo4b_radius_sites_geodesic(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GEO4 at GEOGRAPHIC fidelity (VERDICT r4 item 7): sites within
    ``RADIUS_KM`` great-circle km of each Area centroid.  Degree-space
    distance distorts ~2x at 60°N; this variant filters on haversine
    while keeping GEO4's exact plan shape — the only changes are the
    distance expression and a LATITUDE-AWARE cell expansion: the
    longitude radius widens by 1/cos(|c_lat|+lat_r) per area (clamped
    at 89°), so high-latitude areas probe more grid cells instead of
    silently missing true neighbours.  Completeness: dist ≤ R implies
    |Δlat| ≤ R/111.195 and |Δlon| ≤ R/(111.195·cos φ_max) — both
    covered by the 110.0-floor expansion.  Nearest ranking uses the
    QUANTIZED distance (ties broken by key) so a last-ulp libm
    difference can never pick a different site across engines."""
    promoted = promote_context_cols(
        mint_context_nodes(spark, sf_dir)
    ).localCheckpoint()
    pts = promoted.where(F.col("kind").isin("Site", "SiteDMS")).select(
        "key",
        "pt_lat",
        "pt_lon",
        wrap_lon_cell(F.floor(F.col("pt_lon") / GRID_DEG)).alias("cx"),
        F.floor(F.col("pt_lat") / GRID_DEG).alias("cy"),
    )
    c_lat = (F.col("lat_min") + F.col("lat_max")) / 2.0
    c_lon = (F.col("lon_min") + F.col("lon_max")) / 2.0
    lat_r = F.lit(RADIUS_KM / KM_PER_DEG_FLOOR)
    lon_r = F.least(
        lat_r
        / F.cos(F.radians(F.least(F.abs(c_lat) + lat_r, F.lit(89.0)))),
        F.lit(180.0),
    )
    areas = (
        promoted.where(F.col("kind") == "Area")
        .select(
            F.col("key").alias("area_key"),
            c_lat.alias("c_lat"),
            c_lon.alias("c_lon"),
            lon_r.alias("lon_r"),
            # each linear-expansion cell wrapped across the seam
            # (transform, not post-explode: generators can't nest in
            # expressions) then DEDUPED — a clamped lon_r near 180°
            # wraps onto itself and a duplicate (area, cell) row would
            # double-count candidate pairs
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(
                            F.floor((c_lon - lon_r) / GRID_DEG),
                            F.floor((c_lon + lon_r) / GRID_DEG),
                        ),
                        wrap_lon_cell,
                    )
                )
            ).alias("cx"),
        )
        .select(
            "area_key",
            "c_lat",
            "c_lon",
            "cx",
            F.explode(
                F.sequence(
                    F.floor((F.col("c_lat") - lat_r) / GRID_DEG),
                    F.floor((F.col("c_lat") + lat_r) / GRID_DEG),
                )
            ).alias("cy"),
        )
    )
    dist = haversine_km(
        F.col("pt_lat"), F.col("pt_lon"), F.col("c_lat"), F.col("c_lon")
    )
    cand = (
        pts.join(areas, ["cx", "cy"])
        .where(dist <= RADIUS_KM)
        .select("area_key", "key", dquant(dist).alias("dist_q"))
    )
    nearest = F.min(F.struct(F.col("dist_q"), F.col("key")))
    return (
        cand.groupBy("area_key")
        .agg(
            F.count(F.lit(1)).alias("n_sites"),
            dquant(F.min("dist_q")).alias("min_km"),
            nearest.getField("key").alias("nearest_site"),
        )
        .orderBy("area_key")
    )


# --- GEO7/GEO8: scale-safe answer shapes for the quadratic map questions ---
# GEO3/GEO6's pair-list semantics is honestly quadratic — output pairs grow
# ~100x per decade on the synthetic mint (SCALE §15/§23/§33: per-pair cost
# flat, the quadratic is in the QUESTION).  These two rows are the bounded
# spellings a 100x map workload actually wants (VERDICT r10 item 5): the
# same containment/nearest questions answered with linear-sized outputs and
# sub-quadratic plans.

#: Fine grid (degrees) for the GEO7 covered-cell pre-aggregation.  Finer
#: than GRID_DEG so that a typical area covers MANY wholly-interior cells;
#: the domain stays bounded (360 x 180 cells) so the rollup is a synopsis.
FINE_DEG = 1.0


@query(
    "GEO7_area_point_count",
    oracle=f"""
    WITH {CTX_ORACLE_CTE},
    pts AS (
      SELECT pt_lat, pt_lon FROM ctx_promoted
      WHERE kind IN ('Site', 'SiteDMS')
    ),
    areas AS (
      SELECT key AS area_key, lat_min, lat_max, lon_min, lon_max
      FROM ctx_promoted WHERE kind = 'Area'
    )
    SELECT area_key, CAST(COUNT(*) AS BIGINT) AS n_points
    FROM areas a JOIN pts p
      ON  p.pt_lat >= a.lat_min AND p.pt_lat < a.lat_max
      AND p.pt_lon >= a.lon_min AND p.pt_lon < a.lon_max
    GROUP BY area_key
    ORDER BY area_key
    """,
)
def geo7_area_point_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-area point COUNT by covered-cell pre-aggregation — GEO3's
    containment question with the quadratic taken out of the ENGINE
    (Sedona-style filter-refine over a density rollup; the upgrade
    GEO3's cardinality note names):

    - points roll up ONCE onto a fine fixed grid (``FINE_DEG``) — a
      map-side-combinable groupBy over a BOUNDED key domain (<= 360x180
      cells), GEO5's shape;
    - each area explodes to its covered cells (bounded per area:
      O(area extent / FINE_DEG)) and joins the BROADCAST cell rollup;
    - a covered cell wholly inside the half-open box contributes its
      pre-aggregated count with NO per-point work; only cells straddling
      the boundary re-join their points for the exact predicate.

    The minted areas are integer-cornered, so on this data the boundary
    set is EMPTY and the whole answer reads from the synopsis — per-point
    work is one linear rollup pass regardless of how many areas contain
    each point.  The boundary path stays in the plan for non-aligned
    boxes; it re-joins only the straddling cells' points, never the
    corpus.  Output: one row per non-empty area (linear), value-identical
    to GEO3's n_points (the oracle is GEO3's own predicate).

    100 TB shape: the quadratic (point, area) pair set is never
    materialized — the rollup shuffle is bounded by the cell domain, the
    area-cells join broadcasts the synopsis, and the boundary join's
    point side is pruned to straddling cells by an equi-join on the cell
    id.  Decade ratio is data-linear (SCALE r11)."""
    return area_point_count(_promoted_spread(spark, sf_dir))


def _promoted_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promoted context table, SPREAD before the checkpoint: the GEO7/
    GEO8 family explodes each Area to ~200 covered cells off this
    frame, and the customer parquet arrives as ONE byte-range split
    well past gen_sf10 (the r12 sf40 probe stalled its ×200 generate on
    a single core before this guard — the same starvation class as
    SCALE §40, on the checkpoint instead of the row groups)."""
    from biodiversity_graph_db_spark.operators._util import spread

    # Project to the 8 typed columns every GEO7/GEO8-family consumer
    # reads BEFORE the checkpoint (guide §2.3): the payload JSON and
    # WKT strings are promote-time artifacts none of them touches, and
    # materializing them into the checkpoint paid their to_json/
    # format_string compute plus block memory for nothing.  The spread
    # probe inspects the raw customer scan (one-node plan) instead of
    # compiling the full mint+promote frame to an RDD DAG twice per
    # call — the mint is narrow over the scan, so the partition answer
    # is identical.
    promoted = promote_context_cols(mint_context_nodes(spark, sf_dir)).select(
        "key",
        "kind",
        "pt_lat",
        "pt_lon",
        "lat_min",
        "lat_max",
        "lon_min",
        "lon_max",
    )
    return spread(
        promoted, probe=table(spark, sf_dir, "customer")
    ).localCheckpoint()


def area_point_count(promoted: DataFrame) -> DataFrame:
    """The GEO7 covered-cell count over an already-promoted context
    table (the ``points_in_areas`` factoring) — separable so the
    boundary-cell path, empty on the integer-cornered mint, is
    unit-testable with fractional-corner areas."""
    interior_counts, boundary_counts = area_point_count_parts(promoted)
    return (
        interior_counts.unionByName(boundary_counts)
        .groupBy("area_key")
        .agg(F.sum("n").cast("long").alias("n_points"))
        .orderBy("area_key")
    )


def area_point_count_parts(
    promoted: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """The two GEO7 branches, separately: (interior synopsis sums,
    boundary filter-refine counts) — exposed so non-hollowness of each
    branch is assertable per mint (the D7/T9 discipline)."""
    from biodiversity_graph_db_spark.operators._util import cut

    pts = promoted.where(F.col("kind").isin("Site", "SiteDMS")).select(
        "pt_lat",
        "pt_lon",
        F.floor(F.col("pt_lon") / FINE_DEG).alias("fx"),
        F.floor(F.col("pt_lat") / FINE_DEG).alias("fy"),
    )
    # the synopsis feeds BOTH branches (interior sum + boundary join)
    # through `covered` — cut the bounded <=360x180-row table so the
    # corpus rollup pass runs ONCE, not once per branch (r11 sweep).
    # The area-side explode is also duplicated across the branches; it
    # is pure per-row compute off the promoted checkpoint (no shuffle,
    # areas x bounded cells) and stays cheaper than materializing the
    # corpus-proportional `covered` would be.
    cells = cut(pts.groupBy("fx", "fy").agg(F.count(F.lit(1)).alias("cnt")))
    # covered cells: every fine cell whose [c*FG, (c+1)*FG) range meets
    # the half-open box — last covered index is ceil(max/FG) - 1
    area_cells = (
        promoted.where(F.col("kind") == "Area")
        .select(
            F.col("key").alias("area_key"),
            "lat_min",
            "lat_max",
            "lon_min",
            "lon_max",
            F.explode(
                F.sequence(
                    F.floor(F.col("lon_min") / FINE_DEG),
                    F.ceil(F.col("lon_max") / FINE_DEG) - 1,
                )
            ).alias("fx"),
        )
        .select(
            "*",
            F.explode(
                F.sequence(
                    F.floor(F.col("lat_min") / FINE_DEG),
                    F.ceil(F.col("lat_max") / FINE_DEG) - 1,
                )
            ).alias("fy"),
        )
    )
    interior = (
        (F.col("fx") * FINE_DEG >= F.col("lon_min"))
        & ((F.col("fx") + 1) * FINE_DEG <= F.col("lon_max"))
        & (F.col("fy") * FINE_DEG >= F.col("lat_min"))
        & ((F.col("fy") + 1) * FINE_DEG <= F.col("lat_max"))
    )
    covered = area_cells.join(F.broadcast(cells), ["fx", "fy"])
    interior_counts = (
        covered.where(interior)
        .groupBy("area_key")
        .agg(F.sum("cnt").cast("long").alias("n"))
    )
    # boundary cells re-join their points for the exact half-open check
    # (empty on integer-cornered areas; the general path for any box)
    boundary_counts = (
        covered.where(~interior)
        .select("area_key", "fx", "fy", "lat_min", "lat_max", "lon_min", "lon_max")
        .join(pts, ["fx", "fy"])
        .where(
            (F.col("pt_lat") >= F.col("lat_min"))
            & (F.col("pt_lat") < F.col("lat_max"))
            & (F.col("pt_lon") >= F.col("lon_min"))
            & (F.col("pt_lon") < F.col("lon_max"))
        )
        .groupBy("area_key")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return interior_counts, boundary_counts


def _shift_areas_fractional(promoted: DataFrame) -> DataFrame:
    """Shift every Area's bbox by a key-derived FRACTIONAL offset
    (lat += (k%3)·0.25 + 0.25 ∈ {0.25, 0.5, 0.75};
    lon += (k%5)·0.2 + 0.1 ∈ {0.1 … 0.9}) — same 10°×20° extent, but
    no corner sits on the FINE_DEG lattice, so every area owns a
    non-empty ring of boundary cells.  Quarter/fifth-degree deltas are
    exact in binary/decimal-derived doubles the same way in Spark and
    DuckDB, keeping the oracle hashable."""
    k = F.regexp_extract(F.col("key"), "([0-9]+)$", 1).cast("long")
    dlat = (k % 3).cast("double") * 0.25 + 0.25
    dlon = (k % 5).cast("double") * 0.2 + 0.1
    is_area = F.col("kind") == "Area"
    return promoted.select(
        "key",
        "kind",
        "pt_lat",
        "pt_lon",
        F.when(is_area, F.col("lat_min") + dlat)
        .otherwise(F.col("lat_min"))
        .alias("lat_min"),
        F.when(is_area, F.col("lat_max") + dlat)
        .otherwise(F.col("lat_max"))
        .alias("lat_max"),
        F.when(is_area, F.col("lon_min") + dlon)
        .otherwise(F.col("lon_min"))
        .alias("lon_min"),
        F.when(is_area, F.col("lon_max") + dlon)
        .otherwise(F.col("lon_max"))
        .alias("lon_max"),
    )


@query(
    "GEO7b_area_point_count_frac",
    oracle=f"""
    WITH {CTX_ORACLE_CTE},
    pts AS (
      SELECT pt_lat, pt_lon FROM ctx_promoted
      WHERE kind IN ('Site', 'SiteDMS')
    ),
    areas AS (
      -- CAST the literals (DuckDB's bare 0.2/0.1 are DECIMAL where
      -- Spark's are DOUBLE) and parenthesize the DELTA so the adds
      -- associate exactly as Spark's bound + precomputed-delta does —
      -- bound + 0.6 + 0.1 and bound + (0.6 + 0.1) differ in IEEE
      SELECT key AS area_key,
             lat_min + ((CAST(regexp_extract(key, '([0-9]+)$', 1) AS BIGINT)
                         % 3) * CAST(0.25 AS DOUBLE)
                        + CAST(0.25 AS DOUBLE)) AS lat_min,
             lat_max + ((CAST(regexp_extract(key, '([0-9]+)$', 1) AS BIGINT)
                         % 3) * CAST(0.25 AS DOUBLE)
                        + CAST(0.25 AS DOUBLE)) AS lat_max,
             lon_min + ((CAST(regexp_extract(key, '([0-9]+)$', 1) AS BIGINT)
                         % 5) * CAST(0.2 AS DOUBLE)
                        + CAST(0.1 AS DOUBLE)) AS lon_min,
             lon_max + ((CAST(regexp_extract(key, '([0-9]+)$', 1) AS BIGINT)
                         % 5) * CAST(0.2 AS DOUBLE)
                        + CAST(0.1 AS DOUBLE)) AS lon_max
      FROM ctx_promoted WHERE kind = 'Area'
    )
    SELECT area_key, CAST(COUNT(*) AS BIGINT) AS n_points
    FROM areas a JOIN pts p
      ON  p.pt_lat >= a.lat_min AND p.pt_lat < a.lat_max
      AND p.pt_lon >= a.lon_min AND p.pt_lon < a.lon_max
    GROUP BY area_key
    ORDER BY area_key
    """,
)
def geo7b_area_point_count_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEO7 with FRACTIONAL-CORNER areas (VERDICT r11 item 2): the
    integer-cornered GEO7 mint makes the boundary-cell set empty by
    construction, so its driver grade proves only the interior-synopsis
    branch.  This row shifts every area off the FINE_DEG lattice by a
    key-derived quarter/fifth-degree delta, so EVERY area has a
    non-empty boundary ring and the driver-graded answer provably flows
    through BOTH branches — the pre-aggregated interior sum AND the
    straddling-cell filter-refine re-join (``area_point_count``,
    non-hollowness pinned by tests).  The oracle stays GEO3's exact
    half-open containment predicate over the shifted boxes."""
    return area_point_count(
        _shift_areas_fractional(_promoted_spread(spark, sf_dir))
    )


# --- GEO7c: covered-cell pre-aggregation for TRUE polygons ----------------

#: Key-derived chamfer extents of the GEO7c pentagon mint (the top-left
#: corner of the standard 20°×10° rectangle is clipped by the segment
#: (lon0, lat0+10−b) → (lon0+a, lat0+10); a ∈ 1..7, b ∈ 1..5).
_PENT_A_MOD, _PENT_B_MOD = 7, 5


def _pentagon_cols(k: Column) -> tuple[Column, Column, Column, Column]:
    """(lon0, lat0, a, b) as LONG columns — the same lat0/lon0 integer
    derivation as ``mint_context_nodes``'s rectangle, so the pentagon is
    the SAME area with one corner clipped."""
    lat0 = (k * 5) % 80 - 40
    lon0 = (k * 3) % 300 - 150
    return lon0, lat0, k % _PENT_A_MOD + 1, k % _PENT_B_MOD + 1


def _pentagon_poly(k: Column) -> Column:
    """The closed pentagon ring as ``array<struct<lon,lat>>`` (the
    ``wkt_polygon_points`` shape, closing vertex repeated), all vertices
    integer-valued doubles."""
    lon0, lat0, a, b = _pentagon_cols(k)

    def pt(lon: Column, lat: Column) -> Column:
        return F.struct(
            lon.cast("double").alias("lon"), lat.cast("double").alias("lat")
        )

    return F.array(
        pt(lon0, lat0),
        pt(lon0 + 20, lat0),
        pt(lon0 + 20, lat0 + 10),
        pt(lon0 + a, lat0 + 10),
        pt(lon0, lat0 + 10 - b),
        pt(lon0, lat0),
    )


def _pentagon_raycast(
    lat: Column, lon: Column, lon0: Column, lat0: Column,
    pa: Column, pb: Column,
) -> Column:
    """The pentagon's even-odd ray-cast UNROLLED over its five edges as
    plain codegen'd column arithmetic — semantically identical to
    ``point_in_polygon_col`` over ``_pentagon_poly`` (same per-edge
    expression ``(x2−x1)·(lat−y1)/(y2−y1)+x1``, same XOR chain, same
    IEEE values since the vertices are the same integer doubles), but
    it stays inside whole-stage codegen where the array fold is
    CodegenFallback — the gen_sf40 probe measured the interpreted fold
    as ~4× the entire rest of the query (1.2B straddle-cell
    candidates).  Equality with the fold spelling is pinned by the
    brute-force test."""
    verts = [
        (lon0, lat0),
        (lon0 + 20, lat0),
        (lon0 + 20, lat0 + 10),
        (lon0 + pa, lat0 + 10),
        (lon0, lat0 + 10 - pb),
        (lon0, lat0),
    ]
    inside: Column | None = None
    for i in range(5):
        x1, y1 = (c.cast("double") for c in verts[i])
        x2, y2 = (c.cast("double") for c in verts[i + 1])
        crosses = ((y1 > lat) != (y2 > lat)) & (
            lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1
        )
        inside = crosses if inside is None else (inside != crosses)
    assert inside is not None
    return inside


def _pentagon_oracle_predicate() -> str:
    """The DuckDB twin of ``point_in_polygon_col`` over the minted
    pentagon: five crossing terms XOR-chained, each the literal
    expression order of the Spark column (``(x2−x1)·(lat−y1)/(y2−y1)+x1``
    on integer-exact DOUBLE vertices), with the horizontal-edge
    division guarded by CASE (Spark's ``false AND x`` three-valued
    collapse is a CASE in DuckDB — same boolean, no div-by-zero
    semantics dependence)."""
    k = "CAST(regexp_extract(a.key, '([0-9]+)$', 1) AS BIGINT)"
    lat0 = f"(({k} * 5) % 80 - 40)"
    lon0 = f"(({k} * 3) % 300 - 150)"
    pa = f"({k} % {_PENT_A_MOD} + 1)"
    pb = f"({k} % {_PENT_B_MOD} + 1)"
    verts = [
        (lon0, lat0),
        (f"({lon0} + 20)", lat0),
        (f"({lon0} + 20)", f"({lat0} + 10)"),
        (f"({lon0} + {pa})", f"({lat0} + 10)"),
        (lon0, f"({lat0} + 10 - {pb})"),
        (lon0, lat0),
    ]
    expr = None
    for i in range(5):
        x1, y1 = verts[i]
        x2, y2 = verts[i + 1]
        d = lambda e: f"CAST({e} AS DOUBLE)"
        term = (
            f"(CASE WHEN ({d(y1)} > p.pt_lat) <> ({d(y2)} > p.pt_lat)"
            f" THEN p.pt_lon < ({d(x2)} - {d(x1)})"
            f" * (p.pt_lat - {d(y1)}) / ({d(y2)} - {d(y1)}) + {d(x1)}"
            f" ELSE FALSE END)"
        )
        expr = term if expr is None else f"({expr} <> {term})"
    return expr


@query(
    "GEO7c_polygon_point_count",
    oracle=f"""
    WITH {CTX_ORACLE_CTE},
    pts AS (
      SELECT pt_lat, pt_lon FROM ctx_promoted
      WHERE kind IN ('Site', 'SiteDMS')
    ),
    areas AS (
      SELECT key FROM ctx_promoted WHERE kind = 'Area'
    )
    SELECT a.key AS area_key, CAST(COUNT(*) AS BIGINT) AS n_points
    FROM areas a JOIN pts p ON {_pentagon_oracle_predicate()}
    GROUP BY area_key
    ORDER BY area_key
    """,
)
def geo7c_polygon_point_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEO7's covered-cell pre-aggregation for TRUE polygons — the
    upgrade the GEO3 docstring names ("count interior cells from a
    per-cell rollup, exact-check only boundary cells ... for polygon
    families with testable cell coverage", the Sedona/PBSM filter-refine
    idiom): per-area containment COUNTS where the area is a convex
    PENTAGON (the standard rectangle mint with a key-derived chamfer
    clipping its top-left corner), not a bbox.

    The scale-critical property GEO7 pioneered survives the polygon
    generalization: per-point work is ONE bounded grid rollup; interior
    cells contribute pre-aggregated counts with NO per-point geometry;
    rectangle-edge boundary cells refine with the exact codegen'd
    half-open box test (provably ≡ the ray-cast there — see
    ``polygon_point_count_parts``); only the O(chamfer-length) cells
    the polygon's oblique edge actually crosses re-join their points
    for the exact even-odd ray-cast (``point_in_polygon_col`` — the
    same predicate GEO3 applies to every candidate pair), and the
    clipped-corner cells are dropped with no per-point work at all.

    Exactness is split by construction: interior-cell classification
    runs in pure INTEGER arithmetic (cell corners and pentagon vertices
    are integers; a cell is interior only if all four corners satisfy
    all five half-planes STRICTLY, so every point of the half-open cell
    sits ≥ 1/√(a²+b²) ≈ 0.1° inside every edge — a float ray-cast
    cannot flip at that margin, its decision band being ~1 ulp around
    the edge lines), while boundary points get the float ray-cast whose
    DuckDB twin (``_pentagon_oracle_predicate``) replays the identical
    IEEE expression tree, so the oracle's brute-force join is
    bit-compatible on every point including ones ON the boundary."""
    return polygon_point_count(_promoted_spread(spark, sf_dir))


def polygon_point_count(promoted: DataFrame) -> DataFrame:
    """Interior-synopsis + box-refine + ray-cast-refine sum (the
    ``area_point_count`` factoring for pentagon areas)."""
    interior, box_bnd, ray_bnd = polygon_point_count_parts(promoted)
    return (
        interior.unionByName(box_bnd)
        .unionByName(ray_bnd)
        .groupBy("area_key")
        .agg(F.sum("n").cast("long").alias("n_points"))
        .orderBy("area_key")
    )


def polygon_point_count_parts(
    promoted: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The three GEO7c branches, separately (the D7/T9 non-hollowness
    discipline): (interior synopsis sums, rectangle-boundary box-refine
    counts, chamfer-straddling ray-cast counts).  Every pentagon owns
    cells in ALL THREE classes by construction.

    Cell classification is pure INTEGER arithmetic on the chamfer
    functional s(corner) = a·(lat − (lat0+10−b)) − b·(lon − lon0):

    - all 4 corners s < 0 and rect-strict → INTERIOR (synopsis);
    - all 4 corners s > 0 → the clipped-corner region: every point is
      provably outside, the cell is DROPPED with no per-point work
      (ray-cast parity = chamfer-crossing XOR right-edge = T XOR T);
    - s straddles 0 → the chamfer line meets the cell: exact even-odd
      RAY-CAST per point (float-safe: off-line points are decided
      identically in both engines, on-line points by the shared
      expression tree);
    - s all < 0 but a rect bound non-strict → the ray cast provably
      collapses to the HALF-OPEN BOX test (vertical-edge crossings are
      exact ``lon < x1`` — 0·(lat−y1)/dy contributes signed zero — and
      the chamfer term is deterministically false at ≥ 1/b ≈ 0.2°
      right of the line), so these cells refine with the cheap
      codegen'd box predicate, never the interpreted fold.

    The ray-cast therefore runs on O(chamfer length) ≈ a+b+2 cells per
    area instead of the whole O(perimeter) boundary — measured 5×+ on
    the gen_sf10 probe, where the all-boundary ray-cast spelling was
    the dominant cost."""
    from biodiversity_graph_db_spark.operators._util import cut

    pts = promoted.where(F.col("kind").isin("Site", "SiteDMS")).select(
        "pt_lat",
        "pt_lon",
        F.floor(F.col("pt_lon") / FINE_DEG).alias("fx"),
        F.floor(F.col("pt_lat") / FINE_DEG).alias("fy"),
    )
    cells = cut(pts.groupBy("fx", "fy").agg(F.count(F.lit(1)).alias("cnt")))
    k = F.regexp_extract(F.col("key"), "([0-9]+)$", 1).cast("long")
    lon0, lat0, pa, pb = _pentagon_cols(k)
    areas = promoted.where(F.col("kind") == "Area").select(
        F.col("key").alias("area_key"),
        lon0.alias("lon0"),
        lat0.alias("lat0"),
        pa.alias("pa"),
        pb.alias("pb"),
        _pentagon_poly(k).alias("poly"),
    )
    # covered cells: the pentagon's bbox is the full rectangle (it
    # touches all four sides), FINE_DEG = 1.0 ⇒ integer cell indices
    covered = (
        areas.select(
            "*",
            F.explode(
                F.sequence(F.col("lon0"), F.col("lon0") + 19)
            ).alias("fx"),
        )
        .select(
            "*",
            F.explode(
                F.sequence(F.col("lat0"), F.col("lat0") + 9)
            ).alias("fy"),
        )
    )
    # chamfer functional at the four corners (longs — exact)
    y1 = F.col("lat0") + 10 - F.col("pb")

    def s_at(cx: Column, cy: Column) -> Column:
        return F.col("pa") * (cy - y1) - F.col("pb") * (cx - F.col("lon0"))

    corners = [
        s_at(F.col("fx"), F.col("fy")),
        s_at(F.col("fx") + 1, F.col("fy")),
        s_at(F.col("fx"), F.col("fy") + 1),
        s_at(F.col("fx") + 1, F.col("fy") + 1),
    ]
    s_max = F.greatest(*corners)
    s_min = F.least(*corners)
    rect_strict = (
        (F.col("fx") > F.col("lon0"))
        & (F.col("fx") + 1 < F.col("lon0") + 20)
        & (F.col("fy") > F.col("lat0"))
        & (F.col("fy") + 1 < F.col("lat0") + 10)
    )
    interior = rect_strict & (s_max < 0)
    straddle = (s_min <= 0) & (s_max >= 0)
    box_only = (s_max < 0) & ~rect_strict

    interior_counts = (
        covered.where(interior)
        .select("area_key", "fx", "fy")
        .join(F.broadcast(cells), ["fx", "fy"])
        .groupBy("area_key")
        .agg(F.sum("cnt").cast("long").alias("n"))
    )
    box_boundary_counts = (
        covered.where(box_only)
        .select("area_key", "lon0", "lat0", "fx", "fy")
        .join(pts, ["fx", "fy"])
        .where(
            (F.col("pt_lat") >= F.col("lat0").cast("double"))
            & (F.col("pt_lat") < (F.col("lat0") + 10).cast("double"))
            & (F.col("pt_lon") >= F.col("lon0").cast("double"))
            & (F.col("pt_lon") < (F.col("lon0") + 20).cast("double"))
        )
        .groupBy("area_key")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    raycast_counts = (
        covered.where(straddle)
        .select("area_key", "lon0", "lat0", "pa", "pb", "fx", "fy")
        .join(pts, ["fx", "fy"])
        .where(
            _pentagon_raycast(
                F.col("pt_lat"),
                F.col("pt_lon"),
                F.col("lon0"),
                F.col("lat0"),
                F.col("pa"),
                F.col("pb"),
            )
        )
        .groupBy("area_key")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return interior_counts, box_boundary_counts, raycast_counts


#: Neighbours kept per area by the GEO8 top-k rollup.
NEAREST_K = 3

#: Second (fine) synopsis level for GEO8's multi-resolution probe
#: (VERDICT r11 item 3): eighth-degree cells, domain bounded by
#: 2880×1440.  W2_RINGS fine rings cover 2° around each centroid.
FINE2_DEG = 0.125
W2_RINGS = 16


@query(
    "GEO8_nearest_topk",
    oracle=f"""
    WITH {CTX_ORACLE_CTE},
    pts AS (
      SELECT key, pt_lat, pt_lon FROM ctx_promoted
      WHERE kind IN ('Site', 'SiteDMS')
    ),
    areas AS (
      SELECT key AS area_key,
             (lat_min + lat_max) / 2.0 AS c_lat,
             (lon_min + lon_max) / 2.0 AS c_lon
      FROM ctx_promoted WHERE kind = 'Area'
    ),
    cand AS (
      SELECT a.area_key, p.key AS site_key,
             (p.pt_lat - a.c_lat) * (p.pt_lat - a.c_lat)
             + (p.pt_lon - a.c_lon) * (p.pt_lon - a.c_lon) AS d2
      FROM areas a JOIN pts p
        ON (p.pt_lat - a.c_lat) * (p.pt_lat - a.c_lat)
           + (p.pt_lon - a.c_lon) * (p.pt_lon - a.c_lon)
           <= {RADIUS_DEG * RADIUS_DEG}
    ),
    ranked AS (
      SELECT area_key, site_key, d2,
             ROW_NUMBER() OVER (PARTITION BY area_key
                                ORDER BY d2, site_key) AS rk
      FROM cand
    )
    SELECT area_key, CAST(rk AS BIGINT) AS rk, site_key,
           {sql_dquant('d2')} AS d2
    FROM ranked WHERE rk <= {NEAREST_K}
    ORDER BY area_key, rk
    """,
)
def geo8_nearest_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k nearest sites per area — GEO4's proximity question widened
    from nearest-1 to a bounded per-area neighbour LIST (the map
    workload's "show the 3 closest sites to every study region"), and
    the bounded counterpart of emitting all radius pairs: output is
    <= k rows per area, linear in areas at any corpus size.

    The CANDIDATE set is count-pruned over a MULTI-RESOLUTION synopsis
    (the kNN grid-pruning idiom — probe only as far as the counts prove
    necessary), because a fixed-radius candidate join is quadratic when
    both sides grow (the GEO3 adjudication; 19.8×/decade on the r11
    first cut) and a single-level bound floors at one cell's density
    (VERDICT r11 item 3: once a FINE_DEG cell holds >> k points,
    per-area work grew with cell density again):

    1. points roll up ONCE onto the two-level grid — ``FINE2_DEG``
       cells carrying their ``FINE_DEG`` parent (one groupBy; the
       coarse level is a driver-free rollup of the fine one, the W9
       multires shape);
    2. LEVEL-1 probe (as before): each area scans the
       <= (2·max_ring+1)² coarse cells around its centroid and finds
       q*₁ = the smallest Chebyshev ring whose cumulative count reaches
       k → r₁ = (q*₁+1)·FINE_DEG·√2;
    3. LEVEL-2 probe: the same scan over the <= (2·W2_RINGS+1)² fine
       cells (covering W2_RINGS·FINE2_DEG = 2° around the centroid)
       → r₂ = (q*₂+1)·FINE2_DEG·√2 — in dense regions k points appear
       within a few EIGHTH-degree rings, so r₂ keeps shrinking long
       after r₁ has floored at one coarse cell (√2·FINE_DEG);
    4. r_bound = min(R, r₁, r₂); areas with r_bound <= W2_RINGS·FINE2
       enumerate candidate cells at the FINE2 level (<= 35² cells, but
       typically ~5²·k points), the rest at the FINE level — so the
       per-area candidate set tracks ~O(k) at ANY density instead of
       O(points-per-cell);
    5. the candidate equi-join filters d² <= min(R, r_bound)² and takes
       the per-area row_number <= k.

    The pruning is a pure optimization: the DuckDB oracle is the
    brute-force radius join + rank, so the parity gate proves the bound
    never cuts a true top-k row.  Spark's WindowGroupLimit (plan-pinned)
    pushes the rank bound below the window shuffle — each map task ships
    at most k rows per area.  Ties on d2 break by site key in both
    engines; d2 is transcendental-free degree-space arithmetic (GEO4's
    determinism argument), quantized only at the output boundary.  (The
    √2 in the bounds is driver-side float used ONLY for pruning, never
    in output values.)  100 TB note: the fine synopsis is bounded by
    its 2880×1440 cell domain (~100 MB worst case, broadcastable); a
    deployment needing finer levels would partition the synopsis by
    coarse cell (H3-style) instead of broadcasting, same plan shape."""
    return nearest_topk(_promoted_spread(spark, sf_dir))


def nearest_topk(promoted: DataFrame) -> DataFrame:
    """The GEO8 two-level count-pruned kNN over an already-promoted
    context table — separable (the area_point_count factoring) so the
    DENSE path, rarely selected on the sparse test mints, is
    unit-testable against brute force on minted dense clusters."""
    from pyspark.sql import Window

    dense_cand, sparse_cand = nearest_topk_parts(promoted)
    cand = dense_cand.unionByName(sparse_cand)
    w = Window.partitionBy("area_key").orderBy("d2", "site_key")
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= NEAREST_K)
        .select(
            "area_key",
            F.col("rk").cast("long").alias("rk"),
            "site_key",
            dquant(F.col("d2")).alias("d2"),
        )
        .orderBy("area_key", "rk")
    )


def nearest_topk_parts(
    promoted: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """The two GEO8 candidate branches, separately: (FINE2-level dense
    enumeration, FINE-level sparse enumeration), each as
    (area_key, site_key, d2) candidate rows — exposed so non-hollowness
    of EACH branch is assertable per mint (the GEO7
    ``area_point_count_parts`` / D7/T9 discipline)."""

    pts = promoted.where(F.col("kind").isin("Site", "SiteDMS")).select(
        F.col("key").alias("site_key"),
        "pt_lat",
        "pt_lon",
        F.floor(F.col("pt_lon") / FINE_DEG).alias("fx"),
        F.floor(F.col("pt_lat") / FINE_DEG).alias("fy"),
        F.floor(F.col("pt_lon") / FINE2_DEG).alias("fx2"),
        F.floor(F.col("pt_lat") / FINE2_DEG).alias("fy2"),
    )
    # ONE corpus rollup; the coarse synopsis is a rollup of the fine one
    # ((fx2, fy2) determines (fx, fy)), cut so both probes and the
    # candidate stage read the materialized bounded table
    from biodiversity_graph_db_spark.operators._util import cut

    cells2 = cut(
        pts.groupBy("fx", "fy", "fx2", "fy2").agg(
            F.count(F.lit(1)).alias("cnt")
        )
    )
    cells = cells2.groupBy("fx", "fy").agg(F.sum("cnt").alias("cnt"))
    # rings 0..max_ring around the centroid cell cover every point
    # within R: |lon − c_lon| <= R ⇒ cell offset <= floor(R/FG) + 1
    max_ring = int(RADIUS_DEG / FINE_DEG) + 1
    c_lat = (F.col("lat_min") + F.col("lat_max")) / 2.0
    c_lon = (F.col("lon_min") + F.col("lon_max")) / 2.0
    areas = promoted.where(F.col("kind") == "Area").select(
        F.col("key").alias("area_key"),
        c_lat.alias("c_lat"),
        c_lon.alias("c_lon"),
        F.floor(c_lon / FINE_DEG).alias("fx0"),
        F.floor(c_lat / FINE_DEG).alias("fy0"),
        F.floor(c_lon / FINE2_DEG).alias("fx20"),
        F.floor(c_lat / FINE2_DEG).alias("fy20"),
    )

    def first_ring_reaching_k(tag, n_rings):
        return F.coalesce(
            *[
                F.when(F.col(f"{tag}{q}") >= NEAREST_K, F.lit(q))
                for q in range(n_rings + 1)
            ]
        )

    # FUSED two-level probe (r13, guide §1/§2.4).  Measured first: the
    # r12 shape ran THREE sequential bounded-data jobs here — the
    # probe1 cut, probe2 over the per-area c3>=k gate, then the cut of
    # their left join — and ~2.5 s of the GEO8 bench row was this
    # tower's job overhead, not data (each job moves <1 M tiny rows).
    # Both levels' ring rows now UNION into ONE aggregation: one
    # shuffle on area_key, one cut.  The per-area gate is dropped
    # because it was provably redundant for the RESULT: the fine
    # window [c ± 2°] is contained in coarse ring 3, so an area with
    # c3 < k has every fine ring count d_q <= c3 < k and qstar2 comes
    # back NULL exactly as the gated NULL d-columns did — r_bound,
    # branch membership and output are bit-identical (parity-gated),
    # while ungated level-2 enumeration costs 25 explode rows per area
    # of extra bounded work instead of a whole extra job.  (A
    # corpus-level "build FINE2 only when dense" gate per VERDICT r12
    # item 1 was tried first and MEASURED a no-op at every grading SF:
    # the standard mint is gate-dense at sf0.1 — 4876/5000 areas reach
    # k within coarse ring 3 — and even sf0.01 has 9 such areas, so
    # the sparse path never fired on graded data, while splitting the
    # rollup would cost dense corpora a second corpus pass at scale.)
    ring1 = F.greatest(F.abs(F.col("dx")), F.abs(F.col("dy")))
    seq1 = F.sequence(F.lit(-max_ring), F.lit(max_ring))
    level1 = (
        areas.select(
            "area_key", "fx0", "fy0", F.explode(seq1).alias("dx")
        )
        .select(
            "area_key", "fx0", "fy0", "dx", F.explode(seq1).alias("dy")
        )
        .select(
            "area_key",
            (F.col("fx0") + F.col("dx")).alias("gx"),
            (F.col("fy0") + F.col("dy")).alias("gy"),
            ring1.cast("int").alias("ring"),
        )
        .join(
            F.broadcast(
                cells.select(
                    F.col("fx").alias("gx"), F.col("fy").alias("gy"), "cnt"
                )
            ),
            ["gx", "gy"],
        )
        .select("area_key", F.lit(1).alias("lvl"), "ring", "cnt")
    )
    # Explode the level-2 window at the COARSE granularity, not the
    # fine: the fine window fx20±W2_RINGS is ⊆ the 5×5 coarse block
    # around the centroid (fx20−16 >= 8·(fx0−2) and fx20+16 <
    # 8·(fx0+3)), so joining the fine synopsis through its coarse
    # PARENT keys enumerates 25 rows per area instead of
    # (2·W2_RINGS+1)² = 1,089 — the join fans out only to OCCUPIED
    # fine cells (~10 per coarse cell on uniform corpora).  The
    # ring-≤-W2_RINGS filter reproduces the fine window exactly.
    ring2 = 2
    seq2 = F.sequence(F.lit(-ring2), F.lit(ring2))
    fine_ring = F.greatest(
        F.abs(F.col("fx2") - F.col("fx20")),
        F.abs(F.col("fy2") - F.col("fy20")),
    )
    level2 = (
        areas.select(
            "area_key", "fx0", "fy0", "fx20", "fy20",
            F.explode(seq2).alias("dx"),
        )
        .select(
            "area_key",
            "fy0",
            "fx20",
            "fy20",
            (F.col("fx0") + F.col("dx")).alias("fx"),
            F.explode(seq2).alias("dy"),
        )
        .select(
            "area_key",
            "fx20",
            "fy20",
            "fx",
            (F.col("fy0") + F.col("dy")).alias("fy"),
        )
        .join(F.broadcast(cells2), ["fx", "fy"])
        .where(fine_ring <= W2_RINGS)
        .select(
            "area_key",
            F.lit(2).alias("lvl"),
            fine_ring.cast("int").alias("ring"),
            "cnt",
        )
    )
    probe = cut(
        level1.unionByName(level2)
        .groupBy("area_key")
        .agg(
            *[
                F.sum(
                    F.when(
                        (F.col("lvl") == 1) & (F.col("ring") <= q),
                        F.col("cnt"),
                    ).otherwise(0)
                ).alias(f"c{q}")
                for q in range(max_ring + 1)
            ],
            *[
                F.sum(
                    F.when(
                        (F.col("lvl") == 2) & (F.col("ring") <= q),
                        F.col("cnt"),
                    ).otherwise(0)
                ).alias(f"d{q}")
                for q in range(W2_RINGS + 1)
            ],
        )
    )
    sqrt2 = 1.4142135623730951
    qstar1 = first_ring_reaching_k("c", max_ring)
    qstar2 = first_ring_reaching_k("d", W2_RINGS)
    r1 = F.when(
        qstar1.isNotNull(), (qstar1 + 1) * F.lit(FINE_DEG * sqrt2)
    )
    r2 = F.when(
        qstar2.isNotNull(), (qstar2 + 1) * F.lit(FINE2_DEG * sqrt2)
    )
    # least() skips NULLs: an area the level-2 window can't bound falls
    # back to r1, and one with < k points inside max_ring probes out to
    # R.  bounded is a narrow projection OFF the checkpointed probe —
    # cheap per consumer, no second cut needed.
    r_bound = F.least(F.lit(RADIUS_DEG), r1, r2)
    bounded = probe.select("area_key", r_bound.alias("r_bound"))
    d2 = (F.col("pt_lat") - F.col("c_lat")) * (
        F.col("pt_lat") - F.col("c_lat")
    ) + (F.col("pt_lon") - F.col("c_lon")) * (
        F.col("pt_lon") - F.col("c_lon")
    )

    def enumerate_cells(ar, cell_deg, x0, y0, gx_src, gy_src, lim_cap):
        """Explode each area's candidate cell window at one grid level
        (column-valued sequence bounded by the area's own r_bound)."""
        ring_lim = F.least(
            F.floor(F.col("r_bound") / cell_deg).cast("int") + 1,
            F.lit(lim_cap),
        )
        return (
            ar.withColumn("ring_lim", ring_lim)
            .select(
                "area_key",
                "c_lat",
                "c_lon",
                "r_bound",
                y0,
                "ring_lim",
                F.explode(
                    F.sequence(
                        F.col(x0) - F.col("ring_lim"),
                        F.col(x0) + F.col("ring_lim"),
                    )
                ).alias(gx_src),
            )
            .select(
                "area_key",
                "c_lat",
                "c_lon",
                "r_bound",
                gx_src,
                F.explode(
                    F.sequence(
                        F.col(y0) - F.col("ring_lim"),
                        F.col(y0) + F.col("ring_lim"),
                    )
                ).alias(gy_src),
            )
        )

    with_bounds = areas.join(bounded, "area_key")
    dense_cutoff = W2_RINGS * FINE2_DEG  # level-2 enumeration range
    dense_cells = enumerate_cells(
        with_bounds.where(F.col("r_bound") <= dense_cutoff),
        FINE2_DEG,
        "fx20",
        "fy20",
        "fx2",
        "fy2",
        W2_RINGS + 1,
    )
    sparse_cells = enumerate_cells(
        with_bounds.where(F.col("r_bound") > dense_cutoff),
        FINE_DEG,
        "fx0",
        "fy0",
        "fx",
        "fy",
        max_ring,
    )
    keep = (d2 <= RADIUS_DEG * RADIUS_DEG) & (
        d2 <= F.col("r_bound") * F.col("r_bound")
    )
    return (
        pts.join(dense_cells, ["fx2", "fy2"])
        .where(keep)
        .select("area_key", "site_key", d2.alias("d2")),
        pts.join(sparse_cells, ["fx", "fy"])
        .where(keep)
        .select("area_key", "site_key", d2.alias("d2")),
    )


#: Largest key the GEO8b mint compresses into the dense window.  A
#: FIXED window + a FIXED finest grid + a linearly-growing clustered
#: population would make per-area candidate work Θ(N) once every
#: FINE2 cell holds ≫ k points (exact kNN must score every point in
#: the covering cells — the density floor of any finite-level
#: synopsis, measured: the uncapped mint OOM'd a 16 GB gen_sf10
#: probe).  Capping the clustered keys bounds the window at ≤ 10,000
#: locations at ANY corpus size — below every grading SF's key range
#: (sf0.1 = 15,000 customers), so the driver-graded answer is
#: unchanged while decade probes stay runnable forever.
_CLUSTER_KEY_CAP = 20_000


def _cluster_even_keys(promoted: DataFrame) -> DataFrame:
    """Compress every EVEN-keyed location (sites and areas alike) up to
    ``_CLUSTER_KEY_CAP`` into a dense 2°×2° window with the affine map
    lat → 10.0 + (lat + 90.0)/90.0, lon → 20.0 + (lon + 180.0)/180.0;
    odd keys keep their global positions.  The even half of the corpus
    then carries FINE2-scale density (≥ 2 points per eighth-degree cell
    at the grading SF) while the odd half stays sparse — so ONE mint
    exercises BOTH GEO8 enumeration branches.  The map is two exact
    double literals per axis applied in a fixed order; DuckDB replays
    it bit-for-bit (every operand is DOUBLE from the first add, so no
    DECIMAL arithmetic path opens up — the GEO7b literal discipline)."""
    k = F.regexp_extract(F.col("key"), "([0-9]+)$", 1).cast("long")
    even = ((k % 2) == 0) & (k <= _CLUSTER_KEY_CAP)

    def tlat(c: Column) -> Column:
        return F.lit(10.0) + ((c + F.lit(90.0)) / F.lit(90.0))

    def tlon(c: Column) -> Column:
        return F.lit(20.0) + ((c + F.lit(180.0)) / F.lit(180.0))

    def pick(col: str, t) -> Column:
        return (
            F.when(even, t(F.col(col))).otherwise(F.col(col)).alias(col)
        )

    return promoted.select(
        "key",
        "kind",
        pick("pt_lat", tlat),
        pick("pt_lon", tlon),
        pick("lat_min", tlat),
        pick("lat_max", tlat),
        pick("lon_min", tlon),
        pick("lon_max", tlon),
    )


#: The even-key cluster transform as DuckDB SQL (exactly the Spark
#: expression order: literal + ((bound + literal) / literal)).
_CLUSTER_LAT_SQL = (
    "CASE WHEN (CAST(regexp_extract(key, '([0-9]+)$', 1) AS BIGINT)"
    " % 2) = 0 AND CAST(regexp_extract(key, '([0-9]+)$', 1) AS BIGINT)"
    " <= 20000 THEN CAST(10 AS DOUBLE)"
    " + (({c} + CAST(90 AS DOUBLE)) / CAST(90 AS DOUBLE))"
    " ELSE {c} END"
)
_CLUSTER_LON_SQL = (
    "CASE WHEN (CAST(regexp_extract(key, '([0-9]+)$', 1) AS BIGINT)"
    " % 2) = 0 AND CAST(regexp_extract(key, '([0-9]+)$', 1) AS BIGINT)"
    " <= 20000 THEN CAST(20 AS DOUBLE)"
    " + (({c} + CAST(180 AS DOUBLE)) / CAST(180 AS DOUBLE))"
    " ELSE {c} END"
)


@query(
    "GEO8b_nearest_topk_dense",
    oracle=f"""
    WITH {CTX_ORACLE_CTE},
    pts AS (
      SELECT key,
             {_CLUSTER_LAT_SQL.format(c='pt_lat')} AS pt_lat,
             {_CLUSTER_LON_SQL.format(c='pt_lon')} AS pt_lon
      FROM ctx_promoted
      WHERE kind IN ('Site', 'SiteDMS')
    ),
    areas AS (
      -- transform EACH bound, then average: the Spark side computes
      -- the centroid from the transformed bbox, and IEEE addition does
      -- not commute with the affine map
      SELECT key AS area_key,
             ({_CLUSTER_LAT_SQL.format(c='lat_min')}
              + {_CLUSTER_LAT_SQL.format(c='lat_max')}) / 2.0 AS c_lat,
             ({_CLUSTER_LON_SQL.format(c='lon_min')}
              + {_CLUSTER_LON_SQL.format(c='lon_max')}) / 2.0 AS c_lon
      FROM ctx_promoted WHERE kind = 'Area'
    ),
    cand AS (
      SELECT a.area_key, p.key AS site_key,
             (p.pt_lat - a.c_lat) * (p.pt_lat - a.c_lat)
             + (p.pt_lon - a.c_lon) * (p.pt_lon - a.c_lon) AS d2
      FROM areas a JOIN pts p
        ON (p.pt_lat - a.c_lat) * (p.pt_lat - a.c_lat)
           + (p.pt_lon - a.c_lon) * (p.pt_lon - a.c_lon)
           <= {RADIUS_DEG * RADIUS_DEG}
    ),
    ranked AS (
      SELECT area_key, site_key, d2,
             ROW_NUMBER() OVER (PARTITION BY area_key
                                ORDER BY d2, site_key) AS rk
      FROM cand
    )
    SELECT area_key, CAST(rk AS BIGINT) AS rk, site_key,
           {sql_dquant('d2')} AS d2
    FROM ranked WHERE rk <= {NEAREST_K}
    ORDER BY area_key, rk
    """,
)
def geo8b_nearest_topk_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEO8 on a DENSITY-SPLIT mint: even-keyed locations compressed
    into one 2°×2° window, odd keys left at their global spread
    (``_cluster_even_keys``).  On the standard mint the grading SF
    never selects the FINE2 enumeration branch (measured sf0.01:
    0 dense candidates — every area's r_bound stays coarse), so the
    GEO8 driver row proves only the sparse path — the exact
    hollow-grade pattern VERDICT r11 found for GEO7's boundary branch.
    Here the clustered half puts ≥ k points within a few eighth-degree
    rings of every even area (dense branch), while the scattered half
    keeps coarse bounds (sparse branch) — non-hollowness of BOTH
    branches on this mint is pinned by tests, and the oracle is the
    same brute-force radius join + rank over the transformed
    coordinates, so the driver grade proves the multi-resolution
    pruning cuts no true top-k row at either density.  The clustered
    population is capped at ``_CLUSTER_KEY_CAP`` keys (identical below
    sf≈0.13, i.e. at every grading SF) so the adversarial window's
    density is bounded at any corpus size — see the cap's comment for
    the Θ(cell-density) floor it sidesteps."""
    return nearest_topk(
        _cluster_even_keys(_promoted_spread(spark, sf_dir))
    )


@query(
    "GEO9_density_store",
    oracle=f"""
    WITH {CTX_ORACLE_CTE}
    SELECT CAST(FLOOR(pt_lon / {GRID_DEG}) AS BIGINT) AS cx,
           CAST(FLOOR(pt_lat / {GRID_DEG}) AS BIGINT) AS cy,
           COUNT(*) AS n_sites,
           {sql_davg('pt_lat')} AS mean_lat,
           {sql_davg('pt_lon')} AS mean_lon,
           'contextnode_' || MIN(CAST(regexp_extract(key, '([0-9]+)$', 1)
                                      AS BIGINT)) AS sample_site
    FROM ctx_promoted
    WHERE kind IN ('Site', 'SiteDMS')
    GROUP BY cx, cy
    ORDER BY cx, cy
    """,
)
def geo9_density_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GEO5 density map MAINTAINED AT INGEST as a driver row (the
    W16/T41/T42/T44/D15 pattern — the SPATIAL member of the
    synopsis-store family, which had maintainers for every other
    synopsis but not the map view): drain the promoted context rows
    through ``run_grid_density`` as three real micro-batches and read
    the maintained per-cell store back; the oracle is GEO5's one-shot
    batch rollup, so stream-built ≡ batch-built is graded by the driver
    on the exact cells a map overview reads.

    Add-mergeability is the whole design: per-cell COUNT and
    floor-scaled coordinate SUMS add under union (davg floors per ROW,
    so stream-merged means equal batch means bit-for-bit — the same
    identity that makes davg order-insensitive), the sample site merges
    by MIN, and the store stays <= (360/G)x(180/G) rows no matter how
    much history streamed through.  Replay safety is the CM (lineage,
    batch_id) stamp — grouped sums would double-count a replayed
    batch, so one is skipped, not re-merged."""
    import shutil
    import tempfile

    from biodiversity_graph_db_spark.streaming.ingest import (
        drain_parquet_batches,
        run_grid_density,
    )

    promoted = promote_context_cols(mint_context_nodes(spark, sf_dir))
    feed = promoted.select("key", "kind", "pt_lat", "pt_lon").withColumn(
        "ck", F.regexp_extract(F.col("key"), "([0-9]+)$", 1).cast("long")
    )
    tmp = tempfile.mkdtemp(prefix="geo9_density_")
    try:
        drain_parquet_batches(
            feed,
            "ck",
            lambda s: run_grid_density(s, f"{tmp}/store", f"{tmp}/ckpt"),
            tmp,
        )
        store = spark.read.parquet(f"{tmp}/store")
        return (
            store.select(
                "cx",
                "cy",
                "n_sites",
                (F.col("lat_ssum") / F.col("n_sites") / 10000.0).alias(
                    "mean_lat"
                ),
                (F.col("lon_ssum") / F.col("n_sites") / 10000.0).alias(
                    "mean_lon"
                ),
                F.concat(F.lit("contextnode_"), F.col("min_site")).alias(
                    "sample_site"
                ),
            )
            .orderBy("cx", "cy")
            .localCheckpoint()  # materialize before the store dir dies
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
