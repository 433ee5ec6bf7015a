"""Value-level validation ("smart constructors", SURVEY §1.4) as pure
Column expressions — the reference wraps every field in a validating
constructor; here each rule is a boolean/parse expression applied at
ingest, with failures routed to a quarantine DataFrame instead of
raising (100 TB ingest can't stop on one bad row).

Regexes are kept byte-identical to the reference so keys/parses agree:

- Author      /root/reference/src/BiodiversityCoder.Core/Types.fs:265-282
- DOI         Types.fs:318-325
- IntRange    Types.fs:343-351
- Percent     Types.fs:369-372
- lat/lon     Types.fs:402-408
- DMS coord   Types.fs:415-418
- WKT polygon Types.fs:453-481
- Depth       Types.fs:501-502
- ShortText   Types.fs:204-209
- month       Types.fs:661-674
- index type  Datasets.fs:35-44

Everything stays JVM-side (regexp_*, try_cast, higher-order array
functions) so validation rides inside whole-stage codegen on the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Types.fs:265 — verbatim (.NET [A-z] and [\.| ] classes are valid Java
# and RE2 syntax, so Spark and DuckDB search identically).
AUTHOR_REGEX = (
    r"(\S+) ?([A-z]*), ?([A-z]){1}[\.| ]{0,2}([A-z]){0,1}[\.| ]{0,2}([A-z]){0,1}"
)
# Types.fs:318
DOI_REGEX = r"(10.\d{4,9}\/[-._;()\/:A-Za-z0-9]+)"
# Types.fs:343
INT_RANGE_REGEX = r"^([0-9]+) - ([0-9]+)"
# Types.fs:415-418 (single-quoted verbatim; matches 40°26'46"N,79°01'00"W)
DMS_REGEX = (
    "^([0-9]{1,2})[:|°]([0-9]{1,2})[:|'|′]?([0-9]{1,2}(?:\\.[0-9]+){0,1})?"
    "[\"|″]([N|S]),([0-9]{1,3})[:|°]([0-9]{1,2})[:|'|′]?"
    "([0-9]{1,2}(?:\\.[0-9]+){0,1})?[\"|″]([E|W])$"
)
# Types.fs:455
WKT_POLYGON_REGEX = r"^POLYGON[ ]?\(\((.*)\)\)"

MONTHS = (
    "Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec",
)


# --- text -----------------------------------------------------------------

def text_valid(col: Column) -> Column:
    """Text.create: non-empty (Types.fs:211-214)."""
    return col.isNotNull() & (F.length(col) > 0)


def short_text_valid(col: Column) -> Column:
    """Text.createShort: non-empty, ≤ 100 chars (Types.fs:204-209)."""
    return text_valid(col) & (F.length(col) <= 100)


# --- authors --------------------------------------------------------------

def author_valid(col: Column) -> Column:
    return col.rlike(AUTHOR_REGEX)


def author_surname(col: Column) -> Column:
    return F.regexp_extract(col, AUTHOR_REGEX, 1)


def author_initials(col: Column) -> Column:
    """The up-to-three initial letters, joined with '. ' exactly like
    Author.Display (Types.fs:295-298): 'Smith, J. A' style."""
    parts = F.array(
        *[F.regexp_extract(col, AUTHOR_REGEX, g) for g in (3, 4, 5)]
    )
    return F.concat_ws(". ", F.filter(parts, lambda p: p != ""))


def author_display(col: Column) -> Column:
    """'{LastName}, {initials}' (Types.fs:295-298)."""
    return F.when(
        author_valid(col),
        F.concat_ws(", ", author_surname(col), author_initials(col)),
    )


# --- identifiers / ranges / numbers ---------------------------------------

def doi_extract(col: Column) -> Column:
    """First DOI match, '' if none (Types.fs:318-325)."""
    return F.regexp_extract(col, DOI_REGEX, 1)


def doi_valid(col: Column) -> Column:
    return doi_extract(col) != ""


def int_range_parse(col: Column) -> Column:
    """'12 - 14' → struct(lo, hi) with lo ≤ hi, null on no-match
    (Types.fs:343-351)."""
    a = F.regexp_extract(col, INT_RANGE_REGEX, 1)
    b = F.regexp_extract(col, INT_RANGE_REGEX, 2)
    lo = F.least(a.cast("int"), b.cast("int"))
    hi = F.greatest(a.cast("int"), b.cast("int"))
    return F.when(a != "", F.struct(lo.alias("lo"), hi.alias("hi")))


def percent_create(col: Column) -> Column:
    """[0,1] → ×100, else null (Types.fs:369-372)."""
    return F.when(col.between(0.0, 1.0), col * 100.0)


def try_int(col: Column) -> Column:
    return col.try_cast("int")


def try_double(col: Column) -> Column:
    return col.try_cast("double")


# --- geo ------------------------------------------------------------------

def lat_valid(col: Column) -> Column:
    """createLatitude: [-89.9, 89.9] (Types.fs:402-404)."""
    return col.between(-89.9, 89.9)


def lon_valid(col: Column) -> Column:
    """createLongitude: [-180, 180] (Types.fs:406-408)."""
    return col.between(-180.0, 180.0)


def dms_valid(col: Column) -> Column:
    return col.rlike(DMS_REGEX)


def wkt_polygon_points(col: Column) -> Column:
    """WKT 'POLYGON((lon lat, …))' → array<struct<lon,lat>> (null entries
    where a pair fails to parse) — Types.fs:453-481.  Production swaps
    this for Sedona ST_GeomFromWKT; the validation contract is the same."""
    inner = F.regexp_extract(col, WKT_POLYGON_REGEX, 1)
    pairs = F.transform(
        F.split(inner, ","),
        lambda p: F.struct(
            F.element_at(F.split(F.trim(p), " "), 1)
            .try_cast("double")
            .alias("lon"),
            F.element_at(F.split(F.trim(p), " "), 2)
            .try_cast("double")
            .alias("lat"),
        ),
    )
    return F.when(inner != "", pairs)


def wkt_polygon_valid(col: Column) -> Column:
    """Matched, ≥3 points, every pair parsed and in bounds."""
    pts = wkt_polygon_points(col)
    all_ok = F.forall(
        pts,
        lambda p: p["lon"].isNotNull()
        & p["lat"].isNotNull()
        & lat_valid(p["lat"])
        & lon_valid(p["lon"]),
    )
    return pts.isNotNull() & (F.size(pts) >= 3) & all_ok


# --- misc domains ---------------------------------------------------------

def depth_valid(col: Column) -> Column:
    """createDepth: ≥ 0 (Types.fs:501-502)."""
    return col >= 0.0


def simple_date(col: Column) -> Column:
    """SimpleDateOnly.TryCreate: ISO date or null (Types.fs:101-108)."""
    return F.try_to_timestamp(col, F.lit("yyyy-MM-dd")).cast("date")


def month_name(col: Column) -> Column:
    """asMonth 1-12 → Jan..Dec else null (Types.fs:661-674)."""
    arr = F.array(*[F.lit(m) for m in MONTHS])
    return F.when(col.between(1, 12), F.element_at(arr, col.cast("int")))


def index_column_type(col: Column) -> Column:
    """DataTable header → Depths/BP/CalYrBP/AD/BC else null
    (Datasets.fs:35-44)."""
    s = F.lower(col)
    return (
        F.when(s == "depth", F.lit("Depths"))
        .when(s.isin("year before present", "bp"), F.lit("BP"))
        .when(
            s.isin("calendar year before present", "cal yr bp"),
            F.lit("CalYrBP"),
        )
        .when(s == "ad", F.lit("AD"))
        .when(s == "bc", F.lit("BC"))
    )


# --- quarantine -----------------------------------------------------------

def quarantine(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Apply named validation rules; return (valid, quarantined).

    ``quarantined`` carries a ``failed_rules`` array naming every rule
    the row broke.  One pass, no shuffle: the rule expressions are plain
    columns, so both outputs are filters over the same scan and Catalyst
    pushes whatever it can into the file read.
    """
    failed = F.filter(
        F.array(
            *[
                F.when(~F.coalesce(rule, F.lit(False)), F.lit(name)).otherwise(
                    F.lit(None)
                )
                for name, rule in rules.items()
            ]
        ),
        lambda x: x.isNotNull(),
    )
    tagged = df.withColumn("failed_rules", failed)
    valid = tagged.where(F.size("failed_rules") == 0).drop("failed_rules")
    bad = tagged.where(F.size("failed_rules") > 0)
    return valid, bad
