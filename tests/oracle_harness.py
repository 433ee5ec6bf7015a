"""Local replica of the driver's correctness gate.

Runs a registered Spark query and its DuckDB oracle on the same parquet
tables, then compares: row count, column-name set, and order-insensitive
cell values (columns sorted by name, rows sorted, values normalized to
canonical strings — the strictest plausible form of the driver's hash).
"""

from __future__ import annotations

import datetime
import math

import duckdb

from biodiversity_graph_db_spark.tables import TABLES


def _norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, (datetime.datetime,)):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _normalize(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple[str, ...]]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)
    return sorted_cols, out


# --- type-kind comparison -------------------------------------------------
# The driver hashes values *after* a pandas conversion, where DuckDB HUGEINT
# (the default type of SUM over integers) arrives as float64 and renders
# "3549.0" while Spark BIGINT renders "3549" — a hash mismatch with identical
# values (round-2 T4).  Collapse both sides' column types to coarse kinds
# that mirror that rendering, and fail the gate on any kind mismatch.

def _kind_spark(dtype: str) -> str:
    d = dtype.lower()
    if d in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if d in ("float", "double") or d.startswith("decimal"):
        return "float"
    if d == "boolean":
        return "bool"
    if d == "string":
        return "str"
    if d == "date":
        return "date"
    if d.startswith("timestamp"):
        return "timestamp"
    if d.startswith("array"):
        return "list"
    if d == "binary":
        return "bytes"
    return "other"


def _kind_duck(typ: str) -> str:
    t = str(typ).upper()
    if t.endswith("[]") or t.startswith("LIST") or t.startswith("ARRAY"):
        return "list"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    # HUGEINT deliberately maps to float: pandas has no int128, so the
    # driver's conversion degrades it to float64 and the hash diverges
    # from a Spark BIGINT even when every value is identical.
    if t in ("HUGEINT", "DOUBLE", "FLOAT", "REAL") or t.startswith("DECIMAL"):
        return "float"
    if t == "BOOLEAN":
        return "bool"
    if t == "VARCHAR":
        return "str"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t == "BLOB":
        return "bytes"
    return "other"


def compare_kinds(name: str, s_cols, s_dtypes, d_cols, d_types) -> None:
    s_kinds = {c: _kind_spark(t) for c, t in zip(s_cols, s_dtypes)}
    d_kinds = {c: _kind_duck(t) for c, t in zip(d_cols, d_types)}
    bad = [
        (c, s_kinds[c], d_kinds[c])
        for c in sorted(set(s_kinds) & set(d_kinds))
        if s_kinds[c] != d_kinds[c]
    ]
    assert not bad, (
        f"{name}: column type-kind mismatch (col, spark, duckdb): {bad} — "
        "the driver's hash stringifies through pandas, so e.g. a DuckDB "
        "HUGEINT (bare SUM over ints) never hash-matches a Spark BIGINT; "
        "CAST the oracle column."
    )


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def compare(spark, sf_dir: str, name: str, spark_fn, sql: str) -> None:
    sdf = spark_fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_conn(sf_dir)
    try:
        rel = con.sql(sql)
        d_cols = list(rel.columns)
        d_types = [str(t) for t in rel.types]
        d_rows = rel.fetchall()
    finally:
        con.close()

    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    compare_kinds(name, s_cols, [t for _, t in sdf.dtypes], d_cols, d_types)
    sc, sr = _normalize(s_cols, s_rows)
    dc, dr = _normalize(d_cols, d_rows)
    assert sc == dc, f"{name}: columns spark={sc} duckdb={dc}"
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(sr, dr)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
    )
