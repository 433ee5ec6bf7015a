"""GraphFrames-style motif finding, compiled to DataFrame joins.

The reference's multi-hop views (SURVEY §2.3 J2/J6; Library.fs:842-902,
1900-1921) are structural patterns over the evidence graph — exactly
what GraphFrames ``find("(a)-[e]->(b); (b)-[f]->(c)")`` expresses.
GraphFrames is not importable here, so this module compiles the same
pattern language onto the ``edges`` table directly:

- pattern   := term (';' term)*
- term      := '(' var ')' '-[' [evar] [':' Relation] ']->' '(' var ')'
- each term becomes one scan of ``edges`` (partition-pruned when a
  relation literal is given); repeated node variables become equi-join
  conditions; the result has one key column per node variable and one
  relation column per named edge variable.

The compiled plan is a left-deep chain of hash joins — Catalyst reorders
and broadcasts the small sides, which is precisely the plan the
hand-written views produce.  A motif over an N-term pattern is N-1
joins; no driver-side iteration.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TERM = re.compile(
    r"^\(\s*(?P<src>\w+)\s*\)\s*-\s*\[\s*(?P<evar>\w+)?"
    r"\s*(?::\s*(?P<rel>\w+))?\s*\]\s*->\s*\(\s*(?P<dst>\w+)\s*\)$"
)


class MotifError(ValueError):
    pass


def _parse(pattern: str) -> list[dict[str, str | None]]:
    terms = []
    for raw in pattern.split(";"):
        raw = raw.strip()
        if not raw:
            continue
        m = _TERM.match(raw)
        if not m:
            raise MotifError(f"unparseable motif term: {raw!r}")
        terms.append(m.groupdict())
    if not terms:
        raise MotifError("empty motif pattern")
    return terms


def find(edges: DataFrame, pattern: str) -> DataFrame:
    """Match a motif pattern against (source_key, sink_key, relation)
    edges; returns one row per embedding with node-variable key columns
    (and ``<evar>_relation`` columns for named edge variables)."""
    terms = _parse(pattern)
    result: DataFrame | None = None
    bound: set[str] = set()
    out_cols: list[str] = []

    for i, t in enumerate(terms):
        e = edges
        if t["rel"]:
            e = e.where(F.col("relation") == t["rel"])
        cols = [
            F.col("source_key").alias(f"__src{i}"),
            F.col("sink_key").alias(f"__dst{i}"),
        ]
        if t["evar"]:
            cols.append(F.col("relation").alias(f"{t['evar']}_relation"))
        e = e.select(*cols)

        if result is None:
            result = e
        else:
            conds = []
            if t["src"] in bound:
                conds.append(F.col(t["src"]) == F.col(f"__src{i}"))
            if t["dst"] in bound:
                conds.append(F.col(t["dst"]) == F.col(f"__dst{i}"))
            if not conds:
                raise MotifError(
                    f"term {i} shares no variable with earlier terms "
                    "(cartesian motifs unsupported)"
                )
            cond = conds[0]
            for c in conds[1:]:
                cond = cond & c
            result = result.join(e, cond)

        # promote this term's endpoints to named columns
        for var, tmp in ((t["src"], f"__src{i}"), (t["dst"], f"__dst{i}")):
            if var in bound:
                result = result.drop(tmp)
            else:
                result = result.withColumnRenamed(tmp, var)
                bound.add(var)
                out_cols.append(var)
        if t["evar"]:
            out_cols.append(f"{t['evar']}_relation")

    assert result is not None
    return result.select(*out_cols)
