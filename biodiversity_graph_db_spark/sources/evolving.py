"""Schema-drift-tolerant parquet source (S15) — the arrival-side
robustness layer: a long-lived ingest directory accumulates batches
written by EVOLVING producers (new optional columns appear, old ones
stop being written).  The reference's typed DU model makes drift a
compile error; an engine ingesting external parquet has to absorb it
at read time instead.

Policy (the Delta Lake "schema evolution, not schema drift" rule):

- columns ADDED by newer batches surface as nulls on older rows
  (parquet ``mergeSchema`` union);
- columns REQUIRED by the caller but absent everywhere are filled as
  typed nulls (a contract column the producers have not started
  writing yet);
- a TYPE CONFLICT between batches is an error, never a silent cast —
  Spark's mergeSchema raises; we surface the failure instead of
  coercing (a silently double-read int column corrupts every
  downstream aggregate).

Scale note: ``mergeSchema`` reads every part file's FOOTER at plan
time — at 100 TB that is the known cost of schema-on-read over a
drifting directory, paid once per query; the production fix is a
metastore/Delta log that tracks the merged schema centrally, which is
exactly what this helper's contract prepares for (same read semantics,
cheaper schema resolution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_evolving_parquet(
    spark: SparkSession, path: str, contract: StructType | None = None
) -> DataFrame:
    """Read a mixed-schema parquet directory as ONE DataFrame.

    With a ``contract`` schema: the result has exactly the contract's
    columns in contract order — missing ones typed-null-filled, extra
    ones dropped (they remain readable by callers without a contract),
    and any contract column present with a CONFLICTING type raises.
    """
    df = spark.read.option("mergeSchema", True).parquet(path)
    if contract is None:
        return df
    have = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for f in contract.fields:
        if f.name not in have:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        elif have[f.name] != f.dataType:
            raise TypeError(
                f"column {f.name!r}: stored type {have[f.name]} conflicts "
                f"with contract {f.dataType} — refusing to coerce"
            )
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)
