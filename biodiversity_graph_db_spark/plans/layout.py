"""Physical-layout utilities for 100 TB discipline.

Two levers that matter at cluster scale and cost nothing to adopt in the
table design:

- **Bucketing** — pre-shuffle both sides of a recurring join into the
  same bucket layout so the join is Exchange-free at read time.  The
  graph tables join on ``key``/``source_key`` constantly (every J2/J6
  view); bucketed by key, a 1000-executor join needs zero network.
- **Salted join** — manual skew mitigation for the pathological key
  (e.g. the Life taxon ancestor, a viral document cluster): spread the
  hot key across N sub-partitions by salting the fact side and
  exploding the dim side.  AQE's skew-join handles sort-merge cases
  automatically; salting covers aggregations and the joins AQE can't
  split (e.g. after a user-forced repartition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str,
    n_buckets: int = 32,
) -> None:
    """Persist as a bucketed+sorted catalog table.  Both sides of a
    co-located join must use the same key and bucket count."""
    (
        df.write.bucketBy(n_buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(name)
    )


def bucketed_join(
    spark, left_name: str, right_name: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed tables — Catalyst reads the bucket
    spec and elides both Exchanges (verified in tests/test_plans.py)."""
    return spark.table(left_name).join(spark.table(right_name), key, how)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: fact rows get a deterministic salt in
    [0, n_salt); every dim row is replicated once per salt value; the
    join key becomes (key, salt) so one hot key spreads over n_salt
    reducers.  Dim grows n_salt× — use for genuinely small/medium dims
    (the usual shape: huge skewed fact × modest dim)."""
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*fact.columns), F.lit(n_salt)).cast("int")
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return salted_fact.join(salted_dim, [key, "_salt"], how).drop("_salt")
