"""Training-data shard export — the sink side of the pretraining
pipeline: documents leave the engine as token-budgeted JSONL shards
plus a manifest the dataloader reads instead of listing files.

Reference parity: the reference exports graph data only (Storage.fs
makeCacheFile / Graph.fs node files); a training pipeline additionally
needs its CORPUS export sharded to a token budget so every dataloader
worker gets equal work.  The shard assignment is the T15 packing model
one level up (a document belongs to the shard its per-language running
token offset falls in), so the manifest is oracle-checkable with the
same window SQL.

Scale shape: the running-offset window partitions by ``lang`` — at
100 TB the partition key becomes (lang, input-split-group) exactly as
T15 documents, so no single-partition window funnel; the JSONL write
repartitions by the shard key so each shard lands as exactly ONE part
file (what the dataloader contract wants) while staying a parallel
write across shards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biodiversity_graph_db_spark.extensions.textstats import token_count
from biodiversity_graph_db_spark.operators._util import cut
from biodiversity_graph_db_spark.registry import query
from biodiversity_graph_db_spark.tables import table

SHARD_TOKENS = 4096  # token budget per output shard


def shard_assign(docs: DataFrame, shard_tokens: int = SHARD_TOKENS) -> DataFrame:
    """(doc_id, lang, text, ...) → + (n_tokens, shard_id): greedy
    concat-order packing per language — a doc belongs to the shard its
    running start offset falls in (the T15 bin model with a shard-sized
    budget)."""
    from pyspark.sql import Window

    d = docs.withColumn("n_tokens", token_count(F.trim(F.col("text"))))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return d.withColumn(
        "shard_id", F.floor(off / float(shard_tokens)).cast("bigint")
    )


def shard_manifest(docs: DataFrame, shard_tokens: int = SHARD_TOKENS) -> DataFrame:
    """Per-shard manifest: document/token/byte totals and the doc_id
    range — what a dataloader consumes instead of listing files."""
    return (
        shard_assign(docs, shard_tokens)
        .groupBy("lang", "shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum("n_chars").cast("long").alias("n_bytes"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("lang", "shard_id")
    )


@query(
    "EX2_shard_manifest",
    oracle=f"""
    WITH d AS (
      SELECT lang, doc_id, n_chars,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens
      FROM documents
    ),
    o AS (
      SELECT lang, doc_id, n_chars, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS off
      FROM d
    )
    SELECT lang,
           CAST(FLOOR(off / {SHARD_TOKENS}.0) AS BIGINT) AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS n_bytes,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id
    FROM o
    GROUP BY lang, shard_id
    ORDER BY lang, shard_id
    """,
)
def ex2_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shard manifest for the whole documents table at the
    SHARD_TOKENS budget — the dataloader-facing summary of what
    ``export_training_shards`` writes (same assignment, verified
    against the same window SQL as T15)."""
    return shard_manifest(table(spark, sf_dir, "documents"))


def export_training_shards(
    docs: DataFrame, out_dir: str, shard_tokens: int = SHARD_TOKENS
) -> None:
    """Write the corpus as JSONL training shards plus a parquet
    manifest:

    - ``{out_dir}/shards/lang=L/shard_id=N/part-*.json`` — one part
      file per shard (the repartition key IS the directory key, so
      each shard's rows land in exactly one task's file), rows carry
      (doc_id, text, n_tokens) in doc_id order within the file.
    - ``{out_dir}/manifest/`` — the ``shard_manifest`` table.

    The write stays distributed across shards; no coalesce(1) funnel
    anywhere (single-file-per-shard comes from the partition key, not
    a global repartition to 1)."""
    assigned = cut(shard_assign(docs, shard_tokens))
    (
        assigned.repartition("lang", "shard_id")
        .sortWithinPartitions("doc_id")
        .select("lang", "shard_id", "doc_id", "text", "n_tokens")
        .write.mode("overwrite")
        .partitionBy("lang", "shard_id")
        .json(f"{out_dir}/shards")
    )
    (
        assigned.groupBy("lang", "shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum("n_chars").cast("long").alias("n_bytes"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .write.mode("overwrite")
        .parquet(f"{out_dir}/manifest")
    )
