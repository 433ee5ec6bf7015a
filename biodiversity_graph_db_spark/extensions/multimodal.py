"""Multimodal columns (BASELINE.json mandate): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched Pandas
UDFs over ``mapInPandas``.

The Spark-side plumbing — schema, partitioning, UDF signature, batch
shape — is real and tested.  The actual codec step is STUBBED: this
container has no image/audio libraries, so ``decode_media`` computes
deterministic fake features (documented below) and ``decode_media_real``
raises NotImplementedError where PIL/ffmpeg would be called.

At 100 TB: media rows are large and skew-prone → keep binary in its own
column (parquet stores it contiguously), repartition by a size-aware key
before the UDF stage, and cap ``spark.sql.execution.arrow.maxRecordsPerBatch``
so a batch of 4K images doesn't blow executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media", BinaryType(), True),          # opaque payload
        StructField("media_type", StringType(), True),     # image|audio|video
        StructField("codec", StringType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("checksum", StringType(), True),
        StructField("feature_0", LongType(), True),
        StructField("feature_1", LongType(), True),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents table (the testbed stand-in
    for real image/audio blobs): text bytes become the opaque payload."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("media"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.lit("raw").alias("codec"),
        F.length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
    )


def _fake_features(blob: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decoded features: byte-sum and a simple
    rolling hash — stable across runs/engines, so tests can assert."""
    s = 0
    h = 0
    for b in blob:
        s += b
        h = (h * 31 + b) % 1_000_000_007
    return s, h


def decode_media(df: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """mapInPandas decode stage: Arrow batches in, feature rows out.
    Swap ``_fake_features`` for a real codec (PIL resize, ffmpeg frame
    sample) without touching the plumbing."""
    import hashlib

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_features(m if m is not None else b"") for m in pdf["media"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "checksum": [
                        hashlib.md5(m if m is not None else b"").hexdigest()
                        for m in pdf["media"]
                    ],
                    "feature_0": [f[0] for f in feats],
                    "feature_1": [f[1] for f in feats],
                }
            )

    return df.mapInPandas(decode, schema=FEATURES_SCHEMA)


from biodiversity_graph_db_spark.operators._util import cut
from biodiversity_graph_db_spark.registry import query
from biodiversity_graph_db_spark.tables import table


@query(
    "MM1_media_decode_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                           ELSE 'video' END AS media_type,
           CAST(length(text) AS BIGINT) AS n_bytes,
           md5(text) AS checksum
    FROM documents WHERE doc_id < 100
    ORDER BY media_id
    """,
)
def mm1_media_decode_metadata(spark, sf_dir: str) -> DataFrame:
    """The multimodal decode pipeline end-to-end through mapInPandas
    (Arrow batches): binary payload → checksum + typed metadata.  The
    DuckDB oracle reproduces the metadata columns; the fake decoded
    features are asserted in tests/test_extensions.py (codecs stubbed —
    see module docstring)."""
    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    media = media_from_documents(docs)
    return (
        decode_media(media)
        .select("media_id", "media_type", "n_bytes", "checksum")
        .orderBy("media_id")
    )


FRAME_STRIDE = 64   # fake codec: one "frame" every 64 payload bytes
FRAME_BYTES = 32    # each frame = the first 32 bytes of its stride window

FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame", BinaryType(), True),
        StructField("frame_len", LongType(), True),
        StructField("frame_checksum", StringType(), True),
    ]
)


def sample_frames(df: DataFrame) -> DataFrame:
    """Video frame-sampling stage: one output row per sampled frame —
    the real mapInPandas plumbing (Arrow batches in, exploded frame rows
    out, 1→N row fan-out inside the kernel, exactly the shape an ffmpeg
    ``-vf fps=`` sampler produces).  The CODEC is the deterministic fake:
    frame i = payload[i·stride : i·stride+frame_bytes] — swap the slicing
    for real decode without touching schema/batching.  At 100 TB the
    fan-out multiplies row counts ~duration×fps, so this stage runs after
    a size-aware repartition and before any wide shuffle."""
    import hashlib

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs, lens, sums = [], [], [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                blob = blob if blob is not None else b""
                n = (len(blob) + FRAME_STRIDE - 1) // FRAME_STRIDE
                for i in range(n):
                    fr = blob[i * FRAME_STRIDE : i * FRAME_STRIDE + FRAME_BYTES]
                    ids.append(mid)
                    idxs.append(i)
                    blobs.append(fr)
                    lens.append(len(fr))
                    sums.append(hashlib.md5(fr).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "frame": blobs,
                    "frame_len": lens,
                    "frame_checksum": sums,
                }
            )

    return df.mapInPandas(frames, schema=FRAMES_SCHEMA)


@query(
    "MM2_frame_sample",
    oracle=f"""
    WITH vids AS (
      SELECT doc_id AS media_id, text,
             CAST(ceil(length(text) / {FRAME_STRIDE}.0) AS BIGINT) AS n_frames
      FROM documents
      WHERE doc_id < 100 AND doc_id % 3 = 2
    ),
    fr AS (
      SELECT media_id,
             unnest(generate_series(0, n_frames - 1)) AS frame_idx,
             text
      FROM vids
    )
    SELECT media_id, frame_idx,
           CAST(length(substr(text, frame_idx * {FRAME_STRIDE} + 1,
                              {FRAME_BYTES})) AS BIGINT) AS frame_len,
           md5(substr(text, frame_idx * {FRAME_STRIDE} + 1, {FRAME_BYTES}))
             AS frame_checksum
    FROM fr
    ORDER BY media_id, frame_idx
    """,
)
def mm2_frame_sample(spark, sf_dir: str) -> DataFrame:
    """Frame sampling end-to-end through the Arrow kernel: video-typed
    media rows fan out to one row per sampled frame.  The payload is the
    UTF-8 text (ASCII, so byte slices == char slices) and the oracle
    reproduces every frame's length + md5 with substr arithmetic —
    proving the 1→N kernel emits exactly the declared frame grid."""
    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    media = media_from_documents(docs).where(F.col("media_type") == "video")
    return (
        sample_frames(media)
        .select("media_id", "frame_idx", "frame_len", "frame_checksum")
        .orderBy("media_id", "frame_idx")
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("pixels", BinaryType(), True),
        StructField("checksum", StringType(), True),
    ]
)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize stage: real mapInPandas plumbing (fixed-size output
    buffer per row — the (width·height)-byte shape a PIL ``resize`` +
    ``tobytes`` emits).  FAKE kernel: nearest-neighbour sampling of the
    payload bytes onto the w×h grid (deterministic; unit-tested).  Swap
    the sampler for PIL without touching schema/batching."""
    import hashlib

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_px, out_sum = [], []
            for blob in pdf["media"]:
                blob = blob if blob is not None else b"\x00"
                n = len(blob)
                px = bytes(
                    blob[(i * n) // (width * height)]
                    for i in range(width * height)
                )
                out_px.append(px)
                out_sum.append(hashlib.md5(px).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "pixels": out_px,
                    "checksum": out_sum,
                }
            )

    return df.mapInPandas(resize, schema=RESIZED_SCHEMA)


def decode_media_real(df: DataFrame) -> DataFrame:
    """The real-codec entry point — requires PIL/soundfile/ffmpeg, which
    this environment does not ship."""
    raise NotImplementedError(
        "media codecs (PIL/ffmpeg) are not available in this container; "
        "use decode_media / sample_frames / resize_images (deterministic "
        "fakes) for plumbing tests"
    )


# --- media → embedding → ANN (the multimodal retrieval path) --------------

EMB_DIM = 16

EMBED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("embedding", ArrayType(LongType()), True),
    ]
)


def media_embeddings(df: DataFrame) -> DataFrame:
    """Arrow kernel: opaque media payload → a deterministic
    ``EMB_DIM``-dim byte-histogram embedding (the stand-in for a real
    CLIP/wav2vec encoder — swap the kernel body, keep the plumbing).
    Vectorized with numpy ``bincount`` per blob; at 100 TB this is the
    same embarrassingly-parallel mapInPandas stage as ``decode_media``,
    feeding the similarity layer's IVF index directly."""
    import numpy as np

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for m in pdf["media"]:
                b = np.frombuffer(m if m is not None else b"", dtype=np.uint8)
                embs.append(
                    np.bincount(b % EMB_DIM, minlength=EMB_DIM)
                    .astype("int64")
                    .tolist()
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["n_bytes"],
                    "embedding": embs,
                }
            )

    return df.mapInPandas(embed, schema=EMBED_SCHEMA)


@query(
    "MM3_media_embedding",
    oracle=f"""
    WITH chars AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_bytes,
             list_transform(string_split(text, ''),
                            ch -> unicode(ch)) AS codes
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id AS media_id, n_bytes,
           CAST(gs.b AS BIGINT) AS dim,
           CAST(len(list_filter(codes, c -> c % {EMB_DIM} = gs.b))
                AS BIGINT) AS emb_value
    FROM chars, generate_series(0, {EMB_DIM - 1}) AS gs(b)
    ORDER BY media_id, dim
    """,
)
def mm3_media_embedding(spark, sf_dir: str) -> DataFrame:
    """Media-to-embedding through the real Arrow plumbing, value-
    verified: the kernel histograms the BLOB's bytes; the oracle
    histograms the text's code points — identical on the (verified-
    ASCII) corpus, so a hash match proves the binary payload round-trip
    AND the kernel arithmetic.  The embeddings feed ``ivf_topk``
    unchanged (composition test: nearest-media retrieval,
    tests/test_extensions.py).

    The registered output is FLATTENED to one row per (media_id, dim)
    with scalar columns only: the driver's canonicalizer hashes cells
    through pandas, where an ``array<bigint>`` cell is unhashable
    (round-4 red).  ``media_embeddings`` itself keeps returning the
    array column for the ANN composition path."""
    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return (
        media_embeddings(media_from_documents(docs))
        .select(
            "media_id",
            "n_bytes",
            F.posexplode("embedding").alias("dim", "emb_value"),
        )
        .select(
            "media_id",
            "n_bytes",
            F.col("dim").cast("long").alias("dim"),
            "emb_value",
        )
        .orderBy("media_id", "dim")
    )


@query(
    "MM4_media_neardup",
    oracle=f"""
    WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 60),
    base AS (
      SELECT a.doc_id AS media_id,
             b.text || '#' || a.doc_id AS payload
      FROM d a JOIN d b ON b.doc_id = a.doc_id - a.doc_id % 3
    ),
    fr AS (
      SELECT media_id,
             unnest(generate_series(0,
               CAST(ceil(length(payload) / {FRAME_STRIDE}.0) AS BIGINT) - 1))
               AS frame_idx,
             payload
      FROM base
    ),
    fh AS (
      SELECT DISTINCT media_id,
             md5(substr(payload, frame_idx * {FRAME_STRIDE} + 1,
                        {FRAME_BYTES})) AS h
      FROM fr
    ),
    sizes AS (SELECT media_id, COUNT(*) AS n FROM fh GROUP BY media_id),
    inter AS (
      SELECT a.media_id AS media_a, b.media_id AS media_b,
             COUNT(*) AS n_inter
      FROM fh a JOIN fh b ON a.h = b.h AND a.media_id < b.media_id
      GROUP BY media_a, media_b
    )
    SELECT i.media_a, i.media_b,
           CAST(i.n_inter AS BIGINT) AS n_shared_frames,
           FLOOR(i.n_inter
                 / CAST(sa.n + sb.n - i.n_inter AS DOUBLE) * 10000)
             / 10000.0 AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.media_id = i.media_a
    JOIN sizes sb ON sb.media_id = i.media_b
    WHERE i.n_inter / CAST(sa.n + sb.n - i.n_inter AS DOUBLE) >= 0.5
    ORDER BY media_a, media_b
    """,
)
def mm4_media_neardup(spark, sf_dir: str) -> DataFrame:
    """Multimodal near-duplicate detection — the frame-fingerprint
    dedup a video/image corpus runs where text runs MinHash: sample
    frames (MM2's REAL Arrow kernel), fingerprint each frame (md5 here;
    a perceptual hash in production — same schema, same joins), and
    score media pairs by Jaccard over their distinct frame-hash sets
    via the inverted-index join on the hash (only pairs sharing a frame
    ever materialize — never all-pairs).

    The audit slice mints near-dup structure the uniform corpus lacks:
    groups of three media share a payload body but carry a distinct
    tail frame (J < 1 within a group, 0 across groups) — so the grade
    proves fingerprinting, the index join, and the Jaccard arithmetic
    end to end.  At 100 TB the frame table is the fan-out documented at
    MM2 and the hash join's bucket sizes are bounded by true duplicate
    multiplicity (the E2 banding argument, one level down the media
    stack)."""
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 60)
    base = d.alias("a").join(
        d.alias("b"),
        F.col("b.doc_id")
        == F.col("a.doc_id") - F.col("a.doc_id") % 3,
    )
    media = base.select(
        F.col("a.doc_id").alias("media_id"),
        F.encode(
            F.concat(
                F.col("b.text"), F.lit("#"), F.col("a.doc_id").cast("string")
            ),
            "UTF-8",
        ).alias("media"),
    )
    fh = (
        sample_frames(media)
        .select("media_id", F.col("frame_checksum").alias("h"))
        .distinct()
    )
    fh = cut(fh)  # feeds sizes AND both sides of the pair join
    sizes = fh.groupBy("media_id").agg(F.count("*").alias("n"))
    inter = (
        fh.alias("x")
        .join(
            fh.alias("y"),
            (F.col("x.h") == F.col("y.h"))
            & (F.col("x.media_id") < F.col("y.media_id")),
        )
        .groupBy(
            F.col("x.media_id").alias("media_a"),
            F.col("y.media_id").alias("media_b"),
        )
        .agg(F.count("*").alias("n_inter"))
    )
    j = F.col("n_inter") / (
        F.col("sa.n") + F.col("sb.n") - F.col("n_inter")
    ).cast("double")
    return (
        inter.join(sizes.alias("sa"), F.col("media_a") == F.col("sa.media_id"))
        .join(sizes.alias("sb"), F.col("media_b") == F.col("sb.media_id"))
        .where(j >= 0.5)
        .select(
            "media_a",
            "media_b",
            F.col("n_inter").cast("long").alias("n_shared_frames"),
            (F.floor(j * 10000) / 10000.0).alias("jaccard"),
        )
        .orderBy("media_a", "media_b")
    )
