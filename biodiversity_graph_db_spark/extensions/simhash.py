"""SimHash near-duplicate detection (BASELINE.json dedup mandate).

The third dedup family next to exact-fingerprint (textstats.T3) and
MinHash+LSH (dedup.E2): each document gets one fixed-width bit signature
(a per-bit majority vote over its shingle hashes), near-duplicates are
pairs within a small Hamming radius.  Candidate generation uses the
standard pigeonhole banding: with B bands of the signature, two docs
within Hamming distance d < B must agree exactly on at least one band,
so a band-equality hash join finds every such pair without any all-pairs
stage — at 100 TB the join key (band, band_val) keeps pair generation
inside buckets exactly like MinHash LSH.

Shingles are word 3-grams (unigrams degenerate on small vocabularies:
every doc has the same token set, so signatures collapse and the band
join blows up — measured 73k/125k "near-dup" pairs on the sf0.01 corpus
vs 21 with 3-grams).  Signature width is 64 bits, all drawn from one
md5: bit i<32 is the high bit of hex nibble i, bit 32+j the second bit
of nibble j — substring + integer SQL the DuckDB oracle replicates
bit-for-bit.  The 64 bits are carried as TWO positive 32-bit BIGINT
halves (``sig_lo``/``sig_hi``) so band extraction stays plain
division/modulo in both engines (one 64-bit value would go negative at
bit 63, where // and % diverge across engines).

64 bits → four 16-bit bands (65,536 values).  Band width is the
scale governor: the r11 gen_sf10 probe measured the previous 48-bit /
12-bit-band spelling fanning out 1.30M → 129.9M candidate pairs across
one decade (100×/decade — the bounded 4×4,096-bucket domain makes
occupancy, and therefore pair count, quadratic in the corpus), while
the signature build itself stayed flat.  16-bit bands grow the bucket
domain 16× and cut the same probe to data-appropriate candidate counts
(SCALE §39); the published posture at still-larger corpora is the same
move again — widen the signature/bands so bucket occupancy tracks
corpus size, exactly like the E2 MinHash band/row trade.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from biodiversity_graph_db_spark.extensions.dedup import word_ngram_shingles
from biodiversity_graph_db_spark.operators._util import cut, spread
from biodiversity_graph_db_spark.registry import query
from biodiversity_graph_db_spark.tables import fan_out, table

N_BITS = 64
N_BANDS = 4
BAND_BITS = N_BITS // N_BANDS  # 16 bits → band values 0..65535
HAMMING_MAX = 3  # < N_BANDS, so banding is lossless at this radius


# SIMD-in-a-register vote counting.  Signature-bit i comes from the four
# 32-bit hash words h0..h3 (h_k = integer value of md5 hex nibbles
# 8k..8k+7): bits 0..31 are the HIGH bit (bit 3) of nibble i, bits
# 32..63 the SECOND bit (bit 2) of nibble i−32 — independent bits of the
# same 128-bit hash.  Per row, (h >> shift) & 0x11111111 drops every
# nibble's vote bit to the low position of its 4-bit slot; the 8
# single-bit values are then spread into 16-bit lanes of two longs, so
# the groupBy sums 16 packed longs + 1 count instead of 64 scalar
# CASE/substring aggregates (the 49-buffer hash-agg and its
# 49-expression plan were the hot spot, executor- AND Catalyst-side).
# Lane headroom: 16 bits, top lane bounded by the sign bit → correct for
# ≤ 32,767 distinct shingles per doc (≈ 200 KB of text; chunk larger
# docs upstream).

_PACK_SPECS = [(w, 3) for w in range(4)] + [(w, 2) for w in range(4)]


def _packed_vote_cols() -> list[Column]:
    """12 per-row packed-lane columns p{word}_{bit}_{half}: half h packs
    the vote bits of packed slots 4h..4h+3 into 16-bit lanes."""
    cols = []
    for w, s in _PACK_SPECS:
        base = F.shiftright(F.col(f"h{w}"), s).bitwiseAND(F.lit(0x11111111))
        for p in range(2):
            e = None
            for lane in range(4):
                k = 4 * p + lane
                b = F.shiftright(base, 4 * k).bitwiseAND(F.lit(1))
                term = F.shiftleft(b, 16 * lane) if lane else b
                e = term if e is None else e + term
            cols.append(e.alias(f"p{w}_{s}_{p}"))
    return cols


def _vote_count(i: int) -> Column:
    """Unpack the summed lane holding the vote count for signature bit i."""
    if i < 32:
        w, s, nib = i // 8, 3, i % 8
    else:
        j = i - 32
        w, s, nib = j // 8, 2, j % 8
    k = 7 - nib  # packed slot: nibble `nib` sits at slot 7−nib
    p, lane = k // 4, k % 4
    return F.shiftright(F.col(f"p{w}_{s}_{p}"), 16 * lane).bitwiseAND(
        F.lit(0xFFFF)
    )


def simhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, text) → (doc_id, sig_lo, sig_hi): one groupBy with 16
    lane-packed bit-count sums + one count (map-side combinable,
    JVM-only — no UDF, no second shuffle).

    The ±1 vote for bit i sums to ``2·Σbit_i − n``, so sig bit i =
    (vote ≥ 0) = (2·Σbit_i ≥ n) — only the bit *counts* are aggregated.
    The 64 signature bits land as two positive 32-bit halves.
    """
    ex = spread(docs).select(
        "doc_id",
        F.explode(word_ngram_shingles(F.col(text_col))).alias("tok"),
    ).withColumn("hx", F.md5("tok"))
    # 32 hex nibbles → four 32-bit words (conv once per word)
    words = ex.select(
        "doc_id",
        *[
            F.conv(F.substring("hx", 8 * k + 1, 8), 16, 10)
            .cast("long")
            .alias(f"h{k}")
            for k in range(4)
        ],
    )
    packed = words.select("doc_id", *_packed_vote_cols())
    votes = packed.groupBy("doc_id").agg(
        F.count("*").alias("n"),
        *[F.sum(c).alias(c) for c in packed.columns if c != "doc_id"],
    )
    lo = hi = None
    for i in range(N_BITS):
        bit = F.when(
            _vote_count(i) * 2 >= F.col("n"), F.lit(1 << (i % 32))
        ).otherwise(F.lit(0))
        if i < 32:
            lo = bit if lo is None else lo + bit
        else:
            hi = bit if hi is None else hi + bit
    return votes.select(
        "doc_id",
        lo.cast("long").alias("sig_lo"),
        hi.cast("long").alias("sig_hi"),
    )


def band_values(sig_lo: Column, sig_hi: Column) -> list[Column]:
    """Split the two signature halves into N_BANDS integer band values
    (arithmetic only, so Spark and the SQL oracle compute identically;
    each half is a positive 32-bit value, so // and % agree across
    engines)."""
    width = 2**BAND_BITS
    return [
        (sig_lo % width).alias("band_0"),
        (sig_lo / F.lit(width)).cast("long").alias("band_1"),
        (sig_hi % width).alias("band_2"),
        (sig_hi / F.lit(width)).cast("long").alias("band_3"),
    ]


def simhash_candidates(sigs: DataFrame, broadcast: bool = True) -> DataFrame:
    """Band-equality self-join: every pair within HAMMING_MAX shares at
    least one exact band (pigeonhole), so candidates = pairs agreeing on
    (band index, band value).  Never all-pairs.

    ``broadcast=True`` (default) hints the build side — right while the
    corpus's band table (N_BANDS rows/doc × ~20 B) fits an executor; at
    full corpus scale pass ``broadcast=False`` for a shuffled hash join
    partitioned on (band, band_val)."""
    banded = sigs.select(
        "doc_id",
        "sig_lo",
        "sig_hi",
        F.posexplode(
            F.array(*band_values(F.col("sig_lo"), F.col("sig_hi")))
        ).alias("band", "band_val"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    if broadcast:
        b = F.broadcast(b)
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig_lo").alias("lo_a"),
            F.col("a.sig_hi").alias("hi_a"),
            F.col("b.sig_lo").alias("lo_b"),
            F.col("b.sig_hi").alias("hi_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )


def simhash_neardups(
    docs: DataFrame,
    hamming_max: int = HAMMING_MAX,
    broadcast: bool = True,
) -> DataFrame:
    """Full pipeline: signature → banded candidates → Hamming verify.

    The signature table feeds both sides of the candidate self-join, so
    it is materialized with ``localCheckpoint`` — that both avoids
    computing the shingle+vote aggregation twice (once per join side)
    AND truncates the 64-aggregate logical plan, which otherwise gets
    re-analyzed per join side (measured ~1.7 s of driver-side Catalyst
    time per run at sf0.1, larger than the actual execution)."""
    sigs = cut(simhash_signatures(docs))
    cand = simhash_candidates(sigs, broadcast=broadcast)
    ham = F.bit_count(
        F.col("lo_a").bitwiseXOR(F.col("lo_b"))
    ) + F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .where(F.col("hamming") <= hamming_max)
        .select("doc_a", "doc_b", "hamming")
    )


_SHINGLES_SQL = """
  list_distinct(list_transform(
    generate_series(1, len(string_split_regex(trim(lower(text)), '\\s+')) - 2),
    i -> string_split_regex(trim(lower(text)), '\\s+')[i] || ' ' ||
         string_split_regex(trim(lower(text)), '\\s+')[i+1] || ' ' ||
         string_split_regex(trim(lower(text)), '\\s+')[i+2]))
"""
def _bit_vote_sql(i: int) -> str:
    if i < 32:
        return f"CASE WHEN substr(hx, {i + 1}, 1) >= '8' THEN 1 ELSE -1 END"
    return (
        f"CASE WHEN substr(hx, {i - 32 + 1}, 1) IN "
        "('4','5','6','7','c','d','e','f') THEN 1 ELSE -1 END"
    )


_VOTES_SQL = ",\n             ".join(
    f"SUM({_bit_vote_sql(i)}) AS v{i}" for i in range(N_BITS)
)
_SIG_LO_SQL = " + ".join(
    f"(CASE WHEN v{i} >= 0 THEN {1 << i} ELSE 0 END)" for i in range(32)
)
_SIG_HI_SQL = " + ".join(
    f"(CASE WHEN v{i + 32} >= 0 THEN {1 << i} ELSE 0 END)"
    for i in range(32)
)
_W = 2**BAND_BITS
_BANDS_SQL = (
    f"sig_lo % {_W}, sig_lo // {_W}, sig_hi % {_W}, sig_hi // {_W}"
)


@query(
    "E3_simhash_neardup",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_SHINGLES_SQL}) AS tok
      FROM documents
    ),
    hashed AS (SELECT doc_id, md5(tok) AS hx FROM toks),
    votes AS (
      SELECT doc_id,
             {_VOTES_SQL}
      FROM hashed GROUP BY doc_id
    ),
    sigs AS (
      SELECT doc_id,
             CAST({_SIG_LO_SQL} AS BIGINT) AS sig_lo,
             CAST({_SIG_HI_SQL} AS BIGINT) AS sig_hi
      FROM votes
    ),
    banded AS (
      SELECT doc_id, sig_lo, sig_hi, b.band,
             ([{_BANDS_SQL}])[b.band + 1] AS band_val
      FROM sigs CROSS JOIN (
        SELECT unnest(generate_series(0, {N_BANDS - 1})) AS band) b
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.sig_lo AS lo_a, a.sig_hi AS hi_a,
             b.sig_lo AS lo_b, b.sig_hi AS hi_b
      FROM banded a
      JOIN banded b ON a.band = b.band AND a.band_val = b.band_val
                    AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(lo_a, lo_b)) + bit_count(xor(hi_a, hi_b))
                AS INTEGER) AS hamming
    FROM cand
    WHERE bit_count(xor(lo_a, lo_b)) + bit_count(xor(hi_a, hi_b))
          <= {HAMMING_MAX}
    ORDER BY doc_a, doc_b
    """,
)
def e3_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs over the full documents table: 64-bit
    3-gram signatures (two 32-bit halves), four 16-bit-band candidate
    join, Hamming ≤ 3 verify."""
    d = fan_out(table(spark, sf_dir, "documents"), spark)
    return simhash_neardups(d).orderBy("doc_a", "doc_b")
