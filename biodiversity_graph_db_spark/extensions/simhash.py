"""SimHash near-duplicate detection (BASELINE.json dedup mandate).

The third dedup family next to exact-fingerprint (textstats.T3) and
MinHash+LSH (dedup.E2): each document gets one fixed-width bit signature
(a per-bit majority vote over its shingle hashes), near-duplicates are
pairs within a small Hamming radius.  Candidate generation uses the
standard pigeonhole banding: with B disjoint bands of the signature, two
docs within Hamming distance d < B must agree exactly on at least one
band, so a band-equality hash join finds every such pair without any
all-pairs stage — at 100 TB the join key (band, band_val) keeps pair
generation inside buckets exactly like MinHash LSH.

Shingles are word 3-grams (unigrams degenerate on small vocabularies:
every doc has the same token set, so signatures collapse and the band
join blows up — measured 73k/125k "near-dup" pairs on the sf0.01 corpus
vs 21 with 3-grams).

**Corpus-adaptive band width (round 12, closing VERDICT r11 item 6).**
Band width is the scale governor: expected false candidates are
~N²·B/2^band_bits, so any FIXED width is quadratic past some corpus
size (measured: the 12-bit spelling fanned 1.3M → 130M pairs across one
decade, SCALE §39; 16-bit cut the constant 16× but left the asymptote).
The width is therefore DERIVED from the measured doc count:

    band_bits = 16 + 2·|{j in [12, 19] : N >= 2^j}|   (clamped to [16, 32])

i.e. TWO extra bits per corpus doubling past 4,096 docs: the false-
candidate term is ~N²·B/2^band_bits, so doubling N quadruples N² and
the width must absorb both doublings to hold the term FLAT (one bit
per doubling would leave it linear) — the same bucket-domain-tracks-
corpus move as the E2 band/row trade and V6b's drift governor, with the
exponent matched to the quadratic.  The ladder saturates at 32-bit
bands (N ≥ 2^19 ≈ 524k docs); past that the documented next move is
more/wider hashes (band count growth), the published LSH recipe.  The signature is four DISJOINT bands of ``band_bits``
bits each, band k drawn from bit-plane 3−k of the md5 nibbles (plane p
= bit p of every hex nibble — independent bits of the same 128-bit
hash), so the geometry widens with the corpus while banding stays
lossless at Hamming ≤ 3 (4 disjoint bands > 3 differing bits,
pigeonhole).  Hamming distance is over the 4×band_bits signature; the
DuckDB oracle computes the SAME width from the same COUNT(*) (integer
threshold ladder — no float log2 whose ceil could tie-break differently
across engines), masks the same bit prefixes, and the driver's parity
gate grades the pair set end-to-end.

Each band value is a positive ≤ 32-bit integer carried as BIGINT, so
band extraction and the Hamming XOR stay plain integer SQL in both
engines (a packed 64-bit value would go negative at bit 63, where
// and % diverge across engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from biodiversity_graph_db_spark.extensions.dedup import word_ngram_shingles
from biodiversity_graph_db_spark.operators._util import cut, spread
from biodiversity_graph_db_spark.registry import query
from biodiversity_graph_db_spark.tables import fan_out, table

N_BANDS = 4
#: Bit-plane of the md5 nibble feeding band k: band 0 ← nibble bit 3,
#: band 1 ← bit 2, band 2 ← bit 1, band 3 ← bit 0.
PLANES = (3, 2, 1, 0)
HAMMING_MAX = 3  # < N_BANDS, so banding is lossless at this radius

#: Doc-count thresholds of the band-width ladder: TWO extra bits per
#: corpus doubling past 2^12 docs, saturating at 32-bit bands (2^19).
_BB_THRESHOLDS = tuple(2**j for j in range(12, 20))


def adaptive_band_bits(n_docs: int) -> int:
    """16 + two bits per threshold passed — holds the expected false-
    candidate count (~N²·B/2^band_bits) FLAT as the corpus grows."""
    return 16 + 2 * sum(1 for t in _BB_THRESHOLDS if n_docs >= t)


def _bb_sql(table_expr: str = "documents") -> str:
    """The SAME ladder as integer SQL (a params CTE body): no floats,
    no log2 — the count comparison is exact in both engines."""
    cases = " + ".join(
        f"(CASE WHEN COUNT(*) >= {t} THEN 2 ELSE 0 END)"
        for t in _BB_THRESHOLDS
    )
    return f"SELECT 16 + {cases} AS bb FROM {table_expr}"


# SIMD-in-a-register vote counting.  Hash word h_w (w = 0..3) is the
# integer value of md5 hex nibbles 8w..8w+7; (h >> plane) & 0x11111111
# drops every nibble's plane-p bit to the low position of its 4-bit
# slot; the 8 single-bit values are then spread into 16-bit lanes of two
# longs, so the groupBy sums 2 packed longs per (word, plane) + 1 count
# instead of one scalar CASE aggregate per signature bit (the 49-buffer
# hash-agg and its 49-expression plan were the original hot spot,
# executor- AND Catalyst-side).  Lane headroom: 16 bits, top lane
# bounded by the sign bit → correct for ≤ 32,767 distinct shingles per
# doc (≈ 200 KB of text; chunk larger docs upstream).  Column count is
# width-adaptive: ceil(band_bits/8) words × 4 planes × 2 halves —
# 16 packed columns at 16-bit bands, 32 at the 32-bit saturation.


def _pack_specs(band_bits: int) -> list[tuple[int, int]]:
    words_needed = -(-band_bits // 8)
    return [(w, s) for s in PLANES for w in range(words_needed)]


def _packed_vote_cols(band_bits: int) -> list[Column]:
    """Per-row packed-lane columns p{word}_{plane}_{half}: half h packs
    the vote bits of packed slots 4h..4h+3 into 16-bit lanes.

    Each column is built as ONE ``F.expr`` SQL string (r13, guide §7.3
    planning cost): the Column-algebra spelling issued ~20 Py4J
    round-trips per packed column (~500 per query), which profiling put
    at ~1.5 s of DRIVER time per E3 run at sf0.1 — larger than the
    signature computation itself.  The SQL parse lands the identical
    Catalyst tree (shiftright/&/shiftleft over the same literals) in a
    single JVM call per column."""
    cols = []
    for w, s in _pack_specs(band_bits):
        base = f"(shiftright(h{w}, {s}) & {0x11111111})"
        for p in range(2):
            terms = []
            for lane in range(4):
                k = 4 * p + lane
                b = f"(shiftright({base}, {4 * k}) & 1)"
                terms.append(f"shiftleft({b}, {16 * lane})" if lane else b)
            cols.append(
                F.expr(" + ".join(terms)).alias(f"p{w}_{s}_{p}")
            )
    return cols


def _vote_count_sql(plane: int, i: int) -> str:
    """Unpack the summed lane holding the vote count for bit i of one
    bit-plane (bit i ↔ hex nibble i ↔ word i//8, nibble i%8) — as a SQL
    fragment (see `_packed_vote_cols` for why strings)."""
    w, nib = i // 8, i % 8
    k = 7 - nib  # packed slot: nibble `nib` sits at slot 7−nib
    p, lane = k // 4, k % 4
    return f"(shiftright(p{w}_{plane}_{p}, {16 * lane}) & {0xFFFF})"


def simhash_signatures(
    docs: DataFrame, text_col: str = "text", band_bits: int = 16
) -> DataFrame:
    """(doc_id, text) → (doc_id, sig_0..sig_3): one groupBy with
    lane-packed bit-count sums + one count (map-side combinable,
    JVM-only — no UDF, no second shuffle).  sig_k is band k: the first
    ``band_bits`` bits of nibble bit-plane ``PLANES[k]``, as a positive
    BIGINT.

    The ±1 vote for bit i sums to ``2·Σbit_i − n``, so sig bit i =
    (vote ≥ 0) = (2·Σbit_i ≥ n) — only the bit *counts* are aggregated.
    """
    ex = spread(docs).select(
        "doc_id",
        F.explode(word_ngram_shingles(F.col(text_col))).alias("tok"),
    ).withColumn("hx", F.md5("tok"))
    words_needed = -(-band_bits // 8)
    # hex nibbles → 32-bit words (conv once per needed word)
    words = ex.select(
        "doc_id",
        *[
            F.conv(F.substring("hx", 8 * k + 1, 8), 16, 10)
            .cast("long")
            .alias(f"h{k}")
            for k in range(words_needed)
        ],
    )
    packed = words.select("doc_id", *_packed_vote_cols(band_bits))
    votes = packed.groupBy("doc_id").agg(
        F.count("*").alias("n"),
        *[F.sum(c).alias(c) for c in packed.columns if c != "doc_id"],
    )
    sig_cols = []
    for k, plane in enumerate(PLANES):
        bits = " + ".join(
            f"(CASE WHEN ({_vote_count_sql(plane, i)} * 2) >= n"
            f" THEN CAST({1 << i} AS BIGINT)"
            f" ELSE CAST(0 AS BIGINT) END)"
            for i in range(band_bits)
        )
        sig_cols.append(
            F.expr(f"CAST(({bits}) AS BIGINT)").alias(f"sig_{k}")
        )
    return votes.select("doc_id", *sig_cols)


def simhash_candidates(sigs: DataFrame, broadcast: bool = True) -> DataFrame:
    """Band-equality self-join: every pair within HAMMING_MAX shares at
    least one exact band (pigeonhole over the 4 disjoint bands), so
    candidates = pairs agreeing on (band index, band value).  Never
    all-pairs.

    ``broadcast=True`` (default) hints the build side — right while the
    corpus's band table (N_BANDS rows/doc × ~20 B) fits an executor; at
    full corpus scale pass ``broadcast=False`` for a shuffled hash join
    partitioned on (band, band_val)."""
    sig_names = [f"sig_{k}" for k in range(N_BANDS)]
    banded = sigs.select(
        "doc_id",
        *sig_names,
        F.posexplode(F.array(*[F.col(c) for c in sig_names])).alias(
            "band", "band_val"
        ),
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
            *[F.col(f"a.sig_{k}").alias(f"a{k}") for k in range(N_BANDS)],
            *[F.col(f"b.sig_{k}").alias(f"b{k}") for k in range(N_BANDS)],
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )


def simhash_neardups(
    docs: DataFrame,
    hamming_max: int = HAMMING_MAX,
    broadcast: bool = True,
    band_bits: int = 16,
) -> DataFrame:
    """Full pipeline: signature → banded candidates → Hamming verify
    (over the full 4×band_bits signature).

    The signature table feeds both sides of the candidate self-join, so
    it is materialized with ``cut`` — that both avoids computing the
    shingle+vote aggregation twice (once per join side) AND truncates
    the wide-aggregate logical plan, which otherwise gets re-analyzed
    per join side (measured ~1.7 s of driver-side Catalyst time per run
    at sf0.1, larger than the actual execution)."""
    sigs = cut(simhash_signatures(docs, band_bits=band_bits))
    cand = simhash_candidates(sigs, broadcast=broadcast)
    ham = None
    for k in range(N_BANDS):
        t = F.bit_count(F.col(f"a{k}").bitwiseXOR(F.col(f"b{k}")))
        ham = t if ham is None else ham + t
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

#: Hex digits whose nibble has bit p set, per plane p.
_PLANE_DIGITS = {
    3: "89abcdef",
    2: "4567cdef",
    1: "2367abef",
    0: "13579bdf",
}


def _bit_vote_sql(plane: int, i: int) -> str:
    digits = ",".join(f"'{d}'" for d in _PLANE_DIGITS[plane])
    return (
        f"CASE WHEN substr(hx, {i + 1}, 1) IN ({digits}) THEN 1 ELSE -1 END"
    )


_VOTES_SQL = ",\n             ".join(
    f"SUM({_bit_vote_sql(p, i)}) AS v{p}_{i}"
    for p in PLANES
    for i in range(32)
)


def _word_sql(plane: int) -> str:
    return " + ".join(
        f"(CASE WHEN v{plane}_{i} >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(32)
    )


_WORDS_SQL = ",\n             ".join(
    f"CAST({_word_sql(p)} AS BIGINT) AS w{k}" for k, p in enumerate(PLANES)
)
# band k = low band_bits bits of word k (mask = 1 << bb, exact integer)
_MASKED_SQL = ", ".join(
    f"w{k} % (CAST(1 AS BIGINT) << bb) AS s{k}" for k in range(N_BANDS)
)
_BANDS_ARR_SQL = "[" + ", ".join(f"s{k}" for k in range(N_BANDS)) + "]"
_HAM_SQL = " + ".join(
    f"bit_count(xor(a{k}, b{k}))" for k in range(N_BANDS)
)


@query(
    "E3_simhash_neardup",
    oracle=f"""
    WITH params AS ({_bb_sql("documents")}),
    toks AS (
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
             {_WORDS_SQL}
      FROM votes
    ),
    masked AS (
      SELECT doc_id, {_MASKED_SQL}
      FROM sigs CROSS JOIN params
    ),
    banded AS (
      SELECT doc_id, s0, s1, s2, s3, b.band,
             ({_BANDS_ARR_SQL})[b.band + 1] AS band_val
      FROM masked CROSS JOIN (
        SELECT unnest(generate_series(0, {N_BANDS - 1})) AS band) b
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.s0 AS a0, a.s1 AS a1, a.s2 AS a2, a.s3 AS a3,
             b.s0 AS b0, b.s1 AS b1, b.s2 AS b2, b.s3 AS b3
      FROM banded a
      JOIN banded b ON a.band = b.band AND a.band_val = b.band_val
                    AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST({_HAM_SQL} AS INTEGER) AS hamming
    FROM cand
    WHERE {_HAM_SQL} <= {HAMMING_MAX}
    ORDER BY doc_a, doc_b
    """,
)
def e3_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs over the full documents table:
    corpus-adaptive 4×band_bits 3-gram signatures (band_bits =
    ``adaptive_band_bits(COUNT(documents))``, one disjoint band per md5
    nibble bit-plane), band-equality candidate join, Hamming ≤ 3
    verify.  The doc count read is parquet-footer metadata (no data
    scan); the oracle derives the identical width from the identical
    COUNT(*)."""
    n = table(spark, sf_dir, "documents").count()
    d = fan_out(table(spark, sf_dir, "documents"), spark)
    return simhash_neardups(
        d, band_bits=adaptive_band_bits(n)
    ).orderBy("doc_a", "doc_b")
