"""Adaptive-width SimHash unit pins (round 12, VERDICT r11 item 6).

E3's oracle parity grades the end-to-end pair set at the band widths
the test SFs select (16/16/18 bits); these tests pin the properties the
parity rows can't reach — the ladder itself, and banding losslessness
at a NON-default width."""

from pyspark.sql import functions as F

from biodiversity_graph_db_spark.extensions.simhash import (
    HAMMING_MAX,
    N_BANDS,
    adaptive_band_bits,
    simhash_neardups,
    simhash_signatures,
)


def _docs(spark, n=80):
    """Minted corpus with planted near-dups: doc 3k+1 is an EXACT copy
    of doc 3k (hamming 0) and doc 3k+2 swaps one token in 200 (3 of
    198 shingles change — a few signature bits at most), the rest is
    distinct filler."""
    rows = []
    words = [f"w{i}" for i in range(4000)]
    for i in range(n):
        base = i - (i % 3)
        toks = [words[(base * 37 + j * 17) % 4000] for j in range(200)]
        if i % 3 == 2:
            toks[101] = "alpha"
        rows.append((i, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestSignatureReference:
    def test_signatures_match_hashlib_reference(self, spark):
        """Bit-exact pin of the signature math against an INDEPENDENT
        Python reference (hashlib.md5 + per-bit majority vote) — the
        r13 expr-string rewrite of the packed-lane construction must
        land the identical signatures at a non-byte-aligned width
        (18 = sf0.1's ladder step, exercising the partial third word)
        and at saturation (32)."""
        import hashlib

        docs = _docs(spark, 12)
        rows = {r.doc_id: r.text for r in docs.collect()}
        for bb in (18, 32):
            got = {
                r.doc_id: (r.sig_0, r.sig_1, r.sig_2, r.sig_3)
                for r in simhash_signatures(docs, band_bits=bb).collect()
            }
            for doc_id, text in rows.items():
                toks = text.strip().lower().split()
                grams = list(
                    dict.fromkeys(
                        " ".join(toks[i : i + 3])
                        for i in range(len(toks) - 2)
                    )
                )
                n = len(grams)
                # votes[plane][i]: how many shingles set bit `plane` of
                # hex nibble i (nibble i = word i//8, char 8*(i//8)+i%8)
                votes = [[0] * 32 for _ in range(4)]
                for g in grams:
                    hx = hashlib.md5(g.encode()).hexdigest()
                    for i in range(32):
                        nib = int(hx[i], 16)
                        for plane in range(4):
                            votes[plane][i] += (nib >> plane) & 1
                sigs = []
                for plane in (3, 2, 1, 0):  # PLANES order = band order
                    s = 0
                    for i in range(bb):
                        if 2 * votes[plane][i] >= n:
                            s |= 1 << i
                    sigs.append(s)
                assert got[doc_id] == tuple(sigs), (doc_id, bb)


class TestAdaptiveBandWidth:
    def test_ladder_values(self):
        # two bits per doubling past 4,096 docs, saturating at 32
        assert adaptive_band_bits(0) == 16
        assert adaptive_band_bits(4095) == 16
        assert adaptive_band_bits(4096) == 18
        assert adaptive_band_bits(8192) == 20
        assert adaptive_band_bits(50_000) == 24
        assert adaptive_band_bits(500_000) == 30
        assert adaptive_band_bits(2**19) == 32
        assert adaptive_band_bits(10**9) == 32

    def test_signatures_fit_band_width(self, spark):
        for bb in (16, 20, 32):
            sigs = simhash_signatures(_docs(spark, 30), band_bits=bb)
            mx = sigs.select(
                *[F.max(f"sig_{k}").alias(f"m{k}") for k in range(N_BANDS)],
                *[F.min(f"sig_{k}").alias(f"n{k}") for k in range(N_BANDS)],
            ).collect()[0]
            for k in range(N_BANDS):
                assert 0 <= mx[f"n{k}"] and mx[f"m{k}"] < 2**bb

    def test_banding_lossless_at_nondefault_width(self, spark):
        """The band-equality candidate join must find EVERY pair within
        HAMMING_MAX of the full 4×band_bits signature (pigeonhole over
        4 disjoint bands) — verified against the all-pairs brute force
        at a width the parity SFs never select."""
        bb = 20
        docs = _docs(spark, 80)
        sigs = {
            r.doc_id: (r.sig_0, r.sig_1, r.sig_2, r.sig_3)
            for r in simhash_signatures(docs, band_bits=bb).collect()
        }
        want = set()
        ids = sorted(sigs)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                ham = sum(
                    bin(sigs[a][k] ^ sigs[b][k]).count("1")
                    for k in range(N_BANDS)
                )
                if ham <= HAMMING_MAX:
                    want.add((a, b))
        got = {
            (r.doc_a, r.doc_b)
            for r in simhash_neardups(docs, band_bits=bb).collect()
        }
        assert got == want
        assert want, "mint must plant at least one near-dup pair"
