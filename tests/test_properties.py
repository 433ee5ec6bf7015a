"""Property-based tests (hypothesis): the key-synthesis string pipeline
against an independent Python model of the reference semantics, and
age-depth interpolation invariants.

Each example batch evaluates through one Spark job (strings are packed
into a single DataFrame per example) so the suite stays fast.
"""

from __future__ import annotations

import re
import unicodedata

from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from biodiversity_graph_db_spark.functions import keys as K
from biodiversity_graph_db_spark.operators import temporal

# --- Python models of the reference pipeline (Graph.fs:367-369) ----------


def _model_html_encode(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
        .replace("'", "&#39;")
    )


_STRIP = re.compile(r"[^aA-zZ_ \-+0-9]")


def _model_safe_string(s: str) -> str:
    return _STRIP.sub("", _model_html_encode(s))


def _is_alnum(c: str) -> bool:
    # Char.IsLetter (L*) or Char.IsNumber (N*), the .NET/Java \p{L}\p{N} set
    return unicodedata.category(c)[0] in ("L", "N")


def _model_initials(s: str) -> str:
    return "".join(
        w[0] for w in s.split(" ") if w and _is_alnum(w[0])
    )


_TEXT = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cs",), max_codepoint=0x2FFF
    ),
    max_size=40,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_TEXT, min_size=1, max_size=40))
def test_safe_string_matches_model(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "s string")
    got = [
        r.v
        for r in df.select(K.safe_string(F.col("s")).alias("v")).collect()
    ]
    assert got == [_model_safe_string(t) for t in texts]


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_TEXT, min_size=1, max_size=40))
def test_initials_match_model(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "s string")
    got = [
        r.v
        for r in df.select(
            K.take_alphanum_first_chars(F.col("s")).alias("v")
        ).collect()
    ]
    assert got == [_model_initials(t) for t in texts]


# --- age-depth interpolation invariants ----------------------------------


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ctrl=st.lists(
        st.tuples(
            st.floats(0, 1000, allow_nan=False, width=32),
            st.floats(0, 15000, allow_nan=False, width=32),
        ),
        min_size=2,
        max_size=6,
        unique_by=lambda t: t[0],
    ),
    depths=st.lists(
        st.floats(-100, 1100, allow_nan=False, width=32),
        min_size=1,
        max_size=8,
    ),
)
def test_interpolation_bracketing_invariants(spark, ctrl, depths):
    ctrl = sorted((float(d), float(a)) for d, a in ctrl)
    models = spark.createDataFrame(
        [("m", d, a) for d, a in ctrl],
        "cal_id string, depth double, ctrl_age double",
    )
    samples = spark.createDataFrame(
        [("m", i, float(d)) for i, d in enumerate(depths)],
        "cal_id string, sample_id long, depth double",
    )
    rows = temporal.age_depth_interpolate(models, samples).collect()
    by_id = {r.sample_id: r.age_bp for r in rows}
    lo, hi = ctrl[0][0], ctrl[-1][0]
    for i, d in enumerate(depths):
        d = float(d)
        age = by_id[i]
        if d < lo or d > hi:
            assert age is None, f"outside model must be NULL (d={d})"
            continue
        assert age is not None, f"inside model must interpolate (d={d})"
        # bracketing: age lies between the bracketing control ages
        prev = max((c for c in ctrl if c[0] <= d), key=lambda c: c[0])
        nxt = min((c for c in ctrl if c[0] >= d), key=lambda c: c[0])
        lo_a, hi_a = sorted((prev[1], nxt[1]))
        # floor-to-4dp can sit just below the interval's lower end
        assert lo_a - 1e-4 <= age <= hi_a + 1e-4, (
            f"age {age} outside bracket [{lo_a}, {hi_a}] at depth {d}"
        )


# --- round-3 operators ----------------------------------------------------


_PII_FREE = st.text(
    alphabet=st.characters(
        codec="utf-8",
        exclude_categories=("Cs",),
        max_codepoint=0x2FFF,
        exclude_characters="@.",
    ),
    max_size=30,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_PII_FREE, min_size=1, max_size=8), st.integers(0, 9999))
def test_scrub_pii_removes_every_span(spark, texts, n):
    """Injecting a known email/phone into arbitrary text and scrubbing
    must leave zero pattern matches and keep the placeholders."""
    from biodiversity_graph_db_spark.extensions import textstats as T

    rows = [
        (i, f"{t} user{n}@example.com x +1-555-010-{n:04d} {t}")
        for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = df.select(
        T.scrub_pii(F.col("text")).alias("red"),
        F.regexp_count(
            T.scrub_pii(F.col("text")), F.lit(T.PII_EMAIL)
        ).alias("n_email"),
        F.regexp_count(
            T.scrub_pii(F.col("text")), F.lit(T.PII_PHONE)
        ).alias("n_phone"),
    ).collect()
    for r in out:
        assert r.n_email == 0 and r.n_phone == 0
        assert "[EMAIL]" in r.red and "[PHONE]" in r.red


def test_hash_split_deterministic_and_complete(spark):
    """Every doc lands in exactly one split; assignment is identical
    across partitionings; proportions are roughly 80/10/10."""
    from biodiversity_graph_db_spark.extensions import textstats as T

    ids = spark.range(5000)
    a = {r.id: r.s for r in ids.select("id", T.split_name(F.col("id")).alias("s")).collect()}
    b = {
        r.id: r.s
        for r in ids.repartition(13)
        .select("id", T.split_name(F.col("id")).alias("s"))
        .collect()
    }
    assert a == b
    from collections import Counter

    c = Counter(a.values())
    assert set(c) == {"train", "val", "test"}
    assert 0.75 <= c["train"] / 5000 <= 0.85
    assert 0.07 <= c["val"] / 5000 <= 0.13
    assert 0.07 <= c["test"] / 5000 <= 0.13


def test_ivf_assign_matches_column_expression(spark):
    """The Arrow assignment kernel must pick exactly the centroids the
    column-expression ranking picks (same scaled-int cosine, same
    (cosv desc, cent_id asc) tie-break) on an adversarial corpus with
    duplicated vectors (exact ties)."""
    import random

    from pyspark.sql import Window

    from biodiversity_graph_db_spark.extensions import similarity as S

    rng = random.Random(7)
    base = [
        [rng.uniform(-0.5, 0.5) for _ in range(8)] for _ in range(40)
    ]
    vecs = base + base[:10]  # duplicates → exact cosine ties
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    n_cent, n_probe = 6, 3
    cent_ids, cmat, cnorm = S._collect_centroids(emb, n_cent)
    got = {
        (r.vec_id, r.cent_id)
        for r in S.ivf_assign(emb, cent_ids, cmat, cnorm, n_probe).collect()
    }
    cents = F.broadcast(
        S.with_norm(emb.orderBy("vec_id").limit(n_cent)).select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").alias("cent_emb"),
            F.col("norm_sq").alias("cent_norm"),
        )
    )
    scored = S.with_norm(emb).join(cents, how="cross").withColumn(
        "cent_cos",
        S.cosine(
            F.col("embedding"),
            F.col("cent_emb"),
            F.col("norm_sq"),
            F.col("cent_norm"),
        ),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cent_cos").desc(), F.col("cent_id")
    )
    want = {
        (r.vec_id, r.cent_id)
        for r in scored.withColumn("crk", F.row_number().over(w))
        .where(F.col("crk") <= n_probe)
        .select("vec_id", "cent_id")
        .collect()
    }
    assert got == want


# --- spatial ray-cast vs independent Python model --------------------------


@st.composite
def _polygon_and_points(draw):
    """A random closed polygon (3-7 vertices, may be self-intersecting —
    even-odd parity is well-defined for any closed polyline) plus a
    batch of random probe points."""
    coord = st.tuples(
        st.floats(-170, 170, allow_nan=False).map(lambda v: round(v, 3)),
        st.floats(-85, 85, allow_nan=False).map(lambda v: round(v, 3)),
    )
    verts = draw(st.lists(coord, min_size=3, max_size=7))
    pts = draw(st.lists(coord, min_size=5, max_size=20))
    return verts, pts


def _model_raycast(poly, lon, lat):
    inside = False
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        if (y1 > lat) != (y2 > lat):
            if lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1:
                inside = not inside
    return inside


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_polygon_and_points())
def test_point_in_polygon_col_matches_model(spark, data):
    """point_in_polygon_col (F.aggregate even-odd ray cast) must agree
    with an independent Python implementation on arbitrary polygons —
    including concave and self-intersecting rings — for every probe."""
    from biodiversity_graph_db_spark.operators import spatial

    verts, pts = data
    ring = verts + [verts[0]]  # close the ring, as WKT does
    poly = F.array(
        *[
            F.struct(F.lit(x).alias("lon"), F.lit(y).alias("lat"))
            for x, y in ring
        ]
    )
    df = spark.createDataFrame(
        [(i, lon, lat) for i, (lon, lat) in enumerate(pts)],
        "id long, lon double, lat double",
    )
    got = {
        r.id: r.inside
        for r in df.select(
            "id",
            spatial.point_in_polygon_col(
                F.col("lat"), F.col("lon"), poly
            ).alias("inside"),
        ).collect()
    }
    for i, (lon, lat) in enumerate(pts):
        want = _model_raycast(ring, lon, lat)
        assert got[i] == want, (verts, (lon, lat), got[i], want)


# --- round-4 additions: BPE / snapshot diff / KMV / as-of -----------------


def _fixed_point_merge(word: list[str], l: str, r: str) -> str:
    s = " " + " ".join(word) + " "
    pat, rep = f" {l} {r} ", f" {l}{r} "
    while pat in s:
        s = s.replace(pat, rep)
    return s


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.sampled_from("abc"), min_size=1, max_size=12),
        min_size=1,
        max_size=20,
    ),
    st.sampled_from("abc"),
    st.sampled_from("abc"),
)
def test_bpe_merge_matches_python_fixed_point(spark, words, l, r):
    """_apply_merge over arbitrary small-alphabet words equals the
    Python replace fixed point (the documented merge semantics), for
    every pair including the same-symbol-run cases."""
    from biodiversity_graph_db_spark.extensions.bpe import _apply_merge

    corpus = spark.createDataFrame(
        [(" " + " ".join(w) + " ", i + 1) for i, w in enumerate(words)],
        "wstr string, freq long",
    )
    top = spark.createDataFrame([(l, r)], "l string, r string")
    got = sorted(
        (row.wstr, row.freq) for row in _apply_merge(corpus, top).collect()
    )
    want = sorted(
        (_fixed_point_merge(w, l, r), i + 1) for i, w in enumerate(words)
    )
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.dictionaries(
        st.integers(0, 30), st.integers(-3, 3), min_size=0, max_size=20
    ),
    st.dictionaries(
        st.integers(0, 30), st.integers(-3, 3), min_size=0, max_size=20
    ),
)
def test_snapshot_diff_apply_roundtrip(spark, a, b):
    """apply_diff(A, snapshot_diff(A, B)) == B for arbitrary snapshots,
    including empty sides and NULL-valued payloads."""
    from biodiversity_graph_db_spark.operators.snapshot import (
        apply_diff,
        snapshot_diff,
    )

    def mk(d):
        rows = [(f"k{k}", None if v == 0 else v) for k, v in d.items()]
        return spark.createDataFrame(rows or [("__none__", None)], "key string, val long").where(
            F.col("key") != "__none__"
        )

    old, new = mk(a), mk(b)
    diff = snapshot_diff(old, new, ["key"], "val")
    got = {
        (r.key, r.val) for r in apply_diff(old, diff, ["key"]).collect()
    }
    want = {(f"k{k}", None if v == 0 else v) for k, v in b.items()}
    assert got == want
    # and the diff itself never reports an unchanged key
    for r in diff.collect():
        assert not (
            r.change == "changed" and r.old_val == r.new_val
        )


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.integers(0, 40), min_size=1, max_size=60))
def test_kmv_exact_below_k_and_order_free(spark, vals):
    """With fewer than k distinct values the KMV 'estimate' is exact,
    and the sketch is invariant to row order / partitioning."""
    from biodiversity_graph_db_spark.extensions.sketches import (
        kmv_distinct,
    )

    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    out = kmv_distinct(df, "g", "v", k=64).collect()
    assert len(out) == 1
    assert out[0].est_distinct == len(set(vals))
    out2 = kmv_distinct(df.repartition(7), "g", "v", k=64).collect()
    assert out[0] == out2[0]


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(1, 3),            # user
            st.integers(0, 50),           # ts (seconds)
            st.booleans(),                # is_click (else purchase)
        ),
        min_size=1,
        max_size=25,
    )
)
def test_asof_union_trick_matches_model(spark, evs):
    """The J9 union-trick window equals the brute-force as-of model:
    for each click, the max-id purchase among those with the max
    ts <= click ts for the same user."""
    import datetime

    from pyspark.sql import Window

    base = datetime.datetime(2020, 1, 1)
    rows = [
        (
            i,
            base + datetime.timedelta(seconds=ts),
            u,
            "click" if is_c else "purchase",
            0.0,
            None,
        )
        for i, (u, ts, is_c) in enumerate(evs)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    p = df.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("pid"),
        F.lit(None).cast("long").alias("cid"),
        F.lit(0).alias("side"),
    )
    c = df.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("pid"),
        F.col("event_id").alias("cid"),
        F.lit(1).alias("side"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = {
        (r.cid, r.asof)
        for r in p.unionByName(c)
        .select(
            "*",
            F.last("pid", ignorenulls=True).over(w).alias("asof"),
        )
        .where(F.col("side") == 1)
        .collect()
    }
    want = {}
    purchases = [
        (i, u, ts) for i, (u, ts, is_c) in enumerate(evs) if not is_c
    ]
    for i, (u, ts, is_c) in enumerate(evs):
        if not is_c:
            continue
        elig = [(pts, pi) for pi, pu, pts in purchases if pu == u and pts <= ts]
        want[i] = max(elig)[1] if elig else None
    assert got == set(want.items())


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.text(alphabet="abX", min_size=2, max_size=6),
        min_size=1,
        max_size=12,
        unique=True,
    ),
    st.data(),
)
def test_fuzzy_match_lossless_vs_bruteforce(spark, names, data):
    """The wildcard-position signature must find EXACTLY the pairs the
    brute-force levenshtein-≤1 same-length join finds, on adversarial
    low-entropy alphabets (shared prefixes/suffixes, repeated chars)."""
    import itertools

    from biodiversity_graph_db_spark.extensions.dedup import (
        fuzzy_match_names,
    )

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    # dirty = each name with one substituted char (position chosen by
    # hypothesis), plus one uncorrupted copy
    dirty_rows = []
    for i, n in enumerate(names):
        pos = data.draw(st.integers(0, len(n) - 1))
        ch = data.draw(st.sampled_from("abX"))
        dirty_rows.append((i, n[:pos] + ch + n[pos + 1 :]))
    clean = spark.createDataFrame(
        [(j, n) for j, n in enumerate(names)], "key long, name string"
    )
    dirty = spark.createDataFrame(dirty_rows, "id long, dname string")
    got = {
        (r.id, r.key, r.dist)
        for r in fuzzy_match_names(dirty, clean).collect()
    }
    want = {
        (i, j, lev(dn, cn))
        for (i, dn), (j, cn) in itertools.product(
            dirty_rows, enumerate(names)
        )
        if len(dn) == len(cn) and lev(dn, cn) <= 1
    }
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(
            st.tuples(
                st.integers(0, 8),              # key
                st.integers(0, 5),              # value
                st.booleans(),                  # tombstone
            ),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_versioned_log_matches_dict_replay(spark, tmp_path_factory, versions):
    """read_as_of at every version equals a Python dict replay of the
    same upserts/tombstones (latest-per-key, deletes win)."""
    from biodiversity_graph_db_spark.operators.snapshot import (
        read_as_of,
        save_version,
    )

    tmp = tmp_path_factory.mktemp("vlog")
    path = str(tmp / "log")
    state: dict[int, int] = {}
    for v, rows in enumerate(versions, start=1):
        # per-version, last write per key within the batch is undefined;
        # keep keys unique inside a version
        dedup = {k: (val, dead) for k, val, dead in rows}
        df = spark.createDataFrame(
            [
                (f"k{k}", val, dead)
                for k, (val, dead) in sorted(dedup.items())
            ],
            "key string, val long, deleted boolean",
        )
        save_version(df, path, v, ["key"])
        for k, (val, dead) in dedup.items():
            if dead:
                state.pop(k, None)
                state[k] = None
            else:
                state[k] = val
        # state keeps tombstones as None markers; visible = non-None
        got = {
            (r.key, r.val)
            for r in read_as_of(spark, path, v, ["key"]).collect()
        }
        want = {
            (f"k{k}", val) for k, val in state.items() if val is not None
        }
        assert got == want, (v, got, want)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.text(alphabet="abX", min_size=1, max_size=6),
        min_size=1,
        max_size=10,
        unique=True,
    ),
    st.data(),
)
def test_fuzzy_d2_lossless_vs_bruteforce(spark, names, data):
    """E4b: the ≤2-deletion neighborhood join must find EXACTLY the
    levenshtein-≤2 pairs — including length-changing edits — on
    adversarial low-entropy alphabets.  Dirty side: one substitution
    AND/OR one deletion/insertion drawn per name."""
    import itertools

    from biodiversity_graph_db_spark.extensions.dedup import (
        fuzzy_match_names_d2,
    )

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    dirty_rows = []
    for i, n in enumerate(names):
        s = n
        kind = data.draw(st.sampled_from(["sub", "del", "ins", "subdel"]))
        pos = data.draw(st.integers(0, max(0, len(s) - 1)))
        if kind in ("sub", "subdel"):
            ch = data.draw(st.sampled_from("abX"))
            s = s[:pos] + ch + s[pos + 1 :]
        if kind == "del" and len(s) > 1:
            s = s[:pos] + s[pos + 1 :]
        if kind == "subdel" and len(s) > 1:
            p2 = data.draw(st.integers(0, len(s) - 1))
            s = s[:p2] + s[p2 + 1 :]
        if kind == "ins":
            ch = data.draw(st.sampled_from("abX"))
            s = s[:pos] + ch + s[pos:]
        dirty_rows.append((i, s))
    clean = spark.createDataFrame(
        [(j, n) for j, n in enumerate(names)], "key long, name string"
    )
    dirty = spark.createDataFrame(dirty_rows, "id long, dname string")
    got = {
        (r.id, r.key, r.dist)
        for r in fuzzy_match_names_d2(dirty, clean).collect()
    }
    want = {
        (i, j, lev(dn, cn))
        for (i, dn), (j, cn) in itertools.product(
            dirty_rows, enumerate(names)
        )
        if lev(dn, cn) <= 2
    }
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(0, 10_000), min_size=1, max_size=60),
    st.lists(st.integers(0, 10_000), min_size=1, max_size=30),
)
def test_bloom_never_false_negative_property(spark, members, probes):
    """Bloom invariant under arbitrary integer sets: every member
    probes true; non-members may collide but never crash the
    classification."""
    from biodiversity_graph_db_spark.extensions.sketches import (
        bloom_build,
        bloom_probe,
    )

    m = spark.createDataFrame([(x,) for x in set(members)], "k long")
    p = spark.createDataFrame(
        [(x,) for x in set(probes) | set(members)], "k long"
    )
    bloom = bloom_build(m, "k")
    got = {r.k: r.in_bloom for r in bloom_probe(p, bloom, "k").collect()}
    for x in set(members):
        assert got[x] is True


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.floats(0, 5_000, allow_nan=False), min_size=1, max_size=80))
def test_histogram_quantile_error_bound_property(spark, vals):
    """T24 invariant under arbitrary value sets: every read-out
    quantile is within one bin width of the RANK-BASED (inverse-CDF)
    quantile — the estimate is the upper edge of the bin holding the
    ⌈qN⌉-th order statistic.  (Against INTERPOLATED quantiles the
    bound additionally needs data dense relative to the bins — a
    two-point set can interpolate mid-gap, arbitrarily far from any
    bin edge.)"""
    import math

    from biodiversity_graph_db_spark.extensions.sketches import (
        HQ_BIN_WIDTH,
        histogram_bins,
        histogram_quantiles,
    )

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = histogram_quantiles(histogram_bins(df, "x")).collect()
    svals = sorted(vals)
    for r in out:
        exact = svals[math.ceil(r.q * len(svals)) - 1]  # inverse CDF
        assert 0 <= r.est - exact < HQ_BIN_WIDTH + 1e-9, (
            r.q,
            r.est,
            exact,
        )


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=8),
        min_size=1,
        max_size=8,
    ),
    st.data(),
)
def test_bpe_kernel_equals_expression_on_random_words(spark, words, data):
    """T19b: the greedy-rank kernel must reproduce the chained-replace
    expression path's TOKEN COUNTS for a random valid (dependency-
    ordered) merge list — on words without same-symbol runs >= 5.

    Longer same-symbol runs are the DOCUMENTED divergence of the two
    paths (hypothesis found b^6 + (b,b): kernel 3, replace 4): SQL
    replace's scan resumes after each match, so in a run it pairs
    (1,2),(4,5),... stranding singles that later passes can never make
    adjacent, while canonical greedy BPE pairs (1,2),(3,4),...  The
    kernel is canonical; the expression path is the SQL-expressible
    approximation.  The divergence case is pinned separately
    (test_bpe_run_divergence_is_the_known_one) and the graded corpus
    is verified run-free (test_extensions: corpus precondition), so
    T19/T19b may share one oracle."""
    from biodiversity_graph_db_spark.extensions.bpe import (
        _MERGE_PASSES,
    )

    assume(
        not any(re.search(r"(.)\1{4,}", w) for w in words)
    )

    # a valid BPE merge table over {a, b}: later merges may only use
    # symbols produced earlier
    symbols = ["a", "b"]
    merges = []
    for _ in range(data.draw(st.integers(1, 4))):
        l = data.draw(st.sampled_from(symbols))
        r = data.draw(st.sampled_from(symbols))
        if (l, r) in merges:
            continue
        merges.append((l, r))
        symbols.append(l + r)

    # expression path (replace fixed point) in plain Python — same
    # leftmost-non-overlapping semantics as Spark/DuckDB replace
    def expr_tokens(w: str) -> int:
        s = " " + " ".join(w) + " "
        for l, r in merges:
            for _ in range(_MERGE_PASSES):
                s = s.replace(f" {l} {r} ", f" {l}{r} ")
        return len(s.split())

    # kernel path (greedy lowest-rank all-occurrence merge)
    ranks = {p: i for i, p in enumerate(merges)}

    def kern_tokens(w: str) -> int:
        syms = list(w)
        while len(syms) > 1:
            best = None
            for i in range(len(syms) - 1):
                rk = ranks.get((syms[i], syms[i + 1]))
                if rk is not None and (best is None or rk < best):
                    best = rk
            if best is None:
                break
            l, r = merges[best]
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == l
                    and syms[i + 1] == r
                ):
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    for w in words:
        assert expr_tokens(w) == kern_tokens(w), (w, merges)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1,
        max_size=18,
        unique=True,
    )
)
def test_scc_matches_tarjan_model(spark, edge_list):
    """graph/algorithms.scc on ARBITRARY small digraphs (self-loops,
    multi-cycles, nested SCCs, DAG tails) must equal a Python Tarjan
    model — proving the trim+coloring rounds are general, not just
    correct on the G12 mint."""
    from biodiversity_graph_db_spark.graph.algorithms import scc

    edges = [(f"n{a}", f"n{b}") for a, b in edge_list]
    nodes = sorted({x for e in edges for x in e})

    # iterative Tarjan
    adj: dict[str, list[str]] = {n: [] for n in nodes}
    for a, b in edges:
        adj[a].append(b)
    index: dict[str, int] = {}
    low: dict[str, int] = {}
    on: set[str] = set()
    stack: list[str] = []
    comp: dict[str, str] = {}
    counter = [0]

    def strongconnect(root):
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on.add(v)
            advanced = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    advanced = True
                    break
                if w in on:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on.discard(w)
                    members.append(w)
                    if w == v:
                        break
                cid = min(members)
                for w in members:
                    comp[w] = cid

    for n in nodes:
        if n not in index:
            strongconnect(n)

    df = spark.createDataFrame(edges, "src string, dst string")
    got = {(r.key, r.scc_id) for r in scc(df, max_rounds=12).collect()}
    want = set(comp.items())
    assert got == want, (sorted(got), sorted(want), edges)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.integers(-(2**31), 2**31 - 1), min_size=1, max_size=40
    )
)
def test_portable_hash_signed_keys_parity_and_range(spark, keys):
    """Round-6 hardening: the portable hash family must land in
    [0, M) / [0, width) for SIGNED keys too, and stay bit-identical to
    its DuckDB SQL twin (the oracle side of T20/T22/T23)."""
    import duckdb

    from biodiversity_graph_db_spark.extensions.sketches import (
        _HASH_SQL,
        _MOD,
        _bloom_pos_sql,
        _cm_pos_sql,
        bloom_pos,
        cm_pos,
        portable_hash,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = (
        df.select(
            "k",
            portable_hash(F.col("k")).alias("h"),
            cm_pos(F.col("k"), 1).alias("c"),
            bloom_pos(F.col("k"), 2).alias("b"),
        )
        .orderBy("k")
        .collect()
    )
    import pandas as pd

    pdf = pd.DataFrame({"k": keys})
    want = duckdb.sql(
        f"""SELECT k, {_HASH_SQL.format(x='k')} AS h,
                   {_cm_pos_sql('k', 1)} AS c,
                   {_bloom_pos_sql('k', 2)} AS b
            FROM pdf ORDER BY k"""
    ).fetchall()
    assert [(r.k, r.h, r.c, r.b) for r in got] == [
        tuple(w) for w in want
    ]
    for r in got:
        assert 0 <= r.h < _MOD and 0 <= r.c < 64 and 0 <= r.b < 65536


def test_bpe_run_divergence_is_the_known_one():
    """Pin the ONE known divergence between the chained-replace
    expression path and the canonical greedy kernel: on a same-symbol
    run (b^6, merge (b,b)) SQL replace pairs (1,2),(4,5) — its scan
    resumes after each match — stranding singles that no further pass
    can make adjacent (4 tokens), while canonical BPE pairs
    (1,2),(3,4),(5,6) (3 tokens).  If this assertion ever flips, the
    expression path's semantics changed and the shared T19/T19b oracle
    must be revisited."""
    from biodiversity_graph_db_spark.extensions.bpe import _MERGE_PASSES

    s = " " + " ".join("bbbbbb") + " "
    for _ in range(_MERGE_PASSES):
        s = s.replace(" b b ", " bb ")
    assert len(s.split()) == 4  # replace path: bb b bb b

    # canonical greedy: left-to-right non-overlapping pairing
    syms = list("bbbbbb")
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == syms[i + 1] == "b":
            out.append("bb")
            i += 2
        else:
            out.append(syms[i])
            i += 1
    assert len(out) == 3  # kernel path: bb bb bb


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.sampled_from("abcd"), st.integers(0, 500)),
        min_size=1,
        max_size=80,
    )
)
def test_exact_median_matches_python_model(spark, rows):
    """A9's value-histogram median equals the textbook order statistic
    ((lower+upper middle)/2) for every group, any distribution, ties
    included — and is partitioning-invariant."""
    import statistics

    df = spark.createDataFrame(
        [(g, g, float(v)) for g, v in rows],
        "l_returnflag string, l_linestatus string, l_extendedprice double",
    )
    # reuse the registered query's internals via a local rebuild: the
    # query binds to the lineitem table, so replicate its math here
    from pyspark.sql import Window

    g = ["l_returnflag", "l_linestatus"]
    c = df.select(
        *g, F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("cents")
    )
    vh = c.groupBy(*g, "cents").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy(*g).orderBy("cents")
    vh = (
        vh.withColumn("cum", F.sum("cnt").over(w))
        .withColumn("n", F.sum("cnt").over(Window.partitionBy(*g)))
        .withColumn("lo", F.col("cum") - F.col("cnt") + 1)
    )
    m1 = F.floor((F.col("n") + 1) / 2)
    m2 = F.floor((F.col("n") + 2) / 2)
    hit1 = (m1 >= F.col("lo")) & (m1 <= F.col("cum"))
    hit2 = (m2 >= F.col("lo")) & (m2 <= F.col("cum"))
    got = {
        r.l_returnflag: r.median
        for r in vh.where(hit1 | hit2)
        .select(
            *g,
            "cents",
            (hit1.cast("int") + hit2.cast("int")).alias("w"),
        )
        .groupBy(*g)
        .agg(
            (F.sum(F.col("cents") * F.col("w")) / F.sum("w").cast("double"))
            .alias("median")
        )
        .collect()
    }
    for gname in {g2 for g2, _ in rows}:
        want = statistics.median(
            sorted(v * 100 for g2, v in rows if g2 == gname)
        )
        assert got[gname] == float(want), (gname, got[gname], want)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.sampled_from(["t1", "t2"]), st.integers(0, 30)),
        min_size=1,
        max_size=60,
    )
)
def test_salted_distinct_equals_plain(spark, rows):
    """A11's two-level salted COUNT(DISTINCT) equals the single-level
    spelling for any data (disjointness of per-salt value sets)."""
    df = spark.createDataFrame(rows, "event_type string, user_id long")
    from biodiversity_graph_db_spark.operators.aggregations import (
        _SALT_BUCKETS,
    )

    salted = (
        df.groupBy(
            "event_type",
            F.pmod(F.xxhash64("user_id"), F.lit(_SALT_BUCKETS)).alias("_s"),
        )
        .agg(F.countDistinct("user_id").alias("pd"))
        .groupBy("event_type")
        .agg(F.sum("pd").alias("n"))
    )
    got = {r.event_type: r.n for r in salted.collect()}
    want: dict = {}
    for t, u in rows:
        want.setdefault(t, set()).add(u)
    assert got == {t: len(s) for t, s in want.items()}


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.dictionaries(
        st.integers(0, 20),
        st.tuples(st.text("ab", max_size=3), st.booleans()),
        min_size=1,
        max_size=20,
    )
)
def test_scd2_invariants(spark, state):
    """scd2_merge invariants for ANY old/new pair: (a) every key that
    exists in NEW has exactly one open current row carrying the NEW
    value; (b) deleted keys have no current row; (c) every closed row
    has valid_to == new_version; (d) row count = |union keys| +
    |changed keys|."""
    from biodiversity_graph_db_spark.operators.snapshot import scd2_merge

    old_rows = [(str(k), v) for k, (v, _) in state.items()]
    # new side: flip value when the bool says "change", drop every 3rd key
    new_rows = [
        (str(k), v + "!" if chg else v)
        for k, (v, chg) in state.items()
        if k % 3 != 0
    ]
    old = spark.createDataFrame(old_rows, "key string, name string")
    new = (
        spark.createDataFrame(new_rows, "key string, name string")
        if new_rows
        else old.where("1=0")
    )
    hist = scd2_merge(old, new, ["key"], "name", 1, 2).collect()
    new_map = dict(new_rows)
    cur = [r for r in hist if r.is_current]
    assert {r.key for r in cur} == set(new_map)
    for r in cur:
        assert r.name == new_map[r.key] and r.valid_to is None
    for r in hist:
        if not r.is_current:
            assert r.valid_to == 2
    n_changed = sum(
        1 for k, v in old_rows if k in new_map and new_map[k] != v
    )
    assert len(hist) == len(set(dict(old_rows)) | set(new_map)) + n_changed


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),          # day index
            st.integers(0, 10_000),     # per-day event order key
            st.integers(0, 50_000),     # scaled value
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: (t[0], t[1]),
    )
)
def test_ohlc_matches_python_model(spark, rows):
    """W12's rank-1 open/close equal the python first/last-by-(ts, id)
    model for any per-day distribution (ties on ts broken by id)."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    data = [
        (
            d * 100000 + i,  # unique event_id encoding (day, order)
            base + datetime.timedelta(days=d, seconds=i),
            1,
            "view",
            v / 100.0,
            "{}",
        )
        for d, i, v in rows
    ]
    df = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    from pyspark.sql import Window

    e = df.select(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
        "event_id",
        "ts",
        F.floor(F.col("value") * 10000).cast("bigint").alias("v"),
    )
    w_open = Window.partitionBy("day").orderBy("ts", "event_id")
    w_close = Window.partitionBy("day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    got = {
        r.day: (r.o, r.h, r.l, r.c)
        for r in e.select(
            "day",
            "v",
            F.row_number().over(w_open).alias("ro"),
            F.row_number().over(w_close).alias("rc"),
        )
        .groupBy("day")
        .agg(
            F.max(F.when(F.col("ro") == 1, F.col("v"))).alias("o"),
            F.max("v").alias("h"),
            F.min("v").alias("l"),
            F.max(F.when(F.col("rc") == 1, F.col("v"))).alias("c"),
        )
        .collect()
    }
    import math

    by_day: dict = {}
    for d, i, v in rows:
        # same IEEE pipeline as the query: scale the stored double
        by_day.setdefault(d, []).append((i, math.floor((v / 100.0) * 10000)))
    for d, evs in by_day.items():
        evs.sort()
        day = (base + datetime.timedelta(days=d)).strftime("%Y-%m-%d")
        vals = [v for _, v in evs]
        assert got[day] == (vals[0], max(vals), min(vals), vals[-1])


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)),
        min_size=1,
        max_size=20,
    )
)
def test_link_prediction_matches_bruteforce_model(spark, pairs):
    """G18's wedge-join candidates equal the brute-force python model:
    every non-adjacent pair with >=1 common neighbor, with exact CN and
    Jaccard."""
    from biodiversity_graph_db_spark.graph.algorithms import (
        link_prediction,
    )

    edges = {(str(a), str(b)) for a, b in pairs if a != b}
    assume(edges)
    df = spark.createDataFrame(sorted(edges), "src string, dst string")
    got = {
        (r.a, r.b): (r.common, r.jaccard)
        for r in link_prediction(df, k=1000).collect()
    }
    # python model on the undirected simple graph
    nbr: dict = {}
    for a, b in edges:
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    want = {}
    nodes = sorted(nbr)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            if b in nbr[a]:
                continue
            cn = len(nbr[a] & nbr[b])
            if cn == 0:
                continue
            j = cn / (len(nbr[a]) + len(nbr[b]) - cn)
            want[(a, b)] = (cn, int(j * 10000) / 10000.0)
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(1, 600)),
        min_size=1,
        max_size=80,
        unique_by=lambda t: t[0],
    )
)
def test_weighted_sample_matches_model_and_partitioning(spark, rows):
    """O8's Efraimidis–Spirakis hash-rank selection equals an
    independent Python model of ln(u)/w ranking (md5 replayed in
    hashlib) and is invariant under repartitioning — the two properties
    that make a weighted sample reproducible on a cluster."""
    import hashlib
    import math

    k = 10
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")

    def run(frame):
        hex8 = F.substring(
            F.md5(F.concat(F.lit("w8_"), F.col("doc_id").cast("string"))),
            1,
            8,
        )
        u_int = F.conv(hex8, 16, 10).cast("long") % 1000000
        lnu = F.floor(
            F.log((u_int + 1) / F.lit(1000000.0)) * 1e6
        ).cast("long")
        return [
            r.doc_id
            for r in frame.select(
                "doc_id", "n_chars", lnu.alias("lnu_micro")
            )
            .orderBy(
                (F.col("lnu_micro").cast("double") / F.col("n_chars")).desc(),
                "doc_id",
            )
            .limit(k)
            .collect()
        ]

    got = run(df)
    assert got == run(df.repartition(7)), "partitioning changed the sample"

    def model_key(doc_id, w):
        u_int = (
            int(hashlib.md5(f"w8_{doc_id}".encode()).hexdigest()[:8], 16)
            % 1000000
        )
        return (
            -(math.floor(math.log((u_int + 1) / 1000000.0) * 1e6) / w),
            doc_id,
        )

    want = [d for d, _ in sorted(rows, key=lambda t: model_key(*t))[:k]]
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(0, 4),          # user
            st.integers(0, 50),         # second offset
            st.sampled_from(["a", "b", "c"]),
        ),
        min_size=2,
        max_size=80,
    )
)
def test_type_transitions_match_python_model(spark, evs):
    """ED6's transition matrix equals the per-user sorted-sequence
    model for any event set, including simultaneous timestamps (the
    event_id tie-break makes the LEAD order total)."""
    rows = [(i, u, s, t) for i, (u, s, t) in enumerate(evs)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, s long, event_type string"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    tr = df.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    c = tr.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wt = Window.partitionBy("from_type")
    got = {
        (r.from_type, r.to_type): (r.n, r.rate_ppm)
        for r in c.withColumn(
            "rate_ppm", F.expr("n * 1000000 DIV sum(n) OVER (PARTITION BY from_type)")
        ).collect()
    }
    # python model
    per_user: dict = {}
    for i, (u, s, t) in enumerate(evs):
        per_user.setdefault(u, []).append((s, i, t))
    counts: dict = {}
    for seq in per_user.values():
        seq.sort()
        for (_, _, t1), (_, _, t2) in zip(seq, seq[1:]):
            counts[(t1, t2)] = counts.get((t1, t2), 0) + 1
    froms: dict = {}
    for (t1, _), n in counts.items():
        froms[t1] = froms.get(t1, 0) + n
    want = {
        k2: (n, n * 1000000 // froms[k2[0]]) for k2, n in counts.items()
    }
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.sampled_from(["x", "y", "z", "w"]), min_size=1, max_size=8),
        min_size=1,
        max_size=30,
    )
)
def test_pmi_pair_table_unigram_identity(spark, docs):
    """T36's load-bearing derivation: unigram counts reconstructed from
    the pair-with-successor table (c(x) = sum over successors,
    including the null one) equal direct token counts — for any corpus.
    This is what lets the query tokenize the corpus exactly once."""
    df = spark.createDataFrame([(" ".join(d),) for d in docs], "text string")
    tok = df.select(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("t")
    ).select(
        F.explode(
            F.expr(
                "transform(t, (x, i) ->"
                " struct(x AS w1, try_element_at(t, i + 2) AS w2))"
            )
        ).alias("pr")
    )
    p = (
        tok.select("pr.w1", "pr.w2")
        .where(F.col("w1") != "")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    got = {
        r.w: r.cu
        for r in p.groupBy(F.col("w1").alias("w"))
        .agg(F.sum("c").cast("long").alias("cu"))
        .collect()
    }
    want: dict = {}
    for d in docs:
        for t in d:
            want[t] = want.get(t, 0) + 1
    assert got == want


# --- D13 shared-span chaining vs a pure-Python model ----------------------


def _model_shared_spans(docs, k=8, df_cap=8):
    """Independent model of D13: stride-1 k-token shingles, df-capped,
    diagonal gaps-and-islands chaining."""
    import hashlib
    from collections import defaultdict

    toks = {
        i: re.sub(r"\s+", " ", t.strip().lower()).split(" ") for i, t in docs
    }
    occ = defaultdict(list)  # gram -> [(doc, pos)]
    for i, ts in toks.items():
        for p in range(len(ts) - k + 1):
            g = hashlib.md5(" ".join(ts[p : p + k]).encode()).hexdigest()
            occ[g].append((i, p + 1))
    out = defaultdict(list)  # (a, b) -> [(diag, pa)]
    for g, lst in occ.items():
        if not 2 <= len({d for d, _ in lst}) <= df_cap:
            continue
        for da, pa in lst:
            for db, pb in lst:
                if da < db:
                    out[(da, db)].append((pa - pb, pa))
    rows = []
    for (da, db), hits in out.items():
        runs = []
        for diag in {d for d, _ in hits}:
            ps = sorted(p for d, p in set(hits) if d == diag)
            run = 1
            for prev, cur in zip(ps, ps[1:]):
                if cur == prev + 1:
                    run += 1
                else:
                    runs.append(run)
                    run = 1
            runs.append(run)
        rows.append(
            (da, db, len(runs), max(runs) + k - 1, sum(runs) + (k - 1) * len(runs))
        )
    return sorted(rows)


def test_d13_spans_match_model(spark):
    """Handcrafted corpus exercising every chaining edge: a long shared
    span, two disjoint spans in one pair, a 3-doc shared gram, an
    in-doc repeated gram (two diagonals), and a hub gram past the df
    cap (must be excluded)."""
    from biodiversity_graph_db_spark.extensions.dedup import shared_spans

    span = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    span2 = "one two three four five six seven eight"
    hub = "h1 h2 h3 h4 h5 h6 h7 h8"
    docs = [
        (1, f"{span} filler1 xx {span2}"),
        (2, f"start2 {span} yy tail {span2}"),
        (3, f"{span2} only here"),
        (4, f"{span2} {span2} doubled"),  # in-doc repeat -> two diagonals
    ]
    # hub gram in >8 docs: must not create pairs on its own
    docs += [(10 + i, f"u{i} {hub} v{i}") for i in range(9)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = sorted(
        tuple(r) for r in shared_spans(df).collect()
    )
    want = _model_shared_spans(docs)
    assert got == want


def _model_span_coverage(docs, k=8, df_cap=8):
    """Independent model of span_coverage: per pair, the size of the
    UNION of intervals [pb, pb+k-1] over matched doc_b positions —
    computed literally as a position set, not via the lead trick."""
    import hashlib
    from collections import defaultdict

    toks = {
        i: re.sub(r"\s+", " ", t.strip().lower()).split(" ") for i, t in docs
    }
    occ = defaultdict(list)
    for i, ts in toks.items():
        for p in range(len(ts) - k + 1):
            g = hashlib.md5(" ".join(ts[p : p + k]).encode()).hexdigest()
            occ[g].append((i, p + 1))
    cover = defaultdict(set)  # (a, b) -> covered doc_b positions
    for g, lst in occ.items():
        if not 2 <= len({d for d, _ in lst}) <= df_cap:
            continue
        for da, _pa in lst:
            for db, pb in lst:
                if da < db:
                    cover[(da, db)].update(range(pb, pb + k))
    return sorted((a, b, len(s)) for (a, b), s in cover.items())


def test_d14_coverage_matches_model_and_is_bounded(spark):
    """The ADVICE-r8 overcount case: doc 4 repeats span2 in-doc, so
    D13's shared_tokens EXCEEDS coverage for its pairs — coverage must
    match the literal position-set model and never exceed n_tokens."""
    from biodiversity_graph_db_spark.extensions.dedup import (
        shared_spans,
        span_coverage,
    )

    span = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    span2 = "one two three four five six seven eight"
    docs = [
        (1, f"{span} filler1 xx {span2}"),
        (2, f"start2 {span} yy tail {span2}"),
        (3, f"{span2} only here"),
        (4, f"{span2} {span2} doubled"),  # in-doc repeat -> two diagonals
        # doc 5 is the ADVICE-r8 overcount witness: doc_a=4 holds span2
        # TWICE, so the pair (4,5) has two alignments onto the same pb
        # — shared_tokens (16) exceeds doc 5's n_tokens (9) while the
        # distinct covered positions are just the 8 of one span
        (5, f"{span2} tail5"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = sorted(tuple(r) for r in span_coverage(df).collect())
    assert got == _model_span_coverage(docs)
    n_tokens = {
        i: len(re.sub(r"\s+", " ", t.strip().lower()).split(" "))
        for i, t in docs
    }
    for _a, b, cov in got:
        assert cov <= n_tokens[b]
    # and the motivating inequality: mass exceeds BOTH coverage and the
    # doc's own length on the repeat pair — the dup_ppm > 1e6 bug
    mass = {
        (r.doc_a, r.doc_b): r.shared_tokens for r in shared_spans(df).collect()
    }
    cov_map = {(a, b): c for a, b, c in got}
    assert mass[(4, 5)] > n_tokens[5] >= cov_map[(4, 5)]


# --- V12 PQ codes + ADC ranking vs a numpy replay --------------------------


def test_v12_pq_matches_numpy_model(spark, sf_dir):
    """Third-engine check: replay codebook selection (md5 hash-rank),
    quantization, argmin assignment and ADC scoring in numpy/hashlib
    and demand the identical top-5 per query."""
    import hashlib

    import numpy as np

    from biodiversity_graph_db_spark import registry

    registry.load_all()
    got = [
        (r.q_id, r.rank, r.c_id)
        for r in registry.QUERIES["V12_pq_adc_topk"](spark, sf_dir).collect()
    ]

    import duckdb

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    X = np.array([r[1] for r in rows], dtype=np.float64)
    Xi = np.floor(X * 1e6)
    M, DS, K = 8, 8, 16
    samp = sorted(
        ids, key=lambda v: (hashlib.md5(f"pq_{v}".encode()).hexdigest(), v)
    )[:K]
    idx = {v: i for i, v in enumerate(ids)}
    C = Xi[[idx[v] for v in samp]]
    cbs = [C[:, m * DS : (m + 1) * DS] for m in range(M)]
    N = len(ids)
    codes = np.zeros((N, M), dtype=int)
    for m in range(M):
        sub = Xi[:, m * DS : (m + 1) * DS]
        d2 = ((sub[:, None, :] - cbs[m][None, :, :]) ** 2).sum(-1)
        codes[:, m] = d2.argmin(1)  # ties: argmin takes first = smallest j
    recon = np.stack([cbs[m][codes[:, m]] for m in range(M)], axis=1).reshape(N, -1)
    rn = (recon**2).sum(1)
    qsel = ids < 10
    Q = Xi[qsel]
    qn = (Q**2).sum(1)
    adc = (Q @ recon.T) / np.sqrt(qn[:, None] * rn[None, :])
    want = []
    for qi, q in enumerate(ids[qsel]):
        a = adc[qi].copy()
        a[idx[q]] = -np.inf
        order = sorted(range(N), key=lambda c: (-a[c], ids[c]))[:5]
        want += [(int(q), r + 1, int(ids[c])) for r, c in enumerate(order)]
    assert sorted(got) == sorted(want)


# --- T37 Naive Bayes vs a pure-Python model --------------------------------


def _qln(x: int) -> int:
    import math

    return math.floor(math.log(x) * 1_000_000)


def _model_nb(docs):
    """Independent NB replay: fit on even doc_ids, score odd, add-1
    smoothing, per-term qln quantization, argmax with class-name
    tie-break — mirrors the published multinomial NB exactly."""
    from collections import Counter, defaultdict

    tok = {
        i: [w for w in re.sub(r"\s+", " ", t.strip().lower()).split(" ") if w]
        for i, (t, _) in docs.items()
    }
    train = {i for i in docs if i % 2 == 0}
    wc: dict = defaultdict(Counter)
    prior: Counter = Counter()
    for i in train:
        prior[docs[i][1]] += 1
        wc[docs[i][1]].update(tok[i])
    vocab = {w for c in wc.values() for w in c}
    v = len(vocab)
    n_train = sum(prior.values())
    classes = sorted(prior)
    out = {}
    for i in sorted(set(docs) - train):
        best = None
        for c in classes:
            tot = sum(wc[c].values())
            s = _qln(prior[c]) - _qln(n_train)
            for w in tok[i]:
                s += _qln(wc[c][w] + 1) - _qln(tot + v)
            if best is None or s > best[0]:
                best = (s, c)
        out[i] = (docs[i][1], best[1], best[0])
    return out


def test_t37_nb_matches_model(spark):
    """Handcrafted corpus with separable classes plus OOV words in the
    test split, driven through the registered T37 pipeline on a temp
    parquet dir — predictions, scores and tie-breaks must equal the
    pure-Python NB replay."""
    import os
    import shutil
    import tempfile

    from biodiversity_graph_db_spark import registry

    registry.load_all()
    rows = [
        (0, "ham ham spam eggs", "en"),
        (1, "ham ham ham novel", "en"),      # OOV word 'novel'
        (2, "le chat le chien", "fr"),
        (3, "le le chat unseen", "fr"),
        (4, "spam eggs eggs ham", "en"),
        (5, "chien chat le ham", "fr"),
        (6, "ham eggs", "en"),
        (7, "totally oov words", "fr"),      # all-OOV doc: prior decides
    ]
    docs = {i: (t, c) for i, t, c in rows}
    tmp = tempfile.mkdtemp(prefix="t37_model_")
    try:
        spark.createDataFrame(
            [(i, t, c, "srcX", len(t)) for i, t, c in rows],
            ["doc_id", "text", "lang", "source", "n_chars"],
        ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
        got = {
            r.doc_id: (r.true_lang, r.pred_lang, r.score_micronats)
            for r in registry.QUERIES["T37_nb_langid"](spark, tmp).collect()
        }
        want = _model_nb(docs)
        assert got == want
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# --- T38 DSIR weights vs a pure-Python model --------------------------------


def _model_dsir(rows):
    from collections import Counter

    tok = {
        i: [w for w in re.sub(r"\s+", " ", t.strip().lower()).split(" ") if w]
        for i, t, _ in rows
    }
    cnt_t: Counter = Counter()
    cnt_r: Counter = Counter()
    for i, _, lang in rows:
        if lang == "en":
            cnt_t.update(tok[i])
        cnt_r.update(tok[i])
    v = len(cnt_r)
    tt, tr = sum(cnt_t.values()), sum(cnt_r.values())
    scored = []
    # token-less docs carry no importance weight and are excluded from
    # the ranking (the engine and oracle agree; pinned by hypothesis —
    # the divergence it found was in an earlier version of THIS model)
    for i, _, lang in rows:
        if not tok[i]:
            continue
        iw = sum(
            (_qln(cnt_t[w] + 1) - _qln(tt + v))
            - (_qln(cnt_r[w] + 1) - _qln(tr + v))
            for w in tok[i]
        )
        scored.append((i, lang, iw))
    scored.sort(key=lambda x: (-x[2], x[0]))
    return [
        (i, lang, iw, rk + 1) for rk, (i, lang, iw) in enumerate(scored[:30])
    ]


def test_t38_dsir_matches_model(spark):
    """Target-heavy vs off-target docs through the registered T38
    pipeline on a temp parquet dir — weights, ordering and rank
    tie-breaks must equal the pure-Python DSIR replay, and the
    target-language docs must surface at the head."""
    import os
    import shutil
    import tempfile

    from biodiversity_graph_db_spark import registry

    registry.load_all()
    rows = [
        (0, "stack heap pointer stack", "en"),
        (1, "stack heap alloc free", "en"),
        (2, "le chat dort ici", "fr"),
        (3, "der hund schlaeft hier", "de"),
        (4, "stack le pointer chat", "fr"),   # mixed: middling weight
        (5, "heap stack stack stack", "en"),
        (6, "uno dos tres cuatro", "es"),
    ]
    tmp = tempfile.mkdtemp(prefix="t38_model_")
    try:
        spark.createDataFrame(
            [(i, t, c, "srcX", len(t)) for i, t, c in rows],
            ["doc_id", "text", "lang", "source", "n_chars"],
        ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
        got = [
            (r.doc_id, r.lang, r.iw_micronats, r.rank)
            for r in registry.QUERIES["T38_dsir_weights"](spark, tmp).collect()
        ]
        want = _model_dsir(rows)
        assert got == want
        # sanity: every pure-target doc outranks every pure-off-target doc
        rank = {i: rk for i, _, _, rk in got}
        assert max(rank[0], rank[1], rank[5]) < min(rank[2], rank[3], rank[6])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# --- V17 Lloyd refinement vs a numpy integer replay -------------------------


def test_v17_kmeans_matches_numpy_model(spark, sf_dir):
    """Replay the exact quantized-integer Lloyd loop in numpy (int64
    grid, floor-mean updates, (sse, cent_id) lexicographic argmin) on
    the real sf fixture and demand identical per-iteration SSE and
    move counts; also pin the convergence semantics the audit exists
    for: SSE strictly improves over the seed assignment and moves
    never increase."""
    import numpy as np

    from biodiversity_graph_db_spark import registry
    from biodiversity_graph_db_spark.tables import table

    registry.load_all()
    emb = (
        table(spark, sf_dir, "embeddings")
        .orderBy("vec_id")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in emb], dtype=np.int64)
    vq = np.floor(
        np.array([r.embedding for r in emb], dtype=np.float64) * 1e6
    ).astype(np.int64)
    cents = vq[:8].copy()
    cent_ids = ids[:8].copy()

    def assign(c, cids):
        sse = ((vq[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        order = np.lexsort((np.broadcast_to(cids, sse.shape), sse), axis=1)
        pick = order[:, 0]
        return cids[pick], sse[np.arange(len(vq)), pick]

    a_prev, sse_prev = assign(cents, cent_ids)
    want = [(0, 0, int(sse_prev.sum()))]
    for it in range(1, 4):
        new_ids = np.array(sorted(set(a_prev.tolist())), dtype=np.int64)
        cents = np.stack(
            [
                np.floor(
                    vq[a_prev == c].sum(axis=0).astype(np.float64)
                    / (a_prev == c).sum()
                ).astype(np.int64)
                for c in new_ids
            ]
        )
        a_cur, sse_cur = assign(cents, new_ids)
        want.append(
            (it, int((a_cur != a_prev).sum()), int(sse_cur.sum()))
        )
        a_prev = a_cur
    got = [
        (r.iter, r.n_moved, r.sse)
        for r in registry.QUERIES["V17_kmeans_refine"](spark, sf_dir).collect()
    ]
    assert got == want
    sses = [s for _, _, s in got]
    moves = [m for _, m, _ in got[1:]]
    assert sses[-1] < sses[0]
    assert all(b <= a for a, b in zip(moves, moves[1:]))


# --- T37/T38 on hypothesis-random corpora ----------------------------------
# The handcrafted model tests pin the known edges (OOV, all-OOV, mixed);
# these let hypothesis hunt for the ones nobody thought of — score ties,
# single-word vocabularies, classes present only in the test split,
# whitespace-only documents, duplicate texts across classes.

_WORDS = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
_LANG = st.sampled_from(["en", "fr", "zh"])


def _doc_text(draw):
    return " ".join(draw(st.lists(_WORDS, min_size=0, max_size=8)))


@st.composite
def _corpus(draw):
    n = draw(st.integers(min_value=2, max_value=10))
    rows = [
        (i, " ".join(draw(st.lists(_WORDS, min_size=0, max_size=8))),
         draw(_LANG))
        for i in range(n)
    ]
    # NB needs a non-empty train split with at least one token; DSIR
    # needs a non-empty vocabulary — regenerate degenerate draws
    assume(any(i % 2 == 0 and t.strip() for i, t, _ in rows))
    assume(any(i % 2 == 1 for i, _, _ in rows))
    assume(any(t.strip() for _, t, _ in rows))
    return rows


def _write_docs(spark, tmp, rows):
    import os

    spark.createDataFrame(
        [(i, t, c, "srcX", len(t)) for i, t, c in rows],
        ["doc_id", "text", "lang", "source", "n_chars"],
    ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_corpus())
def test_t37_nb_random_corpora(spark, rows):
    import shutil
    import tempfile

    from biodiversity_graph_db_spark import registry

    registry.load_all()
    tmp = tempfile.mkdtemp(prefix="t37_hyp_")
    try:
        _write_docs(spark, tmp, rows)
        got = {
            r.doc_id: (r.true_lang, r.pred_lang, r.score_micronats)
            for r in registry.QUERIES["T37_nb_langid"](spark, tmp).collect()
        }
        want = _model_nb({i: (t, c) for i, t, c in rows})
        assert got == want
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_corpus())
def test_t38_dsir_random_corpora(spark, rows):
    import shutil
    import tempfile

    from biodiversity_graph_db_spark import registry

    registry.load_all()
    tmp = tempfile.mkdtemp(prefix="t38_hyp_")
    try:
        _write_docs(spark, tmp, rows)
        got = [
            (r.doc_id, r.lang, r.iw_micronats, r.rank)
            for r in registry.QUERIES["T38_dsir_weights"](spark, tmp).collect()
        ]
        want = _model_dsir(rows)
        assert got == want
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# --- V17 Lloyd loop on hypothesis-random vector sets ------------------------
# The fixture replay (test_v17_kmeans_matches_numpy_model) covers real
# data; random small vector sets reach the edges the fixture never
# produces — clusters that EMPTY mid-run (the centroid must drop out in
# both engines), exact SSE ties (cent_id tie-break), negative and
# boundary components, fewer vectors than seeds.


def _model_km_curve(vecs, iters=3, k=8):
    """Pure-numpy replay of the quantized-integer Lloyd audit curve for
    an arbitrary (vec_id -> float components) set; k seeds = first
    min(k, N) vec_ids, same rules as km_* (floor ×1e6 grid, integer
    SSE, (sse, cent_id) argmin, floor-mean update, empty clusters drop)."""
    import numpy as np

    ids = np.array(sorted(vecs), dtype=np.int64)
    vq = np.floor(
        np.array([vecs[i] for i in ids], dtype=np.float64) * 1e6
    ).astype(np.int64)
    cent_ids = ids[: min(k, len(ids))].copy()
    cents = vq[: min(k, len(ids))].copy()

    def assign(c, cids):
        sse = ((vq[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        order = np.lexsort((np.broadcast_to(cids, sse.shape), sse), axis=1)
        pick = order[:, 0]
        return cids[pick], sse[np.arange(len(vq)), pick]

    a_prev, sse_prev = assign(cents, cent_ids)
    out = [(0, 0, int(sse_prev.sum()))]
    for it in range(1, iters + 1):
        new_ids = np.array(sorted(set(a_prev.tolist())), dtype=np.int64)
        cents = np.stack(
            [
                np.floor(
                    vq[a_prev == c].sum(axis=0).astype(np.float64)
                    / (a_prev == c).sum()
                ).astype(np.int64)
                for c in new_ids
            ]
        )
        a_cur, sse_cur = assign(cents, new_ids)
        out.append((it, int((a_cur != a_prev).sum()), int(sse_cur.sum())))
        a_prev = a_cur
    return out


@st.composite
def _vecset(draw):
    n = draw(st.integers(min_value=2, max_value=14))
    dims = draw(st.integers(min_value=1, max_value=4))
    comp = st.integers(min_value=-40, max_value=40)
    return {
        i: [draw(comp) / 8.0 for _ in range(dims)] for i in range(n)
    }


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(vecs=_vecset())
def test_v17_km_loop_random_vectors(spark, vecs):
    """Drive the km_* building blocks exactly as V17 composes them over
    a random vector set and demand the identical audit curve from the
    numpy integer replay — including runs where clusters empty out."""
    from pyspark.sql import functions as SF

    from biodiversity_graph_db_spark.extensions import similarity as sim

    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in sorted(vecs.items())],
        "vec_id long, embedding array<float>",
    )
    evq = sim.km_quantize(emb)
    cents = sim.km_seed_centroids(emb, evq)
    a_prev = sim.km_assign(evq, cents)
    got = [
        (
            0,
            0,
            a_prev.agg(SF.sum("ssev").cast("long")).collect()[0][0],
        )
    ]
    for it in range(1, 4):
        cents = sim.km_update(evq, a_prev)
        a_cur = sim.km_assign(evq, cents)
        moved = (
            a_cur.select("vec_id", SF.col("cent_id").alias("cur"))
            .join(
                a_prev.select("vec_id", SF.col("cent_id").alias("prev")),
                "vec_id",
            )
            .where("cur <> prev")
            .count()
        )
        got.append(
            (it, moved, a_cur.agg(SF.sum("ssev").cast("long")).collect()[0][0])
        )
        a_prev = a_cur
    assert got == _model_km_curve(vecs)


# --- D13 span chaining on hypothesis-random corpora --------------------------
# The handcrafted corpus in test_d13_spans_match_model pins the known
# chaining edges; random tiny-vocab docs make shared grams and broken
# diagonals COMMON (a 3-word alphabet with k=3 collides constantly), so
# hypothesis hunts the chaining/df-cap/self-diagonal interactions nobody
# scripted.


@st.composite
def _span_corpus(draw):
    n = draw(st.integers(min_value=2, max_value=6))
    word = st.sampled_from(["x", "y", "z"])
    return [
        (i, " ".join(draw(st.lists(word, min_size=0, max_size=12))))
        for i in range(n)
    ]


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=_span_corpus(), k=st.integers(min_value=2, max_value=4))
def test_d13_spans_random_corpora(spark, docs, k):
    from biodiversity_graph_db_spark.extensions.dedup import shared_spans

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(tuple(r) for r in shared_spans(df, k=k).collect())
    want = _model_shared_spans(docs, k=k)
    assert got == want


# --- T14 chunking vs a pure-Python model ------------------------------------
# Oracle parity proves Spark ≡ DuckDB, but both spell the SAME
# n_chunks/slice formula — the shared-misconception class the T37
# class-grid bug proved real.  The model below derives chunk bounds
# from first principles (emit windows until the previous one reached
# the end), so an off-by-one in the shared ceil() arithmetic would
# diverge here even though parity stays green.


def _model_chunks(rows, size=50, overlap=10):
    stride = size - overlap
    out = []
    for doc_id, text in rows:
        toks = re.sub(r"\s+", " ", text.strip()).split(" ")
        cid = 0
        while True:
            chunk = toks[cid * stride : cid * stride + size]
            out.append((doc_id, cid, len(chunk), " ".join(chunk)))
            if cid * stride + size >= len(toks):
                break
            cid += 1
    return sorted(out)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    lengths=st.lists(
        st.integers(min_value=1, max_value=160), min_size=1, max_size=8
    )
)
def test_t14_chunking_matches_model(spark, lengths):
    import os
    import shutil
    import tempfile

    from biodiversity_graph_db_spark import registry

    registry.load_all()
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(n)))
        for i, n in enumerate(lengths)
    ]
    tmp = tempfile.mkdtemp(prefix="t14_hyp_")
    try:
        spark.createDataFrame(
            [(i, t, "en", "srcX", len(t)) for i, t in rows],
            ["doc_id", "text", "lang", "source", "n_chars"],
        ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
        got = sorted(
            (r.doc_id, r.chunk_id, r.n_chunk_tokens, r.chunk_text)
            for r in registry.QUERIES["T14_chunking"](spark, tmp).collect()
        )
        assert got == _model_chunks(rows)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
