"""One-order-up scale evidence (round-5 judge item 3): run the top-cost
operators at gen_sf0.1 and gen_sf1 (scripts/gen_sf.py datasets — ratios
are computed WITHIN the generator family so generator-vs-driver shape
differences cancel) and print one JSON line with per-op times and
sf1/sf0.1 ratios.

For the ops whose registered queries pin the graph size for oracle
tractability (G9/G11 on the _LI_BOUND=600 li_graph slice), the kernels
are additionally driven on a 10x-larger minted graph (bound 6000) at
sf1, with edge counts recorded for per-edge normalization — that, not
the SF ratio, is the honest iterative-kernel scaling number.

Usage: python scripts/scale_run.py [runs]   (default min-of-2)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMALL = "/root/repo/.scratch/gen_sf0.1"
BIG = "/root/repo/.scratch/gen_sf1"


def timed(fn, runs: int) -> float:
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(min(ts), 3)


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    import gc
    import shutil
    import tempfile

    from biodiversity_graph_db_spark import registry
    from biodiversity_graph_db_spark.session import get_spark
    from biodiversity_graph_db_spark.tables import TABLES, table

    registry.load_all()
    spark = get_spark("scale")
    spark.sparkContext.setLogLevel("ERROR")

    from biodiversity_graph_db_spark.extensions.bpe import (
        bpe_encode_docs_kernel,
        bpe_train,
    )
    from biodiversity_graph_db_spark.extensions.simhash import (
        simhash_neardups,
    )
    from pyspark.sql import functions as F

    from biodiversity_graph_db_spark.graph.algorithms import (
        label_propagation,
    )
    from biodiversity_graph_db_spark.operators.graph_analytics import (
        kcore_peel,
        li_graph,
        wli_graph,
    )
    from biodiversity_graph_db_spark.graph.algorithms import (
        weighted_sssp,
    )
    from biodiversity_graph_db_spark.operators.spatial import (
        geo1_bbox_stored,
        mint_context_nodes,
        points_in_areas,
        promote_context_cols,
    )
    from biodiversity_graph_db_spark.operators.temporal import (
        ed2_promoted_edges,
        ed2_rollup,
    )

    # fixed merge table for the encode kernel (train once, small SF —
    # encode cost is what scales with the corpus)
    merges = [
        (r.left_sym, r.right_sym)
        for r in bpe_train(spark, SMALL).orderBy("step").collect()
    ]

    out: dict = {"runs_per_op": runs, "sf_ratio": 10, "ops": {}}

    for tag, sf_dir in (("sf0.1", SMALL), ("sf1", BIG)):
        for t in TABLES:
            table(spark, sf_dir, t).count()  # warm footers
        res: dict[str, float] = {}

        res["G6_pagerank"] = timed(
            lambda: registry.QUERIES["G6_pagerank"](spark, sf_dir).collect(),
            runs,
        )
        res["G10_ebv_richness"] = timed(
            lambda: registry.QUERIES["G10_ebv_richness"](
                spark, sf_dir
            ).collect(),
            runs,
        )
        res["E3_simhash_full"] = timed(
            lambda: simhash_neardups(
                table(spark, sf_dir, "documents")
            ).count(),
            runs,
        )
        res["T19b_encode_kernel_full"] = timed(
            lambda: bpe_encode_docs_kernel(
                spark, sf_dir, merges, doc_limit=None
            ).count(),
            runs,
        )
        # round-6/7 additions (VERDICT r6 item 6): the post-fix
        # single-pass decontamination, the full-corpus TF-IDF pass,
        # W8's interpolated resample, and V7's quantized search — all
        # registered queries already run corpus-wide
        res["D5_contamination_purge"] = timed(
            lambda: registry.QUERIES["D5_contamination_purge"](
                spark, sf_dir
            ).collect(),
            runs,
        )
        res["T26_tfidf_full"] = timed(
            lambda: registry.QUERIES["T26_tfidf_topk"](
                spark, sf_dir
            ).count(),
            runs,
        )
        res["W8_resample_lerp"] = timed(
            lambda: registry.QUERIES["W8_resample_lerp"](
                spark, sf_dir
            ).count(),
            runs,
        )
        res["V7_quantized_topk"] = timed(
            lambda: registry.QUERIES["V7_quantized_topk"](
                spark, sf_dir
            ).collect(),
            runs,
        )
        # round-7 wave-2/3 additions: every corpus-wide registered
        # query runs as-is; M5's pinned slice is widened to the full
        # fact table via the generic spmm helper
        for q in (
            "T27_bm25_topk",
            "T28_lm_perplexity",
            "D7_split_leakage",
            "D8_boilerplate_scrub",
            "V8_mmr_rerank",
            "PR2_key_skew",
            "W9_multires_rollup",
            # round-7 fourth wave (all corpus-wide except D9, whose
            # ground-truth stage is slice-bounded by contract)
            "A9_exact_median",
            "W10_decay_score",
            "PR3_psi_drift",
            "J10_bloom_semijoin",
            "EX2_shard_manifest",
            # round-7 fifth wave (G18/D9/D10 audit-slice-bounded by
            # contract; V9 tracks V1's linear-scan baseline)
            "F12_json_extract",
            "A10_grouped_mode",
            "A11_salted_distinct",
            "C3_rate_changepoint",
            "U8_scd2_history",
            "T31_temperature_mix",
            "T32_curation_audit",
            "W12_ohlc_bars",
            "W13_funnel_conversion",
            "O5_keyset_page",
            "V9_filtered_topk",
            # round-7 sixth wave (MM4 audit-slice-bounded by contract)
            "PR4_joinsize_estimate",
            "W14_zscore_anomalies",
            "ED4_time_weighted_avg",
        ):
            res[q] = timed(
                lambda q=q: registry.QUERIES[q](spark, sf_dir).collect(),
                runs,
            )
        from biodiversity_graph_db_spark.operators.matrix import spmm

        def _spmm_full():
            li = table(spark, sf_dir, "lineitem")
            a = li.select(
                F.col("l_orderkey").alias("i"),
                F.col("l_suppkey").alias("k"),
                F.floor(F.col("l_quantity") * 10000).cast("long").alias("v"),
            )
            b = table(spark, sf_dir, "supplier").select(
                F.col("s_suppkey").alias("k"),
                F.col("s_nationkey").alias("j"),
                F.lit(1).cast("long").alias("v"),
            )
            return spmm(a, b).count()

        res["M5_spmm_full"] = timed(_spmm_full, runs)

        tmp = tempfile.mkdtemp(prefix="scale_")
        try:
            t0 = time.perf_counter()
            ed2_promoted_edges(spark, sf_dir).write.parquet(f"{tmp}/ed2")
            res["ED2_write"] = round(time.perf_counter() - t0, 3)
            res["ED2_read"] = timed(
                lambda: ed2_rollup(
                    spark.read.parquet(f"{tmp}/ed2")
                ).collect(),
                runs,
            )
            t0 = time.perf_counter()
            promote_context_cols(
                mint_context_nodes(spark, sf_dir)
            ).write.parquet(f"{tmp}/ctx")
            res["GEO_promote_write"] = round(time.perf_counter() - t0, 3)
            res["GEO3_join_stored"] = timed(
                lambda: points_in_areas(
                    spark.read.parquet(f"{tmp}/ctx")
                ).count(),
                runs,
            )
            res["GEO1_bbox_stored"] = timed(
                lambda: geo1_bbox_stored(
                    spark.read.parquet(f"{tmp}/ctx")
                ).count(),
                runs,
            )
            # SD6 split (the ED2 discipline): the log build is the
            # write path; the range diff itself is two pruned as-of
            # reads through one full-outer presence diff
            from biodiversity_graph_db_spark.operators import snapshot

            t0 = time.perf_counter()
            sd_log = snapshot._build_sd4_log(spark, sf_dir)
            res["SD6_log_write"] = round(time.perf_counter() - t0, 3)
            res["SD6_range_diff_read"] = timed(
                lambda: snapshot.snapshot_diff(
                    sd_log.read_version(1).nodes,
                    sd_log.read_version(3).nodes,
                    ["key"],
                    "pretty_name",
                ).count(),
                runs,
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        out["ops"][tag] = res
        gc.collect()

    # iterative kernels: grow the minted graph 10x at sf1
    kern: dict = {}
    for bound in (600, 6000):
        edges = li_graph(spark, BIG, bound=bound).localCheckpoint()
        n_edges = edges.count()
        # kcore_peel's canonical undirected form (a < b, the G11 mint)
        und = (
            edges.select(
                F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"),
            )
            .dropDuplicates()
            .localCheckpoint()
        )
        wedges = wli_graph(spark, BIG, bound=bound).localCheckpoint()
        from biodiversity_graph_db_spark.graph.algorithms import (
            clustering_coefficient,
            harmonic_centrality,
            hits,
            link_prediction,
            modularity,
            personalized_pagerank,
            undirect,
        )

        und2 = undirect(edges).localCheckpoint()
        k = {
            "n_edges": n_edges,
            "n_wedges": wedges.count(),
            "G9_lpa": timed(
                lambda: label_propagation(edges, max_iter=5).count(), runs
            ),
            "G11_kcore": timed(lambda: kcore_peel(und).count(), runs),
            "G13_sssp": timed(
                lambda: weighted_sssp(
                    wedges, "o_1", rounds=6
                ).count(),
                runs,
            ),
            # round-7 additions on the same minted graph
            "G14_hits": timed(
                lambda: hits(edges, iterations=5).count(), runs
            ),
            "G15_modularity": timed(
                lambda: modularity(
                    edges, label_propagation(edges, max_iter=5)
                ).count(),
                runs,
            ),
            "G16_harmonic": timed(
                lambda: harmonic_centrality(
                    und2, ["o_1", "o_2", "o_3", "o_4"], max_hops=4
                ).count(),
                runs,
            ),
            "G17_clustering": timed(
                lambda: clustering_coefficient(edges).count(), runs
            ),
            "G18_link_prediction": timed(
                lambda: link_prediction(edges).count(), runs
            ),
            "G19_ppr": timed(
                lambda: personalized_pagerank(
                    und2, ["o_1", "o_2"], iterations=5
                ).count(),
                runs,
            ),
        }
        kern[f"bound_{bound}"] = k
        gc.collect()
    out["li_graph_kernels_sf1"] = kern

    ratios = {
        op: round(out["ops"]["sf1"][op] / out["ops"]["sf0.1"][op], 2)
        for op in out["ops"]["sf1"]
        if out["ops"]["sf0.1"][op] > 0
    }
    out["sf1_over_sf01"] = ratios
    b0, b1 = kern["bound_600"], kern["bound_6000"]
    out["kernel_edge_ratio"] = round(b1["n_edges"] / b0["n_edges"], 2)
    out["kernel_time_ratio"] = {
        op: round(b1[op] / b0[op], 2)
        for op in b0
        if op not in ("n_edges", "n_wedges") and b0[op] > 0
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
