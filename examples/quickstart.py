"""End-to-end quickstart: what a user of the reference does daily,
re-expressed on this engine.

    python examples/quickstart.py            # uses /root/testdata/sf0.001

Walks the whole surface: seed the graph, code a new study site (scenario
automation), traverse and aggregate it, run the GraphX-style analytics,
then run a pretraining-corpus pass (dedup → quality → split → vocab) and
an ANN search over the embeddings table.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from biodiversity_graph_db_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("quickstart")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. Seed the evidence graph (time index + seed sources/taxa)
    from biodiversity_graph_db_spark.graph.seed import seed_graph

    store = seed_graph(spark).cache()
    print("seeded:", store.nodes.count(), "nodes,", store.edges.count(), "edges")

    # 2. Code a study site — the reference's scenario automation as one
    #    validated multi-node transaction
    from biodiversity_graph_db_spark.graph.scenarios import (
        SiteOnlyScenario,
        automate_simple_site,
    )

    source_key = "sourcenode_pub_quickstart_a_2024"
    src = store.spark.createDataFrame(
        [(source_key, "SourceNode", "Quickstart et al. 2024", None)],
        "key string, node_type string, pretty_name string, payload string",
    )
    store = store.add_nodes(src)
    store, timeline_key = automate_simple_site(
        store,
        source_key,
        SiteOnlyScenario(
            site_name="Quickstart Bog",
            sampling_location="DD 64.2N 21.1W",
            sample_origin="LakeSediment",
            earliest_year=("BP", 9000.0),
            latest_year=("BP", 200.0),
            proxy_categories=["Pollen"],
        ),
    )
    print("coded timeline:", timeline_key)

    # 3. Traverse it back: the timeline's star (one-hop) and its temporal
    #    extent via the promoted edge_year_value column
    star = store.edges.where(F.col("source_key") == timeline_key)
    print("timeline star:")
    star.select("relation", "sink_key").show(truncate=False)

    # 4. Analytics: taxonomy closure + PageRank over the seeded graph
    from biodiversity_graph_db_spark.graph.algorithms import pagerank
    from biodiversity_graph_db_spark.graph.traversal import (
        transitive_closure,
    )

    isa = store.edges.where(F.col("relation") == "IsA").select(
        "source_key", "sink_key"
    )
    closure = transitive_closure(isa)
    print("taxonomy closure rows:", closure.count())
    ranks = pagerank(
        store.edges.select("source_key", "sink_key"), iterations=5
    )
    print("top-ranked nodes:")
    ranks.orderBy(F.col("rank_micro").desc()).show(5, truncate=False)

    # 5. Pretraining-corpus pass over the documents table
    from biodiversity_graph_db_spark.streaming.pipeline import (
        prepare_documents,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    prepared = prepare_documents(docs, min_quality=0.5)
    print("corpus after scrub + quality gate:", prepared.count(), "docs")
    prepared.groupBy("split").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("tokens")
    ).orderBy("split").show()

    # 6. ANN: IVF top-5 neighbours for the first 3 embedding vectors
    from biodiversity_graph_db_spark.extensions.similarity import ivf_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    hits = ivf_topk(emb, emb.where(F.col("vec_id") < 3), n_centroids=8,
                    n_probe=2, k=5)
    hits.orderBy("q_id", "rank").show()

    # 7. Spatial: promote sampling locations once, then bbox + polygon
    from biodiversity_graph_db_spark.operators import spatial

    ctx = spatial.promote_context_cols(
        spatial.mint_context_nodes(spark, SF_DIR)
    )
    in_box = ctx.where(
        (F.col("lat_max") >= -30) & (F.col("lat_min") <= 30)
        & (F.col("lon_max") >= -60) & (F.col("lon_min") <= 60)
    )
    print("contexts intersecting the viewport:", in_box.count())
    in_poly = ctx.where(F.col("kind").isin("Site", "SiteDMS")).where(
        spatial.point_in_query_polygon(F.col("pt_lat"), F.col("pt_lon"))
    )
    print("point contexts inside the study polygon:", in_poly.count())

    # 8. Tokenizer: learn 4 BPE merges on the corpus, encode it, and
    #    read the compression the learned vocab buys
    from biodiversity_graph_db_spark.extensions.bpe import (
        bpe_encode_docs,
        bpe_train,
    )

    merges = [
        (r.left_sym, r.right_sym)
        for r in bpe_train(spark, SF_DIR).orderBy("step").collect()
    ]
    print("learned merges:", merges)
    bpe_encode_docs(spark, SF_DIR, merges).agg(
        F.sum("n_symbols").alias("symbols"), F.sum("n_tokens").alias("tokens")
    ).show()

    # 9. Change management: diff two store versions, maintain stats
    #    incrementally, reconstruct by replaying the diff
    from biodiversity_graph_db_spark.operators.snapshot import (
        apply_diff,
        snapshot_diff,
    )

    v_a = store.nodes.select(
        "key", F.xxhash64("node_type", "pretty_name").alias("val")
    )
    v_b = v_a.where(~F.col("key").startswith("biodiversity")).unionByName(
        spark.createDataFrame(
            [("sourcenode_new_2025", 0)], "key string, val long"
        )
    )
    diff = snapshot_diff(v_a, v_b, ["key"], "val")
    diff.groupBy("change").count().show()
    assert apply_diff(v_a, diff, ["key"]).exceptAll(v_b).isEmpty()
    print("diff replay reconstructs the new snapshot exactly")

    # 10. Time travel on the graph itself: commit mutations to the
    #     delta log, read any past version back, compact old history
    import shutil
    import tempfile

    from biodiversity_graph_db_spark.graph.versioned import (
        VersionedGraphLog,
        compact_graph_log,
    )

    logdir = tempfile.mkdtemp(prefix="quickstart_vlog_")
    try:
        log = VersionedGraphLog(spark, logdir)
        log.commit(store)  # v1: the seed graph
        mutated = store.add_nodes(
            spark.createDataFrame(
                [("taxonnode_genus_demo", "TaxonNode", "Demo")],
                "key string, node_type string, pretty_name string",
            )
        )
        log.commit(mutated)  # v2
        assert log.read_version(1).nodes.count() + 1 == (
            log.read_version(2).nodes.count()
        )
        compact_graph_log(log, 1)  # collapse history below v1
        print("graph versions:", log.head, "— v1 readable after compaction:",
              log.read_version(1).nodes.count(), "nodes")
    finally:
        shutil.rmtree(logdir, ignore_errors=True)

    # 11. Sketches: Bloom join pruning and histogram quantiles
    from biodiversity_graph_db_spark.extensions.sketches import (
        bloom_build,
        bloom_probe,
        histogram_bins,
        histogram_quantiles,
    )
    from biodiversity_graph_db_spark.tables import table

    orders = table(spark, SF_DIR, "orders")
    members = orders.select(F.col("o_custkey").alias("k")).distinct()
    bloom = bloom_build(members, "k")
    cust = table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("k")
    )
    bloom_probe(cust, bloom, "k").groupBy("in_bloom").count().show()
    histogram_quantiles(histogram_bins(orders, "o_totalprice")).show()

    spark.stop()


if __name__ == "__main__":
    main()
