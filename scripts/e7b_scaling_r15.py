"""r15 verdict task 2: diagnose e7b_minhash_dedup_keep's negative core
scaling (driver r14: 35.9 s at 32 cores vs 14.7 s at 8 — ratio 0.41).

Phase-decomposes the composed pipeline at a given core count:

  A. exact_collapse + md5km MinHash LSH pair emission (the ckpt(pairs)
     materialization inside connected_components)
  B. contraction pre-pass (mmap + rewritten edge list, both ckpt'd)
  C. propagation loop (per-round wall: join+agg+doubling+ckpt+sum)
  D. final composition + keep-set semi-join (the remaining lazy plan
     into the noop sink)

Run once per core count in SEPARATE processes (fresh JVM each):

    python scripts/e7b_scaling_r15.py 32
    python scripts/e7b_scaling_r15.py 8

Optional second arg = sf dir (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE", str(cpus))

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"e7b-scaling-c{cpus}")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warmup
    noop(spark.read.parquet(f"{sf_dir}/lineitem.parquet"))

    from decision_tree_stuff_spark.operators.clustering import (
        exact_collapse,
        release_components,
    )
    from decision_tree_stuff_spark.operators.dedup import minhash_lsh_pairs
    from decision_tree_stuff_spark.queries._shared import _docs
    from decision_tree_stuff_spark.utils import release_local_checkpoint

    for rep in range(2):
        t_total0 = time.time()
        docs = _docs(spark, sf_dir)

        # --- A: collapse + pair emission, materialized (mirrors
        # connected_components' ckpt(pairs)) ---
        t0 = time.time()
        rep_docs, membership = exact_collapse(docs)
        pairs_raw = minhash_lsh_pairs(
            rep_docs, bands=8, threshold=0.7, hash_fn="md5km"
        )
        pairs = pairs_raw.select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        ).localCheckpoint(eager=True)
        tA = time.time() - t0
        n_pairs = pairs.count()

        # --- B: contraction pre-pass ---
        t0 = time.time()
        sym = pairs.union(pairs.select(F.col("dst"), F.col("src")))
        mmap = (
            sym.groupBy("src")
            .agg(F.min("dst").alias("__mn"))
            .select(
                F.col("src").alias("node"),
                F.least(F.col("src"), F.col("__mn")).alias("m"),
            )
            .localCheckpoint(eager=True)
        )
        msrc = mmap.select(F.col("node").alias("src"), F.col("m").alias("ms"))
        mdst = mmap.select(F.col("node").alias("dst"), F.col("m").alias("md"))
        edges = (
            sym.join(msrc, "src")
            .join(mdst, "dst")
            .where(F.col("ms") != F.col("md"))
            .select(F.col("ms").alias("src"), F.col("md").alias("dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        tB = time.time() - t0
        n_edges = edges.count()
        release_local_checkpoint(pairs)

        # --- C: propagation loop ---
        t0 = time.time()
        labels = (
            edges.select(F.col("src").alias("node"))
            .distinct()
            .select("node", F.col("node").alias("label"))
            .localCheckpoint(eager=True)
        )
        def label_sum(df):
            return df.agg(
                F.sum(F.col("label").cast("decimal(38,0)"))
            ).first()[0]

        prev = label_sum(labels)
        rounds = []
        for _ in range(25):
            r0 = time.time()
            nbr_min = (
                edges.join(labels, edges["src"] == labels["node"])
                .groupBy("dst")
                .agg(F.min("label").alias("nbr_label"))
            )
            stepped = labels.join(
                nbr_min, labels["node"] == nbr_min["dst"], "left"
            ).select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", "label")
                ).alias("label"),
            )
            hop = stepped.select(
                F.col("node").alias("h_node"),
                F.col("label").alias("h_label"),
            )
            new_labels = (
                stepped.join(hop, stepped["label"] == hop["h_node"], "left")
                .select(
                    "node",
                    F.least(
                        F.col("label"), F.coalesce("h_label", "label")
                    ).alias("label"),
                )
                .localCheckpoint(eager=True)
            )
            cur = label_sum(new_labels)
            old, labels = labels, new_labels
            release_local_checkpoint(old)
            rounds.append(round(time.time() - r0, 3))
            if cur == prev:
                break
            prev = cur
        tC = time.time() - t0
        release_local_checkpoint(edges)

        # --- D: composition + keep-set semi-join ---
        t0 = time.time()
        clabels = labels.select(
            F.col("node").alias("m"), F.col("label").alias("__cl")
        )
        touched = mmap.join(clabels, "m", "left").select(
            F.col("node").alias("doc_id"),
            F.coalesce("__cl", "m").alias("cluster_id"),
        )
        comp = rep_docs.select("doc_id").join(touched, "doc_id", "left").select(
            "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
        )
        kept = (
            membership.join(
                comp.select(F.col("doc_id").alias("rep_id"), "cluster_id"),
                "rep_id",
            )
            .where(F.col("doc_id") == F.col("cluster_id"))
            .select("doc_id")
        )
        out = docs.join(kept, "doc_id", "semi").select(
            "doc_id", "lang", "n_chars"
        )
        noop(out)
        tD = time.time() - t0
        release_local_checkpoint(labels)
        release_local_checkpoint(mmap)

        total = time.time() - t_total0
        print(
            f"[c{cpus} rep{rep}] pairs={n_pairs} edges={n_edges} "
            f"A_emit={tA:.2f} B_contract={tB:.2f} C_loop={tC:.2f} "
            f"(rounds={rounds}) D_final={tD:.2f} total={total:.2f}",
            flush=True,
        )

        # full-query reference timing (bench shape)
        from decision_tree_stuff_spark.queries import ALL_QUERIES

        spark.catalog.clearCache()
        for _ in range(2):
            spark._jvm.System.gc()
        time.sleep(0.5)
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            noop(ALL_QUERIES["e7b_minhash_dedup_keep"](spark, sf_dir))
            best = min(best, time.time() - t0)
        print(f"[c{cpus} rep{rep}] full_query_min2={best:.2f}", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
