"""Build a synthetic 10x scale factor from sf0.1 for scaling-slope
measurement (round-7 task: measure the ratio-to-baseline trend with
sf instead of asserting it).

Construction (documented per the task): each output table is the
UNION of ``replicas`` copies of the sf0.1 table with replica i's ids
offset by ``i * id_stride`` — ids stay unique, every other column is
byte-identical. Two consequences to read the numbers with:

* Replica docs are EXACT clones of their originals, so near-dup
  operators see every cross-replica pair as a genuine duplicate: a
  sf0.1 pair (a, b) becomes up to replicas^2 pairs and each doc gains
  replicas-1 clone pairs. Both engines face the identical blow-up —
  the RATIO between engines is the measurement, not the absolute
  runtime. This is the adversarial (upper-bound) shape; tagged-vocab
  sharding would be the embarrassingly-parallel lower bound.
* Output is written as 32 parquet files per table so the sf1 scan has
  real split parallelism (and ``spread_small`` correctly no-ops —
  the guard is exercised, not bypassed).

Perturbed mode (r9 verdict task 4 — honest GRAPH scaling): exact
clone replicas make the near-dup pair graph quadratic in replicas
(every doc gains a replicas-clique), so graph-family slopes
(e7/e7b/e7d) measured on clone unions stop at sf1 by construction.
``perturb`` replaces ~25% of each replica's documents.text tokens
with a replica-keyed junk token at hash-chosen positions:

* the noise pattern is keyed on (position, replica) — NOT the doc —
  so two docs that were near-dups inside sf0.1 stay near-dups inside
  every replica (same positions get the same junk token);
* cross-replica twins of the same doc share only ~56% of token
  occurrences (0.75^2), Jaccard ~0.39 — far below the 0.7-band LSH
  collision regime, so cross-replica pairs mostly DON'T collide and
  the pair graph grows ~linearly in replicas, which is the realistic
  100 TB shape (a corpus 100x bigger has ~100x the near-dup pairs,
  not 10,000x);
* replica 0 stays byte-identical to sf0.1. Only documents.text is
  perturbed; the mode is for graph/dedup scaling runs, not for the
  text-quality twins (position-keyed junk shifts token stats).

Usage: python scripts/make_scaled_sf.py [out_dir] [replicas] [perturb]
Default out: /tmp/sf1 (regenerable; NOT committed — the repo carries
this script instead of 100 MB of derived parquet).
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession, functions as F

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# (table, id columns to offset) — only the tables the heavy bench
# queries touch; id_stride is far above any sf0.1 id.
TABLES = {
    "documents": ["doc_id"],
    "lineitem": ["l_orderkey"],
    "embeddings": ["vec_id"],
    "events": ["event_id"],
}
ID_STRIDE = 10_000_000

# Optional table filter (e.g. building a documents+embeddings-only
# sf10 = 100 replicas of sf0.1 for the iterative-query slope — NOTE:
# always scale from sf0.1, never from an already-replicated set, or
# replica offsets collide: stride*(i+j) repeats for equal sums).
ONLY = {
    t for t in os.environ.get("SPARK_GRAFT_SCALE_TABLES", "").split(",") if t
}


def _perturb_text(i: int):
    """Replica i's token noise: positions where xxhash64(pos, i) % 4
    == 0 are replaced with the replica-keyed junk token w<i>x<pos>.
    Deterministic, engine-independent, and shared by every doc in the
    replica (2-arg transform lambda = (element, index))."""
    toks = F.split(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")), " ")
    noised = F.transform(
        toks,
        lambda t, p: F.when(
            F.pmod(F.xxhash64(p, F.lit(i)), F.lit(4)) == 0,
            F.concat(F.lit(f"w{i}x"), p.cast("string")),
        ).otherwise(t),
    )
    return F.concat_ws(" ", noised)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    perturb = len(sys.argv) > 3 and sys.argv[3] == "perturb"
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("make-scaled-sf")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for table, id_cols in TABLES.items():
        if ONLY and table not in ONLY:
            continue
        src = f"{SRC}/{table}.parquet"
        if not os.path.exists(src):
            print(f"skip {table}: {src} missing", file=sys.stderr)
            continue
        base = spark.read.parquet(src)
        if "event_id" in id_cols and "event_id" not in base.columns:
            id_cols = [c for c in id_cols if c in base.columns]
        scaled = None
        for i in range(replicas):
            rep = base
            for c in id_cols:
                rep = rep.withColumn(c, F.col(c) + F.lit(i * ID_STRIDE))
            if perturb and i > 0 and table == "documents":
                rep = rep.withColumn("text", _perturb_text(i))
            scaled = rep if scaled is None else scaled.unionByName(rep)
        (
            scaled.repartition(32)
            .write.mode("overwrite")
            .parquet(f"{out}/{table}.parquet")
        )
        print(f"{table}: {replicas}x -> {out}/{table}.parquet")
    spark.stop()


if __name__ == "__main__":
    main()
