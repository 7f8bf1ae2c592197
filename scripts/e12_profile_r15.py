"""r15 verdict task 5: component-profile e12_batch_ingest at a given
core count — time the CUMULATIVE stage prefixes (noop sink after
composing stages 1..k) so the per-stage marginal cost falls out by
subtraction. Fresh process per core count:

    python scripts/e12_profile_r15.py 32
    python scripts/e12_profile_r15.py 8

Optional second arg = sf dir (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import gc
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"e12-profile-c{cpus}")
        .config("spark.sql.shuffle.partitions", str(cpus))
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

    noop(spark.read.parquet(f"{sf_dir}/lineitem.parquet"))

    from decision_tree_stuff_spark.queries._shared import _docs
    from decision_tree_stuff_spark.queries.ingest import ingest_stages
    from decision_tree_stuff_spark.utils import keepalive

    stages = ingest_stages(spark, sf_dir)
    names = [n for n, _ in stages]

    def drain():
        spark.catalog.clearCache()
        gc.collect()
        for _ in range(2):
            spark._jvm.System.gc()
        time.sleep(0.5)

    for rep in range(2):
        results = []
        for k in range(1, len(stages) + 1):
            drain()
            best = float("inf")
            for _ in range(2):
                t0 = time.monotonic()
                out = _docs(spark, sf_dir)
                frames = []
                for _, fn in stages[:k]:
                    out = fn(out)
                    frames.append(out)
                noop(keepalive(out, *frames))
                best = min(best, time.monotonic() - t0)
            results.append((names[k - 1], round(best, 2)))
            print(
                f"[c{cpus} rep{rep}] prefix through {names[k-1]}: "
                f"{best:.2f}s",
                flush=True,
            )
        print(f"[c{cpus} rep{rep}] table: {results}", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
