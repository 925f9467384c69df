"""Pinned re-measure of the ops whose r2 bench numbers inflated on
identical code (ann_exact, minhash_lsh, simhash, quality — BENCH.md
"shared-VM noise" hypothesis). Methodology from the scaling study:
interleaved repeats on a load-checked window, min-of-N per op (the noise
floor), load average recorded before/after so the run is auditable.

Usage: python tools/remeasure.py [sf_dir] [repeats]
Prints one JSON line: {"op": {"runs": [...], "min": s}, ..., "load": ...}
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPEATS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from cuvs_lucene_spark.config import IndexConfig
    from cuvs_lucene_spark.functions.textstats import quality_score
    from cuvs_lucene_spark.operators.ann import ann_topk, build_ann
    from cuvs_lucene_spark.operators.dedup import minhash_lsh_candidates, simhash

    load0 = os.getloadavg()
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("remeasure")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "0")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.count()
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q0 = [float(v) for v in embs.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    cfg = IndexConfig()
    tmp = tempfile.mkdtemp(prefix="remeasure_")
    acat = build_ann(
        spark, embs, f"{tmp}/ann", cfg, id_col="vec_id",
        vector_col="embedding", rows_per_segment=1000,
    )

    ops = {
        "ann_exact": lambda: ann_topk(spark, acat, q0, k=10, cfg=cfg, mode="exact").collect(),
        "minhash_lsh": lambda: minhash_lsh_candidates(docs, n_perm=8, bands=2).count(),
        "simhash": lambda: simhash(docs).count(),
        "quality": lambda: quality_score(docs).count(),
    }
    runs: dict[str, list[float]] = {k: [] for k in ops}
    for _ in range(REPEATS):  # interleaved: each round visits every op
        for name, fn in ops.items():
            t0 = time.time()
            fn()
            runs[name].append(round(time.time() - t0, 3))
    out = {k: {"runs": v, "min": min(v)} for k, v in runs.items()}
    out["load_before"] = list(load0)
    out["load_after"] = list(os.getloadavg())
    out["sf_dir"] = SF_DIR
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
