"""Capture .explain('formatted') plans for the dataset-only operators
(no index needed) into plans/r06/<name>_<tag>.txt.

Usage: python tools/capture_plans.py <before|after> [op ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")


def main():
    tag = sys.argv[1]
    only = set(sys.argv[2:])
    os.makedirs(OUT, exist_ok=True)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("plan_capture")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    from cuvs_lucene_spark.functions.textstats import quality_score, repetition_stats
    from cuvs_lucene_spark.operators.dedup import (
        embedding_near_dup,
        minhash_lsh_candidates,
        ngram_contamination,
        simhash,
        simhash_near_dup,
    )
    from cuvs_lucene_spark.operators.sampling import training_mix

    plans = {
        "minhash_lsh": lambda: minhash_lsh_candidates(docs, n_perm=8, bands=2),
        "simhash": lambda: simhash(docs),
        "simhash_near_dup": lambda: simhash_near_dup(docs, max_hamming=3, bands=4),
        "embedding_near_dup": lambda: embedding_near_dup(embs, threshold=0.4),
        "quality": lambda: quality_score(docs),
        "repetition": lambda: repetition_stats(docs, n=2),
        "training_mix": lambda: training_mix(
            docs, {"en": 0.9, "fr": 0.5, "zh": 0.25}, default_rate=0.1
        ),
        "decontaminate": lambda: ngram_contamination(
            train=docs.filter(F.col("doc_id") % 17 != 0),
            evals=docs.filter(F.col("doc_id") % 17 == 0),
            n=5,
        ),
    }
    for name, fn in plans.items():
        if only and name not in only:
            continue
        df = fn()
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
