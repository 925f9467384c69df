"""spark-submit entry point (north rule: "runs via spark-submit
--py-files on a multi-executor cluster").

    zip -r /tmp/engine.zip cuvs_lucene_spark
    spark-submit --master local[8] --py-files /tmp/engine.zip \
        jobs/build_and_query.py \
        --input /root/testdata/sf0.01/documents.parquet \
        --id-col doc_id --content-col text \
        --index /tmp/idx --query join vector --k 10

Builds (or resumes) the index and answers the query; prints one JSON line.
No SparkSession is created here beyond getOrCreate() — all configs come
from spark-submit, as on a real cluster.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--id-col", default="ext_id")
    p.add_argument("--content-col", default="content")
    p.add_argument("--index", required=True)
    p.add_argument("--query", nargs="+", required=True)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--mode", default="or", choices=["or", "and"])
    p.add_argument("--rows-per-segment", type=int, default=100_000)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from cuvs_lucene_spark.config import IndexConfig
    from cuvs_lucene_spark.operators.bm25 import bm25_topk
    from cuvs_lucene_spark.operators.segments import build_index

    spark = SparkSession.builder.appName("cuvs_lucene_spark_job").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    cfg = IndexConfig(rows_per_segment=args.rows_per_segment)
    docs = spark.read.parquet(args.input)
    t0 = time.time()
    cat = build_index(
        spark, docs, args.index, cfg,
        content_col=args.content_col, id_col=args.id_col,
    )
    build_s = time.time() - t0
    t0 = time.time()
    rows = bm25_topk(spark, cat, args.query, k=args.k, mode=args.mode, cfg=cfg).collect()
    print(
        json.dumps(
            {
                "build_sec": round(build_s, 2),
                "query_sec": round(time.time() - t0, 2),
                "topk": [
                    {"ext_id": r["ext_id"], "score": round(r["score"], 6)} for r in rows
                ],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
