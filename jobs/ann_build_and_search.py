"""spark-submit entry point for the ANN sidecar (north rule parity with
jobs/build_and_query.py — the vector half of the engine):

    zip -r /tmp/engine.zip cuvs_lucene_spark
    spark-submit --master local[8] --py-files /tmp/engine.zip \
        jobs/ann_build_and_search.py \
        --input /root/testdata/sf0.01/embeddings.parquet \
        --id-col vec_id --vector-col embedding \
        --index /tmp/annidx --metric l2 --search-mode ivf \
        --query-id 7 --k 10

Builds (or resumes) the ANN index under the chosen metric and answers one
query; prints one JSON line. All Spark configs come from spark-submit, as
on a real cluster.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--vector-col", default="embedding")
    p.add_argument("--index", required=True)
    p.add_argument("--metric", default="l2", choices=["l2", "cosine"])
    p.add_argument("--search-mode", default="auto", choices=["auto", "exact", "ivf"])
    p.add_argument("--query-id", type=int, default=0,
                   help="indexed row whose vector is the query")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--rows-per-segment", type=int, default=100_000)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from cuvs_lucene_spark.config import IndexConfig
    from cuvs_lucene_spark.operators.ann import ann_topk, build_ann

    spark = SparkSession.builder.appName("cuvs_lucene_spark_ann_job").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    cfg = IndexConfig(rows_per_segment=args.rows_per_segment)
    cfg = dataclasses.replace(
        cfg, ann=dataclasses.replace(cfg.ann, metric=args.metric)
    )
    vecs = spark.read.parquet(args.input)
    t0 = time.time()
    cat = build_ann(
        spark, vecs, args.index, cfg,
        id_col=args.id_col, vector_col=args.vector_col,
        rows_per_segment=args.rows_per_segment,
    )
    build_s = time.time() - t0
    q = [
        float(v)
        for v in vecs.filter(F.col(args.id_col) == args.query_id)
        .collect()[0][args.vector_col]
    ]
    t0 = time.time()
    rows = ann_topk(
        spark, cat, q, k=args.k, metric=args.metric, cfg=cfg, mode=args.search_mode
    ).collect()
    print(
        json.dumps(
            {
                "build_sec": round(build_s, 2),
                "query_sec": round(time.time() - t0, 2),
                "metric": args.metric,
                "topk": [
                    {"vec_id": r["ext_id"], "score": round(r["score"], 6)} for r in rows
                ],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
