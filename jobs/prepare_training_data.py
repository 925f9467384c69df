"""spark-submit entry point: the full training-data preparation pipeline
as one cluster job (north rule: "runs via spark-submit --py-files on a
multi-executor cluster").

    zip -r /tmp/engine.zip cuvs_lucene_spark
    spark-submit --master local[8] --py-files /tmp/engine.zip \
        jobs/prepare_training_data.py \
        --input /root/testdata/sf0.01/documents.parquet \
        --output /tmp/train_corpus \
        --eval-pred "doc_id % 17 = 0" \
        --mix en=0.9 fr=0.5 zh=0.25 --default-rate 0.1

Stages (each a committed decision column — the run is auditable row by
row, and every stage is one of the engine's oracle-checked operators):

1. exact dedup        — md5 canonical-content groups, min-id survivor
2. near-dup dedup     — 3-shingle Jaccard pairs → connected components
3. quality gate       — frozen quality score ≥ --min-quality
4. repetition gate    — Gopher top-2-gram rule (not repetitive)
5. decontamination    — no 5-gram overlap with the --eval-pred slice
6. training mix       — deterministic stratified keep rates by lang

The output parquet is the KEPT corpus plus the full decision table
(`<output>_decisions`) for the dropped rows; a one-line JSON funnel
(docs surviving each stage) goes to stdout. Every stage is a
DataFrame-composed plan — one action writes the corpus, one writes
decisions, one collects the funnel counts (map-side aggregates); no
driver-side row loops anywhere.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--content-col", default="text")
    p.add_argument("--lang-col", default="lang")
    p.add_argument("--min-quality", type=float, default=0.5)
    p.add_argument("--jaccard-threshold", type=float, default=0.12)
    p.add_argument("--eval-pred", default=None,
                   help="SQL predicate marking the held-out eval slice")
    p.add_argument("--contam-ngram", type=int, default=5)
    p.add_argument("--mix", nargs="*", default=[],
                   help="stratum=rate pairs, e.g. en=0.9 fr=0.5")
    p.add_argument("--default-rate", type=float, default=1.0)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from cuvs_lucene_spark.functions.textstats import (
        quality_score,
        repetition_stats,
    )
    from cuvs_lucene_spark.operators import dedup as dd
    from cuvs_lucene_spark.operators.sampling import training_mix

    spark = SparkSession.builder.appName("prepare_training_data").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    idc, txt = args.id_col, args.content_col
    docs = spark.read.parquet(args.input)

    # 1. exact dedup
    exact = dd.dedup_keep_list(docs, id_col=idc, text_col=txt).select(
        F.col("id").alias(idc), F.col("keep").alias("exact_keep")
    )
    # 2. near-dup components (Jaccard pairs over 3-shingles)
    pairs = dd.ngram_jaccard_pairs(
        docs, id_col=idc, text_col=txt, shingle_n=3,
        threshold=args.jaccard_threshold,
    )
    near = dd.duplicate_components(
        pairs, all_ids=docs.select(idc)
    ).select(F.col("id").alias(idc), F.col("keep").alias("near_keep"))
    # 3. quality
    qual = quality_score(docs, id_col=idc, text_col=txt).select(
        F.col("id").alias(idc),
        (F.col("quality") >= args.min_quality).alias("quality_keep"),
    )
    # 4. repetition (Gopher rule)
    rep = repetition_stats(docs, n=2, id_col=idc, text_col=txt).select(
        F.col("id").alias(idc), (~F.col("repetitive")).alias("rep_keep")
    )
    table = (
        docs.select(idc, args.lang_col)
        .join(exact, idc)
        .join(near, idc)
        .join(qual, idc)
        .join(rep, idc)
    )
    # 5. decontamination (optional: train side = NOT eval_pred)
    if args.eval_pred:
        contam = dd.ngram_contamination(
            train=docs.filter(f"NOT ({args.eval_pred})"),
            evals=docs.filter(args.eval_pred),
            n=args.contam_ngram,
            id_col=idc,
            text_col=txt,
        ).select(idc, (~F.col("contaminated")).alias("decontam_keep"))
        # eval rows themselves never enter the training corpus
        table = table.join(contam, idc, "left").withColumn(
            "decontam_keep", F.coalesce("decontam_keep", F.lit(False))
        )
    else:
        table = table.withColumn("decontam_keep", F.lit(True))
    # 6. training mix
    rates = {}
    for spec in args.mix:
        k, _, v = spec.partition("=")
        rates[k] = float(v)
    mix = training_mix(
        docs, rates, default_rate=args.default_rate,
        id_col=idc, strat_col=args.lang_col,
    ).select(F.col("id").alias(idc), F.col("keep").alias("mix_keep"))
    table = table.join(mix, idc)

    gates = ["exact_keep", "near_keep", "quality_keep", "rep_keep",
             "decontam_keep", "mix_keep"]
    table = table.withColumn(
        "selected", F.expr(" AND ".join(gates))
    ).cache()

    kept = docs.join(
        table.filter("selected").select(idc), idc, "left_semi"
    )
    kept.write.mode("overwrite").parquet(args.output)
    table.write.mode("overwrite").parquet(args.output + "_decisions")

    # funnel: docs surviving each successive gate (ONE aggregate pass)
    aggs = [F.count("*").alias("input")]
    for i in range(len(gates)):
        cond = " AND ".join(gates[: i + 1])
        aggs.append(
            F.sum(F.when(F.expr(cond), 1).otherwise(0)).alias(gates[i])
        )
    funnel = table.agg(*aggs).collect()[0].asDict()
    print(json.dumps({"funnel": funnel, "output": args.output}))


if __name__ == "__main__":
    main()
