"""Positional-layer N vs 4N scaling pair (round-5 verdict item 4): the
positions-sidecar BUILD plus a 64-query phrase/span batch, run at
local[2] vs local[8] (CPU-pinned, interleaved repeats) over the 300k-doc
synthetic corpus — the same protocol as tools/scaling.py.

    python tools/positions_scaling.py [n_docs] [repeats]
    → BENCH_SCALING_POSITIONS.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, tempfile, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

cpus = int(os.environ["SPARK_GRAFT_CPUS"])
n_docs = int(os.environ["SCALING_DOCS"])
spark = (SparkSession.builder.master(f"local[{cpus}]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.files.maxPartitionBytes", "8m")
    .config("spark.sql.files.openCostInBytes", "0")
    .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    .config("spark.local.dir", f"/dev/shm/spark_posscale_{cpus}")
    .config("spark.driver.memory", "24g")
    .config("spark.ui.enabled", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()
spark.createDataFrame([(i %% 8, i) for i in range(64)], "k int, v long").groupBy(
    "k").applyInPandas(lambda p: p.head(1), "k int, v long").count()

from cuvs_lucene_spark.config import IndexConfig
from cuvs_lucene_spark.fixtures import generate_documents_pdf
from cuvs_lucene_spark.operators.segments import build_index
from cuvs_lucene_spark.operators.positions import build_positions, phrase_topk, span_near

pdf = generate_documents_pdf(n_docs)
docs = spark.createDataFrame(pdf).repartition(32).cache()
docs.count()
cfg = IndexConfig(rows_per_segment=max(1000, n_docs // 64),
                  block_size=128, term_buckets=32)
tmp = tempfile.mkdtemp(prefix=f"posscale_{cpus}_", dir="/dev/shm")
cat = build_index(spark, docs, tmp, cfg, content_col="content",
                  id_col="ext_id", resume=False)

t0 = time.time()
build_positions(spark, cat, docs, cfg, content_col="content", id_col="ext_id")
pos_build_sec = time.time() - t0

vocab = ["def", "import", "return", "self", "class", "string", "public",
         "fn", "let", "const", "var", "func", "int", "new", "if", "for"]
queries = []
for i in range(48):
    queries.append(("phrase", [vocab[i %% 16], vocab[(i * 5 + 1) %% 16]]))
for i in range(16):
    # +1 offset keeps the pair distinct for every i (2i+1 is odd, never
    # 0 mod 16)
    queries.append(("span", [vocab[i %% 16], vocab[(i * 3 + 1) %% 16]]))

def run_batch():
    out = []
    for kind, terms in queries:
        if kind == "phrase":
            rows = phrase_topk(spark, cat, terms, k=10, cfg=cfg).collect()
            out.append((kind, tuple(terms),
                        tuple((r["ext_id"], round(r["score"], 6)) for r in rows)))
        else:
            out.append((kind, tuple(terms),
                        span_near(spark, cat, terms, slop=4, in_order=True,
                                  cfg=cfg).count()))
    return out

res = run_batch()  # warm: codegen + memo'd stats
t0 = time.time()
res = run_batch()
query_sec = time.time() - t0
import hashlib
rh = hashlib.sha256(repr(sorted(map(repr, res))).encode()).hexdigest()[:16]
print(json.dumps({"cpus": cpus,
                  "pos_build_sec": round(pos_build_sec, 2),
                  "pos_files_per_sec": round(n_docs / pos_build_sec, 1),
                  "query_sec": round(query_sec, 2),
                  "qps": round(len(queries) / query_sec, 2),
                  "n_queries": len(queries), "result_hash": rh}))
import shutil
shutil.rmtree(tmp, ignore_errors=True)
spark.stop()
"""


def run_level(cpus: int, n_docs: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SCALING_DOCS=str(n_docs),
        OPENBLAS_NUM_THREADS="1",
        OMP_NUM_THREADS="1",
        MKL_NUM_THREADS="1",
    )
    cmd = [sys.executable, "-c", WORKER % {"repo": REPO}]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=3600)
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not line:
        raise RuntimeError(f"worker cpus={cpus} failed:\n{out.stderr[-3000:]}")
    return json.loads(line[-1])


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    runs = {2: [], 8: []}
    for _ in range(repeats):
        for cpus in (2, 8):
            r = run_level(cpus, n_docs)
            print(json.dumps(r), flush=True)
            runs[cpus].append(r)
    assert len({r["result_hash"] for rs in runs.values() for r in rs}) == 1, (
        "nondeterministic results across parallelism/repeats!"
    )
    pair_build = [
        round(runs[8][i]["pos_files_per_sec"] / (4 * runs[2][i]["pos_files_per_sec"]), 3)
        for i in range(len(runs[2]))
    ]
    pair_query = [
        round(runs[8][i]["qps"] / (4 * runs[2][i]["qps"]), 3)
        for i in range(len(runs[2]))
    ]
    summary = {
        "n_docs": n_docs,
        "runs": runs,
        "pair_pos_build_effs": pair_build,
        "pair_query_effs": pair_query,
        "best_pair_pos_build_eff": max(pair_build),
        "best_pair_query_eff": max(pair_query),
    }
    print(json.dumps(summary))
    with open(os.path.join(REPO, "BENCH_SCALING_POSITIONS.json"), "w") as f:
        json.dump(summary, f)
    print("wrote BENCH_SCALING_POSITIONS.json")


if __name__ == "__main__":
    main()
