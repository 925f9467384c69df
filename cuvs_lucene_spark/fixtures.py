"""Deterministic synthetic code corpus per FIXTURES.md / BASELINE.json
``input_hint`` schema: (repo, path, commit, lang, content) + embeddings.

Seed-deterministic (reference precedent: fixed seed 222 in
``TestCagraToHnswSerializationAndSearch.java:56``). Token stream mixes:
(a) Zipf-distributed hot tokens (``def``/``import``-class skew — the
north rule's hot-term problem), (b) mid-frequency identifiers, (c) rare
unique tokens for exact-match pins. Edge rows: empty content, duplicate
content across repos, single-doc tail segment.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LANGS = ["py", "java", "js", "go", "rs", "md"]
EXT = {"py": "py", "java": "java", "js": "js", "go": "go", "rs": "rs", "md": "md"}

HOT = [
    "def", "import", "return", "0", "self", "if", "for", "class", "int",
    "string", "new", "public", "fn", "let", "const", "var", "func", "end",
]


def generate_documents_pdf(n_docs: int, seed: int = 222) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    mid = [f"func_{k}" for k in range(500)]
    doc_lens = rng.integers(20, 401, size=n_docs)
    # Zipf ranks over hot pool → brutal skew; mids uniform; rares unique
    texts = []
    for i in range(n_docs):
        L = int(doc_lens[i])
        n_hot = int(L * 0.6)
        n_mid = int(L * 0.35)
        n_rare = L - n_hot - n_mid
        hot_idx = np.minimum(rng.zipf(1.5, size=n_hot) - 1, len(HOT) - 1)
        toks = [HOT[j] for j in hot_idx]
        toks += [mid[j] for j in rng.integers(0, len(mid), size=n_mid)]
        toks += [f"uniq_{i}_{j}" for j in range(n_rare)]
        perm = rng.permutation(len(toks))
        texts.append(" ".join(toks[p] for p in perm))
    # edge rows: empty doc, duplicate pair across repos
    if n_docs >= 10:
        texts[3] = ""
        texts[7] = texts[5]
    pdf = pd.DataFrame(
        {
            "ext_id": np.arange(n_docs, dtype=np.int64),
            "repo": [f"org{i % 7}/repo{i % 23}" for i in range(n_docs)],
            "path": [
                f"src/pkg{i % 11}/mod{i}.{EXT[LANGS[i % len(LANGS)]]}" for i in range(n_docs)
            ],
            "commit": [
                hashlib.sha256(f"commit{i // 50}".encode()).hexdigest()[:40]
                for i in range(n_docs)
            ],
            "lang": [LANGS[i % len(LANGS)] for i in range(n_docs)],
            "content": texts,
        }
    )
    return pdf


def generate_documents(spark: SparkSession, n_docs: int, seed: int = 222) -> DataFrame:
    return spark.createDataFrame(generate_documents_pdf(n_docs, seed))


def generate_embeddings_pdf(n_docs: int, dim: int = 64, seed: int = 222) -> pd.DataFrame:
    """~70% of docs get one L2-normalized vector (missing-vector gaps,
    ``TestMerge.java:119-171`` probability pattern); dim % 4 == 0."""
    assert dim % 4 == 0
    rng = np.random.default_rng(seed + 1)
    has = rng.random(n_docs) < 0.7
    ids = np.flatnonzero(has).astype(np.int64)
    x = rng.normal(size=(ids.size, dim)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return pd.DataFrame({"ext_id": ids, "vector": list(x)})


def generate_embeddings(spark: SparkSession, n_docs: int, dim: int = 64, seed: int = 222) -> DataFrame:
    pdf = generate_embeddings_pdf(n_docs, dim, seed)
    pdf["vector"] = pdf["vector"].map(lambda a: [float(v) for v in a])
    return spark.createDataFrame(pdf[["ext_id", "vector"]], "ext_id long, vector array<float>")
