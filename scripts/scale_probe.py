"""Scale probe: run the heavy LLM-pipeline operators on 1x / 2x / 4x
copies of the sf0.1 documents/embeddings tables (id-offset unions — no
new data synthesized) and report wall time per scale.

Purpose: empirical backing for the operators' claimed scaling shape —
candidate-based dedup/ANN should grow near-linearly in corpus size (the
quadratic work is confined to LSH-bounded buckets). Results are
recorded in SCALE.md.

Usage: python scripts/scale_probe.py [sf_dir] [copies ...]
(default copies: 1 2 4; the r9 run added 16 — 80k docs)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from arcane_stream_parquet_spark import build_session
from arcane_stream_parquet_spark.operators.minhash import near_duplicates
from arcane_stream_parquet_spark.operators.simhash import simhash_near_duplicates
from arcane_stream_parquet_spark.operators.similarity import (
    ann_lsh_topk,
    embedding_near_duplicates,
    random_planes,
)
from arcane_stream_parquet_spark.operators.text import quality_score


def replicate(df, id_col: str, copies: int, offset: int = 10_000_000):
    out = df
    for i in range(1, copies):
        out = out.unionByName(
            df.withColumn(id_col, F.col(id_col) + F.lit(i * offset))
        )
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    copies_list = tuple(int(a) for a in sys.argv[2:]) or (1, 2, 4)
    spark = build_session(app_name="asp-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    emb0 = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    results: dict[str, dict[int, float]] = {}
    counts: dict[str, dict[int, int]] = {}
    for copies in copies_list:
        docs = replicate(docs0, "doc_id", copies)
        emb = replicate(emb0, "vec_id", copies)
        queries = emb.filter(F.col("vec_id") < 5)
        cases = {
            "minhash_near_duplicates": lambda d=docs: near_duplicates(d, min_jaccard=0.2),
            "simhash_near_duplicates": lambda d=docs: simhash_near_duplicates(d),
            "text_quality": lambda d=docs: quality_score(d),
            "ann_lsh_topk": lambda e=emb, q=queries: ann_lsh_topk(e, q, k=10),
            "embedding_near_duplicates": lambda e=emb: embedding_near_duplicates(
                e, planes=random_planes(4), min_cosine=0.35
            ),
        }
        for name, build in cases.items():
            df = build()
            start = time.perf_counter()
            n = df.count()
            elapsed = round(time.perf_counter() - start, 2)
            results.setdefault(name, {})[copies] = elapsed
            counts.setdefault(name, {})[copies] = n
    print(json.dumps({"seconds": results, "rows": counts}, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
