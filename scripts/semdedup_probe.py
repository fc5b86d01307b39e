"""SemDeDup scale probe: does cluster-bucketed semantic dedup stay
near-linear when the corpus grows and k grows with it (the Abbas et
al. 2023 deployment shape — k=50k on LAION-440M)?

Corpus growth: copy *i* of the sf embeddings table rotates each vector
by ``i`` dimensions (concat of two slices — JVM-side, deterministic).
Rotation preserves the norm but decorrelates the copy from the
original, so growth adds NEW content with the same geometry — not the
pathological 100%-duplicated corpus, whose within-cell pair count is
genuinely quadratic in the duplication factor (that regime is the
dup-gate probe's job, scripts/dup_gate_probe.py).

Per scale we report: training wall (bounded — k·dim driver traffic +
2 corpus shuffles), dedup wall (assignment + within-cell equi-join),
max cell size and sum(|cell|^2)/n — the quantity the within-cell join
actually pays. The claim under test: with k ∝ n, cell sizes stay
bounded so sum(|cell|^2) stays ∝ n.

Usage: python scripts/semdedup_probe.py [sf_dir] [copies ...]
(default: /root/testdata/sf0.1 1 4 16 64)
With ASP_SEMDEDUP_ASSIGN=two_level the dedup pass assigns through the
super-cell tree (O(n·(√k + 2k/√k)) instead of O(n·k)) — the r13
mitigation measured against the same corpus/k ladder.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from arcane_stream_parquet_spark import build_session
from arcane_stream_parquet_spark.operators.similarity import (
    semantic_duplicates,
    train_ivf_centroids,
)

DIM = 64


def rotated_replicas(df, copies: int, offset: int = 10_000_000):
    out = df
    for i in range(1, copies):
        rot = i % DIM or 1  # never the identity rotation
        out = out.unionByName(
            df.select(
                (F.col("vec_id") + F.lit(i * offset)).alias("vec_id"),
                F.concat(
                    F.slice("embedding", rot + 1, DIM - rot),
                    F.slice("embedding", 1, rot),
                ).alias("embedding"),
                "label",
            )
        )
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    copies_list = [int(c) for c in sys.argv[2:]] or [1, 4, 16, 64]
    spark = build_session(app_name="semdedup-probe", cpus=32, shuffle_partitions=32)
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    for copies in copies_list:
        corpus = rotated_replicas(base, copies).persist()
        n = corpus.count()
        k = 8 * copies  # k grows with n, the paper's deployment shape
        assign = os.environ.get("ASP_SEMDEDUP_ASSIGN", "exact")
        t0 = time.monotonic()
        cents = train_ivf_centroids(corpus, k=k, iters=2)
        t1 = time.monotonic()
        # persist: the cell-stats aggregation below must read the
        # dedup result, not re-run the whole pipeline untimed.
        out = semantic_duplicates(corpus, cents, tau=0.35, assign=assign).persist()
        agg = out.agg(
            F.count("*").alias("rows"),
            F.sum(F.col("is_semantic_dup").cast("long")).alias("dups"),
        ).collect()[0]
        t2 = time.monotonic()
        cells = (
            out.groupBy("cell")
            .count()
            .agg(
                F.max("count").alias("max_cell"),
                F.sum(F.col("count") * F.col("count")).alias("sum_sq"),
            )
            .collect()[0]
        )
        out.unpersist()
        corpus.unpersist()
        print(
            json.dumps(
                {
                    "copies": copies,
                    "n": n,
                    "k": k,
                    "assign": assign,
                    "train_s": round(t1 - t0, 2),
                    "dedup_s": round(t2 - t1, 2),
                    "dups": int(agg["dups"]),
                    "max_cell": int(cells["max_cell"]),
                    "sum_cell_sq_over_n": round(float(cells["sum_sq"]) / n, 1),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
