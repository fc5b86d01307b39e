"""PQ scan-compression probe: the claim to verify is that the ADC
pass turns the ANN scan from "read 4·dim bytes/vector and do dim
multiplies" into "read m small codes and do m lookups" — so measure
exactly that, on a synthetic corpus big enough for scan cost to
dominate: stored bytes of the vector column vs the code column, and
wall of the exact scan vs flat-PQ ADC vs IVF-PQ (cell equi-join) at
the same k.

Deterministic corpus: hash-derived vectors around hash-derived cluster
centers (PQ's assumed regime). Cluster assignment is by HASH of id —
the adversarial shape for the pre-r15 lowest-id seeding, which left
~1/e of clusters unseeded at codes≈clusters (an unrepresented cluster
quantizes onto a foreign code: its members collapse into one giant
ADC tie and recall@10 measured 0.0 for its queries). The r15
farthest-point seeding (pq._maxmin_seeds) removes the trap, so the
probe now runs the honest assignment — the round-robin workaround
this script shipped with is retired, and the per-cluster PRECISION
summary is the regression signal (per-cluster recall can't
discriminate: flat PQ's within-cluster ADC tie hides micro-ordering
for seeded and unseeded clusters alike; an unseeded cluster shows up
as precision ~0, not recall ~0, at probe scale). Written to parquet
first so every variant reads from disk like a real table.

Usage: python scripts/pq_probe.py [n_vectors] [dim] [workdir]
(default 200000 64)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from arcane_stream_parquet_spark import build_session
from arcane_stream_parquet_spark.operators.pq import (
    ivfpq_build,
    ivfpq_topk,
    pq_encode,
    pq_topk,
    train_pq_codebooks,
)
from arcane_stream_parquet_spark.operators.similarity import (
    train_ivf_centroids,
)

N_CLUSTERS = 64
N_QUERIES = 5


def synth_corpus(spark, n: int, dim: int = 64):
    """n hash-derived vectors around N_CLUSTERS hash-derived centers —
    row-local generation, no driver data; clusters assigned by HASH of
    id, so seed coverage is the trainer's job (module docstring). The
    ``cl`` column rides along for the per-cluster precision summary."""
    cid = F.pmod(F.xxhash64(F.col("id").cast("string"), F.lit("assign")), F.lit(N_CLUSTERS))
    dims = []
    for d in range(dim):
        center = (
            F.pmod(F.xxhash64(cid.cast("string"), F.lit(f"c{d}")), F.lit(2000))
            - F.lit(1000)
        ) / F.lit(100.0)
        noise = (
            F.pmod(F.xxhash64(F.col("id"), F.lit(f"n{d}")), F.lit(200))
            - F.lit(100)
        ) / F.lit(1000.0)
        dims.append(center + noise)
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*dims).alias("embedding"),
        cid.cast("int").alias("cl"),
    )


def dir_mb(path: str) -> float:
    total = 0
    for root, _d, names in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in names)
    return round(total / 1e6, 1)


def timed(df, label, runs=3):
    df.write.format("noop").mode("overwrite").save()
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    rec = {"scan": label, "wall_s": round(min(ts), 2)}
    print(json.dumps(rec), flush=True)
    return rec["wall_s"]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    work = (
        sys.argv[3]
        if len(sys.argv) > 3
        else tempfile.mkdtemp(prefix="asp_pq_probe_")
    )
    spark = build_session(app_name="pq-probe", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    vec_path = os.path.join(work, "vectors")
    synth_corpus(spark, n, dim).write.mode("overwrite").parquet(vec_path)
    emb = spark.read.parquet(vec_path).select("vec_id", "embedding")
    cl_df = spark.read.parquet(vec_path).select("vec_id", "cl")
    queries = emb.filter(f"vec_id < {N_QUERIES}").localCheckpoint(eager=True)

    # train on a bounded sample (the 100 TB contract), encode the corpus
    sample = emb.filter(F.col("vec_id") % max(1, n // 20_000) == 0)
    books = train_pq_codebooks(sample, m=8, codes=64, iters=2)
    code_path = os.path.join(work, "codes")
    pq_encode(emb, books).write.mode("overwrite").parquet(code_path)
    codes = spark.read.parquet(code_path)

    cents = train_ivf_centroids(sample, k=N_CLUSTERS, iters=2)
    index, rbooks = ivfpq_build(emb, cents, m=8, codes=64, iters=2)
    index_path = os.path.join(work, "ivfpq")
    index.write.mode("overwrite").parquet(index_path)
    index = spark.read.parquet(index_path)

    from arcane_stream_parquet_spark.operators.pq import exact_rerank
    from tests.test_pq import _exact_l2_topk, _recall  # same scan/recall defs

    exact_df = _exact_l2_topk(emb, queries, k=10)
    adc_df = pq_topk(codes, queries, books, k=10)
    ivf_df = ivfpq_topk(index, queries, cents, rbooks, k=10, nprobe=4)
    # the deployment stack: IVF-PQ shortlist -> exact rerank (the wide
    # vector column is read for |Q|*shortlist candidate rows only)
    rr_df = exact_rerank(
        emb,
        ivfpq_topk(index, queries, cents, rbooks, k=100, nprobe=4),
        queries,
        k=10,
    )

    stored = {
        "n": n,
        "dim": dim,
        "vector_mb": dir_mb(vec_path),
        "pq_code_mb": dir_mb(code_path),
        "ivfpq_mb": dir_mb(index_path),
    }
    print(json.dumps(stored), flush=True)

    exact_s = timed(exact_df, "exact_l2_scan")
    adc_s = timed(adc_df, "pq_adc_scan")
    ivf_s = timed(ivf_df, "ivfpq_nprobe4")
    rr_s = timed(rr_df, "ivfpq_rerank100")

    cl_of = {
        int(r["vec_id"]): int(r["cl"]) for r in cl_df.collect()
    }  # n ints — summary bookkeeping only

    def cluster_precision(rows):
        """Flat PQ quantizes every same-cluster member to the SAME
        codes (one giant ADC tie), so recall@10 vs the exact scan
        measures within-cluster micro-ordering the m-byte code can't
        see. What the coarse pass is FOR is cluster resolution —
        fraction of returned neighbors in the query's true cluster."""
        ok = sum(
            1 for r in rows if cl_of[r["neighbor_id"]] == cl_of[r["query_id"]]
        )
        return round(ok / len(rows), 3)

    # per-cluster regression signal (r14 verdict item 4): one query per
    # cluster through the flat-PQ ADC, scored by cluster PRECISION —
    # the fraction of returned neighbors in the query's own cluster.
    # (Per-cluster recall@10 cannot discriminate here: flat PQ gives
    # every same-cluster member the SAME codes, one giant ADC tie, so
    # within-cluster micro-ordering is invisible by design and recall
    # is ~0 for every cluster regardless of seeding.) An UNSEEDED
    # cluster's members quantize onto a foreign code shared with other
    # rows — its precision collapses toward 0; with the pre-r15
    # lowest-id seeding ~1/e of hash-assigned clusters did exactly
    # that. Maxmin seeding must keep every cluster's precision high.
    cq = (
        cl_df.groupBy("cl").agg(F.min("vec_id").alias("vec_id"))
        .join(emb, "vec_id")
        .select("vec_id", "embedding")
        .localCheckpoint(eager=True)
    )
    cl_got: dict[int, list] = {}
    for r in pq_topk(codes, cq, books, k=10).collect():
        cl_got.setdefault(r["query_id"], []).append(r["neighbor_id"])
    per_cluster = {
        cl_of[q]: sum(1 for nb in nbs if cl_of[nb] == cl_of[q]) / len(nbs)
        for q, nbs in cl_got.items()
    }
    zero_clusters = sorted(c for c, v in per_cluster.items() if v == 0.0)

    exact_rows = exact_df.collect()
    summary = {
        **stored,
        "exact_s": exact_s,
        "pq_adc_s": adc_s,
        "ivfpq_s": ivf_s,
        "ivfpq_rerank_s": rr_s,
        "pq_cluster_precision@10": cluster_precision(adc_df.collect()),
        "ivfpq_recall@10": round(_recall(ivf_df.collect(), exact_rows), 3),
        "ivfpq_rerank100_recall@10": round(_recall(rr_df.collect(), exact_rows), 3),
        "per_cluster_precision_min": round(min(per_cluster.values()), 3),
        "per_cluster_precision_mean": round(
            sum(per_cluster.values()) / len(per_cluster), 3
        ),
        "zero_precision_clusters": zero_clusters,
        "workdir": work,
    }
    print(json.dumps(summary), flush=True)
    if len(sys.argv) <= 2:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
