"""IVF centroid training (round-2 verdict item 4): Lloyd's k-medians
iterations as DataFrame aggregations.

Measured context (sf0.01 testdata, nprobe=2, K=8): the synthetic
embeddings are near-uniform on the sphere, so ANY data-point seeding
gives balanced cells and ~0.9 recall, and no training variant (mean or
median, 1-5 iterations) improves on it — training is recall-neutral
there by construction of the data. Training's value is ROBUSTNESS: on
clustered data (the real-world case) with degenerate seeding, recall
recovers 0.42 → 0.98 (measured below). The registered `ann_ivf_topk`
query ships trained centroids and stays bit-exact against a DuckDB
oracle that replays the training loop in SQL (per-dim MEDIAN update —
an order-independent reduction, hence engine-reproducible)."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Row

from arcane_stream_parquet_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    train_ivf_centroids,
)

DIM, NCLUST, PER = 32, 8, 50


def _h(s: str) -> float:
    return int(hashlib.sha256(s.encode()).hexdigest()[:8], 16) / 2**32 * 2.0 - 1.0


@pytest.fixture(scope="module")
def clustered(spark):
    """Deterministic clustered corpus: 8 hash-derived cluster centers,
    ids SEQUENTIAL per cluster — so seeds vec_id<8 all fall in cluster
    0, the classic bad-seeding case k-means training exists to fix."""
    centers = [[_h(f"c{c}|{d}") for d in range(DIM)] for c in range(NCLUST)]
    rows = [
        Row(
            vec_id=vid,
            embedding=[
                float(centers[vid // PER][d] + 0.6 * _h(f"n{vid}|{d}"))
                for d in range(DIM)
            ],
        )
        for vid in range(NCLUST * PER)
    ]
    df = spark.createDataFrame(rows, schema="vec_id bigint, embedding array<double>")
    df.cache()
    df.count()
    return df


def _recall(emb, queries, truth, cents, nprobe):
    got: dict = {}
    for r in ivf_topk(emb, queries, cents, k=10, nprobe=nprobe).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return sum(len(truth[q] & got.get(q, set())) for q in truth) / sum(
        len(v) for v in truth.values()
    )


def test_training_recovers_recall_from_bad_seeding(clustered, spark):
    emb = clustered
    queries = emb.filter(F.col("vec_id").isin([25, 75, 125, 225, 325]))
    truth: dict = {}
    for r in cosine_topk(emb, queries, k=10).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    seed = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < NCLUST).collect()
    ]
    untrained = _recall(emb, queries, truth, seed, nprobe=1)
    trained = _recall(
        emb, queries, truth, train_ivf_centroids(emb, k=NCLUST, iters=2), nprobe=1
    )
    # measured: 0.42 untrained vs 0.98 trained
    assert untrained <= 0.7
    assert trained >= 0.9
    assert trained > untrained + 0.2


def test_training_is_deterministic(clustered):
    a = train_ivf_centroids(clustered, k=NCLUST, iters=2)
    b = train_ivf_centroids(clustered, k=NCLUST, iters=2)
    assert a == b  # bit-identical floats: median is order-independent


def test_empty_cell_keeps_previous_centroid(spark):
    """Two far clusters, K=3 seeds — at least one seed cell goes empty
    after reassignment; its centroid must persist, not NaN out."""
    rows = [
        Row(vec_id=i, embedding=[1.0 + 0.01 * i, 0.0, 0.0]) for i in range(3)
    ] + [Row(vec_id=10 + i, embedding=[0.0, 1.0 + 0.01 * i, 0.0]) for i in range(3)]
    df = spark.createDataFrame(rows, schema="vec_id bigint, embedding array<double>")
    cents = train_ivf_centroids(df, k=3, iters=2)
    assert len(cents) == 3
    assert all(all(x == x for x in vec) for _, vec in cents)  # no NaN
