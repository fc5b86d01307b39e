"""PQVectorIndex — the IVF-PQ tier persisted through the merge target.

Pins: search parity with the in-memory ivfpq_topk over the same data
(the storage layer must not change answers), manifest-stats file
pruning actually biting on probed cells, the create-only quantizer pin
surviving reopen, idempotent re-adds, incremental adds composing, and
the rerank path returning exact distances.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row

from arcane_stream_parquet_spark.operators.pq import (
    ivfpq_topk,
    train_pq_codebooks,
)
from arcane_stream_parquet_spark.operators.similarity import (
    train_ivf_centroids,
)
from arcane_stream_parquet_spark.operators.vector_index import PQVectorIndex

DIM = 8


def _h(s: str) -> float:
    return int(hashlib.sha256(s.encode()).hexdigest()[:8], 16) / 2**32 * 2.0 - 1.0


def _corpus(spark, n=48, clusters=4):
    rows = []
    for i in range(n):
        cl = i % clusters
        v = [0.02 * (i // clusters) * _h(f"pqi{i}|{d}") for d in range(DIM)]
        v[cl * 2] += 10.0
        v[cl * 2 + 1] += 10.0
        rows.append(Row(vec_id=i, embedding=[float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    df = _corpus(spark)
    cents = train_ivf_centroids(df, k=4, iters=2)
    books = train_pq_codebooks(df, m=4, codes=8, iters=2)
    path = str(tmp_path_factory.mktemp("pqidx") / "idx")
    # max_records_per_file ≈ rows per (bucket, cell) so each file is a
    # tight cell range — the pruning lever (class docstring)
    idx = PQVectorIndex.create(
        spark, path, cents, books, num_buckets=2, max_records_per_file=8
    )
    idx.add_batch(df.filter("vec_id < 24"), ingest_seq=1)
    idx.add_batch(df.filter("vec_id >= 24"), ingest_seq=2)
    return idx, df, cents, books


def test_search_matches_in_memory_ivfpq(spark, built):
    idx, df, cents, books = built
    queries = df.filter("vec_id IN (0, 1, 2)")
    got = sorted(map(tuple, idx.search(queries, k=5, nprobe=2).collect()))
    # in-memory twin over the SAME encoded data
    want = sorted(
        map(
            tuple,
            ivfpq_topk(
                idx.table.read().select("vec_id", "cell", "pq_codes"),
                queries, cents, books, k=5, nprobe=2,
            ).collect(),
        )
    )
    assert got == want and len(got) == 15


def test_probed_cell_read_prunes_files(spark, built):
    """A one-cell probe must plan strictly fewer files than the full
    scan (files are written cell-sorted, so manifest cell stats give
    each file a tight cell range)."""
    idx, df, _c, _b = built
    t = idx.table
    full = len(t.read().inputFiles())
    one_cell = int(t.read().select("cell").first()["cell"])
    narrow = t.read_where(("cell", "in", [one_cell]))
    assert narrow.count() > 0
    assert 0 < len(narrow.inputFiles()) < full, (
        len(narrow.inputFiles()), full,
    )


def test_reopen_uses_pinned_quantizer(spark, built):
    idx, df, _c, _b = built
    reopened = PQVectorIndex.open(spark, idx.path)
    assert reopened.centroids == idx.centroids
    assert reopened.codebooks == idx.codebooks
    queries = df.filter("vec_id IN (0, 5)")
    a = sorted(map(tuple, idx.search(queries, k=4).collect()))
    b = sorted(map(tuple, reopened.search(queries, k=4).collect()))
    assert a == b
    with pytest.raises(FileExistsError):
        PQVectorIndex.create(spark, idx.path, idx.centroids, idx.codebooks)


def test_readd_idempotent_and_updates_win(spark, built):
    idx, df, _c, _b = built
    queries = df.filter("vec_id = 0")
    before = sorted(map(tuple, idx.search(queries, k=5).collect()))
    idx.add_batch(df.filter("vec_id < 24"), ingest_seq=1)  # replay
    assert sorted(map(tuple, idx.search(queries, k=5).collect())) == before
    assert idx.table.read().count() == 48


def test_rerank_returns_exact_distances(spark, built):
    """rerank > 0: distances are the true squared-L2 against the
    STORED embeddings — cross-check one pair by hand."""
    idx, df, _c, _b = built
    queries = df.filter("vec_id = 0")
    out = idx.search(queries, k=3, nprobe=2, rerank=10).collect()
    assert len(out) == 3
    vecs = {r["vec_id"]: r["embedding"] for r in df.collect()}

    def l2(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return acc

    for r in out:
        assert r["l2sq"] == l2(vecs[0], vecs[r["neighbor_id"]])


def test_maintenance_composition_preserves_search(spark, tmp_path):
    """r14 VERDICT item 5: the index table composed with the storage
    engine's maintenance — add_batch x 4 -> compact_minor -> vacuum ->
    online rebucket -> vacuum — must keep search parity with the
    in-memory ivfpq_topk AND keep the probed-cell file-prune pin (the
    write path re-applies the cell sort order to every compaction and
    rebucket rewrite; this pins that for the index consumer)."""
    df = _corpus(spark, n=64)
    cents = train_ivf_centroids(df, k=4, iters=2)
    books = train_pq_codebooks(df, m=4, codes=8, iters=2)
    idx = PQVectorIndex.create(
        spark, str(tmp_path / "idx"), cents, books,
        num_buckets=2, max_records_per_file=8,
    )
    for b in range(4):
        idx.add_batch(
            df.filter(f"vec_id >= {b * 16} AND vec_id < {(b + 1) * 16}"),
            ingest_seq=b + 1,
        )
    queries = df.filter("vec_id IN (0, 1, 2)")
    before = sorted(map(tuple, idx.search(queries, k=5, nprobe=2).collect()))
    assert len(before) == 15

    t = idx.table
    t.compact_minor(min_small_files_per_bucket=2)
    t.vacuum()
    assert t.rebucket(4)["done"]
    t.vacuum()

    after = sorted(map(tuple, idx.search(queries, k=5, nprobe=2).collect()))
    assert after == before
    want = sorted(
        map(
            tuple,
            ivfpq_topk(
                idx.table.read().select("vec_id", "cell", "pq_codes"),
                queries, cents, books, k=5, nprobe=2,
            ).collect(),
        )
    )
    assert after == want

    # the prune pin survives maintenance (rewritten files stay
    # cell-sorted, so manifest cell stats still bite)
    t2 = idx.table
    full = len(t2.read().inputFiles())
    one_cell = int(t2.read().select("cell").first()["cell"])
    narrow = t2.read_where(("cell", "in", [one_cell]))
    assert narrow.count() > 0
    assert 0 < len(narrow.inputFiles()) < full, (
        len(narrow.inputFiles()), full,
    )

    # post-maintenance adds still compose (reopened handle syncs the
    # flipped bucket count from the live manifest)
    idx2 = PQVectorIndex.open(spark, idx.path)
    idx2.add_batch(df.filter("vec_id < 16"), ingest_seq=9)  # replay
    assert idx2.table.read().count() == 64
    assert (
        sorted(map(tuple, idx2.search(queries, k=5, nprobe=2).collect()))
        == before
    )


def test_remove_drops_vectors_from_search(spark, tmp_path):
    """r15 removal path: one MoR equality-delete through the storage
    engine — the removed vector disappears from search (the pruned
    read applies pending deletes), results re-rank exactly as the
    in-memory twin over the filtered corpus, absent ids are
    idempotent no-ops, and a later compact_minor folds the delete
    without changing answers."""
    df = _corpus(spark)
    cents = train_ivf_centroids(df, k=4, iters=2)
    books = train_pq_codebooks(df, m=4, codes=8, iters=2)
    idx = PQVectorIndex.create(
        spark, str(tmp_path / "idx"), cents, books,
        num_buckets=2, max_records_per_file=8,
    )
    idx.add_batch(df, ingest_seq=1)
    queries = df.filter("vec_id = 0")
    before = idx.search(queries, k=3, nprobe=2).collect()
    victim = before[0]["neighbor_id"]

    assert idx.remove([victim]) == 1
    after = sorted(map(tuple, idx.search(queries, k=3, nprobe=2).collect()))
    assert all(r[1] != victim for r in after)
    want = sorted(
        map(
            tuple,
            ivfpq_topk(
                idx.table.read().select("vec_id", "cell", "pq_codes"),
                queries, cents, books, k=3, nprobe=2,
            ).collect(),
        )
    )
    assert after == want and len(after) == 3
    assert idx.remove([victim]) == 0  # idempotent

    idx.table.compact_minor(min_small_files_per_bucket=2)
    assert (
        sorted(map(tuple, idx.search(queries, k=3, nprobe=2).collect()))
        == after
    )
