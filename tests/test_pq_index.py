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


def _drifted(spark, n, id_base, delta):
    """Corpus shaped like _corpus but pushed ``delta`` off every axis —
    distance from ANY pinned centroid grows with delta (the drift
    shape: new data moving away from the creation-time quantizer)."""
    rows = []
    for j in range(n):
        cl = j % 4
        v = [delta + 0.02 * (j // 4) * _h(f"pqd{id_base + j}|{d}") for d in range(DIM)]
        v[cl * 2] += 10.0
        v[cl * 2 + 1] += 10.0
        rows.append(Row(vec_id=id_base + j, embedding=[float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_staleness_rises_monotonically_under_churn(spark, tmp_path):
    """r15 VERDICT item 3(a): the per-add_batch drift stat. Batches
    drawn progressively farther from the creation corpus push
    mean_res_sq up monotonically and drift_ratio past 1 — the cheap
    reindex dial, computed from the batch the encode already built
    (no corpus scan; records are create-only JSON under the index)."""
    df = _corpus(spark)
    cents = train_ivf_centroids(df, k=4, iters=2)
    books = train_pq_codebooks(df, m=4, codes=8, iters=2)
    idx = PQVectorIndex.create(
        spark, str(tmp_path / "idx"), cents, books,
        num_buckets=2, max_records_per_file=8,
    )
    idx.add_batch(df, ingest_seq=1)  # creation-shaped: the baseline
    idx.add_batch(_drifted(spark, 24, 100, delta=2.0), ingest_seq=2)
    idx.add_batch(_drifted(spark, 24, 200, delta=5.0), ingest_seq=3)

    st = idx.staleness()
    seqs = [b["ingest_seq"] for b in st["batches"]]
    means = [b["mean_res_sq"] for b in st["batches"]]
    assert seqs == [1, 2, 3]
    assert means[0] < means[1] < means[2]
    assert st["drift_ratio"] == means[2] / means[0] > 1.0
    assert st["cell_skew"] is not None and st["cell_skew"] >= 1.0
    # idempotent redelivery doesn't duplicate a record
    idx.add_batch(df, ingest_seq=1)
    assert len(idx.staleness())  # readable
    assert [b["ingest_seq"] for b in idx.staleness()["batches"]] == [1, 2, 3]
    # reopened handles see the same telemetry
    assert PQVectorIndex.open(spark, idx.path).staleness()["batches"] == st["batches"]


def test_reindex_restores_parity_with_fresh_build(spark, tmp_path):
    """r15 VERDICT item 3(b): reindex retrains on the CURRENT corpus
    and lands bit-identical to an independently fresh-built index over
    the same live rows — and the retrained quantizer actually fits the
    churned corpus again (first post-reindex batch's residual norm
    drops back below the churned index's last)."""
    from arcane_stream_parquet_spark.operators.similarity import (
        _centroids_df,
        ivf_assign,
    )
    from pyspark.sql import functions as F

    df = _corpus(spark)
    cents = train_ivf_centroids(df, k=4, iters=2)
    books = train_pq_codebooks(df, m=4, codes=8, iters=2)
    idx = PQVectorIndex.create(
        spark, str(tmp_path / "idx"), cents, books,
        num_buckets=2, max_records_per_file=8,
    )
    idx.add_batch(df, ingest_seq=1)
    idx.add_batch(_drifted(spark, 24, 100, delta=4.0), ingest_seq=2)
    idx.remove([0, 1])  # churn the other direction too

    new = idx.reindex(str(tmp_path / "idx2"), ingest_seq=7)

    # fresh twin: same training pipeline run by hand on the live rows
    live = idx.table.read().select("vec_id", "embedding")
    cents2 = train_ivf_centroids(live, k=4, iters=2)
    assigned = ivf_assign(live, cents2)
    cent = _centroids_df(spark, cents2)
    res = assigned.join(cent, assigned["cell"] == cent["cid"]).select(
        "vec_id",
        F.zip_with(F.col("__v"), F.col("cv"), lambda x, y: x - y).alias("__res"),
    )
    books2 = train_pq_codebooks(res, m=4, codes=8, vec_col="__res")
    fresh = PQVectorIndex.create(
        spark, str(tmp_path / "idx3"), cents2, books2,
        num_buckets=2, max_records_per_file=8,
    )
    fresh.add_batch(live, ingest_seq=7)

    assert new.centroids == fresh.centroids
    assert new.codebooks == fresh.codebooks
    queries = df.filter("vec_id IN (2, 3)")
    got = sorted(map(tuple, new.search(queries, k=5, nprobe=2).collect()))
    want = sorted(map(tuple, fresh.search(queries, k=5, nprobe=2).collect()))
    assert got == want and len(got) == 10
    assert new.table.read().count() == idx.table.read().count() == 70

    # the retrained quantizer fits the churned corpus again
    churned_last = idx.staleness()["batches"][-1]["mean_res_sq"]
    rebuilt_first = new.staleness()["batches"][0]["mean_res_sq"]
    assert rebuilt_first < churned_last
    # old index still serves, untouched
    assert idx.centroids == cents


def test_reindex_kill_leaves_old_index_untouched(spark, tmp_path, monkeypatch):
    """Mid-reindex kill: every reindex write is create-only under the
    NEW path, so a crash between quantizer pin and data load leaves
    the old index byte-identical and fully serving; the retry just
    needs a clean new path."""
    import os

    df = _corpus(spark)
    cents = train_ivf_centroids(df, k=4, iters=2)
    books = train_pq_codebooks(df, m=4, codes=8, iters=2)
    old_path = str(tmp_path / "idx")
    idx = PQVectorIndex.create(
        spark, old_path, cents, books, num_buckets=2, max_records_per_file=8
    )
    idx.add_batch(df, ingest_seq=1)
    queries = df.filter("vec_id IN (0, 1)")
    before = sorted(map(tuple, idx.search(queries, k=5, nprobe=2).collect()))

    def snapshot(root):
        out = {}
        for r, _d, names in os.walk(root):
            for n in names:
                p = os.path.join(r, n)
                out[os.path.relpath(p, root)] = os.path.getsize(p)
        return out

    files_before = snapshot(old_path)

    def boom(self, vectors, ingest_seq):
        raise RuntimeError("killed mid-reindex")

    monkeypatch.setattr(PQVectorIndex, "add_batch", boom)
    with pytest.raises(RuntimeError, match="killed"):
        idx.reindex(str(tmp_path / "dead"))
    monkeypatch.undo()

    assert snapshot(old_path) == files_before
    assert (
        sorted(map(tuple, idx.search(queries, k=5, nprobe=2).collect()))
        == before
    )
    # retry on a clean path succeeds
    retry = idx.reindex(str(tmp_path / "retry"))
    assert retry.table.read().count() == 48


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
