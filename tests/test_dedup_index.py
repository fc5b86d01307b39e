"""Incremental near-dup index: batches dedup against everything
previously accepted — the streaming-ingest dedup pattern.
"""

from __future__ import annotations

from pyspark.sql import Row

from arcane_stream_parquet_spark.operators.dedup_index import LshDedupIndex

DOC_A = "the quick brown fox jumps over the lazy dog again and again"
DOC_B = "spark engines process parquet files into analytic tables fast"
DOC_C = "completely different third document about streaming merges"


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def test_cross_batch_near_dup_detection(spark, tmp_path):
    idx = LshDedupIndex(spark=spark, path=str(tmp_path / "idx"), num_buckets=4)

    # batch 1: two distinct docs + an in-batch duplicate of the first
    v1 = {
        r["doc_id"]: r
        for r in idx.add_batch(
            _docs(spark, [(1, DOC_A), (2, DOC_B), (3, DOC_A)]), ingest_seq=1
        ).collect()
    }
    assert v1[1]["dup_of"] is None
    assert v1[2]["dup_of"] is None
    assert v1[3]["dup_of"] == 1  # in-batch: lower id wins
    assert v1[3]["jaccard"] == 1.0

    # batch 2: duplicate of batch-1 doc + a new doc
    v2 = {
        r["doc_id"]: r
        for r in idx.add_batch(
            _docs(spark, [(10, DOC_A), (11, DOC_C)]), ingest_seq=2
        ).collect()
    }
    assert v2[10]["dup_of"] == 1  # caught against the PERSISTED index
    assert v2[11]["dup_of"] is None

    # batch 3: duplicate of a batch-2 acceptance — index grew
    v3 = {
        r["doc_id"]: r
        for r in idx.add_batch(_docs(spark, [(20, DOC_C)]), ingest_seq=3).collect()
    }
    assert v3[20]["dup_of"] == 11

    # rejected docs were never indexed: doc 3 and 10 absent
    stored = {r["doc_id"] for r in idx._shingles.read().select("doc_id").collect()}
    assert stored == {1, 2, 11}


def test_replay_idempotent(spark, tmp_path):
    idx = LshDedupIndex(spark=spark, path=str(tmp_path / "idx2"), num_buckets=4)
    idx.add_batch(_docs(spark, [(1, DOC_A)]), ingest_seq=1)
    before = sorted(map(tuple, idx._shingles.read().select("doc_id").collect()))
    # crash-replay of the same batch: same verdicts, no index bloat
    v = idx.add_batch(_docs(spark, [(1, DOC_A)]), ingest_seq=1).collect()
    assert v[0]["dup_of"] == 1  # now sees itself in the index — flagged
    after = sorted(map(tuple, idx._shingles.read().select("doc_id").collect()))
    assert after == before
