"""dedup_strategy="sort" (fused one-shuffle window dedup, r17) must
produce byte-identical table contents to dedup_strategy="agg" (the
pre-r17 max_by aggregate) across every merge shape: initial commit,
CoW upsert with >=-ties, within-batch duplicates, null keys, hot keys,
overwrite, and the sorted_by fallback."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from arcane_stream_parquet_spark.operators.merge import ParquetMergeTarget


def _rows(t: ParquetMergeTarget):
    rows = [
        tuple(r) for r in t.read().drop("__asp_bucket", "_asp_bucket").collect()
    ]
    return sorted(rows, key=lambda tp: tuple((v is None, v) for v in tp))


def _pair(spark, tmp_path, **kw):
    return (
        ParquetMergeTarget(
            spark=spark,
            path=str(tmp_path / "sort"),
            num_buckets=8,
            dedup_strategy="sort",
            **kw,
        ),
        ParquetMergeTarget(
            spark=spark,
            path=str(tmp_path / "agg"),
            num_buckets=8,
            dedup_strategy="agg",
            **kw,
        ),
    )


def df_of(spark, rows):
    return spark.createDataFrame(
        rows, "arcane_merge_key string, createdon long, payload string"
    )


def test_strategies_identical_through_scripted_history(spark, tmp_path):
    batches = [
        # initial: within-batch dups (v ties broken by tiebreaker)
        [("k1", 1, "a"), ("k1", 2, "b"), ("k2", 1, "c"), (None, 1, "n1")],
        # upsert: >=-tie (batch must win), stale row, new key, null-key
        [("k1", 2, "b2"), ("k2", 0, "stale"), ("k3", 5, "d"), (None, 1, "n2")],
        # wide batch across buckets
        [(f"w{i}", i % 3, f"p{i}") for i in range(50)],
    ]
    ts, ta = _pair(spark, tmp_path, tiebreakers=("payload",))
    for b in batches:
        ts.merge(df_of(spark, b))
        ta.merge(df_of(spark, b))
    assert _rows(ts) == _rows(ta)
    assert [f.jsonValue() for f in ts.read().schema.fields] == [
        f.jsonValue() for f in ta.read().schema.fields
    ]


def test_strategies_identical_on_hot_key_batch(spark, tmp_path):
    ts, ta = _pair(spark, tmp_path)
    hot = [("hot", v, f"p{v}") for v in range(2000)] + [
        (f"cold{i}", 1, "c") for i in range(20)
    ]
    for t in (ts, ta):
        t.merge(df_of(spark, hot))
        t.merge(df_of(spark, [("hot", 1500, "late-stale"), ("cold3", 9, "up")]))
    assert _rows(ts) == _rows(ta)
    got = {r["arcane_merge_key"]: r["payload"] for r in ts.read().collect()}
    assert got["hot"] == "p1999" and got["cold3"] == "up"


def test_strategies_identical_on_overwrite(spark, tmp_path):
    ts, ta = _pair(spark, tmp_path)
    for t in (ts, ta):
        t.merge(df_of(spark, [("k1", 1, "a"), ("k2", 1, "b")]))
        t.overwrite(df_of(spark, [("k9", 3, "z"), ("k9", 4, "z2"), ("k8", 1, "y")]))
    assert _rows(ts) == _rows(ta)


def test_sorted_by_target_falls_back_to_agg(spark, tmp_path):
    t = ParquetMergeTarget(
        spark=spark,
        path=str(tmp_path / "srt"),
        num_buckets=4,
        sorted_by=("payload",),
        dedup_strategy="sort",
    )
    assert not t._use_sort_dedup()
    t.merge(df_of(spark, [("k1", 1, "a"), ("k2", 2, "b")]))
    assert len(t.read().collect()) == 2


def test_invalid_strategy_rejected(spark, tmp_path):
    t = ParquetMergeTarget(
        spark=spark, path=str(tmp_path / "bad"), dedup_strategy="window"
    )
    with pytest.raises(ValueError, match="dedup_strategy"):
        t.merge(df_of(spark, [("k", 1, "p")]))


def test_sort_strategy_files_stay_key_sorted(spark, tmp_path):
    """The fused write must preserve the key-sorted inner file order
    the manifest min/max pruning relies on."""
    t = ParquetMergeTarget(
        spark=spark, path=str(tmp_path / "ks"), num_buckets=2,
        dedup_strategy="sort",
    )
    t.merge(df_of(spark, [(f"k{i:03d}", 1, "p") for i in range(200)]))
    m = t._manifest()
    import pyarrow.parquet as pq
    import os

    for e in m["files"]:
        p = t._file_path(e)
        ks = pq.read_table(p, columns=["arcane_merge_key"])[0].to_pylist()
        assert ks == sorted(ks)
        assert e["mn"] == ks[0] and e["mx"] == ks[-1]
