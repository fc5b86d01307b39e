"""ST10: sharded, resumable backfill — kill mid-run, resume, converge
to the same golden outcome; completed shards are not reprocessed.
"""

from __future__ import annotations

import random

import pytest

from arcane_stream_parquet_spark.operators.merge import ParquetMergeTarget
from arcane_stream_parquet_spark.sources.blob import BlobParquetSource
from arcane_stream_parquet_spark.streaming.runner import (
    BackfillState,
    run_backfill_sharded,
)

from tests.test_streaming import N_KEYS, write_fixture_file


@pytest.fixture()
def landing(tmp_path):
    src = tmp_path / "landing"
    src.mkdir()
    rng = random.Random(11)
    for i in range(8):
        write_fixture_file(str(src), i, rng, 1_700_000_000 + i * 60)
    return src


def _setup(spark, tmp_path, landing):
    source = BlobParquetSource(path=str(landing), primary_keys=["col0"])
    target = ParquetMergeTarget(
        spark=spark, path=str(tmp_path / "tgt"), num_buckets=8
    )
    return source, target, str(tmp_path / "backfill_state.json")


def test_kill_and_resume_merge(spark, tmp_path, landing, monkeypatch):
    source, target, state_path = _setup(spark, tmp_path, landing)

    # kill after 2 completed shards
    original = ParquetMergeTarget.merge
    calls = {"n": 0}

    def dying_merge(self, batch):
        if calls["n"] >= 2:
            raise RuntimeError("simulated kill")
        calls["n"] += 1
        return original(self, batch)

    monkeypatch.setattr(ParquetMergeTarget, "merge", dying_merge)
    with pytest.raises(RuntimeError, match="simulated kill"):
        run_backfill_sharded(
            spark, source, target, state_path, behavior="Merge", num_shards=4
        )
    monkeypatch.undo()

    # progress persisted: exactly the 2 completed shards recorded
    assert len(BackfillState(state_path).load()["done_shards"]) == 2

    # resume: only the remaining shards run
    resumed = {"n": 0}

    def counting_merge(self, batch):
        resumed["n"] += 1
        return original(self, batch)

    monkeypatch.setattr(ParquetMergeTarget, "merge", counting_merge)
    run_backfill_sharded(
        spark, source, target, state_path, behavior="Merge", num_shards=4
    )
    monkeypatch.undo()
    assert resumed["n"] == 2  # 4 shards total, 2 already done

    # golden outcome + state cleared + watermark committed
    assert target.read().count() == N_KEYS
    assert BackfillState(state_path).load() == {"done_shards": []}
    assert target.watermark() is not None


def test_overwrite_swaps_atomically_at_completion(spark, tmp_path, landing):
    source, target, state_path = _setup(spark, tmp_path, landing)
    # pre-existing garbage must vanish under Overwrite behavior
    import pyspark.sql.functions as F  # noqa: F401
    from pyspark.sql import Row

    target.merge(
        spark.createDataFrame(
            [Row(arcane_merge_key="stale", createdon=999, col0=1, col1="x", col2=2)]
        )
    )
    run_backfill_sharded(
        spark, source, target, state_path, behavior="Overwrite", num_shards=3
    )
    keys = {r["arcane_merge_key"] for r in target.read().collect()}
    assert "stale" not in keys
    assert target.read().count() == N_KEYS
    # staging target cleaned up
    import os

    assert not os.path.isdir(str(tmp_path / "tgt") + "_backfill_staging")


def test_resume_pins_universe_against_midflight_arrivals(
    spark, tmp_path, landing, monkeypatch
):
    """r13: the shard universe is pinned at first contact.  A blob
    landing between the kill and the resume must NOT re-shuffle shard
    assignments (round-robin over a longer list would route unmerged
    ORIGINAL files into already-done shard indices — silent loss) and
    must NOT be merged by this backfill; the completion watermark
    covers exactly the pinned universe, never the late arrival."""
    source, target, state_path = _setup(spark, tmp_path, landing)

    original = ParquetMergeTarget.merge
    calls = {"n": 0}

    def dying_merge(self, batch):
        if calls["n"] >= 2:
            raise RuntimeError("simulated kill")
        calls["n"] += 1
        return original(self, batch)

    monkeypatch.setattr(ParquetMergeTarget, "merge", dying_merge)
    with pytest.raises(RuntimeError, match="simulated kill"):
        run_backfill_sharded(
            spark, source, target, state_path, behavior="Merge", num_shards=4
        )
    monkeypatch.undo()

    # a late blob lands mid-backfill, newer than everything pinned —
    # and the operator ALSO retries with a different num_shards, which
    # the pinned universe must override
    rng = random.Random(99)
    write_fixture_file(str(landing), 99, rng, 1_700_000_000 + 9999 * 60)
    run_backfill_sharded(
        spark, source, target, state_path, behavior="Merge", num_shards=7
    )

    # every ORIGINAL row landed exactly once (latest-wins over the
    # pinned 8 files), and the late blob was not merged
    got_cols = {r["col0"] for r in target.read().collect()}
    assert len(got_cols) == N_KEYS
    # the watermark is the max mtime of the PINNED universe (µs) — the
    # late blob's far-future mtime must not leak in
    assert target.watermark() == (1_700_000_000 + 7 * 60) * 1_000_000
    # state cleared; a FRESH backfill now picks the late blob up too
    assert BackfillState(state_path).load() == {"done_shards": []}
