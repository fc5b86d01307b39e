"""S6 merge query-retry policy (reference queryRetry*,
stream-context-serialized-example.json:50-56, dev.env.example:81-93):
transient merge failures retry in-process with exponential backoff and
retryable-message matching; exhausted retries become the process-level
retryable signal (exit 2)."""

from __future__ import annotations

import pytest

from arcane_stream_parquet_spark.config import StreamFailError, StreamSpec
from arcane_stream_parquet_spark.streaming.retry import (
    QueryRetryPolicy,
    run_with_retry,
)


def flaky(fail_times: int, message: str = "No worker nodes available"):
    state = {"n": 0, "calls": 0}

    def fn():
        state["calls"] += 1
        if state["n"] < fail_times:
            state["n"] += 1
            raise RuntimeError(message)

    return fn, state


def test_transient_failure_succeeds_on_retry():
    fn, state = flaky(2)
    slept = []
    policy = QueryRetryPolicy(
        mode="always", base_duration_seconds=0.5, scale_factor=3.0, max_attempts=4
    )
    run_with_retry(fn, policy, sleep=slept.append)
    assert state["calls"] == 3
    assert slept == [0.5, 1.5]  # base · scale^n backoff


def test_non_retryable_message_fails_fast():
    fn, state = flaky(5, message="column type mismatch")
    policy = QueryRetryPolicy(
        mode="always",
        max_attempts=4,
        retry_on_message_contents=("No worker nodes available", "Query killed"),
    )
    with pytest.raises(RuntimeError, match="column type mismatch"):
        run_with_retry(fn, policy, sleep=lambda _: None)
    assert state["calls"] == 1  # no retry burned on a logic error


def test_matching_message_retries():
    fn, state = flaky(1, message="oops: Query killed by admin")
    policy = QueryRetryPolicy(
        mode="always", max_attempts=3, retry_on_message_contents=("Query killed",)
    )
    run_with_retry(fn, policy, sleep=lambda _: None)
    assert state["calls"] == 2


def test_exhausted_retries_raise_stream_fail():
    fn, state = flaky(99)
    policy = QueryRetryPolicy(mode="always", max_attempts=3)
    with pytest.raises(StreamFailError, match="after 3 attempts"):
        run_with_retry(fn, policy, sleep=lambda _: None)
    assert state["calls"] == 3


def test_never_mode_does_not_retry():
    fn, state = flaky(1)
    with pytest.raises(RuntimeError):
        run_with_retry(fn, QueryRetryPolicy(mode="never"), sleep=lambda _: None)
    assert state["calls"] == 1


def test_backfill_only_gates_on_context():
    policy = QueryRetryPolicy(mode="backfillOnly", max_attempts=3)

    fn, state = flaky(1)
    run_with_retry(fn, policy, is_backfill=True, sleep=lambda _: None)
    assert state["calls"] == 2  # retried in backfill

    fn2, state2 = flaky(1)
    with pytest.raises(RuntimeError):
        run_with_retry(fn2, policy, is_backfill=False, sleep=lambda _: None)
    assert state2["calls"] == 1  # not retried in streaming


def test_invalid_mode_rejected():
    with pytest.raises(ValueError, match="queryRetryMode"):
        QueryRetryPolicy(mode="sometimes")


def test_spec_parses_reference_retry_block():
    """The dev.env.example block (uPickle enum mode + CRD duration
    literals) loads unchanged."""
    spec = StreamSpec(
        raw={
            "sink": {
                "targetTableFullName": "lake.s.t",
                "mergeServiceClient": {
                    "queryRetryBaseDuration": "100 millisecond",
                    "queryRetryMaxAttempts": 5,
                    "queryRetryMode": {"backfillOnly": {}},
                    "queryRetryOnMessageContents": ["No worker nodes available"],
                    "queryRetryScaleFactor": 3.0,
                },
            }
        }
    )
    p = spec.query_retry
    assert p.mode == "backfillOnly"
    assert p.base_duration_seconds == pytest.approx(0.1)
    assert p.max_attempts == 5
    assert p.scale_factor == 3.0
    assert p.retry_on_message_contents == ("No worker nodes available",)

    # absent block → never (the reference example's default posture)
    assert StreamSpec(raw={}).query_retry.mode == "never"


def test_runner_merge_batch_uses_policy(spark, tmp_path, monkeypatch):
    """End-to-end wiring: a StreamRunner whose target.merge fails once
    transiently still lands the batch."""
    from pyspark.sql import Row

    from arcane_stream_parquet_spark.operators.merge import ParquetMergeTarget
    from arcane_stream_parquet_spark.streaming.runner import StreamRunner

    target = ParquetMergeTarget(spark=spark, path=str(tmp_path / "t"), num_buckets=2)
    original = ParquetMergeTarget.merge
    state = {"fail": 1, "calls": 0}

    def flaky_merge(self, batch):
        state["calls"] += 1
        if state["fail"]:
            state["fail"] -= 1
            raise RuntimeError("simulated transient executor loss")
        return original(self, batch)

    monkeypatch.setattr(ParquetMergeTarget, "merge", flaky_merge)
    runner = StreamRunner(
        source=None,
        target=target,
        checkpoint_dir=str(tmp_path / "ckpt"),
        retry_policy=QueryRetryPolicy(
            mode="always", base_duration_seconds=0.0, max_attempts=3
        ),
    )
    batch = spark.createDataFrame([Row(arcane_merge_key="k", createdon=1, v="x")])
    runner._merge_batch(batch, 0)
    monkeypatch.undo()
    assert state["calls"] == 2
    assert target.read().count() == 1
