"""In-process merge query-retry policy (reference S6: the merge-service
client retries its MERGE SQL with exponential backoff and
retryable-message matching — ``queryRetryMode: never|always|backfillOnly``,
``queryRetryBaseDuration``, ``queryRetryScaleFactor``,
``queryRetryMaxAttempts``, ``queryRetryOnMessageContents``;
reference stream-context-serialized-example.json:50-56,
dev.env.example:81-93).

The Spark engine executes merges itself, so the retry wraps
``ParquetMergeTarget.merge`` instead of a JDBC statement — but the
policy surface and failure contract are the reference's:

- An error whose message matches no retryable pattern re-raises
  IMMEDIATELY (fail fast on logic errors).
- A retryable error retries up to ``max_attempts`` with delay
  ``base_duration · scale_factor^n`` after attempt n.
- Exhausted retries raise :class:`StreamFailError` → exit code 2, the
  reference's "retryable at the process level" signal that Kubernetes
  podFailurePolicy restarts without counting (docs/configuration.md:39-40).

Retry safety: the merge commit point is ONE atomic manifest flip
(operators/merge.py), so a failed attempt left no partial state — the
version dir it may have orphaned is cleared by the retry itself and by
``vacuum()``.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass

from arcane_stream_parquet_spark.config import StreamFailError

_MODES = ("never", "always", "backfillOnly")


@dataclass(frozen=True)
class QueryRetryPolicy:
    """Typed ``sink.mergeServiceClient.queryRetry*`` block.

    ``retry_on_message_contents`` lists substrings of RETRYABLE error
    messages (the reference ships transient Trino-worker phrases; a
    Spark deployment lists e.g. fetch-failure / object-store-throttle
    phrases). An EMPTY list means every error is considered transient —
    matching the reference example where ``always`` mode ships with
    ``queryRetryOnMessageContents: []``.
    """

    mode: str = "never"
    base_duration_seconds: float = 1.0
    scale_factor: float = 2.0
    max_attempts: int = 3
    retry_on_message_contents: tuple[str, ...] = ()

    def __post_init__(self) -> None:
        if self.mode not in _MODES:
            raise ValueError(f"queryRetryMode must be one of {_MODES}, got {self.mode!r}")

    def active(self, is_backfill: bool) -> bool:
        if self.mode == "never":
            return False
        if self.mode == "backfillOnly":
            return is_backfill
        return True

    def is_retryable(self, exc: BaseException) -> bool:
        if not self.retry_on_message_contents:
            return True
        msg = str(exc)
        return any(pat in msg for pat in self.retry_on_message_contents)

    def delay_seconds(self, attempt: int) -> float:
        """Backoff after the ``attempt``-th failure (0-based)."""
        return self.base_duration_seconds * (self.scale_factor**attempt)


def run_with_retry(
    fn: Callable[[], None],
    policy: QueryRetryPolicy,
    is_backfill: bool = False,
    sleep: Callable[[float], None] = time.sleep,
) -> None:
    """Execute ``fn`` under the policy (module docstring has the
    contract). ``sleep`` is injectable for deterministic tests."""
    if not policy.active(is_backfill):
        fn()
        return
    last: BaseException | None = None
    for attempt in range(max(policy.max_attempts, 1)):
        try:
            fn()
            return
        except StreamFailError:
            raise  # already classified at a lower level — don't re-wrap
        except Exception as exc:
            if not policy.is_retryable(exc):
                raise
            last = exc
            if attempt < policy.max_attempts - 1:
                sleep(policy.delay_seconds(attempt))
    raise StreamFailError(
        f"merge failed after {policy.max_attempts} attempts: {last}"
    ) from last
