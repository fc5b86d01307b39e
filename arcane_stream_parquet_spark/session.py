"""SparkSession construction and runtime configuration.

Two entry points:

- ``build_session``: create a tuned local session (tests, bench).
- ``configure_session``: apply the runtime-settable confs this engine
  requires to an EXISTING session (the correctness driver hands us its
  own session, so every public query path calls this defensively).

Scale notes (100 TB posture): everything here is runtime SQL conf —
AQE on (runtime re-plan, skew-join splitting, partition coalescing),
shuffle partitions sized for the local run but expected to be overridden
by AQE / cluster conf in production. No RDD-level tuning.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL confs applied to any session we touch.
# - nanosAsLong: the synthetic testdata (and plenty of real pandas-written
#   parquet) carries TIMESTAMP(NANOS) columns, which Spark's vectorized
#   reader rejects by default; the legacy conf reads them as epoch-nano
#   BIGINT, which we then surface explicitly (see sources/tables.py).
# - AQE: runtime coalescing + skew-join handling — the default posture for
#   any large-cluster deployment.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas interchange (UDF paths, toPandas in tests).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet nano-timestamps also appear in streaming file sources.
    "spark.sql.parquet.mergeSchema": "false",
    # Session-timezone-stable timestamp behavior.
    "spark.sql.session.timeZone": "UTC",
}


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply required runtime confs to an existing session (idempotent)."""
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # Non-runtime-settable in some deployment: leave builder value.
            pass
    return spark


def build_session(
    app_name: str = "arcane-stream-parquet-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build a local session tuned for this engine.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all cores; shuffle
    partitions default to the core count (local mode: 1 core ≈ 1 slot —
    more would only add scheduling overhead at test scale; AQE coalesces
    anyway).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus), 4)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
        # Console progress bars write \r-spam to stdout; bench.py's single
        # JSON line must survive the driver's bounded capture window
        # (r6 VERDICT item 7: BENCH_rN.json arrived truncated).
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    if extra_confs:
        for key, value in extra_confs.items():
            builder = builder.config(key, value)
    return configure_session(builder.getOrCreate())
