"""Streaming + backfill pipeline assembly (reference E1/E2 entry points,
SURVEY.md §3).

The reference's run loop: scan new blobs → enrich (normalize names,
merge key, createdon) → field selection → batch → stage → MERGE →
watermark → dispose staging (main.scala:85-133). Spark collapses this
to::

    source.read_stream(...)            # scan + enrich (BlobParquetSource)
      .writeStream.foreachBatch(merge) # stage+merge per micro-batch
      .option("checkpointLocation", …) # exactly-once file tracking (ST2)
      .trigger(...)                    # change-capture cadence (ST1/A3)

The micro-batch DataFrame IS the staging table (SURVEY.md §1.1): it is
"dropped" for free when the batch ends (ST9). Replay safety matches the
reference's argument: a crash between merge and checkpoint replays the
batch, and the latest-wins MERGE is idempotent per (key, version).

Backfill (E2) is the same transforms as one batch job with
``Overwrite | Merge`` completion behavior (reference backfillBehavior).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from arcane_stream_parquet_spark.operators.merge import ParquetMergeTarget
from arcane_stream_parquet_spark.operators.watermark import watermark_value
from arcane_stream_parquet_spark.sources.blob import BlobParquetSource


@dataclass
class StreamRunner:
    """Wires one source prefix to one merge target.

    ``change_capture_interval_seconds`` mirrors the reference's poll
    cadence (default 300 s, crd-parquet-stream.yaml:126-134; jitter is
    an accepted deviation — Spark's trigger is fixed-rate).
    ``max_files_per_trigger`` / ``max_bytes_per_trigger`` are the
    throughput-shaper equivalents (ST6).
    """

    source: BlobParquetSource
    target: ParquetMergeTarget
    checkpoint_dir: str
    change_capture_interval_seconds: float = 300.0
    max_files_per_trigger: int | None = None
    max_bytes_per_trigger: str | None = None
    on_batch: list = field(default_factory=list)  # hooks: fn(batch_id, df)
    # ST8 maintenance cadence (reference TargetMaintenanceProcessor,
    # main.scala:46,117: OPTIMIZE/expire/remove_orphans/ANALYZE every
    # batchThreshold batches, defaults 60/60/60/180,
    # crd-parquet-stream.yaml:235-296). 0 disables.
    maintenance_every_n_batches: int = 60
    _batches_since_maintenance: int = field(default=0, repr=False)

    def _merge_batch(self, batch: DataFrame, batch_id: int) -> None:
        if not batch.head(1):
            return
        self.target.merge(batch)
        self.target.commit_watermark(
            watermark_value(batch, self.target.version_col)
        )
        self._batches_since_maintenance += 1
        if (
            self.maintenance_every_n_batches
            and self._batches_since_maintenance >= self.maintenance_every_n_batches
        ):
            self._batches_since_maintenance = 0
            self.target.compact()
            self.target.vacuum()
        for hook in self.on_batch:
            hook(batch_id, batch)

    def _writer(self, spark: SparkSession, available_now: bool):
        stream = self.source.read_stream(
            spark,
            max_files_per_trigger=self.max_files_per_trigger,
            max_bytes_per_trigger=self.max_bytes_per_trigger,
        )
        writer = (
            stream.writeStream.foreachBatch(self._merge_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .outputMode("update")
        )
        if available_now:
            return writer.trigger(availableNow=True)
        return writer.trigger(
            processingTime=f"{self.change_capture_interval_seconds} seconds"
        )

    def run_available_now(self, spark: SparkSession, timeout_sec: float = 600) -> None:
        """Process everything currently in the source, then stop (the
        test-harness trigger, reference E3 TimeLimitLifetimeService)."""
        query = self._writer(spark, available_now=True).start()
        try:
            if not query.awaitTermination(timeout_sec):
                raise TimeoutError(f"stream did not drain in {timeout_sec}s")
        finally:
            if query.isActive:
                query.stop()

    def start(self, spark: SparkSession) -> StreamingQuery:
        """Continuous change-capture mode (reference E1)."""
        return self._writer(spark, available_now=False).start()


def run_backfill(
    spark: SparkSession,
    source: BlobParquetSource,
    target: ParquetMergeTarget,
    behavior: str = "Merge",
) -> None:
    """Backfill (reference E2): re-read the whole source (from
    ``source.modified_after`` if set) and apply ``Overwrite | Merge``
    (crd-parquet-stream.yaml:113-116). Sharding is Spark partitioning —
    free (SURVEY.md ST10)."""
    if behavior not in ("Merge", "Overwrite"):
        raise ValueError(f"behavior must be Merge|Overwrite, got {behavior!r}")
    df = source.read_batch(spark)
    if behavior == "Overwrite":
        target.overwrite(df)
    else:
        target.merge(df)
    target.commit_watermark(watermark_value(df, target.version_col))
