"""Latest-wins MERGE INTO a parquet target (reference: J1 + ST3,
SURVEY.md §2.3).

The reference's only join: staging batch ⨝ target on
``arcane_merge_key`` — matched rows update to the staged version iff it
is not older, unmatched insert (MERGE through Trino, main.scala:47-49;
late old versions "discarded by the merge condition", SURVEY.md ST3).

Spark-first realization without an external table format (SURVEY.md §7
risk (a): no Iceberg runtime JAR in this environment — the MERGE
semantics are format-independent and oracle-checked; swapping the
storage layer for Iceberg's ``MERGE INTO`` is a config change, see
docstring of :class:`ParquetMergeTarget`):

**Bucketed merge-by-rewrite.** The target directory is hash-partitioned
by ``__bucket = pmod(xxhash64(arcane_merge_key), num_buckets)``. A merge

1. dedups the batch to one row per key (J2 window),
2. computes the batch's affected bucket set (small driver-side list),
3. scans ONLY those buckets of the target (partition pruning — the scan
   cost is proportional to the batch's key spread, not target size),
4. resolves latest-wins per key with a single ranking window
   (batch beats target on equal version — MERGE's
   ``s.createdon >= t.createdon`` condition),
5. dynamically overwrites ONLY the affected bucket partitions.

At 100 TB with e.g. 4096 buckets, a batch touching k buckets reads and
rewrites k/4096 of the table; the merge-key hash is uniform (sha256) so
buckets cannot skew. No driver-side data movement; one shuffle on the
key (reused by the dedup window and the bucket write layout).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arcane_stream_parquet_spark.functions.keys import (
    MERGE_KEY_COLUMN,
    VERSION_COLUMN,
)

BUCKET_COLUMN = "__bucket"
_PRECEDENCE_COL = "__asp_precedence"
_ROW_NUMBER_COL = "__asp_rn"
_META_DIR = "_asp_meta"


def _bucket_expr(key_col: str, num_buckets: int):
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(num_buckets)).cast("int")


def _dedup_latest_df(
    df: DataFrame,
    key_col: str,
    version_col: str,
    batch_beats_target: bool = False,
) -> DataFrame:
    from pyspark.sql import Window

    order = [F.col(version_col).desc()]
    if batch_beats_target:
        order.append(F.col(_PRECEDENCE_COL).desc())
    w = Window.partitionBy(key_col).orderBy(*order)
    return (
        df.withColumn(_ROW_NUMBER_COL, F.row_number().over(w))
        .filter(F.col(_ROW_NUMBER_COL) == 1)
        .drop(_ROW_NUMBER_COL)
    )


def merge_latest_wins(
    target: DataFrame,
    batch: DataFrame,
    key_col: str = MERGE_KEY_COLUMN,
    version_col: str = VERSION_COLUMN,
) -> DataFrame:
    """Pure-DataFrame MERGE: the relational core of J1+J2+ST3, shared by
    :class:`ParquetMergeTarget` and the oracle-checked ``merge_upsert``
    query. Semantics of ``MERGE INTO target USING batch ON key WHEN
    MATCHED AND batch.v >= target.v THEN UPDATE SET * WHEN NOT MATCHED
    THEN INSERT *`` — one row per key survives, highest version wins,
    batch wins exact-version ties.

    One shuffle (window over the union, hash-partitioned by key);
    Catalyst plans the union scan-side, no driver involvement.
    """
    unioned = target.withColumn(_PRECEDENCE_COL, F.lit(0)).unionByName(
        batch.withColumn(_PRECEDENCE_COL, F.lit(1))
    )
    return _dedup_latest_df(
        unioned, key_col, version_col, batch_beats_target=True
    ).drop(_PRECEDENCE_COL)


@dataclass
class ParquetMergeTarget:
    """An upsert-able table stored as bucket-partitioned parquet.

    Equivalent Iceberg deployment: a table partitioned by
    ``bucket(num_buckets, arcane_merge_key)`` receiving
    ``MERGE INTO t USING s ON t.k = s.k WHEN MATCHED AND s.createdon >=
    t.createdon THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *``
    (reference docs/crd.md:211 uses exactly this bucket layout).

    ``max_records_per_file`` mirrors the reference's staging
    ``maxRowsPerFile`` (docs/crd.md:137-141).
    """

    spark: SparkSession
    path: str
    key_col: str = MERGE_KEY_COLUMN
    version_col: str = VERSION_COLUMN
    num_buckets: int = 64
    max_records_per_file: int | None = None
    unified_schema: bool = False  # reference isUnifiedSchema: no drift allowed

    # -- storage helpers ---------------------------------------------------

    @property
    def _data_path(self) -> str:
        return os.path.join(self.path, "data")

    @property
    def _schema_path(self) -> str:
        return os.path.join(self.path, _META_DIR, "schema.json")

    def exists(self) -> bool:
        return os.path.isdir(self._data_path)

    def _saved_schema(self):
        """The table's authoritative schema, persisted at write time.

        After a schema-drift merge, untouched bucket files still carry
        the pre-drift footer; reading with the persisted unified schema
        null-fills their missing columns by name — without the
        every-footer scan of ``mergeSchema=true`` (prohibitive at scale).
        """
        from pyspark.sql.types import StructType

        try:
            with open(self._schema_path) as fh:
                return StructType.fromJson(json.load(fh))
        except FileNotFoundError:
            return None

    def _save_schema(self, df: DataFrame) -> None:
        os.makedirs(os.path.dirname(self._schema_path), exist_ok=True)
        tmp = self._schema_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(df.schema.jsonValue(), fh)
        os.replace(tmp, self._schema_path)

    def _read_raw(self) -> DataFrame:
        """Full table including the bucket partition column."""
        schema = self._saved_schema()
        reader = self.spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.parquet(self._data_path)

    def read(self) -> DataFrame:
        """Current table contents (bucket column dropped)."""
        return self._read_raw().drop(BUCKET_COLUMN)

    def _writer(self, df: DataFrame):
        writer = df.write.partitionBy(BUCKET_COLUMN)
        if self.max_records_per_file:
            writer = writer.option("maxRecordsPerFile", str(self.max_records_per_file))
        return writer

    def _with_bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn(BUCKET_COLUMN, _bucket_expr(self.key_col, self.num_buckets))

    # -- merge semantics ---------------------------------------------------

    def _dedup_latest(self, df: DataFrame, batch_beats_target: bool = False) -> DataFrame:
        return _dedup_latest_df(
            df, self.key_col, self.version_col, batch_beats_target=batch_beats_target
        )

    def _reconcile_schema(self, existing: DataFrame, batch: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Schema-drift handling (reference SchemaMigrationProcessor,
        main.scala:50,114): new batch columns become NULL-filled target
        columns; ``unified_schema=True`` forbids drift instead."""
        existing_cols, batch_cols = set(existing.columns), set(batch.columns)
        if existing_cols == batch_cols:
            return existing, batch
        if self.unified_schema:
            raise ValueError(
                f"schema drift with unified_schema=True: "
                f"target-only={sorted(existing_cols - batch_cols)} "
                f"batch-only={sorted(batch_cols - existing_cols)}"
            )
        union_schema = existing.unionByName(batch, allowMissingColumns=True).schema
        def pad(df: DataFrame) -> DataFrame:
            missing = [f for f in union_schema.fields if f.name not in df.columns]
            return df.select("*", *[F.lit(None).cast(f.dataType).alias(f.name) for f in missing])
        return pad(existing), pad(batch)

    def merge(self, batch: DataFrame) -> None:
        """Upsert a batch: latest version per key wins; ties go to the
        batch (MERGE ``s.createdon >= t.createdon``)."""
        if self.key_col not in batch.columns:
            raise ValueError(f"batch lacks key column {self.key_col}")
        if self.version_col not in batch.columns:
            raise ValueError(f"batch lacks version column {self.version_col}")

        batch_latest = self._dedup_latest(batch)

        if not self.exists():
            initial = self._with_bucket(batch_latest)
            self._writer(initial).mode("overwrite").save(self._data_path)
            self._save_schema(initial)
            return

        batch_latest = self._with_bucket(batch_latest)
        # Affected buckets: tiny driver-side list (≤ num_buckets ints).
        buckets = [
            r[BUCKET_COLUMN]
            for r in batch_latest.select(BUCKET_COLUMN).distinct().collect()
        ]
        existing = self._read_raw().filter(
            F.col(BUCKET_COLUMN).isin(buckets)  # partition pruning
        )
        existing, batch_latest = self._reconcile_schema(existing, batch_latest)

        merged = merge_latest_wins(
            existing, batch_latest, self.key_col, self.version_col
        )

        # Rewrite only the affected bucket partitions.
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        self._writer(merged).mode("overwrite").save(self._data_path)
        self._save_schema(merged)

    def overwrite(self, df: DataFrame) -> None:
        """Backfill ``Overwrite`` behavior (reference ST10): target :=
        latest-per-key snapshot of the source."""
        snapshot = self._with_bucket(self._dedup_latest(df))
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
        self._writer(snapshot).mode("overwrite").save(self._data_path)
        self._save_schema(snapshot)

    # -- watermark (reference ST2) ----------------------------------------

    @property
    def _watermark_path(self) -> str:
        return os.path.join(self.path, _META_DIR, "watermark.json")

    def watermark(self) -> int | None:
        """Last committed MAX(version) (reference BlobSourceWatermark)."""
        try:
            with open(self._watermark_path) as fh:
                return json.load(fh)["version"]
        except FileNotFoundError:
            return None

    def commit_watermark(self, version: int | None) -> None:
        if version is None:
            return
        current = self.watermark()
        if current is not None and version <= current:
            return  # monotonic
        os.makedirs(os.path.dirname(self._watermark_path), exist_ok=True)
        tmp = self._watermark_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"version": int(version)}, fh)
        os.replace(tmp, self._watermark_path)
