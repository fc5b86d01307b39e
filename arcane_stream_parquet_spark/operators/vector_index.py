"""Persisted ANN vector index — the embedding counterpart of the
incremental LSH dedup index (operators/dedup_index.py): vectors land in
random-hyperplane sign buckets persisted as a bucket-partitioned
parquet table; queries probe only their bucket's rows.

At 100 TB: ``add_batch`` cost is O(batch) (bucket assignment is a
projection; one merge commit); ``search`` reads only the probed
buckets' partitions (the bucket string is the merge key, so the
storage layout IS the index — partition pruning turns a query into a
handful of file reads, never a corpus scan).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arcane_stream_parquet_spark.operators.merge import ParquetMergeTarget
from arcane_stream_parquet_spark.operators.similarity import (
    NUM_PLANES,
    as_double_array,
    cosine_with_norms,
    norm_expr,
    random_planes,
    with_lsh_bucket,
)


@dataclass
class VectorIndex:
    """Incremental LSH-bucketed vector index over (vec_id, embedding)."""

    spark: SparkSession
    path: str
    num_planes: int = NUM_PLANES
    num_buckets: int = 64
    _planes: list = field(default=None, repr=False)

    def __post_init__(self) -> None:
        self._planes = random_planes(self.num_planes)
        self._table = ParquetMergeTarget(
            spark=self.spark,
            path=self.path,
            key_col="vec_key",
            version_col="ingest_seq",
            num_buckets=self.num_buckets,
        )

    def _bucketed(self, vectors: DataFrame) -> DataFrame:
        return with_lsh_bucket(
            vectors.select(
                F.col("vec_id"), as_double_array("embedding").alias("v")
            ),
            "v",
            self._planes,
        ).withColumn("n", norm_expr(F.col("v")))

    def add_batch(self, vectors: DataFrame, ingest_seq: int) -> int:
        """Index a batch of (vec_id, embedding); idempotent per vec_id
        (latest ingest_seq wins). Returns batch size."""
        rows = (
            self._bucketed(vectors)
            .withColumn("vec_key", F.col("vec_id").cast("string"))
            .withColumn("ingest_seq", F.lit(ingest_seq).cast("long"))
        )
        self._table.merge(rows)
        return vectors.count()

    def search(self, queries: DataFrame, k: int = 10) -> DataFrame:
        """Approximate top-k over the PERSISTED corpus: queries bucket
        themselves, probe only matching bucket rows, rank by cosine.
        Returns (query_id, neighbor_id, cosine)."""
        from pyspark.sql import Window

        q = F.broadcast(
            self._bucketed(queries)
            .select(
                F.col("vec_id").alias("query_id"),
                F.col("v").alias("qv"),
                F.col("n").alias("qn"),
                "lsh_bucket",
            )
        )
        stored = self._table.read().select(
            F.col("vec_id").alias("neighbor_id"), "v", "n", "lsh_bucket"
        )
        sim = cosine_with_norms(F.col("qv"), F.col("v"), F.col("qn"), F.col("n"))
        w = Window.partitionBy("query_id").orderBy(
            F.col("__sim").desc(), F.col("neighbor_id").asc()
        )
        return (
            stored.join(q, "lsh_bucket")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id", sim.alias("__sim"))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .select("query_id", "neighbor_id", F.col("__sim").alias("cosine"))
        )
