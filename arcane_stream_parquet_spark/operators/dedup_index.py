"""Incremental near-duplicate index — streaming-ingest dedup against
the ALREADY-ACCEPTED corpus (the production LLM-data pattern: every
arriving batch must not re-admit content that near-duplicates anything
ingested before, without ever rescanning the corpus).

Design: a persisted LSH band index (band_key → doc_id) plus a shingle
store (doc_id → shingle set), both bucket-partitioned parquet tables
reusing :class:`ParquetMergeTarget`'s atomic versioned-manifest commit.
Per batch:

1. signature the batch (narrow, fan-out parallel);
2. candidates = batch∩batch (in-batch LSH) ∪ batch∩index — the index
   probe is an equi-join of the batch's band rows against the band
   table (bucket-pruned by the band-key hash at scale), NEVER a scan
   of all stored documents;
3. exact Jaccard verify joins only candidate ids to the shingle store;
4. accepted (non-duplicate) docs append their bands + shingles to the
   index — one merge commit each; each flip alone is crash-safe, the
   PAIR is not atomic: recovery contract is re-running the failed
   add_batch (see the method docstring).

Cost per batch at 100 TB corpus: O(batch) signature work + equi-joins
proportional to batch size and candidate count. Corpus size enters only
through band-bucket fan-in (LSH-bounded) — the index never rewrites.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arcane_stream_parquet_spark.operators.minhash import (
    NUM_BANDS,
    NUM_HASHES,
    SHINGLE_K,
    lsh_bands,
    minhash_signature,
)
from arcane_stream_parquet_spark.fsio import fs_join
from arcane_stream_parquet_spark.operators.merge import ParquetMergeTarget


@dataclass
class LshDedupIndex:
    """Persisted incremental near-dup index (module docstring)."""

    spark: SparkSession
    path: str
    min_jaccard: float = 0.5
    num_hashes: int = NUM_HASHES
    num_bands: int = NUM_BANDS
    shingle_k: int = SHINGLE_K
    num_buckets: int = 64

    def __post_init__(self) -> None:
        self._bands = ParquetMergeTarget(
            spark=self.spark,
            path=fs_join(self.path, "bands"),
            key_col="band_doc_key",
            version_col="ingest_seq",
            num_buckets=self.num_buckets,
        )
        self._shingles = ParquetMergeTarget(
            spark=self.spark,
            path=fs_join(self.path, "shingles"),
            key_col="doc_key",
            version_col="ingest_seq",
            num_buckets=self.num_buckets,
        )

    # -- internals ---------------------------------------------------------

    def _signature(self, docs: DataFrame) -> DataFrame:
        return minhash_signature(
            docs.select("doc_id", "text"),
            num_hashes=self.num_hashes,
            k=self.shingle_k,
        )

    def _verify(self, pairs: DataFrame, left_sets: DataFrame, right_sets: DataFrame) -> DataFrame:
        """(id_a=new doc, id_b=prior doc) pairs → exact Jaccard ≥ min."""
        joined = pairs.join(
            left_sets.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a")),
            "id_a",
        ).join(
            right_sets.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b")),
            "id_b",
        )
        # union size via |A|+|B|−|A∩B| (sets are distinct): saves one
        # O(n) array traversal per candidate, bit-identical quotient
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        union = F.size("sh_a") + F.size("sh_b") - inter
        jacc = inter.cast("double") / union.cast("double")
        return joined.select("id_a", "id_b", jacc.alias("jaccard")).filter(
            F.col("jaccard") >= F.lit(self.min_jaccard)
        )

    # -- API ---------------------------------------------------------------

    def add_batch(self, docs: DataFrame, ingest_seq: int) -> DataFrame:
        """Process one batch of (doc_id, text): returns (doc_id, dup_of,
        jaccard) — ``dup_of`` NULL for accepted docs, else the id of the
        prior (or lower-id in-batch) document it near-duplicates.
        Accepted docs are committed to the index; rejected ones are not.

        Replay-safe: re-adding the same batch is idempotent (the index
        merge is latest-wins per (doc, band) key); a re-ingested
        already-accepted document SELF-MATCHES in the index probe and is
        reported as accepted (``dup_of`` NULL) — "already present" and
        "freshly accepted" are deliberately indistinguishable, so a
        caller that crashed between the index commit and its own
        downstream commit (the round-3 ADVICE scenario in
        streaming/curation.py) re-runs the batch and converges: the
        replayed doc flows into the downstream commit instead of being
        rejected as a near-duplicate of itself. A self-match wins over
        any other match (defensively: a doc already IN the index must
        stay kept, else its index entries would describe a rejected
        doc).

        Crash contract: the bands and shingles tables commit with two
        INDEPENDENT manifest flips. A crash between them leaves band
        rows whose shingle sets are missing; the exact-Jaccard verify
        inner-joins the shingle store, so those candidates are silently
        dropped until the caller RE-RUNS the failed ``add_batch`` (the
        documented recovery — replay heals both tables; each flip alone
        is crash-safe, the pair is not atomic).
        """
        # Materialize the signature ONCE per batch (eager localCheckpoint):
        # everything downstream — in-batch self-join, index probe, verify,
        # verdicts, and both index merges — forks from this plan, and
        # without pinning it Spark recomputes the sha256 shingle/minhash
        # work for every one of those actions (~8× at 4 merges/batch).
        # Batch-bounded data, so executor storage holds it at any corpus
        # size; lineage truncation also keeps foreachBatch plans flat.
        sig = self._signature(docs).localCheckpoint(eager=True)
        batch_sets = sig.select("doc_id", F.col("__shingles").alias("sh"))
        batch_bands = lsh_bands(sig, num_hashes=self.num_hashes, num_bands=self.num_bands)

        # in-batch candidates: lower id wins (mirrors exact_dedup)
        in_batch = (
            batch_bands.alias("a")
            .join(batch_bands.alias("b"), ["band_id", "band_key"])
            .filter(F.col("a.doc_id") > F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
            )
            .distinct()
        )
        pairs = self._verify(in_batch, batch_sets, batch_sets)

        # index candidates: batch bands probe the stored band table
        if self._bands.exists():
            stored_bands = self._bands.read().select(
                "band_id", "band_key", F.col("doc_id").alias("id_b")
            )
            cross = (
                batch_bands.select(
                    "band_id", "band_key", F.col("doc_id").alias("id_a")
                )
                .join(stored_bands, ["band_id", "band_key"])
                .select("id_a", "id_b")
                .distinct()
            )
            stored_sets = self._shingles.read().select("doc_id", "sh")
            pairs = pairs.unionByName(
                self._verify(cross, batch_sets, stored_sets)
            )

        # one verdict per doc: the smallest matching prior/lower id,
        # reporting THAT pair's jaccard (min_by over the pair struct —
        # both fields come from the same selected pair). A SELF-match
        # (id_a == id_b, only possible via the stored-index probe) means
        # the doc is already committed to the index — replay of a batch
        # whose downstream commit was lost; it overrides any dup verdict
        # (docstring: already-present docs stay accepted).
        sel = F.min_by(F.struct("id_b", "jaccard"), "id_b")
        already = (
            pairs.filter(F.col("id_a") == F.col("id_b"))
            .select(F.col("id_a").alias("doc_id"))
            .distinct()
            .withColumn("__already", F.lit(True))
        )
        dup_agg = (
            pairs.filter(F.col("id_a") != F.col("id_b"))
            .groupBy("id_a")
            .agg(sel.alias("__sel"))
            .select(
                F.col("id_a").alias("doc_id"),
                F.col("__sel.id_b").alias("__dup_of"),
                F.col("__sel.jaccard").alias("__jaccard"),
            )
        )
        verdicts = (
            docs.select("doc_id")
            .join(dup_agg, "doc_id", "left")
            .join(already, "doc_id", "left")
            .select(
                "doc_id",
                F.when(F.col("__already"), F.lit(None))
                .otherwise(F.col("__dup_of"))
                .alias("dup_of"),
                F.when(F.col("__already"), F.lit(None))
                .otherwise(F.col("__jaccard"))
                .alias("jaccard"),
            )
            # pinned: consumed by both index merges below plus whatever
            # the caller does (curation: audit + corpus merges) — four
            # actions over one batch-sized verify result
            .localCheckpoint(eager=True)
        )

        accepted = verdicts.filter(F.col("dup_of").isNull()).select("doc_id")
        acc_bands = (
            batch_bands.join(accepted, "doc_id")
            .withColumn(
                "band_doc_key",
                F.concat_ws("|", F.col("band_key"), F.col("doc_id")),
            )
            .withColumn("ingest_seq", F.lit(ingest_seq).cast("long"))
        )
        acc_sets = (
            batch_sets.join(accepted, "doc_id")
            .withColumn("doc_key", F.col("doc_id").cast("string"))
            .withColumn("ingest_seq", F.lit(ingest_seq).cast("long"))
        )
        self._bands.merge(acc_bands)
        self._shingles.merge(acc_sets)
        return verdicts
