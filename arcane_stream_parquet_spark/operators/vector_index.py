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
    unrollable,
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
        ).withColumn("n", norm_expr(F.col("v"), unrollable(len(self._planes[0]))))

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

    def remove(self, vec_ids) -> int:
        """Delete vectors by id: one MoR equality-delete file + one
        manifest flip through the storage engine (merge.delete_keys) —
        O(delete batch), no data-file rewrite; removed rows disappear
        from every subsequent :meth:`search`. Absent ids are no-ops
        (idempotent redelivery). Returns the live-row delete count."""
        return self._table.delete_keys([str(int(v)) for v in vec_ids])

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
        sim = cosine_with_norms(
            F.col("qv"), F.col("v"), F.col("qn"), F.col("n"),
            unrollable(len(self._planes[0])),
        )
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


# ---------------------------------------------------------------------------
# PQ-compressed persisted index (r14): the IVF-PQ tier stored through
# the merge target, so the STORAGE ENGINE's machinery carries the
# index — cell-sorted files with per-file cell stats make read_where's
# manifest pruning plan a search as O(files of probed cells); the code
# column is what the ADC scan reads (m·log2(codes) bits/vector); the
# full-width embedding column is stored alongside but touched only by
# the optional exact rerank over candidate rows (column pruning keeps
# it out of the ADC scan plan).


@dataclass
class PQVectorIndex:
    """Persisted IVF-PQ index over (vec_id, embedding).

    The quantizer (IVF centroids + residual codebooks) is PINNED at
    create time in a create-only metadata file next to the table —
    every later ``add_batch`` and every reopened handle encodes and
    searches with the same quantizer (codes from different quantizers
    are not comparable; re-training means re-encoding, a new index).

    ``add_batch`` is O(batch): assignment + residual encode are the
    ivfpq_build shapes, one merge commit, idempotent per vec_id
    (latest ingest_seq wins). ``search`` plans O(files of probed
    cells) via read_where's manifest stats pruning (files are written
    cell-SORTED so each file is a tight cell range), runs the
    :func:`~arcane_stream_parquet_spark.operators.pq.ivfpq_topk` ADC
    over only those files, and optionally exact-reranks the shortlist
    against the stored embeddings (read for candidate rows only)."""

    spark: SparkSession
    path: str
    centroids: list
    codebooks: list
    num_buckets: int = 16
    #: rows per data file. The pruning lever: rows are written
    #: cell-SORTED within each hash bucket, so each file covers a
    #: contiguous cell range — the smaller the file, the tighter the
    #: range and the harder read_where's manifest stats prune. Size so
    #: a file spans ~one cell: ≈ E[rows per (bucket, cell)].
    max_records_per_file: int | None = 64_000

    _META = "_pq_index_meta.json"

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        centroids,
        codebooks,
        num_buckets: int = 16,
        max_records_per_file: int | None = 64_000,
    ) -> "PQVectorIndex":
        """Pin the quantizer create-only and return a handle. Raises if
        an index already exists at ``path`` (reopen with :meth:`open`)."""
        import json as _json

        from arcane_stream_parquet_spark.fsio import HadoopFileIO, fs_join

        meta = {
            "centroids": [[int(c), [float(x) for x in v]] for c, v in centroids],
            "codebooks": [
                [[float(x) for x in cv] for cv in book] for book in codebooks
            ],
            "num_buckets": int(num_buckets),
            "max_records_per_file": max_records_per_file,
        }
        HadoopFileIO(spark).create_text(
            fs_join(path, cls._META), _json.dumps(meta)
        )
        return cls(
            spark=spark,
            path=path,
            centroids=[(int(c), list(v)) for c, v in centroids],
            codebooks=meta["codebooks"],
            num_buckets=int(num_buckets),
            max_records_per_file=max_records_per_file,
        )

    @classmethod
    def open(cls, spark: SparkSession, path: str) -> "PQVectorIndex":
        """Reopen an existing index; the pinned quantizer is
        authoritative (the create-only universe rule)."""
        import json as _json

        from arcane_stream_parquet_spark.fsio import HadoopFileIO, fs_join

        meta = _json.loads(
            HadoopFileIO(spark).read_text(fs_join(path, cls._META))
        )
        return cls(
            spark=spark,
            path=path,
            centroids=[(int(c), list(v)) for c, v in meta["centroids"]],
            codebooks=meta["codebooks"],
            num_buckets=int(meta["num_buckets"]),
            max_records_per_file=meta.get("max_records_per_file"),
        )

    @property
    def table(self) -> ParquetMergeTarget:
        return ParquetMergeTarget(
            spark=self.spark,
            path=self.path,
            key_col="vec_key",
            version_col="ingest_seq",
            num_buckets=self.num_buckets,
            max_records_per_file=self.max_records_per_file,
            sorted_by=("cell",),
            stats_cols=("cell",),
        )

    def _encoded(self, vectors: DataFrame) -> DataFrame:
        from arcane_stream_parquet_spark.operators.pq import pq_encode
        from arcane_stream_parquet_spark.operators.similarity import (
            _centroids_df,
            ivf_assign,
        )

        assigned = ivf_assign(vectors, self.centroids)
        cent = _centroids_df(self.spark, self.centroids)
        res = assigned.join(cent, assigned["cell"] == cent["cid"]).select(
            F.col("vec_id"),
            F.col("cell"),
            F.col("__v").alias("embedding"),
            F.zip_with(F.col("__v"), F.col("cv"), lambda x, y: x - y).alias(
                "__res"
            ),
        )
        # __res_sq rides along for the per-batch staleness stat (r15
        # VERDICT item 3): squared L2 of the coarse residual — exactly
        # the quantity the pinned centroids minimize over the creation
        # corpus, so its batch mean rising over ingest_seq IS corpus
        # drift away from the quantizer.
        res_sq = F.aggregate(
            F.col("__res"),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        ).alias("__res_sq")
        base = res.select("vec_id", "cell", "embedding", res_sq, "__res")
        return pq_encode(base, self.codebooks, vec_col="__res").join(
            base.select("vec_id", "cell", "embedding", "__res_sq"), "vec_id"
        )

    def add_batch(self, vectors: DataFrame, ingest_seq: int) -> int:
        """Encode and upsert a batch of (vec_id, embedding); idempotent
        per vec_id (latest ingest_seq wins). Returns batch size.

        Alongside the merge commit, a per-batch staleness record lands
        create-only under ``_pq_index_stats/`` (batch size, mean
        squared coarse-residual norm, per-cell occupancy): the cheap
        drift telemetry :meth:`staleness` aggregates — all three are
        one extra aggregate over the batch the encode already built,
        metadata-scale output (k cells), no corpus scan."""
        rows = (
            self._encoded(vectors)
            .withColumn("vec_key", F.col("vec_id").cast("string"))
            .withColumn("ingest_seq", F.lit(ingest_seq).cast("long"))
            .localCheckpoint(eager=True)  # encode once: stats + merge
        )
        stats = rows.groupBy("cell").agg(
            F.count("*").alias("n"), F.sum("__res_sq").alias("rs")
        ).collect()  # k rows — metadata scale
        self.table.merge(rows.drop("__res_sq"))
        self._record_batch_stats(
            ingest_seq,
            n_rows=sum(int(r["n"]) for r in stats),
            sum_res_sq=float(sum(r["rs"] for r in stats)),
            cell_counts={int(r["cell"]): int(r["n"]) for r in stats},
        )
        return rows.count()

    def _record_batch_stats(
        self,
        ingest_seq: int,
        n_rows: int,
        sum_res_sq: float,
        cell_counts: dict[int, int],
    ) -> None:
        import json as _json

        from arcane_stream_parquet_spark.fsio import HadoopFileIO, fs_join

        record = {
            "ingest_seq": int(ingest_seq),
            "n_rows": n_rows,
            "mean_res_sq": (sum_res_sq / n_rows) if n_rows else 0.0,
            "cell_counts": {str(c): n for c, n in sorted(cell_counts.items())},
        }
        try:
            HadoopFileIO(self.spark).create_text(
                fs_join(self.path, "_pq_index_stats",
                        f"seq{int(ingest_seq):010d}.json"),
                _json.dumps(record),
            )
        except FileExistsError:
            pass  # idempotent redelivery of the same ingest_seq

    def staleness(self) -> dict:
        """Aggregate the recorded per-batch drift telemetry (r15
        VERDICT item 3): the quantizer is pinned create-only, so after
        heavy ``add_batch``/``remove`` churn the centroids/codebooks
        drift from the corpus and recall silently decays — this is the
        cheap dial that says WHEN to :meth:`reindex`, without scanning
        the corpus (it reads only the metadata-scale stats records).

        Returns ``{"batches": [per-batch records, ingest_seq asc],
        "drift_ratio": latest mean_res_sq / first batch's (1.0 = no
        drift; rising = corpus moving away from the pinned quantizer),
        "cell_skew": max/mean occupancy over the summed add-side cell
        counts (rising = cells going unbalanced — probe efficiency
        decays even at constant residual norm)}``. Add-side telemetry:
        removals don't subtract from occupancy; a post-reindex handle
        starts a fresh record set."""
        import json as _json

        from arcane_stream_parquet_spark.fsio import HadoopFileIO, fs_join

        io = HadoopFileIO(self.spark)
        stats_dir = fs_join(self.path, "_pq_index_stats")
        batches = sorted(
            (
                _json.loads(io.read_text(p))
                for p in io.list_files_recursive(stats_dir, suffix=".json")
            ),
            key=lambda r: r["ingest_seq"],
        )
        if not batches:
            return {"batches": [], "drift_ratio": None, "cell_skew": None}
        first = next((b for b in batches if b["n_rows"]), None)
        last = next(
            (b for b in reversed(batches) if b["n_rows"]), None
        )
        drift = (
            last["mean_res_sq"] / first["mean_res_sq"]
            if first and first["mean_res_sq"] > 0
            else None
        )
        occ: dict[str, int] = {}
        for b in batches:
            for c, n in b["cell_counts"].items():
                occ[c] = occ.get(c, 0) + n
        # skew over ALL pinned cells (an unoccupied centroid is skew)
        k = len(self.centroids)
        mean_occ = sum(occ.values()) / k if k else 0
        skew = (max(occ.values()) / mean_occ) if occ and mean_occ else None
        return {
            "batches": batches,
            "drift_ratio": drift,
            "cell_skew": skew,
        }

    def reindex(
        self,
        new_path: str,
        ingest_seq: int = 0,
        iters: int = 2,
    ) -> "PQVectorIndex":
        """Retrain the quantizer on the CURRENT live corpus and build a
        fresh index at ``new_path`` (r15 VERDICT item 3) — the swap
        half of the staleness dial: same geometry (k cells, m
        subvectors, code count, bucketing) retrained with the same
        deterministic pipeline the original build used
        (:func:`~.similarity.train_ivf_centroids` medians +
        :func:`~.pq.train_pq_codebooks` farthest-point seeding), so
        reindexing a churned corpus lands bit-identical to building a
        fresh index over it.

        Crash-safe by construction: every write — quantizer pin, data,
        stats — lands under ``new_path`` via the create-only
        :meth:`create`; the old index is never touched, so a
        mid-reindex kill leaves it fully serving and the retry just
        needs a clean ``new_path``. The caller swaps handles (and
        retires the old path) only after this returns.

        Scale shape: training re-scans the live corpus (column-pruned
        to id+embedding) once per Lloyd's iteration — the documented
        train-on-a-sample dial applies: pass a sampled corpus through
        a manual :func:`~.similarity.train_ivf_centroids` +
        :meth:`create` + :meth:`add_batch` sequence instead when the
        full scan is too dear."""
        from arcane_stream_parquet_spark.operators.pq import (
            train_pq_codebooks,
        )
        from arcane_stream_parquet_spark.operators.similarity import (
            _centroids_df,
            ivf_assign,
            train_ivf_centroids,
        )

        live = self.table.read().select("vec_id", "embedding")
        cents = train_ivf_centroids(
            live, k=len(self.centroids), iters=iters
        )
        assigned = ivf_assign(live, cents)
        cent = _centroids_df(self.spark, cents)
        res = assigned.join(cent, assigned["cell"] == cent["cid"]).select(
            F.col("vec_id"),
            F.zip_with(F.col("__v"), F.col("cv"), lambda x, y: x - y).alias(
                "__res"
            ),
        )
        books = train_pq_codebooks(
            res,
            m=len(self.codebooks),
            codes=len(self.codebooks[0]),
            vec_col="__res",
        )
        new = PQVectorIndex.create(
            self.spark,
            new_path,
            cents,
            books,
            num_buckets=self.num_buckets,
            max_records_per_file=self.max_records_per_file,
        )
        new.add_batch(live, ingest_seq=ingest_seq)
        return new

    def remove(self, vec_ids) -> int:
        """Delete vectors by id: one MoR equality-delete file + one
        manifest flip (merge.delete_keys) — O(delete batch), no
        data-file rewrite, the cell-sorted files untouched; removed
        rows disappear from every subsequent :meth:`search` (the
        pruned read applies pending deletes like any other read).
        Absent ids are no-ops (idempotent redelivery). Returns the
        live-row delete count."""
        return self.table.delete_keys([str(int(v)) for v in vec_ids])

    def search(
        self,
        queries: DataFrame,
        k: int = 10,
        nprobe: int = 2,
        rerank: int = 0,
    ) -> DataFrame:
        """ADC top-k over the persisted index, planned as O(files of
        probed cells). ``rerank > 0`` exact-reranks that deep a
        shortlist against the stored embeddings (read for candidate
        rows only) and returns (query_id, neighbor_id, l2sq); without
        it, (query_id, neighbor_id, adc_l2sq)."""
        from arcane_stream_parquet_spark.operators.pq import (
            exact_rerank,
            ivfpq_topk,
        )
        from arcane_stream_parquet_spark.operators.similarity import (
            _probe_cells,
            as_double_array,
        )

        # ONE query-side probe (r14 ADVICE): the same frame feeds the
        # manifest pruning (cell list) and the ADC join inside
        # ivfpq_topk — no duplicate |Q|-scale work, no drift risk
        # between the pruning rule and the join rule.
        probed = _probe_cells(
            queries, self.centroids, "vec_id", as_double_array("embedding"),
            nprobe=nprobe, out_id="query_id",
            # sql backend: search queries are |Q|-bounded, below the
            # arrow assignment's crossover (similarity.py)
            backend="sql",
        ).localCheckpoint(eager=False)
        cells = sorted(
            int(r["cell"]) for r in probed.select("cell").distinct().collect()
        )  # |Q|·nprobe ints — metadata scale
        pruned = self.table.read_where(("cell", "in", cells))
        index = pruned.select("vec_id", "cell", "pq_codes")
        shortlist = ivfpq_topk(
            index, queries, self.centroids, self.codebooks,
            k=rerank if rerank > 0 else k, probed=probed,
        )
        if rerank <= 0:
            return shortlist
        return exact_rerank(
            pruned.select("vec_id", "embedding"), shortlist, queries, k=k,
            dim=len(self.centroids[0][1]) if self.centroids else None,
        )
