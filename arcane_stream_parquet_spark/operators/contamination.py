"""Benchmark-contamination detection — the decontamination operator a
training-data pipeline runs before every release: flag corpus documents
sharing verbatim n-grams with an evaluation/benchmark set.

Shape (scale-first): the benchmark side is SMALL by definition (eval
sets are thousands of docs, the corpus is billions) — its distinct
shingle set broadcasts; corpus shingles explode and probe the broadcast
via an equi-join; hits aggregate per doc. The corpus is scanned once,
shuffles only doc_id→hit-count partial aggregates. Never a cross join,
no corpus-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arcane_stream_parquet_spark.operators.minhash import shingles_column


def contamination_flags(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """(id, n_contaminated_shingles, contaminated) per corpus doc:
    count of the doc's k-word shingles that appear anywhere in the
    benchmark's shingle set."""
    from arcane_stream_parquet_spark.functions.partitioning import fan_out

    corpus = fan_out(corpus)  # shingling is CPU-bound (see partitioning.py)
    bench_shingles = (
        benchmark.select(
            F.explode(shingles_column(text_col, k)).alias("shingle")
        )
        .distinct()
        .withColumn("_hit", F.lit(True))
    )
    corpus_shingles = corpus.select(
        F.col(id_col), F.explode(shingles_column(text_col, k)).alias("shingle")
    )
    # r16 (guide §2.4): LEFT-join the broadcast set and count matches in
    # the per-doc aggregate — every document has >= 1 shingle (short
    # docs shingle their whole token sequence), so zero-hit docs ride
    # the same aggregate and the former corpus re-scan + per-id
    # join-back is gone.  count('_hit') skips the left join's nulls, so
    # the integer equals the former inner join's count(*); the partial
    # aggregate still collapses each partition to one row per doc
    # before the only shuffle.
    hits = (
        corpus_shingles.join(F.broadcast(bench_shingles), "shingle", "left")
        .groupBy(id_col)
        .agg(F.count("_hit").alias("n_contaminated_shingles"))
    )
    return hits.select(
        id_col,
        F.col("n_contaminated_shingles").cast("bigint").alias(
            "n_contaminated_shingles"
        ),
        (F.col("n_contaminated_shingles") > 0).alias("contaminated"),
    )
