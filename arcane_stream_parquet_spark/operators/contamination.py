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
    )
    corpus_shingles = corpus.select(
        F.col(id_col), F.explode(shingles_column(text_col, k)).alias("shingle")
    )
    hits = (
        corpus_shingles.join(F.broadcast(bench_shingles), "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated_shingles"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_contaminated_shingles", F.lit(0))
            .cast("bigint")
            .alias("n_contaminated_shingles"),
            (F.coalesce("n_contaminated_shingles", F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )
