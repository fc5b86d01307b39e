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
    from arcane_stream_parquet_spark.operators.text import tokens_column

    corpus = fan_out(corpus)  # shingling is CPU-bound (see partitioning.py)
    bench_shingles = (
        benchmark.select(
            F.explode(shingles_column(text_col, k)).alias("shingle")
        )
        .distinct()
        .withColumn("_hit", F.lit(True))
    )
    # r16 (guide §4.1): positions explode FIRST and each shingle
    # materializes as a codegen projection on the exploded row — the
    # former row-local transform()+array_distinct() lambda ran
    # INTERPRETED per shingle (the duplicate_spans/DSIR window-stream
    # lesson; measured 0.82 → 0.13 s for the corpus shingle stream at
    # sf0.1).  The shingle expression mirrors shingles_from_tokens
    # byte-for-byte: k F.get probes (0-based, NULL out-of-bounds) under
    # concat_ws, which skips NULLs — so short docs still fold their
    # whole token sequence into one shingle row.
    toks = corpus.select(F.col(id_col), tokens_column(text_col).alias("_tk"))
    n = F.size("_tk")
    upper = F.greatest(n - F.lit(k - 1), F.lit(1))
    pos = F.explode(F.sequence(F.lit(1), upper)).alias("_pos")
    shingle = F.concat_ws(
        " ",
        *[
            F.get(F.col("_tk"), (F.col("_pos") + F.lit(j - 1)).cast("int"))
            for j in range(k)
        ],
    )
    corpus_shingles = toks.select(F.col(id_col), F.col("_tk"), pos).select(
        F.col(id_col), shingle.alias("shingle")
    )
    # r16 (guide §2.4): LEFT-join the broadcast set so zero-hit docs
    # ride the same aggregate (every document yields >= 1 shingle row).
    # The stream is now a MULTISET (explode-first skips the row-local
    # distinct), so the count is COUNT(DISTINCT hit shingle) — the same
    # set cardinality the former distinct-array count produced.  The
    # distinct aggregate's partial stage dedups map-side: the exchange
    # carries one (id, NULL) row per doc per partition for the misses
    # plus the distinct HIT pairs — O(docs + hits), and hits are
    # bounded by the benchmark's shingle set, small by definition.
    hits = (
        corpus_shingles.join(F.broadcast(bench_shingles), "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count_distinct(
                F.when(F.col("_hit"), F.col("shingle"))
            ).alias("n_contaminated_shingles")
        )
    )
    return hits.select(
        id_col,
        F.col("n_contaminated_shingles").cast("bigint").alias(
            "n_contaminated_shingles"
        ),
        (F.col("n_contaminated_shingles") > 0).alias("contaminated"),
    )
