"""Sequence packing for training-data pipelines (beyond-reference LLM
facet, r8): map each document onto the fixed-size token windows a
concat-and-chunk pretraining loader would draw.

The strategy is the one production loaders actually use (GPT-style
"concatenate the token stream, cut every ``window`` tokens"): within
each pack stream (``part_col`` — one stream per source shard), order
documents deterministically, take the running token offset, and derive
which context windows each document lands in.  Unlike first-fit bin
packing this is a pure prefix-sum — expressible as one partitioned
window aggregation, no stateful carry — so it is exactly as scalable
as any windowed aggregate: one shuffle on ``part_col``, sort within
partition, and at 100 TB the streams pack in parallel (a pack stream
per input shard is also what keeps loader seek locality).

Reference scope note: the reference engine (a parquet→table MERGE
stream, SURVEY.md §2) has no packing operator; this composes its
``documents`` output toward the training loader, same as the dedup /
quality facets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from arcane_stream_parquet_spark.operators.text import tokens_column

#: Default context-window size in tokens (a typical pretraining block).
PACK_WINDOW = 2048


def sequence_packing(
    df: DataFrame,
    id_col: str = "doc_id",
    part_col: str = "source",
    text_col: str = "text",
    window: int = PACK_WINDOW,
) -> DataFrame:
    """Per document: token count, running start/end offset within its
    pack stream, the first context window it lands in, and how many
    windows it spans (0 for empty documents).  Deterministic given the
    (``part_col``, ``id_col``) order."""
    n_tokens = F.size(tokens_column(text_col)).cast("bigint")
    w = (
        Window.partitionBy(part_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_n = df.select(part_col, id_col, n_tokens.alias("n_tokens"))
    end = F.sum("n_tokens").over(w)
    start = (end - F.col("n_tokens")).alias("start_offset")

    def win_of(col):
        # pure integer arithmetic (r8 ADVICE): double division is exact
        # on the OPERANDS below 2^53 but the QUOTIENT can round up
        # across the floor boundary for non-power-of-two windows; the
        # subtract-modulo form never leaves the integers
        c = col.cast("bigint")
        return ((c - c % F.lit(window)) / F.lit(window)).cast("bigint")

    return with_n.select(
        part_col,
        id_col,
        "n_tokens",
        start.cast("bigint").alias("start_offset"),
        end.cast("bigint").alias("end_offset"),
        win_of(end - F.col("n_tokens")).alias("first_window"),
        F.when(F.col("n_tokens") == 0, F.lit(0).cast("bigint"))
        .otherwise(
            win_of(end - 1) - win_of(end - F.col("n_tokens")) + 1
        )
        .alias("windows_spanned"),
    )
