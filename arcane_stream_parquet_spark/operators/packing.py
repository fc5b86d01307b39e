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


#: default pack-stream count for :func:`first_fit_packing` — the
#: parallelism dial: FFD is sequential per stream, so streams bound
#: both the parallel width and each task's O(bins) state.
FFD_STREAMS = 64

#: bins per stream namespace for the global ``bin_id``.
_FFD_BIN_SPACE = 1 << 40


def first_fit_packing(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    length_col: str | None = None,
    num_streams: int = FFD_STREAMS,
) -> DataFrame:
    """Pack WHOLE documents into fixed token-budget bins without
    splitting — first-fit-decreasing (FFD), the complement of
    :func:`sequence_packing` (which concatenates and cuts): SFT /
    instruction-tuning loaders must keep samples intact, so packing
    quality is bins wasted, not windows spanned.

    Semantics (deterministic, partitioning-independent):

    - Documents shard into ``num_streams`` independent pack streams by
      the portable content hash (:func:`.sampling.hash_bucket_expr`'s
      sha256 idiom — stable across runs, engines and cluster sizes).
    - Within a stream, FFD: sort by (token count DESC, id ASC), place
      each document in the FIRST bin (creation order) whose remaining
      budget fits it, else open a new bin. The classic 11/9·OPT + 6/9
      guarantee applies per stream.
    - A document LONGER than the budget gets its own bin with
      ``overflow = true`` (the caller's truncate/split decision, not
      this operator's).

    Returns one row per document: ``(id_col, n_tokens, stream,
    bin_in_stream, bin_id, bin_fill, overflow)`` — ``bin_id`` globally
    unique (stream-namespaced), ``bin_fill`` the bin's FINAL token
    total (audit: waste per bin = budget - bin_fill).

    Scale shape (100 TB): one shuffle on the stream key, then
    ``applyInPandas`` per stream with O(bins-per-stream) state — FFD
    is inherently sequential, so the stream count is the explicit
    parallelism/packing-quality dial (more streams = more parallel,
    marginally more waste at the stream tails). Raise ``num_streams``
    so each stream's documents fit one task comfortably.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive: {budget}")
    if num_streams < 1:
        raise ValueError(f"num_streams must be >= 1: {num_streams}")
    n_tokens = (
        F.size(tokens_column(text_col))
        if length_col is None
        else F.col(length_col)
    ).cast("bigint")
    # the sampling.py portable hash, modded by the stream count
    # directly (not through HASH_BUCKETS — a double mod would skew
    # streams whenever 10000 % num_streams != 0)
    h = F.sha2(F.concat(F.lit("ffd|"), F.col(id_col).cast("string")), 256)
    stream = F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint"),
        F.lit(num_streams),
    )
    base = df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        stream.cast("int").alias("stream"),
    )

    schema = (
        f"{id_col} bigint, n_tokens bigint, stream int, "
        "bin_in_stream bigint, bin_id bigint, bin_fill bigint, "
        "overflow boolean"
    )

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(
            ["n_tokens", id_col], ascending=[False, True]
        ).reset_index(drop=True)
        fills: list[int] = []
        bins: list[int] = []
        overflow: list[bool] = []
        for nt in pdf["n_tokens"]:
            nt = int(nt)
            if nt > budget:
                bins.append(-1)  # placeholder: own bin, numbered below
                overflow.append(True)
                continue
            placed = False
            for bi, fill in enumerate(fills):
                if fill + nt <= budget:
                    fills[bi] = fill + nt
                    bins.append(bi)
                    placed = True
                    break
            if not placed:
                fills.append(nt)
                bins.append(len(fills) - 1)
            overflow.append(False)
        next_bin = len(fills)
        fill_of = dict(enumerate(fills))
        for i, is_over in enumerate(overflow):
            if is_over:
                bins[i] = next_bin
                fill_of[next_bin] = int(pdf["n_tokens"].iloc[i])
                next_bin += 1
        stream = int(pdf["stream"].iloc[0]) if len(pdf) else 0
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "n_tokens": pdf["n_tokens"],
                "stream": pdf["stream"],
                "bin_in_stream": bins,
                "bin_id": [stream * _FFD_BIN_SPACE + b for b in bins],
                "bin_fill": [fill_of[b] for b in bins],
                "overflow": overflow,
            }
        )

    return base.groupBy("stream").applyInPandas(pack, schema=schema)


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """One-row audit of a :func:`first_fit_packing` result: bin count,
    packed-token total, mean fill fraction and waste fraction over
    NON-overflow bins, plus the overflow document count — the number a
    pipeline watches when tuning ``budget``/``num_streams``."""
    bins = (
        packed.groupBy("bin_id")
        .agg(
            F.first("bin_fill").alias("fill"),
            F.max(F.col("overflow").cast("int")).alias("over"),
        )
    )
    return bins.agg(
        F.count("*").alias("n_bins"),
        F.sum(F.when(F.col("over") == 0, 1).otherwise(0)).alias(
            "n_packed_bins"
        ),
        F.sum("fill").alias("packed_tokens"),
        (
            F.sum(F.when(F.col("over") == 0, F.col("fill")).otherwise(0))
            / (
                F.sum(F.when(F.col("over") == 0, 1).otherwise(0))
                * F.lit(float(budget))
            )
        ).alias("mean_fill_frac"),
        F.sum(F.col("over")).cast("bigint").alias("n_overflow_docs"),
    )
