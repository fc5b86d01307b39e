"""Document chunking — fixed-token windows with overlap, the
retrieval/embedding-pipeline splitter (RAG chunking, long-document
embedding prep, context-window packing input).

Beyond-reference operator (the reference has no text processing at
all; its compute lives in an engine-side MERGE —
/root/reference/src/main/scala/main.scala:121-125); part of the
LLM-data-pipeline family the task brief demands alongside dedup,
quality scoring, and packing (:mod:`.packing` packs whole short
documents into training rows; this operator splits long documents
into bounded retrieval units — the two directions of the same
token-budget problem).

Semantics (engine-deterministic, DuckDB-replayable):

- Tokens are the whitespace tokens of the trimmed ORIGINAL text
  (case preserved — chunk text is payload, not a statistic; empties
  dropped). Chunk text re-joins its tokens with a single space, so
  intra-document whitespace runs normalize — documented, and exactly
  reproducible in SQL.
- Chunk *i* starts at token offset ``i * stride`` where
  ``stride = chunk_tokens - overlap_tokens`` and covers up to
  ``chunk_tokens`` tokens. Starts advance while the previous chunk
  did NOT already reach the end of the document:
  ``n_chunks = 1`` if ``n <= chunk_tokens`` else
  ``1 + ceil((n - chunk_tokens) / stride)`` (integer arithmetic).
  Every token is covered by >= 1 chunk; consecutive chunks share
  exactly ``overlap_tokens`` tokens except the final chunk, which is
  never empty and never starts past a fully-covered position.
- A document whose text has no tokens produces ZERO chunk rows (there
  is nothing to embed; callers wanting presence do a left join back).

Scale shape (100 TB): entirely row-local — split, a small integer
projection, ``explode`` of an index sequence, and an
``F.slice``/``array_join`` rebuild, all inside whole-stage codegen.
No shuffle, no UDF, no state; output size is input tokens x
(1 + overlap/stride). The plan pin in tests/test_chunking.py asserts
the no-Exchange shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import TOKEN_SPLIT_RE


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap_tokens: int = 16,
) -> DataFrame:
    """Split each document into overlapping fixed-token chunks.

    Returns one row per chunk:
    ``(id_col, chunk_index, n_chunks, token_start, chunk_n_tokens,
    chunk_text)`` — ``chunk_index`` 0-based, ``token_start`` the
    0-based token offset of the chunk's first token.
    """
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError("overlap_tokens must satisfy 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap_tokens

    toks = F.filter(
        F.split(F.trim(F.col(text_col)), TOKEN_SPLIT_RE),
        lambda t: t != F.lit(""),
    )
    staged = df.select(
        F.col(id_col), toks.alias("__toks"), F.size(toks).cast("bigint").alias("__n")
    ).filter(F.col("__n") > 0)

    # Integer chunk count: 1 + ceil((n - chunk) / stride) via the
    # (x + stride - 1) floor-div identity. The double division under
    # floor() is exact (operands < 2^53), so the count is bit-identical
    # to the SQL oracle's integer `//`.
    n_chunks = F.when(F.col("__n") <= F.lit(chunk_tokens), F.lit(1).cast("bigint")).otherwise(
        F.lit(1)
        + F.floor(
            (F.col("__n") - F.lit(chunk_tokens) + F.lit(stride - 1)) / F.lit(stride)
        )
    )

    exploded = staged.withColumn("__m", n_chunks).select(
        F.col(id_col),
        F.col("__toks"),
        F.col("__n"),
        F.col("__m"),
        F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("__m") - 1)).alias(
            "__i"
        ),
    )
    start = F.col("__i") * F.lit(stride)
    # F.slice's start is 1-based; length past the end is clamped by slice.
    piece = F.slice(F.col("__toks"), start + 1, F.lit(chunk_tokens))
    return exploded.select(
        F.col(id_col),
        F.col("__i").cast("bigint").alias("chunk_index"),
        F.col("__m").cast("bigint").alias("n_chunks"),
        start.cast("bigint").alias("token_start"),
        F.size(piece).cast("bigint").alias("chunk_n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )
