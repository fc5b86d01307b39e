"""SimHash near-duplicate fingerprinting — the bit-signature
counterpart to MinHash (operators/minhash.py): one B-bit signature per
document; near-duplicates differ in few bits (small Hamming distance).

Plan shape (scale-first):
1. signature: explode tokens → groupBy(doc) summing per-bit votes —
   ONE hash shuffle on doc_id with map-side partial aggregation (the
   token stream never leaves its scan partition un-aggregated).
2. banding: split the B-bit signature into C chunks; docs sharing any
   exact chunk are candidates (Hamming ≤ d pigeonholes into C = d+1
   chunks) — equi-join on (chunk_id, chunk_value), never all-pairs.
3. verify: exact Hamming distance on the candidate pairs only.

Cross-engine determinism: a token's bit b is bit (b mod 4) of hex digit
floor(b/4) of sha256(token) — derived from the hex string so Spark and
DuckDB (oracle) agree bit-for-bit; votes are +1/-1 integer sums.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from arcane_stream_parquet_spark.operators.text import tokens_column

SIMHASH_BITS = 64
SIMHASH_CHUNKS = 4  # 16-bit chunks; pigeonhole: complete for Hamming <= 3

_HEX = "0123456789abcdef"


def _hex_digit_value(hex_col: Column, pos: int) -> Column:
    """Value 0..15 of 1-based hex digit ``pos`` (conv is Spark-side;
    the oracle uses strpos('0123..f', d)-1 — same result)."""
    return F.conv(F.substring(hex_col, pos, 1), 16, 10).cast("int")


def token_bit_vote(token_hash: Column, bit: int) -> Column:
    """+1 / -1 vote of a token for signature bit ``bit`` (0-based)."""
    digit = _hex_digit_value(token_hash, bit // 4 + 1)
    bit_val = F.shiftright(digit, bit % 4).bitwiseAND(F.lit(1))
    return (bit_val * 2 - 1).cast("bigint")


def _vote_sums(
    df: DataFrame, text_col: str, id_col: str, bits: int
) -> DataFrame:
    """(id, __s0..__s{bits-1}) per-bit vote sums — the shared core of
    the string and integer signature forms."""
    from arcane_stream_parquet_spark.functions.partitioning import fan_out

    df = fan_out(df)  # per-token hashing is CPU-bound (see partitioning.py)
    toks = df.select(F.col(id_col), F.explode(tokens_column(text_col)).alias("__tok"))
    # hash each token instance ONCE into a real column: the digest is
    # referenced by all `bits` vote expressions, and subexpression
    # elimination does not reliably cover a composite referenced across
    # that many projection outputs (bits× sha256 per token otherwise)
    hashed = toks.withColumn("__h", F.sha2(F.col("__tok"), 256))
    h = F.col("__h")
    votes = hashed.select(
        id_col, *[token_bit_vote(h, b).alias(f"__v{b}") for b in range(bits)]
    )
    return votes.groupBy(id_col).agg(
        *[F.sum(f"__v{b}").alias(f"__s{b}") for b in range(bits)]
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """(id, simhash) where simhash is the bit string (e.g. '0110…',
    length ``bits``); frequency-weighted (duplicate tokens vote again).

    Documents with zero tokens are dropped (no signature definable).
    """
    sums = _vote_sums(df, text_col, id_col, bits)
    bit_chars = [
        F.when(F.col(f"__s{b}") > 0, F.lit("1")).otherwise(F.lit("0"))
        for b in range(bits)
    ]
    return sums.select(F.col(id_col), F.concat(*bit_chars).alias("simhash"))


def simhash_parts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
    chunks: int = SIMHASH_CHUNKS,
) -> DataFrame:
    """(id, part_0..part_{C-1}) — the signature as C integer chunk
    values (bit j of chunk c = signature bit c·w+j): integers shuffle
    smaller than bit strings and Hamming becomes bit_count(xor), one
    instruction per chunk instead of w string comparisons."""
    if bits % chunks:
        raise ValueError("bits must divide evenly into chunks")
    w = bits // chunks
    sums = _vote_sums(df, text_col, id_col, bits)
    parts = []
    for c in range(chunks):
        val = F.lit(0).cast("bigint")
        for j in range(w):
            bit = F.when(F.col(f"__s{c * w + j}") > 0, 1).otherwise(0)
            val = val + (bit.cast("bigint") * F.lit(1 << j))
        parts.append(val.alias(f"part_{c}"))
    return sums.select(F.col(id_col), *parts)


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
    chunks: int = SIMHASH_CHUNKS,
    max_hamming: int = SIMHASH_CHUNKS - 1,
) -> DataFrame:
    """(id_a, id_b, hamming) for candidate pairs sharing a chunk, with
    exact Hamming ≤ max_hamming. Complete for max_hamming ≤ chunks-1
    (pigeonhole); candidates come from an equi-join, never all-pairs.

    Plan: integer chunk signature (simhash_parts) → explode C chunk
    rows → groupBy the (chunk_id, value) bucket carrying the compact
    (id, part_0..C) struct → explode pairs inside the bucket → Hamming
    as Σ bit_count(xor(part)) — the signature pipeline runs ONCE, no
    self-join, and the verify is C integer ops per pair."""
    parts = simhash_parts(df, text_col, id_col, bits, chunks)
    member = F.struct(
        F.col(id_col).alias("id"), *[F.col(f"part_{c}") for c in range(chunks)]
    )
    chunk_rows = parts.select(
        member.alias("m"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_id"),
                        F.col(f"part_{c}").alias("chunk_value"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("ck"),
    ).select("m", "ck.chunk_id", "ck.chunk_value")
    buckets = (
        chunk_rows.groupBy("chunk_id", "chunk_value")
        .agg(F.array_sort(F.collect_set("m")).alias("ms"))
        .filter(F.size("ms") > 1)
    )
    n = F.size(F.col("ms"))
    pair_structs = F.flatten(
        F.transform(
            F.col("ms"),
            lambda x, i: F.transform(
                F.slice(F.col("ms"), i + F.lit(2), n),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    pairs = (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.a", "p.b")
        .distinct()
    )
    ham = F.lit(0).cast("bigint")
    for c in range(chunks):
        ham = ham + F.bit_count(
            F.col(f"a.part_{c}").bitwiseXOR(F.col(f"b.part_{c}"))
        ).cast("bigint")
    return (
        pairs.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= F.lit(max_hamming))
    )
