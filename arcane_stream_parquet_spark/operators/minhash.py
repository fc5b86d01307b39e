"""MinHash + LSH near-duplicate detection — the canonical web-scale
fuzzy-dedup pipeline (shingle → minhash signature → band-bucket →
candidate pairs → exact Jaccard verify), as pure DataFrame ops.

Scale posture (the whole point): there is NO all-pairs stage anywhere.
- Shingling + signatures: narrow per-row projections (codegen, no
  shuffle, no Python).
- Banding: explode to B rows per doc (B = num_bands, small constant).
- Candidate generation: self-equi-join on (band_id, band_key) — Spark
  plans a hash shuffle on the band key; only docs sharing a bucket ever
  meet. At 100 TB the shuffle carries (band_key, doc_id) pairs only.
- Verification: the candidate-pair set (≪ n²) joins back to the shingle
  sets for exact Jaccard.
A pathological bucket (thousands of identical docs) produces a skewed
join key — AQE skew-join splitting (on by default, session.py) handles
it; the band key is a sha256 so benign data cannot skew.

Cross-engine determinism: a minhash here is the MIN of sha256 hex
strings over the shingle set under a per-function seed prefix —
lexicographic string min, bit-identical in Spark and DuckDB (the oracle
SQL in plans/llm_queries.py is generated from these same constants).
Hex-string min is order-isomorphic to the usual integer minhash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from arcane_stream_parquet_spark.operators.text import tokens_column

# Default signature geometry: 8 hash functions = 4 bands × 2 rows.
# Collision prob at Jaccard j: 1-(1-j^2)^4 (~50% at j≈0.42). Tunable.
NUM_HASHES = 8
NUM_BANDS = 4
SHINGLE_K = 3


def char_shingles_from_norm(norm: Column, k: int = 5) -> Column:
    """Distinct k-char shingles over an ALREADY-normalized text column.
    ``norm`` must be a plain column reference (hoisted via withColumn):
    a composite expression here is re-evaluated once per gram inside the
    transform lambda — O(len²) per doc, measured 1.7× on the whole
    shingle stage at sf0.1."""
    n = F.length(norm)
    upper = F.greatest(n - F.lit(k - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), upper), lambda i: norm.substr(i, F.lit(k))
    )
    return F.array_distinct(grams)


def char_shingles_column(text_col: str | Column, k: int = 5) -> Column:
    """Distinct k-character shingles of the normalized (lowercased,
    trimmed) text — the character-n-gram flavor of the shingle set
    (robust to word-boundary edits where word shingles are not).
    Documents shorter than k chars yield themselves as one shingle.
    Prefer hoisting the normalization and calling
    :func:`char_shingles_from_norm` in hot paths (see its docstring)."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return char_shingles_from_norm(F.lower(F.trim(col)), k)


def shingles_from_tokens(toks: Column, k: int = SHINGLE_K) -> Column:
    """Distinct k-word shingles over an ALREADY-tokenized array column.
    Like :func:`char_shingles_from_norm`, ``toks`` should be a plain
    column reference — the lambda indexes it k times per shingle."""
    n = F.size(toks)
    # positions 1..n-k+1; degenerate short docs → 1 shingle. F.get is
    # 0-based and NULL out-of-bounds (ANSI-safe, matching DuckDB's
    # 1-based list index); concat_ws skips NULLs in both engines.
    upper = F.greatest(n - F.lit(k - 1), F.lit(1))
    idx = F.sequence(F.lit(1), upper)
    joined = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.get(toks, (i + F.lit(j - 1)).cast("int")) for j in range(k)]
        ),
    )
    return F.array_distinct(joined)


def shingles_column(text_col: str | Column, k: int = SHINGLE_K) -> Column:
    """Distinct k-word shingles (space-joined) of the tokenized text.
    Documents shorter than k tokens yield their whole token sequence as
    one shingle (so they still participate)."""
    return shingles_from_tokens(tokens_column(text_col), k)


def minhash_expr(hashed_col: Column, seed: int) -> Column:
    """One minhash value: min over shingle digests of the seed's 8-hex-
    char slice. The H "hash functions" are disjoint 32-bit slices of ONE
    sha256 per shingle — sha256 bits are independent, so the slices are
    independent uniform hashes, at 1/H the hashing cost."""
    return F.array_min(
        F.transform(hashed_col, lambda h: F.substring(h, seed * 8 + 1, 8))
    )


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = NUM_HASHES,
    k: int = SHINGLE_K,
    unit: str = "word",
) -> DataFrame:
    """Adds ``mh_0 .. mh_{H-1}`` hex-string minhash columns (+ keeps a
    ``__shingles`` array for downstream exact verification). Each
    shingle is sha256'd ONCE; the H minhashes slice that digest."""
    if num_hashes > 8:
        raise ValueError("num_hashes > 8 would overrun the 64-hex sha256 digest")
    from arcane_stream_parquet_spark.functions.partitioning import fan_out

    if unit not in ("word", "char"):
        raise ValueError(f"unit must be word|char, got {unit!r}")
    df = fan_out(df)  # hashing is CPU-bound: never serialize on 1 scan split
    # hoist tokenization/normalization into real columns BEFORE the
    # shingle lambdas reference them (see char_shingles_from_norm: a
    # composite expression re-evaluates per gram)
    if unit == "word":
        staged = df.withColumn("__toks", tokens_column(text_col))
        sh = shingles_from_tokens(F.col("__toks"), k)
    else:
        col = F.col(text_col)
        staged = df.withColumn("__norm", F.lower(F.trim(col)))
        sh = char_shingles_from_norm(F.col("__norm"), k)
    staged = (
        staged.withColumn("__shingles", sh)
        .drop("__toks", "__norm")
        .withColumn(
            "__sh_hashes", F.transform(F.col("__shingles"), lambda s: F.sha2(s, 256))
        )
    )
    return staged.select(
        "*",
        *[
            minhash_expr(F.col("__sh_hashes"), seed).alias(f"mh_{seed}")
            for seed in range(num_hashes)
        ],
    ).drop("__sh_hashes")


def lsh_bands(
    sig: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
) -> DataFrame:
    """Explode a signature into (id, band_id, band_key) rows; band_key =
    sha256 of the band's concatenated minhashes. rows_per_band =
    num_hashes / num_bands."""
    if num_hashes % num_bands:
        raise ValueError("num_hashes must divide evenly into num_bands")
    rows = num_hashes // num_bands
    bands = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.sha2(
                F.concat_ws("|", *[F.col(f"mh_{b * rows + r}") for r in range(rows)]),
                256,
            ).alias("band_key"),
        )
        for b in range(num_bands)
    ]
    return sig.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("band")
    ).select(id_col, "band.band_id", "band.band_key")


def candidate_pairs(bands: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing ≥1 band bucket.

    ONE shuffle: groupBy the bucket → sorted member set → explode pairs
    within the bucket (quadratic only inside a bucket, whose size LSH
    keeps small; a pathological giant bucket is a data-quality signal,
    not a plan hazard — the explode is lazy per row). This beats the
    bands⋈bands self-join, which scans and shuffles the upstream
    signature pipeline twice."""
    grouped = (
        bands.groupBy("band_id", "band_key")
        .agg(F.sort_array(F.collect_set(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    n = F.size(F.col("ids"))
    pair_structs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + F.lit(2), n),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        grouped.select(F.explode(pair_structs).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
    k: int = SHINGLE_K,
    min_jaccard: float = 0.5,
    unit: str = "word",
) -> DataFrame:
    """Full pipeline: LSH candidates verified by exact Jaccard over the
    shingle sets. Returns (id_a, id_b, jaccard) with jaccard ≥ threshold.
    jaccard is the raw IEEE division (small-int / small-int — correctly
    rounded, so bit-identical in any engine; consumers needing a stable
    textual form floor to micro-units, see plans/llm_queries.py).

    Cost at scale: 2 narrow scans + 1 band-key shuffle (candidates) +
    1 id-join back to shingle sets. Shingle arrays travel only for
    candidate rows.
    """
    sig = minhash_signature(df, text_col, num_hashes, k, unit=unit)
    sets_df = sig.select(
        F.col(id_col), F.col("__shingles").alias("sh")
    )
    pairs = candidate_pairs(
        lsh_bands(sig, id_col, num_hashes, num_bands), id_col
    )
    joined = (
        pairs.join(
            sets_df.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")),
            "id_a",
        )
        .join(
            sets_df.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")),
            "id_b",
        )
    )
    # |A∪B| = |A| + |B| − |A∩B| for the (distinct) shingle sets — one
    # O(n) array op per candidate instead of two; the integer (and
    # therefore the IEEE quotient) is identical to array_union's size,
    # so oracles are unaffected
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jacc = inter.cast("double") / union.cast("double")
    return (
        joined.select("id_a", "id_b", jacc.alias("jaccard"))
        .filter(F.col("jaccard") >= F.lit(min_jaccard))
    )
