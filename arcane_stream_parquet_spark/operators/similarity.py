"""Embedding similarity search — brute-force cosine top-k (the exact
baseline) and random-hyperplane LSH ANN (the scale path), over an
``array<float>`` embedding column.

Beyond-reference operators (the reference has no vector processing);
part of the LLM-data-pipeline family the task brief demands.

Scale shapes:
- ``cosine_topk``: query set ⨯ corpus with the QUERY SIDE broadcast —
  a map-side loop over a few vectors per corpus row, no shuffle of the
  corpus, one window for top-k grouped by query. Exact; O(n·|Q|) — the
  right baseline when |Q| is small.
- ``ann_lsh_topk``: sign-of-dot-product buckets over P fixed random
  hyperplanes (2^P buckets); query and corpus rows meet through an
  equi-join on the bucket string — candidates only, never all-pairs.
  Recall is tunable by P and by probing neighboring buckets; this
  implements exact-bucket probing (the standard first rung).

Determinism: hyperplanes are pseudo-random constants derived from
sha256 of (plane, dim) — no RNG state; byte-identical in every run and
embeddable as literals into the DuckDB oracle SQL. All dot products run
left-to-right over the array, so Spark and DuckDB produce bit-identical
doubles; similarities stay raw doubles; oracle-facing queries floor
them to micro-units (round() tie-breaking differs between engines).
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMBEDDING_DIM = 64
NUM_PLANES = 8


def plane_component(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    sha256('plane|dim') → first 8 hex chars → uniform scale."""
    h = hashlib.sha256(f"{plane}|{dim}".encode()).hexdigest()[:8]
    return round(int(h, 16) / 2**31 - 1.0, 6)


def random_planes(num_planes: int = NUM_PLANES, dim: int = EMBEDDING_DIM) -> list[list[float]]:
    return [[plane_component(p, d) for d in range(dim)] for p in range(num_planes)]


def as_double_array(vec_col: str | Column) -> Column:
    col = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(col, lambda x: x.cast("double"))


def dot_expr(a: Column, b: Column, dim: int | None = None) -> Column:
    """Sequential left-to-right dot product (order fixed → deterministic
    float result, matching DuckDB's list_dot_product accumulation).

    ``dim`` (r16): when the arrays' common length is statically known,
    the fold is unrolled into the left-associated codegen chain
    ``((0.0 + a[0]*b[0]) + a[1]*b[1]) + ...`` — the SAME additions in
    the SAME order, so the IEEE result is bit-identical to the fold
    (pinned in tests/test_unrolled_exprs.py).  Why it matters:
    ``aggregate``/``zip_with`` are higher-order functions, which are
    CodegenFallback — interpreted once per ELEMENT with lambda-variable
    binding — while the unrolled chain runs inside whole-stage codegen.
    On pair-heavy consumers (SemDeDup's within-cell self-join, the ANN
    candidate scoring) this is the dominant per-task cost (guide §1.2:
    fix per-task work after the shape is right).  Contract: pass
    ``dim`` only when BOTH arrays are exactly that long (shorter
    arrays: both forms yield NULL via null propagation; longer arrays
    would be silently truncated by the unrolled form only)."""
    if dim is not None:
        total = F.lit(0.0)
        for i in range(dim):
            total = total + F.get(a, i) * F.get(b, i)
        return total
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_expr(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot_expr(a, b, dim) / (
        F.sqrt(dot_expr(a, a, dim)) * F.sqrt(dot_expr(b, b, dim))
    )


def norm_expr(v: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot_expr(v, v, dim))


def cosine_with_norms(
    a: Column, b: Column, na: Column, nb: Column, dim: int | None = None
) -> Column:
    """cosine given precomputed norms: each vector's sqrt(v·v) is
    evaluated ONCE per row instead of once per pair — the VALUES
    multiplied/divided are identical to cosine_expr, so results stay
    bit-for-bit equal to the per-pair form (and to the oracle)."""
    return dot_expr(a, b, dim) / (na * nb)


#: Unrolling pays only while the generated method stays JIT-compilable:
#: measured on this JVM (pair join, best-of-3 noop, r16) the unrolled
#: chain runs 0.53/0.32/0.18/0.25 s at dim 4/8/16/32 vs a flat ~0.5-0.6 s
#: for the interpreted fold — but 2.82 s at dim 64 (≈5x WORSE: one
#: giant consume() method blows past HotSpot's huge-method threshold
#: and runs bytecode-interpreted; Spark cannot split a single
#: expression tree across methods).  Above this bound callers fall
#: back to the fold, whose per-element cost is a tight JVM loop.
UNROLL_MAX_DIM = 32


def unrollable(dim: int | None) -> int | None:
    """``dim`` when unrolling is profitable (<= UNROLL_MAX_DIM), else
    None (use the fold)."""
    return dim if dim is not None and dim <= UNROLL_MAX_DIM else None


def _centroid_dim(centroids: Sequence[tuple[int, Sequence[float]]]) -> int | None:
    """Static vector length from a plain-data centroid list — the
    unroll dial for every consumer that scores against centroids (the
    corpus is the same dimensionality by construction); gated by
    :func:`unrollable`."""
    return unrollable(len(centroids[0][1])) if centroids else None


def plane_dot_expr(vec: Column, plane: Sequence[float]) -> Column:
    """Dot of a vector column with a constant plane — unrolled to a
    plain arithmetic chain (no array literal), fully codegen'd."""
    total = F.element_at(vec, 1) * F.lit(plane[0])
    for i, w in enumerate(plane[1:], start=2):
        total = total + F.element_at(vec, i) * F.lit(w)
    return total


def lsh_bucket_expr(vec: Column, planes: Sequence[Sequence[float]]) -> Column:
    """Bit-string bucket id: one sign bit per hyperplane.

    This is the SEMANTIC REFERENCE form (and the ``backend="sql"``
    path): at production plane geometry (8 planes × dim 64) the single
    512-term projection method blows past HotSpot's JIT size limit and
    runs bytecode-interpreted — measured 3.5 s/1M rows on 32 cores vs
    0.8 s for the vectorized Arrow twin below (r16, guide §4.2), so
    scale callers should prefer ``backend="arrow"``."""
    bits = [
        F.when(plane_dot_expr(vec, p) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for p in planes
    ]
    return F.concat(*bits)


def _lsh_bucket_pandas_udf(planes: Sequence[Sequence[float]]):
    """pandas_udf twin of :func:`lsh_bucket_expr` — bit-identical
    buckets, vectorized across the batch (r16, guide §4.2: the 8×64
    unrolled chains are one giant consume() method that HotSpot refuses
    to JIT; measured 3.5 → 0.8 s/1M rows).

    Bit-identity argument: per plane the dot accumulates LEFT-TO-RIGHT
    one dimension at a time across the row block (numpy elementwise ops
    never fuse or reassociate), reproducing plane_dot_expr's
    left-associated chain exactly; bit s is "1" iff the dot >= 0 OR is
    NaN (Spark's comparison semantics treat NaN as larger than any
    value), a NULL vector yields the all-"0" bucket (every WHEN falls
    to its otherwise), and a vector LONGER than the plane reads its
    first dim elements (element_at never probes past dim).  A vector
    SHORTER than the plane raises — the SQL form's ANSI element_at
    would equally fail the job.  NaN/NULL ELEMENTS inside a vector
    RAISE (r17 ADVICE): Arrow hands null elements to numpy as NaN —
    erasing the null-vs-NaN distinction the SQL form depends on (null
    propagates to "0" bits, NaN compares greatest → "1") — so letting
    them through would silently lose recall on one side of the bucket
    equi-join.  Fail loudly like the assignment udf;
    ``nan_policy="sql"`` on :func:`with_lsh_bucket` routes such rows
    through the expression form (which CAN tell them apart) instead."""
    import pandas as pd  # noqa: F401

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    P = [tuple(float(w) for w in p) for p in planes]

    @pandas_udf(StringType())
    def bucket(v):
        import numpy as np
        import pandas as pd

        W = np.asarray(P, dtype=np.float64)
        nplanes, dim = W.shape
        cells = v.tolist()
        nr = len(cells)
        if nr == 0:
            return pd.Series([], dtype=object)
        null_mask = np.fromiter((c is None for c in cells), bool, count=nr)
        lens = np.fromiter(
            (0 if c is None else len(c) for c in cells), np.int64, count=nr
        )
        if ((~null_mask) & (lens < dim)).any():
            raise ValueError(
                f"lsh bucket: vector shorter than plane dim {dim}"
            )
        out: list = [None] * nr
        zero = "0" * nplanes
        idx = np.nonzero(~null_mask)[0]
        if idx.size:
            if idx.size == nr and (lens == dim).all():
                vs = np.stack(cells).astype(np.float64, copy=False)
            else:
                vs = np.empty((idx.size, dim), np.float64)
                for i, j in enumerate(idx):
                    c = cells[j]
                    vs[i, :] = np.asarray(c[:dim], np.float64)
            # NULL elements arrive as NaN (Arrow→pandas erases the
            # distinction), and SQL null-propagates them to "0" bits
            # where a true NaN flips to "1" — the udf cannot tell the
            # two apart, so any NaN component raises rather than
            # silently diverging on the bucket equi-join (r17 ADVICE;
            # same fail-loud discipline as the assignment udf).
            if np.isnan(vs[:, :dim]).any():
                raise ValueError(
                    "lsh bucket: NaN/NULL element inside a vector — "
                    "the arrow backend cannot reproduce SQL's "
                    "null-propagated bits (Arrow erases null-vs-NaN); "
                    "use backend='sql' or nan_policy='sql'"
                )
            bits = np.empty((idx.size, nplanes), dtype=bool)
            for s in range(nplanes):
                acc = vs[:, 0] * W[s, 0]
                for d in range(1, dim):
                    acc = acc + vs[:, d] * W[s, d]
                bits[:, s] = (acc >= 0) | np.isnan(acc)
            chars = (bits.astype(np.uint8) + 48).astype(np.uint8)
            blob = chars.tobytes().decode("ascii")
            for i, j in enumerate(idx):
                out[j] = blob[i * nplanes:(i + 1) * nplanes]
        for j in np.nonzero(null_mask)[0]:
            out[j] = zero
        return pd.Series(out)

    return bucket


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, cosine).

    The query side is broadcast (assert small); self-matches excluded;
    ties broken by neighbor id for a total, engine-independent order.
    ``dim`` unrolls the cosine folds when the vector length is known
    statically (see :func:`dot_expr`) — bit-identical results.
    """
    from pyspark.sql import Window

    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            as_double_array(vec_col).alias("__qv"),
        ).withColumn("__qn", norm_expr(F.col("__qv"), dim))
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double_array(vec_col).alias("__cv"),
    ).withColumn("__cn", norm_expr(F.col("__cv"), dim))
    sim = cosine_with_norms(
        F.col("__qv"), F.col("__cv"), F.col("__qn"), F.col("__cn"), dim
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("__sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", F.col("__sim").alias("cosine"))
    )


def with_lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    planes: Sequence[Sequence[float]] | None = None,
    out_col: str = "lsh_bucket",
    backend: str = "arrow",
    nan_policy: str = "raise",
) -> DataFrame:
    """Adds the hyperplane-sign bucket column.  ``backend="arrow"``
    (default) computes it as one vectorized pandas_udf — bit-identical
    to the ``"sql"`` expression form (see :func:`_lsh_bucket_pandas_udf`
    for the equivalence argument and the NaN/NULL-element raise), 4×
    cheaper at production plane geometry because the 512-term unrolled
    projection is too large for HotSpot to JIT.

    ``nan_policy`` (r17): ``"raise"`` (default) keeps the arrow udf's
    fail-loud behavior on NaN/NULL vector elements; ``"sql"`` routes
    exactly the rows whose vector carries a NULL/NaN/inf element
    through :func:`lsh_bucket_expr` instead — bit-faithful by
    construction, evaluated JVM-side where null-vs-NaN still exists —
    so one corrupt vector degrades to the expression form instead of
    killing a 100 TB job."""
    planes = planes if planes is not None else random_planes()
    if backend not in ("arrow", "sql"):
        raise ValueError(f"backend must be arrow|sql, got {backend!r}")
    if nan_policy not in ("raise", "sql"):
        raise ValueError(f"nan_policy must be raise|sql, got {nan_policy!r}")
    v = as_double_array(vec_col)
    if backend == "sql":
        return df.withColumn(out_col, lsh_bucket_expr(v, planes))
    udf = _lsh_bucket_pandas_udf(planes)
    if nan_policy == "sql":
        bad = _vec_has_nonfinite(v)
        bucket = F.when(bad, lsh_bucket_expr(v, planes)).otherwise(
            udf(F.when(bad, F.lit(None)).otherwise(v))
        )
    else:
        bucket = udf(v)
    # coalesce makes the bucket NON-NULLABLE: the udf always emits a
    # string (a NULL vector gets the all-"0" bucket), but Catalyst
    # types udf output nullable, and a nullable JOIN KEY makes the
    # bucket equi-join infer an IsNotNull(bucket(...)) that predicate
    # pushdown materializes as a SECOND ArrowEvalPython evaluation of
    # the same udf below the join (observed in the ann_lsh plan).  The
    # fallback literal can never be produced.
    return df.withColumn(
        out_col, F.coalesce(bucket, F.lit("0" * len(planes)))
    )


def _probe_buckets_expr(bucket: Column, num_planes: int, multi_probe: bool) -> Column:
    """array of bucket ids to probe: the exact bucket, plus (multi-
    probe) every Hamming-1 neighbor — the standard LSH recall knob: a
    vector near a hyperplane falls on either side with ~equal
    probability, so flipping one sign bit recovers most of the recall
    lost to boundary effects, at num_planes× the candidate cost."""
    if not multi_probe:
        return F.array(bucket)
    variants = [bucket]
    for i in range(num_planes):
        flipped = F.when(F.substring(bucket, i + 1, 1) == "1", "0").otherwise("1")
        variants.append(
            F.concat(
                F.substring(bucket, 1, i), flipped,
                F.substring(bucket, i + 2, num_planes - i - 1),
            )
        )
    return F.array(*variants)


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: Sequence[Sequence[float]] | None = None,
    k: int = 10,
    multi_probe: bool = False,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket (plus
    its Hamming-1 neighbors when ``multi_probe``); cosine + window
    top-k within candidates only."""
    from pyspark.sql import Window

    planes = planes if planes is not None else random_planes()
    dim = unrollable(len(planes[0])) if planes else None
    # query side: sql backend — |Q|-bounded by design, below the
    # arrow bucket udf's crossover (one flat Python stage would cost
    # more than the chains over a query batch)
    q = with_lsh_bucket(
        queries.select(
            F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("__qv")
        ),
        "__qv",
        planes,
        backend="sql",
    ).withColumn("__qn", norm_expr(F.col("__qv"), dim))
    q = q.select(
        "query_id",
        "__qv",
        "__qn",
        F.explode(
            _probe_buckets_expr(F.col("lsh_bucket"), len(planes), multi_probe)
        ).alias("lsh_bucket"),
    )
    c = with_lsh_bucket(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), as_double_array(vec_col).alias("__cv")
        ),
        "__cv",
        planes,
    ).withColumn("__cn", norm_expr(F.col("__cv"), dim))
    joined = (
        c.join(F.broadcast(q), "lsh_bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    sim = cosine_with_norms(
        F.col("__qv"), F.col("__cv"), F.col("__qn"), F.col("__cn"), dim
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        joined.select("query_id", "neighbor_id", sim.alias("__sim"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", F.col("__sim").alias("cosine"))
    )


def embedding_near_duplicates(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: Sequence[Sequence[float]] | None = None,
    min_cosine: float = 0.95,
) -> DataFrame:
    """(id_a, id_b, cosine) for corpus pairs sharing an LSH bucket with
    cosine ≥ threshold — embedding-level near-dup dedup. Bucket
    equi-join only; never all-pairs."""
    planes = planes if planes is not None else random_planes()
    dim = unrollable(len(planes[0])) if planes else None
    b = with_lsh_bucket(
        corpus.select(F.col(id_col), as_double_array(vec_col).alias("__v")),
        "__v",
        planes,
    ).withColumn("__n", norm_expr(F.col("__v"), dim))
    lhs, rhs = b.alias("a"), b.alias("b")
    pairs = (
        lhs.join(rhs, "lsh_bucket")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cosine_with_norms(
                F.col("a.__v"), F.col("b.__v"), F.col("a.__n"), F.col("b.__n"), dim
            ).alias("__sim"),
        )
    )
    return (
        pairs.filter(F.col("__sim") >= F.lit(min_cosine))
        .select("id_a", "id_b", F.col("__sim").alias("cosine"))
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer alternative to the
# random-hyperplane LSH above: corpus vectors are assigned to their
# nearest centroid's cell; a query probes only its nprobe nearest
# cells. Centroids here are K designated corpus vectors (training-free
# seeding — a production deployment would k-means them offline and pass
# the result in; the operator is agnostic to where centroids come from).


def _centroids_df(spark, centroids: Sequence[tuple[int, Sequence[float]]]):
    from pyspark.sql import Row

    return F.broadcast(
        spark.createDataFrame(
            [Row(cid=int(cid), cv=[float(x) for x in cv]) for cid, cv in centroids],
            schema="cid int, cv array<double>",
        ).withColumn("__cn_c", norm_expr(F.col("cv"), _centroid_dim(centroids)))
    )


def _argmax_cell(scored: DataFrame, out_id: str) -> DataFrame:
    """(out_id, __v, __n, cell): per key, the cid with the highest
    ``__csim`` (ties → lower cid) — argmax via max_by, so the partial
    aggregation collapses the candidate fan-out map-side (all candidate
    rows of a key sit in one partition) and the shuffle carries n rows.
    The ONE tie-break rule for every assignment path (flat nprobe=1 and
    two-level) — keep it single-sited so the paths cannot diverge."""
    ordering = F.struct(F.col("__csim").alias("s"), (-F.col("cid")).alias("nc"))
    return scored.groupBy(out_id).agg(
        F.first("__v").alias("__v"),
        F.first("__n").alias("__n"),
        F.max_by(F.col("cid"), ordering).alias("cell"),
    )


#: Upper bound on k·dim for the row-local literal-centroid assignment
#: (:func:`_probe_cells_rowlocal`): past it the plan embeds too many
#: literals (planning/codegen cost linear in k·dim) and the broadcast-
#: join path below takes over — which is also the ONLY shape that
#: scales to the k ∝ n deployments (SemDeDup's k=50k), where a literal
#: plan is out of the question.  512 values = the default driver-row
#: geometry (8 centroids × 64 dims); 8192 leaves headroom for larger
#: small-k setups while keeping plans compact.
ROWLOCAL_ASSIGN_MAX_VALUES = 8192


def _py_fold_norm(v: Sequence[float]) -> float:
    """sqrt of the left-to-right x·x fold — the EXACT float
    :func:`norm_expr` computes for the same values, reproduced driver-
    side so a literal centroid's norm is bit-identical to the one the
    broadcast path evaluates in the engine."""
    acc = 0.0
    for x in v:
        acc = acc + float(x) * float(x)
    return math.sqrt(acc)


def _cent_struct(vec: Column, n: Column, cid: int, cv: Sequence[float],
                 dim: int | None) -> Column:
    """One candidate struct for the row-local argmax: ordered by
    (s, nc) exactly like :func:`_argmax_cell`'s max_by ordering —
    similarity desc (NaN greatest, Spark's float ordering), ties →
    lower cid (nc = -cid) — with the winning centroid's vector carried
    as a literal for residual consumers.  The similarity is
    ``dot(v, cv_lit) / (n · norm_lit)`` — the same multiplications in
    the same order as :func:`cosine_with_norms` against the broadcast
    centroid table, so the float is bit-identical."""
    sim = dot_expr(vec, F.array(*[F.lit(float(x)) for x in cv]), dim) / (
        n * F.lit(_py_fold_norm(cv))
    )
    return F.struct(
        sim.alias("s"),
        F.lit(-int(cid)).alias("nc"),
        F.lit(int(cid)).alias("cid"),
        F.array(*[F.lit(float(x)) for x in cv]).alias("cv"),
    )


def _assign_cells_pandas_udf(
    centroids: Sequence[tuple[int, Sequence[float]]], nprobe: int
):
    """pandas_udf twin of the literal-centroid argmax: vec →
    ``struct(n double, cells array<struct<cell int, cs double>>)``
    with ``cells`` the top-``nprobe`` centroids by (similarity desc,
    cid asc) — vectorized across the batch (r16, guide §4.2).

    Why: at production geometry (k=16, dim=64) the SQL form runs k
    interpreted aggregate/zip_with folds per corpus row — measured
    8-14 s/1M rows on 32 cores, the dominant corpus-side cost of every
    IVF-family operator at scale; this twin measures ~0.8 s/1M.

    Bit-identity argument (the same discipline as the SemDeDup pair
    pass and the LSH bucket udf):

    - norm and every dot accumulate LEFT-TO-RIGHT one dimension at a
      time across the row block (numpy elementwise ops never fuse or
      reassociate), reproducing dot_expr's 0.0-seeded fold exactly;
      ``cs = dot / (n · norm_lit)`` multiplies then divides in the
      same order with the same _py_fold_norm literal.
    - ranking replicates Spark's TOTAL ORDER on doubles (NaN greatest
      — canonicalized, so any NaN payload compares equal — and
      -0.0 < 0.0) via the sign-flip bit trick, with ties broken by
      ascending cid through a stable argsort over cid-ordered columns
      — exactly the (s, nc) struct ordering of array_max /
      reverse(array_sort).
    - a NULL vector yields n NULL and all-NULL similarities, so the
      SQL ordering degrades to nc alone: the ``nprobe`` LOWEST cids
      with cs NULL — reproduced explicitly.
    - WRONG-LENGTH vectors mirror whichever form the sql twin uses at
      this dim (r17 ADVICE): at dim <= UNROLL_MAX_DIM the sql twin
      unrolls ``F.get`` chains, so an overlong vector is silently
      TRUNCATED to its first dim elements (norm and dots alike) and a
      short vector null-propagates to n NULL + all-NULL similarities
      (degenerate: lowest cids, cs NULL); at dim > UNROLL_MAX_DIM the
      fold form computes the TRUE full-vector norm while zip_with
      pads the dots to NULL (degenerate cells, real norm).  Both
      reproduced explicitly; parity pinned in tests/test_ivf_training.py.
    - NaN is the one value the twin cannot EMIT — every pandas→Arrow
      return path nulls NaN doubles — so a NaN norm or similarity
      (NaN components, null ELEMENTS — which Arrow hands to numpy as
      NaN — or inf/inf overflow) RAISES instead of silently diverging
      from the sql form's NaN-ranks-greatest semantics.  Embedding
      corpora are finite; ``backend="sql"`` is the NaN-faithful
      escape hatch.
    """
    import pandas as pd  # noqa: F401

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    cents = sorted(
        (int(cid), tuple(float(x) for x in cv)) for cid, cv in centroids
    )
    norm_lits = tuple(_py_fold_norm(cv) for _, cv in cents)
    p = max(1, min(int(nprobe), len(cents)))
    # the sql twin unrolls F.get chains at this bound — wrong-length
    # handling must mirror whichever form it uses (docstring)
    unrolled = len(cents[0][1]) <= UNROLL_MAX_DIM if cents else False
    schema = StructType(
        [
            StructField("n", DoubleType(), True),
            StructField(
                "cells",
                ArrayType(
                    StructType(
                        [
                            StructField("cell", IntegerType(), True),
                            StructField("cs", DoubleType(), True),
                        ]
                    )
                ),
                True,
            ),
        ]
    )

    @pandas_udf(schema)
    def assign(v):
        import numpy as np
        import pandas as pd

        W = np.asarray([cv for _, cv in cents], np.float64)
        NL = np.asarray(norm_lits, np.float64)
        CID = np.asarray([cid for cid, _ in cents], np.int64)
        k, dim = W.shape
        cells_in = v.tolist()
        nr = len(cells_in)
        if nr == 0:
            return pd.DataFrame({"n": [], "cells": []})
        n_out: list = [None] * nr
        out_cells: list = [None] * nr
        degenerate_cells = [
            {"cell": int(CID[t]), "cs": None} for t in range(p)
        ]
        if unrolled:
            # sql twin = F.get chains: overlong vectors TRUNCATE to
            # their first dim elements (norm + dots); short vectors
            # null-propagate (n NULL, degenerate cells)
            good = [
                i
                for i, c in enumerate(cells_in)
                if c is not None and len(c) >= dim
            ]
            for i, c in enumerate(cells_in):
                if c is None or len(c) < dim:
                    out_cells[i] = degenerate_cells
        else:
            # sql twin = aggregate/zip_with folds: wrong-length
            # vectors keep their TRUE full-vector norm but zip_with
            # pads the dots to NULL (degenerate cells)
            good = [
                i
                for i, c in enumerate(cells_in)
                if c is not None and len(c) == dim
            ]
            for i, c in enumerate(cells_in):
                if c is None:
                    out_cells[i] = degenerate_cells
                elif len(c) != dim:
                    acc = 0.0
                    for x in c:
                        acc = acc + float(x) * float(x)
                    n_out[i] = math.sqrt(acc)
                    out_cells[i] = degenerate_cells
        if good:
            if all(len(cells_in[i]) == dim for i in good):
                V = (
                    np.stack([cells_in[i] for i in good])
                    .astype(np.float64, copy=False)
                )
            else:  # unrolled truncation of overlong vectors
                V = np.empty((len(good), dim), np.float64)
                for t, i in enumerate(good):
                    V[t, :] = np.asarray(cells_in[i][:dim], np.float64)
            acc = V[:, 0] * V[:, 0]
            for d in range(1, dim):
                acc = acc + V[:, d] * V[:, d]
            nrm = np.sqrt(acc)
            # ANSI parity: the SQL form's cosine divides by n·norm_lit
            # and raises DIVIDE_BY_ZERO on a zero-norm vector (or a
            # zero-norm centroid) — numpy would silently yield NaN
            if (nrm == 0).any() or (NL == 0).any():
                raise ArithmeticError(
                    "[DIVIDE_BY_ZERO] zero-norm vector in cell "
                    "assignment (ANSI-mode parity with the sql backend)"
                )
            sims = np.empty((len(good), k), np.float64)
            for j in range(k):
                acc = V[:, 0] * W[j, 0]
                for d in range(1, dim):
                    acc = acc + V[:, d] * W[j, d]
                sims[:, j] = acc / (nrm * NL[j])
            # Arrow cannot carry NaN doubles back to the JVM (every
            # pandas→Arrow path nulls them), so a NaN norm/similarity
            # — NaN components, or inf/inf from overflow — would reach
            # downstream as NULL where the sql backend emits NaN (which
            # Spark ranks GREATEST).  Fail loudly instead of diverging;
            # backend="sql" is the NaN-faithful escape hatch.
            if np.isnan(nrm).any() or np.isnan(sims).any():
                raise ValueError(
                    "NaN norm/similarity in cell assignment: the arrow "
                    "backend cannot emit NaN through Arrow; use "
                    "backend='sql' for NaN-bearing vectors"
                )
            key = sims.copy()
            key[np.isnan(key)] = np.nan  # canonical quiet-NaN payload
            bits = key.view(np.int64)
            tkey = np.where(
                bits >= 0, bits, bits ^ np.int64(0x7FFFFFFFFFFFFFFF)
            )
            order = np.argsort(~tkey, axis=1, kind="stable")[:, :p]
            top_cs = np.take_along_axis(sims, order, axis=1)
            top_cid = CID[order]
            for i, row in enumerate(good):
                n_out[row] = float(nrm[i])
                out_cells[row] = [
                    {"cell": int(top_cid[i, t]), "cs": float(top_cs[i, t])}
                    for t in range(p)
                ]
        return pd.DataFrame({"n": n_out, "cells": out_cells})

    return assign


def _vec_has_nonfinite(v: Column) -> Column:
    """True when any element of ``v`` is NULL, NaN or ±inf — every
    value class that can surface as a NaN norm/similarity inside the
    arrow twins (which Arrow cannot emit, and which erase the
    null-vs-NaN distinction the SQL forms depend on).  Evaluated
    JVM-side, where the distinction still exists.  NULL for a NULL
    vector — callers' WHEN then falls through to the arrow udf, whose
    NULL-vector handling is already bit-faithful."""
    return F.exists(
        v,
        lambda x: x.isNull() | F.isnan(x) | (F.abs(x) == F.lit(float("inf"))),
    )


def _assign_struct_sql_expr(
    centroids: Sequence[tuple[int, Sequence[float]]], nprobe: int
):
    """The sql assignment backend's result as ONE expression —
    ``struct(n double, cells array<struct<cell int, cs double>>)``,
    the same shape :func:`_assign_cells_pandas_udf` returns — built
    from the exact sub-expressions `_probe_cells_rowlocal_sql` uses
    (norm_expr / _cent_struct / reverse(array_sort)), so values are
    bit-identical to a pure ``backend="sql"`` run.  The
    ``nan_policy="sql"`` quarantine branch: evaluated only for rows
    the non-finite detector flags."""
    cents = sorted((int(cid), cv) for cid, cv in centroids)
    dim = _centroid_dim(centroids)
    p = max(1, min(int(nprobe), len(cents)))

    def build(v: Column) -> Column:
        n = norm_expr(v, dim)
        arr = F.array(
            *[_cent_struct(v, n, cid, cv, dim) for cid, cv in cents]
        )
        top = F.slice(F.reverse(F.array_sort(arr)), 1, p)
        cells = F.transform(
            top,
            lambda s: F.struct(
                s["cid"].alias("cell"), s["s"].alias("cs")
            ),
        )
        return F.struct(n.alias("n"), cells.alias("cells"))

    return build


def _probe_cells_rowlocal(
    df: DataFrame,
    centroids: Sequence[tuple[int, Sequence[float]]],
    id_col: str,
    vec_col: Column,
    nprobe: int,
    out_id: str,
    with_extras: bool = False,
    backend: str = "arrow",
    nan_policy: str = "raise",
) -> DataFrame:
    """Row-local flavor of :func:`_probe_cells` (r16): no centroid
    join, no aggregation, no exchange before the assignment — the
    argmax rides the scan.  ``backend="arrow"`` (default) computes the
    whole top-nprobe in one vectorized pandas_udf — bit-identical to
    the ``"sql"`` literal projection (see :func:`_assign_cells_pandas_udf`
    for the equivalence argument), and 10×+ cheaper per corpus row at
    production geometry because the SQL form's k aggregate/zip_with
    folds run interpreted per element.  The winning cell's centroid
    vector (``with_extras``) is recovered JVM-side from a literal
    int→array map, so the residual subtracts the same floats either
    way."""
    if backend not in ("arrow", "sql"):
        raise ValueError(f"backend must be arrow|sql, got {backend!r}")
    if nan_policy not in ("raise", "sql"):
        raise ValueError(f"nan_policy must be raise|sql, got {nan_policy!r}")
    if backend == "arrow":
        udf = _assign_cells_pandas_udf(centroids, nprobe)
        if nan_policy == "sql":
            # NaN quarantine (r17): rows whose vector carries a NULL /
            # NaN / inf element — the classes the arrow udf RAISES on —
            # are routed through the sql expression form instead
            # (bit-faithful by construction); the udf sees NULL for
            # them (its degenerate path, never evaluated into the
            # result) and clean rows never evaluate the sql branch.
            # One pass, no extra exchange.
            bad = _vec_has_nonfinite(F.col("__v"))
            st = F.when(
                bad,
                _assign_struct_sql_expr(centroids, nprobe)(F.col("__v")),
            ).otherwise(
                udf(F.when(bad, F.lit(None)).otherwise(F.col("__v")))
            )
        else:
            st = udf(F.col("__v"))
        base = df.select(
            F.col(id_col).alias(out_id), vec_col.alias("__v")
        ).withColumn("__st", st)
        if nprobe == 1:
            picked = base.withColumn(
                "__pc", F.element_at(F.col("__st.cells"), 1)
            )
        else:
            picked = base.withColumn(
                "__pc", F.explode(F.col("__st.cells"))
            )
        # coalesce(-1) makes cell NON-NULLABLE for the same reason as
        # the sql path below: the udf always emits a cell id, but
        # Catalyst types the struct field nullable, and a nullable
        # cell makes every downstream equi-join infer an IsNotNull
        # that diverges otherwise-identical exchange subtrees.
        cols = [
            out_id,
            "__v",
            F.col("__st.n").alias("__n"),
            F.coalesce(F.col("__pc.cell"), F.lit(-1)).alias("cell"),
        ]
        if with_extras:
            cvmap = F.create_map(
                *[
                    x
                    for cid, cv in sorted(centroids)
                    for x in (
                        F.lit(int(cid)),
                        F.array(*[F.lit(float(c)) for c in cv]),
                    )
                ]
            )
            cols.extend(
                [
                    F.col("__pc.cs").alias("__cs"),
                    F.element_at(cvmap, F.col("cell")).alias("__cv"),
                ]
            )
        return picked.select(*cols)
    return _probe_cells_rowlocal_sql(
        df, centroids, id_col, vec_col, nprobe, out_id, with_extras
    )


def _probe_cells_rowlocal_sql(
    df: DataFrame,
    centroids: Sequence[tuple[int, Sequence[float]]],
    id_col: str,
    vec_col: Column,
    nprobe: int,
    out_id: str,
    with_extras: bool = False,
) -> DataFrame:
    """SEMANTIC REFERENCE form of the row-local assignment: the K
    centroids are embedded as literals and the argmax / top-nprobe runs
    as a pure projection — no centroid join, no aggregation, no
    exchange.  The assignment becomes a free rider on the scan (guide
    §2.4: remove shuffles outright); at sf0.1 this measured 0.23 s vs
    1.07 s for the broadcast-join + max_by chain, with bit-identical
    assignments.  At scale prefer ``backend="arrow"`` above: each
    literal dot here is an interpreted fold at dim > UNROLL_MAX_DIM.

    Ordering equivalence: candidates are ranked by the struct
    (s, nc) — ascending array_sort then reverse ≡ (s DESC with NaN
    first, cid ASC on ties), exactly the max_by ordering and the
    window ``__csim DESC, cid ASC`` it replaces.

    ``with_extras`` appends ``__cs`` (similarity to the chosen cell)
    and ``__cv`` (that cell's centroid vector) so consumers that used
    to re-join the centroid table (SemDeDup's cent_sim, IVF-PQ's
    residuals) read them straight off the projection."""
    dim = _centroid_dim(centroids)
    base = df.select(
        F.col(id_col).alias(out_id), vec_col.alias("__v")
    ).withColumn("__n", norm_expr(F.col("__v"), dim))
    arr = F.array(
        *[
            _cent_struct(F.col("__v"), F.col("__n"), cid, cv, dim)
            for cid, cv in sorted(centroids)
        ]
    )
    extras = (
        [F.col("__am.s").alias("__cs"), F.col("__am.cv").alias("__cv")]
        if with_extras
        else []
    )
    # cell is wrapped in coalesce(cid, -1) to make the attribute
    # NON-NULLABLE (r16): arr is a non-empty literal-built array, so
    # array_max always yields a struct whose cid is a non-null literal
    # — the coalesce can never fire and every value is unchanged.  But
    # Catalyst types array_max as nullable, so each downstream equi-
    # join on cell INFERRED an IsNotNull(cell) filter which predicate
    # pushdown then re-inlined below this projection — re-evaluating
    # the full k-dot argmax (plus a norm fold per centroid after
    # substitution) once more per corpus row, just to test a null that
    # cannot occur (observed as a 29 KB scan-level Filter in the
    # SemDeDup plan).  A non-nullable cell generates no constraint at
    # all.
    if nprobe == 1:
        return (
            base.withColumn("__am", F.array_max(arr))
            .select(
                out_id,
                "__v",
                "__n",
                F.coalesce(F.col("__am.cid"), F.lit(-1)).alias("cell"),
                *extras,
            )
        )
    return (
        base.withColumn(
            "__am",
            F.explode(
                F.slice(F.reverse(F.array_sort(arr)), 1, int(nprobe))
            ),
        )
        .select(
            out_id,
            "__v",
            "__n",
            F.coalesce(F.col("__am.cid"), F.lit(-1)).alias("cell"),
            *extras,
        )
    )


def _rowlocal_ok(centroids: Sequence[tuple[int, Sequence[float]]]) -> bool:
    return (
        0 < len(centroids)
        and len(centroids) * len(centroids[0][1]) <= ROWLOCAL_ASSIGN_MAX_VALUES
    )


def _probe_cells(
    df: DataFrame,
    centroids: Sequence[tuple[int, Sequence[float]]],
    id_col: str,
    vec_col: Column,
    nprobe: int,
    out_id: str,
    backend: str = "arrow",
    nan_policy: str = "raise",
) -> DataFrame:
    """(out_id, __v, __n, cell) — each row's ``nprobe`` nearest centroid
    cells (cosine; ties → lower cid).  ``nan_policy="sql"`` quarantines
    NULL/NaN/inf-element vectors through the sql expression form on the
    row-local path (see :func:`_probe_cells_rowlocal`); the broadcast
    path is NaN-faithful already.

    Two bit-identical implementations (parity pinned in
    tests/test_unrolled_exprs.py):

    - k·dim <= ROWLOCAL_ASSIGN_MAX_VALUES (r16): literal-centroid
      row-local projection (:func:`_probe_cells_rowlocal`) — no join,
      no aggregate, no exchange.
    - larger k (the k ∝ n deployments): broadcast join against the
      K-row centroid table + map-side max_by / window top-nprobe.  The
      K-way expansion is reduced map-side before any wide operation;
      expression trees stay small (array ops), so plan analysis/codegen
      cost is flat in K."""
    from pyspark.sql import Window

    if _rowlocal_ok(centroids):
        return _probe_cells_rowlocal(
            df, centroids, id_col, vec_col, nprobe, out_id,
            backend=backend, nan_policy=nan_policy,
        )
    spark = df.sparkSession
    dim = _centroid_dim(centroids)
    cent = _centroids_df(spark, centroids)
    base = df.select(
        F.col(id_col).alias(out_id), vec_col.alias("__v")
    ).withColumn("__n", norm_expr(F.col("__v"), dim))
    scored = base.join(cent).select(
        out_id,
        "__v",
        "__n",
        F.col("cid"),
        cosine_with_norms(
            F.col("__v"), F.col("cv"), F.col("__n"), F.col("__cn_c"), dim
        ).alias("__csim"),
    )
    if nprobe == 1:
        return _argmax_cell(scored, out_id)
    w = Window.partitionBy(out_id).orderBy(
        F.col("__csim").desc(), F.col("cid").asc()
    )
    return (
        scored.withColumn("__crn", F.row_number().over(w))
        .filter(F.col("__crn") <= nprobe)
        .select(out_id, "__v", "__n", F.col("cid").alias("cell"))
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: Sequence[tuple[int, Sequence[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus → (id, vector, norm, cell) with cell = nearest centroid
    (cosine argmax, ties → lower centroid id)."""
    return _probe_cells(
        corpus, centroids, id_col, as_double_array(vec_col), nprobe=1, out_id=id_col
    )


def train_ivf_centroids(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Lloyd's-style coarse-quantizer training, k-MEDIANS flavor:
    assignment = cosine argmax against the current centroids
    (:func:`ivf_assign` — broadcast join + map-side ``max_by``, one
    n-row shuffle per iteration); update = per-dimension MEDIAN of each
    cell's vectors (``posexplode`` + groupBy(cell, pos)).

    Median instead of mean is deliberate: a median is a sort-based,
    ORDER-INDEPENDENT reduction, so the trained centroids are
    bit-identical regardless of partitioning/engine — which keeps the
    whole training loop reproducible in the DuckDB oracle SQL (a float
    mean's partial-sum order is engine-dependent). Init: the ``k``
    lowest-id corpus vectors (same training-free seeding as before —
    iterations now spread the cells to the data's actual clusters).

    Driver traffic: k·dim doubles per iteration (broadcast-scale).
    At 100 TB, train on a bounded sample and pass the result in — the
    IVF operators take centroids as plain data.
    """
    base = corpus.select(
        F.col(id_col).alias("__tid"), as_double_array(vec_col).alias("__tv")
    )
    init = (
        base.orderBy("__tid").limit(k).collect()
    )  # k×dim doubles — metadata-scale
    cents: list[tuple[int, list[float]]] = [
        (int(r["__tid"]), [float(x) for x in r["__tv"]]) for r in init
    ]
    for _ in range(iters):
        # backend="sql": training runs on a BOUNDED sample by contract
        # (k·dim-scale driver traffic), well below the arrow twin's
        # ~10⁴-row crossover — the flat ArrowEvalPython stage per
        # iteration would cost more than the interpreted folds save
        assigned = _probe_cells(
            base, cents, "__tid", F.col("__tv"), nprobe=1, out_id="__tid",
            backend="sql",
        )
        med_rows = (
            assigned.select("cell", F.posexplode("__v").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.median("val").alias("m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in med_rows:
            by_cell.setdefault(int(r["cell"]), {})[int(r["pos"])] = float(r["m"])
        def _next(cid: int, old: list[float]) -> list[float]:
            if cid not in by_cell:
                return old  # empty cell keeps its previous centroid
            new = [by_cell[cid][p] for p in range(len(old))]
            # A per-dimension median CAN be the zero vector (members on
            # disjoint axes) — no cosine direction, and every later
            # scoring pass would divide by zero. Same rule as empty:
            # the cell keeps its previous centroid.
            if all(x == 0.0 for x in new):
                return old
            return new

        cents = [(cid, _next(cid, old)) for cid, old in cents]
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: Sequence[tuple[int, Sequence[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 2,
    assign: str = "exact",
    branch: int | None = None,
    probe_supers: int = 3,
    tree: tuple[list[tuple[int, list[float]]], dict[int, int]] | None = None,
) -> DataFrame:
    """IVF ANN: per query, exact cosine top-k over the vectors in its
    ``nprobe`` nearest cells only — candidates via a cell equi-join
    (broadcast query side), never all-pairs. Recall/latency dial:
    nprobe·K_cells⁻¹ of the corpus is scanned per query.

    ``assign`` picks the CORPUS-side cell assignment: ``"exact"`` (flat
    argmax, O(n·k)) or ``"two_level"`` (:func:`ivf_assign_two_level`,
    O(n·√k) — the k ∝ n deployment's shape, SCALE.md r13; query-side
    probing is |Q|-scale and stays exact either way). ``two_level`` is
    an APPROXIMATION on unstructured data — see the agreement ladder
    and the ``tree`` reuse hook on :func:`ivf_assign_two_level`."""
    from pyspark.sql import Window

    if assign == "exact":
        c = ivf_assign(corpus, centroids, id_col, vec_col)
    elif assign == "two_level":
        c = ivf_assign_two_level(
            corpus, centroids, id_col, vec_col,
            branch=branch, probe_supers=probe_supers, tree=tree,
        )
    else:
        raise ValueError(f"assign must be 'exact' or 'two_level': {assign!r}")
    c = c.withColumnRenamed(id_col, "neighbor_id").withColumnRenamed("__n", "__cn")
    # backend="sql": the QUERY side is |Q|-bounded by design (the
    # whole serving shape scales per query), below the arrow twin's
    # ~10⁴-row crossover — one flat ArrowEvalPython stage would cost
    # more than the folds over a query batch save
    q = _probe_cells(
        queries,
        centroids,
        id_col,
        as_double_array(vec_col),
        nprobe=nprobe,
        out_id="query_id",
        backend="sql",
    ).withColumnRenamed("__v", "__qv").withColumnRenamed("__n", "__qn")
    joined = c.join(F.broadcast(q), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    sim = cosine_with_norms(
        F.col("__qv"), F.col("__v"), F.col("__qn"), F.col("__cn"),
        _centroid_dim(centroids),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        joined.select("query_id", "neighbor_id", sim.alias("__sim"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", F.col("__sim").alias("cosine"))
    )


def _semdedup_flags_arrow(
    scored: DataFrame, id_col: str, tau: float, max_cell_rows: int = 100_000
) -> DataFrame:
    """(id, cell, cent_sim, is_semantic_dup) for EVERY scored row —
    the within-cell admitted-pair losers computed in ONE grouped Arrow
    pass (guide §4.2: let Spark do the by-cell shuffle, hand each
    whole cell to vectorized numpy instead of evaluating an
    interpreted 64-element fold per candidate pair).

    Emitting ALL rows with their flag (r16, batch 3) — not just the
    losers — removes the former by-id flag join-back, whose probe side
    re-evaluated the whole corpus assignment a second time (the
    operator's dominant per-row cost; the two consumers pruned
    different columns, so their subtrees could never share a stage).
    One corpus pass, one exchange, no join.

    BIT-IDENTICAL to the join+fold form by construction: the pair dot
    is accumulated as 'acc = acc + a[d]*b[d]' one dimension at a time
    over vectorized numpy arrays — the same IEEE additions in the same
    left-to-right order as :func:`dot_expr`'s fold (numpy never fuses
    or reassociates elementwise ops) — and the division by the SAME
    precomputed __n norms matches :func:`cosine_with_norms`.  NaN
    follows Spark's larger-than-everything ordering inside the pair
    logic, but a NaN ``cent_sim`` cannot be EMITTED (Arrow nulls NaN
    doubles) — the pass raises on one, like the arrow assignment.
    Contract: the id/vector/norm/cent-sim columns are non-null (they
    are, coming from the scored projection over non-null embeddings);
    null-tolerant callers use ``pair_backend="sql"``.

    Scale shape: one exchange (the groupBy's hash partition by cell),
    per-cell work sum(|cell|^2)·dim as vectorized numpy, blocked so
    the pair-block accumulator stays ~64 MB regardless of cell size.
    A giant skewed cell is one Python task here — ``max_cell_rows``
    (r17 skew guard) bounds it: a cell past the bound raises with
    remediation (grow k — the paper's k ∝ n keeps cells bounded — or
    use ``pair_backend="sql"``, whose equi-join AQE can skew-split)
    instead of OOMing the task hours into a 100 TB job.  The default
    100k bound caps the per-task vector block at dim·800 KB and the
    pair work at ~10^10·dim flops — already far past where the sql
    backend wins."""
    from pyspark.sql.types import BooleanType, DoubleType, StructField, StructType

    out_schema = StructType(
        [
            scored.schema[id_col],
            scored.schema["cell"],
            StructField("cent_sim", DoubleType(), True),
            StructField("is_semantic_dup", BooleanType(), True),
        ]
    )

    def flag_cell(pdf):
        import numpy as np
        import pandas as pd

        cells = pdf["cell"].to_numpy()
        # NaN check runs BEFORE the singleton early-return (r17
        # ADVICE): a NaN cent_sim in a 1-row cell would otherwise be
        # silently nulled by the pandas→Arrow return path instead of
        # raising as the contract promises
        cs_all = pdf["__cs"].to_numpy(dtype=np.float64)
        if np.isnan(cs_all).any():
            raise ValueError(
                "NaN cent_sim in semantic dedup: the arrow pair "
                "backend cannot emit NaN through Arrow; use "
                "pair_backend='sql' for NaN-bearing similarities"
            )
        if len(pdf) < 2:
            return pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "cell": cells,
                    "cent_sim": pdf["__cs"],
                    "is_semantic_dup": np.zeros(len(pdf), dtype=bool),
                }
            )
        if len(pdf) > max_cell_rows:
            raise ValueError(
                f"semantic dedup cell {cells[0]!r} holds {len(pdf)} rows "
                f"> max_cell_rows={max_cell_rows}: under "
                f"pair_backend='arrow' a cell is ONE Python task — grow "
                f"k so cells stay bounded (SemDeDup runs k ∝ n), switch "
                f"to pair_backend='sql' (AQE-skew-splittable equi-join), "
                f"or raise max_cell_rows explicitly"
            )
        order = np.argsort(pdf[id_col].to_numpy())
        ids = pdf[id_col].to_numpy()[order]
        V = np.array(
            [np.asarray(v, dtype=np.float64) for v in pdf["__v"].to_numpy()[order]]
        )
        nn = pdf["__n"].to_numpy(dtype=np.float64)[order]
        cs = cs_all[order]
        n_rows, dim = V.shape
        loser = np.zeros(n_rows, dtype=bool)
        # row-block size bounding the (block × n_rows) accumulator
        blk = max(1, min(1024, (64 << 20) // (8 * n_rows)))
        cs_nan = np.isnan(cs)
        for i0 in range(0, n_rows - 1, blk):
            i1 = min(i0 + blk, n_rows - 1)
            c0 = i0 + 1  # only columns j > i0 can form an (i < j) pair
            acc = np.zeros((i1 - i0, n_rows - c0))
            for d in range(dim):
                acc += V[i0:i1, d, None] * V[None, c0:, d]
            cos = acc / (nn[i0:i1, None] * nn[None, c0:])
            adm = np.isnan(cos) | (cos >= tau)
            # strict upper triangle in GLOBAL indices: j > i
            ii, jj = np.nonzero(adm)
            gi = ii + i0
            gj = jj + c0
            keep = gj > gi
            gi, gj = gi[keep], gj[keep]
            if gi.size == 0:
                continue
            # Spark ordering: NaN is larger than any non-NaN, NaN == NaN.
            # b (higher id) keeps iff cs[b] < cs[a]; the id tie-break can
            # never fire (ids ascending → ids[gj] > ids[gi]).
            b_keeps = (~cs_nan[gj]) & (cs_nan[gi] | (cs[gj] < cs[gi]))
            loser[gi[b_keeps]] = True
            loser[gj[~b_keeps]] = True
        return pd.DataFrame(
            {
                id_col: ids,
                "cell": cells[order],
                "cent_sim": cs,
                "is_semantic_dup": loser,
            }
        )

    return (
        scored.select(id_col, "cell", "__v", "__n", "__cs")
        .groupBy("cell")
        .applyInPandas(flag_cell, out_schema)
    )


def semantic_duplicates(
    corpus: DataFrame,
    centroids: Sequence[tuple[int, Sequence[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tau: float = 0.95,
    assign: str = "exact",
    branch: int | None = None,
    probe_supers: int = 3,
    tree: tuple[list[tuple[int, list[float]]], dict[int, int]] | None = None,
    pair_backend: str = "arrow",
    max_cell_rows: int = 100_000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication through the coarse quantizer — the cluster-bucketed
    member of the dedup family, alongside exact fingerprints, MinHash/
    SimHash, and the pairwise LSH variant
    (:func:`embedding_near_duplicates`).

    Semantics (the paper's, made engine-deterministic):

    1. Every corpus vector is assigned to its nearest centroid's cell
       (cosine argmax, ties → lower centroid id — :func:`ivf_assign`,
       the SAME assignment the IVF ANN path uses).
    2. Candidate pairs exist only WITHIN a cell (the paper computes
       pairwise similarity inside each k-means cluster, never across).
    3. A pair (a, b) with ``cosine(a, b) >= tau`` is a semantic-
       duplicate pair; the member KEPT is the one with the LOWER
       cosine to its cell centroid (the paper's choice: keeping
       low-centroid-similarity examples preserves the cluster's
       outer, more diverse shell), ties broken by lower id. The other
       member is flagged ``is_semantic_dup``. Pairwise — not
       transitive-closure — exactly the paper's per-row max over the
       cluster similarity matrix; a transitive sweep is
       :mod:`.clustering`'s job when wanted.

    Returns one row per corpus vector:
    ``(id, cell, cent_sim, is_semantic_dup)``.

    Scale shape (100 TB): the only corpus-sized operations are the
    centroid argmax (broadcast K-row join + map-side max_by, one n-row
    shuffle) and the within-cell self-join — an EQUI-join on cell, so
    work is sum(|cell|^2) over cells, never all-pairs. With k grown
    proportionally to n (the paper runs k=50k on LAION-440M), cell
    sizes stay bounded and the join is linear in the corpus; skewed
    giant cells are AQE's skew-join case. Centroids come in as plain
    data (train on a bounded sample via
    :func:`train_ivf_centroids`, or offline).

    Determinism: every similarity is a left-to-right
    :func:`dot_expr`, so cell assignment, pair admission, and the
    keep rule are bit-identical across engines — a DuckDB replay of
    the full pipeline (training included) pins this in
    tests/test_semdedup.py.

    ``pair_backend`` (r16): ``"arrow"`` (default) evaluates the
    within-cell pair similarities as one grouped Arrow pass — blocked
    vectorized numpy with the SAME left-to-right IEEE accumulation as
    the fold, so results are bit-identical (pinned in
    tests/test_semdedup.py) at a fraction of the per-pair cost;
    requires non-null embeddings and keeps each cell in one task.
    ``"sql"`` is the pure-JVM within-cell equi-join — null-tolerant
    and AQE-skew-splittable — for corpora with pathological cells.

    SAFETY CONTRACT for ``assign="two_level"``: the tree quantizer is
    EXACT when the corpus is cluster-separated (each vector's nearest
    child sits under its nearest super — pinned in
    tests/test_two_level.py) but APPROXIMATE on unstructured/blob
    embeddings, where flat-argmax agreement measured 0.56 / 0.74 /
    0.84 at probe_supers 1/2/3 (k=64, branch=8 — the pinned ladder).
    A disagreeing row lands in a neighboring cell, so up to
    (1 - agreement) of duplicate flags can silently differ from the
    exact run. Keep the default ``assign="exact"`` unless the O(n·k)
    assignment term is the measured bottleneck AND the corpus is
    clustered (the regime SemDeDup assumes anyway); the default
    ``probe_supers=3`` is the smallest probe count clearing 0.8
    agreement even on unstructured data. Pass ``tree`` (from
    :func:`group_centroids`) to reuse one super-tree across several
    two-level consumers.
    """
    spark = corpus.sparkSession
    dim = _centroid_dim(centroids)
    if assign == "exact" and _rowlocal_ok(centroids):
        # r16: assignment AND cent_sim in one row-local projection —
        # no centroid join, no argmax aggregate, no exchange before
        # the within-cell pair join (__cs is the same float the
        # broadcast path's cosine_with_norms computes; parity pinned)
        scored = _probe_cells_rowlocal(
            corpus, centroids, id_col, as_double_array(vec_col),
            nprobe=1, out_id=id_col, with_extras=True,
        ).select(id_col, "cell", "__v", "__n", F.col("__cs"))
    else:
        cent = _centroids_df(spark, centroids)
        if assign == "exact":
            assigned = ivf_assign(corpus, centroids, id_col, vec_col)
        elif assign == "two_level":
            # O(n·√k) coarse assignment through the super-cell tree —
            # the k ∝ n deployment's mitigation (SCALE.md r13 probe).
            # Cell ids are unchanged, so everything downstream is
            # identical; the approximation is WHICH cell a borderline
            # row lands in.
            assigned = ivf_assign_two_level(
                corpus, centroids, id_col, vec_col,
                branch=branch, probe_supers=probe_supers, tree=tree,
            )
        else:
            raise ValueError(
                f"assign must be 'exact' or 'two_level': {assign!r}"
            )
        scored = assigned.join(cent, assigned["cell"] == cent["cid"]).select(
            F.col(id_col),
            F.col("cell"),
            F.col("__v"),
            F.col("__n"),
            cosine_with_norms(
                F.col("__v"), F.col("cv"), F.col("__n"), F.col("__cn_c"), dim
            ).alias("__cs"),
        )
    if pair_backend == "arrow":
        # r16 (guide §4.2): the per-pair cosine was the operator's
        # dominant cost — an interpreted 64-element fold per candidate
        # pair inside the join (2.3 s of the 2.7 s row at sf0.1).  One
        # grouped Arrow pass computes every within-cell pair dot as
        # blocked vectorized numpy with the SAME left-to-right IEEE
        # accumulation (bit-identical; pinned vs the SQL backend and
        # the DuckDB oracle).  Same exchange count: the groupBy's
        # by-cell hash partition replaces the shared repartition(cell).
        # r16 batch 3: the pass emits EVERY row with its flag, so the
        # former by-id flag join-back — whose probe side re-ran the
        # whole corpus assignment (divergent pruning kept the two
        # subtrees from ever sharing a stage) — is gone: one corpus
        # pass, one exchange, zero joins.
        return _semdedup_flags_arrow(
            scored, id_col, tau, max_cell_rows=max_cell_rows
        ).select(id_col, "cell", "cent_sim", "is_semantic_dup")
    if pair_backend != "sql":
        raise ValueError(f"pair_backend must be 'arrow' or 'sql': {pair_backend!r}")
    # r16 (guide §2.4: share one exchange): the scored projection — the
    # k·dim centroid argmax per row, the operator's dominant per-row
    # cost — is consumed by BOTH pair-join sides; unpartitioned, each
    # side re-evaluates it from the scan (two argmax passes over the
    # corpus).  Hash-partitioning by cell ONCE gives the two sides
    # byte-identical exchange subtrees (same inferred isnotnull
    # filters, same pruned columns), which AQE's stage reuse evaluates
    # once at runtime — one argmax pass + one n-row (vec, 3 scalars)
    # shuffle instead of two corpus passes.  At 100 TB the trade runs
    # the same direction: k ∝ n makes the argmax the expensive term.
    # The final flag join-back keeps the UNpartitioned scored: its
    # column set prunes narrower (no vec/norm), so it could never
    # share the exchange, and adding the repartition there would just
    # stack a by-cell shuffle under its by-id one.
    scored_pair = scored.repartition(F.col("cell"))
    # plain-renamed join sides (no dataset aliases): the staged pair
    # scoring below appends columns with withColumn, after which
    # alias-qualified references would be ambiguous.  The renames sit
    # ABOVE the shared exchange and canonicalize names away, so reuse
    # is unaffected.
    left = scored_pair.select(
        F.col(id_col).alias("__ida"),
        F.col("cell").alias("__cella"),
        F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
        F.col("__cs").alias("__csa"),
    )
    right = scored_pair.select(
        F.col(id_col).alias("__idb"),
        F.col("cell").alias("__cellb"),
        F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
        F.col("__cs").alias("__csb"),
    )
    b_keeps = (F.col("__csb") < F.col("__csa")) | (
        (F.col("__csb") == F.col("__csa"))
        & (F.col("__idb") < F.col("__ida"))
    )
    # each unordered pair once (a < b), not both directions: the keep
    # rule is a strict total order on (cent_sim, id), so exactly one
    # member of a qualifying pair loses — the CASE below names it.
    # Halves the pairwise-cosine evaluations vs the a != b spelling
    # with bit-identical output (r14; the DuckDB oracle keeps the
    # symmetric spelling, pinning the equivalence).
    pairs = left.join(
        right,
        (F.col("__cella") == F.col("__cellb"))
        & (F.col("__ida") < F.col("__idb")),
    )
    # Pair similarity stays the zip_with/aggregate FOLD past the unroll
    # bound (dim through cosine_with_norms is None there) — a measured
    # r16 negative result, twice over:
    # - staging the dot as chunked 16-term projections (JIT-sized
    #   codegen methods, non-deterministic-tainted so the optimizer
    #   could not re-inline them) ran 4.86 s vs the fold's 2.57 s at
    #   sf0.1: the taint keeps the `>= tau` admission OUT of the join
    #   condition, so every within-cell pair materializes both 64-dim
    #   vectors through each staged projection, where the fold form
    #   evaluates inside the join and drops losers before any
    #   materialization;
    # - a 4-products-per-step chunked fold (same left-associated
    #   order, fewer lambda rebinds) ran 5.07 s: dynamic element_at
    #   plus the per-pair sequence() costs more than zip_with's
    #   paired traversal.
    pair_sim = cosine_with_norms(
        F.col("__va"), F.col("__vb"), F.col("__na"), F.col("__nb"), dim
    )
    losers = (
        pairs.filter(pair_sim >= F.lit(tau))
        .select(
            F.when(b_keeps, F.col("__ida"))
            .otherwise(F.col("__idb"))
            .alias(id_col)
        )
        .distinct()
    )
    return scored.join(
        losers.withColumn("__dup", F.lit(True)), id_col, "left"
    ).select(
        id_col,
        "cell",
        F.col("__cs").alias("cent_sim"),
        F.coalesce(F.col("__dup"), F.lit(False)).alias("is_semantic_dup"),
    )


# ---------------------------------------------------------------------------
# Two-level coarse assignment — the O(n·√k) mitigation for the O(n·k)
# flat-assignment term the SemDeDup 64x probe measured (SCALE.md r13:
# with k ∝ n the flat argmax is quadratic in n; a super-cell tree cuts
# per-row work from k to branch + k/branch cosines). Approximate by
# construction (the true nearest child can hang under a different
# super-cell — exactly IVF-tree / two-level-IMI semantics); every step
# reuses the deterministic primitives above, so the assignment is
# bit-stable across runs, partitionings, and engines.


def group_centroids(
    spark,
    centroids: Sequence[tuple[int, Sequence[float]]],
    branch: int | None = None,
    train_iters: int = 2,
) -> tuple[list[tuple[int, list[float]]], dict[int, int]]:
    """Train ``branch`` super-centroids OVER the centroid set and map
    each centroid to its super-cell — :func:`train_ivf_centroids` +
    :func:`ivf_assign` applied to the k-row centroid table (k rows =
    metadata-scale; the result ships to executors as plain data).
    Supers that win no children are dropped so downstream joins can be
    inner without losing rows. Returns ``(super_centroids,
    {cid: super_id})``."""
    if not centroids:
        raise ValueError("centroids must be non-empty")
    k = len(centroids)
    if branch is None:
        branch = max(1, math.isqrt(k))
    from pyspark.sql import Row

    cdf = spark.createDataFrame(
        [Row(vec_id=int(cid), embedding=[float(x) for x in cv]) for cid, cv in centroids],
        schema="vec_id int, embedding array<double>",
    )
    sups = train_ivf_centroids(cdf, k=min(branch, k), iters=train_iters)
    kids = ivf_assign(cdf, sups).select("vec_id", "cell").collect()  # k rows
    child_of = {int(r["vec_id"]): int(r["cell"]) for r in kids}
    live = {s for s in child_of.values()}
    return [s for s in sups if s[0] in live], child_of


def ivf_assign_two_level(
    corpus: DataFrame,
    centroids: Sequence[tuple[int, Sequence[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    branch: int | None = None,
    train_iters: int = 2,
    probe_supers: int = 3,
    tree: tuple[list[tuple[int, list[float]]], dict[int, int]] | None = None,
) -> DataFrame:
    """:func:`ivf_assign` through a super-cell tree: argmax over the
    ~√k super-centroids first, then argmax over ONLY the children of
    the row's ``probe_supers`` nearest super-cells — branch +
    probe_supers·k/branch cosines per row instead of k. Same output
    shape as :func:`ivf_assign` ``(id, __v, __n, cell)``; cell ids are
    the original centroid ids, so every consumer (SemDeDup, IVF top-k
    corpus side) composes unchanged. Every corpus row keeps an
    assignment: childless supers were dropped at grouping time, so the
    children join is a total map.

    ``probe_supers`` is the recall/cost dial (multi-probe IMI). On
    separated clusters — SemDeDup's actual regime — agreement with the
    flat argmax is exact (pinned in tests). The adversarial case is
    UNSTRUCTURED data, where the nearest child hangs under a runner-up
    super with probability ~child-overlap: on the random testdata
    embeddings (k=64, branch=8) agreement measured 0.56 / 0.74 / 0.84
    at probe_supers 1 / 2 / 3 — each step costs one more k/branch
    child scan per row. The default (3) is derived from that ladder:
    the smallest probe count whose measured unstructured agreement
    clears 0.8 (pinned in tests/test_two_level.py); drop to 1–2 only
    for corpora known to be cluster-separated.

    ``tree``: a precomputed ``(super_centroids, child_of)`` pair from
    :func:`group_centroids`. Pass it when composing several two-level
    consumers over the SAME centroid list (e.g. semantic_duplicates
    then ivf_topk) so the super-tree — a Spark training job plus a
    k-row collect — is derived once, not per call (r13 ADVICE).
    ``probe_supers < 1`` raises; only the upper bound is clamped (the
    live super count can legitimately shrink below the request when
    dead supers are dropped)."""
    spark = corpus.sparkSession
    if probe_supers < 1:
        raise ValueError(f"probe_supers must be >= 1: {probe_supers}")
    sups, child_of = (
        tree if tree is not None
        else group_centroids(spark, centroids, branch, train_iters)
    )
    probe_supers = min(probe_supers, len(sups))
    by_cid = dict((int(c), [float(x) for x in v]) for c, v in centroids)
    from pyspark.sql import Row

    dim = _centroid_dim(centroids)
    child_tbl = F.broadcast(
        spark.createDataFrame(
            [
                Row(sup=int(child_of[cid]), cid=int(cid), cv=by_cid[cid])
                for cid in sorted(child_of)
            ],
            schema="sup int, cid int, cv array<double>",
        ).withColumn("__cn_c", norm_expr(F.col("cv"), dim))
    )
    sup_assigned = _probe_cells(
        corpus, sups, id_col, as_double_array(vec_col), nprobe=probe_supers,
        out_id=id_col,
    ).withColumnRenamed("cell", "__sup")
    scored = sup_assigned.join(
        child_tbl, sup_assigned["__sup"] == child_tbl["sup"]
    ).select(
        id_col,
        "__v",
        "__n",
        "cid",
        cosine_with_norms(
            F.col("__v"), F.col("cv"), F.col("__n"), F.col("__cn_c"), dim
        ).alias("__csim"),
    )
    return _argmax_cell(scored, id_col)
