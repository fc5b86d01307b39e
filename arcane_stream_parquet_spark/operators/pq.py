"""Product quantization (Jégou, Douze, Schmid 2011: "Product
Quantization for Nearest Neighbor Search") — the COMPRESSION tier of
the similarity family, beside the exact baseline (cosine_topk), the
hyperplane buckets (ann_lsh_topk) and the coarse quantizer (ivf_topk).

Beyond-reference (the reference has no vector processing); part of the
LLM-data-pipeline family the task brief demands: at 100 TB an
``array<float>`` embedding column is 4·dim bytes/vector (256 B at
dim=64, 3 KB at dim=768) — the scan IS the cost. PQ splits each vector
into ``m`` contiguous subvectors, learns a tiny codebook per subspace,
and stores each vector as ``m`` small integer codes (m bytes at 256
codes): a 32–96× shrink of the scanned bytes, with query-time distance
computed by table lookup (ADC — asymmetric distance computation)
instead of dim multiplies.

Spark shapes (all JVM built-ins, no UDFs):

- training (:func:`train_pq_codebooks`): one frame holds every
  subspace's subvectors (row-local slice + posexplode); each Lloyd's
  iteration is ONE broadcast join against the (m·codes)-row codebook
  table + map-side argmin + one median aggregation — all m subspaces
  train in the same pass. Driver traffic per iteration: m·codes·(dim/m)
  = codes·dim doubles (metadata scale). At 100 TB: train on a bounded
  sample, pass codebooks in as plain data (same contract as the IVF
  centroids).
- encoding (:func:`pq_encode`): broadcast-join argmin per (row,
  subspace), collected back to one ``array<int>`` per row — the
  K-way expansion is reduced map-side before any wide operation
  (the :func:`_probe_cells` rationale: plan cost flat in the code
  count, unlike unrolling codes·dim literal arithmetic).
- search (:func:`pq_topk`): the query side builds its LUT (m × codes
  squared-L2 entries) through the same broadcast codebook join —
  |Q|-scale — and ships it broadcast; the corpus scan reads ONLY the
  m-byte code column and evaluates ``sum_s LUT[s][code_s]`` as a
  zip_with/element_at fold. The corpus never shuffles before top-k.

Determinism (the repo's oracle discipline): every distance is a
left-to-right squared-L2 fold (:func:`l2sq_expr` — bit-identical
across engines and partitionings, like dot_expr), argmins tie-break to
the LOWER code, and codebook updates are per-dimension MEDIANS
(order-independent), so training, codes, LUTs and ADC distances are
all reproducible bit-for-bit — pinned against an independent
pure-python reference and a DuckDB replay in tests/test_pq.py.

Accuracy contract (the two-level-IVF ladder discipline): PQ assumes a
CLUSTERED corpus — on well-separated clusters recall@5 is exact
(pinned). The adversarial case is unstructured data, where measured
recall@10 vs the exact scan on the random testdata embeddings (m=8,
r15 maxmin seeding) is 0.22 / 0.30 / 0.40 at 16 / 32 / 64 codes —
floors and monotonicity pinned. Both standard remedies ship:
:func:`pq_topk_rerank` (ADC shortlist → exact rerank; 0.80/0.92
recall@10 at shortlist 50/100) and :func:`ivfpq_build`/
:func:`ivfpq_topk` (cell-residual encoding — the Faiss IVFPQ shape,
candidates through a cell equi-join). The seeding trade, measured:
pre-r15 lowest-id init scored higher here (0.46 ADC / 0.92 rerank@50
— on unstructured data it IS a uniform sample, the ideal init) but
silently zeroed out unseeded modes on clustered-with-uncorrelated-ids
corpora (the 100 TB failure shape); maxmin guarantees every sampled
mode a seed, and the shortlist dial recovers the unstructured gap.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from arcane_stream_parquet_spark.operators.similarity import (
    _centroids_df,
    _probe_cells,
    _probe_cells_rowlocal,
    _rowlocal_ok,
    as_double_array,
    ivf_assign,
    unrollable,
)

#: default geometry: 8 subspaces × 16 codes = 4 bits/subspace, 64-dim
#: testdata → 8-dim subvectors. Production: m=dim/8..dim/4, codes=256.
PQ_M = 8
PQ_CODES = 16


def l2sq_expr(a: Column, b: Column, dim: int | None = None) -> Column:
    """Sequential left-to-right squared L2 distance (order fixed →
    deterministic float, matching a DuckDB list fold).

    ``dim`` (r16): unrolls the fold into the left-associated codegen
    chain ``((0.0 + (a0-b0)²) + (a1-b1)²) + ...`` — same additions,
    same order, bit-identical IEEE result (the dot_expr rationale:
    higher-order functions are CodegenFallback, interpreted per
    element; the unrolled chain whole-stage-codegens).  Only pass
    ``dim`` when both arrays are exactly that long."""
    if dim is not None:
        total = F.lit(0.0)
        for i in range(dim):
            d_i = F.get(a, i) - F.get(b, i)
            total = total + d_i * d_i
        return total
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _adc_expr(codes: Column, lut: Column, m: int) -> Column:
    """The ADC fold ``sum_s LUT[s][code_s]`` unrolled over the m
    subspaces: ``((0.0 + lut[0][c0]) + lut[1][c1]) + ...`` — same
    additions in the same order as the former zip_with/aggregate fold
    (``element_at(l, c + 1)`` 1-based ≡ ``get(l, c)`` 0-based), so the
    result is bit-identical while running in whole-stage codegen
    instead of the interpreted HOF path.  This is the per-candidate
    inner loop of every PQ scan — the expression a 100 TB ADC pass
    evaluates once per (query, candidate)."""
    total = F.lit(0.0)
    for s in range(m):
        total = total + F.get(F.get(lut, s), F.get(codes, s).cast("int"))
    return total


def _subvectors(vec: Column, m: int, dim: int) -> Column:
    """array of m contiguous subvector slices (row-local)."""
    d = dim // m
    return F.array(*[F.slice(vec, s * d + 1, d) for s in range(m)])


def _codebook_df(spark, codebooks: Sequence[Sequence[Sequence[float]]]):
    """Broadcast (sub, code, cv) table from plain nested lists."""
    from pyspark.sql import Row

    rows = [
        Row(sub=s, code=c, cv=[float(x) for x in cv])
        for s, book in enumerate(codebooks)
        for c, cv in enumerate(book)
    ]
    return F.broadcast(
        spark.createDataFrame(rows, schema="sub int, code int, cv array<double>")
    )


def _infer_dim(df: DataFrame, vec_col: str) -> int:
    row = df.select(F.size(vec_col).alias("d")).first()
    if row is None:
        raise ValueError("empty corpus")
    return int(row["d"])


def _check_geometry(dim: int, m: int) -> None:
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m} subspaces")


def _residual_expr(a: Column, b: Column, dim: int | None = None) -> Column:
    """Element-wise ``a - b`` as an array; with ``dim`` known the
    zip_with lambda is unrolled into a codegen CreateArray of the same
    per-element subtractions (bit-identical values)."""
    if dim is not None:
        return F.array(*[F.get(a, i) - F.get(b, i) for i in range(dim)])
    return F.zip_with(a, b, lambda x, y: x - y)


def _sub_rows(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    m: int,
    dim: int,
    carry: Sequence[str] = (),
) -> DataFrame:
    """(id, *carry, sub, sv): one row per (vector, subspace) —
    row-local.  ``carry`` columns ride along unchanged (constant per
    id by contract)."""
    return df.select(
        F.col(id_col).alias("__pid"),
        *[F.col(c) for c in carry],
        F.posexplode(_subvectors(as_double_array(vec_col), m, dim)).alias(
            "sub", "sv"
        ),
    )


def _argmin_code(scored: DataFrame, carry: Sequence[str] = ()) -> DataFrame:
    """(__pid, *carry, sub, code): per (row, subspace), the code with
    the smallest squared-L2 (ties → lower code) — max_by over the
    negated ordering so the partial aggregation collapses the code
    fan-out map-side (the _argmax_cell pattern).  ``carry`` columns
    (constant per id) survive via ``first``."""
    ordering = F.struct(
        (-F.col("__l2")).alias("s"), (-F.col("code")).alias("nc")
    )
    return scored.groupBy("__pid", "sub").agg(
        F.max_by(F.col("code"), ordering).alias("code"),
        *[F.first(c).alias(c) for c in carry],
    )


#: farthest-point seeding trains over at most this many sample rows —
#: collected driver-side (sample_cap·dim doubles, metadata scale).
PQ_SEED_SAMPLE_CAP = 1024


def _maxmin_seeds(
    sample: list[tuple[int, list[float]]], codes: int, m: int, d: int
) -> list[list[list[float]]]:
    """Deterministic farthest-point (maxmin) seeds per subspace: start
    from the lowest-id sample row, then repeatedly add the point whose
    minimum squared-L2 distance to the chosen seeds is LARGEST (ties →
    lower id) — the k-center greedy, so EVERY mode present in the
    sample gets a seed before any mode gets two (the coverage
    guarantee the pre-r15 lowest-id init lacked). A trimmed variant
    (skip the top decile most-isolated picks) was measured and
    REJECTED: it bought only +0.02 rerank recall on unstructured data
    while silently breaking the guarantee for modes smaller than the
    trim decile. Pure python over the collected sample, same
    left-to-right float fold as :func:`l2sq_expr` — data-ordered, no
    randomness, so training stays engine-reproducible."""

    def l2(a: list[float], b: list[float]) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return acc

    books: list[list[list[float]]] = []
    for s in range(m):
        pts = [(pid, v[s * d : (s + 1) * d]) for pid, v in sample]
        chosen = [pts[0][1]]
        mind = {pid: l2(sv, chosen[0]) for pid, sv in pts}
        while len(chosen) < codes:
            nxt = max(pts, key=lambda p: (mind[p[0]], -p[0]))[1]
            chosen.append(nxt)
            for pid, sv in pts:
                dnew = l2(sv, nxt)
                if dnew < mind[pid]:
                    mind[pid] = dnew
        books.append([list(c) for c in chosen])
    return books


def train_pq_codebooks(
    corpus: DataFrame,
    m: int = PQ_M,
    codes: int = PQ_CODES,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_cap: int = PQ_SEED_SAMPLE_CAP,
) -> list[list[list[float]]]:
    """Per-subspace Lloyd's k-medians: assignment = squared-L2 argmin
    against the current codebook (broadcast join + map-side max_by —
    ALL subspaces in one pass), update = per-dimension median of each
    (subspace, code) cell (order-independent → engine-reproducible,
    the train_ivf_centroids rationale). Empty cells keep their
    previous code vector; an all-zero median is a LEGITIMATE code in
    squared-L2 space (residuals cluster at zero — the cosine trainers'
    zero-direction guard does NOT apply here, r14 ADVICE). Returns
    ``codebooks[sub][code] -> list[float]`` (plain data — train on a
    bounded sample at 100 TB and pass it in).

    SEEDING (r14 verdict item 4): deterministic farthest-point —
    maxmin over a bounded sample (:func:`_maxmin_seeds`), starting
    from the lowest-id row, ties → lower id. The pre-r15 "lowest
    ``codes`` ids" init let a data mode absent from the first rows
    never win a code (hard k-medians can't split an occupied code),
    collapsing that mode's candidates into one giant ADC tie —
    measured recall@10 = 0.0 for unseeded clusters in
    scripts/pq_probe.py's hash-assigned variant. Maxmin guarantees
    every mode REPRESENTED IN THE SAMPLE gets a seed before any mode
    gets two. The sample is the ``sample_cap`` lowest-sha256(id) rows
    (hash order decorrelates from any id↔mode correlation; the whole
    corpus when it fits), collected driver-side — sample_cap·dim
    doubles, metadata scale."""
    dim = _infer_dim(corpus, vec_col)
    _check_geometry(dim, m)
    d = dim // m
    base = corpus.select(
        F.col(id_col).alias("__pid"), as_double_array(vec_col).alias("__pv")
    )
    sample_rows = (
        base.orderBy(F.sha2(F.col("__pid").cast("string"), 256), "__pid")
        .limit(sample_cap)
        .collect()
    )  # the whole corpus when it fits under the cap
    if len(sample_rows) < codes:
        raise ValueError(f"need >= {codes} rows to seed {codes} codes")
    sample_rows.sort(key=lambda r: r["__pid"])
    sample = [
        (int(r["__pid"]), [float(x) for x in r["__pv"]]) for r in sample_rows
    ]
    books = _maxmin_seeds(sample, codes, m, d)
    subs = _sub_rows(
        base, "__pid", "__pv", m, dim
    )
    spark = corpus.sparkSession
    for _ in range(iters):
        cb = _codebook_df(spark, books)
        scored = subs.join(cb, subs["sub"] == cb["sub"]).select(
            "__pid",
            subs["sub"].alias("sub"),
            "sv",
            "code",
            l2sq_expr(F.col("sv"), F.col("cv"), unrollable(d)).alias("__l2"),
        )
        assigned = _argmin_code(scored).join(
            subs, ["__pid", "sub"]
        )
        med = (
            assigned.select(
                "sub", "code", F.posexplode("sv").alias("pos", "val")
            )
            .groupBy("sub", "code", "pos")
            .agg(F.median("val").alias("m"))
            .collect()
        )  # m·codes·d doubles — metadata scale
        by_cell: dict[tuple[int, int], dict[int, float]] = {}
        for r in med:
            by_cell.setdefault((int(r["sub"]), int(r["code"])), {})[
                int(r["pos"])
            ] = float(r["m"])

        def _next(s: int, c: int, old: list[float]) -> list[float]:
            cell = by_cell.get((s, c))
            if cell is None:
                return old  # empty cell: keep previous seed
            # NOTE: an all-zero median is kept — zero is a valid L2
            # code (the densest one in residual space); the cosine
            # trainers' zero-direction guard does not apply here.
            return [cell[p] for p in range(len(old))]

        books = [
            [_next(s, c, old) for c, old in enumerate(book)]
            for s, book in enumerate(books)
        ]
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: Sequence[Sequence[Sequence[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pq_codes",
    carry: Sequence[str] = (),
) -> DataFrame:
    """(id, pq_codes array<int>, *carry): each vector's per-subspace
    squared-L2 argmin code (ties → lower code). The stored
    representation is m·log2(codes) bits per vector — the column a
    100 TB ANN scan actually reads.

    ``carry`` (r16): extra input columns, constant per id, that ride
    through the encode instead of being re-derived and joined back by
    the caller — ivfpq_build carries ``cell`` this way, which removes
    a full second corpus-assignment subtree (scan → centroid argmax →
    join) from the index plan (guide §2.4: remove shuffles outright)."""
    m = len(codebooks)
    dim = sum(len(book[0]) for book in codebooks)
    _check_geometry(dim, m)
    subs = _sub_rows(corpus, id_col, vec_col, m, dim, carry=carry)
    cb = _codebook_df(corpus.sparkSession, codebooks)
    scored = subs.join(cb, subs["sub"] == cb["sub"]).select(
        "__pid",
        *carry,
        subs["sub"].alias("sub"),
        "code",
        l2sq_expr(F.col("sv"), F.col("cv"), unrollable(dim // m)).alias("__l2"),
    )
    return (
        _argmin_code(scored, carry=carry)
        .groupBy("__pid")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("sub"), F.col("code")))
                ),
                lambda st: st["code"],
            ).alias(out_col),
            *[F.first(c).alias(c) for c in carry],
        )
        .select(F.col("__pid").alias(id_col), out_col, *carry)
    )


def pq_topk(
    corpus_codes: DataFrame,
    queries: DataFrame,
    codebooks: Sequence[Sequence[Sequence[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes_col: str = "pq_codes",
) -> DataFrame:
    """ADC top-k: per query, the k nearest corpus codes by
    ``sum_s LUT[s][code_s]`` where ``LUT[s][c] = l2sq(query_sub_s,
    codebook[s][c])`` — (query_id, neighbor_id, adc_l2sq), ascending
    distance, ties → lower neighbor id. Approximate by construction
    (distances are to the RECONSTRUCTED corpus vector); standard
    deployments rerank the top-k' candidates with exact vectors.

    The LUT is built per query through the broadcast codebook join
    (|Q|·m·codes rows — query-scale), assembled into one
    ``array<array<double>>`` per query, and broadcast; the corpus side
    reads ONLY its code column and folds m lookups per row — no
    corpus shuffle before the per-query top-k window."""
    m = len(codebooks)
    dim = sum(len(book[0]) for book in codebooks)
    _check_geometry(dim, m)
    from pyspark.sql import Window

    qsubs = _sub_rows(queries, id_col, vec_col, m, dim).withColumnRenamed(
        "__pid", "query_id"
    )
    cb = _codebook_df(queries.sparkSession, codebooks)
    lut_rows = qsubs.join(cb, qsubs["sub"] == cb["sub"]).select(
        "query_id",
        qsubs["sub"].alias("sub"),
        "code",
        l2sq_expr(F.col("sv"), F.col("cv"), unrollable(dim // m)).alias("__l2"),
    )
    lut = (
        lut_rows.groupBy("query_id", "sub")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("code"), F.col("__l2")))
                ),
                lambda st: st["__l2"],
            ).alias("__sl")
        )
        .groupBy("query_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("sub"), F.col("__sl")))
                ),
                lambda st: st["__sl"],
            ).alias("__lut")
        )
    )
    adc = _adc_expr(F.col(codes_col), F.col("__lut"), m)
    joined = (
        corpus_codes.withColumnRenamed(id_col, "neighbor_id")
        .crossJoin(F.broadcast(lut))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", adc.alias("__adc"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__adc").asc(), F.col("neighbor_id").asc()
    )
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", F.col("__adc").alias("adc_l2sq"))
    )


def pq_topk_rerank(
    corpus: DataFrame,
    corpus_codes: DataFrame,
    queries: DataFrame,
    codebooks: Sequence[Sequence[Sequence[float]]],
    k: int = 10,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes_col: str = "pq_codes",
) -> DataFrame:
    """The standard PQ deployment: ADC over the compressed column
    produces a ``shortlist`` of candidates per query (the cheap,
    full-corpus pass), then EXACT squared-L2 reranks only those
    ``|Q|·shortlist`` rows against the uncompressed vectors —
    (query_id, neighbor_id, l2sq), ascending, ties → lower id.

    Equivalences that pin correctness: with ``shortlist >= |corpus|-1``
    the output is EXACTLY the exact scan's top-k (including tie
    order); at any shortlist, every returned distance is bit-identical
    to the exact scan's (the rerank computes the same left-to-right
    fold). Recall@k equals the shortlist's ADC recall@shortlist —
    the quality dial costs |Q|·shortlist exact distances instead of
    |Q|·n.

    Scale shape: the candidate set (|Q|·shortlist ids) is broadcast
    back against the corpus, so the full-width vector column is read
    ONLY for candidate rows (stats/bloom-pruned when the corpus is a
    merge target keyed on ``id_col``); nothing corpus-sized shuffles."""
    cand = pq_topk(
        corpus_codes, queries, codebooks, k=shortlist,
        id_col=id_col, vec_col=vec_col, codes_col=codes_col,
    )
    dim = sum(len(book[0]) for book in codebooks)
    return exact_rerank(corpus, cand, queries, k, id_col, vec_col, dim=dim)


def exact_rerank(
    corpus: DataFrame,
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact squared-L2 rerank of ANY ``(query_id, neighbor_id)``
    candidate frame (a flat-PQ or IVF-PQ shortlist, LSH bucket
    output, ...): candidate ids broadcast back against the corpus, so
    the full-width vector column is read for candidate rows only —
    (query_id, neighbor_id, l2sq), ascending, ties → lower id.
    ``dim`` unrolls the distance fold when the vector length is known
    statically (see :func:`l2sq_expr`) — bit-identical results."""
    from pyspark.sql import Window

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double_array(vec_col).alias("__cv"),
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            as_double_array(vec_col).alias("__qv"),
        )
    )
    scored = (
        c.join(
            F.broadcast(candidates.select("query_id", "neighbor_id")),
            "neighbor_id",
        )
        .join(q, "query_id")
        .select(
            "query_id",
            "neighbor_id",
            l2sq_expr(F.col("__qv"), F.col("__cv"), unrollable(dim)).alias("__d"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__d").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", F.col("__d").alias("l2sq"))
    )


# ---------------------------------------------------------------------------
# IVF-PQ: the full production vector-index shape (Jégou et al. 2011
# §IV; the Faiss IVFPQ index). The coarse quantizer (ivf_assign)
# restricts each query to nprobe cells, and PQ encodes each vector's
# RESIDUAL against its cell centroid — residuals have far smaller
# spread than raw vectors, so the same code budget quantizes finer.
# The identity that makes per-cell LUTs exact up to quantization:
# within a cell c, ||q - x||^2 = ||(q - c) - (x - c)||^2, so ADC over
# residual codebooks with the QUERY's residual-per-probed-cell
# approximates the true distance with no cross-cell bias.


def ivfpq_build(
    corpus: DataFrame,
    centroids: Sequence[tuple[int, Sequence[float]]],
    m: int = PQ_M,
    codes: int = PQ_CODES,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[list[float]]]]:
    """Build the IVF-PQ index: assign every vector to its nearest
    centroid cell (:func:`ivf_assign` — the SAME assignment every IVF
    consumer uses), compute residuals row-locally, train ONE shared
    residual codebook set, and encode. Returns
    ``((id, cell, pq_codes) DataFrame, codebooks)`` — the stored index
    is m·log2(codes) bits + a small cell id per vector.

    Scale shape: assignment is the broadcast argmax (one n-row
    shuffle); residuals are a row-local zip_with; training/encoding
    are the :func:`train_pq_codebooks`/:func:`pq_encode` shapes. At
    100 TB train on a bounded sample and pass the books to an
    encode-only pass."""
    spark = corpus.sparkSession
    rdim = unrollable(len(centroids[0][1])) if centroids else None
    if _rowlocal_ok(centroids):
        # r16: assignment + the winning centroid's vector in one
        # row-local projection (no centroid join, no argmax exchange);
        # the residual subtracts the SAME floats the broadcast join
        # would deliver, so codes are bit-identical
        assigned = _probe_cells_rowlocal(
            corpus, centroids, id_col, as_double_array(vec_col),
            nprobe=1, out_id=id_col, with_extras=True,
        )
        res = assigned.select(
            F.col(id_col),
            F.col("cell"),
            _residual_expr(F.col("__v"), F.col("__cv"), rdim).alias("__res"),
        )
    else:
        assigned = ivf_assign(corpus, centroids, id_col, vec_col)
        cent = _centroids_df(spark, centroids)
        res = assigned.join(cent, assigned["cell"] == cent["cid"]).select(
            F.col(id_col),
            F.col("cell"),
            _residual_expr(F.col("__v"), F.col("cv"), rdim).alias("__res"),
        )
    books = train_pq_codebooks(
        res, m=m, codes=codes, iters=iters, id_col=id_col, vec_col="__res"
    )
    # cell rides through the encode (pq_encode carry) instead of a
    # join back against a SECOND evaluation of the assignment subtree
    # (scan → centroid argmax → centroid join): one corpus pass fewer
    # in every index build/serving plan (r16, guide §2.4)
    encoded = pq_encode(
        res, books, id_col=id_col, vec_col="__res", carry=("cell",)
    )
    return encoded.select(id_col, "cell", "pq_codes"), books


def ivfpq_topk(
    corpus_index: DataFrame,
    queries: DataFrame,
    centroids: Sequence[tuple[int, Sequence[float]]],
    codebooks: Sequence[Sequence[Sequence[float]]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes_col: str = "pq_codes",
    probed: DataFrame | None = None,
) -> DataFrame:
    """ADC top-k through the coarse quantizer: each query probes its
    ``nprobe`` nearest cells (cosine, the ivf_topk rule), builds one
    residual LUT PER PROBED CELL (|Q|·nprobe·m·codes rows — query
    scale), and meets the corpus through an EQUI-JOIN on cell — only
    ~nprobe/K of the corpus is scanned per query, each candidate row
    costing m lookups over its code column. (query_id, neighbor_id,
    adc_l2sq), ascending, ties → lower id.

    ``probed`` short-circuits the query-side cell probe with a
    precomputed ``_probe_cells`` frame (columns query_id, __v, cell) —
    the single-probe contract for callers that ALSO need the probed
    cells (PQVectorIndex.search prunes its manifest with the same
    frame; ``nprobe`` is ignored then)."""
    m = len(codebooks)
    dim = sum(len(book[0]) for book in codebooks)
    _check_geometry(dim, m)
    from pyspark.sql import Window

    spark = queries.sparkSession
    rdim = unrollable(len(centroids[0][1])) if centroids else None
    if probed is None and _rowlocal_ok(centroids):
        # r16: probe + per-probed-cell centroid vector in one row-local
        # projection — the query-side residual needs no centroid join
        qres = _probe_cells_rowlocal(
            queries, centroids, id_col, as_double_array(vec_col),
            nprobe=nprobe, out_id="query_id", with_extras=True,
            # sql backend: the query side is |Q|-bounded by design
            # (LUTs scale |Q|·nprobe·m·codes), below the arrow
            # assignment's crossover (similarity.py)
            backend="sql",
        ).select(
            "query_id",
            "cell",
            _residual_expr(F.col("__v"), F.col("__cv"), rdim).alias("__qr"),
        )
    else:
        qcells = (
            probed
            if probed is not None
            else _probe_cells(
                queries, centroids, id_col, as_double_array(vec_col),
                nprobe=nprobe, out_id="query_id",
            )
        )
        cent = _centroids_df(spark, centroids)
        qres = qcells.join(cent, qcells["cell"] == cent["cid"]).select(
            "query_id",
            "cell",
            _residual_expr(F.col("__v"), F.col("cv"), rdim).alias("__qr"),
        )
    qsubs = qres.select(
        "query_id",
        "cell",
        F.posexplode(_subvectors(F.col("__qr"), m, dim)).alias("sub", "sv"),
    )
    cb = _codebook_df(spark, codebooks)
    lut_rows = qsubs.join(cb, qsubs["sub"] == cb["sub"]).select(
        "query_id",
        "cell",
        qsubs["sub"].alias("sub"),
        "code",
        l2sq_expr(F.col("sv"), F.col("cv"), unrollable(dim // m)).alias("__l2"),
    )
    lut = (
        lut_rows.groupBy("query_id", "cell", "sub")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("code"), F.col("__l2")))
                ),
                lambda st: st["__l2"],
            ).alias("__sl")
        )
        .groupBy("query_id", "cell")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("sub"), F.col("__sl")))
                ),
                lambda st: st["__sl"],
            ).alias("__lut")
        )
    )
    adc = _adc_expr(F.col(codes_col), F.col("__lut"), m)
    joined = (
        corpus_index.withColumnRenamed(id_col, "neighbor_id")
        .join(F.broadcast(lut), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", adc.alias("__adc"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__adc").asc(), F.col("neighbor_id").asc()
    )
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", F.col("__adc").alias("adc_l2sq"))
    )
