"""r16 optimization pins: the dim-unrolled codegen forms of the
similarity/PQ distance folds must be BIT-identical to the generic
higher-order-function folds they replace (same IEEE additions in the
same left-to-right order — see dot_expr/l2sq_expr docstrings).

The driver oracle then re-proves the same equivalence end-to-end
(every similarity/PQ registry row vs DuckDB); this is the focused
per-expression pin so a future edit that reorders the chain fails
here first, with a readable diff.
"""

from __future__ import annotations

import math
import struct

import pytest
from pyspark.sql import functions as F

from arcane_stream_parquet_spark.operators.pq import (
    _adc_expr,
    _residual_expr,
    l2sq_expr,
)
from arcane_stream_parquet_spark.operators.similarity import (
    cosine_with_norms,
    dot_expr,
    norm_expr,
)


def _vec(seed: int, dim: int) -> list[float]:
    """Deterministic awkward floats: mixed signs, magnitudes, zeros."""
    out = []
    for i in range(dim):
        h = (seed * 1_000_003 + i * 7919) % 104729
        x = (h / 104729.0 - 0.5) * (10.0 ** ((h % 7) - 3))
        if h % 13 == 0:
            x = 0.0
        out.append(x)
    return out


def _bits(x) -> bytes:
    if x is None:
        return b"null"
    return struct.pack("<d", float(x))


@pytest.mark.parametrize("dim", [1, 16, 64])
def test_dot_and_l2sq_unrolled_bit_identical(spark, dim):
    rows = [(i, _vec(i, dim), _vec(i + 100, dim)) for i in range(50)]
    df = spark.createDataFrame(
        rows, schema="id int, a array<double>, b array<double>"
    )
    got = df.select(
        dot_expr(F.col("a"), F.col("b")).alias("dot_fold"),
        dot_expr(F.col("a"), F.col("b"), dim).alias("dot_unrolled"),
        l2sq_expr(F.col("a"), F.col("b")).alias("l2_fold"),
        l2sq_expr(F.col("a"), F.col("b"), dim).alias("l2_unrolled"),
        norm_expr(F.col("a")).alias("n_fold"),
        norm_expr(F.col("a"), dim).alias("n_unrolled"),
    ).collect()
    for r in got:
        assert _bits(r["dot_fold"]) == _bits(r["dot_unrolled"])
        assert _bits(r["l2_fold"]) == _bits(r["l2_unrolled"])
        assert _bits(r["n_fold"]) == _bits(r["n_unrolled"])


def test_cosine_with_norms_unrolled_bit_identical(spark):
    dim = 64
    rows = [(i, _vec(i, dim), _vec(i + 7, dim)) for i in range(50)]
    df = spark.createDataFrame(
        rows, schema="id int, a array<double>, b array<double>"
    ).select(
        "a",
        "b",
        norm_expr(F.col("a")).alias("na"),
        norm_expr(F.col("b")).alias("nb"),
    )
    got = df.select(
        cosine_with_norms(
            F.col("a"), F.col("b"), F.col("na"), F.col("nb")
        ).alias("fold"),
        cosine_with_norms(
            F.col("a"), F.col("b"), F.col("na"), F.col("nb"), dim
        ).alias("unrolled"),
    ).collect()
    for r in got:
        assert _bits(r["fold"]) == _bits(r["unrolled"])
        assert not math.isnan(r["unrolled"])


def test_adc_expr_matches_fold(spark):
    m, codes = 4, 8
    rows = []
    for i in range(40):
        lut = [[float(_vec(i * m + s, codes)[c]) for c in range(codes)] for s in range(m)]
        cds = [int((i * 31 + s * 7) % codes) for s in range(m)]
        rows.append((i, cds, lut))
    df = spark.createDataFrame(
        rows, schema="id int, pq_codes array<int>, lut array<array<double>>"
    )
    fold = F.aggregate(
        F.zip_with(
            F.col("pq_codes"),
            F.col("lut"),
            lambda c, l: F.element_at(l, c.cast("int") + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    got = df.select(
        fold.alias("fold"),
        _adc_expr(F.col("pq_codes"), F.col("lut"), m).alias("unrolled"),
    ).collect()
    for r in got:
        assert _bits(r["fold"]) == _bits(r["unrolled"])


def test_residual_expr_matches_zip_with(spark):
    dim = 64
    rows = [(i, _vec(i, dim), _vec(i + 3, dim)) for i in range(30)]
    df = spark.createDataFrame(
        rows, schema="id int, a array<double>, b array<double>"
    )
    got = df.select(
        _residual_expr(F.col("a"), F.col("b")).alias("fold"),
        _residual_expr(F.col("a"), F.col("b"), dim).alias("unrolled"),
    ).collect()
    for r in got:
        assert len(r["fold"]) == len(r["unrolled"]) == dim
        for x, y in zip(r["fold"], r["unrolled"]):
            assert _bits(x) == _bits(y)


def _toy_corpus(spark, n=60, dim=8):
    rows = [(i, _vec(i, dim)) for i in range(n)]
    return spark.createDataFrame(rows, schema="vec_id int, embedding array<double>")


@pytest.mark.parametrize("nprobe", [1, 2, 3])
def test_rowlocal_probe_matches_broadcast_path(spark, nprobe):
    """The r16 literal-centroid row-local assignment must reproduce the
    broadcast-join + max_by / window path bit-for-bit: same cells, same
    per-row probe sets, same similarity floats — including exact-tie
    and duplicate-centroid cases."""
    from pyspark.sql import functions as F

    from arcane_stream_parquet_spark.operators.similarity import (
        _probe_cells,
        _probe_cells_rowlocal,
        _rowlocal_ok,
        as_double_array,
    )

    dim = 8
    corpus = _toy_corpus(spark, dim=dim)
    # centroid 3 duplicates centroid 1's vector -> every row ties
    # exactly between them; the (s, nc) ordering must pick cid 1
    base = [_vec(1000 + c, dim) for c in range(4)]
    base[3] = list(base[1])
    cents = [(c, v) for c, v in enumerate(base)]
    assert _rowlocal_ok(cents)

    fast = _probe_cells_rowlocal(
        corpus, cents, "vec_id", as_double_array("embedding"),
        nprobe=nprobe, out_id="vec_id",
    )
    # force the generic path by calling past the gate
    slow = _probe_cells.__wrapped__ if hasattr(_probe_cells, "__wrapped__") else None
    from arcane_stream_parquet_spark.operators import similarity as sim_mod

    orig = sim_mod.ROWLOCAL_ASSIGN_MAX_VALUES
    sim_mod.ROWLOCAL_ASSIGN_MAX_VALUES = 0
    try:
        slow_df = _probe_cells(
            corpus, cents, "vec_id", as_double_array("embedding"),
            nprobe=nprobe, out_id="vec_id",
        )
        slow_rows = sorted(
            (r["vec_id"], r["cell"], _bits(r["__n"]))
            for r in slow_df.select("vec_id", "cell", "__n").collect()
        )
    finally:
        sim_mod.ROWLOCAL_ASSIGN_MAX_VALUES = orig
    fast_rows = sorted(
        (r["vec_id"], r["cell"], _bits(r["__n"]))
        for r in fast.select("vec_id", "cell", "__n").collect()
    )
    assert fast_rows == slow_rows
    if nprobe == 1:
        # tie rule: the duplicate centroid pair (1, 3) must always
        # resolve to the LOWER cid in both paths (at nprobe >= 2 the
        # duplicate legitimately fills the next probe slot)
        assert all(c != 3 for _, c, _n in fast_rows)
    # extras: __cs is the winning similarity, __cv the winning centroid
    ex = _probe_cells_rowlocal(
        corpus, cents, "vec_id", as_double_array("embedding"),
        nprobe=1, out_id="vec_id", with_extras=True,
    ).collect()
    by_cid = dict(cents)
    for r in ex:
        assert r["__cv"] == by_cid[r["cell"]]
        assert not (r["__cs"] is None)


@pytest.mark.parametrize("nprobe", [1, 3])
def test_rowlocal_arrow_backend_matches_sql(spark, nprobe):
    """r16: the vectorized-Arrow assignment must equal the literal-
    projection SQL form bit-for-bit — ids, probe sets, norm and
    similarity BITS, extras — including the degenerate rows the
    equivalence argument calls out (NULL vector → lowest cids with
    NULL cs and NULL norm; duplicate centroids tie to the lower
    cid)."""
    from pyspark.sql import functions as F  # noqa: F401

    from arcane_stream_parquet_spark.operators.similarity import (
        _probe_cells_rowlocal,
        as_double_array,
    )

    dim = 8
    corpus = _toy_corpus(spark, dim=dim)
    edge = spark.createDataFrame(
        [(1001, None)], schema="vec_id int, embedding array<double>"
    )
    corpus = corpus.unionByName(edge)
    base = [_vec(1000 + c, dim) for c in range(4)]
    base[3] = list(base[1])
    cents = [(c, v) for c, v in enumerate(base)]

    def rows(backend):
        df = _probe_cells_rowlocal(
            corpus, cents, "vec_id", as_double_array("embedding"),
            nprobe=nprobe, out_id="vec_id", with_extras=True,
            backend=backend,
        )
        out = []
        for r in df.select("vec_id", "cell", "__n", "__cs", "__cv").collect():
            out.append(
                (
                    r["vec_id"],
                    r["cell"],
                    None if r["__n"] is None else _bits(r["__n"]),
                    None if r["__cs"] is None else _bits(r["__cs"]),
                    tuple(r["__cv"]) if r["__cv"] is not None else None,
                )
            )
        return sorted(out)

    a, s = rows("arrow"), rows("sql")
    assert a == s
    # NULL vector: lowest cids, NULL norm/similarity
    null_rows = [t for t in a if t[0] == 1001]
    assert [t[1] for t in null_rows] == list(range(nprobe))
    assert all(t[2] is None and t[3] is None for t in null_rows)


def test_rowlocal_arrow_backend_raises_on_degenerate_floats(spark):
    """A zero vector makes the sql backend's ANSI cosine raise
    DIVIDE_BY_ZERO — the arrow backend must fail the job too, not
    silently emit NaN assignments.  A NaN-component vector produces
    NaN similarities the Arrow return path would null (diverging from
    the sql form's NaN-ranks-greatest) — the arrow backend must raise
    rather than diverge."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import (
        ArithmeticException,
        PythonException,
    )

    from arcane_stream_parquet_spark.operators.similarity import (
        _probe_cells_rowlocal,
        as_double_array,
    )

    dim = 8
    cents = [(c, _vec(1000 + c, dim)) for c in range(4)]
    for bad_vec, backends in (
        ([0.0] * dim, (("arrow", (PythonException, Py4JJavaError)),
                       ("sql", (ArithmeticException, Py4JJavaError)))),
        ([float("nan")] * dim, (("arrow", (PythonException, Py4JJavaError)),)),
    ):
        corpus = spark.createDataFrame(
            [(1, bad_vec)], schema="vec_id int, embedding array<double>"
        )
        for backend, exc in backends:
            df = _probe_cells_rowlocal(
                corpus, cents, "vec_id", as_double_array("embedding"),
                nprobe=1, out_id="vec_id", backend=backend,
            )
            with _pytest.raises(exc):
                df.collect()


def test_short_arrays_null_both_forms(spark):
    """Arrays SHORTER than dim: both forms must agree (null via
    null-propagation — F.get out-of-bounds is NULL, zip_with pads
    NULL), so a bad dim fails loudly in parity, not silently."""
    df = spark.createDataFrame(
        [(1, [1.0, 2.0], [3.0, 4.0])],
        schema="id int, a array<double>, b array<double>",
    )
    got = df.select(
        dot_expr(F.col("a"), F.col("b"), 4).alias("unrolled"),
    ).collect()[0]
    assert got["unrolled"] is None
