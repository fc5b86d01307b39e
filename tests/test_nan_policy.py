"""r17 robustness pins for the vectorized-Arrow twins:

- wrong-length vectors mirror the sql backend at BOTH dims (unrolled
  F.get truncation at dim <= UNROLL_MAX_DIM, fold null-padding above it
  — the r16 ADVICE divergence);
- ``nan_policy="sql"`` quarantines NULL/NaN/inf-element vectors through
  the sql expression forms, bit-identical to a pure sql run, while the
  default stays fail-loud;
- the SemDeDup grouped pair pass bounds per-cell task size
  (``max_cell_rows`` skew guard) and raises on NaN cent_sim even in
  singleton cells.
"""

from __future__ import annotations

import math
import struct

import pytest
from py4j.protocol import Py4JJavaError
from pyspark.sql import functions as F
from pyspark.errors.exceptions.captured import PythonException

from arcane_stream_parquet_spark.operators.similarity import (
    UNROLL_MAX_DIM,
    _probe_cells_rowlocal,
    _semdedup_flags_arrow,
    as_double_array,
    semantic_duplicates,
    with_lsh_bucket,
)


def _vec(seed: int, dim: int) -> list[float]:
    out = []
    for i in range(dim):
        h = (seed * 1_000_003 + i * 7919) % 104729
        x = (h / 104729.0 - 0.5) * (10.0 ** ((h % 7) - 3))
        if h % 13 == 0:
            x = 0.0
        out.append(x)
    return out


def _bits(x):
    return b"null" if x is None else struct.pack("<d", float(x))


def _assign_rows(spark, corpus, cents, backend, nprobe=2, **kw):
    df = _probe_cells_rowlocal(
        corpus, cents, "vec_id", as_double_array("embedding"),
        nprobe=nprobe, out_id="vec_id", with_extras=True,
        backend=backend, **kw,
    )
    out = []
    for r in df.select("vec_id", "cell", "__n", "__cs", "__cv").collect():
        out.append(
            (
                r["vec_id"],
                r["cell"],
                _bits(r["__n"]),
                _bits(r["__cs"]),
                tuple(r["__cv"]) if r["__cv"] is not None else None,
            )
        )
    return sorted(out)


@pytest.mark.parametrize("dim", [8, 40])
def test_wrong_length_vectors_match_sql_backend(spark, dim):
    """ADVICE r16 (medium): overlong vectors TRUNCATE under the
    unrolled sql form (dim <= UNROLL_MAX_DIM) but null-pad under the
    fold — the arrow twin must mirror whichever form the sql backend
    uses at this dim, including the norm."""
    assert (dim <= UNROLL_MAX_DIM) == (dim == 8)
    cents = [(c, _vec(1000 + c, dim)) for c in range(4)]
    corpus = spark.createDataFrame(
        [
            (1, _vec(1, dim)),                  # exact length
            (2, _vec(2, dim) + [7.5, -2.0]),    # overlong
            (3, _vec(3, dim)[: dim - 2]),       # short
            (4, None),                          # null vector
        ],
        "vec_id int, embedding array<double>",
    )
    a = _assign_rows(spark, corpus, cents, "arrow")
    s = _assign_rows(spark, corpus, cents, "sql")
    assert a == s
    by_id = {}
    for t in a:
        by_id.setdefault(t[0], []).append(t)
    if dim <= UNROLL_MAX_DIM:
        # overlong row got a REAL (truncated) assignment, short row a
        # NULL norm + degenerate lowest-cid cells
        assert all(t[3] != b"null" for t in by_id[2])
        assert all(t[2] == b"null" and t[3] == b"null" for t in by_id[3])
    else:
        # fold form: wrong length keeps the TRUE full-vector norm but
        # degenerate cells
        assert all(t[2] != b"null" and t[3] == b"null" for t in by_id[2])
        assert all(t[2] != b"null" and t[3] == b"null" for t in by_id[3])
        assert [t[1] for t in by_id[2]] == [0, 1]


@pytest.mark.parametrize("dim", [8, 40])
def test_assignment_nan_policy_sql_matches_pure_sql(spark, dim):
    """VERDICT r16 item 5: with nan_policy="sql" the arrow backend must
    equal a pure sql run bit-for-bit on a corpus carrying NaN / NULL
    element / inf rows — and clean rows still ride the udf."""
    cents = [(c, _vec(1000 + c, dim)) for c in range(4)]
    nanv = _vec(5, dim)
    nanv[dim // 2] = float("nan")
    nullv = [float(x) for x in _vec(6, dim)]
    infv = _vec(7, dim)
    infv[0] = float("inf")
    rows = [(i, _vec(i, dim)) for i in range(1, 4)]
    rows += [(10, nanv), (12, infv), (13, None)]
    corpus = spark.createDataFrame(
        rows, "vec_id int, embedding array<double>"
    ).unionByName(
        spark.createDataFrame(
            [(11, nullv[:-1] + [None])],
            "vec_id int, embedding array<double>",
        )
    )
    a = _assign_rows(spark, corpus, cents, "arrow", nan_policy="sql")
    s = _assign_rows(spark, corpus, cents, "sql")
    assert a == s
    # default policy still raises on the NaN row
    with pytest.raises((PythonException, Py4JJavaError)):
        _assign_rows(spark, corpus, cents, "arrow")


def test_lsh_nan_policy_sql_matches_pure_sql(spark):
    """Null elements flip bits between the backends (SQL
    null-propagates to '0', Arrow sees NaN → '1'): the arrow udf now
    raises on the ambiguous class, and nan_policy="sql" routes those
    rows through the expression form — equal to a pure sql run."""
    dim = 64
    nullelem = [0.5] * dim
    nullelem[3] = None
    edge = spark.createDataFrame(
        [
            (1, [float("nan")] * dim),
            (2, None),
            (3, [0.5 * (d % 7) - 1.5 for d in range(dim + 6)]),
            (4, [0.0] * dim),
            (6, _vec(6, dim)),
        ],
        "vec_id bigint, embedding array<double>",
    ).unionByName(
        spark.createDataFrame(
            [(5, nullelem)], "vec_id bigint, embedding array<double>"
        )
    )
    q = {
        r["vec_id"]: r["lsh_bucket"]
        for r in with_lsh_bucket(edge, nan_policy="sql").collect()
    }
    s = {
        r["vec_id"]: r["lsh_bucket"]
        for r in with_lsh_bucket(edge, backend="sql").collect()
    }
    assert q == s
    assert q[1] == "1" * 8 and q[5] == "0" * 8  # NaN vs NULL-element
    # the default policy raises on both ambiguous classes
    for bad_id in (1, 5):
        df = with_lsh_bucket(edge.filter(F.col("vec_id") == bad_id))
        with pytest.raises((PythonException, Py4JJavaError)):
            df.collect()


def test_semdedup_skew_guard_fires_and_parity_holds(spark):
    """VERDICT r16 item 2: a giant cell must raise with remediation
    under pair_backend='arrow' instead of OOMing the task; under the
    bound, arrow and sql flags stay identical."""
    dim = 8
    cents = [(c, _vec(1000 + c, dim)) for c in range(2)]
    corpus = spark.createDataFrame(
        [(i, _vec(i % 25, dim)) for i in range(200)],
        "vec_id int, embedding array<double>",
    )
    guarded = semantic_duplicates(
        corpus, cents, tau=0.35, max_cell_rows=10
    )
    with pytest.raises((PythonException, Py4JJavaError), match="max_cell_rows"):
        guarded.collect()
    ok = semantic_duplicates(corpus, cents, tau=0.35)  # default bound
    sql = semantic_duplicates(corpus, cents, tau=0.35, pair_backend="sql")
    key = lambda r: (r["vec_id"], r["cell"], _bits(r["cent_sim"]), r["is_semantic_dup"])  # noqa: E731
    assert sorted(map(key, ok.collect())) == sorted(map(key, sql.collect()))


def test_semdedup_singleton_cell_nan_cent_sim_raises(spark):
    """ADVICE r16 (low): a NaN cent_sim in a 1-row cell must raise,
    not be silently nulled by the pandas→Arrow return path."""
    scored = spark.createDataFrame(
        [(1, 0, [1.0, 0.0], 1.0, float("nan"))],
        "vec_id int, cell int, __v array<double>, __n double, __cs double",
    )
    flagged = _semdedup_flags_arrow(scored, "vec_id", tau=0.9)
    with pytest.raises((PythonException, Py4JJavaError), match="NaN cent_sim"):
        flagged.collect()
