"""Property-based tests (hypothesis): core operator semantics checked
against brute-force Python references on adversarially generated
inputs — duplicate keys, equal versions, empty sides, NULL-ish values.

Examples are kept small and few (Spark round trip per example); the
value is the generator finding the edge the hand-written tests missed.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from arcane_stream_parquet_spark.operators.asof import asof_join
from arcane_stream_parquet_spark.operators.merge import merge_latest_wins
from arcane_stream_parquet_spark.operators.rangejoin import interval_join

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

row = st.tuples(
    st.integers(min_value=0, max_value=4),  # key (small pool → collisions)
    st.integers(min_value=0, max_value=5),  # version (ties likely)
    st.integers(min_value=0, max_value=99),  # payload
)


def _merge_reference(target, batch):
    """Naive latest-wins upsert: batch beats target on ties; within one
    side the max (version, payload) row survives (payload tiebreaker)."""
    best: dict[int, tuple] = {}
    for precedence, rows in ((0, target), (1, batch)):
        for k, v, p in rows:
            cur = best.get(k)
            cand = (v, precedence, p)
            if cur is None or cand > cur:
                best[k] = cand
    return {(k, v, p) for k, (v, _, p) in best.items()}


@given(target=st.lists(row, max_size=12), batch=st.lists(row, max_size=12))
@settings(**SETTINGS)
def test_merge_latest_wins_matches_reference(spark, target, batch):
    schema = "arcane_merge_key int, createdon int, payload int"
    tdf = spark.createDataFrame(
        [Row(arcane_merge_key=k, createdon=v, payload=p) for k, v, p in target],
        schema=schema,
    )
    bdf = spark.createDataFrame(
        [Row(arcane_merge_key=k, createdon=v, payload=p) for k, v, p in batch],
        schema=schema,
    )
    got = {
        (r["arcane_merge_key"], r["createdon"], r["payload"])
        for r in merge_latest_wins(tdf, bdf, tiebreakers=("payload",)).collect()
    }
    assert got == _merge_reference(target, batch)


lrow = st.tuples(st.integers(0, 2), st.integers(0, 20))  # (key, t)
rrow = st.tuples(st.integers(0, 2), st.integers(0, 20), st.integers(0, 9))


@given(left=st.lists(lrow, min_size=1, max_size=10, unique=True),
       right=st.lists(rrow, max_size=10, unique_by=lambda r: (r[0], r[1])))
@settings(**SETTINGS)
def test_asof_backward_matches_bruteforce(spark, left, right):
    ldf = spark.createDataFrame(
        [Row(k=k, t=t) for k, t in left], schema="k int, t int"
    )
    rdf = spark.createDataFrame(
        [Row(k=k, t2=t, v=v) for k, t, v in right], schema="k int, t2 int, v int"
    )
    got = {
        (r["k"], r["t"]): r["v_right"]
        for r in asof_join(ldf, rdf, on=["k"], left_ts="t", right_ts="t2").collect()
    }
    for k, t in left:
        matches = [(t2, v) for rk, t2, v in right if rk == k and t2 <= t]
        expect = max(matches)[1] if matches else None
        assert got[(k, t)] == expect, (k, t, matches)


point = st.tuples(st.integers(0, 50))
iv = st.tuples(st.integers(0, 9), st.integers(0, 50), st.integers(0, 12))


@given(points=st.lists(point, max_size=12, unique=True),
       intervals=st.lists(iv, max_size=8, unique_by=lambda r: r[0]))
@settings(**SETTINGS)
def test_interval_join_matches_bruteforce(spark, points, intervals):
    pdf = spark.createDataFrame(
        [Row(pid=i, x=x) for i, (x,) in enumerate(points)], schema="pid int, x int"
    )
    idf = spark.createDataFrame(
        [Row(iv_id=i, s=s, e=s + span) for i, s, span in intervals],
        schema="iv_id int, s int, e int",
    )
    got = {
        (r["pid"], r["iv_id"])
        for r in interval_join(pdf, idf, "x", "s", "e", bin_width=7).collect()
    }
    expect = {
        (pid, i)
        for pid, (x,) in enumerate(points)
        for i, s, span in intervals
        if s <= x <= s + span
    }
    assert got == expect


# ---------------------------------------------------------------------------
# Connected components (operators/clustering.py) vs a union-find reference

edge = st.tuples(
    st.integers(min_value=0, max_value=11), st.integers(min_value=0, max_value=11)
)


def _union_find(edges):
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node in component
    return {n: find(n) for n in parent}


@given(edges=st.lists(edge, min_size=1, max_size=15))
@settings(**SETTINGS)
def test_connected_components_matches_union_find(spark, edges):
    from arcane_stream_parquet_spark.operators.clustering import (
        connected_components,
    )

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    pairs = spark.createDataFrame(
        [Row(id_a=a, id_b=b) for a, b in edges], schema="id_a bigint, id_b bigint"
    )
    got = {
        r["node"]: r["cluster_id"] for r in connected_components(pairs).collect()
    }
    expect = _union_find(edges)
    # path-compressed union-find roots are already the component minimum
    # because we always hang the larger root under the smaller
    assert got == expect


# ---------------------------------------------------------------------------
# r5: schema-drift reconciliation (_reconcile_schema / _widen_type) —
# the reference's SchemaMigrationProcessor + isUnifiedSchema contract
# (crd-parquet-stream.yaml:79-82), including TYPE conflicts.
#
# Documented accept/raise matrix:
#   add/remove columns ............ accept (NULL-padded) | unified -> raise
#   int->long, float->double,
#   decimal(P,S)->decimal(P',S) ... accept (widen BOTH sides) | unified -> raise
#   int->string, long->float,
#   decimal scale change .......... raise ALWAYS (no Iceberg-legal promotion)
#   nullable flip ................. not drift (accept silently)
#   column reorder ................ not drift (resolution is by name)
#   rename collision after
#   normalization ................. raise in normalize_column_names

import pytest
from pyspark.sql import types as T

from arcane_stream_parquet_spark.operators.merge import ParquetMergeTarget, _widen_type


def _target(spark, tmp_path, unified=False):
    return ParquetMergeTarget(
        spark=spark, path=str(tmp_path / "t"), key_col="k", version_col="v",
        num_buckets=4, unified_schema=unified,
    )


def _df(spark, schema_pairs, n=2):
    schema = T.StructType(
        [T.StructField(name, dt, True) for name, dt in schema_pairs]
    )
    rows = []
    for i in range(n):
        row = []
        for name, dt in schema_pairs:
            if name == "k":
                row.append(f"key{i}")
            elif isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
                row.append(i)
            elif isinstance(dt, (T.FloatType, T.DoubleType)):
                row.append(float(i))
            elif isinstance(dt, T.DecimalType):
                from decimal import Decimal
                row.append(Decimal(i))
            else:
                row.append(str(i))
        rows.append(tuple(row))
    return spark.createDataFrame(rows, schema)


_BASE = [("k", T.StringType()), ("v", T.LongType())]


def test_widen_type_matrix():
    cases_ok = [
        (T.IntegerType(), T.LongType(), T.LongType()),
        (T.ByteType(), T.IntegerType(), T.IntegerType()),
        (T.ShortType(), T.LongType(), T.LongType()),
        (T.FloatType(), T.DoubleType(), T.DoubleType()),
        (T.DecimalType(10, 2), T.DecimalType(18, 2), T.DecimalType(18, 2)),
    ]
    for a, b, want in cases_ok:
        assert _widen_type(a, b) == want
        assert _widen_type(b, a) == want  # symmetric
    cases_illegal = [
        (T.IntegerType(), T.StringType()),
        (T.LongType(), T.FloatType()),       # Iceberg has no long->float
        (T.IntegerType(), T.DoubleType()),   # nor int->double
        (T.DecimalType(10, 2), T.DecimalType(12, 4)),  # scale change
        (T.StringType(), T.BinaryType()),
        (T.LongType(), T.TimestampType()),
    ]
    for a, b in cases_illegal:
        assert _widen_type(a, b) is None
        assert _widen_type(b, a) is None


def test_drift_add_remove_columns_null_padded(spark, tmp_path):
    t = _target(spark, tmp_path)
    ex = _df(spark, _BASE + [("only_target", T.StringType())])
    ba = _df(spark, _BASE + [("only_batch", T.LongType())])
    rex, rba = t._reconcile_schema(ex, ba)
    assert set(rex.columns) == set(rba.columns) == {
        "k", "v", "only_target", "only_batch"
    }
    assert dict(rex.dtypes) == dict(rba.dtypes)
    assert rex.select("only_batch").distinct().collect()[0][0] is None
    assert rba.select("only_target").distinct().collect()[0][0] is None


def test_drift_legal_widening_widens_both_sides(spark, tmp_path):
    t = _target(spark, tmp_path)
    ex = _df(spark, _BASE + [("x", T.IntegerType()), ("f", T.FloatType())])
    ba = _df(spark, _BASE + [("x", T.LongType()), ("f", T.DoubleType())])
    rex, rba = t._reconcile_schema(ex, ba)
    assert dict(rex.dtypes)["x"] == dict(rba.dtypes)["x"] == "bigint"
    assert dict(rex.dtypes)["f"] == dict(rba.dtypes)["f"] == "double"
    # values survive the widening cast
    assert sorted(r["x"] for r in rex.collect()) == [0, 1]


def test_drift_illegal_type_conflict_raises_not_coerces(spark, tmp_path):
    """int vs string would silently union to string without the check —
    the exact silent-downgrade class this gate exists for."""
    t = _target(spark, tmp_path)
    ex = _df(spark, _BASE + [("x", T.IntegerType())])
    ba = _df(spark, _BASE + [("x", T.StringType())])
    with pytest.raises(ValueError, match="illegal schema evolution"):
        t._reconcile_schema(ex, ba)
    # illegal beats unified: the type error names the column either way
    tu = _target(spark, tmp_path, unified=True)
    with pytest.raises(ValueError, match="illegal schema evolution"):
        tu._reconcile_schema(ex, ba)


def test_unified_schema_forbids_all_drift_kinds(spark, tmp_path):
    tu = _target(spark, tmp_path, unified=True)
    ex = _df(spark, _BASE)
    # column drift
    with pytest.raises(ValueError, match="unified_schema"):
        tu._reconcile_schema(ex, _df(spark, _BASE + [("extra", T.LongType())]))
    # pure TYPE drift (same column set) must also raise under unified
    ex2 = _df(spark, _BASE + [("x", T.IntegerType())])
    ba2 = _df(spark, _BASE + [("x", T.LongType())])
    with pytest.raises(ValueError, match="type-drift"):
        tu._reconcile_schema(ex2, ba2)


def test_nullable_flip_and_reorder_are_not_drift(spark, tmp_path):
    t = _target(spark, tmp_path)
    ex = spark.createDataFrame(
        [("a", 1, 5, ["s"])],
        T.StructType([
            T.StructField("k", T.StringType(), False),
            T.StructField("v", T.LongType(), False),
            T.StructField("x", T.LongType(), False),
            # nested containsNull=False vs True below: NOT drift either
            T.StructField("sh", T.ArrayType(T.StringType(), False), False),
        ]),
    )
    ba = spark.createDataFrame(
        [(7, "b", 2, ["t"])],
        T.StructType([
            T.StructField("x", T.LongType(), True),   # nullable flip
            T.StructField("k", T.StringType(), True),  # + reorder
            T.StructField("v", T.LongType(), True),
            T.StructField("sh", T.ArrayType(T.StringType(), True), True),
        ]),
    )
    rex, rba = t._reconcile_schema(ex, ba)
    assert (rex is ex) and (rba is ba)  # no-op: resolution is by name


_DRIFT_TYPES = [
    T.IntegerType(), T.LongType(), T.FloatType(), T.DoubleType(),
    T.StringType(), T.DecimalType(10, 2), T.DecimalType(18, 2),
]


@given(
    ta=st.sampled_from(_DRIFT_TYPES),
    tb=st.sampled_from(_DRIFT_TYPES),
    extra_target=st.booleans(),
    extra_batch=st.booleans(),
)
@settings(**SETTINGS)
def test_reconcile_property(spark, tmp_path_factory, ta, tb, extra_target, extra_batch):
    """For any type pair + column drift combo: reconcile either raises
    (exactly when no legal promotion exists) or returns two frames with
    IDENTICAL name->type maps covering the union of columns."""
    t = _target(spark, tmp_path_factory.mktemp("drift"))
    ex_cols = _BASE + [("x", ta)] + ([("et", T.LongType())] if extra_target else [])
    ba_cols = _BASE + [("x", tb)] + ([("eb", T.LongType())] if extra_batch else [])
    ex, ba = _df(spark, ex_cols), _df(spark, ba_cols)
    legal = _widen_type(ta, tb) is not None
    if not legal:
        with pytest.raises(ValueError, match="illegal schema evolution"):
            t._reconcile_schema(ex, ba)
        return
    rex, rba = t._reconcile_schema(ex, ba)
    assert dict(rex.dtypes) == dict(rba.dtypes)
    want_cols = {n for n, _ in ex_cols} | {n for n, _ in ba_cols}
    assert set(rex.columns) == want_cols
    assert dict(rex.dtypes)["x"] == _widen_type(ta, tb).simpleString()


def test_merge_e2e_widening_and_illegal(spark, tmp_path):
    """Through the real merge path: an int->long widened batch merges
    and the widened column reads back (old files read under the new
    manifest schema — Spark 4 parquet type widening); an int->string
    batch fails loudly."""
    t = _target(spark, tmp_path)
    t.merge(_df(spark, _BASE + [("x", T.IntegerType())], n=3))
    t.merge(_df(spark, _BASE + [("x", T.LongType())], n=2))
    out = t.read()
    assert dict(out.dtypes)["x"] == "bigint"
    assert out.count() == 3
    with pytest.raises(ValueError, match="illegal schema evolution"):
        t.merge(_df(spark, _BASE + [("x", T.StringType())], n=1))


# -- span dedup vs brute-force position model (r12) ----------------------------
#
# The interval-merge coverage fold (sorted duplicate-window starts ->
# boundary indices -> disjoint [s, e] intervals -> kept gaps sliced out
# of the token array) is the trickiest index arithmetic in the text
# family. Check it against the obvious per-position model on random
# corpora with forced cross-document repetition.

_span_word = st.sampled_from(["a", "b", "c", "d"])  # tiny vocab → collisions


def _span_reference(docs: dict[int, list[str]], k: int, min_docs: int):
    """Naive model: every k-window string -> set of doc ids; positions
    covered by windows appearing in >= min_docs docs are dropped."""
    wins: dict[str, set[int]] = {}
    for did, toks in docs.items():
        for i in range(max(0, len(toks) - k + 1)):
            wins.setdefault(" ".join(toks[i : i + k]), set()).add(did)
    dup = {w for w, ids in wins.items() if len(ids) >= min_docs}
    out = {}
    for did, toks in docs.items():
        covered = set()
        for i in range(max(0, len(toks) - k + 1)):
            if " ".join(toks[i : i + k]) in dup:
                covered.update(range(i, i + k))
        kept = [t for p, t in enumerate(toks) if p not in covered]
        out[did] = (" ".join(kept), len(toks), len(covered))
    return out


@given(
    docs=st.lists(
        st.lists(_span_word, min_size=0, max_size=24), min_size=1, max_size=5
    ),
    k=st.integers(min_value=1, max_value=4),
)
@settings(**SETTINGS)
def test_remove_duplicate_spans_matches_position_model(spark, docs, k):
    from arcane_stream_parquet_spark.operators.text import (
        remove_duplicate_spans,
    )

    corpus = {i: toks for i, toks in enumerate(docs)}
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in corpus.items()],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in remove_duplicate_spans(
            df, window_tokens=k, min_docs=2
        ).collect()
    }
    assert got == _span_reference(corpus, k, 2)


# -- manifest string-stat truncation bounds (r13, pure Python) -----------------

# any valid code point EXCEPT surrogates (a real Spark string can't
# carry lone surrogates), biased toward the interesting boundaries
_cp = st.one_of(
    st.integers(0, 0xD7FF),
    st.integers(0xE000, 0x10FFFF),
    st.sampled_from([0xD7FF, 0xE000, 0x10FFFF, 0x10FFFE, 0x41]),
)
_stat_str = st.lists(_cp, min_size=0, max_size=90).map(
    lambda cs: "".join(chr(c) for c in cs)
)


@given(v=_stat_str, other=_stat_str)
@settings(max_examples=300, deadline=None)
def test_stat_truncation_bounds_property(v, other):
    """For EVERY string value and every other string: truncation only
    widens the interval (trunc_min <= v <= trunc_max-or-kept-whole),
    the bounds respect the length cap unless the no-successor corner
    forced keeping the value, results never contain lone surrogates,
    and interval membership is preserved — any `other` inside [v, v]
    stays inside [trunc_min(v), trunc_max(v)]."""
    from arcane_stream_parquet_spark.operators.merge import (
        _STATS_MAX_LEN,
        _trunc_stat_max,
        _trunc_stat_min,
    )

    lo, hi = _trunc_stat_min(v), _trunc_stat_max(v)
    assert lo <= v <= hi
    assert len(lo) <= max(len(v), _STATS_MAX_LEN)
    if len(v) > _STATS_MAX_LEN:
        assert len(lo) == _STATS_MAX_LEN
        # hi either capped, or the value was kept whole because every
        # prefix char was U+10FFFF
        kept_whole = hi == v
        assert len(hi) <= _STATS_MAX_LEN or kept_whole
        if kept_whole:
            assert all(c == "\U0010ffff" for c in v[:_STATS_MAX_LEN])
        else:
            # strict upper bound over EVERY string with the prefix:
            # the worst case is prefix + infinite U+10FFFF tail
            assert hi > v[:_STATS_MAX_LEN] + "\U0010ffff" * 8
    assert not any(0xD800 <= ord(c) <= 0xDFFF for c in lo + hi)
    # interval-widening containment for an arbitrary probe value
    if lo <= other <= v:
        assert lo <= other <= hi
