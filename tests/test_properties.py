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
