"""rank_buckets — CCNet head/middle/tail quantile bucketing.

Registry sits at the driver's hard 50-row cap, so the cross-engine pin
lives here: DuckDB replay over the real documents table (per-language
strata, integer boundaries), exhaustiveness/disjointness, tiny-group
edge pins, descending order, validation, and the one-shuffle plan pin.
"""

from __future__ import annotations

import duckdb
import pytest

from arcane_stream_parquet_spark.operators.sampling import rank_buckets
from tests.conftest import SF_ORACLE


def _duck(sf_dir: str, permille, names, group: str | None, ascending=True):
    cum, cases, lo = 0, [], []
    direction = "ASC" if ascending else "DESC"
    part = f"PARTITION BY {group}" if group else ""
    for p, name in zip(permille, names):
        cum += p
        cases.append(f"WHEN rnk <= (n * {cum}) // 1000 THEN '{name}'")
    sql = f"""
    SELECT doc_id, CASE {' '.join(cases)} ELSE '{names[-1]}' END AS bucket
    FROM (
      SELECT doc_id,
             row_number() OVER ({part} ORDER BY n_chars {direction}, doc_id) AS rnk,
             count(*)    OVER ({part}) AS n
      FROM '{sf_dir}/documents.parquet'
    ) ORDER BY doc_id
    """
    return duckdb.sql(sql).fetchall()


@pytest.mark.parametrize("group,asc", [("lang", True), (None, True), ("lang", False)])
def test_duckdb_replay_parity(spark, group, asc):
    df = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    got = (
        rank_buckets(
            df,
            score_col="n_chars",
            id_col="doc_id",
            permille=(300, 300),
            bucket_names=("head", "middle", "tail"),
            group_cols=(group,) if group else (),
            ascending=asc,
        )
        .select("doc_id", "bucket")
        .orderBy("doc_id")
        .collect()
    )
    want = _duck(SF_ORACLE, (300, 300), ("head", "middle", "tail"), group, asc)
    assert len(got) == len(want) > 0
    assert [tuple(r) for r in got] == want


def test_tiny_groups_pinned(spark):
    """Boundary semantics at n where n*permille//1000 floors to 0:
    every row falls through to later buckets — exhaustive, disjoint."""
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 1.0), (3, "a", 3.0), (10, "b", 9.0)],
        "doc_id long, g string, s double",
    )
    rows = {
        r.doc_id: r.bucket
        for r in rank_buckets(
            df, "s", "doc_id", permille=(300, 400), group_cols=("g",)
        ).collect()
    }
    # g=a: n=3 -> head boundary 3*300//1000 = 0 (empty head),
    # middle boundary 3*700//1000 = 2 -> ranks 1,2 middle, rank 3 tail.
    assert rows[2] == "middle" and rows[3] == "middle" and rows[1] == "tail"
    # g=b: n=1 -> everything floors to 0 -> the remainder bucket.
    assert rows[10] == "tail"


def test_exhaustive_disjoint_and_fractions(spark):
    df = spark.range(1000).selectExpr("id AS doc_id", "CAST(id AS DOUBLE) AS s")
    out = rank_buckets(df, "s", "doc_id", permille=(300, 400))
    counts = {r.bucket: r["count"] for r in out.groupBy("bucket").count().collect()}
    assert counts == {"head": 300, "middle": 400, "tail": 300}
    # ascending: lowest scores are the head
    head_max = out.filter("bucket = 'head'").agg({"s": "max"}).collect()[0][0]
    assert head_max == 299.0


def test_tie_stability(spark):
    """Equal scores rank by id — the same rows land in the same bucket
    on every run/engine."""
    df = spark.createDataFrame(
        [(i, 7.0) for i in range(10)], "doc_id long, s double"
    )
    out = {r.doc_id: r.bucket for r in rank_buckets(df, "s", "doc_id", permille=(500,), bucket_names=("keep", "drop")).collect()}
    assert all(out[i] == "keep" for i in range(5))
    assert all(out[i] == "drop" for i in range(5, 10))


def test_validation(spark):
    df = spark.range(1).selectExpr("id AS doc_id", "CAST(id AS DOUBLE) AS s")
    with pytest.raises(ValueError):
        rank_buckets(df, "s", "doc_id", permille=(300,), bucket_names=("a",))
    with pytest.raises(ValueError):
        rank_buckets(df, "s", "doc_id", permille=(600, 600))
    with pytest.raises(ValueError):
        rank_buckets(df, "s", "doc_id", permille=(-1,), bucket_names=("a", "b"))


def test_plan_one_shuffle_no_python(spark):
    df = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    plan = (
        rank_buckets(df, "n_chars", "doc_id", group_cols=("lang",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1  # the window partition
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_null_scores_rank_last_matching_duckdb(spark):
    """A NULL score must land in the remainder bucket, both directions —
    Spark's bare asc() is NULLS FIRST while DuckDB's is NULLS LAST, so
    this is pinned cross-engine with injected nulls."""
    rows = [(i, float(i) if i % 4 else None) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, s double")
    for asc in (True, False):
        got = sorted(
            (r.doc_id, r.bucket)
            for r in rank_buckets(
                df, "s", "doc_id", permille=(500,), bucket_names=("keep", "drop"),
                ascending=asc,
            ).collect()
        )
        direction = "ASC" if asc else "DESC"
        want = sorted(
            duckdb.sql(
                f"""
                SELECT doc_id,
                       CASE WHEN rnk <= (n * 500) // 1000 THEN 'keep'
                            ELSE 'drop' END
                FROM (SELECT doc_id,
                             row_number() OVER (ORDER BY s {direction}, doc_id) rnk,
                             count(*) OVER () n
                      FROM (VALUES {", ".join(
                          f"({d}, {'NULL' if s is None else s})" for d, s in rows
                      )}) t(doc_id, s))
                """
            ).fetchall()
        )
        assert got == want
        # and specifically: every null-scored doc is in the remainder
        nulls = {d for d, s in rows if s is None}
        assert all(b == "drop" for d, b in got if d in nulls)


def test_boundary_model_partitions_exactly():
    """Model-level property of the integer boundary formula: the
    cumulative n·cum//1000 boundaries partition ranks 1..n into
    non-negative, order-preserving bucket sizes that sum to n — for
    every n and permille vector (exhaustive + disjoint by
    construction, not just on sampled data)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        n=st.integers(min_value=0, max_value=5000),
        permille=st.lists(
            st.integers(min_value=0, max_value=1000), min_size=1, max_size=4
        ).filter(lambda p: sum(p) <= 1000),
    )
    def check(n, permille):
        bounds, cum = [], 0
        for p in permille:
            cum += p
            bounds.append(n * cum // 1000)
        sizes = [b - a for a, b in zip([0] + bounds, bounds)]
        sizes.append(n - bounds[-1])  # the remainder bucket
        assert all(s >= 0 for s in sizes)
        assert sum(sizes) == n
        # a bucket's size never exceeds its share's ceiling by more
        # than the floor slack of its two boundaries
        for p, s in zip(permille, sizes):
            assert s <= n * p / 1000 + 1

    check()
