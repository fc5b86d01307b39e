"""Plan-shape assertions for the general SQL surface — the oracle gate
proves values; these prove the PHYSICAL plan is the one we'd want at
100 TB (broadcasts chosen, filters pushed to the scan, top-k not a full
sort, single shuffle where one suffices).
"""

from __future__ import annotations

from arcane_stream_parquet_spark.plans import spark_queries

from tests.conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    df = spark_queries()[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_broadcast_join_is_broadcast(spark):
    # retired r15 driver row (slot went to chunk_documents per the r14
    # verdict, item 2 — structurally a strict subset of
    # multi_join_revenue_by_nation); builder + plan pin stay here, the
    # value replay is test_join_broadcast_agg_replay below
    from arcane_stream_parquet_spark.plans.sql_queries import (
        join_broadcast_agg_builder,
    )

    df = join_broadcast_agg_builder(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_multi_join_broadcasts_dims(spark):
    plan = _plan(spark, "multi_join_revenue_by_nation")
    # nation and region must never shuffle the fact side
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_semi_anti_join_types(spark):
    plan = _plan(spark, "join_semi_anti")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_topk_uses_take_ordered(spark):
    # retired r15 driver row (slot went to ivfpq_topk per the r14
    # verdict, item 3 — a 3-line built-in was the least
    # information-bearing row); builder + plan pin stay here, the
    # value replay is test_topk_orders_replay below
    from arcane_stream_parquet_spark.plans.sql_queries import (
        topk_orders_builder,
    )

    df = topk_orders_builder(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # per-partition heap + driver merge, not a global sort shuffle
    assert "TakeOrderedAndProject" in plan


def _duck_with_views(tables):
    import duckdb

    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    return con


def test_join_broadcast_agg_replay(spark):
    """The retired r15 driver row: exact former builder vs exact
    former oracle (JOIN_BROADCAST_AGG_ORACLE) — zero coverage loss."""
    from arcane_stream_parquet_spark.plans.sql_queries import (
        JOIN_BROADCAST_AGG_ORACLE,
        join_broadcast_agg_builder,
    )

    got = sorted(
        (r[0], int(r[1]), float(r[2]))
        for r in join_broadcast_agg_builder(spark, SF_SMOKE).collect()
    )
    con = _duck_with_views(("lineitem", "part"))
    want = sorted(
        (a, int(b), float(c))
        for a, b, c in con.execute(JOIN_BROADCAST_AGG_ORACLE).fetchall()
    )
    con.close()
    assert got == want and len(got) > 0


def test_topk_orders_replay(spark):
    """The retired r15 driver row: exact former builder vs exact
    former oracle (TOPK_ORDERS_ORACLE) — zero coverage loss."""
    from arcane_stream_parquet_spark.plans.sql_queries import (
        TOPK_ORDERS_ORACLE,
        topk_orders_builder,
    )

    got = [tuple(r) for r in topk_orders_builder(spark, SF_SMOKE).collect()]
    con = _duck_with_views(("orders",))
    want = [tuple(r) for r in con.execute(TOPK_ORDERS_ORACLE).fetchall()]
    con.close()
    assert got == want and len(got) == 10


def test_set_ops_custkeys_replay(spark):
    """The retired r16 driver row (slot went to first_fit_packing per
    the r15 verdict, item 2): exact former builder vs exact former
    oracle (SET_OPS_CUSTKEYS_ORACLE) — zero coverage loss."""
    from arcane_stream_parquet_spark.plans.sql_queries import (
        SET_OPS_CUSTKEYS_ORACLE,
        set_ops_custkeys_builder,
    )

    got = sorted(
        (r[0], int(r[1]))
        for r in set_ops_custkeys_builder(spark, SF_SMOKE).collect()
    )
    con = _duck_with_views(("orders",))
    want = sorted(
        (a, int(b))
        for a, b in con.execute(SET_OPS_CUSTKEYS_ORACLE).fetchall()
    )
    con.close()
    assert got == want and len(got) > 0


def test_pricing_summary_pushes_filter_and_prunes(spark):
    plan = _plan(spark, "groupby_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection pruned to the 5 needed columns
    assert "l_comment" not in plan
    assert "partial" in plan.lower() or "HashAggregate" in plan


def test_window_shares_one_shuffle(spark):
    """Both window specs partition by o_custkey — expect exactly one
    exchange on that key (the second spec re-sorts, not re-shuffles)."""
    plan = _plan(spark, "window_rank_lag")
    n_exchanges = plan.count("Exchange hashpartitioning(o_custkey")
    assert n_exchanges == 1, plan


def test_range_join_no_nested_loop(spark):
    """The interval join must be a binned equi-join — a nested-loop /
    cartesian plan is disqualifying at scale."""
    plan = _plan(spark, "range_join_binned")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_salted_join_matches_plain_join(spark):
    """Skew tool: salted_join must be semantically identical to the
    plain equi-join while spreading a hot key across salt partitions."""
    from pyspark.sql import Row

    from arcane_stream_parquet_spark.functions.skew import salted_join

    # 90% of left rows share one hot key
    left = spark.createDataFrame(
        [Row(k=1 if i % 10 else 2, v=i) for i in range(1000)]
    )
    right = spark.createDataFrame([Row(k=1, tag="hot"), Row(k=2, tag="cold")])
    plain = left.join(right, ["k"]).groupBy("tag").count().collect()
    salted = salted_join(left, right, ["k"], salt_factor=8).groupBy("tag").count().collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))


def test_scalar_pandas_udf_matches_native_twin(spark):
    """The §2.10 scalar-pandas_udf surface (formerly the
    ``pandas_udf_scalar`` registry row, retired r12 for a slot under
    the 50-row cap): an Arrow-vectorized scalar UDF's output must be
    lossless vs its JVM-native twin — pandas ``str.count`` over the
    BPE-ish lexer vs ``regexp_extract_all`` + ``size``."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.pandas.functions import PandasUDFType

    from arcane_stream_parquet_spark.operators.text import BPE_TOKEN_RE
    from arcane_stream_parquet_spark.sources.tables import load_table

    # no type hints: `from __future__ import annotations` stringifies
    # them and pyspark can't resolve the local pandas alias
    @pandas_udf("long", PandasUDFType.SCALAR)
    def bpe_count(texts):
        return texts.str.lower().str.count(r"[a-z]+|[0-9]+|[^a-z0-9 ]")

    docs = load_table(spark, SF_SMOKE, "documents")
    out = docs.select(
        bpe_count(F.col("text")).alias("py"),
        F.size(
            F.expr(f"regexp_extract_all(lower(text), '{BPE_TOKEN_RE}', 0)")
        ).cast("long").alias("native"),
    )
    assert out.filter(F.col("py") != F.col("native")).count() == 0
    assert out.count() > 0


def test_distinct_agg_replay_and_plan(spark):
    """The retired r14 driver row (slot went to rank_buckets per the
    r13 verdict — its value surface is a strict subset of rollup_agg +
    groupby_pricing_summary): exact former builder vs exact former
    oracle, plus the plan discipline that motivated it — each distinct
    is its own two-phase plan, never a multi-distinct Expand."""
    import duckdb

    from arcane_stream_parquet_spark.plans.sql_queries import (
        DISTINCT_AGG_ORACLE,
        distinct_agg_builder,
    )

    df = distinct_agg_builder(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan, "multi-distinct Expand is the anti-plan"
    got = sorted(
        (r[0], int(r[1]), int(r[2]), bool(r[3])) for r in df.collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{SF_SMOKE}/lineitem.parquet'"
    )
    want = sorted(
        (a, int(b), int(c), bool(d))
        for a, b, c, d in con.execute(DISTINCT_AGG_ORACLE).fetchall()
    )
    con.close()
    assert got == want and len(got) > 0
