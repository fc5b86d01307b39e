"""Physical-plan quality gates: the properties that make these queries
survive a 100× scale-up must be visible in the executed plan, not just
asserted in docstrings — column pruning reaching the parquet scan,
small dimensions broadcast, top-k via TakeOrdered (no global sort),
partial aggregation under every hot-key reduction."""

from __future__ import annotations

import pytest

from arcane_stream_parquet_spark.plans.registry import spark_queries

from tests.conftest import SF_ORACLE


def _plan(spark, name: str) -> str:
    df = spark_queries()[name](spark, SF_ORACLE)
    return df._jdf.queryExecution().executedPlan().toString()


def _scan_lines(plan: str) -> list[str]:
    return [ln for ln in plan.splitlines() if "FileScan parquet" in ln]


def test_projection_prunes_scan_columns(spark):
    """field_selection (exclude→include chained) keeps 3 of events'
    columns; the scan must read exactly those (ReadSchema pruning —
    reading all columns for a narrow projection is wrong at any
    scale)."""
    scans = _scan_lines(_plan(spark, "field_selection"))
    assert scans
    for ln in scans:
        cols = ln.split("FileScan parquet [", 1)[1].split("]", 1)[0]
        names = {c.split("#")[0] for c in cols.split(",")}
        assert names == {"event_id", "ts", "user_id"}, names


def test_small_dimension_is_broadcast(spark):
    # retired r15 registry row (slot went to chunk_documents); the
    # builder and its plan discipline stay pinned here
    from arcane_stream_parquet_spark.plans.sql_queries import (
        join_broadcast_agg_builder,
    )

    df = join_broadcast_agg_builder(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_topk_avoids_global_sort(spark):
    # retired r15 registry row (slot went to ivfpq_topk); the builder
    # and its plan discipline stay pinned here
    from arcane_stream_parquet_spark.plans.sql_queries import (
        topk_orders_builder,
    )

    df = topk_orders_builder(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # no full exchange-then-sort of the orders table
    assert "Sort [" not in plan


def test_star_join_broadcasts_all_dims(spark):
    """4-way star (lineitem ⨝ supplier ⨝ nation ⨝ region): every
    dimension side must broadcast; only the fact table may shuffle."""
    plan = _plan(spark, "multi_join_revenue_by_nation")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_merge_dedup_has_partial_aggregation(spark):
    """latest_by_key: partial (map-side) + final max_by pair — the
    skew-resistant shape (tests/test_merge_skew.py drives it at 10⁶
    rows on one key)."""
    plan = _plan(spark, "latest_by_key")
    assert "Window" not in plan
    assert plan.count("max_by") >= 2


@pytest.mark.parametrize(
    "name",
    ["minhash_near_duplicates", "char_ngram_near_duplicates", "ann_lsh_multiprobe"],
)
def test_no_all_pairs_anywhere(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# r5: the generic gate over the WHOLE registry (r4 VERDICT task 3).
#
# Every registered query's executed plan must be free of the two
# shapes that kill a 100-TB run — CartesianProduct anywhere, and
# BroadcastNestedLoopJoin on anything corpus-sized — and must actually
# scan parquet (a query that collects to the driver and re-parallelizes
# would pass the hash check while being undistributed).
#
# The allowlist is EXPLICIT and pinned to exact NLJ counts, each one a
# deliberate tiny-side broadcast documented at its site; a new NLJ
# appearing anywhere (including one more in an allowlisted query) fails.
_NLJ_ALLOWLIST = {
    # r16: the driver-geometry centroid expansions (ann_ivf_topk,
    # semantic_duplicates, ivfpq_topk) became row-local literal argmax
    # projections (similarity._probe_cells_rowlocal — no join at all);
    # their former 2/3/2 BuildRight NLJ allowances are gone.  The
    # broadcast-NLJ path still exists for k·dim past
    # ROWLOCAL_ASSIGN_MAX_VALUES and stays pinned BuildRight-only in
    # test_ivf_centroid_expansion_is_broadcast_only.
    # (cosine_topk_bruteforce left the registry in r9 — slot went to
    # redact_pii; the baseline and its broadcast plan stay covered in
    # test_llm_ops)
    # two 1-row global-aggregate attaches (avg revenue + total count)
    # joined onto the grouped output (sql_queries.py event_analytics)
    "event_analytics": 2,
    # 1-row corpus-doc-count broadcast for the IDF term
    # (llm_queries.py tfidf_top_terms)
    "tfidf_top_terms": 1,
    # 1-row (N1, V) LM-constants broadcast attached to every scored
    # token so OOV tokens see the smoothing totals too
    # (text.py ngram_perplexity)
    "ngram_perplexity": 1,
    # (domain_mixture's former 1-row feasible-budget crossJoin attach
    # became an unpartitioned window min over the same tiny totals
    # frame in r12 — zero NLJs remain in that plan)
}


@pytest.fixture(scope="module")
def _all_plans(spark):
    """Plan every registered query once (planning only — no execution
    beyond what query construction itself requires)."""
    return {
        name: _plan(spark, name) for name in sorted(spark_queries())
    }


@pytest.mark.parametrize("name", sorted(spark_queries()))
def test_registry_plan_gate(name, _all_plans):
    plan = _all_plans[name]
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    allowed = _NLJ_ALLOWLIST.get(name, 0)
    got = plan.count("BroadcastNestedLoopJoin")
    assert got == allowed, (
        f"{name}: {got} BroadcastNestedLoopJoin (allowlisted: {allowed}) — "
        "a new nested-loop join appeared; either it is corpus-sized (fix "
        "the query) or it is a deliberate tiny-side broadcast (document "
        "it at the site and pin it in _NLJ_ALLOWLIST)"
    )
    assert "FileScan" in plan, f"{name}: no parquet scan in plan"
    # single-partition collapse pin (r16): a stray .coalesce(1) in a
    # returned plan serializes the whole query at scale, yet at bench
    # SF it is wall-clock-INVISIBLE (measured: duplicate_spans with an
    # injected coalesce(1) ran FASTER at sf0.1 — 5k rows don't need 32
    # threads).  Plan shape, not toy-scale timing, is the detector for
    # this class.  (Exchange SinglePartition stays allowed: global
    # aggregates and unpartitioned windows over tiny frames are
    # legitimate; "Coalesce 1" on a scan path never is.)
    import re as _re

    assert not _re.search(r"\bCoalesce 1\b", plan), (
        f"{name}: single-partition Coalesce in the returned plan — "
        "serializes the query at scale (invisible to bench timing at "
        "toy SF); coalesce build-side scaffolding behind a "
        "localCheckpoint/write instead"
    )


def test_ivf_centroid_expansion_is_broadcast_only(spark):
    """r16: at the driver geometry (k·dim = 512) the centroid argmax
    is a row-local literal projection — ZERO nested-loop joins; the
    candidate join stays a hash equi-join on the cell id — never
    corpus×corpus.  The broadcast-NLJ fallback (k·dim past
    ROWLOCAL_ASSIGN_MAX_VALUES, the k ∝ n deployments) must still be
    BuildRight-of-tiny-side only — forced here via the gate."""
    plan = _plan(spark, "ann_ivf_topk")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 0
    assert "BroadcastHashJoin [cell" in plan

    from arcane_stream_parquet_spark.operators import similarity as sim_mod
    from arcane_stream_parquet_spark.operators.similarity import (
        ivf_topk,
        train_ivf_centroids,
    )
    from arcane_stream_parquet_spark.plans.llm_queries import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    cents = train_ivf_centroids(emb, k=4, iters=1)
    orig = sim_mod.ROWLOCAL_ASSIGN_MAX_VALUES
    sim_mod.ROWLOCAL_ASSIGN_MAX_VALUES = 0
    try:
        plan2 = (
            ivf_topk(emb, emb.limit(2), cents, k=3, nprobe=2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        sim_mod.ROWLOCAL_ASSIGN_MAX_VALUES = orig
    assert "CartesianProduct" not in plan2
    assert plan2.count("BroadcastNestedLoopJoin") >= 1
    assert plan2.count("BroadcastNestedLoopJoin BuildRight") == plan2.count(
        "BroadcastNestedLoopJoin"
    )
    assert "BroadcastHashJoin [cell" in plan2


def test_first_fit_packing_single_stream_exchange(spark):
    """The r16 FFD driver row's plan is the shape the docstring claims:
    a 2-column pruned scan, token count + stream hash as JVM-side
    codegen projections (no Python in the hot path before the shuffle),
    exactly ONE Exchange on the stream key, then the per-stream
    FlatMapGroupsInPandas fold — at 100 TB the only data movement is
    the single stream-key shuffle."""
    from tests.conftest import SF_SMOKE

    df = spark_queries()["first_fit_packing"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert plan.count("Exchange hashpartitioning(stream") == 1, plan
    assert "FlatMapGroupsInPandas" in plan
    # the projection reaches the scan: only the two needed columns read
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan
    # stream hash + token count are codegen expressions, not UDFs
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
