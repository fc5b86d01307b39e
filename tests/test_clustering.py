"""Connected-components / canonical-doc clustering
(operators/clustering.py): label propagation must produce min-id
components on chains, cliques, and disjoint unions, converge early,
and assign singletons to themselves."""

from __future__ import annotations

from pyspark.sql import Row

from arcane_stream_parquet_spark.operators.clustering import (
    connected_components,
    dedup_assignment,
)


def _pairs(spark, edges):
    return spark.createDataFrame(
        [Row(id_a=a, id_b=b) for a, b in edges], schema="id_a bigint, id_b bigint"
    )


def _comp(spark, edges):
    rows = connected_components(_pairs(spark, edges)).collect()
    return {r["node"]: r["cluster_id"] for r in rows}


def test_single_pair(spark):
    assert _comp(spark, [(5, 9)]) == {5: 5, 9: 5}


def test_chain_propagates_past_diameter(spark):
    # 7-node chain: min label must travel the full diameter
    edges = [(i, i + 1) for i in range(1, 7)]
    got = _comp(spark, edges)
    assert got == {i: 1 for i in range(1, 8)}


def test_clique_and_disjoint_components(spark):
    edges = [(10, 11), (11, 12), (10, 12), (20, 21), (30, 31), (31, 32)]
    got = _comp(spark, edges)
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 31: 30, 32: 30}


def test_unconverged_raises_not_partial_labels(spark):
    # round-3 ADVICE: exiting via max_iters with labels still changing
    # must RAISE, not silently return mislabeled components
    import pytest

    edges = [(i, i + 1) for i in range(60)]
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_pairs(spark, edges), max_iters=1)
    # strict=False opts back into bounded partial labels
    rows = connected_components(
        _pairs(spark, edges), max_iters=1, strict=False
    ).collect()
    assert len(rows) == 61


def test_adversarial_chain_converges_in_log_rounds(spark):
    """Round-3 verdict #6 (adversarial-diameter probe): a 400-node
    chained-plagiarism path has diameter 400 — plain min-label
    propagation needs ~400 rounds; the pointer-jumping step must bring
    it to O(log n) (~10), inside the default max_iters=25."""
    edges = [(i, i + 1) for i in range(400)]
    stats: dict = {}
    rows = connected_components(_pairs(spark, edges), stats=stats).collect()
    assert stats["converged"]
    assert stats["rounds"] <= 12, f"took {stats['rounds']} rounds"
    assert {r["node"]: r["cluster_id"] for r in rows} == {
        i: 0 for i in range(401)
    }


def test_dedup_assignment_covers_singletons(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i) for i in range(8)], schema="doc_id bigint"
    )
    out = dedup_assignment(docs, _pairs(spark, [(1, 3), (3, 5), (2, 6)])).collect()
    got = {r["doc_id"]: (r["cluster_id"], r["is_canonical"]) for r in out}
    assert got == {
        0: (0, True),
        1: (1, True),
        2: (2, True),
        3: (1, False),
        4: (4, True),
        5: (1, False),
        6: (2, False),
        7: (7, True),
    }
    # exactly one canonical per cluster
    clusters: dict = {}
    for doc, (cl, canon) in got.items():
        clusters.setdefault(cl, 0)
        clusters[cl] += int(canon)
    assert all(v == 1 for v in clusters.values())
