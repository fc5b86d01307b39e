"""Two-level IVF coarse assignment (O(n·√k) — the SCALE.md r13
mitigation for the k ∝ n flat-assignment term).

Pins: exact agreement on separated clusters, bit-determinism across
runs, no lost rows even when supers end up childless, composition into
semantic_duplicates, measured agreement floor on the real embeddings
table, and the plan gate (broadcast joins only, NLJ count pinned to
the allowlisted centroid-table pattern)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from arcane_stream_parquet_spark.operators.similarity import (
    group_centroids,
    ivf_assign,
    ivf_assign_two_level,
    semantic_duplicates,
    train_ivf_centroids,
)
from tests.conftest import SF_ORACLE


def _cluster_corpus(spark):
    """Three well-separated axis clusters in R^4."""
    rows = []
    for c, axis in enumerate([0, 1, 2]):
        for i in range(6):
            v = [0.01 * i] * 4
            v[axis] = 10.0 + i
            rows.append(Row(vec_id=c * 100 + i, embedding=[float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _axis_centroids():
    cents = []
    cid = 0
    for axis in range(3):
        for bump in (9.0, 12.0):  # two centroids per cluster axis
            v = [0.0] * 4
            v[axis] = bump
            cents.append((cid, v))
            cid += 1
    return cents


def test_agrees_with_exact_on_separated_clusters(spark):
    corpus = _cluster_corpus(spark)
    cents = _axis_centroids()
    exact = {r["vec_id"]: r["cell"] for r in ivf_assign(corpus, cents).collect()}
    two = {
        r["vec_id"]: r["cell"]
        for r in ivf_assign_two_level(corpus, cents, branch=3).collect()
    }
    assert two == exact


def test_deterministic_across_runs(spark):
    corpus = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    cents = train_ivf_centroids(corpus, k=16, iters=1)
    a = sorted(
        (r["vec_id"], r["cell"])
        for r in ivf_assign_two_level(corpus, cents).collect()
    )
    b = sorted(
        (r["vec_id"], r["cell"])
        for r in ivf_assign_two_level(corpus, cents).collect()
    )
    assert a == b


def test_no_rows_lost_even_with_childless_supers(spark):
    """branch == k forces one super per child at best; empty-cell
    supers (training keeps their previous centroid) must not drop
    corpus rows through the inner children join."""
    corpus = _cluster_corpus(spark)
    cents = _axis_centroids()
    out = ivf_assign_two_level(corpus, cents, branch=len(cents))
    assert out.count() == corpus.count()
    sups, child_of = group_centroids(spark, cents, branch=len(cents))
    assert set(child_of) == {c for c, _ in cents}  # every child mapped
    assert {s for s, _ in sups} == set(child_of.values())  # no dead supers


def test_semdedup_composes_and_matches_exact_on_separated(spark):
    corpus = _cluster_corpus(spark)
    cents = _axis_centroids()
    exact = sorted(
        tuple(r)
        for r in semantic_duplicates(corpus, cents, tau=0.9).collect()
    )
    two = sorted(
        tuple(r)
        for r in semantic_duplicates(
            corpus, cents, tau=0.9, assign="two_level", branch=3
        ).collect()
    )
    assert two == exact
    with pytest.raises(ValueError):
        semantic_duplicates(corpus, cents, assign="nope")


def test_agreement_floor_on_real_embeddings(spark):
    """Approximation quality on the UNSTRUCTURED testdata embeddings —
    the tree quantizer's adversarial case (clustered data, the real
    regime, is the exact-agreement test above). Measured at
    k=64/branch=8: 0.558 / 0.736 / 0.842 for probe_supers 1/2/3; pin
    floors with margin so regressions surface without flaking, and pin
    that more probes never hurt."""
    corpus = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    cents = train_ivf_centroids(corpus, k=64, iters=2)
    exact = {r["vec_id"]: r["cell"] for r in ivf_assign(corpus, cents).collect()}
    agree = {}
    for ps in (1, 2, 3):
        two = {
            r["vec_id"]: r["cell"]
            for r in ivf_assign_two_level(corpus, cents, probe_supers=ps).collect()
        }
        assert set(two) == set(exact)
        agree[ps] = sum(two[i] == exact[i] for i in two) / len(two)
    assert agree[1] >= 0.45 and agree[2] >= 0.65 and agree[3] >= 0.75, agree
    assert agree[1] <= agree[2] <= agree[3], agree
    # the DEFAULT probe_supers is derived from this ladder: smallest
    # probe count whose unstructured agreement clears 0.8 (r13 VERDICT
    # item 4). Pin that the default actually meets the target here —
    # the adversarial fixture, not the friendly separated one.
    dflt = {
        r["vec_id"]: r["cell"]
        for r in ivf_assign_two_level(corpus, cents).collect()
    }
    dflt_agree = sum(dflt[i] == exact[i] for i in dflt) / len(dflt)
    assert dflt_agree >= 0.8, dflt_agree


def test_probe_supers_validation_and_upper_clamp(spark):
    """probe_supers < 1 raises (r13 ADVICE: a typo'd dial must not be
    silently clamped to 1); requests past the live super count still
    clamp DOWN, because dead-super dropping can legitimately shrink
    the tree below the request."""
    corpus = _cluster_corpus(spark)
    cents = _axis_centroids()
    for bad in (0, -2):
        with pytest.raises(ValueError):
            ivf_assign_two_level(corpus, cents, probe_supers=bad)
    big = ivf_assign_two_level(corpus, cents, branch=3, probe_supers=99)
    assert big.count() == corpus.count()


def test_precomputed_tree_reused_across_consumers(spark):
    """group_centroids once → pass the (supers, child_of) tree to both
    two-level consumers: byte-identical to the retrain-per-call path
    (r13 ADVICE: composed pipelines shouldn't pay the tree twice)."""
    corpus = _cluster_corpus(spark)
    cents = _axis_centroids()
    tree = group_centroids(spark, cents, branch=3)
    fresh = sorted(
        (r["vec_id"], r["cell"])
        for r in ivf_assign_two_level(corpus, cents, branch=3).collect()
    )
    reused = sorted(
        (r["vec_id"], r["cell"])
        for r in ivf_assign_two_level(corpus, cents, tree=tree).collect()
    )
    assert reused == fresh
    sd = sorted(
        tuple(r)
        for r in semantic_duplicates(
            corpus, cents, tau=0.9, assign="two_level", tree=tree
        ).collect()
    )
    sd_exact = sorted(
        tuple(r) for r in semantic_duplicates(corpus, cents, tau=0.9).collect()
    )
    assert sd == sd_exact  # separated clusters: two_level is exact


def test_plan_no_cartesian(spark):
    corpus = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    cents = train_ivf_centroids(corpus, k=16, iters=1)
    plan = (
        ivf_assign_two_level(corpus, cents)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # r16: the super-cell probe is a row-local literal projection
    # (branch·dim under ROWLOCAL_ASSIGN_MAX_VALUES) — the former
    # no-condition super-table broadcast is gone; the children join
    # stays a real equi-join.
    assert plan.count("BroadcastNestedLoopJoin") == 0
    assert "BroadcastHashJoin" in plan


def test_ivf_topk_two_level_matches_exact_on_separated(spark):
    from arcane_stream_parquet_spark.operators.similarity import ivf_topk

    corpus = _cluster_corpus(spark)
    cents = _axis_centroids()
    queries = corpus.limit(3)
    kw = dict(id_col="vec_id", vec_col="embedding", k=3, nprobe=2)
    exact = sorted(tuple(r) for r in ivf_topk(corpus, queries, cents, **kw).collect())
    two = sorted(
        tuple(r)
        for r in ivf_topk(corpus, queries, cents, assign="two_level", **kw).collect()
    )
    assert two == exact
    with pytest.raises(ValueError):
        ivf_topk(corpus, queries, cents, assign="bogus")
