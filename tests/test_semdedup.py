"""SemDeDup (Abbas et al. 2023) — cluster-bucketed semantic dedup.

Coverage mirrors the oracle-gate rigor (the registry sits at the
driver's hard 50-row cap, so the cross-engine pin lives here):
semantics on a hand-built corpus vs an independent numpy reference,
exact keep-rule/tie-break pins, a full-pipeline DuckDB replay
(k-medians training included) at SF_ORACLE, and the plan gate (the
within-cell candidate join must be an equi-join, never a cartesian).
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from arcane_stream_parquet_spark.operators.similarity import (
    semantic_duplicates,
    train_ivf_centroids,
)
from arcane_stream_parquet_spark.plans.llm_queries import (
    IVF_NUM_CENTROIDS,
    IVF_TRAIN_ITERS,
    SEMDEDUP_TAU,
    _micro,
    _sql_cosine,
    _sql_kmedians_iter,
    _sql_vec,
    micro_col,
)
from tests.conftest import SF_ORACLE


def _h(s: str) -> float:
    return int(hashlib.sha256(s.encode()).hexdigest()[:8], 16) / 2**32 * 2.0 - 1.0


def _np_reference(vecs: dict[int, list[float]], cents, tau: float):
    """Independent reference: same semantics, plain Python floats with
    left-to-right accumulation (bit-identical to dot_expr)."""

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def cos(a, b):
        return dot(a, b) / ((dot(a, a) ** 0.5) * (dot(b, b) ** 0.5))

    cell = {}
    cs = {}
    for vid, v in vecs.items():
        best = max(cents, key=lambda c: (cos(v, c[1]), -c[0]))
        cell[vid] = best[0]
        cs[vid] = cos(v, best[1])
    dup = {}
    for a in vecs:
        dup[a] = any(
            b != a
            and cell[b] == cell[a]
            and cos(vecs[a], vecs[b]) >= tau
            and (cs[b] < cs[a] or (cs[b] == cs[a] and b < a))
            for b in vecs
        )
    return cell, cs, dup


@pytest.fixture(scope="module")
def micro(spark):
    """Two well-separated hash-derived clusters. Cluster 0 isolates
    the exact-copy tie-break (copies + below-tau outlier only);
    cluster 1 adds a perturbed near-dup that sits farther from the
    centroid, so the strict keep rule flags BOTH closer-in copies."""
    dim = 16
    centers = [[_h(f"sd-c{c}|{d}") for d in range(dim)] for c in range(2)]
    vecs: dict[int, list[float]] = {}
    for c in range(2):
        base = centers[c]
        off = c * 10
        vecs[off + 0] = [x + 0.05 * _h(f"sd-n{off}|{d}") for d, x in enumerate(base)]
        vecs[off + 1] = list(vecs[off + 0])  # exact copy → exact cs tie
        if c == 1:
            vecs[off + 2] = [
                x + 0.25 * _h(f"sd-p{off}|{d}") for d, x in enumerate(base)
            ]  # near-dup of 0/1, farther from the centroid
        vecs[off + 3] = [
            x + 3.0 * _h(f"sd-o{off}|{d}") for d, x in enumerate(base)
        ]  # outlier: same cell, below tau against everything
    df = spark.createDataFrame(
        [Row(vec_id=k, embedding=v) for k, v in sorted(vecs.items())],
        schema="vec_id bigint, embedding array<double>",
    )
    cents = [(c, centers[c]) for c in range(2)]
    return df, vecs, cents


def test_micro_corpus_matches_reference(micro):
    df, vecs, cents = micro
    got = {
        r["vec_id"]: (r["cell"], r["cent_sim"], r["is_semantic_dup"])
        for r in semantic_duplicates(df, cents, tau=0.9).collect()
    }
    cell, cs, dup = _np_reference(vecs, cents, tau=0.9)
    assert set(got) == set(vecs)
    for vid in vecs:
        assert got[vid][0] == cell[vid], vid
        assert got[vid][1] == pytest.approx(cs[vid], abs=0.0), vid
        assert got[vid][2] == dup[vid], vid
    # the scenario actually exercises every branch:
    flags = {vid: got[vid][2] for vid in vecs}
    assert {flags[0], flags[1]} == {True, False}, "exact tie: exactly one kept"
    assert flags[1], "higher id of an exact tie is the duplicate"
    assert not flags[3] and not flags[13], "below-tau outliers never flagged"


def test_keep_rule_prefers_low_centroid_similarity(micro):
    df, vecs, cents = micro
    cell, cs, dup = _np_reference(vecs, cents, tau=0.9)
    # vec 12 sits farther from its centroid than the copies 10/11 and
    # clears tau against both — the keep rule keeps IT (the outer-shell
    # example, per the paper) and flags both closer-in copies
    assert cs[12] < cs[10]
    assert not dup[12]
    assert dup[10] and dup[11]


def test_duckdb_full_pipeline_parity(spark):
    """Training + assignment + pairing + keep rule replayed in DuckDB
    on the real embeddings table — the same end-to-end pin the driver
    gate would apply (slot-capped at 50 rows; see ROUND13_NOTES)."""
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    cents = train_ivf_centroids(emb, k=IVF_NUM_CENTROIDS, iters=IVF_TRAIN_ITERS)
    out = semantic_duplicates(emb, cents, tau=SEMDEDUP_TAU).select(
        "vec_id",
        "cell",
        micro_col(F.col("cent_sim")).alias("cent_sim_micro"),
        "is_semantic_dup",
    )
    got = sorted(
        (int(r[0]), int(r[1]), int(r[2]), bool(r[3])) for r in out.collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_ORACLE}/embeddings.parquet'"
    )
    sql = f"""
        WITH corpus AS (SELECT vec_id, {_sql_vec()} AS v FROM embeddings),
        cent0 AS (
            SELECT vec_id AS cid, v AS cv FROM corpus
            WHERE vec_id < {IVF_NUM_CENTROIDS}
        ),
        {",".join(_sql_kmedians_iter(i + 1, 64) for i in range(IVF_TRAIN_ITERS))},
        cent AS (SELECT cid, cv FROM cent{IVF_TRAIN_ITERS}),
        assigned AS (
            SELECT vec_id, cid, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY sim DESC, cid ASC) AS rn
            FROM (
                SELECT c.vec_id, ct.cid, {_sql_cosine("c.v", "ct.cv")} AS sim
                FROM corpus c CROSS JOIN cent ct
            )
        ),
        scored AS (
            SELECT c.vec_id, a.cid AS cell, c.v,
                   {_sql_cosine("c.v", "ct.cv")} AS cs
            FROM corpus c
            JOIN assigned a ON a.vec_id = c.vec_id AND a.rn = 1
            JOIN cent ct ON ct.cid = a.cid
        ),
        losers AS (
            SELECT DISTINCT a.vec_id
            FROM scored a JOIN scored b
              ON a.cell = b.cell AND a.vec_id <> b.vec_id
            WHERE {_sql_cosine("a.v", "b.v")} >= {SEMDEDUP_TAU}
              AND (b.cs < a.cs OR (b.cs = a.cs AND b.vec_id < a.vec_id))
        )
        SELECT s.vec_id, s.cell, {_micro("s.cs")} AS cent_sim_micro,
               s.vec_id IN (SELECT vec_id FROM losers) AS is_semantic_dup
        FROM scored s
    """
    want = sorted(
        (int(a), int(b), int(c), bool(d))
        for a, b, c, d in con.execute(sql).fetchall()
    )
    con.close()
    assert got == want
    assert any(r[3] for r in got), "tau must flag at least one duplicate"
    assert not all(r[3] for r in got)


def test_plan_is_equijoin_never_cartesian(micro):
    """The within-cell candidate join must be an EQUI-join (here a
    SortMergeJoin on cell) — never a cartesian. Since r16 the centroid
    argmax runs as a row-local literal projection (k·dim under
    ROWLOCAL_ASSIGN_MAX_VALUES), so the plan has NO nested-loop join
    at all — the former three K-row centroid-expansion NLJs are gone
    (test_plans._NLJ_ALLOWLIST dropped to 0)."""
    df, _, cents = micro
    plan = (
        semantic_duplicates(df, cents, tau=0.9, pair_backend="sql")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 0
    # r16: the pair sides are plain-renamed ABOVE the shared by-cell
    # exchange (so AQE stage reuse sees byte-identical subtrees), so the
    # equi-join keys are the renamed __cella/__cellb — same cell values.
    assert "SortMergeJoin [__cella" in plan
    # both sides hash-partition by the SAME repartition(cell) — the
    # shared-exchange shape (reuse itself is adjudicated at runtime by
    # AQE; the static plan pins the identical partitioning intent)
    assert plan.count("REPARTITION_BY_COL") == 2


def test_arrow_backend_plan_one_grouped_pass(micro):
    """The default (arrow) backend: NO join at all — the within-cell
    pairs run inside one FlatMapGroupsInPandas keyed by cell, which
    emits every row with its flag (r16 batch 3), so even the former
    by-id flag join-back (whose probe side re-ran the whole corpus
    assignment) is gone: one corpus pass, one exchange, zero joins."""
    df, _, cents = micro
    plan = (
        semantic_duplicates(df, cents, tau=0.9)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 0
    assert plan.count("FlatMapGroupsInPandas") == 1
    assert "SortMergeJoin [__cella" not in plan
    assert "Join" not in plan


def test_arrow_backend_bit_identical_to_sql(micro):
    """The arrow pair pass must reproduce the fold's floats BIT-FOR-BIT
    (same left-to-right IEEE accumulation) — on the micro corpus (exact
    ties included) and on a loose-tau run that admits borderline pairs."""
    df, _, cents = micro
    for tau in (0.9, 0.35):
        a = sorted(
            map(tuple, semantic_duplicates(df, cents, tau=tau).collect())
        )
        b = sorted(
            map(
                tuple,
                semantic_duplicates(
                    df, cents, tau=tau, pair_backend="sql"
                ).collect(),
            )
        )
        assert a == b, tau


def test_deterministic_across_runs(micro):
    df, _, cents = micro
    a = sorted(map(tuple, semantic_duplicates(df, cents, tau=0.9).collect()))
    b = sorted(
        map(tuple, semantic_duplicates(df.repartition(7), cents, tau=0.9).collect())
    )
    assert a == b
