"""Unit tests for domain-mixture sampling (operators/mixing.py):
exact integer threshold arithmetic, budget semantics, determinism,
and cross-engine (DuckDB) agreement of the data-dependent thresholds
— the property the oracle row then re-proves at sf0.01.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from arcane_stream_parquet_spark.operators.mixing import (
    domain_mixture_sample,
    mixture_report,
)
from arcane_stream_parquet_spark.operators.sampling import HASH_BUCKETS

PARTS = {"web": 5, "code": 3, "wiki": 2}
W = 10


def corpus(spark, n_per=200):
    rows = []
    for i in range(n_per * 3):
        dom = ("web", "code", "wiki", "junk")[i % 4]
        rows.append((i, dom, 50 + (i * 37) % 200))
    return spark.createDataFrame(
        rows, "doc_id bigint, domain string, n_tokens bigint"
    )


def expected_thresholds(df):
    """Hand-computed integer thresholds (the module-docstring formula)."""
    totals = {
        r["domain"]: r["t"]
        for r in df.groupBy("domain").agg(F.sum("n_tokens").alias("t")).collect()
    }
    b = min(totals[d] * W // p for d, p in PARTS.items())
    return {
        d: min(HASH_BUCKETS, HASH_BUCKETS * p * b // (W * totals[d]))
        for d, p in PARTS.items()
    }, b


def test_thresholds_integer_exact(spark):
    df = corpus(spark)
    out = domain_mixture_sample(df, "domain", PARTS, "doc_id", "n_tokens")
    got = {
        r["domain"]: r["_mix_threshold"]
        for r in out.select("domain", "_mix_threshold").distinct().collect()
    }
    want, _ = expected_thresholds(df)
    # every surviving domain carries exactly the hand-computed threshold
    assert all(got[d] == want[d] for d in got)
    # the binding domain (min T*W/p) keeps everything: threshold == 10000
    assert max(want.values()) == HASH_BUCKETS == max(got.values())


def test_unlisted_domain_dropped_and_deterministic(spark):
    df = corpus(spark)
    out = domain_mixture_sample(df, "domain", PARTS, "doc_id", "n_tokens")
    assert out.filter(F.col("domain") == "junk").count() == 0
    ids1 = sorted(r[0] for r in out.select("doc_id").collect())
    ids2 = sorted(
        r[0]
        for r in domain_mixture_sample(
            df.repartition(7), "domain", PARTS, "doc_id", "n_tokens"
        )
        .select("doc_id")
        .collect()
    )
    assert ids1 == ids2 and len(ids1) > 0


def test_budget_cap_scales_all_domains(spark):
    df = corpus(spark)
    _, b_max = expected_thresholds(df)
    budget = b_max // 3
    out = domain_mixture_sample(
        df, "domain", PARTS, "doc_id", "n_tokens", budget_tokens=budget
    )
    rep = {
        r["domain"]: r
        for r in mixture_report(df, out, "domain", "n_tokens").collect()
    }
    for d, p in PARTS.items():
        target = p * budget / W
        got = rep[d]["kept_tokens"]
        # hash quantization: realized mass within ±35% of target at n=150
        assert got == pytest.approx(target, rel=0.35), (d, got, target)
    # and strictly less than the uncapped run
    full = domain_mixture_sample(df, "domain", PARTS, "doc_id", "n_tokens")
    assert out.count() < full.count()


def test_mixture_report_accounts_everything(spark):
    df = corpus(spark)
    out = domain_mixture_sample(df, "domain", PARTS, "doc_id", "n_tokens")
    rep = {r["domain"]: r for r in mixture_report(df, out, "domain", "n_tokens").collect()}
    assert set(rep) == {"web", "code", "wiki", "junk"}
    assert rep["junk"]["kept_docs"] == 0 and rep["junk"]["threshold"] == 0
    for d in PARTS:
        assert 0 < rep[d]["kept_docs"] <= rep[d]["total_docs"]


def test_invalid_parts_raise(spark):
    df = corpus(spark)
    with pytest.raises(ValueError, match="at least one"):
        domain_mixture_sample(df, "domain", {}, "doc_id", "n_tokens")
    with pytest.raises(ValueError, match="positive integers"):
        domain_mixture_sample(df, "domain", {"web": 0}, "doc_id", "n_tokens")
    with pytest.raises(ValueError, match="positive integers"):
        domain_mixture_sample(df, "domain", {"web": -2}, "doc_id", "n_tokens")


def test_duckdb_agrees_on_kept_ids(spark):
    """Cross-engine proof: DuckDB computing the same integer-threshold
    pipeline (same sha256 hash grid, same ``//`` arithmetic) keeps the
    IDENTICAL document set — no float boundary, no dialect drift."""
    df = corpus(spark)
    spark_ids = sorted(
        r[0]
        for r in domain_mixture_sample(df, "domain", PARTS, "doc_id", "n_tokens")
        .select("doc_id")
        .collect()
    )
    con = duckdb.connect()
    con.register("corpus", df.toPandas())
    parts_values = ", ".join(f"('{d}', {p})" for d, p in PARTS.items())
    from arcane_stream_parquet_spark.plans.llm_queries import _sql_hash_bucket

    bucket = _sql_hash_bucket("doc_id", "mix")
    duck_ids = [
        r[0]
        for r in con.sql(
            f"""
            WITH parts AS (SELECT * FROM (VALUES {parts_values}) t(domain, p)),
            totals AS (
                SELECT c.domain, CAST(SUM(c.n_tokens) AS BIGINT) AS T, p.p
                FROM corpus c JOIN parts p USING (domain) GROUP BY 1, 3
            ),
            feasible AS (SELECT MIN(T * {W} // p) AS B FROM totals),
            rates AS (
                SELECT domain,
                       least({HASH_BUCKETS},
                             ({HASH_BUCKETS} * p * B) // ({W} * T)) AS thr
                FROM totals, feasible
            )
            SELECT c.doc_id FROM corpus c JOIN rates r USING (domain)
            WHERE {bucket} < r.thr ORDER BY c.doc_id
            """
        ).fetchall()
    ]
    assert duck_ids == spark_ids


def test_missing_weighted_domain_yields_empty(spark):
    # a domain named in parts but ABSENT from the corpus makes the
    # weights unsatisfiable: B_max = 0 -> empty mixture, never a
    # silently wiki-free mixture claiming 50/30/20 (ADVICE r10)
    df = corpus(spark).filter(F.col("domain") != "wiki")
    out = domain_mixture_sample(df, "domain", PARTS, "doc_id", "n_tokens")
    assert out.count() == 0


def test_zero_token_weighted_domain_yields_empty(spark):
    # present-but-zero-token domain is the same unsatisfiable case
    df = corpus(spark).withColumn(
        "n_tokens",
        F.when(F.col("domain") == "wiki", F.lit(0)).otherwise(
            F.col("n_tokens")
        ).cast("bigint"),
    )
    out = domain_mixture_sample(df, "domain", PARTS, "doc_id", "n_tokens")
    assert out.count() == 0


def test_integer_domain_column(spark):
    # review find (r11): the parts frame must take the DATAFRAME's
    # domain type — int domain ids are as legal as strings
    df = spark.createDataFrame(
        [(i, i % 3, 100) for i in range(300)],
        "doc_id long, domain bigint, n_tokens bigint",
    )
    out = domain_mixture_sample(
        df, "domain", {0: 1, 1: 1, 2: 1}, "doc_id", "n_tokens"
    )
    got = out.groupBy("domain").count().collect()
    assert {r["domain"] for r in got} == {0, 1, 2}
    # absent int domain still collapses to empty
    out2 = domain_mixture_sample(
        df, "domain", {0: 1, 7: 1}, "doc_id", "n_tokens"
    )
    assert out2.count() == 0


def test_fused_report_equals_composed_pair(spark):
    """r12: domain_mixture_report (two corpus scans) must equal
    mixture_report(df, domain_mixture_sample(df, ...)) row-for-row —
    including an unweighted domain (kept=0, threshold=0), a weighted
    domain whose every row is filtered out at a tiny budget
    (threshold reported as 0, the composed pair's no-kept-row shape),
    and a domain kept in full."""
    from arcane_stream_parquet_spark.operators.mixing import (
        domain_mixture_report,
        domain_mixture_sample,
        mixture_report,
    )

    rows = [(i, "web" if i % 3 else "code", 10 + i % 7) for i in range(300)]
    rows += [(1000 + i, "junk", 5) for i in range(20)]
    rows += [(2000 + i, "wiki", 1) for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, domain string, toks long")
    for parts, budget in [
        ({"web": 5, "code": 3, "wiki": 2}, None),
        ({"web": 5, "code": 3, "wiki": 2}, 40),
        ({"web": 1}, 7),
    ]:
        composed = mixture_report(
            df,
            domain_mixture_sample(
                df, "domain", parts, "doc_id", "toks", budget
            ),
            "domain",
            "toks",
        )
        fused = domain_mixture_report(
            df, "domain", parts, "doc_id", "toks", budget
        )
        a = sorted(tuple(r) for r in composed.collect())
        b = sorted(tuple(r) for r in fused.collect())
        assert a == b, (parts, budget, a, b)
        # names+types (nullability flags differ benignly between a
        # count-coalesce and a conditional-sum aggregate)
        assert (
            composed.schema.simpleString() == fused.schema.simpleString()
        )
