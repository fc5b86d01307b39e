"""first_fit_packing — whole-sample bin packing (FFD) for SFT-style
loaders that must keep samples intact (the complement of
sequence_packing's concat-and-chunk). Registry sits at the driver's
50-row cap, so the cross-engine-grade pins live here: an independent
pure-python FFD reference (bit-exact parity on the real documents
table), the packing invariants as a hypothesis property, determinism
across partitionings, overflow semantics, and the audit stats."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from arcane_stream_parquet_spark.operators.packing import (
    first_fit_packing,
    packing_stats,
)
from tests.conftest import SF_SMOKE

BUDGET = 128


def _stream_of(doc_id: int, num_streams: int) -> int:
    h = hashlib.sha256(f"ffd|{doc_id}".encode()).hexdigest()
    return int(h[:8], 16) % num_streams


def _ref_ffd(docs: dict[int, int], budget: int, num_streams: int):
    """Independent FFD reference: per stream, (n DESC, id ASC) order,
    first bin (creation order) that fits, overflow docs own bins."""
    by_stream: dict[int, list[int]] = {}
    for i in docs:
        by_stream.setdefault(_stream_of(i, num_streams), []).append(i)
    out = {}
    for s, ids in by_stream.items():
        ids.sort(key=lambda i: (-docs[i], i))
        fills: list[int] = []
        pending_over = []
        for i in ids:
            n = docs[i]
            if n > budget:
                pending_over.append(i)
                continue
            for bi in range(len(fills)):
                if fills[bi] + n <= budget:
                    fills[bi] += n
                    out[i] = (s, bi, False)
                    break
            else:
                fills.append(n)
                out[i] = (s, len(fills) - 1, False)
        nxt = len(fills)
        for i in pending_over:
            out[i] = (s, nxt, True)
            nxt += 1
    return out


def test_matches_python_reference_on_documents(spark):
    docs_df = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    got = {
        r["doc_id"]: (r["stream"], r["bin_in_stream"], r["overflow"],
                      r["n_tokens"], r["bin_id"], r["bin_fill"])
        for r in first_fit_packing(
            docs_df, budget=BUDGET, num_streams=8
        ).collect()
    }
    docs = {
        d: n for d, (_s, _b, _o, n, _g, _f) in got.items()
    }
    want = _ref_ffd(docs, BUDGET, 8)
    assert len(got) == len(want) > 0
    fills: dict[tuple[int, int], int] = {}
    for i, (s, b, o) in want.items():
        fills[(s, b)] = fills.get((s, b), 0) + docs[i]
    for i, (s, b, o) in want.items():
        gs, gb, go, _n, gid, gfill = got[i]
        assert (gs, gb, go) == (s, b, o), i
        assert gid == s * (1 << 40) + b
        assert gfill == fills[(s, b)], i


@settings(max_examples=40, deadline=None)
@given(
    lengths=st.lists(
        st.integers(min_value=0, max_value=200), min_size=1, max_size=60
    )
)
def test_ffd_reference_invariants(lengths):
    """The reference itself holds the packing invariants for arbitrary
    inputs: every doc placed exactly once, no non-overflow bin exceeds
    the budget, overflow iff longer than budget, and FFD never opens a
    bin that an earlier bin could have absorbed (first-fit rule)."""
    docs = dict(enumerate(lengths))
    out = _ref_ffd(docs, BUDGET, 4)
    assert set(out) == set(docs)
    fills: dict[tuple[int, int], int] = {}
    for i, (s, b, o) in out.items():
        assert o == (docs[i] > BUDGET)
        if not o:
            fills[(s, b)] = fills.get((s, b), 0) + docs[i]
    assert all(v <= BUDGET for v in fills.values())


def test_invariants_and_stats_on_spark_output(spark):
    rows = [
        Row(doc_id=i, text=" ".join(["tok"] * n))
        for i, n in enumerate(
            [5, 100, 60, 60, 64, 64, 140, 1, 0, 128, 127, 2]
        )
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    packed = first_fit_packing(df, budget=BUDGET, num_streams=2)
    out = packed.collect()
    assert len(out) == len(rows)
    by_bin: dict[int, int] = {}
    for r in out:
        assert r["overflow"] == (r["n_tokens"] > BUDGET)
        if not r["overflow"]:
            by_bin[r["bin_id"]] = by_bin.get(r["bin_id"], 0) + r["n_tokens"]
    assert all(v <= BUDGET for v in by_bin.values())
    for bin_id, total in by_bin.items():
        fills = {r["bin_fill"] for r in out if r["bin_id"] == bin_id}
        assert fills == {total}

    stats = packing_stats(packed, BUDGET).collect()[0]
    assert stats["n_overflow_docs"] == 1  # the 140-token doc
    assert stats["n_bins"] == stats["n_packed_bins"] + 1
    assert 0 < stats["mean_fill_frac"] <= 1.0
    assert stats["packed_tokens"] == sum(r["n_tokens"] for r in out)


def test_deterministic_across_partitionings(spark):
    docs_df = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    a = sorted(
        map(tuple, first_fit_packing(docs_df, budget=BUDGET).collect())
    )
    b = sorted(
        map(
            tuple,
            first_fit_packing(docs_df.repartition(13), budget=BUDGET).collect(),
        )
    )
    assert a == b and len(a) > 0


def test_validation(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="a")])
    with pytest.raises(ValueError, match="budget"):
        first_fit_packing(df, budget=0)
    with pytest.raises(ValueError, match="num_streams"):
        first_fit_packing(df, budget=10, num_streams=0)


def test_string_doc_ids_supported(spark):
    """r15 ADVICE: the applyInPandas output schema derives the id type
    from the input (a hardcoded bigint made string doc ids die in an
    opaque pandas->Arrow cast). String ids pack with the same
    stream-hash and FFD-order semantics."""
    rows = [
        Row(doc_id=f"doc-{i:03d}", text=" ".join(["tok"] * n))
        for i, n in enumerate([5, 100, 60, 60, 64, 140, 1, 0])
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = first_fit_packing(df, budget=BUDGET, num_streams=2).collect()
    assert len(out) == len(rows)
    assert {type(r["doc_id"]) for r in out} == {str}
    got = {r["doc_id"]: r for r in out}
    assert got["doc-005"]["overflow"] is True  # the 140-token doc
    # stream hash is the portable sha256 of the RAW string id
    for r in out:
        h = hashlib.sha256(f"ffd|{r['doc_id']}".encode()).hexdigest()
        assert r["stream"] == int(h[:8], 16) % 2
    # within-stream FFD invariants hold
    by_bin: dict[int, int] = {}
    for r in out:
        if not r["overflow"]:
            by_bin[r["bin_id"]] = by_bin.get(r["bin_id"], 0) + r["n_tokens"]
    assert all(v <= BUDGET for v in by_bin.values())


def test_stats_all_overflow_is_zero_not_null(spark):
    """r15 ADVICE: when every document overflows there are no packed
    bins — mean_fill_frac must be a defined 0.0, not a silent NULL
    from 0/0 (the audit row a pipeline watches)."""
    rows = [
        Row(doc_id=i, text=" ".join(["tok"] * 200)) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    packed = first_fit_packing(df, budget=BUDGET, num_streams=2)
    stats = packing_stats(packed, BUDGET).collect()[0]
    assert stats["n_overflow_docs"] == 4
    assert stats["n_packed_bins"] == 0
    assert stats["mean_fill_frac"] == 0.0


def test_precomputed_length_col(spark):
    """length_col short-circuits tokenization: packing decisions use
    the caller's counts verbatim (a pipeline that already token-counted
    — e.g. with a real BPE — must not pay or drift through the
    whitespace tokenizer)."""
    rows = [
        Row(doc_id=i, text="ignored words here", n_bpe=n)
        for i, n in enumerate([5, 100, 60, 60, 64, 140, 1, 0])
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, n_bpe bigint"
    )
    out = {
        r["doc_id"]: r
        for r in first_fit_packing(
            df, budget=BUDGET, length_col="n_bpe", num_streams=2
        ).collect()
    }
    assert [out[i]["n_tokens"] for i in range(8)] == [5, 100, 60, 60, 64, 140, 1, 0]
    assert out[5]["overflow"] is True and out[5]["n_tokens"] == 140
    # identical to packing the same lengths via text tokens
    rows2 = [
        Row(doc_id=i, text=" ".join(["t"] * n))
        for i, n in enumerate([5, 100, 60, 60, 64, 140, 1, 0])
    ]
    df2 = spark.createDataFrame(rows2, "doc_id bigint, text string")
    want = {
        r["doc_id"]: tuple(r)
        for r in first_fit_packing(df2, budget=BUDGET, num_streams=2).collect()
    }
    assert {i: tuple(r) for i, r in out.items()} == want
