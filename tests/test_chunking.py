"""chunk_documents — overlapping token-window splitter.

Registry sits at the driver's hard 50-row cap, so the cross-engine pin
lives here: a full DuckDB replay over the real documents table at
SF_ORACLE, exact edge-case pins, a coverage/overlap property
(hypothesis over the chunk math), and the plan gate (row-local — zero
Exchange in the physical plan).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from arcane_stream_parquet_spark.operators.chunking import chunk_documents
from tests.conftest import SF_ORACLE


def _duck_chunks(sf_dir: str, chunk: int, overlap: int):
    """Independent DuckDB reimplementation of the documented semantics
    (whitespace split of trimmed original-case text, integer ceil via
    //, 1-based list_slice) — written against the docstring, not the
    Spark plan."""
    stride = chunk - overlap
    sql = f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM '{sf_dir}/documents.parquet'
    ), s AS (
      SELECT doc_id, toks, len(toks)::BIGINT AS n FROM t WHERE len(toks) > 0
    ), c AS (
      SELECT doc_id, toks, n,
             CASE WHEN n <= {chunk} THEN 1
                  ELSE 1 + (n - {chunk} + {stride - 1}) // {stride}
             END::BIGINT AS m
      FROM s
    )
    SELECT doc_id,
           i AS chunk_index,
           m AS n_chunks,
           i * {stride} AS token_start,
           len(list_slice(toks, i*{stride} + 1,
                          least(i*{stride} + {chunk}, n)))::BIGINT
             AS chunk_n_tokens,
           array_to_string(list_slice(toks, i*{stride} + 1,
                           least(i*{stride} + {chunk}, n)), ' ')
             AS chunk_text
    FROM c, (SELECT unnest(generate_series(0, (SELECT max(m) FROM c) - 1)) AS i)
    WHERE i < m
    ORDER BY doc_id, chunk_index
    """
    return duckdb.sql(sql).fetchall()


@pytest.mark.parametrize("chunk,overlap", [(64, 16), (16, 0), (8, 7)])
def test_duckdb_replay_parity(spark, chunk, overlap):
    got = (
        chunk_documents(
            spark.read.parquet(f"{SF_ORACLE}/documents.parquet"),
            chunk_tokens=chunk,
            overlap_tokens=overlap,
        )
        .orderBy("doc_id", "chunk_index")
        .collect()
    )
    want = _duck_chunks(SF_ORACLE, chunk, overlap)
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert tuple(g) == tuple(w)


def test_edge_cases_pinned(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g"),          # 7 toks, chunk 3 stride 2 -> 3 chunks
            (2, "  Hello   World  "),      # whitespace runs + case kept
            (3, ""),                        # no tokens -> no rows
            (4, "   \t \n "),               # whitespace only -> no rows
            (7, None),                       # NULL text -> no rows (null
                                             # size filters out like empty)
            (5, "one"),                     # n < chunk -> single short chunk
            (6, "a b c"),                   # n == chunk exactly -> 1 chunk
        ],
        "doc_id long, text string",
    )
    rows = {
        (r.doc_id, r.chunk_index): r
        for r in chunk_documents(df, chunk_tokens=3, overlap_tokens=1).collect()
    }
    assert set(rows) == {(1, 0), (1, 1), (1, 2), (2, 0), (5, 0), (6, 0)}
    assert rows[(1, 0)].chunk_text == "a b c"
    assert rows[(1, 1)].chunk_text == "c d e"
    assert rows[(1, 2)].chunk_text == "e f g"
    assert rows[(1, 2)].token_start == 4 and rows[(1, 2)].chunk_n_tokens == 3
    assert all(rows[(1, i)].n_chunks == 3 for i in range(3))
    assert rows[(2, 0)].chunk_text == "Hello World"  # case preserved
    assert rows[(5, 0)].chunk_n_tokens == 1 and rows[(5, 0)].n_chunks == 1
    assert rows[(6, 0)].n_chunks == 1  # no degenerate trailing chunk


def test_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap_tokens=4)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap_tokens=-1)


def _py_chunk_starts(n: int, chunk: int, stride: int) -> list[int]:
    """Reference chunk math: starts advance by stride until coverage."""
    if n <= 0:
        return []
    if n <= chunk:
        return [0]
    m = 1 + -(-(n - chunk) // stride)
    return [i * stride for i in range(m)]


@settings(max_examples=200, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=500),
    chunk=st.integers(min_value=1, max_value=64),
    data=st.data(),
)
def test_chunk_math_covers_and_overlaps(n, chunk, data):
    """Model-level property of the documented formula: full coverage,
    exact overlap between consecutive full chunks, no chunk fully
    contained in its predecessor, final chunk non-empty."""
    overlap = data.draw(st.integers(min_value=0, max_value=chunk - 1))
    stride = chunk - overlap
    starts = _py_chunk_starts(n, chunk, stride)
    covered = set()
    prev_end = None
    for s in starts:
        end = min(s + chunk, n)
        assert end > s  # never an empty chunk
        if prev_end is not None:
            assert s <= prev_end  # consecutive chunks connect (no gap)
            if overlap > 0:
                assert s < prev_end  # overlapping chunks actually overlap
            assert end > prev_end  # strictly advances — no contained chunk
        covered.update(range(s, end))
        prev_end = end
    if n > 0:
        assert covered == set(range(n))
    else:
        assert not starts


def test_spark_matches_model_on_synthetic(spark):
    """The Spark operator reproduces the model starts for a grid of
    (n, chunk, overlap) in one DataFrame pass."""
    cases = [(n, c, o) for n in (1, 2, 5, 9, 16, 33) for c, o in ((4, 0), (4, 3), (7, 2))]
    df = spark.createDataFrame(
        [(f"{n}-{c}-{o}", " ".join(f"t{j}" for j in range(n))) for n, c, o in cases],
        "doc_id string, text string",
    )
    for c, o in {(c, o) for _, c, o in cases}:
        sub = [f"{n}-{cc}-{oo}" for n, cc, oo in cases if (cc, oo) == (c, o)]
        got = (
            chunk_documents(df.filter(df.doc_id.isin(sub)), chunk_tokens=c, overlap_tokens=o)
            .groupBy("doc_id")
            .agg({"token_start": "collect_list"})
            .collect()
        )
        for r in got:
            n = int(r.doc_id.split("-")[0])
            assert sorted(r[1]) == _py_chunk_starts(n, c, c - o), (r.doc_id, c, o)


def test_plan_is_row_local_no_exchange(spark):
    plan = (
        chunk_documents(spark.read.parquet(f"{SF_ORACLE}/documents.parquet"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Generate" in plan  # the posexplode
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
