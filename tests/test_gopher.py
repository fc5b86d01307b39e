"""gopher_quality_flags — the published Gopher rule battery (Rae et
al. 2021, Appendix A1.1).

Registry sits at the driver's hard 50-row cap, so the cross-engine pin
lives here: an independent DuckDB replay of every rule over the real
documents table (unnest-based reimplementation, written against the
operator's documented semantics, not its plan — including the TWO line
universes: dup gates over non-empty lines, shape gates over non-blank
lines), hand-built documents hitting each rule individually, the
whitespace-only-line divergence case, and the row-local plan pin.
"""

from __future__ import annotations

import duckdb

from arcane_stream_parquet_spark.operators.text import (
    GOPHER_FLAGS,
    GOPHER_STOPWORDS,
    gopher_quality_flags,
)
from tests.conftest import SF_ORACLE

FLAGS = [*GOPHER_FLAGS, "gopher_keep"]


def _duck_flags(rel: str):
    """Independent SQL reimplementation. Dup-line stats run over
    NON-EMPTY lines (repetition_signals' universe); bullet/ellipsis
    shape stats over NON-BLANK lines (trim nonempty) — the operator's
    documented split."""
    stop = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    sql = f"""
    WITH base AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS toks,
             list_filter(string_split(text, chr(10)),
                         l -> length(l) > 0) AS lines_dup,
             list_filter(string_split(text, chr(10)),
                         l -> length(trim(l)) > 0) AS lines_shape
      FROM {rel}
    ),
    words AS (
      SELECT doc_id,
             count(*)::BIGINT AS n_words,
             sum(length(w))::BIGINT AS word_chars,
             count(*) FILTER (regexp_matches(w, '\\p{{L}}'))::BIGINT AS n_alpha,
             count(DISTINCT w) FILTER (w IN ({stop}))::BIGINT AS n_stop
      FROM base, unnest(toks) AS t(w) GROUP BY doc_id
    ),
    dupstats AS (
      SELECT doc_id,
             sum(c)::BIGINT AS n_lines,
             count(*)::BIGINT AS n_distinct,
             sum(c * length(ln))::BIGINT AS chars,
             coalesce(sum(c * length(ln)) FILTER (c >= 2), 0)::BIGINT AS dup_chars
      FROM (SELECT doc_id, ln, count(*)::BIGINT AS c
            FROM base, unnest(lines_dup) AS l(ln) GROUP BY doc_id, ln)
      GROUP BY doc_id
    ),
    shapestats AS (
      SELECT doc_id,
             count(*)::BIGINT AS n_lines,
             count(*) FILTER (regexp_matches(trim(ln), '^[-*•‣▪●]'))::BIGINT
               AS n_bullet,
             count(*) FILTER (regexp_matches(trim(ln), '(\\.\\.\\.|…)$'))::BIGINT
               AS n_ellipsis
      FROM base, unnest(lines_shape) AS l(ln) GROUP BY doc_id
    ),
    bigrams AS (
      SELECT doc_id, max(c)::BIGINT AS top_bg, sum(c)::BIGINT AS n_bg
      FROM (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS bg,
                   count(*)::BIGINT AS c
            FROM base, unnest(range(1, len(toks))) AS r(i)
            GROUP BY doc_id, bg)
      GROUP BY doc_id
    ),
    syms AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '#'))::BIGINT AS n_hash,
             (len(regexp_extract_all(text, '\\.\\.\\.'))
              + len(regexp_extract_all(text, '…')))::BIGINT AS n_ell
      FROM base
    )
    SELECT b.doc_id,
      coalesce(w.n_words >= 50 AND w.n_words <= 100000, FALSE) AS ok_wc,
      coalesce(w.word_chars / w.n_words::DOUBLE >= 3.0
               AND w.word_chars / w.n_words::DOUBLE <= 10.0, FALSE) AS ok_mwl,
      coalesce(s.n_hash / w.n_words::DOUBLE <= 0.1, FALSE) AS ok_hash,
      coalesce(s.n_ell / w.n_words::DOUBLE <= 0.1, FALSE) AS ok_ellr,
      coalesce(coalesce(p.n_bullet / p.n_lines::DOUBLE, 0.0) <= 0.9, FALSE)
        AS ok_bul,
      coalesce(coalesce(p.n_ellipsis / p.n_lines::DOUBLE, 0.0) <= 0.3, FALSE)
        AS ok_ell,
      coalesce(w.n_alpha / w.n_words::DOUBLE >= 0.8, FALSE) AS ok_alpha,
      coalesce(w.n_stop >= 2, FALSE) AS ok_stop,
      coalesce(coalesce(1.0 - d.n_distinct / d.n_lines::DOUBLE, 0.0) <= 0.3,
               FALSE) AS ok_dl,
      coalesce(coalesce(d.dup_chars / d.chars::DOUBLE, 0.0) <= 0.2, FALSE)
        AS ok_dlc,
      coalesce(coalesce(g.top_bg / g.n_bg::DOUBLE, 0.0) <= 0.2, FALSE) AS ok_bg
    FROM base b
    LEFT JOIN words w USING (doc_id)
    LEFT JOIN dupstats d USING (doc_id)
    LEFT JOIN shapestats p USING (doc_id)
    LEFT JOIN bigrams g USING (doc_id)
    LEFT JOIN syms s USING (doc_id)
    ORDER BY b.doc_id
    """
    return duckdb.sql(sql).fetchall()


def _assert_parity(spark_rows, duck_rows):
    assert len(spark_rows) == len(duck_rows) > 0
    mism = []
    for g, w in zip(spark_rows, duck_rows):
        spark_flags = [bool(g[f]) for f in FLAGS[:-1]]
        duck_flags = [bool(x) for x in w[1:]]
        if spark_flags != duck_flags or g["doc_id"] != w[0]:
            mism.append((g["doc_id"], spark_flags, duck_flags))
        assert bool(g["gopher_keep"]) == all(duck_flags), g["doc_id"]
    assert not mism, mism[:5]


def test_duckdb_replay_parity(spark):
    got = (
        gopher_quality_flags(spark.read.parquet(f"{SF_ORACLE}/documents.parquet"))
        .select("doc_id", *FLAGS)
        .orderBy("doc_id")
        .collect()
    )
    _assert_parity(got, _duck_flags(f"'{SF_ORACLE}/documents.parquet'"))


def test_duckdb_replay_parity_whitespace_lines(spark):
    """The two-line-universe split, exercised: whitespace-only lines
    count for the DUP gates (they can be duplicated boilerplate) but
    not for the SHAPE gates. The corpus here is built to contain them,
    so the parity is proven where the real table happens not to."""
    docs = [
        (1, "alpha beta\n  \n  \ngamma delta\n- bullet"),
        (2, "the same line\nthe same line\n  \n  \n  \nunique tail here"),
        (3, "no blank lines at all\njust text\n- one bullet\nend..."),
        (4, "word " * 60 + "\n\t\n\t\n\t\nthe be to of"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = (
        gopher_quality_flags(df).select("doc_id", *FLAGS).orderBy("doc_id").collect()
    )
    duckdb.sql("DROP TABLE IF EXISTS __gopher_ws")
    duckdb.sql(
        "CREATE TABLE __gopher_ws AS SELECT * FROM (VALUES "
        + ", ".join(f"({d}, '{t}')".replace("\n", "' || chr(10) || '") for d, t in [
            (d, t.replace("'", "''").replace("\t", "' || chr(9) || '")) for d, t in docs
        ])
        + ") t(doc_id, text)"
    )
    try:
        _assert_parity(got, _duck_flags("__gopher_ws"))
    finally:
        duckdb.sql("DROP TABLE __gopher_ws")
    # and the documented semantics directly: doc 2's duplicated
    # whitespace-only lines push its dup-line fraction past 0.3
    r2 = {r["doc_id"]: r for r in got}[2]
    assert not r2["gopher_ok_dup_lines"]


def test_alpha_words_unicode_parity(spark):
    """The alpha-word gate counts any Unicode letter (\\p{L}), not just
    ASCII [a-z] (r13 ADVICE fix): accented/non-Latin corpora pass the
    gate, digit-only corpora still fail — pinned cross-engine."""
    docs = [
        (1, "le café était très bon et le thé aussi " * 8),
        (2, " ".join(str(i * 7) for i in range(60))),
        (3, "die straße zur übung war schön ruhig heute " * 8),
        (4, "日本語 の 文書 です これ は 테스트 문서 " * 8),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = (
        gopher_quality_flags(df).select("doc_id", *FLAGS).orderBy("doc_id").collect()
    )
    duckdb.sql("DROP TABLE IF EXISTS __gopher_uni")
    duckdb.sql(
        "CREATE TABLE __gopher_uni AS SELECT * FROM (VALUES "
        + ", ".join(f"({d}, '{t}')" for d, t in docs)
        + ") t(doc_id, text)"
    )
    try:
        _assert_parity(got, _duck_flags("__gopher_uni"))
    finally:
        duckdb.sql("DROP TABLE __gopher_uni")
    flags = {r["doc_id"]: r["gopher_ok_alpha_words"] for r in got}
    assert flags[1] and flags[3] and flags[4], "unicode letters are alphabetic"
    assert not flags[2], "digit-only words are not"


def test_each_rule_hand_built(spark):
    good = (
        "the quick brown fox jumps over the lazy dog and then runs home "
        "to have a meal with friends that come over every day because "
        "they like to be of help and the food here is always good enough "
        "for everyone to enjoy with some time left over for games"
    )
    docs = [
        (0, good),
        (1, "too short"),  # word count
        (2, " ".join(["a"] * 60)),  # mean word len < 3 (and top bigram)
        (3, good + " " + "#tag " * 20),  # hash-symbol ratio
        (4, "\n".join(["- bullet point here"] * 10)),  # bullet lines
        (5, good.replace(" and ", " and...\n") ),  # ellipsis line ends
        (6, good + " " + "1234 5678 " * 30),  # alpha-word fraction
        (7, " ".join(f"w{i} x{i} y{i}" for i in range(30))),  # no stopwords
        (8, "\n".join(["the same line of useful text here"] * 40)),  # dup lines
        (9, good + " even more. " + "see more... " * 12),  # ellipsis-symbol ratio
    ]
    out = {
        r["doc_id"]: r
        for r in gopher_quality_flags(
            spark.createDataFrame(docs, "doc_id long, text string")
        ).collect()
    }
    assert out[0]["gopher_keep"]
    assert not out[1]["gopher_ok_word_count"]
    assert not out[2]["gopher_ok_mean_word_len"]
    assert not out[3]["gopher_ok_hash_ratio"]
    assert out[3]["gopher_ok_ellipsis_ratio"]  # per-symbol, not summed
    assert not out[4]["gopher_ok_bullet_lines"]
    assert not out[5]["gopher_ok_ellipsis_lines"]
    assert not out[6]["gopher_ok_alpha_words"]
    assert not out[7]["gopher_ok_stopwords"]
    assert not out[8]["gopher_ok_dup_lines"]
    assert not out[8]["gopher_ok_dup_line_chars"]
    assert not out[9]["gopher_ok_ellipsis_ratio"]
    assert out[9]["gopher_ok_hash_ratio"]
    assert all(not out[i]["gopher_keep"] for i in range(1, 10))


def test_boundary_keeps_at_exact_threshold(spark):
    """Removal needs MORE than the threshold: exactly 90% bulleted /
    exactly 30% ellipsis-ended lines are kept (paper wording)."""
    bullet_doc = "\n".join(["- b point"] * 9 + ["plain line"])  # 9/10
    ell_doc = "\n".join(["ends here..."] * 3 + ["plain line"] * 7)  # 3/10
    df = spark.createDataFrame(
        [(1, bullet_doc), (2, ell_doc)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in gopher_quality_flags(df).collect()}
    assert out[1]["gopher_ok_bullet_lines"]
    assert out[2]["gopher_ok_ellipsis_lines"]


def test_empty_and_null_never_null_keep(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "   \n  ")], "doc_id long, text string"
    )
    rows = gopher_quality_flags(df).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["gopher_keep"] is False  # never NULL, never True


def test_plan_row_local_no_python(spark):
    """Row-local contract: no shuffle, no row-at-a-time Python.  Since
    r16 the repetition accumulators run as ONE vectorized Arrow pass
    (repetition_signals backend="arrow", integer-exact — see its
    parity test), so the plan carries exactly one ArrowEvalPython and
    still zero Exchange; every other signal stays a codegen
    projection."""
    plan = (
        gopher_quality_flags(spark.read.parquet(f"{SF_ORACLE}/documents.parquet"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("ArrowEvalPython") == 1
