"""Product quantization (Jégou et al. 2011) — training, encoding, ADC
search. Oracle-gate-grade pins without a registry slot (the 50-row
cap): an independent pure-python reference reproducing training +
encode + ADC bit-for-bit (left-to-right float folds, median updates,
lower-code ties), a DuckDB replay of encode + ADC given the trained
codebooks, a recall floor against the exact scan on the real
embeddings, determinism across partitionings, and the plan gate
(corpus never shuffles before top-k; the one NLJ is the broadcast
query-LUT attach)."""

from __future__ import annotations

import hashlib
import statistics

import duckdb
import pytest
from pyspark.sql import Row

from arcane_stream_parquet_spark.operators.pq import (
    pq_encode,
    pq_topk,
    train_pq_codebooks,
)
from tests.conftest import SF_ORACLE

M, CODES = 4, 4
DIM = 8


def _h(s: str) -> float:
    return int(hashlib.sha256(s.encode()).hexdigest()[:8], 16) / 2**32 * 2.0 - 1.0


@pytest.fixture(scope="module")
def micro(spark):
    vecs = {
        i: [round(_h(f"pq{i}|{d}"), 4) for d in range(DIM)] for i in range(20)
    }
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in sorted(vecs.items())],
        schema="vec_id bigint, embedding array<double>",
    )
    return df, vecs


def _l2sq(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + (x - y) * (x - y)
    return acc


def _ref_seeds(vecs: dict[int, list[float]], m: int, codes: int, d: int):
    """Independent reference of the farthest-point (maxmin) seeding:
    start from the lowest-id row, add the point with the LARGEST
    min-distance to the chosen seeds, ties -> lower id."""
    books = []
    ids = sorted(vecs)
    for s in range(m):
        pts = {i: vecs[i][s * d : (s + 1) * d] for i in ids}
        chosen = [list(pts[ids[0]])]
        mind = {i: _l2sq(pts[i], chosen[0]) for i in ids}
        while len(chosen) < codes:
            nxt = max(ids, key=lambda i: (mind[i], -i))
            chosen.append(list(pts[nxt]))
            for i in ids:
                dn = _l2sq(pts[i], pts[nxt])
                if dn < mind[i]:
                    mind[i] = dn
        books.append(chosen)
    return books


def _ref_train(vecs: dict[int, list[float]], m: int, codes: int, iters: int):
    """Independent reference of train_pq_codebooks: same maxmin
    seeding, same argmin ties, same median update (statistics.median
    interpolates even counts like Spark's F.median), empty cells keep
    the previous vector (and ONLY empty cells — an all-zero L2 median
    is a legitimate code, r14 ADVICE)."""
    d = DIM // m
    books = _ref_seeds(vecs, m, codes, d)
    for _ in range(iters):
        assign: dict[tuple[int, int], int] = {}
        for vid, v in vecs.items():
            for s in range(m):
                sv = v[s * d : (s + 1) * d]
                best = min(
                    range(codes), key=lambda c: (_l2sq(sv, books[s][c]), c)
                )
                assign[(vid, s)] = best
        new_books = []
        for s in range(m):
            book = []
            for c in range(codes):
                members = [
                    vecs[vid][s * d : (s + 1) * d]
                    for vid in vecs
                    if assign[(vid, s)] == c
                ]
                if not members:
                    book.append(books[s][c])
                    continue
                med = [
                    statistics.median([mv[p] for mv in members])
                    for p in range(d)
                ]
                book.append(med)
            new_books.append(book)
        books = new_books
    return books


def _ref_encode(vecs, books):
    m, codes, d = len(books), len(books[0]), DIM // len(books)
    return {
        vid: [
            min(range(codes), key=lambda c: (_l2sq(v[s * d : (s + 1) * d], books[s][c]), c))
            for s in range(m)
        ]
        for vid, v in vecs.items()
    }


def _ref_adc(q, code_list, books):
    d = DIM // len(books)
    acc = 0.0
    for s, c in enumerate(code_list):
        acc = acc + _l2sq(q[s * d : (s + 1) * d], books[s][c])
    return acc


def test_training_matches_reference(spark, micro):
    df, vecs = micro
    got = train_pq_codebooks(df, m=M, codes=CODES, iters=2)
    want = _ref_train(vecs, M, CODES, 2)
    assert got == want  # bit-exact, including the median updates


def test_encode_and_adc_match_reference(spark, micro):
    df, vecs = micro
    books = train_pq_codebooks(df, m=M, codes=CODES, iters=2)
    codes = {
        r["vec_id"]: list(r["pq_codes"])
        for r in pq_encode(df, books).collect()
    }
    assert codes == _ref_encode(vecs, books)
    queries = df.filter("vec_id < 2")
    out = pq_topk(pq_encode(df, books), queries, books, k=5)
    got = {
        (r["query_id"], r["neighbor_id"]): r["adc_l2sq"] for r in out.collect()
    }
    # reference: full ADC ranking per query, same tie rule
    for qid in (0, 1):
        dists = sorted(
            (_ref_adc(vecs[qid], codes[n], books), n)
            for n in vecs
            if n != qid
        )[:5]
        assert {(qid, n) for _, n in dists} == {
            k for k in got if k[0] == qid
        }
        for dist, n in dists:
            assert got[(qid, n)] == dist  # bit-exact ADC


def test_duckdb_replay_encode_and_adc(spark, micro):
    """Encode + ADC replayed in DuckDB from the SAME trained codebooks
    (training itself is pinned by the python reference above): per-
    subspace L2 argmin with lower-code ties, then the LUT fold."""
    df, vecs = micro
    books = train_pq_codebooks(df, m=M, codes=CODES, iters=2)
    d = DIM // M
    got_codes = sorted(
        (int(r["vec_id"]), list(r["pq_codes"]))
        for r in pq_encode(df, books).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE v(vec_id BIGINT, embedding DOUBLE[]);"
    )
    for vid, vec in sorted(vecs.items()):
        con.execute("INSERT INTO v VALUES (?, ?)", [vid, vec])
    cb_rows = ", ".join(
        f"({s}, {c}, {list(map(float, cv))}::DOUBLE[])"
        for s, book in enumerate(books)
        for c, cv in enumerate(book)
    )
    sql = f"""
        WITH cb(sub, code, cv) AS (VALUES {cb_rows}),
        subs AS (
            SELECT vec_id, s.sub,
                   embedding[s.sub * {d} + 1 : (s.sub + 1) * {d}] AS sv
            FROM v, (SELECT unnest(range(0, {M})) AS sub) s
        ),
        scored AS (
            SELECT vec_id, subs.sub, code,
                   list_sum(list_transform(
                       list_zip(sv, cv),
                       p -> (p[1] - p[2]) * (p[1] - p[2]))) AS l2
            FROM subs JOIN cb ON subs.sub = cb.sub
        ),
        best AS (
            SELECT vec_id, sub, code,
                   row_number() OVER (PARTITION BY vec_id, sub
                                      ORDER BY l2 ASC, code ASC) AS rn
            FROM scored
        )
        SELECT vec_id, list(code ORDER BY sub) AS codes
        FROM best WHERE rn = 1 GROUP BY vec_id ORDER BY vec_id
    """
    want_codes = [(int(a), list(b)) for a, b in con.execute(sql).fetchall()]
    con.close()
    assert got_codes == want_codes


def _exact_l2_topk(emb, queries, k=10):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from arcane_stream_parquet_spark.operators.pq import l2sq_expr
    from arcane_stream_parquet_spark.operators.similarity import as_double_array

    q = F.broadcast(
        queries.select(
            F.col("vec_id").alias("query_id"),
            as_double_array("embedding").alias("__qv"),
        )
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        as_double_array("embedding").alias("__cv"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__d").asc(), F.col("neighbor_id").asc()
    )
    return (
        c.crossJoin(q)
        .filter("neighbor_id != query_id")
        .select(
            "query_id",
            "neighbor_id",
            l2sq_expr(F.col("__qv"), F.col("__cv")).alias("__d"),
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(f"__rn <= {k}")
    )


def _recall(approx_rows, exact_rows, k=10):
    got = {
        qid: {r["neighbor_id"] for r in rows}
        for qid, rows in _group(approx_rows).items()
    }
    truth = {
        qid: {r["neighbor_id"] for r in rows}
        for qid, rows in _group(exact_rows).items()
    }
    return sum(len(got[q] & truth[q]) / k for q in truth) / len(truth)


def test_recall_ladder_on_unstructured_embeddings(spark):
    """PQ's adversarial case is UNSTRUCTURED data (no cluster structure
    → quantization error dominates; the friendly clustered regime is
    the next test). Measured recall@10 vs the exact squared-L2 scan on
    the real embeddings at m=8 with the r15 maxmin seeding:
    0.22 / 0.30 / 0.40 for 16 / 32 / 64 codes — pinned as floors with
    margin, plus monotonicity in the code count (everything is
    deterministic: no RNG anywhere)."""
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    queries = emb.filter("vec_id < 5")
    exact = _exact_l2_topk(emb, queries).collect()
    ladder = {}
    for codes in (16, 32, 64):
        books = train_pq_codebooks(emb, m=8, codes=codes, iters=2)
        approx = pq_topk(pq_encode(emb, books), queries, books, k=10)
        ladder[codes] = _recall(approx.collect(), exact)
    assert ladder[16] >= 0.15 and ladder[32] >= 0.2 and ladder[64] >= 0.35, ladder
    assert ladder[16] <= ladder[32] <= ladder[64], ladder


def test_high_recall_on_clustered_corpus(spark):
    """The regime PQ assumes (real embedding corpora are clustered):
    well-separated clusters in R^8 — the ADC scan must rank the
    query's own cluster first, recall@5 = 1.0."""
    rows = []
    for cl in range(4):
        for i in range(6):
            v = [0.01 * i * _h(f"c{cl}|{i}|{d}") for d in range(DIM)]
            v[cl * 2] += 10.0
            v[cl * 2 + 1] += 10.0
            rows.append(Row(vec_id=cl * 100 + i, embedding=[float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    books = train_pq_codebooks(df, m=M, codes=8, iters=3)
    queries = df.filter("vec_id % 100 = 0")
    approx = pq_topk(pq_encode(df, books), queries, books, k=5).collect()
    exact = _exact_l2_topk(df, queries, k=5).collect()
    assert _recall(approx, exact, k=5) == 1.0


def _group(rows):
    out: dict = {}
    for r in rows:
        out.setdefault(r["query_id"], []).append(r)
    return out


def _hash_cluster_fixture(n: int, n_cl: int, dim: int):
    """Clusters assigned by HASH of id — so the lowest ids do NOT span
    the clusters (the scripts/pq_probe.py adversarial variant; its
    round-robin default was the documented WORKAROUND for the pre-r15
    lowest-id seeding)."""
    cl_of = {
        i: int(hashlib.sha256(f"cl{i}".encode()).hexdigest()[:8], 16) % n_cl
        for i in range(n)
    }
    vecs = {}
    for i in range(n):
        v = [round(0.05 * _h(f"x{i}|{d}"), 4) for d in range(dim)]
        v[cl_of[i] * 2] += 10.0
        v[cl_of[i] * 2 + 1] += 10.0
        vecs[i] = [float(x) for x in v]
    return cl_of, vecs


def test_maxmin_seeding_covers_hash_assigned_modes():
    """r14 verdict item 4's regression, pinned at the seeding layer:
    with hash-assigned clusters the lowest-``codes`` ids cover only
    SOME clusters, and the pre-r15 lowest-id init then left whole
    modes without a seed — hard k-medians can't split an occupied
    code, so those modes' members collapsed into one giant ADC tie
    (recall@10 = 0.0 at probe scale). Trimmed maxmin must place a
    seed inside EVERY cluster's spike region in the subspace that
    carries it; the lowest-id policy provably fails the same check."""
    from arcane_stream_parquet_spark.operators.pq import _maxmin_seeds

    n, n_cl, dim, m = 240, 8, 16, 4
    d = dim // m
    cl_of, vecs = _hash_cluster_fixture(n, n_cl, dim)
    assert len(set(cl_of.values())) == n_cl  # every cluster populated
    assert len({cl_of[i] for i in range(n_cl)}) < n_cl  # lowest ids don't span
    sample = [(i, vecs[i]) for i in sorted(vecs)]

    def covered(books) -> set[int]:
        """clusters whose spike (dims 2cl, 2cl+1 → subspace cl//2) has
        a seed within the noise radius in that subspace."""
        out = set()
        for cl in range(n_cl):
            sub, off = (2 * cl) // d, (2 * cl) % d
            for seed in books[sub]:
                if seed[off] > 5.0 and seed[off + 1] > 5.0:
                    out.add(cl)
        return out

    new_books = _maxmin_seeds(sample, codes=n_cl, m=m, d=d)
    old_books = [
        [vecs[i][s * d : (s + 1) * d] for i in range(n_cl)] for s in range(m)
    ]
    assert covered(new_books) == set(range(n_cl))
    assert covered(old_books) != set(range(n_cl))  # the bug being fixed


def test_seeding_recall_floor_on_hash_assigned_modes(spark):
    """End-to-end floor on the same hash-assigned corpus: measured
    per-cluster recall@10 min 0.3 / mean 0.51 with maxmin seeding —
    at this small geometry (8 clusters sharing 4 subspaces) the
    lowest-id init happens to score the same MEAN, but only maxmin
    carries the per-mode guarantee the unit test above pins; at probe
    scale (codes ≈ 64 clusters) the lowest-id init zeroes out
    unseeded clusters entirely. Deterministic."""
    n, n_cl, dim = 240, 8, 16
    cl_of, vecs = _hash_cluster_fixture(n, n_cl, dim)
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in sorted(vecs.items())],
        "vec_id bigint, embedding array<double>",
    )
    books = train_pq_codebooks(df, m=4, codes=8, iters=2)
    first_of_cluster = {}
    for i in range(n):
        first_of_cluster.setdefault(cl_of[i], i)
    from pyspark.sql import functions as F

    queries = df.filter(F.col("vec_id").isin(list(first_of_cluster.values())))
    exact = _group(_exact_l2_topk(df, queries, k=10).collect())
    approx = _group(pq_topk(pq_encode(df, books), queries, books, k=10).collect())
    per_cluster = {}
    for qid, truth in exact.items():
        t = {r["neighbor_id"] for r in truth}
        g = {r["neighbor_id"] for r in approx.get(qid, [])}
        per_cluster[cl_of[qid]] = len(g & t) / 10
    assert min(per_cluster.values()) >= 0.2, per_cluster
    assert sum(per_cluster.values()) / n_cl >= 0.45, per_cluster


def test_deterministic_across_partitionings(spark, micro):
    df, _ = micro
    books = train_pq_codebooks(df, m=M, codes=CODES, iters=1)
    a = sorted(map(tuple, pq_encode(df, books).collect()))
    b = sorted(map(tuple, pq_encode(df.repartition(7), books).collect()))
    assert [(i, list(c)) for i, c in a] == [(i, list(c)) for i, c in b]
    books2 = train_pq_codebooks(df.repartition(5), m=M, codes=CODES, iters=1)
    assert books2 == books  # median updates are order-independent


def test_geometry_validation(spark, micro):
    df, _ = micro
    with pytest.raises(ValueError, match="not divisible"):
        train_pq_codebooks(df, m=3, codes=4)


def test_plan_no_corpus_shuffle_before_topk(spark, micro):
    """The ADC scan reads only the code column and meets the query LUT
    through ONE broadcast NLJ (the cosine_topk pattern); no cartesian,
    no corpus-side Exchange before the per-query top-k window."""
    df, _ = micro
    books = train_pq_codebooks(df, m=M, codes=CODES, iters=1)
    codes = pq_encode(df, books).localCheckpoint(eager=True)  # stored table
    plan = (
        pq_topk(codes, df.filter("vec_id < 2"), books, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1
    # the only exchange below the window is the top-k repartition on
    # query_id plus the |Q|-scale LUT assembly — the corpus side itself
    # joins via the broadcast without shuffling
    assert "SortMergeJoin" not in plan


def test_rerank_with_full_shortlist_equals_exact_scan(spark, micro):
    """shortlist >= |corpus|-1 makes pq_topk_rerank EXACTLY the exact
    scan's top-k — same ids, same order, bit-identical distances."""
    from arcane_stream_parquet_spark.operators.pq import pq_topk_rerank

    df, _ = micro
    books = train_pq_codebooks(df, m=M, codes=CODES, iters=1)
    codes = pq_encode(df, books)
    queries = df.filter("vec_id < 3")
    got = sorted(
        map(tuple, pq_topk_rerank(
            df, codes, queries, books, k=5, shortlist=19
        ).collect())
    )
    want = sorted(
        (r["query_id"], r["neighbor_id"], r["__d"])
        for r in _exact_l2_topk(df, queries, k=5).collect()
    )
    assert got == want


def test_rerank_lifts_unstructured_recall(spark):
    """The quality dial measured: on the unstructured embeddings the
    64-code ADC pass alone gives recall@10 = 0.40 (r15 maxmin
    seeding); reranking with exact distances lifts it to the
    shortlist's containment rate — measured 0.80 at shortlist=50, 0.92
    at shortlist=100 — at |Q|*shortlist exact distances instead of
    |Q|*n. (Pre-r15 lowest-id seeding measured 0.92/0.98 here: that
    init IS a uniform sample on unstructured data, the ideal regime
    for it — the trade buys the mode-coverage guarantee that seeding
    lacked, and the shortlist dial recovers the gap.)"""
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    from arcane_stream_parquet_spark.operators.pq import pq_topk_rerank

    queries = emb.filter("vec_id < 5")
    books = train_pq_codebooks(emb, m=8, codes=64, iters=2)
    codes = pq_encode(emb, books)
    exact = _exact_l2_topk(emb, queries).collect()
    adc = pq_topk(codes, queries, books, k=10).collect()
    rr = pq_topk_rerank(emb, codes, queries, books, k=10, shortlist=50).collect()
    rr100 = pq_topk_rerank(
        emb, codes, queries, books, k=10, shortlist=100
    ).collect()
    r_adc, r_rr = _recall(adc, exact), _recall(rr, exact)
    assert r_rr >= r_adc, (r_adc, r_rr)
    assert r_rr >= 0.75, (r_adc, r_rr)  # measured 0.80, deterministic
    assert _recall(rr100, exact) >= 0.85  # measured 0.92


# ---------------------------------------------------------------------------
# IVF-PQ (residual encoding — the Faiss IVFPQ shape)


def _ref_ivfpq(vecs, cents, books, qids, nprobe, k):
    """Independent reference: cosine argmax cells (the ivf_assign
    rule), residual encode with L2/lower-code ties, per-(query, cell)
    residual LUT ADC, ascending (dist, id)."""

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def cos(a, b):
        return dot(a, b) / ((dot(a, a) ** 0.5) * (dot(b, b) ** 0.5))

    d = DIM // len(books)
    cell = {
        vid: max(cents, key=lambda c: (cos(v, c[1]), -c[0]))[0]
        for vid, v in vecs.items()
    }
    cvec = dict(cents)
    res = {
        vid: [x - y for x, y in zip(v, cvec[cell[vid]])]
        for vid, v in vecs.items()
    }
    codes = _ref_encode(res, books)
    out = {}
    for qid in qids:
        probed = sorted(
            cents, key=lambda c: (-cos(vecs[qid], c[1]), c[0])
        )[:nprobe]
        cand = []
        for cid, cv in probed:
            qr = [x - y for x, y in zip(vecs[qid], cv)]
            for vid in vecs:
                if vid != qid and cell[vid] == cid:
                    cand.append((_ref_adc(qr, codes[vid], books), vid))
        out[qid] = sorted(cand)[:k]
    return out


def test_ivfpq_matches_reference(spark, micro):
    from arcane_stream_parquet_spark.operators.pq import ivfpq_build, ivfpq_topk
    from arcane_stream_parquet_spark.operators.similarity import (
        train_ivf_centroids,
    )

    df, vecs = micro
    cents = train_ivf_centroids(df, k=3, iters=1)
    index, books = ivfpq_build(df, cents, m=M, codes=CODES, iters=2)
    queries = df.filter("vec_id < 2")
    got = {}
    for r in ivfpq_topk(index, queries, cents, books, k=4, nprobe=2).collect():
        got.setdefault(r["query_id"], []).append(
            (r["adc_l2sq"], r["neighbor_id"])
        )
    want = _ref_ivfpq(vecs, cents, books, (0, 1), nprobe=2, k=4)
    for qid in (0, 1):
        assert sorted(got[qid]) == want[qid], qid  # bit-exact ADC + ids


def test_ivfpq_residuals_beat_flat_pq_on_clustered(spark):
    """Residual encoding's point: on clustered data the residual
    spread is tiny, so the same code budget quantizes finer — IVF-PQ
    recall@5 is exact where flat PQ at the same geometry already is;
    pin both, plus the cell-locality of candidates."""
    from arcane_stream_parquet_spark.operators.pq import ivfpq_build, ivfpq_topk
    from arcane_stream_parquet_spark.operators.similarity import (
        train_ivf_centroids,
    )

    rows = []
    for cl in range(4):
        for i in range(6):
            v = [0.01 * i * _h(f"c{cl}|{i}|{d}") for d in range(DIM)]
            v[cl * 2] += 10.0
            v[cl * 2 + 1] += 10.0
            rows.append(Row(vec_id=cl * 100 + i, embedding=[float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cents = train_ivf_centroids(df, k=4, iters=2)
    index, books = ivfpq_build(df, cents, m=M, codes=8, iters=2)
    queries = df.filter("vec_id % 100 = 0")
    exact = _exact_l2_topk(df, queries, k=5).collect()
    # nprobe=1 leaves boundary members in neighboring cells behind
    # (measured 0.85); probing 2 cells recovers them — the standard
    # recall dial, same story as ivf_topk's nprobe
    one = ivfpq_topk(index, queries, cents, books, k=5, nprobe=1).collect()
    two = ivfpq_topk(index, queries, cents, books, k=5, nprobe=2).collect()
    assert _recall(one, exact, k=5) >= 0.75
    assert _recall(two, exact, k=5) == 1.0


def test_ivfpq_plan_cell_equijoin_no_cartesian(spark, micro):
    """IVF-PQ's structural win over flat PQ: candidates meet through
    an EQUI-join on cell (broadcast hash join against the query-LUT
    side), not a no-condition broadcast — only the probed fraction of
    the corpus is scanned per query. NLJs are only the K-row centroid
    expansions."""
    from arcane_stream_parquet_spark.operators.pq import ivfpq_build, ivfpq_topk
    from arcane_stream_parquet_spark.operators.similarity import (
        train_ivf_centroids,
    )

    df, _ = micro
    cents = train_ivf_centroids(df, k=3, iters=1)
    index, books = ivfpq_build(df, cents, m=M, codes=CODES, iters=1)
    index = index.localCheckpoint(eager=True)  # the stored index table
    plan = (
        ivfpq_topk(index, df.filter("vec_id < 2"), cents, books, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin [cell" in plan
    # the only NLJs are centroid-table expansions on the QUERY side
    # (probe + residual attach), both BuildRight of K-row tables
    assert plan.count("BroadcastNestedLoopJoin") == plan.count(
        "BroadcastNestedLoopJoin BuildRight"
    )


def test_ivfpq_deterministic_across_partitionings(spark, micro):
    from arcane_stream_parquet_spark.operators.pq import ivfpq_build, ivfpq_topk
    from arcane_stream_parquet_spark.operators.similarity import (
        train_ivf_centroids,
    )

    df, _ = micro
    cents = train_ivf_centroids(df, k=3, iters=1)
    i1, b1 = ivfpq_build(df, cents, m=M, codes=CODES, iters=2)
    i2, b2 = ivfpq_build(df.repartition(7), cents, m=M, codes=CODES, iters=2)
    assert b1 == b2
    q = df.filter("vec_id < 2")
    a = sorted(map(tuple, ivfpq_topk(i1, q, cents, b1, k=4).collect()))
    b = sorted(map(tuple, ivfpq_topk(i2, q, cents, b2, k=4).collect()))
    assert a == b


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    assign=st.lists(st.integers(min_value=0, max_value=5), min_size=12,
                    max_size=40),
    n_codes=st.integers(min_value=6, max_value=10),
)
def test_maxmin_seed_coverage_property(assign, n_codes):
    """The k-center guarantee, as a property: for ANY assignment of
    sample points to well-separated modes, maxmin places a seed inside
    EVERY populated mode before any mode gets two — codes >= #modes
    implies full coverage, independent of which ids land where (the
    exact property the lowest-id init lacked)."""
    from arcane_stream_parquet_spark.operators.pq import _maxmin_seeds

    d = 4
    # well-separated mode centers on coordinate axes of R^4 (two modes
    # per axis sign); deterministic tiny per-point jitter
    def point(i: int, mode: int) -> list[float]:
        v = [0.001 * ((i * 31 + j * 7) % 17) for j in range(d)]
        v[mode % d] += 50.0 if mode < d else -50.0
        return v

    sample = [(i, point(i, m)) for i, m in enumerate(assign)]
    books = _maxmin_seeds(sample, codes=n_codes, m=1, d=d)
    populated = set(assign)
    covered = set()
    for seed in books[0]:
        for mode in populated:
            axis, sign = mode % d, (1 if mode < d else -1)
            if sign * seed[axis] > 25.0:
                covered.add(mode)
    assert covered == populated, (sorted(populated - covered), books[0])
