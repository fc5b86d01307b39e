"""Heavy-duplication probe for the size-gated duplicate-set broadcasts
(r12 VERDICT items 2 + 4).

The r12 verdict's one 100x-falsifiable assumption was the hard
``F.broadcast`` on the duplicate-window / boilerplate-line sets: on a
near-duplicate-heavy crawl the distinct-duplicate set scales with the
corpus, so at 100 TB the hint would OOM the driver or force a giant
broadcast.  This probe builds a 30-50%-duplicated corpus at ~10x the
sf0.1 document count from the sf0.1 table (TESTDATA parquet is the only
sanctioned input), runs remove_duplicate_spans + the boilerplate pass
through the PRODUCTION default (the auto gate), and reports:

* the measured duplicate-set size vs the gate limit and which join
  strategy engaged (broadcast vs AQE fallback) on each side of a
  limit chosen to force both;
* wall time for each path and the identical-output check between them;
* the data-dependent terms: dup-set rows scale with duplication share,
  per-doc fold state with dup windows per doc.

Usage: python scripts/dup_gate_probe.py [sf_dir] [replicas]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from arcane_stream_parquet_spark import build_session
from arcane_stream_parquet_spark.operators.text import (
    remove_boilerplate_lines,
    remove_duplicate_spans,
)


def heavy_dup_corpus(spark, sf_dir: str, replicas: int):
    """~10x documents where ~40% of text content is cross-document
    duplicated: each source doc fans out to `replicas` rows; a 40%-ish
    prefix of every replica keeps the ORIGINAL text (shared across all
    replicas of that doc = duplicated spans), the rest is salted
    per-replica (unique)."""
    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
    )
    r = spark.range(replicas).select(F.col("id").alias("rep"))
    tk = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n = F.size(tk)
    shared = F.slice(tk, 1, (n * 2) / F.lit(5))  # ~40% duplicated
    uniq = F.transform(
        F.slice(tk, (n * 2) / F.lit(5) + 1, n),
        lambda t: F.concat(t, F.lit("_r"), F.col("rep")),
    )
    return docs.crossJoin(F.broadcast(r)).select(
        (F.col("doc_id") * replicas + F.col("rep")).alias("doc_id"),
        F.array_join(F.concat(shared, uniq), " ").alias("text"),
    )


def run(corpus, limit, label):
    t0 = time.monotonic()
    out = remove_duplicate_spans(
        corpus, window_tokens=10, min_docs=2, dup_broadcast_limit=limit
    )
    qe = out._jdf.queryExecution()
    # the gate controls the HINT (logical plan); the physical strategy
    # is then the optimizer's to pick from real sizes — report both
    logical = qe.optimizedPlan().toString()
    plan = qe.executedPlan().toString()
    agg = out.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_removed").alias("removed"),
        F.sum("n_tokens").alias("tokens"),
        F.xxhash64(
            F.concat_ws(
                "|", F.sort_array(F.collect_list(F.hash("doc_id", "clean_text")))
            )
        ).alias("content_hash"),
    ).collect()[0]
    sec = time.monotonic() - t0
    return {
        "label": label,
        "limit": limit,
        "broadcast_hint_engaged": "strategy=broadcast" in logical,
        "physical_broadcasts_dup_join": "BroadcastHashJoin" in plan
        and "_dup_w" in plan,
        "wall_sec": round(sec, 2),
        "docs": agg["docs"],
        "tokens_removed": int(agg["removed"]),
        "tokens_total": int(agg["tokens"]),
        "content_hash": int(agg["content_hash"]),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = build_session(app_name="asp-dup-gate-probe")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = heavy_dup_corpus(spark, sf_dir, replicas).localCheckpoint()

    # measure the actual duplicate-set size the gate would count
    from arcane_stream_parquet_spark.operators.text import tokens_column

    toks = corpus.select("doc_id", tokens_column("text").alias("_tk"))
    nwin = F.size("_tk") - F.lit(9)
    wins = toks.select(
        "doc_id",
        F.explode(
            F.when(nwin > 0, F.sequence(F.lit(0), nwin - F.lit(1))).otherwise(
                F.array().cast("array<int>")
            )
        ).alias("pos"),
        F.col("_tk"),
    ).select(
        "doc_id",
        F.substring(
            F.sha2(F.array_join(F.slice("_tk", F.col("pos") + 1, 10), " "), 256),
            1,
            16,
        ).alias("w"),
    )
    n_dup = (
        wins.groupBy("w")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .count()
    )

    # limit between 0 and n_dup forces the fallback; the production
    # default (1M) exercises whichever side n_dup lands on
    force_fallback = max(0, n_dup // 2)
    res_bc = run(corpus, n_dup + 1, "broadcast (limit > n_dup)")
    res_fb = run(corpus, force_fallback, "fallback (limit < n_dup)")
    assert res_bc["broadcast_hint_engaged"]
    assert not res_fb["broadcast_hint_engaged"]
    assert res_bc["content_hash"] == res_fb["content_hash"]
    assert res_bc["tokens_removed"] == res_fb["tokens_removed"]

    # boilerplate analog on a lined view of the same corpus
    lined = corpus.select(
        "doc_id", F.regexp_replace("text", " ", "\n").alias("text")
    )
    t0 = time.monotonic()
    bp = remove_boilerplate_lines(
        lined, min_docs=replicas, boiler_broadcast_limit=0
    )
    bp_removed = bp.agg(F.sum("n_removed")).collect()[0][0]
    bp_sec = time.monotonic() - t0

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "replicas": replicas,
                "n_docs": corpus.count(),
                "n_dup_windows": n_dup,
                "span_dedup": [res_bc, res_fb],
                "boilerplate_fallback": {
                    "wall_sec": round(bp_sec, 2),
                    "lines_removed": int(bp_removed),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
