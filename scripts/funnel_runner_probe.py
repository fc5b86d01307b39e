"""run_funnel probe: the durability cost and the resume payoff of
materialized stage boundaries, at the pipeline_probe corpus shape
(sf0.1 docs x replicas, ~40% cross-document duplication).

Three measurements over the SAME stage list as pipeline_probe's
doc-level funnel (ingest gate → boilerplate → span dedup → exact →
near-dup canonicals → perplexity buckets → PII → chunking):

1. single-shot run_funnel wall (per-stage + total) — what durability
   costs vs the in-memory localCheckpoint probe (SCALE.md r13);
2. kill at the perplexity stage (driver-side bomb), then resume —
   the resume must pay ONLY the remaining stages;
3. re-run of the completed funnel — the no-op resume scan cost.

Usage: python scripts/funnel_runner_probe.py [sf_dir] [replicas] [workdir]
(default /root/testdata/sf0.1 10)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from arcane_stream_parquet_spark import build_session
from arcane_stream_parquet_spark.operators.chunking import chunk_documents
from arcane_stream_parquet_spark.operators.clustering import dedup_assignment
from arcane_stream_parquet_spark.operators.fingerprint import fingerprint_column
from arcane_stream_parquet_spark.operators.minhash import near_duplicates
from arcane_stream_parquet_spark.operators.pipeline import run_funnel
from arcane_stream_parquet_spark.operators.redaction import redact_pii
from arcane_stream_parquet_spark.operators.sampling import rank_buckets
from arcane_stream_parquet_spark.operators.text import (
    language_id,
    ngram_perplexity,
    quality_score,
    remove_boilerplate_lines,
    remove_duplicate_spans,
)
from scripts.pipeline_probe import heavy_dup_corpus


def build_stages(replicas: int):
    """Doc-level funnel as self-contained (name, fn) stages: each fn
    consumes the full previous boundary (doc_id, text, lang, source)
    and emits the same shape; chunking re-keys to a composite string
    id (run_funnel's contract: key_col unique per stage output)."""

    def lang_quality_gate(df):
        return (
            quality_score(language_id(df, "text"))
            .filter(F.col("quality_keep"))
            .select("doc_id", "text", "lang", "source")
        )

    def boilerplate(df):
        out = remove_boilerplate_lines(df, min_docs=replicas * 40)
        return (
            out.join(df.select("doc_id", "lang", "source"), "doc_id")
            .select(
                "doc_id", F.col("clean_text").alias("text"), "lang", "source"
            )
            .filter(F.length("text") > 0)
        )

    def span_dedup(df):
        out = remove_duplicate_spans(df, window_tokens=10, min_docs=replicas)
        return (
            out.join(df.select("doc_id", "lang", "source"), "doc_id")
            .select(
                "doc_id", F.col("clean_text").alias("text"), "lang", "source"
            )
            .filter(F.length("text") > 0)
        )

    def exact_dedup(df):
        from pyspark.sql import Window

        return (
            df.withColumn("fp", fingerprint_column("text"))
            .withColumn(
                "rn",
                F.row_number().over(Window.partitionBy("fp").orderBy("doc_id")),
            )
            .filter("rn = 1")
            .select("doc_id", "text", "lang", "source")
        )

    def near_dup_canonicals(df):
        pairs = near_duplicates(df, min_jaccard=0.5)
        verdict = dedup_assignment(df.select("doc_id"), pairs)
        return df.join(
            verdict.filter("is_canonical").select("doc_id"), "doc_id"
        )

    def perplexity_buckets(df):
        ref = df.filter(F.col("doc_id") % 31 == 0)
        scored = df.join(
            ngram_perplexity(df, ref).select("doc_id", "perplexity"), "doc_id"
        )
        return (
            rank_buckets(
                scored,
                score_col="perplexity",
                id_col="doc_id",
                group_cols=("lang",),
            )
            .filter(F.col("bucket") != "tail")
            .select("doc_id", "text", "lang", "source")
        )

    def pii(df):
        return redact_pii(df).select(
            "doc_id", F.col("redacted_text").alias("text"), "lang", "source"
        )

    def chunking(df):
        return (
            chunk_documents(df, chunk_tokens=64, overlap_tokens=16)
            .join(df.select("doc_id", "lang", "source"), "doc_id")
            .select(
                F.concat_ws("#", "doc_id", "chunk_index").alias("doc_id"),
                F.col("chunk_text").alias("text"),
                "lang",
                "source",
            )
        )

    return [
        ("lang_quality_gate", lang_quality_gate),
        ("boilerplate", boilerplate),
        ("span_dedup", span_dedup),
        ("exact_dedup", exact_dedup),
        ("near_dup_canonicals", near_dup_canonicals),
        ("perplexity_buckets", perplexity_buckets),
        ("pii", pii),
        ("chunking", chunking),
    ]


def timed_run(spark, source, stages, prefix, label):
    t0 = time.monotonic()
    out = run_funnel(
        spark, source, stages, prefix, key_col="doc_id", num_buckets=32
    )
    rows = out.count()
    wall = round(time.monotonic() - t0, 2)
    rec = {"run": label, "wall_s": wall, "out_rows": rows}
    print(json.dumps(rec), flush=True)
    return rec


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    work = (
        sys.argv[3]
        if len(sys.argv) > 3
        else tempfile.mkdtemp(prefix="asp_funnel_runner_probe_")
    )
    spark = build_session(
        app_name="funnel-runner-probe", cpus=32, shuffle_partitions=32
    )
    corpus = heavy_dup_corpus(spark, sf_dir, replicas).localCheckpoint(eager=True)
    stages = build_stages(replicas)

    # 1. single-shot, durable boundaries
    single = timed_run(spark, corpus, stages, os.path.join(work, "single"), "single_shot")

    # 2. kill at perplexity_buckets (stage idx 5), then resume
    bombed = list(stages)

    def bomb(df):
        raise RuntimeError("probe kill")

    bombed[5] = ("perplexity_buckets", bomb)
    t0 = time.monotonic()
    try:
        run_funnel(
            spark, corpus, bombed, os.path.join(work, "killed"),
            key_col="doc_id", num_buckets=32,
        )
        raise AssertionError("bomb did not fire")
    except RuntimeError:
        pass
    killed_wall = round(time.monotonic() - t0, 2)
    print(json.dumps({"run": "killed_at_stage_5", "wall_s": killed_wall}), flush=True)
    resume = timed_run(
        spark, corpus, stages, os.path.join(work, "killed"), "resume_from_stage_5"
    )
    assert resume["out_rows"] == single["out_rows"], (resume, single)

    # 3. completed funnel re-run: the no-op resume scan
    noop = timed_run(spark, corpus, stages, os.path.join(work, "single"), "noop_rerun")

    print(
        json.dumps(
            {
                "replicas": replicas,
                "sf_dir": sf_dir,
                "single_shot_s": single["wall_s"],
                "killed_partial_s": killed_wall,
                "resume_s": resume["wall_s"],
                "resume_saved_s": round(single["wall_s"] - resume["wall_s"], 2),
                "noop_rerun_s": noop["wall_s"],
                "workdir": work,
            }
        ),
        flush=True,
    )
    if len(sys.argv) <= 3:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
