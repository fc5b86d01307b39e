"""run_funnel — materialized stage boundaries with create-only resume
(r13 VERDICT item 3: the production, fault-tolerant form of the
lineage-cut finding; same state shape as the sharded backfill).

The done-condition pins: kill mid-funnel → resume → completed stages
NOT recomputed, final output hash-identical to a single-shot run;
changed funnel definitions refuse to resume; completed funnels re-run
as no-ops.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from arcane_stream_parquet_spark.operators.pipeline import run_funnel


def _docs(spark, n=60):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text body number "), F.col("id")).alias("text"),
    )


def _stages(calls):
    """Three stages that record driver-side invocations in ``calls``."""

    def filt(df):
        calls.append("filter")
        return df.filter(F.col("doc_id") % 3 != 0)

    def enrich(df):
        calls.append("enrich")
        return df.withColumn("n_chars", F.length("text").cast("bigint"))

    def flag(df):
        calls.append("flag")
        return df.withColumn("long_doc", F.col("n_chars") >= 19)

    return [("filter", filt), ("enrich", enrich), ("flag", flag)]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_single_shot_materializes_boundaries(spark, tmp_path):
    calls = []
    out = run_funnel(
        spark, _docs(spark), _stages(calls), str(tmp_path / "f"), key_col="doc_id"
    )
    assert calls == ["filter", "enrich", "flag"]
    rows = _rows(out)
    assert len(rows) == 40  # 60 minus the %3 drops
    assert {"doc_id", "text", "n_chars", "long_doc"} == set(out.columns)
    # each boundary is a real, independently readable table
    from arcane_stream_parquet_spark.operators.pipeline import _funnel_target

    mid = _funnel_target(
        spark, str(tmp_path / "f" / "stage-00001-enrich"),
        "doc_id", "__funnel_version", 32, {},
    ).read()
    assert mid.count() == 40 and "n_chars" in mid.columns


@pytest.mark.parametrize("kill_at", [0, 1, 2])
def test_kill_mid_funnel_resume_skips_done_stages(spark, tmp_path, kill_at):
    """Kill at EVERY stage (first stage = nothing completed yet; last =
    everything but one): resume recomputes only the stages the kill
    reached, and the output is identical to a single-shot run."""
    names = [n for n, _ in _stages([])]

    # single-shot reference run on its own prefix
    ref_calls = []
    ref = _rows(
        run_funnel(
            spark, _docs(spark), _stages(ref_calls), str(tmp_path / "ref"),
            key_col="doc_id",
        )
    )

    # killed run: stage `kill_at` raises before writing anything
    calls = []
    stages = _stages(calls)

    def bomb(df):
        raise RuntimeError("killed mid-funnel")

    stages[kill_at] = (names[kill_at], bomb)
    with pytest.raises(RuntimeError, match="killed mid-funnel"):
        run_funnel(
            spark, _docs(spark), stages, str(tmp_path / "f"), key_col="doc_id"
        )
    assert calls == names[:kill_at]

    # resume with the healed stage: completed stages must NOT recompute
    calls2 = []
    stages2 = _stages(calls2)
    out = run_funnel(
        spark, _docs(spark), stages2, str(tmp_path / "f"), key_col="doc_id"
    )
    assert calls2 == names[kill_at:], "completed stages were recomputed"
    assert _rows(out) == ref, "resumed output differs from single-shot"


def test_resume_with_changed_definition_raises(spark, tmp_path):
    calls = []
    run_funnel(
        spark, _docs(spark), _stages(calls)[:2], str(tmp_path / "f"),
        key_col="doc_id",
    )
    renamed = [("filter", lambda df: df), ("other", lambda df: df)]
    with pytest.raises(ValueError, match="different funnel definition"):
        run_funnel(
            spark, _docs(spark), renamed, str(tmp_path / "f"), key_col="doc_id"
        )


def test_completed_funnel_reruns_as_noop(spark, tmp_path):
    calls = []
    first = _rows(
        run_funnel(
            spark, _docs(spark), _stages(calls), str(tmp_path / "f"),
            key_col="doc_id",
        )
    )
    calls2 = []
    again = _rows(
        run_funnel(
            spark, _docs(spark), _stages(calls2), str(tmp_path / "f"),
            key_col="doc_id",
        )
    )
    assert calls2 == []  # nothing recomputed
    assert again == first


def test_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="non-empty"):
        run_funnel(spark, _docs(spark), [], str(tmp_path / "f"), key_col="doc_id")
    dup = [("a", lambda d: d), ("a", lambda d: d)]
    with pytest.raises(ValueError, match="duplicate stage names"):
        run_funnel(spark, _docs(spark), dup, str(tmp_path / "f2"), key_col="doc_id")


def test_callable_source_and_natural_version_col(spark, tmp_path):
    """source as loader callable + caller-owned version column: the
    boundary tables keep latest-wins dedup on the natural version."""
    def load(s):
        return _docs(s).withColumn("createdon", F.lit(7).cast("bigint"))

    out = run_funnel(
        spark,
        load,
        [("keep_even", lambda df: df.filter(F.col("doc_id") % 2 == 0))],
        str(tmp_path / "f"),
        key_col="doc_id",
        version_col="createdon",
    )
    rows = _rows(out.select("doc_id", "createdon"))
    assert len(rows) == 30 and all(v == 7 for _, v in rows)


def test_target_opts_reach_boundary_tables(spark, tmp_path):
    """target_opts forwards merge-target knobs to every boundary:
    stats_cols + sorted_by + small files make read_where prune data
    files on the stage table — downstream consumers of a funnel
    boundary get the storage engine's machinery, which is the point
    of materializing (vs localCheckpoint)."""
    from arcane_stream_parquet_spark.operators.pipeline import _funnel_target

    # target_opts applies to EVERY boundary, so referenced columns must
    # exist in every stage's output — enrich first, then filter
    stages = [
        ("enrich", lambda df: df.withColumn(
            "n_chars", F.length("text").cast("bigint"))),
        ("keep", lambda df: df.filter(F.col("doc_id") % 3 != 0)),
    ]
    opts = {
        "stats_cols": ("n_chars",),
        "sorted_by": ("n_chars",),
        "max_records_per_file": 10,
    }
    run_funnel(
        spark,
        _docs(spark, 120),
        stages,
        str(tmp_path / "f"),
        key_col="doc_id",
        num_buckets=2,
        target_opts=opts,
    )
    t = _funnel_target(
        spark, str(tmp_path / "f" / "stage-00001-keep"),
        "doc_id", "__funnel_version", 2, opts,
    )
    full = len(t.read().inputFiles())
    narrow = t.read_where(("n_chars", ">=", 20))  # the 3-digit-id docs
    assert narrow.count() > 0
    assert 0 < len(narrow.inputFiles()) < full


def test_resume_with_changed_geometry_raises(spark, tmp_path):
    """r14 ADVICE: the pinned spec covers the table GEOMETRY, not just
    the stage-name list — resuming with a different key_col,
    version_col, num_buckets or target_opts must refuse instead of
    silently building mismatched targets over existing boundaries."""
    stages = [("keep", lambda df: df.filter(F.col("doc_id") % 2 == 0))]
    run_funnel(
        spark, _docs(spark), stages, str(tmp_path / "f"),
        key_col="doc_id", num_buckets=4,
    )
    for kwargs in (
        {"num_buckets": 8},
        {"num_buckets": 4, "version_col": "doc_id"},
        {"num_buckets": 4, "target_opts": {"max_records_per_file": 10}},
    ):
        with pytest.raises(ValueError, match="different funnel definition"):
            run_funnel(
                spark, _docs(spark), stages, str(tmp_path / "f"),
                key_col="doc_id", **kwargs,
            )
    # equal geometry (tuple-vs-list canonicalization included) resumes
    again = run_funnel(
        spark, _docs(spark), stages, str(tmp_path / "f"),
        key_col="doc_id", num_buckets=4,
    )
    assert again.count() == 30


def test_vacuum_funnel_boundaries(spark, tmp_path):
    """r14 VERDICT item 6: completed funnel + retention sweep → final
    table intact, earlier boundary tables gone, resume state untouched
    (the completed funnel still re-runs as a no-op), and an incomplete
    funnel refuses the sweep."""
    from arcane_stream_parquet_spark.fsio import HadoopFileIO, fs_join
    from arcane_stream_parquet_spark.operators.pipeline import (
        vacuum_funnel_boundaries,
    )

    calls = []
    first = _rows(
        run_funnel(
            spark, _docs(spark), _stages(calls), str(tmp_path / "f"),
            key_col="doc_id",
        )
    )
    fio = HadoopFileIO(spark)
    prefix = str(tmp_path / "f")
    names = [n for n, _ in _stages([])]
    dropped = vacuum_funnel_boundaries(spark, prefix, keep_last=1)
    assert [p.rsplit("/", 1)[1] for p in dropped] == [
        "stage-00000-filter",
        "stage-00001-enrich",
    ]
    assert not fio.exists(fs_join(prefix, "stage-00000-filter"))
    assert fio.exists(fs_join(prefix, f"stage-{len(names)-1:05d}-flag"))

    # the completed funnel still re-runs as a no-op on the kept table
    calls2 = []
    again = _rows(
        run_funnel(
            spark, _docs(spark), _stages(calls2), str(tmp_path / "f"),
            key_col="doc_id",
        )
    )
    assert calls2 == [] and again == first

    # idempotent re-sweep; keep_last validation
    assert vacuum_funnel_boundaries(spark, prefix, keep_last=1) == []
    with pytest.raises(ValueError, match="keep_last"):
        vacuum_funnel_boundaries(spark, prefix, keep_last=0)

    # an INCOMPLETE funnel refuses retention (its resume needs the
    # last completed boundary)
    stages = _stages([])
    bomb = [stages[0], ("boom", lambda df: (_ for _ in ()).throw(
        RuntimeError("kill")))]
    with pytest.raises(RuntimeError):
        run_funnel(
            spark, _docs(spark), bomb, str(tmp_path / "g"), key_col="doc_id"
        )
    with pytest.raises(ValueError, match="incomplete"):
        vacuum_funnel_boundaries(spark, str(tmp_path / "g"), keep_last=1)


def test_vacuum_scopes_to_owning_funnel(spark, tmp_path):
    """r15 VERDICT item 6: two funnels nesting under one tree must not
    confuse retention — vacuum of one drops exactly its pinned stage
    list and leaves the other byte-identical; a prefix that owns no
    funnel.json refuses instead of walking."""
    import os

    from arcane_stream_parquet_spark.operators.pipeline import (
        vacuum_funnel_boundaries,
    )

    outer = str(tmp_path / "f")
    inner = str(tmp_path / "f" / "nested")  # B nests under A's prefix
    a = _rows(
        run_funnel(spark, _docs(spark), _stages([]), outer, key_col="doc_id")
    )
    b = _rows(
        run_funnel(
            spark, _docs(spark, 30), _stages([]), inner, key_col="doc_id"
        )
    )

    def snapshot(root):
        out = {}
        for r, _d, names in os.walk(root):
            for n in names:
                p = os.path.join(r, n)
                out[os.path.relpath(p, root)] = os.path.getsize(p)
        return out

    inner_before = snapshot(inner)
    dropped = vacuum_funnel_boundaries(spark, outer, keep_last=1)
    # exactly A's pinned early stages — nothing of B's
    assert [p.rsplit("/", 1)[1] for p in dropped] == [
        "stage-00000-filter",
        "stage-00001-enrich",
    ]
    assert all("/nested/" not in p for p in dropped)
    assert snapshot(inner) == inner_before  # B byte-identical
    # both funnels still serve
    assert _rows(
        run_funnel(spark, _docs(spark), _stages([]), outer, key_col="doc_id")
    ) == a
    assert _rows(
        run_funnel(
            spark, _docs(spark, 30), _stages([]), inner, key_col="doc_id"
        )
    ) == b
    # vacuuming B is independent of A's sweep
    assert len(vacuum_funnel_boundaries(spark, inner, keep_last=1)) == 2

    # a prefix without a pinned funnel refuses
    with pytest.raises(ValueError, match="no funnel pinned"):
        vacuum_funnel_boundaries(spark, str(tmp_path), keep_last=1)
