"""Durability + maintenance tests for the versioned-manifest merge
target (round-1 VERDICT/ADVICE findings: crash windows, global conf
mutation, nondeterministic ties; reference ST8 maintenance).
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from arcane_stream_parquet_spark.operators.merge import ParquetMergeTarget


def df_of(spark, rows):
    return spark.createDataFrame(
        [Row(arcane_merge_key=k, createdon=v, payload=p) for k, v, p in rows]
    )


def make_target(spark, tmp_path, **kw) -> ParquetMergeTarget:
    kw.setdefault("num_buckets", 8)
    return ParquetMergeTarget(spark=spark, path=str(tmp_path / "tgt"), **kw)


def test_crash_before_manifest_flip_loses_nothing(spark, tmp_path, monkeypatch):
    """THE crash-window regression (ADVICE round 1): a crash after the
    data write but before the manifest flip must leave the table
    exactly as before — no lost rows for keys outside the batch, no
    partial state visible."""
    t = make_target(spark, tmp_path)
    t.merge(df_of(spark, [(f"k{i}", 1, f"p{i}") for i in range(50)]))
    before = sorted(map(tuple, t.read().collect()))

    boom = RuntimeError("simulated crash at commit point")
    monkeypatch.setattr(
        ParquetMergeTarget,
        "_commit_manifest",
        lambda self, m: (_ for _ in ()).throw(boom),
    )
    with pytest.raises(RuntimeError, match="simulated crash"):
        t.merge(df_of(spark, [("k1", 2, "new")]))
    monkeypatch.undo()

    # table untouched: old manifest still live
    assert sorted(map(tuple, t.read().collect())) == before
    # retry WITHOUT any cleanup converges (r10: the retry stages into
    # its own fresh nonce dir; the crashed attempt's dir is left as an
    # unreferenced orphan)
    t.merge(df_of(spark, [("k1", 2, "new")]))
    # reclaimable garbage: the crashed attempt's whole orphan dir plus
    # the superseded v1 copy of k1's bucket (file-level vacuum, r5
    # sub-bucket manifests) — and vacuuming must not touch the live table
    removed = t.vacuum()
    assert removed, "expected the orphan attempt dir and superseded v1 file"
    assert all(r.startswith(("v00001", "v00002")) for r in removed), removed
    # the crashed v2 attempt dir is among them (nonce-named, whole-dir)
    assert any(r.startswith("v00002-") for r in removed), removed
    assert t.vacuum() == []  # idempotent: nothing left
    assert t.read().filter(F.col("arcane_merge_key") == "k1").collect()[0][
        "payload"
    ] == "new"
    assert t.read().count() == 50


def test_schema_commits_atomically_with_manifest(spark, tmp_path, monkeypatch):
    """Schema is EMBEDDED in the manifest (round-4 create-only
    redesign), so a crash before the commit rolls back cleanly: old
    rows intact, old schema intact — no half-visible drifted column
    (round 1 had schema-then-manifest ordering; round 3's separate
    schema.json still left a window where drift was visible without
    its data). After a successful retry the drift lands atomically."""
    t = make_target(spark, tmp_path)
    t.merge(df_of(spark, [("k1", 1, "a"), ("k2", 1, "b")]))

    drifted = spark.createDataFrame(
        [Row(arcane_merge_key="k3", createdon=2, payload="c", extra="X")]
    )
    monkeypatch.setattr(
        ParquetMergeTarget,
        "_commit_manifest",
        lambda self, m: (_ for _ in ()).throw(RuntimeError("crash")),
    )
    with pytest.raises(RuntimeError):
        t.merge(drifted)
    monkeypatch.undo()

    rows = {r["arcane_merge_key"]: r for r in t.read().collect()}
    assert set(rows) == {"k1", "k2"}  # old data intact
    assert "extra" not in t.read().columns  # clean rollback: no drift visible

    # retry converges: data + drifted schema commit together
    t.merge(drifted)
    rows = {r["arcane_merge_key"]: r for r in t.read().collect()}
    assert set(rows) == {"k1", "k2", "k3"}
    assert rows["k1"]["extra"] is None  # old rows null-filled under new schema
    assert rows["k3"]["extra"] == "X"


def test_restart_after_mid_commit_crash_never_reinitializes(spark, tmp_path):
    """Round-3 ADVICE (high): with the old mutable manifest.json, a
    crash inside the delete→rename flip could leave only a .tmp file;
    exists() then returned False and the next merge() re-initialized
    v00001 over the committed table. The create-only protocol makes
    that state unreachable — the worst mid-commit crash leaves an
    orphaned tmp NEXT TO the intact committed manifest set. This test
    plants exactly that worst-case state and proves restart takes the
    incremental path."""
    from arcane_stream_parquet_spark.fsio import HadoopFileIO, fs_join

    t = make_target(spark, tmp_path)
    t.merge(df_of(spark, [("k1", 1, "a"), ("k2", 1, "b")]))
    before = sorted(map(tuple, t.read().collect()))

    # worst reachable crash state: tmp of the NEXT manifest, orphaned
    fio = HadoopFileIO(spark)
    fio._write_raw(
        fs_join(str(tmp_path / "tgt"), "_asp_meta", "manifest-v00002.json.tmp"),
        b'{"version": 2, "buckets": {}, "schema": null}',
    )

    assert t.exists()  # the committed table is still found
    assert sorted(map(tuple, t.read().collect())) == before
    t.merge(df_of(spark, [("k2", 2, "b2")]))  # incremental, NOT re-init
    rows = {r["arcane_merge_key"]: r["payload"] for r in t.read().collect()}
    assert rows == {"k1": "a", "k2": "b2"}
    assert t._manifest()["version"] == 2


def test_watermark_survives_mid_commit_crash_and_reader_races(spark, tmp_path):
    """Round-3 verdict #1: the old mutable watermark.json did
    delete→rename, so on S3A a racing reader could observe a deleted
    watermark. Now each commit CREATES watermark-<value>.json and the
    reader takes the listing max — every mid-commit crash state reads
    as a committed value, never as missing or partial."""
    from arcane_stream_parquet_spark.fsio import HadoopFileIO

    t = make_target(spark, tmp_path)
    t.merge(df_of(spark, [("k1", 1, "a")]))
    t.commit_watermark(5)
    assert t.watermark() == 5

    fio = HadoopFileIO(spark)
    # crash BEFORE the new value's rename: only an orphaned tmp exists
    fio._write_raw(t._watermark_file(9) + ".tmp", b'{"version": 9}')
    assert t.watermark() == 5  # reader still sees the old committed value

    # crash AFTER the create but BEFORE pruning the old value: both
    # files committed — reader takes the max
    fio._write_raw(t._watermark_file(9), b'{"version": 9}')
    assert t.watermark() == 9

    # the interrupted commit retried (or any later commit) prunes
    t.commit_watermark(11)
    assert t.watermark() == 11
    assert t._watermark_versions() == [11]  # superseded values pruned

    t.commit_watermark(10)  # monotonic no-op
    assert t.watermark() == 11


def test_exact_tie_deterministic_with_tiebreakers(spark, tmp_path):
    """Exact (key, version) duplicates inside one batch: with
    tiebreakers the survivor is the max-tiebreaker row, every run."""
    t = make_target(spark, tmp_path, tiebreakers=("payload",))
    t.merge(df_of(spark, [("k1", 5, "aaa"), ("k1", 5, "zzz")]))
    assert t.read().collect()[0]["payload"] == "zzz"


def test_compact_reduces_files_preserves_contents(spark, tmp_path):
    """ST8 OPTIMIZE: a small max_records_per_file (standing in for
    many parallel writer tasks) fragments buckets; compact() repacks to
    one file per bucket, contents unchanged."""
    t = make_target(spark, tmp_path, num_buckets=2, max_records_per_file=2)
    for i in range(4):
        t.merge(df_of(spark, [(f"k{j}", i + 1, f"p{j}v{i}") for j in range(6)]))
    before = sorted(map(tuple, t.read().collect()))
    files_before = sum(len(f) for f in t._live_files().values())

    n = t.compact(min_files_per_bucket=2)
    assert n > 0
    files_after = sum(len(f) for f in t._live_files().values())
    assert files_after < files_before
    assert files_after <= t.stats()["bucket_count"]  # one file per bucket
    assert sorted(map(tuple, t.read().collect())) == before

    # superseded versions now orphaned → vacuum reclaims space
    t.vacuum()
    live_dirs = {
        os.path.basename(os.path.dirname(os.path.dirname(p)))
        for p in glob.glob(str(tmp_path / "tgt" / "data" / "*" / "*" / "*.parquet"))
    }
    manifest = t._manifest()
    manifest_live = {
        t._dirname_of(f) for f in t._files_of_manifest(manifest)
    }
    assert live_dirs == manifest_live


def test_stats_counts(spark, tmp_path):
    t = make_target(spark, tmp_path)
    t.merge(df_of(spark, [(f"k{i}", 1, "x") for i in range(20)]))
    s = t.stats()
    assert s["row_count"] == 20
    assert s["file_count"] >= s["bucket_count"] >= 1
    assert s["total_bytes"] > 0


def test_sorted_by_orders_rows_within_files(spark, tmp_path):
    """S5 write-layout: sorted_by must leave each data file internally
    sorted (reference tableProperties.sortedBy, docs/crd.md:229-232)."""
    import pyarrow.parquet as pq

    t = make_target(spark, tmp_path, num_buckets=1, sorted_by=("createdon",))
    rows = [(f"k{i}", (i * 37) % 100, "x") for i in range(100)]
    t.merge(df_of(spark, rows))
    files = [path for fs in t._live_files().values() for path, _size in fs]
    assert files
    for f in files:
        created = pq.read_table(f, columns=["createdon"])["createdon"].to_pylist()
        assert created == sorted(created)


def test_no_global_conf_mutation(spark, tmp_path):
    """The write path must not touch session-global SQL confs
    (round-1 ADVICE: partitionOverwriteMode leakage)."""
    key = "spark.sql.sources.partitionOverwriteMode"
    sentinel = spark.conf.get(key, None)
    t = make_target(spark, tmp_path)
    t.merge(df_of(spark, [("k1", 1, "a")]))
    t.merge(df_of(spark, [("k1", 2, "b")]))
    t.overwrite(df_of(spark, [("k2", 1, "c")]))
    assert spark.conf.get(key, None) == sentinel


def test_bloom_filter_cols_write_and_read(spark, tmp_path):
    """parquetBloomFilterColumns parity: writes succeed with per-column
    bloom options and contents round-trip (the filter itself is a
    footer artifact the scan uses for point-lookup file skipping)."""
    t = make_target(
        spark, tmp_path, bloom_filter_cols=("arcane_merge_key",), num_buckets=4
    )
    t.merge(df_of(spark, [(f"k{i}", 1, "x") for i in range(50)]))
    t.merge(df_of(spark, [("k1", 2, "y")]))
    assert t.read().count() == 50
    got = t.read().filter("arcane_merge_key = 'k1'").collect()[0]["payload"]
    assert got == "y"


def test_schema_drift_type_widening(spark, tmp_path):
    """Type drift on an existing column (int payload → long payload):
    unionByName's standard type coercion widens — the merged table
    carries the wider type and both generations of rows survive."""
    t = make_target(spark, tmp_path)
    t.merge(
        spark.createDataFrame(
            [Row(arcane_merge_key="k1", createdon=1, metric=7)],
            schema="arcane_merge_key string, createdon long, metric int",
        )
    )
    t.merge(
        spark.createDataFrame(
            [Row(arcane_merge_key="k2", createdon=2, metric=2**40)],
            schema="arcane_merge_key string, createdon long, metric long",
        )
    )
    rows = {r["arcane_merge_key"]: r["metric"] for r in t.read().collect()}
    assert rows == {"k1": 7, "k2": 2**40}
    assert dict(t.read().dtypes)["metric"] == "bigint"


def test_time_travel_reads_and_expiry(spark, tmp_path):
    """Snapshot reads: each commit archives its manifest; read(at_version)
    reconstructs the table as of that commit; vacuum expires history
    but never the live table."""
    t = make_target(spark, tmp_path)
    t.merge(df_of(spark, [("k1", 1, "v1")]))
    t.merge(df_of(spark, [("k1", 2, "v2"), ("k2", 1, "w1")]))
    t.merge(df_of(spark, [("k2", 2, "w2")]))

    assert t.snapshot_versions() == [1, 2, 3]
    v1 = {(r["arcane_merge_key"], r["payload"]) for r in t.read(at_version=1).collect()}
    v2 = {(r["arcane_merge_key"], r["payload"]) for r in t.read(at_version=2).collect()}
    now = {(r["arcane_merge_key"], r["payload"]) for r in t.read().collect()}
    assert v1 == {("k1", "v1")}
    assert v2 == {("k1", "v2"), ("k2", "w1")}
    assert now == {("k1", "v2"), ("k2", "w2")}

    t.vacuum()
    assert t.snapshot_versions() == [3]  # history expired
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no snapshot v1"):
        t.read(at_version=1)
    # live table unaffected
    assert {(r["arcane_merge_key"], r["payload"]) for r in t.read().collect()} == now


# ---------------------------------------------------------------------------
# r9: model-based crash/replay fuzz of the merge/compact/vacuum state
# machine (VERDICT r8 item 2).  Random op sequences with crashes
# injected at every metadata create/delete point; the invariant is the
# pure-python latest-wins fold over the batches that actually
# COMMITTED (manifest version advanced — the create-only protocol's
# only commit point), plus watermark monotonicity.  The target object
# is stateless (all state on disk), so every op is also a "reopen".

import contextlib
import unittest.mock as mock

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from arcane_stream_parquet_spark.fsio import HadoopFileIO


class _SimCrash(BaseException):
    """Not an Exception: nothing in the engine may swallow it."""


@contextlib.contextmanager
def _crash_at(create_n: int = -1, delete_n: int = -1):
    """Raise _SimCrash at the Nth metadata create_text / delete call
    inside the window (-1 = never)."""
    real_create, real_delete = HadoopFileIO.create_text, HadoopFileIO.delete
    seen = {"c": 0, "d": 0}

    def create(self, path, text):
        if seen["c"] == create_n:
            raise _SimCrash(f"create #{create_n}: {path}")
        seen["c"] += 1
        return real_create(self, path, text)

    def delete(self, path, recursive=False):
        if seen["d"] == delete_n:
            raise _SimCrash(f"delete #{delete_n}: {path}")
        seen["d"] += 1
        return real_delete(self, path, recursive=recursive)

    with (
        mock.patch.object(HadoopFileIO, "create_text", create),
        mock.patch.object(HadoopFileIO, "delete", delete),
    ):
        yield


_fuzz_key = st.sampled_from(["a", "b", "c", None])
_fuzz_row = st.tuples(
    _fuzz_key, st.integers(0, 4), st.sampled_from(["p", "q"])
)
_fuzz_op = st.one_of(
    st.tuples(
        st.just("merge"),
        st.sampled_from(["cow", "mor"]),
        st.lists(_fuzz_row, min_size=1, max_size=3),
        st.integers(-1, 3),  # crash at Nth metadata create (-1 never)
    ),
    st.tuples(st.just("compact"), st.integers(-1, 2)),
    st.tuples(st.just("minor"), st.integers(-1, 2)),
    st.tuples(st.just("vacuum"), st.integers(-1, 2)),  # crash at delete
    st.tuples(  # r10: row-level delete_keys commits join the alphabet
        st.just("delete"),
        st.lists(_fuzz_key, min_size=1, max_size=2, unique=True),
        st.integers(-1, 2),  # crash at Nth metadata create
    ),
    st.tuples(
        st.just("wm"),
        st.integers(0, 9),
        st.sampled_from(["none", "create", "delete"]),
    ),
    st.tuples(  # r11: online rebucketing joins the alphabet — powers
        # of two keep every target divisible with the evolving count;
        # the op is content-neutral so the model fold never sees it
        st.just("rebucket"),
        st.sampled_from([1, 2, 8, 16]),
        st.integers(-1, 5),  # crash at Nth metadata create
    ),
)


def _fuzz_df(spark, rows):
    # explicit schema: an all-null key column defeats Row inference
    return spark.createDataFrame(
        [(k, v, p) for k, v, p in rows],
        "arcane_merge_key string, createdon bigint, payload string",
    )


def _model_fold(committed_events):
    """Pure-python replay of committed events, in commit order.
    ``("merge", batch)``: within a batch max (version, payload) per
    key; across batches the batch wins on version >= target
    (precedence before tiebreakers).  ``("delete", keys)``: the keys
    simply leave the state — and a later merge of a deleted key wins
    UNCONDITIONALLY (there is no target version to lose against),
    which is exactly the delete-aware MoR winner-scan semantics."""
    state: dict = {}
    for ev in committed_events:
        if ev[0] == "delete":
            for k in ev[1]:
                state.pop(k, None)
            continue
        best: dict = {}
        for k, v, p in ev[1]:
            if k not in best or (v, p) > best[k]:
                best[k] = (v, p)
        for k, (v, p) in best.items():
            if k not in state or v >= state[k][0]:
                state[k] = (v, p)
    return sorted(
        ((k, v, p) for k, (v, p) in state.items()),
        key=lambda r: (r[0] is None, r[0]),
    )


@given(ops=st.lists(_fuzz_op, min_size=2, max_size=6))
@settings(
    max_examples=int(os.environ.get("ASP_FUZZ_EXAMPLES", "12")),
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
        HealthCheck.data_too_large,
    ],
)
def test_crash_replay_state_machine_fuzz(spark, tmp_path_factory, ops):
    """ANY interleaving of merge(cow|mor) / delete_keys /
    compact_minor / compact / vacuum / watermark commits, with a crash
    injected at any metadata create or delete, leaves a table whose
    live rows are EXACTLY the in-order replay of the events whose
    commit point was reached — and the watermark never regresses.  Tiny manifest_shard_entries
    pushes sequences through the sharded (shard-reuse) commit path
    too.  Set ASP_FUZZ_EXAMPLES to scale the run (CI default 12; the
    round-9 probe ran 200 green)."""
    base = tmp_path_factory.mktemp("crashfuzz")
    t = ParquetMergeTarget(
        spark=spark,
        path=str(base / "t"),
        num_buckets=4,
        tiebreakers=("payload",),
        manifest_shard_entries=5,
    )
    committed: list = []
    expected_wm = None
    for op in ops:
        v_before = t._manifest()["version"] if t.exists() else 0
        kind = op[0]
        try:
            if kind == "merge":
                _, mode, rows, cn = op
                with _crash_at(create_n=cn):
                    t.merge(_fuzz_df(spark, rows), mode=mode)
            elif kind == "delete":
                _, keys, cn = op
                if t.exists():
                    with _crash_at(create_n=cn):
                        t.delete_keys(keys)
            elif kind == "compact":
                if t.exists():
                    with _crash_at(create_n=op[1]):
                        t.compact()
            elif kind == "minor":
                if t.exists():
                    with _crash_at(create_n=op[1]):
                        t.compact_minor(small_file_bytes=1 << 20)
            elif kind == "vacuum":
                if t.exists():
                    with _crash_at(delete_n=op[1]):
                        t.vacuum()
            elif kind == "rebucket":
                # content-neutral: a crash leaves resumable markers
                # (or a committed flip awaiting cleanup) — either way
                # the visible rows must still equal the model fold
                if t.exists():
                    with _crash_at(create_n=op[2]):
                        t.rebucket(op[1])
            elif kind == "wm":
                _, v, mode = op
                if t.exists():
                    with _crash_at(
                        create_n=0 if mode == "create" else -1,
                        delete_n=0 if mode == "delete" else -1,
                    ):
                        t.commit_watermark(v)
                    if expected_wm is None or v > expected_wm:
                        expected_wm = v
        except _SimCrash:
            if kind in ("merge", "delete"):
                # the commit point is the root manifest creation: the
                # event is in iff the version advanced
                v_after = t._manifest()["version"] if t.exists() else 0
                if v_after > v_before:
                    committed.append((kind, op[2] if kind == "merge" else op[1]))
            elif kind == "wm" and op[2] == "delete":
                # crash AFTER the create: the watermark is committed
                # (readers take the listing max; stale files are inert)
                v = op[1]
                if expected_wm is None or v > expected_wm:
                    expected_wm = v
            continue
        if kind in ("merge", "delete"):
            v_after = t._manifest()["version"] if t.exists() else 0
            if v_after > v_before:
                committed.append((kind, op[2] if kind == "merge" else op[1]))
    if not t.exists():
        assert not committed
        return
    actual = sorted(
        ((r[0], r[1], r[2]) for r in t.read().collect()),
        key=lambda r: (r[0] is None, r[0]),
    )
    assert actual == _model_fold(committed)
    assert t.watermark() == expected_wm
    # final uncrashed maintenance converges and preserves contents
    t.compact_minor(small_file_bytes=1 << 20)
    t.vacuum()
    actual2 = sorted(
        ((r[0], r[1], r[2]) for r in t.read().collect()),
        key=lambda r: (r[0] is None, r[0]),
    )
    assert actual2 == actual


# ---------------------------------------------------------------------------
# r9: concurrent-writer conflict semantics (VERDICT r8 item 3)


def test_concurrent_writer_loses_cleanly_and_retry_converges(
    spark, tmp_path
):
    """Two writers racing one target (streaming + overlapping backfill
    — an operator error under the single-writer contract): the loser
    must fail with ConcurrentWriteError BEFORE clearing anything the
    winner's commit references, the winner's table must stay fully
    intact, and a plain retry by the loser must converge."""
    import copy

    from arcane_stream_parquet_spark.operators.merge import (
        ConcurrentWriteError,
    )

    path = str(tmp_path / "tgt")
    a = ParquetMergeTarget(
        spark=spark, path=path, num_buckets=4, manifest_shard_entries=3,
        max_records_per_file=5,
    )
    b = ParquetMergeTarget(
        spark=spark, path=path, num_buckets=4, manifest_shard_entries=3,
        max_records_per_file=5,
    )
    a.merge(df_of(spark, [(f"k{i}", 1, f"p{i}") for i in range(30)]))

    # writer B reads the manifest ... and stalls; writer A commits
    m_stale = copy.deepcopy(b._manifest())
    b._manifest = lambda: copy.deepcopy(m_stale)  # pin the stale read
    a.merge(df_of(spark, [("k0", 2, "winner")]))
    winner_rows = sorted(map(tuple, a.read().collect()))
    meta_before = sorted(a._fio.list_names(a._meta_path))

    for mode in ("cow", "mor"):
        with pytest.raises(ConcurrentWriteError, match="retry"):
            b.merge(df_of(spark, [("k1", 2, f"loser-{mode}")]), mode=mode)
        # the winner's commit is byte-for-byte intact: same metadata
        # set, same contents
        assert sorted(a._fio.list_names(a._meta_path)) == meta_before
        assert sorted(map(tuple, a.read().collect())) == winner_rows

    # the loser retries normally (fresh manifest read) and converges
    del b.__dict__["_manifest"]
    b.merge(df_of(spark, [("k1", 2, "retried")]))
    out = {r["arcane_merge_key"]: r["payload"] for r in a.read().collect()}
    assert out["k0"] == "winner" and out["k1"] == "retried"
    assert len(out) == 30
    # any staging the loser left behind is reclaimable garbage only
    a.vacuum()
    assert sorted(map(tuple, a.read().collect())) == sorted(
        map(tuple, b.read().collect())
    )


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_two_inflight_writers_interleave_without_torn_state(
    spark, tmp_path, mode
):
    """r10 (VERDICT r9 item 4): TWO writers in flight at once — both
    stage data for the same next version before either commits.  The
    pre-r10 fixed version dirs made this the last torn-state path (one
    writer could clear the other's uncommitted staging as a "crash
    orphan", then the other committed a manifest referencing deleted
    files); nonce-namespaced staging removes it — the loser's attempt
    lands in its own dir, loses cleanly at the root create, and its
    garbage is vacuum-reclaimable without touching the winner."""
    from arcane_stream_parquet_spark.fsio import fs_join
    from arcane_stream_parquet_spark.operators.merge import (
        ConcurrentWriteError,
    )

    path = str(tmp_path / "tgt")

    def mk():
        return ParquetMergeTarget(
            spark=spark, path=path, num_buckets=4, merge_mode=mode
        )

    a, b = mk(), mk()
    a.merge(df_of(spark, [(f"k{i}", 1, f"p{i}") for i in range(20)]))

    # b stages everything for v2 and, exactly at its commit point, a's
    # whole v2 merge (stage + commit) interleaves in — the tightest
    # both-in-flight schedule expressible deterministically
    real_commit = ParquetMergeTarget._commit_manifest
    fired = []

    def hooked(manifest):
        fired.append(True)
        a.merge(df_of(spark, [("k0", 2, "winner")]))
        return real_commit(b, manifest)

    b._commit_manifest = hooked
    with pytest.raises(ConcurrentWriteError):
        b.merge(df_of(spark, [("k1", 2, "loser")]))
    assert fired, "interleave hook never reached the commit point"
    del b.__dict__["_commit_manifest"]

    # the winner's commit is fully intact; the loser's rows invisible
    out = {r["arcane_merge_key"]: r["payload"] for r in a.read().collect()}
    assert out["k0"] == "winner" and out["k1"] == "p1" and len(out) == 20

    # the loser's staging is on disk but UNREFERENCED — identify it
    fio = a._fio
    manifest = a._manifest()
    files = a._files_of_manifest(manifest)
    referenced = {a._dirname_of(f) for f in files}
    data_root = fs_join(path, "data")
    orphans = set(fio.list_names(data_root)) - referenced
    assert orphans, "loser's staged dir should remain as an orphan"
    assert all(o.startswith("v00002-") for o in orphans), orphans

    # plain retry converges — both batches land, no data loss
    b.merge(df_of(spark, [("k1", 2, "loser-retry")]))
    out = {r["arcane_merge_key"]: r["payload"] for r in b.read().collect()}
    assert out["k0"] == "winner" and out["k1"] == "loser-retry"
    assert len(out) == 20

    # vacuum reclaims exactly the garbage; the table reads identically
    before = sorted(map(tuple, a.read().collect()))
    removed = a.vacuum()
    assert {o for o in orphans if any(r.startswith(o) for r in removed)} == orphans
    assert not set(fio.list_names(data_root)) & orphans
    if mode == "mor":
        # the loser also staged a delete dir; it must be gone too
        del_dirs = set(fio.list_names(fs_join(path, "deletes")))
        live_del = {
            d.get("d") or f"v{int(d['seq']):05d}"
            for d in (a._manifest().get("deletes") or [])
        }
        assert del_dirs <= live_del, (del_dirs, live_del)
    assert sorted(map(tuple, a.read().collect())) == before
    assert a.vacuum() == []  # idempotent


def test_concurrent_compaction_race_loses_cleanly(spark, tmp_path):
    """Maintenance racing a merge from the same base version: the
    compaction loser must not tear the merge winner's commit."""
    import copy

    from arcane_stream_parquet_spark.operators.merge import (
        ConcurrentWriteError,
    )

    path = str(tmp_path / "tgt")
    a = ParquetMergeTarget(spark=spark, path=path, num_buckets=4,
                           max_records_per_file=5)
    b = ParquetMergeTarget(spark=spark, path=path, num_buckets=4,
                           max_records_per_file=5)
    a.merge(df_of(spark, [(f"k{i}", 1, f"p{i}") for i in range(30)]))
    m_stale = copy.deepcopy(b._manifest())
    b._manifest = lambda: copy.deepcopy(m_stale)
    a.merge(df_of(spark, [("k0", 2, "winner")]))
    winner_rows = sorted(map(tuple, a.read().collect()))

    with pytest.raises(ConcurrentWriteError):
        b.compact(min_files_per_bucket=2)
    assert sorted(map(tuple, a.read().collect())) == winner_rows

    del b.__dict__["_manifest"]
    assert b.compact(min_files_per_bucket=2) >= 0  # clean retry
    assert sorted(map(tuple, a.read().collect())) == winner_rows


def test_concurrent_minor_compaction_never_wipes_winner_deletes(
    spark, tmp_path
):
    """r9 review find: a stale maintenance run whose only pressure is
    DELETE files must not clear the winner's committed delete dir —
    the fence fires before the first FS mutation of that path."""
    import copy

    from arcane_stream_parquet_spark.operators.merge import (
        ConcurrentWriteError,
    )

    path = str(tmp_path / "tgt")
    a = ParquetMergeTarget(spark=spark, path=path, num_buckets=4,
                           merge_mode="mor")
    b = ParquetMergeTarget(spark=spark, path=path, num_buckets=4,
                           merge_mode="mor")
    a.merge(df_of(spark, [(f"k{i}", 1, f"p{i}") for i in range(20)]))
    a.merge(df_of(spark, [("k0", 2, "x")]))  # two pending delete
    a.merge(df_of(spark, [("k2", 2, "y")]))  # files: consolidation arms
    m_stale = copy.deepcopy(b._manifest())
    b._manifest = lambda: copy.deepcopy(m_stale)
    # winner commits version N+1 WITH delete files
    a.merge(df_of(spark, [("k1", 2, "winner")]))
    winner_rows = sorted(map(tuple, a.read().collect()))
    assert a._manifest()["deletes"], "winner must have live delete files"

    # loser: pure delete-pressure minor pass from the stale manifest
    # (min thresholds force the consolidation branch, no small files
    # involved at huge small_file_bytes... they are all small at toy
    # scale, so force deletes-only by making smalls uncoalescable)
    with pytest.raises(ConcurrentWriteError):
        b.compact_minor(small_file_bytes=0, min_delete_files=2)
    # the winner's table reads intact, including its delete semantics
    assert sorted(map(tuple, a.read().collect())) == winner_rows


def test_adaptive_vacuum_on_snapshot_debt(spark, tmp_path):
    """r9 review find: in an adaptive-only deployment (counter path
    never reached) vacuum must still run once stranded snapshots cross
    ``on_snapshots`` — otherwise roots and superseded files accumulate
    forever.  The gate fires a vacuum-only pass, drops the snapshot
    count back to 1, and leaves contents untouched."""
    t = make_target(spark, tmp_path)
    for v in range(1, 7):
        t.merge(df_of(spark, [("k1", v, f"p{v}")]))
    before = sorted(map(tuple, t.read().collect()))
    assert len(t.snapshot_versions()) >= 6
    # below the bound: nothing runs
    r = t.run_adaptive_maintenance(
        on_delete_files=None, on_delete_bytes=None, on_small_files=None,
        on_snapshots=100,
    )
    assert r == {"ran": False, "escalated": False}
    assert len(t.snapshot_versions()) >= 6
    # at the bound: vacuum-only pass reclaims
    r = t.run_adaptive_maintenance(
        on_delete_files=None, on_delete_bytes=None, on_small_files=None,
        on_snapshots=5,
    )
    assert r == {"ran": True, "escalated": False}
    assert len(t.snapshot_versions()) == 1
    assert sorted(map(tuple, t.read().collect())) == before
    # converged: a second poll is idle
    r = t.run_adaptive_maintenance(
        on_delete_files=None, on_delete_bytes=None, on_small_files=None,
        on_snapshots=5,
    )
    assert r == {"ran": False, "escalated": False}
