"""Sharded-manifest metadata-IO probe (r9 — VERDICT r8 item 1).

Forces a bucket-ranged sharded manifest on real sf0.1 lineitem (lower
``manifest_shard_entries``), then measures the three claims of the r9
shard-reuse design against instrumented shard-file IO:

1. **Commit reuse**: a narrow MoR trickle commit reads/writes only the
   shards whose bucket range intersects the batch — metadata IO per
   commit is O(touched shards), not O(table).  The no-reuse baseline
   (pre-r9 behavior: every commit rewrote every shard) equals the
   total shard byte count by construction, so the ratio is exact.
2. **Root-only polling**: ``maintenance_metrics`` reads zero shard
   files and still reports the EXACT coalescable small-file count
   (cross-checked here against a full shard read).
3. **O(debris) minor pass**: when the adaptive gate fires on
   small-file pressure, ``compact_minor`` reads only candidate shards
   (descriptor ``coal`` > 0 at the threshold class).

Usage: python scripts/shard_probe.py [sf_dir] [shard_entries]
(defaults: sf0.1, 400 — lower shard_entries for a finer shard grid)

Soak mode (r10 — VERDICT r9 item 5): ``--soak N`` replaces the
three-claim probe with an N-commit trickle soak at the forced grid,
with the PRODUCTION adaptive maintenance gate polled after every
commit.  Per commit it records shard-file IO, detects reshard events
(a commit whose shard writes cover ≥ half the grid), and cross-checks
the root's coalescable metric against a full shard read to measure
how long a reuse-induced under-count can suppress a warranted minor
pass.  Claims verified: metadata IO per commit stays O(touched
shards); reshards amortize O(1) over the run; the under-count never
suppresses a warranted minor pass for more than one maintenance cycle.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from arcane_stream_parquet_spark import build_session  # noqa: E402
from arcane_stream_parquet_spark.fsio import HadoopFileIO  # noqa: E402
from arcane_stream_parquet_spark.operators.merge import (  # noqa: E402
    ParquetMergeTarget,
)


class ShardIO:
    """Counts shard-file reads/writes (calls + bytes) through fsio."""

    def __init__(self) -> None:
        self.reads = 0
        self.read_bytes = 0
        self.writes = 0
        self.write_bytes = 0

    def install(self):
        import contextlib
        import unittest.mock as mock

        real_read, real_create = HadoopFileIO.read_text, HadoopFileIO.create_text
        me = self

        def read(self, path):
            text = real_read(self, path)
            if "-shard-" in path:
                me.reads += 1
                me.read_bytes += len(text)
            return text

        def create(self, path, text):
            if "-shard-" in path:
                me.writes += 1
                me.write_bytes += len(text)
            return real_create(self, path, text)

        stack = contextlib.ExitStack()
        stack.enter_context(mock.patch.object(HadoopFileIO, "read_text", read))
        stack.enter_context(
            mock.patch.object(HadoopFileIO, "create_text", create)
        )
        return stack

    def snap(self) -> tuple[int, int, int, int]:
        return (self.reads, self.read_bytes, self.writes, self.write_bytes)


def _exact_coalescable(t, small_file_bytes: int) -> int:
    """Ground truth for the root metric: full shard read, global
    per-bucket small-file counting (no shard locality)."""
    files = t._files_of_manifest(t._manifest())
    k_class = t._size_class_at(small_file_bytes)
    per_bucket: dict = {}
    for f in files:
        if int(f["sz"]).bit_length() <= k_class:
            per_bucket[f["b"]] = per_bucket.get(f["b"], 0) + 1
    return sum(n for n in per_bucket.values() if n >= 2)


def soak(sf_dir: str, shard_entries: int, n_commits: int) -> int:
    """r10 trickle soak (module docstring): N 1-key MoR commits with
    the production adaptive gate polled after each, instrumented for
    per-commit shard IO, reshard amortization, and metric under-count
    suppression streaks."""
    import statistics

    # Threshold picked BETWEEN the two file populations (measured at
    # sf0.1 / 300 rows-per-file): base data files are 1.8-7 KB
    # (size class >= 12 for all but ~3 of 1553), 1-key trickle data
    # files ~1.6 KB and delete files ~0.5 KB (class <= 11).  SMALL=2047
    # makes class 11 the small cutoff, so maintenance coalesces ONLY
    # accumulated trickle debris and never rewrites the base layout —
    # a 1 MB threshold here classes the whole table as small and the
    # first minor pass folds 1553 files into 64, collapsing the shard
    # grid to an inline manifest and ending the very scenario the soak
    # exists to probe.
    SMALL = 2047
    ON_SMALL = 24
    spark = build_session(app_name="asp-shard-soak")
    spark.sparkContext.setLogLevel("ERROR")
    rows = (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias(
                "arcane_merge_key"
            ),
            F.col("l_partkey"),
            F.col("l_quantity"),
            F.col("l_extendedprice"),
            F.col("l_returnflag"),
        )
        .withColumn("createdon", F.lit(1))
    )
    n_rows = rows.select("arcane_merge_key").distinct().count()
    work = tempfile.mkdtemp(prefix="asp_shard_soak_")
    t = ParquetMergeTarget(
        spark=spark,
        path=os.path.join(work, "t"),
        num_buckets=64,
        max_records_per_file=300,
        manifest_shard_entries=shard_entries,
    )
    io = ShardIO()
    keys = None
    merge_writes: list[int] = []  # shard files written per merge commit
    merge_write_bytes: list[int] = []
    reshard_events: list[tuple[int, int, int]] = []  # (i, files, bytes)
    maint_fires = 0
    maint_write_bytes = 0
    suppression_streak = 0
    max_suppression_streak = 0
    suppression_episodes = 0
    grid_collapsed: int | None = None
    with io.install():
        t.merge(rows)
        base_shards = len(t._manifest()["file_shards"])
        base_shard_bytes = io.write_bytes
        keys = [
            r[0]
            for r in rows.select("arcane_merge_key").distinct().head(500)
        ]
        print(
            f"soak base: {n_rows} keys, {base_shards} shards "
            f"({base_shard_bytes / 1e6:.2f} MB shard JSON), grid "
            f"{shard_entries} entries/shard",
            flush=True,
        )
        for i in range(n_commits):
            batch = spark.createDataFrame(
                [(int(keys[i % len(keys)]), "upd", 2 + i)],
                "arcane_merge_key bigint, l_returnflag string, createdon int",
            )
            _, _, w0, wb0 = io.snap()
            t.merge(batch, mode="mor")
            _, _, w1, wb1 = io.snap()
            n_shards_now = len(t._manifest().get("file_shards") or [])
            if n_shards_now == 0:
                grid_collapsed = i
                print(
                    f"  GRID COLLAPSED at commit {i}: manifest went "
                    f"inline (file count fell under the grid) — soak "
                    f"scenario destroyed",
                    flush=True,
                )
                break
            if (w1 - w0) >= max(2, n_shards_now // 2):
                reshard_events.append((i, w1 - w0, wb1 - wb0))
            else:
                merge_writes.append(w1 - w0)
                merge_write_bytes.append(wb1 - wb0)
            # under-count check: root metric vs full-read ground truth
            # (probe-only read; excluded from the IO story by design —
            # production never runs it)
            m = t.maintenance_metrics(small_file_bytes=SMALL)
            exact = _exact_coalescable(t, SMALL)
            warranted = exact >= ON_SMALL
            reported_due = m["coalescable_small_files"] >= ON_SMALL
            if warranted and not reported_due:
                if suppression_streak == 0:
                    suppression_episodes += 1
                suppression_streak += 1
                max_suppression_streak = max(
                    max_suppression_streak, suppression_streak
                )
            else:
                suppression_streak = 0
            _, _, w2, wb2 = io.snap()
            ran = t.run_adaptive_maintenance(
                small_file_bytes=SMALL,
                on_small_files=ON_SMALL,
                on_delete_files=16,
                on_delete_bytes=None,
            )
            _, _, w3, wb3 = io.snap()
            if ran["ran"]:
                maint_fires += 1
                maint_write_bytes += wb3 - wb2
            if (i + 1) % 25 == 0:
                print(
                    f"  commit {i + 1}/{n_commits}: "
                    f"avg {statistics.mean(merge_writes):.2f} shards/commit "
                    f"({statistics.mean(merge_write_bytes) / 1e3:.1f} KB), "
                    f"{len(reshard_events)} reshards, {maint_fires} "
                    f"maintenance fires, max suppression streak "
                    f"{max_suppression_streak}",
                    flush=True,
                )
        n_after = t.read().count()
    reshard_bytes = sum(b for _, _, b in reshard_events)
    n_shards_final = len(t._manifest().get("file_shards") or [])
    amortized_kb = (
        (sum(merge_write_bytes) + reshard_bytes) / n_commits / 1e3
    )
    ok = (
        grid_collapsed is None
        and n_after == n_rows
        and max_suppression_streak <= 1
        and statistics.mean(merge_writes) < base_shards / 2
    )
    print(
        f"soak summary ({n_commits} commits, {n_shards_final} shards "
        f"final vs {base_shards} base):\n"
        f"  merge shard IO/commit: mean {statistics.mean(merge_writes):.2f} "
        f"files / {statistics.mean(merge_write_bytes) / 1e3:.1f} KB, "
        f"p50 {statistics.median(merge_writes):.0f}, "
        f"max {max(merge_writes)} (no-reuse baseline: "
        f"{base_shards} files / {base_shard_bytes / 1e3:.0f} KB)\n"
        f"  reshard events: {len(reshard_events)} "
        f"({reshard_bytes / 1e6:.2f} MB total -> amortized "
        f"{reshard_bytes / n_commits / 1e3:.2f} KB/commit; all-in "
        f"{amortized_kb:.1f} KB/commit)\n"
        f"  maintenance fires: {maint_fires} "
        f"({maint_write_bytes / 1e6:.2f} MB shard rewrites)\n"
        f"  under-count suppression: {suppression_episodes} episodes, "
        f"max streak {max_suppression_streak} cycle(s)\n"
        f"  row parity after soak: {n_after == n_rows} "
        f"({n_after} vs {n_rows})\n"
        f"  PASS={ok}",
        flush=True,
    )
    spark.stop()
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    return 0 if ok else 1


def main() -> int:
    if "--soak" in sys.argv:
        idx = sys.argv.index("--soak")
        n = int(sys.argv[idx + 1]) if len(sys.argv) > idx + 1 else 200
        args = [a for a in sys.argv[1:idx] if not a.startswith("--")]
        sf_dir = args[0] if args else "/root/testdata/sf0.1"
        shard_entries = int(args[1]) if len(args) > 1 else 400
        return soak(sf_dir, shard_entries, n)
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    shard_entries = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    spark = build_session(app_name="asp-shard-probe")
    spark.sparkContext.setLogLevel("ERROR")
    rows = (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias(
                "arcane_merge_key"
            ),
            F.col("l_partkey"),
            F.col("l_quantity"),
            F.col("l_extendedprice"),
            F.col("l_returnflag"),
        )
        .withColumn("createdon", F.lit(1))
    )
    # latest-wins collapses duplicate keys: parity target is the
    # DISTINCT key count (synthetic lineitem repeats line numbers)
    n_rows = rows.select("arcane_merge_key").distinct().count()
    work = tempfile.mkdtemp(prefix="asp_shard_probe_")
    t = ParquetMergeTarget(
        spark=spark,
        path=os.path.join(work, "t"),
        num_buckets=64,
        max_records_per_file=300,
        manifest_shard_entries=shard_entries,  # forces sharding at this geometry
    )
    io = ShardIO()
    with io.install():
        t0 = time.perf_counter()
        t.merge(rows)
        backfill_s = time.perf_counter() - t0
        m = t._manifest()
        shards = m["file_shards"]
        total_shard_bytes = io.write_bytes
        print(
            f"base: {n_rows} keys -> {m['n_files']} files, "
            f"{len(shards)} shards ({total_shard_bytes / 1e6:.2f} MB shard "
            f"JSON), backfill {backfill_s:.1f} s",
            flush=True,
        )

        # -- claim 1: narrow trickle commits reuse untouched shards ---
        keys = [r[0] for r in rows.select("arcane_merge_key").head(30)]
        per_commit = []
        for i, k in enumerate(keys[:20]):
            batch = spark.createDataFrame(
                [(int(k), "upd", 2 + i)],
                "arcane_merge_key bigint, l_returnflag string, createdon int",
            )
            r0, rb0, w0, wb0 = io.snap()
            t.merge(batch, mode="mor")
            r1, rb1, w1, wb1 = io.snap()
            per_commit.append((r1 - r0, rb1 - rb0, w1 - w0, wb1 - wb0))
        n_shards_now = len(t._manifest()["file_shards"])
        avg = [sum(x[i] for x in per_commit) / len(per_commit) for i in range(4)]
        print(
            f"trickle x{len(per_commit)}: avg {avg[0]:.1f} shards read "
            f"({avg[1] / 1e6:.3f} MB), {avg[2]:.1f} shards written "
            f"({avg[3] / 1e6:.3f} MB) per commit — no-reuse baseline is "
            f"ALL {n_shards_now} shards ({total_shard_bytes / 1e6:.2f} MB) "
            f"per commit: {total_shard_bytes / max(avg[3], 1):.0f}x less "
            f"metadata written",
            flush=True,
        )

        # -- claim 2: metrics are root-only and exact -----------------
        r0, _, _, _ = io.snap()
        t0 = time.perf_counter()
        metrics = t.maintenance_metrics(small_file_bytes=1 << 20)
        metrics_s = time.perf_counter() - t0
        root_only = io.snap()[0] == r0
        files = t._files_of_manifest(t._manifest())
        k_class = t._size_class_at(1 << 20)
        per_bucket: dict = {}
        for f in files:
            if int(f["sz"]).bit_length() <= k_class:
                per_bucket[f["b"]] = per_bucket.get(f["b"], 0) + 1
        exact = sum(n for n in per_bucket.values() if n >= 2)
        print(
            f"metrics: {metrics_s * 1e3:.1f} ms, root-only={root_only}, "
            f"coalescable={metrics['coalescable_small_files']} "
            f"(full-read cross-check: {exact}, "
            f"match={metrics['coalescable_small_files'] == exact})",
            flush=True,
        )

        # -- claim 3: minor pass reads only candidate shards ----------
        shards_now = t._manifest()["file_shards"]
        cand = [
            s["n"]
            for s in shards_now
            if t._step_at(s["coal"], k_class) > 0
        ]
        r0, rb0, _, _ = io.snap()
        t0 = time.perf_counter()
        ran = t.run_adaptive_maintenance(
            small_file_bytes=1 << 20,
            on_small_files=2,
            on_delete_files=None,
            on_delete_bytes=None,
        )
        minor_s = time.perf_counter() - t0
        r1, rb1, _, _ = io.snap()
        after = t.maintenance_metrics(small_file_bytes=1 << 20)
        print(
            f"adaptive fire: ran={ran['ran']} escalated={ran['escalated']} "
            f"in {minor_s:.1f} s; read {r1 - r0} shard files "
            f"({(rb1 - rb0) / 1e6:.3f} MB) of {len(shards_now)} total "
            f"({len(cand)} candidates); coalescable "
            f"{metrics['coalescable_small_files']} -> "
            f"{after['coalescable_small_files']}",
            flush=True,
        )
        n_after = t.read().count()
        ok = n_after == n_rows
        print(
            f"row-count parity after maintenance: {ok} "
            f"({n_after} vs {n_rows})",
            flush=True,
        )
    spark.stop()
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
