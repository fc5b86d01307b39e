"""Cross-process concurrent-writer soak (r13 VERDICT item 5): two
SEPARATE Spark sessions — real subprocesses, separate JVMs — interleave
upserts + maintenance + an online rebucket against one target with
orphan grace on. Every in-process concurrency test shares one FS
client; this is the deployment-shaped version the r13 orphan-age guard
and the scoped rebucket sweep were built for.

Pinned invariants: zero lost commits (every private key of every round
survives), latest-wins convergence on contested keys, zero live-data
deletions (final vacuum changes nothing visible), and the mid-soak
rebucket flips with content intact.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

from arcane_stream_parquet_spark.operators.merge import ParquetMergeTarget
from scripts.concurrent_soak import PRIVATE_PER_ROUND, SHARED_KEYS, expected_rows

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cross_process_concurrent_soak(spark, tmp_path):
    rounds = int(os.environ.get("ASP_SOAK_ROUNDS", "6"))
    path = str(tmp_path / "tgt")
    env = {**os.environ, "PYTHONPATH": _REPO}
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(_REPO, "scripts", "concurrent_soak.py"),
                "worker",
                path,
                str(wid),
                str(rounds),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            cwd=_REPO,
            env=env,
            text=True,
        )
        for wid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=1200)
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    # both workers committed every round (retries allowed, losses not)
    for o in outs:
        assert len(o["committed"]) == rounds, o

    t = ParquetMergeTarget(spark=spark, path=path, num_buckets=4)
    got = {
        r["arcane_merge_key"]: (int(r["createdon"]), r["payload"])
        for r in t.read().collect()
    }
    want = expected_rows(outs, rounds)
    assert len(got) == SHARED_KEYS + 2 * rounds * PRIVATE_PER_ROUND
    missing = {k: v for k, v in want.items() if got.get(k) != v}
    assert not missing, f"lost/diverged commits: {dict(list(missing.items())[:5])}"
    assert got == want

    # the mid-soak online rebucket flipped and carried all content
    assert int(t._manifest()["num_buckets"]) == 8

    # zero live-data deletions: now single-writer, an aggressive vacuum
    # (no grace needed anymore) must reclaim only garbage
    before = sorted(got.items())
    t.vacuum()
    after = sorted(
        (r["arcane_merge_key"], (int(r["createdon"]), r["payload"]))
        for r in t.read().collect()
    )
    assert after == before
