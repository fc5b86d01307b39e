"""Cross-process create_text hammer — the deployment-shaped proof of
the metadata commit CAS (round-15 fsio fix): two SEPARATE Spark
sessions (separate JVMs, separate Hadoop FS clients) race create_text
on the SAME sequence of destinations with no coordination beyond a
ready-marker handshake.

Invariants the caller (tests/test_fsio.py) asserts from the two
workers' reports: every attempt resolves to a win or a classified
FileExistsError loss (NEVER a bare OSError / unclassified error — the
r14 bug), exactly one winner per destination, and the winner's bytes
are intact (no cross-content publish, no overwrite — the two deeper
holes the round-15 hammer exposed in the shared-tmp + POSIX-rename
protocol).

Usage: python scripts/create_text_hammer.py <root> <wid 0|1> <n>
Prints one JSON line {"wid", "wins": {v: text}, "losses": [v...],
"errors": [...]}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arcane_stream_parquet_spark.fsio import HadoopFileIO, fs_join


def main() -> None:
    root, wid, n = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"create-text-hammer-{wid}")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    fio = HadoopFileIO(spark)
    fio.mkdirs(root)

    # handshake: both workers up before either starts racing
    fio.create_text(fs_join(root, f"ready-{wid}"), "up")
    deadline = time.time() + 120
    other = fs_join(root, f"ready-{1 - wid}")
    while not fio.exists(other):
        if time.time() > deadline:
            raise RuntimeError("peer never came up")
        time.sleep(0.05)

    wins: dict[int, str] = {}
    losses: list[int] = []
    errors: list[str] = []
    for v in range(n):
        path = fs_join(root, f"manifest-v{v:05d}.json")
        text = f"writer-{wid}-v{v}"
        try:
            fio.create_text(path, text)
            wins[v] = text
        except FileExistsError:
            losses.append(v)
        except Exception as e:  # noqa: BLE001 — anything else IS the bug
            errors.append(f"v{v}: {type(e).__name__}: {e}")
    print(json.dumps({"wid": wid, "wins": wins, "losses": losses,
                      "errors": errors}))
    spark.stop()


if __name__ == "__main__":
    main()
