"""Pathological-document probe for the per-document aggregation state
of remove_duplicate_spans and remove_boilerplate_lines (r11 VERDICT
item 3).

The worst input for span dedup is a single LONG document that is 100%
duplicated: r11's coverage fold flattened every window's k positions
into one aggregation buffer (O(windows * k) ints for that one row —
~10M for a 10^6-token doc at k=10); the r12 fold holds only the sorted
window STARTS (O(windows)) and merges them into intervals row-locally.
This probe drives a 10^6-token fully-duplicated pair plus an
alternating half-duplicated sibling (many disjoint merged intervals)
and a 10^6-line boilerplate-heavy document, and reports wall time and
correctness invariants.

Usage: python scripts/span_probe.py [n_tokens]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arcane_stream_parquet_spark import build_session
from arcane_stream_parquet_spark.operators.text import (
    remove_boilerplate_lines,
    remove_duplicate_spans,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = build_session(app_name="asp-span-probe")
    spark.sparkContext.setLogLevel("ERROR")

    body = " ".join(f"w{i}x{i % 997}" for i in range(n))
    mixed = body.split(" ")
    for b in range(0, n, 90):
        for j in range(b, min(b + 30, n)):
            mixed[j] = f"u{j}"
    docs = spark.createDataFrame(
        [(1, body), (2, body), (3, " ".join(mixed))],
        "doc_id long, text string",
    )
    t0 = time.monotonic()
    rows = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(
            docs, window_tokens=10, min_docs=2
        ).collect()
    }
    span_sec = time.monotonic() - t0
    assert rows[1]["n_removed"] == n and rows[1]["clean_text"] == ""
    assert rows[2]["n_removed"] == n
    # doc 3: each period's shared run [b+30, min(b+90, n)) is fully
    # covered iff it fits at least one k=10 window (a partial tail
    # run >= 10 tokens still duplicates the body docs)
    runs = [
        min(b + 90, n) - (b + 30)
        for b in range(0, n, 90)
        if min(b + 90, n) - (b + 30) >= 10
    ]
    assert rows[3]["n_removed"] == sum(runs)

    banner = "accept all cookies to continue"
    big = "\n".join(
        banner if i % 10 == 0 else f"unique line {i}" for i in range(n)
    )
    bdocs = spark.createDataFrame(
        [(1, big)] + [(i, banner) for i in range(2, 7)],
        "doc_id long, text string",
    )
    t0 = time.monotonic()
    brows = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(bdocs, min_docs=5).collect()
    }
    boiler_sec = time.monotonic() - t0
    assert brows[1]["n_removed"] == n // 10
    assert brows[1]["n_lines"] == n

    print(
        json.dumps(
            {
                "n_tokens": n,
                "span_dedup_sec": round(span_sec, 2),
                "span_merged_intervals_doc3": len(runs),
                "boilerplate_sec": round(boiler_sec, 2),
                "all_invariants": True,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
